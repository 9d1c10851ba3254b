"""The canonical bench query set — one per query class (single term, AND,
hot OR, phrase, field+time, NOT, fast-field sort, offset).  Shared by
bench.py, the CLI's bench-queries subcommand, and the profiling tools so
every harness measures the same workload."""

BENCH_QUERIES = {
    "q1_single_term": dict(query="deploy"),
    "q2_and": dict(query="deploy failure"),
    "q3_hot_or": dict(query="the OR error", max_hits=20),
    "q4_phrase": dict(query='"the error"'),
    "q5_field_time": dict(
        query="role:assistant error",
        start_timestamp=1767225600,
        end_timestamp=1767225600 + 90 * 86400,
    ),
    "q6_not": dict(query="error NOT timeout"),
    "q7_sort_ts": dict(query="deploy", sort_by_field="ts"),
    "q8_offset": dict(query="error", start_offset=20, max_hits=10),
    # '*' browse-latest: every doc matches at constant score, page by ts —
    # the leaf reads only fast fields (zero postings decode)
    "q10_match_all_sort": dict(query="*", sort_by_field="ts", max_hits=10),
    # '*' total count: answered from catalog metadata, no Spark job at all
    "q11_match_all_count": dict(query="*", max_hits=0),
    # prefix expansion (plan-time dictionary range read → MaxScore/WAND)
    "q12_prefix": dict(query="deplo*"),
    # fuzzy expansion ('deploy' misspelled, classic distance 2, anchored)
    "q13_fuzzy": dict(query="deplyo~2"),
    # wildcard expansion ('?' one-char + trailing run; dictionary range
    # read anchored to the literal prefix 'd')
    "q14_wildcard": dict(query="d?plo*"),
    # regex expansion (top-level alternation voids the range anchor →
    # unanchored dictionary scan, then MaxScore over the 3-term disjunction)
    "q15_regex": dict(query="/(deploy|failure|timeout)/", max_hits=20),
}
