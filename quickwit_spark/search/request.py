"""SearchRequest — the engine's analog of the reference SearchRequest proto
(quickwit-proto/src/quickwit.rs:6-37; REST params docs/reference/rest-api.md:47-57).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SearchRequest:
    query: str
    max_hits: int = 10
    start_offset: int = 0
    # half-open [start, end) epoch-second range (reference lib.rs:100-119)
    start_timestamp: int | None = None
    end_timestamp: int | None = None
    search_fields: tuple[str, ...] | None = None
    # None → BM25 score (north rule); otherwise a fast field name
    # (reference collector sorts by fast field / DocId, collector.rs:47-64)
    sort_by_field: str | None = None
    sort_asc: bool = False
    # 'reference' → tie-break (sort desc, split_id asc, doc_id asc), the
    # merge order of lib.rs:93-98; 'global_key' → tie-break on
    # (conv_id, turn_idx) so results are split-layout independent (used for
    # the DuckDB driver oracle where the SQL knows nothing about splits)
    tiebreak: str = "reference"
    # request-level numeric range filters over FAST fields — the
    # generalization of the start/end_timestamp params (the reference
    # rejects range QUERY SYNTAX, query_builder.rs:36-39, but filters by
    # time through request params; this extends that shape to any fast
    # field).  Each entry is (field, lo, hi) with half-open [lo, hi);
    # None = unbounded side.  Split pruning uses the catalog's per-split
    # field_ranges stats; surviving splits apply an exact per-doc mask.
    numeric_filters: tuple[tuple, ...] | None = None
    # restrict each hit's stored fields to this subset (ES _source
    # filtering analog): None returns every stored column (default), a
    # tuple returns only those — and the driver-side page fetch reads ONLY
    # those doc-store columns (column-pruned pyarrow), which matters for
    # wide documents.  Hit identity (split_id, doc_id, score, sort_value)
    # is always present.  snippet_fields must be a subset when both are
    # set (snippets read the stored text).
    stored_fields: tuple[str, ...] | None = None
    # highlighted fragments for these stored tokenized text fields, added
    # to each hit as hit["snippets"] = {field: "<b>..</b> .."} — generated
    # driver-side for the final page only (beyond-reference; snippet.py)
    snippet_fields: tuple[str, ...] | None = None
    snippet_max_chars: int = 150
    # cursor pagination (beyond-reference, the ES search_after shape):
    # (last_sort_value_or_score, last_split_id, last_doc_id) of the
    # previous page's final hit — the next page returns hits strictly
    # AFTER it in result order.  O(k) per page at any depth, vs
    # start_offset's O(offset) leaf work; mutually exclusive with
    # start_offset.  Ties on the primary value break by the reference
    # (split_id, doc_id) order, so it requires tiebreak='reference'.
    search_after: tuple | None = None
    # ES bool minimum_should_match, applied to the TOP-LEVEL disjunction:
    # a doc matches only if >= this many of the top-level OR clauses match
    # (nested groups are unaffected; Lucene semantics — a value above the
    # clause count matches nothing).  >1 requires the query's top level to
    # BE a disjunction (loud error otherwise) and disables the MaxScore
    # pruning path (matching changes, so the leaf runs full evaluation).
    # Scoring is unchanged: every matching clause contributes, not just
    # the first min_should_match (the ES behavior).
    min_should_match: int = 1
    # attach a per-hit BM25 breakdown (the ES per-hit ``explain`` analog):
    # hit["score_detail"] = {"score", "terms": [{field, term, tf, doc_freq,
    # idf, doc_len, avg_len, weight, contribution}, ...]} — recomputed
    # driver-side for the final page only, summing per-term contributions
    # in the SAME sorted-term float-addition order as the leaf, so the
    # reported breakdown reproduces the hit score BIT-exactly across every
    # evaluation strategy (full eval, WAND post-scale, MaxScore).
    score_explain: bool = False


def parse_search_after(s) -> tuple | None:
    """``searchAfter=<value>,<split_id>,<doc_id>`` (REST query-string/CLI
    form) or the ES-style JSON array ``[value, split_id, doc_id]`` (batch
    body): the previous page's last hit's sort value (or BM25 score,
    float) plus its reference tie key.  The INDEX-QUALIFIED 4-element form
    ``<value>,<index_id>,<split_id>,<doc_id>`` addresses multi-index
    pagination (executor.multi_index_search — split ids are unique only
    within one index, so the cursor needs the index coordinate).
    Integral float values normalize to int — sort-field cursors compare
    against int64 arrays, and a float64 cursor would collapse distinct
    values above 2^53 (the same discipline _fast_field_values enforces)."""
    if s is None:
        return None
    index_id = None
    if isinstance(s, (list, tuple)):
        if len(s) not in (3, 4):
            raise ValueError(
                "searchAfter must be [value, split_id, doc_id] or "
                f"[value, index_id, split_id, doc_id] (got {s!r})"
            )
        if len(s) == 3:
            value, split_id, doc_id = s
        else:
            value, index_id, split_id, doc_id = s
        if not isinstance(value, (int, float)):
            raise ValueError(f"searchAfter value must be numeric (got {value!r})")
    elif isinstance(s, str):
        parts = s.split(",")
        if len(parts) not in (3, 4):
            raise ValueError(
                "searchAfter must be '<sortValueOrScore>,<split_id>,<doc_id>' "
                "or '<sortValueOrScore>,<index_id>,<split_id>,<doc_id>' "
                f"(got {s!r})"
            )
        raw = parts[0]
        value = float(raw) if ("." in raw or "e" in raw.lower()) else int(raw)
        if len(parts) == 3:
            split_id, doc_id = parts[1], parts[2]
        else:
            index_id, split_id, doc_id = parts[1], parts[2], parts[3]
    else:
        raise ValueError(
            f"searchAfter must be a string or 3/4-element array (got {s!r})"
        )
    if isinstance(value, float) and value.is_integer():
        value = int(value)
    if index_id is not None:
        return (value, str(index_id), str(split_id), int(doc_id))
    return (value, str(split_id), int(doc_id))


def parse_sort_by_dsl(s: str | None) -> tuple[str | None, bool]:
    """``sortByField`` mini-DSL shared by REST and CLI (rest.rs:361-371 →
    sort_by.rs:64-75 ``SortByField::from``): ``+field`` → ascending,
    ``-field`` → descending, bare ``field`` → ASCENDING (the surface layer
    always sets an explicit order; the proto-level Desc default applies
    only when no sort field reaches the engine at all).  Returns
    ``(field_or_None, sort_asc)``."""
    if s is None:
        return None, False
    if s.startswith("+"):
        return s[1:].strip(), True
    if s.startswith("-"):
        return s[1:].strip(), False
    return s.strip(), True


def parse_numeric_filters(entries) -> tuple[tuple, ...] | None:
    """``field:lo..hi`` filter strings (REST ``numericFilter`` repeatable /
    CLI ``--numeric-filter``) → ((field, lo, hi), ...).  Either bound may
    be empty (unbounded side): ``turn_idx:2..10``, ``score:0.5..``,
    ``n:..100``.  Integer-looking bounds parse as int, others as float
    (f64 fast fields take float bounds)."""
    if not entries:
        return None
    out = []
    for s in entries:
        field, sep, rng = s.partition(":")
        if not sep or not field or ".." not in rng:
            raise ValueError(
                f"numericFilter must be 'field:lo..hi' (either bound may be "
                f"empty): {s!r}"
            )
        lo_s, _, hi_s = rng.partition("..")

        def num(x: str):
            if x == "":
                return None
            try:
                return int(x)
            except ValueError:
                return float(x)  # raises ValueError on garbage — intended

        try:
            lo, hi = num(lo_s), num(hi_s)
        except ValueError:
            raise ValueError(f"numericFilter bounds must be numbers: {s!r}")
        if lo is None and hi is None:
            raise ValueError(f"numericFilter needs at least one bound: {s!r}")
        out.append((field, lo, hi))
    return tuple(out)
