"""Randomized differential testing of the aggregation surface: Hypothesis
composes a query + an ES-style aggregation request, and `search_agg_multi`
(the fused one-leaf-pass path) plus `search_agg_range` must agree with a
pandas oracle computed from the raw docs table and the pure-Python match-set
oracle.  The fixed cases in test_search.py cover each aggregation once; this
module stresses the combinations (query class x agg mix x fast-vs-stored
group field x empty match sets) the way test_search_random.py stresses the
top-k collector."""

import math
import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search_agg_multi, search_agg_range
from quickwit_spark.search.oracle import OracleIndex
from quickwit_spark.search.parser import parse_query
from quickwit_spark.search.request import SearchRequest

EPOCH = 1767225600  # corpus start (FIXTURES.md, 2026-01-01 UTC)
DAY = 86400

_STATE: dict = {}

# the docs-table column that carries each aggregatable field's value
_DOC_COL = {"ts": "ts_epoch", "turn_idx": "turn_idx", "role": "role", "tool": "tool"}


@pytest.fixture(scope="module", params=["fresh", "merged"])
def built(spark, tmp_path_factory, request):
    """Fresh AND post-merge layouts: merges remap docIDs and re-encode the
    fast-field segments the aggregation stream leaf reads."""
    pdf = generate_transcripts(n_conversations=25, seed=11)
    index_dir = str(tmp_path_factory.mktemp(f"idx_agg_rand_{request.param}"))
    cfg = (
        transcripts_config(split_num_docs_target=250, segment_num_docs_target=64)
        if request.param == "fresh"
        else transcripts_config(
            split_num_docs_target=5000, segment_num_docs_target=64,
            merge_factor=3, max_merge_factor=4,
        )
    )
    build_index(spark, spark.createDataFrame(pdf), cfg, index_dir,
                n_splits=6 if request.param == "merged" else None)
    if request.param == "merged":
        from quickwit_spark.index.catalog import Catalog
        from quickwit_spark.index.merge import garbage_collect, run_merge_pipeline

        assert run_merge_pipeline(spark, index_dir)
        garbage_collect(index_dir)
        live = {s.split_id for s in Catalog(index_dir).splits()}
        docs = spark.read.parquet(f"{index_dir}/docs").toPandas()
        docs = docs[docs["split_id"].isin(live)]
    else:
        docs = spark.read.parquet(f"{index_dir}/docs").toPandas()
    oracle = OracleIndex(docs, cfg)

    from collections import Counter

    df_count: Counter = Counter()
    for t in docs["text"]:
        df_count.update({w for w in t.lower().split() if w.isalnum()})
    by_df = [w for w, _ in df_count.most_common()]
    vocab = by_df[:3] + by_df[len(by_df) // 2 : len(by_df) // 2 + 6] + by_df[-3:]
    vocab += ["zzznotaword"]
    _STATE.update(
        oracle=oracle,
        cfg=cfg,
        index_dir=index_dir,
        docs=docs,
        vocab=vocab,
        roles=sorted(docs["role"].unique()),
    )
    return index_dir


@st.composite
def _queries(draw):
    if draw(st.integers(0, 7)) == 0:
        return "*"
    word = st.sampled_from(_STATE["vocab"])
    parts = [draw(word)]
    for _ in range(draw(st.integers(0, 2))):
        op = draw(st.sampled_from([" AND ", " OR ", " ", " NOT "]))
        nxt = (
            f"role:{draw(st.sampled_from(_STATE['roles']))}"
            if draw(st.integers(0, 3)) == 0
            else draw(word)
        )
        parts.append(op + nxt)
    return "".join(parts)


@st.composite
def _requests(draw):
    kw = dict(query=draw(_queries()), max_hits=10)
    if draw(st.booleans()):
        lo = draw(st.integers(0, 60))
        kw["start_timestamp"] = EPOCH + lo * DAY
        kw["end_timestamp"] = EPOCH + (lo + draw(st.integers(1, 50))) * DAY
    return SearchRequest(**kw)


def _matched_docs(req: SearchRequest):
    """Pandas sub-frame of the docs matching ``req`` — match set from the
    pure-Python oracle, timestamp window lo-inclusive / hi-exclusive (the
    engine's leaf convention)."""
    oracle, docs = _STATE["oracle"], _STATE["docs"]
    ast = parse_query(req.query, _STATE["cfg"], req.search_fields)
    matched = oracle._eval(ast)
    keys = docs.apply(lambda r: (r["split_id"], int(r["doc_id"])), axis=1)
    mask = keys.isin(matched)
    if req.start_timestamp is not None:
        mask &= docs["ts_epoch"] >= req.start_timestamp
    if req.end_timestamp is not None:
        mask &= docs["ts_epoch"] < req.end_timestamp
    return docs[mask]


def _terms_oracle(mdf, field: str, size):
    col = _DOC_COL[field]
    counts: dict = {}
    for v in mdf[col]:
        v = int(v) if col in ("ts_epoch", "turn_idx") else v
        counts[v] = counts.get(v, 0) + 1
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[: int(size)] if size is not None else ordered


def _percentiles_oracle(vals, qs):
    names = [f"p{round(q * 100)}" for q in qs]
    n = len(vals)
    if n == 0:
        return {"count": 0, **{nm: None for nm in names}}
    s = sorted(int(v) for v in vals)
    return {"count": n, **{nm: s[math.ceil(q * n) - 1] for q, nm in zip(qs, names)}}


@settings(
    max_examples=int(os.environ.get("QW_FUZZ_EXAMPLES", "30")) // 2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    req=_requests(),
    interval_days=st.one_of(st.none(), st.sampled_from([1, 7, 30])),
    terms_field=st.one_of(st.none(), st.sampled_from(["role", "tool", "turn_idx"])),
    terms_size=st.sampled_from([3, 10, None]),
    with_terms_metric=st.booleans(),
    stats_field=st.one_of(st.none(), st.sampled_from(["turn_idx", "ts"])),
    stats_extended=st.booleans(),
    pct_field=st.one_of(st.none(), st.sampled_from(["turn_idx", "ts"])),
    card_field=st.one_of(st.none(), st.sampled_from(["role", "tool", "turn_idx"])),
)
def test_random_agg_multi_matches_pandas_oracle(
    spark,
    built,
    req,
    interval_days,
    terms_field,
    terms_size,
    with_terms_metric,
    stats_field,
    stats_extended,
    pct_field,
    card_field,
):
    if (interval_days, terms_field, stats_field, pct_field, card_field) == (
        None,
    ) * 5:
        stats_field = "turn_idx"  # at least one aggregation per request
    metric = "turn_idx" if (with_terms_metric and terms_field is not None) else None
    got = search_agg_multi(
        spark,
        built,
        req,
        histogram_interval=interval_days * DAY if interval_days else None,
        terms_field=terms_field,
        terms_size=terms_size,
        terms_metric_field=metric,
        stats_field=stats_field,
        stats_extended=stats_extended and stats_field is not None,
        percentiles_field=pct_field,
        cardinality_field=card_field,
    )
    mdf = _matched_docs(req)
    label = f"req={req} aggs={sorted(got)}"

    if interval_days:
        iv = interval_days * DAY
        buckets: dict = {}
        for v in mdf["ts_epoch"]:
            b = (int(v) // iv) * iv
            buckets[b] = buckets.get(b, 0) + 1
        assert got["histogram"] == sorted(buckets.items()), label
    if terms_field is not None:
        assert got["terms"] == _terms_oracle(mdf, terms_field, terms_size), label
    if metric is not None:
        groups: dict = {}
        tcol, mcol = _DOC_COL[terms_field], _DOC_COL[metric]
        for tv, mv in zip(mdf[tcol], mdf[mcol]):
            tv = int(tv) if tcol in ("ts_epoch", "turn_idx") else tv
            groups.setdefault(tv, []).append(int(mv))
        want = [
            {
                "value": tv,
                "doc_count": len(ms),
                "min": min(ms),
                "max": max(ms),
                "sum": sum(ms),
                "avg": round(sum(ms) / len(ms), 4),
            }
            for tv, ms in sorted(
                groups.items(), key=lambda kv: (-len(kv[1]), kv[0])
            )
        ]
        if terms_size is not None:
            want = want[: int(terms_size)]
        assert got["terms_stats"] == want, label
    if stats_field is not None:
        vals = [int(v) for v in mdf[_DOC_COL[stats_field]]]
        want_stats = {
            "count": len(vals),
            "min": min(vals) if vals else None,
            "max": max(vals) if vals else None,
            "sum": sum(vals) if vals else None,
            "avg": round(sum(vals) / len(vals), 4) if vals else None,
        }
        if stats_extended:
            # same exact-integer core the engine uses: one double division
            import math

            n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
            if n == 0:
                want_stats.update(
                    sum_of_squares=None, variance=None, std_deviation=None
                )
            else:
                var = float(n * ss - s * s) / float(n * n)
                want_stats.update(
                    sum_of_squares=float(ss),
                    variance=round(var, 4),
                    std_deviation=round(math.sqrt(var), 4),
                )
        assert got["stats"] == want_stats, label
    if pct_field is not None:
        want_p = _percentiles_oracle(
            list(mdf[_DOC_COL[pct_field]]), (0.5, 0.9, 0.99)
        )
        assert got["percentiles"] == want_p, label
    if card_field is not None:
        col = mdf[_DOC_COL[card_field]]
        assert got["cardinality"] == {
            "count": len(col),
            "cardinality": int(col.nunique()),
        }, label


@settings(
    max_examples=int(os.environ.get("QW_FUZZ_EXAMPLES", "30")) // 3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    req=_requests(),
    ckey=st.sampled_from(["conv_id", "role", "tool", "turn_idx"]),
    k=st.integers(1, 6),
    offset=st.integers(0, 3),
)
def test_random_collapse_matches_python_oracle(spark, built, req, ckey, k, offset):
    """Field collapse vs a python oracle: per-group best BM25 (the
    OracleIndex scorer), groups ranked by best score with the engine's
    (score desc, split_id, doc_id) tie-break, offset/limit applied."""
    import dataclasses

    from quickwit_spark.search.executor import search_collapse
    from quickwit_spark.search.parser import parse_query, positive_term_weights

    oracle, docs, cfg = _STATE["oracle"], _STATE["docs"], _STATE["cfg"]
    req = dataclasses.replace(req, max_hits=k, start_offset=offset)
    got = search_collapse(spark, built, req, ckey).collect()

    mdf = _matched_docs(req)
    ast = parse_query(req.query, cfg, req.search_fields)
    weights = positive_term_weights(ast)
    groups: dict = {}
    for _, row in mdf.iterrows():
        key = (row["split_id"], int(row["doc_id"]))
        cval = int(row[ckey]) if ckey == "turn_idx" else row[ckey]
        # AllQuery ('*') scores constant 1.0 like the engine's scored stream
        s = 1.0 if req.query == "*" else oracle._score(key, weights)
        groups.setdefault(cval, []).append((s, key))
    reps = []
    for cval, items in groups.items():
        s, key = sorted(items, key=lambda t: (-t[0], t[1][0], t[1][1]))[0]
        reps.append((s, key, cval, len(items)))
    reps.sort(key=lambda t: (-t[0], t[1][0], t[1][1]))
    want = reps[offset : offset + k]

    assert len(got) == len(want), f"req={req} ckey={ckey}"
    for g, (s, key, cval, n) in zip(got, want):
        assert g[ckey] == cval and g["group_hits"] == n, f"req={req} ckey={ckey}"
        assert (g["split_id"], g["doc_id"]) == key, f"req={req} ckey={ckey}"
        assert abs(g["score"] - s) < 1e-6 * max(1.0, abs(s)), f"req={req}"


@settings(
    max_examples=int(os.environ.get("QW_FUZZ_EXAMPLES", "30")) // 3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    req=_requests(),
    field=st.sampled_from(["ts", "turn_idx"]),
    edges_days=st.lists(st.integers(0, 90), min_size=1, max_size=4, unique=True),
)
def test_random_agg_range_matches_pandas_oracle(spark, built, req, field, edges_days):
    edges = sorted(
        EPOCH + d * DAY if field == "ts" else d for d in edges_days
    )
    rows = search_agg_range(spark, built, req, field, edges).collect()
    got = [
        (None if r["lo"] is None else int(r["lo"]),
         None if r["hi"] is None else int(r["hi"]),
         int(r["doc_count"]))
        for r in rows
    ]
    mdf = _matched_docs(req)
    counts: dict = {}
    for v in mdf[_DOC_COL[field]]:
        v = int(v)
        ordinal = sum(v >= e for e in edges)
        counts[ordinal] = counts.get(ordinal, 0) + 1
    want = [
        (edges[o - 1] if o > 0 else None,
         edges[o] if o < len(edges) else None,
         c)
        for o, c in sorted(counts.items())
    ]
    assert got == want, f"req={req} field={field} edges={edges}"
