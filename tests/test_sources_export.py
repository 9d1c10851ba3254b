"""Sources (§2.1: NDJSON/vec) and search-stream export formats (§2.5:
CSV / RowBinary with partition-by) — reference file_source.rs,
search_stream/leaf.rs:140-237."""

import datetime
import json
import os

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import export_stream, search_stream
from quickwit_spark.search.request import SearchRequest
from quickwit_spark.sources import read_ndjson, vec_source

CFG = transcripts_config(split_num_docs_target=500, segment_num_docs_target=128)


def test_ndjson_source_roundtrip(spark, tmp_path):
    pdf = generate_transcripts(n_conversations=8, seed=31)
    path = str(tmp_path / "docs.ndjson")
    with open(path, "w") as f:
        for r in pdf.itertuples(index=False):
            f.write(json.dumps({
                "conv_id": r.conv_id, "turn_idx": int(r.turn_idx), "role": r.role,
                "text": r.text, "tool": r.tool,
                "ts": r.ts.strftime("%Y-%m-%dT%H:%M:%S"),
                "unknown_field": "dropped silently",
            }) + "\n")
        f.write("this is not json\n")  # NotJson analog: counted, not fatal
    df = read_ndjson(spark, path)
    assert "unknown_field" not in df.columns
    idx = str(tmp_path / "idx")
    report = build_index(spark, df, CFG, idx)
    assert report.total_docs == len(pdf)
    assert report.invalid_docs == 1  # the malformed line


def test_vec_source(spark, tmp_path):
    pdf = generate_transcripts(n_conversations=3, seed=7)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    df = vec_source(spark, pdf)
    idx = str(tmp_path / "idx")
    report = build_index(spark, df, CFG, idx)
    assert report.total_docs == len(pdf)


@pytest.fixture(scope="module")
def small_idx(spark, tmp_path_factory):
    pdf = generate_transcripts(n_conversations=30, seed=42)
    idx = str(tmp_path_factory.mktemp("exp") / "idx")
    build_index(spark, spark.createDataFrame(pdf), CFG, idx)
    return idx


def test_export_csv_matches_stream(spark, small_idx):
    req = SearchRequest("error")
    stream = search_stream(spark, small_idx, req, "ts").toPandas()
    csv = export_stream(spark, small_idx, req, "ts", "csv").toPandas()
    assert sorted(csv["ts"]) == sorted(stream["ts"])


def test_export_rowbinary_partitioned(spark, small_idx):
    req = SearchRequest("error")
    stream = search_stream(spark, small_idx, req, "ts")
    docs = spark.read.parquet(f"{small_idx}/docs").select("split_id", "doc_id", "role")
    expected = stream.join(docs, ["split_id", "doc_id"]).toPandas()

    out = export_stream(spark, small_idx, req, "ts", "rowbinary", partition_by="role").toPandas()
    assert sorted(out["role"]) == sorted(expected["role"].unique())
    for r in out.itertuples(index=False):
        vals = np.frombuffer(r.payload, dtype="<i8")
        assert len(vals) == r.n
        want = np.sort(expected[expected["role"] == r.role]["ts"].to_numpy(np.int64))
        assert np.array_equal(vals, want)


def test_export_join_is_partition_pruned(spark, tmp_path_factory):
    """The partition-by export's doc-store scan must prune to the query's
    candidate splits: split_id is the partition column, so the isin shows
    up as PartitionFilters in the physical plan (Catalyst partition
    pruning — the split-pruning analog on the DataFrame path)."""
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.search.executor import export_stream
    from quickwit_spark.search.request import SearchRequest

    pdf = generate_transcripts(n_conversations=20, seed=31)
    idx = str(tmp_path_factory.mktemp("exp-idx"))
    cfg = transcripts_config(split_num_docs_target=150, segment_num_docs_target=64)
    build_index(spark, spark.createDataFrame(pdf), cfg, idx)

    df = export_stream(spark, idx, SearchRequest("deploy"), "ts", "csv", partition_by="role")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln and "/docs" in ln]
    assert scan_lines, plan
    assert any("PartitionFilters: [" in ln and "split_id" in ln for ln in scan_lines), scan_lines
    # column pruning: only the 3 needed columns reach the scan
    assert any("[doc_id" in ln and "role" in ln and "text" not in ln for ln in scan_lines), scan_lines


def test_table_source_matches_parquet(spark, tmp_path):
    """The north-rule input is 'an Iceberg table of transcript turns' —
    in Spark that is a catalog table read.  read_transcripts_table's
    'table' path (what a catalog-registered Iceberg table resolves
    through) must see exactly what the parquet path sees, and an index
    built from it must match."""
    from quickwit_spark.sources import read_transcripts_table

    pdf = generate_transcripts(n_conversations=10, seed=3)
    pq = str(tmp_path / "turns.parquet")
    spark.createDataFrame(pdf).write.parquet(pq)
    spark.read.parquet(pq).createOrReplaceTempView("turns_v")

    via_table = read_transcripts_table(spark, "turns_v")  # auto → table
    via_parquet = read_transcripts_table(spark, pq)  # auto → parquet
    assert via_table.count() == via_parquet.count() == len(pdf)
    assert via_table.schema == via_parquet.schema

    cfg = transcripts_config(split_num_docs_target=200)
    idx = str(tmp_path / "idx_table")
    rep = build_index(spark, via_table, cfg, idx, build_id="b0")
    assert rep.total_docs == len(pdf)

    with pytest.raises(ValueError, match="unknown input format"):
        read_transcripts_table(spark, pq, fmt="orc")


def test_vec_source_binds_columns_by_name(spark):
    # pyspark zips pandas columns to schema fields positionally; vec_source
    # must reorder by name so shuffled dict key order can't swap the
    # same-typed string columns (conv_id/role/text/tool)
    rows = [
        {
            "text": "hello world",
            "role": "user",
            "conv_id": "c1",
            "tool": "",
            "turn_idx": 0,
            "ts": datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
        }
    ]
    out = vec_source(spark, rows).collect()[0]
    assert (out.conv_id, out.role, out.text, out.tool) == ("c1", "user", "hello world", "")


def test_ndjson_microsecond_timestamps_parse(spark, tmp_path):
    """RFC-3339 timestamps with >3 fraction digits (the engine's own
    canonical_date form) must parse, not null out as invalid — a fixed
    '[.SSS]' timestampFormat silently dropped them."""
    path = str(tmp_path / "us.ndjson")
    with open(path, "w") as f:
        f.write(json.dumps({
            "conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
            "tool": "", "ts": "2026-03-01T10:20:30.123456Z",
        }) + "\n")
    rows = read_ndjson(spark, path).collect()
    assert len(rows) == 1 and rows[0].ts is not None
    assert rows[0].ts.microsecond == 123456


def test_search_agg_histogram_and_terms(spark, small_idx):
    """Search-side aggregations equal brute-force counts over the same
    matches; the stored-column terms path must keep the doc-store scan
    split-pruned (PartitionFilters) and column-pruned."""
    import collections

    from quickwit_spark.search.executor import (
        search,
        search_agg_date_histogram,
        search_agg_terms,
    )

    req = SearchRequest("deploy")
    ts_vals = [
        r["ts"] for r in search_stream(spark, small_idx, req, "ts").collect()
    ]
    hist = {
        r["bucket"]: r["doc_count"]
        for r in search_agg_date_histogram(spark, small_idx, req, 86400).collect()
    }
    assert hist == dict(collections.Counter((t // 86400) * 86400 for t in ts_vals))

    full = search(spark, small_idx, SearchRequest("deploy", max_hits=100_000))
    want = collections.Counter(h["role"] for h in full.hits)
    terms = search_agg_terms(spark, small_idx, req, "role")
    got = {r["value"]: r["doc_count"] for r in terms.collect()}
    assert got == dict(want)
    # ordered by count desc then value; size= caps the rows
    ordered = [(r["doc_count"], r["value"]) for r in terms.collect()]
    assert ordered == sorted(ordered, key=lambda x: (-x[0], x[1]))
    assert search_agg_terms(spark, small_idx, req, "role", size=1).count() == 1

    plan = terms._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln and "/docs" in ln]
    assert any("PartitionFilters: [" in ln and "split_id" in ln for ln in scan_lines), plan
    assert any("role" in ln and "text" not in ln for ln in scan_lines), scan_lines


def test_search_agg_calendar_histogram(spark, small_idx):
    """Calendar-interval date histogram (ES calendar_interval): buckets =
    date_trunc'd UTC bucket starts — checked against brute-force datetime
    truncation of the same matches' timestamps; week starts land on
    Mondays; unknown units and interval+calendar together reject."""
    import collections
    import datetime as dt

    import pytest as _pytest

    from quickwit_spark.search.executor import (
        search_agg_date_histogram,
        search_agg_multi,
    )

    req = SearchRequest("deploy")
    ts_vals = [
        r["ts"] for r in search_stream(spark, small_idx, req, "ts").collect()
    ]

    def trunc(epoch: int, unit: str) -> int:
        d = dt.datetime.fromtimestamp(epoch, dt.timezone.utc)
        if unit == "day":
            d = d.replace(hour=0, minute=0, second=0, microsecond=0)
        elif unit == "week":  # ISO week: Monday 00:00
            d = d.replace(hour=0, minute=0, second=0, microsecond=0)
            d -= dt.timedelta(days=d.weekday())
        elif unit == "month":
            d = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        return int(d.timestamp())

    for unit in ("day", "week", "month"):
        got = {
            r["bucket"]: r["doc_count"]
            for r in search_agg_date_histogram(
                spark, small_idx, req, calendar=unit
            ).collect()
        }
        assert got == dict(collections.Counter(trunc(t, unit) for t in ts_vals)), unit
    # the fused multi path produces the same buckets
    multi = search_agg_multi(spark, small_idx, req, histogram_calendar="month")
    assert dict(multi["histogram"]) == dict(
        collections.Counter(trunc(t, "month") for t in ts_vals)
    )
    with _pytest.raises(ValueError, match="calendar must be one of"):
        search_agg_date_histogram(spark, small_idx, req, calendar="fortnight")
    with _pytest.raises(ValueError, match="not both"):
        search_agg_date_histogram(spark, small_idx, req, 100, calendar="day")
    with _pytest.raises(ValueError, match="either"):
        search_agg_multi(
            spark, small_idx, req, histogram_interval=100, histogram_calendar="day"
        )

    from quickwit_spark.search.executor import search_agg_terms

    with _pytest.raises(ValueError, match="neither fast nor stored"):
        search_agg_terms(spark, small_idx, req, "nosuchcol")


def test_search_agg_multi_matches_individual_aggs(spark, small_idx):
    """The fused one-leaf-pass aggregation path returns exactly what the
    per-aggregation functions return (histogram + stored-column terms +
    stats over ts and turn_idx, all from one persisted match stream)."""
    from quickwit_spark.search.executor import (
        search_agg_date_histogram,
        search_agg_multi,
        search_agg_stats,
        search_agg_terms,
    )

    req = SearchRequest("deploy")
    multi = search_agg_multi(
        spark,
        small_idx,
        req,
        histogram_interval=86400,
        terms_field="role",
        terms_size=None,
        stats_field="turn_idx",
    )
    hist = sorted(
        (int(r["bucket"]), int(r["doc_count"]))
        for r in search_agg_date_histogram(spark, small_idx, req, 86400).collect()
    )
    assert multi["histogram"] == hist
    terms = [
        (r["value"], int(r["doc_count"]))
        for r in search_agg_terms(spark, small_idx, req, "role").collect()
    ]
    assert multi["terms"] == terms
    st = search_agg_stats(spark, small_idx, req, "turn_idx").collect()[0]
    assert multi["stats"] == {
        "count": st["doc_count"],
        "min": st["min"],
        "max": st["max"],
        "sum": st["sum"],
        "avg": st["avg"],
    }

    # fast-field terms path (ts is the declared timestamp field)
    m2 = search_agg_multi(spark, small_idx, req, terms_field="turn_idx", terms_size=3)
    t2 = [
        (r["value"], int(r["doc_count"]))
        for r in search_agg_terms(spark, small_idx, req, "turn_idx", size=3).collect()
    ]
    assert m2["terms"] == t2 and set(m2) == {"terms"}

    # nested terms_stats rides the same fused leaf (stored terms + fast metric)
    from quickwit_spark.search.executor import search_agg_terms_stats

    m3 = search_agg_multi(
        spark, small_idx, req,
        terms_field="role", terms_size=None, terms_metric_field="turn_idx",
    )
    expect = [
        r.asDict()
        for r in search_agg_terms_stats(
            spark, small_idx, req, "role", "turn_idx"
        ).collect()
    ]
    assert m3["terms_stats"] == expect
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires terms_field"):
        search_agg_multi(spark, small_idx, req, terms_metric_field="turn_idx")


def test_search_agg_terms_stats(spark, small_idx):
    """Terms buckets with nested metric stats equal brute-force per-bucket
    reduction over the full hit set (stored terms, fast metric)."""
    import collections

    from quickwit_spark.search.executor import search, search_agg_terms_stats

    req = SearchRequest("deploy")
    full = search(spark, small_idx, SearchRequest("deploy", max_hits=100_000))
    by_role = collections.defaultdict(list)
    for h in full.hits:
        by_role[h["role"]].append(h["turn_idx"])
    rows = search_agg_terms_stats(
        spark, small_idx, req, "role", "turn_idx"
    ).collect()
    assert len(rows) == len(by_role)
    for r in rows:
        vs = by_role[r["value"]]
        assert (r["doc_count"], r["min"], r["max"], r["sum"]) == (
            len(vs), min(vs), max(vs), sum(vs),
        )
        assert r["avg"] == round(sum(vs) / len(vs), 4)
    counts = [(r["doc_count"], r["value"]) for r in rows]
    assert counts == sorted(counts, key=lambda x: (-x[0], x[1]))
    # fast-terms path: group by turn_idx, metric ts
    rows2 = search_agg_terms_stats(
        spark, small_idx, req, "turn_idx", "ts", size=5
    ).collect()
    assert len(rows2) == 5
    by_turn = collections.Counter(h["turn_idx"] for h in full.hits)
    for r in rows2:
        assert r["doc_count"] == by_turn[r["value"]]


def test_search_agg_range_and_top_hits(spark, small_idx):
    """Range buckets partition the match set exactly (lo inclusive, hi
    exclusive, open ends NULL); top_hits returns each bucket's k best
    sort values with ranks 1..k."""
    import collections

    import pytest

    from quickwit_spark.search.executor import (
        search,
        search_agg_range,
        search_agg_top_hits,
    )

    req = SearchRequest("deploy")
    full = search(spark, small_idx, SearchRequest("deploy", max_hits=100_000))
    vals = [h["turn_idx"] for h in full.hits]

    edges = [2, 5]
    rows = search_agg_range(spark, small_idx, req, "turn_idx", edges).collect()
    exp: dict = collections.Counter()
    for v in vals:
        o = sum(v >= e for e in edges)
        exp[(edges[o - 1] if o else None, edges[o] if o < len(edges) else None)] += 1
    assert {(r["lo"], r["hi"]): r["doc_count"] for r in rows} == dict(exp)
    assert sum(r["doc_count"] for r in rows) == len(vals)
    with pytest.raises(ValueError, match="strictly increasing"):
        search_agg_range(spark, small_idx, req, "turn_idx", [5, 2])

    by_role = collections.defaultdict(list)
    for h in full.hits:
        by_role[h["role"]].append(h["turn_idx"])
    out = search_agg_top_hits(spark, small_idx, req, "role", "turn_idx", 2)
    got = collections.defaultdict(list)
    for r in out.collect():
        got[r["value"]].append((r["rank"], r["sort_value"]))
    assert set(got) == set(by_role)
    for role, pairs in got.items():
        k = min(2, len(by_role[role]))
        assert [rk for rk, _ in pairs] == list(range(1, k + 1))
        assert [sv for _, sv in pairs] == sorted(by_role[role], reverse=True)[:k]
    # ascending: rank 1 is each bucket's minimum
    asc = search_agg_top_hits(spark, small_idx, req, "role", "turn_idx", 1, asc=True)
    assert {r["value"]: r["sort_value"] for r in asc.collect()} == {
        role: min(vs) for role, vs in by_role.items()
    }


def test_search_agg_cardinality(spark, small_idx):
    """Exact distinct count over matches: stored column (role) and fast
    field (turn_idx), standalone and through the fused multi path."""
    import collections

    from quickwit_spark.search.executor import (
        search,
        search_agg_cardinality,
        search_agg_multi,
    )

    req = SearchRequest("deploy")
    full = search(spark, small_idx, SearchRequest("deploy", max_hits=100_000))
    roles = collections.Counter(h["role"] for h in full.hits)
    row = search_agg_cardinality(spark, small_idx, req, "role").collect()[0]
    assert row["doc_count"] == len(full.hits)
    assert row["cardinality"] == len(roles)

    turn_card = len({h["turn_idx"] for h in full.hits})
    multi = search_agg_multi(spark, small_idx, req, cardinality_field="turn_idx")
    assert multi["cardinality"] == {
        "count": len(full.hits), "cardinality": turn_card,
    }
    m_stored = search_agg_multi(spark, small_idx, req, cardinality_field="role")
    assert m_stored["cardinality"] == {
        "count": len(full.hits), "cardinality": len(roles),
    }


def test_search_agg_percentiles_exact(spark, small_idx):
    """Percentiles equal the brute-force inverse-CDF over the sorted match
    values, and the two-level histogram kernel handles negative values,
    coarse-bucket boundaries, and empty inputs."""
    import math

    from quickwit_spark.search.executor import (
        _exact_percentiles,
        search_agg_multi,
        search_agg_percentiles,
    )

    req = SearchRequest("deploy")
    vals = sorted(
        r["ts"] for r in search_stream(spark, small_idx, req, "ts").collect()
    )
    row = search_agg_percentiles(spark, small_idx, req, "ts").collect()[0]
    assert row["doc_count"] == len(vals)
    for q, name in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        assert row[name] == vals[math.ceil(q * len(vals)) - 1], name

    multi = search_agg_multi(spark, small_idx, req, percentiles_field="ts")
    assert multi["percentiles"] == {
        "count": row["doc_count"], "p50": row["p50"],
        "p90": row["p90"], "p99": row["p99"],
    }

    # kernel: negatives + values straddling the 2^16 coarse-bucket edge
    raw = [-70000, -70000, -1, 0, 1, 65535, 65536, 65537, 10**12]
    df = spark.createDataFrame([(v,) for v in raw], "x long")
    n, pcts = _exact_percentiles(df, "x", (0.01, 0.5, 1.0))
    s = sorted(raw)
    assert n == len(raw)
    assert pcts == {
        "p1": s[math.ceil(0.01 * n) - 1],
        "p50": s[math.ceil(0.5 * n) - 1],
        "p100": s[-1],
    }
    n0, p0 = _exact_percentiles(df.filter("x > 1e15"), "x", (0.5,))
    assert n0 == 0 and p0 == {"p50": None}


def test_search_agg_significant_terms(spark, small_idx):
    """significant_terms equals the brute-force JLH computation over the
    match set vs the whole corpus: fg df from per-doc distinct tokens of
    the matches, bg df = corpus doc frequency (served by the term-stats
    LSM, never a corpus rescan), score = (fg% - bg%) * fg%/bg% for terms
    with fg% > bg% and fg df >= min_doc_count."""
    import collections

    from quickwit_spark.functions.tokenizer import tokenize_text
    from quickwit_spark.search.executor import (
        search,
        search_agg_multi,
        search_agg_significant_terms,
    )

    req = SearchRequest("deploy")
    full = search(spark, small_idx, SearchRequest("deploy", max_hits=100_000))
    fg_ctr = collections.Counter()
    for h in full.hits:
        fg_ctr.update(set(tokenize_text(h["text"])))
    corpus = [r["text"] for r in spark.read.parquet(f"{small_idx}/docs").select("text").collect()]
    bg_ctr = collections.Counter()
    for t in corpus:
        bg_ctr.update(set(tokenize_text(t)))
    fg_total, bg_total = len(full.hits), len(corpus)

    want = {}
    for term, fg in fg_ctr.items():
        if fg < 3:
            continue
        bg = bg_ctr[term]
        fgp, bgp = fg / float(fg_total), bg / float(bg_total)
        if fgp > bgp:
            want[term] = (fg, bg, round((fgp - bgp) * fgp / bgp, 4))

    got = {
        r["term"]: (r["fg_count"], r["bg_count"], r["score"])
        for r in search_agg_significant_terms(
            spark, small_idx, req, "text", size=None, min_doc_count=3
        ).collect()
    }
    assert set(got) == set(want)
    for term, (fg, bg, score) in want.items():
        gfg, gbg, gscore = got[term]
        assert (gfg, gbg) == (fg, bg), term
        assert gscore == pytest.approx(score, abs=1e-4), term

    # ordering + size cap; the query's own terms dominate
    top = search_agg_significant_terms(spark, small_idx, req, "text", size=3).collect()
    assert len(top) == 3 and top[0]["term"] == "deploy"
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)

    # fused multi path returns the same top rows
    multi = search_agg_multi(
        spark, small_idx, req, significant_field="text", significant_size=3
    )
    assert [b["term"] for b in multi["significant_terms"]] == [r["term"] for r in top]

    # raw-tokenized and unknown fields are clean rejections
    with pytest.raises(ValueError, match="default-tokenized"):
        search_agg_significant_terms(spark, small_idx, req, "role")
    with pytest.raises(ValueError, match="default-tokenized"):
        search_agg_significant_terms(spark, small_idx, req, "nosuchcol")


def test_search_agg_filters(spark, small_idx):
    """Named filter buckets equal independent count queries (base AND
    filter), evaluated in one batched leaf pass; empty/blank filters are
    clean rejections."""
    from quickwit_spark.search.executor import search, search_agg_filters

    got = {
        r["key"]: r["doc_count"]
        for r in search_agg_filters(
            spark,
            small_idx,
            SearchRequest("merge"),
            {"deploy": "deploy", "errorish": "error OR failure", "self": "merge"},
        ).collect()
    }
    for name, q in (
        ("deploy", "(merge) AND (deploy)"),
        ("errorish", "(merge) AND (error OR failure)"),
        ("self", "merge"),
    ):
        want = search(spark, small_idx, SearchRequest(q, max_hits=0)).num_hits
        assert got[name] == want, name
    # a filters agg with an EMPTY base query counts the filters alone
    alone = {
        r["key"]: r["doc_count"]
        for r in search_agg_filters(
            spark, small_idx, SearchRequest("merge"), {"m": "merge"}
        ).collect()
    }
    assert alone["m"] == got["self"]

    with pytest.raises(ValueError, match="non-empty"):
        search_agg_filters(spark, small_idx, SearchRequest("merge"), {})
    with pytest.raises(ValueError, match="empty query"):
        search_agg_filters(spark, small_idx, SearchRequest("merge"), {"x": " "})


def test_search_agg_extended_stats(spark, small_idx):
    """extended_stats: sum_of_squares / population variance / std over the
    matches' fast field — exact decimal squared-sum core checked against a
    first-principles integer computation over the raw stream, and the
    fused multi path returns the same values."""
    import math

    from quickwit_spark.search.executor import (
        search_agg_multi,
        search_agg_stats,
        search_stream,
    )

    req = SearchRequest("deploy")
    vals = [
        int(r["turn_idx"])
        for r in search_stream(spark, small_idx, req, "turn_idx").collect()
    ]
    n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
    assert n > 1
    var = float(n * ss - s * s) / float(n * n)
    st = search_agg_stats(spark, small_idx, req, "turn_idx", extended=True).collect()[0]
    assert st["doc_count"] == n and st["sum"] == s
    assert st["sum_of_squares"] == float(ss)
    assert st["variance"] == pytest.approx(round(var, 4), abs=1e-9)
    assert st["std_deviation"] == pytest.approx(round(math.sqrt(var), 4), abs=1e-9)

    multi = search_agg_multi(
        spark, small_idx, req, stats_field="turn_idx", stats_extended=True
    )
    assert multi["stats"]["sum_of_squares"] == float(ss)
    assert multi["stats"]["variance"] == pytest.approx(st["variance"], abs=1e-9)
    assert multi["stats"]["std_deviation"] == pytest.approx(
        st["std_deviation"], abs=1e-9
    )
