"""Frozen golden results: rank + score snapshots for one query per class on
a fixed seeded corpus (SURVEY.md §5 — "freeze golden files").  The live
oracle tests prove engine==oracle; this file catches a drift that changes
BOTH (tokenizer, BM25 constants, docID assignment, tie-break) across
rounds.  Regenerate deliberately with QW_UPDATE_GOLDEN=1."""

import json
import os

import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.request import SearchRequest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "search_results.json")

CFG = transcripts_config(split_num_docs_target=250, segment_num_docs_target=64)

QUERIES = {
    "single": dict(query="deploy"),
    "and": dict(query="deploy failure"),
    "or": dict(query="error OR timeout"),
    "not": dict(query="error NOT timeout"),
    "phrase": dict(query='"the error"'),
    "field": dict(query="role:assistant error"),
    "time": dict(query="error", start_timestamp=1767225600 + 10 * 86400,
                 end_timestamp=1767225600 + 40 * 86400),
    "offset": dict(query="error", start_offset=5, max_hits=5),
    "sort_ts": dict(query="deploy", sort_by_field="ts"),
}


def _snapshot(spark, index_dir) -> dict:
    out = {}
    for name, kw in QUERIES.items():
        r = search(spark, index_dir, SearchRequest(**kw))
        out[name] = {
            "num_hits": r.num_hits,
            "hits": [
                [h["split_id"], int(h["doc_id"]), float(h["score"]), int(h["sort_value"])]
                for h in r.hits
            ],
        }
    return out


def test_golden_rank_and_scores(spark, tmp_path_factory):
    pdf = generate_transcripts(n_conversations=40, seed=7)
    index_dir = str(tmp_path_factory.mktemp("golden-idx"))
    build_index(spark, spark.createDataFrame(pdf), CFG, index_dir)
    got = _snapshot(spark, index_dir)

    if os.environ.get("QW_UPDATE_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            json.dump(got, f, indent=1, sort_keys=True)
        pytest.skip("golden file (re)generated — rerun to verify")

    with open(GOLDEN) as f:
        want = json.load(f)
    assert sorted(got) == sorted(want)
    for name in want:
        assert got[name]["num_hits"] == want[name]["num_hits"], name
        g, w = got[name]["hits"], want[name]["hits"]
        assert [(r[0], r[1], r[3]) for r in g] == [(r[0], r[1], r[3]) for r in w], name
        for gr, wr in zip(g, w):
            assert gr[2] == pytest.approx(wr[2], rel=1e-9), (name, gr, wr)
