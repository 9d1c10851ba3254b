"""multi_search: Q queries in one leaf job must return results identical to
Q independent search() calls (hits, scores, num_hits)."""

import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import multi_search, search
from quickwit_spark.search.request import SearchRequest

CFG = transcripts_config(split_num_docs_target=250, segment_num_docs_target=64)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    pdf = generate_transcripts(n_conversations=60, seed=42)
    index_dir = str(tmp_path_factory.mktemp("idx-multi"))
    build_index(spark, spark.createDataFrame(pdf), CFG, index_dir)
    return index_dir, None, None

BATCH = [
    SearchRequest("deploy"),
    SearchRequest("deploy failure"),
    SearchRequest("error NOT timeout", max_hits=7),
    SearchRequest('"the error"'),
    SearchRequest("role:assistant deploy"),
    SearchRequest("deploy", start_offset=5, max_hits=5),
    SearchRequest("deploy", sort_by_field="ts"),
    SearchRequest("zzznotaword"),
]


def test_multi_search_matches_individual(spark, built):
    index_dir, _, _ = built
    batched = multi_search(spark, index_dir, BATCH)
    assert len(batched) == len(BATCH)
    for req, got in zip(BATCH, batched):
        want = search(spark, index_dir, req)
        assert got.num_hits == want.num_hits, req.query
        assert [
            (h["split_id"], h["doc_id"], h["score"], h["text"]) for h in got.hits
        ] == [(h["split_id"], h["doc_id"], h["score"], h["text"]) for h in want.hits], req.query


def test_multi_search_rejects_global_key(spark, built):
    index_dir, _, _ = built
    with pytest.raises(ValueError, match="tiebreak"):
        multi_search(spark, index_dir, [SearchRequest("a b", tiebreak="global_key")])
