"""store_source: hits carry the reserved `_source` JSON field (reference
lib.rs:43-44, default_mapper.rs:428-435; round-trip asserted against the
indexed rows)."""

import json

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.request import SearchRequest


def test_source_field_round_trips(spark, tmp_index_dir):
    cfg = transcripts_config(store_source=True, split_num_docs_target=500)
    pdf = generate_transcripts(n_conversations=10, seed=3)
    build_index(spark, spark.createDataFrame(pdf), cfg, tmp_index_dir)
    resp = search(spark, tmp_index_dir, SearchRequest("the", max_hits=5))
    assert resp.hits
    by_key = {(r.conv_id, r.turn_idx): r for r in pdf.itertuples(index=False)}
    for h in resp.hits:
        src = json.loads(h["_source"])
        row = by_key[(h["conv_id"], h["turn_idx"])]
        assert src["text"] == row.text
        assert src["role"] == row.role
        assert src["turn_idx"] == int(row.turn_idx)
        assert src["ts"].endswith("Z")


def test_source_absent_by_default(spark, tmp_index_dir):
    cfg = transcripts_config(split_num_docs_target=500)
    pdf = generate_transcripts(n_conversations=5, seed=4)
    build_index(spark, spark.createDataFrame(pdf), cfg, tmp_index_dir)
    resp = search(spark, tmp_index_dir, SearchRequest("the", max_hits=3))
    assert resp.hits and all("_source" not in h for h in resp.hits)
