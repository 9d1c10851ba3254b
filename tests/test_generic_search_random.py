"""Randomized differential testing over a GENERIC DocMapper schema: the
same Hypothesis harness as test_search_random.py, but the index carries
nested-object leaves, tokenized + raw array<text> fields, and typed i64 /
date term fields — engine vs the pure-Python oracle, rank + score
identity.  This is the confidence backstop for the whole DocMapper
feature: any disagreement in tokenization, array position gaps, typed
canonical terms, per-field fieldnorms, time pruning, or tie-breaks
surfaces here."""

from __future__ import annotations

import json
import os
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quickwit_spark.config import IndexConfig
from quickwit_spark.docmapper import DocMapper
from quickwit_spark.index.generic import build_index_from_ndjson
from quickwit_spark.search.executor import search
from quickwit_spark.search.oracle import OracleIndex
from quickwit_spark.search.request import SearchRequest

MAPPER = DocMapper.from_dict(
    {
        "default_search_fields": ["title", "body"],
        "timestamp_field": "created",
        "field_mappings": [
            {"name": "title", "type": "text", "record": "position"},
            {"name": "body", "type": "text", "record": "position"},
            {"name": "notes", "type": "array<text>", "record": "position"},
            {"name": "labels", "type": "array<text>", "tokenizer": "raw"},
            {"name": "created", "type": "date", "fast": True},
            {"name": "severity", "type": "i64", "fast": True, "indexed": True},
            {
                "name": "attributes",
                "type": "object",
                "field_mappings": [
                    {"name": "region", "type": "text", "tokenizer": "raw"},
                ],
            },
        ],
    }
)

WORDS = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen", "ibis", "jay"]
EPOCH = 1704067200  # 2024-01-01


def _corpus(n=150, seed=13):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        doc = {
            "title": " ".join(rng.choices(WORDS, k=rng.randint(1, 3))),
            "body": " ".join(rng.choices(WORDS, k=rng.randint(2, 9))),
            "created": f"2024-01-{1 + i % 28:02d}T{i % 24:02d}:00:00Z",
            "severity": rng.randint(0, 4),
        }
        if rng.random() < 0.8:
            doc["notes"] = [
                " ".join(rng.choices(WORDS, k=rng.randint(1, 4)))
                for _ in range(rng.randint(1, 3))
            ]
        if rng.random() < 0.7:
            doc["labels"] = [f"l{rng.randint(0, 5)}" for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.6:
            doc["attributes"] = {"region": rng.choice(["eu", "us", "ap"])}
        docs.append(json.dumps(doc))
    return docs


_STATE: dict = {}


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    nd = tmp_path_factory.mktemp("gr") / "corpus.ndjson"
    nd.write_text("\n".join(_corpus()) + "\n")
    index_dir = str(tmp_path_factory.mktemp("gr_idx"))
    report, errs = build_index_from_ndjson(
        spark, str(nd), MAPPER, index_dir,
        split_num_docs_target=40, segment_num_docs_target=16,
    )
    assert report.total_docs == 150 and not errs
    config = IndexConfig.from_dict(
        __import__("quickwit_spark.index.catalog", fromlist=["Catalog"])
        .Catalog(index_dir)
        .config_dict
    )
    docs = spark.read.parquet(f"{index_dir}/docs").toPandas()
    oracle = OracleIndex(docs, config)
    _STATE.update(oracle=oracle, index_dir=index_dir)
    return index_dir, oracle


def _clauses():
    word = st.sampled_from(WORDS + ["zzznothere"])
    two = st.builds(lambda a, b: f'"{a} {b}"', word, word)
    return st.one_of(
        word,
        two,
        st.builds(lambda w: f"title:{w}", word),
        st.builds(lambda p: f"notes:{p}", two),  # phrase on an ARRAY field
        st.builds(lambda w: f"notes:{w}", word),
        st.builds(lambda i: f"labels:l{i}", st.integers(0, 6)),
        st.builds(lambda r: f"attributes.region:{r}", st.sampled_from(["eu", "us", "ap"])),
        st.builds(lambda v: f"severity:{v}", st.integers(0, 5)),  # typed i64 term
        st.builds(
            lambda a, op, b: f"({a}{op}{b})",
            word,
            st.sampled_from([" AND ", " OR ", " "]),
            word,
        ),
        # exists over OPTIONAL generic fields (notes/labels/attributes are
        # present on only a fraction of docs; severity is always set)
        st.sampled_from(["notes:*", "labels:*", "attributes.region:*", "severity:*"]),
        # plan-time dictionary expansions over the GENERIC schema: prefix,
        # '?'-wildcard, suffix regex; raw array fields take prefixes too
        st.builds(lambda w, n: f"{w[:n]}*", word, st.integers(1, 2)),
        st.builds(lambda w: f"{w[0]}?{w[2:]}" if len(w) >= 3 else f"{w}?", word),
        st.builds(lambda w: f"/{w[:2]}[a-z]*/", word),
        st.builds(lambda i: f"labels:l{i}*", st.integers(0, 6)),
        # ordered sloppy phrase on the array<text> field (position gaps:
        # a slop window must never cross the tantivy POSITION_GAP=2
        # element boundary unless slop affords it — the oracle walks the
        # same gapped positions)
        st.builds(lambda a, b, s: f'notes:"{a} {b}"~{s}', word, word, st.integers(1, 3)),
        st.builds(lambda a, b, s: f'"{a} {b}"~{s}', word, word, st.integers(0, 2)),
    )


@st.composite
def _queries(draw):
    parts = [draw(_clauses())]
    for _ in range(draw(st.integers(0, 3))):
        op = draw(st.sampled_from([" AND ", " OR ", " ", " NOT "]))
        parts.append(op + draw(_clauses()))
    return "".join(parts)


@st.composite
def _requests(draw):
    kw = dict(query=draw(_queries()), max_hits=draw(st.integers(1, 25)))
    if draw(st.booleans()):
        kw["start_offset"] = draw(st.integers(0, 8))
    if draw(st.booleans()):
        lo = draw(st.integers(0, 25))
        kw["start_timestamp"] = EPOCH + lo * 86400
        kw["end_timestamp"] = EPOCH + (lo + draw(st.integers(1, 15))) * 86400
    if draw(st.booleans()):
        kw["sort_by_field"] = draw(st.sampled_from(["created", "severity"]))
        kw["sort_asc"] = draw(st.booleans())
    return SearchRequest(**kw)


@settings(
    max_examples=int(os.environ.get("QW_FUZZ_EXAMPLES", "30")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(req=_requests())
def test_generic_random_query_rank_identity(spark, built, req):
    index_dir, oracle = built
    resp = search(spark, index_dir, req)
    exp = oracle.search(req)
    assert resp.num_hits == exp["num_hits"], req
    got = [(h["split_id"], h["doc_id"]) for h in resp.hits]
    want = [(h["split_id"], h["doc_id"]) for h in exp["hits"]]
    assert got == want, f"req={req}\ngot:  {resp.hits}\nwant: {exp['hits']}"
    got_key = "sort_value" if req.sort_by_field is not None else "score"
    for g, w in zip(resp.hits, exp["hits"]):
        assert g[got_key] == pytest.approx(w["score"], rel=1e-6), req
