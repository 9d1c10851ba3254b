"""Snowball English (Porter2) stemmer tests — the ``stem_en`` tokenizer of
the reference config surface (field_mapping_entry.rs:604-610).  Pairs below
are hand-traced against the published algorithm (snowballstem.org)."""

import numpy as np
import pandas as pd
import pytest

from quickwit_spark.config import FieldMapping, IndexConfig
from quickwit_spark.functions.stemmer import stem, stem_factorized, stem_token_lists
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.oracle import OracleIndex
from quickwit_spark.search.request import SearchRequest

KNOWN_PAIRS = [
    # plurals / 1a
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "tie"),
    ("cries", "cri"), ("dies", "die"), ("caress", "caress"), ("cats", "cat"),
    ("abilities", "abil"), ("ability", "abil"),
    # 1b
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("hopping", "hop"), ("hoping", "hope"), ("falling", "fall"),
    ("knotting", "knot"), ("running", "run"), ("runner", "runner"),
    ("arguing", "argu"), ("argument", "argument"), ("arguments", "argument"),
    ("exceeding", "exceed"), ("bowling", "bowl"), ("filing", "file"),
    # 1c
    ("crying", "cri"), ("happy", "happi"), ("supply", "suppli"),
    ("sky", "sky"), ("say", "say"),
    # 2/3/4 chains
    ("national", "nation"), ("rational", "ration"),
    ("conditional", "condit"), ("rationalize", "ration"),
    ("generate", "generat"), ("generates", "generat"),
    ("generating", "generat"), ("generously", "generous"),
    ("visualization", "visual"), ("realization", "realiz"),
    ("communication", "communic"), ("activate", "activ"),
    ("effective", "effect"), ("quickly", "quick"),
    # classic step-4 examples
    ("revival", "reviv"), ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"), ("adoption", "adopt"),
    # step 5
    ("controlling", "control"),
    # exceptions
    ("dying", "die"), ("lying", "lie"), ("tying", "tie"), ("skis", "ski"),
    ("early", "earli"), ("only", "onli"), ("singly", "singl"),
    ("news", "news"), ("proceed", "proceed"), ("exceed", "exceed"),
    ("inning", "inning"), ("outing", "outing"),
    # short words untouched
    ("a", "a"), ("is", "is"), ("be", "be"), ("on", "on"),
]


@pytest.mark.parametrize("word,expected", KNOWN_PAIRS)
def test_known_pairs(word, expected):
    assert stem(word) == expected


def test_stem_factorized_matches_scalar():
    words = np.array(
        ["running", "runs", "ran", "runner", "quickly", "running"], dtype=object
    )
    out = stem_factorized(words)
    assert list(out) == [stem(w) for w in words]


def test_stem_token_lists():
    s = pd.Series([["running", "fast"], [], ["ponies"]])
    assert list(stem_token_lists(s)) == [["run", "fast"], [], ["poni"]]


def _stem_config():
    return IndexConfig(
        index_id="stemmed",
        field_mappings=(
            FieldMapping("text", "text", tokenizer="stem_en", record="position"),
            FieldMapping("role", "text", tokenizer="raw"),
            FieldMapping("tool", "text", tokenizer="raw"),
            FieldMapping("conv_id", "text", tokenizer="raw"),
            FieldMapping("turn_idx", "i64", fast=True),
            FieldMapping("ts", "i64", fast=True),
        ),
        timestamp_field="ts",
        default_search_fields=("text",),
        split_num_docs_target=4,
    )


def _docs():
    import datetime as dt

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    texts = [
        "the deploy is running now",
        "deploys run quickly in production",
        "she runs the deployment pipeline",
        "nothing related here at all",
        "generous allowance for replacements",
        "national rationalization of deployments",
    ]
    for i, t in enumerate(texts):
        rows.append(
            {
                "conv_id": f"c{i:02d}",
                "turn_idx": 0,
                "role": "user",
                "text": t,
                "tool": "",
                "ts": base + dt.timedelta(seconds=i),
            }
        )
    return rows


def test_stem_en_end_to_end(spark, tmp_index_dir):
    """A stem_en index matches morphological variants: query 'running'
    hits docs containing run/runs/running; rank-identical to the oracle."""
    cfg = _stem_config()
    df = spark.createDataFrame(_docs())
    build_index(spark, df, cfg, tmp_index_dir)

    docs_pdf = (
        spark.read.parquet(f"{tmp_index_dir}/docs")
        .select("split_id", "doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts_epoch")
        .toPandas()
    )
    oracle = OracleIndex(docs_pdf, cfg)

    for q in ("running", "run", "deployment", '"running deployment"', "replacement"):
        resp = search(spark, tmp_index_dir, SearchRequest(q))
        expected = oracle.search(SearchRequest(q))
        assert resp.num_hits == expected["num_hits"], q
        got = [(h["split_id"], h["doc_id"], round(h["score"], 9)) for h in resp.hits]
        want = [
            (h["split_id"], h["doc_id"], round(h["score"], 9)) for h in expected["hits"]
        ]
        assert got == want, q

    # 'running' and 'runs' stem to 'run': all three running/run/runs docs hit
    resp = search(spark, tmp_index_dir, SearchRequest("running"))
    hit_convs = {h["conv_id"] for h in resp.hits}
    assert hit_convs == {"c00", "c01", "c02"}
