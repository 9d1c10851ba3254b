"""Checkpoint / resume tests — the failpoints analog (FIXTURES.md F6;
reference quickwit-indexing/failpoints/mod.rs:20-49 and
checkpoint.rs:299-353 overlap rejection)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.index.catalog import (
    Catalog,
    IncompatibleCheckpointDelta,
    PUBLISHED,
    SplitMetadata,
)

CFG = transcripts_config(split_num_docs_target=200, segment_num_docs_target=64)


class _Boom(RuntimeError):
    pass


def _postings_signature(spark, index_dir):
    """Canonical logical content of the index: per (split, field, term)
    doc_freq/total_tf, sorted."""
    return (
        spark.read.parquet(f"{index_dir}/postings")
        .select("split_id", "field", "term", "doc_freq", "total_tf")
        .toPandas()
        .sort_values(["split_id", "field", "term"])
        .reset_index(drop=True)
    )


def test_kill_and_resume(spark, tmp_path_factory):
    pdf = generate_transcripts(n_conversations=30, seed=11)
    base = tmp_path_factory.mktemp("ckpt")
    interrupted = str(base / "interrupted")
    clean = str(base / "clean")
    df = spark.createDataFrame(pdf)

    # uninterrupted reference build
    build_index(spark, df, CFG, clean, wave_size=1)

    # killed after wave 1 of M
    def failpoint(wave_idx):
        if wave_idx == 1:
            raise _Boom()

    with pytest.raises(_Boom):
        build_index(spark, df, CFG, interrupted, wave_size=1, failpoint=failpoint)

    cat = Catalog(interrupted)
    done_before = {s.split_id for s in cat.splits([PUBLISHED])}
    assert done_before  # some waves committed
    n_ckpt_before = len(cat.checkpoint())

    # resume: (a) skips completed partitions
    report = build_index(spark, df, CFG, interrupted, wave_size=1)
    assert set(report.skipped_splits) >= done_before
    assert not (set(report.published_splits) & done_before)

    # (b) logically identical to the uninterrupted build
    sig_a = _postings_signature(spark, interrupted)
    sig_b = _postings_signature(spark, clean)
    pd.testing.assert_frame_equal(sig_a, sig_b)
    cat2 = Catalog(interrupted)
    assert sum(s.num_docs for s in cat2.splits([PUBLISHED])) == len(pdf)

    # idempotent: a third run does nothing
    report3 = build_index(spark, df, CFG, interrupted)
    assert report3.published_splits == []


def test_overlapping_delta_rejected(tmp_path):
    """(c) the IncompatibleCheckpointDelta analog (checkpoint.rs:299-353)."""
    cat = Catalog.create(str(tmp_path), {"index_id": "x"})
    cat.stage_split(SplitMetadata(split_id="s1"))
    cat.publish_splits(["s1"], {"p0": (None, "00000010")})
    # re-applying from scratch → rejected
    with pytest.raises(IncompatibleCheckpointDelta):
        cat.publish_splits(["s1"], {"p0": (None, "00000020")})
    # regression → rejected
    with pytest.raises(IncompatibleCheckpointDelta):
        cat.publish_splits(["s1"], {"p0": ("00000010", "00000005")})
    # contiguous advance → ok
    cat.stage_split(SplitMetadata(split_id="s2"))
    cat.publish_splits(["s2"], {"p0": ("00000010", "00000020")})
    assert cat.checkpoint()["p0"] == "00000020"


def test_failed_publish_is_atomic(tmp_path):
    """A publish whose delta is rejected must not publish any split."""
    cat = Catalog.create(str(tmp_path), {"index_id": "x"})
    cat.stage_split(SplitMetadata(split_id="a"))
    cat.stage_split(SplitMetadata(split_id="b"))
    cat.publish_splits(["a"], {"p0": (None, "1")})
    with pytest.raises(IncompatibleCheckpointDelta):
        cat.publish_splits(["b"], {"p0": (None, "2"), "p1": (None, "1")})
    assert {s.split_id for s in cat.splits([PUBLISHED])} == {"a"}
