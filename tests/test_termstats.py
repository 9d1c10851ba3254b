"""Term-stats LSM tests: publish-time deltas carry exact global doc_freq,
merge rounds compact them, incomplete catalogs fall back to the per-split
postings scan, and demux/merge never change global df (zero-sum)."""

import json
import os

import pyarrow.dataset as pads
import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.functions.tokenizer import tokenize_text
from quickwit_spark.index.builder import build_index
from quickwit_spark.index.catalog import Catalog
from quickwit_spark.index.merge import garbage_collect, run_merge_pipeline
from quickwit_spark.search import executor as ex

TERMS = {("text", "the"), ("text", "deploy"), ("role", "user"), ("text", "zzz-missing")}


@pytest.fixture(scope="module")
def corpus():
    return generate_transcripts(n_conversations=40, seed=7)


def _build(spark, pdf, tmpdir, **kw):
    cfg = transcripts_config(split_num_docs_target=300, segment_num_docs_target=64)
    return cfg, build_index(spark, spark.createDataFrame(pdf), cfg, tmpdir, **kw)


def _df_from_postings(index_dir: str, cat: Catalog, terms) -> dict:
    """Ground truth the old way: sum doc_freq over every split's postings."""
    files = [
        f
        for s in cat.splits()
        for f in ex._split_files(index_dir, "postings", s.split_id)
    ]
    tbl = pads.dataset(files, format="parquet").to_table(
        columns=["field", "term", "doc_freq"]
    )
    pdf = tbl.to_pandas()
    sums = pdf.groupby(["field", "term"])["doc_freq"].sum()
    return {t: int(sums.get(t, 0)) for t in terms}


def _gstats_df(spark, index_dir: str, terms) -> dict:
    ex._GSTATS_CACHE.clear()
    cat, config = ex.open_index(spark, index_dir)
    buckets = ex.term_buckets(spark, set(terms), config.term_merge_buckets)
    return ex.global_term_stats(spark, index_dir, cat, set(terms), buckets)["df"]


def test_delta_matches_postings_and_corpus(spark, corpus, tmp_index_dir):
    _build(spark, corpus, tmp_index_dir)
    cat = Catalog(tmp_index_dir)
    files = cat.termstats_files()
    assert files is not None and len(files) == 1 and os.path.exists(files[0])

    got = _gstats_df(spark, tmp_index_dir, TERMS)
    assert got == _df_from_postings(tmp_index_dir, cat, TERMS)
    # corpus-level ground truth for one term: docs whose token set has it
    expect_deploy = sum("deploy" in set(tokenize_text(t)) for t in corpus["text"])
    assert got[("text", "deploy")] == expect_deploy
    assert got[("text", "zzz-missing")] == 0


def test_fallback_when_incomplete(spark, corpus, tmp_index_dir):
    _build(spark, corpus, tmp_index_dir)
    via_delta = _gstats_df(spark, tmp_index_dir, TERMS)

    # simulate a catalog written before the LSM existed
    cat = Catalog(tmp_index_dir)
    cat._state.pop("termstats")
    cat._save()
    cat = Catalog(tmp_index_dir)
    assert cat.termstats_files() is None
    assert _gstats_df(spark, tmp_index_dir, TERMS) == via_delta


def test_publish_without_delta_marks_incomplete(tmp_index_dir):
    from quickwit_spark.index.catalog import SplitMetadata

    cat = Catalog.create(tmp_index_dir, {"x": 1})
    cat.stage_split(SplitMetadata(split_id="s1", num_docs=5))
    cat.publish_splits(["s1"], {"p0": (None, "1")})
    assert Catalog(tmp_index_dir).termstats_files() is None


def test_merge_compacts_and_preserves_df(spark, corpus, tmp_index_dir):
    half = len(corpus) // 2
    _build(spark, corpus.iloc[:half], tmp_index_dir, build_id="b0")
    _build(spark, corpus.iloc[half:], tmp_index_dir, build_id="b1")
    cat = Catalog(tmp_index_dir)
    assert len(cat.termstats_files()) == 2
    before = _gstats_df(spark, tmp_index_dir, TERMS)

    run_merge_pipeline(spark, tmp_index_dir)
    garbage_collect(tmp_index_dir)
    cat = Catalog(tmp_index_dir)
    files = cat.termstats_files()
    assert len(files) == 1  # compacted
    after = _gstats_df(spark, tmp_index_dir, TERMS)
    assert after == before == _df_from_postings(tmp_index_dir, cat, TERMS)
    # GC swept everything uncommitted out of termstats_deltas/
    ddir = os.path.join(tmp_index_dir, "termstats_deltas")
    assert sorted(os.listdir(ddir)) == [os.path.basename(files[0])]


def test_demux_is_zero_sum(spark, corpus, tmp_index_dir):
    from quickwit_spark.index.merge import execute_demux

    _build(spark, corpus, tmp_index_dir)
    cat = Catalog(tmp_index_dir)
    before = _gstats_df(spark, tmp_index_dir, TERMS)
    deltas_before = list(cat._state["termstats"]["deltas"])

    execute_demux(spark, tmp_index_dir, [s.split_id for s in cat.splits()], "tool")
    garbage_collect(tmp_index_dir)
    cat = Catalog(tmp_index_dir)
    assert cat._state["termstats"]["deltas"] == deltas_before
    after = _gstats_df(spark, tmp_index_dir, TERMS)
    assert after == before == _df_from_postings(tmp_index_dir, cat, TERMS)


def test_spark_aggregation_path(spark, corpus, tmp_index_dir, monkeypatch):
    monkeypatch.setenv("QW_TERMSTATS_DRIVER_MAX_MB", "0")  # force the Spark path
    _build(spark, corpus, tmp_index_dir)
    cat = Catalog(tmp_index_dir)
    files = cat.termstats_files()
    assert len(files) == 1 and os.path.isdir(files[0])  # dir of parts
    got = _gstats_df(spark, tmp_index_dir, TERMS)
    assert got == _df_from_postings(tmp_index_dir, cat, TERMS)


def test_catalog_json_roundtrips(tmp_index_dir):
    cat = Catalog.create(tmp_index_dir, {"x": 1})
    with open(cat.path) as f:
        state = json.load(f)
    assert state["termstats"] == {"deltas": [], "complete": True}


class _Boom(Exception):
    pass


def test_lifecycle_df_consistency(spark, corpus, tmp_index_dir):
    """Global df stays exact through the whole lifecycle: multi-wave build
    killed between waves (orphan delta + partial publish), resume, second
    build, merge+GC — the double-count traps of an LSM with crash-retry."""

    def check():
        cat = Catalog(tmp_index_dir)
        got = _gstats_df(spark, tmp_index_dir, TERMS)
        assert got == _df_from_postings(tmp_index_dir, cat, TERMS)
        assert cat.termstats_files() is not None

    cfg = transcripts_config(split_num_docs_target=150, segment_num_docs_target=64)
    df = spark.createDataFrame(corpus)

    def failpoint(wave_idx):
        if wave_idx == 1:
            raise _Boom()

    with pytest.raises(_Boom):
        build_index(spark, df, cfg, tmp_index_dir, wave_size=1, failpoint=failpoint)
    check()  # partial publish: deltas cover exactly the published waves

    build_index(spark, df, cfg, tmp_index_dir, wave_size=1)  # resume
    check()

    more = generate_transcripts(n_conversations=15, seed=77)
    more["conv_id"] = more["conv_id"] + "-x"
    build_index(spark, spark.createDataFrame(more), cfg, tmp_index_dir, build_id="b1")
    check()

    run_merge_pipeline(spark, tmp_index_dir)
    garbage_collect(tmp_index_dir)
    check()
    assert len(Catalog(tmp_index_dir).termstats_files()) == 1  # compacted


def test_gc_grace_period_spares_young_orphan_deltas(
    spark, corpus, tmp_index_dir, monkeypatch
):
    """A freshly written unreferenced delta may belong to a publish whose
    catalog commit is in flight — GC must leave it alone until the grace
    period passes (deleting it would silently zero that batch's df)."""
    import os

    from quickwit_spark.index.merge import garbage_collect

    cfg = transcripts_config(split_num_docs_target=150, segment_num_docs_target=64)
    build_index(spark, spark.createDataFrame(corpus), cfg, tmp_index_dir)
    ddir = os.path.join(tmp_index_dir, "termstats_deltas")
    orphan = os.path.join(ddir, "in-flight-publish.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not-yet-committed")
    garbage_collect(tmp_index_dir)  # default grace: young orphan survives
    assert os.path.exists(orphan)
    monkeypatch.setenv("QW_GC_GRACE_SECS", "0")
    garbage_collect(tmp_index_dir)  # past the grace period: swept
    assert not os.path.exists(orphan)


def test_concurrent_compaction_loser_aborts_cleanly(spark, corpus, tmp_index_dir):
    """Two compactions planned from the same delta list must not BOTH
    commit a full-sum compacted delta (that doubles every term's global
    doc_freq).  The loser's catalog commit is rejected and its orphan
    output file is dropped; global stats stay exact."""
    from quickwit_spark.index.merge import compact_termstats_deltas

    half = len(corpus) // 2
    _build(spark, corpus.iloc[:half], tmp_index_dir, build_id="b0")
    _build(spark, corpus.iloc[half:], tmp_index_dir, build_id="b1")
    cat = Catalog(tmp_index_dir)
    stale = list(cat._state["termstats"]["deltas"])
    assert len(stale) == 2
    before = _gstats_df(spark, tmp_index_dir, TERMS)

    # winner compacts for real
    assert compact_termstats_deltas(spark, tmp_index_dir) is not None
    # loser: planned from the stale snapshot — direct catalog commit rejected
    with pytest.raises(ValueError, match="concurrent compaction"):
        Catalog(tmp_index_dir).compact_termstats("termstats_deltas/loser", stale)
    # and the high-level entry aborts as a no-op (single delta: nothing to do)
    assert compact_termstats_deltas(spark, tmp_index_dir) is None

    cat = Catalog(tmp_index_dir)
    assert len(cat.termstats_files()) == 1
    assert _gstats_df(spark, tmp_index_dir, TERMS) == before
    ddir = os.path.join(tmp_index_dir, "termstats_deltas")
    assert sorted(os.listdir(ddir)) == [os.path.basename(cat.termstats_files()[0])]
