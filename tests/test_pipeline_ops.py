"""Local unit tests for the training-data pipeline ops (dedup, text
analysis, multimodal plumbing) — complementing the sf0.01 driver-contract
oracles with tiny targeted fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline import dedup as dd
from quickwit_spark.pipeline import text as tx
from quickwit_spark.pipeline.multimodal import extract_features, synthesize_assets


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "The quick brown fox  jumps over the lazy dog!"),  # dup modulo case/punct
        (2, "the quick brown fox jumps over a sleepy dog"),  # near-dup (1 token)
        (3, "completely different content about spark clusters"),
        (4, ""),  # empty
        (5, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, docs):
    out = {r["fingerprint"]: r for r in dd.exact_duplicates(docs).collect()}
    groups = {r["keeper_doc_id"]: r["group_size"] for r in out.values()}
    assert groups[0] == 2  # docs 0 and 1 collapse
    assert groups[2] == 1 and groups[3] == 1


def test_fingerprint_normalizes(spark, docs):
    fp = {r["doc_id"]: r["fingerprint"] for r in tx.with_fingerprint(docs).collect()}
    assert fp[0] == fp[1] != fp[2]


def test_ngram_jaccard_and_minhash_agree(spark, docs):
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in dd.ngram_jaccard_pairs(docs, threshold_ppm=300_000, n=3).collect()
    }
    assert (0, 1) in exact and exact[(0, 1)] == 1_000_000  # identical shingle sets
    assert (0, 2) in exact  # near-dup above threshold
    mh = {
        (r["doc_a"], r["doc_b"]): r["jaccard_ppm"]
        for r in dd.minhash_lsh_pairs(docs, threshold_ppm=300_000, num_hashes=32, bands=16, n=3).collect()
    }
    # LSH output is a subset with EXACT jaccard values
    for pair, j in mh.items():
        assert exact[pair] == j
    assert (0, 1) in mh  # identical docs always collide in every band


def test_simhash_identical_and_different(spark, docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dd.simhash_pairs(docs, max_hamming=12).collect()}
    assert pairs.get((0, 1)) == 0  # same token stream → same simhash
    assert (0, 3) not in pairs  # unrelated docs


def test_lang_id_and_quality(spark, docs):
    lang = {r["doc_id"]: r["lang_pred"] for r in tx.with_lang_id(docs).collect()}
    assert lang[0] == "en" and lang[4] == "unk" and lang[5] == "unk"
    q = {r["doc_id"]: r for r in tx.with_quality_score(docs).collect()}
    assert q[0]["quality_ppm"] > q[4]["quality_ppm"]
    assert q[4]["n_tokens"] == 0 and q[4]["quality_ppm"] == 0
    tc = {r["doc_id"]: r["n_tokens"] for r in tx.with_token_count(docs).collect()}
    assert tc[0] == 9 and tc[4] == 0 and tc[5] == 1


def test_bpe_token_count(spark, docs):
    """BPE-ish pre-tokenizer counts: contractions split off, digits chunked
    to <=3, punctuation runs one token; agrees with DuckDB's RE2 evaluation
    of the same pattern (the driver-oracle contract)."""
    extra = spark.createDataFrame(
        [(10, "it's 12345 done!!"), (11, "don't")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"])
        for r in tx.with_bpe_token_count(docs.union(extra)).collect()
    }
    assert out[4] == (0, 0)
    assert out[5] == (1, 1)
    assert out[0] == (9, 9)  # pure lowercase words: one pre-token per word
    # "it's 12345 done!!" -> it / 's / 123 / 45 / done / !! = 6 bpe tokens
    assert out[10] == (3, 6)
    assert out[11] == (1, 2)  # don + 't

    import duckdb

    pdf = docs.union(extra).toPandas()
    sql = tx.bpe_token_count_sql("text")
    ora = duckdb.sql(
        f"SELECT doc_id, {sql['n_ws_tokens']} AS ws, {sql['n_bpe_tokens']} AS bpe FROM pdf"
    ).fetchall()
    assert {r[0]: (r[1], r[2]) for r in ora} == out


def test_passage_dup_stats(spark):
    """Passage dedup: cross-doc duplicated windows counted exactly; within-
    doc repetition alone doesn't flag; DuckDB differential agrees."""
    w = 3
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e f"),          # passages [a b c], [d e f]
            (1, "a b c x y z"),          # shares [a b c] with doc 0
            (2, "p q r p q r"),          # within-doc repeat only → no dup
            (3, "unique words here completely novel ones"),
            (4, ""),                      # empty → no row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"], r["dup_passage_ppm"])
        for r in dd.passage_dup_stats(corpus, window=w).collect()
    }
    assert out[0] == (2, 1, 500_000)
    assert out[1] == (2, 1, 500_000)
    assert out[2] == (2, 0, 0)  # same fp twice but only one distinct doc
    assert out[3] == (2, 0, 0)
    assert 4 not in out

    import duckdb

    corpus_pdf = corpus.toPandas()  # noqa: F841 — referenced by DuckDB SQL
    ora = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            dd.passage_dup_oracle_sql("corpus_pdf", tx.duckdb_tokens("text"), w)
        ).fetchall()
    }
    assert ora == out


def test_remove_dup_passages(spark):
    """Keep-first passage removal: the LOWEST doc_id holding a duplicated
    window keeps it, every later holder drops it; unique and within-doc-
    repeated windows survive everywhere; reconstruction preserves window
    order; DuckDB differential agrees on the rebuilt text."""
    w = 3
    corpus = spark.createDataFrame(
        [
            (0, "a b c d e f"),  # [a b c][d e f] — first holder of [a b c]
            (1, "a b c x y z"),  # drops [a b c], keeps [x y z]
            (2, "p q r p q r"),  # within-doc repeat only: keeps both
            (3, "x y z a b c"),  # drops BOTH (doc 1 holds [x y z], doc 0 [a b c])
            (4, ""),  # token-less → no row
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_passages"], r["n_kept_passages"])
        for r in dd.remove_dup_passages(corpus, window=w).collect()
    }
    assert out[0] == ("a b c d e f", 2, 2)
    assert out[1] == ("x y z", 2, 1)
    assert out[2] == ("p q r p q r", 2, 2)
    assert out[3] == ("", 2, 0)
    assert 4 not in out

    import duckdb

    corpus_pdf = corpus.toPandas()  # noqa: F841 — referenced by DuckDB SQL
    ora = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            dd.remove_dup_passages_sql("corpus_pdf", tx.duckdb_tokens("text"), w)
        ).fetchall()
    }
    assert ora == out


def test_decontaminate(spark):
    """GPT-3-style benchmark decontamination: docs sharing an n-gram with
    the benchmark set are flagged with exact distinct-gram counts; clean
    docs don't appear."""
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (1, "unrelated words entirely different content here today"),
            (2, "prefix alpha beta gamma delta epsilon suffix"),
            (3, "alpha beta gamma only four grams short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon"), (101, "zeta eta theta iota kappa")],
        "bench_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_contaminated_grams"], r["n_bench_docs"])
        for r in dd.decontaminate(corpus, bench, n=5).collect()
    }
    # docs 0 and 2 contain bench 100's single 5-gram; 1 and 3 are clean
    assert out == {0: (1, 1), 2: (1, 1)}

    import duckdb

    corpus_pdf = corpus.toPandas()  # noqa: F841 — referenced by DuckDB SQL
    sql = dd.decontaminate_oracle_sql(
        "corpus_pdf", tx.duckdb_tokens("text"), "doc_id IN (0)", 5
    )
    # oracle variant: benchmark = corpus rows matching a predicate
    ora = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    spark_out = {
        r["doc_id"]: (r["n_contaminated_grams"], r["n_bench_docs"])
        for r in dd.decontaminate(
            corpus,
            corpus.filter("doc_id = 0").selectExpr("doc_id AS bench_id", "text"),
            n=5,
        ).collect()
    }
    assert ora == spark_out


def test_pii_scrub(spark, docs):
    """PII redaction: hand-checked cases + DuckDB differential (Java regex
    and RE2 must agree on the restricted pattern class — the driver-oracle
    contract)."""
    extra = spark.createDataFrame(
        [
            (20, "mail me at jane.doe+spam@corp.example.org today"),
            (21, "server 192.168.1.254 and 10.0.0.7 are up"),
            (22, "call (555) 123-4567 or +1 555.987.6543 now"),
            (23, "mixed: a@b.io at 8.8.8.8 tel 555-000-1111"),
            (24, "no pii here, just 1234 and version 1.2.3"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.with_pii_scrub(docs.union(extra)).collect()}
    assert out[20]["n_email"] == 1 and out[20]["text_scrubbed"] == "mail me at <EMAIL> today"
    assert out[21]["n_ipv4"] == 2 and out[21]["text_scrubbed"] == "server <IP> and <IP> are up"
    assert out[22]["n_phone"] == 2 and out[22]["text_scrubbed"] == "call <PHONE> or <PHONE> now"
    assert (out[23]["n_email"], out[23]["n_ipv4"], out[23]["n_phone"]) == (1, 1, 1)
    assert out[23]["text_scrubbed"] == "mixed: <EMAIL> at <IP> tel <PHONE>"
    # 1.2.3 is not a dotted quad; bare 1234 is not a phone
    assert (out[24]["n_email"], out[24]["n_ipv4"], out[24]["n_phone"]) == (0, 0, 0)
    assert out[24]["text_scrubbed"] == out[24]["text"]
    assert out[4]["text_scrubbed"] == ""  # empty doc unchanged

    import duckdb

    pdf = docs.union(extra).toPandas()
    sql = tx.pii_scrub_sql("text")
    ora = duckdb.sql(
        f"SELECT doc_id, {sql['n_email']} AS e, {sql['n_ipv4']} AS i, "
        f"{sql['n_phone']} AS p, {sql['text_scrubbed']} AS s FROM pdf"
    ).fetchall()
    for doc_id, e, i, p, s in ora:
        r = out[doc_id]
        assert (e, i, p, s) == (
            r["n_email"], r["n_ipv4"], r["n_phone"], r["text_scrubbed"]
        ), doc_id


def test_repetition_signals(spark, docs):
    """Gopher-style repetition ppm: hand-counted cases + DuckDB differential
    (the driver-oracle contract)."""
    extra = spark.createDataFrame(
        [(10, "spam spam spam spam"), (11, "a b a b a b c")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["dup_bigram_ppm"], r["dup_trigram_ppm"], r["top_token_ppm"])
        for r in tx.with_repetition_signals(docs.union(extra)).collect()
    }
    assert out[4] == (0, 0, 0)  # empty doc
    assert out[5] == (0, 0, 1_000_000)  # one token: no n-grams, full concentration
    # "spam spam spam spam": bigrams [ss,ss,ss] -> 2/3 dup; trigrams [sss,sss] -> 1/2
    assert out[10] == (666_666, 500_000, 1_000_000)
    # "a b a b a b c": bigrams [ab,ba,ab,ba,ab,bc] -> 3 dups of 6; trigrams
    # [aba,bab,aba,bab,abc] -> 2 of 5; top token 'a' 3 of 7
    assert out[11] == (500_000, 400_000, 428_571)
    # doc 0 repeats only "the": no repeated bigrams, 2/9 top concentration
    assert out[0] == (0, 0, 222_222)

    import duckdb

    pdf = docs.union(extra).toPandas()
    sql = tx.repetition_sql(tx.duckdb_tokens("text"))
    ora = duckdb.sql(
        f"SELECT doc_id, {sql['dup_bigram_ppm']} b, {sql['dup_trigram_ppm']} t, "
        f"{sql['top_token_ppm']} tt FROM pdf"
    ).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in ora} == out


def test_multimodal_features_deterministic(spark):
    a = extract_features(synthesize_assets(spark, n=12)).collect()
    b = extract_features(synthesize_assets(spark, n=12)).collect()
    av = {r["asset_id"]: (r["feature"], r["n_bytes"], r["n_frames"]) for r in a}
    bv = {r["asset_id"]: (r["feature"], r["n_bytes"], r["n_frames"]) for r in b}
    assert av == bv and len(av) == 12
    for feat, nb, nf in av.values():
        assert len(feat) == 16 and all(0.0 <= x < 1.0 for x in feat)


def test_multimodal_real_decoder_codec_formats_stubbed(spark):
    """Random-byte payloads are not stdlib-decodable containers: the real
    decoder raises at the codec boundary instead of faking output."""
    with pytest.raises(Exception, match="NotImplementedError|not stdlib-decodable"):
        extract_features(synthesize_assets(spark, n=3), decoder="real").collect()


def test_multimodal_real_wav_and_ppm_decode(spark):
    """decoder='real' REALLY decodes WAV (stdlib wave + numpy DSP) and
    PPM/P6 (raw RGB): verify against first-principles ground truth."""
    import io
    import wave as _wave

    import numpy as np

    from quickwit_spark.pipeline.multimodal import (
        _audio_features,
        _decode_ppm,
        _decode_wav,
        _image_features,
        synthesize_real_assets,
    )

    # pure 440 Hz sine at 16 kHz: rms = 1/sqrt(2), centroid ≈ 440 Hz
    sr, f0 = 16000, 440.0
    t = np.arange(sr // 4) / sr
    pcm = (np.sin(2 * np.pi * f0 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    got_sr, x = _decode_wav(buf.getvalue())
    assert got_sr == sr and len(x) == len(t)
    feat = _audio_features(got_sr, x, 16)
    assert feat[0] == pytest.approx(1 / np.sqrt(2), rel=1e-3)  # rms
    assert feat[2] * (sr / 2) == pytest.approx(f0, abs=25)  # spectral centroid

    # 2-color PPM: left half red, right half blue → exact grid means
    img = np.zeros((4, 8, 3), np.uint8)
    img[:, :4, 0] = 255
    img[:, 4:, 2] = 255
    payload = b"P6\n8 4\n255\n" + img.tobytes()
    back = _decode_ppm(payload)
    assert (back == img).all()
    feat = _image_features(back, 6)  # 2 cells x RGB
    assert list(feat) == pytest.approx([1.0, 0.0, 0.0, 0.0, 0.0, 1.0])

    # end-to-end through mapInPandas on real containers
    out = extract_features(
        synthesize_real_assets(spark, n=12), decoder="real", dim=16
    ).collect()
    assert len(out) == 12
    by_id = {r["asset_id"]: r for r in out}
    for i, r in by_id.items():
        assert len(r["feature"]) == 16
        if r["media_type"] == "image":
            assert r["thumb_w"] > 0
    # determinism across runs
    out2 = extract_features(
        synthesize_real_assets(spark, n=12), decoder="real", dim=16
    ).collect()
    assert {r["asset_id"]: r["feature"] for r in out2} == {
        r["asset_id"]: r["feature"] for r in out
    }


def test_connected_components_resolves_clusters(spark):
    """CC over pairs: transitive closure (a-b, b-c → one cluster), label =
    min member id, singletons absent (docs with no pair aren't listed)."""
    from quickwit_spark.pipeline import dedup as dd

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["component"] for r in dd.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_raises_when_not_converged(spark, monkeypatch):
    """The distributed path must fail loudly instead of returning partial
    labels when the diameter exceeds max_iterations."""
    from quickwit_spark.pipeline import dedup as dd

    monkeypatch.setenv("QW_CC_DRIVER_MAX_PAIRS", "0")  # force distributed
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(chain, max_iterations=2)
    out = dd.connected_components(chain, max_iterations=15).collect()
    assert {r["component"] for r in out} == {0}


def test_hash_sample_nested_and_deterministic(spark):
    """Hash-sampling invariants that make it the right tool at 100 TB:
    (a) deterministic across runs/partitionings, (b) samples NEST across
    rates at one salt (10%⊂30%), (c) different salts draw independent
    samples, (d) the rate is honored within binomial noise."""
    from quickwit_spark.pipeline.sampling import sample_by_hash

    df = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    s30 = {r.doc_id for r in sample_by_hash(df, 0.3).collect()}
    s30_again = {
        r.doc_id for r in sample_by_hash(df.repartition(13), 0.3).collect()
    }
    assert s30 == s30_again  # stable under re-partitioning
    s10 = {r.doc_id for r in sample_by_hash(df, 0.1).collect()}
    assert s10 <= s30  # nested
    assert abs(len(s30) / 20_000 - 0.3) < 0.02
    s30b = {r.doc_id for r in sample_by_hash(df, 0.3, salt="v2").collect()}
    ov = len(s30 & s30b) / 20_000
    assert abs(ov - 0.09) < 0.02  # independent draws: P(both) ≈ 0.3*0.3


def test_stratified_sample_quota_and_order_stability(spark):
    from quickwit_spark.pipeline.sampling import stratified_sample

    import pyspark.sql.functions as F

    df = (
        spark.range(0, 3_000)
        .withColumnRenamed("id", "doc_id")
        .withColumn("lang", F.concat(F.lit("l"), (F.col("doc_id") % 7).cast("string")))
    )
    out = stratified_sample(df, "lang", 25).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert set(by_lang) == {f"l{i}" for i in range(7)}
    assert all(len(v) == 25 for v in by_lang.values())
    out2 = stratified_sample(df.repartition(17), "lang", 25).collect()
    assert {r.doc_id for r in out2} == {r.doc_id for r in out}


def test_dedup_corpus_keeps_best_per_cluster(spark):
    """dedup_corpus keeps exactly one winner per connected duplicate
    cluster (highest quality, ties -> lowest id) and every unpaired doc."""
    from quickwit_spark.pipeline.dedup import dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"d{i}", q) for i, q in enumerate([5, 9, 9, 1, 7, 3, 8])],
        "doc_id long, text string, n_chars long",
    )
    # clusters: {0,1,2} (transitively via 0-1, 1-2) and {4,5}; 3 and 6 alone
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_corpus(docs, pairs, quality_col="n_chars").collect()
    )
    # cluster {0,1,2}: quality (5,9,9) -> winner 1 (tie 1v2 -> lower id)
    # cluster {4,5}: quality (7,3) -> winner 4
    assert kept == [1, 3, 4, 6]
    # no quality column: lowest id wins
    kept_id = sorted(r.doc_id for r in dedup_corpus(docs, pairs).collect())
    assert kept_id == [0, 3, 4, 6]


def test_filter_corpus_composition(spark, docs):
    """The composed C4/Gopher filter keeps exactly the rows every individual
    signal admits, preserves input columns, and the language gate works."""
    out = tx.filter_corpus(docs, min_tokens=5, min_quality_ppm=500_000,
                           max_dup_trigram_ppm=500_000, max_top_token_ppm=400_000)
    kept = {r["doc_id"] for r in out.collect()}
    assert out.columns == docs.columns  # signal columns dropped
    assert 4 not in kept and 5 not in kept  # empty + single-token docs fail bounds
    assert 0 in kept  # normal English sentence survives
    spam = spark.createDataFrame([(20, "spam " * 50)], "doc_id long, text string")
    assert tx.filter_corpus(docs.union(spam), min_tokens=5).filter("doc_id = 20").count() == 0
    # language gate: 'unk' rows drop when lang='en' is required
    en_only = {r["doc_id"] for r in tx.filter_corpus(docs, min_tokens=1, lang="en",
               min_quality_ppm=0, max_dup_trigram_ppm=10**6, max_top_token_ppm=10**6).collect()}
    assert 3 not in en_only and 0 in en_only


def test_mixture_sample_semantics(spark):
    """Data-mixing sampler: rate>1 upsamples with replication, integer
    rates replicate exactly, nested-in-rate at one salt, deterministic
    across partitionings, unknown strata use default_rate."""
    import pandas as pd

    from quickwit_spark.pipeline.sampling import mixture_sample

    pdf = pd.DataFrame(
        {
            "doc_id": range(6_000),
            "source": [f"s{i % 3}" for i in range(6_000)],
        }
    )
    df = spark.createDataFrame(pdf)
    out = mixture_sample(df, {"s0": 2.0, "s1": 0.5, "s2": 3.4}).toPandas()
    by = out.groupby("source")["doc_id"].count().to_dict()
    assert by["s0"] == 4_000  # integer rate: exact 2x replication
    assert abs(by["s1"] - 1_000) < 120  # 0.5x of 2000 within noise
    assert abs(by["s2"] - 6_800) < 120  # 3.4x of 2000 within noise
    # copies of one doc are distinct rows keyed by copy_idx
    c = out[out.source == "s0"].groupby("doc_id")["copy_idx"].apply(sorted)
    assert all(v == [0, 1] for v in c)
    # deterministic under re-partitioning
    out2 = mixture_sample(df.repartition(17), {"s0": 2.0, "s1": 0.5, "s2": 3.4}).toPandas()
    key = ["doc_id", "copy_idx"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )
    # nested: raising a stratum's rate only ADDS (doc, copy) rows
    lo = mixture_sample(df, {"s1": 0.2}).toPandas()
    hi = mixture_sample(df, {"s1": 0.7}).toPandas()
    lo_k = set(zip(lo.doc_id, lo.copy_idx))
    hi_k = set(zip(hi.doc_id, hi.copy_idx))
    assert lo_k <= hi_k
    # unknown strata: dropped by default, kept at default_rate=1
    assert mixture_sample(df, {"s0": 1.0}).filter("source != 's0'").count() == 0
    kept = mixture_sample(df, {"s0": 1.0}, default_rate=1.0)
    assert kept.count() == 6_000
    import pytest as _pt

    with _pt.raises(ValueError):
        mixture_sample(df, {"s0": -1.0})


def test_mixture_sample_matches_duckdb(spark):
    """The SQL twin draws the identical sample (the driver-oracle gate)."""
    import duckdb
    import pandas as pd

    from quickwit_spark.pipeline.sampling import mixture_sample, mixture_sample_sql

    pdf = pd.DataFrame(
        {
            "doc_id": range(2_000),
            "source": [f"s{i % 4}" for i in range(2_000)],
            "n_chars": [i % 97 for i in range(2_000)],
        }
    )
    rates = {"s0": 1.5, "s1": 0.25, "s3": 2.0}
    got = (
        mixture_sample(spark.createDataFrame(pdf), rates, salt="mix")
        .toPandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute(mixture_sample_sql(rates, salt="mix"))
        .df()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    cols = sorted(got.columns)
    pd.testing.assert_frame_equal(got[cols], want[cols], check_dtype=False)


def test_self_perplexity(spark):
    """Corpus-self-trained bigram LM: hand-computed micro-nat costs on a
    3-doc corpus + DuckDB differential (the driver-oracle contract)."""
    import math

    import duckdb

    rows = [(0, "a b a b"), (1, "a b c"), (2, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll_micro"])
        for r in tx.with_self_perplexity(df).collect()
    }
    # corpus bigrams: doc0 [ab, ba, ab], doc1 [ab, bc]; V = {a,b,c,x} = 4
    # c(ab)=3, c(ba)=1, c(bc)=1; context counts (bigrams starting with w1):
    # c1(a) = |ab,ab,ab| = 3; c1(b) = |ba,bc| = 2
    k, V = 0.5, 4
    cost = lambda c12, c1: math.floor(1e6 * -math.log((c12 + k) / (c1 + k * V)))
    c_ab, c_ba, c_bc = cost(3, 3), cost(1, 2), cost(1, 2)
    assert out[2] == (0, 0)  # single token: no bigrams
    assert out[0] == (3, math.floor((2 * c_ab + c_ba) / 3))
    assert out[1] == (2, math.floor((c_ab + c_bc) / 2))

    pdf = df.toPandas()  # noqa: F841
    ora = duckdb.sql(tx.self_perplexity_sql("pdf")).fetchall()
    assert {r[0]: (r[1], r[2]) for r in ora} == out


def test_corpus_length_stats(spark):
    """Exact histogram-cumsum quantiles: hand-checked on a known length
    distribution + DuckDB differential."""
    import duckdb

    # lengths: 1..10 (one doc each) -> q50 = min n with cum >= 5 -> 5;
    # q90 -> cum >= 9 -> 9; q99 -> cum >= ceil(9.9)=10 -> 10
    rows = [(i, " ".join(["w"] * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.corpus_length_stats(df).collect()[0]
    assert (out["n_docs"], out["total_tokens"], out["max_tokens"]) == (10, 55, 10)
    assert (out["q50"], out["q90"], out["q99"]) == (5, 9, 10)
    pdf = df.toPandas()  # noqa: F841
    ora = duckdb.sql(tx.corpus_length_stats_sql("pdf")).fetchone()
    assert tuple(ora) == (10, 55, 10, 5, 9, 10)


def test_simhash_tokenless_docs_never_pair(spark):
    """Empty/punctuation-only docs have no defined text similarity: they
    must not all collide at simhash 0 and flood hamming-0 pairs (the
    DuckDB oracle's unnest() gives them no vote rows either)."""
    rows = [(0, "the quick brown fox"), (1, ""), (2, "..."), (3, None), (4, "the quick brown fox")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]) for r in dd.simhash_pairs(df, max_hamming=3).collect()}
    assert pairs == {(0, 4)}


def test_hash_sample_rate_one_keeps_everything(spark):
    from quickwit_spark.pipeline.sampling import sample_by_hash

    df = spark.range(0, 5_000).withColumnRenamed("id", "doc_id")
    assert sample_by_hash(df, 1.0).count() == 5_000


def test_minhash_lsh_oracle_twin_including_band_misses(spark):
    """The DuckDB oracle reproduces the md5-affine signatures AND the band
    blocking, so engine == oracle even for pairs the bands miss — the
    contract is deterministic, not recall-by-luck.  A weak 2-band/16-row
    config is used here precisely to force misses of above-threshold
    pairs."""
    import duckdb

    rows = []
    for d in range(40):
        # each doc shares a sliding 10-of-12 token window with its
        # neighbors: plenty of mid-jaccard pairs for the bands to miss
        toks = " ".join(f"w{d + j}" for j in range(12))
        rows.append((d, toks))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eng = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard_ppm"])
        for r in dd.minhash_lsh_pairs(
            df, threshold_ppm=100_000, num_hashes=32, bands=2, n=3
        ).collect()
    )
    pdf = df.toPandas()  # noqa: F841 (duckdb reads it by name)
    ora = sorted(
        duckdb.sql(
            dd.minhash_lsh_oracle_sql(
                "pdf", tx.duckdb_tokens("text"), 100_000, num_hashes=32, bands=2, n=3
            )
        ).fetchall()
    )
    assert eng == ora
    # sanity: the weak banding really does miss exact pairs (else this
    # test wouldn't cover the divergence case)
    exact = dd.ngram_jaccard_pairs(df, threshold_ppm=100_000, n=3).count()
    assert len(eng) < exact


def test_chunk_windows(spark):
    """RAG window chunking: start ordinals 0..floor((n-1)/stride), window
    slices space-joined, tail windows shorter, empty docs emit nothing,
    min_tokens filters degenerate tails; DuckDB differential agrees."""
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),  # 7 toks, w=4 s=3 -> [abcd][defg][g]
            (2, ""),
            (3, "one two"),
            (4, "Hello, World! SPARK"),  # analyzer lowercases/splits
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in tx.chunk_windows(df, window=4, stride=3).collect()
    }
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("d e f g", 4)
    assert got[(1, 2)] == ("g", 1)
    assert got[(3, 0)] == ("one two", 2)
    assert got[(4, 0)] == ("hello world spark", 3)
    assert len(got) == 5  # nothing for the empty doc
    # min_tokens drops the 1-token tail
    kept = tx.chunk_windows(df, window=4, stride=3, min_tokens=2).collect()
    assert {(r["doc_id"], r["chunk_idx"]) for r in kept} == {
        (1, 0), (1, 1), (3, 0), (4, 0),
    }

    import duckdb

    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    ora = con.sql(tx.chunk_windows_sql(window=4, stride=3)).fetchall()
    assert {(r[0], r[1]): (r[2], r[3]) for r in ora} == got

    import pytest as _pytest

    with _pytest.raises(ValueError):
        tx.chunk_windows(df, window=0)
