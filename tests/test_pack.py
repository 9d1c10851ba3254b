"""Sequence-packing tests: hand-checked placement, gap-free/exhaustive
invariants, the DuckDB sequential-oracle differential (certifying the
distributed two-level prefix sum), and determinism across parallelism."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from quickwit_spark.pipeline.pack import pack_sequences, pack_sequences_sql, pack_stats


def _docs_df(spark, texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "text": texts})
    )


def test_pack_sequences_hand_checked(spark):
    # token counts: 3, 5, 4  at seq_len 4 ->
    # doc0 [0,3) seq0@0 ; doc1 [0,1) seq0@3, [1,5) seq1@0 ; doc2 [0,4) seq2@0
    df = _docs_df(spark, ["a b c", "d e f g h", "i j k l"])
    out = (
        pack_sequences(df, seq_len=4)
        .orderBy("seq_id", "doc_id")
        .toPandas()
        .to_records(index=False)
        .tolist()
    )
    assert out == [
        (0, 0, 0, 3, 0),
        (0, 1, 0, 1, 3),
        (1, 1, 1, 5, 0),
        (2, 2, 0, 4, 0),
    ]


def test_pack_sequences_invariants(spark):
    rng = np.random.default_rng(7)
    texts = [" ".join(f"t{i}" for i in range(int(rng.integers(0, 90)))) for _ in range(300)]
    df = _docs_df(spark, texts)
    L = 128
    p = pack_sequences(df, seq_len=L).toPandas().sort_values(["seq_id", "seq_tok_start"])
    # every doc token placed exactly once
    placed = p.groupby("doc_id").apply(
        lambda g: (g["doc_tok_end"] - g["doc_tok_start"]).sum(), include_groups=False
    )
    n_tokens = {i: len(t.split()) for i, t in enumerate(texts) if t}
    assert placed.to_dict() == n_tokens
    # sequences are gap-free: per seq, chunks tile [0, L) (last seq may stop short)
    last_seq = p["seq_id"].max()
    for sid, g in p.groupby("seq_id"):
        spans = sorted(zip(g["seq_tok_start"], g["seq_tok_start"] + g["doc_tok_end"] - g["doc_tok_start"]))
        assert spans[0][0] == 0
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 == s2, f"gap in seq {sid}"
        assert spans[-1][1] == L or sid == last_seq


def test_pack_sequences_matches_sequential_oracle(spark):
    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{int(rng.integers(0, 50))}" for _ in range(int(rng.integers(0, 60)))) for _ in range(500)]
    pdf = pd.DataFrame({"doc_id": range(500), "text": texts})
    got = (
        pack_sequences(spark.createDataFrame(pdf), seq_len=64, num_buckets=7)
        .orderBy("seq_id", "doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(
        pack_sequences_sql(seq_len=64) + " ORDER BY seq_id, doc_id"
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"),
        want.reset_index(drop=True).astype("int64"),
    )


def test_pack_sequences_deterministic_across_parallelism(spark):
    texts = [" ".join(["x"] * (i % 37)) for i in range(400)]
    df = _docs_df(spark, texts)
    a = pack_sequences(df.repartition(1), seq_len=32, num_buckets=3).toPandas()
    b = pack_sequences(df.repartition(13), seq_len=32, num_buckets=11).toPandas()
    key = ["seq_id", "doc_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_pack_sequences_string_ids(spark):
    # string ids order byte-wise; zero-padded ids keep numeric order.
    # tokens 3,2,4 at L=4: doc1 straddles seq0/seq1, doc2 straddles seq1/seq2
    texts = ["a b c", "d e", "f g h i"]
    df = _docs_df(spark, texts, ids=[f"doc-{i:04d}" for i in range(3)])
    out = pack_sequences(df, seq_len=4).orderBy("seq_id", "seq_tok_start").toPandas()
    assert out["doc_id"].tolist() == [
        "doc-0000", "doc-0001", "doc-0001", "doc-0002", "doc-0002",
    ]
    assert out["seq_id"].tolist() == [0, 0, 1, 1, 2]


def test_pack_stats(spark):
    df = _docs_df(spark, ["a b c", "d e f g h", "i j k l"])  # 12 tokens, L=4
    st = pack_stats(pack_sequences(df, seq_len=4), seq_len=4).collect()[0]
    assert st["n_sequences"] == 3 and st["n_tokens"] == 12 and st["pad_tokens"] == 0


def test_pack_rejects_bad_seq_len(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs_df(spark, ["a"]), seq_len=0)


def test_shuffled_pack_reorders_and_stays_exhaustive(spark):
    """shuffled_pack: (a) gap-free/exhaustive like pack_sequences (same
    total tokens, same per-doc coverage); (b) the order actually differs
    from corpus order; (c) salts draw different orders; (d) deterministic
    across parallelism and bucket counts (regression: the bucket key must
    follow the SHUFFLE key, not a pre-existing doc_id column)."""
    from quickwit_spark.pipeline.pack import shuffled_pack

    texts = [" ".join(["w"] * (1 + i % 23)) for i in range(300)]
    df = _docs_df(spark, texts)

    plain = pack_sequences(df, seq_len=32).toPandas()
    shuf = shuffled_pack(df, seq_len=32, salt="ep0").toPandas()
    # same per-doc token coverage
    cov = lambda p: p.groupby("doc_id").apply(  # noqa: E731
        lambda g: (g["doc_tok_end"] - g["doc_tok_start"]).sum()
    )
    pd.testing.assert_series_equal(cov(plain), cov(shuf))
    # order differs: per-doc global starts disagree somewhere
    start = lambda p: (  # noqa: E731
        p.sort_values(["doc_id", "doc_tok_start"]).groupby("doc_id").first()
        .eval("seq_id * 32 + seq_tok_start - doc_tok_start")
    )
    assert (start(plain) != start(shuf)).any()
    assert (start(shuf) != start(shuffled_pack(df, seq_len=32, salt="ep1").toPandas())).any()

    a = shuffled_pack(df.repartition(1), seq_len=32, salt="ep0").toPandas()
    b = shuffled_pack(df.repartition(13), seq_len=32, salt="ep0").toPandas()
    key = ["seq_id", "doc_id", "doc_tok_start"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    pd.testing.assert_frame_equal(
        shuf.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
