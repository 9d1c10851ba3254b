"""BPE tokenizer training (pipeline/bpe.py): distributed word/pair
statistics vs hand counts and an inline DuckDB differential, the merge
loop vs a hand-worked corpus, determinism across parallelism, and
map-only application of the learned merges."""

import duckdb
import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline.bpe import (
    EOW,
    pair_frequencies,
    segment_word,
    train_bpe_merges,
    with_bpe_tokens,
    word_frequencies,
)
from quickwit_spark.pipeline.text import BPE_PATTERN

CORPUS = [
    ("low low low lower lower lowest",),
    ("new newer newest wide wider low",),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, ["text"])


def test_word_and_pair_frequencies_hand_counts(docs):
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs).collect()}
    assert wf == {
        "low": 4, "lower": 2, "lowest": 1, "new": 1, "newer": 1,
        "newest": 1, "wide": 1, "wider": 1,
    }
    pf = {(r["a"], r["b"]): r["freq"] for r in pair_frequencies(word_frequencies(docs)).collect()}
    # 'l','o' occurs in low(4) + lower(2) + lowest(1) = 7
    assert pf[("l", "o")] == 7 and pf[("o", "w")] == 7
    assert pf[("w", EOW)] == 5  # low×4 + new×1
    assert pf[("e", "r")] == 4  # lower×2, newer, wider
    # no empty symbols anywhere (the char-split keeps a trailing "" that
    # must be filtered before the EOW append)
    assert all(a != "" and b != "" for a, b in pf)


def test_pair_frequencies_duckdb_differential(docs):
    got = {
        (r["a"], r["b"]): r["freq"]
        for r in pair_frequencies(word_frequencies(docs)).collect()
    }
    pat = BPE_PATTERN.replace("'", "''")
    rows = duckdb.sql(
        f"""
        WITH corpus(text) AS (VALUES ('{CORPUS[0][0]}'), ('{CORPUS[1][0]}')),
        w AS (SELECT trim(x) AS word FROM (
          SELECT unnest(regexp_extract_all(text, '{pat}')) AS x FROM corpus
        ) WHERE trim(x) <> ''),
        wf AS (SELECT word, count(*) AS f FROM w GROUP BY word),
        syms AS (SELECT f, list_append(list_transform(range(1, length(word) + 1),
          i -> substr(word, CAST(i AS INT), 1)), '{EOW}') AS s FROM wf),
        pairs AS (SELECT s[CAST(i AS INT)] AS a, s[CAST(i AS INT) + 1] AS b, f
          FROM syms, unnest(range(1, len(s))) AS t(i))
        SELECT a, b, CAST(sum(f) AS BIGINT) AS freq FROM pairs GROUP BY a, b
        """
    ).fetchall()
    assert got == {(a, b): f for a, b, f in rows}


def test_merge_loop_hand_worked(docs):
    """First merges on this corpus, by hand: (l,o)=7 and (o,w)=7 tie at 7
    — lexicographic tie-break picks (l,o); then ('lo','w')=7 wins; then
    (e,r)=4; then ('er',EOW)=4 ties with ('low',EOW)=4 — ('er',EOW) is
    lexicographically smaller ('er' < 'low')."""
    m = train_bpe_merges(docs, 5)
    assert m[:4] == [
        (0, "l", "o"),
        (1, "lo", "w"),
        (2, "e", "r"),
        (3, "er", EOW),
    ]
    assert m[4] == (4, "low", EOW)


def test_training_is_parallelism_deterministic(spark, docs):
    m1 = train_bpe_merges(docs, 8)
    m2 = train_bpe_merges(docs.repartition(7), 8)
    assert m1 == m2
    # bounded-vocabulary path: with the corpus's full vocab (8 words) any
    # larger cap is identical
    assert train_bpe_merges(docs, 8, max_words=8) == m1


def test_segment_and_apply(docs):
    m = train_bpe_merges(docs, 8)
    ranks = {(a, b): r for r, a, b in m}
    # lowest-rank-first greedy: 'lower' → l+o (rank0) → lo+w (1) → e+r (2)
    # → er+</w> (3) → 'low','er</w>'
    assert segment_word("lower", ranks) == ["low", "er" + EOW]
    assert segment_word("low", ranks) == ["low" + EOW]
    out = with_bpe_tokens(docs, m).collect()
    by_text = {r["text"]: r for r in out}
    toks = by_text[CORPUS[0][0]]["bpe_tokens"]
    # 'low low low lower lower lowest' segments per word, in order
    assert toks[:3] == ["low" + EOW] * 3
    assert toks[3:5] == ["low", "er" + EOW]
    assert by_text[CORPUS[0][0]]["n_bpe_merged_tokens"] == len(toks)
    # reconstruction: concatenating a word's subwords restores word+EOW
    assert "".join(segment_word("newest", ranks)) == "newest" + EOW


def test_merges_exhaust_gracefully(spark):
    tiny = spark.createDataFrame([("ab ab",)], ["text"])
    m = train_bpe_merges(tiny, 50)  # only a few pairs exist: loop stops early
    assert 0 < len(m) < 50
    assert m[0] == (0, "a", "b")
