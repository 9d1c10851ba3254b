"""BPE tokenizer training over a Spark corpus — the canonical
training-data-pipeline step a 100-TB pretraining run performs before
token counting, packing, and mixing (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the GPT-2 /
HuggingFace-tokenizers training shape).

Scale design (the part that must survive 100 TB):

* **The corpus is only ever touched by ONE distributed aggregation.**
  ``word_frequencies`` pre-tokenizes every row with the shared GPT-2-ish
  regex (``text.BPE_PATTERN``, pure JVM ``regexp_extract_all``) and hash-
  aggregates word counts with map-side combine — the classic insight that
  BPE statistics depend on the corpus ONLY through the word-frequency
  table.  100 TB of text collapses to O(distinct words) rows.
* **Pair statistics are a second small aggregation** over that table
  (``pair_frequencies``): explode character-adjacent pairs weighted by
  word frequency.  This is the first training iteration's argmax input,
  fully SQL-expressible — the DuckDB value-oracle anchor for the whole
  pipeline (driver query ``tx_bpe_pair_freqs``).
* **The merge LOOP runs on the driver over a bounded vocabulary.**
  ``train_bpe_merges`` collects the top ``max_words`` words by frequency
  (default 1M — in Zipfian corpora that covers ~99.9% of token mass;
  every real-world BPE trainer, including GPT-2's, iterates in memory
  over the word dict, not the corpus).  Driver memory is O(max_words),
  independent of corpus size; determinism comes from (count desc, pair
  lex asc) argmax tie-breaking and the (freq desc, word asc) collect
  order.  K merges over V words is O(K·V) here — the incremental
  pair-index that makes real trainers O(V + K·log V) is an optimization
  of the same statistics, not different math.
* **Applying the learned tokenizer is map-only** (``with_bpe_tokens``):
  an Arrow-batched pandas UDF carrying the merge ranks, greedy
  lowest-rank merging per word (the HF ``tokenizers`` merge order), no
  shuffle, corpus never collected.

End-of-word convention: Sennrich-style ``</w>`` marker appended to each
word's symbol sequence, so merges distinguish word-final from word-
internal contexts ("est</w>" vs "est").
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .text import BPE_PATTERN

EOW = "</w>"


def word_frequencies(df: DataFrame, col: str = "text") -> DataFrame:
    """Distributed word-frequency table: ONE hash aggregation (map-side
    combined) over the regex pre-tokenized corpus.  Pre-tokens are
    trimmed (the GPT-2 pattern carries the leading space; character-level
    BPE here trains on the bare word) and empties dropped."""
    words = F.regexp_extract_all(F.col(col), F.lit(BPE_PATTERN), F.lit(0))
    return (
        df.select(F.explode(words).alias("word"))
        .withColumn("word", F.trim("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def pair_frequencies(wf: DataFrame) -> DataFrame:
    """Weighted adjacent symbol-pair counts at the character level (plus
    the ``</w>`` end-of-word marker) — exactly the statistics BPE's first
    merge argmaxes over.  Pure built-in higher-order functions (one
    explode over the word table, one hash agg): no Python, no extra
    corpus scan."""
    # the lookahead split keeps one trailing empty element (Spark split
    # limit=-1 semantics) — drop it before appending the EOW marker
    chars = F.filter(F.split(F.col("word"), "(?!^)"), lambda x: x != F.lit(""))
    syms = F.concat(chars, F.array(F.lit(EOW)))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(F.col("syms")) - 1),
        lambda i: F.struct(
            F.element_at(F.col("syms"), i).alias("a"),
            F.element_at(F.col("syms"), i + 1).alias("b"),
        ),
    )
    return (
        wf.withColumn("syms", syms)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("freq"))
    )


def _merge_word(syms: tuple, a: str, b: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe_merges(
    df: DataFrame, n_merges: int, col: str = "text", max_words: int = 1_000_000
) -> list[tuple[int, str, str]]:
    """Learn ``n_merges`` BPE merges: distributed word counts → bounded
    top-``max_words`` collect → deterministic in-memory merge loop.
    Returns [(rank, left_symbol, right_symbol), ...] in merge order.

    Argmax ties break by lexicographically smallest (a, b) — with the
    (freq desc, word asc) collect order this makes training byte-for-byte
    deterministic across partitionings and re-runs."""
    top = (
        word_frequencies(df, col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    words: dict[tuple, int] = {}
    for r in top:
        words[tuple(r["word"]) + (EOW,)] = words.get(tuple(r["word"]) + (EOW,), 0) + int(
            r["freq"]
        )
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for syms, fr in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += fr
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        words = {
            _merge_word(syms, best[0], best[1]): fr for syms, fr in words.items()
        }
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (the HF tokenizers apply
    order): repeatedly merge the adjacent pair with the smallest learned
    rank until none applies.  Independent of training — used by tests to
    check hand-worked segmentations."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def with_bpe_tokens(
    df: DataFrame, merges: list[tuple[int, str, str]], col: str = "text"
) -> DataFrame:
    """Map-only application of a learned BPE: adds ``bpe_tokens``
    (array<string>, the subword units of every pre-token in order) and
    ``n_bpe_merged_tokens``.  Arrow-batched pandas UDF; the merge table
    rides the closure (a few KB per 10k merges), the corpus is never
    shuffled or collected."""
    import re

    ranks = {(a, b): r for r, a, b in merges}
    pat = re.compile(BPE_PATTERN)

    @F.pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            out = []
            for w in pat.findall(t or ""):
                w = w.strip()
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    got = cache[w] = segment_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(one)

    out = df.withColumn("bpe_tokens", seg(F.col(col)))
    return out.withColumn("n_bpe_merged_tokens", F.size("bpe_tokens").cast("long"))
