"""Deduplication operators for training-data pipelines over the
``documents`` table: exact (fingerprint groupBy), n-gram Jaccard
(shingle self-join), MinHash+LSH (shingle→minhash→band→bucket-join→verify)
and SimHash.  All shuffle-conscious:

* exact dedup is one hash aggregation (map-side combine);
* the shingle self-join carries (shingle, doc_id) pairs — at 100 TB, pass
  ``max_shingle_df`` to drop stopword-class shingles (bounded join fan-out,
  the standard frequency-cap; exact semantics when None);
* MinHash/LSH replaces the quadratic shingle join with band-bucket joins:
  candidate generation is linear in docs × bands, then only candidates pay
  the exact-verification join.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .text import tokens_col


# -- exact ---------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact (normalized) duplicate groups: one row per fingerprint with the
    keeper (min id) and group size.  One shuffle (hash agg with partial
    aggregation)."""
    fp = F.md5(F.concat_ws(" ", tokens_col(text_col)))
    return (
        df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("group_size"),
        )
    )


def keep_best(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection after exact dedup: per duplicate cluster
    keep the highest-scoring doc (ties -> lowest id) — the standard
    'keep best' winner step of a training-data pipeline.  One shuffle
    (window over the fingerprint)."""
    fp = F.md5(F.concat_ws(" ", tokens_col(text_col)))
    w = Window.partitionBy("fingerprint").orderBy(
        F.col("kept_score").desc(), F.col("kept_doc_id").asc()
    )
    return (
        df.select(
            F.col(id_col).alias("kept_doc_id"),
            F.col(score_col).cast("long").alias("kept_score"),
            fp.alias("fingerprint"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("fingerprint", "kept_doc_id", "kept_score")
    )


# -- n-gram shingles ------------------------------------------------------------


def shingles_of_tokens(arr, n: int = 3):
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token
    array column (sequence + transform HOFs, JVM-side).  The array must be
    a plain column reference: passing the tokenizer *expression* here makes
    Catalyst re-evaluate it for every F.get inside the lambda — measured
    ~20x slower at sf0.1."""
    arr = F.col(arr) if isinstance(arr, str) else arr
    gram = lambda i: F.concat_ws(" ", *[F.get(arr, i + j) for j in range(n)])  # noqa: E731
    return F.when(
        F.size(arr) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(0), F.size(arr) - n), gram)),
    ).otherwise(F.array().cast("array<string>"))


def shingles_col(text_col: str = "text", n: int = 3):
    """Shingles straight from a text column.  Prefer materializing
    ``tokens_col`` into its own select first (see shingles_of_tokens)."""
    return shingles_of_tokens(tokens_col(text_col), n)


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, max_shingle_df: int | None
) -> DataFrame:
    # let-bound token array (transform over a 1-element array): an aliased
    # __toks column gets substituted into shingles_of_tokens's several
    # references by the optimizer, re-running the tokenizer per reference
    # (see text.filter_corpus)
    sh_arr = F.element_at(
        F.transform(
            F.array(tokens_col(text_col)), lambda t: shingles_of_tokens(t, n)
        ),
        1,
    )
    ex = df.select(F.col(id_col).alias("doc_id"), F.explode(sh_arr).alias("sh"))
    if max_shingle_df is not None:
        hot = (
            ex.groupBy("sh").agg(F.count("*").alias("df_sh")).filter(F.col("df_sh") > max_shingle_df)
        )
        ex = ex.join(F.broadcast(hot), "sh", "left_anti")
    return ex


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold_ppm: int = 500_000,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All pairs with exact n-gram Jaccard >= threshold_ppm/1e6.

    Plan: explode distinct shingles → self-join on shingle (the only
    quadratic-ish step, bounded by shingle doc-frequency) → per-pair shared
    count → join per-doc shingle counts (broadcast if small) → filter.

    Jaccard is emitted as `jaccard_ppm` = floor(1e6·|∩|/|∪|) (exact integer
    arithmetic; thresholds compared cross-multiplied) so DuckDB oracles can
    never disagree on a float rounding boundary.
    """
    ex = _exploded_shingles(df, id_col, text_col, n, max_shingle_df)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = ex.alias("a")
    b = ex.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("shared")
    out = (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .filter(F.col("shared") * 1_000_000 >= F.lit(threshold_ppm) * union_sz)
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.lit(1_000_000) * F.col("shared") / union_sz).cast("long").alias("jaccard_ppm"),
        )
    )
    return out


def ngram_jaccard_oracle_sql(table: str, toks_sql: str, threshold_ppm: int, n: int = 3) -> str:
    """DuckDB twin of ngram_jaccard_pairs (window-lead shingle construction)."""
    leads = " || ' ' || ".join(
        ["term"] + [f"lead(term, {j}) OVER w" for j in range(1, n)]
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks_sql}) AS term,
         unnest(range(len({toks_sql}))) AS pos
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, {leads} AS gram,
           lead(term, {n-1}) OVER w AS tail_term
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE tail_term IS NOT NULL
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor(1000000.0 * shared / (sa.n_sh + sb.n_sh - shared)) AS BIGINT) AS jaccard_ppm
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1000000 >= {threshold_ppm} * (sa.n_sh + sb.n_sh - shared)
"""


# -- passage-level dedup ---------------------------------------------------------


def passage_dup_stats(
    df: DataFrame, window: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Sub-document exact dedup (the boilerplate/passage-removal primitive):
    chop each doc's token stream into non-overlapping ``window``-token
    passages (last one may be short), fingerprint each, and count passage
    instances whose fingerprint appears in MORE THAN ONE distinct doc.
    Returns (doc_id, n_passages, n_dup_passages, dup_passage_ppm) per
    non-empty doc.

    100-TB plan: explode passages → one hash agg for cross-doc frequency
    (map-side combine) → broadcast-or-shuffle join back by fingerprint.
    Passage fingerprints are uniform md5s, so the agg key space is
    skew-free by construction — no salting needed (unlike raw-term keys)."""
    # the token array is LET-BOUND via transform-over-1-element-array so
    # the tokenizer runs once per row — aliased intermediate columns get
    # substituted into every reference by the optimizer (12 tokenizer
    # copies measured in the executed plan; see text.filter_corpus)
    def passages_of(t):
        n_pass = F.ceil(F.size(t) / F.lit(window)).cast("int")
        return F.when(
            F.size(t) > 0,
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(t, i * window + 1, window))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    pass_arr = F.element_at(
        F.transform(F.array(tokens_col(text_col)), passages_of), 1
    )
    # explode (not explode_outer): token-less docs vanish, same as the
    # previous size>0 filter
    passages = df.select(
        F.col(id_col).alias("doc_id"), F.explode(pass_arr).alias("fp")
    )
    freq = passages.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs_with_fp")
    )
    return (
        passages.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum((F.col("n_docs_with_fp") > 1).cast("long")).alias("n_dup_passages"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup_passages",
            F.floor(F.lit(1_000_000) * F.col("n_dup_passages") / F.col("n_passages"))
            .cast("long")
            .alias("dup_passage_ppm"),
        )
    )


def remove_dup_passages(
    df: DataFrame, window: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Passage-level dedup REMOVAL (the C4/RefinedWeb-style cleanup the
    stats op above only measures): chop each doc into non-overlapping
    ``window``-token passages, and KEEP-FIRST — a passage instance
    survives iff its fingerprint is unique across docs OR this doc is the
    lowest-id holder (Lee et al. 2022 keep one copy; dropping all copies
    deletes information).  Returns (doc_id, clean_text, n_passages,
    n_kept_passages) for every doc with tokens; ``clean_text`` is the
    TOKEN-SPACE reconstruction (kept windows' tokens joined by single
    spaces, in order) — training pipelines operate on token streams, and
    exact byte-offset surgery would need per-token spans the tokenizer
    deliberately does not keep.

    100-TB plan: posexplode passages → one hash agg on the uniform md5
    fingerprint space (min doc + distinct-doc count, map-side combined,
    skew-free keys) → join back → per-doc sorted kept-window list → ONE
    slice-and-flatten reconstruction against the let-bound token array.
    The corpus text rides the plan twice (passage pass + reconstruction)
    but is never collected."""
    toks = tokens_col(text_col)

    def passages_of(t):
        n_pass = F.ceil(F.size(t) / F.lit(window)).cast("int")
        return F.when(
            F.size(t) > 0,
            F.transform(
                F.sequence(F.lit(0), n_pass - 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice(t, i * window + 1, window))),
            ),
        ).otherwise(F.array().cast("array<string>"))

    pass_arr = F.element_at(F.transform(F.array(toks), passages_of), 1)
    passages = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(pass_arr).alias("idx", "fp")
    )
    freq = passages.groupBy("fp").agg(
        F.countDistinct("doc_id").alias("n_docs_with_fp"),
        F.min("doc_id").alias("first_doc"),
    )
    kept = (
        passages.join(freq, "fp")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("n_docs_with_fp") == 1)
                        | (F.col("doc_id") == F.col("first_doc")),
                        F.col("idx"),
                    )
                )
            ).alias("kept_idx"),
        )
    )
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__txt"))
    rebuilt = src.join(kept, "doc_id").select(
        F.col("doc_id"),
        F.concat_ws(
            " ",
            F.flatten(
                F.element_at(
                    F.transform(
                        F.array(tokens_col("__txt")),
                        lambda t: F.transform(
                            F.col("kept_idx"),
                            lambda i: F.slice(t, i * window + 1, window),
                        ),
                    ),
                    1,
                )
            ),
        ).alias("clean_text"),
        F.col("n_passages").cast("long").alias("n_passages"),
        F.size("kept_idx").cast("long").alias("n_kept_passages"),
    )
    return rebuilt


def remove_dup_passages_sql(table: str, toks_sql: str, window: int) -> str:
    """DuckDB twin of remove_dup_passages (same keep-first rule, same
    token-space reconstruction)."""
    w = window
    return f"""
WITH toks AS (SELECT doc_id, {toks_sql} AS t FROM {table}),
pass AS (
  SELECT doc_id, CAST(i AS INT) AS idx,
         md5(array_to_string(t[(CAST(i AS INT) * {w} + 1):(CAST(i AS INT) * {w} + {w})], ' ')) AS fp
  FROM toks, unnest(range(0, CAST(ceil(len(t) / {w}.0) AS BIGINT))) AS u(i)
  WHERE len(t) > 0
),
freq AS (SELECT fp, count(DISTINCT doc_id) AS n, min(doc_id) AS first_doc FROM pass GROUP BY fp),
kept AS (
  SELECT p.doc_id, p.idx FROM pass p JOIN freq USING (fp)
  WHERE freq.n = 1 OR p.doc_id = freq.first_doc
),
agg AS (
  SELECT p.doc_id, count(*) AS n_passages FROM pass p GROUP BY p.doc_id
),
rec AS (
  SELECT k.doc_id,
         string_agg(array_to_string(t[(k.idx * {w} + 1):(k.idx * {w} + {w})], ' '), ' ' ORDER BY k.idx) AS clean_text,
         count(*) AS n_kept
  FROM kept k JOIN toks USING (doc_id) GROUP BY k.doc_id
)
SELECT a.doc_id, COALESCE(rec.clean_text, '') AS clean_text,
       CAST(a.n_passages AS BIGINT) AS n_passages,
       CAST(COALESCE(rec.n_kept, 0) AS BIGINT) AS n_kept_passages
FROM agg a LEFT JOIN rec ON rec.doc_id = a.doc_id
"""


def passage_dup_oracle_sql(table: str, toks_sql: str, window: int) -> str:
    """DuckDB twin of passage_dup_stats."""
    return f"""
WITH toks AS (
  SELECT doc_id, {toks_sql} AS t FROM {table} WHERE len({toks_sql}) > 0
),
passages AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i * {window} + 1, (i + 1) * {window}), ' ')) AS fp
  FROM toks, unnest(range(CAST(ceil(len(t) * 1.0 / {window}) AS BIGINT))) AS u(i)
),
freq AS (SELECT fp, count(DISTINCT doc_id) AS n_docs_with_fp FROM passages GROUP BY fp)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_passages,
       CAST(sum(CASE WHEN n_docs_with_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       CAST(floor(1000000.0 * sum(CASE WHEN n_docs_with_fp > 1 THEN 1 ELSE 0 END) / count(*)) AS BIGINT)
         AS dup_passage_ppm
FROM passages JOIN freq USING (fp)
GROUP BY doc_id
"""


# -- benchmark decontamination --------------------------------------------------


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Flag training docs containing any word n-gram from a benchmark/eval
    set (the GPT-3-style decontamination pass; default n=13 per that
    recipe).  Returns one row per contaminated doc:
    (doc_id, n_contaminated_grams, n_bench_docs).

    100-TB plan: the benchmark's distinct n-grams are tiny relative to the
    corpus, so they BROADCAST — the corpus side is a map-only explode +
    broadcast hash join (no corpus shuffle; the only shuffle is the per-doc
    count agg over the matched sliver).  Dedup ops tell you what repeats
    inside the corpus; this tells you what leaked in from outside."""
    corpus = df.select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("__toks"))
    corpus_grams = corpus.select(
        "doc_id", F.explode(shingles_of_tokens("__toks", n)).alias("sh")
    )
    bench = bench_df.select(
        F.col(bench_id_col).alias("bench_id"), tokens_col(bench_text_col).alias("__toks")
    )
    bench_grams = bench.select(
        "bench_id", F.explode(shingles_of_tokens("__toks", n)).alias("sh")
    ).distinct()
    return (
        corpus_grams.join(F.broadcast(bench_grams), "sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_contaminated_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


def decontaminate_oracle_sql(
    table: str, toks_sql: str, bench_pred: str, n: int
) -> str:
    """DuckDB twin of decontaminate where the benchmark set is the rows of
    ``table`` satisfying ``bench_pred`` (the driver contract derives its
    benchmark deterministically from the corpus itself — no external data)."""
    leads = " || ' ' || ".join(["term"] + [f"lead(term, {j}) OVER w" for j in range(1, n)])
    grams = f"""
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, {leads} AS gram, lead(term, {n-1}) OVER w AS tail_term
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE tail_term IS NOT NULL"""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks_sql}) AS term,
         unnest(range(len({toks_sql}))) AS pos
  FROM {table}
),
corpus_sh AS ({grams}),
bench_sh AS (SELECT DISTINCT doc_id AS bench_id, gram FROM corpus_sh
             WHERE {bench_pred})
SELECT c.doc_id,
       CAST(count(DISTINCT c.gram) AS BIGINT) AS n_contaminated_grams,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
FROM corpus_sh c JOIN bench_sh b ON c.gram = b.gram
GROUP BY c.doc_id
"""


# -- MinHash + LSH -----------------------------------------------------------------


_MH_P = 2_147_483_647  # 2^31 - 1: products a*base stay under 2^62, no long overflow


def _minhash_perm(i: int) -> tuple[int, int]:
    """Fixed affine-permutation params (a_i, b_i) for hash i, derived from
    md5 so engine and oracle inline identical literals."""
    d = hashlib.md5(f"qw-minhash-{i}".encode()).digest()
    a = int.from_bytes(d[:8], "big") % (_MH_P - 1) + 1
    b = int.from_bytes(d[8:], "big") % _MH_P
    return a, b


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc MinHash signature: min over shingles of affine permutations
    (a_i*h + b_i) mod 2^31-1 of an md5-derived 60-bit shingle hash — one
    aggregation with num_hashes partial-aggregated mins.

    Everything is a JVM built-in (md5/conv/arithmetic, whole-stage
    codegen), and — unlike xxhash64 — every other engine can reproduce it
    exactly (see minhash_lsh_oracle_sql), so LSH outputs are verifiable
    rather than correct-with-high-probability-per-engine."""
    ex = _exploded_shingles(df, id_col, text_col, n, None)
    base = F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("long") % _MH_P
    ex = ex.select("doc_id", base.alias("__h"))
    aggs = []
    for i in range(num_hashes):
        a, b = _minhash_perm(i)
        aggs.append(F.min((F.lit(a) * F.col("__h") + F.lit(b)) % _MH_P).alias(f"mh_{i}"))
    return ex.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold_ppm: int = 500_000,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH candidate generation + exact
    Jaccard verification (output ⊆ the exact ngram_jaccard_pairs result;
    recall governed by bands×rows — 8 bands × 4 rows at τ=0.5 ⇒ ~99.9%).

    The scale path: no all-pairs shingle join — candidates come from
    equality joins on (band_idx, band_hash)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, id_col, text_col)
    # band key = the row minhashes verbatim (comma-joined): no second hash
    # to keep portable, and equality-join keys need no distribution
    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                ",", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("band")).select(
        "doc_id", "band.band_idx", "band.band_hash"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification restricted to candidates
    ex = _exploded_shingles(df, id_col, text_col, n, None)
    sizes = ex.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sha = ex.select(F.col("doc_id").alias("da"), F.col("sh").alias("sh_a"))
    shb = ex.select(F.col("doc_id").alias("db"), F.col("sh").alias("sh_b"))
    shared = (
        cand.join(sha, F.col("doc_a") == F.col("da"))
        .join(shb, (F.col("doc_b") == F.col("db")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    union_sz = F.col("n_a") + F.col("n_b") - F.col("shared")
    return (
        shared.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .filter(F.col("shared") * 1_000_000 >= F.lit(threshold_ppm) * union_sz)
        .select(
            "doc_a",
            "doc_b",
            F.floor(F.lit(1_000_000) * F.col("shared") / union_sz).cast("long").alias("jaccard_ppm"),
        )
    )


def minhash_lsh_oracle_sql(
    table: str,
    toks_sql: str,
    threshold_ppm: int,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> str:
    """DuckDB twin of minhash_lsh_pairs: re-derives the md5-affine MinHash
    signatures, the band keys, AND the candidate blocking — banding is part
    of the operator's semantics (LSH recall < 1 by design), so an exact
    all-pairs Jaccard oracle would over-report whenever the bands miss a
    qualifying pair."""
    rows_per_band = num_hashes // bands
    leads = " || ' ' || ".join(["term"] + [f"lead(term, {j}) OVER w" for j in range(1, n)])
    perms = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in ((i, _minhash_perm(i)) for i in range(num_hashes))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks_sql}) AS term,
         unnest(range(len({toks_sql}))) AS pos
  FROM {table}
),
sh AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, {leads} AS gram,
           lead(term, {n-1}) OVER w AS tail_term
    FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE tail_term IS NOT NULL
),
h AS (
  SELECT doc_id, gram,
         CAST(CAST('0x' || substr(md5(gram), 1, 15) AS UBIGINT) % {_MH_P} AS BIGINT) AS base
  FROM sh
),
perm AS (SELECT * FROM (VALUES {perms}) t(i, a, b)),
sig AS (
  SELECT doc_id, i, min((a * base + b) % {_MH_P}) AS mh
  FROM h CROSS JOIN perm GROUP BY doc_id, i
),
bandkey AS (
  SELECT doc_id, i // {rows_per_band} AS band_idx,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, i // {rows_per_band}
),
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bandkey x JOIN bandkey y
    ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT doc_a, doc_b, count(*) AS shared
  FROM cand JOIN sh a ON a.doc_id = doc_a JOIN sh b ON b.doc_id = doc_b AND a.gram = b.gram
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(floor(1000000.0 * shared / (sa.n_sh + sb.n_sh - shared)) AS BIGINT) AS jaccard_ppm
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1000000 >= {threshold_ppm} * (sa.n_sh + sb.n_sh - shared)
"""


# -- SimHash --------------------------------------------------------------------


def _stable_token_hash64(tokens: pd.Series) -> np.ndarray:
    """Deterministic 64-bit token hash (md5-based; engine-independent)."""
    import hashlib

    return np.array(
        [
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little", signed=False)
            for t in tokens
        ],
        dtype=np.uint64,
    )


def simhash_udf():
    """Vectorized pandas UDF: text → 64-bit SimHash (as signed long).
    Per batch: tokenize, hash each *unique* token once, then per-doc sum the
    ±1 bit contributions weighted by tf via numpy matrix ops."""
    from ..functions.tokenizer import tokenize_series

    @F.pandas_udf(LongType())
    def simhash(texts: pd.Series) -> pd.Series:
        tok_lists = tokenize_series(texts)
        # token-less docs (empty/null/punctuation-only) get null, not 0:
        # a 0 simhash would pair all of them at hamming distance 0, while
        # text-similarity is undefined for empty token sets (the DuckDB
        # oracle's unnest() likewise drops them)
        empty = np.array([not lst for lst in tok_lists], bool)
        all_tokens = pd.Series([t for lst in tok_lists for t in lst])
        if len(all_tokens) == 0:
            return pd.Series([pd.NA] * len(texts), dtype="Int64")
        uniq = pd.unique(all_tokens)
        h = _stable_token_hash64(pd.Series(uniq))
        shifts = np.arange(64, dtype=np.uint64)[None, :]
        bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1  # (U, 64)
        lut = {t: i for i, t in enumerate(uniq)}
        out = np.zeros(len(texts), np.uint64)
        for i, lst in enumerate(tok_lists):
            if not lst:
                continue
            idx = np.fromiter((lut[t] for t in lst), np.int64, len(lst))
            v = bits[idx].sum(axis=0)
            out[i] = np.packbits((v > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        res = pd.Series(out.view(np.int64), dtype="Int64")
        res[empty] = pd.NA
        return res

    return simhash


def simhash_oracle_sql(table: str, toks_expr: str, max_hamming: int = 3) -> str:
    """DuckDB twin of simhash_pairs: re-derives the md5-based 64-bit token
    hash (first 8 digest bytes, little-endian — the hex-pair reversal below),
    the ±1 bit-vote SimHash with the same v>0 tie rule, AND the 4×16-bit
    band blocking (which is part of the operator's semantics: at
    max_hamming > 3 banding is deliberately lossy, so an all-pairs oracle
    would over-report)."""
    h64 = (
        "CAST('0x' || substr(md5(term),15,2) || substr(md5(term),13,2) || "
        "substr(md5(term),11,2) || substr(md5(term),9,2) || substr(md5(term),7,2) || "
        "substr(md5(term),5,2) || substr(md5(term),3,2) || substr(md5(term),1,2) "
        "AS UBIGINT)"
    )
    return f"""
WITH occ AS (SELECT doc_id, unnest({toks_expr}) AS term FROM {table}),
th AS (SELECT doc_id, term, {h64} AS h FROM occ),
votes AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY doc_id, b.bit
),
sh AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (CAST(1 AS UBIGINT) << bit) ELSE CAST(0 AS UBIGINT) END) AS simhash
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash, b.band_idx, (simhash >> (b.band_idx * 16)) & 65535 AS chunk
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band_idx) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming, using
    4×16-bit band blocking (a pair within distance 3 shares at least one of
    4 bands) then exact popcount verification — no all-pairs comparison."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), simhash_udf()(F.col(text_col)).alias("simhash")
    ).filter(F.col("simhash").isNotNull())
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftrightunsigned(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk"),
        )
        for b in range(4)
    ]
    banded = sh.select("doc_id", "simhash", F.explode(F.array(*bands)).alias("b")).select(
        "doc_id", "simhash", "b.band_idx", "b.chunk"
    )
    a = banded.alias("a")
    b2 = banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


# -- duplicate-cluster resolution ------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate PAIRS → one row per member
    doc with its component label (= the component's minimum doc id, so the
    label doubles as the dedup keeper).

    Distributed min-label propagation: each round every vertex takes the
    min of its own label and its neighbors' labels — two equality joins +
    one aggregation per round, converging in O(component diameter) rounds
    (near-dup clusters are shallow: text duplicates of one source document
    form dense, small-diameter blobs, so 3-5 rounds is typical).  Lineage
    is cut every round with localCheckpoint, keeping the plan linear
    instead of exponential in iterations — the standard Spark iterative-
    algorithm discipline.  At 100 TB the per-round shuffles are keyed on
    doc ids (uniform), never on component size, so hot clusters don't skew.
    """
    # small graphs: exact union-find in the driver (the single-node escape
    # hatch — a handful of ms instead of per-round Spark job floors; the
    # iterative distributed path below is the 100-TB plan)
    cap = int(__import__("os").environ.get("QW_CC_DRIVER_MAX_PAIRS", "1000000"))
    head = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).limit(cap + 1).collect()
    if len(head) <= cap:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r_ in head:
            ra, rb = find(r_["a"]), find(r_["b"])
            if ra != rb:  # union by min label (the keeper rule)
                lo, hi = (ra, rb) if (ra < rb) else (rb, ra)
                parent[hi] = lo
        members = sorted({x for r_ in head for x in (r_["a"], r_["b"])})
        rows = [(m, find(m)) for m in members]
        sample = pairs.schema[a_col].dataType.simpleString()
        return pairs.sparkSession.createDataFrame(
            rows, f"doc_id {sample}, component {sample}"
        )

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["src"] == labels["id"])
            .groupBy(edges["dst"].alias("id2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, labels["id"] == nbr_min["id2"], "left").select(
            labels["id"],
            F.least(
                labels["component"], F.coalesce("nbr_min", labels["component"])
            ).alias("component"),
        )
        # pointer jumping (path compression): follow component → its own
        # component once per round, so label distance to the root halves —
        # convergence in O(log diameter) rounds instead of O(diameter)
        hop = stepped.select(
            F.col("id").alias("hop_id"), F.col("component").alias("hop_comp")
        )
        new_labels = (
            stepped.join(hop, stepped["component"] == hop["hop_id"], "left")
            .select(
                stepped["id"],
                F.coalesce("hop_comp", stepped["component"]).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "rounds (component diameter exceeds it) — raise max_iterations; "
            "returning partial labels would silently split duplicate clusters"
        )
    return labels.select(F.col("id").alias("doc_id"), "component")


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of connected_components over the SAME pair query:
    recursive reachability, component = min reachable id.  The recursive
    UNION dedups (node, comp) states, so it terminates; state count is
    bounded by members × labels within each component — fine at oracle
    scale (the Spark side is the one built for big graphs)."""
    return f"""
WITH RECURSIVE prs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
walk(node, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS doc_id, min(comp) AS component FROM walk GROUP BY node
"""


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    quality_col: str | None = None,
) -> DataFrame:
    """The composed near-dup PASS a training pipeline actually runs:
    candidate pairs → connected components → one winner per duplicate
    cluster → the corpus minus the losers.

    Winner rule: highest ``quality_col`` (ties → lowest id), or lowest id
    when no quality column is given — the keep-best policy of keep_best()
    applied per CLUSTER instead of per exact-hash group.

    Scale shape: the component table only contains docs that appear in a
    pair (a few % of a deduped-ish corpus), so the winner window runs on
    the small side, and the final step is a left-anti join of the full
    corpus against just the LOSERS — broadcastable in the common case and
    a plain hash anti-join otherwise (AQE picks; never a cartesian).  The
    corpus itself is never shuffled."""
    comp = connected_components(pairs, a_col, b_col)
    members = comp.join(
        df.select(
            F.col(id_col).alias("__mid"),
            *([F.col(quality_col).alias("__q")] if quality_col else []),
        ),
        comp["doc_id"] == F.col("__mid"),
    )
    order = (
        [F.col("__q").desc(), F.col("doc_id").asc()]
        if quality_col
        else [F.col("doc_id").asc()]
    )
    w = Window.partitionBy("component").orderBy(*order)
    losers = (
        members.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") > 1)
        .select(F.col("doc_id").alias("__loser"))
    )
    return df.join(losers, df[id_col] == F.col("__loser"), "left_anti")


def dedup_corpus_oracle_sql(
    pairs_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> str:
    """DuckDB twin of dedup_corpus over the SAME pair query."""
    comp_sql = components_oracle_sql(pairs_sql)
    order = (
        f"d.{quality_col} DESC, m.doc_id ASC" if quality_col else "m.doc_id ASC"
    )
    return f"""
WITH comp AS ({comp_sql}),
ranked AS (
  SELECT m.doc_id,
         row_number() OVER (PARTITION BY m.component ORDER BY {order}) AS rk
  FROM comp m JOIN {table} d ON d.{id_col} = m.doc_id
)
SELECT d.* FROM {table} d
WHERE d.{id_col} NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
"""
