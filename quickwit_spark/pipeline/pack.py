"""Concat-and-chunk sequence packing for LLM training-data pipelines.

GPT-style training concatenates every document's tokens in a deterministic
corpus order and cuts the stream into fixed-length training sequences
(seq_len tokens).  The pipeline artifact is the PLACEMENT MAP: for each
document, which sequence(s) it lands in and at which token offsets — the
loader can then materialize any sequence shard independently.

The hard part at 10^11 docs is the global token offset (an exclusive
prefix sum over the whole corpus in doc order).  A single
`Window.orderBy(...)` is the textbook one-liner and a single-partition
bottleneck — the entire corpus would funnel through one task.  This module
runs the classic two-level parallel prefix sum instead:

1. split the id domain into P contiguous buckets whose boundaries are
   computed ONCE on the driver (approx-quantiles of a monotone numeric key
   of the id) and baked into the plan as constants — the bucket of a row is
   a pure function of its id, so every job that evaluates it agrees, unlike
   `repartitionByRange` + `spark_partition_id()`, whose sampled boundaries
   can differ between the totals job and the window job;
2. per-bucket token totals — a P-row aggregate collected to the driver
   (one bigint per bucket, ~KBs at any corpus size);
3. exclusive prefix over those totals (driver constants again), plus a
   *per-bucket* window cumsum that runs in parallel across buckets.

Everything after the offsets is map-only JVM codegen: a doc starting at
global offset `start` with `n` tokens covers sequences
`start // L .. (start+n-1) // L`; `sequence()+explode` emits one row per
(doc, sequence) span with the token ranges on both sides.

The whole op is one hash shuffle on the bucket key + two tiny driver
aggregates, independent of corpus size — the shape that holds at 100 TB.
Boundary quality only affects balance, never correctness; pathological id
skew at worst serializes one bucket's window.  The DuckDB oracle twin is
the single-window textbook form (fine at oracle scale), which doubles as a
differential check that the distributed prefix sum equals the sequential
one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType
from pyspark.sql.window import Window

from .text import duckdb_tokens, tokens_col


def _monotone_key(df: DataFrame, id_col: str) -> Column:
    """A double-valued key monotone (ties allowed) in ``id_col``'s sort
    order: numeric ids cast directly; strings map their first 8 bytes to an
    integer (Spark compares strings byte-wise unsigned, so the byte prefix
    is order-compatible; ids sharing a prefix tie into the same bucket,
    which is harmless — the per-bucket window still orders fully by id)."""
    if isinstance(df.schema[id_col].dataType, NumericType):
        return F.col(id_col).cast("double")
    return F.coalesce(
        F.conv(
            F.hex(F.substring(F.encode(F.col(id_col).cast("string"), "UTF-8"), 1, 8)),
            16,
            10,
        ).cast("double"),
        F.lit(0.0),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Placement map (seq_id, doc_id, doc_tok_start, doc_tok_end,
    seq_tok_start) for concat-and-chunk packing at ``seq_len``.

    Docs are ordered by ``id_col``; empty docs (0 tokens) are dropped.
    ``doc_tok_start/end`` are the token range of the doc landing in
    ``seq_id``; ``seq_tok_start`` is where that chunk begins inside the
    sequence.  Deterministic for any partitioning / parallelism.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    # NB: the key expression must reference id_col by its ORIGINAL name —
    # select-expressions resolve against the input df, so building it
    # against an alias would silently bind to any pre-existing column of
    # that name (bit when shuffled_pack packs by a derived key while the
    # input still carries its own doc_id)
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(text_col)).cast("long").alias("n"),
        _monotone_key(df, id_col).alias("_k"),
    ).filter(F.col("n") > 0)

    p = int(num_buckets or t.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # Step 1: driver-fixed bucket boundaries (constants in the plan),
    # computed on the RAW input's key column only — running approxQuantile
    # on `t` would evaluate the tokenizer (for the n>0 filter) and pay a
    # third full tokenization pass; boundary quality only affects balance,
    # and the key distribution with empty docs included is the same for
    # that purpose.
    bnds = sorted(
        set(
            df.select(_monotone_key(df, id_col).alias("_k")).stat.approxQuantile(
                "_k", [i / p for i in range(1, p)], 0.01
            )
        )
    )
    bucket = F.lit(0)
    for b in bnds:
        bucket = bucket + (F.col("_k") >= F.lit(b)).cast("int")
    t = t.withColumn("_b", bucket).drop("_k")

    # Step 2+3: per-bucket totals -> driver exclusive prefix.
    totals = {
        r["_b"]: r["tot"] for r in t.groupBy("_b").agg(F.sum("n").alias("tot")).collect()
    }
    prefix, acc = {}, 0
    for b in sorted(totals):
        prefix[b] = acc
        acc += totals[b]
    prefix_col = (
        F.coalesce(
            F.create_map(*[F.lit(x) for b in prefix for x in (b, prefix[b])])[
                F.col("_b")
            ],
            F.lit(0),
        )
        if prefix
        else F.lit(0)
    )

    local = Window.partitionBy("_b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    o = t.withColumn(
        "start", prefix_col + F.coalesce(F.sum("n").over(local), F.lit(0))
    )

    L = F.lit(int(seq_len))
    spans = o.select(
        "doc_id",
        "n",
        "start",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / L),
                F.floor((F.col("start") + F.col("n") - 1) / L),
            )
        ).alias("seq_id"),
    )
    return spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col("doc_id"),
        F.greatest(F.lit(0).cast("long"), F.col("seq_id") * L - F.col("start")).alias(
            "doc_tok_start"
        ),
        F.least(F.col("n"), (F.col("seq_id") + 1) * L - F.col("start")).alias(
            "doc_tok_end"
        ),
        F.greatest(F.lit(0).cast("long"), F.col("start") - F.col("seq_id") * L).alias(
            "seq_tok_start"
        ),
    )


def pack_sequences_sql(
    seq_len: int = 2048,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: textbook single-window prefix sum + lateral unnest.

    Sequential-by-construction, so hash-matching it certifies the
    distributed two-level prefix sum in :func:`pack_sequences`.
    """
    toks = duckdb_tokens(text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, CAST(len({toks}) AS BIGINT) AS n FROM {table}
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start
  FROM t WHERE n > 0
)
SELECT g.seq_id AS seq_id,
       o.doc_id AS doc_id,
       GREATEST(0, g.seq_id * {seq_len} - o.start) AS doc_tok_start,
       LEAST(o.n, (g.seq_id + 1) * {seq_len} - o.start) AS doc_tok_end,
       GREATEST(0, o.start - g.seq_id * {seq_len}) AS seq_tok_start
FROM o CROSS JOIN
     UNNEST(generate_series(o.start // {seq_len},
                            (o.start + o.n - 1) // {seq_len})) AS g(seq_id)
"""


def pack_stats(placement: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing summary from a placement map: sequence count, token
    count, and tail padding (only the LAST sequence can be short — packing
    is gap-free by construction, which `test_pack_sequences` asserts)."""
    return placement.agg(
        (F.max("seq_id") + 1).alias("n_sequences"),
        F.sum(F.col("doc_tok_end") - F.col("doc_tok_start")).alias("n_tokens"),
        (
            (F.max("seq_id") + 1) * F.lit(int(seq_len))
            - F.sum(F.col("doc_tok_end") - F.col("doc_tok_start"))
        ).alias("pad_tokens"),
    )


def shuffled_pack(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Deterministic corpus SHUFFLE + concat-and-chunk packing — the actual
    GPT-style training-order step: docs are concatenated in a pseudo-random
    but reproducible order (so adjacent training sequences don't correlate
    with corpus order), then cut at ``seq_len``.

    The shuffle key is ``md5(salt:id) || ':' || id`` — engine-portable
    (same lowercase hex in Spark and DuckDB), uniform in its 8-hex-char
    prefix (so the prefix-sum bucketing stays balanced), and unique (the
    raw id disambiguates md5 ties), making the order total and the
    placement map deterministic at ANY parallelism.  Different salts draw
    independent training orders (epoch reshuffling = bump the salt).

    Same output schema as :func:`pack_sequences`, with ``doc_id`` mapped
    back to the original id.  Cost on top of pack_sequences: none — the
    key is one scan-side md5; the op remains one hash shuffle + two tiny
    driver aggregates.
    """
    key = F.concat_ws(
        ":",
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
        F.col(id_col).cast("string"),
    )
    id_type = df.schema[id_col].dataType.simpleString()
    out = pack_sequences(
        df.withColumn("_shuffle_key", key),
        seq_len,
        id_col="_shuffle_key",
        text_col=text_col,
    )
    # md5 hex is fixed-width 32 + ':' — the original id starts at char 34
    return out.select(
        "seq_id",
        F.substring(F.col("doc_id"), 34, 1 << 20).cast(id_type).alias("doc_id"),
        "doc_tok_start",
        "doc_tok_end",
        "seq_tok_start",
    )


def shuffled_pack_sql(
    seq_len: int = 2048,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> str:
    """DuckDB twin of shuffled_pack: the same single-window prefix sum as
    pack_sequences_sql, ordered by the identical md5 shuffle key."""
    toks = duckdb_tokens(text_col)
    key = (
        f"md5('{salt}' || ':' || CAST({id_col} AS VARCHAR))"
        f" || ':' || CAST({id_col} AS VARCHAR)"
    )
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {key} AS sk, CAST(len({toks}) AS BIGINT) AS n
  FROM {table}
), o AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY sk
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start
  FROM t WHERE n > 0
)
SELECT g.seq_id AS seq_id,
       o.doc_id AS doc_id,
       GREATEST(0, g.seq_id * {seq_len} - o.start) AS doc_tok_start,
       LEAST(o.n, (g.seq_id + 1) * {seq_len} - o.start) AS doc_tok_end,
       GREATEST(0, o.start - g.seq_id * {seq_len}) AS seq_tok_start
FROM o CROSS JOIN
     UNNEST(generate_series(o.start // {seq_len},
                            (o.start + o.n - 1) // {seq_len})) AS g(seq_id)
"""
