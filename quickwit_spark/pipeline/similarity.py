"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k: broadcast the query batch,
  score with an Arrow-batched pandas UDF (one numpy einsum per batch —
  measured ~1.8x the Catalyst ``aggregate(zip_with(...))`` per-element
  lambda), rank via a window.  The correctness baseline; O(Q×N) — fine
  when the query side is small and broadcast.
* ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit sketch from a
  seeded plane matrix (deterministic, no wall-clock), candidates restricted
  to multiprobe-adjacent buckets, then exact cosine within candidates.  The
  scale path: candidate generation is an equality join on bucket id, so the
  shuffle is linear in rows×probes instead of Q×N.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm_col(vec: str):
    return F.sqrt(
        F.aggregate(F.col(vec), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine_udf(a, b):
    """Arrow-batched cosine of two array<float> columns: one numpy einsum
    per batch instead of a Catalyst per-element aggregate lambda — ~1.8x
    faster on broadcast-join scoring (measured, 50x2000 brute force)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(x: pd.Series, y: pd.Series) -> pd.Series:
        A = np.stack(x.to_numpy()).astype(np.float64)
        B = np.stack(y.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt((A * A).sum(1)) * np.sqrt((B * B).sum(1))
        return pd.Series(num / den)

    return cos(a, b)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Output: (query_id, neighbor_id, cosine, rank), rank 1..k, ties broken by
    neighbor_id asc (deterministic).  Self-matches (same id) excluded.
    The query side is broadcast — at scale that is the right plan for a
    bounded query batch against a huge corpus (no corpus shuffle at all)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _cosine_udf(F.col("qv"), F.col("cv")).alias("cosine")
    scored = joined.select("query_id", "neighbor_id", cos)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def brute_force_topk_oracle_sql(table: str, k: int, n_queries: int) -> str:
    """DuckDB twin: zipped-unnest dot product in double precision, identical
    tie-break."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM {table} WHERE vec_id < {n_queries}),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.qv) AS x, unnest(c.embedding) AS y)) /
         (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) FROM (SELECT unnest(q.qv) AS x))) *
          sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) FROM (SELECT unnest(c.embedding) AS y))))
         AS cosine
  FROM {table} c, q
  WHERE c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank
FROM ranked WHERE rank <= {k}
"""


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate cosine top-k: the scale path for ANN over a huge
    corpus.

    Coarse quantizer: the embeddings of the first ``n_cells`` ids serve as
    deterministic seed centroids (no training step — data-derived, stable,
    and reproducible by the SQL oracle).  Build side: every corpus vector is
    assigned to its nearest centroid by L2 with ONE broadcast join (the
    centroid table is tiny; no corpus shuffle — at 100 TB this is a
    map-only pass whose output is the cell-partitioned index).  Query side:
    each query probes its ``n_probe`` nearest cells; candidates are only
    the vectors in probed cells; exact cosine + the brute-force tie-break
    inside the candidate set.  Recall < 1 by design; benchmarked against
    brute force in tests."""
    cents = F.broadcast(
        corpus.filter(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cent_id"), F.col(vec_col).alias("centv")
        )
    )

    def assign(df: DataFrame, out_id: str, out_vec: str, probes: int) -> DataFrame:
        d = df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec))
        w = Window.partitionBy(out_id).orderBy(
            F.col("dist").asc(), F.col("cent_id").asc()
        )
        return (
            d.crossJoin(cents)
            .withColumn("dist", _l2sq(F.col(out_vec), F.col("centv")))
            .withColumn("cell_rank", F.row_number().over(w))
            .filter(F.col("cell_rank") <= probes)
            .select(out_id, out_vec, F.col("cent_id").alias("cell"))
        )

    c = assign(corpus, "neighbor_id", "cv", 1)
    q = assign(queries, "query_id", "qv", n_probe)
    cand = c.join(F.broadcast(q), "cell").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _cosine_udf(F.col("qv"), F.col("cv")).alias("cosine")
    scored = cand.select("query_id", "neighbor_id", cos).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_topk_oracle_sql(
    table: str, k: int, n_queries: int, n_cells: int = 16, n_probe: int = 4
) -> str:
    """DuckDB twin of ivf_topk: same seed-centroid quantizer (embeddings of
    ids < n_cells), same L2 assignment with (dist, cent_id) tie-break, same
    n_probe cell expansion, exact cosine + identical tie-break within the
    candidate set."""
    l2 = (
        "(SELECT sum((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))"
        "   FROM (SELECT unnest({a}) AS x, unnest({b}) AS y))"
    )
    return f"""
WITH cents AS (SELECT vec_id AS cent_id, embedding AS centv FROM {table} WHERE vec_id < {n_cells}),
c_assign AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, cent_id AS cell
  FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {l2.format(a='e.embedding', b='c.centv')} ASC, c.cent_id ASC
           ) AS cell_rank
    FROM {table} e CROSS JOIN cents c
  ) WHERE cell_rank = 1
),
q_assign AS (
  SELECT vec_id AS query_id, embedding AS qv, cent_id AS cell
  FROM (
    SELECT e.vec_id, e.embedding, c.cent_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {l2.format(a='e.embedding', b='c.centv')} ASC, c.cent_id ASC
           ) AS cell_rank
    FROM {table} e CROSS JOIN cents c
    WHERE e.vec_id < {n_queries}
  ) WHERE cell_rank <= {n_probe}
),
ranked AS (
  SELECT q.query_id, c.neighbor_id,
         (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
            FROM (SELECT unnest(q.qv) AS x, unnest(c.cv) AS y)) /
         (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) FROM (SELECT unnest(q.qv) AS x))) *
          sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) FROM (SELECT unnest(c.cv) AS y))))
         AS cosine
  FROM q_assign q JOIN c_assign c ON q.cell = c.cell
  WHERE q.query_id <> c.neighbor_id
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
FROM ranked
QUALIFY rank <= {k}
"""


def lsh_topk_oracle_sql(
    table: str,
    k: int,
    n_queries: int,
    n_planes: int = 10,
    seed: int = 42,
    dim: int = 64,
    multiprobe: int = 1,
) -> str:
    """DuckDB twin of lsh_topk: the SAME seeded hyperplanes are inlined as
    SQL literals, buckets are recomputed sign-by-sign, and the multiprobe
    bucket expansion is expressed as hamming(query_bucket, corpus_bucket)
    <= multiprobe (flipping <=m bits of the query bucket and requiring
    exact equality is the same predicate).  Exact cosine + identical
    tie-break inside the candidate set."""
    planes = random_planes(dim, n_planes, seed)
    plane_rows = ",\n    ".join(
        "({}, [{}])".format(i, ", ".join(repr(float(v)) for v in p))
        for i, p in enumerate(planes)
    )
    return f"""
WITH planes(plane_id, plane) AS (VALUES
    {plane_rows}
),
codes AS (
  SELECT e.vec_id, e.embedding,
         CAST(sum(CASE WHEN
           (SELECT sum(CAST(x AS DOUBLE) * y)
              FROM (SELECT unnest(e.embedding) AS x, unnest(p.plane) AS y)) >= 0
           THEN (1 << p.plane_id) ELSE 0 END) AS BIGINT) AS bucket
  FROM {table} e CROSS JOIN planes p
  GROUP BY e.vec_id, e.embedding
),
qc AS (SELECT * FROM codes WHERE vec_id < {n_queries}),
cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         q.embedding AS qv, c.embedding AS cv
  FROM qc q JOIN codes c
    ON bit_count(xor(q.bucket, c.bucket)) <= {multiprobe}
   AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         (SELECT sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
            FROM (SELECT unnest(qv) AS x, unnest(cv) AS y)) /
         (sqrt((SELECT sum(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)) FROM (SELECT unnest(qv) AS x))) *
          sqrt((SELECT sum(CAST(y AS DOUBLE)*CAST(y AS DOUBLE)) FROM (SELECT unnest(cv) AS y))))
         AS cosine
  FROM cand
)
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
FROM ranked
QUALIFY rank <= {k}
"""


def random_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).randn(n_planes, dim)


def _bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket id from literal plane arrays (pure codegen exprs)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        d = _dot(F.col(vec_col), plane)
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    seed: int = 42,
    multiprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane buckets + multiprobe
    (each query also probes buckets at Hamming distance <= multiprobe by
    flipping one bit), exact cosine inside the candidate set.

    Output schema matches brute_force_topk; recall < 1 by design (the
    approximate scale path — benchmarked against brute force in tests)."""
    planes = random_planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        _bucket_expr(vec_col, planes).alias("bucket"),
    )
    probes = [q0]
    if multiprobe >= 1:
        for i in range(n_planes):
            probes.append(
                q0.withColumn("bucket", F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long"))
            )
    q = probes[0]
    for p in probes[1:]:
        q = q.unionByName(p)
    cand = c.join(F.broadcast(q), "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = _cosine_udf(F.col("qv"), F.col("cv")).alias("cosine")
    scored = cand.select("query_id", "neighbor_id", cos).dropDuplicates(
        ["query_id", "neighbor_id"]
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.95, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold, a < b).

    Exact all-pairs by construction (the APPROXIMATE scale path is LSH/IVF
    in this module — exact all-pairs is quadratic no matter the engine).
    Up to QW_NEARDUP_GEMM_MAX rows (default 300k) the pair space runs as
    blocked numpy matrix products over a broadcast of the vectors: chunk
    the rows, one task per upper-triangle chunk pair, ``A @ B.T`` per task
    — ~100x the per-pair throughput of evaluating the dot as a Catalyst
    aggregate expression inside an inequality join (measured 58 s → ~2 s on
    100k pairs-of-10k-rows at sf0.1).  Above the gate it falls back to the
    declarative self-join (no driver materialization)."""
    gemm_max = int(__import__("os").environ.get("QW_NEARDUP_GEMM_MAX", "300000"))
    n = df.count()
    if n <= gemm_max:
        return _near_dup_gemm(df, threshold, id_col, vec_col)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    joined = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = (_dot(F.col("va"), F.col("vb")) / (_norm_col("va") * _norm_col("vb"))).alias("cosine")
    return (
        joined.select("id_a", "id_b", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def _near_dup_gemm(df: DataFrame, threshold: float, id_col: str, vec_col: str) -> DataFrame:
    spark = df.sparkSession
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    chunk = 2048
    nchunks = max(1, -(-len(ids) // chunk))
    bc = spark.sparkContext.broadcast((ids, mat, norms))
    pairs = [(i, j) for i in range(nchunks) for j in range(i, nchunks)]

    def work(it):
        ids_, mat_, norms_ = bc.value
        for i, j in it:
            ai, aj = slice(i * chunk, (i + 1) * chunk), slice(j * chunk, (j + 1) * chunk)
            # dot-then-divide, same form as the SQL oracle (not pre-normalized
            # rows), so the float64 rounding matches to the last ulp class
            sim = (mat_[ai] @ mat_[aj].T) / np.outer(norms_[ai], norms_[aj])
            ia, ja = np.nonzero(sim >= threshold)
            if not len(ia):
                continue
            left, right = ids_[ai][ia], ids_[aj][ja]
            lo = np.minimum(left, right)
            hi = np.maximum(left, right)
            keep = lo < hi  # drop self-pairs; orient id_a < id_b
            py = lambda v: v.item() if hasattr(v, "item") else v  # noqa: E731
            for a_, b_, c_ in zip(lo[keep], hi[keep], np.round(sim[ia, ja][keep], 6)):
                yield (py(a_), py(b_), float(c_))

    from pyspark.sql.types import DoubleType, StructField, StructType

    id_type = df.schema[id_col].dataType
    schema = StructType(
        [
            StructField("id_a", id_type),
            StructField("id_b", id_type),
            StructField("cosine", DoubleType()),
        ]
    )
    rdd = spark.sparkContext.parallelize(
        pairs, min(len(pairs), spark.sparkContext.defaultParallelism)
    ).mapPartitions(work)
    out = spark.createDataFrame(rdd, schema)
    # i == j diagonal chunks emit each qualifying pair once as (lo, hi); the
    # i < j off-diagonal chunks see each unordered pair exactly once too —
    # but a pair split across chunks appears in only one (i, j) cell, so no
    # dedup is needed; distinct() guards the i == j mirrored entries
    return out.distinct()
