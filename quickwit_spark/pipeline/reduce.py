"""PCA dimensionality reduction for embedding columns — the compression
step an embedding pipeline runs between encoding and ANN indexing
(complementary to product quantization: PQ compresses storage, PCA first
drops low-variance directions so PQ subspaces carry signal).

Scale design (10^11 vectors, dim d ~ 10^2..10^3):

* **The corpus is touched by ONE map-only pass** (``embedding_moments``):
  each partition emits a single partial-moment row (count, Σx, the d×d
  Σxxᵀ flattened) — vectorized ``m.T @ m`` per Arrow batch.  Only
  num_partitions × (d² + d + 1) floats reach the driver; the corpus is
  never shuffled or collected (same shape as similarity.train_ivf_centroids).
* **The eigendecomposition is driver-side O(d³)** on the d×d covariance —
  microseconds at any corpus size.  Deterministic output: numpy ``eigh``
  (ascending, reversed to descending) plus a sign convention (each
  component's largest-|entry| coordinate is made positive), so training is
  reproducible across partitionings.
* **Projection is map-only** (``project_pca``): an Arrow-batched
  ``(X - mean) @ componentsᵀ`` per batch, no shuffle.

The covariance statistics themselves are plain SQL (population covariance
``E[x_i x_j] - E[x_i]E[x_j]``) — driver query ``sim_pca_cov`` certifies
the distributed moment pass against a from-scratch DuckDB twin; the
eigendecomposition's invariants (orthonormality, Rayleigh quotients =
eigenvalues, reconstruction-error monotonicity) are pinned by test_pca.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def embedding_moments(df: DataFrame, vec_col: str = "embedding"):
    """(n, Σx, Σxxᵀ) in one map-only pass: per-partition partial moments,
    driver reduce.  Returns (n: int, s: ndarray[d], ss: ndarray[d, d])."""
    vecs = df.select(vec_col)

    def partials(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array([np.asarray(v, np.float64) for v in pdf.iloc[:, 0]])
            n += len(m)
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            ss = m.T @ m if ss is None else ss + m.T @ m
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "ss": [ss.ravel()]})

    rows = vecs.mapInPandas(
        partials, schema="n long, s array<double>, ss array<double>"
    ).collect()
    if not rows:
        raise ValueError("embedding_moments: empty input")
    d = len(rows[0]["s"])
    n = 0
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        n += int(r["n"])
        s += np.asarray(r["s"], np.float64)
        ss += np.asarray(r["ss"], np.float64).reshape(d, d)
    return n, s, ss


def covariance_from_moments(n: int, s: np.ndarray, ss: np.ndarray) -> np.ndarray:
    """Population covariance E[xxᵀ] - E[x]E[x]ᵀ (symmetrized against
    float accumulation asymmetry)."""
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return (cov + cov.T) / 2.0


def train_pca(df: DataFrame, k: int, vec_col: str = "embedding") -> dict:
    """Learn a k-component PCA: one distributed moment pass + driver eigh.
    Returns {"mean", "components" (k×d, rows orthonormal),
    "explained_variance" (k eigenvalues, descending),
    "total_variance" (trace of the covariance)}."""
    n, s, ss = embedding_moments(df, vec_col)
    cov = covariance_from_moments(n, s, ss)
    mean = s / n
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    # deterministic sign: each component's largest-|entry| coordinate > 0
    for i in range(len(comps)):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance": [float(w[o]) for o in order],
        "total_variance": float(np.trace(cov)),
    }


def project_pca(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "reduced",
) -> DataFrame:
    """Map-only projection: (x - mean) @ componentsᵀ per Arrow batch.
    Adds ``out_col`` as array<float> of length k; no shuffle."""
    mean = np.asarray(model["mean"], np.float64)
    comps = np.asarray(model["components"], np.float64)

    @F.pandas_udf("array<float>")
    def proj(vs: pd.Series) -> pd.Series:
        m = np.array([np.asarray(v, np.float64) for v in vs])
        if len(m) == 0:
            return pd.Series([], dtype=object)
        red = (m - mean) @ comps.T
        return pd.Series([row.astype(np.float32).tolist() for row in red])

    return df.withColumn(out_col, proj(F.col(vec_col)))


def covariance_block_df(
    df: DataFrame, dims: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """The top-left dims×dims covariance block as (i, j, cov) rows — the
    SQL-oracle surface for the distributed moment pass (population
    covariance, matching ``E[x_i x_j] - E[x_i]E[x_j]`` stated directly in
    DuckDB)."""
    n, s, ss = embedding_moments(df, vec_col)
    cov = covariance_from_moments(n, s, ss)
    spark = df.sparkSession
    rows = [
        (int(i), int(j), float(round(cov[i, j], 6)))
        for i in range(dims)
        for j in range(dims)
    ]
    return spark.createDataFrame(rows, "i long, j long, cov double")
