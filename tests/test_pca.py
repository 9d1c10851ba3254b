"""PCA embedding reduction (pipeline/reduce.py): the distributed moment
pass vs numpy ground truth, eigendecomposition invariants, projection
correctness, and parallelism determinism."""

import numpy as np
import pytest

from quickwit_spark.pipeline.reduce import (
    covariance_from_moments,
    embedding_moments,
    project_pca,
    train_pca,
)


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.default_rng(7)
    # anisotropic cloud: variance concentrated in a few known directions
    base = rng.normal(size=(300, 16)) * np.linspace(3.0, 0.1, 16)
    rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(base)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base.astype(np.float32).astype(np.float64),
    )


def test_moments_match_numpy(embs):
    df, x = embs
    n, s, ss = embedding_moments(df)
    assert n == len(x)
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(ss, x.T @ x, rtol=1e-12)
    cov = covariance_from_moments(n, s, ss)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True), rtol=1e-9)


def test_train_invariants(embs):
    df, x = embs
    m = train_pca(df, k=6)
    comps = np.asarray(m["components"])
    ev = np.asarray(m["explained_variance"])
    # rows orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(6), atol=1e-9)
    # eigenvalues descending, each the Rayleigh quotient of its component
    assert all(ev[i] >= ev[i + 1] for i in range(5))
    cov = np.cov(x, rowvar=False, bias=True)
    for i in range(6):
        np.testing.assert_allclose(comps[i] @ cov @ comps[i], ev[i], rtol=1e-9)
    # the anisotropic axes dominate: top-6 capture most of the variance
    assert ev.sum() / m["total_variance"] > 0.7
    # sign convention: largest-|entry| coordinate positive
    for row in comps:
        assert row[int(np.abs(row).argmax())] > 0


def test_projection_and_variance(embs):
    df, x = embs
    m = train_pca(df, k=4)
    out = project_pca(df, m).orderBy("vec_id").collect()
    red = np.array([r["reduced"] for r in out], np.float64)
    comps = np.asarray(m["components"])
    mean = np.asarray(m["mean"])
    expect = (x - mean) @ comps.T
    np.testing.assert_allclose(red, expect, atol=1e-4)  # float32 output col
    # projected dims are uncorrelated with variances = eigenvalues
    pv = np.cov(red, rowvar=False, bias=True)
    np.testing.assert_allclose(np.diag(pv), m["explained_variance"], rtol=1e-3)
    off = pv - np.diag(np.diag(pv))
    assert np.abs(off).max() < 1e-3 * max(m["explained_variance"])


def test_reconstruction_error_monotone(embs):
    df, x = embs
    errs = []
    for k in (2, 4, 8):
        m = train_pca(df, k=k)
        comps = np.asarray(m["components"])
        mean = np.asarray(m["mean"])
        rec = mean + ((x - mean) @ comps.T) @ comps
        errs.append(float(((x - rec) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]


def test_parallelism_deterministic(embs):
    df, _ = embs
    m1 = train_pca(df, k=5)
    m2 = train_pca(df.repartition(7), k=5)
    np.testing.assert_allclose(m1["components"], m2["components"], atol=1e-9)
    np.testing.assert_allclose(
        m1["explained_variance"], m2["explained_variance"], rtol=1e-12
    )
