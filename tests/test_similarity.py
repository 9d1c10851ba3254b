"""ANN quality tests: LSH and IVF approximate top-k vs exact brute force.

The approximate paths trade recall for pruning; these tests pin (a) exact
agreement of the cosine values they DO return, and (b) a recall floor vs
brute force on a clustered synthetic embedding set (clustered data is the
realistic regime — both LSH buckets and IVF cells exploit it)."""

import numpy as np
import pytest

from quickwit_spark.pipeline import similarity as sim


@pytest.fixture(scope="module")
def embs(spark):
    rng = np.random.RandomState(11)
    # 8 cluster centers, 10 members each: near-dup structure like real data
    centers = rng.randn(8, 16) * 3
    rows = []
    for i in range(80):
        v = centers[i % 8] + rng.randn(16) * 0.4
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in df.collect()}


def test_bruteforce_is_exact_topk(spark, embs):
    out = sim.brute_force_topk(embs.filter("vec_id < 5"), embs, k=3).collect()
    assert len(out) == 15
    for r in out:
        assert 1 <= r["rank"] <= 3 and -1.0 <= r["cosine"] <= 1.0
    # rank 1 of a clustered point is a same-cluster member
    by_q = {r["query_id"]: r["neighbor_id"] for r in out if r["rank"] == 1}
    for q, n in by_q.items():
        assert q % 8 == n % 8


@pytest.mark.parametrize(
    "fn,kw",
    [
        (sim.lsh_topk, dict(n_planes=8, multiprobe=1, dim=16)),
        (sim.ivf_topk, dict(n_cells=8, n_probe=3)),
    ],
    ids=["lsh", "ivf"],
)
def test_ann_recall_and_exact_scores(spark, embs, fn, kw):
    q = embs.filter("vec_id < 10")
    exact = _pairs(sim.brute_force_topk(q, embs, k=5))
    approx = _pairs(fn(q, embs, k=5, **kw))
    # scores of returned pairs are exact (same kernel as brute force)
    for pair, cos in approx.items():
        if pair in exact:
            assert cos == pytest.approx(exact[pair], abs=1e-6)
    # recall floor on clustered data
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"


def test_near_dup_lsh_scale_path_matches_exact(spark, embs):
    """The above-the-GEMM-gate default (banded-LSH candidates + exact
    verify) must agree pair-for-pair with the exact blocked GEMM — the
    adaptive band parameters keep the per-pair miss probability ~1e-9 at
    any threshold."""
    for th in (0.9, 0.75):
        exact = {tuple(r) for r in sim.embedding_near_dup_pairs(embs, th, exact=True).collect()}
        lsh = {tuple(r) for r in sim.embedding_near_dup_pairs(embs, th, exact=False).collect()}
        assert exact == lsh
        assert len(exact) > 0  # clustered fixture: thresholds chosen to hit


def test_near_dup_gemm_streams_chunks(spark, embs, monkeypatch):
    """The exact GEMM path spills vectors to a chunk parquet and each task
    reads only its two chunks — no driver-side matrix (QW_NEARDUP_GEMM_MAX
    gates which inputs take it; force it here)."""
    monkeypatch.setenv("QW_NEARDUP_GEMM_MAX", "1000000")
    out = sim.embedding_near_dup_pairs(embs, 0.9).collect()
    assert len(out) > 0
    assert all(r["id_a"] < r["id_b"] for r in out)


def test_kmeans_ivf_training(spark, embs):
    """Lloyd's k-means recovers the fixture's 8 cluster centers: trained-
    quantizer IVF at n_probe=1 reaches near-perfect recall vs brute force
    (seed centroids need more probes for the same recall), and training is
    deterministic for a fixed input."""
    cents1 = sim.train_ivf_centroids(embs, n_cells=8, n_iters=15, vec_col="embedding")
    cents2 = sim.train_ivf_centroids(embs, n_cells=8, n_iters=15, vec_col="embedding")
    flat1 = [x for _, c in cents1 for x in c]
    flat2 = [x for _, c in cents2 for x in c]
    assert flat1 == pytest.approx(flat2)

    # every trained centroid sits near one true cluster center: its nearest
    # fixture points all share a cluster
    q = embs.filter("vec_id < 10")
    exact = _pairs(sim.brute_force_topk(q, embs, k=5))
    trained = _pairs(sim.ivf_topk(q, embs, k=5, n_probe=1, centroids=cents1))
    recall = len(set(trained) & set(exact)) / len(exact)
    assert recall >= 0.9, f"trained recall {recall:.2f}"
    # exact scores inside the candidate set (same kernel as brute force)
    for pair, cos in trained.items():
        if pair in exact:
            assert cos == pytest.approx(exact[pair], abs=1e-6)


def test_ivfpq_recall_exact_scores_and_determinism(spark, embs):
    """IVF-PQ: the ADC shortlist + exact refine returns EXACT cosines for
    every pair it returns, recall vs brute force clears the ANN floor on
    clustered data, and training/encoding are fully deterministic."""
    q = embs.filter("vec_id < 10")
    exact = _pairs(sim.brute_force_topk(q, embs, k=5))
    cents = sim.train_ivf_centroids(embs, n_cells=8, n_iters=15)
    kw = dict(k=5, n_cells=8, n_probe=3, m=8, nbits=4, refine=4, centroids=cents)
    pq1 = _pairs(sim.ivfpq_topk(q, embs, **kw))
    pq2 = _pairs(sim.ivfpq_topk(q, embs, **kw))
    assert pq1 == pq2  # seeded codebooks + deterministic encode
    for pair, cos in pq1.items():
        if pair in exact:
            assert cos == pytest.approx(exact[pair], abs=1e-6)
    recall = len(set(pq1) & set(exact)) / len(exact)
    assert recall >= 0.6, f"ivfpq recall {recall:.2f}"


def test_pq_codebooks_shape_and_reconstruction(spark, embs):
    """Codebook geometry: (m, 2^nbits, dim/m); encoding a sample vector and
    reconstructing it lands closer than the raw cell centroid (the residual
    codebooks carry real signal)."""
    cents = sim.train_ivf_centroids(embs, n_cells=8, n_iters=15)
    books = sim.train_pq_codebooks(embs, m=8, nbits=4, centroids=cents)
    assert books.shape == (8, 16, 2)
    import numpy as np

    X = np.array([r["embedding"] for r in embs.orderBy("vec_id").limit(20).collect()], dtype=np.float64)
    C = np.array([v for _, v in sorted(cents)])
    d = (X * X).sum(1)[:, None] + (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
    cell = d.argmin(1)
    R = X - C[cell]
    rec = np.zeros_like(X)
    for j in range(8):
        sub = R[:, j * 2 : (j + 1) * 2]
        cb = books[j]
        dd = (sub * sub).sum(1)[:, None] + (cb * cb).sum(1)[None, :] - 2.0 * (sub @ cb.T)
        rec[:, j * 2 : (j + 1) * 2] = cb[dd.argmin(1)]
    err_pq = np.linalg.norm(X - (C[cell] + rec), axis=1).mean()
    err_cell = np.linalg.norm(X - C[cell], axis=1).mean()
    assert err_pq < err_cell


def test_semdedup_invariants_and_trained_centroids(spark, embs):
    """SemDeDup verdicts: (a) full coverage — one verdict per input row;
    (b) every cell keeps its highest-priority member; (c) the kept set
    within a cell is pairwise BELOW the threshold (the dominance rule's
    defining invariant); (d) on the clustered fixture something is
    actually dropped; (e) a trained quantizer changes cells, not the
    invariants."""
    th = 0.75
    for cents in (None, sim.train_ivf_centroids(embs, n_cells=8, n_iters=4)):
        out = sim.semdedup(
            embs, threshold=th, n_cells=8, centroids=cents
        ).toPandas()
        assert len(out) == embs.count()
        assert set(out["kept"].unique()) <= {0, 1}
        assert out["kept"].sum() < len(out)  # clustered fixture: drops happen
        vecs = {
            r["vec_id"]: np.asarray(r["embedding"], np.float64)
            for r in embs.collect()
        }
        for _, grp in out.groupby("cell"):
            g = grp.sort_values(["cent_cos", "vec_id"]).reset_index(drop=True)
            assert g.iloc[0]["kept"] == 1  # top priority always survives
            kept = [vecs[i] for i in g[g["kept"] == 1]["vec_id"]]
            for i in range(len(kept)):
                for j in range(i + 1, len(kept)):
                    a, b = kept[i], kept[j]
                    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                    assert round(cos, 6) < th


def test_lsh_multiprobe_2_matches_oracle(spark, embs):
    """multiprobe=m must probe the FULL Hamming-<=m ball (the documented
    semantics and the oracle's bit_count(xor) <= m join), not just
    single-bit flips.  Regression: m>=2 silently probed distance 1 only."""
    import duckdb

    eng = sim.lsh_topk(
        embs.filter("vec_id < 10"), embs, k=5, n_planes=8, multiprobe=2, dim=16
    )
    got = {
        (r["query_id"], r["neighbor_id"]): (round(r["cosine"], 6), r["rank"])
        for r in eng.collect()
    }
    con = duckdb.connect()
    con.register("embeddings", embs.toPandas())
    sql = sim.lsh_topk_oracle_sql(
        "embeddings", k=5, n_queries=10, n_planes=8, multiprobe=2, dim=16
    )
    want = {
        (int(q), int(n)): (round(float(c), 6), int(rk))
        for q, n, c, rk in con.execute(sql).fetchall()
    }
    assert got == want
