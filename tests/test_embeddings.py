"""Embedding moments + PCA (operators/embeddings.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.embeddings import (
    pca_fit,
    pca_project,
    quantized_moment_sums,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").persist()


def _q(mat):
    return np.floor(np.asarray(mat, dtype=np.float64) * 4096.0)


def _collect_mat(df):
    rows = df.select("embedding").collect()
    return np.stack([np.array(r[0]) for r in rows])


def test_moment_sums_exact(spark, emb):
    mat = _collect_mat(emb)
    q = _q(mat)[:, :8]
    got = {(r["i"], r["j"]): r["s"]
           for r in quantized_moment_sums(emb, max_dim=8).collect()}
    assert got[(-1, -1)] == len(q)
    for i in range(8):
        assert got[(i, -1)] == int(q[:, i].sum())
        for j in range(i, 8):
            assert got[(i, j)] == int((q[:, i] * q[:, j]).sum())


def test_moment_sums_partitioning_invariant(spark, emb):
    a = sorted(map(tuple, quantized_moment_sums(emb, max_dim=4).collect()))
    b = sorted(map(tuple, quantized_moment_sums(
        emb.repartition(13), max_dim=4).collect()))
    assert a == b


def test_pca_fit_matches_numpy(spark, emb):
    mat = _collect_mat(emb)
    q = _q(mat) / 4096.0
    mean, comps, vals = pca_fit(emb, k=5)
    assert np.allclose(mean, q.mean(axis=0), atol=1e-12)
    cov = np.cov(q, rowvar=False, bias=True)
    ref_vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:5]
    assert np.allclose(vals, ref_vals, atol=1e-9)
    # row-orthonormal, descending
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-9)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(4))


def test_pca_project_decorrelates(spark, emb):
    mean, comps, vals = pca_fit(emb, k=4)
    out = pca_project(emb, mean, comps)
    proj = np.stack([np.array(r[0])
                     for r in out.select("proj").collect()])
    # projected covariance is diag(eigvals) up to quantization error
    # (projection runs on the RAW floats; the fit on quantized ones —
    # |x - q/4096| < 2^-12 per element)
    pcov = np.cov(proj, rowvar=False, bias=True)
    assert np.allclose(np.diag(pcov), vals, atol=1e-4)
    off = pcov - np.diag(np.diag(pcov))
    assert np.abs(off).max() < 1e-4
    # whitening: unit variance per output dim
    white = pca_project(emb, mean, comps, whiten_eigvals=vals)
    wp = np.stack([np.array(r[0])
                   for r in white.select("proj").collect()])
    assert np.allclose(np.var(wp, axis=0), 1.0, atol=1e-2)


def test_pca_validation(spark, emb):
    with pytest.raises(ValueError):
        pca_fit(emb, k=0)
    with pytest.raises(ValueError):
        pca_fit(emb, k=999)
    empty = emb.filter("vec_id < 0")
    with pytest.raises(ValueError):
        pca_fit(empty, k=2)


def test_pca_feeds_ann(spark, emb):
    """Projected vectors drop straight into the similarity operators
    (the conditioning-then-index pipeline): brute-force top-k over the
    PCA space runs and is self-consistent (each vector's own projection
    is its rank-1 neighbor)."""
    from entitylinking_spark.operators.similarity import brute_force_topk

    mean, comps, vals = pca_fit(emb, k=8)
    proj = pca_project(emb, mean, comps).select(
        "vec_id", F.col("proj").alias("embedding"))
    q = proj.filter("vec_id < 5").select(
        F.col("vec_id").alias("query_id"), "embedding")
    top = brute_force_topk(proj, q, k=3)
    r1 = {r["query_id"]: r["vec_id"]
          for r in top.filter("rank = 1").collect()}
    assert r1 == {i: i for i in range(5)}
