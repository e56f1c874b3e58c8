"""SemDeDup (operators/dedup.py::semdedup) vs an independent numpy
union-find reference: cells, components, and keep-policy reps must match
exactly, under any partitioning, on a fixture with engineered duplicate
groups (reference cosine probe: /root/reference/Sparkle/database.py:165-183)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.dedup import semdedup
from entitylinking_spark.operators.ivf import seed_centroids


def _fixture(n=60, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(8, dim))
    rows = []
    for i in range(n):
        v = base[i % 8] + rng.normal(scale=(0.02 if i % 3 else 0.8), size=dim)
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    return rows


def _reference(rows, cents_q, eps, keep):
    """Pure-python SemDeDup: integer cell assignment, within-cell cosine
    edges, union-find closure, policy rep. Shares NOTHING with the
    operator but the quantized centroids."""
    ids = [str(i) for i, _ in rows]
    x = np.asarray([v for _, v in rows], dtype=np.float64)
    q = np.floor(x * 4096.0)
    d = (cents_q * cents_q).sum(axis=1)[None, :] - 2.0 * (q @ cents_q.T)
    cell = np.argmin(d, axis=1)
    cdist = d[np.arange(len(cell)), cell].astype(np.int64)

    parent = {i: i for i in ids}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    norms = np.linalg.norm(x, axis=1)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if cell[i] != cell[j]:
                continue
            cos = float(x[i] @ x[j] / (norms[i] * norms[j]))
            if cos >= eps:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in ids}
    members = {}
    for k, i in enumerate(ids):
        members.setdefault(comp[i], []).append(k)
    rep = {}
    for c, ks in members.items():
        if keep == "min_id":
            rep[c] = min(ids[k] for k in ks)
        else:
            sign = -1 if keep == "far" else 1
            rep[c] = min((sign * int(cdist[k]), ids[k]) for k in ks)[1]
    return {
        ids[k]: (int(cell[k]), int(cdist[k]), comp[ids[k]], rep[comp[ids[k]]])
        for k in range(len(ids))
    }


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        _fixture(), "vec_id long, embedding array<double>"
    ).persist()


@pytest.mark.parametrize("keep", ["far", "near", "min_id"])
def test_matches_union_find_reference(spark, emb, keep):
    cents = seed_centroids(emb, 8)
    got = {
        r["row_id"]: (r["cell"], r["cdist"], r["cluster_id"], r["rep_id"],
                      r["is_kept"])
        for r in semdedup(emb, eps=0.9, centroids=cents, keep=keep).collect()
    }
    want = _reference(_fixture(), cents, 0.9, keep)
    assert set(got) == set(want)
    for i, (cell, cdist, comp, rep) in want.items():
        g = got[i]
        assert g[:2] == (cell, cdist), i
        assert g[2] == comp and g[3] == rep, i
        assert g[4] == (i == rep)


def test_exactly_one_rep_per_cluster(spark, emb):
    out = semdedup(emb, eps=0.9, centroids=seed_centroids(emb, 8))
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_kept").cast("int")).alias("k")
    )
    assert per.filter(F.col("k") != 1).count() == 0


def test_partitioning_invariance(spark, emb):
    cents = seed_centroids(emb, 8)
    a = sorted(map(tuple, semdedup(emb, eps=0.9, centroids=cents).collect()))
    b = sorted(map(tuple,
                   semdedup(emb.repartition(7), eps=0.9,
                            centroids=cents).collect()))
    assert a == b


def test_policies_pick_different_reps_on_spread_cluster(spark, emb):
    cents = seed_centroids(emb, 8)
    far = semdedup(emb, eps=0.9, centroids=cents, keep="far")
    near = semdedup(emb, eps=0.9, centroids=cents, keep="near")
    j = (
        far.select("cluster_id", F.col("rep_id").alias("far_rep")).distinct()
        .join(near.select("cluster_id", F.col("rep_id").alias("near_rep"))
              .distinct(), "cluster_id")
    )
    # at least one multi-member cluster must rank far/near differently
    assert j.filter(F.col("far_rep") != F.col("near_rep")).count() > 0


def test_fit_centroids_path_and_empty_and_single(spark, emb):
    # auto path: fit_centroids + auto_n_cells, just has to be consistent
    out = semdedup(emb, eps=0.9, n_cells=4)
    assert out.count() == 60
    assert out.filter(F.col("is_kept")).count() == out.select(
        "cluster_id").distinct().count()

    one = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = semdedup(one, eps=0.9, n_cells=1).collect()
    assert len(r) == 1 and r[0]["is_kept"]

    with pytest.raises(ValueError):
        semdedup(one.filter("vec_id < 0"), eps=0.9, n_cells=1)


def test_bad_keep_policy_raises(spark, emb):
    with pytest.raises(ValueError):
        semdedup(emb, eps=0.9, n_cells=2, keep="random")


def test_arrow_kernel_matches_native(spark, emb):
    cents = seed_centroids(emb, 8)
    a = sorted(map(tuple, semdedup(emb, eps=0.9, centroids=cents).collect()))
    b = sorted(map(tuple,
                   semdedup(emb, eps=0.9, centroids=cents,
                            kernel="arrow").collect()))
    assert a == b
    with pytest.raises(ValueError):
        semdedup(emb, eps=0.9, centroids=cents, kernel="gpu").collect()
