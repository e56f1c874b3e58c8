"""Hard-negative mining (similarity.hard_negatives): exclusion semantics,
exact-k guarantee, python parity, and the LSH path's consistency."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.similarity import hard_negatives


def _fixture(n_groups=6, per=4, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_groups, dim))
    rows, clusters = [], []
    vid = 0
    for g in range(n_groups):
        for _ in range(per):
            v = base[g] + rng.normal(scale=0.01, size=dim)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            clusters.append((vid, g))
            vid += 1
    return rows, clusters


@pytest.fixture(scope="module")
def frames(spark):
    rows, clusters = _fixture()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).persist()
    asg = spark.createDataFrame(clusters, "vec_id long, cluster_id long")
    return emb, asg, rows, dict(clusters)


def test_exact_matches_python_reference(spark, frames):
    emb, asg, rows, cl = frames
    got = hard_negatives(emb, asg, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    x = np.array([v for _, v in rows])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = x @ x.T
    for q in range(len(rows)):
        cand = [(-(sims[q, j]), j) for j in range(len(rows))
                if cl[j] != cl[q]]
        want = [j for _, j in sorted(cand)[:3]]
        mine = [r["vec_id"] for r in sorted(by_q[q],
                                            key=lambda r: r["neg_rank"])]
        assert mine == want, q
        # every mined negative is cross-cluster and not the anchor
        assert all(cl[j] != cl[q] and j != q for j in mine)


def test_exact_k_negatives_always(spark, frames):
    emb, asg, _, _ = frames
    out = hard_negatives(emb, asg, k=5)
    per = out.groupBy("query_id").count().collect()
    assert len(per) == 24 and all(r["count"] == 5 for r in per)


def test_lsh_path_agrees_at_high_recall(spark, frames):
    emb, asg, _, _ = frames
    exact = hard_negatives(emb, asg, k=3)
    # 1 plane + 1 probe bit = both buckets probed -> exhaustive recall,
    # so the LSH path must agree with exact EXACTLY (the general setting
    # trades recall for scan fraction; hard negatives sit across bucket
    # boundaries by construction, so prefer generous probing here)
    lsh = hard_negatives(emb, asg, k=3, method="lsh",
                         retrieve_k=24, n_planes=1, probe_bits=1, dim=16)
    a = sorted(map(tuple, exact.select("query_id", "vec_id").collect()))
    b = sorted(map(tuple, lsh.select("query_id", "vec_id").collect()))
    assert a == b


def test_unknown_method_raises(spark, frames):
    emb, asg, _, _ = frames
    with pytest.raises(ValueError):
        hard_negatives(emb, asg, method="faiss")
