"""Corpus-scale ANN top-k (lsh_topk_shuffle): recall, salting, determinism.

The round-2 verdict's #1 gap: lsh_topk broadcasts the query side, so a
corpus-scale query set (every mention probing the index) had no path.
lsh_topk_shuffle is the shuffle bucket join + multi-probe + salting answer.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk_shuffle,
    srp_bucket_expr,
    srp_planes,
)

DIM = 16


@pytest.fixture(scope="module")
def clustered(spark):
    """~25 well-separated clusters of 16 vectors + queries near members."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(25, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    corpus = []
    for ci, c in enumerate(centers):
        for j in range(16):
            v = c + 0.01 * rng.normal(size=DIM)
            corpus.append((ci * 100 + j, [float(x) for x in v]))
    queries = []
    for qi in range(50):
        ci = qi % 25
        v = centers[ci] + 0.01 * rng.normal(size=DIM)
        queries.append((qi, [float(x) for x in v]))
    emb = spark.createDataFrame(corpus, ["vec_id", "embedding"])
    q = spark.createDataFrame(queries, ["query_id", "embedding"])
    return emb.persist(), q.persist()


def test_recall_vs_brute_force(clustered):
    emb, q = clustered
    exact = brute_force_topk(emb, q, k=10)
    approx = lsh_topk_shuffle(emb, q, k=10, n_planes=8, probe_bits=1, dim=DIM)
    want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.95, f"recall@10 = {recall}"


def test_salting_does_not_change_results(clustered):
    emb, q = clustered
    salted = lsh_topk_shuffle(emb, q, k=5, bucket_cap=7, dim=DIM)  # forces salting
    plain = lsh_topk_shuffle(emb, q, k=5, bucket_cap=1_000_000, dim=DIM)
    a = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in salted.collect())
    b = sorted((r["query_id"], r["vec_id"], r["rank"]) for r in plain.collect())
    assert a == b


def test_salting_bounds_task_size(clustered, spark):
    """Per-(bucket,salt) corpus cell stays near bucket_cap even for a
    degenerate corpus that hashes into one bucket."""
    rows = [(i, [1.0] * DIM) for i in range(200)]  # identical direction
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cap = 20
    planes = srp_planes(8, DIM)
    cells = (
        emb.withColumn("bucket", srp_bucket_expr(F.col("embedding"), planes))
        .withColumn("n_salt", F.lit(int(np.ceil(200 / cap))))
        .withColumn("salt", F.pmod(F.xxhash64("vec_id"), F.col("n_salt")))
        .groupBy("bucket", "salt")
        .count()
    )
    assert cells.agg(F.max("count")).first()[0] <= 3 * cap
    # and the degenerate corpus still answers correctly
    q = spark.createDataFrame([(0, [1.0] * DIM)], ["query_id", "embedding"])
    out = lsh_topk_shuffle(emb, q, k=5, bucket_cap=cap, dim=DIM)
    got = out.orderBy("rank").collect()
    assert len(got) == 5
    assert [r["vec_id"] for r in got] == [0, 1, 2, 3, 4]  # cosine ties -> id order


def test_bucket_expr_deterministic_and_integer(spark):
    """Same vector -> same bucket on repeated evaluation (pure integer
    arithmetic; no float-summation-order ambiguity)."""
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(64)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    planes = srp_planes(8, DIM)
    b1 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", srp_bucket_expr(F.col("embedding"), planes).alias("b")).collect()}
    b2 = {r["vec_id"]: r["b"] for r in emb.repartition(8).select("vec_id", srp_bucket_expr(F.col("embedding"), planes).alias("b")).collect()}
    assert b1 == b2
    # python twin: same integers
    import hashlib

    def py_bucket(vec):
        out = 0
        for p in range(8):
            dot = 0
            for d, x in enumerate(vec):
                w = int(hashlib.md5(f"srp:{p}:{d}".encode()).hexdigest()[:15], 16) % 4096 - 2048
                dot += int(np.floor(x * 4096.0)) * w
            if dot > 0:
                out += 1 << p
        return out

    for vid, vec in rows[:8]:
        assert py_bucket(vec) == b1[vid]
    # the Arrow matmul kernel is bit-identical to the relational expression
    from entitylinking_spark.operators.similarity import make_srp_bucket_udf

    udf = make_srp_bucket_udf(planes)
    b3 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", udf(F.col("embedding")).alias("b")).collect()}
    assert b3 == b1


def test_arrow_kernel_matches_native(clustered):
    """kernel='arrow' (batched BLAS einsum) returns the same ranked
    neighbors as the JVM-fold default; cosines agree to float tolerance
    (summation order is the only difference)."""
    emb, q = clustered
    native = lsh_topk_shuffle(emb, q, k=5, n_planes=8, probe_bits=1, dim=DIM)
    arrow = lsh_topk_shuffle(emb, q, k=5, n_planes=8, probe_bits=1, dim=DIM,
                             kernel="arrow")
    a = {(r["query_id"], r["vec_id"], r["rank"]): r["cosine"]
         for r in native.collect()}
    b = {(r["query_id"], r["vec_id"], r["rank"]): r["cosine"]
         for r in arrow.collect()}
    assert a.keys() == b.keys()
    for key, cos in a.items():
        assert abs(b[key] - cos) < 1e-9


def test_probe_bits_monotone_best(clustered):
    """Probing more buckets can only add candidates, so the per-query best
    cosine is monotone in probe_bits."""
    emb, q = clustered
    p0 = lsh_topk_shuffle(emb, q, k=10, probe_bits=0, dim=DIM)
    p1 = lsh_topk_shuffle(emb, q, k=10, probe_bits=1, dim=DIM)
    s0 = p0.groupBy("query_id").agg(F.max("cosine").alias("m")).collect()
    s1 = {r["query_id"]: r["m"] for r in p1.groupBy("query_id").agg(F.max("cosine").alias("m")).collect()}
    for r in s0:
        assert s1[r["query_id"]] >= r["m"] - 1e-12


def test_auto_n_planes_scales_with_corpus():
    from entitylinking_spark.operators.similarity import auto_n_planes

    assert auto_n_planes(100, 2000) == 4          # tiny corpus -> floor
    assert auto_n_planes(2000, 2000) == 4
    assert auto_n_planes(1_000_000, 2000) == 9    # ceil(log2(500))
    assert auto_n_planes(10**9, 2000) == 19
    assert auto_n_planes(10**12, 2000) == 24      # clamped at hi
    assert auto_n_planes(10**12, 2000, hi=32) == 29


def test_auto_sizing_bounds_tasks_and_replication(clustered, spark):
    """With n_planes unset and a deliberately small bucket_cap, auto-sizing
    must (a) keep per-(bucket,salt) corpus cells <= ~2*bucket_cap, (b) keep
    query-side replication <= max_salt per probe, (c) preserve recall, and
    (d) emit the census telemetry (round-3 verdict #3 + #9)."""
    from entitylinking_spark.metrics import MetricsCollector
    from entitylinking_spark.operators.similarity import (
        auto_n_planes, make_srp_bucket_udf,
    )

    emb, q = clustered  # 400 corpus rows
    cap, max_salt = 10, 8
    mc = MetricsCollector()
    approx = lsh_topk_shuffle(emb, q, k=10, bucket_cap=cap,
                              max_salt=max_salt, dim=DIM, metrics=mc)
    exact = brute_force_topk(emb, q, k=10)
    want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(want & got) / len(want)
    assert recall >= 0.95, f"recall@10 = {recall}"

    census = [s for s in mc.stages if s["stage"] == "ann_bucket_census"][0]
    n_planes = census["n_planes"]
    assert n_planes == auto_n_planes(400, cap) and n_planes >= 5
    assert census["max_n_salt"] <= max_salt

    # per-(bucket, salt) corpus cell bound under the derived plane count
    planes_n = n_planes
    from entitylinking_spark.operators.similarity import srp_planes

    udf = make_srp_bucket_udf(srp_planes(planes_n, DIM))
    cells = (
        emb.withColumn("bucket", udf(F.col("embedding")))
        .groupBy("bucket").count()
        .withColumn("n_salt", F.least(F.ceil(F.col("count") / cap),
                                      F.lit(max_salt)))
        .select((F.col("count") / F.col("n_salt")).alias("cell"))
        .agg(F.max("cell")).first()[0]
    )
    assert cells <= 2 * cap, f"per-task corpus rows {cells} > 2*cap"


def test_degenerate_bucket_replication_capped(spark):
    """10k identical vectors in one bucket: query replication stops at
    max_salt instead of ceil(S/cap)."""
    from entitylinking_spark.metrics import MetricsCollector

    rows = [(i, [1.0] * DIM) for i in range(2000)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(0, [1.0] * DIM)], ["query_id", "embedding"])
    mc = MetricsCollector()
    out = lsh_topk_shuffle(emb, q, k=5, bucket_cap=10, max_salt=16,
                           dim=DIM, metrics=mc)
    got = out.orderBy("rank").collect()
    assert [r["vec_id"] for r in got] == [0, 1, 2, 3, 4]
    census = [s for s in mc.stages if s["stage"] == "ann_bucket_census"][0]
    assert census["max_n_salt"] == 16  # capped, not ceil(2000/10)=200


def test_ann_recall_report_keys(clustered):
    from entitylinking_spark.metrics import MetricsCollector
    from entitylinking_spark.operators.similarity import ann_recall_report

    emb, q = clustered
    mc = MetricsCollector()
    rep = ann_recall_report(emb, q, k=10, sample_n=20, metrics=mc,
                            dim=DIM, probe_bits=1)
    assert rep["recall_at_k"] >= 0.9
    stages = {s["stage"] for s in mc.stages}
    assert {"ann_bucket_census", "ann_recall"} <= stages
