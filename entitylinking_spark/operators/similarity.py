"""Similarity search over embedding columns (array<float>).

Replaces the reference's embedding top-k probe
(/root/reference/Sparkle/database.py:165-183: np.dot + argsort per query;
/root/reference/e2e/entity_database.py:306-324) with distributed variants:

  brute_force_topk    exact cosine top-k via JVM-native dot products +
                      a rank window — the correctness baseline
  lsh_topk            random-hyperplane LSH buckets bound the join
                      (the 100TB scale path; approximate)

Dot products use F.zip_with/F.aggregate (whole-stage codegen, no Python);
the hyperplane projections are one Arrow-batched matmul per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v.cast("double")
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "query_id", qvec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the big
    corpus, score JVM-native, take the per-query rank window.

    Returns (query_id, vec_id, cosine, rank). Ties broken by vec_id so the
    result is deterministic (the reference's argsort is stable — T4).
    """
    q = F.broadcast(
        queries.select(F.col(qid_col).alias("_qid"), F.col(qvec_col).alias("_qvec"))
    )
    scored = embeddings.crossJoin(q).select(
        F.col("_qid").alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_sim(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# Fixed random hyperplanes (seeded) shared by corpus and queries.
_HP_RNG = np.random.RandomState(1234)
_HP_MAX_PLANES = 32
_HP_MAX_DIM = 4096
_HYPERPLANES = _HP_RNG.normal(size=(_HP_MAX_PLANES, _HP_MAX_DIM))


def hyperplane_bucket(vec_col: Column, n_planes: int = 8) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (SRP-LSH for cosine).

    Arrow-batched: one (batch, dim) x (dim, planes) matmul per batch.
    """
    planes = _HYPERPLANES[:n_planes]

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.array(vecs.tolist(), dtype=np.float64)
        proj = mat @ planes[:, : mat.shape[1]].T
        bits = (proj > 0).astype(np.int32)
        out = np.zeros(len(vecs), dtype=np.int32)
        for j in range(bits.shape[1]):
            out |= bits[:, j] << j
        return pd.Series(out)

    return bucket(vec_col)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 8, id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "query_id", qvec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: only score corpus vectors in the query's SRP
    bucket. Trades recall for a bucket-equi-join instead of a cross join;
    at 100TB the bucket count is raised (n_planes) until buckets fit."""
    corp = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_vec")
    ).withColumn("bucket", hyperplane_bucket(F.col("_vec"), n_planes))
    q = queries.select(
        F.col(qid_col).alias("query_id"), F.col(qvec_col).alias("_qvec")
    ).withColumn("bucket", hyperplane_bucket(F.col("_qvec"), n_planes))
    scored = corp.join(F.broadcast(q), "bucket").select(
        "query_id", "vec_id", cosine_sim(F.col("_vec"), F.col("_qvec")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
