"""Model-based document quality scoring: a hashed-bag-of-words linear
classifier (the fastText shape used by GPT-3/CCNet/DCLM/FineWeb-Edu
quality filters) as one declarative DataFrame plan.

The production pattern: a small trained model — fastText, a logistic head
over hashed token counts — scores every document and the pipeline keeps a
score band. The MODEL is tiny (one weight per hash bucket); the WORK is
the corpus scan. This module implements the inference plan Spark-first:

  tokens -> hash bucket (md5-derived, cross-engine checkable)
         -> broadcast join against the (bucket, weight) dim table
         -> one map-side-combined groupBy(doc) sum
         -> score = w_sum / (1000 * n_tokens), sigmoid prob, label

`hashed_weights` synthesizes a deterministic placeholder weight table so
the operator is testable hermetically (and DuckDB-recomputable for the
driver oracle); a real deployment loads trained weights into the SAME
(bucket, w) frame — e.g. exported from pyspark.ml LogisticRegression over
HashingTF features — and nothing else in the plan changes.

Reference analogue: the reference scores candidate quality with per-row
model calls (/root/reference/OneNet/main.py:1-120 drives LLM scoring per
mention); this is the corpus-scale relational form of the cheap-model
prefilter that decides which rows deserve the expensive model at all.

Scale design (the 100 TB contract):
  * the weight table is dims-sized (n_buckets rows) and explicitly
    broadcast — the corpus side never shuffles for the join;
  * the only corpus shuffle is the groupBy(doc) sum, map-side combined;
  * weights are INTEGERS in [-1000, 1000] summed as longs, divided once
    at the end — associative-safe at any partitioning (no float
    accumulation-order drift between runs or engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from entitylinking_spark.functions.relhash import md5_hash60
from entitylinking_spark.functions.strings import tokenize


def hashed_weights(spark: SparkSession, n_buckets: int = 4096,
                   seed: str = "q1") -> DataFrame:
    """Deterministic placeholder weight table: (bucket int, w long) with
    w = pmod(md5_hash60(seed:bucket), 2001) - 1000 — uniform in
    [-1000, 1000], recomputable bit-for-bit by any engine with md5.
    Swap in trained weights by building the same two-column frame."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (
            F.pmod(
                md5_hash60(F.concat(F.lit(seed + ":"),
                                    F.col("id").cast("string"))),
                F.lit(2001),
            ) - 1000
        ).cast("long").alias("w"),
    )


def score_documents(docs: DataFrame, weights: DataFrame,
                    n_buckets: int, id_col: str = "doc_id",
                    text_col: str = "text",
                    threshold: float = 0.0) -> DataFrame:
    """Score every document with the hashed linear model.

    Returns (id_col, n_tokens, w_sum, score, prob, label):
      score = w_sum / (1000 * n_tokens)   (0.0 for token-less docs)
      prob  = sigmoid(score)
      label = score >= threshold

    Every input doc appears exactly once (explode_outer keeps token-less
    docs). `n_buckets` must match the bucket space `weights` was built
    for — the token bucket is pmod(md5_hash60(token), n_buckets).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    toks = docs.select(
        F.col(id_col), F.explode_outer(tokenize(text_col)).alias("tok")
    ).select(
        id_col,
        F.when(
            F.col("tok").isNotNull(),
            F.pmod(md5_hash60("tok"), F.lit(n_buckets)).cast("int"),
        ).alias("bucket"),
    )
    joined = toks.join(F.broadcast(weights), "bucket", "left")
    per = joined.groupBy(id_col).agg(
        F.count("bucket").alias("n_tokens"),
        F.coalesce(F.sum("w"), F.lit(0).cast("long")).alias("w_sum"),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.col("w_sum") / (F.lit(1000.0) * F.col("n_tokens")),
    ).otherwise(F.lit(0.0))
    return per.select(
        id_col,
        "n_tokens",
        "w_sum",
        score.alias("score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("prob"),
        (score >= F.lit(float(threshold))).alias("label"),
    )
