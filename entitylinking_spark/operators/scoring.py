"""Pairwise scoring of candidate pairs.

Reference analogue: the pointwise yes/no filter over (mention, candidate)
pairs (/root/reference/OneNet/prompt.py:74-111, parsed+filtered at
/root/reference/OneNet/data_process.py:115-170) and the similarity scorers
(/root/reference/e2e/entity_database.py:353-372,
/root/reference/e2e/systems/graph_system.py:754-763). The LLM judgment is
replaced by deterministic string-similarity kernels (BASELINE.json
north_star); the cheap-before-expensive cascade (SURVEY.md §4) is kept:

  1. JVM-native components first: sha equality, MinHash estimate,
     Levenshtein on paths. Jaro-Winkler on file names is the only Arrow
     kernel in the hot path.
  2. Exact token-Jaccard (the expensive verify — needs full token sets)
     runs ONLY on pairs whose cheap score clears `tau - prescreen_margin`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.hashing import minhash_similarity
from entitylinking_spark.functions.strings import (
    jaro_winkler_udf,
    levenshtein_sim,
    tokenize,
)
from entitylinking_spark.operators.blocking import ERConfig

_FEATURES = ["row_id", "fname", "path", "minhash", "content_sha"]


def _attach(pairs: DataFrame, keyed: DataFrame, cols: list[str]) -> DataFrame:
    feats = keyed.select(*cols)
    l = feats.select([F.col(c).alias(f"{c}_l") for c in cols])
    r = feats.select([F.col(c).alias(f"{c}_r") for c in cols])
    return (
        pairs.join(l, pairs["id_l"] == l["row_id_l"])
        .join(r, pairs["id_r"] == r["row_id_r"])
        .drop("row_id_l", "row_id_r")
    )


def score_pairs(pairs: DataFrame, keyed: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """(id_l,id_r,block_key) + keyed features -> SCORED_PAIRS rows."""
    p = _attach(pairs, keyed, _FEATURES)

    p = (
        p.withColumn("name_sim", jaro_winkler_udf(F.col("fname_l"), F.col("fname_r")))
        .withColumn("lev_sim", levenshtein_sim(F.col("path_l"), F.col("path_r")))
        .withColumn("exact", F.col("content_sha_l") == F.col("content_sha_r"))
        .withColumn("minhash_sim", minhash_similarity("minhash_l", "minhash_r"))
        .withColumn("name_comp", F.greatest(F.col("name_sim"), F.col("lev_sim")))
        .withColumn(
            "content_est",
            F.when(F.col("exact"), F.lit(1.0)).otherwise(F.col("minhash_sim")),
        )
        .withColumn(
            "score_est",
            cfg.w_name * F.col("name_comp") + cfg.w_content * F.col("content_est"),
        )
    )
    base_cols = ["id_l", "id_r", "block_key", "name_sim", "lev_sim", "minhash_sim",
                 "name_comp", "exact"]

    if not cfg.verify_jaccard:
        return p.select(
            *base_cols,
            F.lit(None).cast("double").alias("jaccard_sim"),
            F.col("score_est").alias("score"),
        ).drop("name_comp", "exact")

    prescreen = F.col("exact") | (F.col("score_est") >= F.lit(cfg.tau - cfg.prescreen_margin))
    cheap_rejects = p.filter(~prescreen).select(
        *base_cols,
        F.lit(None).cast("double").alias("jaccard_sim"),
        F.col("score_est").alias("score"),
    )

    toks = keyed.select(
        "row_id", F.array_distinct(tokenize(F.col("content"))).alias("ctoks")
    )
    survivors = p.filter(prescreen)
    tl = toks.select(F.col("row_id").alias("_tid_l"), F.col("ctoks").alias("ctoks_l"))
    tr = toks.select(F.col("row_id").alias("_tid_r"), F.col("ctoks").alias("ctoks_r"))
    verified = (
        survivors.join(tl, survivors["id_l"] == tl["_tid_l"])
        .join(tr, survivors["id_r"] == tr["_tid_r"])
        .withColumn(
            "jaccard_sim",
            F.when(F.col("exact"), F.lit(1.0)).otherwise(
                F.size(F.array_intersect("ctoks_l", "ctoks_r")).cast("double")
                / F.greatest(
                    F.size(F.array_union("ctoks_l", "ctoks_r")).cast("double"), F.lit(1.0)
                )
            ),
        )
        .withColumn(
            "score",
            cfg.w_name * F.col("name_comp") + cfg.w_content * F.col("jaccard_sim"),
        )
        .select(*base_cols, "jaccard_sim", "score")
    )
    return cheap_rejects.unionByName(verified).drop("name_comp", "exact")


def matched_edges(scored: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Threshold scored pairs into undirected edges (src,dst)."""
    return scored.filter(F.col("score") >= cfg.tau).select(
        F.col("id_l").alias("src"), F.col("id_r").alias("dst")
    )
