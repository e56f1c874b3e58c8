"""Evaluation: pairwise F1 vs labeled pairs, micro/macro P/R/F1, recall@k.

Reference analogues:
  micro/macro P/R/F1   /root/reference/e2e/evaluation.py:537-566
  accuracy per corpus  /root/reference/OneNet/eval.py:23-50
  recall@k             /root/reference/e2e/evaluation.py:490-535
  candidate recall     /root/reference/OneNet/eval.py:6-21
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pairwise_decisions(clusters: DataFrame, labeled_pairs: DataFrame) -> DataFrame:
    """Attach the pipeline's decision (same final cluster?) to each labeled pair.

    The decision for a pair is derived from TRANSITIVE cluster membership —
    the reference's final assignment semantics (graph_system.py:1045-1055) —
    not from the raw pairwise score, so chain duplicates A~B~C count as
    (A,C) matches even when sim(A,C) < tau.
    """
    cl = clusters.select(
        F.col("row_id").alias("id_l"), F.col("cluster_id").alias("cl_l")
    )
    cr = clusters.select(
        F.col("row_id").alias("id_r"), F.col("cluster_id").alias("cl_r")
    )
    return (
        labeled_pairs.join(cl, "id_l", "left")
        .join(cr, "id_r", "left")
        .withColumn(
            "predicted",
            F.col("cl_l").isNotNull() & (F.col("cl_l") == F.col("cl_r")),
        )
    )


def pairwise_f1(clusters: DataFrame, labeled_pairs: DataFrame) -> dict:
    """Micro P/R/F1 of cluster-derived pair decisions vs labels.

    Mirrors the micro-F1 computation of
    /root/reference/e2e/evaluation.py:537-549 (sum tp/fp/fn, then derive).
    """
    d = pairwise_decisions(clusters, labeled_pairs)
    row = d.agg(
        F.sum((F.col("predicted") & F.col("is_match")).cast("long")).alias("tp"),
        F.sum((F.col("predicted") & ~F.col("is_match")).cast("long")).alias("fp"),
        F.sum((~F.col("predicted") & F.col("is_match")).cast("long")).alias("fn"),
        F.count("*").alias("n"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"] or 0), int(row["fp"] or 0), int(row["fn"] or 0)
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "n": int(row["n"]),
            "precision": p, "recall": r, "f1": f1}


def micro_macro_prf(per_sample: DataFrame, group_col: str | None = None) -> DataFrame:
    """tp/fp/fn rows -> micro + macro P/R/F1 (optionally per group).

    Input: one row per sample with integer columns tp, fp, fn.
    Micro: derive from summed counts; macro: average per-sample metrics —
    exactly the two aggregation orders of e2e/evaluation.py:537-566.
    """
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(1.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(1.0))
    enriched = per_sample.withColumn("p_s", prec).withColumn("r_s", rec).withColumn(
        "f1_s",
        F.when(F.col("p_s") + F.col("r_s") > 0,
               2 * F.col("p_s") * F.col("r_s") / (F.col("p_s") + F.col("r_s"))).otherwise(F.lit(0.0)),
    )
    keys = [group_col] if group_col else []
    agg = enriched.groupBy(*keys).agg(
        F.sum("tp").alias("stp"), F.sum("fp").alias("sfp"), F.sum("fn").alias("sfn"),
        F.avg("p_s").alias("macro_precision"),
        F.avg("r_s").alias("macro_recall"),
        F.avg("f1_s").alias("macro_f1"),
    )
    micro_p = F.when(F.col("stp") + F.col("sfp") > 0,
                     F.col("stp") / (F.col("stp") + F.col("sfp"))).otherwise(F.lit(1.0))
    micro_r = F.when(F.col("stp") + F.col("sfn") > 0,
                     F.col("stp") / (F.col("stp") + F.col("sfn"))).otherwise(F.lit(1.0))
    return (
        agg.withColumn("micro_precision", micro_p)
        .withColumn("micro_recall", micro_r)
        .withColumn(
            "micro_f1",
            F.when(
                F.col("micro_precision") + F.col("micro_recall") > 0,
                2 * F.col("micro_precision") * F.col("micro_recall")
                / (F.col("micro_precision") + F.col("micro_recall")),
            ).otherwise(F.lit(0.0)),
        )
        .drop("stp", "sfp", "sfn")
    )


def recall_at_k(candidates: DataFrame, ks: list[int] = [1, 5, 10],
                cand_col: str = "candidates", label_col: str = "label_id") -> DataFrame:
    """Per-mention ordered candidate list -> recall@k + avg candidate count.

    candidates: (mention_id, <cand_col> array<string> ordered by rank,
    <label_col> string). Reference: e2e/evaluation.py:490-535 and
    OneNet/eval.py:6-21 (avg candidate count).
    """
    first_hit = F.array_position(F.col(cand_col), F.col(label_col))  # 0 if absent
    d = candidates.withColumn("first_hit", first_hit)
    aggs = [
        F.avg(((F.col("first_hit") > 0) & (F.col("first_hit") <= k)).cast("double")).alias(f"recall_at_{k}")
        for k in ks
    ]
    aggs.append(F.avg(F.size(F.col(cand_col)).cast("double")).alias("avg_candidates"))
    return d.agg(*aggs)
