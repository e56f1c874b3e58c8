"""Graph confidence propagation: one-iteration neighbor rescoring.

Reference analogue (G3, /root/reference/e2e/systems/graph_system.py:953-1006):
high-confidence / done nodes pull their PENDING low-confidence neighbors in
and re-match them with the confident neighbors' entity titles appended as
extra context; rematched nodes get confidence 0.7 and status 'done'.

The full transitive closure generalization lives in operators/cc.py — this
operator reproduces the reference's single-sweep semantics exactly, as
joins:

  confident  = vertices[status in (high_confidence, done)]
  pending    = vertices[status = pending AND confidence < low_threshold]
  ctx        = edges |><| confident   ->  per pending neighbor: the list of
               confident neighbor titles (collect_set, sorted for
               determinism)
  rescore    = caller-provided (DataFrame -> DataFrame) retrieval over
               (node_id, query_text) — e.g. link against an entity table
               with operators/linking.candidate_channels or bm25_topk.

Everything is hash joins + one aggregation; the only per-row work is string
concatenation. At scale the confident⋈edges join shuffles on node ids
(uniform), never on status (3 values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

HIGH_STATUSES = ("high_confidence", "done")


def neighbor_context(vertices: DataFrame, edges: DataFrame,
                     low_threshold: float = 0.5) -> DataFrame:
    """-> (node_id, entity_text, context_titles array, query_text).

    One row per pending low-confidence node that has at least one
    confident/done neighbor — the reference's rematch work list with the
    enhanced search query ("{entity_text} {title1} {title2} ...",
    graph_system.py:987).
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    confident = vertices.filter(
        F.col("status").isin(*HIGH_STATUSES) & F.col("entity_title").isNotNull()
    ).select(F.col("node_id").alias("c_id"), F.col("entity_title").alias("c_title"))
    pending = vertices.filter(
        (F.col("status") == "pending") & (F.col("confidence") < low_threshold)
    ).select("node_id", "entity_text")
    ctx = (
        sym.join(confident, sym["src"] == confident["c_id"])
        .select(F.col("dst").alias("node_id"), "c_title")
        .join(pending, "node_id", "left_semi")
        .groupBy("node_id")
        .agg(F.sort_array(F.collect_set("c_title")).alias("context_titles"))
    )
    return pending.join(ctx, "node_id").withColumn(
        "query_text",
        F.concat_ws(" ", F.col("entity_text"), F.array_join("context_titles", " ")),
    )


def propagate_confidence(
    vertices: DataFrame,
    edges: DataFrame,
    rescore: Callable[[DataFrame], DataFrame],
    low_threshold: float = 0.5,
    rematch_confidence: float = 0.7,
) -> DataFrame:
    """One propagation sweep -> updated vertices.

    rescore: (node_id, entity_text, context_titles, query_text) ->
    (node_id, entity_id, entity_title); nodes it returns are marked done
    with `rematch_confidence` (the reference's fixed 0.7,
    graph_system.py:1002); nodes it omits keep their row unchanged.
    """
    worklist = neighbor_context(vertices, edges, low_threshold)
    rematched = rescore(worklist).select(
        F.col("node_id").alias("_rid"),
        F.col("entity_id").alias("_eid"),
        F.col("entity_title").alias("_etitle"),
    )
    out = (
        vertices.join(rematched, vertices["node_id"] == rematched["_rid"], "left")
        .withColumn("_hit", F.col("_rid").isNotNull())
        .select(
            *[
                c for c in vertices.columns
                if c not in ("entity_id", "entity_title", "confidence", "status")
            ],
            F.when(F.col("_hit"), F.col("_eid")).otherwise(F.col("entity_id")).alias("entity_id"),
            F.when(F.col("_hit"), F.col("_etitle")).otherwise(F.col("entity_title")).alias("entity_title"),
            F.when(F.col("_hit"), F.lit(rematch_confidence)).otherwise(F.col("confidence")).alias("confidence"),
            F.when(F.col("_hit"), F.lit("done")).otherwise(F.col("status")).alias("status"),
        )
    )
    return out


def final_assignment_sweep(vertices: DataFrame) -> DataFrame:
    """G4 (graph_system.py:1045-1055): any still-pending node takes its top
    candidate (first element of its candidates array), status 'done'."""
    top = F.element_at(F.col("candidates"), 1)
    is_pending = (F.col("status") == "pending") & F.col("candidates").isNotNull() & (F.size("candidates") > 0)
    return (
        vertices.withColumn(
            "entity_id", F.when(is_pending & F.col("entity_id").isNull(), top).otherwise(F.col("entity_id"))
        )
        .withColumn("status", F.when(is_pending, F.lit("done")).otherwise(F.col("status")))
    )
