"""OneNet staged pipeline, re-expressed as one DataFrame DAG.

The reference runs this as 10+ separate CLI invocations passing JSONL files
(/root/reference/run.sh:1-9; stage table /root/reference/README.md:24-32),
one LLM call per row per stage. Here each stage is a pure
DataFrame -> DataFrame function; the LLM judgment calls are replaced by the
deterministic kernels of this engine (scoring cascade / token evidence),
and the stage boundaries can checkpoint exactly like the flagship pipeline.

Stage map (reference -> here):
  summary                 first-sentence summary        (X5)
  list2point              explode candidates            (J5)
  point_wise + filter     pairwise score + threshold    (scorer kernels, F1)
  point2list              regroup candidates            (J5 inverse)
  category                first-category extraction     (X11)
  context / prior         evidence channels             (linking channels)
  merge_context_and_prior intersect the two picks       (J3)
  merge                   final decision + tie-break    (T4/T6)
  eval                    accuracy / recall             (A3/A4/A6)

Input shapes follow schemas.MENTIONS / schemas.ENTITIES plus a
`candidates: array<string>` column per mention (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from entitylinking_spark.functions.parsing import extract_first_category
from entitylinking_spark.functions.strings import name_match_score, token_jaccard


def stage_summary(entities: DataFrame) -> DataFrame:
    """Per-entity one-sentence summary (OneNet/data_process.py:483-484)."""
    return entities.withColumn(
        "summary", F.concat(F.substring_index(F.col("text"), ".", 1), F.lit("."))
    )


def stage_list2point(mentions_with_cands: DataFrame) -> DataFrame:
    """One row per (mention, candidate) (OneNet/data_process.py:104-113)."""
    return mentions_with_cands.select(
        "*", F.explode("candidates").alias("candidate_id")
    ).drop("candidates")


def stage_pointwise(points: DataFrame, entities: DataFrame,
                    tau: float = 0.25) -> DataFrame:
    """Pairwise yes/no judgment (OneNet/prompt.py:74-111 + parse/filter
    data_process.py:115-170), LLM replaced by deterministic evidence:
    name match on the mention text vs entity title + token Jaccard of the
    mention context vs the entity summary."""
    e = stage_summary(entities).select(
        F.col("document_id").alias("candidate_id"),
        F.col("title").alias("cand_title"),
        F.col("summary").alias("cand_summary"),
    )
    scored = points.join(e, "candidate_id", "left").withColumn(
        "point_score",
        0.6 * name_match_score(F.col("text"), F.col("cand_title"))
        + 0.4 * token_jaccard(F.col("text"), F.col("cand_summary")),
    )
    return scored.withColumn("point_keep", F.col("point_score") >= tau)


def stage_point2list(points: DataFrame) -> DataFrame:
    """Regroup surviving candidates per mention, score-ordered
    (OneNet/data_process.py:311-331)."""
    kept = points.filter(F.col("point_keep"))
    return kept.groupBy("corpus", "mention_id", "text", "label_document_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("point_score")).alias("neg"),
                        F.col("candidate_id").alias("id"),
                    )
                )
            ),
            lambda s: s["id"],
        ).alias("candidates"),
        F.max("point_score").alias("best_point_score"),
    )


def stage_category(mentions: DataFrame, categories: list[str]) -> DataFrame:
    """13-way category tag (OneNet/prompt.py:54-72, parse
    data_process.py:143-156) via first-occurrence extraction over text."""
    return mentions.withColumn(
        "llm_category", extract_first_category(F.col("text"), categories)
    )


def stage_context_and_prior(listed: DataFrame, entities: DataFrame) -> DataFrame:
    """Two decision channels per mention (context listwise / prior name-only
    — OneNet/prompt.py:113-171), then their intersection
    (merge_context_and_prior — data_process.py:414-442)."""
    pts = stage_list2point(listed.select(
        "corpus", "mention_id", "text", "label_document_id", "candidates"
    ))
    e = stage_summary(entities).select(
        F.col("document_id").alias("candidate_id"),
        F.col("title").alias("cand_title"),
        F.col("summary").alias("cand_summary"),
    )
    j = pts.join(e, "candidate_id", "left")
    ctx_score = token_jaccard(F.col("text"), F.col("cand_summary"))
    prior_score = name_match_score(F.col("text"), F.col("cand_title"))
    scored = j.withColumn("ctx_score", ctx_score).withColumn("prior_score", prior_score)
    w_ctx = Window.partitionBy("mention_id").orderBy(
        F.desc("ctx_score"), F.col("candidate_id")
    )
    w_pri = Window.partitionBy("mention_id").orderBy(
        F.desc("prior_score"), F.col("candidate_id")
    )
    picks = (
        scored.withColumn("r_ctx", F.row_number().over(w_ctx))
        .withColumn("r_pri", F.row_number().over(w_pri))
    )
    ctx_pick = picks.filter(F.col("r_ctx") == 1).select(
        "mention_id", F.col("candidate_id").alias("ctx_id")
    )
    pri_pick = picks.filter(F.col("r_pri") == 1).select(
        "mention_id", F.col("candidate_id").alias("prior_id")
    )
    return (
        listed.join(ctx_pick, "mention_id", "left")
        .join(pri_pick, "mention_id", "left")
        .withColumn("channels_agree", F.col("ctx_id") == F.col("prior_id"))
    )


def stage_merge(merged: DataFrame) -> DataFrame:
    """Final decision (OneNet/prompt.py:173-209 semantics: single candidate
    short-circuits; agreeing channels win; else the context channel)."""
    return merged.withColumn(
        "predicted_id",
        F.when(F.size("candidates") == 1, F.col("candidates")[0])
        .when(F.col("channels_agree"), F.col("ctx_id"))
        .otherwise(F.coalesce(F.col("ctx_id"), F.col("prior_id"))),
    )


def stage_eval(decided: DataFrame) -> DataFrame:
    """Accuracy per corpus + overall (OneNet/eval.py:23-50 shape)."""
    per = decided.withColumn(
        "hit", (F.col("predicted_id") == F.col("label_document_id")).cast("long")
    )
    return per.cube("corpus").agg(
        F.count("*").alias("n"),
        F.sum("hit").alias("hits"),
        F.round(F.sum("hit") / F.count("*"), 6).alias("accuracy"),
    )


def run_onenet(mentions_with_cands: DataFrame, entities: DataFrame,
               categories: list[str] | None = None,
               pointwise_tau: float = 0.25) -> DataFrame:
    """Full staged pipeline: mentions(+candidates) + entities -> decisions."""
    cats = categories or ["person", "location", "organization", "event", "work"]
    pts = stage_list2point(mentions_with_cands)
    pts = stage_pointwise(pts, entities, tau=pointwise_tau)
    listed = stage_point2list(pts)
    listed = stage_category(listed, cats)
    merged = stage_context_and_prior(listed, entities)
    return stage_merge(merged)
