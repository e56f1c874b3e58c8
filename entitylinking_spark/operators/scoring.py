"""Pairwise scoring of candidate pairs.

Reference analogue: the pointwise yes/no filter over (mention, candidate)
pairs (/root/reference/OneNet/prompt.py:74-111, parsed+filtered at
/root/reference/OneNet/data_process.py:115-170) and the similarity scorers
(/root/reference/e2e/entity_database.py:353-372,
/root/reference/e2e/systems/graph_system.py:754-763). The LLM judgment is
replaced by deterministic string-similarity kernels (BASELINE.json
north_star); the cheap-before-expensive cascade (SURVEY.md §4):

  1. JVM-native first: sha equality, MinHash estimate, Levenshtein on file
     names — all whole-stage-codegen.
  2. PROBABILISTIC prune: assuming a perfect name similarity (1.0), a pair
     with w_name*1 + w_content*content_est < tau - margin is rejected
     without ever running Python. content_est is a b-bit minwise ESTIMATE
     (std ~0.06 at 64 positions, Li & König 2010), not an upper bound on
     the exact verify-Jaccard: the default margin 0.15 is ~2.5 sigma, so a
     pair whose true content similarity exactly equals tau has a ~0.7%
     one-sided chance of being pruned (shrinking fast for pairs further
     above tau). Widen cfg.prescreen_margin for a stricter guarantee, or
     set it >= tau - to disable pruning entirely.
  3. Survivors only: Arrow-batched Jaro-Winkler + exact token n-gram
     verification (the expensive token-set join). Pairs with IDENTICAL
     file names skip the Python kernel (name_sim = 1.0 JVM-side).

SCORED_PAIRS output contract (name_sim semantics, ADVICE r3): name_sim is
NULL for pruned pairs (never computed), 1.0 for equal-name pairs
(JVM-side), Jaro-Winkler for pairs inside the decision band, and the
LEVENSHTEIN surrogate for decision-clear pairs when cfg.jw_decision_band
is on — for those pairs the match DECISION is provably unchanged but the
reported name_sim/score VALUES differ from a full-JW run. The
`jw_evaluated` boolean column says which kernel produced name_sim
(True = Python JW ran); downstream consumers of score VALUES (not
decisions) should either filter on it or set jw_decision_band=False.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from entitylinking_spark.functions.hashing import bbit_similarity, bbit_sketch
from entitylinking_spark.functions.strings import (
    jaro_winkler_udf,
    levenshtein_sim,
    ngram_hash_set,
)
from entitylinking_spark.operators.blocking import ERConfig

# shuffled once per pair side — keep it NARROW: an 8-bit minwise sketch
# instead of the 64x8B signature, and an 8-byte content hash instead of the
# 64-char sha (pairs between identical contents only exist when the caller
# skips the exact-dup rep fast path, e.g. direct score_pairs use in tests)
_FEATURES = ["row_id", "fname", "mh8", "h8"]

_OUT_COLS = ["id_l", "id_r", "block_key", "name_sim", "lev_sim", "minhash_sim",
             "jaccard_sim", "score", "jw_evaluated"]


def _attach(pairs: DataFrame, keyed: DataFrame, cols: list[str]) -> DataFrame:
    feats = keyed.select(*cols)
    l = feats.select([F.col(c).alias(f"{c}_l") for c in cols])
    r = feats.select([F.col(c).alias(f"{c}_r") for c in cols])
    return (
        pairs.join(l, pairs["id_l"] == l["row_id_l"])
        .join(r, pairs["id_r"] == r["row_id_r"])
        .drop("row_id_l", "row_id_r")
    )


def score_pairs(pairs: DataFrame, keyed: DataFrame, cfg: ERConfig = ERConfig(),
                content_df: DataFrame | None = None) -> DataFrame:
    """(id_l,id_r,block_key) + keyed features -> SCORED_PAIRS rows.

    content_df: optional (row_id, content) source for the verify join.
    Passing it lets the caller persist `keyed` WITHOUT the content column
    (the cache-serialization hot spot) while the verify join reads content
    through a column-pruned scan of the original source. (Persisting the
    hashed-gram table to serve both join sides from one scan was tried in
    round 4 and measured a WASH at 500k/local[8] — the cache write +
    materialization job costs what the second scan cost; see NOTES.)
    """
    feats = keyed.select(
        "row_id", "fname",
        bbit_sketch("minhash").alias("mh8"),
        F.xxhash64("content_sha").alias("h8"),
    )
    p = _attach(pairs, feats, _FEATURES)

    # upper bound on the final score: name component can never exceed 1.0
    cutoff = cfg.tau - cfg.prescreen_margin
    lev0 = F.coalesce(F.col("lev_sim"), F.lit(0.0))
    # eqNullSafe: a plain == returns NULL when either fname is NULL, which
    # would drop the pair from BOTH branches (ADVICE r2) — the null-safe
    # split is exhaustive (pruned + equal-name + unequal-name == all pairs).
    eq_name = F.col("fname_l").eqNullSafe(F.col("fname_r"))
    p = (
        p.withColumn("lev_sim", levenshtein_sim(F.col("fname_l"), F.col("fname_r")))
        .withColumn("exact", F.col("h8_l") == F.col("h8_r"))
        .withColumn("minhash_sim", bbit_similarity("mh8_l", "mh8_r"))
        .withColumn(
            "content_est",
            F.when(F.col("exact"), F.lit(1.0)).otherwise(F.col("minhash_sim")),
        )
        .withColumn(
            "_surv",
            F.col("exact") | (
                cfg.w_name * 1.0 + cfg.w_content * F.col("content_est")
                >= F.lit(cutoff)
            ),
        )
        .withColumn("_eq", eq_name)
    )
    if cfg.jw_decision_band:
        # DECISION-BOUNDED JW (round-2 verdict #3): since name_sim ∈
        # [lev_sim, 1] and the match decision is score >= tau, JW can only
        # change the decision when the score straddles tau within
        # w_name*(1 - lev_sim). Outside that band the native Levenshtein
        # surrogate is decision-equivalent, and the Python kernel is
        # skipped entirely (a native filter BEFORE the UDF — Spark would
        # otherwise evaluate a pandas UDF under when() unconditionally).
        # The band is tested against content_est; in verified mode the
        # final score uses the exact Jaccard instead, so the estimate gets
        # the same ±prescreen_margin (~2.5 sigma) guard as the prescreen.
        delta = cfg.prescreen_margin if cfg.verify_jaccard else 0.0
        clear = (
            cfg.w_name * lev0 + cfg.w_content * (F.col("content_est") - delta)
            >= F.lit(cfg.tau)
        ) | (
            cfg.w_name * 1.0 + cfg.w_content * (F.col("content_est") + delta)
            < F.lit(cfg.tau)
        )
        p = p.withColumn("_band", ~F.col("_eq") & ~clear)
    else:
        p = p.withColumn("_band", ~F.col("_eq"))
    # Round 6 (guide §2.4): the previous 4-way branch union (pruned /
    # equal-name / JW band / decision-clear) re-derived the two feature
    # joins per branch and unioned 3-4 subtrees. The featured pair table
    # is slim (ids + name/sketch features) — materialize it ONCE, run the
    # Python JW kernel on just the band rows, join the few JW values back,
    # and express every branch as a when() projection. Same values, same
    # rows; 2 feature joins instead of 8+ and one small join instead of a
    # 3-way union of join subtrees.
    p = p.localCheckpoint(eager=True)
    jw_name = F.greatest(
        jaro_winkler_udf(F.col("fname_l"), F.col("fname_r")), F.col("lev_sim")
    )
    jw = p.filter(F.col("_surv") & F.col("_band")).select(
        "id_l", "id_r", jw_name.alias("_jw")
    )
    surv = p.filter(F.col("_surv")).join(jw, ["id_l", "id_r"], "left")
    surv = surv.withColumn(
        "name_sim",
        F.when(F.col("_eq"), F.lit(1.0))
        .when(F.col("_band"), F.col("_jw"))
        .otherwise(lev0),
    ).withColumn("jw_evaluated", F.col("_band"))

    pruned = p.filter(~F.col("_surv")).select(
        "id_l", "id_r", "block_key",
        F.lit(None).cast("double").alias("name_sim"),
        "lev_sim", "minhash_sim",
        F.lit(None).cast("double").alias("jaccard_sim"),
        (cfg.w_name * F.col("lev_sim") + cfg.w_content * F.col("content_est")).alias("score"),
        F.lit(False).alias("jw_evaluated"),
    )

    if cfg.verify_jaccard:
        toks_src = content_df if content_df is not None else keyed
        # int64-hashed grams: exact same intersection/union cardinalities
        # (2^-64 collision risk), ~3x fewer shuffled bytes through the two
        # verify joins — the round-3 shuffle-payload item
        toks = toks_src.select(
            "row_id", ngram_hash_set(F.col("content"), cfg.verify_ngram).alias("ctoks")
        )
        tl = toks.select(F.col("row_id").alias("_tid_l"), F.col("ctoks").alias("ctoks_l"))
        tr = toks.select(F.col("row_id").alias("_tid_r"), F.col("ctoks").alias("ctoks_r"))
        surv = (
            surv.join(tl, surv["id_l"] == tl["_tid_l"])
            .join(tr, surv["id_r"] == tr["_tid_r"])
            .withColumn(
                "jaccard_sim",
                F.when(F.col("exact"), F.lit(1.0)).otherwise(
                    F.size(F.array_intersect("ctoks_l", "ctoks_r")).cast("double")
                    / F.greatest(
                        F.size(F.array_union("ctoks_l", "ctoks_r")).cast("double"),
                        F.lit(1.0),
                    )
                ),
            )
            .withColumn("content_final", F.col("jaccard_sim"))
        )
    else:
        surv = surv.withColumn(
            "jaccard_sim", F.lit(None).cast("double")
        ).withColumn("content_final", F.col("content_est"))

    scored_surv = surv.withColumn(
        "score", cfg.w_name * F.col("name_sim") + cfg.w_content * F.col("content_final")
    ).select(*_OUT_COLS)

    return pruned.unionByName(scored_surv)


def matched_edges(scored: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Threshold scored pairs into undirected edges (src,dst)."""
    return scored.filter(F.col("score") >= cfg.tau).select(
        F.col("id_l").alias("src"), F.col("id_r").alias("dst")
    )
