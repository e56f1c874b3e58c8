"""Ranking: window top-k ops + tournament rank-aggregation models.

Reference analogues (SURVEY.md §2.4-2.5):
  A8  Bradley-Terry EM          /root/reference/Sparkle/algorithms.py:17-89
  A9  Plackett-Luce EM          /root/reference/Sparkle/algorithms.py:91-176
  A10 Davidson EM               /root/reference/Sparkle/algorithms.py:178-265
  A11 conf-weighted aggregation /root/reference/e2e/systems/graph_system.py:866-891
  A12 pairwise win adjustment   /root/reference/e2e/systems/graph_system.py:893-932
  T1-T3 top-k / rank windows    /root/reference/Sparkle/database.py:165-183,
                                /root/reference/Sparkle/algorithms.py:84-88
  T4  deterministic tie-break   /root/reference/OneNet/data_process.py:370-392
  T5  first-seen dedupe         /root/reference/Sparkle/core.py:111-120

The models are standard MM/EM fits (Hunter 2004, "MM algorithms for
generalized Bradley-Terry models") implemented from the published math —
NOT ports of the reference code. Each mention's experiment set is small, so
the natural Spark grain is a grouped-map Arrow UDF per mention_id; the fit
itself is plain NumPy and unit-testable without Spark.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# Window-style operators
# ---------------------------------------------------------------------------


def topk_per_group(df: DataFrame, group_col: str, order_cols: list, k: int,
                   rank_col: str = "rank") -> DataFrame:
    """T1/T2/T3: per-group top-k with a deterministic order (pass tie-break
    columns in order_cols — e.g. [desc('score'), 'entity_id'])."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def tie_break_first(df: DataFrame, group_col: str, order_cols: list) -> DataFrame:
    """T4: deterministic argmin — keep exactly one row per group by the
    given (position, length, lexicographic) style order."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_seen_dedupe(df: DataFrame, key_col: str, arrival_col: str) -> DataFrame:
    """T5: keep the first occurrence by arrival order (plain dropDuplicates
    loses the order guarantee the reference's seen_ids set provides)."""
    return tie_break_first(df, key_col, [F.col(arrival_col).asc()])


def seeded_sample(df: DataFrame, group_col: str, n: int, key_cols: list[str],
                  seed: int = 42) -> DataFrame:
    """X20: deterministic per-group subset of n rows (the reference's
    `random.sample(d, p)` over experiments — Sparkle/algorithms.py:285-288,
    made reproducible). Ordering by a seeded hash of the key columns is
    stable across partitioning/retries, unlike rand()."""
    w = Window.partitionBy(group_col).orderBy(
        F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    )
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= n)
        .drop("_sr")
    )


def overlapping_groups(candidates: DataFrame, group_size: int = 3, overlap: int = 2,
                       id_col: str = "mention_id", entity_col: str = "entity_id",
                       order_col: str = "score", text_col: str | None = None,
                       member_text_col: str | None = None,
                       repair_min_sim: float = 0.1) -> DataFrame:
    """G5: overlapping tournament groups with coverage repair — the named
    operator for /root/reference/e2e/systems/graph_system.py:702-752
    (_create_overlapping_groups), previously only available by composition.

    Per mention, candidates ordered by (order_col desc, entity_col) are cut
    into sliding windows of `group_size` with `overlap` shared members
    (stride = group_size - overlap); windows with fewer than 2 members are
    skipped; windowing stops once a window reaches the list end; a list of
    <= group_size candidates forms one group. At most one candidate (the
    list tail under a skipped length-1 window) can be left uncovered — it
    is repaired into the group with the highest word-overlap similarity
    |common| / max(|a|,|b|) of text_col vs the concatenated
    member_text_col (first-group tie-break, reference loop order), when
    that similarity exceeds `repair_min_sim`; with text_col=None the
    repair step is skipped.

    Returns (id_col, group_id, entity_ids array) with group members in
    list order, repaired members appended last — all window/join/aggregate
    relational ops, no UDF.
    """
    member_text_col = member_text_col or text_col
    stride = group_size - overlap
    if stride <= 0:
        raise ValueError("group_size must exceed overlap")

    w = Window.partitionBy(id_col).orderBy(F.desc(order_col), entity_col)
    text_cols = [c for c in {text_col, member_text_col} if c]
    ranked = candidates.select(id_col, entity_col, order_col,
                               *text_cols).withColumn(
        "pos", F.row_number().over(w) - 1
    ).withColumn("n", F.count("*").over(Window.partitionBy(id_col)))

    meta = ranked.groupBy(id_col).agg(F.max("n").alias("n"))
    # small lists: one group of everything (reference early-return)
    small = meta.filter(F.col("n") <= group_size).select(
        id_col, F.lit(0).alias("start"), F.col("n").alias("win")
    )
    # sliding windows with the reference's break rule: a start i is emitted
    # iff it is 0 or the PREVIOUS window did not already reach the end
    big = meta.filter(F.col("n") > group_size).select(
        id_col, "n",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n") - overlap, F.lit(stride)),
                lambda i: (i == 0) | (i - stride + group_size < F.col("n")),
            )
        ).alias("start"),
    ).filter(F.col("n") - F.col("start") >= 2).select(
        id_col, "start", F.lit(group_size).alias("win")
    )
    groups = small.unionByName(big).withColumn(
        "group_id",
        F.row_number().over(Window.partitionBy(id_col).orderBy("start")) - 1,
    )

    members = ranked.join(groups, id_col).filter(
        (F.col("pos") >= F.col("start")) & (F.col("pos") < F.col("start") + F.col("win"))
    )

    if text_col is not None:
        words = lambda c: F.array_distinct(  # noqa: E731 — reference .split()
            F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")
        )
        gtext = members.groupBy(id_col, "group_id").agg(
            F.array_join(F.collect_list(F.col(member_text_col)), " ").alias("_gt")
        ).withColumn("_gw", words(F.col("_gt")))
        missing = ranked.join(
            members.select(id_col, "pos").distinct(), [id_col, "pos"], "left_anti"
        ).withColumn("_cw", words(F.col(text_col)))
        best = (
            missing.join(gtext, id_col)
            .withColumn(
                "_sim",
                F.size(F.array_intersect("_cw", "_gw")).cast("double")
                / F.greatest(F.size("_cw"), F.size("_gw"), F.lit(1)).cast("double"),
            )
            .filter(F.col("_sim") > repair_min_sim)
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy(id_col, "pos").orderBy(
                        F.desc("_sim"), "group_id"
                    )
                ),
            )
            .filter(F.col("_rk") == 1)
            # repaired members sort AFTER the window members (appended)
            .select(id_col, entity_col, "group_id",
                    (F.col("pos") + F.lit(1_000_000)).alias("pos"))
        )
        members = members.select(id_col, entity_col, "group_id", "pos").unionByName(best)
    else:
        members = members.select(id_col, entity_col, "group_id", "pos")

    return members.groupBy(id_col, "group_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", F.col(entity_col).alias("e")))),
            lambda s: s["e"],
        ).alias("entity_ids")
    )


def confidence_weighted_aggregation(df: DataFrame, cand_col: str = "candidate_id",
                                    score_col: str = "score",
                                    conf_col: str = "confidence") -> DataFrame:
    """A11: sum(score*confidence)/appearances per candidate."""
    return df.groupBy(cand_col).agg(
        (F.sum(F.col(score_col) * F.col(conf_col)) / F.count("*")).alias("agg_score"),
        F.count("*").alias("appearances"),
    )


def pairwise_win_adjustment(rankings: DataFrame, group_col: str = "group_id",
                            cand_col: str = "candidate_id",
                            score_col: str = "score",
                            blend: float = 0.7) -> DataFrame:
    """A12: explode each group's ranking into ordered pairs, count wins /
    comparisons per candidate, blend: blend*score + (1-blend)*win_rate."""
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), cand_col)
    ranked = rankings.withColumn("_pos", F.row_number().over(w))
    a = ranked.select(group_col, F.col(cand_col).alias("_a"), F.col("_pos").alias("_pa"))
    b = ranked.select(group_col, F.col(cand_col).alias("_b"), F.col("_pos").alias("_pb"))
    pairs = a.join(b, group_col).filter(F.col("_a") != F.col("_b"))
    stats = pairs.groupBy("_a").agg(
        F.sum((F.col("_pa") < F.col("_pb")).cast("long")).alias("wins"),
        F.count("*").alias("comparisons"),
    )
    base = rankings.groupBy(cand_col).agg(F.avg(score_col).alias("mean_score"))
    return (
        base.join(stats, base[cand_col] == stats["_a"], "left")
        .withColumn(
            "win_rate",
            F.when(F.col("comparisons").isNull() | (F.col("comparisons") == 0), F.lit(0.5))
            .otherwise(F.col("wins") / F.col("comparisons")),
        )
        .select(
            cand_col,
            "mean_score",
            "win_rate",
            (F.lit(blend) * F.col("mean_score") + F.lit(1 - blend) * F.col("win_rate")).alias("adjusted_score"),
        )
    )


# ---------------------------------------------------------------------------
# Tournament models (plain-python fits; Spark wrapper below)
# ---------------------------------------------------------------------------


def _win_counts(experiments: list[tuple[list[str], list[str]]]):
    """(winners, losers) lists -> pairwise win counts w[i][j] = #(i beat j)."""
    wins: dict[tuple[str, str], float] = defaultdict(float)
    items: set[str] = set()
    for winners, losers in experiments:
        items.update(winners)
        items.update(losers)
        for wi in winners:
            for lo in losers:
                if wi != lo:
                    wins[(wi, lo)] += 1.0
    return wins, sorted(items)


def fit_bradley_terry(experiments, max_iter: int = 100, tol: float = 1e-6):
    """Hunter (2004) MM update: p_i <- W_i / sum_j n_ij/(p_i+p_j)."""
    wins, items = _win_counts(experiments)
    n = len(items)
    if n == 0:
        return {}
    idx = {e: i for i, e in enumerate(items)}
    W = np.zeros(n)
    nmat = np.zeros((n, n))
    for (a, b), c in wins.items():
        W[idx[a]] += c
        nmat[idx[a], idx[b]] += c
        nmat[idx[b], idx[a]] += c
    p = np.ones(n)
    for _ in range(max_iter):
        denom = np.zeros(n)
        for i in range(n):
            mask = nmat[i] > 0
            denom[i] = np.sum(nmat[i, mask] / (p[i] + p[mask]))
        new_p = np.where(denom > 0, (W + 1e-9) / np.maximum(denom, 1e-12), p)
        new_p = new_p / new_p.sum() * n
        if np.max(np.abs(new_p - p)) < tol:
            p = new_p
            break
        p = new_p
    return dict(zip(items, p / p.sum()))


def fit_plackett_luce(experiments, max_iter: int = 100, tol: float = 1e-6):
    """Hunter (2004) MM for rankings; each experiment becomes the ranking
    winners..., losers... (winners above losers, internal order kept)."""
    rankings = []
    items: set[str] = set()
    for winners, losers in experiments:
        r = list(dict.fromkeys(list(winners) + list(losers)))
        if len(r) >= 2:
            rankings.append(r)
            items.update(r)
    items = sorted(items)
    n = len(items)
    if n == 0:
        return {}
    idx = {e: i for i, e in enumerate(items)}
    # w_i = number of rankings in which i appears and is not last
    w = np.zeros(n)
    for r in rankings:
        for e in r[:-1]:
            w[idx[e]] += 1
    p = np.ones(n)
    for _ in range(max_iter):
        denom = np.zeros(n)
        for r in rankings:
            ids = np.array([idx[e] for e in r])
            suffix_sums = np.cumsum(p[ids][::-1])[::-1]
            # stage s contributes 1/suffix_sum(s) to every member of the suffix
            inv = 1.0 / suffix_sums[:-1]  # last stage is a 1-element "choice", excluded
            contrib = np.concatenate([np.cumsum(inv), [np.sum(inv)]])
            # member at position t participates in stages 0..min(t, m-2)
            for t, i in enumerate(ids):
                denom[i] += contrib[t] if t < len(inv) else contrib[-1]
        new_p = np.where(denom > 0, (w + 1e-9) / np.maximum(denom, 1e-12), p)
        new_p = new_p / new_p.sum() * n
        if np.max(np.abs(new_p - p)) < tol:
            p = new_p
            break
        p = new_p
    return dict(zip(items, p / p.sum()))


def fit_davidson(experiments, max_iter: int = 100, tol: float = 1e-6):
    """Davidson (1970, JASA 65:317) model with ties, solved by the paper's
    fixed-point iteration of the ML equations:

      P(i beats j) = p_i / D_ij,  P(tie) = nu*sqrt(p_i p_j) / D_ij,
      D_ij = p_i + p_j + nu*sqrt(p_i p_j)

      p_i  <- (w_i + t_i/2) / sum_j n_ij (1 + (nu/2) sqrt(p_j/p_i)) / D_ij
      nu   <- T / sum_{i<j} n_ij sqrt(p_i p_j) / D_ij      (T = total ties,
              denominator over ALL comparisons, win or tie)

    An entity appearing in BOTH the winner and loser list of one experiment
    counts as a tie with every opponent of that experiment; otherwise wins
    count as in Bradley-Terry.
    """
    wins: dict[tuple[str, str], float] = defaultdict(float)
    ties: dict[tuple[str, str], float] = defaultdict(float)
    items: set[str] = set()
    for winners, losers in experiments:
        ws, ls = list(winners), list(losers)
        both = set(ws) & set(ls)
        items.update(ws)
        items.update(ls)
        for a in ws:
            for b in ls:
                if a == b:
                    continue
                key = (min(a, b), max(a, b))
                if a in both or b in both:
                    ties[key] += 1.0
                else:
                    wins[(a, b)] += 1.0
    items = sorted(items)
    n = len(items)
    if n == 0:
        return {}
    idx = {e: i for i, e in enumerate(items)}
    p = np.ones(n)
    nu = 1.0
    total_ties = sum(ties.values())
    for _ in range(max_iter):
        num = np.full(n, 1e-9)     # w_i + t_i/2
        den = np.full(n, 1e-12)
        nu_den = 1e-12             # sum n_ij sqrt(p_i p_j)/D over ALL pairs
        for (a, b), c in wins.items():
            i, j = idx[a], idx[b]
            g = np.sqrt(p[i] * p[j])
            d = p[i] + p[j] + nu * g
            num[i] += c
            den[i] += c * (1 + 0.5 * nu * np.sqrt(p[j] / max(p[i], 1e-12))) / d
            den[j] += c * (1 + 0.5 * nu * np.sqrt(p[i] / max(p[j], 1e-12))) / d
            nu_den += c * g / d
        for (a, b), c in ties.items():
            i, j = idx[a], idx[b]
            g = np.sqrt(p[i] * p[j])
            d = p[i] + p[j] + nu * g
            num[i] += 0.5 * c
            num[j] += 0.5 * c
            den[i] += c * (1 + 0.5 * nu * np.sqrt(p[j] / max(p[i], 1e-12))) / d
            den[j] += c * (1 + 0.5 * nu * np.sqrt(p[i] / max(p[j], 1e-12))) / d
            nu_den += c * g / d
        new_p = num / den
        new_p = new_p / new_p.sum() * n
        new_nu = total_ties / nu_den if total_ties > 0 else 0.0
        converged = np.max(np.abs(new_p - p)) < tol and abs(new_nu - nu) < tol
        p, nu = new_p, new_nu
        if converged:
            break
    return dict(zip(items, p / p.sum()))


_MODELS = {
    "bradley_terry": fit_bradley_terry,
    "plackett_luce": fit_plackett_luce,
    "davidson": fit_davidson,
}

RANKED_SCHEMA = "mention_id string, entity_id string, score double, rank int"


def rank_experiments(experiments: DataFrame, model: str = "bradley_terry") -> DataFrame:
    """EXPERIMENTS rows -> RANKED rows, one model fit per mention_id.

    experiments: (mention_id, exp_id, winners array<string>, losers array<string>).
    Grouped-map Arrow UDF: each mention's experiment set is tiny (the
    reference uses n_experiments=5 — Sparkle/core.py:37-41), so per-group
    NumPy is the right grain; scale comes from the number of groups.
    """
    fit = _MODELS[model]

    def per_mention(pdf: pd.DataFrame) -> pd.DataFrame:
        exps = list(zip(pdf["winners"], pdf["losers"]))
        scores = fit(exps)
        if not scores:
            return pd.DataFrame(columns=["mention_id", "entity_id", "score", "rank"])
        # deterministic rank: score desc, then entity id (T3/T4 tie-break)
        ordered = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return pd.DataFrame(
            {
                "mention_id": pdf["mention_id"].iloc[0],
                "entity_id": [e for e, _ in ordered],
                "score": [float(s) for _, s in ordered],
                "rank": np.arange(1, len(ordered) + 1, dtype="int32"),
            }
        )

    return experiments.groupBy("mention_id").applyInPandas(per_mention, RANKED_SCHEMA)
