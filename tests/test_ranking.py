"""Ranking models + window ops."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.ranking import (
    confidence_weighted_aggregation,
    first_seen_dedupe,
    fit_bradley_terry,
    fit_davidson,
    fit_plackett_luce,
    pairwise_win_adjustment,
    rank_experiments,
    tie_break_first,
    topk_per_group,
)

TRANSITIVE = [ (["a"], ["b"]), (["a"], ["b"]), (["b"], ["c"]), (["a"], ["c"]) ]


class TestFits:
    def test_bradley_terry_transitive_order(self):
        s = fit_bradley_terry(TRANSITIVE)
        assert s["a"] > s["b"] > s["c"]
        assert sum(s.values()) == pytest.approx(1.0)

    def test_plackett_luce_transitive_order(self):
        s = fit_plackett_luce(TRANSITIVE)
        assert s["a"] > s["b"] > s["c"]

    def test_davidson_transitive_order(self):
        s = fit_davidson(TRANSITIVE)
        assert s["a"] > s["b"] > s["c"]

    def test_davidson_tie_handling(self):
        # d ties with a (appears in both winners and losers of one experiment)
        exps = TRANSITIVE + [(["a", "d"], ["d"])]
        s = fit_davidson(exps)
        assert set(s) == {"a", "b", "c", "d"}

    def test_empty(self):
        assert fit_bradley_terry([]) == {}
        assert fit_plackett_luce([]) == {}
        assert fit_davidson([]) == {}

    def test_bt_symmetric_data_equal_scores(self):
        s = fit_bradley_terry([(["x"], ["y"]), (["y"], ["x"])])
        assert s["x"] == pytest.approx(s["y"], abs=1e-4)


class TestRankExperiments:
    def test_grouped_fit(self, spark):
        rows = [
            ("m1", 0, ["a"], ["b"]), ("m1", 1, ["a"], ["c"]), ("m1", 2, ["b"], ["c"]),
            ("m2", 0, ["z"], ["y"]),
        ]
        df = spark.createDataFrame(rows, ["mention_id", "exp_id", "winners", "losers"])
        out = rank_experiments(df, "bradley_terry").collect()
        by_mention = {}
        for r in out:
            by_mention.setdefault(r["mention_id"], []).append((r["rank"], r["entity_id"]))
        assert sorted(by_mention["m1"])[0] == (1, "a")
        assert sorted(by_mention["m2"]) == [(1, "z"), (2, "y")]


class TestWindows:
    def test_topk_per_group(self, spark):
        df = spark.createDataFrame(
            [("g1", "a", 1.0), ("g1", "b", 3.0), ("g1", "c", 2.0), ("g2", "d", 5.0)],
            ["g", "id", "score"],
        )
        out = topk_per_group(df, "g", [F.desc("score"), F.col("id")], 2).collect()
        got = {(r["g"], r["rank"]): r["id"] for r in out}
        assert got == {("g1", 1): "b", ("g1", 2): "c", ("g2", 1): "d"}

    def test_tie_break_first_deterministic(self, spark):
        # same position -> shorter name -> lexicographic (T4 order)
        df = spark.createDataFrame(
            [("m", 5, 3, "bbb"), ("m", 5, 3, "aaa"), ("m", 5, 2, "zz"), ("m", 4, 9, "q")],
            ["g", "pos", "ln", "name"],
        )
        out = tie_break_first(df, "g", [F.col("pos"), F.col("ln"), F.col("name")]).collect()
        assert len(out) == 1 and out[0]["name"] == "q"

    def test_first_seen_dedupe(self, spark):
        df = spark.createDataFrame(
            [("k1", 2, "late"), ("k1", 1, "early"), ("k2", 5, "only")],
            ["key", "arrival", "val"],
        )
        out = {r["key"]: r["val"] for r in first_seen_dedupe(df, "key", "arrival").collect()}
        assert out == {"k1": "early", "k2": "only"}


class TestAggregation:
    def test_confidence_weighted(self, spark):
        df = spark.createDataFrame(
            [("c1", 1.0, 0.5), ("c1", 0.5, 1.0), ("c2", 1.0, 1.0)],
            ["candidate_id", "score", "confidence"],
        )
        out = {r["candidate_id"]: r["agg_score"]
               for r in confidence_weighted_aggregation(df).collect()}
        assert out["c1"] == pytest.approx((1.0 * 0.5 + 0.5 * 1.0) / 2)
        assert out["c2"] == pytest.approx(1.0)

    def test_pairwise_win_adjustment(self, spark):
        df = spark.createDataFrame(
            [("g1", "a", 0.9), ("g1", "b", 0.1), ("g2", "a", 0.8), ("g2", "b", 0.2)],
            ["group_id", "candidate_id", "score"],
        )
        out = {r["candidate_id"]: r for r in pairwise_win_adjustment(df).collect()}
        assert out["a"]["win_rate"] == pytest.approx(1.0)
        assert out["b"]["win_rate"] == pytest.approx(0.0)
        assert out["a"]["adjusted_score"] == pytest.approx(0.7 * 0.85 + 0.3 * 1.0)


def test_seeded_sample_deterministic_subset(spark):
    """X20: per-group n-row subset, identical across runs/partitionings."""
    from entitylinking_spark.operators.ranking import seeded_sample

    rows = [(g, i) for g in ("a", "b") for i in range(20)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    s1 = {(r["grp"], r["x"]) for r in seeded_sample(df, "grp", 5, ["grp", "x"]).collect()}
    s2 = {(r["grp"], r["x"])
          for r in seeded_sample(df.repartition(7), "grp", 5, ["grp", "x"]).collect()}
    assert s1 == s2
    assert sum(1 for g, _ in s1 if g == "a") == 5
    assert sum(1 for g, _ in s1 if g == "b") == 5
    s3 = {(r["grp"], r["x"])
          for r in seeded_sample(df, "grp", 5, ["grp", "x"], seed=7).collect()}
    assert s3 != s1  # different seed -> different subset (w.h.p.)


def test_pl_single_ranking_order_exhaustive():
    """Oracle-design property (pl_rank_orders): for ONE observed full
    ranking, the Plackett-Luce MM fit is strictly decreasing along the
    ranking — exhaustive over group sizes 2..5 (the priority domain has 5
    levels, so every group the driver data can produce is covered)."""
    import itertools

    from entitylinking_spark.operators.ranking import fit_plackett_luce

    for m in range(2, 6):
        for perm in itertools.permutations([f"P{i}" for i in range(m)]):
            scores = fit_plackett_luce([(list(perm), [])])
            got = sorted(scores, key=lambda e: (-scores[e], e))
            assert got == list(perm), (perm, scores)


def test_davidson_round_robin_with_ties_order_exhaustive():
    """Oracle-design property (davidson_rank_orders): balanced round-robin
    wins along a dominance order plus one tie per adjacent pair — the ML
    ordering equals the dominance order, exhaustive over sizes 2..5."""
    import itertools

    from entitylinking_spark.operators.ranking import fit_davidson

    for m in range(2, 6):
        for perm in itertools.permutations([f"P{i}" for i in range(m)]):
            exps = [([a], [b]) for a, b in itertools.combinations(perm, 2)]
            exps += [([perm[i], perm[i + 1]], [perm[i + 1]])
                     for i in range(m - 1)]
            scores = fit_davidson(exps)
            got = sorted(scores, key=lambda e: (-scores[e], e))
            assert got == list(perm), (perm, scores)
