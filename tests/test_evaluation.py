"""Evaluation operators vs hand-computed values."""

import pytest

from entitylinking_spark.operators.evaluation import (
    micro_macro_prf,
    pairwise_f1,
    recall_at_k,
)


def test_micro_macro_prf(spark):
    # two samples: (tp,fp,fn) = (2,1,1) and (0,0,2)
    df = spark.createDataFrame([(2, 1, 1), (0, 0, 2)], ["tp", "fp", "fn"])
    row = micro_macro_prf(df).collect()[0]
    # micro: p = 2/3, r = 2/5
    assert row["micro_precision"] == pytest.approx(2 / 3)
    assert row["micro_recall"] == pytest.approx(2 / 5)
    f1 = 2 * (2 / 3) * (2 / 5) / (2 / 3 + 2 / 5)
    assert row["micro_f1"] == pytest.approx(f1)
    # macro: sample1 p=2/3 r=2/3 f1=2/3; sample2 p=1.0 (no fp) r=0 f1=0
    assert row["macro_precision"] == pytest.approx((2 / 3 + 1.0) / 2)
    assert row["macro_recall"] == pytest.approx((2 / 3 + 0) / 2)
    assert row["macro_f1"] == pytest.approx((2 / 3 + 0) / 2)


def test_recall_at_k(spark):
    df = spark.createDataFrame(
        [
            ("m1", ["a", "b", "c"], "a"),   # hit at 1
            ("m2", ["x", "y", "z"], "z"),   # hit at 3
            ("m3", ["p", "q"], "missing"),  # never
        ],
        ["mention_id", "candidates", "label_id"],
    )
    row = recall_at_k(df, ks=[1, 3]).collect()[0]
    assert row["recall_at_1"] == pytest.approx(1 / 3)
    assert row["recall_at_3"] == pytest.approx(2 / 3)
    assert row["avg_candidates"] == pytest.approx(8 / 3)


def test_pairwise_f1_counts(spark):
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d")], ["row_id", "cluster_id"]
    )
    pairs = spark.createDataFrame(
        [
            ("a", "b", "k", True),    # tp
            ("a", "c", "k", True),    # fn (different clusters)
            ("c", "d", "k", False),   # tn
            ("a", "d", "k", False),   # tn
        ],
        ["id_l", "id_r", "block_key", "is_match"],
    )
    m = pairwise_f1(clusters, pairs)
    assert (m["tp"], m["fp"], m["fn"]) == (1, 0, 1)
    assert m["precision"] == 1.0 and m["recall"] == 0.5
