"""Salted candidate-pair join: completeness + no duplicates under skew."""

from itertools import combinations

from pyspark.sql import functions as F

from entitylinking_spark.operators.blocking import ERConfig
from entitylinking_spark.operators.pairs import candidate_pairs


def _expected_pairs(block_rows):
    out = set()
    for _, members in block_rows.items():
        for a, b in combinations(sorted(members), 2):
            out.add((a, b))
    return out


def _got_pairs(spark, block_rows, cfg):
    rows = [(bk, rid) for bk, members in block_rows.items() for rid in members]
    blocks = spark.createDataFrame(rows, ["block_key", "row_id"])
    got = candidate_pairs(blocks, cfg).collect()
    pairs = [(r["id_l"], r["id_r"]) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate pairs emitted"
    return set(pairs)


def test_small_blocks_plain_join(spark):
    blocks = {"b1": [f"r{i}" for i in range(5)], "b2": ["r10", "r11"], "b3": ["r20"]}
    cfg = ERConfig(block_cap=100)
    assert _got_pairs(spark, blocks, cfg) == _expected_pairs(blocks)


def test_hot_block_salted_join_complete(spark):
    """A block far above the cap must still yield every pair exactly once."""
    blocks = {"hot": [f"h{i:03d}" for i in range(60)], "cold": ["x1", "x2", "x3"]}
    cfg = ERConfig(block_cap=10)  # forces S = 6 salt groups
    assert _got_pairs(spark, blocks, cfg) == _expected_pairs(blocks)


def test_pair_in_multiple_blocks_deduped(spark):
    blocks = {"b1": ["a", "b"], "b2": ["a", "b", "c"]}
    cfg = ERConfig(block_cap=100)
    got = _got_pairs(spark, blocks, cfg)
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_mega_block_skipped(spark):
    blocks = {"mega": [f"m{i}" for i in range(30)], "ok": ["a", "b"]}
    cfg = ERConfig(block_cap=5, skip_block_threshold=20)
    got = _got_pairs(spark, blocks, cfg)
    assert got == {("a", "b")}


def test_block_key_deterministic_min(spark):
    rows = [("kb", "a"), ("kb", "b"), ("ka", "a"), ("ka", "b")]
    blocks = spark.createDataFrame(rows, ["block_key", "row_id"])
    got = candidate_pairs(blocks, ERConfig(block_cap=100)).collect()
    assert len(got) == 1 and got[0]["block_key"] == "ka"
