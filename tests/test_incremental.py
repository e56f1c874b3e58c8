"""Incremental resolution == batch resolution, at a fraction of the pairs."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.operators.blocking import ERConfig
from entitylinking_spark.plans.incremental import resolve_increment
from entitylinking_spark.plans.pipeline import resolve
from entitylinking_spark.synthdata import generate_repo_files

CFG = ERConfig(suppress_shingle_df=None)


@pytest.fixture(scope="module")
def fixture():
    return generate_repo_files(400, seed=11)


def _batch_clusters(spark, rows):
    df = spark.createDataFrame(rows)
    res = resolve(df, CFG, id_col="row_id", collect_metrics=False)
    out = sorted((r["row_id"], r["cluster_id"]) for r in res.clusters.collect())
    res.unpersist()
    return out


def test_two_increments_equal_batch(spark, fixture):
    rows = fixture.rows
    split = int(len(rows) * 0.6)
    b1, b2 = rows.iloc[:split], rows.iloc[split:]

    s1 = resolve_increment(spark.createDataFrame(b1), None, CFG, id_col="row_id")
    s2 = resolve_increment(spark.createDataFrame(b2), s1, CFG, id_col="row_id")
    inc = sorted((r["row_id"], r["cluster_id"]) for r in s2.clusters.collect())

    assert inc == _batch_clusters(spark, rows)


def test_three_increments_equal_batch(spark, fixture):
    rows = fixture.rows
    a, b = int(len(rows) * 0.4), int(len(rows) * 0.7)
    state = None
    for chunk in (rows.iloc[:a], rows.iloc[a:b], rows.iloc[b:]):
        state = resolve_increment(spark.createDataFrame(chunk), state, CFG, id_col="row_id")
    inc = sorted((r["row_id"], r["cluster_id"]) for r in state.clusters.collect())
    assert inc == _batch_clusters(spark, rows)


def test_incremental_pair_volume_is_new_involving(spark, fixture):
    """The second increment must score far fewer pairs than a batch re-run
    over the combined corpus (old×old killed inside the join)."""
    rows = fixture.rows
    split = int(len(rows) * 0.8)  # small second batch
    s1 = resolve_increment(spark.createDataFrame(rows.iloc[:split]), None, CFG, id_col="row_id")
    s2 = resolve_increment(spark.createDataFrame(rows.iloc[split:]), s1, CFG, id_col="row_id")

    df = spark.createDataFrame(rows)
    res = resolve(df, CFG, id_col="row_id", collect_metrics=False)
    batch_pairs = res.scored_pairs.count()
    res.unpersist()

    assert s2.n_pairs_scored < batch_pairs * 0.6, (
        f"increment scored {s2.n_pairs_scored} vs batch {batch_pairs}"
    )


def test_suppression_forced_off(spark, fixture):
    """resolve_increment pins suppress_shingle_df=None so old signatures
    stay valid across increments even if the caller's cfg enables it."""
    cfg = dataclasses.replace(CFG, suppress_shingle_df=0.02, suppress_min_corpus=0)
    rows = fixture.rows.iloc[:100]
    s = resolve_increment(spark.createDataFrame(rows), None, cfg, id_col="row_id")
    assert s.clusters.count() == 100
