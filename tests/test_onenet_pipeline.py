"""OneNet staged pipeline on a reference-shaped fixture."""

import pytest
from pyspark.sql import functions as F

from entitylinking_spark.plans.onenet_pipeline import (
    run_onenet,
    stage_eval,
    stage_list2point,
    stage_point2list,
    stage_pointwise,
    stage_summary,
)

ENTITIES = [
    ("e1", "Apple", "Apple is a fruit. It grows on trees.", "food"),
    ("e2", "Apple Inc", "Apple Inc makes phones. Founded in california.", "tech"),
    ("e3", "Banana", "Banana is yellow. Tropical fruit.", "food"),
]

MENTIONS = [
    # text carries the evidence tokens; candidates = tfidf-style lists
    ("food", "m1", None, "e1", 0, 5, "apple fruit that grows on trees", None, ["e1", "e2", "e3"]),
    ("tech", "m2", None, "e2", 0, 9, "apple inc makes phones", None, ["e1", "e2"]),
    ("food", "m3", None, "e3", 0, 6, "banana tropical yellow", None, ["e3"]),
]

M_SCHEMA = (
    "corpus string, mention_id string, context_document_id string, "
    "label_document_id string, start_index int, end_index int, text string, "
    "category string, candidates array<string>"
)


@pytest.fixture()
def dfs(spark):
    e = spark.createDataFrame(ENTITIES, ["document_id", "title", "text", "corpus"])
    m = spark.createDataFrame(MENTIONS, M_SCHEMA)
    return m, e


def test_stage_summary(spark, dfs):
    _, e = dfs
    out = {r["document_id"]: r["summary"] for r in stage_summary(e).collect()}
    assert out["e1"] == "Apple is a fruit."


def test_list2point_point2list_roundtrip(spark, dfs):
    m, e = dfs
    pts = stage_list2point(m)
    assert pts.count() == 6  # 3 + 2 + 1
    scored = stage_pointwise(pts, e, tau=0.0)
    back = stage_point2list(scored)
    assert back.count() == 3
    cands = {r["mention_id"]: r["candidates"] for r in back.collect()}
    assert set(cands["m1"]) == {"e1", "e2", "e3"}
    # order: best point score first
    assert cands["m1"][0] == "e1"


def test_run_onenet_decisions(spark, dfs):
    m, e = dfs
    out = {r["mention_id"]: r for r in run_onenet(m, e).collect()}
    assert out["m1"]["predicted_id"] == "e1"
    assert out["m2"]["predicted_id"] == "e2"
    assert out["m3"]["predicted_id"] == "e3"  # single candidate short-circuit


def test_stage_eval_cube(spark, dfs):
    m, e = dfs
    decided = run_onenet(m, e)
    ev = stage_eval(decided).collect()
    rows = {r["corpus"]: r for r in ev}
    assert rows[None]["n"] == 3 and rows[None]["hits"] == 3  # overall cube row
    assert rows["food"]["accuracy"] == 1.0
