"""Confidence propagation sweep vs the reference's rematch semantics
(/root/reference/e2e/systems/graph_system.py:953-1006)."""

from pyspark.sql import functions as F

from entitylinking_spark.operators.propagation import (
    final_assignment_sweep,
    neighbor_context,
    propagate_confidence,
)

VERTS = [
    # node_id, entity_text, entity_id, entity_title, confidence, status, candidates
    ("n1", "Apple", "e2", "Apple Inc", 0.9, "high_confidence", ["e2"]),
    ("n2", "Jobs", None, None, 0.2, "pending", ["e7", "e8"]),
    ("n3", "Cupertino", "e5", "Cupertino", 0.8, "done", ["e5"]),
    ("n4", "banana", None, None, 0.2, "pending", ["e9"]),   # no confident neighbor
    ("n5", "steady", None, None, 0.6, "pending", ["e1"]),   # above low threshold
]
EDGES = [("n1", "n2"), ("n2", "n3"), ("n4", "n5")]

COLS = ["node_id", "entity_text", "entity_id", "entity_title",
        "confidence", "status", "candidates"]


def _graph(spark):
    return (
        spark.createDataFrame(VERTS, COLS),
        spark.createDataFrame(EDGES, ["src", "dst"]),
    )


def test_neighbor_context_worklist(spark):
    v, e = _graph(spark)
    wl = {r["node_id"]: r for r in neighbor_context(v, e).collect()}
    # only n2 qualifies: pending, low confidence, confident neighbors n1+n3
    assert set(wl) == {"n2"}
    assert wl["n2"]["context_titles"] == ["Apple Inc", "Cupertino"]
    assert wl["n2"]["query_text"] == "Jobs Apple Inc Cupertino"


def test_propagate_confidence_updates_only_rematched(spark):
    v, e = _graph(spark)

    def rescore(worklist):
        # stand-in for the retrieval+rank step: link every worklist node
        return worklist.select(
            "node_id",
            F.lit("e7").alias("entity_id"),
            F.lit("Steve Jobs").alias("entity_title"),
        )

    out = {r["node_id"]: r for r in propagate_confidence(v, e, rescore).collect()}
    assert out["n2"]["entity_id"] == "e7"
    assert out["n2"]["status"] == "done"
    assert out["n2"]["confidence"] == 0.7          # the reference's fixed 0.7
    for nid in ("n1", "n3", "n4", "n5"):           # everything else untouched
        orig = dict(zip(COLS, VERTS[int(nid[1]) - 1]))
        assert out[nid]["entity_id"] == orig["entity_id"]
        assert out[nid]["status"] == orig["status"]


def test_final_assignment_sweep(spark):
    v, _ = _graph(spark)
    out = {r["node_id"]: r for r in final_assignment_sweep(v).collect()}
    assert out["n2"]["entity_id"] == "e7" and out["n2"]["status"] == "done"
    assert out["n4"]["entity_id"] == "e9"
    assert out["n1"]["entity_id"] == "e2"          # already assigned: kept
