"""CheckpointStore semantics: markers, resume, invalidation."""

from entitylinking_spark.checkpoint import CheckpointStore


def test_disabled_store_passthrough(spark):
    store = CheckpointStore(None, spark)
    df = spark.range(3)
    assert store.write("s", df) is df
    assert not store.is_complete("s")
    assert not store.enabled


def test_write_marks_complete_and_rereads(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"), spark)
    df = spark.range(5).withColumnRenamed("id", "row_id")
    out = store.write("stage1", df)
    assert store.is_complete("stage1")
    assert out.count() == 5
    # returned frame reads from disk (lineage truncated to a scan)
    assert "stage1" in out.inputFiles()[0]


def test_get_or_compute_skips_complete_stage(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"), spark)
    calls = []

    def compute():
        calls.append(1)
        return spark.range(4).withColumnRenamed("id", "row_id")

    a = store.get_or_compute("s", compute)
    b = store.get_or_compute("s", compute)
    assert len(calls) == 1
    assert a.count() == b.count() == 4


def test_incomplete_stage_recomputed(spark, tmp_path):
    """A stage dir without its marker (killed mid-write) must recompute."""
    import os
    root = str(tmp_path / "ck")
    store = CheckpointStore(root, spark)
    store.write("s", spark.range(2).withColumnRenamed("id", "row_id"))
    os.remove(os.path.join(root, "s", "_STAGE_COMPLETE"))
    assert not store.is_complete("s")
    out = store.get_or_compute(
        "s", lambda: spark.range(9).withColumnRenamed("id", "row_id")
    )
    assert out.count() == 9


def test_invalidate(spark, tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"), spark)
    store.write("s", spark.range(2))
    store.invalidate("s")
    assert not store.is_complete("s")
