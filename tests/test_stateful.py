"""applyInPandasWithState first-seen dedup (streaming/stateful.py):
cross-micro-batch exactly-once emission, state survival across a query
restart, and batch equivalence."""

import pandas as pd

from entitylinking_spark.streaming.stateful import stream_first_seen

SCHEMA = "row_id string, content_sha string"


def _write(spark, path, rows, mode="append"):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(path)


def test_first_seen_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # file 1 and file 2 arrive as separate micro-batches
    _write(spark, src, [("1", "A"), ("2", "B"), ("3", "A")])
    _write(spark, src, [("4", "B"), ("5", "C"), ("6", "A")])
    q = stream_first_seen(spark, src, out, ckpt, SCHEMA,
                          max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"A", "B", "C"}
    # A first seen in batch 1 with rows 1,3 -> min id 1, count 2
    assert got["A"]["first_id"] == "1" and got["A"]["n_first_batch"] == 2
    assert got["C"]["first_id"] == "5"

    # RESTART with new files: seen keys stay deduped via the state store
    _write(spark, src, [("7", "A"), ("8", "D"), ("9", "C")])
    q2 = stream_first_seen(spark, src, out, ckpt, SCHEMA,
                           max_files_per_trigger=1)
    q2.awaitTermination(180)
    got2 = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got2) == {"A", "B", "C", "D"}
    assert got2["A"]["first_id"] == "1"  # not re-emitted
    assert got2["D"]["first_id"] == "8"


def test_drained_output_equals_batch_first_seen(spark, tmp_path):
    """The streamed result equals batch first-seen over the union —
    given the same arrival order (file-per-batch)."""
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    files = [
        [("10", "X"), ("11", "Y")],
        [("12", "X"), ("13", "Z"), ("14", "Z")],
    ]
    for rows in files:
        _write(spark, src, rows)
    q = stream_first_seen(spark, src, out, ckpt := str(tmp_path / "ck"),
                          SCHEMA, max_files_per_trigger=1)
    q.awaitTermination(180)
    got = {(r["key"], r["first_id"]) for r in spark.read.parquet(out).collect()}
    # batch reference: first batch containing the key, min id within it
    want = set()
    seen = set()
    for rows in files:
        batch = pd.DataFrame(rows, columns=["row_id", "content_sha"])
        for key, grp in batch.groupby("content_sha"):
            if key not in seen:
                seen.add(key)
                want.add((key, grp["row_id"].min()))
    assert got == want
