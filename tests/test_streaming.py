"""Structured Streaming ingest: availableNow one-shot over a backlog."""

import os

from entitylinking_spark.operators.blocking import ERConfig
from entitylinking_spark.streaming.ingest import stream_keyed
from entitylinking_spark.synthdata import generate_repo_files


def test_stream_keyed_availablenow(spark, tmp_path):
    fx = generate_repo_files(40, seed=9)
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(fx.rows.drop(columns=["row_id"])).write.parquet(src)

    q = stream_keyed(spark, src, out, ckpt, ERConfig(), available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 40
    assert {"content_sha", "minhash", "fname"} <= set(got.columns)

    # second micro-batch: only NEW files processed (incremental semantics)
    more = generate_repo_files(60, seed=10).rows.drop(columns=["row_id"]).tail(20)
    spark.createDataFrame(more).write.mode("append").parquet(src)
    q2 = stream_keyed(spark, src, out, ckpt, ERConfig(), available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 60
