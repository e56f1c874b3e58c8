"""Per-stage lineage + metrics (rows in/out, comparisons, skew factor).

The reference reports progress as prints (/root/reference/Sparkle/core.py:75)
and accuracy-only eval scripts; north_rule requires per-partition lineage +
metrics instead. Collected driver-side as plain dicts (cheap aggregates),
serializable to JSON next to the checkpoint tables.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, functions as F


class MetricsCollector:
    def __init__(self):
        self.stages: list[dict] = []
        self._t0 = time.time()

    def record(self, stage: str, **kv) -> dict:
        entry = {"stage": stage, "t_offset_s": round(time.time() - self._t0, 3), **kv}
        self.stages.append(entry)
        return entry

    def block_stats(self, census: DataFrame, cap: int, skip_threshold: int) -> dict:
        """Comparison counts + skew factor from the block census.

        comparisons = sum over blocks of C(size,2); skew = max/mean block
        comparisons — the quantity salting bounds per join task.
        """
        row = (
            census.withColumn(
                "cmps", (F.col("block_size") * (F.col("block_size") - 1) / 2)
            )
            .agg(
                F.count("*").alias("n_blocks"),
                F.sum(F.when(F.col("block_size") > skip_threshold, 0).otherwise(F.col("cmps"))).alias("comparisons"),
                F.max("block_size").alias("max_block"),
                F.avg("block_size").alias("mean_block"),
                F.max("cmps").alias("max_cmps"),
                F.avg("cmps").alias("mean_cmps"),
                F.sum((F.col("block_size") > cap).cast("long")).alias("n_salted"),
                F.sum((F.col("block_size") > skip_threshold).cast("long")).alias("n_skipped"),
            )
            .collect()[0]
        )
        d = row.asDict()
        d["skew_factor"] = (
            float(d["max_cmps"]) / float(d["mean_cmps"]) if d["mean_cmps"] else 0.0
        )
        return {k: (float(v) if v is not None else None) for k, v in d.items()}

    def partition_sizes(self, df: DataFrame) -> dict:
        """Per-partition row counts (lineage evidence for the skew report)."""
        sizes = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid").count().collect()
        )
        counts = [int(r["count"]) for r in sizes]
        if not counts:
            return {"n_partitions": 0}
        return {
            "n_partitions": len(counts),
            "rows_max": max(counts),
            "rows_mean": sum(counts) / len(counts),
            "partition_skew": max(counts) / (sum(counts) / len(counts)),
        }

    def to_json(self) -> str:
        return json.dumps({"stages": self.stages}, default=float)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())
