"""Stage checkpointing with resume.

The reference's resumability is file-per-stage JSONL (run.sh stages —
/root/reference/run.sh:1-9, stage table in /root/reference/README.md:24-32):
each step writes a named file, later steps read it, re-running skips nothing
automatically. Here the same idea becomes checkpoint tables with completion
markers: a stage whose marker exists is read back instead of recomputed, so
a killed run resumes from the last complete stage (north_rule).

Backend: `writeTo(catalog.table)` when an Iceberg catalog is configured
(deployment), partitioned Parquet + a `_STAGE_COMPLETE` marker file
otherwise (this sandbox has no Iceberg jars — SURVEY.md §7). Both expose
identical semantics to the pipeline.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


def validate_fingerprint(fp: str) -> str:
    """Fingerprints are interpolated into ALTER TABLE SQL: restrict to a
    safe charset (ours are hex; ADVICE r3 — a quote would break the
    statement / open an injection surface if fingerprints ever derive
    from user-supplied config strings)."""
    if not re.fullmatch(r"[0-9a-zA-Z_.:-]+", str(fp)):
        raise ValueError(
            f"unsafe checkpoint fingerprint {fp!r}: expected only "
            "[0-9a-zA-Z_.:-]"
        )
    return str(fp)


class CheckpointStore:
    def __init__(self, root: str | None, spark: SparkSession,
                 iceberg_catalog: str | None = None):
        """root=None disables checkpointing (pure in-memory run)."""
        self.root = root
        self.spark = spark
        self.iceberg_catalog = iceberg_catalog
        if root:
            os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _marker(self, stage: str) -> str:
        return os.path.join(self.root, stage, "_STAGE_COMPLETE")

    # -- api --------------------------------------------------------------
    @property
    def enabled(self) -> bool:
        return self.root is not None

    _FP_PROP = "elspark.fingerprint"

    def is_complete(self, stage: str, fingerprint: str | None = None) -> bool:
        """Complete AND (when a fingerprint is given) written under the same
        config/input fingerprint. A marker from a different fingerprint is
        stale — round-1 advice: resume keyed on stage name alone silently
        returned tables computed with a different ERConfig or input.

        Iceberg backend: the fingerprint is stored as the table property
        `elspark.fingerprint` (write()) and compared here, so both backends
        expose the same invalidation semantics (ADVICE r2 — previously
        tableExists() alone let a stale Iceberg stage resume). A property
        read failure is treated as stale (recompute), never as complete.
        """
        if self.iceberg_catalog:
            tbl = f"{self.iceberg_catalog}.{stage}"
            try:
                if not self.spark.catalog.tableExists(tbl):
                    return False
                if fingerprint is None:
                    return True
                rows = self.spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()
                props = {r["key"]: r["value"] for r in rows}
                return props.get(self._FP_PROP) == fingerprint
            except Exception:
                return False
        if not (self.enabled and os.path.exists(self._marker(stage))):
            return False
        if fingerprint is None:
            return True
        try:
            with open(self._marker(stage)) as f:
                meta = json.load(f)
        except Exception:
            return False
        return meta.get("fingerprint") == fingerprint

    def write(self, stage: str, df: DataFrame, partition_by: list[str] | None = None,
              meta: dict | None = None) -> DataFrame:
        """Write `df` as the stage table, mark complete, return a fresh read.

        Returning the re-read DataFrame (not `df`) truncates lineage for all
        downstream stages — the same reason the reference rereads its stage
        files.
        """
        if not self.enabled:
            return df
        if self.iceberg_catalog:
            tbl = f"{self.iceberg_catalog}.{stage}"
            writer = df.writeTo(tbl)
            if partition_by:
                writer = writer.partitionedBy(*partition_by)
            writer.createOrReplace()
            fp = (meta or {}).get("fingerprint")
            if fp is not None:
                # mirrors the Parquet marker: is_complete() compares this
                # property for stale-stage invalidation
                self.spark.sql(
                    f"ALTER TABLE {tbl} SET TBLPROPERTIES "
                    f"('{self._FP_PROP}'='{validate_fingerprint(fp)}')"
                )
            return self.spark.read.table(tbl)
        path = self._dir(stage)
        if os.path.exists(path):
            shutil.rmtree(path)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        with open(self._marker(stage), "w") as f:
            json.dump({"stage": stage, "completed_at": time.time(), **(meta or {})}, f)
        return self.spark.read.parquet(path)

    def read(self, stage: str) -> DataFrame:
        if self.iceberg_catalog:
            return self.spark.read.table(f"{self.iceberg_catalog}.{stage}")
        return self.spark.read.parquet(self._dir(stage))

    def get_or_compute(self, stage: str, compute, partition_by: list[str] | None = None,
                       on_resume=None, fingerprint: str | None = None) -> DataFrame:
        """Read the stage if complete (and fingerprint-matched), else
        compute() -> write -> re-read. A stale stage (marker exists, wrong
        fingerprint) is invalidated and recomputed."""
        if self.is_complete(stage, fingerprint=fingerprint):
            if on_resume is not None:
                on_resume(stage)
            return self.read(stage)
        if self.enabled and not self.iceberg_catalog and os.path.exists(self._marker(stage)):
            self.invalidate(stage)
        meta = {"fingerprint": fingerprint} if fingerprint is not None else None
        return self.write(stage, compute(), partition_by=partition_by, meta=meta)

    def invalidate(self, stage: str) -> None:
        if not self.enabled:
            return
        if self.iceberg_catalog:
            self.spark.sql(
                f"DROP TABLE IF EXISTS {self.iceberg_catalog}.{stage}"
            )
            return
        path = self._dir(stage)
        if os.path.exists(path):
            shutil.rmtree(path)

    def append(self, stage: str, df: DataFrame) -> None:
        """Append rows to a stage table WITHOUT a completion marker.

        This is the O(new-rows) persistence primitive for accumulating
        state (plans/incremental.save_state): appends carry no commit
        semantics of their own — callers commit by writing a separate
        versioned marker/meta stage AFTER the appends land, and filter
        un-committed rows out on read (the Iceberg-snapshot pattern,
        expressed on plain Parquet with a `_batch_id` column)."""
        if not self.enabled:
            raise ValueError("append() requires a checkpoint root")
        if self.iceberg_catalog:
            tbl = f"{self.iceberg_catalog}.{stage}"
            if self.spark.catalog.tableExists(tbl):
                df.writeTo(tbl).append()
            else:
                df.writeTo(tbl).create()
            return
        df.write.mode("append").parquet(self._dir(stage))

    def list_stages(self, prefix: str = "") -> list[str]:
        """Stage names under this store that start with `prefix` (both
        backends; used to locate the newest versioned state commit)."""
        if not self.enabled:
            return []
        if self.iceberg_catalog:
            try:
                tables = self.spark.catalog.listTables(self.iceberg_catalog)
            except Exception:
                return []
            return [t.name for t in tables if t.name.startswith(prefix)]
        return [
            d for d in os.listdir(self.root)
            if d.startswith(prefix) and os.path.isdir(os.path.join(self.root, d))
        ]
