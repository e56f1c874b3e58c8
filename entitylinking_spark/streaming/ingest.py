"""Structured Streaming extension: incremental repo_files ingestion.

The reference is pure batch (SURVEY.md §2.9 — stage files, no streams).
This module is the forward-looking extension noted there: as new file
snapshots land in a directory/Iceberg table, stream them through the
key-derivation stage (sha256 invariant, MinHash signature, blocking keys)
into an append-only keyed table. The batch pipeline then resolves clusters
over the accumulated keyed table — incremental candidate generation
without recomputing signatures for old rows.

Also provides a streaming corpus monitor (windowed counts by lang with a
watermark) as the stateful-aggregation example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from entitylinking_spark.operators.blocking import ERConfig, with_keys
from entitylinking_spark.schemas import REPO_FILES


def stream_keyed(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ERConfig = ERConfig(),
    id_col: str | None = None,
    available_now: bool = True,
):
    """readStream(parquet dir) -> with_keys -> append parquet sink.

    with_keys is stateless row-wise derivation, so it composes with
    Structured Streaming unchanged — one definition for batch and stream.
    `available_now=True` processes the current backlog and stops (the
    testable mode); False runs continuously.
    """
    src = spark.readStream.schema(REPO_FILES).parquet(input_dir)
    keyed = with_keys(src, cfg, id_col=id_col)
    writer = (
        keyed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_resolve(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    cfg: ERConfig = ERConfig(),
    id_col: str | None = None,
    state_holder: dict | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    store=None,
    compact_every: int | None = None,
):
    """Streaming -> incremental-ER bridge (round-4 verdict #6): each
    arriving micro-batch of raw repo files is folded into the accumulated
    resolution state via plans/incremental.resolve_increment, so streaming
    ingest and incremental entity resolution compose end-to-end — clusters
    after the backlog drains equal a batch resolve over the same corpus
    (tests/test_streaming.py::test_stream_resolve_equals_batch).

    foreachBatch is the right seam: resolve_increment needs multi-stage
    batch semantics (self-join, connected components) that no streaming
    operator expresses, and foreachBatch hands each micro-batch over as a
    plain DataFrame with exactly-once file tracking from the streaming
    checkpoint. Returns (query, state_holder); state_holder["state"] is
    the latest IncrementalState after the query drains.

    Durability (round-5): pass `store` (a CheckpointStore) to make the
    STATE restartable too — each folded batch is persisted via
    plans/incremental.save_state (O(batch) appends + slim versioned
    clusters/meta commit), a fresh call on the same store resumes from
    load_state, and already-persisted batch ids are skipped when the
    at-least-once foreachBatch replays one. `store` and `checkpoint_dir`
    are a PAIRED unit: foreachBatch batch ids restart from 0 with a fresh
    streaming checkpoint, so retain or discard both together. The holder's
    state is swapped to the table-backed reload after every save, so the
    in-memory plan stays one-scan deep no matter how many batches stream
    through. `compact_every=N` additionally rewrites the on-disk append
    tables into a fresh generation every N folded batches, bounding
    small-file accumulation on unbounded streams (incremental.py
    compact_state — crash-safe write-new/commit/drop-old).

    Without `store`, the IncrementalState lives in driver memory only and
    this function is the single-process bridge.
    """
    from entitylinking_spark.plans.incremental import (
        compact_state,
        last_saved_batch_id,
        load_state,
        resolve_increment,
        save_state,
    )

    holder = state_holder if state_holder is not None else {}
    if store is not None and store.enabled and "state" not in holder:
        loaded = load_state(store, spark)
        if loaded is not None:
            holder["state"] = loaded
            holder["last_saved_batch_id"] = last_saved_batch_id(store)
            # the first batch folded after a restart may be a replay whose
            # previous attempt appended before crashing — mark it suspect
            # so load dedupes exactly that batch (incremental.py notes;
            # the no-prior-commit crash case is auto-detected by
            # save_state itself)
            holder["_replay_suspect"] = True
    reader = spark.readStream.schema(REPO_FILES)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        last = holder.get("last_saved_batch_id")
        if last is not None and batch_id <= last:
            return  # at-least-once replay of an already-persisted batch
        holder["state"] = resolve_increment(
            batch_df, holder.get("state"), cfg, id_col=id_col
        )
        holder["n_batches"] = holder.get("n_batches", 0) + 1
        if store is not None and store.enabled:
            save_state(holder["state"], store, batch_id,
                       suspect=holder.pop("_replay_suspect", False))
            holder["last_saved_batch_id"] = batch_id
            if compact_every and holder["n_batches"] % compact_every == 0:
                # rewrite the append tables into the next generation so
                # file count stays bounded on unbounded streams; the
                # returned state IS the reload below
                holder["state"] = compact_state(store, spark)
            else:
                # table-backed reload: collapses the in-memory union tree
                # and leaves delta frames None — the delta is saved, and
                # a second save_state on this state should loudly refuse
                holder["state"] = load_state(store, spark)

    writer = src.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), holder


def stream_curate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str,
    benchmark: DataFrame | None = None,
    config=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_holder: dict | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Streaming curation: the plans/curation funnel over arriving docs.

    Every stage of `curate` except exact dedup is a stateless expression,
    so it runs per micro-batch unchanged. Dedup needs cross-batch memory:
    each batch is annotated by the usual within-batch min-id sha window,
    then OR-ed with membership in an accumulating seen-sha table (the
    sha of the SCRUBBED text, same as batch curate dedups on). Both
    sinks are PARTITIONED by `_batch_id` and written with dynamic
    partition overwrite, so an at-least-once replay of a crashed fold
    overwrites its own partition instead of double-appending — restart
    is idempotent with no driver-memory state needed; the seen-table
    read excludes the current batch's partition (self-matches would
    wrongly flag a replayed batch as duplicate of itself).

    Determinism contract: with batches arriving in `id_col` order (the
    append-only ingest case), the drained output equals batch
    `curate` over the full corpus EXACTLY — the first-seen sha keeper is
    then also the min-id keeper (tests/test_streaming.py proves it).
    Out-of-order arrival keeps first-SEEN-wins semantics instead: same
    keep-count, possibly different representative rows.

    Returns (query, holder); holder["n_batches"] counts folded batches.
    Curated rows land under `{output_dir}/curated` (one verdict row per
    doc, append-only); seen shas under `{output_dir}/_seen_sha`.

    The optional model-classifier stage (config.model_n_buckets) is
    stateless and streams unchanged; config.domain_cap is REJECTED here —
    a global rank applied per micro-batch would multiply the cap by the
    batch count (run caps as a batch pass over the drained output).
    """
    import os

    from entitylinking_spark.plans.curation import curate

    if config is not None and getattr(config, "domain_cap", None) is not None:
        raise ValueError(
            "domain_cap is a GLOBAL rank over the corpus; applied per "
            "micro-batch it would keep cap docs per domain PER BATCH. "
            "Run cap_per_domain as a batch pass over the drained curated "
            "table instead (the model-classifier stage is stateless and "
            "streams fine)."
        )
    holder = state_holder if state_holder is not None else {}
    out_dir = os.path.join(output_dir, "curated")
    seen_dir = os.path.join(output_dir, "_seen_sha")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_dir)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bid = int(batch_id)
        ann = curate(batch_df, benchmark, config,
                     id_col=id_col, text_col=text_col)
        sha = F.sha2(F.col("text").cast("string"), 256)
        keyed = ann.withColumn("_sha", sha)
        if os.path.isdir(seen_dir):
            # decontam-style probe: broadcast THIS batch's shas (small by
            # definition) and semi-join them into the seen-table scan —
            # one map-side pass over the accumulated shas, zero shuffle
            # of the big side, hit list bounded by the batch. (The scan
            # itself is O(total shas) per batch; a Bloom-filter sidecar
            # or a bucketed seen table is the upgrade path when that
            # read dominates.)
            batch_shas = keyed.select("_sha").distinct()
            hits = (
                spark.read.parquet(seen_dir)
                # exclude own partition: a crashed attempt's leftovers
                # must not flag the replayed batch as its own duplicate
                .filter(F.col("_batch_id") != bid)
                .join(F.broadcast(batch_shas), "_sha", "leftsemi")
                .select("_sha").distinct().withColumn("_seen", F.lit(True))
            )
            keyed = keyed.join(F.broadcast(hits), "_sha", "left").withColumn(
                "is_duplicate",
                F.col("is_duplicate") | F.coalesce(F.col("_seen"), F.lit(False)),
            ).drop("_seen")
        keyed = keyed.withColumn(
            "keep", F.col("keep") & ~F.col("is_duplicate")
        ).withColumn("_batch_id", F.lit(bid)).persist()
        for path, frame in (
            (out_dir, keyed.drop("_sha")),
            (seen_dir, keyed.select("_sha", "_batch_id").distinct()),
        ):
            (
                frame.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(path)
            )
        keyed.unpersist()
        holder["n_batches"] = holder.get("n_batches", 0) + 1
        holder["last_batch_id"] = bid

    writer = src.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), holder


def stream_corpus_monitor(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-lang arrival counts with late-data watermarking.

    events: a streaming DataFrame with (ts timestamp, lang string). Returns
    the windowed aggregate (write with outputMode 'append' after the
    watermark closes windows).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_files"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_files",
        )
    )
