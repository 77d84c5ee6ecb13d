"""Structured Streaming parity (SURVEY.md §2.7, build plan Phase 3).

Reference mapping:
- T1 zero-delay watermark (App.java:121,139)  → ``withWatermark(ts, "0 seconds")``
- A1/A2 update-mode aggregates (App.java:47,52) → streaming groupBy + update/
  complete output; the state store holds per-key running aggregates (what
  Flink emits as a changelog)
- T3/T4 changelog→versioned table (AddWatermark.java) → unnecessary: version
  history is computed directly from event time (SURVEY.md §7.1); the
  streaming as-of join consumes micro-batches via foreachBatch
- J1/J2 temporal join → ``streaming_asof_join``: each probe micro-batch is
  as-of joined against the version history (stream-static); exact same
  operator as batch, so streaming results converge to the batch result.

All sources here are file streams over the harness parquet (maxFilesPerTrigger
simulates arrival); production would swap in Kafka/Kinesis sources — the
transformations are source-agnostic DataFrame code.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.operators.asof import asof_join
from flink_example_spark.session import tune


def _read_batches(spark: SparkSession, outdir: str) -> DataFrame:
    """Read foreachBatch output; the parquet files back the returned (lazy)
    DataFrame, so the caller reaps ``outdir`` only after consuming it."""
    if not any(name.startswith("batch=") for name in os.listdir(outdir)):
        raise RuntimeError(
            f"streaming sink {outdir} is empty: the source stream produced no "
            "micro-batches (empty input directory?)"
        )
    return spark.read.parquet(outdir).drop("batch")


def _staged_dir(src_file: str) -> str:
    """File-stream sources need a *directory*; stage the (read-only) harness
    parquet file into a temp dir via symlink."""
    import os

    d = f"/tmp/stream_src_{uuid.uuid4().hex[:8]}"
    os.makedirs(d, exist_ok=True)
    os.symlink(src_file, os.path.join(d, os.path.basename(src_file)))
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source event stream with the reference's zero-delay watermark.

    Timestamp ingestion goes through the SAME ``tables.normalize_ts`` helper
    as the batch loader, so both parquet layouts (int64-nanos and native µs)
    stream identically and the two ingest paths cannot diverge."""
    from flink_example_spark.tables import normalize_ts

    tune(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_dir(f"{sf_dir}/events.parquet"))
    )
    # EventTimeWatermark requires TIMESTAMP (LTZ); normalize first (shared
    # layout logic), then cast NTZ→LTZ — exact under the UTC session pin.
    normalized = normalize_ts(stream, "ts").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return normalized.withWatermark("ts", "0 seconds")


def run_streaming_features(
    spark: SparkSession, sf_dir: str, loss_type: str = "error"
) -> DataFrame:
    """Streaming A1: continuously-updating per-user loss aggregate, complete
    output mode into an in-memory table; returns the converged result.

    This is the reference's Features query (App.java:47) as a live stream —
    the state store plays the role of Flink's aggregate state, the memory
    sink the role of the changelog consumer.
    """
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.filter(F.col("event_type") == loss_type)
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("loss_value"))
    )
    name = f"stream_features_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming T6: event-time tumbling daily counts per type with the
    zero-delay watermark; complete output into a memory sink for bounded
    replay — converges to the batch tumbling_window_counts (shared oracle).
    In production this runs in update mode with the watermark expiring
    closed windows from the state store."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming T6 sliding windows (1 day every 12 hours): each event updates
    two window states; complete output for bounded replay — converges to the
    batch sliding_window_counts (shared oracle). Production runs update mode
    with the watermark closing windows 1 day after their start."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 day", "12 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming T6 session windows: per-user sessions with a 30-minute
    inactivity gap — the state store MERGES adjacent session state as events
    arrive (the hard part Flink's session windows also solve); complete
    output for bounded replay, converging to the batch session_window_counts
    (shared oracle)."""
    from flink_example_spark.session import shuffle_partitions

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    name = f"stream_session_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def streaming_asof_join(
    spark: SparkSession,
    probe_stream: DataFrame,
    versions: DataFrame,
    on: str,
    probe_time: str,
    sink_table: str | None = None,
) -> DataFrame:
    """Temporal join of a probe stream against a version history (J1/J2,
    App.java:200-233) via foreachBatch: every micro-batch of probes is as-of
    joined with the SAME operator as batch, appended to an in-memory sink.

    Because the as-of result for a probe row never changes once emitted (the
    no-temporal-leakage property, App.java:29-33), per-micro-batch evaluation
    is exact — no retraction handling is needed, which is precisely why the
    version-history formulation beats changelog replay.

    foreachBatch is at-least-once: a failed/restarted micro-batch re-runs.
    Writes are therefore keyed on ``batch_id`` (mode=overwrite into a
    per-batch partition directory), so a replayed batch overwrites its own
    prior output instead of duplicating rows — the same contract a
    transactional sink (Delta/Iceberg) gives via (queryId, batchId) dedup.
    """
    outdir = sink_table or tempfile.mkdtemp(prefix="stream_asof_")

    def handle(batch: DataFrame, batch_id: int) -> None:
        out = asof_join(batch, versions, on=on, probe_time=probe_time, strategy="union")
        out.write.mode("overwrite").parquet(f"{outdir}/batch={batch_id}")

    q = probe_stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return _read_batches(spark, outdir)


def run_streaming_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming pipeline: streamed examples as-of joined against the
    feature/target version histories; converges to the batch flagship query."""
    from flink_example_spark.plans.events_demo import (
        examples,
        feature_history,
        load_events,
        target_history,
    )

    ev_batch = load_events(spark, sf_dir)
    fh, th = feature_history(ev_batch), target_history(ev_batch)

    # The examples relation needs a per-key ordered window (W1), which batch
    # computes; stream the *examples* (prediction points) instead — in a live
    # deployment this is the upstream model-serving event stream.
    ex_batch = examples(ev_batch)
    tmpdir = tempfile.mkdtemp(prefix="stream_examples_")
    ex_batch.repartition(4).write.mode("overwrite").parquet(tmpdir)
    ex_stream = (
        spark.readStream.schema(ex_batch.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(tmpdir)
    )
    sink = tempfile.mkdtemp(prefix="stream_training_")

    def handle(batch: DataFrame, batch_id: int) -> None:
        step1 = asof_join(batch, fh, on="_entity", probe_time="_prediction_time")
        step2 = asof_join(step1, th, on="_entity", probe_time="_label_time")
        # batch_id-keyed overwrite: idempotent under at-least-once replay
        step2.write.mode("overwrite").parquet(f"{sink}/batch={batch_id}")

    q = ex_stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return _read_batches(spark, sink)
