"""Streaming CEP funnel (streaming/cep_stream.py): bounded time-ordered
replay must converge exactly to the batch funnel, independent of chunking."""

from __future__ import annotations

from flink_example_spark.operators.cep import funnel
from flink_example_spark.streaming.cep_stream import run_streaming_funnel
from flink_example_spark.tables import load_table

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


def _rows(df):
    return sorted(
        (r["key"], r["t_1"], r["t_2"], r["t_3"], r["duration_us"])
        for r in df.collect()
    )


def test_streaming_funnel_matches_batch_across_chunkings(spark):
    batch = _rows(funnel(load_table(spark, SF, "events"), STEPS, 86400))
    assert batch, "expected completed funnels in the fixture data"
    for chunks in (1, 3):
        got = _rows(run_streaming_funnel(spark, SF, STEPS, 86400, chunks=chunks))
        assert got == batch, f"chunks={chunks} diverged from batch"


def test_streaming_funnel_emits_each_completion_once(spark):
    # chunked replay: completions must not repeat across micro-batches
    out = run_streaming_funnel(spark, SF, STEPS, 86400, chunks=4)
    keys = [r["key"] for r in out.collect()]
    assert len(keys) == len(set(keys))


def test_unordered_replay_matches_batch(spark):
    from flink_example_spark.streaming.cep_stream import (
        run_streaming_funnel_unordered,
    )

    batch = _rows(funnel(load_table(spark, SF, "events"), STEPS, 86400))
    got = _rows(run_streaming_funnel_unordered(spark, SF, STEPS, 86400))
    assert got == batch


def test_unordered_replay_drops_late_events(spark):
    # delay smaller than the disorder: events arriving below the watermark
    # are late-dropped (Flink rule), so completions can disappear vs batch
    from flink_example_spark.streaming.cep_stream import (
        run_streaming_funnel_unordered,
    )

    batch = _rows(funnel(load_table(spark, SF, "events"), STEPS, 86400))
    # day-interleaved chunks give ~month-wide disorder; a 1-day horizon
    # drops most buffered history
    got = _rows(
        run_streaming_funnel_unordered(spark, SF, STEPS, 86400, delay_days=1)
    )
    assert len(got) <= len(batch)


def test_streaming_bursts_matches_batch(spark):
    from flink_example_spark.operators.cep import event_bursts
    from flink_example_spark.streaming.cep_stream import run_streaming_bursts

    batch = sorted(
        (r["key"], r["event_id"], r["ts"], r["n_in_window"])
        for r in event_bursts(
            load_table(spark, SF, "events"), "error", 2, 86400
        ).collect()
    )
    got = sorted(
        (r["key"], r["event_id"], r["ts"], r["n_in_window"])
        for r in run_streaming_bursts(spark, SF, "error", 2, 86400, chunks=3).collect()
    )
    assert batch and got == batch


def test_streaming_bursts_tie_handling(spark):
    # two events at the IDENTICAL timestamp: the batch range frame counts
    # each in the other's window — the streaming tie-group must as well
    from datetime import datetime

    from flink_example_spark.streaming.cep_stream import streaming_bursts
    import os, tempfile, uuid

    from flink_example_spark.streaming.staging import stamp_chunk_mtimes

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(1, t0, 7, "error", 0.0, "{}"), (2, t0, 7, "error", 0.0, "{}")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    tmpdir = tempfile.mkdtemp(prefix="tie_burst_")
    df.coalesce(1).write.parquet(os.path.join(tmpdir, "chunk_0"))
    stamp_chunk_mtimes(tmpdir)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    out = streaming_bursts(stream, "error", n=2, within_sec=10)
    name = f"tie_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName(name).trigger(availableNow=True).start()
    )
    q.awaitTermination()
    res = spark.table(name).collect()
    assert sorted((r["event_id"], r["n_in_window"]) for r in res) == [(1, 2), (2, 2)]
