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
