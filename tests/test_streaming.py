"""Streaming parity (SURVEY.md §5): micro-batch runs over the same inputs
must converge to the batch results."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_features_converges_to_batch(spark):
    import __spark_entry__ as entrymod
    from flink_example_spark.streaming.pipeline import run_streaming_features

    streamed = run_streaming_features(spark, SF)
    batch = entrymod._all_queries()["features_agg"](spark, SF)
    assert rows_set(streamed) == rows_set(batch)


def test_streaming_training_examples_converges_to_batch(spark):
    from flink_example_spark.plans.events_demo import pipeline
    from flink_example_spark.streaming.pipeline import run_streaming_training_examples

    streamed = run_streaming_training_examples(spark, SF)
    batch = pipeline(spark, SF)
    assert streamed.columns == batch.columns
    assert rows_set(streamed) == rows_set(batch)


def test_streaming_tumbling_window_converges(spark):
    """T6 streaming: watermarked tumbling-window aggregate converges to the
    batch daily counts."""
    import uuid

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from flink_example_spark.streaming.pipeline import stream_events

    ev = stream_events(spark, SF)
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("day"), "event_type", "n")
    )
    name = f"stream_tumble_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["day"].replace(tzinfo=None), r["event_type"], r["n"])
        for r in spark.table(name).collect()
    }
    batch = {
        (r["day"], r["event_type"], r["n"])
        for r in entrymod._all_queries()["tumbling_window_counts"](spark, SF).collect()
    }
    assert streamed == batch


def test_streaming_watermark_declared(spark):
    from flink_example_spark.streaming.pipeline import stream_events

    ev = stream_events(spark, SF)
    assert ev.isStreaming
    # watermark shows up in the analyzed plan as an EventTimeWatermark node
    assert "EventTimeWatermark" in ev._jdf.queryExecution().analyzed().toString()
