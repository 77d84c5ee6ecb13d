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
    batch = entrymod.queries()["features_agg"](spark, SF)
    assert rows_set(streamed) == rows_set(batch)


def test_streaming_training_examples_converges_to_batch(spark):
    from flink_example_spark.plans.events_demo import pipeline
    from flink_example_spark.streaming.pipeline import run_streaming_training_examples

    streamed = run_streaming_training_examples(spark, SF)
    batch = pipeline(spark, SF)
    assert streamed.columns == batch.columns
    assert rows_set(streamed) == rows_set(batch)


def test_streaming_watermark_declared(spark):
    from flink_example_spark.streaming.pipeline import stream_events

    ev = stream_events(spark, SF)
    assert ev.isStreaming
    # watermark shows up in the analyzed plan as an EventTimeWatermark node
    assert "EventTimeWatermark" in ev._jdf.queryExecution().analyzed().toString()
