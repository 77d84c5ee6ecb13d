"""Fully-JVM stream-stream as-of (chained interval join + arg-max agg):
must converge exactly to the batch backward as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_example_spark.operators.asof import asof_join
from flink_example_spark.plans.events_demo import examples, feature_history, load_events
from flink_example_spark.streaming.asof_stream import run_streaming_asof_interval

SF = "/root/testdata/sf0.001"


def test_streaming_asof_interval_converges(spark):
    got = run_streaming_asof_interval(spark, SF)
    ev = load_events(spark, SF)
    exp = asof_join(
        examples(ev), feature_history(ev), on="_entity", probe_time="_prediction_time"
    ).select(
        "_entity",
        F.col("_prediction_time").cast("timestamp").alias("_prediction_time"),
        F.col("_label_time").cast("timestamp").alias("_label_time"),
        "loss_value",
    )
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in exp.collect()}
    assert g == e and len(g) > 0
