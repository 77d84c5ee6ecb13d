"""The fused single-query streaming pipeline must converge exactly to the
batch flagship (SURVEY.md §5 streaming-parity strategy; the reference runs
its whole graph as one job, App.java:87)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_e2e_pipeline_converges_to_batch(spark):
    from flink_example_spark.plans.events_demo import pipeline
    from flink_example_spark.streaming.e2e import run_streaming_pipeline_e2e

    streamed = run_streaming_pipeline_e2e(spark, SF)
    batch = pipeline(spark, SF)
    assert streamed.columns == batch.columns
    assert rows_set(streamed) == rows_set(batch)


def test_e2e_is_one_streaming_query_with_six_stateful_ops(spark):
    """Structural pin: the assembled plan is ONE streaming DataFrame whose
    analyzed plan chains 3 stream-stream joins + 3 streaming aggregations —
    no foreachBatch, no intermediate materialization."""
    from flink_example_spark.streaming.e2e import build_pipeline_stream
    from flink_example_spark.tables import load_table

    from pyspark.sql import functions as F

    schema = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_type", "value"
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    final = build_pipeline_stream(stream, horizon_days=30)
    assert final.isStreaming
    plan = final._jdf.queryExecution().analyzed().toString()
    assert plan.count("Join ") == 3
    assert plan.count("Aggregate ") == 3
    assert plan.count("EventTimeWatermark ") == 4  # cur, prior, errors, purchases
