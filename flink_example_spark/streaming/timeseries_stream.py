"""STREAMING OHLC bars: the per-(key, bucket) open/high/low/close rollup
maintained live over the event stream.

Every component of the bar is a commutative aggregate with a bounded merge
(min_by/max_by over the deterministic order key, min/max, count, decimal
sum), so the whole rollup is ONE pure-JVM streaming aggregation — complete
output mode, no watermark, no Python state — and converges to the batch
:func:`~flink_example_spark.operators.timeseries.ohlc_bars` result under
any arrival order. State is one bar per (key, bucket): the compacted
downsample IS the state, which is exactly why OHLC is the rollup metric
stores run at ingest.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.session import shuffle_partitions, tune
from flink_example_spark.streaming.pipeline import stream_events


def run_streaming_ohlc(
    spark: SparkSession, sf_dir: str, bucket: str = "day"
) -> DataFrame:
    """Bounded replay of the event stream through the live OHLC aggregate;
    hash-identical to batch ``timeseries_ohlc`` (shares its oracle)."""
    tune(spark)
    ev = stream_events(spark, sf_dir)
    t = F.col("ts")
    ok = F.concat(
        F.lpad(F.unix_micros(t.cast("timestamp")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    v = F.col("value")
    bars = ev.groupBy(
        F.col("user_id").alias("_entity"), F.date_trunc(bucket, t).alias("bar_ts")
    ).agg(
        F.min_by(v, ok).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, ok).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(v.cast("decimal(18,2)")).cast("double").alias("vol_sum"),
    )
    name = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            bars.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
