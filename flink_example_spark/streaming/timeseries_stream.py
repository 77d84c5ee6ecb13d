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


def run_streaming_rolling_actives(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """STREAMING trailing-7-day actives: the distinct (user, day) activity
    relation is the ONLY state a WAU metric needs — maintained live with
    ``dropDuplicates`` (first-seen per pair is deterministic BECAUSE the
    emitted row carries nothing but the key itself, dodging the
    dropDuplicates-arbitrary-row hazard in CLAUDE.md); the window fan-out
    and distinct count run over the converged (user, day) table at read
    time (user·day-sized, not event-sized).

    Production note: unbounded streams bound this state with
    ``dropDuplicatesWithinWatermark`` on the day column (old days stop
    accepting late activity) — the bounded replay needs no watermark.
    Converges to batch ``rolling_active_users`` → shares its oracle.
    """
    import uuid

    from flink_example_spark.streaming.pipeline import stream_events

    tune(spark)
    ev = stream_events(spark, sf_dir)
    ud = ev.select(
        F.col("user_id").alias("__u"), F.date_trunc("day", F.col("ts")).alias("__d")
    ).dropDuplicates(["__u", "__d"])
    name = f"stream_wau_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            ud.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    t = spark.table(name)
    mx = t.agg(F.max("__d").alias("__mx"))
    grid = t.select(
        "__u",
        "__d",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("__i"),
    ).select("__u", F.expr("timestampadd(DAY, __i, __d)").alias("report_day"))
    return (
        grid.crossJoin(F.broadcast(mx))
        .filter(F.col("report_day") <= F.col("__mx"))
        .groupBy("report_day")
        .agg(F.count_distinct("__u").alias("n_active"))
    )
