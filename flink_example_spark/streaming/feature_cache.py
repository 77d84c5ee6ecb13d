"""Incremental feature-cache population.

The reference's features query is designed to "be used unmodified to
populate a feature cache" (App.java:45-46): its changelog stream carries the
latest aggregate per key to a KV store. Spark equivalent: an update-mode
streaming aggregation — each micro-batch emits ONLY the keys whose aggregate
changed (the `+U` rows of Flink's changelog) — consumed by foreachBatch
writing to the cache.

``DictFeatureCache`` stands in for the external KV store (Redis/Cassandra in
a real deployment); the upsert contract is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.streaming.pipeline import stream_events


class DictFeatureCache:
    """In-process stand-in for the external feature store."""

    def __init__(self) -> None:
        self.data: dict = {}
        self.batch_sizes: list[int] = []

    def upsert(self, rows) -> None:
        self.batch_sizes.append(len(rows))
        for r in rows:
            self.data[r["_entity"]] = r["loss_value"]


def run_feature_cache(
    spark: SparkSession, sf_dir: str, cache: DictFeatureCache, loss_type: str = "error"
) -> DictFeatureCache:
    """Stream events → update-mode per-key aggregate → upsert changed keys
    into the cache. With availableNow the cache converges to the batch
    features_agg result while each batch touches only changed keys."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.filter(F.col("event_type") == loss_type)
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("loss_value"))
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        cache.upsert(batch.collect())

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return cache
