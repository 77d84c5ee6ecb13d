"""Incremental feature-cache population.

The reference's features query is designed to "be used unmodified to
populate a feature cache" (App.java:45-46): its changelog stream carries the
latest aggregate per key to a KV store. Spark equivalent: an update-mode
streaming aggregation — each micro-batch emits ONLY the keys whose aggregate
changed (the `+U` rows of Flink's changelog) — consumed by foreachBatch.

The write path is ``foreachPartition``: each EXECUTOR partition opens its own
writer and bulk-upserts its rows, so a hot micro-batch never funnels through
the driver (a ``collect()`` here would serialize the whole changelog through
one process — the anti-pattern this module exists to avoid). In production
the per-partition writer is a Redis/Cassandra client; ``FileKVCache`` stands
in with the identical contract: one writer per (batch, partition), bulk
upsert, idempotent under micro-batch replay (overwrite keyed on batch_id).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.streaming.pipeline import stream_events


class FileKVCache:
    """File-backed KV store driven by executor-side per-partition writers.

    Layout: ``{path}/batch=NNNNNN/part-PPPPP.jsonl`` — one file per
    (micro-batch, partition). Replay of a batch overwrites its own files
    (at-least-once → effectively-once). The object is pickled into executor
    closures; only ``path`` ships.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def upsert_partition(self, batch_id: int, rows: list[dict]) -> None:
        """Executor-side: bulk-upsert one partition's rows. In a real
        deployment this is `client = connect(); client.mset(rows)`."""
        if not rows:
            return
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        d = os.path.join(self.path, f"batch={batch_id:06d}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".part-{pid:05d}.tmp")
        with open(tmp, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        os.replace(tmp, os.path.join(d, f"part-{pid:05d}.jsonl"))  # atomic

    # --- driver-side read API -------------------------------------------

    def snapshot(self) -> dict:
        """Current cache contents: replay batches in order (later upserts of
        a key win, matching KV-store semantics)."""
        out: dict = {}
        for batch_dir in sorted(os.listdir(self.path)):
            for rows in self._batch_rows(batch_dir):
                for r in rows:
                    out[r["_entity"]] = r["loss_value"]
        return out

    def batch_sizes(self) -> list[int]:
        """Rows upserted per micro-batch (update mode ⇒ only changed keys)."""
        return [
            sum(len(rows) for rows in self._batch_rows(b))
            for b in sorted(os.listdir(self.path))
        ]

    def partition_files(self) -> list[str]:
        return [
            os.path.join(b, f)
            for b in sorted(os.listdir(self.path))
            for f in sorted(os.listdir(os.path.join(self.path, b)))
        ]

    def _batch_rows(self, batch_dir: str):
        d = os.path.join(self.path, batch_dir)
        for fname in sorted(os.listdir(d)):
            with open(os.path.join(d, fname)) as f:
                yield [json.loads(line) for line in f]


def run_feature_cache(
    spark: SparkSession, sf_dir: str, cache: FileKVCache, loss_type: str = "error"
) -> FileKVCache:
    """Stream events → update-mode per-key aggregate → per-partition upsert of
    changed keys. With availableNow the cache converges to the batch
    features_agg result while each batch touches only changed keys."""
    ev = stream_events(spark, sf_dir)
    agg = (
        ev.filter(F.col("event_type") == loss_type)
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("loss_value"))
    )

    def handle(batch: DataFrame, batch_id: int) -> None:
        def upsert(rows) -> None:
            cache.upsert_partition(
                batch_id,
                [{"_entity": r["_entity"], "loss_value": r["loss_value"]} for r in rows],
            )

        batch.foreachPartition(upsert)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return cache
