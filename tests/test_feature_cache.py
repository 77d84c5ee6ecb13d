"""Incremental feature-cache population (S6 changelog-consumer semantics):
update-mode batches carry only changed keys; writes happen per EXECUTOR
partition (no driver collect); the cache converges to the batch aggregate."""

from __future__ import annotations

import tempfile

import __spark_entry__ as entrymod
from flink_example_spark.streaming.feature_cache import FileKVCache, run_feature_cache

SF = "/root/testdata/sf0.001"


def test_feature_cache_converges(spark):
    cache = run_feature_cache(spark, SF, FileKVCache(tempfile.mkdtemp()))
    batch = {
        r["_entity"]: r["loss_value"]
        for r in entrymod._all_queries()["features_agg"](spark, SF).collect()
    }
    assert cache.snapshot() == batch
    # Per-partition upserts: the writers ran on executor partitions — every
    # non-empty micro-batch produced >= 1 partition file, written executor-side.
    files = cache.partition_files()
    assert files and all(f.endswith(".jsonl") for f in files)
    # update-mode incrementality: with one file per trigger the stream ran
    # several batches, and at least one emitted fewer keys than the total —
    # i.e. the changelog carried deltas, not full snapshots.
    sizes = cache.batch_sizes()
    assert len(sizes) >= 1
    if len(sizes) > 1:
        assert min(sizes) < len(batch)
