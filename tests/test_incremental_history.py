"""Incremental (streaming) version-history maintenance must converge exactly
to the batch version_history relation — the feature-cache population path."""

from __future__ import annotations

import pytest

from flink_example_spark.plans.events_demo import (
    feature_history,
    load_events,
    target_history,
)
from flink_example_spark.streaming.incremental import run_incremental_feature_history

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("agg", ["sum", "count"])
def test_incremental_history_converges_to_batch(spark, agg):
    ev = load_events(spark, SF)
    batch = feature_history(ev) if agg == "sum" else target_history(ev)
    val = "loss_value" if agg == "sum" else "cnt"

    streamed = run_incremental_feature_history(spark, SF, chunks=3, agg=agg)
    got = {
        (r["_entity"], r["_change_time"], r[val]) for r in streamed.collect()
    }
    expected = {(r["_entity"], r["_change_time"], r[val]) for r in batch.collect()}
    # exact convergence: same rows, same (decimal-exact) values, ties
    # collapsed identically — not approximate equality
    assert got == expected


def test_incremental_history_is_incremental(spark):
    """More chunks (more micro-batches) must not change the result — each
    batch folds onto carried state rather than recomputing history."""
    a = {
        (r["_entity"], r["_change_time"], r["loss_value"])
        for r in run_incremental_feature_history(spark, SF, chunks=2).collect()
    }
    b = {
        (r["_entity"], r["_change_time"], r["loss_value"])
        for r in run_incremental_feature_history(spark, SF, chunks=5).collect()
    }
    assert a == b and len(a) > 0
