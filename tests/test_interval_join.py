"""Stream-stream interval join must converge exactly to the batch range
join relation, across micro-batch splits."""

from __future__ import annotations

import pytest

from flink_example_spark.plans.relational import run_sql
from flink_example_spark.streaming.interval_join import run_streaming_interval_join

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("chunks", [1, 3])
def test_interval_join_converges_to_batch(spark, chunks):
    got = {
        (r["event_id"], r["n_prior_errors"])
        for r in run_streaming_interval_join(spark, SF, chunks=chunks).collect()
    }
    exp = {
        (r["event_id"], r["n_prior_errors"])
        for r in run_sql(spark, SF, "range_join_prior_errors").collect()
    }
    assert got == exp and len(got) > 0
