"""Salted (two-phase, time-bucketed) version history must equal the
single-window operator exactly — including tie collapse — while the heavy
window partitions on (key, bucket), never on the bare key."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def rows_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def events(spark):
    from flink_example_spark.plans.events_demo import load_events

    return load_events(spark, SF)


def test_salted_sum_equals_unsalted(spark, events):
    from flink_example_spark.operators.versioned import (
        salted_version_history,
        version_history,
    )

    errs = events.filter(F.col("event_type") == "error").withColumn(
        "__v", F.col("value").cast("decimal(18,2)")
    )
    plain = version_history(errs, key="user_id", time_col="ts", aggs={"v": F.sum("__v")})
    salted = salted_version_history(
        errs, key="user_id", time_col="ts", aggs={"v": ("sum", "__v")}, n_buckets=8
    )
    assert rows_set(plain) == rows_set(salted)


def test_salted_count_min_max_equal_unsalted(spark, events):
    from flink_example_spark.operators.versioned import (
        salted_version_history,
        version_history,
    )

    src = events.filter(F.col("event_type") == "purchase")
    plain = version_history(
        src,
        key="user_id",
        time_col="ts",
        aggs={"c": F.count(F.lit(1)), "lo": F.min("value"), "hi": F.max("value")},
    )
    salted = salted_version_history(
        src,
        key="user_id",
        time_col="ts",
        aggs={"c": ("count", None), "lo": ("min", "value"), "hi": ("max", "value")},
        n_buckets=5,
    )
    assert rows_set(plain) == rows_set(salted)


def test_salted_tie_collapse(spark):
    """Simultaneous events fold into ONE version row per (key, time), exactly
    like the RANGE frame — ties always share a bucket."""
    from flink_example_spark.operators.versioned import (
        salted_version_history,
        version_history,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10),
        (1, t0, 5),  # tie with the row above
        (1, t0 + datetime.timedelta(hours=1), 1),
        (2, t0 + datetime.timedelta(hours=2), 7),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, x long")
    plain = version_history(df, key="k", time_col="ts", aggs={"s": F.sum("x")})
    salted = salted_version_history(
        df, key="k", time_col="ts", aggs={"s": ("sum", "x")}, n_buckets=4
    )
    assert rows_set(plain) == rows_set(salted)
    assert salted.count() == 3  # the tie collapsed


def test_salted_plan_shape(spark, events):
    """The event-sized window sorts on (key, bucket); only the tiny totals
    relation ever windows on the bare key."""
    from flink_example_spark.operators.versioned import salted_version_history

    errs = events.filter(F.col("event_type") == "error")
    salted = salted_version_history(
        errs, key="user_id", time_col="ts", aggs={"v": ("sum", "value")}
    )
    plan = salted._jdf.queryExecution().optimizedPlan().toString()
    specs = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line.lower()
    ]
    assert specs, plan
    event_windows = [s for s in specs if "__b" in s]
    assert event_windows, f"no (key, bucket)-salted window in plan:\n{plan}"


def test_salted_matches_unsalted_hypothesis(spark):
    """Property: salted == unsalted on randomized event sets (ties, empty
    buckets, key skew) for sum and count. Few examples — each is a Spark
    job — but each a full random relation."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_example_spark.operators.versioned import (
        salted_version_history,
        version_history,
    )

    events_strategy = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key (skew-prone)
            st.integers(min_value=0, max_value=30),  # minute (ties likely)
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=30,
    )

    @given(rows=events_strategy, n_buckets=st.integers(min_value=1, max_value=5))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    def run(rows, n_buckets):
        data = [
            (k, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m), x)
            for k, m, x in rows
        ]
        df = spark.createDataFrame(data, "k long, ts timestamp_ntz, x long")
        plain = version_history(
            df, key="k", time_col="ts", aggs={"s": F.sum("x"), "c": F.count(F.lit(1))}
        )
        salted = salted_version_history(
            df,
            key="k",
            time_col="ts",
            aggs={"s": ("sum", "x"), "c": ("count", None)},
            n_buckets=n_buckets,
        )
        assert rows_set(plain) == rows_set(salted)

    run()


def test_snapshot_at_bounds_and_converges(spark):
    """snapshot_at(T) == latest version among rows with ts <= T; at the max
    timestamp it equals the table head; before the first version the key is
    absent."""
    from flink_example_spark.operators.versioned import (
        latest_versions,
        snapshot_at,
        version_history,
    )
    from flink_example_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        F.col("event_type") == "error"
    )
    hist = version_history(ev, "user_id", "ts", {"loss_value": F.sum("value")})
    head = {tuple(r) for r in latest_versions(hist, "_entity").collect()}
    at_end = {
        tuple(r) for r in snapshot_at(hist, "_entity", "2099-01-01 00:00:00").collect()
    }
    assert at_end == head
    early = snapshot_at(hist, "_entity", "2024-01-03 00:00:00")
    rows = early.collect()
    assert 0 < len(rows) < len(head)
    assert all(r["_change_time"].isoformat() <= "2024-01-03T00:00:00" for r in rows)
