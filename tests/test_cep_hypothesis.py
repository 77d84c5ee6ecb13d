"""Hypothesis property tests for the CEP operators (SURVEY.md §5 model):
the DataFrame funnel/burst compositions vs a pure-Python reference on
randomized event relations. Few examples, each a full relation — Spark
jobs are slow per example (same trade-off as test_asof_hypothesis)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_example_spark.operators.cep import event_bursts, funnel

BASE = datetime(2024, 1, 1, 0, 0, 0)
STEPS = ["a", "b", "c"]

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # key
        st.integers(min_value=0, max_value=500),  # seconds offset
        st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
    ),
    min_size=0,
    max_size=40,
)


def _df(spark, rows):
    data = [
        (int(k), BASE + timedelta(seconds=s), t, i)
        for i, (k, s, t) in enumerate(rows)
    ]
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    return (
        spark.createDataFrame(data, schema)
        if data
        else spark.createDataFrame([], schema)
    )


def funnel_model(rows, steps, within_sec):
    out = {}
    by_key = {}
    for k, s, t in rows:
        by_key.setdefault(k, []).append((s, t))
    for k, evs in by_key.items():
        evs.sort()
        frontier = []
        for s, t in evs:
            j = len(frontier)
            if j == 0:
                if t == steps[0]:
                    frontier.append(s)
            elif j < len(steps) and t == steps[j]:
                if s > frontier[-1] and s <= frontier[0] + within_sec:
                    frontier.append(s)
                    if len(frontier) == len(steps):
                        out[k] = tuple(frontier)
                        break
    return out


def bursts_model(rows, etype, n, within_sec):
    alerts = set()
    by_key = {}
    for i, (k, s, t) in enumerate(rows):
        if t == etype:
            by_key.setdefault(k, []).append((s, i))
    for k, evs in by_key.items():
        for s, i in evs:
            cnt = sum(1 for s2, _ in evs if s - within_sec <= s2 <= s)
            if cnt >= n:
                alerts.add((k, i, cnt))
    return alerts


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_funnel_matches_model(spark, rows):
    got = {
        r["key"]: tuple(
            int((r[f"t_{i}"] - BASE).total_seconds()) for i in range(1, 4)
        )
        for r in funnel(_df(spark, rows), STEPS, within_sec=120).collect()
    }
    assert got == funnel_model(rows, STEPS, 120)


@pytest.mark.usefixtures("spark")
@given(rows=events_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_bursts_match_model(spark, rows):
    got = {
        (r["key"], r["event_id"], r["n_in_window"])
        for r in event_bursts(_df(spark, rows), "a", n=2, within_sec=60).collect()
    }
    assert got == bursts_model(rows, "a", 2, 60)
