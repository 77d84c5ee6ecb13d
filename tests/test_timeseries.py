"""Resample-to-grid (ffill + linear interpolation) and gap detection:
exact values on a hand-computed series, grid boundary behavior, and the
one-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_example_spark.operators.timeseries import resample, time_gaps


def _series(spark):
    rows = [
        ("u", datetime(2024, 1, 1, 0, 0, 0), 10.0),
        ("u", datetime(2024, 1, 1, 0, 0, 40), 30.0),
        ("u", datetime(2024, 1, 1, 0, 1, 30), 100.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_resample_ffill_and_interpolation_exact(spark):
    # 10s grid from 00:00:00 to 00:01:30 -> 10 points
    out = {
        r["grid_ts"]: (r["v_ffill"], r["v_interp"], r["staleness_us"])
        for r in resample(_series(spark), "k", "ts", "v", step_sec=10).collect()
    }
    assert len(out) == 10
    # on-observation grid points are exact, zero staleness
    assert out[datetime(2024, 1, 1, 0, 0, 0)] == (10.0, 10.0, 0)
    assert out[datetime(2024, 1, 1, 0, 0, 40)] == (30.0, 30.0, 0)
    # t=20s: ffill=10, interp = 10 + (30-10) * 20/40 = 20
    assert out[datetime(2024, 1, 1, 0, 0, 20)] == (10.0, 20.0, 20_000_000)
    # t=60s: ffill=30, interp = 30 + (100-30) * 20/50 = 58
    assert out[datetime(2024, 1, 1, 0, 1, 0)] == (30.0, 58.0, 20_000_000)


def test_resample_duplicate_timestamps_take_max(spark):
    rows = [
        ("u", datetime(2024, 1, 1), 1.0),
        ("u", datetime(2024, 1, 1), 5.0),  # same instant: MAX wins
        ("u", datetime(2024, 1, 2), 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sorted(
        (r["grid_ts"], r["v_ffill"])
        for r in resample(df, "k", "ts", "v", step_sec=86400).collect()
    )
    assert out == [(datetime(2024, 1, 1), 5.0), (datetime(2024, 1, 2), 2.0)]


def test_resample_single_window_plan(spark):
    """The whole resample is ONE partition-by-key exchange feeding both
    window passes — no grid-to-observation join."""
    plan = resample(
        _series(spark), "k", "ts", "v", step_sec=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_time_gaps_thresholds(spark):
    rows = [
        ("u", datetime(2024, 1, 1, 0, 0, 0)),
        ("u", datetime(2024, 1, 1, 1, 0, 0)),   # 1h gap
        ("u", datetime(2024, 1, 1, 1, 0, 30)),  # 30s
        ("w", datetime(2024, 1, 1, 0, 0, 0)),   # single event: no pair
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    gaps = time_gaps(df, "k", "ts", min_gap_sec=1800).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert (g["k"], g["gap_us"]) == ("u", 3_600_000_000)
    assert g["gap_start"] == datetime(2024, 1, 1, 0, 0, 0)
    assert g["gap_end"] == datetime(2024, 1, 1, 1, 0, 0)
