"""Temporal derivations over version histories (operators/versioned.py):
SCD2 intervals and AS-OF snapshot diffs."""

from __future__ import annotations

from datetime import datetime

from flink_example_spark.operators.versioned import scd2_intervals, snapshot_diff


def _hist(spark):
    rows = [
        ("u1", datetime(2024, 1, 1), 1),
        ("u1", datetime(2024, 1, 5), 2),
        ("u1", datetime(2024, 1, 12), 3),
        ("u2", datetime(2024, 1, 8), 1),
    ]
    return spark.createDataFrame(
        rows, "_entity string, _change_time timestamp, cnt long"
    )


def test_scd2_intervals_chain(spark):
    out = scd2_intervals(_hist(spark), "_entity").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["_entity"], []).append(r)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        # intervals chain: valid_to == next valid_from; exactly one current
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to"] == nxt["valid_from"]
        assert [r["is_current"] for r in rows] == [False] * (len(rows) - 1) + [True]
    assert by_key["u1"][-1]["cnt"] == 3
    assert by_key["u2"][0]["valid_to"] is None


def test_snapshot_diff_classifies(spark):
    h = _hist(spark)
    out = {
        r["_entity"]: (r["cnt_a"], r["cnt_b"], r["status"])
        for r in snapshot_diff(
            h, "_entity", "2024-01-06 00:00:00", "2024-01-31 00:00:00"
        ).collect()
    }
    # u1 changed 2 -> 3; u2 first appears after ts_a -> added
    assert out == {"u1": (2, 3, "changed"), "u2": (None, 1, "added")}


def test_snapshot_diff_unchanged_and_removed(spark):
    h = _hist(spark)
    # same instant twice: everything unchanged -> empty by default
    same = snapshot_diff(h, "_entity", "2024-01-20", "2024-01-20")
    assert same.count() == 0
    withu = snapshot_diff(
        h, "_entity", "2024-01-20", "2024-01-20", include_unchanged=True
    )
    assert {r["status"] for r in withu.collect()} == {"unchanged"}
    # diffing backwards exercises 'removed' (key absent in the b snapshot)
    back = {
        r["_entity"]: r["status"]
        for r in snapshot_diff(h, "_entity", "2024-01-10", "2024-01-02").collect()
    }
    assert back == {"u1": "changed", "u2": "removed"}
