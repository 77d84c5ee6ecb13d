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


# --- CDC changelog apply (MERGE INTO semantics) -----------------------------


def _base(spark):
    return spark.createDataFrame(
        [("u1", 10, "a"), ("u2", 20, "b"), ("u3", 30, "c")],
        "_entity string, cnt long, tag string",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "_entity string, ts timestamp, seq long, op string, cnt long, tag string"
    )


def test_apply_changelog_upsert_delete_insert(spark):
    from flink_example_spark.operators.versioned import apply_changelog

    ch = _changes(
        spark,
        [
            ("u1", datetime(2024, 1, 2), 1, "+U", 11, "a2"),   # update u1
            ("u2", datetime(2024, 1, 3), 2, "-D", None, None),  # delete u2
            ("u4", datetime(2024, 1, 4), 3, "+I", 40, "d"),     # fresh insert
        ],
    )
    out = {
        r["_entity"]: (r["cnt"], r["tag"])
        for r in apply_changelog(_base(spark), ch, "_entity", "ts", seq_col="seq").collect()
    }
    assert out == {"u1": (11, "a2"), "u3": (30, "c"), "u4": (40, "d")}


def test_apply_changelog_latest_wins_and_retractions_ignored(spark):
    from flink_example_spark.operators.versioned import apply_changelog

    ch = _changes(
        spark,
        [
            # full retract-stream episode on u1: -U old, +U new, then delete,
            # then a LATER re-insert — net effect is the re-insert
            ("u1", datetime(2024, 1, 2), 1, "-U", 10, "a"),
            ("u1", datetime(2024, 1, 2), 2, "+U", 99, "x"),
            ("u1", datetime(2024, 1, 3), 3, "-D", None, None),
            ("u1", datetime(2024, 1, 4), 4, "+I", 12, "a3"),
            # same-timestamp seq tiebreak on u2: seq 6 wins
            ("u2", datetime(2024, 1, 5), 5, "+U", 21, "b1"),
            ("u2", datetime(2024, 1, 5), 6, "+U", 22, "b2"),
        ],
    )
    out = {
        r["_entity"]: (r["cnt"], r["tag"])
        for r in apply_changelog(_base(spark), ch, "_entity", "ts", seq_col="seq").collect()
    }
    assert out == {"u1": (12, "a3"), "u2": (22, "b2"), "u3": (30, "c")}


def test_apply_changelog_delete_wins_when_latest(spark):
    from flink_example_spark.operators.versioned import apply_changelog

    ch = _changes(
        spark,
        [
            ("u3", datetime(2024, 1, 2), 1, "+U", 31, "c1"),
            ("u3", datetime(2024, 1, 9), 2, "-D", None, None),
            # delete of a key that never existed: no row, no error
            ("u9", datetime(2024, 1, 2), 3, "-D", None, None),
        ],
    )
    out = apply_changelog(_base(spark), ch, "_entity", "ts", seq_col="seq")
    got = {r["_entity"] for r in out.collect()}
    assert got == {"u1", "u2"}


def test_apply_changelog_ambiguous_ties_raise_without_seq(spark):
    import pytest as _pytest
    from flink_example_spark.operators.versioned import apply_changelog

    ch = _changes(
        spark,
        [
            ("u1", datetime(2024, 1, 2), 1, "+U", 11, "a1"),
            ("u1", datetime(2024, 1, 2), 2, "+U", 12, "a2"),
        ],
    )
    with _pytest.raises(Exception, match="seq_col"):
        apply_changelog(_base(spark), ch, "_entity", "ts").collect()


def test_streaming_cdc_apply_converges_to_batch(spark):
    """Bounded replay of the changelog (any chunking) must equal the batch
    MERGE exactly — the net-change state is a (ts, seq) max semilattice."""
    from flink_example_spark.streaming.cdc_stream import run_streaming_cdc_apply

    sf = "/root/testdata/sf0.001"
    import importlib.util

    spec = importlib.util.spec_from_file_location("entry_mod", "/root/repo/__spark_entry__.py")
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    batch = entry_mod._all_queries()["versioned_cdc_apply"](spark, sf)
    stream = run_streaming_cdc_apply(spark, sf, chunks=2)
    assert {tuple(r) for r in stream.collect()} == {tuple(r) for r in batch.collect()}


def test_temporal_rule_filter_as_of_semantics(spark):
    """Events are judged by the rule in effect AT THEIR EVENT TIME: a
    later rule change must not retro-filter earlier events; pre-first-rule
    events pass through."""
    from flink_example_spark.operators.versioned import temporal_rule_filter

    rules = spark.createDataFrame(
        [("click", datetime(2024, 1, 10), 5.0), ("click", datetime(2024, 1, 20), 50.0)],
        "event_type string, _change_time timestamp, min_value double",
    )
    events = spark.createDataFrame(
        [
            (1, "click", datetime(2024, 1, 5), 1.0),    # before any rule -> kept
            (2, "click", datetime(2024, 1, 15), 10.0),  # rule=5 -> kept
            (3, "click", datetime(2024, 1, 15), 3.0),   # rule=5 -> dropped
            (4, "click", datetime(2024, 1, 25), 10.0),  # rule=50 -> dropped
            (5, "click", datetime(2024, 1, 25), 60.0),  # rule=50 -> kept
        ],
        "event_id long, event_type string, ts timestamp, value double",
    )
    out = {r["event_id"] for r in temporal_rule_filter(
        events, rules, on="event_type", event_time="ts"
    ).collect()}
    assert out == {1, 2, 5}


def test_streaming_late_split_matches_mod_rule(spark):
    """The side output must equal the oracle's mod-chunk classification at
    sf0.001 (first chunk never late; later chunks late behind the carried
    watermark)."""
    import duckdb

    from flink_example_spark.streaming.late_split import (
        late_split_oracle,
        run_streaming_late_split,
    )

    got = {
        (r["event_id"], r["lateness_us"])
        for r in run_streaming_late_split(spark, "/root/testdata/sf0.001").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    want = {tuple(r) for r in con.execute(late_split_oracle(chunks=3)).fetchall()}
    assert got == want and got
