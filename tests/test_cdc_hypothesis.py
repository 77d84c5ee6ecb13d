"""Hypothesis property tests: apply_changelog and ohlc_bars vs pure-Python
reference folds on randomized inputs (SURVEY.md §5 model — few examples,
each a full relation; Spark jobs are slow per example)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)

changes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),            # key
        st.integers(min_value=0, max_value=30),           # days offset
        st.sampled_from(["+I", "-U", "+U", "-D"]),        # RowKind
        st.integers(min_value=0, max_value=99),           # value
    ),
    min_size=0,
    max_size=25,
)

base_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=100, max_value=199),
    max_size=4,
)


def _model_merge(base: dict, rows: list) -> dict:
    """Pure-Python net-effect fold: latest change by (ts, seq) wins per
    key; -U dropped up front; -D tombstones."""
    state = dict(base)
    last = {}
    for seq, (k, d, op, v) in enumerate(rows):
        if op == "-U":
            continue
        key = (d, seq)
        if k not in last or key > last[k][0]:
            last[k] = (key, op, v)
    for k, (_, op, v) in last.items():
        if op == "-D":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(base=base_strategy, rows=changes_strategy)
def test_apply_changelog_matches_model(spark, base, rows):
    from flink_example_spark.operators.versioned import apply_changelog

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(99, 0)], "k long, v long"
    )
    if not base:
        base_df = base_df.filter("k < 0")
    ch_rows = [
        (k, BASE + timedelta(days=d), seq, op, v)
        for seq, (k, d, op, v) in enumerate(rows)
    ]
    ch_df = spark.createDataFrame(
        ch_rows or [(0, BASE, 0, "+U", 0)], "k long, ts timestamp, seq long, op string, v long"
    )
    if not ch_rows:
        ch_df = ch_df.filter("k < 0")
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(base_df, ch_df, "k", "ts", seq_col="seq").collect()
    }
    assert got == _model_merge(base, rows)


bars_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # day
        st.integers(min_value=0, max_value=23),   # hour
        st.integers(min_value=-50, max_value=50),  # value (exact ints as doubles)
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=bars_strategy)
def test_ohlc_matches_model(spark, rows):
    from flink_example_spark.operators.timeseries import ohlc_bars

    data = [
        ("k", BASE + timedelta(days=d, hours=h), seq, float(v))
        for seq, (d, h, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "k string, ts timestamp, seq long, v double")
    got = {
        r["bar_ts"].day: (r["open"], r["high"], r["low"], r["close"], r["n_events"], r["vol_sum"])
        for r in ohlc_bars(df, "k", "ts", "v", seq_col="seq").collect()
    }
    model = {}
    for seq, (d, h, v) in enumerate(rows):
        model.setdefault(d, []).append(((h, seq), float(v)))
    want = {}
    for d, items in model.items():
        items.sort(key=lambda p: p[0])
        vals = [v for _, v in items]
        want[d + 1] = (
            items[0][1],
            max(vals),
            min(vals),
            items[-1][1],
            len(vals),
            float(sum(vals)),
        )
    assert got == want
