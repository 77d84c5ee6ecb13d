"""Hypothesis property tests for the round-7 continuation-2 families:
compaction bin-packing invariants, t-closeness EMD bounds vs a float
reference, PR-curve confusion identities, and DTW vs a brute-force DP
(SURVEY.md §5 model — few examples, each a full relation)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=30),
    target=st.integers(min_value=10, max_value=600),
)
def test_compaction_plan_conservation_and_fullness(spark, sizes, target):
    from flink_example_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i}", s) for i, s in enumerate(sizes)], "file_id string, bytes long"
    )
    rows = compaction_plan(files, target_bytes=target).collect()
    # conservation: every byte and every file lands in exactly one bin
    assert sum(r["total_bytes"] for r in rows) == sum(sizes)
    assert sum(r["n_files"] for r in rows) == len(sizes)
    # the exclusive-cumsum spec: bin ids start at 0 and stay within the
    # capacity bound (ids may skip when one file exceeds the target —
    # its span covers whole bins)
    bins = sorted(r["bin"] for r in rows)
    assert bins[0] == 0 and len(set(bins)) == len(bins)
    assert bins[-1] <= sum(sizes) // target
    # is_full is exactly the >= target predicate
    for r in rows:
        assert r["is_full"] == (1 if r["total_bytes"] >= target else 0)


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 4)), min_size=4, max_size=40
    )
)
def test_t_closeness_matches_float_reference(spark, data):
    from flink_example_spark.operators.quality import t_closeness

    df = spark.createDataFrame(
        [(f"g{g}", v) for g, v in data], "grp string, s long"
    )
    rows = t_closeness(df, ["grp"], "s").collect()
    vals = sorted({v for _, v in data})
    if len(vals) < 2:
        assert rows == []
        return
    n_tot = len(data)
    for r in rows:
        grp_vals = [v for g, v in data if f"g{g}" == r["grp"]]
        # float EMD reference
        emd = 0.0
        cum_c = cum_g = 0
        for v in vals[:-1]:
            cum_c += sum(1 for x in grp_vals if x == v)
            cum_g += sum(1 for _, x in data if x == v)
            emd += abs(cum_c / len(grp_vals) - cum_g / n_tot)
        emd /= len(vals) - 1
        assert 0 <= r["emd_ppm"] <= 1_000_000
        assert abs(r["emd_ppm"] - emd * 1_000_000) <= len(vals)  # trunc slack


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.integers(-50, 50), st.booleans()), min_size=2, max_size=40
    )
)
def test_pr_curve_confusion_identities(spark, data):
    from flink_example_spark.operators.ml import pr_curve

    rows = [(i, 1 if pos else -1, m) for i, (m, pos) in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, y long, m long")
    n_pos = sum(1 for _, pos in data if pos)
    out = pr_curve(df, topn=1000).collect()
    assert len(out) == len({m for m, _ in data})
    for r in out:
        assert r["tp"] + r["fn"] == n_pos
        assert 0 <= r["precision_ppm"] <= 1_000_000
        if n_pos:
            assert 0 <= r["recall_ppm"] <= 1_000_000
        # predictions at-or-above the threshold: tp+fp of them
        n_pred = sum(1 for m, _ in data if m >= r["thresh_m"])
        assert r["tp"] + r["fp"] == n_pred


def _brute_dtw(a, b):
    big = 1 << 62
    prev = [big] * (len(b) + 1)
    prev[0] = 0
    for i in range(1, len(a) + 1):
        cur = [big] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            c = abs(a[i - 1] - b[j - 1])
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[len(b)]


@settings(**_SETTINGS)
@given(
    a=st.lists(st.integers(0, 100), min_size=24, max_size=24),
    b=st.lists(st.integers(0, 100), min_size=24, max_size=24),
)
def test_dtw_matches_brute_force(spark, a, b):
    from datetime import datetime, timedelta, timezone

    from flink_example_spark.operators.timeseries import dtw_matrix

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = []
    for d in range(24):
        rows.append(("a", base + timedelta(days=d), float(a[d])))
        rows.append(("b", base + timedelta(days=d), float(b[d])))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    r = dtw_matrix(df, "event_type", "ts", "value").collect()[0]
    # centering mirrors the operator (trunc-div of the centi sums)
    aq = [v * 100 for v in a]
    bq = [v * 100 for v in b]
    ac = [v - sum(aq) // 24 for v in aq]
    bc = [v - sum(bq) // 24 for v in bq]
    assert r["dtw_dist"] == _brute_dtw(ac, bc)
