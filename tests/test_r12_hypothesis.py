"""Hypothesis property tests for the round-12 families: switchback vs
a big-int Python reference (bucket hash, washout gate, both weightings),
cluster lift vs a direct reference (variance form, chi-square gates,
arm-swap antisymmetry), and SNDR's weighted-mean correction bound
(SURVEY.md §5 model — few examples, each a full relation)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

B_US = 60 * 60_000_000
W_US = 10 * 60_000_000


def _sm(n: int, d: int) -> int:
    return (1 if n >= 0 else -1) * (abs(n) // d)


def _arm(bucket: int) -> int:
    return int(hashlib.md5(str(bucket).encode()).hexdigest()[:8], 16) % 2


def _ref_switchback(rows):
    """rows: [(epoch_seconds, value_float)] -> feature map (big-int)."""
    buckets: dict = {}
    for sec, val in rows:
        us = sec * 1_000_000
        b = us // B_US
        inc = 1 if us % B_US >= W_US else 0
        yq = int((val * 1_000_000 + 0.5) // 1)
        st_ = buckets.setdefault((b, _arm(b)), [0, 0, 0])
        st_[0] += inc
        st_[1] += inc * yq
        st_[2] += 1 - inc
    agg = {t: dict(nb=0, nr=0, sr=0, sbm=0) for t in "ab"}
    n_exc = 0
    for (b, arm), (n_inc, s_inc, ne) in buckets.items():
        t = "a" if arm == 0 else "b"
        n_exc += ne
        if n_inc > 0:
            agg[t]["nb"] += 1
            agg[t]["sbm"] += _sm(s_inc, n_inc)
        agg[t]["nr"] += n_inc
        agg[t]["sr"] += s_inc
    mr = {
        t: _sm(agg[t]["sr"], agg[t]["nr"]) if agg[t]["nr"] else 0
        for t in "ab"
    }
    mb = {
        t: _sm(agg[t]["sbm"], agg[t]["nb"]) if agg[t]["nb"] else 0
        for t in "ab"
    }
    return {
        "n_buckets_a": agg["a"]["nb"],
        "n_buckets_b": agg["b"]["nb"],
        "n_rows_a": agg["a"]["nr"],
        "n_rows_b": agg["b"]["nr"],
        "n_rows_excluded": n_exc,
        "mean_rows_a_micro": mr["a"],
        "mean_rows_b_micro": mr["b"],
        "lift_rows_micro": mr["a"] - mr["b"],
        "mean_buckets_a_micro": mb["a"],
        "mean_buckets_b_micro": mb["b"],
        "lift_buckets_micro": mb["a"] - mb["b"],
    }


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(360_000, 360_000 + 50 * 3600),  # epoch seconds
            st.sampled_from([-2.0, 0.0, 0.5, 1.0, 3.25, 10.0]),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_switchback_matches_bigint_reference(spark, rows):
    from flink_example_spark.operators.ml import ab_switchback

    df = spark.createDataFrame(
        [
            (
                datetime.fromtimestamp(s, tz=timezone.utc).replace(
                    tzinfo=None
                ),
                v,
            )
            for s, v in rows
        ],
        "ts timestamp, value double",
    )
    got = {r["feature"]: r["value"] for r in ab_switchback(df).collect()}
    assert got == _ref_switchback(rows)


def _ref_cluster(rows):
    per: dict = {}
    for k, val in rows:
        ym = int((val * 1000 + 0.5) // 1)
        st_ = per.setdefault(k, [0, 0, 0])
        st_[0] += 1
        st_[1] += ym
        st_[2] += ym * ym
    agg = {t: dict(nc=0, nr=0, sr=0, sr2=0, svm=0, svm2=0) for t in "ab"}
    for k, (n, s, s2) in per.items():
        t = "a" if k % 2 == 0 else "b"
        vm = _sm(s, n)
        agg[t]["nc"] += 1
        agg[t]["nr"] += n
        agg[t]["sr"] += s
        agg[t]["sr2"] += s2
        agg[t]["svm"] += vm
        agg[t]["svm2"] += vm * vm
    cm, rm, vc, vr = {}, {}, {}, {}
    for t in "ab":
        a = agg[t]
        cm[t] = _sm(a["svm"], a["nc"]) if a["nc"] else 0
        rm[t] = _sm(a["sr"], a["nr"]) if a["nr"] else 0
        vc[t] = (
            max(a["svm2"] // a["nc"] - cm[t] * cm[t], 0) if a["nc"] else 0
        )
        vr[t] = (
            max(a["sr2"] // a["nr"] - rm[t] * rm[t], 0) if a["nr"] else 0
        )
    lift_c = cm["a"] - cm["b"]
    lift_r = rm["a"] - rm["b"]
    se2_c = (vc["a"] // agg["a"]["nc"] if agg["a"]["nc"] else 0) + (
        vc["b"] // agg["b"]["nc"] if agg["b"]["nc"] else 0
    )
    se2_r = (vr["a"] // agg["a"]["nr"] if agg["a"]["nr"] else 0) + (
        vr["b"] // agg["b"]["nr"] if agg["b"]["nr"] else 0
    )
    return {
        "n_clusters_a": agg["a"]["nc"],
        "n_clusters_b": agg["b"]["nc"],
        "n_rows_a": agg["a"]["nr"],
        "n_rows_b": agg["b"]["nr"],
        # generator keys are 0-9 (non-negative, non-null): nothing drops
        "__n_rows_dropped": 0,
        "lift_cluster_milli": lift_c,
        "lift_naive_milli": lift_r,
        "se2_cluster_milli2": se2_c,
        "se2_naive_milli2": se2_r,
        "sig_cluster": int(lift_c * lift_c * 1_000_000 > 3_841_459 * se2_c),
        "sig_naive": int(lift_r * lift_r * 1_000_000 > 3_841_459 * se2_r),
    }


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9),  # cluster key
            st.sampled_from([-5.0, 0.0, 0.25, 1.0, 7.5, 100.0]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cluster_lift_matches_bigint_reference(spark, rows):
    from flink_example_spark.operators.ml import ab_cluster_lift

    df = spark.createDataFrame(rows, "user_id long, value double")
    got = {r["feature"]: r["value"] for r in ab_cluster_lift(df).collect()}
    assert got == _ref_cluster(rows)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),  # x
            st.integers(0, 2),  # a
            st.sampled_from([1_000, 10_000, 250_000, 900_000]),
            st.integers(0, 2),  # a_target
            st.integers(0, 5),  # reward
        ),
        min_size=1,
        max_size=40,
    )
)
def test_sndr_correction_is_bounded_weighted_mean(spark, rows):
    """The self-normalization invariant: the SNDR correction is a
    weighted mean of residuals, so it can never exceed the largest
    absolute residual (max reward x 1e6 here) — regardless of how
    extreme any single weight is; and v_sndr == v_dm whenever no row
    matches (zero weight mass)."""
    from flink_example_spark.operators.policy import sndr_value

    df = spark.createDataFrame(
        rows, "x long, a long, p_micro long, a_target long, reward long"
    )
    got = {r["feature"]: r["value"] for r in sndr_value(df).collect()}
    max_r = max(r for (_, _, _, _, r) in rows)
    assert abs(got["corr_sn_micro"]) <= max_r * 1_000_000
    assert (
        got["v_sndr_micro"] == got["v_dm_micro"] + got["corr_sn_micro"]
    )
    if got["__s_w_milli"] == 0:
        assert got["corr_sn_micro"] == 0
