"""Hypothesis property tests for the round-11 families: the OPE
estimators vs a big-int Python reference, SRM's split-form chi2 vs
exact Fraction arithmetic, Copeland vs a brute-force tournament, and
the winsorized lift vs a direct Python winsorizer (SURVEY.md §5 model —
few examples, each a full relation; Spark jobs are slow per example)."""

from __future__ import annotations

import math
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

CAP = 100_000


def _ref_ope(rows):
    n = len(rows)
    ws = [
        min(1_000_000_000 // max(p, 1), CAP) if a == t else 0
        for (_, a, p, t, _r) in rows
    ]
    s_w = sum(ws)
    s_wr = sum(w * r for w, (_, _, _, _, r) in zip(ws, rows))
    s_w2 = sum(w * w for w in ws)
    n_match = sum(1 for (_, a, p, t, _r) in rows if a == t)
    return {
        "v_ips_micro": (s_wr * 1000) // n if n else 0,
        "v_snips_micro": (s_wr * 1_000_000) // s_w if s_w > 0 else 0,
        "ess_floor": s_w // max(s_w2 // s_w, 1) if s_w2 > 0 else 0,
        "match_rate_micro": (n_match * 1_000_000) // n if n else 0,
        "__n": n,
        "__n_match": n_match,
        "__s_w_milli": s_w,
    }


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),                      # x
            st.integers(0, 2),                      # a
            st.sampled_from([10_000, 100_000, 250_000, 500_000, 900_000]),
            st.integers(0, 2),                      # a_target
            st.integers(0, 5),                      # reward
        ),
        min_size=1,
        max_size=40,
    )
)
def test_ips_snips_matches_bigint_reference(spark, rows):
    from flink_example_spark.operators.policy import ips_snips

    df = spark.createDataFrame(
        [(i,) + r[1:] + (r[0],) for i, r in enumerate(rows)],
        "log_id long, a long, p_micro long, a_target long, reward long, x long",
    )
    got = {r["feature"]: r["value"] for r in ips_snips(df).collect()}
    assert got == _ref_ope([(0, a, p, t, r) for (_x, a, p, t, r) in rows])


@settings(**_SETTINGS)
@given(
    ks=st.lists(st.integers(-50, 50), min_size=1, max_size=60, unique=True)
)
def test_srm_chi2_matches_fraction_reference(spark, ks):
    """The split-form integer chi2 equals floor(exact chi2 * 1e6)
    computed in Fraction arithmetic — the split identity is lossless."""
    from flink_example_spark.operators.ml import srm_check

    df = spark.createDataFrame([(k,) for k in ks], "user_id long")
    got = {r["feature"]: r["value"] for r in srm_check(df).collect()}
    # Spark/DuckDB % TRUNCATES: a negative odd k gives -1, counted in
    # NEITHER arm — math.fmod mirrors trunc-mod exactly
    n_a = sum(1 for k in ks if int(math.fmod(k, 2)) == 0)
    n_b = sum(1 for k in ks if int(math.fmod(k, 2)) == 1)
    assert got["n_a"] == n_a and got["n_b"] == n_b
    n = n_a + n_b
    if n:
        exact = Fraction((n_a - n_b) ** 2, n) * 1_000_000
        assert got["chi2_micro"] == exact.numerator // exact.denominator
        assert got["srm_flag"] == (1 if got["chi2_micro"] > 3_841_459 else 0)


@settings(**_SETTINGS)
@given(
    ms=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=50,
    )
)
def test_copeland_matches_brute_tournament(spark, ms):
    from collections import defaultdict

    from flink_example_spark.operators.preference import copeland_scores

    df = spark.createDataFrame(ms, "winner long, loser long")
    got = {r["item"]: tuple(r)[1:] for r in copeland_scores(df).collect()}

    wins = defaultdict(int)
    pairs = set()
    for w, l in ms:
        wins[(min(w, l), max(w, l), 0 if w < l else 1)] += 1
        pairs.add((min(w, l), max(w, l)))
    ref = defaultdict(lambda: [0, 0, 0, 0])  # x2, opp, beaten, tied
    for i, j in pairs:
        wi, wj = wins[(i, j, 0)], wins[(i, j, 1)]
        for item, mine, theirs in ((i, wi, wj), (j, wj, wi)):
            pts = 2 if mine > theirs else (1 if mine == theirs else 0)
            ref[item][0] += pts
            ref[item][1] += 1
            ref[item][2] += pts == 2
            ref[item][3] += pts == 1
    assert got == {k: tuple(v) for k, v in ref.items()}


@settings(**_SETTINGS)
@given(
    ys=st.lists(st.integers(0, 30), min_size=1, max_size=40),
)
def test_winsorized_lift_matches_python_winsorizer(spark, ys):
    from flink_example_spark.operators.ml import ab_winsorized_lift

    rows = []
    for i, y in enumerate(ys):
        rows += [(i, "purchase")] * y + [(i, "view")]  # view keeps y=0 units
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["feature"]: r["value"] for r in ab_winsorized_lift(df).collect()}

    n = len(ys)
    ordered = sorted(ys)
    rank = (99 * n + 99) // 100  # ceil(.99 n)
    thr = ordered[rank - 1]
    wy = [min(y, thr) for y in ys]
    n_a = sum(1 for i in range(n) if i % 2 == 0)
    n_b = n - n_a
    s_a = sum(w for i, w in enumerate(wy) if i % 2 == 0)
    s_b = sum(w for i, w in enumerate(wy) if i % 2 == 1)
    assert got["thr"] == thr
    assert got["n_a"] == n_a and got["n_b"] == n_b
    ma = (s_a * 1_000_000) // n_a if n_a else 0
    mb = (s_b * 1_000_000) // n_b if n_b else 0
    assert got["wmean_a_micro"] == ma and got["wmean_b_micro"] == mb
    assert got["lift_micro"] == ma - mb


@settings(**_SETTINGS)
@given(
    cells=st.lists(
        st.tuples(
            st.integers(0, 1),   # g (unit parity -> arm)
            st.integers(0, 1),   # p (pre/post day)
            st.integers(0, 1),   # outcome event?
        ),
        min_size=1,
        max_size=60,
    )
)
def test_did_matches_fraction_reference(spark, cells):
    from collections import Counter
    from datetime import datetime

    from flink_example_spark.operators.ml import did_estimate

    pre, post = datetime(2024, 1, 10), datetime(2024, 1, 20)
    rows = [
        (g, post if p else pre, "purchase" if y else "view")
        for g, p, y in cells
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = dict(
        (r["feature"], r["value"])
        for r in did_estimate(df, "2024-01-15 00:00:00").collect()
    )
    n = Counter((g, p) for g, p, _ in cells)
    s = Counter((g, p) for g, p, y in cells if y)

    def mean(g, p):
        return (s[(g, p)] * 1_000_000) // n[(g, p)] if n[(g, p)] else 0

    assert got["m_t_pre_micro"] == mean(1, 0)
    assert got["m_t_post_micro"] == mean(1, 1)
    assert got["m_c_pre_micro"] == mean(0, 0)
    assert got["m_c_post_micro"] == mean(0, 1)
    assert got["did_micro"] == (mean(1, 1) - mean(1, 0)) - (
        mean(0, 1) - mean(0, 0)
    )
    assert got["__n_t_post"] == n[(1, 1)] and got["__n_c_pre"] == n[(0, 0)]


@settings(**_SETTINGS)
@given(
    units=st.lists(
        st.tuples(
            st.integers(0, 9),                     # exposure day (0 = never)
            st.lists(st.integers(1, 9), max_size=4),  # purchase days
        ),
        min_size=1,
        max_size=25,
    )
)
def test_exposure_lift_matches_python_reference(spark, units):
    from datetime import datetime

    from flink_example_spark.operators.ml import ab_exposure_lift

    rows = []
    for i, (expo_day, buys) in enumerate(units):
        if expo_day > 0:
            rows.append((i, datetime(2024, 1, expo_day), "click"))
        for d in buys:
            rows.append((i, datetime(2024, 1, d), "purchase"))
        rows.append((i, datetime(2024, 1, 1), "view"))  # every unit exists
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    got = dict(
        (r["feature"], r["value"]) for r in ab_exposure_lift(df).collect()
    )
    n_units = len(units)
    exposed = {
        i: e for i, (e, _) in enumerate(units) if e > 0
    }
    y = {
        i: sum(1 for d in units[i][1] if d >= exposed[i]) for i in exposed
    }
    n_a = sum(1 for i in exposed if i % 2 == 0)
    n_b = len(exposed) - n_a
    s_a = sum(v for i, v in y.items() if i % 2 == 0)
    s_b = sum(v for i, v in y.items() if i % 2 == 1)
    assert got["n_units"] == n_units
    assert got["n_exposed_a"] == n_a and got["n_exposed_b"] == n_b
    assert got["exposure_rate_micro"] == (
        (len(exposed) * 1_000_000) // n_units
    )
    ma = (s_a * 1_000_000) // n_a if n_a else 0
    mb = (s_b * 1_000_000) // n_b if n_b else 0
    assert got["post_mean_a_micro"] == ma
    assert got["post_mean_b_micro"] == mb
    assert got["lift_micro"] == ma - mb


@settings(**_SETTINGS)
@given(
    ys=st.lists(st.integers(0, 12), min_size=2, max_size=30),
)
def test_qte_matches_python_order_statistics(spark, ys):
    from flink_example_spark.operators.ml import causal_qte

    rows = []
    for i, y in enumerate(ys):
        rows += [(i, "purchase")] * y + [(i, "view")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = dict((r["feature"], r["value"]) for r in causal_qte(df).collect())

    def q(vals, p):
        if not vals:
            return 0
        srt = sorted(vals)
        rank = (p * len(vals) + 99) // 100
        return srt[max(rank, 1) - 1]

    arm_a = [y for i, y in enumerate(ys) if i % 2 == 0]
    arm_b = [y for i, y in enumerate(ys) if i % 2 == 1]
    assert got["n_a"] == len(arm_a) and got["n_b"] == len(arm_b)
    for p in (50, 90):
        assert got[f"q{p}_a"] == q(arm_a, p)
        assert got[f"q{p}_b"] == q(arm_b, p)
        assert got[f"qte{p}"] == q(arm_b, p) - q(arm_a, p)
