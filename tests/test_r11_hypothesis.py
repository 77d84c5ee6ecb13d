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
