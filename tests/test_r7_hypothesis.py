"""Hypothesis property tests for the round-7 families: ACF vs the
integer reference fold, the CART stump vs brute-force argmin over every
cut, changepoint vs brute-force SSE search, and edit-distance entity
resolution vs a brute-force union-find closure (SURVEY.md §5 model —
few examples, each a full relation; Spark jobs are slow per example)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    xs=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False,
                  allow_infinity=False),
        min_size=4,
        max_size=24,
    )
)
def test_acf_matches_reference_fold(spark, xs):
    from flink_example_spark.operators.timeseries import acf

    from tests.test_timeseries import _brute_acf

    rows = [("k", BASE + timedelta(hours=i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    got = {
        r["lag"]: (r["n_pairs"], r["num"], r["den"])
        for r in acf(df, "g", "ts", "v", max_lag=2).collect()
    }
    want = _brute_acf(xs, 2)
    # zero-variance series yield den=0 (acf undefined) — counts/sums
    # still must match the fold exactly
    assert got == want


def _brute_stump(pairs, scale=100):
    """Exhaustive weighted-Gini argmin, mirroring the operator contract."""
    q = sorted({int(x * scale + 0.5) for x, _ in pairs})
    n = len(pairs)
    best = None
    for cut in q[:-1]:
        nl = sum(1 for x, _ in pairs if int(x * scale + 0.5) <= cut)
        pl = sum(y for x, y in pairs if int(x * scale + 0.5) <= cut)
        nr, pr = n - nl, sum(y for _, y in pairs) - pl
        num = nr * (nl * nl - pl * pl - (nl - pl) ** 2) + nl * (
            nr * nr - pr * pr - (nr - pr) ** 2
        )
        cost = num / (nl * nr)
        if best is None or (cost, cut) < best:
            best = (cost, cut)
    return best


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False,
                      allow_infinity=False),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=4,
        max_size=30,
    )
)
def test_decision_stump_matches_brute_argmin(spark, pairs):
    from pyspark.sql import functions as F

    from flink_example_spark.operators.ml import decision_stump

    if len({int(x * 100 + 0.5) for x, _ in pairs}) < 2:
        return  # a single distinct value admits no cut; operator emits none
    df = spark.createDataFrame(
        [(float(x), int(y)) for x, y in pairs], "x double, y int"
    )
    r = decision_stump(df, "x", F.col("y") == 1).first()
    cost, cut = _brute_stump(pairs)
    assert r["cut_q"] == cut
    assert abs(r["gini_cost"] - cost) < 1e-12


@settings(**_SETTINGS)
@given(
    xs=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False,
                  allow_infinity=False),
        min_size=3,
        max_size=20,
    )
)
def test_changepoint_matches_brute_sse(spark, xs):
    from flink_example_spark.operators.timeseries import changepoint

    rows = [("k", BASE + timedelta(minutes=i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = changepoint(df, "g", "ts", "v").first()
    q = [int(x * 100 + 0.5) for x in xs]
    n = len(q)
    best = None
    for t in range(1, n):
        l, rr = q[:t], q[t:]
        sse = (len(l) * sum(v * v for v in l) - sum(l) ** 2) / len(l) + (
            len(rr) * sum(v * v for v in rr) - sum(rr) ** 2
        ) / len(rr)
        key = (sse / 10_000.0, t)
        if best is None or key < best:
            best = key
    assert r["n_l"] == best[1]
    assert abs(r["sse_cost"] - best[0]) < 1e-9


def _brute_entities(ids, max_dist=1):
    """Union-find over brute-force levenshtein pairs of distinct names.
    ``ids``: dict name -> representative (minimum) record id."""
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    parent = {nm: nm for nm in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in itertools.combinations(sorted(ids), 2):
        if lev(a, b) <= max_dist:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    clusters: dict[str, list[str]] = {}
    for nm in ids:
        clusters.setdefault(find(nm), []).append(nm)
    return {
        min(ids[nm] for nm in members): sorted(members)
        for members in clusters.values()
    }


@settings(**_SETTINGS)
@given(
    names=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=5),
        min_size=1,
        max_size=8,
    )
)
def test_resolve_entities_matches_union_find(spark, names):
    from flink_example_spark.operators.entity import resolve_entities

    rows = [(i, nm) for i, nm in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        r["canonical_id"]: r["n_variants"]
        for r in resolve_entities(df, max_dist=1).collect()
    }
    # brute: first id per distinct name, then closure
    first_ids = {}
    for i, nm in rows:
        first_ids.setdefault(nm, i)
    want_clusters = _brute_entities(first_ids, max_dist=1)
    want = {cid: len(members) for cid, members in want_clusters.items()}
    assert got == want
