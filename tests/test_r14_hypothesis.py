"""Round-14 adversarial-quality pins for the sketch family
(VERDICT-r13 task 6): estimator-level properties in the round-10 style
— the reference is the closed form / the theorem's statement, not a
reimplementation of the Spark plan. Three targets:

- dyadic selectivity bounds under ADVERSARIAL value distributions
  (all mass in one bucket; max-spread powers of two; random), with the
  probe range quantized round-half-up exactly as values are;
- the Misra-Gries certified read at the EXACT f = n/(k+1) boundary
  (strict >: a key at exactly n/(k+1) must be absent, one occurrence
  more must be present — on every partitioning);
- the rollup level floor: a week whose member days were bucketed
  coarsely must never report a finer level than its coarsest member
  day (fake precision), and its counts must equal the closed-form
  two-stage rollup exactly.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=10, deadline=None)


def _dyadic_ref(vals, k):
    """Closed form: exact counts at min{L : |{v >> L}| <= k}."""
    lvl = 0
    while len({v >> lvl for v in vals}) > k:
        lvl += 1
    return lvl, Counter(v >> lvl for v in vals)


# ---------------------------------------------------------------- selectivity

_POINT_MASS = st.lists(st.integers(500_000, 500_003), min_size=1, max_size=120)
_MAX_SPREAD = st.lists(
    st.sampled_from([1 << j for j in range(0, 41, 4)]), min_size=1, max_size=120
)
_RANDOM = st.lists(st.integers(0, 1 << 40), min_size=1, max_size=120)


@settings(**_SETTINGS)
@given(
    vq=st.one_of(_POINT_MASS, _MAX_SPREAD, _RANDOM),
    qlo=st.integers(0, 1 << 40),
    span=st.integers(1, 1 << 40),
)
def test_dyadic_selectivity_bounds_adversarial(spark, vq, qlo, span):
    """n_min <= true <= n_max for ANY value distribution and ANY probe
    range, truth taken w.r.t. the round-half-up-quantized [qlo, qhi);
    the full-domain probe resolves exactly (n_min == n_max == n)."""
    from flink_example_spark.operators.sketch import dyadic_selectivity

    qhi = qlo + span
    full_hi = max(vq) + 1
    rows = [(0, v / 1e6) for v in vq]
    df = spark.createDataFrame(rows, "g long, val double").repartition(5)
    ranges = ((qlo / 1e6, qhi / 1e6), (0.0, full_hi / 1e6))
    out = {
        r["feature"]: r["value"]
        for r in dyadic_selectivity(df, "g", "val", ranges, k=64).collect()
    }
    truth = sum(1 for v in vq if qlo <= v < qhi)
    assert out["r0_n_min"] <= truth <= out["r0_n_max"]
    assert out["r1_n_min"] == out["r1_n_max"] == len(vq)
    # point-mass adversary: when every value fits one bucket and the
    # probe contains it, the bounds collapse to exact
    lvl, buckets = _dyadic_ref(vq, 64)
    if len(buckets) == 1:
        (b,) = buckets
        if qlo <= (b << lvl) and ((b + 1) << lvl) - 1 < qhi:
            assert out["r0_n_min"] == out["r0_n_max"] == len(vq)


# ------------------------------------------------------------ MG boundary

@settings(**_SETTINGS)
@given(m=st.integers(2, 30), parts=st.sampled_from([1, 3, 7]))
def test_mg_certified_read_exact_boundary(spark, m, parts):
    """The certified read's threshold is STRICT: with k=8 and n = 9m,
    a key at exactly f = m = n/(k+1) is excluded, while f = m+1 is
    included — on every partitioning (merge order must not matter)."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.sketch import mg_heavy_hitters

    # n = 9m: A exactly m (boundary, must be absent), B m+1 (must be
    # present), six fillers at m and one at m-1 (all below or at the
    # boundary, absent)
    keys = (
        ["A"] * m
        + ["B"] * (m + 1)
        + [f"f{i}" for i in range(6) for _ in range(m)]
        + ["f6"] * (m - 1)
    )
    assert len(keys) == 9 * m
    df = (
        spark.createDataFrame([(x,) for x in keys], "key string")
        .withColumn("g", F.lit(0))
        .repartition(parts)
    )
    got = {
        r["hh_key"]: (r["exact_count"], r["n"])
        for r in mg_heavy_hitters(df, "g", "key", k=8).collect()
    }
    assert got == {"B": (m + 1, 9 * m)}


# ------------------------------------------------------- typed HLL identity

@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=200,
    ),
    parts=st.sampled_from([1, 4, 9]),
)
def test_hll_typed_equals_relation_any_multiset(spark, vals, parts):
    """The O(m)-byte HllTI buffer equals the register-relation form on
    ANY value multiset and ANY partitioning (register-wise max of a
    pure hash function is merge-order invariant) — estimate, reg_sum,
    n_registers all bit-identical, non-ASCII keys included."""
    from flink_example_spark.operators.sketch import (
        hll_distinct,
        hll_distinct_jvm,
    )

    df = spark.createDataFrame(
        [(v,) for v in vals], "val string"
    ).selectExpr("0 AS g", "val").repartition(parts)
    a = sorted(tuple(r) for r in hll_distinct(df, "g", "val", p=6).collect())
    b = sorted(
        tuple(r) for r in hll_distinct_jvm(df, "g", "val", p=6).collect()
    )
    assert a == b


# ------------------------------------------------------------ rollup floor

def _rollup_ref(day_vals, k):
    """Closed-form two-stage rollup: per-day dyadic sketch, level floor
    at the coarsest member day, then min fitting level over re-bucketed
    lower bounds — exact counts by the re-bucketing identity."""
    vlos = []
    lmin = 0
    for vs in day_vals:
        day_l, day_b = _dyadic_ref(vs, k)
        lmin = max(lmin, day_l)
        vlos += [(b << day_l, c) for b, c in day_b.items()]
    lvl = lmin
    while len({vlo >> lvl for vlo, _ in vlos}) > k:
        lvl += 1
    agg = Counter()
    for vlo, c in vlos:
        agg[vlo >> lvl] += c
    return lmin, lvl, agg


@settings(max_examples=6, deadline=None)
@given(
    coarse=st.lists(
        st.integers(0, 1 << 40), min_size=80, max_size=150, unique=True
    ),
    fine=st.lists(st.integers(1_000_000, 1_000_020), min_size=1, max_size=60),
)
def test_dyadic_rollup_level_floor_no_fake_precision(spark, coarse, fine):
    """One spread day (>k distinct values, so its sketch is genuinely
    coarse) + one clustered day (level 0) in the same week: the rollup
    level must be >= the coarse day's level (never finer than a member
    — fake precision), the counts must equal the closed-form two-stage
    rollup, and every percentile bound pair must contain the true order
    statistic. k=64 is the smallest registered sketch size."""
    from flink_example_spark.operators.sketch import dyadic_rollup

    k = 64
    day_vals = [coarse, fine]
    # 2024-01-01 is a Monday; both days land in the same ISO week
    rows = [("2024-01-01 06:00:00", v / 1e6) for v in coarse] + [
        ("2024-01-02 06:00:00", v / 1e6) for v in fine
    ]
    df = (
        spark.createDataFrame(rows, "ts string, value double")
        .selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
        .repartition(4)
    )
    out = {
        r["feature"]: r["value"]
        for r in dyadic_rollup(df, k=k, pcts=(50, 90)).collect()
    }
    lmin, lvl, agg = _rollup_ref(day_vals, k)
    assert out["level"] == lvl
    assert out["level"] >= lmin  # the floor: never finer than a member
    n = len(coarse) + len(fine)
    assert out["n"] == n
    assert out["n_buckets"] == len(agg)
    ordered = sorted(coarse + fine)
    for p in (50, 90):
        rank = (p * n + 99) // 100
        true_v = ordered[rank - 1]
        assert out[f"p{p}_lo"] <= true_v <= out[f"p{p}_hi"]
        # the bound pair is one bucket wide at the reported level
        assert out[f"p{p}_hi"] - out[f"p{p}_lo"] == (1 << lvl) - 1
