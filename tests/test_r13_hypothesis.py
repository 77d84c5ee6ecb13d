"""Hypothesis properties for the round-13 families, against big-int
Python references (the repo's r7/r11/r12 pattern: the reference is the
closed form, not a reimplementation of the Spark plan)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=12, deadline=None)


def _dyadic_ref(vals, k):
    """Closed form: exact counts at min{L : |{v >> L}| <= k}."""
    lvl = 0
    while len({v >> lvl for v in vals}) > k:
        lvl += 1
    return lvl, Counter(v >> lvl for v in vals)


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=300),
    k=st.sampled_from([64, 256]),  # the registered sizes
)
def test_dyadic_hist_matches_closed_form_any_multiset(spark, vals, k):
    from pyspark.sql import functions as F

    from flink_example_spark.jvm import register_dyadic_hist

    fn = register_dyadic_hist(spark, k)
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(5)
    arr = df.groupBy().agg(F.expr(f"{fn}(v)").alias("a")).first()["a"]
    lvl, buckets = _dyadic_ref(vals, k)
    assert arr[0] == lvl
    assert dict(zip(arr[1::2], arr[2::2])) == dict(buckets)


@settings(**_SETTINGS)
@given(
    keys=st.lists(
        st.sampled_from([f"k{i}" for i in range(12)]),
        min_size=1,
        max_size=250,
    )
)
def test_mg_invariants_any_multiset(spark, keys):
    """est <= f, f - est <= n/(k+1), and every f > n/(k+1) key present —
    on an arbitrary multiset through the real multi-partition plan."""
    from pyspark.sql import functions as F

    from flink_example_spark.jvm import register_mg_topk

    k = 8
    fm = register_mg_topk(spark, k)
    exact = Counter(keys)
    n = len(keys)
    df = spark.createDataFrame([(x,) for x in keys], "k string").repartition(4)
    arr = df.groupBy().agg(F.expr(f"{fm}(k)").alias("a")).first()["a"]
    summary = dict(
        (e.rsplit("\t", 1)[0], int(e.rsplit("\t", 1)[1])) for e in arr
    )
    assert len(summary) <= k
    for key, est in summary.items():
        assert est <= exact[key]
        assert exact[key] - est <= n / (k + 1)
    for key, f in exact.items():
        if f * (k + 1) > n:
            assert key in summary


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(6)]),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_substring_spans_reference_parity(spark, docs):
    """substring_spans_dedup equals a direct Python reference of its
    contract (canonical = global min (doc, pos) per repeated gram;
    coverage = any flagged start within the k-window) on arbitrary
    small corpora — small vocab forces heavy cross-doc repetition."""
    from flink_example_spark.operators.dedup import substring_spans_dedup

    k = 3
    rows = [(i + 1, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["clean_text"],
            r["n_tokens_removed"],
            r["n_spans_removed"],
        )
        for r in substring_spans_dedup(df, k=k).collect()
    }

    # reference
    toks = {d: t.split(" ") for d, t in rows}
    occ: dict = {}
    for d, ws in toks.items():
        for p in range(len(ws) - k + 1):
            occ.setdefault(tuple(ws[p : p + k]), []).append((d, p + 1))
    flagged = set()
    for g, ps in occ.items():
        if len({d for d, _ in ps}) >= 2:
            canon = min(ps)
            flagged |= {o for o in ps if o != canon}
    want = {}
    for d, ws in toks.items():
        cov = [0] * (len(ws) + 1)
        for dd, p in flagged:
            if dd == d:
                for t in range(p, min(p + k, len(ws) + 1)):
                    cov[t] = 1
        clean = " ".join(w for t, w in enumerate(ws, 1) if not cov[t])
        removed = sum(cov)
        spans = sum(
            1
            for t in range(1, len(ws) + 1)
            if cov[t] and not cov[t - 1]
        )
        want[d] = (clean, removed, spans)
    assert got == want
