"""Hypothesis property tests for the continuation-4 families: CUSUM vs
the sequential recurrence, PPJoin vs brute-force exact Jaccard, and
token entropy vs a pure-Python distribution fold (SURVEY.md §5 model —
few examples, each a full relation; Spark jobs are slow per example)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),       # key index
        st.floats(min_value=0.0, max_value=200.0,
                  allow_nan=False, allow_infinity=False),
    ),
    min_size=2,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(series=series_strategy)
def test_cusum_target_form_matches_sequential_fold(spark, series):
    from flink_example_spark.operators.timeseries import cusum_changepoints

    h, scale, target = 25.0, 1000, 80.0
    rows = [
        (f"k{ki}", BASE + timedelta(minutes=i), i, v)
        for i, (ki, v) in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, seq long, v double")
    got = {
        r["key"]: r
        for r in cusum_changepoints(
            df, "key", "ts", "v", "seq", h=h, scale=scale, target=target
        ).collect()
    }
    tq = int(target * scale + 0.5)
    by_key: dict[str, list] = {}
    for i, (ki, v) in enumerate(series):
        by_key.setdefault(f"k{ki}", []).append((i, int(v * scale + 0.5)))
    for key, seq in by_key.items():
        s, alarms, first, max_s = 0, 0, None, 0
        for i, vq in seq:
            s = max(0, s + vq - tq)
            max_s = max(max_s, s)
            if float(s) > h * scale:
                alarms += 1
                first = first if first is not None else i
        r = got[key]
        assert r["n"] == len(seq)
        assert r["n_alarms"] == alarms
        assert r["max_stat"] == max_s / scale
        if first is not None:
            assert r["first_alarm_ts"] == BASE + timedelta(minutes=first)
        else:
            assert r["first_alarm_ts"] is None


corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                         "zeta", "eta", "theta"]),
        min_size=1,
        max_size=6,
    ),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_ppjoin_equals_brute_force_on_random_corpora(spark, corpus):
    from flink_example_spark.operators.dedup import ppjoin_pairs

    tn, td = 1, 2  # threshold 0.5 — dense pair mass stresses the filter
    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"])
        for r in ppjoin_pairs(df, tn, td).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(corpus)}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if td * inter >= tn * union:
            want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpus_strategy)
def test_token_entropy_matches_python_fold(spark, corpus):
    from collections import Counter

    from flink_example_spark.operators.text import token_entropy

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    for i, toks in enumerate(corpus):
        c = Counter(toks)
        n = sum(c.values())
        bits = sum(tf * ((n // tf).bit_length() - 1) for tf in c.values())
        r = got[i]
        assert r["n_tokens"] == n
        assert r["n_distinct"] == len(c)
        assert r["avg_entropy_bits"] == bits / n
