"""Preference-data operators: Bradley-Terry strength fit + Fleiss kappa."""

import duckdb
import pandas as pd

from flink_example_spark.operators.preference import (
    MICRO6,
    bradley_terry,
    bradley_terry_oracle,
    fleiss_kappa,
    fleiss_kappa_oracle,
    synth_matches,
    synth_matches_sql,
)


def _bt_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bradley_terry_recovers_planted_ramp(spark):
    """synth_matches plants a linear strength ramp over 8 items; the
    fitted strengths must be strictly increasing in item id and the top
    item rescales to exactly 1e6."""
    import os

    from flink_example_spark.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    m = synth_matches(load_table(spark, sf_dir, "events"), n_items=8)
    got = {r["item"]: r["strength_micro"] for r in bradley_terry(m).collect()}
    assert len(got) == 8
    assert max(got.values()) == MICRO6
    order = [got[i] for i in range(8)]
    assert order == sorted(order) and len(set(order)) == 8


def test_bradley_terry_matches_duckdb_oracle(spark):
    import os

    from flink_example_spark.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    got = _bt_rows(
        bradley_terry(
            synth_matches(load_table(spark, sf_dir, "events"), n_items=8)
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    ora = sorted(
        tuple(r)
        for r in con.execute(
            bradley_terry_oracle(synth_matches_sql(8))
        ).fetchall()
    )
    assert got == ora


def test_bradley_terry_label_equivariance(spark):
    """The fit depends only on the match multiset structure: shifting
    every item id by a constant shifts the output keys and nothing
    else (least/greatest canonicalization is label-order-dependent but
    the pair sums are symmetric)."""
    rows = [(a, b) for a in range(4) for b in range(4) if a != b
            for _ in range(2 + a)]
    m1 = spark.createDataFrame(rows, "winner long, loser long")
    m2 = spark.createDataFrame(
        [(a + 7, b + 7) for a, b in rows], "winner long, loser long"
    )
    r1 = {r["item"]: (r["strength_micro"], r["wins"], r["n_matches"])
          for r in bradley_terry(m1, n_iter=5).collect()}
    r2 = {r["item"] - 7: (r["strength_micro"], r["wins"], r["n_matches"])
          for r in bradley_terry(m2, n_iter=5).collect()}
    assert r1 == r2


def test_bradley_terry_shutout_and_empty(spark):
    """An item that never wins goes to exactly 0; the always-winner
    rescales to exactly 1e6. Empty input yields an empty relation, not
    a division error."""
    m = spark.createDataFrame([(1, 0)] * 5, "winner long, loser long")
    got = {r["item"]: r["strength_micro"] for r in bradley_terry(m).collect()}
    assert got == {0: 0, 1: MICRO6}
    empty = spark.createDataFrame([], "winner long, loser long")
    assert bradley_terry(empty).count() == 0


def test_fleiss_kappa_perfect_and_degenerate(spark):
    """Unanimous raters on a 2-category corpus give kappa == exactly
    1e6; a single-category corpus (chance agreement == observed) gives
    exactly 0 via the den guard."""
    rows = [(i, "yes" if i % 2 else "no", k) for i in range(10)
            for k in range(4)]
    fk = {r["feature"]: r["value"]
          for r in fleiss_kappa(
              spark.createDataFrame(rows, "item long, cat string, seq long"),
              n_raters=4,
          ).collect()}
    assert fk["kappa_micro"] == MICRO6
    assert fk["p_bar_micro"] == MICRO6
    assert fk["__n_items"] == 10 and fk["__n_dropped_items"] == 0
    mono = [(i, "same", k) for i in range(6) for k in range(4)]
    fk2 = {r["feature"]: r["value"]
           for r in fleiss_kappa(
               spark.createDataFrame(mono, "item long, cat string, seq long"),
               n_raters=4,
           ).collect()}
    assert fk2["kappa_micro"] == 0 and fk2["p_e_micro"] == MICRO6


def test_fleiss_kappa_matches_duckdb_oracle_hostile(spark):
    """Parity on a hostile mix: items below the rater quorum (dropped),
    surplus annotations (first-4 kept by seq), and category ties at the
    keep boundary (seq ties break by cat, both engines)."""
    rows = []
    for i in range(30):
        n_ann = 2 + (i % 5)  # 2..6 annotations; <4 drops the item
        for k in range(n_ann):
            cat = ["view", "click", "purchase"][(i * 7 + k * k) % 3]
            # planted seq ties: every annotation pair shares seq buckets
            rows.append((i, cat, k // 2))
    df = spark.createDataFrame(rows, "item long, cat string, seq long")
    got = sorted(tuple(r) for r in fleiss_kappa(df, n_raters=4).collect())
    con = duckdb.connect()
    con.register("ann", pd.DataFrame(rows, columns=["item", "cat", "seq"]))
    ora = sorted(
        tuple(r)
        for r in con.execute(
            fleiss_kappa_oracle("SELECT * FROM ann", n_raters=4)
        ).fetchall()
    )
    assert got == ora
    d = dict(got)
    assert d["__n_dropped_items"] == sum(1 for i in range(30) if 2 + (i % 5) < 4)


def test_transitivity_audit_planted_cycle_and_ties(spark):
    """Rock-paper-scissors plus a consistent fourth item: exactly one
    circular triad among the four decided triples; a perfectly tied
    pair is excluded from the tournament (and from triads through it)."""
    from flink_example_spark.operators.preference import (
        transitivity_audit,
        transitivity_audit_oracle,
    )

    rows = []
    rows += [(0, 1)] * 3 + [(1, 0)]       # 0 beats 1
    rows += [(1, 2)] * 3 + [(2, 1)]       # 1 beats 2
    rows += [(2, 0)] * 3 + [(0, 2)]       # 2 beats 0  -> cycle 0>1>2>0
    for x in (0, 1, 2):
        rows += [(x, 3)] * 2              # 3 loses to everyone
    rows += [(3, 4), (4, 3)]              # tied pair: undecided
    df = spark.createDataFrame(rows, "winner long, loser long")
    got = {r["feature"]: r["value"]
           for r in transitivity_audit(df).collect()}
    assert got == {
        "n_items": 5,
        "n_pairs_decided": 6,
        "n_ties": 1,
        "n_triads_decided": 4,   # {0,1,2},{0,1,3},{0,2,3},{1,2,3}
        "n_circular": 1,
    }
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("mt", pd.DataFrame(rows, columns=["winner", "loser"]))
    ora = dict(con.execute(
        transitivity_audit_oracle("SELECT * FROM mt")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_dpo_pairs_extremes_ties_and_margin(spark):
    """Best-vs-worst per prompt with deterministic tie-breaks: ties at
    the max break to the SMALLEST completion id (complement pad), a
    prompt whose candidates all tie yields NO pair (strict margin), and
    singletons are dropped. Parity with the DuckDB twin."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.preference import (
        dpo_pairs,
        dpo_pairs_oracle,
    )

    rows = [
        # prompt 0: clear winner 12 (score 9), loser 10 (score 1)
        (0, 10, 1), (0, 11, 5), (0, 12, 9),
        # prompt 1: max tie (score 7 on ids 21, 22 -> chosen 21),
        # min tie (score 2 on ids 23, 24 -> rejected 23)
        (1, 22, 7), (1, 21, 7), (1, 24, 2), (1, 23, 2),
        # prompt 2: all tied -> no pair
        (2, 30, 4), (2, 31, 4),
        # prompt 3: singleton -> no pair
        (3, 40, 8),
    ]
    df = spark.createDataFrame(rows, "prompt_id long, completion_id long, score long")
    got = sorted(tuple(r) for r in dpo_pairs(df).collect())
    assert got == [(0, 12, 10, 8, 3), (1, 21, 23, 5, 4)]
    con = duckdb.connect()
    con.register("sc", pd.DataFrame(rows, columns=["prompt", "c", "sc"]))
    ora = sorted(tuple(r) for r in con.execute(
        dpo_pairs_oracle("SELECT * FROM sc")).fetchall())
    assert got == ora


def test_bt_fit_audit_residuals_sum_and_shutout(spark):
    """Residual structure: on a two-item corpus the fit saturates to the
    observed win rate's direction (shutout -> expected == n, residual
    0-ish at the quantization floor); on rock-paper-scissors the
    STRENGTHS tie so every pair's expected wins are n/2 and residuals
    expose the cycle the scale cannot represent."""
    from flink_example_spark.operators.preference import bt_fit_audit

    rps = []
    rps += [(0, 1)] * 4 + [(1, 2)] * 4 + [(2, 0)] * 4
    df = spark.createDataFrame(rps, "winner long, loser long")
    rows = {(r["i"], r["j"]): r for r in bt_fit_audit(df).collect()}
    assert set(rows) == {(0, 1), (1, 2), (0, 2)}
    for (i, j), r in rows.items():
        # symmetric cycle -> equal strengths -> expected = n/2 exactly
        assert r["expected_wins_i_micro"] == r["n"] * 500_000
    # (0,1): 0 won all 4 -> residual +2e6; (0,2): 0 lost all -> -2e6
    assert rows[(0, 1)]["residual_micro"] == 2_000_000
    assert rows[(0, 2)]["residual_micro"] == -2_000_000


def test_kripp_alpha_rational_reference_and_corners(spark):
    """alpha matches an exact Fraction-arithmetic reference to the
    quantization digit on a varying-rater corpus (singletons excluded,
    counted); perfect agreement gives exactly 1e6; an all-one-category
    corpus has D_e = 0 and reports 0 through the guard. DuckDB parity
    throughout."""
    from fractions import Fraction
    from collections import Counter, defaultdict

    from flink_example_spark.operators.preference import (
        kripp_alpha,
        kripp_alpha_oracle,
    )

    rows = []
    for i in range(40):
        for k in range(1 + (i % 4)):  # 1..4 raters; ni=1 items dropped
            rows.append((i, ["a", "b", "c"][(i + k * k) % 3]))
    df = spark.createDataFrame(rows, "item long, cat string")
    got = dict(
        (r["feature"], r["value"]) for r in kripp_alpha(df).collect()
    )
    per = defaultdict(Counter)
    for i, c in rows:
        per[i][c] += 1
    Do, n, nc = Fraction(0), 0, Counter()
    for cnt in per.values():
        ni = sum(cnt.values())
        if ni < 2:
            continue
        n += ni
        for c, v in cnt.items():
            nc[c] += v
        Do += Fraction(ni * ni - sum(v * v for v in cnt.values()), ni - 1)
    De = Fraction(n * n - sum(v * v for v in nc.values()), n - 1)
    ref = float(1 - Do / De)
    assert abs(got["alpha_micro"] / 1e6 - ref) < 2e-5
    assert got["__n_singleton_items"] == 10 and got["__n_ratings"] == n

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("ann2", pd.DataFrame(rows, columns=["item", "cat"]))
    ora = sorted(
        (f, int(v))
        for f, v in con.execute(
            kripp_alpha_oracle("SELECT * FROM ann2")
        ).fetchall()
    )
    assert sorted(got.items()) == ora

    perfect = [(i, "y" if i % 2 else "n") for i in range(8) for _ in range(3)]
    gp = dict(
        (r["feature"], r["value"])
        for r in kripp_alpha(
            spark.createDataFrame(perfect, "item long, cat string")
        ).collect()
    )
    assert gp["alpha_micro"] == 1_000_000 and gp["d_o_micro"] == 0
    mono = [(i, "same") for i in range(6) for _ in range(3)]
    gm = dict(
        (r["feature"], r["value"])
        for r in kripp_alpha(
            spark.createDataFrame(mono, "item long, cat string")
        ).collect()
    )
    assert gm["alpha_micro"] == 0 and gm["d_e_micro"] == 0


def test_kripp_interval_reference_shift_invariance_and_ordering(spark):
    """Interval alpha matches exact Fraction arithmetic; shifting every
    rating by a constant leaves every output row EXACTLY unchanged
    (n S2 - S1^2 is algebraically shift-invariant); and a one-step
    disagreement corpus scores strictly higher than a four-step one
    (the whole point of the interval metric over the nominal one)."""
    from collections import defaultdict
    from fractions import Fraction

    from flink_example_spark.operators.preference import (
        kripp_alpha_interval,
        kripp_alpha_interval_oracle,
    )

    rows = []
    for i in range(30):
        base = i % 5
        for k in range(2 + (i % 3)):
            rows.append((i, base + (k % 2)))  # one-step jitter
    df = spark.createDataFrame(rows, "item long, val long")
    got = dict(
        (r["feature"], r["value"])
        for r in kripp_alpha_interval(df).collect()
    )
    per = defaultdict(list)
    for i, v in rows:
        per[i].append(v)
    Do, n, S1, S2 = Fraction(0), 0, 0, 0
    for vs in per.values():
        if len(vs) < 2:
            continue
        ni, s1, s2 = len(vs), sum(vs), sum(v * v for v in vs)
        n, S1, S2 = n + ni, S1 + s1, S2 + s2
        Do += Fraction(2 * (ni * s2 - s1 * s1), ni - 1)
    De = Fraction(2 * (n * S2 - S1 * S1), n - 1)
    ref = float(1 - Do / De)
    assert abs(got["alpha_micro"] / 1e6 - ref) < 2e-5

    shifted = spark.createDataFrame(
        [(i, v + 37) for i, v in rows], "item long, val long"
    )
    got_s = dict(
        (r["feature"], r["value"])
        for r in kripp_alpha_interval(shifted).collect()
    )
    assert got == got_s

    wide = spark.createDataFrame(
        [(i, (i % 5) + 4 * (k % 2)) for i in range(30)
         for k in range(2 + (i % 3))],
        "item long, val long",
    )
    got_w = dict(
        (r["feature"], r["value"])
        for r in kripp_alpha_interval(wide).collect()
    )
    assert got["alpha_micro"] > got_w["alpha_micro"]

    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("annv", pd.DataFrame(rows, columns=["item", "val"]))
    ora = sorted(
        (f, int(v))
        for f, v in con.execute(
            kripp_alpha_interval_oracle("SELECT * FROM annv")
        ).fetchall()
    )
    assert sorted(got.items()) == ora


def test_win_ci_exact_values_and_small_sample_humility(spark):
    """Hand-computed Wilson (z=2) cells: a perfect 96/96 scores LB
    exactly 960000 (rad = 1e6 -> sqrt 1000); 3/3 scores LB 3e6/7e3 =
    428571 — far BELOW the 96-win item even though both are 100%, which is
    the entire point of ranking by the lower bound. DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.preference import (
        win_ci,
        win_ci_oracle,
    )

    rows = [(1, 0)] * 96 + [(3, 2)] * 3
    df = spark.createDataFrame(rows, "winner long, loser long")
    got = {r["item"]: r for r in win_ci(df).collect()}
    r96, r3 = got[1], got[3]
    assert r96["win_rate_micro"] == r3["win_rate_micro"] == 1_000_000
    assert r96["wilson_lb_micro"] == 960_000      # ((98*1e3-2e3)*1e6)/(100e3)
    assert r3["wilson_lb_micro"] == 428_571       # ((5e3-2e3)*1e6)//(7e3)
    assert r96["wilson_lb_micro"] > r3["wilson_lb_micro"]
    for r in got.values():
        assert r["wilson_lb_micro"] <= r["win_rate_micro"] <= r["wilson_ub_micro"]

    con = duckdb.connect()
    con.register("m5", pd.DataFrame(rows, columns=["winner", "loser"]))
    ora = sorted(tuple(r) for r in con.execute(
        win_ci_oracle("SELECT * FROM m5")).fetchall())
    assert sorted(tuple(r) for r in win_ci(df).collect()) == ora


def test_dpo_pairs_negative_score_raises_both_engines(spark):
    """ADVICE-r10: the non-negative-score contract is ENFORCED, not
    docstring-only — a negative score would silently corrupt the
    zero-padded arg-extreme key identically in both engines (oracle
    parity could never catch it), so both sides raise loudly instead.
    Non-negative inputs are untouched (hash-preservation is covered by
    test_dpo_pairs_extremes_ties_and_margin)."""
    import duckdb
    import pandas as pd
    import pytest

    from flink_example_spark.operators.preference import (
        dpo_pairs,
        dpo_pairs_oracle,
    )

    rows = [(0, 10, 3), (0, 11, -1)]
    df = spark.createDataFrame(
        rows, "prompt_id long, completion_id long, score long"
    )
    with pytest.raises(Exception, match="negative score"):
        dpo_pairs(df).collect()
    con = duckdb.connect()
    con.register("scneg", pd.DataFrame(rows, columns=["prompt", "c", "sc"]))
    with pytest.raises(Exception, match="negative score"):
        con.execute(dpo_pairs_oracle("SELECT * FROM scneg")).fetchall()


def test_win_ci_past_old_overflow_bound(spark):
    """ADVICE-r10: the split radicand form ((a div n)*1e6 +
    ((a %% n)*1e6) div n) is exact-identical to (a*1e6) div n but keeps
    every intermediate below 2^63 up to ~6.0e9 matches per item. Fixture:
    ONE pair with 7e6 matches (3.5e6 wins each side) — the pre-fix form's
    product w*(n-w)*1e6 = 1.225e19 > 2^63 would raise under ANSI; the
    split form matches an exact big-int Python reference and DuckDB."""
    import duckdb
    import math

    from pyspark.sql import functions as F
    from flink_example_spark.operators.preference import (
        win_ci,
        win_ci_oracle,
    )

    n = 7_000_000
    matches = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(1)).otherwise(F.lit(2)).alias("winner"),
        F.when(F.col("id") % 2 == 0, F.lit(2)).otherwise(F.lit(1)).alias("loser"),
    )
    got = {r["item"]: r for r in win_ci(matches).collect()}
    assert set(got) == {1, 2}

    def ref(w, nm):
        a = w * (nm - w)
        assert a * 1_000_000 > 2**63  # the old form WOULD overflow here
        rad = (a // nm) * 1_000_000 + ((a % nm) * 1_000_000) // nm + 1_000_000
        assert rad == (a * 1_000_000) // nm + 1_000_000  # exact identity
        s = math.isqrt(rad)  # rad << 2^53 -> floor(sqrt(double)) == isqrt
        lb = (((w + 2) * 1000 - 2 * s) * 1_000_000) // ((nm + 4) * 1000)
        ub = (((w + 2) * 1000 + 2 * s) * 1_000_000) // ((nm + 4) * 1000)
        return (w * 1_000_000) // nm, lb, ub

    for item in (1, 2):
        r = got[item]
        wr, lb, ub = ref(r["wins"], r["n_matches"])
        assert r["n_matches"] == n
        assert (r["win_rate_micro"], r["wilson_lb_micro"], r["wilson_ub_micro"]) == (wr, lb, ub)

    con = duckdb.connect()
    ora = sorted(tuple(r) for r in con.execute(win_ci_oracle(
        "SELECT CASE WHEN i % 2 = 0 THEN 1 ELSE 2 END AS winner,"
        "       CASE WHEN i % 2 = 0 THEN 2 ELSE 1 END AS loser"
        f" FROM range({n}) t(i)")).fetchall())
    assert sorted(tuple(r) for r in win_ci(matches).collect()) == ora


def test_rater_quality_loo_strict_majority(spark):
    """LOO semantics pinned: on [A,A,B] NOBODY agrees (each A rater sees
    a 1-1 tie among the others; strict majority fails), on [A,A,A,B] the
    A raters agree (2 > 1) and the B rater doesn't; singleton items are
    excluded from scoring but counted in n_ratings. A systematically
    contrarian rater scores agree_micro 0. DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.preference import (
        rater_quality,
        rater_quality_oracle,
    )

    rows = [
        # item 1: A,A,B — zero agreements by strictness
        (1, 10, "A"), (1, 11, "A"), (1, 12, "B"),
        # item 2: A,A,A,B — raters 10,11,13 agree; 12 (B) doesn't
        (2, 10, "A"), (2, 11, "A"), (2, 13, "A"), (2, 12, "B"),
        # item 3: singleton — rater 10 unscored
        (3, 10, "A"),
        # item 4: both agree (2-0)
        (4, 11, "C"), (4, 13, "C"),
    ]
    df = spark.createDataFrame(rows, "item long, rater long, cat string")
    got = {r["rater"]: r for r in rater_quality(df).collect()}
    assert got[10]["n_ratings"] == 3 and got[10]["n_scored"] == 2
    assert got[10]["n_agree"] == 1  # item 2 only
    assert got[10]["agree_micro"] == 500_000
    assert got[12]["n_agree"] == 0 and got[12]["agree_micro"] == 0
    assert got[11]["n_agree"] == 2  # items 2 and 4
    assert got[13]["n_agree"] == 2
    assert got[11]["n_cats_used"] == 2

    con = duckdb.connect()
    con.register("ann_rq", pd.DataFrame(rows, columns=["item", "rater", "cat"]))
    ora = sorted(tuple(r) for r in con.execute(
        rater_quality_oracle("SELECT * FROM ann_rq")).fetchall())
    assert sorted(tuple(r) for r in rater_quality(df).collect()) == ora


def test_rater_quality_dedupes_repeat_ratings(spark):
    """A rater rating the same item twice counts ONCE (deterministic
    min(cat) kept), so nobody self-inflates consensus."""
    from flink_example_spark.operators.preference import rater_quality

    rows = [
        (1, 10, "B"), (1, 10, "A"),  # dedupes to A
        (1, 11, "A"),
    ]
    df = spark.createDataFrame(rows, "item long, rater long, cat string")
    got = {r["rater"]: r for r in rater_quality(df).collect()}
    # both hold A after dedupe: each sees the other agree (1 > 0)
    assert got[10]["n_ratings"] == 1 and got[10]["n_agree"] == 1
    assert got[11]["n_agree"] == 1


def test_copeland_cycle_and_ties(spark):
    """Rock-paper-scissors: every item beats one and loses one —
    copeland_x2 == 2 across the board (the cycle BT cannot express is
    perfectly representable here); a tied pair yields 1 point each.
    DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.preference import (
        copeland_scores,
        copeland_scores_oracle,
    )

    rows = [(0, 1)] * 3 + [(1, 2)] * 3 + [(2, 0)] * 3  # cycle
    rows += [(3, 4), (4, 3)]  # tied pair
    df = spark.createDataFrame(rows, "winner long, loser long")
    got = {r["item"]: r for r in copeland_scores(df).collect()}
    for i in (0, 1, 2):
        assert got[i]["copeland_x2"] == 2
        assert got[i]["n_beaten"] == 1 and got[i]["n_tied"] == 0
    assert got[3]["copeland_x2"] == 1 and got[3]["n_tied"] == 1
    assert got[4]["copeland_x2"] == 1

    con = duckdb.connect()
    con.register("mcp", pd.DataFrame(rows, columns=["winner", "loser"]))
    ora = sorted(tuple(r) for r in con.execute(
        copeland_scores_oracle("SELECT * FROM mcp")).fetchall())
    assert sorted(tuple(r) for r in copeland_scores(df).collect()) == ora
