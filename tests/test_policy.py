"""Off-policy evaluation family: estimator QUALITY (the round-10
lesson — parity alone would pin a wrong estimator in both engines) plus
DuckDB parity and the live-twin convergence."""

import duckdb
import pandas as pd
import pytest

from flink_example_spark.operators.policy import (
    dr_value,
    dr_value_oracle,
    ips_snips,
    ips_snips_oracle,
    synth_policy_logs,
    synth_policy_logs_sql,
)


def _logs_df(spark, rows):
    return spark.createDataFrame(
        rows, "x long, a long, p_micro long, a_target long, reward long"
    )


def _biased_rows(p0_micro=100_000, p1_micro=500_000):
    """Two equal-frequency contexts; the logging policy picks the
    target action with prob 0.1 in ctx 0 (reward 10) and 0.5 in ctx 1
    (reward 0). True V(pi) = (10 + 0) / 2 = 5 exactly."""
    rows = []
    rows += [(0, 1, p0_micro, 1, 10)] * 10      # ctx 0, matched
    rows += [(0, 0, 900_000, 1, 0)] * 90        # ctx 0, unmatched
    rows += [(1, 2, p1_micro, 2, 0)] * 50       # ctx 1, matched
    rows += [(1, 0, 500_000, 2, 3)] * 50        # ctx 1, unmatched
    return rows


def test_ips_snips_strip_logging_bias(spark):
    """The quality property: the naive matched-row mean is pulled to
    1.67 by the logging policy's context imbalance; IPS and SNIPS both
    land EXACTLY on the true value 5.0 (integer arithmetic, no floors
    hit on this fixture). DuckDB parity on the same rows."""
    rows = _biased_rows()
    got = {r["feature"]: r["value"] for r in ips_snips(_logs_df(spark, rows)).collect()}
    naive_micro = (10 * 10 + 50 * 0) * 1_000_000 // 60
    assert naive_micro == 1_666_666  # what a weight-free mean would say
    assert got["v_ips_micro"] == 5_000_000
    assert got["v_snips_micro"] == 5_000_000
    assert got["__n"] == 200 and got["__n_match"] == 60
    # weights 10x (p=0.1) and 2x (p=0.5): s_w = 10*10000 + 50*2000
    assert got["__s_w_milli"] == 200_000

    con = duckdb.connect()
    con.register(
        "plogs",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(
        con.execute(ips_snips_oracle("SELECT * FROM plogs")).fetchall()
    )
    assert got == {k: int(v) for k, v in ora.items()}


def test_dr_survives_corrupted_propensities(spark):
    """Double robustness: double every logged propensity (so IPS reads
    2.5 — half the truth); the per-context outcome model is exact on
    this deterministic-reward fixture, so DR still lands on 5.0. DuckDB
    parity on both estimators."""
    rows = _biased_rows(p0_micro=200_000, p1_micro=1_000_000)
    df = _logs_df(spark, rows)
    ips = {r["feature"]: r["value"] for r in ips_snips(df).collect()}
    assert ips["v_ips_micro"] == 2_500_000  # corrupted weights: biased
    dr = {r["feature"]: r["value"] for r in dr_value(df).collect()}
    assert dr["v_dr_micro"] == 5_000_000
    assert dr["v_dm_micro"] == 5_000_000
    assert dr["__n_fallback_ctx"] == 0

    con = duckdb.connect()
    con.register(
        "plogs2",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(con.execute(dr_value_oracle("SELECT * FROM plogs2")).fetchall())
    assert dr == {k: int(v) for k, v in ora.items()}


def test_dr_fallback_context_audited(spark):
    """A context with NO matched rows cannot fit a local model: it
    reads the global matched mean and the audit counts it."""
    rows = _biased_rows() + [(2, 0, 500_000, 1, 7)] * 20  # ctx 2: never matched
    dr = {r["feature"]: r["value"] for r in dr_value(_logs_df(spark, rows)).collect()}
    assert dr["__n_fallback_ctx"] == 1
    con = duckdb.connect()
    con.register(
        "plogs3",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(con.execute(dr_value_oracle("SELECT * FROM plogs3")).fetchall())
    assert dr == {k: int(v) for k, v in ora.items()}


def test_ess_floor_uniform_weights_recovers_n(spark):
    """Kish ESS sanity: with every matched weight equal the effective
    sample size IS the matched count (floored form exact here)."""
    rows = [(0, 1, 500_000, 1, 1)] * 37 + [(0, 0, 500_000, 1, 0)] * 13
    got = {r["feature"]: r["value"] for r in ips_snips(_logs_df(spark, rows)).collect()}
    assert got["ess_floor"] == 37 == got["__n_match"]
    # heavy weight imbalance collapses ESS far below n_match
    rows2 = [(0, 1, 10_000, 1, 1)] * 1 + [(1, 2, 900_000, 2, 1)] * 36
    got2 = {r["feature"]: r["value"] for r in ips_snips(_logs_df(spark, rows2)).collect()}
    assert got2["__n_match"] == 37 and got2["ess_floor"] < 10


def test_synth_logs_propensities_are_calibrated(spark):
    """The fixture generator's md5 inverse-CDF really samples the
    embedded table: per (x, a) cell, the observed frequency is within
    3% absolute of p_micro at sf0.01 (10k events, ~2.5k per context —
    3% is ~3.75 sigma), and the carried p_micro equals the table
    entry."""
    from flink_example_spark.operators.policy import _P_TABLE
    from flink_example_spark.tables import load_table

    logs = synth_policy_logs(
        load_table(spark, "/root/testdata/sf0.01", "events")
    )
    pdf = logs.toPandas()
    n_by_x = pdf.groupby("x").size()
    for (x, a), grp in pdf.groupby(["x", "a"]):
        assert set(grp["p_micro"]) == {_P_TABLE[x][a]}
        obs = len(grp) * 1_000_000 / n_by_x[x]
        assert abs(obs - _P_TABLE[x][a]) < 30_000, (x, a, obs)


@pytest.mark.slow
def test_streaming_ips_converges_to_batch(spark):
    """The live twin's five-sum state merged across micro-batches reads
    back the BIT-identical report."""
    from flink_example_spark.streaming.policy_stream import run_streaming_ips
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    batch = sorted(
        tuple(r)
        for r in ips_snips(
            synth_policy_logs(load_table(spark, sf, "events"))
        ).collect()
    )
    live = sorted(tuple(r) for r in run_streaming_ips(spark, sf).collect())
    assert live == batch


def test_ips_ci_width_and_degeneracy(spark):
    """CI sanity: the bounds bracket the point estimate symmetrically;
    4x the same data halves the SE (up to floors); a zero-variance log
    (every row matched, same weight and reward) reads SE exactly 0.
    DuckDB parity on the biased fixture."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.policy import ips_ci, ips_ci_oracle

    rows = _biased_rows()
    got = {r["feature"]: r["value"] for r in ips_ci(_logs_df(spark, rows)).collect()}
    assert got["v_ips_micro"] == 5_000_000
    assert got["ci_lo_micro"] == got["v_ips_micro"] - 2 * got["se_micro"]
    assert got["ci_hi_micro"] == got["v_ips_micro"] + 2 * got["se_micro"]
    assert got["se_micro"] > 0

    got4 = {
        r["feature"]: r["value"]
        for r in ips_ci(_logs_df(spark, rows * 4)).collect()
    }
    assert got4["v_ips_micro"] == 5_000_000
    assert abs(got4["se_micro"] * 2 - got["se_micro"]) <= 2000  # milli floor

    const = [(0, 1, 500_000, 1, 3)] * 40  # all matched, same y
    gc = {r["feature"]: r["value"] for r in ips_ci(_logs_df(spark, const)).collect()}
    assert gc["se_micro"] == 0 and gc["ci_lo_micro"] == gc["ci_hi_micro"]

    con = duckdb.connect()
    con.register(
        "plogs_ci",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(con.execute(ips_ci_oracle("SELECT * FROM plogs_ci")).fetchall())
    assert got == {k: int(v) for k, v in ora.items()}


def test_ips_by_context_total_row_and_losing_segment(spark):
    """The NULL-ctx rollup row carries the corpus totals (SNIPS equal to
    the global report), and the per-segment table exposes the losing
    context the overall number hides (ctx 0 pays off at 10, ctx 1 at
    0). DuckDB parity."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.policy import (
        ips_by_context,
        ips_by_context_oracle,
        ips_snips,
    )

    rows = _biased_rows()
    df = _logs_df(spark, rows)
    got = {
        (None if r["ctx"] is None else int(r["ctx"])): r
        for r in ips_by_context(df).collect()
    }
    glob = {r["feature"]: r["value"] for r in ips_snips(df).collect()}
    assert got[None]["v_snips_micro"] == glob["v_snips_micro"] == 5_000_000
    assert got[None]["n"] == 200 and got[None]["n_match"] == 60
    assert got[0]["v_snips_micro"] == 10_000_000  # the winning segment
    assert got[1]["v_snips_micro"] == 0           # the losing one

    con = duckdb.connect()
    con.register(
        "plogs_bc",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = sorted(
        (
            tuple(r)
            for r in con.execute(
                ips_by_context_oracle("SELECT * FROM plogs_bc")
            ).fetchall()
        ),
        key=lambda t: ((t[0] is not None, t[0] if t[0] is not None else 0),) + t[1:],
    )
    spk = sorted(
        (tuple(r) for r in ips_by_context(df).collect()),
        key=lambda t: ((t[0] is not None, t[0] if t[0] is not None else 0),) + t[1:],
    )
    assert spk == ora


def test_sndr_matches_dr_on_exact_model(spark):
    """With a deterministic-reward fixture the outcome model is exact,
    every matched residual is zero, and SNDR == DR == DM == truth even
    under 2x-corrupted propensities (double robustness carries over).
    DuckDB parity on the same rows."""
    from flink_example_spark.operators.policy import (
        sndr_value,
        sndr_value_oracle,
    )

    rows = _biased_rows(p0_micro=200_000, p1_micro=1_000_000)
    got = {
        r["feature"]: r["value"]
        for r in sndr_value(_logs_df(spark, rows)).collect()
    }
    assert got["v_sndr_micro"] == 5_000_000
    assert got["v_dm_micro"] == 5_000_000
    assert got["corr_sn_micro"] == 0
    assert got["__n_fallback_ctx"] == 0

    con = duckdb.connect()
    con.register(
        "slogs",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(
        con.execute(sndr_value_oracle("SELECT * FROM slogs")).fetchall()
    )
    assert got == {k: int(v) for k, v in ora.items()}


def test_sndr_bounded_under_weight_spike_where_dr_explodes(spark):
    """The self-normalization property: the SNDR correction is a
    WEIGHTED MEAN of residuals, so |corr| <= max|residual| and the
    estimate stays inside the reward range no matter how extreme one
    weight is; plain DR's correction divides by n and a single
    tiny-propensity row blows the estimate past the maximum possible
    reward. DuckDB parity."""
    from flink_example_spark.operators.policy import (
        dr_value,
        sndr_value,
        sndr_value_oracle,
    )

    # one context, imperfect model (mixed rewards among matched rows),
    # one huge-weight row (p = 0.001 -> w hits the 100x cap)
    rows = (
        [(0, 1, 900_000, 1, 0)] * 5
        + [(0, 1, 900_000, 1, 10)] * 5
        + [(0, 1, 1_000, 1, 10)] * 1
        + [(0, 0, 500_000, 1, 0)] * 9
    )
    df = _logs_df(spark, rows)
    dr = {r["feature"]: r["value"] for r in dr_value(df).collect()}
    sn = {r["feature"]: r["value"] for r in sndr_value(df).collect()}
    assert dr["v_dr_micro"] > 10_000_000  # past max reward: pathology
    assert 0 <= sn["v_sndr_micro"] <= 10_000_000
    # weighted-mean bound: |corr| <= max |residual|
    assert abs(sn["corr_sn_micro"]) <= 10_000_000 - sn["v_dm_micro"]

    con = duckdb.connect()
    con.register(
        "slogs2",
        pd.DataFrame(rows, columns=["x", "a", "p_micro", "a_target", "reward"]),
    )
    ora = dict(
        con.execute(sndr_value_oracle("SELECT * FROM slogs2")).fetchall()
    )
    assert sn == {k: int(v) for k, v in ora.items()}
