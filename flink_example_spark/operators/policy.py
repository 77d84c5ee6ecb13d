"""Off-policy evaluation (OPE) operators — counterfactual value
estimation over logged decision data, the RLHF-adjacent eval a
training-data pipeline runs before deploying a new policy: "what would
the new policy have earned on the traffic the old one logged?".

Estimators (Horvitz-Thompson lineage, bandit-feedback form):

- **IPS** (inverse propensity scoring): ``V = (1/n) sum_i 1[a_i =
  pi(x_i)] * r_i / p_i`` — unbiased under correct logged propensities,
  high variance at small ``p``.
- **SNIPS** (self-normalized IPS): the weighted mean ``sum(w r) /
  sum(w)`` — biased O(1/n), dramatically lower variance; the standard
  production default.
- **Kish effective sample size**: ``(sum w)^2 / sum w^2`` — the
  diagnostic that says how many "real" samples the weighted estimate
  rests on.
- **DR** (doubly robust): per-context outcome model ``q(x)`` plus the
  IPS-weighted residual correction — consistent if EITHER the model or
  the propensities are right (the off-policy analogue of
  ``ml.aipw_ate``).

Engine-portable integer discipline (DESIGN.md): clipped weights in
MILLI units (``w = least(1e9 div p_micro, cap)``), every accumulated
quantity an exact BIGINT monoid, one division at read time
(sign-and-magnitude where a numerator can go negative). The sums are
commutative monoids, so the live twin is ONE update-mode streaming
aggregation + the same read-time algebra (``ope_from_sums``).

Scale: one pass over the log relation; per-context model state is
context-sized (broadcast). Overflow bounds are documented per output
(default cap: ~9.2e8 matched rows — the ``sum w^2`` diagnostic is the
binding term now that the SNIPS read uses the two-stage split form
(:func:`_split_micro_div`; the bare ``(s_wr * 1e6) div s_w`` form
capped out ~20x earlier, at ~4.6e7 rows at reward 2) — and ~4.6e7
matched rows for the DR residual correction at max reward 2 (cap *
2e6 per row). Divide the weight cap or pre-scale rewards past those;
the ESTIMATES themselves are n-invariant ratios).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO6 = 1_000_000


def _split_micro_div(num: str, den: str, div: str = "div") -> str:
    """Exact ``(num * 1e6) div den`` for non-negative ``num`` and
    ``den > 0``, as a TWO-STAGE kilo split so no intermediate exceeds
    ``den * 1000`` (DESIGN.md split-form rule, extended one stage: the
    single split's remainder term ``rem * 1e6`` is still bounded only
    by ``den * 1e6``, which grows with n here since ``den = s_w``).
    Identity: with ``num = q*den + rem``, ``(num*1e6) div den =
    q*1e6 + ((rem*1e3) div den)*1e3 + (((rem*1e3) % den)*1e3) div den``
    — every term exact, so results (and parity hashes) are unchanged.
    Lifts the SNIPS read's envelope past the s_w2 monoid bound
    (~9.2e8 matched rows at the default cap), which is now binding.
    ``div`` is the engine's integer-division token (Spark ``div``,
    DuckDB ``//``)."""
    r1 = f"(({num}) % ({den}))"
    return (
        f"(({num}) {div} ({den})) * 1000000"
        f" + (({r1} * 1000) {div} ({den})) * 1000"
        f" + ((({r1} * 1000) % ({den})) * 1000) {div} ({den})"
    )

# logging-policy propensity table for the synthetic fixture:
# _P_TABLE[context][action] in micro units, each row sums to 1e6
_P_TABLE = (
    (500_000, 300_000, 200_000),
    (200_000, 500_000, 300_000),
    (300_000, 200_000, 500_000),
    (400_000, 350_000, 250_000),
)


def synth_policy_logs(events: DataFrame) -> DataFrame:
    """Deterministic logged-bandit fixture from the events table (the
    md5-bucket noise device, DESIGN.md — no RNG state): context ``x =
    abs(user_id) % 4``, logged action sampled from the embedded
    propensity table via inverse-CDF on the event's hash bucket,
    ``p_micro`` read back from the same table, target policy ``pi(x) =
    (x + 1) % 3``, reward = purchase->2 / click->1 / else 0.

    Output: ``(log_id, x, a, p_micro, a_target, reward)``.
    """
    c1 = {x: _P_TABLE[x][0] for x in range(4)}
    c2 = {x: _P_TABLE[x][0] + _P_TABLE[x][1] for x in range(4)}
    cut1 = "CASE " + " ".join(
        f"WHEN x = {x} THEN {c1[x]}" for x in range(4)
    ) + " END"
    cut2 = "CASE " + " ".join(
        f"WHEN x = {x} THEN {c2[x]}" for x in range(4)
    ) + " END"
    p_of = "CASE " + " ".join(
        f"WHEN x = {x} AND a = {a} THEN {_P_TABLE[x][a]}"
        for x in range(4)
        for a in range(3)
    ) + " END"
    return (
        events.select(
            F.col("event_id").cast("long").alias("log_id"),
            F.expr("abs(user_id) % 4").alias("x"),
            F.expr(
                "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 1000000"
            ).alias("h"),
            F.expr(
                "CASE WHEN event_type = 'purchase' THEN 2"
                " WHEN event_type = 'click' THEN 1 ELSE 0 END"
            ).alias("reward"),
        )
        .select(
            "log_id",
            "x",
            F.expr(
                f"CASE WHEN h < ({cut1}) THEN 0"
                f" WHEN h < ({cut2}) THEN 1 ELSE 2 END"
            ).alias("a"),
            "reward",
        )
        .select(
            "log_id",
            "x",
            "a",
            F.expr(p_of).cast("long").alias("p_micro"),
            F.expr("(x + 1) % 3").alias("a_target"),
            "reward",
        )
    )


def synth_policy_logs_sql() -> str:
    """DuckDB twin of :func:`synth_policy_logs` over the ``events`` view
    (identical md5 bucket, inverse-CDF cuts, table lookups)."""
    c1 = {x: _P_TABLE[x][0] for x in range(4)}
    c2 = {x: _P_TABLE[x][0] + _P_TABLE[x][1] for x in range(4)}
    cut1 = "CASE " + " ".join(
        f"WHEN x = {x} THEN {c1[x]}" for x in range(4)
    ) + " END"
    cut2 = "CASE " + " ".join(
        f"WHEN x = {x} THEN {c2[x]}" for x in range(4)
    ) + " END"
    p_of = "CASE " + " ".join(
        f"WHEN x = {x} AND a = {a} THEN {_P_TABLE[x][a]}"
        for x in range(4)
        for a in range(3)
    ) + " END"
    return f"""
        SELECT log_id, x, a,
               CAST({p_of} AS BIGINT) AS p_micro,
               (x + 1) % 3 AS a_target,
               reward
        FROM (
          SELECT log_id, x,
                 CASE WHEN h < ({cut1}) THEN 0
                      WHEN h < ({cut2}) THEN 1 ELSE 2 END AS a,
                 reward
          FROM (
            SELECT CAST(event_id AS BIGINT) AS log_id,
                   abs(user_id) % 4 AS x,
                   CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 1000000 AS h,
                   CASE WHEN event_type = 'purchase' THEN 2
                        WHEN event_type = 'click' THEN 1 ELSE 0 END AS reward
            FROM events
          )
        )
    """


def ips_sums(
    logs: DataFrame,
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """The OPE monoid: one hash aggregation producing the five exact
    BIGINT sums every estimator below reads. Weights are CLIPPED
    inverse propensities in milli units (``least(1e9 div p_micro,
    cap)`` — cap default 100x); non-matching rows contribute weight 0.
    Rewards must be non-negative integers (quantize upstream).

    Output (one row): ``(n, n_match, s_w, s_wr, s_w2)`` — commutative,
    so this IS the live-twin state shape (update-mode aggregation).

    Overflow: ``s_w2 <= n_match * cap^2`` — at the default cap,
    ~9.2e8 matched rows; ``s_wr <= n_match * cap * max_r``.
    """
    m = F.expr(f"CAST({a_col} = {target_col} AS BIGINT)")
    w = F.expr(
        f"CASE WHEN {a_col} = {target_col} THEN"
        f" least(1000000000 div greatest({p_col}, 1),"
        f" CAST({w_cap_milli} AS BIGINT)) ELSE 0 END"
    )
    r = F.col(r_col).cast("long")
    return logs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(m).cast("long").alias("n_match"),
        F.sum(w).cast("long").alias("s_w"),
        F.sum(w * r).cast("long").alias("s_wr"),
        F.sum(w * w).cast("long").alias("s_w2"),
    )


def ope_from_sums(sums: DataFrame) -> DataFrame:
    """Read-time algebra over the :func:`ips_sums` monoid — the shared
    core of the batch row and the live twin. Tall scalar output
    (driver-record rule): ``(feature, value)`` with

    - ``v_ips_micro``   = ``(s_wr * 1000) div n`` (w is milli)
    - ``v_snips_micro`` = exact ``(s_wr * 1e6) div s_w`` via the
      two-stage split form (:func:`_split_micro_div` — no intermediate
      exceeds ``s_w * 1000``, so the s_w2 monoid bound is binding)
    - ``ess_floor``     = ``s_w div (s_w2 div s_w)`` — the floored Kish
      ``(sum w)^2 / sum w^2`` computed divisions-first so no
      intermediate exceeds the sums themselves (the per-side-division
      rule; defined as this operator's contract in both engines)
    - ``match_rate_micro``, plus the raw ``n / n_match / s_w_milli``
      audit counters.
    """
    snips = _split_micro_div("s_wr", "s_w")
    return sums.selectExpr(
        "stack(7,"
        " 'v_ips_micro',   CASE WHEN n > 0 THEN (s_wr * 1000) div n"
        "                  ELSE 0 END,"
        f" 'v_snips_micro', CASE WHEN s_w > 0 THEN {snips} ELSE 0 END,"
        " 'ess_floor',     CASE WHEN s_w2 > 0 THEN"
        "                  s_w div greatest(s_w2 div s_w, 1)"
        "                  ELSE 0 END,"
        " 'match_rate_micro', CASE WHEN n > 0 THEN"
        "                  (n_match * 1000000) div n ELSE 0 END,"
        " '__n', n,"
        " '__n_match', n_match,"
        " '__s_w_milli', s_w"
        ") AS (feature, value)"
    ).select("feature", F.col("value").cast("long"))


def ips_snips(
    logs: DataFrame,
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """Clipped IPS + SNIPS + Kish-ESS off-policy value report over a
    logged decision relation — ONE map-side-combined aggregation, read
    algebra at the head (:func:`ope_from_sums`)."""
    return ope_from_sums(
        ips_sums(logs, p_col, r_col, a_col, target_col, w_cap_milli)
    )


def _ope_sums_sql(
    logs_sql: str, w_cap_milli: int = 100_000
) -> str:
    """The :func:`ips_sums` monoid in DuckDB SQL (identical clipping)."""
    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = a_target THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_match,
               CAST(COALESCE(SUM(w), 0) AS BIGINT) AS s_w,
               CAST(COALESCE(SUM(w * reward), 0) AS BIGINT) AS s_wr,
               CAST(COALESCE(SUM(w * w), 0) AS BIGINT) AS s_w2
        FROM (
          SELECT *,
                 CASE WHEN a = a_target THEN
                   least(1000000000 // greatest(p_micro, 1),
                         CAST({w_cap_milli} AS BIGINT))
                 ELSE 0 END AS w
          FROM ({logs_sql})
        )
    """


def ips_snips_oracle(
    logs_sql: str, w_cap_milli: int = 100_000
) -> str:
    """DuckDB twin of :func:`ips_snips` (identical monoid + read
    algebra). ``logs_sql`` must yield ``(x, a, p_micro, a_target,
    reward)``."""
    return f"""
        WITH sums AS MATERIALIZED ({_ope_sums_sql(logs_sql, w_cap_milli)})
        SELECT 'v_ips_micro' AS feature,
               CAST(CASE WHEN n > 0 THEN (s_wr * 1000) // n ELSE 0 END
                 AS BIGINT) AS value FROM sums
        UNION ALL SELECT 'v_snips_micro',
               CASE WHEN s_w > 0
                 THEN {_split_micro_div("s_wr", "s_w", "//")}
                 ELSE 0 END
               FROM sums
        UNION ALL SELECT 'ess_floor',
               CASE WHEN s_w2 > 0 THEN s_w // greatest(s_w2 // s_w, 1)
               ELSE 0 END FROM sums
        UNION ALL SELECT 'match_rate_micro',
               CASE WHEN n > 0 THEN (n_match * 1000000) // n ELSE 0 END
               FROM sums
        UNION ALL SELECT '__n', n FROM sums
        UNION ALL SELECT '__n_match', n_match FROM sums
        UNION ALL SELECT '__s_w_milli', s_w FROM sums
    """


def _ctx_outcome_model(logs: DataFrame, ctx_col: str, m, r) -> DataFrame:
    """The per-context direct-method outcome model shared by
    :func:`dr_value` and :func:`sndr_value`: ``q(x)`` = mean reward
    (micro) over the on-policy slice (rows where the logged action
    already equals the target), with contexts lacking any matched row
    falling back to the global matched mean (``is_fallback`` audits
    how many). Context-sized; lineage cut (multi-consumer rule)."""
    per_ctx = (
        logs.select(F.col(ctx_col).alias("__x"), m.alias("__m"), r.alias("__r"))
        .groupBy("__x")
        .agg(
            F.sum("__m").alias("nm"),
            F.sum(F.col("__m") * F.col("__r")).alias("sr"),
        )
        # context-sized; cut lineage — it feeds glob, q, AND the
        # fallback audit (the multi-consumer rule)
        .localCheckpoint(eager=True)
    )
    glob = per_ctx.agg(
        F.sum("nm").alias("g_nm"), F.sum("sr").alias("g_sr")
    )
    return per_ctx.crossJoin(F.broadcast(glob)).select(
        "__x",
        F.expr(
            "CASE WHEN nm > 0 THEN (sr * 1000000) div nm"
            " WHEN g_nm > 0 THEN (g_sr * 1000000) div g_nm"
            " ELSE 0 END"
        ).alias("q_micro"),
        F.expr("CAST(nm = 0 AS BIGINT)").alias("is_fallback"),
    )


def dr_value(
    logs: DataFrame,
    ctx_col: str = "x",
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """Doubly-robust off-policy value: per-context outcome model
    ``q(x)`` = mean reward (micro) over the rows where the LOGGED
    action already equals the target (the on-policy slice — the direct-
    method model), corrected by the clipped-IPS residual term::

        V_DR = (1/n) sum_i [ q(x_i) + w_i (r_i - q(x_i)) ]

    Consistent if EITHER the model or the propensities are right; the
    off-policy analogue of ``ml.aipw_ate``'s stratum device. Contexts
    with NO matched rows fall back to the global matched mean
    (``__n_fallback_ctx`` audits how many — same audit discipline as
    aipw).

    Integer discipline: ``q`` in micro via one non-negative div per
    context; the residual term is the exact product ``w_milli *
    (r*1e6 - q_micro)`` summed as BIGINT (can be negative — the final
    division is sign-and-magnitude per DESIGN.md). Overflow:
    ``|term| <= cap * max(r)*1e6`` per row — at the default cap and
    reward <= 2 that is 2e11 per row, so ~4.6e7 matched rows; lower
    the cap past that.

    Output (tall): ``v_dr_micro, v_dm_micro`` (direct method = model
    only), ``__n, __n_fallback_ctx``.

    Scale: one context-sized aggregation (broadcast back) + one scoring
    pass — two shuffles total, state context-sized.
    """
    m = F.expr(f"CAST({a_col} = {target_col} AS BIGINT)")
    w = F.expr(
        f"CASE WHEN {a_col} = {target_col} THEN"
        f" least(1000000000 div greatest({p_col}, 1),"
        f" CAST({w_cap_milli} AS BIGINT)) ELSE 0 END"
    )
    r = F.col(r_col).cast("long")
    q = _ctx_outcome_model(logs, ctx_col, m, r)
    scored = (
        logs.select(
            F.col(ctx_col).alias("__x"),
            w.alias("__w"),
            r.alias("__r"),
        )
        .join(F.broadcast(q.select("__x", "q_micro")), "__x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q_micro").cast("long").alias("s_q"),
            F.sum(
                F.col("__w") * (F.col("__r") * F.lit(MICRO6) - F.col("q_micro"))
            ).cast("long").alias("s_corr"),
        )
    )
    nf = q.agg(F.sum("is_fallback").cast("long").alias("n_fb"))
    return scored.crossJoin(F.broadcast(nf)).selectExpr(
        "stack(4,"
        " 'v_dr_micro', CASE WHEN n > 0 THEN"
        "   CASE WHEN s_q * 1000 + s_corr >= 0 THEN 1 ELSE -1 END"
        "   * (abs(s_q * 1000 + s_corr) div (n * 1000)) ELSE 0 END,"
        " 'v_dm_micro', CASE WHEN n > 0 THEN s_q div n ELSE 0 END,"
        " '__n', n,"
        " '__n_fallback_ctx', n_fb"
        ") AS (feature, value)"
    ).select("feature", F.col("value").cast("long"))


def dr_value_oracle(
    logs_sql: str, w_cap_milli: int = 100_000
) -> str:
    """DuckDB twin of :func:`dr_value` (identical q table, residual
    products, sign-and-magnitude final division)."""
    return f"""
        WITH logs AS MATERIALIZED (
          SELECT x, a, p_micro, a_target, CAST(reward AS BIGINT) AS r,
                 CASE WHEN a = a_target THEN
                   least(1000000000 // greatest(p_micro, 1),
                         CAST({w_cap_milli} AS BIGINT))
                 ELSE 0 END AS w
          FROM ({logs_sql})),
        per_ctx AS MATERIALIZED (
          SELECT x AS cx,
                 CAST(SUM(CASE WHEN a = a_target THEN 1 ELSE 0 END)
                   AS BIGINT) AS nm,
                 CAST(SUM(CASE WHEN a = a_target THEN r ELSE 0 END)
                   AS BIGINT) AS sr
          FROM logs GROUP BY 1),
        gtot AS MATERIALIZED (
          SELECT CAST(SUM(nm) AS BIGINT) AS g_nm,
                 CAST(SUM(sr) AS BIGINT) AS g_sr
          FROM per_ctx),
        q AS MATERIALIZED (
          SELECT cx,
                 CASE WHEN nm > 0 THEN (sr * 1000000) // nm
                      WHEN g_nm > 0 THEN (g_sr * 1000000) // g_nm
                      ELSE 0 END AS q_micro,
                 CASE WHEN nm = 0 THEN 1 ELSE 0 END AS is_fallback
          FROM per_ctx, gtot),
        scored AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(q_micro), 0) AS BIGINT) AS s_q,
                 CAST(COALESCE(SUM(w * (r * 1000000 - q_micro)), 0)
                   AS BIGINT) AS s_corr
          FROM logs JOIN q ON logs.x = q.cx),
        nf AS MATERIALIZED (
          SELECT CAST(COALESCE(SUM(is_fallback), 0) AS BIGINT) AS n_fb
          FROM q)
        SELECT 'v_dr_micro' AS feature,
               CAST(CASE WHEN n > 0 THEN
                 (CASE WHEN s_q * 1000 + s_corr >= 0 THEN 1 ELSE -1 END)
                 * (abs(s_q * 1000 + s_corr) // (n * 1000))
               ELSE 0 END AS BIGINT) AS value
        FROM scored
        UNION ALL SELECT 'v_dm_micro',
               CASE WHEN n > 0 THEN s_q // n ELSE 0 END FROM scored
        UNION ALL SELECT '__n', n FROM scored
        UNION ALL SELECT '__n_fallback_ctx', n_fb FROM scored, nf
    """


def sndr_value(
    logs: DataFrame,
    ctx_col: str = "x",
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """SELF-NORMALIZED doubly-robust off-policy value — :func:`dr_value`
    with the IPS residual correction normalized by the weight mass
    instead of n (the SNIPS idea applied to the DR correction)::

        V_SNDR = (1/n) sum_i q(x_i)  +  sum_i w_i (r_i - q(x_i))
                                        ---------------------------
                                              sum_i w_i

    Keeps DR's double robustness (consistent if EITHER the model or
    the propensities are right) while inheriting SNIPS's variance
    discipline: a handful of huge weights can no longer swing the
    correction term's scale, only its direction — the production
    default when logged propensities are noisy.

    Integer discipline: shares :func:`_ctx_outcome_model` with
    dr_value (identical q table + fallback audit); the correction sum
    is the same exact BIGINT ``w_milli * (r*1e6 - q_micro)`` products,
    divided once by ``s_w`` (milli / milli -> micro) in
    sign-and-magnitude form (the numerator can be negative). Overflow:
    same ~4.6e7-matched-rows bound as dr_value's correction at the
    default cap and reward <= 2.

    Output (tall): ``v_sndr_micro`` (= v_dm + corr), ``v_dm_micro``,
    ``corr_sn_micro``, ``__n``, ``__s_w_milli``, ``__n_fallback_ctx``.

    Scale: one context-sized aggregation (broadcast back) + one scoring
    pass — two shuffles total, state context-sized (dr_value's shape).
    """
    m = F.expr(f"CAST({a_col} = {target_col} AS BIGINT)")
    w = F.expr(
        f"CASE WHEN {a_col} = {target_col} THEN"
        f" least(1000000000 div greatest({p_col}, 1),"
        f" CAST({w_cap_milli} AS BIGINT)) ELSE 0 END"
    )
    r = F.col(r_col).cast("long")
    q = _ctx_outcome_model(logs, ctx_col, m, r)
    scored = (
        logs.select(
            F.col(ctx_col).alias("__x"),
            w.alias("__w"),
            r.alias("__r"),
        )
        .join(F.broadcast(q.select("__x", "q_micro")), "__x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("__w").cast("long").alias("s_w"),
            F.sum("q_micro").cast("long").alias("s_q"),
            F.sum(
                F.col("__w") * (F.col("__r") * F.lit(MICRO6) - F.col("q_micro"))
            ).cast("long").alias("s_corr"),
        )
    )
    nf = q.agg(F.sum("is_fallback").cast("long").alias("n_fb"))
    # s_q can be negative (negative rewards): sign-and-magnitude form for
    # belt-and-braces consistency with corr (value identical — the pinned
    # DuckDB integer // truncates toward zero like Spark div).
    dm = (
        "CASE WHEN n > 0 THEN"
        " (CASE WHEN s_q >= 0 THEN 1 ELSE -1 END)"
        " * (abs(s_q) div n) ELSE 0 END"
    )
    corr = (
        "CASE WHEN s_w > 0 THEN"
        " (CASE WHEN s_corr >= 0 THEN 1 ELSE -1 END)"
        " * (abs(s_corr) div s_w) ELSE 0 END"
    )
    return scored.crossJoin(F.broadcast(nf)).selectExpr(
        "stack(6,"
        f" 'v_sndr_micro', ({dm}) + ({corr}),"
        f" 'v_dm_micro', {dm},"
        f" 'corr_sn_micro', {corr},"
        " '__n', n,"
        " '__s_w_milli', s_w,"
        " '__n_fallback_ctx', n_fb"
        ") AS (feature, value)"
    ).select("feature", F.col("value").cast("long"))


def sndr_value_oracle(
    logs_sql: str, w_cap_milli: int = 100_000
) -> str:
    """DuckDB twin of :func:`sndr_value` (identical q table, residual
    products, sign-and-magnitude weight-mass division)."""
    dm = (
        "CASE WHEN n > 0 THEN"
        " (CASE WHEN s_q >= 0 THEN 1 ELSE -1 END)"
        " * (abs(s_q) // n) ELSE 0 END"
    )
    corr = (
        "CASE WHEN s_w > 0 THEN"
        " (CASE WHEN s_corr >= 0 THEN 1 ELSE -1 END)"
        " * (abs(s_corr) // s_w) ELSE 0 END"
    )
    return f"""
        WITH logs AS MATERIALIZED (
          SELECT x, a, p_micro, a_target, CAST(reward AS BIGINT) AS r,
                 CASE WHEN a = a_target THEN
                   least(1000000000 // greatest(p_micro, 1),
                         CAST({w_cap_milli} AS BIGINT))
                 ELSE 0 END AS w
          FROM ({logs_sql})),
        per_ctx AS MATERIALIZED (
          SELECT x AS cx,
                 CAST(SUM(CASE WHEN a = a_target THEN 1 ELSE 0 END)
                   AS BIGINT) AS nm,
                 CAST(SUM(CASE WHEN a = a_target THEN r ELSE 0 END)
                   AS BIGINT) AS sr
          FROM logs GROUP BY 1),
        gtot AS MATERIALIZED (
          SELECT CAST(SUM(nm) AS BIGINT) AS g_nm,
                 CAST(SUM(sr) AS BIGINT) AS g_sr
          FROM per_ctx),
        q AS MATERIALIZED (
          SELECT cx,
                 CASE WHEN nm > 0 THEN (sr * 1000000) // nm
                      WHEN g_nm > 0 THEN (g_sr * 1000000) // g_nm
                      ELSE 0 END AS q_micro,
                 CASE WHEN nm = 0 THEN 1 ELSE 0 END AS is_fallback
          FROM per_ctx, gtot),
        scored AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(w), 0) AS BIGINT) AS s_w,
                 CAST(COALESCE(SUM(q_micro), 0) AS BIGINT) AS s_q,
                 CAST(COALESCE(SUM(w * (r * 1000000 - q_micro)), 0)
                   AS BIGINT) AS s_corr
          FROM logs JOIN q ON logs.x = q.cx),
        nf AS MATERIALIZED (
          SELECT CAST(COALESCE(SUM(is_fallback), 0) AS BIGINT) AS n_fb
          FROM q)
        SELECT 'v_sndr_micro' AS feature,
               CAST(({dm}) + ({corr}) AS BIGINT) AS value FROM scored
        UNION ALL SELECT 'v_dm_micro', {dm} FROM scored
        UNION ALL SELECT 'corr_sn_micro', CAST({corr} AS BIGINT)
          FROM scored
        UNION ALL SELECT '__n', n FROM scored
        UNION ALL SELECT '__s_w_milli', s_w FROM scored
        UNION ALL SELECT '__n_fallback_ctx', n_fb FROM scored, nf
    """


def ips_ci(
    logs: DataFrame,
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """z = 2 confidence interval around the clipped-IPS value — the
    "is the candidate policy actually better?" answer: the per-sample
    values are ``y_i = w_i r_i`` (zero off-match), so the plain variance
    of the mean applies. Extended monoid (one aggregation): ``(n, m1 =
    sum y, m2 = sum y^2)`` with y in milli units; read algebra::

        se^2 ~ ( m2/n - (m1/n)^2 ) / n        (floored, clamped >= 0)
        CI    = v_ips -/+ 2 * se

    All floors are identical in both engines (the estimator's contract);
    the bounds are plain subtractions/additions of non-negative
    integers, so no sign-safe division is needed. Overflow: ``m2 <= n *
    (cap * max_r)^2`` — ~2.3e8 rows at the default cap and reward <= 2;
    lower the cap or pre-scale rewards past that.

    Output (tall): ``v_ips_micro, se_micro, ci_lo_micro, ci_hi_micro,
    __n``.
    """
    w = F.expr(
        f"CASE WHEN {a_col} = {target_col} THEN"
        f" least(1000000000 div greatest({p_col}, 1),"
        f" CAST({w_cap_milli} AS BIGINT)) ELSE 0 END"
    )
    y = w * F.col(r_col).cast("long")
    sums = logs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(y).cast("long").alias("m1"),
        F.sum(y * y).cast("long").alias("m2"),
    )
    return sums.selectExpr(
        "stack(5,"
        " 'v_ips_micro', CASE WHEN n > 0 THEN (m1 * 1000) div n"
        "   ELSE 0 END,"
        " 'se_micro', CASE WHEN n > 0 THEN 1000 * CAST(floor(sqrt(CAST("
        "   greatest(m2 div n - (m1 div n) * (m1 div n), 0) div n"
        "   AS DOUBLE))) AS BIGINT) ELSE 0 END,"
        " 'ci_lo_micro', CASE WHEN n > 0 THEN (m1 * 1000) div n"
        "   - 2000 * CAST(floor(sqrt(CAST("
        "   greatest(m2 div n - (m1 div n) * (m1 div n), 0) div n"
        "   AS DOUBLE))) AS BIGINT) ELSE 0 END,"
        " 'ci_hi_micro', CASE WHEN n > 0 THEN (m1 * 1000) div n"
        "   + 2000 * CAST(floor(sqrt(CAST("
        "   greatest(m2 div n - (m1 div n) * (m1 div n), 0) div n"
        "   AS DOUBLE))) AS BIGINT) ELSE 0 END,"
        " '__n', n"
        ") AS (feature, value)"
    ).select("feature", F.col("value").cast("long"))


def ips_ci_oracle(logs_sql: str, w_cap_milli: int = 100_000) -> str:
    """DuckDB twin of :func:`ips_ci` (identical monoid, floors, and z=2
    bounds)."""
    se = (
        "1000 * CAST(floor(sqrt(CAST("
        "greatest(m2 // n - (m1 // n) * (m1 // n), 0) // n"
        " AS DOUBLE))) AS BIGINT)"
    )
    return f"""
        WITH ys AS MATERIALIZED (
          SELECT CASE WHEN a = a_target THEN
                   least(1000000000 // greatest(p_micro, 1),
                         CAST({w_cap_milli} AS BIGINT)) * CAST(reward AS BIGINT)
                 ELSE 0 END AS y
          FROM ({logs_sql})),
        sums AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(y), 0) AS BIGINT) AS m1,
                 CAST(COALESCE(SUM(y * y), 0) AS BIGINT) AS m2
          FROM ys)
        SELECT 'v_ips_micro' AS feature,
               CAST(CASE WHEN n > 0 THEN (m1 * 1000) // n ELSE 0 END
                 AS BIGINT) AS value FROM sums
        UNION ALL SELECT 'se_micro',
          CASE WHEN n > 0 THEN {se} ELSE 0 END FROM sums
        UNION ALL SELECT 'ci_lo_micro',
          CASE WHEN n > 0 THEN (m1 * 1000) // n - 2 * ({se}) ELSE 0 END
          FROM sums
        UNION ALL SELECT 'ci_hi_micro',
          CASE WHEN n > 0 THEN (m1 * 1000) // n + 2 * ({se}) ELSE 0 END
          FROM sums
        UNION ALL SELECT '__n', n FROM sums
    """


def ips_by_context(
    logs: DataFrame,
    ctx_col: str = "x",
    p_col: str = "p_micro",
    r_col: str = "reward",
    a_col: str = "a",
    target_col: str = "a_target",
    w_cap_milli: int = 100_000,
) -> DataFrame:
    """Per-segment off-policy report — the drill-down after
    :func:`ips_snips`: a candidate policy that wins overall can still
    lose a segment, and the per-context SNIPS/ESS table is where that
    shows. The five-sum monoid grouped by context, plus one TOTAL row
    under a NULL context key (the NULL summary-sentinel rule, DESIGN.md
    round-9 — never an in-band integer).

    Output per context (+ the NULL total): ``(ctx, n, n_match,
    v_snips_micro, ess_floor)`` — context-sized, scalar.

    Scale: one map-side-combined aggregation (grouping sets expand at
    the MAP side, so the shuffle carries context+1 rows per task).
    """
    m = F.expr(f"CAST({a_col} = {target_col} AS BIGINT)")
    w = F.expr(
        f"CASE WHEN {a_col} = {target_col} THEN"
        f" least(1000000000 div greatest({p_col}, 1),"
        f" CAST({w_cap_milli} AS BIGINT)) ELSE 0 END"
    )
    r = F.col(r_col).cast("long")
    base = logs.select(
        F.col(ctx_col).cast("long").alias("ctx"),
        m.alias("__m"),
        w.alias("__w"),
        (w * r).alias("__wr"),
        (w * w).alias("__w2"),
    )
    g = base.rollup("ctx").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__m").cast("long").alias("n_match"),
        F.sum("__w").cast("long").alias("s_w"),
        F.sum("__wr").cast("long").alias("s_wr"),
        F.sum("__w2").cast("long").alias("s_w2"),
    )
    return g.selectExpr(
        "ctx",
        "n",
        "n_match",
        f"CASE WHEN s_w > 0 THEN {_split_micro_div('s_wr', 's_w')}"
        " ELSE 0 END AS v_snips_micro",
        "CASE WHEN s_w2 > 0 THEN s_w div greatest(s_w2 div s_w, 1)"
        " ELSE 0 END AS ess_floor",
    )


def ips_by_context_oracle(
    logs_sql: str, w_cap_milli: int = 100_000
) -> str:
    """DuckDB twin of :func:`ips_by_context` (ROLLUP with the same NULL
    total row)."""
    return f"""
        WITH base AS MATERIALIZED (
          SELECT CAST(x AS BIGINT) AS ctx,
                 CASE WHEN a = a_target THEN 1 ELSE 0 END AS m,
                 CASE WHEN a = a_target THEN
                   least(1000000000 // greatest(p_micro, 1),
                         CAST({w_cap_milli} AS BIGINT))
                 ELSE 0 END AS w,
                 CAST(reward AS BIGINT) AS r
          FROM ({logs_sql})),
        g AS MATERIALIZED (
          SELECT ctx,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(m) AS BIGINT) AS n_match,
                 CAST(SUM(w) AS BIGINT) AS s_w,
                 CAST(SUM(w * r) AS BIGINT) AS s_wr,
                 CAST(SUM(w * w) AS BIGINT) AS s_w2
          FROM base GROUP BY ROLLUP (ctx))
        SELECT ctx, n, n_match,
               CAST(CASE WHEN s_w > 0
                 THEN {_split_micro_div("s_wr", "s_w", "//")}
                 ELSE 0 END AS BIGINT) AS v_snips_micro,
               CAST(CASE WHEN s_w2 > 0 THEN
                 s_w // greatest(s_w2 // s_w, 1) ELSE 0 END AS BIGINT)
                 AS ess_floor
        FROM g
    """
