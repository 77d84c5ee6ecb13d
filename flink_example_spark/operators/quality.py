"""Data-quality assertions over DataFrame ops — the dbt-test /
Great-Expectations layer every production pipeline runs before anything
downstream trusts a table: column expectations (not-null, range,
membership), key uniqueness, and cross-table referential integrity.

Everything is plain aggregations (counts of violating rows), so the
report is one scan per table plus one anti-join per relationship —
exactly the checks' minimum cost at any scale, with map-side partials
throughout. Violation COUNTS (not violating rows) keep the report
bounded; a production run would sink sampled offenders separately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Evaluate named row-level expectations in ONE scan: each rule is a
    boolean Column that should hold for every row. Output per rule:
    ``(check, n_rows, n_violations, passed)``.

    The single aggregation computes every rule's violation count as a
    conditional sum (shared scan, map-side combined), then unpivots to
    one row per check via a literal stack — no per-rule jobs.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(~pred, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    s = df.agg(*aggs)
    arms = [
        F.struct(
            F.lit(name).alias("check"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").alias("n_violations"),
        )
        for i, (name, _) in enumerate(rules)
    ]
    return (
        s.select(F.explode(F.array(*arms)).alias("__c"))
        .select("__c.check", "__c.n_rows", "__c.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
    )


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness check: rows whose key occurs more than once.
    Output one row: ``(check, n_rows, n_violations, passed)`` where
    violations = rows carrying a duplicated key (NOT distinct keys —
    the row count a dedup would have to resolve)."""
    dup = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.sum("__c").alias("n_rows"),
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
                "n_violations"
            ),
        )
    )
    return dup.select(
        F.lit("unique(" + ",".join(cols) + ")").alias("check"),
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    relation: str,
) -> DataFrame:
    """Referential-integrity check (dbt's `relationships` test): child
    rows whose key has no parent. One anti-join; NULL child keys count as
    orphans (a FK that points nowhere is broken either way — filter
    upstream if NULLs are legitimate). Output:
    ``(check, n_rows, n_violations, passed)``."""
    n = child.agg(F.count(F.lit(1)).alias("n")).first()[0]
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit(relation).alias("check"),
        F.lit(n).cast("long").alias("n_rows"),
        F.col("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Privacy audit: k-anonymity over a quasi-identifier column set —
    every row must share its quasi-identifier combination with at least
    ``k-1`` others, or it is re-identifiable. The governance gate a
    training-data pipeline runs before releasing joined/attribute data.

    One hash aggregation on the quasi-identifier tuple. Output (one row):
    ``(k, n_rows, n_groups, n_small_groups, n_rows_at_risk,
    min_group_size)`` — at-risk rows live in groups smaller than k.
    """
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("gn"))
    return groups.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.sum("gn").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("gn") < k).cast("bigint")).alias("n_small_groups"),
        F.sum(F.when(F.col("gn") < k, F.col("gn")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("gn").alias("min_group_size"),
    )


def k_anonymity_oracle(table: str, quasi_cols: list[str], k: int = 5) -> str:
    """DuckDB twin of :func:`k_anonymity`."""
    qc = ", ".join(quasi_cols)
    return f"""
        WITH g AS (
          SELECT {qc}, CAST(COUNT(*) AS BIGINT) AS gn
          FROM {table} GROUP BY {qc}
        )
        SELECT CAST({k} AS BIGINT) AS k,
               CAST(SUM(gn) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN gn < {k} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_small_groups,
               CAST(SUM(CASE WHEN gn < {k} THEN gn ELSE 0 END) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(MIN(gn) AS BIGINT) AS min_group_size
        FROM g
    """


def profile_columns(df: DataFrame, cols: list[str], relation: str) -> DataFrame:
    """Data profiler (ANALYZE-style): per-column row/null/distinct counts —
    the discovery pass a pipeline runs on unfamiliar data before writing
    queries. One aggregation per column (each reads ONLY its column from a
    columnar scan, so the passes are cheap and embarrassingly parallel).

    Output: ``(relation, column, n_rows, n_null, n_distinct)``.
    """
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(relation).alias("relation"),
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
                F.countDistinct(F.col(c)).alias("n_distinct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_oracle(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns`."""
    selects = [
        f"""SELECT '{table}' AS relation, '{c}' AS "column",
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_null,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)


def forget_impact(
    tables: dict[str, tuple[DataFrame, str]], forget_keys: DataFrame, key_col: str
) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a set of subject keys,
    report how many rows each table would delete — the blast-radius check
    a GDPR/CCPA erasure pipeline runs before executing the cascade.

    ``tables`` maps relation name -> (DataFrame, its key column). One
    broadcast semi-join + count per table. Output: ``(relation,
    n_rows, n_to_delete)``.
    """
    keys = forget_keys.select(F.col(key_col).alias("__fk")).distinct()
    parts = []
    for name, (df, col) in tables.items():
        n = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("relation"), F.col("n").alias("n_rows")
        )
        d = (
            df.join(
                F.broadcast(keys), df[col] == keys["__fk"], "left_semi"
            )
            .agg(F.count(F.lit(1)).alias("n_to_delete"))
        )
        parts.append(n.crossJoin(d))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def forget_impact_oracle(
    tables: dict[str, str], keys_sql: str
) -> str:
    """DuckDB twin of :func:`forget_impact`. ``tables`` maps relation name
    -> key column; ``keys_sql`` yields one column ``__fk``."""
    selects = [
        f"""SELECT '{name}' AS relation,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM {name}) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_to_delete
            FROM {name} WHERE {col} IN (SELECT __fk FROM ({keys_sql}))"""
        for name, col in tables.items()
    ]
    return " UNION ALL ".join(selects)


def key_skew_report(
    df: DataFrame, key_col: str, relation: str
) -> DataFrame:
    """Shuffle-skew audit for a join/aggregation key: the Gini
    coefficient and top-key concentration of the key's row distribution
    — the number you check BEFORE a 100 TB shuffle to decide whether a
    key needs salting (DESIGN.md's skew rules operationalized as a
    query).

    Gini over per-key counts ``x_(1..n)`` sorted ascending is
    ``Σ (2i - n - 1)·x_i / (n · Σx)``. The rank runs on the two-phase
    distributed rank device (``operators/distrank.py``) — keys scale
    with data (users, domains), so a bare ``Window.orderBy`` here would
    be the 100-TB single-task sort this report exists to prevent. One
    DESCENDING rank suffices: with ``i_desc = n + 1 - i`` the Gini
    numerator rewrites to ``(n+1)·Σx - 2·Σ(i_desc·x)`` and the top-10
    predicate to ``i_desc <= 10`` — identical exact BIGINT arithmetic,
    one double division at the end.

    Output: ``(relation, n_keys, n_rows, gini, top1_share, top10_share,
    max_key_rows)``.
    """
    from .distrank import dist_row_number

    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("x")
    )
    ranked = dist_row_number(
        counts, [F.col("x").desc(), F.col("k").desc()], out_col="i_desc"
    )
    nk = F.count(F.lit(1))
    return ranked.agg(
        F.lit(relation).alias("relation"),
        nk.alias("n_keys"),
        F.sum("x").alias("n_rows"),
        (
            (
                (nk + F.lit(1)) * F.sum("x")
                - F.lit(2) * F.sum(F.col("i_desc") * F.col("x"))
            ).cast("double")
            / (nk.cast("double") * F.sum("x").cast("double"))
        ).alias("gini"),
        (F.max("x").cast("double") / F.sum("x").cast("double")).alias("top1_share"),
        (
            F.sum(
                F.when(F.col("i_desc") <= 10, F.col("x")).otherwise(0)
            ).cast("double")
            / F.sum("x").cast("double")
        ).alias("top10_share"),
        F.max("x").alias("max_key_rows"),
    )


def key_skew_oracle(table: str, key_col: str) -> str:
    """DuckDB twin of :func:`key_skew_report`."""
    return f"""
        WITH counts AS (
          SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS x
          FROM {table} GROUP BY {key_col}
        ), ranked AS (
          SELECT k, x,
                 CAST(ROW_NUMBER() OVER (ORDER BY x, k) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER () AS BIGINT) AS nk
          FROM counts
        )
        SELECT '{table}' AS relation,
               CAST(MAX(nk) AS BIGINT) AS n_keys,
               CAST(SUM(x) AS BIGINT) AS n_rows,
               CAST(SUM((2 * i - nk - 1) * x) AS DOUBLE)
                 / (CAST(MAX(nk) AS DOUBLE) * CAST(SUM(x) AS DOUBLE)) AS gini,
               CAST(MAX(x) AS DOUBLE) / CAST(SUM(x) AS DOUBLE) AS top1_share,
               CAST(SUM(CASE WHEN i > nk - 10 THEN x ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(x) AS DOUBLE) AS top10_share,
               CAST(MAX(x) AS BIGINT) AS max_key_rows
        FROM ranked
    """


# Benford's-law first-digit probabilities log10(1 + 1/d), d = 1..9 —
# fixed shared constants so both engines compute identical expectations.
_BENFORD_P = [
    0.3010299956639812,
    0.17609125905568124,
    0.12493873660829992,
    0.09691001300805642,
    0.07918124604762482,
    0.06694678963061322,
    0.05799194697768673,
    0.05115252244738129,
    0.04575749056067514,
]


def benford_audit(
    df: DataFrame, value_col: str, relation: str
) -> DataFrame:
    """Benford's-law first-digit audit — the fraud/synthetic-data smell
    test: naturally-occurring magnitudes follow P(d) = log10(1 + 1/d);
    fabricated or truncated values don't. Values < 1 are excluded (their
    leading digit needs decimal-shift logic both engines would have to
    share; integers-part digits are the standard audit surface).

    Output: one row per digit with observed/expected shares plus the
    chi-square statistic (each of the 9 terms quantized to 1e12 BIGINT
    before the sum — never SUM raw doubles — then one division).
    """
    digits = (
        df.filter(F.col(value_col) >= 1)
        .select(
            F.substring(
                F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    return benford_from_counts(digits, relation)


def benford_from_counts(digits: DataFrame, relation: str) -> DataFrame:
    """The read-time algebra of :func:`benford_audit` over a ``(d, obs)``
    first-digit count relation — split out so the live monitor
    (``streaming/quality_stream.py::run_streaming_benford``) can keep the
    9 digit counts as its only streaming state."""
    p_expr = F.element_at(F.array(*[F.lit(p) for p in _BENFORD_P]), F.col("d"))
    with_p = digits.withColumn("p", p_expr).withColumn(
        "n", F.sum("obs").over(Window.partitionBy())
    )
    term = (
        (F.col("obs").cast("double") - F.col("n").cast("double") * F.col("p"))
        * (F.col("obs").cast("double") - F.col("n").cast("double") * F.col("p"))
        / (F.col("n").cast("double") * F.col("p"))
    )
    scored = with_p.withColumn(
        "tq", F.floor(term * F.lit(1e12) + F.lit(0.5)).cast("bigint")
    ).withColumn(
        "chi2",
        F.sum("tq").over(Window.partitionBy()).cast("double") / F.lit(1e12),
    )
    return scored.select(
        F.lit(relation).alias("relation"),
        "d",
        "obs",
        (F.col("obs").cast("double") / F.col("n").cast("double")).alias("obs_share"),
        F.col("p").alias("exp_share"),
        "chi2",
    )


def benford_oracle(table: str, value_col: str) -> str:
    """DuckDB twin of :func:`benford_audit`."""
    plist = ", ".join(repr(p) for p in _BENFORD_P)
    return f"""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(floor({value_col}) AS BIGINT) AS VARCHAR),
                      1, 1) AS INTEGER) AS d,
                 CAST(COUNT(*) AS BIGINT) AS obs
          FROM {table} WHERE {value_col} >= 1 GROUP BY 1
        ), with_p AS (
          SELECT d, obs, ([{plist}])[d] AS p,
                 CAST(SUM(obs) OVER () AS BIGINT) AS n
          FROM digits
        ), scored AS (
          SELECT *,
                 CAST(floor(
                   (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * p)
                   * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * p)
                   / (CAST(n AS DOUBLE) * p) * 1e12 + 0.5) AS BIGINT) AS tq
          FROM with_p
        )
        SELECT '{table}' AS relation, d, obs,
               CAST(obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
               p AS exp_share,
               CAST(CAST(SUM(tq) OVER () AS BIGINT) AS DOUBLE) / 1e12 AS chi2
        FROM scored
    """


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> DataFrame:
    """Privacy audit: distinct l-diversity over a quasi-identifier set —
    k-anonymity's complement (a large group whose SENSITIVE attribute is
    uniform still leaks it; every group must carry >= ``l`` distinct
    sensitive values). Two hash aggregations: (quasi, sensitive) distinct
    pairs, then per-group distinct counts rolled into one audit row:
    ``(l, n_groups, n_undiverse_groups, n_rows_at_risk,
    min_diversity)``.
    """
    pairs = (
        df.groupBy(*quasi_cols, sensitive_col)
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    groups = pairs.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("ndist"), F.sum("pn").alias("gn")
    )
    return groups.agg(
        F.lit(l).cast("bigint").alias("l"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("ndist") < l).cast("bigint")).alias("n_undiverse_groups"),
        F.sum(F.when(F.col("ndist") < l, F.col("gn")).otherwise(0)).alias(
            "n_rows_at_risk"
        ),
        F.min("ndist").alias("min_diversity"),
    )


def l_diversity_oracle(
    table: str, quasi_cols: list[str], sensitive_col: str, l: int = 3
) -> str:
    """DuckDB twin of :func:`l_diversity`."""
    qc = ", ".join(quasi_cols)
    return f"""
        WITH p AS (
          SELECT {qc}, {sensitive_col}, CAST(COUNT(*) AS BIGINT) AS pn
          FROM {table} GROUP BY {qc}, {sensitive_col}
        ), g AS (
          SELECT {qc}, CAST(COUNT(*) AS BIGINT) AS ndist,
                 CAST(SUM(pn) AS BIGINT) AS gn
          FROM p GROUP BY {qc}
        )
        SELECT CAST({l} AS BIGINT) AS l,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN ndist < {l} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_undiverse_groups,
               CAST(SUM(CASE WHEN ndist < {l} THEN gn ELSE 0 END) AS BIGINT)
                 AS n_rows_at_risk,
               CAST(MIN(ndist) AS BIGINT) AS min_diversity
        FROM g
    """


def fd_profile(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency profiling (the metadata-discovery pass a
    warehouse runs before declaring constraints): for each candidate
    ``lhs -> rhs``, count determinant groups, groups violating the
    dependency (more than one distinct rhs), and the worst fan-out.
    ``holds`` is the exact FD verdict. Output one row per candidate:
    ``(lhs, rhs, n_groups, n_violating, max_rhs_distinct, holds)``.

    Scale: one map-side-combined (lhs, rhs) distinct aggregation per
    candidate (config-sized list), nothing row-sized beyond the grouped
    shuffles; candidates are independent Catalyst subplans unioned at
    the end.
    """
    outs = []
    for lhs, rhs in pairs:
        per_group = (
            df.select(F.col(lhs).alias("__l"), F.col(rhs).alias("__r"))
            .distinct()
            .groupBy("__l")
            .agg(F.count(F.lit(1)).alias("__nd"))
        )
        outs.append(
            per_group.agg(
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0)).alias("n_violating"),
                F.max("__nd").alias("max_rhs_distinct"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.col("n_groups").cast("long").alias("n_groups"),
                F.col("n_violating").cast("long").alias("n_violating"),
                F.col("max_rhs_distinct").cast("long").alias("max_rhs_distinct"),
                (F.col("n_violating") == 0).alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fd_profile_oracle(table: str, pairs: list[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`fd_profile`."""
    parts = []
    for lhs, rhs in pairs:
        parts.append(f"""
        SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violating,
               CAST(MAX(nd) AS BIGINT) AS max_rhs_distinct,
               SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
        FROM (
          SELECT {lhs} AS l, CAST(COUNT(*) AS BIGINT) AS nd
          FROM (SELECT DISTINCT {lhs}, {rhs} FROM {table}) GROUP BY 1
        )""")
    return " UNION ALL ".join(parts)


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 250_000,
) -> DataFrame:
    """Privacy audit #3, completing the k-anonymity / l-diversity trio:
    t-closeness (Li, Li & Venkatasubramanian, ICDE 2007). A group can be
    k-large and l-diverse yet still leak — if its SENSITIVE-attribute
    distribution is far from the table-wide one, membership in the group
    shifts an attacker's posterior. For an ORDERED sensitive attribute
    the prescribed distance is the 1-D Earth Mover's Distance

        EMD(p, q) = (1/(m-1)) * sum_j |P_j - Q_j|

    over cumulative distributions at the m ordered values. Everything is
    exact integers: the cumulative difference at value j is
    ``|cum_c_j * N - cum_g_j * n| / (n * N)``, so the per-group EMD in
    ppm is ``sum_j |cum_c_j*N - cum_g_j*n| * 1e6 div (n*N*(m-1))`` — one
    truncating division per group, identical in any engine. Overflow
    bound: ``n * N * m < 2^63`` — quantize the sensitive attribute into
    coarser bands past ~1e8 rows.

    Scale: two hash aggregations (value-dim and group x value-dim), one
    broadcast of the value-dimension relation (m rows — the sensitive
    attribute is banded by construction) onto the group list, one window
    per group over m rows. Nothing row-count-sized shuffles twice.

    Output per group: ``(*quasi_cols, n, emd_ppm, breaches)`` with
    ``breaches = emd_ppm > t_ppm`` as BIGINT 0/1.
    """
    v = F.col(sensitive_col)
    src = df.filter(v.isNotNull()).select(
        *[F.col(c) for c in quasi_cols], v.alias("__v")
    )
    gv = src.groupBy("__v").agg(F.count(F.lit(1)).cast("long").alias("gj"))
    wv = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.orderBy("__v").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gcum = gv.select(
        "__v",
        F.sum("gj").over(wv).alias("cum_g"),
        F.sum("gj").over(wall).alias("n_tot"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    cv = src.groupBy(*quasi_cols, "__v").agg(
        F.count(F.lit(1)).cast("long").alias("cj")
    )
    groups = cv.groupBy(*quasi_cols).agg(F.sum("cj").alias("n"))
    grid = groups.crossJoin(F.broadcast(gcum.select("__v")))
    filled = grid.join(cv, [*quasi_cols, "__v"], "left").withColumn(
        "cj", F.coalesce(F.col("cj"), F.lit(0))
    )
    wg = Window.partitionBy(*quasi_cols).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = filled.withColumn("cum_c", F.sum("cj").over(wg)).join(
        F.broadcast(gcum), "__v"
    )
    per_g = cum.groupBy(*quasi_cols, "n", "n_tot", "m").agg(
        F.sum(
            F.abs(F.col("cum_c") * F.col("n_tot") - F.col("cum_g") * F.col("n"))
        ).alias("S")
    )
    emd = F.expr("(S * 1000000) div (n * n_tot * (m - 1))")
    return per_g.filter(F.col("m") >= 2).select(
        *quasi_cols,
        F.col("n").cast("long").alias("n"),
        emd.cast("long").alias("emd_ppm"),
        (emd > F.lit(t_ppm)).cast("long").alias("breaches"),
    )


def t_closeness_oracle(
    table: str,
    quasi_cols: list[str],
    sensitive_col: str,
    t_ppm: int = 250_000,
) -> str:
    """DuckDB twin of :func:`t_closeness`."""
    qc = ", ".join(quasi_cols)
    return f"""
        WITH src AS MATERIALIZED (
          SELECT {qc}, {sensitive_col} AS v FROM {table}
          WHERE {sensitive_col} IS NOT NULL
        ),
        gcum AS MATERIALIZED (
          SELECT v,
                 CAST(SUM(gj) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_g,
                 CAST(SUM(gj) OVER () AS BIGINT) AS n_tot,
                 CAST(COUNT(*) OVER () AS BIGINT) AS m
          FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS gj FROM src GROUP BY 1)
        ),
        cv AS MATERIALIZED (
          SELECT {qc}, v, CAST(COUNT(*) AS BIGINT) AS cj
          FROM src GROUP BY {qc}, v
        ),
        groups AS (
          SELECT {qc}, CAST(SUM(cj) AS BIGINT) AS n FROM cv GROUP BY {qc}
        ),
        filled AS (
          SELECT g.*, d.v, COALESCE(cv.cj, 0) AS cj
          FROM groups g CROSS JOIN (SELECT v FROM gcum) d
          LEFT JOIN cv USING ({qc}, v)
        ),
        cum AS (
          SELECT f.*, gcum.cum_g, gcum.n_tot, gcum.m,
                 CAST(SUM(cj) OVER (PARTITION BY {qc} ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_c
          FROM filled f JOIN gcum USING (v)
        ),
        per_g AS (
          SELECT {qc}, n, n_tot, m,
                 CAST(SUM(abs(cum_c * n_tot - cum_g * n)) AS BIGINT) AS S
          FROM cum GROUP BY {qc}, n, n_tot, m
        )
        SELECT {qc}, n,
               CAST((S * 1000000) // (n * n_tot * (m - 1)) AS BIGINT) AS emd_ppm,
               CAST(CASE WHEN (S * 1000000) // (n * n_tot * (m - 1)) > {t_ppm}
                    THEN 1 ELSE 0 END AS BIGINT) AS breaches
        FROM per_g WHERE m >= 2
    """


def ref_integrity(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity profiling — the constraint-audit pass a
    warehouse runs before declaring (or trusting) foreign keys, and the
    first thing a 100 TB ingest validates after a backfill. For each
    candidate FK ``child.col -> parent.col``: total child rows, NULL
    foreign keys, orphan rows (non-NULL key with no parent), distinct
    orphan keys, and the exact verdict.

    Scale posture: each child collapses to its DISTINCT key relation
    first (one map-side-combinable aggregation carrying (key, count)),
    and only that key-cardinality-sized relation anti-joins the parent's
    key projection — the parent scan is one column, broadcastable for
    dimension tables. Nothing row-count-sized crosses a join.

    ``fks``: (fk_name, child_df, child_col, parent_df, parent_col).
    Output one row per FK: ``(fk_name, n_rows, n_null_fk, n_orphan_rows,
    n_orphan_keys, holds)``.
    """
    outs = []
    for name, child, ccol, parent, pcol in fks:
        keyed = child.select(F.col(ccol).alias("k"))
        totals = keyed.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_null_fk"),
        )
        ck = (
            keyed.filter(F.col("k").isNotNull())
            .groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        orphans = ck.join(
            parent.select(F.col(pcol).alias("k")).distinct(), "k", "left_anti"
        ).agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_orphan_rows"),
            F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
        )
        outs.append(
            totals.crossJoin(orphans).select(
                F.lit(name).alias("fk_name"),
                "n_rows",
                F.coalesce(F.col("n_null_fk"), F.lit(0)).alias("n_null_fk"),
                "n_orphan_rows",
                "n_orphan_keys",
                (F.col("n_orphan_rows") == 0).cast("long").alias("holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def ref_integrity_oracle(
    fks: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB twin of :func:`ref_integrity`. ``fks``: (fk_name,
    child_table_sql, child_col, parent_table_sql, parent_col)."""
    parts = []
    for name, child, ccol, parent, pcol in fks:
        parts.append(f"""
        SELECT '{name}' AS fk_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS n_rows,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}
                WHERE {ccol} IS NULL) AS n_null_fk,
               COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_orphan_rows,
               CAST(COUNT(*) AS BIGINT) AS n_orphan_keys,
               CAST(CASE WHEN COALESCE(SUM(c), 0) = 0 THEN 1 ELSE 0 END
                 AS BIGINT) AS holds
        FROM (
          SELECT {ccol} AS k, CAST(COUNT(*) AS BIGINT) AS c FROM {child}
          WHERE {ccol} IS NOT NULL GROUP BY 1
        ) ck
        ANTI JOIN (SELECT DISTINCT {pcol} AS k FROM {parent}) pk USING (k)
        """)
    return " UNION ALL ".join(parts)


def gini_lorenz(
    df: DataFrame, value_col: str, id_col: str, n_buckets: int = 10
) -> DataFrame:
    """Gini coefficient + Lorenz curve of a non-negative size column —
    the concentration audit for a corpus (is 1% of domains contributing
    90% of tokens?), the continuous sibling of the domain-cap gate.

    With values ranked ascending (exact global ``i`` = ROW_NUMBER over
    (value, id) from the distributed two-phase device, DESIGN.md):
    ``G = (2*sum(i*v) - (n+1)*sum(v)) / (n*sum(v))`` — every
    accumulated term an exact BIGINT, one double division at the
    output. The Lorenz curve reports per equal-count bucket
    (``(i-1)*n_buckets div n``) the row count, bucket value sum, and
    the cumulative value share in exact micro units.

    Output: ``n_buckets`` rows ``(bucket, n_rows, bucket_value,
    cum_value, cum_share_micro, gini)`` — gini repeated per row (scalar
    columns only; DESIGN.md driver-record rules). Overflow bound:
    ``2*sum(i*v)`` needs ``n * totalv * 2 < 2^63``; quantize the value
    upstream for corpora beyond that (or widen to DECIMAL(38) as in
    cramers_v).

    Scale: one distributed ranking + one n_buckets-sized aggregation;
    the only unpartitioned window runs over n_buckets rows.
    """
    from flink_example_spark.operators.distrank import dist_row_number

    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("v"), F.col(id_col).alias("id")
    )
    ranked = dist_row_number(rows, ["v", "id"], "i")
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("i") * F.col("v")).alias("wiv"),
    )
    bucketed = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("bucket", F.expr(f"((i - 1) * {n_buckets}) div n"))
        .groupBy("bucket", "n", "sv", "wiv")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("v").alias("bucket_value"),
        )
    )
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gini = (
        (F.lit(2) * F.col("wiv") - (F.col("n") + 1) * F.col("sv"))
        .cast("double")
        / (F.col("n") * F.col("sv")).cast("double")
    )
    return (
        bucketed.withColumn("cum_value", F.sum("bucket_value").over(wb))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            F.col("bucket_value").cast("long").alias("bucket_value"),
            F.col("cum_value").cast("long").alias("cum_value"),
            F.expr("(cum_value * 1000000) div sv").alias("cum_share_micro"),
            gini.alias("gini"),
        )
    )


def gini_lorenz_oracle(
    units_sql: str, value_col: str, id_col: str, n_buckets: int = 10
) -> str:
    """DuckDB twin of :func:`gini_lorenz`."""
    return f"""
        WITH u AS (
          SELECT CAST({value_col} AS BIGINT) AS v, {id_col} AS id
          FROM ({units_sql}) WHERE {value_col} IS NOT NULL
        ),
        ranked AS (
          SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, id) AS BIGINT) AS i
          FROM u
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(i * v) AS BIGINT) AS wiv
          FROM ranked
        ),
        bucketed AS (
          SELECT ((i - 1) * {n_buckets}) // n AS bucket, n, sv, wiv,
                 CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(SUM(v) AS BIGINT) AS bucket_value
          FROM ranked, tot GROUP BY 1, 2, 3, 4
        )
        SELECT bucket, n_rows, bucket_value,
               CAST(SUM(bucket_value) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_value,
               (CAST(SUM(bucket_value) OVER (ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) * 1000000) // sv AS cum_share_micro,
               CAST(2 * wiv - (n + 1) * sv AS DOUBLE)
                 / CAST(n * sv AS DOUBLE) AS gini
        FROM bucketed
    """


def gini_lorenz_from_counts(
    counts: DataFrame, n_buckets: int = 10
) -> DataFrame:
    """:func:`gini_lorenz` closed over a per-VALUE count relation
    ``(v, c)`` — the read-time algebra of the live concentration monitor
    (state = the value-count monoid). With inclusive cumulative counts
    ``cum`` the value group occupies ranks ``[cum-c+1, cum]``, so its
    rank-weighted sum closes to ``v * c * (2*cum - c + 1) / 2`` (always
    an integer: one factor is even) and its rows split across the
    equal-count Lorenz buckets by exact interval overlap with each
    bucket's rank range ``[(b*n) div k + 1, ((b+1)*n) div k]`` — the
    identical decile assignment the row-level rank makes (tied rows are
    interchangeable). BIT-equal output to the row-level form."""
    from flink_example_spark.operators.distrank import dist_cumsum

    spark = counts.sparkSession
    cum = dist_cumsum(counts, ["v"], {"cum": "c"})
    tot = cum.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("sv"),
        # c*(2*cum-c+1) is always even -> the div-2 is exact BIGINT
        F.sum(F.expr("(c * (2*cum - c + 1) div 2) * v")).alias("wiv"),
    )
    buckets = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    overl = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(buckets))
        .select(
            "bucket",
            "n",
            "sv",
            "wiv",
            "v",
            F.greatest(
                F.lit(0),
                F.least(
                    F.col("cum"), F.expr(f"((bucket + 1) * n) div {n_buckets}")
                )
                - F.greatest(
                    F.col("cum") - F.col("c") + 1,
                    F.expr(f"(bucket * n) div {n_buckets} + 1"),
                )
                + 1,
            ).alias("ov"),
        )
        .filter(F.col("ov") > 0)
    )
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gini = (
        (F.lit(2) * F.col("wiv") - (F.col("n") + 1) * F.col("sv"))
        .cast("double")
        / (F.col("n") * F.col("sv")).cast("double")
    )
    return (
        overl.groupBy("bucket", "n", "sv", "wiv")
        .agg(
            F.sum("ov").cast("long").alias("n_rows"),
            F.sum(F.col("v") * F.col("ov")).alias("bucket_value"),
        )
        .withColumn("cum_value", F.sum("bucket_value").over(wb))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_rows",
            F.col("bucket_value").cast("long").alias("bucket_value"),
            F.col("cum_value").cast("long").alias("cum_value"),
            F.expr("(cum_value * 1000000) div sv").alias("cum_share_micro"),
            gini.alias("gini"),
        )
    )


def gini_by_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Per-slice Gini concentration — "which sources are dominated by a
    few huge documents": the :func:`gini_lorenz` coefficient computed
    within each group via per-GROUP ranking windows (hash-partitioned,
    no global ordering; a skewed group costs only its own size).

    Output per group (>= 2 rows, positive mass): ``(grp, n, total_value,
    gini)``.

    Scale: one per-group window + one group rollup.
    """
    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("id"),
    )
    w = Window.partitionBy("grp").orderBy("v", "id")
    ranked = rows.withColumn("i", F.row_number().over(w))
    s = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sv"),
        F.sum(F.col("i") * F.col("v")).alias("wiv"),
    )
    gini = (
        (F.lit(2) * F.col("wiv") - (F.col("n") + 1) * F.col("sv"))
        .cast("double")
        / (F.col("n") * F.col("sv")).cast("double")
    )
    return s.filter((F.col("n") >= 2) & (F.col("sv") > 0)).select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("sv").cast("long").alias("total_value"),
        gini.alias("gini"),
    )


def gini_by_group_oracle(
    units_sql: str, group_col: str, value_col: str, id_col: str
) -> str:
    """DuckDB twin of :func:`gini_by_group`."""
    return f"""
        WITH u AS (
          SELECT {group_col} AS grp, CAST({value_col} AS BIGINT) AS v,
                 {id_col} AS id
          FROM ({units_sql}) WHERE {value_col} IS NOT NULL
        ),
        ranked AS (
          SELECT grp, v,
                 CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, id)
                   AS BIGINT) AS i
          FROM u
        ),
        s AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(i * v) AS BIGINT) AS wiv
          FROM ranked GROUP BY grp
        )
        SELECT grp, n, sv AS total_value,
               CAST(2 * wiv - (n + 1) * sv AS DOUBLE)
                 / CAST(n * sv AS DOUBLE) AS gini
        FROM s WHERE n >= 2 AND sv > 0
    """


def deletion_cascade(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    request_pred: str = "c_custkey % 97 = 0",
) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) deletion-cascade PLAN: given a
    predicate selecting the erasure-request subjects, compute — without
    mutating anything — exactly how many rows each table in the FK
    cascade loses (customer -> orders via o_custkey -> lineitem via
    l_orderkey), so the owner can review blast radius before executing.
    The audit a compliance pipeline runs per request batch at 100 TB.

    Scale posture: the request list collapses to its KEY projection and
    flows down the cascade as semi-join probes (each level shuffles
    only its own key column; the request keys broadcast when small —
    AQE decides). Nothing row-sized crosses a join twice.

    Output (tall): per table ``(table_name, n_rows, n_deleted,
    deleted_ppm)`` with deleted_ppm = exact integer
    ``(n_deleted * 1e6) div n_rows``.
    """
    req = customer.filter(F.expr(request_pred)).select("c_custkey")
    del_orders = orders.join(
        req.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey",
        "left_semi",
    )
    del_li_keys = del_orders.select("o_orderkey").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    del_lineitem = lineitem.join(del_li_keys, "l_orderkey", "left_semi")

    def _stat(name: str, full: DataFrame, deleted: DataFrame) -> DataFrame:
        n = full.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        d = deleted.agg(F.count(F.lit(1)).cast("long").alias("n_deleted"))
        return n.crossJoin(d).select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "n_deleted",
            F.expr("CASE WHEN n_rows > 0 THEN (n_deleted * 1000000)"
                   " div n_rows ELSE 0 END").cast("long")
            .alias("deleted_ppm"),
        )

    return (
        _stat("customer", customer, req)
        .unionByName(_stat("orders", orders, del_orders))
        .unionByName(_stat("lineitem", lineitem, del_lineitem))
    )


def deletion_cascade_oracle(request_pred: str = "c_custkey % 97 = 0") -> str:
    """DuckDB twin of :func:`deletion_cascade`."""
    return f"""
        WITH req AS MATERIALIZED (
          SELECT c_custkey FROM customer WHERE {request_pred}),
        del_o AS MATERIALIZED (
          SELECT o_orderkey FROM orders
          WHERE o_custkey IN (SELECT c_custkey FROM req)),
        stats AS (
          SELECT 'customer' AS table_name,
                 CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows,
                 CAST((SELECT COUNT(*) FROM req) AS BIGINT) AS n_deleted
          UNION ALL
          SELECT 'orders',
                 CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
                 CAST((SELECT COUNT(*) FROM del_o) AS BIGINT)
          UNION ALL
          SELECT 'lineitem',
                 CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
                 CAST((SELECT COUNT(*) FROM lineitem
                       WHERE l_orderkey IN (SELECT o_orderkey FROM del_o))
                   AS BIGINT))
        SELECT table_name, n_rows, n_deleted,
               CASE WHEN n_rows > 0 THEN (n_deleted * 1000000) // n_rows
                    ELSE 0 END AS deleted_ppm
        FROM stats
    """
