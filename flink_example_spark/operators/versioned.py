"""Versioned tables: per-key version history of an aggregate.

The reference builds these by replaying an aggregate's changelog and stamping
each update with the current watermark (AddWatermark.java:13-27, applied
App.java:158-193) — documented there as "the jankiest part of this prototype"
(App.java:150-157). We implement the reference's own stated better solution
(App.java:156): compute the version history *directly* as a cumulative
event-time window over the input events. ``sum(x) OVER (PARTITION BY key
ORDER BY ts RANGE UNBOUNDED PRECEDING)`` yields exactly the sequence of
``(key, _change_time, value)`` rows Flink reconstructs from the changelog,
keyed by true event time (no watermark-leakage hazard, AddWatermark.java:18-21).

Scale: one shuffle on the key + per-key sort; no global sort, no driver
collect. At 100 TB this is the same exchange the grouped aggregate would
need anyway.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CHANGE_TIME = "_change_time"


def version_history(
    events: DataFrame,
    key: str | Sequence[str],
    time_col: str,
    aggs: dict[str, Column],
    entity_alias: str = "_entity",
) -> DataFrame:
    """History relation of a grouped aggregate: one row per (key, event time)
    holding the aggregate over all events at-or-before that time.

    ``aggs`` maps output column name → an aggregate Column (e.g.
    ``F.sum("duration")``). The RANGE frame (Spark's default with ORDER BY)
    includes ties, so simultaneous events fold into one version row.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = [F.col(keys[0]).alias(entity_alias)] if len(keys) == 1 else [F.col(k) for k in keys]
    cols.append(F.col(time_col).alias(CHANGE_TIME))
    cols.extend(expr.over(w).alias(name) for name, expr in aggs.items())
    # Ties share identical cumulative values under the RANGE frame; collapse
    # to one version per (key, time) by keeping each group's last row via
    # lead() over the SAME partitioning/sort — unlike distinct(), this adds
    # no extra Exchange (both window functions plan into one Window stage).
    w_row = Window.partitionBy(*keys).orderBy(F.col(time_col))
    next_t = F.lead(F.col(time_col)).over(w_row)
    return (
        events.select(*cols, next_t.alias("__next_t"))
        .filter(F.col("__next_t").isNull() | (F.col("__next_t") != F.col(CHANGE_TIME)))
        .drop("__next_t")
    )


def salted_version_history(
    events: DataFrame,
    key: str | Sequence[str],
    time_col: str,
    aggs: dict[str, tuple[str, str | None]],
    entity_alias: str = "_entity",
    n_buckets: int = 32,
    bucket: Column | None = None,
) -> DataFrame:
    """``version_history`` with the per-key sort salted by time bucket — the
    skewed-entity scale path (PERF.md follow-up: the cumulative window sorts
    each entity's whole history in ONE task; a hot entity with 10^8 events
    stalls the stage).

    Two-phase merge, the running-aggregate analog of a map-side combine:

    1. bucket rows by a monotone time slice and compute the running
       aggregate WITHIN each (key, bucket) — tasks are bounded by bucket
       size, a hot key spreads over ``n_buckets`` tasks;
    2. per-(key, bucket) totals (tiny: |keys|·n_buckets rows) get a per-key
       running OFFSET over the *preceding* buckets, joined back (broadcast)
       and merged into the within-bucket values.

    ``aggs`` maps output name → (kind, source column), kind in
    ``sum|count|min|max`` — the decomposable running aggregates (an
    arbitrary Column can't be merged across buckets, so the salted variant
    takes a spec instead of ``version_history``'s open Column API).

    ``bucket``: optional monotone bucket expression over ``time_col`` (e.g.
    ``F.date_trunc("week", ts)``) — what production passes, avoiding the
    min/max pre-scan the ``n_buckets`` default needs. Ties (equal
    timestamps) always land in one bucket, so the RANGE-frame tie collapse
    stays correct across bucket boundaries.

    Results are identical to ``version_history`` for exact types (longs,
    decimals); salting changes double summation order, so cast to decimal
    upstream exactly as the unsalted path already requires.
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}

    def running(kind: str, col: str | None, w: "Window") -> Column:
        if kind == "count":
            return F.count(F.lit(1)).over(w)
        return getattr(F, kind)(F.col(col)).over(w)

    def total(kind: str, col: str | None) -> Column:
        if kind == "count":
            return F.count(F.lit(1))
        return getattr(F, kind)(F.col(col))

    for kind, _ in aggs.values():
        if kind not in _MERGE:
            raise ValueError(f"salted_version_history supports {sorted(_MERGE)}, got {kind!r}")

    keys = [key] if isinstance(key, str) else list(key)
    if bucket is None:
        # NTZ needs a hop through TIMESTAMP to reach seconds-as-double
        t_d = F.col(time_col).cast("timestamp").cast("double")
        lo, hi = events.agg(F.min(t_d), F.max(t_d)).first()
        width = max((hi - lo) / n_buckets, 1e-9)
        bucket = F.least(F.lit(n_buckets - 1), F.floor((t_d - F.lit(lo)) / F.lit(width)))
    ev = events.withColumn("__b", bucket)

    w_in = (
        Window.partitionBy(*keys, "__b")
        .orderBy(F.col(time_col))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cols = [F.col(keys[0]).alias(entity_alias)] if len(keys) == 1 else [F.col(k) for k in keys]
    out_keys = [entity_alias] if len(keys) == 1 else keys
    cols.append(F.col(time_col).alias(CHANGE_TIME))
    cols.append(F.col("__b"))
    cols.extend(
        running(kind, col, w_in).alias(f"__in_{name}") for name, (kind, col) in aggs.items()
    )
    # tie collapse within (key, bucket) — same-lead trick as version_history;
    # ties share a bucket, so this is exactly the unsalted collapse
    w_row = Window.partitionBy(*keys, "__b").orderBy(F.col(time_col))
    within = (
        ev.select(*cols, F.lead(F.col(time_col)).over(w_row).alias("__next_t"))
        .filter(F.col("__next_t").isNull() | (F.col("__next_t") != F.col(CHANGE_TIME)))
        .drop("__next_t")
    )

    totals = ev.groupBy(
        *[F.col(k).alias(a) for k, a in zip(keys, out_keys)], "__b"
    ).agg(*[total(kind, col).alias(f"__t_{name}") for name, (kind, col) in aggs.items()])
    w_off = (
        Window.partitionBy(*out_keys)
        .orderBy(F.col("__b"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *out_keys,
        "__b",
        *[
            _MERGE[kind](F.col(f"__t_{name}")).over(w_off).alias(f"__o_{name}")
            for name, (kind, _) in aggs.items()
        ],
    )

    def merged(name: str, kind: str) -> Column:
        w, o = F.col(f"__in_{name}"), F.col(f"__o_{name}")
        if kind in ("sum", "count"):
            return F.when(o.isNull(), w).otherwise(w + o)
        return F.least(w, o) if kind == "min" else F.greatest(w, o)

    return (
        within.join(F.broadcast(offsets), [*out_keys, "__b"], "left")
        .select(
            *out_keys,
            CHANGE_TIME,
            *[merged(name, kind).alias(name) for name, (kind, _) in aggs.items()],
        )
    )


def latest_versions(history: DataFrame, key: str | Sequence[str], time_col: str = CHANGE_TIME) -> DataFrame:
    """"Most recent row per key" — the versioned table's queryable head
    (App.java:148). row_number over a per-key desc sort; single shuffle."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(time_col).desc())
    return (
        history.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def snapshot_at(
    history: DataFrame,
    key: str | Sequence[str],
    ts: str,
    time_col: str = CHANGE_TIME,
) -> DataFrame:
    """Time-travel read: the versioned table AS OF ``ts`` (inclusive) — the
    ``FOR SYSTEM_TIME AS OF`` query Flink runs against a registered versioned
    table (App.java:148's head query, generalized to any point in time).
    Keys whose first version is after ``ts`` are absent, exactly as the
    temporal-table semantics dictate.

    Plan shape: the time predicate evaluates beneath the head
    (latest-per-key) window, so the head's WindowGroupLimit sorts only each
    key's surviving prefix (it cannot cross the history window itself —
    the bound column is that window's ORDER key; against a MATERIALIZED
    history table the same predicate reaches the parquet scan and prunes
    files/row-groups by min/max stats). Same single exchange as
    :func:`latest_versions`. Plan pinned in test_plan_regressions.
    """
    return latest_versions(
        history.filter(F.col(time_col) <= F.to_timestamp(F.lit(ts))), key, time_col
    )


def scd2_intervals(
    history: DataFrame,
    key: str | Sequence[str],
    time_col: str = CHANGE_TIME,
) -> DataFrame:
    """SCD Type-2 dimension view of a version history: every version row
    becomes a validity interval — ``valid_from`` (the version's change
    time), ``valid_to`` (the NEXT version's change time, NULL while
    current) and ``is_current`` — the half-open [from, to) convention a
    warehouse dimension table uses.

    One ``lead()`` window over the same (key, time) partitioning the
    history relation already carries, so chaining onto
    :func:`version_history` adds no extra Exchange (both fold into one
    Window stage over the single key shuffle).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(time_col))
    value_cols = [c for c in history.columns if c not in (*keys, time_col)]
    nxt = F.lead(F.col(time_col)).over(w)
    return history.select(
        *keys,
        *value_cols,
        F.col(time_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


#: Flink RowKind short strings (org.apache.flink.types.RowKind) — the
#: changelog encoding the reference's bridge consumes (App.java:158-193).
INSERT, UPDATE_BEFORE, UPDATE_AFTER, DELETE = "+I", "-U", "+U", "-D"


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str | Sequence[str],
    time_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
    broadcast_changes: bool = False,
) -> DataFrame:
    """MERGE INTO semantics: apply a CDC changelog to a base snapshot and
    return the new snapshot — the batch form of the changelog bridge the
    reference builds around Flink's retract streams (App.java:158-193;
    RowKind ops ``+I``/``-U``/``+U``/``-D``, bare ``I``/``U``/``D``
    accepted too).

    Net-effect semantics: per key, the LATEST change by ``(time_col,
    seq_col)`` wins — a delete removes the key, an insert/update upserts its
    value columns; keys untouched by the changelog keep their base row.
    ``-U`` (update_before) rows are retractions paired with a ``+U`` at the
    same instant and never carry net state, so they are dropped up front —
    exactly how Flink's upsert materializer folds a retract stream.

    ``seq_col`` breaks same-timestamp ties (a changelog's offset/LSN);
    without one, equal-time changes to one key are rejected as ambiguous
    rather than resolved arbitrarily.

    Scale: one window shuffle over the CHANGES (usually ≪ base) to take
    each key's last change, then one equi-join against base — broadcast it
    with ``broadcast_changes=True`` when the delta fits, sort-merge on the
    key otherwise. The base is never shuffled beyond that join; no Python.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = [c for c in base.columns if c not in keys]
    missing = [c for c in value_cols if c not in changes.columns]
    if missing:
        raise ValueError(f"changes is missing base value columns {missing}")
    op = F.translate(F.col(op_col), "+-", "")  # '+I'/'I' → 'I', '-D'/'D' → 'D'
    net = changes.filter(F.col(op_col) != UPDATE_BEFORE)
    order = [F.col(time_col).desc()]
    if seq_col is not None:
        order.append(F.col(seq_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    last = (
        net.withColumn("__rn", F.row_number().over(w))
        .withColumn("__nties", F.count(F.lit(1)).over(
            Window.partitionBy(*keys, time_col, *( [seq_col] if seq_col else [] ))
        ))
        .filter(F.col("__rn") == 1)
        .select(
            *keys,
            op.alias("__op"),
            F.col("__nties"),
            *[F.col(c).alias(f"__c_{c}") for c in value_cols],
        )
    )
    if seq_col is None:
        # equal-(key, time) changes are ambiguous without a sequence column;
        # fail loudly instead of letting row_number pick one arbitrarily
        last = last.withColumn(
            "__op",
            F.when(F.col("__nties") > 1, F.raise_error(
                F.lit("apply_changelog: same-timestamp changes for one key need seq_col")
            ).cast("string")).otherwise(F.col("__op")),
        )
    last = last.drop("__nties")
    if broadcast_changes:
        last = F.broadcast(last)
    return merge_net_changes(base, last, keys, value_cols)


def merge_net_changes(
    base: DataFrame, last: DataFrame, keys: list[str], value_cols: list[str]
) -> DataFrame:
    """Final MERGE step shared by :func:`apply_changelog` and the streaming
    CDC twin: ``last`` holds each key's net change as ``(keys…, __op,
    __c_<col>…)`` with ``__op`` normalized to ``I``/``U``/``D``."""
    merged = base.join(last, keys, "full_outer")
    return (
        merged.filter(F.col("__op").isNull() | (F.col("__op") != "D"))
        # change rows upsert the WHOLE row (even explicit NULLs — changelog
        # semantics, not per-column patch); base-only rows keep base values
        .select(
            *keys,
            *[
                F.when(F.col("__op").isNotNull(), F.col(f"__c_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in value_cols
            ],
        )
    )


def snapshot_diff(
    history: DataFrame,
    key: str | Sequence[str],
    ts_a: str,
    ts_b: str,
    time_col: str = CHANGE_TIME,
    include_unchanged: bool = False,
) -> DataFrame:
    """Temporal audit diff: what changed between ``AS OF ts_a`` and
    ``AS OF ts_b``. One row per key present in either snapshot, classified
    ``added`` / ``removed`` / ``changed`` (and ``unchanged`` when
    ``include_unchanged``); value columns appear twice with ``_a``/``_b``
    suffixes.

    The two snapshots derive from the same history scan (Catalyst reuses
    the exchange under AQE); the diff itself is one full-outer equi-join
    on the key — snapshot-sized, not history-sized.
    """
    keys = [key] if isinstance(key, str) else list(key)
    value_cols = [c for c in history.columns if c not in (*keys, time_col)]
    a = snapshot_at(history, key, ts_a, time_col).drop(time_col)
    b = snapshot_at(history, key, ts_b, time_col).drop(time_col)
    for c in value_cols:
        a = a.withColumnRenamed(c, f"{c}_a")
        b = b.withColumnRenamed(c, f"{c}_b")
    # explicit membership markers: value columns may be legitimately NULL
    a = a.withColumn("__in_a", F.lit(True))
    b = b.withColumn("__in_b", F.lit(True))
    joined = a.join(b, keys, "full_outer")
    in_a = F.col("__in_a").isNotNull()
    in_b = F.col("__in_b").isNotNull()
    same = None
    for c in value_cols:
        eq = F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(~in_a, F.lit("added"))
        .when(~in_b, F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select(
        *keys,
        *[F.col(f"{c}_a") for c in value_cols],
        *[F.col(f"{c}_b") for c in value_cols],
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def temporal_rule_filter(
    events: DataFrame,
    rules: DataFrame,
    on: str,
    event_time: str,
    rule_time: str = CHANGE_TIME,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Dynamic-configuration filtering — Flink's broadcast-state pattern
    expressed temporally: ``rules`` is a changelog of per-key thresholds
    (a versioned relation), and each event is judged by the rule IN EFFECT
    AT ITS EVENT TIME (as-of join), so replays and live runs agree exactly
    — the property a broadcast-state operator only gets approximately
    (whatever rule happened to have arrived). Keeps events whose value
    meets the as-of threshold; ``keep_unmatched`` retains events from
    before the first rule.

    ``rules`` columns: key, ``rule_time``, ``min_value`` (double).
    Output: the surviving events plus the ``min_value`` that admitted them.

    Scale: exactly the as-of join's single exchange; the rules side is the
    small one in every real deployment.
    """
    from flink_example_spark.operators.asof import asof_join

    joined = asof_join(events, rules, on=on, probe_time=event_time)
    keep = (
        F.col("min_value").isNull()
        if keep_unmatched
        else F.lit(False)
    ) | (F.col("value") >= F.col("min_value"))
    return joined.filter(keep)


def expiry_plan(
    history: DataFrame,
    entity_col: str = "_entity",
    time_col: str = "_change_time",
    retain_last: int = 3,
) -> DataFrame:
    """Snapshot-expiry maintenance planning (Iceberg ``expire_snapshots``
    / Delta VACUUM's dry run): for each entity's version chain, keep the
    newest ``retain_last`` versions and plan the rest for deletion —
    reported per entity so the reclaim is auditable BEFORE anything is
    dropped.

    Deterministic: versions rank by (time DESC) with the rank tie-free
    because ``version_history`` collapses same-timestamp versions.
    ``oldest_keep_day`` day-truncates the retention watermark the GC
    would enforce (day-truncated TIMESTAMP, the cross-engine date rule).

    Output per entity: ``(entity, n_versions, n_expire,
    oldest_keep_day)``.

    Scale: one ranking window per entity over the version chain, one
    rollup — the history relation's own partitioning, no new shuffle
    key.
    """
    w = Window.partitionBy(entity_col).orderBy(F.col(time_col).desc())
    ranked = history.select(
        F.col(entity_col).alias("e"),
        F.col(time_col).alias("t"),
        F.row_number().over(w).alias("rk"),
    )
    return (
        ranked.groupBy("e")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_versions"),
            F.sum((F.col("rk") > retain_last).cast("long")).alias("n_expire"),
            F.date_trunc(
                "DAY", F.min(F.when(F.col("rk") <= retain_last, F.col("t")))
            ).alias("oldest_keep_day"),
        )
        .select(
            F.col("e").alias(entity_col),
            "n_versions",
            "n_expire",
            "oldest_keep_day",
        )
    )


def expiry_plan_oracle(
    history_sql: str,
    entity_col: str = "_entity",
    time_col: str = "_change_time",
    retain_last: int = 3,
) -> str:
    """DuckDB twin of :func:`expiry_plan`."""
    return f"""
        WITH ranked AS (
          SELECT {entity_col} AS e, {time_col} AS t,
                 ROW_NUMBER() OVER (PARTITION BY {entity_col}
                                    ORDER BY {time_col} DESC) AS rk
          FROM ({history_sql})
        )
        SELECT e AS {entity_col}, CAST(COUNT(*) AS BIGINT) AS n_versions,
               CAST(SUM(CASE WHEN rk > {retain_last} THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_expire,
               date_trunc('day', MIN(CASE WHEN rk <= {retain_last} THEN t END))
                 AS oldest_keep_day
        FROM ranked GROUP BY 1
    """
