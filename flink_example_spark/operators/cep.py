"""Complex-event-processing patterns over DataFrame ops.

The reference engine's ecosystem (Flink) ships a CEP library — `A
followedBy B followedBy C within T` patterns, `times(n).within(t)`
bursts — that Spark has no builtin for. These operators re-express the
two workhorse CEP shapes as pure DataFrame compositions:

- ``funnel`` — the ordered-sequence pattern with greedy
  earliest-completion semantics (Flink CEP's skip-till-next-match, and
  the standard product-analytics funnel definition): step 1 matches the
  key's earliest step-1 event; each later step matches the earliest
  event STRICTLY after the previous step's match and within
  ``within_sec`` of the step-1 match.
- ``event_bursts`` — the count-within-window pattern (`times(n)
  .within(w)`): emit an alert row for every event that is the n-th or
  later matching event within the trailing w seconds for its key.

Determinism: all time arithmetic runs on exact INTEGER epoch
microseconds (Spark ``unix_micros`` ↔ DuckDB ``epoch_us``) — second-
granular epoch functions round differently across engines (Spark
truncates, DuckDB keeps the fraction), so they never appear here. The
only aggregates are MIN/COUNT over exact values.

Scale shape: ``funnel`` is k-1 chained {filtered-join → per-key MIN}
stages, every shuffle on the key with map-side partial aggregation; the
frontier relation is one row per surviving key, so each stage joins
frontier-sized state against one step's events (the step filter pushes
to the scan). ``event_bursts`` is one per-key range-frame window over
the filtered event type — a single shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _prep(events, key_col, ts_col, type_col):
    # NTZ -> TIMESTAMP cast is exact under the engine's pinned-UTC session
    # (DESIGN.md round 5); unix_micros rejects TIMESTAMP_NTZ outright.
    return events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(type_col).alias("et"),
    )


def _frontier_chain(ev, steps, within_sec):
    """Yield the frontier DataFrame after each step (greedy semantics)."""
    frontier = (
        ev.filter(F.col("et") == steps[0])
        .groupBy("key")
        .agg(F.min("ts").alias("t_1"), F.min("__us").alias("u_1"))
    )
    yield frontier
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("et") == step)
        prev_cols = [f"t_{j}" for j in range(1, i)]
        frontier = (
            nxt.join(frontier, "key")
            .filter(
                (F.col("__us") > F.col(f"u_{i - 1}"))
                & (F.col("__us") <= F.col("u_1") + F.lit(within_sec * 1_000_000))
            )
            .groupBy("key", "u_1", *prev_cols)
            .agg(F.min("ts").alias(f"t_{i}"), F.min("__us").alias(f"u_{i}"))
        )
        yield frontier


def funnel(
    events: DataFrame,
    steps: list[str],
    within_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Greedy earliest-completion funnel: one row per key that completes
    every step in order within ``within_sec`` of its first-step match.

    Output: (key, t_1 .. t_k, duration_us) where t_i is step i's matched
    event time and duration_us = micros(t_k) - micros(t_1) (BIGINT).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    ev = _prep(events, key_col, ts_col, type_col)
    *_, last = _frontier_chain(ev, steps, within_sec)
    k = len(steps)
    return last.select(
        "key",
        *[f"t_{j}" for j in range(1, k + 1)],
        (F.col(f"u_{k}") - F.col("u_1")).cast("long").alias("duration_us"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    within_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel chart: per-step surviving-key counts under the same
    greedy semantics — the frontier after step i is exactly the keys
    that reached step i. Output: (step_idx, step, n_keys)."""
    ev = _prep(events, key_col, ts_col, type_col)
    counts = None
    for i, frontier in enumerate(_frontier_chain(ev, steps, within_sec), start=1):
        c = frontier.groupBy().agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(steps[i - 1]).alias("step"),
            "n_keys",
        )
        counts = c if counts is None else counts.union(c)
    return counts


def funnel_oracle(
    steps: list[str],
    within_sec: int,
    counts: bool = False,
    table: str = "events",
) -> str:
    """DuckDB twin of ``funnel`` / ``funnel_counts`` — the same chained
    frontier CTEs, MATERIALIZED (each frontier feeds the next stage and,
    in counts mode, the final union; DuckDB inlines per consumer)."""
    within_us = within_sec * 1_000_000
    ctes = [
        f"""f1 AS MATERIALIZED (
          SELECT user_id AS key, MIN(ts) AS t_1,
                 MIN(epoch_us(ts)) AS u_1
          FROM {table} WHERE event_type = '{steps[0]}' GROUP BY 1
        )"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev_ts = ", ".join(f"p.t_{j}" for j in range(1, i))
        ctes.append(
            f"""f{i} AS MATERIALIZED (
          SELECT p.key, p.u_1, {prev_ts},
                 MIN(e.ts) AS t_{i}, MIN(epoch_us(e.ts)) AS u_{i}
          FROM {table} e JOIN f{i - 1} p ON e.user_id = p.key
          WHERE e.event_type = '{step}'
            AND epoch_us(e.ts) > p.u_{i - 1}
            AND epoch_us(e.ts) <= p.u_1 + {within_us}
          GROUP BY ALL
        )"""
        )
    chain = ",\n        ".join(ctes)
    k = len(steps)
    if counts:
        selects = [
            f"SELECT CAST({i} AS INTEGER) AS step_idx, '{s}' AS step, "
            f"CAST(COUNT(*) AS BIGINT) AS n_keys FROM f{i}"
            for i, s in enumerate(steps, start=1)
        ]
        body = "\n        UNION ALL\n        ".join(selects)
        return f"WITH {chain}\n        {body}"
    ts_cols = ", ".join(f"t_{j}" for j in range(1, k + 1))
    return f"""WITH {chain}
        SELECT key, {ts_cols},
               CAST(u_{k} - u_1 AS BIGINT) AS duration_us
        FROM f{k}
    """


def event_bursts(
    events: DataFrame,
    event_type: str,
    n: int,
    within_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """`times(n).within(w)` alert pattern: for each key, emit every
    ``event_type`` event with >= ``n`` matching events (itself included)
    in the trailing ``within_sec`` seconds. Output:
    (key, event_id, ts, n_in_window).

    One range-frame window over integer epoch microseconds per key —
    ties at identical timestamps fall inside each other's frame, so the
    count is a deterministic function of the event multiset.
    """
    ev = events.filter(F.col(type_col) == event_type).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("__us")
        .rangeBetween(-within_sec * 1_000_000, 0)
    )
    return (
        ev.withColumn("n_in_window", F.count(F.lit(1)).over(w).cast("long"))
        .filter(F.col("n_in_window") >= n)
        .select("key", "event_id", "ts", "n_in_window")
    )


def event_bursts_oracle(
    event_type: str,
    n: int,
    within_sec: int,
    table: str = "events",
) -> str:
    """DuckDB twin of ``event_bursts`` (same integer micros range frame)."""
    return f"""
        SELECT key, event_id, ts, n_in_window FROM (
          SELECT user_id AS key, event_id, ts,
                 CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN {within_sec * 1_000_000} PRECEDING
                     AND CURRENT ROW
                 ) AS BIGINT) AS n_in_window
          FROM {table} WHERE event_type = '{event_type}'
        ) WHERE n_in_window >= {n}
    """


def funnel_without(
    events: DataFrame,
    steps: list[str],
    within_sec: int,
    forbidden: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Negative CEP pattern — Flink's ``notFollowedBy``: keep only funnel
    completions with NO forbidden-type event STRICTLY inside (t_1, t_k)
    (e.g. signup -> purchase with no error in between).

    One left-anti range join of the completion-sized funnel relation
    against the forbidden events (filter pushed to the scan) — the
    anti side never shuffles more than the forbidden postings.
    """
    f = funnel(events, steps, within_sec, key_col, ts_col, type_col)
    k = len(steps)
    bad = events.filter(F.col(type_col).isin(list(forbidden))).select(
        F.col(key_col).alias("__bk"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__bus"),
    )
    lo = F.unix_micros(F.col("t_1").cast("timestamp"))
    hi = F.unix_micros(F.col(f"t_{k}").cast("timestamp"))
    return f.join(
        bad,
        (F.col("key") == F.col("__bk"))
        & (F.col("__bus") > lo)
        & (F.col("__bus") < hi),
        "left_anti",
    )


def funnel_without_oracle(
    steps: list[str],
    within_sec: int,
    forbidden: list[str],
    table: str = "events",
) -> str:
    """DuckDB twin of ``funnel_without`` (NOT EXISTS over the same strict
    micros bounds)."""
    k = len(steps)
    types = ", ".join(f"'{t}'" for t in forbidden)
    return f"""
        WITH fm AS ({funnel_oracle(steps, within_sec, table=table)})
        SELECT * FROM fm WHERE NOT EXISTS (
          SELECT 1 FROM {table} e
          WHERE e.user_id = fm.key AND e.event_type IN ({types})
            AND epoch_us(e.ts) > epoch_us(fm.t_1)
            AND epoch_us(e.ts) < epoch_us(fm.t_{k})
        )
    """


def consecutive_runs(
    events: DataFrame,
    event_type: str,
    min_len: int = 2,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """STRICT-contiguity pattern — Flink CEP's ``next()`` as opposed to
    ``followedBy``: maximal runs of >= ``min_len`` CONSECUTIVE
    ``event_type`` events in each key's event sequence (no other event
    type in between). The relational islands trick: two ROW_NUMBERs over
    the same (key, time, id) order differ by a constant inside a run, so
    the difference is the island id — one shuffle, two window passes in
    a single Window stage, one aggregate.

    Output: (key, run_start, run_len) per qualifying maximal run, where
    run_start is the first event's time. Ordering ties break on the
    event id (unique), so islands are fully deterministic.
    """
    ev = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__us"),
        F.col(id_col).alias("__id"),
        (F.col(type_col) == event_type).alias("__m"),
    )
    w_all = Window.partitionBy("key").orderBy("__us", "__id")
    w_typ = Window.partitionBy("key", "__m").orderBy("__us", "__id")
    runs = (
        ev.withColumn("__island", F.row_number().over(w_all) - F.row_number().over(w_typ))
        .filter(F.col("__m"))
        .groupBy("key", "__island")
        .agg(
            F.min("ts").alias("run_start"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
        )
    )
    return runs.filter(F.col("run_len") >= min_len).select(
        "key", "run_start", "run_len"
    )


def consecutive_runs_oracle(
    event_type: str, min_len: int = 2, table: str = "events"
) -> str:
    """DuckDB twin of ``consecutive_runs`` (same islands construction)."""
    return f"""
        WITH seq AS (
          SELECT user_id AS key, ts,
                 (event_type = '{event_type}') AS m,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id,
                                          (event_type = '{event_type}')
                                      ORDER BY epoch_us(ts), event_id)
                   AS island
          FROM {table}
        )
        SELECT key, MIN(ts) AS run_start,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM seq WHERE m GROUP BY key, island
        HAVING COUNT(*) >= {min_len}
    """


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    window: str = "3 days",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Marketing-style last-touch attribution: credit each conversion event
    to the user's most recent touch event at-or-before it (within
    ``window``), then roll up conversions and exact value per channel —
    the event-time pattern behind every campaign-ROI pipeline, and a
    direct composition of the repo's as-of join (the touch history IS a
    versioned relation keyed by user).

    Conversions with no in-window touch credit the ``'direct'`` channel.
    Output: ``(channel, n_conversions, value_sum)`` with the decimal-
    accumulate / double-output sum rule. Touch ties at one (user, instant)
    would be ambiguous; the harness events carry unique (user, ts) pairs —
    feed a deduplicated touch relation otherwise.

    Scale: exactly the as-of join's cost (one exchange over the
    union-of-sides) plus a channel-grain aggregation; the tolerance is a
    post-filter on the matched row, never a second join.
    """
    from flink_example_spark.operators.asof import asof_join

    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col(key_col).alias("_entity"),
        F.col(ts_col).alias("_conv_time"),
        F.col(value_col).alias("_v"),
    )
    touches = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col(key_col).alias("_entity"),
        F.col(ts_col).alias("_change_time"),
        F.col("event_type").alias("_channel"),
    )
    joined = asof_join(
        conv, touches, on="_entity", probe_time="_conv_time", tolerance=window
    )
    return (
        joined.groupBy(F.coalesce(F.col("_channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.col("_v").cast("decimal(18,2)")).cast("double").alias("value_sum"),
        )
    )


def last_touch_oracle(
    conversion_type: str,
    touch_types: list[str],
    window_sql: str = "INTERVAL 3 DAY",
) -> str:
    touches = ", ".join(f"'{t}'" for t in touch_types)
    return f"""
        WITH conv AS (
          SELECT user_id, ts AS conv_time, value AS v FROM events
          WHERE event_type = '{conversion_type}'
        ), touch AS (
          SELECT user_id, ts AS touch_time, event_type AS channel FROM events
          WHERE event_type IN ({touches})
        ), attributed AS (
          SELECT conv.v,
                 CASE WHEN touch.touch_time >= conv.conv_time - {window_sql}
                      THEN touch.channel END AS channel
          FROM conv ASOF LEFT JOIN touch
            ON conv.user_id = touch.user_id AND conv.conv_time >= touch.touch_time
        )
        SELECT COALESCE(channel, 'direct') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM attributed GROUP BY 1
    """


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over each key's event
    sequence: count (current type → next type) steps, with the maximum-
    likelihood transition probability — the clickstream model behind
    next-action prediction, anomaly scoring, and session simulators.
    Output: ``(from_type, to_type, n, p)``.

    Ordering is (ts, seq) — the same deterministic LSN tiebreak the CDC
    operator uses. ``p`` = n / row-total is one exact-integer division per
    cell. One window stage over the per-key sort (single Exchange), then a
    type-grain aggregation — the matrix is |types|² rows no matter the
    event count, so the probability join broadcasts.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))
    steps = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        ).filter(F.col("to_type").isNotNull())
    )
    counts = steps.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("__tot")).alias("p"),
        )
    )


def event_transitions_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> str:
    return f"""
        WITH steps AS (
          SELECT {type_col} AS from_type,
                 LEAD({type_col}) OVER (PARTITION BY {key_col}
                                        ORDER BY {ts_col}, {seq_col}) AS to_type
          FROM {table}
        ), counts AS MATERIALIZED (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
        FROM counts
    """


def retention_cohorts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the ``bucket`` of their
    FIRST event (the cohort), tracked by how many are still active N
    buckets later — the product-analytics table every growth dashboard is
    built on. Output: ``(cohort, week_offset, n_active, cohort_size,
    retention)``; offset-0 rows are each cohort's size by construction.

    ``week_offset`` is the exact integer epoch-micros difference divided by the
    bucket span (weeks are fixed 604800s — month buckets would need
    calendar arithmetic, same plan). ``retention`` = n_active/cohort_size
    is one exact division.

    Scale: one per-key min aggregation (the cohort assignment), one
    distinct (key, bucket) activity relation, a broadcast of the
    key→cohort map... which is key-cardinality-sized — at 100 TB swap the
    broadcast for a shuffled equi-join, same plan otherwise; the output is
    cohorts × offsets, tiny.
    """
    t = F.col(ts_col)
    wk = F.date_trunc(bucket, t)
    # one events scan: the distinct (key, week) activity relation feeds
    # BOTH the cohort assignment (min week) and the activity cells — the
    # multi-consumer recompute cut (DESIGN.md); key·week-sized, cheap
    active = (
        events.select(F.col(key_col).alias("__k"), wk.alias("__w"))
        .distinct()
        .localCheckpoint()
    )
    first = active.groupBy("__k").agg(F.min("__w").alias("cohort"))
    span = {"week": 604800, "day": 86400}[bucket]
    off = (
        (
            F.unix_micros(F.col("__w").cast("timestamp"))
            - F.unix_micros(F.col("cohort").cast("timestamp"))
        )
        / F.lit(span * 1_000_000)
    ).cast("long")
    cells = (
        active.join(first, "__k")
        .groupBy("cohort", off.alias("week_offset"))
        .agg(F.count_distinct("__k").alias("n_active"))
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias("retention"),
        )
    )


def retention_cohorts_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> str:
    span = {"week": 604800, "day": 86400}[bucket]
    return f"""
        WITH fc AS MATERIALIZED (
          SELECT {key_col} AS k, MIN(date_trunc('{bucket}', {ts_col})) AS cohort
          FROM {table} GROUP BY 1
        ), active AS (
          SELECT DISTINCT {key_col} AS k, date_trunc('{bucket}', {ts_col}) AS w
          FROM {table}
        ), cells AS (
          SELECT cohort,
                 CAST((epoch_us(w) - epoch_us(cohort)) / {span * 1_000_000} AS BIGINT)
                   AS week_offset,
                 CAST(COUNT(DISTINCT k) AS BIGINT) AS n_active
          FROM active JOIN fc USING (k)
          GROUP BY 1, 2
        ), sizes AS (
          SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM fc GROUP BY 1
        )
        SELECT cohort, week_offset, n_active, cohort_size,
               CAST(n_active AS DOUBLE) / cohort_size AS retention
        FROM cells JOIN sizes USING (cohort)
    """


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    within_sec: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution per funnel transition: for keys that
    COMPLETE the funnel, the exact interpolated p25/p50/p75/p90 of each
    adjacent-step gap plus the total duration — the "where does the
    funnel stall" diagnostic next to :func:`funnel_counts`' "where does
    it leak". Output: ``(transition, n, p25_us, p50_us, p75_us, p90_us)``.

    Gaps are integer micros; the percentiles are the engine-portable
    interpolated QUANTILE_CONT over exact integers. One stack-explode of
    the funnel relation (completion-sized) + one transition-grain
    aggregation on top of the funnel's own plan.
    """
    f = funnel(events, steps, within_sec, key_col, ts_col, type_col)
    k = len(steps)
    mic = lambda j: F.unix_micros(F.col(f"t_{j}").cast("timestamp"))
    arms = [
        F.struct(
            F.lit(f"{steps[j - 1]}->{steps[j]}").alias("transition"),
            (mic(j + 1) - mic(j)).alias("gap_us"),
        )
        for j in range(1, k)
    ] + [F.struct(F.lit("total").alias("transition"), F.col("duration_us").alias("gap_us"))]
    gaps = f.select(F.explode(F.array(*arms)).alias("__g")).select(
        "__g.transition", "__g.gap_us"
    )
    return gaps.groupBy("transition").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(F.col("gap_us"), F.lit(0.25)).alias("p25_us"),
        F.percentile(F.col("gap_us"), F.lit(0.5)).alias("p50_us"),
        F.percentile(F.col("gap_us"), F.lit(0.75)).alias("p75_us"),
        F.percentile(F.col("gap_us"), F.lit(0.9)).alias("p90_us"),
    )


def funnel_latency_oracle(
    steps: list[str], within_sec: int, table: str = "events"
) -> str:
    base = funnel_oracle(steps, within_sec, table=table)
    arms = [
        f"SELECT '{steps[j - 1]}->{steps[j]}' AS transition, "
        f"epoch_us(t_{j + 1}) - epoch_us(t_{j}) AS gap_us FROM f"
        for j in range(1, len(steps))
    ] + ["SELECT 'total' AS transition, duration_us AS gap_us FROM f"]
    return f"""
        WITH f AS MATERIALIZED ({base}),
        gaps AS ({" UNION ALL ".join(arms)})
        SELECT transition, CAST(COUNT(*) AS BIGINT) AS n,
               QUANTILE_CONT(gap_us, 0.25) AS p25_us,
               QUANTILE_CONT(gap_us, 0.5) AS p50_us,
               QUANTILE_CONT(gap_us, 0.75) AS p75_us,
               QUANTILE_CONT(gap_us, 0.9) AS p90_us
        FROM gaps GROUP BY transition
    """


def rfm_segments(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic product-analytics rollup. Each user scores 1-4 on each axis
    against the GLOBAL quartile boundaries of that axis, and users
    aggregate into at most 64 segments.

    Scale note: the naive formulation is ``NTILE(4)`` over all users —
    an unpartitioned window, i.e. a single-task total sort. This uses
    quartile BOUNDARIES instead (one global interpolated-percentile
    aggregate, broadcast back), so scoring is comparison-only and fully
    parallel — the same result class with no global sort. Ties sit on
    whichever side the boundary comparison puts them, identically in
    both engines.

    Portability: recency/frequency are integers; monetary sums in exact
    DECIMAL cents (BIGINT); boundaries are interpolated percentiles
    (PERCENTILE ≡ QUANTILE_CONT); every score is a comparison of an exact
    integer against those doubles.

    Output: ``(r_score, f_score, m_score, n_users, m_sum)``.
    """
    per_user = (
        events.select(
            F.col(key_col).alias("u"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            F.col(value_col).cast("decimal(18,2)").alias("v"),
        )
        .groupBy("u")
        .agg(
            F.max("us").alias("last_us"),
            F.count(F.lit(1)).alias("freq"),
            (F.sum("v") * 100).cast("bigint").alias("m_cents"),
        )
    )
    bounds = per_user.agg(
        *[
            F.percentile(F.col(c), F.lit(q)).alias(f"{c}_{int(q * 100)}")
            for c in ("last_us", "freq", "m_cents")
            for q in (0.25, 0.5, 0.75)
        ]
    )

    def score(c: str) -> F.Column:
        x = F.col(c).cast("double")
        return (
            F.when(x >= F.col(f"{c}_75"), 4)
            .when(x >= F.col(f"{c}_50"), 3)
            .when(x >= F.col(f"{c}_25"), 2)
            .otherwise(1)
        )

    scored = per_user.crossJoin(F.broadcast(bounds)).select(
        score("last_us").alias("r_score"),
        score("freq").alias("f_score"),
        score("m_cents").alias("m_score"),
        "m_cents",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("m_cents").cast("double") / 100).alias("m_sum"),
    )


def rfm_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`rfm_segments`."""
    cases = {
        c: f"""CASE WHEN CAST({c} AS DOUBLE) >= b.{c}_75 THEN 4
                    WHEN CAST({c} AS DOUBLE) >= b.{c}_50 THEN 3
                    WHEN CAST({c} AS DOUBLE) >= b.{c}_25 THEN 2
                    ELSE 1 END"""
        for c in ("last_us", "freq", "m_cents")
    }
    return f"""
        WITH per_user AS MATERIALIZED (
          SELECT {key_col} AS u, MAX(epoch_us({ts_col})) AS last_us,
                 CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(CAST({value_col} AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS m_cents
          FROM {table} GROUP BY {key_col}
        ), b AS (
          SELECT
            QUANTILE_CONT(last_us, 0.25) AS last_us_25,
            QUANTILE_CONT(last_us, 0.50) AS last_us_50,
            QUANTILE_CONT(last_us, 0.75) AS last_us_75,
            QUANTILE_CONT(freq, 0.25) AS freq_25,
            QUANTILE_CONT(freq, 0.50) AS freq_50,
            QUANTILE_CONT(freq, 0.75) AS freq_75,
            QUANTILE_CONT(m_cents, 0.25) AS m_cents_25,
            QUANTILE_CONT(m_cents, 0.50) AS m_cents_50,
            QUANTILE_CONT(m_cents, 0.75) AS m_cents_75
          FROM per_user
        ), scored AS (
          SELECT {cases['last_us']} AS r_score,
                 {cases['freq']} AS f_score,
                 {cases['m_cents']} AS m_score,
                 m_cents
          FROM per_user CROSS JOIN b
        )
        SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(m_cents) AS DOUBLE) / 100 AS m_sum
        FROM scored GROUP BY r_score, f_score, m_score
    """


def rate_limit_audit(
    events: DataFrame,
    limit: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Ingestion quota audit: per (key, day) event counts against a
    ``limit``-per-day quota, rolled up per day — how much traffic a
    rate limiter set to N/key/day would drop. The throttled count is
    ``max(0, n - limit)`` per (key, day): a pure function of counts, so
    the relation is ORDER-FREE (which specific events get dropped is a
    policy choice; how many is not) and therefore exactly streamable as
    one monoid aggregation.

    Output per day: ``(day, n_events, n_throttled, n_keys_over)``.
    """
    per_key = (
        events.select(
            F.col(key_col).alias("k"),
            F.date_trunc("day", F.col(ts_col).cast("timestamp")).alias("day"),
        )
        .groupBy("k", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_key.groupBy("day").agg(
        F.sum("n").alias("n_events"),
        F.sum(F.greatest(F.lit(0), F.col("n") - limit)).alias("n_throttled"),
        F.sum((F.col("n") > limit).cast("bigint")).alias("n_keys_over"),
    )


def rate_limit_oracle(
    limit: int, table: str = "events", key_col: str = "user_id", ts_col: str = "ts"
) -> str:
    """DuckDB twin of :func:`rate_limit_audit`."""
    return f"""
        WITH per_key AS (
          SELECT {key_col} AS k, date_trunc('day', {ts_col}) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM {table} GROUP BY 1, 2
        )
        SELECT day, CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(SUM(greatest(0, n - {limit})) AS BIGINT) AS n_throttled,
               CAST(SUM(CASE WHEN n > {limit} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_keys_over
        FROM per_key GROUP BY day
    """


def dwell_times(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    cap_minutes: int = 60,
) -> DataFrame:
    """Per-event dwell time (time until the same user's NEXT event),
    rolled up per event type — the time-on-page metric. Dwell beyond
    ``cap_minutes`` is treated as session abandonment and excluded
    (the standard cap, since tail gaps measure absence, not attention).

    One per-key LEAD window in integer micros; percentiles are the
    interpolated PERCENTILE ≡ QUANTILE_CONT pair over exact BIGINT
    dwells. Output: ``(event_type, n_dwells, p50_s, p90_s, mean_s)``.
    """
    cap_us = cap_minutes * 60 * 1_000_000
    w = Window.partitionBy("u").orderBy("us", "seq")
    src = events.select(
        F.col(key_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(type_col).alias("et"),
    )
    dw = (
        src.withColumn("next_us", F.lead("us").over(w))
        .filter(F.col("next_us").isNotNull())
        .withColumn("dwell_us", F.col("next_us") - F.col("us"))
        .filter(F.col("dwell_us") <= cap_us)
    )
    return dw.groupBy(F.col("et").alias(type_col)).agg(
        F.count(F.lit(1)).alias("n_dwells"),
        (F.percentile(F.col("dwell_us"), F.lit(0.5)) / F.lit(1e6)).alias("p50_s"),
        (F.percentile(F.col("dwell_us"), F.lit(0.9)) / F.lit(1e6)).alias("p90_s"),
        (
            F.sum("dwell_us").cast("double") / F.count(F.lit(1)) / F.lit(1e6)
        ).alias("mean_s"),
    )


def dwell_times_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    cap_minutes: int = 60,
) -> str:
    """DuckDB twin of :func:`dwell_times`."""
    cap_us = cap_minutes * 60 * 1_000_000
    return f"""
        WITH src AS (
          SELECT {key_col} AS u, epoch_us({ts_col}) AS us, {seq_col} AS seq,
                 {type_col} AS et
          FROM {table}
        ), dw AS (
          SELECT et, next_us - us AS dwell_us FROM (
            SELECT et, us,
                   lead(us) OVER (PARTITION BY u ORDER BY us, seq) AS next_us
            FROM src
          ) WHERE next_us IS NOT NULL AND next_us - us <= {cap_us}
        )
        SELECT et AS {type_col}, CAST(COUNT(*) AS BIGINT) AS n_dwells,
               QUANTILE_CONT(dwell_us, 0.5) / 1e6 AS p50_s,
               QUANTILE_CONT(dwell_us, 0.9) / 1e6 AS p90_s,
               CAST(SUM(dwell_us) AS DOUBLE) / COUNT(*) / 1e6 AS mean_s
        FROM dw GROUP BY et
    """


def bucketized_band_join(
    events: DataFrame,
    probe_type: str = "error",
    match_type: str = "purchase",
    band_minutes: int = 30,
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """PURE time-band join (no equi key at all) made scalable by TIME
    BUCKETIZATION: every probe explodes into its bucket and the two
    adjacent buckets, the join becomes an equi-join on the bucket id,
    and the exact band predicate verifies — the standard rewrite that
    turns an O(n·m) nested-loop band join into one shuffle whose
    candidate mass is the band density. (The theta_band_join template
    shows the BNLJ plan this avoids; the equi+band range_join template
    covers the keyed case.)

    Semantics: for every ``probe_type`` event, how many ``match_type``
    events fall within ±``band_minutes`` ANYWHERE in the stream. All
    time math in integer micros. Output: ``(event_id, ts, n_nearby)``.
    """
    band_us = band_minutes * 60 * 1_000_000
    src = events.select(
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    probes = src.filter(F.col("et") == probe_type).select(
        "eid", "us", F.expr(f"us div {band_us}").alias("b0")
    )
    probes3 = probes.select(
        "eid",
        "us",
        F.explode(
            F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
        ).alias("b"),
    )
    matches = src.filter(F.col("et") == match_type).select(
        F.col("us").alias("mus"), F.expr(f"us div {band_us}").alias("b")
    )
    pairs = probes3.join(matches, "b").filter(
        F.abs(F.col("mus") - F.col("us")) <= band_us
    )
    return (
        probes.select("eid", "us")
        .join(
            pairs.groupBy("eid").agg(F.count(F.lit(1)).alias("n_nearby")),
            "eid",
            "left",
        )
        .select(
            F.col("eid").alias(id_col),
            F.timestamp_micros(F.col("us")).alias("ts"),
            F.coalesce(F.col("n_nearby"), F.lit(0)).alias("n_nearby"),
        )
    )


def bucketized_band_oracle(
    probe_type: str = "error",
    match_type: str = "purchase",
    band_minutes: int = 30,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`bucketized_band_join` — the PLAIN band join
    (DuckDB's IEJoin handles it directly; the bucketization is the Spark
    scale rewrite, the relation is identical)."""
    band_us = band_minutes * 60 * 1_000_000
    return f"""
        WITH src AS (
          SELECT event_id AS eid, event_type AS et, epoch_us(ts) AS us
          FROM {table}
        )
        SELECT p.eid AS event_id, make_timestamp(p.us) AS ts,
               CAST(COUNT(m.mus) AS BIGINT) AS n_nearby
        FROM (SELECT eid, us FROM src WHERE et = '{probe_type}') p
        LEFT JOIN (SELECT us AS mus FROM src WHERE et = '{match_type}') m
          ON abs(m.mus - p.us) <= {band_us}
        GROUP BY p.eid, p.us
    """


def markov_eval(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    holdout_mod: int = 2,
) -> DataFrame:
    """Held-out evaluation of the first-order Markov model
    (:func:`event_transitions`): train transition counts on keys with
    ``key % holdout_mod != 0``, score the holdout keys' transitions by
    integer surprisal ``log2(c_from / c_pair)`` — the
    ``length(bin(n div d)) - 1`` device (operators/text.py lm_surprisal),
    so every bit count is exact in any engine; transitions the training
    matrix never saw are reported separately (``n_unseen``) instead of
    being smoothed with a float prior.

    Output one row: ``(n_scored, n_unseen, total_bits, avg_bits)`` —
    avg_bits is the model's cross-entropy-style score in whole bits, the
    monitor a next-event predictor watches for drift.

    Scale: one per-key window sort per split, a |types|^2 broadcast join,
    two count aggregations.
    """
    kid = F.col(key_col)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(seq_col))

    def steps(part: DataFrame) -> DataFrame:
        return (
            part.select(
                F.col(type_col).alias("from_type"),
                F.lead(type_col).over(w).alias("to_type"),
            )
            .filter(F.col("to_type").isNotNull())
        )

    train = steps(events.filter(kid % holdout_mod != 0))
    test = steps(events.filter(kid % holdout_mod == 0))
    counts = train.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c_pair")
    )
    totals = counts.groupBy("from_type").agg(F.sum("c_pair").alias("c_from"))
    model = counts.join(F.broadcast(totals), "from_type")
    scored = test.join(
        F.broadcast(model), ["from_type", "to_type"], "left"
    ).select(
        F.when(
            F.col("c_pair").isNotNull(),
            F.length(F.bin(F.expr("c_from div c_pair"))) - F.lit(1),
        )
        .cast("bigint")
        .alias("bits")
    )
    return scored.agg(
        F.sum(F.col("bits").isNotNull().cast("bigint")).alias("n_scored"),
        F.sum(F.col("bits").isNull().cast("bigint")).alias("n_unseen"),
        F.coalesce(F.sum("bits"), F.lit(0).cast("bigint")).alias("total_bits"),
        (
            F.coalesce(F.sum("bits"), F.lit(0)).cast("double")
            / F.sum(F.col("bits").isNotNull().cast("bigint")).cast("double")
        ).alias("avg_bits"),
    )


def markov_eval_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    holdout_mod: int = 2,
) -> str:
    """DuckDB twin of :func:`markov_eval`."""
    def steps(pred: str) -> str:
        return f"""(
          SELECT from_type, to_type FROM (
            SELECT {type_col} AS from_type,
                   LEAD({type_col}) OVER (PARTITION BY {key_col}
                     ORDER BY {ts_col}, {seq_col}) AS to_type
            FROM {table} WHERE {key_col} % {holdout_mod} {pred}
          ) WHERE to_type IS NOT NULL
        )"""

    return f"""
        WITH counts AS MATERIALIZED (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS c_pair
          FROM {steps("<> 0")} GROUP BY 1, 2
        ), totals AS (
          SELECT from_type, CAST(SUM(c_pair) AS BIGINT) AS c_from
          FROM counts GROUP BY 1
        ), scored AS (
          SELECT CASE WHEN c.c_pair IS NOT NULL
                      THEN CAST(length(bin(t2.c_from // c.c_pair)) - 1
                                AS BIGINT) END AS bits
          FROM {steps("= 0")} t
          LEFT JOIN counts c USING (from_type, to_type)
          LEFT JOIN totals t2 ON t2.from_type = c.from_type
        )
        SELECT CAST(SUM(CASE WHEN bits IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_scored,
               CAST(SUM(CASE WHEN bits IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unseen,
               CAST(COALESCE(SUM(bits), 0) AS BIGINT) AS total_bits,
               CAST(COALESCE(SUM(bits), 0) AS DOUBLE)
                 / CAST(SUM(CASE WHEN bits IS NOT NULL THEN 1 ELSE 0 END)
                        AS DOUBLE) AS avg_bits
        FROM scored
    """


def top_paths(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_len: int = 8,
    topn: int = 20,
) -> DataFrame:
    """Top user journeys: the most frequent ordered event-type PATHS
    (one per user-day session, truncated to the first ``max_len``
    events) — the sequence-mining view behind every "common flows"
    funnel dashboard, and the full-path complement of the bigram
    ``transitions`` matrix.

    Determinism: events order by (micros, id) inside the session — the
    repo's total event order — and the path string materializes via an
    ORDERED aggregation in both engines (Spark: array_sort over
    (us, seq, type) structs, lexicographic == chronological because the
    sort key tuple leads; DuckDB: string_agg ORDER BY us, seq).
    Truncation to ``max_len`` uses a row_number rank, so both engines
    cut the identical prefix. Top-``topn`` by (n_sessions DESC, path) is
    a total order.

    Scale: one window pass keyed by session (user x day — bounded
    sessions by construction), one path-sized hash aggregation, one
    TakeOrderedAndProject. Path cardinality, not event cardinality,
    crosses the final shuffle.
    """
    day_us = 86_400_000_000
    src = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("seq"),
        F.col(type_col).alias("et"),
    ).withColumn("day", F.expr(f"us div {day_us}"))
    w = Window.partitionBy("k", "day").orderBy("us", "seq")
    ranked = src.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_len
    )
    paths = ranked.groupBy("k", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("us", "seq", "et"))),
                lambda s: s.et,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("k").cast("long").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(topn)
    )


def top_paths_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_len: int = 8,
    topn: int = 20,
) -> str:
    """DuckDB twin of :func:`top_paths`."""
    day_us = 86_400_000_000
    return f"""
        WITH src AS (
          SELECT {key_col} AS k, epoch_us({ts_col}) AS us,
                 {id_col} AS seq, {type_col} AS et,
                 epoch_us({ts_col}) // {day_us} AS day
          FROM {table}
        ),
        ranked AS (
          SELECT * FROM (
            SELECT k, day, us, seq, et,
                   ROW_NUMBER() OVER (PARTITION BY k, day ORDER BY us, seq)
                     AS rn
            FROM src
          ) WHERE rn <= {max_len}
        ),
        paths AS (
          SELECT k, day, string_agg(et, '>' ORDER BY us, seq) AS path
          FROM ranked GROUP BY 1, 2
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_users
        FROM paths GROUP BY 1
        ORDER BY n_sessions DESC, path
        LIMIT {topn}
    """


def session_surprisal(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    min_steps: int = 3,
    topn: int = 20,
) -> DataFrame:
    """Most-anomalous sessions under the corpus's own first-order Markov
    model — behavioral anomaly ranking: a session whose transitions are
    systematically improbable (high average surprisal) is the one a
    fraud/abuse reviewer opens first.

    The model is the full-corpus transition matrix
    (:func:`event_transitions` counts); each user-day session's steps
    score by the integer-log2 surprisal device ``length(bin(c_from div
    c_pair)) - 1`` (exact bits in any engine), and sessions rank by the
    integer rate ``(total_bits * 1000) div n_steps``. Sessions shorter
    than ``min_steps`` transitions are excluded (tiny denominators rank
    noise). Top-``topn`` by (rate DESC, key, day) is a total order.

    Scale: one per-(key, day) window pass, a |types|^2 broadcast model
    join, one session aggregation, one TakeOrderedAndProject.
    """
    day_us = 86_400_000_000
    src = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(seq_col).alias("seq"),
        F.col(type_col).alias("et"),
    ).withColumn("day", F.expr(f"us div {day_us}"))
    w = Window.partitionBy("k", "day").orderBy("us", "seq")
    steps = (
        src.select(
            "k",
            "day",
            F.col("et").alias("from_type"),
            F.lead("et").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .localCheckpoint(eager=False)  # model AND scoring both read it
    )
    counts = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c_pair")
    )
    totals = counts.groupBy("from_type").agg(F.sum("c_pair").alias("c_from"))
    model = counts.join(F.broadcast(totals), "from_type")
    scored = steps.join(F.broadcast(model), ["from_type", "to_type"]).select(
        "k",
        "day",
        (F.length(F.bin(F.expr("c_from div c_pair"))) - F.lit(1))
        .cast("bigint")
        .alias("bits"),
    )
    sess = (
        scored.groupBy("k", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.sum("bits").alias("total_bits"),
        )
        .filter(F.col("n_steps") >= min_steps)
        .withColumn("rate_milli", F.expr("(total_bits * 1000) div n_steps"))
    )
    return sess.select(
        F.col("k").alias(key_col),
        F.col("day").cast("long").alias("day"),
        "n_steps",
        "total_bits",
        "rate_milli",
    ).orderBy(F.col("rate_milli").desc(), key_col, "day").limit(topn)


def session_surprisal_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    min_steps: int = 3,
    topn: int = 20,
) -> str:
    """DuckDB twin of :func:`session_surprisal`."""
    day_us = 86_400_000_000
    return f"""
        WITH src AS (
          SELECT {key_col} AS k, epoch_us({ts_col}) AS us, {seq_col} AS seq,
                 {type_col} AS et, epoch_us({ts_col}) // {day_us} AS day
          FROM {table}
        ),
        steps AS MATERIALIZED (
          SELECT * FROM (
            SELECT k, day, et AS from_type,
                   lead(et) OVER (PARTITION BY k, day ORDER BY us, seq)
                     AS to_type
            FROM src
          ) WHERE to_type IS NOT NULL
        ),
        counts AS (
          SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS c_pair
          FROM steps GROUP BY 1, 2
        ),
        model AS (
          SELECT c.from_type, c.to_type, c.c_pair,
                 t.c_from
          FROM counts c JOIN (
            SELECT from_type, CAST(SUM(c_pair) AS BIGINT) AS c_from
            FROM counts GROUP BY 1
          ) t USING (from_type)
        ),
        scored AS (
          SELECT s.k, s.day,
                 CAST(length(bin(c_from // c_pair)) - 1 AS BIGINT) AS bits
          FROM steps s JOIN model USING (from_type, to_type)
        ),
        sess AS (
          SELECT k, day, CAST(COUNT(*) AS BIGINT) AS n_steps,
                 CAST(SUM(bits) AS BIGINT) AS total_bits
          FROM scored GROUP BY 1, 2
          HAVING COUNT(*) >= {min_steps}
        )
        SELECT k AS {key_col}, CAST(day AS BIGINT) AS day, n_steps,
               total_bits, (total_bits * 1000) // n_steps AS rate_milli
        FROM sess
        ORDER BY rate_milli DESC, {key_col}, day
        LIMIT {topn}
    """
