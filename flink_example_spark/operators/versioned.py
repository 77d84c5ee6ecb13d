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
