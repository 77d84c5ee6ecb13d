"""Semi-structured (JSON / VARIANT) extraction over event payloads.

The reference's events carry a free-form ``props`` JSON string; a Spark-4
pipeline ingests that as VARIANT — ``parse_json`` once, then typed
``variant_get`` path reads — which keeps the payload binary-encoded and
lets Catalyst prune/push the typed extractions (the lakehouse
semi-structured shape; per-row get_json_object string re-parsing is the
slow path it replaces).

Engine portability: extractions surface as BIGINT/STRING scalars, so
results hash-check against DuckDB's ``json_extract`` over the same
documents; VARIANT is the Spark-side encoding, not part of the contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_json(
    df: DataFrame,
    json_col: str,
    fields: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Typed per-row projection of JSON paths: one ``parse_json`` into a
    VARIANT, then a ``try_variant_get`` per requested field (missing paths
    and type mismatches yield NULL, DuckDB ``->>`` + CAST semantics).

    ``fields``: (output column, JSON path like ``$.k``, Spark type name).
    All non-JSON columns pass through.
    """
    v = F.parse_json(F.col(json_col))
    keep = [c for c in df.columns if c != json_col]
    return df.select(
        *keep,
        *[F.try_variant_get(v, path, typ).alias(name) for name, path, typ in fields],
    )


def props_stats(
    events: DataFrame,
    group_col: str = "event_type",
    json_col: str = "props",
    path: str = "$.k",
) -> DataFrame:
    """Per-group profile of a numeric JSON field: row/presence counts and
    integer min/max/sum/distinct — the payload-health dashboard an ingest
    pipeline keeps over a semi-structured feed. One hash-aggregate; the
    VARIANT parse happens once per row inside the projection."""
    ev = events.select(
        F.col(group_col).alias("g"),
        F.try_variant_get(F.parse_json(F.col(json_col)), path, "bigint").alias("k"),
    )
    return ev.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_field"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.countDistinct("k").alias("n_distinct_k"),
    ).select(F.col("g").alias(group_col), *[
        c for c in ["n_events", "n_with_field", "sum_k", "min_k", "max_k", "n_distinct_k"]
    ])


def props_stats_oracle(
    table: str = "events",
    group_col: str = "event_type",
    json_col: str = "props",
    path: str = "$.k",
) -> str:
    """DuckDB twin of ``props_stats`` (``->>`` text extraction + CAST;
    SUM/COUNT widened back to BIGINT per the HUGEINT rule)."""
    return f"""
        WITH ev AS (
          SELECT {group_col} AS g,
                 CAST({json_col} ->> '{path}' AS BIGINT) AS k
          FROM {table}
        )
        SELECT g AS {group_col},
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(k) AS BIGINT) AS n_with_field,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               MIN(k) AS min_k,
               MAX(k) AS max_k,
               CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
        FROM ev GROUP BY g
    """


def flatten_json_oracle(
    table: str = "events",
    json_col: str = "props",
    keep: Sequence[str] = ("event_id", "event_type"),
    fields: Sequence[tuple[str, str, str]] = (("k", "$.k", "BIGINT"),),
) -> str:
    """DuckDB twin of ``flatten_json`` for BIGINT/VARCHAR fields."""
    cols = ", ".join(keep)
    ext = ", ".join(
        f"CAST({json_col} ->> '{path}' AS {typ.upper()}) AS {name}"
        for name, path, typ in fields
    )
    return f"SELECT {cols}, {ext} FROM {table}"
