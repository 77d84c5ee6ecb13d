"""Data model: EventTable and table loading.

Reference mapping (SURVEY.md §1): a Flink "event table" is a row stream with a
declared schema, an event-time column, and a watermark (App.java:116-122).
In Spark the DataFrame *is* the table and the stream; :class:`EventTable`
just carries the event-time (and optional key) metadata alongside it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Harness parquet has stored timestamps as INT64 TIMESTAMP(NANOS) — which
# Spark reads (under spark.sql.legacy.parquet.nanosAsLong) as plain longs —
# or, in newer harness builds, as native timestamp[us]. ``normalize_ts``
# converts ONLY when the column actually arrives as a long, so both layouts
# load identically. Integer `div` (not `/`) keeps full precision: int64 ns
# exceeds double's 53-bit mantissa. Flooring ns→µs matches DuckDB's own
# TIMESTAMP_NS→TIMESTAMP cast, so oracles agree.
TIMESTAMP_NS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def normalize_ts(df: DataFrame, *cols: str) -> DataFrame:
    """Normalize timestamp columns to TIMESTAMP_NTZ regardless of how the
    parquet stored them (int64-nanos vs native µs). The ONLY place that
    knows about the harness timestamp layout — both the batch loader and
    the streaming ingest (``streaming/pipeline.py:stream_events``) go
    through here, so the two paths cannot diverge."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for col in cols:
        dt = dtypes.get(col)
        if dt == "bigint":
            df = df.withColumn(
                col,
                F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast("timestamp_ntz"),
            )
        elif dt == "timestamp":
            df = df.withColumn(col, F.col(col).cast("timestamp_ntz"))
    return df


@dataclass(frozen=True)
class EventTable:
    """A DataFrame tagged with event-time (and optionally key) columns.

    Mirrors the reference's view registration carrying watermark + primary-key
    metadata (``createTemporaryView`` with ``Schema.newBuilder`` watermark /
    primaryKey, App.java:99-122, 166-172). ``watermark_delay`` maps the
    reference's zero-lateness ``watermark("ts", "ts")`` (App.java:121).
    """

    df: DataFrame
    time_col: str
    key_col: str | None = None
    watermark_delay: str = "0 seconds"
    name: str | None = None

    def with_time(self, time_col: str) -> "EventTable":
        """Event-time reassignment — replaces App.java:216-225's bridge dance."""
        return replace(self, time_col=time_col)

    def register(self, name: str | None = None) -> "EventTable":
        n = name or self.name
        if not n:
            raise ValueError("EventTable.register needs a name")
        self.df.createOrReplaceTempView(n)
        return replace(self, name=n)

    def with_watermark(self) -> DataFrame:
        """Streaming view: declare the watermark (T1, App.java:121)."""
        return self.df.withWatermark(self.time_col, self.watermark_delay)


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLE_NAMES,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load the harness parquet tables and (optionally) register temp views.

    Parquet scans get predicate pushdown / column pruning from Catalyst for
    free — callers should select/filter on the returned DataFrames and let
    the optimizer prune the scan.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if df is None:
            continue
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


# DataFrame cache keyed by (session, sf_dir, table): avoids re-reading
# parquet footers and re-running tune() for every query in a suite run.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    """Load one harness table, normalizing timestamp columns (either parquet
    layout) via :func:`normalize_ts`."""
    from flink_example_spark.session import tune

    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached

    tune(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if not os.path.exists(path):
        return None
    df = spark.read.parquet(path)
    cols = [c for c in TIMESTAMP_NS_COLUMNS.get(name, ()) if c in df.columns]
    df = normalize_ts(df, *cols)
    _TABLE_CACHE[key] = df
    return df
