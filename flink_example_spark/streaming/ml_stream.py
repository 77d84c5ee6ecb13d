"""Streaming model fitting: OLS maintained over a live document stream.

The normal-equation sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) are
plain commutative BIGINT sums, so "training" streams as ONE JVM-state
grouped aggregation — no watermark needed (the stats are a monoid), no
Python anywhere. The closed-form slope/intercept/r² projection sits
stateless on top, re-evaluated on each emission; the bounded replay
converges EXACTLY to the batch ``ml.linear_fit`` and shares its oracle.

This is the live calibration loop an ingest pipeline runs: the
chars-per-token model updates continuously as documents arrive, and any
snapshot of the output table is a valid fit of everything seen so far.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.operators.ml import fit_from_stats
from flink_example_spark.session import shuffle_partitions, tune


def streaming_linear_fit(
    doc_stream: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Complete-mode streaming OLS: same output columns as the batch
    ``linear_fit`` (grp, n, slope, intercept, r2)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    stats = doc_stream.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    return fit_from_stats(stats)


def run_streaming_linear_fit(
    spark: SparkSession, sf_dir: str, chunks: int = 3
) -> DataFrame:
    """Bounded replay of the documents table through the streaming fit;
    converges exactly to the batch per-language chars~tokens calibration."""
    from flink_example_spark.operators.text import normalized, tokens
    from flink_example_spark.streaming.dedup_stream import _stage_by_id

    tune(spark)
    tmpdir, schema = _stage_by_id(spark, sf_dir, chunks)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/chunk_*")
    )
    src = stream.select(
        "lang",
        "n_chars",
        F.size(F.array_remove(tokens(normalized(F.col("text"))), "")).alias("n_tok"),
    )
    out = streaming_linear_fit(src, "lang", "n_tok", "n_chars")
    name = f"stream_fit_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            out.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
