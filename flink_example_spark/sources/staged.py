"""Staged text-format sources — CSV and JSONL ingestion parity.

The reference engine registers sources from collections and files
(SURVEY.md §2 S1/S5); production corpora additionally arrive as CSV and
JSONL drops. This module proves the engine ingests both formats
FAITHFULLY: the documents table round-trips parquet → csv/jsonl → Spark
reader, and a per-format checksum aggregate (row count + exact integer
sums + a portable md5-prefix text checksum, DESIGN.md hash-bucket
device) must come out identical across parquet, CSV, and JSONL — the
oracle computes the same three rows straight from the parquet table.

CSV notes: documents text embeds newlines and quotes, so the writer
quotes fields (escape='"', the RFC-4180 doubling convention DuckDB and
every warehouse reader agree on) and the reader sets multiLine=true
with an EXPLICIT schema (schema inference is a second corpus scan and a
type-drift hazard at 100 TB).

Scale: both readers are splittable Spark file sources (JSONL lines and
quoted-CSV with multiLine parse per-file; at 100 TB you shard into many
files, which is exactly how the staging writer lays them out — one file
per input partition).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flink_example_spark.operators.util import local_df
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _checksum(df: DataFrame, fmt: str) -> DataFrame:
    """One aggregate row proving content equality: exact integer sums
    plus the portable md5-prefix checksum of (doc_id|text)."""
    h = F.expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|', text)),"
        " 1, 8), 16, 10) AS BIGINT)"
    )
    return df.agg(
        F.lit(fmt).alias("format"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.sum("n_chars").cast("long").alias("sum_n_chars"),
        F.sum(h).cast("long").alias("text_checksum"),
    )


def csv_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents as CSV and JSONL, read both back, and emit the
    three per-format checksum rows (parquet / csv / jsonl) — identical
    iff both text-format ingest paths are lossless."""
    from flink_example_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="staged_fmt_")
    try:
        csv_dir = os.path.join(tmp, "csv")
        jsonl_dir = os.path.join(tmp, "jsonl")
        (
            docs.write.mode("overwrite")
            .option("header", True)
            .option("quoteAll", True)
            .option("escape", '"')
            .csv(csv_dir)
        )
        docs.write.mode("overwrite").json(jsonl_dir)
        csv_df = (
            spark.read.schema(DOC_SCHEMA)
            .option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .csv(csv_dir)
        )
        jsonl_df = spark.read.schema(DOC_SCHEMA).json(jsonl_dir)
        out = (
            _checksum(docs, "parquet")
            .unionByName(_checksum(csv_df, "csv"))
            .unionByName(_checksum(jsonl_df, "jsonl"))
        )
        # the staged files are temp-dir scratch: materialize before cleanup
        rows = out.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # LocalTableScan, not a 32-python-task literal scan (r14 local_df)
    return local_df(
        spark,
        rows,
        "format string, n_rows long, sum_doc_id long, sum_n_chars long,"
        " text_checksum long",
    )


def csv_jsonl_roundtrip_oracle() -> str:
    """DuckDB twin: the three rows computed straight from the parquet
    table — equality proves the staged CSV/JSONL reads were lossless."""
    one = """
        SELECT '{fmt}' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
               CAST(SUM(CAST(concat('0x', substr(md5(concat(
                 CAST(doc_id AS VARCHAR), '|', text)), 1, 8)) AS BIGINT))
                 AS BIGINT) AS text_checksum
        FROM documents
    """
    return " UNION ALL ".join(
        one.format(fmt=f) for f in ("parquet", "csv", "jsonl")
    )


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage documents as ORC (Spark-native columnar sibling of parquet),
    read it back, and emit the two per-format checksum rows — identical
    iff the ORC ingest path is lossless. Avro is NOT exercised: the
    spark-avro module is an external jar absent from this environment
    (verified; re-verified 2026-08-16 — only the avro core libs ship,
    not the DataSource; gate documented here rather than stubbed)."""
    from flink_example_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="staged_orc_")
    try:
        orc_dir = os.path.join(tmp, "orc")
        docs.write.mode("overwrite").orc(orc_dir)
        orc_df = spark.read.schema(DOC_SCHEMA).orc(orc_dir)
        out = _checksum(docs, "parquet").unionByName(_checksum(orc_df, "orc"))
        rows = out.collect()  # temp-dir scratch: materialize before cleanup
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # LocalTableScan, not a 32-python-task literal scan (r14 local_df)
    return local_df(
        spark,
        rows,
        "format string, n_rows long, sum_doc_id long, sum_n_chars long,"
        " text_checksum long",
    )


def orc_roundtrip_oracle() -> str:
    """DuckDB twin: both rows computed straight from the parquet table."""
    one = """
        SELECT '{fmt}' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
               CAST(SUM(CAST(concat('0x', substr(md5(concat(
                 CAST(doc_id AS VARCHAR), '|', text)), 1, 8)) AS BIGINT))
                 AS BIGINT) AS text_checksum
        FROM documents
    """
    return " UNION ALL ".join(one.format(fmt=f) for f in ("parquet", "orc"))


def partitioned_pruning_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read parity: stage
    documents partitioned by ``lang``, read back with a partition filter,
    and emit per-slice checksum rows (full corpus, lang='en' via the
    partition column, lang='en' from the flat parquet) — the middle row
    proves the partition-encoded path reproduces the data EXACTLY (the
    partition value round-trips through directory names, not file
    contents). The pruned scan is also plan-pinned in
    tests/test_plan_regressions.py (PartitionFilters, one directory)."""
    from flink_example_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="staged_part_")
    try:
        pdir = os.path.join(tmp, "bylang")
        docs.write.mode("overwrite").partitionBy("lang").parquet(pdir)
        back = spark.read.schema(DOC_SCHEMA).parquet(pdir)
        out = (
            _checksum(docs, "flat_all")
            .unionByName(_checksum(back.filter(F.col("lang") == "en"), "part_en"))
            .unionByName(_checksum(docs.filter(F.col("lang") == "en"), "flat_en"))
        )
        rows = out.collect()  # temp-dir scratch: materialize before cleanup
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # LocalTableScan, not a 32-python-task literal scan (r14 local_df)
    return local_df(
        spark,
        rows,
        "format string, n_rows long, sum_doc_id long, sum_n_chars long,"
        " text_checksum long",
    )


def partitioned_pruning_oracle() -> str:
    """DuckDB twin: all three rows straight from the parquet table."""
    one = """
        SELECT '{fmt}' AS format, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
               CAST(SUM(CAST(concat('0x', substr(md5(concat(
                 CAST(doc_id AS VARCHAR), '|', text)), 1, 8)) AS BIGINT))
                 AS BIGINT) AS text_checksum
        FROM documents {where}
    """
    return " UNION ALL ".join(
        one.format(fmt=f, where=w)
        for f, w in (
            ("flat_all", ""),
            ("part_en", "WHERE lang = 'en'"),
            ("flat_en", "WHERE lang = 'en'"),
        )
    )
