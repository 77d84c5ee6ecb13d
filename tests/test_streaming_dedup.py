"""Streaming dedup-on-ingest: the running aggregate must converge exactly
to the batch exact_dedup relation; the first-seen filter must keep exactly
one valid document per distinct content."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_example_spark.operators.dedup import exact_dedup
from flink_example_spark.streaming.dedup_stream import (
    run_streaming_exact_dedup,
    run_streaming_first_seen,
)
from flink_example_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_exact_dedup_converges_to_batch(spark):
    batch = exact_dedup(load_table(spark, SF, "documents"))
    streamed = run_streaming_exact_dedup(spark, SF, chunks=3)
    got = {(r["doc_id"], r["content_md5"], r["n_copies"]) for r in streamed.collect()}
    exp = {(r["doc_id"], r["content_md5"], r["n_copies"]) for r in batch.collect()}
    assert got == exp and len(got) > 0


def test_streaming_first_seen_semantics(spark):
    docs = load_table(spark, SF, "documents")
    kept = run_streaming_first_seen(spark, SF, chunks=3)
    # exactly one kept row per distinct content
    n_distinct = docs.select(F.md5("text")).distinct().count()
    assert kept.count() == n_distinct
    assert kept.select("content_md5").distinct().count() == n_distinct
    # every kept (hash, id) is a genuine holder of that content
    holders = docs.select(F.md5("text").alias("content_md5"), "doc_id")
    bogus = kept.select("content_md5", "doc_id").exceptAll(holders)
    assert bogus.count() == 0
