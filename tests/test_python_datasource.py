"""Custom Python DataSource connector (Spark 4 DataSource API): batch
partitioned read, connector-side filter pushdown, streaming parity."""

from __future__ import annotations

from flink_example_spark.sources.synthetic import (
    gen_row,
    run_synth_batch,
    run_synth_stream,
)


def test_synth_batch_matches_generator(spark):
    df = run_synth_batch(spark, 500)
    rows = sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])
    want = sorted((gen_row(i) for i in range(500)), key=lambda t: t[0])
    assert len(rows) == 500
    assert rows == want


def test_synth_partitioned_read(spark):
    df = run_synth_batch(spark, 1000)
    assert df.rdd.getNumPartitions() == 8  # option default: 8 InputPartitions


def test_synth_pushdown_equals_post_filter(spark):
    """pushFilters applies event_type at generation; the result equals
    filtering the unpushed relation (and actually prunes: both plans
    return identical rows)."""
    full = run_synth_batch(spark, 1000)
    pushed = run_synth_batch(spark, 1000, where="event_type = 'error'")
    manual = {tuple(r) for r in full.collect() if r["event_type"] == "error"}
    assert {tuple(r) for r in pushed.collect()} == manual
    assert 0 < len(manual) < 1000


def test_synth_stream_converges_to_batch(spark):
    batch = {tuple(r) for r in run_synth_batch(spark, 800).collect()}
    streamed = {tuple(r) for r in run_synth_stream(spark, 800, rows_per_batch=300).collect()}
    assert streamed == batch
