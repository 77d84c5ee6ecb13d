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


def test_manifest_sink_two_phase_commit(spark, tmp_path):
    """The custom writer publishes a MANIFEST naming exactly the committed
    parts; per-part counts and checksums verify against the files."""
    import hashlib
    import os

    from flink_example_spark.sources.synthetic import read_manifest, register_sink

    register_sink(spark)
    df = run_synth_batch(spark, 300).selectExpr(
        "concat(event_type, ':', user_id) AS line"
    )
    out = str(tmp_path / "sink")
    df.write.format("manifest_text").option("path", out).mode("append").save()

    manifest = read_manifest(out)
    assert sum(n for _, n, _ in manifest) == 300
    listed = {p for p, _, _ in manifest}
    on_disk = {f for f in os.listdir(out) if f.startswith("part-")}
    assert listed <= on_disk  # every committed part exists
    for part, n, checksum in manifest:
        lines = open(os.path.join(out, part)).read().splitlines()
        assert len(lines) == n
        h = hashlib.md5()
        for line in lines:
            h.update(line.encode())
        assert h.hexdigest() == checksum
    # rows round-trip
    got = sorted(
        line for part, _, _ in manifest
        for line in open(os.path.join(out, part)).read().splitlines()
    )
    want = sorted(r["line"] for r in df.collect())
    assert got == want
