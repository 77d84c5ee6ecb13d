"""Timestamp-layout resilience (round-4 regression, VERDICT r4 item 1).

The harness parquet has shipped event timestamps in two layouts over time:
INT64 TIMESTAMP(NANOS) (which Spark reads as plain bigint under
spark.sql.legacy.parquet.nanosAsLong) and native timestamp[us]. Both the
batch loader (tables.load_table) and the streaming ingest
(streaming.pipeline.stream_events) must normalize EITHER layout to
TIMESTAMP_NTZ via the single shared helper ``tables.normalize_ts``; these
tests stage both layouts through both paths so a future harness shift
cannot silently break ingestion again.
"""

from __future__ import annotations

import datetime
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE_TS = datetime.datetime(2024, 1, 1, 12, 0, 0)
ROWS = [
    (1, BASE_TS, 10, "error", 1.5, "{}"),
    (2, BASE_TS + datetime.timedelta(minutes=1), 10, "error", 2.5, "{}"),
    (3, BASE_TS + datetime.timedelta(minutes=2), 11, "click", 0.5, "{}"),
]


def _write_events(tmpdir: str, unit: str) -> str:
    """Stage an events.parquet with timestamps in the given arrow unit."""
    os.makedirs(tmpdir, exist_ok=True)
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in ROWS], pa.timestamp(unit)),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS], pa.string()),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array([r[5] for r in ROWS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@pytest.fixture(params=["ns", "us"], ids=["int64-nanos", "native-micros"])
def events_dir(request, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"events_{request.param}"))
    yield _write_events(d, request.param)
    shutil.rmtree(d, ignore_errors=True)


def test_load_table_normalizes_layout(spark, events_dir):
    from flink_example_spark.tables import load_table

    df = load_table(spark, events_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted((r["event_id"], r["ts"]) for r in df.collect())
    assert got == [(r[0], r[1]) for r in ROWS]


def test_stream_events_normalizes_layout(spark, events_dir):
    """Both layouts must stream: bounded replay of a per-type count."""
    from pyspark.sql import functions as F

    from flink_example_spark.streaming.pipeline import stream_events

    ev = stream_events(spark, events_dir)
    # watermark column is LTZ (EventTimeWatermark requirement), UTC-pinned
    assert dict(ev.dtypes)["ts"] == "timestamp"
    agg = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    name = f"ts_layout_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["event_type"], r["n"]) for r in spark.table(name).collect()}
    assert got == {("error", 2), ("click", 1)}
