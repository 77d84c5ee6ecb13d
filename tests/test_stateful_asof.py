"""Stream-stream stateful as-of join: out-of-order-tolerant, watermark-
gated emission; must converge to the batch as-of result."""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from flink_example_spark.operators.asof import asof_join
from flink_example_spark.plans.events_demo import examples, feature_history, load_events
from flink_example_spark.streaming.stateful import (
    stateful_asof,
    stateful_asof_tws,
    unify_streams,
)

SF = "/root/testdata/sf0.001"

OUT_SCHEMA = StructType(
    [
        StructField("_k", LongType()),
        StructField("_prediction_time", TimestampType()),
        StructField("_label_time", TimestampType()),
        StructField("loss_value", DoubleType()),
    ]
)


def _has_protobuf() -> bool:
    # transformWithState's Python state-server client speaks protobuf; the
    # implementation is gated on it being importable (not installable here).
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "impl",
    [
        stateful_asof,
        pytest.param(
            stateful_asof_tws,
            marks=pytest.mark.skipif(
                not _has_protobuf(),
                reason="transformWithState state client needs google.protobuf "
                "(absent in this container; verified root cause: the TWS "
                "driver worker crashes on `from google.protobuf import "
                "descriptor`)",
            ),
        ),
    ],
    ids=["pandas_state", "transform_with_state"],
)
def test_stateful_asof_converges_to_batch(spark, impl):
    ev = load_events(spark, SF)
    fh = feature_history(ev)
    ex = examples(ev)

    unified = unify_streams(
        fh.withColumn("_change_time", F.col("_change_time").cast("timestamp")),
        ex.select(
            "_entity",
            F.col("_prediction_time").cast("timestamp").alias("_prediction_time"),
            F.col("_label_time").cast("timestamp").alias("_label_time"),
        ),
        key="_entity",
        version_time="_change_time",
        probe_time="_prediction_time",
        value_cols=["loss_value"],
        probe_cols=["_prediction_time", "_label_time"],
    )

    # Flink-style end-of-stream flush: a sentinel version later than every
    # probe advances the watermark so all parked probes emit. It must NOT
    # change any result (the no-temporal-leakage property).
    max_t = unified.agg(F.max("_t")).first()[0]
    keys = [r["_k"] for r in unified.select("_k").distinct().collect()]
    sentinel = spark.createDataFrame(
        [(k, max_t, 0, -1.0, None, None) for k in keys], unified.schema
    ).withColumn("_t", F.expr("_t + INTERVAL 10 HOURS"))

    # Stage as time-ordered files so arrival respects event order (watermark
    # assumption); 3 chunks + sentinel → 4 micro-batches.
    tmpdir = tempfile.mkdtemp(prefix="stateful_asof_")
    chunks = unified.orderBy("_t").coalesce(1)
    total = chunks.count()
    rows = chunks.collect()
    per = (total + 2) // 3
    for i in range(3):
        part = rows[i * per : (i + 1) * per]
        if part:
            spark.createDataFrame(part, unified.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(tmpdir, f"chunk_{i}"))
            time.sleep(0.05)
    sentinel.coalesce(1).write.mode("overwrite").parquet(os.path.join(tmpdir, "chunk_9_sentinel"))

    stream = (
        spark.readStream.schema(unified.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    joined = impl(
        stream,
        value_cols=["loss_value"],
        probe_cols=["_prediction_time", "_label_time"],
        output_schema=OUT_SCHEMA,
    )
    name = f"stateful_asof_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["_k"], r["_prediction_time"], r["_label_time"], r["loss_value"])
        for r in spark.table(name).collect()
    }

    batch = asof_join(ex, fh, on="_entity", probe_time="_prediction_time")
    expected = {
        (
            r["_entity"],
            r["_prediction_time"],
            r["_label_time"],
            r["loss_value"],
        )
        for r in batch.collect()
    }
    assert streamed == expected
