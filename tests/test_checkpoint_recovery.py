"""Checkpoint recovery: a streaming query restarted with the same
checkpoint must resume from stored source offsets with its state-store
contents intact — the run-2 result must equal the batch relation over ALL
data even though run 2 only reads the files added after run 1."""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from flink_example_spark.operators.dedup import exact_dedup
from flink_example_spark.session import shuffle_partitions
from flink_example_spark.streaming.dedup_stream import streaming_exact_dedup
from flink_example_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _run(spark, srcdir, schema, ckpt):
    name = f"ckpt_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(srcdir, "chunk_*"))
    )
    with shuffle_partitions(spark, 8):
        q = (
            streaming_exact_dedup(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return {
        (r["doc_id"], r["content_md5"], r["n_copies"])
        for r in spark.table(name).collect()
    }


def test_state_survives_restart(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    srcdir, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    half_a.coalesce(1).write.mode("overwrite").parquet(os.path.join(srcdir, "chunk_0"))

    got_1 = _run(spark, srcdir, docs.schema, ckpt)
    exp_1 = {
        (r["doc_id"], r["content_md5"], r["n_copies"])
        for r in exact_dedup(half_a).collect()
    }
    assert got_1 == exp_1

    # add the second half AFTER the first run committed its offsets
    half_b.coalesce(1).write.mode("overwrite").parquet(os.path.join(srcdir, "chunk_1"))
    got_2 = _run(spark, srcdir, docs.schema, ckpt)
    exp_all = {
        (r["doc_id"], r["content_md5"], r["n_copies"])
        for r in exact_dedup(docs).collect()
    }
    # run 2 read ONLY chunk_1 (chunk_0's offset is in the checkpoint), so
    # equality with the full-batch relation proves the aggregate state was
    # restored, not recomputed
    assert got_2 == exp_all and got_2 != got_1
