"""Streaming data-contract monitoring — live expectation violation counts.

Row-level rule violations and referential orphans are pure monoid counts,
so the dbt-test-style report runs LIVE: one stateless projection computes
every rule's violation indicator per arriving row (the FK rule via a
stream-static broadcast join against the dimension), and ONE global
complete-mode aggregate maintains the counts. Unpivoting to the
(check_name, n_rows, n_violations, passed) report shape is a read-time
projection. The bounded replay converges exactly to the batch conditional
aggregates and is oracle-checked against the same SQL shapes.

Not covered live (documented): the key-UNIQUENESS check needs counts of
per-key counts — a second stacked stateful aggregation — so it stays a
batch/periodic pass (or a transformWithState port once protobuf lands).

Scale: zero shuffle for the rule projection (the dimension join is
broadcast), one constant-size global aggregate; state is six BIGINTs.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_example_spark.session import shuffle_partitions, tune
from flink_example_spark.streaming.staging import stage_table_by_key


def run_streaming_expectations(
    spark: SparkSession, sf_dir: str, chunks: int = 3
) -> DataFrame:
    from flink_example_spark.tables import load_table

    tune(spark)
    customer = load_table(spark, sf_dir, "customer")
    tmpdir, schema = stage_table_by_key(spark, sf_dir, "orders", "o_orderkey", chunks)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(tmpdir, "chunk_*"))
    )
    joined = stream.join(
        F.broadcast(
            customer.select(F.col("c_custkey").alias("o_custkey")).distinct()
            .withColumn("__has_parent", F.lit(1))
        ),
        "o_custkey",
        "left",
    )
    viol = lambda pred: F.sum(F.when(~pred, 1).otherwise(0))
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_orderkey").isNotNull()).alias("v_key"),
        viol(F.col("o_totalprice") >= 0).alias("v_price"),
        viol(F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(
            F.col("o_orderdate") <= F.lit("1998-12-31").cast("timestamp")
        ).alias("v_date"),
        viol(F.col("__has_parent").isNotNull()).alias("v_fk"),
    )
    name = f"stream_expect_{uuid.uuid4().hex[:8]}"
    with shuffle_partitions(spark, 8):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    s = spark.table(name)
    arms = [
        ("orders.o_orderkey_not_null", "v_key"),
        ("orders.o_totalprice_nonneg", "v_price"),
        ("orders.o_orderstatus_accepted", "v_status"),
        ("orders.o_orderdate_bound", "v_date"),
        ("orders.o_custkey->customer", "v_fk"),
    ]
    rows = [
        F.struct(
            F.lit(nm).alias("check_name"),
            F.col("n").cast("long").alias("n_rows"),
            F.col(c).cast("long").alias("n_violations"),
            (F.col(c) == 0).cast("long").alias("passed"),
        )
        for nm, c in arms
    ]
    return s.select(F.explode(F.array(*rows)).alias("__r")).select(
        "__r.check_name", "__r.n_rows", "__r.n_violations", "__r.passed"
    )
