"""Write-path coverage: pipeline output survives a partitioned parquet
round-trip with schema and values intact (what the 100 TB deployment does)."""

from __future__ import annotations

import os
import tempfile

from flink_example_spark.plans.events_demo import pipeline
from flink_example_spark.sinks import write_parquet

SF = "/root/testdata/sf0.001"


def test_training_examples_parquet_roundtrip(spark):
    out = pipeline(spark, SF)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "training_examples")
        write_parquet(out, path, partition_by=["_entity"])
        back = spark.read.parquet(path)
        assert back.count() == out.count()
        # partition column comes back (possibly re-typed by partition
        # discovery); compare the full row multisets on common columns
        cols = [c for c in out.columns if c != "_entity"]
        a = {tuple(r) for r in out.select(*cols).collect()}
        b = {tuple(r) for r in back.select(*cols).collect()}
        assert a == b
        # partition pruning: reading one entity touches one directory
        one = out.select("_entity").first()["_entity"]
        pruned = spark.read.parquet(path).filter(f"_entity = {one}")
        assert pruned.count() == out.filter(f"_entity = {one}").count()
