"""Unit tests for the distributed two-phase rank/cumsum device
(operators/distrank.py) — exact equality with the single-partition
window it replaces, across partition counts and skew."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_example_spark.operators.distrank import dist_cumsum, dist_row_number


def _vals(spark, n=5000):
    # skewed values (heavy ties) + unique tiebreak id, scattered layout
    return (
        spark.range(n)
        .repartition(16)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("v"),
            ((F.col("id") * 37) % 11).alias("w"),
        )
    )


def test_dist_row_number_matches_global_window(spark):
    df = _vals(spark)
    got = dist_row_number(df, ["v", "id"], "rn")
    want = df.withColumn("rn", F.row_number().over(Window.orderBy("v", "id")))
    assert sorted(map(tuple, got.select("id", "rn").collect())) == sorted(
        map(tuple, want.select("id", "rn").collect())
    )


def test_dist_row_number_desc_and_parts(spark):
    df = _vals(spark, 997)
    got = dist_row_number(df, [F.desc("v"), F.col("id")], "rn", parts=5)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), F.col("id")))
    )
    assert sorted(map(tuple, got.select("id", "rn").collect())) == sorted(
        map(tuple, want.select("id", "rn").collect())
    )


def test_dist_row_number_fewer_rows_than_parts(spark):
    df = _vals(spark, 3)
    got = dist_row_number(df, ["v", "id"], "rn", parts=8)
    assert sorted(r["rn"] for r in got.collect()) == [1, 2, 3]


def test_dist_cumsum_multi_matches_global_window(spark):
    df = _vals(spark, 2000)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = df.select(
        "id", F.sum("v").over(w).alias("cv"), F.sum("w").over(w).alias("cw")
    )
    got = dist_cumsum(df, ["id"], {"cv": "v", "cw": "w"}).select("id", "cv", "cw")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dist_rank_plan_has_no_rowdata_single_partition_window(spark):
    import re

    df = _vals(spark)
    plan = (
        dist_row_number(df, ["v", "id"], "rn")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan
    for m in re.finditer(
        r"Window \[(row_number|sum)\(([^)]*)\)[^\n]*windowspecdefinition\(([^,)]*)", plan
    ):
        assert m.group(3).startswith("__dr_pid") or "__dr_n" in m.group(2), m.group(0)
