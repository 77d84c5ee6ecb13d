"""Bucketed co-located join (PERF.md / SURVEY §4 shuffle posture): writing
both join sides bucketed+sorted by the join key lets Catalyst plan a
SortMergeJoin with NO Exchange — the 100 TB strategy for repeated joins on
the same key (e.g. orderkey across the fact tables)."""

from __future__ import annotations

import uuid

SF = "/root/testdata/sf0.001"


def test_bucketed_join_eliminates_shuffle(spark):
    from flink_example_spark.tables import load_table

    suffix = uuid.uuid4().hex[:8]
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"orders_b_{suffix}")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"lineitem_b_{suffix}")
    )
    ob = spark.table(f"orders_b_{suffix}")
    lb = spark.table(f"lineitem_b_{suffix}")
    joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select("o_orderkey", "l_quantity")
    assert joined.count() == lineitem.count()
    # with AQE, read the FINAL adaptive plan (after materialization)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan, plan

    # contrast: the unbucketed join redistributes at least one side
    plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        "o_orderkey", "l_quantity"
    )
    plain.count()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan or "Broadcast" in plain_plan
