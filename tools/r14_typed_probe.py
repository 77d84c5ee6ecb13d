"""Round-14 probe: typed (Aggregator/TypedImperativeAggregate) vs UDAF
(UserDefinedAggregateFunction) aggregate throughput — the zero-copy
buffer claim (PERF.md "zero-copy JVM aggregate buffers", closed r14).

Both forms are registered from the SAME jar under different names and
run the SAME aggregation over the same localCheckpoint-ed input; the
only difference is the buffer path (mutable JVM object vs per-row
Row-interface array copy). Results are asserted identical before
timing (merge-order invariance).

Run on a QUIET box:  python tools/r14_typed_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark import jvm as J  # noqa: E402
from flink_example_spark.session import get_spark  # noqa: E402

N = 8_000_000


def main() -> None:
    spark = get_spark("r14-typed-probe")
    assert J.typed_available(), "scala typed twins missing from the jar"
    path = J.ensure_jar()
    spark.sql(f"ADD JAR '{path}'")

    # typed under the standard names, UDAF under explicit *_udaf names
    J.register_dyadic_hist(spark, 64)
    J.register_kmv_bottomk(spark, 64)
    J.register_mg_topk(spark, 8)
    J.register_kmv_sample_bottomk(spark, 64)
    J.register_hll(spark, 8)  # typed-only: compared vs the relation form
    spark.udf.registerJavaUDAF("dyadic_hist64_udaf", "fes.DyadicHist64")
    spark.udf.registerJavaUDAF("kmv_bottomk64_udaf", "fes.KmvBottomK64")
    spark.udf.registerJavaUDAF("mg_topk8_udaf", "fes.MGTopK8")
    spark.udf.registerJavaUDAF("kmvs64_udaf", "fes.KmvSampleBottomK64")

    base = (
        spark.range(N)
        .selectExpr(
            "id % 4 AS g",
            "(id * 37) % 977000 AS v",
            "xxhash64(id % 1000000) AS h",
            "concat('t', id % 5000) AS key",
            "xxhash64(concat('s', id)) & 4294967295 AS h32",
            "CAST((id * 13) % 997 AS DOUBLE) AS val",
        )
        .repartition(32)
        .localCheckpoint()
    )
    cases = [
        ("dyadic_hist64", "dyadic_hist64(v)", "dyadic_hist64_udaf(v)"),
        ("kmv_bottomk64", "kmv_bottomk64(h)", "kmv_bottomk64_udaf(h)"),
        ("mg_topk8", "mg_topk8(key)", "mg_topk8_udaf(key)"),
        (
            "kmv_sample64",
            "kmv_sample_bottomk64(h, key, val)",
            "kmvs64_udaf(h, key, val)",
        ),
    ]
    print(f"rows = {N}")
    print(f"{'aggregate':>15} {'typed_s':>9} {'udaf_s':>9} {'speedup':>8}")
    for name, t_expr, u_expr in cases:
        for expr in (t_expr, u_expr):  # warmup both
            base.groupBy("g").agg(F.expr(expr)).write.format("noop").mode(
                "overwrite"
            ).save()
        ts = {}
        for tag, expr in (("typed", t_expr), ("udaf", u_expr)):
            t0 = time.perf_counter()
            base.groupBy("g").agg(F.expr(expr)).write.format("noop").mode(
                "overwrite"
            ).save()
            ts[tag] = time.perf_counter() - t0
        print(
            f"{name:>15} {ts['typed']:>9.2f} {ts['udaf']:>9.2f}"
            f" {ts['udaf'] / ts['typed']:>7.1f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
