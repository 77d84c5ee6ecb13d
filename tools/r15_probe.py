"""Round-14 optimization probe: time individual headline queries in a warm
session (noop sink, same methodology as bench.py) and capture their
formatted plans.

Usage:
  python tools/r15_opt_probe.py q1 q2 ...            # time each, 2 reps
  python tools/r15_opt_probe.py --plans q1 q2 ...    # also write plans to
                                                     #   plans/r15/<q>_<tag>.txt
  python tools/r15_opt_probe.py --tag before --plans q1

Not part of the driver contract; a scratch measurement tool (guide §1.4/1.5).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plans", action="store_true")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from flink_example_spark.session import get_spark
    from flink_example_spark.tables import load_tables

    spark = get_spark("r15-opt-probe")
    qs = entrymod._all_queries()

    # same warmup as bench.py: JVM/codegen spin-up + page-cache the inputs
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for df in load_tables(spark, args.sf, register=False).values():
        df.write.format("noop").mode("overwrite").save()

    plandir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(plandir, exist_ok=True)

    for name in args.queries:
        fn = qs[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if args.plans:
            df = fn(spark, args.sf)
            with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"{name}: {times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
