"""Per-stage attribution probe (r15 optimization round).

Runs each named query once (noop sink) in a UI-enabled session and prints
the stages it submitted: task count, executor run time, shuffle bytes.
Single-task stages with high run time = serialized work (guide §2.5/§7.1).

Usage: python tools/r15_stage_probe.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import urllib.request, json

    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession
    from flink_example_spark.session import RUNTIME_CONF, tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    b = (
        SparkSession.builder.appName("r15-stage-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    spark = tune(b.getOrCreate())

    qs = entrymod._all_queries()
    from flink_example_spark.tables import load_tables

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for df in load_tables(spark, sf_dir, register=False).values():
        df.write.format("noop").mode("overwrite").save()

    def stages():
        with urllib.request.urlopen(
            "http://localhost:4099/api/v1/applications/"
            + spark.sparkContext.applicationId
            + "/stages?status=complete"
        ) as r:
            return {s["stageId"]: s for s in json.load(r)}

    for name in names:
        before = stages()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
        after = stages()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -s["executorRunTime"])
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} stages ===", flush=True)
        for s in new[:14]:
            print(
                f"  tasks={s['numCompleteTasks']:3d} run={s['executorRunTime']/1000:7.2f}s "
                f"shW={s['shuffleWriteBytes']/1e6:8.2f}MB shR={s['shuffleReadBytes']/1e6:8.2f}MB  {s['name'][:60]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
