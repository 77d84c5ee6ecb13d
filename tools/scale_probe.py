"""Scale probe: how does the flagship pipeline behave as event volume grows?

Synthesizes N x the sf0.1 events table (id-offset unions → distinct users,
preserving the per-key event density) and times the full training-example
pipeline at each multiple. Near-linear wall-clock growth = the plan has no
super-linear shuffle/sort hot spot; results recorded in PERF.md.

Usage: python tools/scale_probe.py [--multiples 1,4,16] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--multiples", default="1,4,16")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_example_spark.plans.events_demo import (
        examples,
        feature_history,
        load_events,
        target_history,
    )
    from flink_example_spark.plans.training import training_examples
    from flink_example_spark.session import get_spark

    spark = get_spark("scale-probe")
    base = load_events(spark, args.sf)
    n_users = base.select(F.max("user_id")).first()[0] + 1
    n_base = base.count()

    results = []
    with tempfile.TemporaryDirectory(prefix="scale_probe_") as tmp:
        for mult in [int(m) for m in args.multiples.split(",")]:
            copies = [
                base.withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
                for i in range(mult)
            ]
            ev = copies[0]
            for c in copies[1:]:
                ev = ev.unionByName(c)
            path = os.path.join(tmp, f"events_x{mult}")
            ev.write.mode("overwrite").parquet(path)
            evp = spark.read.parquet(path)

            t0 = time.perf_counter()
            out = training_examples(
                examples(evp), feature_history(evp), target_history(evp)
            )
            out.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            results.append(
                {"multiple": mult, "events": n_base * mult, "wall_sec": round(wall, 2)}
            )
            print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scale_probe": results}))
    spark.stop()


if __name__ == "__main__":
    main()
