"""KMV method probe: window (two-phase bottom-k windows) vs merge
(bounded per-partition heaps + per-group reduce).

Measures shuffle write bytes/records from the status REST API at
$SPARK_GRAFT_SF_DIR (default sf0.1) and verifies both methods return
identical sketches. The window path shuffles the full distinct-hash set
(capped per map task by WindowGroupLimit); the merge path shuffles at most
k hashes per (group, input partition) — the number that stays flat as the
corpus grows.

Usage: python tools/kmv_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_totals(port: int = 4040) -> tuple[int, int]:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    b = r = 0
    for stage in json.load(
        urllib.request.urlopen(f"{base}/{apps[0]['id']}/stages?status=COMPLETE")
    ):
        b += stage.get("shuffleWriteBytes", 0)
        r += stage.get("shuffleWriteRecords", 0)
    return b, r


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_example_spark.operators.sketch import kmv_distinct
    from flink_example_spark.operators.text import fingerprint
    from flink_example_spark.session import RUNTIME_CONF

    builder = (
        SparkSession.builder.appName("kmv-probe")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.ui.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    docs = (
        spark.read.parquet(f"{args.sf}/documents.parquet")
        .select("lang", fingerprint(F.col("text")).alias("fp"))
        .repartition(32)
        .persist()
    )
    docs.count()

    def run(method):
        df = lambda: kmv_distinct(docs, "lang", "fp", k=args.k, method=method)  # noqa: E731
        df().write.format("noop").mode("overwrite").save()  # warm
        (b0, r0), t0 = shuffle_totals(), time.time()
        df().write.format("noop").mode("overwrite").save()
        b1, r1 = shuffle_totals()
        return {
            "wall_sec": round(time.time() - t0, 2),
            "shuffle_mb": round((b1 - b0) / 1e6, 3),
            "shuffle_records": r1 - r0,
        }

    results = {m: run(m) for m in ("window", "merge")}
    w = {tuple(r) for r in kmv_distinct(docs, "lang", "fp", k=args.k).collect()}
    m = {tuple(r) for r in kmv_distinct(docs, "lang", "fp", k=args.k, method="merge").collect()}
    results["identical"] = w == m
    print(json.dumps({"sf": args.sf, "k": args.k, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
