"""Shuffle-bytes probe: does hashed=True shrink the curation shuffles?

Runs shared_spans and decontaminate at $SPARK_GRAFT_SF_DIR (default sf0.1)
with hashed=False and hashed=True, reading per-stage shuffle write bytes
from the Spark status REST API (this probe brings its own UI-enabled
session; the engine default keeps the UI off). Also verifies the hashed
results equal the exact results on this corpus.

Usage: python tools/hash_shuffle_probe.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_write_bytes(port: int = 4040) -> int:
    base = f"http://localhost:{port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    total = 0
    for stage in json.load(
        urllib.request.urlopen(f"{base}/{apps[0]['id']}/stages?status=COMPLETE")
    ):
        total += stage.get("shuffleWriteBytes", 0)
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flink_example_spark.operators import curation
    from flink_example_spark.session import RUNTIME_CONF

    builder = (
        SparkSession.builder.appName("hash-shuffle-probe")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .config("spark.ui.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    docs = spark.read.parquet(f"{args.sf}/documents.parquet").repartition(32)
    docs = docs.persist()
    docs.count()
    bench = docs.filter(F.col("doc_id") % 7 == 0)

    def run(label, df_fn):
        df_fn().write.format("noop").mode("overwrite").save()  # warm
        b0, t0 = shuffle_write_bytes(), time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        return {"wall_sec": round(time.time() - t0, 2), "shuffle_mb": round(
            (shuffle_write_bytes() - b0) / 1e6, 2)}

    results = {}
    for name, fn in [
        ("shared_spans_exact", lambda: curation.shared_spans(docs, n=8, min_docs=2)),
        ("shared_spans_hashed", lambda: curation.shared_spans(docs, n=8, min_docs=2, hashed=True)),
        ("decontaminate_exact", lambda: curation.decontaminate(docs, bench, n=8)),
        ("decontaminate_hashed", lambda: curation.decontaminate(docs, bench, n=8, hashed=True)),
    ]:
        results[name] = run(name, fn)

    # parity on this corpus (no 64-bit collisions expected)
    exact = {tuple(r) for r in curation.shared_spans(docs, n=8, min_docs=2).collect()}
    hashed = {tuple(r) for r in curation.shared_spans(docs, n=8, min_docs=2, hashed=True).collect()}
    results["shared_spans_identical"] = exact == hashed
    exact_d = {tuple(r) for r in curation.decontaminate(docs, bench, n=8).collect()}
    hashed_d = {tuple(r) for r in curation.decontaminate(docs, bench, n=8, hashed=True).collect()}
    results["decontaminate_identical"] = exact_d == hashed_d

    print(json.dumps({"sf": args.sf, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
