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


def dedup_probe(multiples: list[int], sf: str) -> None:
    """Minhash-LSH scaling curve: N x the documents table (id-offset unions,
    suffix-perturbed text so content cardinality grows with N) through
    minhash_lsh_pairs. Near-linear growth = banding holds; quadratic would
    mean bucket blowup."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.dedup import minhash_lsh_pairs
    from flink_example_spark.session import get_spark
    from flink_example_spark.tables import load_table

    spark = get_spark("scale-probe-dedup")
    base = load_table(spark, sf, "documents")
    n_docs = base.count()
    results = []
    with tempfile.TemporaryDirectory(prefix="scale_probe_dedup_") as tmp:
        for mult in multiples:
            copies = [
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * n_docs))
                .withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" copyset{i}")) if i else F.col("text"),
                )
                for i in range(mult)
            ]
            docs = copies[0]
            for c in copies[1:]:
                docs = docs.unionByName(c)
            path = os.path.join(tmp, f"docs_x{mult}")
            docs.repartition(32).write.mode("overwrite").parquet(path)
            dp = spark.read.parquet(path)

            t0 = time.perf_counter()
            minhash_lsh_pairs(dp, threshold=0.8).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            results.append(
                {"multiple": mult, "docs": n_docs * mult, "wall_sec": round(wall, 2)}
            )
            print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"dedup_scale_probe": results}))
    spark.stop()


def e2e_probe(sf: str) -> None:
    """Batch vs fused-streaming wall at one scale factor with an exact
    row-set convergence check (the PERF.md 'Fused e2e streaming pipeline
    scale probe' table rows)."""
    from flink_example_spark.plans.events_demo import pipeline
    from flink_example_spark.session import get_spark
    from flink_example_spark.streaming.e2e import run_streaming_pipeline_e2e

    spark = get_spark("scale-probe-e2e")
    t0 = time.perf_counter()
    batch = {tuple(r) for r in pipeline(spark, sf).collect()}
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    streamed = {tuple(r) for r in run_streaming_pipeline_e2e(spark, sf).collect()}
    t_stream = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "e2e_scale_probe": {
                    "sf": sf,
                    "rows": len(batch),
                    "batch_sec": round(t_batch, 1),
                    "streaming_sec": round(t_stream, 1),
                    "identical": streamed == batch,
                }
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--multiples", default="1,4,16")
    ap.add_argument("--dedup", action="store_true", help="probe minhash dedup instead")
    ap.add_argument(
        "--e2e",
        action="store_true",
        help="probe the fused streaming pipeline: batch vs ONE-query streaming "
        "replay at --sf, verifying exact convergence (PERF.md scale table)",
    )
    args = ap.parse_args()
    if args.dedup:
        dedup_probe([int(m) for m in args.multiples.split(",")], args.sf)
        return
    if args.e2e:
        e2e_probe(args.sf)
        return

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
