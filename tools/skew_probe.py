"""Skew probe: do the salted plans beat the unsalted ones on a hot key?

Part 1 (as-of): synthesizes a probe stream where ONE entity owns half of
all probes (the model-serving hot-user case) against a version history with
ordinary key cardinality, then times the union-strategy as-of join with and
without salting. Unsalted, the hot key's probes sort in a single partition
task; salted, they spread across ``salt`` sub-partitions while versions
replicate ``salt``x (versions-per-key is small — the right trade).

Part 2 (version history): synthesizes an event table where ONE entity owns
half of all events, then times the cumulative version-history window
unsalted (the hot entity's whole history sorts in ONE task) vs
``salted_version_history`` (two-phase time-bucket merge).

Both parts verify the salted result equals the unsalted result bit-for-bit.
Results recorded in PERF.md.

Usage: python tools/skew_probe.py [--probes 4000000] [--entities 1000] [--salt 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", type=int, default=4_000_000)
    ap.add_argument("--entities", type=int, default=1000)
    ap.add_argument("--versions-per-entity", type=int, default=20)
    ap.add_argument("--salt", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from flink_example_spark.operators.asof import asof_join
    from flink_example_spark.session import get_spark

    spark = get_spark("skew-probe")

    # 50% of probes on entity 0, the rest uniform over the others
    probes = (
        spark.range(args.probes)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.entities - 1)) + 1)
            .alias("_entity"),
            F.timestamp_millis(
                F.lit(1_600_000_000_000) + F.pmod(F.xxhash64("id", F.lit(7)), F.lit(86_400_000))
            ).alias("pt"),
        )
        .localCheckpoint(eager=True)  # time the join, not the synthesis
    )
    versions = (
        spark.range(args.entities * args.versions_per_entity)
        .select(
            (F.col("id") % args.entities).alias("_entity"),
            F.timestamp_millis(
                F.lit(1_600_000_000_000)
                + (F.col("id") / args.entities).cast("long") * F.lit(4_000_000)
            ).alias("_change_time"),
            (F.col("id") * 2).cast("double").alias("val"),
        )
        .localCheckpoint(eager=True)
    )

    def run(salt):
        t0 = time.time()
        out = asof_join(probes, versions, on="_entity", probe_time="pt", salt=salt)
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast("decimal(28,6)")).alias("s"),
        ).first()
        return time.time() - t0, (agg["n"], str(agg["s"]))

    # warm both paths once (JIT/codegen), then measure
    run(None)
    run(args.salt)
    unsalted_s, unsalted_sig = run(None)
    salted_s, salted_sig = run(args.salt)
    assert unsalted_sig == salted_sig, (unsalted_sig, salted_sig)
    print(
        json.dumps(
            {
                "probe": "asof_join",
                "probes": args.probes,
                "hot_share": 0.5,
                "entities": args.entities,
                "salt": args.salt,
                "unsalted_sec": round(unsalted_s, 2),
                "salted_sec": round(salted_s, 2),
                "speedup": round(unsalted_s / salted_s, 2),
                "results_identical": True,
            }
        )
    )

    # ---- part 2: version-history window on a hot entity -------------------
    from flink_example_spark.operators.versioned import (
        salted_version_history,
        version_history,
    )

    hot_events = (
        spark.range(args.probes)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.entities - 1)) + 1)
            .alias("k"),
            F.timestamp_millis(
                F.lit(1_600_000_000_000) + F.pmod(F.xxhash64("id", F.lit(13)), F.lit(86_400_000))
            ).alias("ts"),
            F.col("id").cast("decimal(18,2)").alias("x"),
        )
        .localCheckpoint(eager=True)
    )

    def run_history(salted):
        t0 = time.time()
        if salted:
            out = salted_version_history(
                hot_events, key="k", time_col="ts", aggs={"s": ("sum", "x")},
                n_buckets=args.salt,
            )
        else:
            out = version_history(hot_events, key="k", time_col="ts", aggs={"s": F.sum("x")})
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("s").cast("decimal(38,2)")).alias("sig"),
        ).first()
        return time.time() - t0, (agg["n"], str(agg["sig"]))

    run_history(False)
    run_history(True)
    plain_s, plain_sig = run_history(False)
    bsalted_s, bsalted_sig = run_history(True)
    assert plain_sig == bsalted_sig, (plain_sig, bsalted_sig)
    print(
        json.dumps(
            {
                "probe": "version_history",
                "events": args.probes,
                "hot_share": 0.5,
                "entities": args.entities,
                "buckets": args.salt,
                "unsalted_sec": round(plain_s, 2),
                "salted_sec": round(bsalted_s, 2),
                "speedup": round(plain_s / bsalted_s, 2),
                "results_identical": True,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
