"""Scale probe (r15, VERDICT-r14 item 7): 8-vs-32-core ratios at ~sf1.

At sf0.1 the whole common set is scheduler-bound (8 cores >= 32 on every
row), so the r14/r15 parallelism claims were argued from stage probes only.
This probe synthesizes ``mult`` x the sf0.1 base tables (id-offset unions,
content-perturbed so cardinalities grow) to parquet under /tmp, then times
one representative operator per spread-touched family in a FRESH
``local[N]`` process for N in (32, 8). ratio = wall_8 / wall_32: ~>=2 means
the row is data-bound at this volume and the spread layout scales; ~1 means
still overhead-bound.

Usage (orchestrator):  python tools/r15_scale_probe.py [--mult 10]
                           [--families simhash,minhash,phash,bloom,bootstrap]
Internal (one run):    python tools/r15_scale_probe.py --run FAMILY
                           --cpus N --data DIR

Not part of the driver contract; a scratch measurement tool (guide §1.5).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"


def _session(cpus: int, name: str):
    from pyspark.sql import SparkSession

    from flink_example_spark.session import RUNTIME_CONF, tune

    b = (
        SparkSession.builder.appName(name)
        .master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
    )
    for k, v in RUNTIME_CONF.items():
        b = b.config(k, v)
    return tune(b.getOrCreate())


def synthesize(mult: int, outdir: str) -> None:
    """mult x documents / events / lineitem / part with offset ids and
    perturbed content so distinct cardinalities grow with mult."""
    from pyspark.sql import functions as F

    spark = _session(32, "r15-scale-synth")
    os.makedirs(outdir, exist_ok=True)

    def scaled(table: str, id_cols: list[str], perturb):
        base = spark.read.parquet(f"{SF}/{table}.parquet")
        n = {c: base.agg(F.max(c)).first()[0] + 1 for c in id_cols}
        parts = []
        for i in range(mult):
            df = base
            for c in id_cols:
                df = df.withColumn(c, F.col(c) + F.lit(i * n[c]))
            parts.append(perturb(df, i) if perturb else df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{outdir}/{table}.parquet"
        )
        print(f"synthesized {table} x{mult}", flush=True)

    scaled(
        "documents",
        ["doc_id"],
        lambda df, i: df.withColumn(
            "text",
            F.concat(F.col("text"), F.lit(f" copyset{i}")) if i else F.col("text"),
        ),
    )
    scaled("events", ["event_id", "user_id"], None)
    scaled("lineitem", ["l_orderkey", "l_partkey"], None)
    scaled("part", ["p_partkey"], None)
    for t in ("supplier", "nation"):
        spark.read.parquet(f"{SF}/{t}.parquet").write.mode("overwrite").parquet(
            f"{outdir}/{t}.parquet"
        )
    spark.stop()


def run_family(family: str, cpus: int, data: str) -> None:
    from pyspark.sql import functions as F

    spark = _session(cpus, f"r15-scale-{family}-{cpus}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def rd(t):
        return spark.read.parquet(f"{data}/{t}.parquet")

    # page-cache the inputs so 8 vs 32 compare compute, not cold I/O
    need = {
        "simhash": ["documents"],
        "minhash": ["documents"],
        "phash": ["documents"],
        "codec_width": ["documents"],
        "bloom": ["lineitem", "supplier", "nation", "part"],
        "bootstrap": ["events"],
    }[family]
    for t in need:
        rd(t).write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    if family == "simhash":
        from flink_example_spark.operators.dedup import simhash_pairs

        out = simhash_pairs(rd("documents"))
    elif family == "minhash":
        from flink_example_spark.operators.dedup import minhash_lsh_pairs

        out = minhash_lsh_pairs(rd("documents"))
    elif family == "phash":
        from flink_example_spark.operators import multimodal

        media = multimodal.encode_codec_media(
            rd("documents").select("doc_id", "text"), formats=("pgm", "aiff")
        )
        out = multimodal.image_phash(
            media.filter(F.col("media_type") == "image"), repartition=False
        )
    elif family == "codec_width":
        from flink_example_spark.operators import multimodal

        media = multimodal.encode_codec_media(
            rd("documents").select("doc_id", "text"), formats=("pgm", "aiff")
        )
        print(
            f"WIDTH {family}: encode partitions ="
            f" {media.rdd.getNumPartitions()}",
            flush=True,
        )
        out = media
    elif family == "bloom":
        from flink_example_spark.operators.sketch import bloom_partkey_filter

        out = bloom_partkey_filter(
            rd("lineitem"), rd("supplier"), rd("nation"), rd("part")
        )
    elif family == "bootstrap":
        from flink_example_spark.operators.ml import bootstrap_ci

        out = bootstrap_ci(rd("events"))
    else:
        raise SystemExit(f"unknown family {family}")
    out.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(f"RESULT {family} cpus={cpus} wall={wall:.2f}", flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--families",
        default="simhash,minhash,phash,bloom,bootstrap,codec_width",
    )
    ap.add_argument("--run")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--data")
    ap.add_argument("--skip-synth", action="store_true")
    args = ap.parse_args()

    if args.run:
        run_family(args.run, args.cpus, args.data)
        return

    outdir = f"/tmp/r15_scale_x{args.mult}"
    if not args.skip_synth:
        synthesize(args.mult, outdir)
    results = {}
    for family in args.families.split(","):
        for cpus in (32, 8):
            p = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--run",
                    family,
                    "--cpus",
                    str(cpus),
                    "--data",
                    outdir,
                ],
                capture_output=True,
                text=True,
            )
            wall = None
            for line in p.stdout.splitlines():
                if line.startswith("WIDTH"):
                    print(line, flush=True)
                if line.startswith("RESULT"):
                    wall = float(line.rsplit("wall=", 1)[1])
            if wall is None:
                print(f"{family} cpus={cpus}: FAILED\n{p.stdout[-800:]}\n{p.stderr[-800:]}")
            results[(family, cpus)] = wall
            print(f"{family} cpus={cpus}: {wall}", flush=True)
    print("\nfamily          wall32   wall8   ratio(8/32)")
    for family in args.families.split(","):
        w32, w8 = results.get((family, 32)), results.get((family, 8))
        if w32 and w8:
            print(f"{family:15s} {w32:7.2f} {w8:7.2f}   {w8 / w32:5.2f}")


if __name__ == "__main__":
    main()
