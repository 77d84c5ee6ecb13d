"""Round-14 probe: substring_spans_dedup shuffle BYTES, hashed vs the
legacy string-key shuffle (VERDICT-r13 tasks 1 + 7).

The round-13 probe recorded wall only; this one records the shuffle
write bytes of the whole operator DAG (Spark REST /stages, summed
shuffleWriteBytes delta around each run) next to wall at x1/x4/x8
synthetic corpus growth. Two variants per scale:

- hashed: the shipped operator (xxhash64(gram) is the groupBy/join
  key; the gram string never reaches an exchange);
- string: a probe-only replica of the pre-r14 form (the full k-word
  gram string as the shuffle key) — the baseline the hashing claim is
  measured against. Output rows are identical (collision-free at these
  scales); only the exchanged bytes differ.

Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/r14_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from flink_example_spark.operators.dedup import (  # noqa: E402
    substring_spans_dedup,
)

from flink_example_spark.tables import load_table  # noqa: E402


def _shuffle_write_bytes(spark) -> int:
    """Sum of shuffleWriteBytes over all completed stages so far (REST
    status API; deltas around a run isolate that run's shuffles)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _legacy_string_key(documents, k=10, id_col="doc_id", text_col="text"):
    """Probe-only replica of the pre-r14 substring_spans_dedup: the
    k-word gram STRING is the groupBy/join key (dedup.py history,
    round 13) — the baseline for the hashed-diet measurement."""
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = documents.select(
        F.col(id_col), F.posexplode(w).alias("__p0", "__tok")
    ).select(F.col(id_col), (F.col("__p0") + 1).alias("__pos"), "__tok")
    grams = (
        documents.select(F.col(id_col), w.alias("__w"))
        .filter(F.size("__w") >= k)
        .select(
            F.col(id_col),
            F.col("__w"),
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (k - 1))
            ).alias("__pos"),
        )
        .select(
            F.col(id_col),
            "__pos",
            F.concat_ws(
                " ", *[F.element_at("__w", F.col("__pos") + j) for j in range(k)]
            ).alias("__g"),
        )
    )
    okey = F.concat(
        F.lpad(F.col(id_col).cast("string"), 12, "0"),
        F.lpad(F.col("__pos").cast("string"), 12, "0"),
    )
    gh = grams.select(id_col, "__pos", "__g", okey.alias("__ok"))
    rep = (
        gh.groupBy("__g")
        .agg(
            F.countDistinct(id_col).alias("__nd"),
            F.min("__ok").alias("__canon"),
        )
        .filter(F.col("__nd") >= 2)
        .select("__g", "__canon")
    )
    flagged = (
        gh.join(rep, "__g")
        .filter(F.col("__ok") != F.col("__canon"))
        .select(id_col, "__pos")
        .distinct()
    )
    cover_w = (
        Window.partitionBy(id_col).orderBy("__pos").rowsBetween(-(k - 1), 0)
    )
    lag_w = Window.partitionBy(id_col).orderBy("__pos")
    covered = (
        toks.join(
            flagged.withColumn("__flag", F.lit(1)), [id_col, "__pos"], "left"
        )
        .select(
            F.col(id_col),
            "__pos",
            "__tok",
            F.coalesce(F.col("__flag"), F.lit(0)).alias("__flag"),
        )
        .withColumn("__cov", F.max("__flag").over(cover_w))
        .withColumn(
            "__spanstart",
            (
                (F.col("__cov") == 1)
                & (F.coalesce(F.lag("__cov").over(lag_w), F.lit(0)) == 0)
            ).cast("bigint"),
        )
    )
    return covered.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__cov") == 0, F.struct("__pos", "__tok"))
                    )
                ),
                lambda s: s["__tok"],
            ),
        ).alias("clean_text"),
        F.sum("__cov").cast("bigint").alias("n_tokens_removed"),
        F.sum("__spanstart").cast("bigint").alias("n_spans_removed"),
    )


def _multiply(df, mult: int, stride: int = 10_000_000):
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * stride))
        )
    return out.repartition(32).localCheckpoint()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # get_spark disables the UI; the probe needs the REST status API for
    # shuffle bytes — build the same session with the UI on
    from pyspark.sql import SparkSession

    from flink_example_spark.session import RUNTIME_CONF, tune

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName("r14-probe")
        .master(f"local[{cpus}]")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        .config("spark.ui.enabled", "true")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = tune(builder.getOrCreate())
    assert spark.sparkContext.uiWebUrl, "spark UI required for shuffle bytes"
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()
    substring_spans_dedup(docs, k=10).write.format("noop").mode(
        "overwrite"
    ).save()  # warmup

    print(f"{'scale':>6} {'variant':>8} {'wall_s':>8} {'shuffle_MB':>11}")
    for mult in (1, 4, 8):
        d = _multiply(docs, mult)
        for label, fn in (
            ("hashed", substring_spans_dedup),
            ("string", _legacy_string_key),
        ):
            b0 = _shuffle_write_bytes(spark)
            t0 = time.perf_counter()
            fn(d, k=10).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            dmb = (_shuffle_write_bytes(spark) - b0) / 1e6
            print(f"x{mult:>5} {label:>8} {wall:>8.2f} {dmb:>11.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
