"""Scale probe for the continuation-3 operator families: replicate the
sf0.1 events/documents tables Nx (shifting keys so cardinalities grow
too) and measure wall. Complements tools/event_probe.py.

Run quiet: `python tools/analytics_probe.py` → one table. Expectations:
cdc_apply / ohlc / transitions / actives / anomalies are one-or-two
aggregation passes → near-linear; dsir / bigram grow with the token
stream (vocab saturates, the model joins stay broadcast); ahash is
Python-decode-bound (linear, embarrassingly parallel); user_knn pair
count grows with users² at FIXED dims — the documented block-first
regime.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_example_spark.operators.cep import (
    event_transitions,
    last_touch_attribution,
    retention_cohorts,
)
from flink_example_spark.operators.curation import dsir_weights
from flink_example_spark.operators.ml import mad_outliers, user_knn
from flink_example_spark.operators.multimodal import encode_codec_media, image_ahash
from flink_example_spark.operators.text import bigram_surprisal
from flink_example_spark.operators.timeseries import (
    ohlc_bars,
    rolling_active_users,
    seasonal_anomalies,
)
from flink_example_spark.operators.versioned import apply_changelog
from flink_example_spark.session import get_spark
from flink_example_spark.tables import load_table


def replicate(df, mult, key_cols):
    if mult == 1:
        return df
    parts = []
    for i in range(mult):
        p = df
        for k in key_cols:
            p = p.withColumn(k, F.col(k) + F.lit(i * 10_000_000))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def timed(thunk):
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def cdc(ev):
    split = F.to_timestamp(F.lit("2024-01-20 00:00:00"))
    base = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("ts") <= split))
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ch = (
        ev.filter((F.col("ts") > split) & F.col("event_type").isin("purchase", "error", "signup"))
        .select(
            F.col("user_id").alias("_entity"),
            "ts",
            F.col("event_id").alias("seq"),
            F.when(F.col("event_type") == "purchase", F.lit("+U"))
            .when(F.col("event_type") == "error", F.lit("-D"))
            .otherwise(F.lit("+I"))
            .alias("op"),
            (F.col("event_id") % 100).alias("cnt"),
        )
    )
    return apply_changelog(base, ch, "_entity", "ts", seq_col="seq")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("analytics-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev0 = load_table(spark, sf_dir, "events")
    docs0 = load_table(spark, sf_dir, "documents")
    cols = [
        "cdc", "ohlc", "trans", "actives", "anomal", "attrib", "cohorts",
        "knn", "mad", "dsir", "bigram", "ahash",
    ]
    print("| mult | events | docs | " + " | ".join(cols) + " |", flush=True)
    print("|" + "---|" * (len(cols) + 3), flush=True)
    for mult in (1, 4, 8):
        ev = replicate(ev0, mult, ["event_id", "user_id"]).localCheckpoint()
        docs = replicate(docs0, mult, ["doc_id"]).localCheckpoint()
        times = [
            timed(lambda: cdc(ev)),
            timed(lambda: ohlc_bars(ev, "user_id", "ts", "value", seq_col="event_id")),
            timed(lambda: event_transitions(ev)),
            timed(lambda: rolling_active_users(ev)),
            timed(lambda: seasonal_anomalies(ev, "event_type", "ts", min_count=4)),
            timed(lambda: last_touch_attribution(ev, "purchase", ["view", "click"])),
            timed(lambda: retention_cohorts(ev)),
            # user_knn is users-squared at fixed dims by DESIGN (the
            # docstring's block-first regime) — probing it unblocked past
            # 1x just measures the quadratic candidate join; 1x only
            timed(lambda: user_knn(ev, k=3)) if mult == 1 else float("nan"),
            timed(lambda: mad_outliers(docs, "lang", "n_chars", "doc_id", c=1.5)),
            timed(lambda: dsir_weights(docs, target_pred=F.col("lang") == "en")),
            timed(
                lambda: bigram_surprisal(docs, train_pred=F.col("doc_id") % 2 == 0)
            ),
            timed(
                lambda: image_ahash(
                    encode_codec_media(docs, formats=("pgm", "aiff")).filter(
                        F.col("media_type") == "image"
                    )
                )
            ),
        ]
        n_ev, n_docs = ev.count(), docs.count()
        print(
            f"| {mult}x | {n_ev:,} | {n_docs:,} | "
            + " | ".join("-" if t != t else f"{t:.1f}s" for t in times)
            + " |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
