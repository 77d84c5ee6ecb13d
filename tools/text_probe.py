"""Scale probe for the round-6 text/sketch operators: replicate the sf0.1
documents table N x (id-offset copies, same vocabulary richness per copy)
and measure full-consume wall for bm25 / cm_sketch / pmi / fuzzy pairs /
temperature_mix. Linear-or-better growth = no hidden quadratic term.

Usage: python tools/text_probe.py [--multiples 1,4,8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def replicate(docs, n):
    out = docs
    for i in range(1, n):
        out = out.union(docs.withColumn("doc_id", F.col("doc_id") + 100000 * i))
    return out.localCheckpoint(eager=True)


def consume(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--multiples", default="1,4,8")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from flink_example_spark.operators.curation import temperature_mix
    from flink_example_spark.operators.dedup import fuzzy_word_pairs
    from flink_example_spark.operators.sketch import cm_sketch
    from flink_example_spark.operators.text import bm25_topk, pmi_collocations
    from flink_example_spark.session import get_spark
    from flink_example_spark.tables import load_table

    spark = get_spark("text-probe")
    base = load_table(spark, args.sf, "documents")
    qs = spark.createDataFrame(
        [(0, "fast table scan"), (1, "stream batch join")],
        "query_id bigint, query_text string",
    )
    for n in [int(x) for x in args.multiples.split(",")]:
        docs = replicate(base, n)
        rows = docs.count()
        toks = docs.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term")
        )
        walls = {
            "bm25": consume(bm25_topk(docs, qs)),
            "cm_sketch": consume(cm_sketch(toks, "term", depth=4, width=256)),
            "pmi": consume(pmi_collocations(docs, topk=30, min_count=3)),
            "fuzzy": consume(fuzzy_word_pairs(docs)),
            "temp_mix": consume(temperature_mix(docs, target_total=rows // 2)),
        }
        print(
            f"x{n} ({rows} docs): "
            + "  ".join(f"{k}={v:.2f}s" for k, v in walls.items()),
            flush=True,
        )


if __name__ == "__main__":
    main()
