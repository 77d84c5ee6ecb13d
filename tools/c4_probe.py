"""Scale probe for the continuation-4 operator families: replicate the
sf0.1 events/documents/embeddings tables Nx (shifting keys so
cardinalities grow too) and measure wall. Complements
tools/analytics_probe.py.

Run quiet: `python tools/c4_probe.py` -> one table. Expectations:
nb / entropy / winnow / assoc grow with the token stream (vocab
saturates); cusum / ewma / rfm / rate / seqpat / forecast are one-to-
three aggregation-or-window passes -> near-linear; label_prop scales
with edges x rounds (vocab-bounded graph -> flat-ish); ppjoin candidate
cost = prefix-list collision mass (rare-first ordering bounds it);
pca's data pass is the dim^2-bounded covariance shuffle; bootstrap is
one Bx explode + two aggregations.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_example_spark.operators.dedup import ppjoin_pairs
from flink_example_spark.operators.graph import label_propagation, term_graph
from flink_example_spark.operators.mining import assoc_rules, seq_patterns
from flink_example_spark.operators.ml import (
    bootstrap_ci,
    nb_language_classifier,
)
from flink_example_spark.operators.similarity import pca_power
from flink_example_spark.operators.text import token_entropy, winnowing_fingerprints
from flink_example_spark.operators.timeseries import (
    cusum_changepoints,
    ewma_smooth,
    seasonal_naive_eval,
)
from flink_example_spark.operators.cep import rate_limit_audit, rfm_segments
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("c4-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev0 = load_table(spark, sf_dir, "events")
    docs0 = load_table(spark, sf_dir, "documents")
    emb0 = load_table(spark, sf_dir, "embeddings")
    cols = [
        "nb", "cusum", "ewma", "lpa", "assoc", "seqpat", "ppjoin",
        "pca", "boot", "entropy", "winnow", "rfm", "rate", "fcast",
    ]
    print("| mult | events | docs | " + " | ".join(cols) + " |", flush=True)
    print("|" + "---|" * (len(cols) + 3), flush=True)
    for mult in (1, 4, 8):
        ev = replicate(ev0, mult, ["event_id", "user_id"]).localCheckpoint()
        docs = replicate(docs0, mult, ["doc_id"]).localCheckpoint()
        emb = replicate(emb0, mult, ["vec_id"]).localCheckpoint()
        times = [
            timed(lambda: nb_language_classifier(docs)),
            timed(lambda: cusum_changepoints(
                ev, "event_type", "ts", "value", "event_id", h=2000.0)),
            timed(lambda: ewma_smooth(ev, "user_id", "ts", "value", "event_id")),
            timed(lambda: label_propagation(
                term_graph(docs, min_weight=2), n_rounds=4)),
            timed(lambda: assoc_rules(
                docs, min_df=250 * mult, min_pair_count=200 * mult,
                min_conf_pct=80)),
            timed(lambda: seq_patterns(ev, min_support=25)),
            # the harness corpus is ~all-mutually-similar, so the PPJoin
            # OUTPUT is quadratic in docs here (like the exact-jaccard
            # baseline) — candidate cost is output-bound, probe 1x only
            timed(lambda: ppjoin_pairs(docs, 4, 5)) if mult == 1 else float("nan"),
            timed(lambda: pca_power(emb)),
            timed(lambda: bootstrap_ci(ev)),
            timed(lambda: token_entropy(docs)),
            timed(lambda: winnowing_fingerprints(docs)),
            timed(lambda: rfm_segments(ev)),
            timed(lambda: rate_limit_audit(ev, limit=5)),
            timed(lambda: seasonal_naive_eval(ev, "event_type", "ts")),
        ]
        n_ev = ev.count()
        n_docs = docs.count()
        print(
            f"| {mult}x | {n_ev:,} | {n_docs:,} | "
            + " | ".join(f"{t:.1f}s" for t in times)
            + " |",
            flush=True,
        )


if __name__ == "__main__":
    main()
