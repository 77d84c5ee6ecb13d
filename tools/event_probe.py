"""Scale probe for the round-6-continuation operator families: replicate
the sf0.1 events/documents tables Nx (shifting keys so cardinalities grow
too) and measure the new operators' wall. Complements tools/text_probe.py.

Run quiet: `python tools/event_probe.py` → one table. Expectation: funnel
and bursts scale with the event count (frontier joins / one window);
zorder stats stay aggregate-bound; OLS fit is scan-bound; textrank is
iteration-overhead-bound (vocab saturates); triangles follow the (near-
constant) term-graph size.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_example_spark.operators.cep import event_bursts, funnel
from flink_example_spark.operators.graph import pagerank, term_graph, triangle_counts
from flink_example_spark.operators.layout import zorder_bucket_stats
from flink_example_spark.operators.ml import linear_fit
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


def timed(label, thunk):
    # wrap CONSTRUCTION too: iterative operators (pagerank, funnel chains)
    # run eager lineage-cut jobs while building the DataFrame
    t0 = time.time()
    thunk().write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("event-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev0 = load_table(spark, sf_dir, "events")
    docs0 = load_table(spark, sf_dir, "documents")
    print(f"| mult | events | funnel | bursts | zorder | ols_fit | textrank | triangles |")
    print("|---|---|---|---|---|---|---|---|")
    for mult in (1, 4, 8):
        ev = replicate(ev0, mult, ["event_id", "user_id"]).localCheckpoint()
        docs = replicate(docs0, mult, ["doc_id"]).localCheckpoint()
        n = ev.count()
        t_f = timed(
            "funnel", lambda: funnel(ev, ["view", "click", "purchase"], 86400)
        )
        t_b = timed("bursts", lambda: event_bursts(ev, "error", 3, 43200))
        t_z = timed(
            "zorder",
            lambda: zorder_bucket_stats(
                ev,
                {
                    "uid": F.col("user_id") % 1024,
                    "mod": (F.hour("ts") * 60 + F.minute("ts")) % 1024,
                },
                bits=10,
                bucket_bits=6,
            ),
        )
        d = docs.select(
            "lang", "n_chars", (F.col("n_chars") / 5).cast("long").alias("x")
        )
        t_m = timed("ols", lambda: linear_fit(d, "lang", "x", "n_chars"))
        g = term_graph(docs, min_weight=2)
        t_p = timed("textrank", lambda: pagerank(g, n_iter=6, weight_col="w"))
        t_t = timed(
            "tri",
            lambda: triangle_counts(
                g.filter(F.col("src") < F.col("dst")), "src", "dst"
            ),
        )
        print(
            f"| {mult}x | {n:,} | {t_f:.1f}s | {t_b:.1f}s | {t_z:.1f}s "
            f"| {t_m:.1f}s | {t_p:.1f}s | {t_t:.1f}s |"
        )


if __name__ == "__main__":
    main()
