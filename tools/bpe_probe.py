"""Probe NEXT.md item: BPE per-round job fusion.

Current bpe_train pays TWO jobs per merge round: the pair-count
aggregation (with top-1 collect) and the eager localCheckpoint that
materializes the merged sequences. The fused variant uses persist()
instead — the NEXT round's aggregation materializes the cache as a side
effect, saving one job per round at the cost of a logical plan that grows
by one interpreted merge-fold per round.

Run quiet: `python tools/bpe_probe.py [sf_dir]`. Prints wall + merge
tables for both variants (they must be identical).
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from flink_example_spark.operators.bpe import _adjacent_pairs, _merge_expr, _word_freqs
from flink_example_spark.session import get_spark
from flink_example_spark.tables import load_table


def train_fused(documents, n_merges=8):
    spark = documents.sparkSession
    words = _word_freqs(documents, "doc_id", "text")
    seqs = words.select(
        F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("s"), "freq"
    ).persist()
    merges = []
    for m in range(1, n_merges + 1):
        top = (
            _adjacent_pairs(seqs)
            .groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["pair_count"]
        merges.append((m, a, b, int(cnt)))
        nxt = seqs.select(_merge_expr(a, b).alias("s"), "freq").persist()
        seqs.unpersist()
        seqs = nxt  # NOT materialized here: next round's agg fills the cache
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("bpe-probe")
    docs = load_table(spark, sf_dir, "documents")
    from flink_example_spark.operators.bpe import bpe_train

    t0 = time.time()
    base = [tuple(r) for r in bpe_train(docs, n_merges=8).collect()]
    t_base = time.time() - t0
    t0 = time.time()
    fused = train_fused(docs, n_merges=8)
    t_fused = time.time() - t0
    print(f"baseline (localCheckpoint/round): {t_base:.2f}s")
    print(f"fused (persist, agg materializes): {t_fused:.2f}s")
    print("identical merges:", sorted(base) == sorted(fused))
    if sorted(base) != sorted(fused):
        print("base ", base)
        print("fused", fused)


if __name__ == "__main__":
    main()
