"""Measure ANN dot-product alternatives (VERDICT r2 item #2).

The scoring stage of every ANN path computes cosine over 64-dim double
arrays per joined (query, neighbor) pair.  Candidates:

- fold       current: F.aggregate(F.zip_with(a,b,*),0.0,+) — interpreted
             higher-order lambda, but a tight loop over a primitive array.
- unrolled   lit(0.0)+a[1]*b[1]+...+a[64]*b[64] element_at chain — pure
             whole-stage codegen, same left-fold association order.
- explode    posexplode corpus vectors, broadcast-join exploded queries on
             pos, codegen hash-agg SUM(x*y) per (q,n) pair — the DESIGN.md
             "explode + codegen aggregates" pattern; adds a real shuffle.
- pandas     Arrow-batched numpy matmul scalar pandas UDF — vectorized
             ceiling reference; numpy pairwise summation changes the fold
             order so it is NOT oracle-bit-identical by construction.

Protocol (PERF.md): consume every output column (sum+count over cos) so
Catalyst cannot prune the scoring expression; alternate runs per variant;
report each run.  Bit-identity vs `fold` checked at 1x replication.

Usage: python tools/dot_bench.py [--sf /root/testdata/sf0.1] [--rep 64]
"""

# no `from __future__ import annotations`: pandas_udf type-hint inference
# needs real (non-string) annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_example_spark.operators.similarity import as_double_vec, dot, l2_norm
from flink_example_spark.session import get_spark, tune

DIM = 64


def dot_unrolled(a, b):
    expr = F.lit(0.0)
    for i in range(1, DIM + 1):
        expr = expr + F.element_at(a, i) * F.element_at(b, i)
    return expr


def load(spark, sf, rep: int) -> tuple[DataFrame, DataFrame]:
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", as_double_vec(F.col("embedding")).alias("vec")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    if rep > 1:
        n = emb.count()
        corpus = emb.crossJoin(
            spark.range(rep).select(F.col("id").alias("__r"))
        ).select((F.col("vec_id") + F.col("__r") * n).alias("vec_id"), "vec")
    else:
        corpus = emb
    corpus = corpus.repartition(32).persist()
    corpus.count()
    return corpus, queries.persist()


def scored_join(corpus, queries, dot_fn):
    c = corpus.select(
        F.col("vec_id").alias("n_id"), F.col("vec").alias("n_vec"),
        l2_norm(F.col("vec")).alias("n_norm"),
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec"),
        l2_norm(F.col("vec")).alias("q_norm"),
    )
    j = c.join(F.broadcast(q), F.lit(True)).filter(F.col("q_id") != F.col("n_id"))
    return j.select(
        "q_id", "n_id",
        (dot_fn(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
    )


def scored_explode(corpus, queries, spark):
    c = corpus.select(
        F.col("vec_id").alias("n_id"), l2_norm(F.col("vec")).alias("n_norm"),
        F.posexplode("vec").alias("pos", "x"),
    )
    q = queries.select(
        F.col("vec_id").alias("q_id"), l2_norm(F.col("vec")).alias("q_norm"),
        F.posexplode("vec").alias("pos", "y"),
    )
    j = c.join(F.broadcast(q), "pos").filter(F.col("q_id") != F.col("n_id"))
    return (
        j.groupBy("q_id", "n_id", "q_norm", "n_norm")
        .agg(F.sum(F.col("x") * F.col("y")).alias("d"))
        .select("q_id", "n_id", (F.col("d") / (F.col("q_norm") * F.col("n_norm"))).alias("cos"))
    )


def scored_pandas(corpus, queries, spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qrows = queries.select("vec_id", "vec").collect()  # 8 rows — driver-size OK
    qids = [r.vec_id for r in qrows]
    qmat = np.array([r.vec for r in qrows])  # (8, 64)

    @pandas_udf("array<double>")
    def dots(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist())  # (batch, 64)
        return pd.Series((m @ qmat.T).tolist())

    scored = corpus.select(
        F.col("vec_id").alias("n_id"), l2_norm(F.col("vec")).alias("n_norm"),
        dots(F.col("vec")).alias("ds"),
    ).select(
        "n_id", "n_norm",
        F.posexplode("ds").alias("qi", "d"),
    )
    qdf = spark.createDataFrame(
        [(i, qid, float(np.sqrt(qmat[i] @ qmat[i]))) for i, qid in enumerate(qids)],
        ["qi", "q_id", "q_norm"],
    )
    return (
        scored.join(F.broadcast(qdf), "qi")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", (F.col("d") / (F.col("q_norm") * F.col("n_norm"))).alias("cos"))
    )


def consume(df: DataFrame) -> tuple[float, tuple]:
    t0 = time.time()
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cos").alias("s"), F.min("cos"), F.max("cos")
    ).first()
    return time.time() - t0, tuple(row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rep", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("dot_bench")
    tune(spark)

    variants = {
        "fold": lambda c, q: scored_join(c, q, dot),
        "unrolled": lambda c, q: scored_join(c, q, dot_unrolled),
        "explode": lambda c, q: scored_explode(c, q, spark),
        "pandas": lambda c, q: scored_pandas(c, q, spark),
    }

    # bit-identity at 1x: exact cos values per (q,n) vs fold
    c1, q1 = load(spark, args.sf, 1)
    base = {(r.q_id, r.n_id): r.cos for r in variants["fold"](c1, q1).collect()}
    for name, fn in variants.items():
        got = {(r.q_id, r.n_id): r.cos for r in fn(c1, q1).collect()}
        ident = got == base
        worst = max((abs(got[k] - base[k]) for k in base), default=0.0)
        print(f"identity {name}: bit_identical={ident} max_abs_diff={worst:.3e}")
    c1.unpersist(), q1.unpersist()

    corpus, queries = load(spark, args.sf, args.rep)
    n = corpus.count()
    print(f"corpus={n} vectors x {DIM} dims, queries=8, pairs~{n*8}")
    for r in range(args.rounds):
        for name, fn in variants.items():
            sec, chk = consume(fn(corpus, queries))
            print(f"round{r} {name}: {sec:.2f}s check={chk}")


if __name__ == "__main__":
    main()
