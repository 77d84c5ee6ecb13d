"""Round-13 family scale probe: wall clock at 1x / 4x / 8x synthetic
input growth for the three round-13 representatives —

- dyadic_quantiles: events multiplied with value jitter (value space
  grows with rows). Claim: FLAT-ish — ONE map-side-combined JVM
  aggregation; per-row UDAF update dominates, so wall grows ~linearly
  in rows/cores but shuffle bytes stay O(k * partitions).
- mg_heavy_hitters: same events multiplied on the band key space.
  Claim: near-FLAT — MG branch is O(k)-state map-side aggregation; the
  exact branch is a standard two-agg count.
- substring_spans_dedup: documents multiplied by doc_id offset (repeat
  structure preserved within each copy, and copies repeat ACROSS —
  flagged volume grows with corpus). Claim: LINEAR — one shingle
  shuffle + per-doc windows; never all-pairs.

Inputs are localCheckpoint-ed so synthesis is excluded from the timing.
Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/r13_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.dedup import (  # noqa: E402
    substring_spans_dedup,
)
from flink_example_spark.operators.sketch import (  # noqa: E402
    dyadic_quantiles,
    mg_heavy_hitters,
)
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402


def _multiply(df, mult: int, id_col: str | None, stride: int = 10_000_000):
    out = df
    for i in range(1, mult):
        piece = df
        if id_col is not None:
            piece = df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        out = out.unionByName(piece)
    return out.repartition(32).localCheckpoint()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13-probe")
    ev = load_table(spark, sf_dir, "events").localCheckpoint()
    docs = load_table(spark, sf_dir, "documents").localCheckpoint()

    dyadic_quantiles(ev, "event_type", "value", k=64).collect()  # warmup

    for mult in (1, 4, 8):
        e = _multiply(ev, mult, "event_id")
        t0 = time.perf_counter()
        dyadic_quantiles(e, "event_type", "value", k=64).collect()
        t1 = time.perf_counter()
        mg_heavy_hitters(
            e.selectExpr(
                "event_type", "CAST(floor(value / 25) AS BIGINT) AS band"
            ),
            "event_type",
            "band",
            k=8,
        ).collect()
        t2 = time.perf_counter()
        d = _multiply(docs, mult, "doc_id")
        t3 = time.perf_counter()
        substring_spans_dedup(d, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        t4 = time.perf_counter()
        print(
            f"x{mult}: dyadic_quantiles {t1 - t0:.2f}s"
            f"  mg_heavy_hitters {t2 - t1:.2f}s"
            f"  substring_spans {t4 - t3:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
