"""Round-12 family scale probe: wall clock at 1x / 4x / 8x synthetic
input growth for the three round-12 representatives —

- ab_switchback: events multiplied (same bucket space — more rows per
  bucket). Claim: FLAT — two map-side-combined aggregations, state
  bucket-sized then O(1).
- ab_cluster_lift: events multiplied by user_id offset (cluster space
  grows). Claim: FLAT — per-cluster aggregation + O(1) arm rollup.
- policy_sndr_eval: logs multiplied by log_id offset (same 4-context
  space). Claim: FLAT — one context-sized aggregation + one scoring
  pass, both map-side-combined.

Inputs are localCheckpoint-ed so synthesis is excluded from the timing.
Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/r12_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.ml import (  # noqa: E402
    ab_cluster_lift,
    ab_switchback,
)
from flink_example_spark.operators.policy import (  # noqa: E402
    sndr_value,
    synth_policy_logs,
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
    spark = get_spark("r12-probe")
    ev = load_table(spark, sf_dir, "events").localCheckpoint()
    logs = synth_policy_logs(ev).localCheckpoint()

    ab_switchback(ev).collect()  # session warmup

    for mult in (1, 4, 8):
        e = _multiply(ev, mult, None)  # same buckets, more rows each
        t0 = time.perf_counter()
        ab_switchback(e).collect()
        swb = time.perf_counter() - t0

        ec = _multiply(ev, mult, "user_id")  # cluster space grows
        t0 = time.perf_counter()
        ab_cluster_lift(ec).collect()
        cl = time.perf_counter() - t0

        lg = _multiply(logs, mult, "log_id")
        t0 = time.perf_counter()
        sndr_value(lg).collect()
        sn = time.perf_counter() - t0

        print(
            f"mult={mult} events={e.count()} clusters_rows={ec.count()} "
            f"logs={lg.count()} | switchback={swb:.2f}s "
            f"cluster_lift={cl:.2f}s sndr={sn:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
