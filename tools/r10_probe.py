"""Round-10 family scale probe: wall clock at 1x / 4x / 8x synthetic
input growth for the three round-10 representatives —

- pref_bradley_terry: matches multiplied (same 8-item space, more
  matches). Claim: FLAT — the MM loop's state is item-sized; only the
  one win-count aggregation sees the growth.
- causal_ipw_ate: units multiplied by user_id offset (same covariate
  bins). Claim: LINEAR one-pass — n_steps parameter-sized gradient
  aggregations + one scoring aggregation over the unit relation.
- timeseries_rmst_by_arm: (user, ts, arm) events multiplied by user_id
  offset. Claim: FLAT-ish after the span aggregation — the FH curve
  windows run over the DISTINCT-lifetime relation (day-span bounded).

Inputs are localCheckpoint-ed so synthesis is excluded from the timing.
Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/r10_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.ml import ipw_ate  # noqa: E402
from flink_example_spark.operators.preference import (  # noqa: E402
    bradley_terry,
    synth_matches,
)
from flink_example_spark.operators.timeseries import rmst_by_arm  # noqa: E402
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402


def _multiply(df, mult: int, id_col: str, stride: int = 10_000_000):
    out = df
    for i in range(1, mult):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * stride))
        )
    return out.localCheckpoint()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r10-probe")
    ev = load_table(spark, sf_dir, "events")

    matches = synth_matches(ev, n_items=8).localCheckpoint()
    units = (
        __import__("__spark_entry__", fromlist=["_causal_units"])
        ._causal_units(spark, sf_dir)
        .localCheckpoint()
    )
    spans = ev.selectExpr(
        "user_id", "ts", "user_id % 2 AS arm"
    ).localCheckpoint()

    for mult in (1, 4, 8):
        # BT: multiply matches (no id offset — same item space)
        m = matches
        for _ in range(1, mult):
            m = m.unionByName(matches)
        m = m.localCheckpoint()
        t0 = time.perf_counter()
        bradley_terry(m, n_iter=8).collect()
        bt_wall = time.perf_counter() - t0

        u = _multiply(units, mult, "user_id")
        t0 = time.perf_counter()
        ipw_ate(u, "treated", "y", ["act_b", "err_b"]).collect()
        ipw_wall = time.perf_counter() - t0

        s = _multiply(spans, mult, "user_id")
        t0 = time.perf_counter()
        rmst_by_arm(
            s, "user_id", "ts", "arm", horizon_days=7, tau_days=30
        ).collect()
        rmst_wall = time.perf_counter() - t0

        print(
            f"mult={mult} matches={m.count()} units={u.count()} "
            f"spans={s.count()} | bt={bt_wall:.2f}s ipw={ipw_wall:.2f}s "
            f"rmst_by_arm={rmst_wall:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
