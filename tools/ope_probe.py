"""OPE scale probe: wall clock at 1x / 4x / 8x the sf0.1 synthetic log
relation for ips_snips (ONE five-sum aggregation — claim: flat-to-
linear, shuffle carries one row per task) and dr_value (context-sized
q table + one scoring pass — claim: linear one-pass).

Run on a QUIET box: python tools/ope_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.policy import (  # noqa: E402
    dr_value,
    ips_snips,
    synth_policy_logs,
)
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ope-probe")
    base = synth_policy_logs(
        load_table(spark, sf_dir, "events")
    ).localCheckpoint()
    for mult in (1, 4, 8):
        logs = base
        for i in range(1, mult):
            logs = logs.unionByName(
                logs.limit(0).unionByName(
                    base.withColumn(
                        "log_id", F.col("log_id") + F.lit(i * 10_000_000)
                    )
                )
            )
        logs = logs.localCheckpoint()
        t0 = time.perf_counter()
        ips_snips(logs).collect()
        ips_wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        dr_value(logs).collect()
        dr_wall = time.perf_counter() - t0
        print(
            f"mult={mult} rows={logs.count()} ips={ips_wall:.2f}s"
            f" dr={dr_wall:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
