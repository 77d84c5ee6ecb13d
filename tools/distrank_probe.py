"""Scale probe: distributed two-phase rank (distrank.dist_row_number)
vs the single-partition Window.orderBy it replaced.

Measures wall time of a full global ROW_NUMBER + checksum aggregate over
n synthetic rows at growing n, both ways. The single-partition window
serializes ALL rows through one task (the 100-TB killer the round-8
rewrite removed); the two-phase device keeps every data-scaled stage
partitioned. Run quiet: python tools/distrank_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_example_spark.operators.distrank import dist_row_number
from flink_example_spark.session import get_spark


def main() -> None:
    spark = get_spark("distrank-probe")
    for n in (1_000_000, 4_000_000, 16_000_000):
        base = (
            spark.range(n)
            .repartition(32)
            .select(
                F.col("id"),
                (F.xxhash64(F.col("id")) % 1000).alias("v"),
            )
        )
        base.count()  # warm the input

        t0 = time.perf_counter()
        chk1 = (
            dist_row_number(base, ["v", "id"], "rn")
            .agg(F.sum(F.col("rn") * F.col("v")).alias("chk"))
            .first()["chk"]
        )
        t_dist = time.perf_counter() - t0

        t0 = time.perf_counter()
        chk2 = (
            base.withColumn(
                "rn", F.row_number().over(Window.orderBy("v", "id"))
            )
            .agg(F.sum(F.col("rn") * F.col("v")).alias("chk"))
            .first()["chk"]
        )
        t_single = time.perf_counter() - t0

        assert chk1 == chk2, (chk1, chk2)
        print(
            f"n={n:>10,}  two-phase={t_dist:6.2f}s  "
            f"single-partition={t_single:6.2f}s  "
            f"speedup={t_single / t_dist:5.2f}x  (checksums equal)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
