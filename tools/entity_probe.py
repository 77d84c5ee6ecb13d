"""Entity-resolution scale probe: wall clock at 1x / 4x / 8x the sf0.1
dirty registry (synthetic growth by id-offset unions — name distribution
unchanged, so the SymSpell candidate structure scales realistically).

The claim under test: resolution cost tracks the DISTINCT-name relation
(vocabulary-sized), not the record count — exact grouping absorbs record
growth, so the fuzzy join + clustering stay flat while ingest scales.

Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/entity_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_example_spark.operators.entity import (  # noqa: E402
    dirty_registry,
    resolve_entities,
)
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("entity-probe")
    base = dirty_registry(load_table(spark, sf_dir, "part"))
    n_base = base.count()
    for mult in (1, 4, 8):
        reg = base
        for i in range(1, mult):
            reg = reg.unionByName(
                base.select(
                    (F.col("id") + F.lit(i * 10_000_000)).alias("id"), "name"
                )
            )
        reg = reg.localCheckpoint()  # exclude synthesis from the timing
        t0 = time.perf_counter()
        out = resolve_entities(reg, max_dist=1)
        n_ent = out.count()
        wall = time.perf_counter() - t0
        print(
            f"mult={mult} records={n_base * mult} entities={n_ent} "
            f"wall={wall:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
