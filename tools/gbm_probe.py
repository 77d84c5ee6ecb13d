"""GBM-stumps scale probe: wall clock at 1x / 4x / 8x the sf0.1 lineitem
(synthetic growth by unioned self-copies — the quantized feature/target
DISTRIBUTIONS are unchanged, so the split-search structure scales
realistically while row volume grows).

The claim under test: per boosting round the shuffle carries the
(feature x quantized-value) relation — value-CARDINALITY-sized, not
row-count-sized — so wall clock should grow far slower than 8x (the
row-linear parts are the scan and the broadcast residual update).

Run on a QUIET box (PERF.md bench-noise protocol):
    python tools/gbm_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce  # noqa: E402

from flink_example_spark.operators.ml import gbm_stumps  # noqa: E402
from flink_example_spark.session import get_spark  # noqa: E402
from flink_example_spark.tables import load_table  # noqa: E402

FEATS = [
    ("qty", "l_quantity", 1),
    ("disc", "l_discount", 100),
    ("tax", "l_tax", 100),
    ("pbkt", "CAST(l_partkey % 32 AS DOUBLE)", 1),
]
TARGET = "l_extendedprice * l_discount / 10"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("gbm-probe")
    base = load_table(spark, sf_dir, "lineitem").localCheckpoint()
    for mult in (1, 4, 8):
        df = reduce(
            lambda a, b: a.unionByName(b), [base] * mult
        ).localCheckpoint()
        n = df.count()
        t0 = time.time()
        rows = gbm_stumps(df, TARGET, FEATS, rounds=3).collect()
        dt = time.time() - t0
        print(
            f"mult={mult} rows={n} wall={dt:.2f}s "
            f"final_sse={rows[-1]['sse_after']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
