"""Distributed global ranking — the two-phase rank/prefix-sum device.

``Window.orderBy(...)`` with no ``partitionBy`` moves EVERY row to one
task (Spark prints the single-partition warning); over a data-scaled
relation that is the 100-TB killer. The exact fix is TeraSort's rank
device, the same shape ``curation.systematic_sample`` proved for
weighted cumsums:

1. ``repartitionByRange`` on the full order key — the range partitioner
   guarantees partition ``i``'s keys all sort before partition ``j``'s
   for ``i < j``, so ``spark_partition_id()`` becomes an
   order-preserving bucket.
2. ``row_number``/``sum`` windows partitioned BY that bucket — every
   task ranks only its own range slice.
3. A bucket-count-sized (never row-count-sized) offset relation —
   per-bucket row counts, prefix-summed over at most ``parts`` rows —
   broadcast back and added to the within-bucket rank.

Determinism: the final rank is the exact global ROW_NUMBER regardless
of where the range boundaries fall, and both consumers of the ranged
relation share ONE exchange (ReusedExchange; the range sampler is
itself seed-deterministic), so the bucket ids agree between the rank
branch and the offset branch. AQE coalescing merges only ADJACENT
ranges, which preserves bucket order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dist_row_number", "dist_cumsum"]

_PID = "__dr_pid"
_RIN = "__dr_rin"
_OFF = "__dr_off"


def _bucketed(df: DataFrame, order_cols: list[Column | str], parts: int | None):
    if parts is None:
        parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )


def _offsets(t: DataFrame, val_col: Column) -> DataFrame:
    """Per-bucket totals -> exclusive prefix sum. The ONLY unpartitioned
    window, over a bucket-count-sized relation."""
    sizes = t.groupBy(_PID).agg(F.sum(val_col).alias("__dr_n"))
    w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    return sizes.select(
        _PID, F.coalesce(F.sum("__dr_n").over(w), F.lit(0)).alias(_OFF)
    )


def dist_row_number(
    df: DataFrame,
    order_cols: list[Column | str],
    out_col: str = "rn",
    parts: int | None = None,
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY order_cols)`` with no
    single-partition window. ``order_cols`` must be a total order
    (include a tiebreak column) for a deterministic result."""
    t = _bucketed(df, order_cols, parts)
    w_in = Window.partitionBy(_PID).orderBy(*order_cols)
    t = t.withColumn(_RIN, F.row_number().over(w_in))
    offs = _offsets(t, F.lit(1))
    return (
        t.join(F.broadcast(offs), _PID)
        .withColumn(out_col, (F.col(_OFF) + F.col(_RIN)).cast("bigint"))
        .drop(_PID, _RIN, _OFF)
    )


def dist_cumsum(
    df: DataFrame,
    order_cols: list[Column | str],
    vals: dict[str, Column | str],
    parts: int | None = None,
) -> DataFrame:
    """Exact global running ``SUM(val) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` for EVERY ``out_col -> val`` entry in one
    pass over one shared range exchange (integer/long values — the
    repo's quantize-before-cumsum rule applies upstream)."""
    cols = {
        out: (F.col(v) if isinstance(v, str) else v) for out, v in vals.items()
    }
    t = _bucketed(df, order_cols, parts)
    w_in = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for out, v in cols.items():
        t = t.withColumn(f"__dr_in_{out}", F.sum(v).over(w_in))
    sizes = t.groupBy(_PID).agg(
        *[F.sum(v).alias(f"__dr_n_{out}") for out, v in cols.items()]
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        _PID,
        *[
            F.coalesce(F.sum(f"__dr_n_{out}").over(w_off), F.lit(0)).alias(
                f"__dr_off_{out}"
            )
            for out in cols
        ],
    )
    t = t.join(F.broadcast(offs), _PID)
    for out in cols:
        t = t.withColumn(
            out,
            (F.col(f"__dr_off_{out}") + F.col(f"__dr_in_{out}")).cast("bigint"),
        )
    return t.drop(
        _PID,
        *[f"__dr_in_{out}" for out in cols],
        *[f"__dr_off_{out}" for out in cols],
    )
