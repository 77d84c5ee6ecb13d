"""Shared physical-layout helpers for operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Hash-spread ``df`` across ``defaultParallelism`` partitions before
    CPU-heavy per-row work (hashing, decode, explode+digest).

    The countless ``repartition(col)`` form is an AQE-coalescible exchange:
    on a small input AQE folds it back to ONE partition and the downstream
    per-row work runs single-task (measured r14: the 64-hash minhash
    signature stage at sf0.1 runs 3.3s coalesced vs 0.67s spread). An
    explicit count (REPARTITION_BY_NUM) is never AQE-coalesced, and
    deriving it from the session's ``defaultParallelism`` keeps the layout
    scale-adaptive (total executor cores on a cluster) rather than a
    local[32] constant. Results are unaffected: partition count never
    changes a deterministic aggregate/join (DESIGN.md accumulation rules).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)
