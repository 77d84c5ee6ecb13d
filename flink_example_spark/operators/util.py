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


def spread_sized(
    df: DataFrame, *cols: Column | str, bytes_per_task: int = 64 << 10
) -> DataFrame:
    """:func:`spread` with a size-aware partition count for Python-runner
    stages whose per-row work is LIGHT (codec pack/parse): a tiny input
    split 32 ways pays ~32 Python worker startups for sub-second work
    (r14 driver bench: multimodal_codec 0.53 scaling ratio — the 8-core
    run beat 32). The count derives from the optimizer's size estimate,
    ``ceil(bytes / bytes_per_task)`` capped at ``defaultParallelism`` —
    full width at scale, few tasks at toy scale; an unavailable estimate
    falls back to full width. Partition count never changes results
    (DESIGN.md accumulation rules)."""
    sc = df.sparkSession.sparkContext
    cap = sc.defaultParallelism
    try:
        est = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        n = max(1, min(cap, (est + bytes_per_task - 1) // bytes_per_task))
    except Exception:
        n = cap
    return df.repartition(n, *cols) if cols else df.repartition(n)


def local_df(spark, rows, schema):
    """Driver-held model-sized rows as an Arrow LocalTableScan instead of a
    32-task pickled-RDD scan.

    ``createDataFrame(list, schema)`` parallelizes even a 5-row literal
    across ``defaultParallelism`` Python-runner tasks, and EVERY downstream
    consumer re-runs that scan (measured r14: ~0.7s per noop-save warm vs
    ~0.17s via Arrow; a 53s-CPU stage on ml_poisson_fit's 5-row output).
    Routing through a dtype=object pandas frame keeps values exact (no
    float roundtrip for >2^53 ints, None survives — probe-verified) and
    plans as LocalTableScan. Falls back to the plain form for empty input.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd
    from pyspark.sql.types import StructType

    st = schema if isinstance(schema, StructType) else StructType.fromDDL(schema)
    pdf = pd.DataFrame(rows, columns=st.fieldNames(), dtype=object)
    return spark.createDataFrame(pdf, st)


def fresh_local(df):
    """Memory-sink fresh-attribute mint WITHOUT the pickled-RDD scan.

    ``createDataFrame(df.rdd, df.schema)`` (the DESIGN.md conflicting-
    attributes device) re-evaluates the state-sized sink through 32
    Python-runner tasks — once per downstream consumer. Collecting the
    (state-sized, bounded by construction) relation once and re-emitting
    it through :func:`local_df` mints the same fresh expr-ids as an Arrow
    LocalTableScan. collect() yields Python scalars (int/str/Decimal/
    datetime/bytes), and the object-dtype pandas path round-trips them
    losslessly; anything Arrow can't convert falls back to the RDD mint.
    """
    spark = df.sparkSession
    # collect ONCE, outside the guard: a genuine collect failure must
    # propagate, and the Arrow-conversion fallback must not re-execute
    # the sink a second time (r15 — was a bare except around both)
    rows = [tuple(r) for r in df.collect()]
    try:
        return local_df(spark, rows, df.schema)
    except Exception:
        # only the Arrow/pandas conversion falls back (exotic cell types);
        # the pickled local scan reuses the already-collected rows
        return spark.createDataFrame(rows, df.schema)


def compact_cut(df: DataFrame, rows_per_part: int = 250_000) -> DataFrame:
    """localCheckpoint + scale-adaptive coalesce for fit-loop inputs.

    An n_steps descent loop re-aggregates this relation every step; a
    32-block layout of a few-MB checkpoint pays ~33 near-empty tasks per
    step. Coalesce the materialized blocks to ceil(n / rows_per_part)
    read tasks (no shuffle; floor 1, cap at the current count) — the loop
    aggregates order-independent integers, so results are unchanged, and
    big inputs keep their parallelism."""
    cut = df.localCheckpoint()
    n = cut.count()
    cur = cut.rdd.getNumPartitions()
    parts = max(1, min(cur, (n + rows_per_part - 1) // rows_per_part))
    return cut.coalesce(parts) if parts < cur else cut
