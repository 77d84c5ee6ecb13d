"""Data-layout operators: space-filling-curve clustering for scan pruning.

At the 100 TB posture the dominant cost is the scan, and the dominant scan
saver is file/row-group pruning on parquet min/max statistics. Pruning on
ONE column falls out of a sort; pruning on TWO+ columns needs a layout
where each file covers a small bounding box in every dimension — the
Z-order (Morton) curve, the same device Delta Lake's OPTIMIZE ZORDER BY
and ClickHouse/Iceberg orderings use.

``zorder_index`` computes the Morton interleave as a PURE-INTEGER codegen
expression (no UDF, no floating point — bit-identical in any engine);
``zorder_layout`` range-partitions on it so each output file covers one
contiguous z-range; ``zorder_bucket_stats`` reports per-z-prefix bounding
boxes — the measurable claim that the layout localizes every dimension at
once (each bucket's [min, max] per column is narrow, so a predicate on
EITHER column prunes most buckets).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def zorder_index(cols: list[Column], bits: int = 10) -> Column:
    """Morton (Z-order) interleave of non-negative integer columns, LSB
    first: output bit ``i * len(cols) + c`` is input bit ``i`` of column
    ``c``. Values must fit in ``bits`` bits (callers scale/mod first);
    total output bits = bits * len(cols) (keep <= 62).

    Pure shift/mask arithmetic — whole-stage-codegen on the JVM side and
    expressible verbatim in any SQL engine (see ``zorder_sql``).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_index needs at least 2 columns")
    if bits * n > 62:
        raise ValueError("zorder_index output exceeds 62 bits")
    terms = []
    for c_idx, col in enumerate(cols):
        x = col.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + c_idx
                )
            )
    return reduce(lambda a, b: a + b, terms)


def zorder_sql(col_exprs: list[str], bits: int = 10) -> str:
    """The identical Morton interleave as a SQL expression (DuckDB twin)."""
    n = len(col_exprs)
    terms = []
    for c_idx, e in enumerate(col_exprs):
        for i in range(bits):
            terms.append(f"(((CAST({e} AS BIGINT) >> {i}) & 1) << {i * n + c_idx})")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    n_files: int,
    bits: int = 10,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the Morton index so
    each of the ``n_files`` output partitions covers one contiguous
    z-range (= one small bounding box per dimension in the parquet
    min/max stats). Follow with ``.write.parquet(...)``; a reader's
    predicate on any indexed column then prunes most files.

    (Range partitioning samples split points — the FILE CONTENTS are
    deterministic per partition count only up to sampling; the layout is
    a write-path optimization, not part of a query's value contract,
    which is why the oracle-checked relation is ``zorder_bucket_stats``,
    a pure function of the data.)
    """
    return df.withColumn(z_col, zorder_index(cols, bits)).repartitionByRange(
        n_files, F.col(z_col)
    )


def zorder_bucket_stats(
    df: DataFrame,
    cols: dict[str, Column],
    bits: int = 10,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-z-prefix bounding boxes: bucket rows by the TOP ``bucket_bits``
    of their Morton index (deterministic z-range buckets — the analytic
    stand-in for 'one bucket = one file') and report each bucket's row
    count and per-dimension [min, max]. Narrow boxes on every dimension
    == the multi-column pruning claim, measurable and oracle-checkable.

    Output: (bucket, n, <name>_min, <name>_max ...). One hash aggregate.
    """
    names = list(cols.keys())
    exprs = [cols[k] for k in names]
    total_bits = bits * len(exprs)
    z = zorder_index(exprs, bits)
    return (
        df.select(
            F.shiftright(z, total_bits - bucket_bits).alias("bucket"),
            *[cols[k].alias(f"__{k}") for k in names],
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[
                agg
                for k in names
                for agg in (
                    F.min(F.col(f"__{k}").cast("long")).alias(f"{k}_min"),
                    F.max(F.col(f"__{k}").cast("long")).alias(f"{k}_max"),
                )
            ],
        )
    )


def zorder_bucket_stats_sql(
    source_sql: str,
    col_exprs: dict[str, str],
    bits: int = 10,
    bucket_bits: int = 8,
) -> str:
    """DuckDB twin of ``zorder_bucket_stats``."""
    names = list(col_exprs.keys())
    z = zorder_sql([col_exprs[k] for k in names], bits)
    total_bits = bits * len(names)
    mins = ",\n               ".join(
        f"CAST(MIN(CAST({col_exprs[k]} AS BIGINT)) AS BIGINT) AS {k}_min,\n"
        f"               CAST(MAX(CAST({col_exprs[k]} AS BIGINT)) AS BIGINT) AS {k}_max"
        for k in names
    )
    return f"""
        SELECT (({z}) >> {total_bits - bucket_bits}) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               {mins}
        FROM ({source_sql})
        GROUP BY 1
    """


def range_partition_plan(
    df: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Balanced range-partition planner: split points over ``key_col`` so
    each contiguous key range holds ~``1/n_buckets`` of the rows — what a
    100 TB writer feeds into ``repartitionByRange`` / an Iceberg sort
    order, and what a skew audit reads (a hot key that forces a fat
    bucket shows up as ``n_rows`` >> N/n, pointing at salting).

    Exact rank-based spec (no sampling, no floats): per-key counts, an
    exclusive prefix sum in key order, and ``bucket = (cum_excl *
    n_buckets) div N`` — every row of one key lands in one bucket, bucket
    boundaries are deterministic in any engine. The prefix sum runs over
    the DISTINCT-key relation (key-cardinality-sized, one ordered window);
    a beyond-vocabulary key space would apply the repo's two-phase
    time-bucket merge device (versioned.salted_version_history) to the
    cumsum instead.

    Output per planned bucket: ``(bucket, lo_key, hi_key, n_rows,
    n_keys)``.
    """
    from pyspark.sql import Window

    kc = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w_excl = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("k").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cm = kc.select(
        "k",
        "c",
        F.coalesce(F.sum("c").over(w_excl), F.lit(0)).alias("ce"),
        F.sum("c").over(w_all).alias("n"),
    )
    return (
        cm.select(
            F.expr(f"(ce * {n_buckets}) div n").alias("bucket"), "k", "c"
        )
        .groupBy("bucket")
        .agg(
            F.min("k").alias("lo_key"),
            F.max("k").alias("hi_key"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "lo_key",
            "hi_key",
            "n_rows",
            "n_keys",
        )
    )


def range_partition_plan_oracle(
    table: str, key_col: str, n_buckets: int = 16
) -> str:
    """DuckDB twin of :func:`range_partition_plan`."""
    return f"""
        WITH kc AS (
          SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS c
          FROM {table} GROUP BY 1
        ), cm AS (
          SELECT k, c,
                 COALESCE(CAST(SUM(c) OVER (ORDER BY k ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS ce,
                 CAST(SUM(c) OVER () AS BIGINT) AS n
          FROM kc
        )
        SELECT CAST((ce * {n_buckets}) // n AS BIGINT) AS bucket,
               MIN(k) AS lo_key, MAX(k) AS hi_key,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM cm GROUP BY 1
    """
