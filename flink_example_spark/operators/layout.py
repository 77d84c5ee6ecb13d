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

from pyspark.sql import Column, DataFrame, Window, functions as F


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


def sort_advisor(
    df: DataFrame,
    id_expr: str,
    candidates: list[tuple[str, str]],
    rows_per_file: int = 1000,
) -> DataFrame:
    """Which column should this table be sorted by? For every candidate
    (an integer-valued SQL expression) the advisor measures the ZONE-MAP
    CLUSTERING RATIO under (a) the current ingest order (files cut every
    ``rows_per_file`` rows of ``id_expr`` order) and (b) a layout re-sorted
    by that candidate:

        ratio_ppm = (Σ_f (max_f − min_f) · 1e6) div (span · n_files)

    — the expected fraction of files a uniform point predicate fails to
    prune (1e6 = no pruning, ~1e6/n_files = perfect). The gap between the
    two columns is the scan cost a re-sort would save; on 100 TB this is
    the difference between touching every row-group and touching one.

    Output: ``(col, n_files, span, ratio_current_ppm, ratio_sorted_ppm)``
    — pure integers (div truncation identical cross-engine).

    Scale: ONE scan (candidates explode to a tall narrow relation), two
    window passes (rank by id, rank by value) and two file-grain
    aggregations; everything downstream of the scan is n_candidates ×
    n_rows narrow integer rows with map-side partials.
    """
    structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("col"), F.expr(expr).cast("bigint").alias("v")
            )
            for name, expr in candidates
        ]
    )
    tall = (
        df.select(F.expr(id_expr).cast("bigint").alias("id"), F.explode(structs).alias("c"))
        .select("id", F.col("c.col").alias("col"), F.col("c.v").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    w_id = Window.partitionBy("col").orderBy("id")
    w_v = Window.partitionBy("col").orderBy("v", "id")
    ranked = tall.select(
        "col",
        "v",
        ((F.row_number().over(w_id) - 1) / rows_per_file).cast("bigint").alias("f_cur"),
        ((F.row_number().over(w_v) - 1) / rows_per_file).cast("bigint").alias("f_srt"),
    ).localCheckpoint()  # two aggregation consumers below

    def zone_ratio(file_col: str, out: str) -> DataFrame:
        zones = ranked.groupBy("col", file_col).agg(
            (F.max("v") - F.min("v")).alias("w")
        )
        return zones.groupBy("col").agg(
            F.count(F.lit(1)).alias(f"{out}_files"),
            F.sum("w").alias(f"{out}_sum_w"),
        )

    cur = zone_ratio("f_cur", "cur")
    srt = zone_ratio("f_srt", "srt")
    span = tall.groupBy("col").agg((F.max("v") - F.min("v")).alias("span"))
    return (
        span.join(cur, "col")
        .join(srt, "col")
        .filter(F.col("span") > 0)
        .select(
            "col",
            F.col("cur_files").cast("long").alias("n_files"),
            F.col("span").cast("long").alias("span"),
            F.expr(
                "CAST((CAST(cur_sum_w AS DECIMAL(19,0)) * 1000000)"
                " div (CAST(span AS DECIMAL(19,0))"
                " * CAST(cur_files AS DECIMAL(19,0))) AS BIGINT)"
            ).alias("ratio_current_ppm"),
            F.expr(
                "CAST((CAST(srt_sum_w AS DECIMAL(19,0)) * 1000000)"
                " div (CAST(span AS DECIMAL(19,0))"
                " * CAST(srt_files AS DECIMAL(19,0))) AS BIGINT)"
            ).alias("ratio_sorted_ppm"),
        )
    )


def sort_advisor_oracle(
    table: str,
    id_expr: str,
    candidates: list[tuple[str, str]],
    rows_per_file: int = 1000,
) -> str:
    """DuckDB twin of :func:`sort_advisor`."""
    sel = " UNION ALL ".join(
        f"SELECT CAST({id_expr} AS BIGINT) AS id, '{name}' AS col,"
        f" CAST({expr} AS BIGINT) AS v FROM {table}"
        for name, expr in candidates
    )
    return f"""
        WITH tall AS MATERIALIZED (
          SELECT * FROM ({sel}) WHERE v IS NOT NULL
        ),
        ranked AS MATERIALIZED (
          SELECT col, v,
                 (ROW_NUMBER() OVER (PARTITION BY col ORDER BY id) - 1)
                   // {rows_per_file} AS f_cur,
                 (ROW_NUMBER() OVER (PARTITION BY col ORDER BY v, id) - 1)
                   // {rows_per_file} AS f_srt
          FROM tall
        ),
        cur AS (
          SELECT col, CAST(COUNT(*) AS BIGINT) AS cur_files,
                 CAST(SUM(w) AS BIGINT) AS cur_sum_w
          FROM (SELECT col, f_cur, MAX(v) - MIN(v) AS w FROM ranked
                GROUP BY 1, 2)
          GROUP BY col
        ),
        srt AS (
          SELECT col, CAST(COUNT(*) AS BIGINT) AS srt_files,
                 CAST(SUM(w) AS BIGINT) AS srt_sum_w
          FROM (SELECT col, f_srt, MAX(v) - MIN(v) AS w FROM ranked
                GROUP BY 1, 2)
          GROUP BY col
        ),
        span AS (
          SELECT col, CAST(MAX(v) - MIN(v) AS BIGINT) AS span
          FROM tall GROUP BY col
        )
        SELECT span.col, cur_files AS n_files, span,
               CAST((CAST(cur_sum_w AS HUGEINT) * 1000000)
                    // (CAST(span AS HUGEINT) * cur_files) AS BIGINT)
                 AS ratio_current_ppm,
               CAST((CAST(srt_sum_w AS HUGEINT) * 1000000)
                    // (CAST(span AS HUGEINT) * srt_files) AS BIGINT)
                 AS ratio_sorted_ppm
        FROM span JOIN cur USING (col) JOIN srt ON srt.col = span.col
        WHERE span > 0
    """


def compaction_plan(
    files: DataFrame,
    id_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner (the maintenance pass behind Iceberg
    ``rewrite_data_files`` binpack / Delta OPTIMIZE): group an input file
    inventory into rewrite tasks of ~``target_bytes`` each.

    Deterministic streaming bin-packing: files order by (bytes DESC,
    id) — largest first, the classic decreasing heuristic — and a file
    goes to bin ``floor(exclusive_cumsum / target_bytes)``, i.e. a bin
    closes once its accumulated bytes reach the target (the same
    contiguous-cut-at-capacity spec a sorted-listing greedy packer
    implements; a bin can exceed the target by at most its last file).
    Exact integers end to end — the same plan comes out of any engine.

    The prefix sum runs over the FILE inventory (metadata-sized, not
    data-sized — at 100 TB this relation is the table's manifest, maybe
    1e6 rows, one ordered window). Output per planned task: ``(bin,
    n_files, total_bytes, min_file_bytes, max_file_bytes)`` plus
    ``is_full`` = 1 when the bin reached the target (the trailing partial
    bin is the one a planner defers to the next run).
    """
    src = files.select(
        F.col(id_col).alias("fid"),
        F.col(bytes_col).cast("long").alias("b"),
    ).filter(F.col("b").isNotNull() & (F.col("b") > 0))
    binned = src.select(
        "fid",
        "b",
        F.expr(f"coalesce(sum(b) over (order by b desc, fid rows between"
               f" unbounded preceding and 1 preceding), 0)"
               f" div {target_bytes}").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("b").alias("total_bytes"),
            F.min("b").alias("min_file_bytes"),
            F.max("b").alias("max_file_bytes"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_files",
            "total_bytes",
            "min_file_bytes",
            "max_file_bytes",
            (F.col("total_bytes") >= F.lit(target_bytes))
            .cast("long")
            .alias("is_full"),
        )
    )


def compaction_plan_oracle(
    files_sql: str,
    id_col: str = "file_id",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> str:
    """DuckDB twin of :func:`compaction_plan`."""
    return f"""
        WITH src AS (
          SELECT {id_col} AS fid, CAST({bytes_col} AS BIGINT) AS b
          FROM ({files_sql})
          WHERE {bytes_col} IS NOT NULL AND {bytes_col} > 0
        ),
        binned AS (
          SELECT fid, b,
                 COALESCE(CAST(SUM(b) OVER (ORDER BY b DESC, fid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) // {target_bytes} AS bin
          FROM src
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(b) AS BIGINT) AS total_bytes,
               CAST(MIN(b) AS BIGINT) AS min_file_bytes,
               CAST(MAX(b) AS BIGINT) AS max_file_bytes,
               CAST(CASE WHEN SUM(b) >= {target_bytes} THEN 1 ELSE 0 END
                 AS BIGINT) AS is_full
        FROM binned GROUP BY 1
    """
