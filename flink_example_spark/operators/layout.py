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

from flink_example_spark.operators.util import local_df


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
    the DISTINCT-key relation via the DISTRIBUTED two-phase cumsum
    (``distrank`` — the key space scales with the data, so even the
    count relation never funnels through one task).

    Output per planned bucket: ``(bucket, lo_key, hi_key, n_rows,
    n_keys)``.
    """
    from flink_example_spark.operators.distrank import dist_cumsum

    kc = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = kc.agg(F.sum("c").alias("n"))
    cm = (
        dist_cumsum(kc, ["k"], {"ci": "c"})
        .crossJoin(F.broadcast(tot))
        .select("k", "c", (F.col("ci") - F.col("c")).alias("ce"), "n")
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


def skew_audit(
    df: DataFrame, key_col, label: str = "key"
) -> DataFrame:
    """Shuffle-skew audit of a join/aggregation key — the pre-flight
    check before any 100-TB shuffle: a key whose heaviest value owns a
    large share of the rows will hot-spot one reducer regardless of
    partition count (the exact situation the engine's salting/AQE-skew
    paths exist for; this op tells you WHEN to reach for them).

    Reports: distinct-key count, total rows, the max per-key count and
    its share in exact micro units, the p50/p90/p99 per-key counts
    (inclusive lower order statistics over the per-key count
    distribution — key-cardinality-sized, ranked with the distributed
    two-phase device), and the hot-key share of an ideal 32-task
    shuffle expressed as a skew factor ``max_count * 32 * 1e6 / total``
    (>1e6 means the hottest key alone overflows its fair share).

    Output one row: ``(key_label, n_keys, n_rows, max_count,
    max_share_micro, p50_count, p90_count, p99_count,
    skew_factor_micro)``.

    Scale: one hash aggregation to per-key counts (map-side combined) +
    one distributed ranking over the KEY-cardinality relation + one
    rollup. Never sorts or re-shuffles the data rows.
    """
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    counts = (
        df.select(k.alias("__k"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return skew_rollup(counts, label)


def skew_rollup(counts: DataFrame, label: str) -> DataFrame:
    """The read-time algebra of :func:`skew_audit` over a prepared
    per-key count relation ``(__k, __c)`` — shared by the batch op and
    the live streaming monitor (whose state is the count monoid)."""
    from flink_example_spark.operators.distrank import dist_row_number

    ranked = dist_row_number(counts, ["__c", "__k"], "__rn")
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_count"),
    )
    pct = (
        ranked.crossJoin(F.broadcast(s))
        .filter(
            # keep the three target order statistics (computed per row
            # against the broadcast n_keys)
            (F.col("__rn") == F.expr("(50 * n_keys + 99) div 100"))
            | (F.col("__rn") == F.expr("(90 * n_keys + 99) div 100"))
            | (F.col("__rn") == F.expr("(99 * n_keys + 99) div 100"))
        )
        .groupBy()
        .agg(
            F.max(
                F.when(
                    F.col("__rn") == F.expr("(50 * n_keys + 99) div 100"),
                    F.col("__c"),
                )
            ).alias("p50_count"),
            F.max(
                F.when(
                    F.col("__rn") == F.expr("(90 * n_keys + 99) div 100"),
                    F.col("__c"),
                )
            ).alias("p90_count"),
            F.max(
                F.when(
                    F.col("__rn") == F.expr("(99 * n_keys + 99) div 100"),
                    F.col("__c"),
                )
            ).alias("p99_count"),
        )
    )
    return (
        s.crossJoin(F.broadcast(pct))
        .select(
            F.lit(label).alias("key_label"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("max_count").cast("long").alias("max_count"),
            F.expr("(max_count * 1000000) div n_rows").alias(
                "max_share_micro"
            ),
            F.col("p50_count").cast("long").alias("p50_count"),
            F.col("p90_count").cast("long").alias("p90_count"),
            F.col("p99_count").cast("long").alias("p99_count"),
            F.expr("(max_count * 32 * 1000000) div n_rows").alias(
                "skew_factor_micro"
            ),
        )
    )


def skew_audit_oracle(units_sql: str, key_sql: str, label: str = "key") -> str:
    """DuckDB twin of :func:`skew_audit`."""
    return f"""
        WITH counts AS MATERIALIZED (
          SELECT {key_sql} AS k, CAST(COUNT(*) AS BIGINT) AS c
          FROM ({units_sql}) GROUP BY 1
        ),
        ranked AS (
          SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c, k) AS BIGINT) AS rn
          FROM counts
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(SUM(c) AS BIGINT) AS n_rows,
                 CAST(MAX(c) AS BIGINT) AS max_count
          FROM counts
        ),
        pct AS (
          SELECT
            MAX(CASE WHEN rn = (50 * n_keys + 99) // 100 THEN c END) AS p50_count,
            MAX(CASE WHEN rn = (90 * n_keys + 99) // 100 THEN c END) AS p90_count,
            MAX(CASE WHEN rn = (99 * n_keys + 99) // 100 THEN c END) AS p99_count
          FROM ranked, s
        )
        SELECT '{label}' AS key_label, n_keys, n_rows, max_count,
               (max_count * 1000000) // n_rows AS max_share_micro,
               CAST(p50_count AS BIGINT) AS p50_count,
               CAST(p90_count AS BIGINT) AS p90_count,
               CAST(p99_count AS BIGINT) AS p99_count,
               (max_count * 32 * 1000000) // n_rows AS skew_factor_micro
        FROM s, pct
    """


def join_cardinality(
    a: DataFrame, b: DataFrame, key_a: str, key_b: str, topn: int = 5
) -> DataFrame:
    """EXACT equi-join output-size prediction WITHOUT running the join:
    ``|A join B| = sum_k c_A(k) * c_B(k)`` over the per-key count
    relations — the planner audit that catches a fan-out join (a
    many-to-many key that would explode 100 TB into 10 PB) before it
    runs. Also reports the ``topn`` heaviest key products (the keys to
    salt) and the share of output owned by the single heaviest key.

    Output: one summary row ``(rank=0, key=NULL, pairs, share_micro)``
    with pairs = the full join cardinality, then ``topn`` rows
    ``(rank, key, pairs, share_micro)`` for the heaviest keys.

    Scale: two per-key count aggregations (map-side combined) + one
    equi-join of the two KEY-cardinality relations + a top-n
    (TakeOrderedAndProject). Data rows never join.
    """
    ca = (
        a.select(F.col(key_a).cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    cb = (
        b.select(F.col(key_b).cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    prod = ca.join(cb, "k").select(
        "k", (F.col("ca") * F.col("cb")).alias("pairs")
    )
    tot = prod.agg(F.sum("pairs").alias("total")).filter(
        F.col("total").isNotNull()
    )
    top = (
        prod.orderBy(F.desc("pairs"), "k")
        .limit(topn)
        .crossJoin(F.broadcast(tot))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pairs"), "k")
    top_rows = top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("k").alias("key"),
        F.col("pairs").cast("long").alias("pairs"),
        F.expr("(pairs * 1000000) div total").alias("share_micro"),
    )
    summary = tot.select(
        F.lit(0).cast("long").alias("rank"),
        F.lit(None).cast("string").alias("key"),
        F.col("total").cast("long").alias("pairs"),
        F.lit(1000000).cast("long").alias("share_micro"),
    )
    return summary.unionByName(top_rows)


def join_cardinality_oracle(
    a_sql: str, b_sql: str, key_a: str, key_b: str, topn: int = 5
) -> str:
    """DuckDB twin of :func:`join_cardinality`."""
    return f"""
        WITH ca AS (
          SELECT CAST({key_a} AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS ca
          FROM ({a_sql}) GROUP BY 1
        ),
        cb AS (
          SELECT CAST({key_b} AS VARCHAR) AS k, CAST(COUNT(*) AS BIGINT) AS cb
          FROM ({b_sql}) GROUP BY 1
        ),
        prod AS MATERIALIZED (
          SELECT ca.k, ca.ca * cb.cb AS pairs FROM ca JOIN cb USING (k)
        ),
        tot AS (SELECT CAST(SUM(pairs) AS BIGINT) AS total FROM prod
                WHERE pairs IS NOT NULL),
        top AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY pairs DESC, k) AS BIGINT)
                   AS rank,
                 k AS key, pairs, (pairs * 1000000) // total AS share_micro
          FROM prod, tot ORDER BY pairs DESC, k LIMIT {topn}
        )
        SELECT CAST(0 AS BIGINT) AS rank, NULL AS key, total AS pairs,
               CAST(1000000 AS BIGINT) AS share_micro
        FROM tot WHERE total IS NOT NULL
        UNION ALL
        SELECT rank, key, CAST(pairs AS BIGINT), share_micro FROM top
    """


def scan_pruning_eval(
    df: DataFrame,
    cols: dict[str, Column],
    preds: list[tuple[str, str, int, int]],
    bits: int = 10,
    bucket_bits: int = 6,
) -> DataFrame:
    """Measured file-pruning effectiveness of the Z-order layout: for
    each candidate predicate ``(query, dim, lo, hi)``, how many z-range
    buckets ("files") would parquet min/max stats prune, and what row
    fraction survives the scan — the quantified version of the module
    header's multi-column-pruning claim, per query, per dimension.

    A bucket is scanned iff its [min, max] box on the predicate's
    dimension OVERLAPS [lo, hi] (exactly the parquet row-group pruning
    rule). Output per predicate: ``(query, n_buckets, n_scanned,
    n_pruned, rows_scanned, rows_total, scan_frac_micro)``.

    Scale: one aggregation builds the bucket-stat relation
    (2^bucket_bits rows); the evaluation is a broadcast nested-loop of
    that tiny relation against the literal predicate table.
    """
    stats = zorder_bucket_stats(df, cols, bits, bucket_bits)
    return _pruning_from_stats(
        df.sparkSession, stats, list(cols.keys()), preds
    )


def _pruning_from_stats(spark, stats, names, preds) -> DataFrame:
    """The min/max-overlap pruning evaluation over any bucket-stat
    relation ``(bucket, n, <name>_min, <name>_max ...)`` — shared by the
    Morton and Hilbert layouts (identical arithmetic; the zorder row's
    hash is unchanged by this factor)."""
    pred_df = local_df(spark, [(q, d, int(lo), int(hi)) for q, d, lo, hi in preds], "query string, dim string, lo long, hi long")
    dim_min = F.when(F.lit(False), F.lit(None))
    for k in names:
        dim_min = F.when(F.col("dim") == k, F.col(f"{k}_min")).otherwise(dim_min)
    dim_max = F.when(F.lit(False), F.lit(None))
    for k in names:
        dim_max = F.when(F.col("dim") == k, F.col(f"{k}_max")).otherwise(dim_max)
    j = stats.crossJoin(F.broadcast(pred_df)).select(
        "query",
        "n",
        ((dim_max >= F.col("lo")) & (dim_min <= F.col("hi")))
        .cast("long")
        .alias("scanned"),
    )
    return (
        j.groupBy("query")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("scanned").cast("long").alias("n_scanned"),
            (F.count(F.lit(1)) - F.sum("scanned")).cast("long").alias("n_pruned"),
            F.sum(F.col("n") * F.col("scanned")).cast("long").alias("rows_scanned"),
            F.sum("n").cast("long").alias("rows_total"),
        )
        .withColumn(
            "scan_frac_micro",
            F.expr("(rows_scanned * 1000000) div rows_total"),
        )
    )


def scan_pruning_eval_oracle(
    source_sql: str,
    col_exprs: dict[str, str],
    preds: list[tuple[str, str, int, int]],
    bits: int = 10,
    bucket_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`scan_pruning_eval`."""
    stats = zorder_bucket_stats_sql(source_sql, col_exprs, bits, bucket_bits)
    pred_rows = ", ".join(
        f"('{q}', '{d}', {int(lo)}, {int(hi)})" for q, d, lo, hi in preds
    )
    names = list(col_exprs.keys())
    dmin = "CASE " + " ".join(
        f"WHEN dim = '{k}' THEN {k}_min" for k in names
    ) + " END"
    dmax = "CASE " + " ".join(
        f"WHEN dim = '{k}' THEN {k}_max" for k in names
    ) + " END"
    return f"""
        WITH stats AS MATERIALIZED ({stats}),
        preds AS (
          SELECT * FROM (VALUES {pred_rows}) p(query, dim, lo, hi)
        ),
        j AS (
          SELECT query, n,
                 CAST(CASE WHEN ({dmax}) >= lo AND ({dmin}) <= hi
                      THEN 1 ELSE 0 END AS BIGINT) AS scanned
          FROM stats CROSS JOIN preds
        )
        SELECT query, CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(scanned) AS BIGINT) AS n_scanned,
               CAST(COUNT(*) - SUM(scanned) AS BIGINT) AS n_pruned,
               CAST(SUM(n * scanned) AS BIGINT) AS rows_scanned,
               CAST(SUM(n) AS BIGINT) AS rows_total,
               (CAST(SUM(n * scanned) AS BIGINT) * 1000000)
                 // CAST(SUM(n) AS BIGINT) AS scan_frac_micro
        FROM j GROUP BY query
    """


def _hilbert_tables():
    """Derive the 2-D Hilbert xy->d state machine by composing the
    classic loop's rotations (public algorithm; e.g. the Wikipedia
    "Hilbert curve" xy2d form). A state is the transform the remaining
    lower bits still need — closed over (swap?, invert_x?, invert_y?)
    triples — so each level reads ONE digit and one next-state from a
    16-entry table keyed by (state, raw_rx, raw_ry). Returns
    ``(digit[state*4+q], next_state[state*4+q], n_states)`` with
    ``q = rx*2 + ry``."""

    def apply(t, a, b):
        swap, ix, iy = t
        a1, b1 = a ^ ix, b ^ iy
        return (b1, a1) if swap else (a1, b1)

    def compose(rot, t):
        outs = {
            (a, b): apply(rot, *apply(t, a, b))
            for a in (0, 1)
            for b in (0, 1)
        }
        for cand in (
            (s, i, j) for s in (0, 1) for i in (0, 1) for j in (0, 1)
        ):
            if all(
                apply(cand, a, b) == outs[(a, b)]
                for a in (0, 1)
                for b in (0, 1)
            ):
                return cand
        raise AssertionError("transform group not closed")

    ident = (0, 0, 0)
    states = [ident]
    idx = {ident: 0}
    digit: dict = {}
    nxt: dict = {}
    pending = [ident]
    while pending:
        t = pending.pop()
        for rx_raw in (0, 1):
            for ry_raw in (0, 1):
                rx, ry = apply(t, rx_raw, ry_raw)
                d = (3 * rx) ^ ry
                if ry == 0:
                    rot = (1, 1, 1) if rx == 1 else (1, 0, 0)
                else:
                    rot = ident
                t2 = compose(rot, t)
                if t2 not in idx:
                    idx[t2] = len(states)
                    states.append(t2)
                    pending.append(t2)
                key = idx[t] * 4 + rx_raw * 2 + ry_raw
                digit[key] = d
                nxt[key] = idx[t2]
    return digit, nxt, len(states)


_H_DIGIT, _H_NEXT, _H_STATES = _hilbert_tables()


def hilbert_index_df(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    bits: int = 8,
    out: str = "__h",
) -> DataFrame:
    """Hilbert-curve index over two non-negative integer expressions —
    the locality UPGRADE over :func:`zorder_index`: consecutive Hilbert
    cells are always grid-ADJACENT (the curve never jumps), so per-file
    bounding boxes are tighter than Morton's at the same bit budget
    (Morton jumps across the grid at every power-of-two boundary).
    The same device Delta/Iceberg expose as OPTIMIZE ... HILBERT.

    Pure integer state machine, one level per bit from the top: each
    level reads two raw bits, one 16-entry digit CASE and one 16-entry
    next-state CASE (tables derived in ``_hilbert_tables``) — expressed
    as CHAINED NAMED PROJECTIONS so the expression tree stays linear in
    ``bits`` (each level references the previous state column, which
    Catalyst keeps as an attribute — multi-referenced non-cheap
    expressions are not inlined). Values must fit ``bits`` bits; output
    has ``2 * bits`` bits.
    """
    if bits < 1 or bits > 16:
        raise ValueError("hilbert_index_df supports 1..16 bits")

    def case(tbl, key_col):
        return (
            "CASE "
            + " ".join(
                f"WHEN {key_col} = {k} THEN {tbl[k]}"
                for k in range(4 * _H_STATES)
                if k in tbl
            )
            + " ELSE 0 END"
        )

    cur = (
        df.withColumn("__hx", F.expr(x_expr).cast("long"))
        .withColumn("__hy", F.expr(y_expr).cast("long"))
        .withColumn("__hs", F.lit(0).cast("long"))
        .withColumn(out, F.lit(0).cast("long"))
    )
    for i in range(bits):
        sh = bits - 1 - i
        cur = cur.withColumn(
            "__hq",
            F.expr(
                f"__hs * 4 + ((__hx >> {sh}) & 1) * 2"
                f" + ((__hy >> {sh}) & 1)"
            ),
        )
        cur = cur.withColumn(
            out,
            F.expr(
                f"{out} + (CAST({case(_H_DIGIT, '__hq')} AS BIGINT)"
                f" << {2 * sh})"
            ),
        ).withColumn("__hs", F.expr(case(_H_NEXT, "__hq")).cast("long"))
    return cur.drop("__hx", "__hy", "__hs", "__hq")


def hilbert_sql(
    source_sql: str, x_expr: str, y_expr: str, bits: int = 8
) -> str:
    """DuckDB twin of :func:`hilbert_index_df` — the identical state
    machine unrolled as a MATERIALIZED CTE chain; yields the source
    columns plus ``__h``."""

    def case(tbl, key_col):
        return (
            "CASE "
            + " ".join(
                f"WHEN {key_col} = {k} THEN {tbl[k]}"
                for k in range(4 * _H_STATES)
                if k in tbl
            )
            + " ELSE 0 END"
        )

    parts = [
        f"""h0 AS MATERIALIZED (
          SELECT *, CAST({x_expr} AS BIGINT) AS __hx,
                 CAST({y_expr} AS BIGINT) AS __hy,
                 CAST(0 AS BIGINT) AS __hs, CAST(0 AS BIGINT) AS __h
          FROM ({source_sql}))"""
    ]
    for i in range(bits):
        sh = bits - 1 - i
        q = (
            f"(__hs * 4 + ((__hx >> {sh}) & 1) * 2"
            f" + ((__hy >> {sh}) & 1))"
        )
        parts.append(
            f"""hq{i} AS MATERIALIZED (
          SELECT *, {q} AS __hq{i} FROM h{i})"""
        )
        parts.append(
            f"""h{i + 1} AS MATERIALIZED (
          SELECT * EXCLUDE (__h, __hs),
                 __h + (CAST({case(_H_DIGIT, f'__hq{i}')} AS BIGINT)
                        << {2 * sh}) AS __h,
                 CAST({case(_H_NEXT, f'__hq{i}')} AS BIGINT) AS __hs
          FROM hq{i})"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * EXCLUDE (__hx, __hy, __hs"
        + "".join(f", __hq{i}" for i in range(bits))
        + f") FROM h{bits}"
    )


def hilbert_bucket_stats(
    df: DataFrame,
    cols: dict[str, str],
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Per-Hilbert-prefix bounding boxes — the same measurable pruning
    claim as :func:`zorder_bucket_stats`, on the jump-free curve.
    ``cols`` maps output names to the two integer SQL expressions.
    Output: ``(bucket, n, <name>_min, <name>_max ...)``."""
    (nx, xe), (ny, ye) = list(cols.items())
    h = hilbert_index_df(df, xe, ye, bits=bits)
    return (
        h.select(
            F.expr(f"__h >> {2 * bits - bucket_bits}").alias("bucket"),
            F.expr(xe).cast("long").alias(f"__{nx}"),
            F.expr(ye).cast("long").alias(f"__{ny}"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(f"__{nx}").alias(f"{nx}_min"),
            F.max(f"__{nx}").alias(f"{nx}_max"),
            F.min(f"__{ny}").alias(f"{ny}_min"),
            F.max(f"__{ny}").alias(f"{ny}_max"),
        )
    )


def hilbert_bucket_stats_sql(
    source_sql: str,
    cols: dict[str, str],
    bits: int = 8,
    bucket_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`hilbert_bucket_stats`."""
    (nx, xe), (ny, ye) = list(cols.items())
    inner = hilbert_sql(source_sql, xe, ye, bits=bits)
    return f"""
        SELECT (__h >> {2 * bits - bucket_bits}) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(CAST({xe} AS BIGINT)) AS BIGINT) AS {nx}_min,
               CAST(MAX(CAST({xe} AS BIGINT)) AS BIGINT) AS {nx}_max,
               CAST(MIN(CAST({ye} AS BIGINT)) AS BIGINT) AS {ny}_min,
               CAST(MAX(CAST({ye} AS BIGINT)) AS BIGINT) AS {ny}_max
        FROM ({inner})
        GROUP BY 1
    """


def scan_pruning_hilbert(
    df: DataFrame,
    cols: dict[str, str],
    preds: list[tuple[str, str, int, int]],
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """:func:`scan_pruning_eval` over the HILBERT layout — the measured
    payoff comparison: same predicates, same bucket count, the jump-free
    curve's tighter per-bucket boxes prune at least as many buckets.
    ``cols`` maps the two names to integer SQL expressions (the Hilbert
    builder's contract). Output schema identical to the Morton form."""
    stats = hilbert_bucket_stats(df, cols, bits, bucket_bits)
    return _pruning_from_stats(
        df.sparkSession, stats, list(cols.keys()), preds
    )


def scan_pruning_hilbert_oracle(
    source_sql: str,
    col_exprs: dict[str, str],
    preds: list[tuple[str, str, int, int]],
    bits: int = 8,
    bucket_bits: int = 6,
) -> str:
    """DuckDB twin of :func:`scan_pruning_hilbert`."""
    stats = hilbert_bucket_stats_sql(
        source_sql, col_exprs, bits, bucket_bits
    )
    pred_rows = ", ".join(
        f"('{q}', '{d}', {int(lo)}, {int(hi)})" for q, d, lo, hi in preds
    )
    names = list(col_exprs.keys())
    dmin = "CASE " + " ".join(
        f"WHEN dim = '{k}' THEN {k}_min" for k in names
    ) + " END"
    dmax = "CASE " + " ".join(
        f"WHEN dim = '{k}' THEN {k}_max" for k in names
    ) + " END"
    return f"""
        WITH stats AS MATERIALIZED ({stats}),
        preds AS (
          SELECT * FROM (VALUES {pred_rows}) p(query, dim, lo, hi)
        ),
        j AS (
          SELECT query, n,
                 CAST(CASE WHEN ({dmax}) >= lo AND ({dmin}) <= hi
                      THEN 1 ELSE 0 END AS BIGINT) AS scanned
          FROM stats CROSS JOIN preds
        )
        SELECT query, CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(scanned) AS BIGINT) AS n_scanned,
               CAST(COUNT(*) - SUM(scanned) AS BIGINT) AS n_pruned,
               CAST(SUM(n * scanned) AS BIGINT) AS rows_scanned,
               CAST(SUM(n) AS BIGINT) AS rows_total,
               (CAST(SUM(n * scanned) AS BIGINT) * 1000000)
                 // CAST(SUM(n) AS BIGINT) AS scan_frac_micro
        FROM j GROUP BY query
    """


def hilbert_layout(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    n_files: int,
    bits: int = 8,
    h_col: str = "__h",
) -> DataFrame:
    """Cluster ``df`` for writing on the Hilbert index — the
    :func:`zorder_layout` sibling: range-partition on ``__h`` so each
    of the ``n_files`` output partitions covers one contiguous curve
    segment (= one tight bounding box per dimension in the parquet
    min/max stats; tighter than Morton's on unaligned segments — see
    the locality test). Same caveat as zorder_layout: range
    partitioning samples split points, so file CONTENTS are
    deterministic only per partition count; the oracle-checked relation
    is :func:`hilbert_bucket_stats`."""
    return hilbert_index_df(df, x_expr, y_expr, bits=bits, out=h_col)\
        .repartitionByRange(n_files, F.col(h_col))
