"""Cardinality sketches for 100 TB-scale profiling.

``kmv_distinct`` is a K-Minimum-Values distinct-count sketch (Bar-Yossef et
al. 2002; the classic KMV/bottom-k estimator): hash every value to a
uniform 32-bit point, keep the k smallest DISTINCT hashes per group, and
estimate |D| = (k-1) / x_(k) where x_(k) is the k-th smallest hash
normalized to (0, 1]. Groups with fewer than k distinct hashes report the
exact count.

Why KMV and not Spark's HLL++ (``approx_count_distinct``): the hash here is
the engine-portable md5 bucket (DESIGN.md: ``conv(substr(md5(v),1,8),16,10)``
↔ DuckDB ``CAST(concat('0x', ...) AS BIGINT)``), so the sketch — not just
its error bound — is DETERMINISTIC and bit-identical in any engine, which
makes it oracle-checkable and stable across replays/retries. HLL sketches
differ per implementation and can't be hash-compared across engines.

Scale shape: the distinct-hash dedup is the same exchange an exact
COUNT(DISTINCT) needs, but the per-group state after it is bounded by k
(the window top-k spills; a custom partial-top-k merge aggregate would
avoid materializing the distinct set — noted for a cluster port). Sketches
of disjoint shards MERGE by unioning hash sets and re-taking the k
smallest — the property that makes bottom-k the right profiling tool for
incremental 100 TB corpus stats.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_example_spark.operators.util import local_df, spread

HASH_SPACE = 4294967296.0  # 2^32: first 8 md5 hex digits as uniform points


def portable_hash32(col: F.Column) -> F.Column:
    """First 8 md5-hex digits as a BIGINT in [0, 2^32) — identical in Spark
    and DuckDB (the repo's standard engine-portable bucket)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def kmv_distinct(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    k: int = 64,
    sub_buckets: int = 16,
    method: str = "window",
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group cols + ``n_kept`` (min(k, distinct hashes)), ``kth_hash``
    (the k-th smallest, null when exact), ``est_distinct`` (double; exact
    count when the group has < k distinct values — the estimator is only
    defined past k).

    Two-phase bottom-k (domain_cap's skew trick): phase 1 takes the k
    smallest within each of ``sub_buckets`` hash sub-buckets — a hot
    group's distinct hashes sort across 16 tasks, and at most
    sub_buckets·k rows per group reach phase 2's bare-group window. The
    global bottom-k is always contained in the union of sub-bucket
    bottom-ks, so the result is identical to the single-window form.

    ``method='merge'`` is the true cluster port this module's header notes:
    a per-input-partition bounded bottom-k (Arrow ``mapInPandas``, O(k)
    heap per group per partition — the distinct set is NEVER materialized)
    whose partial sketches merge in one per-group reduce. Only
    ``partitions × k`` hashes per group ever shuffle. Identical output to
    the window form (bottom-k is a commutative merge; the estimator
    arithmetic runs the same IEEE double ops).

    ``method='jvm'`` (round 12) is the strongest form — the long-missing
    TRUE JVM bounded-state merge aggregate (``fes.KmvBottomK``, a Java
    UserDefinedAggregateFunction compiled on demand and registered into
    the running session): ONE hash aggregation whose O(k) sorted-array
    state partial-aggregates on the MAP side (the plan shows
    ``partial_kmv_bottomk{k}`` below the exchange), with no Python
    anywhere. Identical output to both other forms (pinned by test).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if method == "merge":
        return _kmv_merge(df, groups, value_col, k)
    if method == "jvm":
        return _kmv_jvm(df, groups, value_col, k)
    if method != "window":
        raise ValueError(
            f"method must be 'window', 'merge' or 'jvm', got {method!r}"
        )
    # NULL values hash to NULL, which Spark's window ORDER BY sorts first
    # while DuckDB sorts NULLs last — drop them before the bottom-k so both
    # engines sketch the same (non-null) domain.
    hashes = (
        df.select(*groups, portable_hash32(F.col(value_col)).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .groupBy(*groups, "__h")
        .agg(F.lit(1).alias("__one"))
    )
    w1 = Window.partitionBy(*groups, F.pmod(F.col("__h"), F.lit(sub_buckets))).orderBy(
        F.col("__h")
    )
    survivors = (
        hashes.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w = Window.partitionBy(*groups).orderBy(F.col("__h"))
    kept = survivors.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return (
        kept.groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__h").alias("__max_h"),
        )
        .select(
            *groups,
            "n_kept",
            F.when(F.col("n_kept") >= k, F.col("__max_h")).alias("kth_hash"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__max_h").cast("double")
            )
            .alias("est_distinct"),
        )
    )


def _kmv_merge(df: DataFrame, groups: list[str], value_col: str, k: int) -> DataFrame:
    """Bounded-state KMV: partial bottom-k per input partition (mapInPandas,
    max-heap of size k per group — streaming over Arrow batches, never the
    distinct set), then one per-group merge of <= partitions partial
    sketches. The shuffle carries at most k hashes per (group, partition)."""
    import heapq

    import pandas as pd

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    src = df.select(
        *groups, portable_hash32(F.col(value_col)).alias("__h")
    ).filter(F.col("__h").isNotNull())
    part_schema = StructType(
        [*src.select(*groups).schema.fields, StructField("__hs", ArrayType(LongType()))]
    )
    out_schema = StructType(
        [
            *src.select(*groups).schema.fields,
            StructField("n_kept", LongType()),
            StructField("kth_hash", LongType(), True),
        ]
    )

    def partial(batches):
        heaps: dict[tuple, tuple[list, set]] = {}
        for pdf in batches:
            grouped = pdf.groupby(groups, dropna=False, sort=False)["__h"]
            for key, hs in grouped.unique().items():
                key = key if isinstance(key, tuple) else (key,)
                heap, seen = heaps.setdefault(key, ([], set()))
                for h in hs:
                    h = int(h)
                    if h in seen:
                        continue
                    if len(heap) < k:
                        heapq.heappush(heap, -h)
                        seen.add(h)
                    elif h < -heap[0]:
                        seen.discard(-heapq.heappushpop(heap, -h))
                        seen.add(h)
        yield pd.DataFrame(
            [(*key, sorted(-x for x in heap)) for key, (heap, _) in heaps.items()],
            columns=[f.name for f in part_schema.fields],
        )

    def merge(key, pdf):
        merged: set[int] = set()
        for hs in pdf["__hs"]:
            merged.update(int(h) for h in hs)
        kept = sorted(merged)[:k]
        n = len(kept)
        return pd.DataFrame(
            [(*key, n, kept[-1] if n >= k else None)],
            columns=[f.name for f in out_schema.fields],
        )

    partials = src.mapInPandas(partial, schema=part_schema)
    sketches = partials.groupBy(*groups).applyInPandas(merge, schema=out_schema)
    # estimator arithmetic stays a Spark expression — the same IEEE double
    # mult-then-div as the window path, so outputs are bit-identical
    return sketches.select(
        *groups,
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_hash").cast("double")
        )
        .alias("est_distinct"),
    )


def _kmv_jvm(df: DataFrame, groups: list[str], value_col: str, k: int) -> DataFrame:
    """True JVM bounded-state KMV: ONE hash aggregation over the Java
    ``kmv_bottomk{k}`` UDAF (O(k) sorted-array buffer, map-side partial
    merge — only ``partitions × k`` hashes per group shuffle), then the
    shared estimator arithmetic on the returned array. Bottom-k distinct
    is schedule-invariant, so the array — and therefore every output —
    is bit-identical to the window and merge forms."""
    from flink_example_spark.jvm import register_kmv_bottomk

    fn = register_kmv_bottomk(df.sparkSession, k)
    src = df.select(
        *groups, portable_hash32(F.col(value_col)).alias("__h")
    ).filter(F.col("__h").isNotNull())
    g = src.groupBy(*groups).agg(F.expr(f"{fn}(__h)").alias("__ks"))
    return g.select(
        *groups,
        F.size("__ks").cast("long").alias("n_kept"),
        F.when(F.size("__ks") >= k, F.element_at("__ks", k)).alias("kth_hash"),
        F.when(F.size("__ks") < k, F.size("__ks").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(HASH_SPACE)
            / F.element_at("__ks", k).cast("double")
        )
        .alias("est_distinct"),
    )


def _hll_params(p: int) -> tuple[int, int, int, float]:
    """(m, rem_bits, q, numerator) for a 2^p-register portable HLL.

    ``numerator`` is alpha_m * m^2 * 2^q as ONE Python float — both engines
    parse the same shortest-round-trip decimal literal to the same double,
    so the estimate is a single exactly-rounded IEEE division everywhere.
    """
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    m = 1 << p
    rem_bits = 32 - p
    q = rem_bits + 1  # max rho: remainder == 0 counts all rem_bits zeros + 1
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, rem_bits, q, alpha * (m * m) * float(1 << q)


def hll_registers(
    df: DataFrame, group_cols: str | Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group HyperLogLog register relation (Flajolet et al. 2007) built
    on the engine-portable md5 hash — the fixed-width O(m)-state complement
    to ``kmv_distinct``'s O(k) bottom-k (see module header for why neither
    uses Spark's builtin HLL++: portability makes the sketch itself
    oracle-checkable, not just its error bound).

    The 32-bit hash splits into a ``p``-bit bucket (high bits) and a
    ``(32-p)``-bit remainder; ``rho`` = leading zeros of the remainder + 1,
    computed libm-free as ``rem_bits - (length(bin(v)) - 1)`` (the repo's
    floor(log2) idiom), with the all-zero remainder pinned to ``q``.

    Output: group cols + ``bucket`` + ``max_rho`` — a MERGEABLE relation
    (register-wise max is a commutative idempotent monoid): union register
    relations of disjoint shards and re-take the max (``hll_merge``), or
    maintain it live as a streaming max aggregation with no watermark.
    At most m rows per group ever leave the partial (map-side) aggregate,
    regardless of corpus size — the 100 TB profiling shape.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m, rem_bits, q, _ = _hll_params(p)
    div = 1 << rem_bits
    src = df.select(
        *groups, portable_hash32(F.col(value_col)).alias("__h")
    ).filter(F.col("__h").isNotNull())
    v = F.col("__h") % F.lit(div)
    rho = F.when(v == 0, F.lit(q)).otherwise(
        F.lit(rem_bits) - (F.length(F.bin(v)) - F.lit(1))
    )
    return (
        src.select(*groups, F.expr(f"__h div {div}").alias("bucket"), rho.alias("__rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("__rho").alias("max_rho"))
    )


def hll_merge(groups: Sequence[str], *registers: DataFrame) -> DataFrame:
    """Merge register relations of disjoint shards (register-wise max)."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy(*groups, "bucket").agg(F.max("max_rho").alias("max_rho"))


def hll_finalize(
    registers: DataFrame, group_cols: str | Sequence[str], p: int = 8
) -> DataFrame:
    """Raw-HLL estimate from a register relation. The harmonic mean is kept
    EXACT: sum of 2^(q - max_rho) over present registers plus 2^q per
    absent register, all BIGINT (bounded by m * 2^q <= 2^33) — the only
    floating-point op is the final numerator/denominator division.

    No small-range (linear-counting) correction: it needs ln(), which is
    not exactly-rounded-portable across engines (DESIGN.md: sqrt is the one
    portable non-integer power). Small-cardinality groups belong to
    ``kmv_distinct``, which is exact below k by construction.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    m, _, q, num = _hll_params(p)
    agg = registers.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.expr(f"CAST(1 AS BIGINT) << ({q} - max_rho)")).alias("__s_present"),
    )
    s = F.col("__s_present") + (
        F.lit(m).cast("bigint") - F.col("n_registers")
    ) * F.lit(1 << q).cast("bigint")
    return agg.select(
        *groups,
        "n_registers",
        s.alias("reg_sum"),
        (F.lit(num) / s.cast("double")).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, group_cols: str | Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """Per-group portable-HLL distinct-count estimate (registers + finalize
    in one plan). Output: group cols + ``n_registers`` (non-empty
    registers), ``reg_sum`` (exact scaled harmonic denominator), and
    ``est_distinct`` (double)."""
    return hll_finalize(hll_registers(df, group_cols, value_col, p=p), group_cols, p=p)


def _hll_pairs(g: DataFrame, groups: Sequence[str]) -> DataFrame:
    """Explode an aggregated ``(groups..., __a)`` flat [bucket, rho, ...]
    HLL relation into ``(groups..., bucket, max_rho)`` register rows —
    the bridge from the typed array aggregate back to the relation form
    ``hll_finalize`` reads (same CASE guard as ``_dyadic_buckets``:
    Spark 4 ``sequence(1, 0)`` DESCENDS, the empty arm must not build
    the sequence)."""
    parsed = g.select(
        *groups,
        F.expr(
            "CASE WHEN size(__a) >= 2 THEN"
            " transform(sequence(1, size(__a) div 2),"
            "   i -> struct(element_at(__a, CAST(2*i - 1 AS INT)) AS b,"
            "               element_at(__a, CAST(2*i AS INT)) AS r))"
            " ELSE array() END"
        ).alias("__ps"),
    )
    return parsed.select(*groups, F.explode("__ps").alias("__p")).select(
        *groups,
        F.col("__p.b").alias("bucket"),
        F.col("__p.r").alias("max_rho"),
    )


def hll_distinct_jvm(
    df: DataFrame, group_cols: str | Sequence[str], value_col: str, p: int = 8
) -> DataFrame:
    """``hll_distinct`` with the register state held as ONE O(m)-byte
    typed JVM buffer per group (``fes.HllTI``, round-14 typed-aggregate
    family) instead of the m-row register relation: the shuffle carries
    ``groups x partitions`` byte arrays (~m bytes each) rather than up
    to ``groups x m x partitions`` register rows (~20 bytes each) —
    the ~20x register-shuffle diet at profiling scale. Register-wise
    max is a commutative idempotent monoid and rho is a pure function
    of the hash, so the state is a pure function of the input SET —
    bit-identical registers, bit-identical estimate, SAME oracle as
    ``hll_distinct`` (shared verbatim in the registry). The same
    aggregate holds its state in the streaming state store
    (run_streaming_hll_jvm)."""
    from flink_example_spark.jvm import register_hll

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    fn = register_hll(df.sparkSession, p)
    src = df.select(
        *groups, portable_hash32(F.col(value_col)).alias("__h")
    ).filter(F.col("__h").isNotNull())
    # single-file scan rule: spread the per-row update across cores
    src = src.repartition(df.sparkSession.sparkContext.defaultParallelism)
    g = src.groupBy(*groups).agg(F.expr(f"{fn}(__h)").alias("__a"))
    return hll_finalize(_hll_pairs(g, groups), groups, p=p)


def hll_distinct_oracle(
    source_sql: str,
    group_cols: Sequence[str],
    value_expr: str,
    p: int = 8,
) -> str:
    """DuckDB twin of ``hll_distinct`` built from the same definition.
    ``source_sql`` must yield the group columns plus the value expression.
    DuckDB's SUM(BIGINT) widens to HUGEINT, so both sums are cast back
    (DESIGN.md rule); ``bin()`` is unpadded in both engines."""
    m, rem_bits, q, num = _hll_params(p)
    div = 1 << rem_bits
    gs = ", ".join(group_cols)
    return f"""
        WITH src AS (
          SELECT {gs},
                 CAST(concat('0x', substr(md5({value_expr}), 1, 8)) AS BIGINT) AS h
          FROM ({source_sql}) WHERE {value_expr} IS NOT NULL
        ), regs AS (
          SELECT {gs}, h // {div} AS bucket,
                 MAX(CASE WHEN h % {div} = 0 THEN {q}
                     ELSE {rem_bits} - (length(bin(h % {div})) - 1) END) AS max_rho
          FROM src GROUP BY {gs}, bucket
        ), agg AS (
          SELECT {gs}, CAST(COUNT(*) AS BIGINT) AS n_registers,
                 CAST(SUM(CAST(1 AS BIGINT) << ({q} - max_rho)) AS BIGINT) AS s_present
          FROM regs GROUP BY {gs}
        )
        SELECT {gs}, n_registers,
               s_present + ({m} - n_registers) * CAST({1 << q} AS BIGINT) AS reg_sum,
               -- bare decimal literals parse as DECIMAL in DuckDB; force the
               -- same double the Spark side gets from F.lit(num)
               CAST('{num!r}' AS DOUBLE)
                 / CAST(s_present + ({m} - n_registers)
                        * CAST({1 << q} AS BIGINT) AS DOUBLE) AS est_distinct
        FROM agg
    """


def cm_coords(value: F.Column, depth: int, width: int) -> F.Column:
    """Per-row (r, j) coordinate pairs for a count-min sketch as an array of
    structs — row r uses the engine-portable md5 bucket of ``'r:' || value``
    mod width. Returned as a Column of array<struct<r,j>> for explode()."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    portable_hash32(F.concat(F.lit(f"{r}:"), value)), F.lit(width)
                ).alias("j"),
            )
            for r in range(depth)
        ]
    )


def cm_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a value stream:
    a depth x width counter matrix as rows ``(r, j, cnt)`` where
    ``cnt = SUM(weight)`` of all values hashing to column j under row r's
    hash. Point-estimate guarantee: ``min_r cnt[r][h_r(v)] >= true_count(v)``
    (only over-counts, by collisions).

    Determinism: row-r's hash is the portable md5 bucket of ``'r:' || v``
    (identical in Spark and DuckDB), so the SKETCH ITSELF is bit-identical
    across engines — oracle-checkable, unlike seeded-hash implementations.

    Scale shape: one explode (depth rows per input) + one hash-aggregate on
    (r, j) with map-side partial combine — the reduce side carries at most
    depth*width rows TOTAL regardless of corpus size. Sketches of disjoint
    shards merge by summing counters (same groupBy), the property that makes
    CM the standard distributed frequency profile at 100 TB.

    NULL values are skipped (no portable hash), mirroring ``kmv_distinct``.

    Variants deliberately NOT offered: conservative update (increment only
    the minimum counters) tightens the bound but makes the counter matrix a
    function of PROCESSING ORDER — it cannot be computed by a commutative
    aggregation, breaks shard-mergeability, and has no engine-independent
    oracle. Likewise Misra-Gries / Space-Saving summaries merge via a
    non-SQL custom reduction (pairwise summary merge with decrement) —
    their guarantee survives merging but the concrete counter values are
    merge-tree-dependent, so they fail this engine's bit-exactness
    contract; ``cm_heavy_hitters`` (exact candidates + dominating CM
    estimates) covers the same use case deterministically.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    coords = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.explode(cm_coords(F.col(value_col), depth, width)).alias("__c"),
            w.cast("bigint").alias("__w"),
        )
        .select(F.col("__c.r").alias("r"), F.col("__c.j").alias("j"), "__w")
    )
    return coords.groupBy("r", "j").agg(F.sum("__w").alias("cnt"))


def cm_sketch_jvm(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """``cm_sketch`` with the counter matrix held as ONE typed
    O(depth*width) JVM buffer (``fes.CmTI``, round-14 typed family):
    no ``x depth`` coordinate explode ahead of the aggregation, and the
    shuffle carries one flat array per partition instead of up to
    depth*width partial rows. Coordinates are the SAME engine-portable
    md5 buckets (portable_hash32 of ``'r:' || v``) computed JVM-side,
    and counter addition is a commutative monoid, so the matrix is a
    pure function of the input multiset — bit-identical nonzero cells,
    SAME oracle as ``cm_sketch`` (shared verbatim in the registry).
    Unweighted form only (the weighted relation path remains
    ``cm_sketch(weight_col=...)``)."""
    from flink_example_spark.jvm import register_cm

    fn = register_cm(df.sparkSession, depth, width)
    src = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("__v")
    )
    src = src.repartition(df.sparkSession.sparkContext.defaultParallelism)
    g = src.groupBy().agg(F.expr(f"{fn}(__v)").alias("__a"))
    return (
        g.select(F.posexplode("__a").alias("__i", "cnt"))
        .filter(F.col("cnt") > 0)
        .selectExpr(
            f"CAST(__i div {width} AS INT) AS r",
            f"CAST(__i % {width} AS BIGINT) AS j",
            "cnt",
        )
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge shard sketches (same depth/width) by summing counters."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "j").agg(F.sum("cnt").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate the frequency of each item: est = min over rows r of
    counter[r][h_r(v)]. Items absent from every row's cell estimate from
    the collision mass alone (still an upper bound on 0).

    The sketch is depth*width rows — broadcast to the probe side, so the
    estimate join never shuffles the item stream.
    """
    probes = items.select(
        F.col(value_col), F.explode(cm_coords(F.col(value_col), depth, width)).alias("__c")
    ).select(value_col, F.col("__c.r").alias("r"), F.col("__c.j").alias("j"))
    joined = probes.join(F.broadcast(sketch), ["r", "j"], "left").select(
        value_col, F.coalesce(F.col("cnt"), F.lit(0)).alias("__cell")
    )
    return joined.groupBy(value_col).agg(F.min("__cell").alias("est_count"))


def cm_heavy_hitters(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
    topk: int = 16,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Heavy hitters with count-min verification: the candidate set is the
    exact per-value count (the same single hash-agg shuffle the sketch's
    merge needs — at cluster scale the candidate pass would instead track
    per-partition local heavy hitters; the CM estimate is what makes the
    merged candidates rankable without a second full pass). Output one row
    per top-k value: ``(value, true_count, est_count)`` with
    ``est_count >= true_count`` by the CM guarantee; ties in true_count
    break on the value itself (deterministic).
    """
    sketch = cm_sketch(df, value_col, depth=depth, width=width)
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    top = exact.orderBy(F.col("true_count").desc(), F.col(value_col)).limit(topk)
    est = cm_estimate(sketch, top, value_col, depth=depth, width=width)
    return top.join(est, value_col).select(value_col, "true_count", "est_count")


def cm_sketch_oracle(
    source_sql: str, value_expr: str, depth: int = 4, width: int = 256
) -> str:
    """DuckDB twin of ``cm_sketch`` built from the same hash definition.
    ``source_sql`` yields one row per value instance with column ``v``."""
    rows = " UNION ALL ".join(
        f"""SELECT {r} AS r,
               CAST(concat('0x', substr(md5(concat('{r}:', v)), 1, 8)) AS BIGINT)
                 % {width} AS j
            FROM src"""
        for r in range(depth)
    )
    return f"""
        WITH src AS (SELECT {value_expr} AS v FROM ({source_sql}) WHERE {value_expr} IS NOT NULL),
        coords AS ({rows})
        SELECT r, j, CAST(COUNT(*) AS BIGINT) AS cnt FROM coords GROUP BY r, j
    """


def cm_heavy_hitters_oracle(
    source_sql: str,
    value_expr: str,
    depth: int = 4,
    width: int = 256,
    topk: int = 16,
    value_alias: str = "v",
) -> str:
    """DuckDB twin of ``cm_heavy_hitters`` built from the same definition."""
    coord_rows = " UNION ALL ".join(
        f"""SELECT {r} AS r,
               CAST(concat('0x', substr(md5(concat('{r}:', v)), 1, 8)) AS BIGINT)
                 % {width} AS j
            FROM src"""
        for r in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"""SELECT v, true_count, {r} AS r,
               CAST(concat('0x', substr(md5(concat('{r}:', v)), 1, 8)) AS BIGINT)
                 % {width} AS j
            FROM top"""
        for r in range(depth)
    )
    return f"""
        WITH src AS (
          SELECT {value_expr} AS v FROM ({source_sql})
          WHERE {value_expr} IS NOT NULL
        ), coords AS ({coord_rows}),
        sketch AS (
          SELECT r, j, CAST(COUNT(*) AS BIGINT) AS cnt FROM coords GROUP BY r, j
        ), exact AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS true_count FROM src GROUP BY v
        ), top AS (
          SELECT * FROM exact ORDER BY true_count DESC, v LIMIT {topk}
        ), probes AS ({probe_rows})
        SELECT p.v AS {value_alias}, p.true_count,
               MIN(COALESCE(s.cnt, 0)) AS est_count
        FROM probes p LEFT JOIN sketch s USING (r, j)
        GROUP BY p.v, p.true_count
    """


def kmv_quantile_sample(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    sub_buckets: int = 16,
    method: str = "window",
) -> DataFrame:
    """Deterministic uniform row sample per group: the k rows whose
    portable md5 hash of ``key_col`` is smallest. Because the sample is
    defined by a global order on hashes, samples of disjoint shards MERGE
    exactly (bottom-k of the union = bottom-k of per-shard bottom-ks) and
    every engine draws the SAME sample — unlike rand()-based sampling.
    Same two-phase bottom-k windows as ``kmv_distinct`` (skew-safe, shuffle
    rows capped at sub_buckets*k per group per phase-1 task)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if method == "jvm":
        return _kmv_sample_jvm(df, groups, value_col, key_col, k)
    if method != "window":
        raise ValueError(f"method must be 'window' or 'jvm', got {method!r}")
    src = df.select(
        *groups,
        F.col(value_col).alias("__v"),
        portable_hash32(F.col(key_col).cast("string")).alias("__h"),
        F.col(key_col).alias("__k"),
    ).filter(F.col("__h").isNotNull())
    w1 = Window.partitionBy(*groups, F.pmod(F.col("__h"), F.lit(sub_buckets))).orderBy(
        "__h", "__k"
    )
    survivors = (
        src.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w = Window.partitionBy(*groups).orderBy("__h", "__k")
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*groups, "__v")
    )


def _kmv_sample_jvm(
    df: DataFrame, groups: list[str], value_col: str, key_col: str, k: int
) -> DataFrame:
    """The hash-rank sample as ONE JVM bounded-state aggregation
    (``fes.KmvSampleBottomK`` — O(k) buffer, map-side partial merge,
    the mergeable-quantile-state on-ramp). Tie-break parity with the
    window form: the window orders by (hash, NATIVE key); the JVM
    aggregate compares keys as UTF-8 strings, so non-negative numeric
    keys are zero-padded (lexicographic == numeric — the repo's
    composite-order-key device) and string keys pass through. Other key
    types (or negative numerics) are the window form's job."""
    from flink_example_spark.jvm import register_kmv_sample_bottomk

    fn = register_kmv_sample_bottomk(df.sparkSession, k)
    kt = dict(df.dtypes).get(key_col, "")
    ks = F.col(key_col).cast("string")
    if kt in ("tinyint", "smallint", "int", "bigint"):
        # Runtime guard: zero-pad ordering only matches numeric order for
        # NON-NEGATIVE keys ('-3' sorts before '-5'); a negative key must
        # raise like the other unsupported key types, not silently break
        # the hash-tie parity with the window form.
        order_key = F.when(
            F.col(key_col) < 0,
            F.raise_error(
                F.lit(
                    "kmv_sample method='jvm': negative integer key breaks "
                    "zero-pad ordering; use method='window'"
                )
            ).cast("string"),
        ).otherwise(F.lpad(ks, 20, "0"))
    elif kt == "string":
        order_key = F.col(key_col)
    else:
        raise ValueError(
            f"method='jvm' needs a string or non-negative integer key "
            f"column; {key_col!r} is {kt!r} — use method='window'"
        )
    src = df.select(
        *groups,
        portable_hash32(ks).alias("__h"),
        order_key.alias("__ok"),
        F.col(value_col).cast("double").alias("__vd"),
    ).filter(F.col("__h").isNotNull())
    g = src.groupBy(*groups).agg(
        F.expr(f"{fn}(__h, __ok, __vd)").alias("__vs")
    )
    return g.select(*groups, F.explode("__vs").alias("__v"))


def kmv_quantiles(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    method: str = "window",
) -> DataFrame:
    """Per-group approximate quantiles from the deterministic hash-rank
    sample — the quantile sibling of the KMV cardinality sketch. Groups
    with <= k rows are EXACT (the sample is the whole group); larger groups
    carry the usual +-O(1/sqrt(k)) uniform-sampling quantile error.

    Interpolation is Spark ``percentile`` == DuckDB ``quantile_cont``
    (verified bit-identical linear interpolation — the repo's
    ``percentile_prices`` row pins it), so the whole sketch is
    oracle-checkable. Output: group cols + ``n_sample`` + one ``p<nn>``
    double column per requested quantile (scalar-only, driver-safe).

    Scale: the sample is the only state (k rows/group); the quantile agg
    runs on sub_buckets*k-capped relations. Unlike percentile_approx's
    engine-specific digest this sketch is deterministic and mergeable by
    construction.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    s = kmv_quantile_sample(df, groups, value_col, key_col, k=k, method=method)
    aggs = [F.count(F.lit(1)).alias("n_sample")] + [
        F.expr(f"percentile(__v, {p!r})").alias(f"p{int(round(p * 100)):02d}")
        for p in probs
    ]
    return s.groupBy(*groups).agg(*aggs)


def kmv_quantiles_oracle(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
) -> str:
    """DuckDB twin built from the same hash-rank-sample definition."""
    gs = ", ".join(group_cols)
    qs = ", ".join(
        f"quantile_cont(v, {p!r}) AS p{int(round(p * 100)):02d}" for p in probs
    )
    return f"""
        WITH src AS (
          SELECT {gs}, {value_col} AS v,
                 CAST(concat('0x', substr(md5(CAST({key_col} AS VARCHAR)), 1, 8))
                      AS BIGINT) AS h,
                 {key_col} AS kk
          FROM {table} WHERE {key_col} IS NOT NULL
        ), kept AS (
          SELECT {gs}, v FROM src
          QUALIFY ROW_NUMBER() OVER (PARTITION BY {gs} ORDER BY h, kk) <= {k}
        )
        SELECT {gs}, CAST(COUNT(*) AS BIGINT) AS n_sample, {qs}
        FROM kept GROUP BY {gs}
    """


def kmv_distinct_oracle(
    table: str, group_cols: Sequence[str], value_col: str, k: int = 64
) -> str:
    """DuckDB twin built from the same definition."""
    gs = ", ".join(group_cols)
    return f"""
        WITH hashes AS (
          SELECT DISTINCT {gs},
                 CAST(concat('0x', substr(md5({value_col}), 1, 8)) AS BIGINT) AS h
          FROM {table} WHERE {value_col} IS NOT NULL
        ), kept AS (
          SELECT {gs}, h,
                 ROW_NUMBER() OVER (PARTITION BY {gs} ORDER BY h) AS rn
          FROM hashes QUALIFY rn <= {k}
        )
        SELECT {gs}, CAST(COUNT(*) AS BIGINT) AS n_kept,
               CASE WHEN COUNT(*) >= {k} THEN MAX(h) END AS kth_hash,
               CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE CAST({k - 1} AS DOUBLE) * 4294967296.0
                         / CAST(MAX(h) AS DOUBLE) END AS est_distinct
        FROM kept GROUP BY {gs}
    """


def kmv_rolling_distinct(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    k: int = 16,
    window_days: int = 7,
) -> DataFrame:
    """Rolling ``window_days``-day distinct-count profile WITHOUT
    rescanning raw events per window — the KMV sibling of
    ``dyadic_rollup``'s no-rescan story: per-day bottom-k sketches are
    built ONCE (the typed ``fes.KmvBottomK`` aggregate), and every
    rolling window's sketch is the bottom-k of the UNION of its member
    days' sketches — EXACT, because any of the k smallest hashes of
    the window is among its own day's k smallest (the KMV merge
    property). Output per observed day ``d``: the
    ``kmv_distinct``-shaped estimate over the value domain of days
    ``[d - window_days + 1, d]`` — identical to running the sketch
    from scratch on that window, which is what the oracle does.

    Scale: one day-keyed aggregation over raw events (O(k) state per
    day), then the rolling read touches ONLY the day-sketch relation
    (days x k rows, fanned out x window_days) — the incremental
    profiling shape for "distinct users, trailing week, per day" at
    100 TB. NULL values are skipped like ``kmv_distinct``.
    """
    from flink_example_spark.jvm import register_kmv_bottomk

    spark = df.sparkSession
    fn = register_kmv_bottomk(spark, k)
    # md5 of a non-string differs across engines — hash the decimal
    # string form in both (kmv_daily precedent)
    src = df.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        portable_hash32(F.col(value_col).cast("string")).alias("__h"),
    ).filter(F.col("__h").isNotNull())
    src = src.repartition(spark.sparkContext.defaultParallelism)
    day_g = src.groupBy("day").agg(F.expr(f"{fn}(__h)").alias("__ks"))
    return kmv_rolling_read(day_g, k=k, window_days=window_days)


def kmv_rolling_read(
    day_g: DataFrame, k: int = 16, window_days: int = 7
) -> DataFrame:
    """The no-rescan rolling read over a ``(day, __ks)`` day-sketch
    relation — shared by :func:`kmv_rolling_distinct` and the streaming
    twin (monoid-in-state, algebra-at-read)."""
    # a day's hashes serve the windows ending on day..day+w-1; keep
    # only windows that end on an OBSERVED day (broadcast semi-join)
    serve = (
        day_g.select("day", F.explode("__ks").alias("__h"))
        .select(
            F.explode(
                F.expr(
                    f"sequence(day, day + interval {window_days - 1} days,"
                    " interval 1 day)"
                )
            ).alias("day"),
            "__h",
        )
        .join(F.broadcast(day_g.select("day").distinct()), "day", "left_semi")
        .distinct()
    )
    w = Window.partitionBy("day").orderBy("__h")
    kept = serve.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return (
        kept.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__h").alias("__max_h"),
        )
        .select(
            "day",
            "n_kept",
            F.when(F.col("n_kept") >= k, F.col("__max_h")).alias("kth_hash"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
            .otherwise(
                F.lit(float(k - 1))
                * F.lit(HASH_SPACE)
                / F.col("__max_h").cast("double")
            )
            .alias("est_distinct"),
        )
    )


def kmv_rolling_distinct_oracle(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "user_id",
    k: int = 16,
    window_days: int = 7,
) -> str:
    """DuckDB twin of :func:`kmv_rolling_distinct`, built FROM SCRATCH
    per window (the from-raw definition the sketch read provably
    equals by the KMV merge property)."""
    return f"""
        WITH pairs AS MATERIALIZED (
          SELECT DISTINCT date_trunc('day', {ts_col}) AS day,
                 CAST(concat('0x', substr(md5(CAST({value_col} AS VARCHAR)),
                   1, 8)) AS BIGINT) AS h
          FROM {table} WHERE {value_col} IS NOT NULL
        ), days AS (SELECT DISTINCT day FROM pairs),
        serve AS (
          SELECT d.day AS day, p.h FROM pairs p JOIN days d
          ON d.day >= p.day
           AND d.day < p.day + INTERVAL {window_days} DAY
        ), dist AS (SELECT DISTINCT day, h FROM serve),
        kept AS (
          SELECT day, h,
                 ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
          FROM dist QUALIFY rn <= {k}
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_kept,
               CASE WHEN COUNT(*) >= {k} THEN MAX(h) END AS kth_hash,
               CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE CAST({k - 1} AS DOUBLE) * 4294967296.0
                         / CAST(MAX(h) AS DOUBLE) END AS est_distinct
        FROM kept GROUP BY day
    """


def _bottomk_hashes(df: DataFrame, value_col: str, k: int, sub_buckets: int = 16) -> DataFrame:
    """The k smallest distinct portable hashes of a column — the KMV sample
    set itself, via the same skew-safe two-phase window as ``kmv_distinct``."""
    hashes = (
        df.select(portable_hash32(F.col(value_col)).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .distinct()
    )
    w1 = Window.partitionBy(F.pmod(F.col("__h"), F.lit(sub_buckets))).orderBy("__h")
    survivors = (
        hashes.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("__h")
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch-style SET-OPERATION estimates between two corpora from
    their KMV bottom-k samples (Dasgupta et al., "Theta sketches"): union
    cardinality, Jaccard similarity, and intersection cardinality — the
    train/test contamination and cross-shard overlap estimator that never
    materializes either distinct set.

    Method: bottom-k(A), bottom-k(B); the union's bottom-k is contained in
    their union (the KMV merge property), so ``union_est`` is the standard
    estimator on merged samples; ``jaccard_est`` is the fraction of the
    union sample present in BOTH sides (each union-sample hash is a
    uniform sample of A∪B, and membership in A∩B is exact for sampled
    hashes); ``intersect_est`` = jaccard * union. Exact when |A∪B| < k.

    Output (ONE row): ``n_union_kept``, ``union_est``, ``n_common``,
    ``jaccard_est``, ``intersect_est``. Only 2k hashes ever leave the
    per-side aggregates — sides can be 100 TB corpora.
    """
    ka = _bottomk_hashes(df_a, value_col, k).withColumn("__a", F.lit(1))
    kb = _bottomk_hashes(df_b, value_col, k).withColumn("__b", F.lit(1))
    merged = (
        ka.join(kb, "__h", "full")
        .select(
            "__h",
            F.coalesce(F.col("__a"), F.lit(0)).alias("__a"),
            F.coalesce(F.col("__b"), F.lit(0)).alias("__b"),
        )
    )
    w = Window.partitionBy(F.lit(1)).orderBy("__h")
    ku = merged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    return ku.agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.max("__h").alias("__kth"),
        F.sum(F.col("__a") * F.col("__b")).alias("n_common"),
    ).select(
        "n_union_kept",
        F.when(F.col("n_union_kept") < k, F.col("n_union_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth").cast("double")
        )
        .alias("union_est"),
        F.col("n_common").cast("bigint").alias("n_common"),
        (F.col("n_common").cast("double") / F.col("n_union_kept").cast("double")).alias(
            "jaccard_est"
        ),
        (
            (F.col("n_common").cast("double") / F.col("n_union_kept").cast("double"))
            * F.when(F.col("n_union_kept") < k, F.col("n_union_kept").cast("double"))
            .otherwise(
                F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("__kth").cast("double")
            )
        ).alias("intersect_est"),
    )


def kmv_overlap_oracle(
    source_a: str, source_b: str, value_expr: str, k: int = 256
) -> str:
    """DuckDB twin of ``kmv_overlap`` built from the same definition.
    ``source_a``/``source_b`` are parenthesizable SELECTs yielding the
    value column referenced by ``value_expr``."""
    return f"""
        WITH ka AS (
          SELECT DISTINCT CAST(concat('0x', substr(md5({value_expr}), 1, 8)) AS BIGINT) AS h
          FROM ({source_a}) WHERE {value_expr} IS NOT NULL
          ORDER BY h LIMIT {k}
        ), kb AS (
          SELECT DISTINCT CAST(concat('0x', substr(md5({value_expr}), 1, 8)) AS BIGINT) AS h
          FROM ({source_b}) WHERE {value_expr} IS NOT NULL
          ORDER BY h LIMIT {k}
        ), merged AS (
          SELECT COALESCE(ka.h, kb.h) AS h,
                 CASE WHEN ka.h IS NULL THEN 0 ELSE 1 END AS in_a,
                 CASE WHEN kb.h IS NULL THEN 0 ELSE 1 END AS in_b
          FROM ka FULL JOIN kb ON ka.h = kb.h
        ), ku AS (
          SELECT * FROM merged ORDER BY h LIMIT {k}
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_union_kept,
                 MAX(h) AS kth,
                 CAST(SUM(in_a * in_b) AS BIGINT) AS n_common
          FROM ku
        )
        SELECT n_union_kept,
               CASE WHEN n_union_kept < {k} THEN CAST(n_union_kept AS DOUBLE)
                    ELSE CAST({k - 1} AS DOUBLE) * 4294967296.0
                         / CAST(kth AS DOUBLE) END AS union_est,
               n_common,
               CAST(n_common AS DOUBLE) / CAST(n_union_kept AS DOUBLE) AS jaccard_est,
               (CAST(n_common AS DOUBLE) / CAST(n_union_kept AS DOUBLE))
                 * (CASE WHEN n_union_kept < {k} THEN CAST(n_union_kept AS DOUBLE)
                         ELSE CAST({k - 1} AS DOUBLE) * 4294967296.0
                              / CAST(kth AS DOUBLE) END) AS intersect_est
        FROM agg
    """


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Equi-join cardinality estimation from count-min sketches — the
    optimizer primitive (AMS/CM inner-product estimator, Cormode &
    Muthukrishnan 2005): ``|A ⋈ B| = Σ_k cA(k)·cB(k)``, estimated as
    ``min_r Σ_j cmA[r][j]·cmB[r][j]``. Each side is sketched with ONE
    depth×width-bounded aggregation — at 100 TB you estimate the join
    size from two kilobyte-sized summaries instead of running the join.

    The exact inner product (the ground truth an optimizer can't afford)
    is computed alongside for the error report. All counters and products
    are exact BIGINTs; the relative-error column is one double division.

    Output (one row): ``(n_left, n_right, exact_join_rows,
    est_join_rows, rel_error)`` with ``est >= exact`` (collisions only
    ever add).
    """
    la = cm_sketch(left, left_key, depth=depth, width=width)
    rb = cm_sketch(right, right_key, depth=depth, width=width)
    per_row = (
        la.join(rb.select(F.col("r"), F.col("j"), F.col("cnt").alias("cnt_b")),
                ["r", "j"])
        .groupBy("r")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
    )
    est = per_row.agg(F.min("ip").alias("est_join_rows"))
    ca = left.filter(F.col(left_key).isNotNull()).groupBy(
        F.col(left_key).alias("k")
    ).agg(F.count(F.lit(1)).alias("na"))
    cb = right.filter(F.col(right_key).isNotNull()).groupBy(
        F.col(right_key).alias("k")
    ).agg(F.count(F.lit(1)).alias("nb"))
    exact = (
        ca.join(cb, "k")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_join_rows"))
    )
    nl = left.agg(F.count(F.lit(1)).alias("n_left"))
    nr = right.agg(F.count(F.lit(1)).alias("n_right"))
    return (
        nl.crossJoin(nr)
        .crossJoin(exact)
        .crossJoin(est)
        .select(
            "n_left",
            "n_right",
            "exact_join_rows",
            "est_join_rows",
            (
                (F.col("est_join_rows") - F.col("exact_join_rows")).cast("double")
                / F.col("exact_join_rows").cast("double")
            ).alias("rel_error"),
        )
    )


def join_size_oracle(
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB twin of :func:`join_size_estimate`."""

    def sketch(table: str, key: str) -> str:
        rows = " UNION ALL ".join(
            f"""SELECT {r} AS r,
                       CAST(CAST(concat('0x', substr(md5('{r}:' ||
                            CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT)
                            % {width} AS BIGINT) AS j,
                       v
                FROM (SELECT {key}, CAST({key} AS VARCHAR) AS v FROM {table}
                      WHERE {key} IS NOT NULL)"""
            for r in range(depth)
        )
        return f"SELECT r, j, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({rows}) GROUP BY r, j"

    return f"""
        WITH la AS MATERIALIZED ({sketch(left_table, left_key)}),
        rb AS MATERIALIZED ({sketch(right_table, right_key)}),
        ip AS (
          SELECT la.r, CAST(SUM(la.cnt * rb.cnt) AS BIGINT) AS ip
          FROM la JOIN rb ON la.r = rb.r AND la.j = rb.j
          GROUP BY la.r
        ), est AS (SELECT CAST(MIN(ip) AS BIGINT) AS est_join_rows FROM ip),
        exact AS (
          SELECT CAST(SUM(na * nb) AS BIGINT) AS exact_join_rows FROM (
            SELECT {left_key} AS k, CAST(COUNT(*) AS BIGINT) AS na
            FROM {left_table} WHERE {left_key} IS NOT NULL GROUP BY 1
          ) a JOIN (
            SELECT {right_key} AS k, CAST(COUNT(*) AS BIGINT) AS nb
            FROM {right_table} WHERE {right_key} IS NOT NULL GROUP BY 1
          ) b USING (k)
        ),
        nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_left FROM {left_table}),
        nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_right FROM {right_table})
        SELECT n_left, n_right, exact_join_rows, est_join_rows,
               CAST(est_join_rows - exact_join_rows AS DOUBLE)
                 / CAST(exact_join_rows AS DOUBLE) AS rel_error
        FROM nl CROSS JOIN nr CROSS JOIN exact CROSS JOIN est
    """


def hll_union_estimate(
    df: DataFrame, group_col: str, value_col: str, p: int = 8
) -> DataFrame:
    """HLL MERGEABILITY demo — the property that makes HLL the standard
    distributed distinct-counter: per-group register relations merge by
    register-wise MAX into the UNION's sketch without touching the data
    again. Emits one row per group (its own estimate) plus a
    ``__union__`` row whose estimate comes purely from merging the
    per-group registers; the exact distinct count rides along for the
    error report.

    Output: ``(grp, est_distinct, exact_distinct)``.
    """
    regs = hll_registers(df, group_col, value_col, p=p).localCheckpoint()
    per_group = hll_finalize(regs, group_col, p=p)
    gcol = group_col if isinstance(group_col, str) else group_col[0]
    merged = regs.groupBy("bucket").agg(F.max("max_rho").alias("max_rho")).select(
        F.lit("__union__").alias(gcol), "bucket", "max_rho"
    )
    union_est = hll_finalize(merged, gcol, p=p)
    exact_g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(gcol).alias("__g"))
        .agg(F.countDistinct(value_col).alias("exact_distinct"))
    )
    exact_u = (
        df.filter(F.col(value_col).isNotNull())
        .agg(F.countDistinct(value_col).alias("exact_distinct"))
        .select(F.lit("__union__").alias("__g"), "exact_distinct")
    )
    exact = exact_g.unionByName(exact_u)
    ests = per_group.unionByName(union_est)
    return ests.join(exact, ests[gcol] == exact["__g"]).select(
        F.col(gcol).alias("grp"),
        F.col("est_distinct"),
        F.col("exact_distinct"),
    )


def hll_union_oracle(
    source_sql: str, group_col: str, value_expr: str, p: int = 8
) -> str:
    """DuckDB twin of :func:`hll_union_estimate` — per-group registers,
    a register-wise-max merged '__union__' sketch, and exact distincts."""
    m, rem_bits, q, num = _hll_params(p)
    div = 1 << rem_bits
    g = group_col
    return f"""
        WITH src AS MATERIALIZED (
          SELECT {g} AS g, {value_expr} AS v,
                 CAST(concat('0x', substr(md5({value_expr}), 1, 8)) AS BIGINT) AS h
          FROM ({source_sql}) WHERE {value_expr} IS NOT NULL
        ), regs AS MATERIALIZED (
          SELECT g, h // {div} AS bucket,
                 MAX(CASE WHEN h % {div} = 0 THEN {q}
                     ELSE {rem_bits} - (length(bin(h % {div})) - 1) END) AS max_rho
          FROM src GROUP BY g, bucket
        ), all_regs AS (
          SELECT g, bucket, max_rho FROM regs
          UNION ALL
          SELECT '__union__' AS g, bucket, MAX(max_rho) AS max_rho
          FROM regs GROUP BY bucket
        ), agg AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS n_registers,
                 CAST(SUM(CAST(1 AS BIGINT) << ({q} - max_rho)) AS BIGINT)
                   AS s_present
          FROM all_regs GROUP BY g
        ), exact AS (
          SELECT g, CAST(COUNT(DISTINCT v) AS BIGINT) AS exact_distinct
          FROM src GROUP BY g
          UNION ALL
          SELECT '__union__', CAST(COUNT(DISTINCT v) AS BIGINT) FROM src
        )
        SELECT agg.g AS grp,
               CAST('{num!r}' AS DOUBLE)
                 / CAST(s_present + ({m} - n_registers)
                        * CAST({1 << q} AS BIGINT) AS DOUBLE) AS est_distinct,
               exact.exact_distinct
        FROM agg JOIN exact USING (g)
    """


# ---------------------------------------------------------------------------
# Bloom filter: bit_or monoid words, membership probe, runtime-filter framing
# ---------------------------------------------------------------------------

BLOOM_BITS = 65536  # m: bits per filter (packed 62 bits per BIGINT word: 1<<63 overflows a signed shift in some engines)
BLOOM_K = 4  # hash functions


def _bloom_coords(value: F.Column, m_bits: int, k: int) -> F.Column:
    """Array of k ``(word, mask)`` structs for ``value`` — hash j is the
    engine-portable md5 bucket of ``'j:' || value`` (same device as
    :func:`cm_coords`), split into a BIGINT word index and a single-bit
    mask. All codegen; no Python."""
    coords = []
    for j in range(k):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), value)), 1, 8), 16, 10
        ).cast("bigint") % m_bits
        coords.append(F.struct(h.alias("h")))
    return F.array(*coords)


def _bloom_base(value: F.Column, k: int) -> F.Column:
    """Array of the k m-INDEPENDENT md5 hash bases for ``value`` — the
    ``conv(substr(md5('j:' || v), 1, 8), 16, 10)`` BIGINT before any
    ``% m``. The md5 digests dominate the bloom rows' CPU and are
    identical across filter sizes, so one exploded base relation can
    feed every ``m`` (r15; ``base % m_bits`` equals the
    :func:`_bloom_coords` hash exactly)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), value)), 1, 8), 16, 10
            ).cast("bigint")
            for j in range(k)
        ]
    )


def bloom_build_base(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = BLOOM_K
) -> DataFrame:
    """Exploded ``(groups..., __hb)`` md5-base rows for :func:`bloom_words`
    — build once, reuse across filter sizes."""
    return df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.explode(_bloom_base(F.col(value_col).cast("string"), k)).alias("__hb"),
    )


def bloom_probe_base(
    probes: DataFrame, value_col: str, k: int = BLOOM_K
) -> DataFrame:
    """Exploded ``(v, __hb)`` md5-base rows for the probe side of
    :func:`bloom_probe_summary` — build once, reuse across filter sizes.
    spread after the distinct: AQE coalesces the small distinct output to
    ONE partition and the k-way md5 explode would run single-task."""
    return spread(
        probes.select(F.col(value_col).cast("string").alias("v")).distinct(),
        "v",
    ).select("v", F.explode(_bloom_base(F.col("v"), k)).alias("__hb"))


def bloom_words(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    base: DataFrame | None = None,
) -> DataFrame:
    """Per-group Bloom filter as ``(groups..., word, bits)`` rows — the
    sparse representation of an m-bit filter (absent word == all zeros).

    ``bits`` is a ``bit_or`` of single-bit masks: a commutative, IDEMPOTENT
    monoid, so the same relation is a plain streaming aggregate (no
    watermark, arbitrary replay/duplication) and per-partition partials
    combine map-side. State is at most ``m_bits/62`` rows per group
    regardless of input size — the fixed-width sketch posture that survives
    100 TB (mirrors the reference's distinct-tracking state bounds,
    App.java:156 analogues discussed in SURVEY §2.7).

    Scale: explode k hashes (k rows/input), ONE hash aggregation; partial
    aggregation collapses each partition to ≤ groups × m/64 rows before the
    shuffle.
    """
    exploded = (
        (base if base is not None else bloom_build_base(df, group_cols, value_col, k))
        .withColumn("h", F.col("__hb") % m_bits)
        .withColumn("word", F.expr("h div 62"))
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 62 AS INT))"))
        .drop("__hb")
    )
    return exploded.groupBy(*group_cols, "word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe_summary(
    bloom: DataFrame,
    probes: DataFrame,
    actual: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
    n_probes: int | None = None,
    probe_base: DataFrame | None = None,
) -> DataFrame:
    """Probe every row of ``probes[value_col]`` against every group's Bloom
    filter; summarize per group against the ``actual`` membership relation
    ``(groups..., value_col)`` (distinct). A Bloom filter has NO false
    negatives, so ``flagged_present >= actual_present`` and
    ``false_positives = flagged - actual`` exactly.

    Scale: probes explode to k rows and equi-join the (small, broadcast)
    word table on ``word`` — the exact shape of a runtime bloom filter
    pushed to the probe side of a distributed join, where it prunes shuffle
    input before the real equi-join runs.
    """
    gcols = list(group_cols)
    # spread-after-distinct happens inside bloom_probe_base (r14 stage
    # probe: 1.8s single-task k-way md5 explode otherwise); callers
    # comparing sizes pass the base relation once (r15 md5 sharing)
    if probe_base is None:
        probe_base = bloom_probe_base(probes, value_col, k)
    probe_bits = (
        probe_base.withColumn("h", F.col("__hb") % m_bits)
        .withColumn("word", F.expr("h div 62"))
        .withColumn("mask", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 62 AS INT))"))
        .drop("__hb")
    )
    hits = (
        probe_bits.join(F.broadcast(bloom), on=["word"])
        .filter(F.expr("(bits & mask) = mask"))
        .groupBy(*gcols, "v")
        .agg(F.count(F.lit(1)).alias("nbits"))
        .filter(F.col("nbits") == k)
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("flagged_present"))
    )
    actual_counts = (
        actual.select(*gcols, F.col(value_col).cast("string").alias("v"))
        .distinct()
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("actual_present"))
    )
    if n_probes is None:  # callers comparing sizes pass it once
        n_probes = (
            probes.select(F.col(value_col).cast("string")).distinct().count()
        )
    return (
        hits.join(actual_counts, on=gcols)
        .select(
            *gcols,
            F.lit(n_probes).cast("long").alias("n_probes"),
            F.col("flagged_present").cast("long").alias("flagged_present"),
            F.col("actual_present").cast("long").alias("actual_present"),
            (F.col("flagged_present") - F.col("actual_present"))
            .cast("long")
            .alias("false_positives"),
        )
    )


def bloom_partkey_filter(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Runtime-bloom-filter demo on TPC-H: one Bloom per supplier NATION
    over the partkeys that nation ever shipped, probed by the full ``part``
    table — per nation, how many parts the filter would let through vs the
    exact membership (false positives = wasted probe-side rows a runtime
    filter would fail to prune)."""
    # spread + cut: the joined relation otherwise inherits the 3-partition
    # lineitem scan (k-way md5 explode at 3 tasks, r14 stage probe) and is
    # re-computed by both consumers (bloom build + exact membership)
    shipped = spread(
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("n_name"), F.col("l_partkey")),
        "l_partkey",
    ).localCheckpoint()
    bloom = bloom_words(shipped, ["n_name"], "l_partkey", m_bits, k)
    probes = part.select(F.col("p_partkey").alias("l_partkey"))
    return bloom_probe_summary(
        bloom, probes, shipped, ["n_name"], "l_partkey", m_bits, k
    ).orderBy("n_name")


def bloom_partkey_filter_oracle(
    m_bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of :func:`bloom_partkey_filter` — same md5 bucket device,
    ``<<``/``&``/``bit_or`` bitwise algebra."""
    hash_expr = (
        "CAST(concat('0x', substr(md5(concat(j, ':', v)), 1, 8)) AS BIGINT)"
        f" % {m_bits}"
    )
    return f"""
        WITH shipped AS MATERIALIZED (
          SELECT n_name, CAST(l_partkey AS VARCHAR) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        ),
        ks AS (SELECT CAST(range AS VARCHAR) AS j FROM range(0, {k})),
        bloom AS MATERIALIZED (
          SELECT n_name, h // 62 AS word,
                 bit_or(CAST(1 AS BIGINT) << CAST(h % 62 AS INT)) AS bits
          FROM (SELECT n_name, {hash_expr} AS h FROM shipped CROSS JOIN ks)
          GROUP BY 1, 2
        ),
        probe_bits AS MATERIALIZED (
          SELECT v, h // 62 AS word,
                 CAST(1 AS BIGINT) << CAST(h % 62 AS INT) AS mask
          FROM (
            SELECT v, {hash_expr} AS h
            FROM (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS v FROM part)
            CROSS JOIN ks
          )
        ),
        flagged AS (
          SELECT n_name, CAST(COUNT(*) AS BIGINT) AS flagged_present
          FROM (
            SELECT b.n_name, p.v
            FROM probe_bits p JOIN bloom b ON p.word = b.word
            WHERE (b.bits & p.mask) = p.mask
            GROUP BY 1, 2 HAVING COUNT(*) = {k}
          ) GROUP BY 1
        ),
        actual AS (
          SELECT n_name, CAST(COUNT(DISTINCT v) AS BIGINT) AS actual_present
          FROM shipped GROUP BY 1
        )
        SELECT f.n_name,
               (SELECT CAST(COUNT(DISTINCT p_partkey) AS BIGINT) FROM part)
                 AS n_probes,
               f.flagged_present,
               a.actual_present,
               f.flagged_present - a.actual_present AS false_positives
        FROM flagged f JOIN actual a USING (n_name)
        ORDER BY n_name
    """


def exact_order_stats(
    df: DataFrame, value_col: str, id_col: str, pcts: tuple[int, ...] = (25, 50, 75, 90, 99)
) -> DataFrame:
    """EXACT percentiles as order statistics — the ground truth the KMV
    quantile SAMPLE approximates, made scale-safe: no global sort, no
    single-partition window, no percentile_approx. The global rank comes
    from the distributed two-phase device (``distrank``, DESIGN.md); the
    requested percentiles become target ranks ``r_p = ceil(p*n/100)``
    (= ``(p*n + 99) div 100``, the inclusive lower order statistic) and
    a broadcast equi-join on the rank column picks the value rows.

    Output per requested percentile: ``(pct, target_rank, value)``.

    Scale: one distributed ranking + one broadcast join against a
    len(pcts)-row relation.
    """
    from flink_example_spark.operators.distrank import dist_row_number

    spark = df.sparkSession
    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("v"), F.col(id_col).alias("id")
    )
    ranked = dist_row_number(rows, ["v", "id"], "rn")
    n = rows.count()
    targets = local_df(spark, [(int(p), (int(p) * n + 99) // 100) for p in pcts], "pct long, target_rank long")
    return (
        ranked.join(
            F.broadcast(targets), F.col("rn") == F.col("target_rank")
        )
        .select("pct", "target_rank", F.col("v").alias("value"))
    )


def exact_order_stats_oracle(
    units_sql: str, value_col: str, id_col: str,
    pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> str:
    """DuckDB twin of :func:`exact_order_stats`."""
    pcts_rows = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
        WITH u AS (
          SELECT CAST({value_col} AS BIGINT) AS v, {id_col} AS id
          FROM ({units_sql}) WHERE {value_col} IS NOT NULL
        ),
        ranked AS (
          SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, id) AS BIGINT) AS rn
          FROM u
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
        targets AS (
          SELECT CAST(pct AS BIGINT) AS pct,
                 (CAST(pct AS BIGINT) * n + 99) // 100 AS target_rank
          FROM (VALUES {pcts_rows}) t(pct), nn
        )
        SELECT pct, target_rank, v AS value
        FROM ranked JOIN targets ON rn = target_rank
    """


def exact_order_stats_from_counts(
    counts: DataFrame, pcts: tuple[int, ...] = (25, 50, 75, 90, 99)
) -> DataFrame:
    """:func:`exact_order_stats` closed over a per-VALUE count relation
    ``(v, c)`` — the read-time algebra of the live quantile monitor
    (state = the value-count monoid). The value group covers ranks
    ``[cum-c+1, cum]``; the target rank ``r_p = ceil(p*n/100)`` falls in
    exactly one group — a broadcast interval join against the
    len(pcts)-row target relation. Identical output to the row-level
    form (tied rows are interchangeable)."""
    from flink_example_spark.operators.distrank import dist_cumsum

    spark = counts.sparkSession
    cum = dist_cumsum(counts, ["v"], {"cum": "c"})
    n_df = cum.agg(F.sum("c").cast("long").alias("n"))
    n = n_df.first()["n"]
    targets = local_df(spark, [(int(p), (int(p) * int(n) + 99) // 100) for p in pcts], "pct long, target_rank long")
    return cum.join(
        F.broadcast(targets),
        (F.col("target_rank") <= F.col("cum"))
        & (F.col("target_rank") > F.col("cum") - F.col("c")),
    ).select("pct", "target_rank", F.col("v").alias("value"))


def mp_quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_shards: int = 16,
    rounds_local: int = 6,
    rounds_merge: int = 4,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Munro-Paterson deterministic quantile SKETCH — the bounded-shuffle
    approximate-quantile path for when even the per-VALUE count relation
    is too big to rank exactly: each md5 shard repeatedly sorts its
    survivors and keeps the odd ranks (a deterministic multilevel
    sample; every round doubles the implicit weight), the tiny
    equal-weight survivor union then merges with a few more global
    halvings. Rank error after R total halvings is <= R * 2^(R-1)
    positions (each halving displaces a survivor's true rank by at most
    half its weight) — a fixed, auditable bound, and the whole procedure
    is deterministic, so the DuckDB twin reproduces it bit-for-bit
    (unlike randomized KLL/t-digest; the true mergeable STREAMING
    aggregate remains blocked on a JVM TypedImperativeAggregate,
    PERF.md).

    Output per requested percentile: ``(pct, est_value, sketch_rows,
    n_total, weight)``.

    Scale: phase-1 halvings are per-shard windows (hash-partitioned,
    never global); phase-2 ranks only the survivor set (distributed
    two-phase device). Shuffle bytes after phase 1 are
    ``n / 2^rounds_local`` rows regardless of input size.
    """
    from flink_example_spark.operators.distrank import dist_row_number

    spark = df.sparkSession
    shard = F.expr(
        f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 8), 16, 10)"
        f" AS BIGINT) % {n_shards}"
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("id"),
        shard.alias("sh"),
    )
    n_total_df = base.agg(F.count(F.lit(1)).alias("n_total"))
    cur = base
    for _ in range(rounds_local):
        w = Window.partitionBy("sh").orderBy("v", "id")
        cur = (
            cur.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") % 2 == 1)
            .drop("rn")
        )
    # phase-1 output is n/2^rounds_local rows; cut here so each merge
    # round's two-consumer rank device re-reads the survivors, not the
    # whole per-shard halving chain (which would re-execute 2^rounds
    # times through the branching lineage)
    merged = cur.drop("sh").localCheckpoint(eager=True)
    weight = 1 << (rounds_local + rounds_merge)
    # Scale-adaptive crossover (r14, the duplicate_clusters device): the
    # phase-1 survivor set is n / 2^rounds_local rows. When that is
    # driver-sized, the remaining halvings are a deterministic sort +
    # odd-rank slice — running them through the two-phase rank device
    # costs ~3 jobs per round (range-sampler, window, offset merge; 39
    # stages total at sf0.1) for milliseconds of work. Python's tuple
    # sort over (v, id) matches the engine order exactly (BIGINT v;
    # UTF-8 byte order == code-point order for string ids), so survivor
    # picks are bit-identical. Above the bound the distributed device
    # runs untouched — nothing survivor-sized reaches the driver.
    import os as _os

    if merged.count() <= int(
        _os.environ.get("SPARK_GRAFT_MP_LOCAL_MAX", "1000000")
    ):
        vi = sorted((int(r["v"]), r["id"]) for r in merged.collect())
        for _ in range(rounds_merge):
            vi = vi[0::2]
        m = len(vi)
        n_total = int(n_total_df.first()["n_total"])
        out = []
        for pct in pcts:
            tr = max(1, (int(pct) * m + 99) // 100)
            if 1 <= tr <= m:  # the rank join emitted nothing past m
                out.append((int(pct), vi[tr - 1][0], m, n_total, weight))
        return local_df(
            spark,
            out,
            "pct long, est_value long, sketch_rows long, n_total long,"
            " weight long",
        )
    for _ in range(rounds_merge):
        merged = (
            dist_row_number(merged, ["v", "id"], "rn")
            .filter(F.col("rn") % 2 == 1)
            .drop("rn")
        )
    # the survivor set is sketch-sized (n / 2^rounds): cut lineage once so
    # the count, the target join, and the final projection don't each
    # re-run the halving chain (DESIGN.md multi-consumer rule)
    ranked = dist_row_number(merged, ["v", "id"], "rn").localCheckpoint(
        eager=True
    )
    m = ranked.count()
    targets = local_df(spark, [(int(p), max(1, (int(p) * int(m) + 99) // 100)) for p in pcts], "pct long, target_rank long")
    return (
        ranked.join(F.broadcast(targets), F.col("rn") == F.col("target_rank"))
        .crossJoin(F.broadcast(n_total_df))
        .select(
            "pct",
            F.col("v").alias("est_value"),
            F.lit(int(m)).cast("long").alias("sketch_rows"),
            F.col("n_total").cast("long").alias("n_total"),
            F.lit(int(weight)).cast("long").alias("weight"),
        )
    )


def mp_quantile_sketch_oracle(
    units_sql: str,
    value_col: str,
    id_col: str,
    n_shards: int = 16,
    rounds_local: int = 6,
    rounds_merge: int = 4,
    pcts: tuple[int, ...] = (50, 90, 99),
) -> str:
    """DuckDB twin of :func:`mp_quantile_sketch` (halvings unrolled)."""
    parts = [
        f"""WITH l0 AS MATERIALIZED (
          SELECT CAST({value_col} AS BIGINT) AS v, {id_col} AS id,
                 CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)),
                   1, 8)) AS BIGINT) % {n_shards} AS sh
          FROM ({units_sql}) WHERE {value_col} IS NOT NULL
        )"""
    ]
    for r in range(1, rounds_local + 1):
        parts.append(f"""l{r} AS MATERIALIZED (
          SELECT v, id, sh FROM (
            SELECT v, id, sh,
                   ROW_NUMBER() OVER (PARTITION BY sh ORDER BY v, id) AS rn
            FROM l{r - 1}
          ) WHERE rn % 2 = 1
        )""")
    parts.append(
        f"m0 AS MATERIALIZED (SELECT v, id FROM l{rounds_local})"
    )
    for r in range(1, rounds_merge + 1):
        parts.append(f"""m{r} AS MATERIALIZED (
          SELECT v, id FROM (
            SELECT v, id, ROW_NUMBER() OVER (ORDER BY v, id) AS rn
            FROM m{r - 1}
          ) WHERE rn % 2 = 1
        )""")
    last = f"m{rounds_merge}"
    pcts_rows = ", ".join(f"({int(p)})" for p in pcts)
    weight = 1 << (rounds_local + rounds_merge)
    parts.append(f"""ranked AS MATERIALIZED (
          SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, id) AS BIGINT) AS rn
          FROM {last}
        ),
        mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM {last}),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM l0),
        targets AS (
          SELECT CAST(pct AS BIGINT) AS pct,
                 greatest(1, (CAST(pct AS BIGINT) * m + 99) // 100)
                   AS target_rank
          FROM (VALUES {pcts_rows}) t(pct), mm
        )""")
    return (
        ",\n        ".join(parts)
        + f"""
        SELECT pct, v AS est_value, m AS sketch_rows, n_total,
               CAST({weight} AS BIGINT) AS weight
        FROM ranked JOIN targets ON rn = target_rank, mm, nn"""
    )


def grouped_order_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """EXACT per-group percentiles as order statistics — the grouped
    sibling of :func:`exact_order_stats`: ranks come from per-GROUP
    windows (hash-partitioned on the group key — scale-fine, no global
    ordering anywhere), each group's target ranks derive from its own
    count, and a row survives when its rank hits any requested
    percentile's target.

    Output: ``(grp, pct, target_rank, n, value)`` per (group,
    percentile).

    Scale: one per-group ranking window + a broadcast |pcts|-row
    fan-out filter. Groups compute independently; a skewed group costs
    its own size, nothing global.
    """
    spark = df.sparkSession
    rows = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("long").alias("v"),
        F.col(id_col).alias("id"),
    )
    w = Window.partitionBy("grp").orderBy("v", "id")
    wn = Window.partitionBy("grp")
    ranked = rows.select(
        "grp",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pcts_df = local_df(spark, [(int(p),) for p in pcts], "pct long")
    return (
        ranked.crossJoin(F.broadcast(pcts_df))
        .filter(F.col("rn") == F.expr("(pct * n + 99) div 100"))
        .select(
            "grp",
            "pct",
            F.col("rn").cast("long").alias("target_rank"),
            F.col("n").cast("long").alias("n"),
            F.col("v").alias("value"),
        )
    )


def grouped_order_stats_oracle(
    units_sql: str,
    group_col: str,
    value_col: str,
    id_col: str,
    pcts: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> str:
    """DuckDB twin of :func:`grouped_order_stats`."""
    pcts_rows = ", ".join(f"({int(p)})" for p in pcts)
    return f"""
        WITH u AS (
          SELECT {group_col} AS grp, CAST({value_col} AS BIGINT) AS v,
                 {id_col} AS id
          FROM ({units_sql}) WHERE {value_col} IS NOT NULL
        ),
        ranked AS (
          SELECT grp, v,
                 CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY v, id)
                   AS BIGINT) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
          FROM u
        )
        SELECT grp, CAST(pct AS BIGINT) AS pct, rn AS target_rank, n,
               v AS value
        FROM ranked CROSS JOIN (VALUES {pcts_rows}) p(pct)
        WHERE rn = (CAST(pct AS BIGINT) * n + 99) // 100
    """


def dyadic_quantiles(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    k: int = 64,
    pcts: Sequence[int] = (25, 50, 75, 90),
    scale: int = 1_000_000,
    pre_agg: bool = False,
    shift: int = 0,
) -> DataFrame:
    """Per-group quantile BOUNDS from the adaptive dyadic histogram —
    the deterministic mergeable quantile sketch (``fes.DyadicHist``):
    one JVM bounded-state aggregation keeps EXACT counts of at most k
    dyadic value buckets, halving resolution only when the bucket set
    outgrows k. Unlike KLL (whose rank-uniform guarantee needs
    order-DEPENDENT compaction, so its content can't be oracle-hashed)
    the histogram is a pure function of the input multiset: the final
    level is min{L : |{v >> L}| <= k} whatever the merge tree, so a SQL
    engine reproduces it in closed form (GROUP BY v >> L at the argmin
    level). The read gives deterministic VALUE bounds per percentile —
    the p-th order statistic (rank ``ceil(pct*n/100)``, the
    grouped_order_stats contract) lands in one bucket spanning
    ``[b << L, ((b+1) << L) - 1]`` — complementary to the KMV row
    sample's probabilistic rank-uniform error (``kmv_quantiles``).

    Values quantize to ``floor(v * scale + 0.5) + shift`` and the
    shifted result must be NON-NEGATIVE (dyadic shifts floor only for
    v >= 0) — negative inputs raise at runtime, like the kmv 'jvm' key
    guard. A metric with a known lower bound supports negatives by
    passing ``shift >= -scale * min_value``; the read subtracts the
    shift back, so reported bounds stay in the caller's units.

    Output (tall, scalar BIGINT): per group ``level / n / n_buckets``
    plus ``p{pct}_lo / p{pct}_hi`` per requested percentile.

    Scale: ONE map-side-combined aggregation (partial_dyadic_hist{k}
    below the exchange — partitions x k longs per group shuffle); the
    read runs on the sketch-sized relation (<= k rows per group). The
    same aggregate holds its O(k) state in Structured Streaming's state
    store (streaming_dyadic_jvm).
    """
    from flink_example_spark.jvm import register_dyadic_hist

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    fn = register_dyadic_hist(df.sparkSession, k)
    vq = f"CAST(floor({value_col} * {scale} + 0.5) AS BIGINT) + ({shift})"
    src = df.select(
        *groups,
        F.expr(
            f"CASE WHEN {vq} < 0 THEN CAST(raise_error("
            f"'dyadic_quantiles: negative shifted value breaks dyadic"
            f" bucketing; raise shift or filter first') AS BIGINT)"
            f" ELSE {vq} END"
        ).alias("__vq"),
    )
    # single-file parquet scans as ONE partition; the UDAF update path is
    # CPU-heavy per row, so spread it (explicit count — AQE never
    # coalesces REPARTITION_BY_NUM; merge-order invariance makes any
    # split exact). Measured 7.2s -> ~1s at sf0.1.
    src = src.repartition(df.sparkSession.sparkContext.defaultParallelism)
    if pre_agg:
        # 100 TB feed lever: collapse duplicates in whole-stage codegen
        # BEFORE the UDAF — the weighted form sees distinct (group,
        # value) pairs instead of raw rows (state identical: a weighted
        # multiset is the same multiset). Worth it when values repeat;
        # a no-op-cost extra exchange when they don't.
        from flink_example_spark.jvm import register_dyadic_histw

        fnw = register_dyadic_histw(df.sparkSession, k)
        pre = src.groupBy(*groups, "__vq").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
        g = pre.groupBy(*groups).agg(
            F.expr(f"{fnw}(__vq, __c)").alias("__a")
        )
    else:
        g = src.groupBy(*groups).agg(F.expr(f"{fn}(__vq)").alias("__a"))
    return dyadic_read(g, groups, pcts, shift=shift)


def _dyadic_buckets(g: DataFrame, groups: Sequence[str]) -> DataFrame:
    """Explode an aggregated ``(groups..., __a)`` dyadic-histogram
    relation into ``(groups..., __lvl, __b, __c)`` bucket rows — shared
    by the quantile and selectivity reads."""
    # unpack [L, b1, c1, ...]: guard the pair range with a CASE — Spark 4
    # sequence(1, 0) DESCENDS (round-1 rule), so the empty-hist arm must
    # never build the sequence
    parsed = g.select(
        *groups,
        F.element_at("__a", 1).alias("__lvl"),
        F.expr(
            "CASE WHEN size(__a) >= 3 THEN"
            " transform(sequence(1, (size(__a) - 1) div 2),"
            "   i -> struct(element_at(__a, CAST(2*i AS INT)) AS b,"
            "               element_at(__a, CAST(2*i + 1 AS INT)) AS c))"
            " ELSE array() END"
        ).alias("__bs"),
    )
    return parsed.select(
        *groups, "__lvl", F.explode("__bs").alias("__p")
    ).select(
        *groups,
        "__lvl",
        F.col("__p.b").alias("__b"),
        F.col("__p.c").alias("__c"),
    )


def dyadic_read(
    g: DataFrame, groups: Sequence[str], pcts: Sequence[int], shift: int = 0
) -> DataFrame:
    """The quantile-bounds read over an aggregated ``(groups..., __a)``
    dyadic-histogram relation — shared by :func:`dyadic_quantiles` and
    the streaming twin (monoid-in-state, algebra-at-read)."""
    ex = _dyadic_buckets(g, groups)
    wcum = (
        Window.partitionBy(*groups)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*groups)
    ex2 = ex.select(
        *groups,
        "__lvl",
        "__b",
        "__c",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wall).alias("__n"),
        F.count(F.lit(1)).over(wall).alias("__nb"),
    )
    # ONE aggregation feeds every output row (conditional aggs — exactly
    # one bucket matches each pct's rank window, so max() is exact)
    hit = lambda p: f"__cum >= ({p} * __n + 99) div 100 AND __cum - __c < ({p} * __n + 99) div 100"  # noqa: E731,E501
    aggs = [
        F.max("__lvl").cast("long").alias("level"),
        F.max("__n").cast("long").alias("n"),
        F.max("__nb").cast("long").alias("n_buckets"),
    ]
    for p in pcts:
        aggs.append(
            F.max(
                F.expr(
                    f"CASE WHEN {hit(p)} THEN"
                    f" shiftleft(__b, __lvl) - ({shift}) END"
                )
            )
            .cast("long")
            .alias(f"p{int(p)}_lo")
        )
        aggs.append(
            F.max(
                F.expr(
                    f"CASE WHEN {hit(p)} THEN"
                    f" shiftleft(__b + 1, __lvl) - 1 - ({shift}) END"
                )
            )
            .cast("long")
            .alias(f"p{int(p)}_hi")
        )
    wide = ex2.groupBy(*groups).agg(*aggs)
    stats = ["level", "n", "n_buckets"] + [
        f"p{int(p)}_{s}" for p in pcts for s in ("lo", "hi")
    ]
    pairs = ", ".join(f"'{s}', {s}" for s in stats)
    return wide.selectExpr(
        *groups, f"stack({len(stats)}, {pairs}) AS (feature, value)"
    ).select(*groups, "feature", F.col("value").cast("long"))


def dyadic_quantiles_oracle(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    pcts: Sequence[int] = (25, 50, 75, 90),
    scale: int = 1_000_000,
    shift: int = 0,
) -> str:
    """DuckDB twin of :func:`dyadic_quantiles` in closed form: the
    merge-order-invariance theorem (DyadicHist.java) says the JVM
    sketch's state IS the exact bucket relation at level
    min{L : count(distinct vq >> L) <= k} — computable by a 64-level
    scan — so the whole read reproduces bit-for-bit."""
    gs = ", ".join(group_cols)
    hit = (
        lambda p: f"cum >= ({p} * n + 99) // 100"
        f" AND cum - c < ({p} * n + 99) // 100"
    )
    stat_rows = "\n".join(
        f"        UNION ALL SELECT {gs}, 'p{int(p)}_{s}',"
        f" p{int(p)}_{s} FROM wide"
        for p in pcts
        for s in ("lo", "hi")
    )
    pct_aggs = ",\n                 ".join(
        f"MAX(CASE WHEN {hit(p)} THEN"
        f" {expr} END) AS p{int(p)}_{s}"
        for p in pcts
        for s, expr in (
            ("lo", f"(b << lvl) - ({shift})"),
            ("hi", f"((b + 1) << lvl) - 1 - ({shift})"),
        )
    )
    return f"""
        WITH q AS MATERIALIZED (
          SELECT {gs}, CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)
                   + ({shift}) AS vq
          FROM {table} WHERE {value_col} IS NOT NULL),
        lv AS MATERIALIZED (
          SELECT {gs}, CAST(MIN(L) AS INT) AS lvl FROM (
            SELECT {gs}, ls.L AS L,
                   COUNT(DISTINCT vq >> ls.L) AS nbk
            FROM q CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS L)
              ls
            GROUP BY {gs}, ls.L)
          WHERE nbk <= {k} GROUP BY {gs}),
        bk AS MATERIALIZED (
          SELECT {gs}, lvl, vq >> lvl AS b, CAST(COUNT(*) AS BIGINT) AS c
          FROM q JOIN lv USING ({gs}) GROUP BY {gs}, lvl, b),
        ex AS MATERIALIZED (
          SELECT {gs}, lvl, b, c,
                 CAST(SUM(c) OVER (PARTITION BY {gs} ORDER BY b)
                   AS BIGINT) AS cum,
                 CAST(SUM(c) OVER (PARTITION BY {gs}) AS BIGINT) AS n,
                 CAST(COUNT(*) OVER (PARTITION BY {gs}) AS BIGINT) AS nbk
          FROM bk),
        wide AS MATERIALIZED (
          SELECT {gs}, CAST(MAX(lvl) AS BIGINT) AS level, MAX(n) AS n,
                 MAX(nbk) AS n_buckets,
                 {pct_aggs}
          FROM ex GROUP BY {gs})
        SELECT {gs}, 'level' AS feature, CAST(level AS BIGINT) AS value
        FROM wide
        UNION ALL SELECT {gs}, 'n', n FROM wide
        UNION ALL SELECT {gs}, 'n_buckets', n_buckets FROM wide
{stat_rows}
    """


def mg_heavy_hitters(
    df: DataFrame,
    group_cols: str | Sequence[str],
    key_col: str,
    k: int = 8,
) -> DataFrame:
    """Per-group heavy hitters via a Misra-Gries O(k) JVM merge
    aggregate (``fes.MGTopK``) CERTIFIED against exact counts. The MG
    summary itself is merge-order-dependent (measured: 191 distinct
    summaries over 200 shuffles of one multiset — MGTopK.java), so the
    recorded relation is the order-INVARIANT read the MG guarantee
    makes exact: every key with true frequency ``f > n/(k+1)`` is
    present in the summary on EVERY order, so

        exact-heavy keys SEMI-JOIN MG survivors  ==  exact-heavy keys

    deterministically. The semi-join runs the real MG plan (a buggy
    summary that dropped a guaranteed key WOULD lose a row and fail the
    oracle); the exact counts come from a plain groupBy the same scan
    feeds. The estimate-error bound (``f - n/(k+1) <= est <= f``) is
    pinned in tests/test_sketch.py across shuffled partitionings.

    Output: ``(group..., hh_key string, exact_count, n)`` — keys whose
    exact frequency strictly exceeds ``n / (k+1)``.

    Scale: the MG branch is ONE map-side-combined aggregation with O(k)
    state per group (cm_heavy_hitters ships depth x width counter rows
    per group; this ships k). The exact branch is a standard
    two-aggregation count — at 100 TB replace it with a second MG pass
    at higher k or accept the summary's bounded counts; the certified
    read here is what makes the row oracle-gradable.
    """
    from flink_example_spark.jvm import register_mg_topk

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    fm = register_mg_topk(df.sparkSession, k)
    src = df.select(
        *groups, F.col(key_col).cast("string").alias("__key")
    ).filter(F.col("__key").isNotNull())
    # spread the per-row MG update across cores (single-file scan rule;
    # the certified read is order-invariant so any split is exact)
    mg_src = src.repartition(df.sparkSession.sparkContext.defaultParallelism)
    mg = (
        mg_src.groupBy(*groups)
        .agg(F.expr(f"{fm}(__key)").alias("__mg"))
        .select(*groups, F.explode("__mg").alias("__e"))
        .select(
            *groups, F.split(F.col("__e"), "\t").getItem(0).alias("__key")
        )
    )
    exact = src.groupBy(*groups, "__key").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    wall = Window.partitionBy(*groups)
    heavy = exact.select(
        *groups,
        "__key",
        "exact_count",
        F.sum("exact_count").over(wall).cast("long").alias("n"),
    ).filter(F.expr(f"exact_count * {k + 1} > n"))
    return heavy.join(mg, [*groups, "__key"], "left_semi").select(
        *groups, F.col("__key").alias("hh_key"), "exact_count", "n"
    )


def mg_heavy_hitters_oracle(
    table: str,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 8,
) -> str:
    """DuckDB twin of :func:`mg_heavy_hitters`: the MG guarantee makes
    the semi-join a proven identity, so the oracle is the exact-count
    filter alone."""
    gs = ", ".join(group_cols)
    return f"""
        WITH src AS MATERIALIZED (
          SELECT {gs}, CAST({key_col} AS VARCHAR) AS hh_key
          FROM {table} WHERE {key_col} IS NOT NULL),
        exact AS MATERIALIZED (
          SELECT {gs}, hh_key, CAST(COUNT(*) AS BIGINT) AS exact_count
          FROM src GROUP BY {gs}, hh_key)
        SELECT {gs}, hh_key, exact_count, n FROM (
          SELECT {gs}, hh_key, exact_count,
                 CAST(SUM(exact_count) OVER (PARTITION BY {gs}) AS BIGINT)
                   AS n
          FROM exact)
        WHERE exact_count * {k + 1} > n
    """


def dyadic_selectivity(
    df: DataFrame,
    group_cols: str | Sequence[str],
    value_col: str,
    ranges: Sequence[tuple[float, float]],
    k: int = 64,
    scale: int = 1_000_000,
) -> DataFrame:
    """DETERMINISTIC selectivity bounds for range predicates from the
    dyadic histogram — the planner read over the same sketch
    :func:`dyadic_quantiles` builds (selectivity estimation is what a
    layout/scan planner consults before choosing a sort or a runtime
    filter; see layout_range_plan for the file-level sibling). For each
    probe range ``[lo, hi)`` (inclusive-exclusive, original value
    units): ``n_min`` counts buckets fully inside the quantized range,
    ``n_max`` adds partially-overlapping edge buckets — EXACT bounds on
    the true row count, n_min <= true <= n_max, by construction (bucket
    counts are exact; only edge-bucket membership is unresolved).
    Endpoints quantize with the SAME round-half-up as values
    (``int(x*scale + 0.5)``), so the bounds are exact w.r.t. the
    round-half-up-quantized range — endpoints not exactly representable
    at the scale land on the same quantum a data value there would.

    Output (tall, scalar BIGINT): per group, per range i:
    ``r{i}_n_min`` / ``r{i}_n_max``.

    Scale: the same ONE bounded-state aggregation; the read is
    sketch-sized conditional sums (one pass, no joins).
    """
    from flink_example_spark.jvm import register_dyadic_hist

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    fn = register_dyadic_hist(df.sparkSession, k)
    vq = f"CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)"
    src = df.select(
        *groups,
        F.expr(
            f"CASE WHEN {vq} < 0 THEN CAST(raise_error("
            f"'dyadic_selectivity: negative value') AS BIGINT)"
            f" ELSE {vq} END"
        ).alias("__vq"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    g = src.groupBy(*groups).agg(F.expr(f"{fn}(__vq)").alias("__a"))
    ex = _dyadic_buckets(g, groups)
    # bucket value span: [b << L, (b+1) << L - 1] inclusive
    aggs = []
    stats = []
    for i, (lo, hi) in enumerate(ranges):
        # endpoints quantize with the SAME round-half-up as values, so
        # the [qlo, qhi) contract aligns with value rounding even when
        # lo*scale is not exactly representable (ADVICE-r13); bounds are
        # exact w.r.t. the quantized range
        qlo = int(lo * scale + 0.5)
        qhi = int(hi * scale + 0.5)  # exclusive
        blo = "shiftleft(__b, __lvl)"
        bhi = "shiftleft(__b + 1, __lvl) - 1"
        full = f"{blo} >= {qlo} AND {bhi} < {qhi}"
        overlap = f"{blo} < {qhi} AND {bhi} >= {qlo}"
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {full} THEN __c END")), F.lit(0)
            ).cast("long").alias(f"r{i}_n_min")
        )
        aggs.append(
            F.coalesce(
                F.sum(F.expr(f"CASE WHEN {overlap} THEN __c END")), F.lit(0)
            ).cast("long").alias(f"r{i}_n_max")
        )
        stats += [f"r{i}_n_min", f"r{i}_n_max"]
    wide = ex.groupBy(*groups).agg(*aggs)
    pairs = ", ".join(f"'{s}', {s}" for s in stats)
    return wide.selectExpr(
        *groups, f"stack({len(stats)}, {pairs}) AS (feature, value)"
    ).select(*groups, "feature", F.col("value").cast("long"))


def dyadic_selectivity_oracle(
    table: str,
    group_cols: Sequence[str],
    value_col: str,
    ranges: Sequence[tuple[float, float]],
    k: int = 64,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`dyadic_selectivity` — same closed-form
    bucket relation (the invariance theorem), same overlap algebra."""
    gs = ", ".join(group_cols)
    aggs = []
    rows = []
    for i, (lo, hi) in enumerate(ranges):
        # round-half-up, identical to the Spark side (ADVICE-r13)
        qlo = int(lo * scale + 0.5)
        qhi = int(hi * scale + 0.5)
        blo = "(b << lvl)"
        bhi = "((b + 1) << lvl) - 1"
        aggs.append(
            f"CAST(COALESCE(SUM(CASE WHEN {blo} >= {qlo} AND {bhi} < {qhi}"
            f" THEN c END), 0) AS BIGINT) AS r{i}_n_min"
        )
        aggs.append(
            f"CAST(COALESCE(SUM(CASE WHEN {blo} < {qhi} AND {bhi} >= {qlo}"
            f" THEN c END), 0) AS BIGINT) AS r{i}_n_max"
        )
        rows.append(
            f"        UNION ALL SELECT {gs}, 'r{i}_n_min', r{i}_n_min"
            f" FROM wide"
        )
        rows.append(
            f"        UNION ALL SELECT {gs}, 'r{i}_n_max', r{i}_n_max"
            f" FROM wide"
        )
    agg_sql = ",\n                 ".join(aggs)
    row_sql = "\n".join(rows[1:])
    first = (
        f"SELECT {gs}, 'r0_n_min' AS feature,"
        f" CAST(r0_n_min AS BIGINT) AS value FROM wide"
    )
    return f"""
        WITH q AS MATERIALIZED (
          SELECT {gs}, CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)
                   AS vq
          FROM {table} WHERE {value_col} IS NOT NULL),
        lv AS MATERIALIZED (
          SELECT {gs}, CAST(MIN(L) AS INT) AS lvl FROM (
            SELECT {gs}, ls.L AS L,
                   COUNT(DISTINCT vq >> ls.L) AS nbk
            FROM q CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS L)
              ls
            GROUP BY {gs}, ls.L)
          WHERE nbk <= {k} GROUP BY {gs}),
        bk AS MATERIALIZED (
          SELECT {gs}, lvl, vq >> lvl AS b, CAST(COUNT(*) AS BIGINT) AS c
          FROM q JOIN lv USING ({gs}) GROUP BY {gs}, lvl, b),
        wide AS MATERIALIZED (
          SELECT {gs},
                 {agg_sql}
          FROM bk GROUP BY {gs})
        {first}
{row_sql}
    """


def dyadic_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 64,
    pcts: Sequence[int] = (50, 90),
    scale: int = 1_000_000,
) -> DataFrame:
    """Shard-merge WITHOUT rescan: weekly quantile bounds computed from
    the stored per-DAY dyadic sketches — the property that makes the
    histogram the right incremental profiling tool at 100 TB (day
    sketches are tiny and append-only; weeks/months/global roll up from
    them, never from raw events).

    Exactness: a day bucket at level ``L_day`` IS the exact count of
    ``v >> L_day``; re-bucketing its lower bound at any coarser level L
    satisfies ``(b << L_day) >> L == v >> L``, so the rollup at level
    ``L* = min{L >= max(L_day in week) : |buckets_L| <= k}`` carries
    EXACT counts — the same sketch a from-scratch build would produce
    whenever its natural level is >= every member day's level (the
    floor keeps the rollup honest when days were coarser than the week
    would need). Deterministic by the same invariance argument, so the
    DuckDB twin reproduces the two-stage definition bit-for-bit.

    Output (tall, scalar): per week ``level / n / n_buckets`` +
    ``p{pct}_lo / p{pct}_hi`` (week = date_trunc('week'), a TIMESTAMP).

    Scale: the rollup stage touches ONLY the day-sketch relation
    (days x <= k rows) — no raw-data scan.
    """
    from flink_example_spark.jvm import register_dyadic_hist

    fn = register_dyadic_hist(df.sparkSession, k)
    vq = f"CAST(floor({value_col} * {scale} + 0.5) AS BIGINT)"
    src = df.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.expr(
            f"CASE WHEN {vq} < 0 THEN CAST(raise_error("
            f"'dyadic_rollup: negative value') AS BIGINT) ELSE {vq} END"
        ).alias("__vq"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    day_g = src.groupBy("day").agg(F.expr(f"{fn}(__vq)").alias("__a"))
    return dyadic_rollup_read(day_g, k=k, pcts=pcts)


def dyadic_rollup_read(
    day_g: DataFrame, k: int = 64, pcts: Sequence[int] = (50, 90)
) -> DataFrame:
    """The no-rescan weekly rollup read over a ``(day, __a)`` day-sketch
    relation — shared by :func:`dyadic_rollup` and the streaming twin
    (the rollup is pure read-time algebra over stored/live sketches)."""
    # ---- rollup stage: day-sketch relation only, no raw rescan ----
    daybk = _dyadic_buckets(day_g, ["day"]).select(
        F.date_trunc("week", F.col("day")).alias("week"),
        "__lvl",
        F.expr("shiftleft(__b, __lvl)").alias("__vlo"),
        "__c",
    )
    wk = Window.partitionBy("week")
    floored = daybk.withColumn("__lmin", F.max("__lvl").over(wk))
    # candidate levels Lmin..63 per week; pick the min level whose
    # re-bucketed distinct count fits k (the same argmin scan the
    # oracle runs — 64x the sketch-sized relation, trivially small)
    cand = (
        floored.select(
            "week",
            "__vlo",
            "__c",
            "__lmin",
            F.explode(F.expr("sequence(__lmin, CAST(63 AS INT))")).alias(
                "__L"
            ),
        )
        .groupBy("week", "__L")
        .agg(
            F.countDistinct(
                F.expr("shiftright(__vlo, __L)")
            ).alias("__nb")
        )
        .filter(F.col("__nb") <= k)
        .groupBy("week")
        .agg(F.min("__L").alias("__wlvl"))
    )
    rolled = (
        floored.drop("__lvl")
        .join(cand, "week")
        .select(
            "week",
            F.col("__wlvl").alias("__lvl"),
            F.expr("shiftright(__vlo, __wlvl)").alias("__b"),
            "__c",
        )
        .groupBy("week", "__lvl", "__b")
        .agg(F.sum("__c").cast("long").alias("__c"))
    )
    # same quantile-bounds read as dyadic_read, over the rolled buckets
    wcum = (
        Window.partitionBy("week")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("week")
    ex2 = rolled.select(
        "week",
        "__lvl",
        "__b",
        "__c",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wall).alias("__n"),
        F.count(F.lit(1)).over(wall).alias("__nb"),
    )
    hit = lambda p: (  # noqa: E731
        f"__cum >= ({p} * __n + 99) div 100"
        f" AND __cum - __c < ({p} * __n + 99) div 100"
    )
    aggs = [
        F.max("__lvl").cast("long").alias("level"),
        F.max("__n").cast("long").alias("n"),
        F.max("__nb").cast("long").alias("n_buckets"),
    ]
    for p in pcts:
        aggs.append(
            F.max(
                F.expr(f"CASE WHEN {hit(p)} THEN shiftleft(__b, __lvl) END")
            ).cast("long").alias(f"p{int(p)}_lo")
        )
        aggs.append(
            F.max(
                F.expr(
                    f"CASE WHEN {hit(p)} THEN"
                    f" shiftleft(__b + 1, __lvl) - 1 END"
                )
            ).cast("long").alias(f"p{int(p)}_hi")
        )
    wide = ex2.groupBy("week").agg(*aggs)
    stats = ["level", "n", "n_buckets"] + [
        f"p{int(p)}_{s}" for p in pcts for s in ("lo", "hi")
    ]
    pairs = ", ".join(f"'{s}', {s}" for s in stats)
    return wide.selectExpr(
        "week", f"stack({len(stats)}, {pairs}) AS (feature, value)"
    ).select("week", "feature", F.col("value").cast("long"))


def dyadic_rollup_oracle(
    table: str = "events",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 64,
    pcts: Sequence[int] = (50, 90),
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`dyadic_rollup` — the same two-stage
    definition (per-day argmin levels, then the floored weekly argmin
    over day-bucket lower bounds)."""
    hit = (
        lambda p: f"cum >= ({p} * n + 99) // 100"
        f" AND cum - c < ({p} * n + 99) // 100"
    )
    pct_aggs = ",\n                 ".join(
        f"MAX(CASE WHEN {hit(p)} THEN {expr} END) AS p{int(p)}_{s}"
        for p in pcts
        for s, expr in (
            ("lo", "(b << lvl)"),
            ("hi", "((b + 1) << lvl) - 1"),
        )
    )
    stat_rows = "\n".join(
        f"        UNION ALL SELECT week, 'p{int(p)}_{s}',"
        f" p{int(p)}_{s} FROM wide"
        for p in pcts
        for s in ("lo", "hi")
    )
    return f"""
        WITH q AS MATERIALIZED (
          SELECT date_trunc('day', {ts_col}) AS day,
                 CAST(floor({value_col} * {scale} + 0.5) AS BIGINT) AS vq
          FROM {table} WHERE {value_col} IS NOT NULL),
        dlv AS MATERIALIZED (
          SELECT day, CAST(MIN(L) AS INT) AS dl FROM (
            SELECT day, ls.L AS L, COUNT(DISTINCT vq >> ls.L) AS nbk
            FROM q CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS L)
              ls
            GROUP BY day, ls.L)
          WHERE nbk <= {k} GROUP BY day),
        daybk AS MATERIALIZED (
          SELECT date_trunc('week', q.day) AS week, dl,
                 (vq >> dl) << dl AS vlo, CAST(COUNT(*) AS BIGINT) AS c
          FROM q JOIN dlv ON q.day = dlv.day GROUP BY 1, 2, vq >> dl),
        fl AS MATERIALIZED (
          SELECT week, vlo, c,
                 CAST(MAX(dl) OVER (PARTITION BY week) AS INT) AS lmin
          FROM daybk),
        wlv AS MATERIALIZED (
          SELECT week, CAST(MIN(L) AS INT) AS lvl FROM (
            SELECT week, ls.L AS L, COUNT(DISTINCT vlo >> ls.L) AS nbk
            FROM fl CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS L)
              ls
            WHERE ls.L >= lmin
            GROUP BY week, ls.L)
          WHERE nbk <= {k} GROUP BY week),
        rolled AS MATERIALIZED (
          SELECT fl.week, lvl, vlo >> lvl AS b, CAST(SUM(c) AS BIGINT) AS c
          FROM fl JOIN wlv ON fl.week = wlv.week GROUP BY 1, 2, 3),
        ex AS MATERIALIZED (
          SELECT week, lvl, b, c,
                 CAST(SUM(c) OVER (PARTITION BY week ORDER BY b)
                   AS BIGINT) AS cum,
                 CAST(SUM(c) OVER (PARTITION BY week) AS BIGINT) AS n,
                 CAST(COUNT(*) OVER (PARTITION BY week) AS BIGINT) AS nbk
          FROM rolled),
        wide AS MATERIALIZED (
          SELECT week, CAST(MAX(lvl) AS BIGINT) AS level, MAX(n) AS n,
                 MAX(nbk) AS n_buckets,
                 {pct_aggs}
          FROM ex GROUP BY week)
        SELECT week, 'level' AS feature, CAST(level AS BIGINT) AS value
        FROM wide
        UNION ALL SELECT week, 'n', n FROM wide
        UNION ALL SELECT week, 'n_buckets', n_buckets FROM wide
{stat_rows}
    """
