"""Embedding similarity search (approximate-nearest-neighbor).

- cosine_topk       exact brute-force top-k: broadcast the (small) query set
                    against the corpus; JVM-side zip_with/aggregate dot
                    products inside whole-stage codegen; per-query top-k via
                    window. The correctness baseline.
- lsh_cosine_topk   random-hyperplane LSH bucketing: corpus shuffles once on
                    a sign-bit bucket, probes search only matching buckets —
                    the 100 TB scale path (bucket count grows with corpus;
                    recall tunable via hyperplane count / multi-probe).
- cosine_pairs      near-duplicate pairs by cosine >= threshold within blocks.

All dot products fold left-to-right over DOUBLE — deterministic and
bit-identical to the DuckDB oracle's list_dot_product/list_cosine_similarity
(verified empirically in tests).

Hyperplanes are derived from xxhash64(seed, dim) — deterministic across the
cluster, no driver-side RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_example_spark.operators.util import local_df


def as_double_vec(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic summation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _prep(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    v = as_double_vec(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_vec"),
        l2_norm(v).alias(f"{prefix}_norm"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    The query side is broadcast (ANN query batches are small relative to the
    corpus); the corpus streams through in place — no corpus shuffle at all.
    Output: (query_id, neighbor_id, rank, cos).
    """
    c = _prep(corpus, id_col, vec_col, "n")
    q = _prep(queries, id_col, vec_col, "q")
    joined = c.join(F.broadcast(q), F.lit(True))
    if not include_self:
        joined = joined.filter(F.col("q_id") != F.col("n_id"))
    scored = joined.select(
        "q_id",
        "n_id",
        (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank"),
            F.col("cos"),
        )
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash — reproducible on
    any executor without shipping RNG state. Components in [-0.5, 0.5)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()[:8], "big"
            )
            row.append((h % 10_000) / 10_000.0 - 0.5)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p = 1 iff dot(vec, plane_p) >= 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = dot(vec, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only corpus vectors in the query's LSH bucket are
    scored. Equi-join on bucket → one corpus shuffle, no cross product.
    Recall < 1 by construction (rows-only check; cosine_topk is the oracle-
    checked exact baseline)."""
    planes = hyperplanes(dim, n_planes)
    c = _prep(corpus, id_col, vec_col, "n").withColumn(
        "bucket", lsh_bucket(F.col("n_vec"), planes)
    )
    q = _prep(queries, id_col, vec_col, "q").withColumn(
        "bucket", lsh_bucket(F.col("q_vec"), planes)
    )
    joined = c.join(F.broadcast(q), "bucket").filter(F.col("q_id") != F.col("n_id"))
    scored = joined.select(
        "q_id",
        "n_id",
        (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank"),
            F.col("cos"),
        )
    )


def _seed_centroids(c: DataFrame, n_cells: int) -> DataFrame:
    """The n_cells corpus vectors with smallest md5(id), numbered by hash
    order — deterministic, RNG-free, and reproducible by any SQL engine for
    oracle checking.

    Scale: ``orderBy(h).limit(n)`` compiles to ``TakeOrderedAndProject`` —
    each partition keeps its local top-n, the driver merges n_parts*n rows;
    NO global sort exists at any corpus size (plan pinned in
    tests/test_plan_regressions.py). Cell numbering uses a sorted-array
    posexplode over the n_cells surviving rows instead of an unpartitioned
    row_number window (whose single-partition WindowExec Catalyst cannot see
    is post-LIMIT tiny).
    """
    return (
        c.withColumn("__h", F.md5(F.col("n_id").cast("string")))
        .orderBy("__h")
        .limit(n_cells)
        .agg(F.array_sort(F.collect_list(F.struct("__h", "n_vec", "n_norm"))).alias("__a"))
        .select(F.posexplode("__a").alias("__pos", "__s"))
        .select(
            (F.col("__pos") + 1).alias("cell"),
            F.col("__s.n_vec").alias("c_vec"),
            F.col("__s.n_norm").alias("c_norm"),
        )
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus vectors are assigned to the
    nearest of ``n_cells`` centroids; each query scores only the ``n_probe``
    nearest cells.

    ``centroids``: a trained coarse quantizer ``(cell, c_vec, c_norm)`` —
    pass ``kmeans_centroids(corpus)`` for the Lloyd-refined cells. Default
    (None) samples the n_cells corpus vectors with smallest md5(id) —
    deterministic, no RNG state, and (unlike xxhash64) reproducible by any
    SQL engine for oracle checking.

    One corpus shuffle on cell id; per-query work drops from |corpus| to
    ~|corpus|*n_probe/n_cells. Recall < 1 by construction (rows-only check;
    cosine_topk is the exact oracle-checked baseline).
    """
    c = _prep(corpus, id_col, vec_col, "n")
    q = _prep(queries, id_col, vec_col, "q")
    if centroids is None:
        centroids = _seed_centroids(c, n_cells)

    def nearest_cells(side_vec: str, side_norm: str, n_keep: int, df: DataFrame) -> DataFrame:
        scored = df.crossJoin(F.broadcast(centroids)).select(
            "*",
            (
                dot(F.col(side_vec), F.col("c_vec"))
                / (F.col(side_norm) * F.col("c_norm"))
            ).alias("__csim"),
        )
        w = Window.partitionBy(df.columns[0]).orderBy(F.col("__csim").desc(), F.col("cell"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_keep)
            .drop("c_vec", "c_norm", "__csim", "__r")
        )

    c_assigned = nearest_cells("n_vec", "n_norm", 1, c)
    q_assigned = nearest_cells("q_vec", "q_norm", n_probe, q)
    joined = c_assigned.join(F.broadcast(q_assigned), "cell").filter(
        F.col("q_id") != F.col("n_id")
    )
    scored = joined.select(
        "q_id",
        "n_id",
        (dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))).alias("cos"),
    ).dropDuplicates(["q_id", "n_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            F.col("rank"),
            F.col("cos"),
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-iteration k-means over DataFrame ops — the IVF coarse-quantizer
    trainer (upgrade over the md5-sampled centroids in ivf_cosine_topk).

    Each iteration: assign every vector to its nearest centroid (broadcast
    centroids, cosine), then recompute centroids as the per-cell elementwise
    mean via posexplode + (cell, dim) aggregation — two shuffles per round,
    both map-side-combined; nothing vector-count-sized touches the driver.
    Deterministic: seeds are the k corpus vectors with smallest md5(id), and
    every aggregation is over doubles whose tie-order is fixed by (cell, pos)
    keys. Output: (cell, c_vec, c_norm) — plug into ``ivf_cosine_topk``-style
    assignment or use directly for partition pruning at query time.
    """
    c = _prep(corpus, id_col, vec_col, "n")
    centroids = _seed_centroids(c, k).localCheckpoint(eager=True)
    cent_schema = centroids.schema
    for _ in range(iters):
        # assignment stays IN-ENGINE (data-sized, never collected); the
        # per-(n_id) argmax is one partial-aggregating max_by — the exact
        # row the former sort-window picked (ties: max csim, then min
        # cell via the negated second key; cell is unique per group so
        # the order key is total).
        by_dim = _lloyd_sums(c.crossJoin(F.broadcast(centroids)), [])
        # centroid UPDATE on the driver (r15; the round-12 driver-solve
        # device): the quantized sums are (cells x dim) rows — bounded by
        # the k/dim PARAMETERS, never by corpus size — and each output
        # cell is a fixed IEEE double sequence (long->double casts, two
        # divisions, the sequential l2 fold) replicated exactly by
        # _lloyd_assemble. n_steps collect_list jobs + per-round
        # checkpoints become one tiny collect per round. Bit-equality
        # with the in-engine chain (kept below as
        # kmeans_centroids_inengine) is pinned by
        # tests/test_similarity_extra.py::test_kmeans_driver_update_matches_inengine.
        centroids = local_df(
            corpus.sparkSession,
            _lloyd_assemble(by_dim.collect(), 0),
            cent_schema,
        )
    return centroids


def _lloyd_sums(scored_src: DataFrame, group_cols: list) -> DataFrame:
    """One in-engine pass of a Lloyd round: cosine-score each (group,
    vector) against its group's broadcast centroids, keep the argmax cell
    (max csim, ties to the smallest cell), posexplode, and return the
    integer-quantized per-(group, cell, pos) component sums.

    Accumulates ``floor(x*1e12 + 0.5)`` BIGINTs (an IEEE-exact double
    expression every engine evaluates identically) rather than doubles
    (partition-order-dependent) or decimals (cross-engine 1-ulp rounding).
    """
    scored = scored_src.select(
        *group_cols,
        "n_id",
        "n_vec",
        "cell",
        (
            dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))
        ).alias("__csim"),
    )
    assigned = scored.groupBy(*group_cols, "n_id").agg(
        F.max_by(
            F.struct("cell", "n_vec"), F.struct(F.col("__csim"), -F.col("cell"))
        ).alias("__m")
    )
    return (
        assigned.select(
            *group_cols,
            F.col("__m.cell").alias("cell"),
            F.posexplode("__m.n_vec").alias("pos", "x"),
        )
        .groupBy(*group_cols, "cell", "pos")
        .agg(
            F.sum(F.floor(F.col("x") * F.lit(1e12) + F.lit(0.5)).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _lloyd_assemble(rows: list, n_group_cols: int) -> list:
    """Driver replica of the in-engine centroid assembly — per (group,
    cell): components ``s/double(n)/1e12`` in pos order (each a fixed
    IEEE double sequence: long->double cast, two divisions), then the
    sequential ``acc + x*x`` fold and sqrt of :func:`l2_norm`. Exact."""
    import math

    cells: dict = {}
    for r in rows:
        key = tuple(r[i] for i in range(n_group_cols + 1))  # groups + cell
        cells.setdefault(key, {})[r["pos"]] = float(r["s"]) / float(r["n"]) / 1e12
    out = []
    for key in sorted(cells):
        comp = cells[key]
        vec = [comp[p] for p in sorted(comp)]
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        out.append((*key, vec, math.sqrt(acc)))
    return out


def kmeans_centroids_inengine(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The original all-in-engine Lloyd chain (sort-window argmax +
    collect_list assembly + per-round checkpoints) — kept as the
    executable bit-equality witness for the r15 driver-update port."""
    c = _prep(corpus, id_col, vec_col, "n")
    centroids = _seed_centroids(c, k).localCheckpoint(eager=True)
    for _ in range(iters):
        scored = c.crossJoin(F.broadcast(centroids)).select(
            "n_id",
            "n_vec",
            "cell",
            (dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))).alias(
                "__csim"
            ),
        )
        w = Window.partitionBy("n_id").orderBy(F.col("__csim").desc(), F.col("cell"))
        assigned = scored.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") == 1)
        by_dim = (
            assigned.select("cell", F.posexplode("n_vec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(1e12) + F.lit(0.5)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        centroids = (
            by_dim.groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("s").cast("double") / F.col("n") / F.lit(1e12)).alias("m"),
                        )
                    )
                ).alias("__pm")
            )
            .select("cell", F.transform("__pm", lambda pm: pm["m"]).alias("c_vec"))
            .select("cell", "c_vec", l2_norm(F.col("c_vec")).alias("c_norm"))
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
    return centroids


def lsh_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs at scale: candidate pairs are vectors
    sharing a sign-bit LSH bucket in ANY of ``n_bands`` independent
    hyperplane sets (minhash-style banding; band b uses seed 42+b) — the
    documented swap for the blocked brute force in ``cosine_pairs``.

    ONE corpus shuffle regardless of band count: the per-band bucket ids
    posexplode into (band, bucket) rows and the self-join keys on both, so
    adding bands raises recall (a close pair misses only if it straddles a
    plane in EVERY band) at linear candidate cost, never extra shuffles.
    Duplicate candidates from multiple bands collapse via dropDuplicates on
    the pair key — value-safe since both carry identical vectors.

    The input is hash-spread on the id first: banding is CPU-heavy per row
    (n_bands x n_planes 64-dim folds) and the single-file harness parquet
    scans as ONE partition (DESIGN.md rule); on a cluster with multi-file
    tables the same repartition merely balances skew."""
    _n_parts = embeddings.sparkSession.sparkContext.defaultParallelism
    p = _prep(
        embeddings.repartition(_n_parts, F.col(id_col)), id_col, vec_col, "n"
    ).withColumn(
        "bands",
        F.array(
            *[
                lsh_bucket(F.col("n_vec"), hyperplanes(dim, n_planes, seed=42 + b))
                for b in range(n_bands)
            ]
        ),
    )
    e = p.select(
        "n_id", "n_vec", "n_norm", F.posexplode("bands").alias("band", "bucket")
    )
    a, b = e.alias("a"), e.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.n_id") < F.col("b.n_id")),
    ).select(
        F.col("a.n_id").alias("vec_a"),
        F.col("b.n_id").alias("vec_b"),
        F.col("a.n_vec").alias("va"),
        F.col("b.n_vec").alias("vb"),
        F.col("a.n_norm").alias("na"),
        F.col("b.n_norm").alias("nb"),
    ).dropDuplicates(["vec_a", "vec_b"])
    return (
        cand.select(
            "vec_a",
            "vec_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def lsh_cross_pairs(
    probes: DataFrame,
    reference: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_bands: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near matches BETWEEN two corpora (probe vs reference) — the
    cross-relation sibling of :func:`lsh_cosine_pairs`, for semantic
    decontamination: which probe (training) vectors are cosine-close to any
    reference (benchmark) vector.

    Same banded sign-LSH shape: both sides bucket under the SAME hyperplane
    sets, the join keys on (band, bucket), exact cosine verifies. The
    reference side is benchmark-sized — broadcast — so the probe corpus
    never shuffles: at 100 TB this is a map-side semi-match, one scan.
    Output: (probe_id, ref_id, cos) with cos >= threshold.
    """

    def banded(df: DataFrame, tag: str) -> DataFrame:
        # hash-spread the probe side before the per-row banding folds (the
        # single-file harness scan is ONE partition, and AQE coalesces a
        # column-only repartition of small data right back to one — the
        # explicit core count is never coalesced); the reference side is
        # benchmark-sized and broadcast, so only probes ("p") need spreading
        src = (
            df.repartition(
                df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
            )
            if tag == "p"
            else df
        )
        p = _prep(src, id_col, vec_col, tag).withColumn(
            "__bands",
            F.array(
                *[
                    lsh_bucket(F.col(f"{tag}_vec"), hyperplanes(dim, n_planes, seed=42 + b))
                    for b in range(n_bands)
                ]
            ),
        )
        return p.select(
            f"{tag}_id",
            f"{tag}_vec",
            f"{tag}_norm",
            F.posexplode("__bands").alias(f"{tag}_band", f"{tag}_bucket"),
        )

    a = banded(probes, "p")
    r = banded(reference, "r")
    cand = a.join(
        F.broadcast(r),
        (F.col("p_band") == F.col("r_band")) & (F.col("p_bucket") == F.col("r_bucket")),
    ).dropDuplicates(["p_id", "r_id"])
    return (
        cand.select(
            F.col("p_id").alias("probe_id"),
            F.col("r_id").alias("ref_id"),
            (dot(F.col("p_vec"), F.col("r_vec")) / (F.col("p_norm") * F.col("r_norm"))).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, brute force
    within blocks (use LSH buckets as blocks at scale)."""
    p = _prep(embeddings, id_col, vec_col, "n")
    if block_col:
        p = p.join(
            embeddings.select(F.col(id_col).alias("n_id"), F.col(block_col).alias("__blk")),
            "n_id",
        )
    a, b = p.alias("a"), p.alias("b")
    cond = F.col("a.n_id") < F.col("b.n_id")
    if block_col:
        cond = cond & (F.col("a.__blk") == F.col("b.__blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.n_id").alias("vec_a"),
            F.col("b.n_id").alias("vec_b"),
            (
                dot(F.col("a.n_vec"), F.col("b.n_vec"))
                / (F.col("a.n_norm") * F.col("b.n_norm"))
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 5,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of two ranked retrieval
    lists — the standard hybrid-retrieval combiner (e.g. BM25 + dense ANN in
    a RAG stack). Inputs: (query_id, neighbor_id, rank, ...) relations;
    output: (query_id, neighbor_id, rrf, fused_rank) top-k per query.

    rrf(d) = 1/(c + rank_a(d)) + 1/(c + rank_b(d)), missing-list terms
    contribute 0. The two-term sum is a FIXED expression (not an aggregate),
    so no accumulation-order hazard exists; ties break on neighbor_id.

    Scale: both inputs are already top-k-per-query relations (query-batch
    sized); the fusion is a full outer join on (query, neighbor) plus one
    per-query top-k window over <= 2k rows per query.
    """
    a = ranked_a.select("query_id", "neighbor_id", F.col("rank").alias("__ra"))
    b = ranked_b.select("query_id", "neighbor_id", F.col("rank").alias("__rb"))
    fused = a.join(b, ["query_id", "neighbor_id"], "full_outer").select(
        "query_id",
        "neighbor_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("__ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(c)) + F.col("__rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("neighbor_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select("query_id", "neighbor_id", "rrf", "fused_rank")
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 10,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein 1998):
    from each query's top-``pool`` retrieval candidates, greedily select
    ``k`` results trading relevance against redundancy —
    ``argmax lam*rel(d) - (1-lam)*max_{s in S} sim(d, s)`` — the
    diversification pass a RAG stack runs after ANN retrieval.

    The greedy loop unrolls into k DataFrame steps (exactly how the Lloyd
    trainer unrolls): every step is per-query work over <= pool candidate
    rows (query-batch sized — the corpus-scale cost is the candidate
    retrieval, not this). Ties break on neighbor_id; all sims are the
    deterministic fold cosine, so selection order is engine-exact.
    Output: (query_id, neighbor_id, pick) with pick in 1..k.
    """
    cands = cosine_topk(corpus, queries, k=pool, id_col=id_col, vec_col=vec_col)
    cv = _prep(corpus, id_col, vec_col, "n")
    # candidate pool is consumed by every greedy step (anti-join + score):
    # cut the lineage once or the retrieval re-runs per step (the
    # multi-consumer recompute pitfall)
    c = (
        cands.join(
            cv.select(
                F.col("n_id").alias("neighbor_id"),
                F.col("n_vec").alias("__v"),
                F.col("n_norm").alias("__nm"),
            ),
            "neighbor_id",
        )
        .select("query_id", "neighbor_id", "cos", "__v", "__nm")
        .localCheckpoint(eager=True)
    )

    w1 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    selected = (
        c.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") == 1)
        .select("query_id", "neighbor_id", F.lit(1).alias("pick"), "__v", "__nm")
    )
    for i in range(2, k + 1):
        rem = c.join(
            selected.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_anti"
        )
        sims = (
            rem.alias("r")
            .join(selected.alias("s"), F.col("r.query_id") == F.col("s.query_id"))
            .select(
                F.col("r.query_id").alias("query_id"),
                F.col("r.neighbor_id").alias("neighbor_id"),
                (
                    dot(F.col("r.__v"), F.col("s.__v"))
                    / (F.col("r.__nm") * F.col("s.__nm"))
                ).alias("__sim"),
            )
            .groupBy("query_id", "neighbor_id")
            .agg(F.max("__sim").alias("__maxsim"))
        )
        scored = rem.join(sims, ["query_id", "neighbor_id"]).withColumn(
            "__score",
            F.lit(lam) * F.col("cos") - F.lit(1.0 - lam) * F.col("__maxsim"),
        )
        wi = Window.partitionBy("query_id").orderBy(
            F.col("__score").desc(), F.col("neighbor_id")
        )
        pick_i = (
            scored.withColumn("__rn", F.row_number().over(wi))
            .filter(F.col("__rn") == 1)
            .select("query_id", "neighbor_id", F.lit(i).alias("pick"), "__v", "__nm")
        )
        # selected feeds three consumers next step (anti-join, sim join,
        # union) — cut per step, relations are query-batch-sized
        selected = selected.unionByName(pick_i).localCheckpoint(eager=True)
    return selected.select("query_id", "neighbor_id", "pick")


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric int8 scalar quantization (SQ8), the standard ANN memory
    diet: each vector rescales so max|x| -> 127 and components round to
    integers. Cosine over the quantized vectors needs NO dequantization —
    the per-vector scale cancels in dot/(norm*norm) — so downstream search
    is plain ``cosine_topk`` composition over vectors 4x smaller than
    float32 (and exactly engine-portable: integral values in double make
    every product/sum IEEE-exact regardless of fold order, and sqrt is the
    one exactly-rounded non-integer power).

    Values stay integral-valued DOUBLEs rather than casting to tinyint:
    the exactness argument needs only integrality, and keeping the element
    type lets every existing vector op compose unchanged. Zero vectors
    quantize to zero vectors.
    """
    v = as_double_vec(F.col(vec_col))
    mx = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.transform(
        v,
        lambda x: F.when(mx == F.lit(0.0), F.lit(0.0)).otherwise(
            F.round(x * F.lit(127.0) / mx)
        ),
    )
    return df.withColumn(vec_col, q)


def sq8_topk_oracle(n_queries: int = 8, k: int = 5) -> str:
    """DuckDB twin of ``cosine_topk`` over SQ8-quantized embeddings —
    same quantization expression, same cosine, same ranking."""
    return f"""
        WITH qv AS (
          SELECT vec_id,
                 list_transform(v, x -> CASE WHEN mx = 0 THEN 0.0
                                        ELSE round(x * 127.0 / mx) END) AS v
          FROM (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                           x -> abs(x))) AS mx
            FROM embeddings
          )
        ), qn AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM qv
        ), scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
          FROM qn a JOIN qn b ON a.vec_id < {n_queries} AND a.vec_id != b.vec_id
        )
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def jl_project(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a deterministic
    ±1 sign matrix (Achlioptas 2003: Rademacher entries preserve pairwise
    distances like Gaussian projections, at add/subtract cost). Output
    component j = sum_i sign(j,i) * x_i.

    Signs come from the md5-derived bit of (seed, j, i) — reproducible on
    any executor with no RNG state, and identically derivable in SQL.
    Composed after ``quantize_embeddings`` the inputs are integral-valued
    doubles, so every sum is IEEE-exact in ANY summation order — the
    projection is then bit-portable across engines (raw-double inputs
    would make the fold order observable).
    """
    import hashlib

    signs = []
    for j in range(out_dim):
        row = []
        # one md5 per output dim yields 128 sign bits — enough for any
        # realistic input dim; byte b, bit k -> input index 8b+k
        digest = hashlib.md5(f"jl-{seed}-{j}".encode()).digest()
        for i in range(128):
            row.append(1 if (digest[i // 8] >> (i % 8)) & 1 else -1)
        signs.append(row)
    v = as_double_vec(F.col(vec_col))
    comps = [
        F.aggregate(
            F.zip_with(
                v,
                # slice to the vector's size: zip_with pads the shorter side
                # with NULLs, which would poison the sum
                F.slice(
                    F.array(*[F.lit(float(s)) for s in signs[j][:64]]),
                    F.lit(1),
                    F.size(v),
                ),
                lambda x, sgn: x * sgn,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for j in range(out_dim)
    ]
    return df.withColumn(vec_col, F.array(*comps))


def jl_signs_sql(out_dim: int, in_dim: int, seed: int = 7) -> list[list[int]]:
    """The same deterministic sign matrix for oracle construction."""
    import hashlib

    signs = []
    for j in range(out_dim):
        digest = hashlib.md5(f"jl-{seed}-{j}".encode()).digest()
        signs.append(
            [1 if (digest[i // 8] >> (i % 8)) & 1 else -1 for i in range(in_dim)]
        )
    return signs


def jl_topk_oracle(
    out_dim: int, in_dim: int = 8, n_queries: int = 8, k: int = 5, seed: int = 7
) -> str:
    """DuckDB twin of SQ8-quantize -> JL-project -> cosine_topk."""
    signs = jl_signs_sql(out_dim, in_dim, seed)
    proj = ", ".join(
        "(" + " + ".join(f"({s}) * v[{i + 1}]" for i, s in enumerate(signs[j])) + ")"
        for j in range(out_dim)
    )
    return f"""
        WITH qv AS (
          SELECT vec_id,
                 list_transform(v, x -> CASE WHEN mx = 0 THEN 0.0
                                        ELSE round(x * 127.0 / mx) END) AS v
          FROM (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                           x -> abs(x))) AS mx
            FROM embeddings
          )
        ), pv AS (
          SELECT vec_id, [{proj}] AS v FROM qv
        ), pn AS (
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM pv
        ), scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
          FROM pn a JOIN pn b ON a.vec_id < {n_queries} AND a.vec_id != b.vec_id
        )
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM scored
        ) WHERE rank <= {k}
    """


def retrieval_eval(
    retrieved: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Offline retrieval-quality evaluation: per-query recall@k,
    precision@k, and reciprocal rank of ``retrieved`` against a ``truth``
    relevance set — the metric harness every ANN index (LSH/IVF/SQ8/JL
    here) is tuned with before a corpus-wide rollout.

    ``truth`` rows are the relevant (query, doc) pairs (e.g. the exact
    retriever's top-k); ``retrieved`` needs a rank column. Metrics:
    ``recall_at_k`` = hits / |truth(q)|, ``precision_at_k`` = hits / k,
    ``rr`` = 1 / rank of the first hit (0.0 when none). All three are one
    exact-integer division each — IEEE exact-rounded, so cross-engine
    hash-stable (no accumulated float sums).

    Scale: one equi-join on (query, doc) — rank-bounded, so both sides are
    queries×k rows regardless of corpus size — plus two query-grain
    aggregations. Queries with an empty truth set are absent by definition.
    """
    hits = retrieved.filter(F.col(rank_col) <= k).join(
        truth.select(query_col, doc_col), [query_col, doc_col]
    )
    rel = truth.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))
    per = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("__n_hits"), F.min(rank_col).alias("__first")
    )
    n_hits = F.coalesce(F.col("__n_hits"), F.lit(0)).alias("n_hits")
    return rel.join(per, query_col, "left").select(
        query_col,
        F.col("n_rel"),
        n_hits,
        (F.coalesce(F.col("__n_hits"), F.lit(0)).cast("double") / F.col("n_rel")).alias(
            "recall_at_k"
        ),
        (F.coalesce(F.col("__n_hits"), F.lit(0)).cast("double") / F.lit(k)).alias(
            "precision_at_k"
        ),
        F.col("__first").alias("first_hit_rank"),
        F.when(F.col("__first").isNotNull(), F.lit(1.0) / F.col("__first"))
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )


def pair_set_eval(
    got: DataFrame,
    truth: DataFrame,
    a_col: str = "vec_a",
    b_col: str = "vec_b",
) -> DataFrame:
    """Set-level precision/recall/F1 of a candidate near-duplicate PAIR set
    against a ground-truth pair set — the honesty meter for every banded
    LSH configuration (the repo's measured recall curves in PERF.md are
    exactly this computation). One output row:
    ``(n_got, n_truth, n_common, precision, recall, f1)``.

    Each metric is a single exact-integer division (``f1`` uses the
    identity 2·common/(got+truth) — one division, no p·r composition), so
    the row is cross-engine hash-stable.

    Scale: one equi-join on the pair key plus three count aggregates —
    pair-set sized, nothing corpus sized; the three 1-row relations
    broadcast-cross-join into the output row.
    """
    common = got.select(a_col, b_col).join(truth.select(a_col, b_col), [a_col, b_col])
    ng = got.agg(F.count(F.lit(1)).alias("n_got"))
    nt = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    nc = common.agg(F.count(F.lit(1)).alias("n_common"))
    return (
        ng.crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_got",
            "n_truth",
            "n_common",
            (F.col("n_common").cast("double") / F.col("n_got")).alias("precision"),
            (F.col("n_common").cast("double") / F.col("n_truth")).alias("recall"),
            (
                (F.lit(2) * F.col("n_common")).cast("double")
                / (F.col("n_got") + F.col("n_truth"))
            ).alias("f1"),
        )
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Product-quantization codebook trainer (Jégou et al. 2011): split
    the vector into ``m`` contiguous subspaces and run the SAME Lloyd
    trainer (:func:`kmeans_centroids`) independently per slice. Output:
    ``(sub, cell, c_vec, c_norm)`` — m × k_sub codewords whose code pairs
    compress a vector to m small integers (the 4-16-byte-per-vector
    memory regime IVF-PQ indexes live in at billion scale).

    Scale: m independent kmeans runs over SLICED projections of one scan —
    each subspace's shuffle carries 1/m of the components; nothing new
    beyond the trainer's own posture. Pass ``dim`` when the caller knows
    it (r15): the discovery probe is a full job on a derived input.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    # FUSED grouped Lloyd: all m subspaces train inside ONE iteration chain
    # keyed by (sub, cell) — identical per-subspace math to m independent
    # kmeans_centroids runs (same md5-seeds, same cosine assignment, same
    # integer-quantized mean accumulation) at 1/m the job count. The sliced
    # relation is checkpointed ONCE so derived inputs (e.g. the residual
    # join in ivfpq_residual_topk) are not recomputed every iteration.
    sl = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(as_double_vec(F.col(vec_col)), s * d_sub + 1, d_sub).alias("x"),
            )
            for s in range(m)
        ])
    )
    sliced = (
        corpus.select(F.col(id_col).alias("n_id"), sl.alias("__s"))
        .select(
            F.col("__s.sub").alias("sub"),
            "n_id",
            F.col("__s.x").alias("n_vec"),
            l2_norm(F.col("__s.x")).alias("n_norm"),
        )
        .localCheckpoint(eager=True)
    )
    # seed ids are shared across subspaces (k_sub smallest md5(id), numbered
    # by hash order — the _seed_centroids rule); seed VECTORS are per-sub
    # slices picked up by one broadcast join.
    seed_ids = (
        corpus.select(F.col(id_col).cast("string").alias("n_id"))
        .withColumn("__h", F.md5(F.col("n_id")))
        .orderBy("__h")
        .limit(k_sub)
        .agg(F.array_sort(F.collect_list(F.struct("__h", "n_id"))).alias("__a"))
        .select(F.posexplode("__a").alias("__pos", "__s"))
        .select((F.col("__pos") + 1).alias("cell"), F.col("__s.n_id").alias("n_id"))
    )
    centroids = (
        sliced.withColumn("n_id", F.col("n_id").cast("string"))
        .join(F.broadcast(seed_ids), "n_id")
        .select(
            "sub", "cell", F.col("n_vec").alias("c_vec"), F.col("n_norm").alias("c_norm")
        )
        .localCheckpoint(eager=True)
    )
    cent_schema = centroids.schema
    for _ in range(iters):
        # same r15 driver-update port as kmeans_centroids: the assignment
        # and quantized component sums stay in-engine; the (m x k_sub x
        # d_sub)-row update — bounded by parameters, never corpus size —
        # assembles on the driver with the exact IEEE sequence
        # (_lloyd_assemble; witness kept as pq_codebooks_inengine, pinned
        # by tests/test_similarity_extra.py)
        by_dim = _lloyd_sums(sliced.join(F.broadcast(centroids), "sub"), ["sub"])
        centroids = local_df(
            corpus.sparkSession,
            _lloyd_assemble(by_dim.collect(), 1),
            cent_schema,
        )
    return centroids


def pq_codebooks_inengine(
    corpus: DataFrame,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The original all-in-engine grouped-Lloyd PQ trainer — kept as the
    executable bit-equality witness for the r15 driver-update port."""
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    sl = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(as_double_vec(F.col(vec_col)), s * d_sub + 1, d_sub).alias("x"),
            )
            for s in range(m)
        ])
    )
    sliced = (
        corpus.select(F.col(id_col).alias("n_id"), sl.alias("__s"))
        .select(
            F.col("__s.sub").alias("sub"),
            "n_id",
            F.col("__s.x").alias("n_vec"),
            l2_norm(F.col("__s.x")).alias("n_norm"),
        )
        .localCheckpoint(eager=True)
    )
    seed_ids = (
        corpus.select(F.col(id_col).cast("string").alias("n_id"))
        .withColumn("__h", F.md5(F.col("n_id")))
        .orderBy("__h")
        .limit(k_sub)
        .agg(F.array_sort(F.collect_list(F.struct("__h", "n_id"))).alias("__a"))
        .select(F.posexplode("__a").alias("__pos", "__s"))
        .select((F.col("__pos") + 1).alias("cell"), F.col("__s.n_id").alias("n_id"))
    )
    centroids = (
        sliced.withColumn("n_id", F.col("n_id").cast("string"))
        .join(F.broadcast(seed_ids), "n_id")
        .select(
            "sub", "cell", F.col("n_vec").alias("c_vec"), F.col("n_norm").alias("c_norm")
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        scored = sliced.join(F.broadcast(centroids), "sub").select(
            "sub",
            "n_id",
            "n_vec",
            "cell",
            (dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))).alias(
                "__csim"
            ),
        )
        w = Window.partitionBy("sub", "n_id").orderBy(F.col("__csim").desc(), F.col("cell"))
        assigned = scored.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") == 1)
        by_dim = (
            assigned.select("sub", "cell", F.posexplode("n_vec").alias("pos", "x"))
            .groupBy("sub", "cell", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(1e12) + F.lit(0.5)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        centroids = (
            by_dim.groupBy("sub", "cell")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "pos",
                            (F.col("s").cast("double") / F.col("n") / F.lit(1e12)).alias("m"),
                        )
                    )
                ).alias("__pm")
            )
            .select("sub", "cell", F.transform("__pm", lambda pm: pm["m"]).alias("c_vec"))
            .select("sub", "cell", "c_vec", l2_norm(F.col("c_vec")).alias("c_norm"))
            .localCheckpoint(eager=True)
        )
    return centroids


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """PQ encoder: per subspace, assign each vector's slice to its nearest
    codeword (cosine, ties by cell — the trainer's own assignment rule).
    Output: ``(id, sub, code)`` — m rows per vector, the compressed
    representation a search joins against.

    Scale: one broadcast of the (m·k_sub)-row codebook against the sliced
    corpus projection; the per-(vector, sub) argmax is a WindowGroupLimit
    top-1, never a global sort. Pass ``m``/``dim`` when known (r15): the
    discovery probes are full jobs on derived inputs.
    """
    if m is None:
        m = codebooks.agg(F.max("sub")).first()[0] + 1
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    d_sub = dim // m
    sl = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("x"),
            )
            for s in range(m)
        ])
    )
    sliced = corpus.select(F.col(id_col).alias("id"), sl.alias("__s")).select(
        "id", "__s.sub", "__s.x", l2_norm(F.col("__s.x")).alias("__xn")
    )
    scored = sliced.join(F.broadcast(codebooks), "sub").select(
        "id",
        "sub",
        "cell",
        (dot(F.col("x"), F.col("c_vec")) / (F.col("__xn") * F.col("c_norm"))).alias("__sim"),
    )
    w = Window.partitionBy("id", "sub").orderBy(F.col("__sim").desc(), F.col("cell"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(F.col("id").alias(id_col), "sub", F.col("cell").alias("code"))
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    m: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """PQ asymmetric-distance search (ADC): the query stays EXACT; each
    corpus vector is scored from its codes through a per-(query, sub,
    code) lookup table of partial inner products — the memory-bound
    billion-scale ANN pattern (corpus vectors never touched at query
    time, only m small codes each).

    Portability: each LUT entry is quantized to integer micros
    (floor(dot·1e12 + 0.5), IEEE-exact), so the per-vector score is a
    BIGINT sum — immune to float summation order across engines — and
    ranking (score desc, id) is exact. Output: ``(query_id, neighbor_id,
    rank, adc_micro)`` — inner-product ADC ranking.

    Scale: LUT = |queries|·m·k_sub rows (broadcast); ONE equi-join on
    (sub, code) against the codes relation and a per-(query, vector) sum;
    the corpus appears only as its m-codes-per-vector table.
    """
    if m is None:
        m = codebooks.agg(F.max("sub")).first()[0] + 1
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    d_sub = dim // m
    sl = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("q"),
            )
            for s in range(m)
        ])
    )
    qs = queries.select(F.col(id_col).alias("query_id"), sl.alias("__s")).select(
        "query_id", "__s.sub", "__s.q"
    )
    lut = qs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("cell").alias("code"),
        F.floor(dot(F.col("q"), F.col("c_vec")) * F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("__d"),
    )
    pairs = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if candidates is not None:
        # IVF restriction: only (query, vector) pairs whose vector lives in
        # one of the query's probed cells get scored (candidate-list sized)
        pairs = pairs.join(
            candidates.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"],
            "left_semi",
        )
    scored = pairs.groupBy("query_id", "neighbor_id").agg(
        F.sum("__d").alias("adc_micro")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_micro").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_micro")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full IVF-PQ index: a Lloyd-trained COARSE quantizer partitions
    the corpus into cells; queries probe their ``n_probe`` nearest cells;
    only the resident vectors' PQ codes are ADC-scored — the two-level
    billion-scale ANN architecture (coarse pruning bounds candidates,
    codes bound memory). Output: (query_id, neighbor_id, rank, adc_micro).

    Composition: :func:`kmeans_centroids` (full-dim cells) +
    :func:`pq_codebooks`/:func:`pq_encode` + the candidate-restricted
    :func:`pq_topk`. Everything centroid/codebook-sized broadcasts; the
    scoring join is candidate-list sized, never corpus × queries.
    """
    dim = len(corpus.select(vec_col).first()[0])  # once for the whole index
    cents = kmeans_centroids(corpus, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    cents = cents.localCheckpoint()
    c = _prep(corpus, id_col, vec_col, "n")
    assigned = c.crossJoin(F.broadcast(cents)).select(
        F.col("n_id").alias("neighbor_id"),
        "cell",
        (dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))).alias("__s"),
    )
    w = Window.partitionBy("neighbor_id").orderBy(F.col("__s").desc(), F.col("cell"))
    vec_cell = (
        assigned.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "cell")
    )
    q = _prep(queries, id_col, vec_col, "q")
    qs = q.crossJoin(F.broadcast(cents)).select(
        F.col("q_id").alias("query_id"),
        "cell",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("__s"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__s").desc(), F.col("cell"))
    probe = (
        qs.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "cell")
    )
    cand = probe.join(vec_cell, "cell").select("query_id", "neighbor_id")
    cb = pq_codebooks(
        corpus, m=m, k_sub=k_sub, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    cb = cb.localCheckpoint()
    codes = pq_encode(corpus, cb, id_col=id_col, vec_col=vec_col, m=m, dim=dim)
    return pq_topk(
        codes, cb, queries, k=k, id_col=id_col, vec_col=vec_col, candidates=cand,
        m=m, dim=dim,
    )


def _pq_lut(queries, codebooks, m, d_sub, id_col, vec_col):
    """Per-(query, sub, code) integer-micro partial inner products — the
    ADC lookup table shared by pq_topk and the residual IVF-PQ scorer."""
    sl = F.explode(
        F.array(*[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("q"),
            )
            for s in range(m)
        ])
    )
    qs = queries.select(F.col(id_col).alias("query_id"), sl.alias("__s")).select(
        "query_id", "__s.sub", "__s.q"
    )
    return qs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("cell").alias("code"),
        F.floor(dot(F.col("q"), F.col("c_vec")) * F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("__d"),
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CLASSIC residual IVF-PQ: the PQ codebooks quantize each vector's
    RESIDUAL from its coarse centroid (Jégou et al. 2011's actual design)
    — residual magnitudes are much smaller than raw vectors, so the same
    m×k_sub code budget buys tighter reconstructions. The inner product
    decomposes exactly:

        dot(q, x) = dot(q, c_cell(x)) + dot(q, r_x)
                  ≈ base(q, cell)    + Σ_sub LUT(q, sub, code_sub(r_x))

    so scoring stays a BIGINT sum: the per-(query, probed-cell) base term
    and the residual-codeword LUT entries are each one integer-micro
    quantization. Output: (query_id, neighbor_id, rank, adc_micro).

    Same plan skeleton as :func:`ivfpq_topk`; the residual subtraction is
    one broadcast join + ``zip_with`` (component arithmetic, exact in any
    engine).
    """
    # dim probed ONCE on the raw corpus (r15): the residual relation is a
    # join chain, so probing it would compute the whole chain per probe
    dim = len(corpus.select(vec_col).first()[0])
    cents = kmeans_centroids(corpus, k=n_cells, iters=iters, id_col=id_col, vec_col=vec_col)
    cents = cents.localCheckpoint()
    c = _prep(corpus, id_col, vec_col, "n")
    assigned = c.crossJoin(F.broadcast(cents)).select(
        F.col("n_id").alias("neighbor_id"),
        "cell",
        (dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))).alias("__s"),
    )
    w = Window.partitionBy("neighbor_id").orderBy(F.col("__s").desc(), F.col("cell"))
    vec_cell = (
        assigned.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("neighbor_id", "cell")
        .localCheckpoint()
    )
    res = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v"))
        .join(vec_cell, "neighbor_id")
        .join(F.broadcast(cents.select("cell", "c_vec")), "cell")
        .select(
            F.col("neighbor_id").alias(id_col),
            F.zip_with("__v", "c_vec", lambda a, b: a - b).alias(vec_col),
        )
    )
    cb = pq_codebooks(
        res, m=m, k_sub=k_sub, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim
    )
    cb = cb.localCheckpoint()
    codes = pq_encode(res, cb, id_col=id_col, vec_col=vec_col, m=m, dim=dim)
    q = _prep(queries, id_col, vec_col, "q")
    qs = q.crossJoin(F.broadcast(cents)).select(
        F.col("q_id").alias("query_id"),
        "cell",
        F.col("q_vec"),
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_norm") * F.col("c_norm"))).alias("__s"),
        F.floor(dot(F.col("q_vec"), F.col("c_vec")) * F.lit(1e12) + F.lit(0.5))
        .cast("long")
        .alias("__b"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__s").desc(), F.col("cell"))
    probe = (
        qs.withColumn("__r", F.row_number().over(wq))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "cell", "__b")
        .localCheckpoint()
    )
    cand = probe.join(vec_cell, "cell").select("query_id", "neighbor_id")
    lut = _pq_lut(queries, cb, m, dim // m, id_col, vec_col)
    summed = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(cand.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("__d").alias("__sum"))
    )
    scored = (
        summed.join(vec_cell, "neighbor_id")
        .join(F.broadcast(probe), ["query_id", "cell"])
        .select(
            "query_id",
            "neighbor_id",
            (F.col("__b") + F.col("__sum")).alias("adc_micro"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("adc_micro").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_micro")
    )


def pca_power(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 16,
    solver: str = "driver",
) -> DataFrame:
    """Top principal component of the embedding matrix by distributed
    POWER ITERATION — the eigen-solver expressed entirely as joins and
    aggregations: the covariance matrix is one dim²-bounded aggregation
    of the data (the classic "normal matrix" shuffle), and each iteration
    is a (dim² cells) × (dim vector) join — data-sized work happens ONCE;
    the loop touches only model-sized relations.

    Engine portability: every sum of float products quantizes each
    product to 1e12-scaled BIGINT first (Σ floor(x·y·1e12 + 0.5) — the
    DESIGN.md rule; raw double sums are order-dependent), covariance and
    iteration vectors are then FIXED sequences of exactly-rounded double
    ops, and each round rescales by max|w| (comparison + one division)
    instead of an L2 norm so no sqrt enters the loop. The single sqrt
    (final normalization) is IEEE exact-rounded.

    Output: ``(i, loading, eigenvalue)`` — one row per dimension of the
    unit top eigenvector, eigenvalue via the Rayleigh quotient.

    ``solver``: ``"driver"`` (default) collects the dim²-bounded cell
    relation ONCE and runs the iteration as exact driver math — the
    same integer-quantized sums (order-independent) and the same fixed
    sequence of IEEE double ops, so the output is BIT-IDENTICAL to the
    ``"distributed"`` join-based loop (pinned by
    tests/test_similarity.py; the documented model-sized-collect
    exception — dim² ≤ 4096 rows, vs 16 Spark jobs per component for
    the distributed loop). The data-sized covariance shuffle stays
    distributed in both.
    """
    cells, dim = _cov_cells(embeddings, id_col, vec_col)
    spark = embeddings.sparkSession
    if solver == "driver":
        cm = _collect_cells(cells)
        rows = _power_top_rows(cm, dim, n_iter)
        return local_df(spark, rows, "i long, loading double, eigenvalue double")
    return _power_top(spark, cells, dim, n_iter).select("i", "loading", "eigenvalue")


def _cov_cells(
    embeddings: DataFrame, id_col: str, vec_col: str
) -> tuple[DataFrame, int]:
    """The (ci, cj, c) covariance cell relation (quantized-product sums)
    plus the dimensionality — the one data-sized pass of the PCA family."""
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    xi = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("id", "i", F.col("x").cast("double").alias("x"))
    dim = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    n = xi.select("id").distinct().count()

    g = (
        xi.select("id", F.col("i").alias("gi"), F.col("x").alias("xa"))
        .join(
            xi.select("id", F.col("i").alias("gj"), F.col("x").alias("xb")), "id"
        )
        .groupBy("gi", "gj")
        .agg(F.sum(q12(F.col("xa") * F.col("xb"))).alias("gq"))
    )
    s = xi.groupBy(F.col("i").alias("si")).agg(
        F.sum(F.floor(F.col("x") * F.lit(1e6) + F.lit(0.5)).cast("bigint")).alias("sq")
    )
    nd = float(n)
    cells = (
        g.join(s.select(F.col("si").alias("gi"), F.col("sq").alias("sqi")), "gi")
        .join(s.select(F.col("si").alias("gj"), F.col("sq").alias("sqj")), "gj")
        .select(
            F.col("gi").alias("ci"),
            F.col("gj").alias("cj"),
            (
                F.col("gq").cast("double") / F.lit(nd) / F.lit(1e12)
                - (F.col("sqi").cast("double") / F.lit(nd) / F.lit(1e6))
                * (F.col("sqj").cast("double") / F.lit(nd) / F.lit(1e6))
            ).alias("c"),
        )
        .localCheckpoint()
    )
    return cells, dim


def _collect_cells(cells: DataFrame) -> dict[tuple[int, int], float]:
    """Collect the (ci, cj, c) cell relation to the driver — dim²-bounded
    (≤ 4096 rows at dim 64), the documented model-sized-collect
    exception (BPE / Shapley precedent)."""
    return {(int(r["ci"]), int(r["cj"])): float(r["c"]) for r in cells.collect()}


def _q12(x: float) -> int:
    """floor(x·1e12 + 0.5) — the exact Python mirror of the Spark/DuckDB
    quantization (IEEE multiply, exact floor; true floor for negatives,
    matching F.floor)."""
    import math

    return math.floor(x * 1e12 + 0.5)


def _power_top_rows(
    cm: dict[tuple[int, int], float], dim: int, n_iter: int
) -> list[tuple[int, float, float]]:
    """Driver-math power iteration over collected covariance cells —
    arithmetic-identical to :func:`_power_top`: per-term 1e12 integer
    quantization (sums order-independent), max-|w| rescale, Rayleigh
    quotient; Python doubles ARE IEEE doubles and the op sequence is the
    same, so outputs are bit-identical (pinned by test)."""
    import math

    v = [1.0] * dim

    def w_of(v: list[float]) -> list[float]:
        wq = [0] * dim
        for (ci, cj), c in cm.items():
            wq[ci] += _q12(c * v[cj])
        return [q / 1e12 for q in wq]

    for _ in range(n_iter):
        w = w_of(v)
        m = max(abs(x) for x in w)
        if m == 0.0:
            # zero covariance / rank-deficient after deflation: the
            # distributed solver degenerates rather than throwing — mirror
            # the den <= 0 path instead of dividing by zero.
            return []
        v = [x / m for x in w]
    w = w_of(v)
    num = sum(_q12(v[i] * w[i]) for i in range(dim))
    den = sum(_q12(v[i] * v[i]) for i in range(dim))
    if den <= 0:
        return []
    nrm = math.sqrt(den / 1e12)
    return [(i, v[i] / nrm, num / den) for i in range(dim)]


def _power_top(spark, cells: DataFrame, dim: int, n_iter: int) -> DataFrame:
    """One power-iteration solve over a (ci, cj, c) cell relation; returns
    ``(i, loading, eigenvalue)`` — loading unit-normalized. Shared by the
    single-component and deflation paths (identical arithmetic)."""
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    v = local_df(spark, [(i, 1.0) for i in range(dim)], "vi long, v double")
    for _ in range(n_iter):
        w = (
            cells.join(v.select(F.col("vi").alias("cj"), "v"), "cj")
            .groupBy(F.col("ci").alias("wi"))
            .agg(F.sum(q12(F.col("c") * F.col("v"))).alias("wq"))
            .select("wi", (F.col("wq").cast("double") / F.lit(1e12)).alias("w"))
        )
        m = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.crossJoin(F.broadcast(m))
            .select(F.col("wi").alias("vi"), (F.col("w") / F.col("m")).alias("v"))
            .localCheckpoint()
        )
    w = (
        cells.join(v.select(F.col("vi").alias("cj"), "v"), "cj")
        .groupBy(F.col("ci").alias("wi"))
        .agg(F.sum(q12(F.col("c") * F.col("v"))).alias("wq"))
        .select("wi", (F.col("wq").cast("double") / F.lit(1e12)).alias("w"))
    )
    vw = v.join(w.select(F.col("wi").alias("vi"), "w"), "vi")
    rq = vw.agg(
        F.sum(q12(F.col("v") * F.col("w"))).alias("num"),
        F.sum(q12(F.col("v") * F.col("v"))).alias("den"),
    )
    return (
        v.crossJoin(F.broadcast(rq))
        # rank-deficient residual (vector collapsed to 0) would divide by
        # zero — drop instead of emitting engine-divergent NaN/inf rows
        .filter(F.col("den") > 0)
        .select(
            F.col("vi").alias("i"),
            (
                F.col("v")
                / F.sqrt(F.col("den").cast("double") / F.lit(1e12))
            ).alias("loading"),
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "eigenvalue"
            ),
        )
    )


def pca_components(
    embeddings: DataFrame,
    n_components: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_iter: int = 16,
    solver: str = "driver",
) -> DataFrame:
    """Top-k principal components by power iteration + Hotelling
    DEFLATION: after extracting (λ, u), the covariance cells update to
    ``c - λ·u_i·u_j`` (a model-sized join — no second data pass) and the
    same solver runs again. The data-sized covariance shuffle still
    happens exactly once regardless of k.

    Output: ``(component, i, loading, eigenvalue)`` — components ordered
    by extraction (descending eigenvalue).

    ``solver="driver"`` (default): the dim²-bounded cells collect once
    and the k × n_iter solve + deflation run as exact driver math,
    bit-identical to the distributed join loop (see :func:`pca_power`;
    pinned by tests/test_similarity.py). Cuts the solve from
    ~k·n_iter Spark jobs to zero — the sweep's former single-row wall.
    """
    spark = embeddings.sparkSession
    cells, dim = _cov_cells(embeddings, id_col, vec_col)
    if solver == "driver":
        cm = _collect_cells(cells)
        out_rows: list[tuple[int, int, float, float]] = []
        for comp in range(n_components):
            rows = _power_top_rows(cm, dim, n_iter)
            out_rows.extend((comp, i, lo, ev) for i, lo, ev in rows)
            if comp < n_components - 1:
                if not rows:
                    cm = {}
                else:
                    u = {i: lo for i, lo, _ in rows}
                    ev = rows[0][2]
                    # mirror the Spark deflation exactly: the join drops
                    # cells whose ci/cj fell out of a rank-deficient top
                    cm = {
                        (ci, cj): c - ev * u[ci] * u[cj]
                        for (ci, cj), c in cm.items()
                        if ci in u and cj in u
                    }
        return local_df(spark, out_rows, "component long, i long, loading double, eigenvalue double")
    outs = []
    for comp in range(n_components):
        top = _power_top(spark, cells, dim, n_iter).localCheckpoint()
        outs.append(top.select(F.lit(comp).alias("component"), "i", "loading", "eigenvalue"))
        if comp < n_components - 1:
            cells = (
                cells.join(
                    top.select(F.col("i").alias("ci"), F.col("loading").alias("ua"),
                               F.col("eigenvalue").alias("ev")),
                    "ci",
                )
                .join(top.select(F.col("i").alias("cj"), F.col("loading").alias("ub")), "cj")
                .select(
                    "ci", "cj",
                    (F.col("c") - F.col("ev") * F.col("ua") * F.col("ub")).alias("c"),
                )
                .localCheckpoint()
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def pca_power_oracle(n_iter: int = 16) -> str:
    """DuckDB twin of :func:`pca_power` — the iteration unrolled as
    MATERIALIZED CTEs (embeddings table)."""
    parts = [
        """xi AS MATERIALIZED (
          SELECT vec_id AS id, i - 1 AS i, CAST(e AS DOUBLE) AS x FROM (
            SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
          )
        )""",
        "nn AS (SELECT CAST(COUNT(DISTINCT id) AS DOUBLE) AS nd FROM xi)",
        """g AS MATERIALIZED (
          SELECT a.i AS gi, b.i AS gj,
                 CAST(SUM(CAST(floor(a.x * b.x * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS gq
          FROM xi a JOIN xi b USING (id) GROUP BY a.i, b.i
        )""",
        """s AS MATERIALIZED (
          SELECT i AS si,
                 CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
          FROM xi GROUP BY i
        )""",
        """cells AS MATERIALIZED (
          SELECT g.gi AS ci, g.gj AS cj,
                 CAST(gq AS DOUBLE) / nd / 1e12
                 - (CAST(si.sq AS DOUBLE) / nd / 1e6)
                   * (CAST(sj.sq AS DOUBLE) / nd / 1e6) AS c
          FROM g
          JOIN s si ON si.si = g.gi
          JOIN s sj ON sj.si = g.gj
          CROSS JOIN nn
        )""",
        "v0 AS MATERIALIZED (SELECT DISTINCT ci AS vi, 1.0 AS v FROM cells)",
    ]
    for t in range(n_iter):
        parts.append(
            f"""w{t} AS MATERIALIZED (
              SELECT ci AS wi,
                     CAST(CAST(SUM(CAST(floor(c * v * 1e12 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e12 AS DOUBLE) AS w
              FROM cells JOIN v{t} ON cells.cj = v{t}.vi GROUP BY ci
            ), m{t} AS (SELECT MAX(abs(w)) AS m FROM w{t}),
            v{t + 1} AS MATERIALIZED (
              SELECT wi AS vi, w / m AS v FROM w{t} CROSS JOIN m{t}
            )"""
        )
    t = n_iter
    parts.append(
        f"""wf AS MATERIALIZED (
          SELECT ci AS wi,
                 CAST(CAST(SUM(CAST(floor(c * v * 1e12 + 0.5) AS BIGINT))
                      AS DOUBLE) / 1e12 AS DOUBLE) AS w
          FROM cells JOIN v{t} ON cells.cj = v{t}.vi GROUP BY ci
        ), rq AS (
          SELECT CAST(SUM(CAST(floor(v * w * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS num,
                 CAST(SUM(CAST(floor(v * v * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS den
          FROM v{t} JOIN wf ON v{t}.vi = wf.wi
        )"""
    )
    return f"""
        WITH {", ".join(parts)}
        SELECT vi AS i,
               v / sqrt(CAST(den AS DOUBLE) / 1e12) AS loading,
               CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS eigenvalue
        FROM v{t} CROSS JOIN rq WHERE den > 0
    """


def pca_components_oracle(n_components: int = 3, n_iter: int = 16) -> str:
    """DuckDB twin of :func:`pca_components` — the full deflation loop
    unrolled (k components x n_iter rounds of MATERIALIZED CTEs)."""
    parts, finals = _pca_components_parts(n_components, n_iter)
    return f"""
        WITH {", ".join(parts)}
        {" UNION ALL ".join(finals)}
    """


def _pca_components_parts(
    n_components: int, n_iter: int
) -> tuple[list[str], list[str]]:
    """The shared CTE list + per-component final SELECTs of the deflation
    oracle (reused by :func:`pca_topk_oracle`)."""
    parts = [
        """xi AS MATERIALIZED (
          SELECT vec_id AS id, i - 1 AS i, CAST(e AS DOUBLE) AS x FROM (
            SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
          )
        )""",
        "nn AS (SELECT CAST(COUNT(DISTINCT id) AS DOUBLE) AS nd FROM xi)",
        """g AS MATERIALIZED (
          SELECT a.i AS gi, b.i AS gj,
                 CAST(SUM(CAST(floor(a.x * b.x * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                   AS gq
          FROM xi a JOIN xi b USING (id) GROUP BY a.i, b.i
        )""",
        """s AS MATERIALIZED (
          SELECT i AS si,
                 CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
          FROM xi GROUP BY i
        )""",
        """cells_0 AS MATERIALIZED (
          SELECT g.gi AS ci, g.gj AS cj,
                 CAST(gq AS DOUBLE) / nd / 1e12
                 - (CAST(si.sq AS DOUBLE) / nd / 1e6)
                   * (CAST(sj.sq AS DOUBLE) / nd / 1e6) AS c
          FROM g
          JOIN s si ON si.si = g.gi
          JOIN s sj ON sj.si = g.gj
          CROSS JOIN nn
        )""",
    ]
    finals = []
    for comp in range(n_components):
        cells = f"cells_{comp}"
        parts.append(
            f"v_{comp}_0 AS MATERIALIZED "
            f"(SELECT DISTINCT ci AS vi, 1.0 AS v FROM cells_0)"
        )
        for t in range(n_iter):
            parts.append(
                f"""w_{comp}_{t} AS MATERIALIZED (
                  SELECT ci AS wi,
                         CAST(CAST(SUM(CAST(floor(c * v * 1e12 + 0.5) AS BIGINT))
                              AS DOUBLE) / 1e12 AS DOUBLE) AS w
                  FROM {cells} JOIN v_{comp}_{t} ON {cells}.cj = v_{comp}_{t}.vi
                  GROUP BY ci
                ), m_{comp}_{t} AS (SELECT MAX(abs(w)) AS m FROM w_{comp}_{t}),
                v_{comp}_{t + 1} AS MATERIALIZED (
                  SELECT wi AS vi, w / m AS v
                  FROM w_{comp}_{t} CROSS JOIN m_{comp}_{t}
                )"""
            )
        t = n_iter
        parts.append(
            f"""wf_{comp} AS MATERIALIZED (
              SELECT ci AS wi,
                     CAST(CAST(SUM(CAST(floor(c * v * 1e12 + 0.5) AS BIGINT))
                          AS DOUBLE) / 1e12 AS DOUBLE) AS w
              FROM {cells} JOIN v_{comp}_{t} ON {cells}.cj = v_{comp}_{t}.vi
              GROUP BY ci
            ), rq_{comp} AS (
              SELECT CAST(SUM(CAST(floor(v * w * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                       AS num,
                     CAST(SUM(CAST(floor(v * v * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
                       AS den
              FROM v_{comp}_{t} JOIN wf_{comp} ON v_{comp}_{t}.vi = wf_{comp}.wi
            ), top_{comp} AS MATERIALIZED (
              SELECT vi AS i,
                     v / sqrt(CAST(den AS DOUBLE) / 1e12) AS loading,
                     CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS eigenvalue
              FROM v_{comp}_{t} CROSS JOIN rq_{comp} WHERE den > 0
            )"""
        )
        finals.append(
            f"SELECT {comp} AS component, i, loading, eigenvalue FROM top_{comp}"
        )
        if comp < n_components - 1:
            parts.append(
                f"""cells_{comp + 1} AS MATERIALIZED (
                  SELECT c.ci, c.cj,
                         c.c - ua.eigenvalue * ua.loading * ub.loading AS c
                  FROM {cells} c
                  JOIN top_{comp} ua ON ua.i = c.ci
                  JOIN top_{comp} ub ON ub.i = c.cj
                )"""
            )
    return parts, finals


def pca_topk(
    embeddings: DataFrame,
    n_components: int = 3,
    shortlist: int = 32,
    k: int = 5,
    n_iter: int = 16,
    n_queries: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    components: DataFrame | None = None,
) -> DataFrame:
    """ANN via PCA dimensionality reduction: project every vector onto
    the top ``n_components`` principal directions (the basis
    :func:`pca_components` learns in one data pass), score candidates in
    the tiny reduced space, shortlist the top ``shortlist`` per query,
    and EXACT-rerank only the shortlist in full dimension — the classical
    optimal-linear-sketch sibling of ``jl_topk`` (random projection):
    same two-stage shape, but the projection is data-optimal.

    Portability: projections are quantized-product sums (BIGINT,
    1e12-scaled) over the bit-exact deflation loadings; reduced-space
    scores quantize each product term the same way; the final cosine is
    the shared sequential-fold expression every exact ANN row uses, so
    rerank scores are bit-identical to ``cosine_topk`` on the same pairs.

    Output: ``(query_id, neighbor_id, rank, cos)``.
    """
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    # `components` lets callers share one basis solve (the registry memo)
    comps = (
        components
        if components is not None
        else pca_components(
            embeddings, n_components=n_components, n_iter=n_iter
        ).localCheckpoint()
    )
    xi = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("id", "i", F.col("x").cast("double").alias("x"))
    proj = (
        xi.join(F.broadcast(comps.select("component", "i", "loading")), "i")
        .groupBy("id", "component")
        .agg(F.sum(q12(F.col("x") * F.col("loading"))).alias("pq"))
        .select(
            "id", "component", (F.col("pq").cast("double") / F.lit(1e12)).alias("p")
        )
        .localCheckpoint()
    )
    qp = proj.filter(F.col("id") < n_queries).select(
        F.col("id").alias("q_id"), "component", F.col("p").alias("qp")
    )
    coarse = (
        proj.join(F.broadcast(qp), "component")
        .filter(F.col("q_id") != F.col("id"))
        .groupBy("q_id", F.col("id").alias("n_id"))
        .agg(F.sum(q12(F.col("p") * F.col("qp"))).alias("score"))
    )
    ws = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("n_id"))
    short = (
        coarse.withColumn("rs", F.row_number().over(ws))
        .filter(F.col("rs") <= shortlist)
        .select("q_id", "n_id")
    )
    c = _prep(embeddings, id_col, vec_col, "n")
    q = _prep(embeddings.filter(F.col(id_col) < n_queries), id_col, vec_col, "q")
    rer = (
        short.join(c, "n_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "n_id",
            (
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos"),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("n_id").alias("neighbor_id"),
            "rank",
            "cos",
        )
    )


def pca_topk_oracle(
    n_components: int = 3,
    shortlist: int = 32,
    k: int = 5,
    n_iter: int = 16,
    n_queries: int = 8,
) -> str:
    """DuckDB twin of :func:`pca_topk` — the deflation prefix plus
    projection / coarse-shortlist / exact-rerank CTEs."""
    parts, finals = _pca_components_parts(n_components, n_iter)
    comps_select = " UNION ALL ".join(finals)
    duck_cos = (
        "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
        " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),"
        " CAST(a.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),"
        " CAST(b.embedding AS DOUBLE[]))))"
    )
    return f"""
        WITH {", ".join(parts)}, comps AS MATERIALIZED (
          {comps_select}
        ), proj AS MATERIALIZED (
          SELECT xi.id, comps.component,
                 CAST(CAST(SUM(CAST(floor(xi.x * comps.loading * 1e12 + 0.5)
                      AS BIGINT)) AS DOUBLE) / 1e12 AS DOUBLE) AS p
          FROM xi JOIN comps ON xi.i = comps.i
          GROUP BY xi.id, comps.component
        ), coarse AS MATERIALIZED (
          SELECT q.id AS q_id, c.id AS n_id,
                 CAST(SUM(CAST(floor(c.p * q.p * 1e12 + 0.5) AS BIGINT))
                      AS BIGINT) AS score
          FROM proj c JOIN proj q
            ON c.component = q.component AND q.id < {n_queries} AND q.id <> c.id
          GROUP BY q.id, c.id
        ), short AS MATERIALIZED (
          SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY score DESC, n_id) AS rs
            FROM coarse
          ) WHERE rs <= {shortlist}
        ), rer AS (
          SELECT s.q_id AS query_id, s.n_id AS neighbor_id, {duck_cos} AS cos
          FROM short s
          JOIN embeddings a ON a.vec_id = s.q_id
          JOIN embeddings b ON b.vec_id = s.n_id
        )
        SELECT query_id, neighbor_id, rank, cos FROM (
          SELECT query_id, neighbor_id, cos,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id) AS rank
          FROM rer
        ) WHERE rank <= {k}
    """


def pca_outliers(
    embeddings: DataFrame,
    n_components: int = 3,
    topk: int = 20,
    n_iter: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    components: DataFrame | None = None,
) -> DataFrame:
    """Multivariate outlier scoring on the learned PCA basis — the
    scalable Mahalanobis approximation: score(x) = Σ_c ((x−μ)·u_c)²/λ_c
    over the top components (the exact Mahalanobis distance restricted to
    the dominant eigenspace, which is the part that matters when the
    trailing spectrum is noise). The embedding-space sibling of the
    1-D ``zscore_outliers``/``mad_outliers`` gates.

    Portability: centered projections and squared-score terms all
    quantize per-product (1e12 BIGINT) before summation; λ and μ come
    from the bit-exact deflation solve. Output: the ``topk`` highest
    scores, ``(vec_id, score, rank)``.
    """
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    # `components` lets callers share one basis solve across the PCA rows
    # (the registry memo); content-identical to solving here
    comps = (
        components
        if components is not None
        else pca_components(
            embeddings, n_components=n_components, n_iter=n_iter
        ).localCheckpoint()
    )
    xi = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("id", "i", F.col("x").cast("double").alias("x"))
    n = xi.select("id").distinct().count()
    mu = xi.groupBy("i").agg(
        (
            F.sum(F.floor(F.col("x") * F.lit(1e6) + F.lit(0.5)).cast("bigint"))
            .cast("double")
            / F.lit(float(n))
            / F.lit(1e6)
        ).alias("mu")
    )
    proj = (
        xi.join(F.broadcast(mu), "i")
        .join(F.broadcast(comps.select("component", "i", "loading", "eigenvalue")), "i")
        .groupBy("id", "component", "eigenvalue")
        .agg(
            F.sum(q12((F.col("x") - F.col("mu")) * F.col("loading"))).alias("pq")
        )
        .select(
            "id",
            "component",
            (F.col("pq").cast("double") / F.lit(1e12)).alias("p"),
            "eigenvalue",
        )
    )
    scored = (
        proj.filter(F.col("eigenvalue") > 0)
        .select(
            "id",
            q12(F.col("p") * F.col("p") / F.col("eigenvalue")).alias("tq"),
        )
        .groupBy("id")
        .agg((F.sum("tq").cast("double") / F.lit(1e12)).alias("score"))
    )
    # top-k plans as TakeOrderedAndProject (per-partition top-k + k-row
    # driver merge — never a global sort); the rank window then runs
    # over the k-row survivor set only
    top = scored.orderBy(F.col("score").desc(), F.col("id")).limit(topk)
    w = Window.orderBy(F.col("score").desc(), F.col("id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col("id").alias(id_col), "score", "rank")
    )


def pca_outliers_oracle(
    n_components: int = 3, topk: int = 20, n_iter: int = 16
) -> str:
    """DuckDB twin of :func:`pca_outliers`."""
    parts, finals = _pca_components_parts(n_components, n_iter)
    comps_select = " UNION ALL ".join(finals)
    return f"""
        WITH {", ".join(parts)}, comps AS MATERIALIZED (
          {comps_select}
        ), mu AS MATERIALIZED (
          SELECT i,
                 CAST(CAST(SUM(CAST(floor(x * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
                      / nd / 1e6 AS DOUBLE) AS mu
          FROM xi CROSS JOIN nn GROUP BY i, nd
        ), proj AS MATERIALIZED (
          SELECT xi.id, comps.component, comps.eigenvalue,
                 CAST(CAST(SUM(CAST(floor((xi.x - mu.mu) * comps.loading * 1e12
                      + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS DOUBLE) AS p
          FROM xi JOIN mu USING (i) JOIN comps ON comps.i = xi.i
          GROUP BY xi.id, comps.component, comps.eigenvalue
        ), scored AS (
          SELECT id,
                 CAST(CAST(SUM(CAST(floor(p * p / eigenvalue * 1e12 + 0.5)
                      AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12 AS score
          FROM proj WHERE eigenvalue > 0 GROUP BY id
        )
        SELECT id AS vec_id, score, rank FROM (
          SELECT id, score,
                 ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rank
          FROM scored
        ) WHERE rank <= {topk}
    """


def nearest_centroid_classifier(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    holdout_mod: int = 5,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over the labeled
    embedding table: class centroids from the train split (``id %
    holdout_mod != 0``), holdout vectors assigned to the closest
    centroid by squared euclidean distance — the supervised twin of the
    kmeans machinery, and the vector-side sibling of the NB text
    classifier.

    Portability: centroid components are exact 1e12-quantized BIGINT
    sums divided once (the kmeans_centroids discipline); per-(vector,
    class) distances quantize each squared-difference term before the
    sum; the argmin uses the zero-padded ``dist || label`` string key
    (ties to the smallest label). Output: ``(vec_id, pred_label,
    true_label, is_correct)``.

    Scale: one explode, one (label, dim) aggregation (centroids are
    model-sized and broadcast), one vector x class scoring aggregation.

    Harness note: the synthetic embeddings' labels carry no geometric
    signal (holdout accuracy ~ the 1/n_classes random baseline), so the
    driver row verifies PARITY; the separable-cluster unit test pins
    that the classifier learns when signal exists.
    """
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    did = F.col(id_col)
    xi = embeddings.select(
        did.alias("id"),
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("id", "lab", "i", F.col("x").cast("double").alias("x"))
    train = xi.filter(F.col("id") % holdout_mod != 0)
    cents = (
        train.groupBy("lab", "i")
        .agg(F.sum(q12(F.col("x"))).alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("lab").alias("k"),
            "i",
            (F.col("sq").cast("double") / F.col("n") / F.lit(1e12)).alias("c"),
        )
    )
    test = xi.filter(F.col("id") % holdout_mod == 0)
    dists = (
        test.join(F.broadcast(cents), "i")
        .groupBy("id", "k")
        .agg(
            F.sum(q12((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))).alias(
                "dq"
            )
        )
    )
    best = (
        dists.select(
            "id",
            F.concat(
                F.lpad(F.col("dq").cast("string"), 20, "0"),
                F.lpad(F.col("k").cast("string"), 10, "0"),
            ).alias("key"),
        )
        .groupBy("id")
        .agg(F.min("key").alias("bk"))
    )
    truth = embeddings.filter(did % holdout_mod == 0).select(
        did.alias("id"), F.col(label_col).alias("true_label")
    )
    return best.join(truth, "id").select(
        F.col("id").alias(id_col),
        F.substring(F.col("bk"), 21, 10).cast("int").alias("pred_label"),
        "true_label",
        F.when(
            F.substring(F.col("bk"), 21, 10).cast("int") == F.col("true_label"), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("is_correct"),
    )


def nearest_centroid_oracle(holdout_mod: int = 5) -> str:
    """DuckDB twin of :func:`nearest_centroid_classifier`."""
    return f"""
        WITH xi AS MATERIALIZED (
          SELECT vec_id AS id, label AS lab, i - 1 AS i, CAST(e AS DOUBLE) AS x
          FROM (
            SELECT vec_id, label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
          )
        ), cents AS MATERIALIZED (
          SELECT lab AS k, i,
                 CAST(CAST(SUM(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*) / 1e12 AS DOUBLE) AS c
          FROM xi WHERE id % {holdout_mod} <> 0 GROUP BY lab, i
        ), dists AS MATERIALIZED (
          SELECT xi.id, cents.k,
                 CAST(SUM(CAST(floor((xi.x - cents.c) * (xi.x - cents.c) * 1e12
                      + 0.5) AS BIGINT)) AS BIGINT) AS dq
          FROM xi JOIN cents USING (i)
          WHERE xi.id % {holdout_mod} = 0
          GROUP BY xi.id, cents.k
        ), best AS (
          SELECT id, MIN(lpad(CAST(dq AS VARCHAR), 20, '0')
                         || lpad(CAST(k AS VARCHAR), 10, '0')) AS bk
          FROM dists GROUP BY id
        )
        SELECT b.id AS vec_id,
               CAST(substr(b.bk, 21) AS INTEGER) AS pred_label,
               e.label AS true_label,
               CAST(CASE WHEN CAST(substr(b.bk, 21) AS INTEGER) = e.label
                    THEN 1 ELSE 0 END AS BIGINT) AS is_correct
        FROM best b JOIN embeddings e ON e.vec_id = b.id
    """


def label_knn_agreement(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Embedding-quality probe: for every vector, how many of its k
    nearest neighbors (cosine) share its label — the standard
    label-consistency eval run before trusting an embedding space for
    retrieval or clustering (random space → 1/n_classes agreement;
    good space → near 1). Per-label rollup of exact integer agreement
    counts; one division per label at the boundary.

    The scoring pass is the documented all-pairs baseline (exact);
    at corpus scale the candidate set comes from the LSH/IVF/PQ/PCA
    retrievers this module already provides — the eval tail is
    identical. Output: ``(label, n_vecs, mean_agreement)``.
    """
    c = _prep(embeddings, id_col, vec_col, "n")
    q = _prep(embeddings, id_col, vec_col, "q")
    labels = embeddings.select(
        F.col(id_col).alias("lid"), F.col(label_col).alias("lab")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            (
                dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    agree = (
        top.join(labels.select(F.col("lid").alias("q_id"), F.col("lab").alias("ql")), "q_id")
        .join(labels.select(F.col("lid").alias("n_id"), F.col("lab").alias("nl")), "n_id")
        .groupBy("q_id", "ql")
        .agg(F.sum((F.col("ql") == F.col("nl")).cast("bigint")).alias("n_agree"))
    )
    return agree.groupBy(F.col("ql").alias(label_col)).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (
            F.sum("n_agree").cast("double")
            / (F.count(F.lit(1)) * F.lit(k)).cast("double")
        ).alias("mean_agreement"),
    )


def label_knn_agreement_oracle(k: int = 5) -> str:
    """DuckDB twin of :func:`label_knn_agreement` (embeddings table)."""
    duck_cos = (
        "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
        " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),"
        " CAST(a.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),"
        " CAST(b.embedding AS DOUBLE[]))))"
    )
    return f"""
        WITH top AS MATERIALIZED (
          SELECT q_id, n_id, ql FROM (
            SELECT a.vec_id AS q_id, b.vec_id AS n_id, a.label AS ql,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                      ORDER BY {duck_cos} DESC, b.vec_id) AS rank
            FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          ) WHERE rank <= {k}
        ), agree AS (
          SELECT t.q_id, t.ql,
                 CAST(SUM(CASE WHEN e.label = t.ql THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_agree
          FROM top t JOIN embeddings e ON e.vec_id = t.n_id
          GROUP BY t.q_id, t.ql
        )
        SELECT ql AS label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
               CAST(SUM(n_agree) AS DOUBLE) / CAST(COUNT(*) * {k} AS DOUBLE)
                 AS mean_agreement
        FROM agree GROUP BY ql
    """


def centroid_separation(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Inter-class separability matrix: pairwise euclidean distances
    between class centroids — the embedding-space diagnostic read next
    to :func:`label_knn_agreement` (well-separated centroids with low
    kNN agreement = high within-class variance; both low = labels carry
    no geometry). Centroids are the quantized means the classifier
    uses; distances quantize per squared-difference term, one sqrt at
    the boundary. Output: ``(label_a, label_b, dist)`` for a < b.
    """
    q12 = lambda col: F.floor(col * F.lit(1e12) + F.lit(0.5)).cast("bigint")  # noqa: E731
    xi = embeddings.select(
        F.col(label_col).alias("lab"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("lab", "i", F.col("x").cast("double").alias("x"))
    cents = (
        xi.groupBy("lab", "i")
        .agg(F.sum(q12(F.col("x"))).alias("sq"), F.count(F.lit(1)).alias("n"))
        .select(
            "lab",
            "i",
            (F.col("sq").cast("double") / F.col("n") / F.lit(1e12)).alias("c"),
        )
    )
    a = cents.select(F.col("lab").alias("label_a"), "i", F.col("c").alias("ca"))
    b = cents.select(F.col("lab").alias("label_b"), "i", F.col("c").alias("cb"))
    return (
        a.join(b, "i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sqrt(
                F.sum(
                    q12((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
                ).cast("double")
                / F.lit(1e12)
            ).alias("dist")
        )
    )


def centroid_separation_oracle() -> str:
    """DuckDB twin of :func:`centroid_separation` (embeddings table)."""
    return """
        WITH xi AS MATERIALIZED (
          SELECT label AS lab, i - 1 AS i, CAST(e AS DOUBLE) AS x
          FROM (
            SELECT label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
          )
        ), cents AS MATERIALIZED (
          SELECT lab, i,
                 CAST(CAST(SUM(CAST(floor(x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*) / 1e12 AS DOUBLE) AS c
          FROM xi GROUP BY lab, i
        )
        SELECT a.lab AS label_a, b.lab AS label_b,
               sqrt(CAST(CAST(SUM(CAST(floor((a.c - b.c) * (a.c - b.c) * 1e12
                    + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e12) AS dist
        FROM cents a JOIN cents b ON a.i = b.i AND a.lab < b.lab
        GROUP BY a.lab, b.lab
    """


def ndcg_weights(k: int) -> tuple[int, ...]:
    """Integer DCG position weights ``round(1e9 / log2(i+1))`` for ranks
    1..k — the driver-embedded-literal device (PERF.md): the one
    transcendental is evaluated ONCE in Python and the same literals are
    embedded in both the Spark plan and the DuckDB oracle, so engine math
    never touches log()."""
    import math

    return tuple(round(1_000_000_000 / math.log2(i + 1)) for i in range(1, k + 1))


def ndcg_eval(
    retrieved: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Graded-ranking evaluation: NDCG@k of ``retrieved`` against the
    ``truth`` ranking (e.g. the exact retriever), in PURE INTEGER
    arithmetic. Relevance of truth-rank r is ``k - r + 1`` (top ideal hit
    most relevant); discount weights are the integer literals of
    :func:`ndcg_weights`, so

        dcg  = Σ rel(doc@i) · w_i      (exact BIGINT)
        ndcg_ppm = (dcg · 1e6) div idcg  (trunc-toward-zero both engines)

    Output: (query_id, n_truth, dcg, idcg, ndcg_ppm).

    Scale: both inputs are queries×k rows regardless of corpus size — the
    join and aggregations are query-grain, negligible next to retrieval.
    """
    w = ndcg_weights(k)
    w_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in w])
    t = truth.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__tr"),
    )
    gains = (
        retrieved.filter(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("__q"),
            F.col(doc_col).alias("__d"),
            F.col(rank_col).alias("__sr"),
        )
        .join(t, ["__q", "__d"])
        .select(
            "__q",
            (
                (F.lit(k) - F.col("__tr") + 1).cast("bigint")
                * F.element_at(w_arr, F.col("__sr").cast("int"))
            ).alias("__g"),
        )
        .groupBy("__q")
        .agg(F.sum("__g").alias("__dcg"))
    )
    ideal = t.select(
        "__q",
        (
            (F.lit(k) - F.col("__tr") + 1).cast("bigint")
            * F.element_at(w_arr, F.col("__tr").cast("int"))
        ).alias("__g"),
    ).groupBy("__q").agg(
        F.count(F.lit(1)).alias("n_truth"), F.sum("__g").alias("__idcg")
    )
    return (
        ideal.join(gains, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.col("n_truth").cast("long").alias("n_truth"),
            F.coalesce(F.col("__dcg"), F.lit(0)).cast("long").alias("dcg"),
            F.col("__idcg").cast("long").alias("idcg"),
            F.expr("(coalesce(__dcg, 0) * 1000000) div __idcg").alias("ndcg_ppm"),
        )
    )


def ndcg_eval_oracle_sql(
    truth_sql: str,
    got_sql: str,
    k: int,
) -> str:
    """DuckDB twin of :func:`ndcg_eval` over inlined retriever SQL — the
    SAME :func:`ndcg_weights` literals, `//` truncation matching `div`."""
    w = ndcg_weights(k)
    values = ", ".join(f"({i + 1}, CAST({x} AS BIGINT))" for i, x in enumerate(w))
    return f"""
        WITH truth AS MATERIALIZED ({truth_sql}),
        got AS ({got_sql}),
        w AS (SELECT * FROM (VALUES {values}) v(i, wt)),
        gains AS (
          SELECT g.query_id, CAST(SUM(({k} - t.rank + 1) * w.wt) AS BIGINT) AS dcg
          FROM got g
          JOIN truth t ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
          JOIN w ON w.i = g.rank
          WHERE g.rank <= {k}
          GROUP BY 1
        ),
        ideal AS (
          SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_truth,
                 CAST(SUM(({k} - t.rank + 1) * w.wt) AS BIGINT) AS idcg
          FROM truth t JOIN w ON w.i = t.rank
          GROUP BY 1
        )
        SELECT i.query_id, i.n_truth, COALESCE(g.dcg, 0) AS dcg, i.idcg,
               (COALESCE(g.dcg, 0) * 1000000) // i.idcg AS ndcg_ppm
        FROM ideal i LEFT JOIN gains g USING (query_id)
    """


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: DataFrame,
    quota: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Cluster-balanced diversity sampling — the embedding-space
    counterpart of stratified sampling (DoReMi/SemDeDup-era curation:
    sample evenly across semantic clusters instead of letting the head
    cluster dominate the training mix). Every vector assigns to its
    nearest trained centroid (broadcast argmax — the IVF assignment);
    within each cell the ``quota`` survivors are the smallest by the
    repo's engine-portable md5 hash (deterministic, uniform, no RNG
    state).

    Output per cell: ``(cell, n_total, n_sampled, sampled_id_sum)`` —
    the id checksum pins the exact selection, not just its size.

    Scale: one broadcast centroid join (k rows), one per-cell top-quota
    window (WindowGroupLimit pushes the rank cut map-side), one rollup.
    The corpus never shuffles on anything wider than the cell id.
    """
    c = _prep(corpus, id_col, vec_col, "n")
    scored = c.crossJoin(F.broadcast(centroids)).select(
        "n_id",
        "cell",
        (dot(F.col("n_vec"), F.col("c_vec")) / (F.col("n_norm") * F.col("c_norm"))).alias(
            "__csim"
        ),
    )
    w = Window.partitionBy("n_id").orderBy(F.col("__csim").desc(), F.col("cell"))
    assigned = (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("n_id", "cell")
    )
    h = F.conv(
        F.substring(F.md5(F.col("n_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    ws = Window.partitionBy("cell").orderBy("__h", "n_id")
    picked = assigned.withColumn("__h", h).withColumn(
        "__rk", F.row_number().over(ws)
    )
    return (
        picked.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum((F.col("__rk") <= quota).cast("long")).alias("n_sampled"),
            F.sum(
                F.when(F.col("__rk") <= quota, F.col("n_id")).otherwise(0)
            ).cast("long").alias("sampled_id_sum"),
        )
        .select(F.col("cell").cast("long").alias("cell"), "n_total", "n_sampled", "sampled_id_sum")
    )
