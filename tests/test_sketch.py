"""KMV distinct sketch: exact below k, estimator accuracy above k, and the
bottom-k merge property that makes it shard-composable."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_example_spark.operators.sketch import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "g", "v", k=64).first()
    assert row["n_kept"] == 40
    assert row["kth_hash"] is None
    assert row["est_distinct"] == 40.0


def test_kmv_estimate_above_k(spark):
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = kmv_distinct(df, "g", "v", k=256).first()
    assert row["n_kept"] == 256
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_kmv_duplicates_do_not_inflate(spark):
    base = spark.range(500).select(F.col("id").cast("string").alias("v"))
    dup = base.union(base).union(base).select(F.lit("g").alias("g"), "v")
    row = kmv_distinct(dup, "g", "v", k=64).first()
    one = kmv_distinct(
        base.select(F.lit("g").alias("g"), "v"), "g", "v", k=64
    ).first()
    assert row["est_distinct"] == one["est_distinct"]
    assert row["kth_hash"] == one["kth_hash"]


def test_kmv_shard_merge_equals_global(spark):
    """Union of shards re-sketched = sketch of the union — the bottom-k
    merge property (k smallest of the union of per-shard k-smallest sets
    is the global bottom-k)."""
    df = spark.range(5_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    k = 128
    global_row = kmv_distinct(df, "g", "v", k=k).first()
    shard_a = df.filter(F.col("v").cast("long") % 2 == 0)
    shard_b = df.filter(F.col("v").cast("long") % 2 == 1)
    from flink_example_spark.operators.sketch import portable_hash32

    def bottomk(frame):
        return sorted(
            r["h"]
            for r in frame.select(portable_hash32(F.col("v")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        )

    union_of_shards = sorted(set(bottomk(shard_a)) | set(bottomk(shard_b)))[:k]
    assert union_of_shards == bottomk(df)
    assert global_row["n_kept"] == k


def test_kmv_merge_method_equals_window(spark):
    """The bounded-state merge port (per-partition bottom-k heaps + one
    per-group reduce) must be bit-identical to the window form — same
    bottom-k set, same IEEE estimator arithmetic. Multi-group, duplicate
    values, partitions > groups, and a below-k group all exercised."""
    df = (
        spark.range(8_000)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") % 2_500).cast("string").alias("v"),
        )
        .union(spark.range(5).select(F.lit("tiny").alias("g"), F.col("id").cast("string")))
        .repartition(16)
    )
    k = 64
    win = {tuple(r) for r in kmv_distinct(df, "g", "v", k=k).collect()}
    mrg = {tuple(r) for r in kmv_distinct(df, "g", "v", k=k, method="merge").collect()}
    assert win == mrg


def test_kmv_null_values_ignored_and_engine_parity(spark):
    """NULL values must not enter the sketch: Spark windows sort NULL hashes
    first, DuckDB's oracle ORDER BY sorts them last, so an unfiltered NULL
    inside a >=k group would shift kth_hash/est_distinct across engines
    (ADVICE r5). Both sides now drop NULLs; sketch of (values + NULLs) ==
    sketch of values, and the DuckDB oracle agrees."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.sketch import kmv_distinct_oracle

    vals = [("g", str(i)) for i in range(200)]
    with_nulls = vals + [("g", None)] * 7
    df_clean = spark.createDataFrame(vals, "g string, v string")
    df_nulls = spark.createDataFrame(with_nulls, "g string, v string")
    k = 64
    clean = kmv_distinct(df_clean, "g", "v", k=k).first()
    dirty = kmv_distinct(df_nulls, "g", "v", k=k).first()
    assert (clean["n_kept"], clean["kth_hash"], clean["est_distinct"]) == (
        dirty["n_kept"],
        dirty["kth_hash"],
        dirty["est_distinct"],
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(with_nulls, columns=["g", "v"]))
    ora = con.execute(kmv_distinct_oracle("t", ["g"], "v", k=k)).fetchone()
    assert (ora[1], ora[2], ora[3]) == (
        dirty["n_kept"],
        dirty["kth_hash"],
        dirty["est_distinct"],
    )


def test_streaming_kmv_null_values_do_not_crash(spark, tmp_path):
    """A NULL value reaching applyInPandasWithState arrived as NaN and blew
    up int(h) (ADVICE r5); the source filter must drop it pre-state."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flink_example_spark.streaming.sketch_stream import run_streaming_kmv

    sf = tmp_path / "sf"
    sf.mkdir()
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "lang": ["en"] * 10,
            "source": ["s"] * 10,
            "text": [None if i % 3 == 0 else f"doc {i}" for i in range(10)],
            "n_chars": [5] * 10,
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), sf / "documents.parquet")
    out = run_streaming_kmv(spark, str(sf), k=8).collect()
    assert len(out) == 1 and out[0]["n_kept"] > 0


def test_streaming_kmv_converges_to_batch(spark):
    """Bounded replay of the stream-maintained bottom-k sketch equals the
    batch operator exactly (merge property, any arrival order)."""
    from flink_example_spark.operators.text import fingerprint
    from flink_example_spark.streaming.sketch_stream import run_streaming_kmv
    from flink_example_spark.tables import load_table

    SF = "/root/testdata/sf0.001"
    streamed = {tuple(r) for r in run_streaming_kmv(spark, SF, k=32).collect()}
    d = load_table(spark, SF, "documents").select(
        "lang", fingerprint(F.col("text")).alias("fp")
    )
    batch = {tuple(r) for r in kmv_distinct(d, "lang", "fp", k=32).collect()}
    assert streamed == batch


# ---------------------------------------------------------------------------
# Count-min sketch


def _cm_values(spark):
    """A skewed value stream: value i appears (i % 7 + 1) times."""
    return spark.range(300).select(
        F.explode(F.sequence(F.lit(1), F.col("id") % 7 + 1)).alias("_"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    ).select("v")


def test_cm_estimate_upper_bounds_true_count(spark):
    """CM guarantee: every point estimate >= the true count; with a
    width-forced collision regime some estimate strictly exceeds it."""
    from flink_example_spark.operators.sketch import cm_estimate, cm_sketch

    df = _cm_values(spark)
    sketch = cm_sketch(df, "v", depth=3, width=16)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("true_count"))
    est = cm_estimate(sketch, exact.select("v"), "v", depth=3, width=16)
    rows = exact.join(est, "v").collect()
    assert len(rows) == 300
    assert all(r["est_count"] >= r["true_count"] for r in rows)
    # 300 values into 16 columns: collisions are certain somewhere
    assert any(r["est_count"] > r["true_count"] for r in rows)


def test_cm_shard_merge_equals_global(spark):
    """Summing shard sketches == sketching the union (counter addition is
    the monoid that makes CM the distributed frequency profile)."""
    from flink_example_spark.operators.sketch import cm_merge, cm_sketch

    df = _cm_values(spark)
    whole = cm_sketch(df, "v", depth=4, width=32)
    a = cm_sketch(df.filter(F.length("v") % 2 == 0), "v", depth=4, width=32)
    b = cm_sketch(df.filter(F.length("v") % 2 == 1), "v", depth=4, width=32)
    merged = cm_merge(a, b)
    assert {tuple(r) for r in whole.collect()} == {tuple(r) for r in merged.collect()}


def test_cm_total_mass_per_row(spark):
    """Every depth row holds the full stream mass (each instance lands in
    exactly one cell per row)."""
    from flink_example_spark.operators.sketch import cm_sketch

    df = _cm_values(spark)
    n = df.count()
    rows = (
        cm_sketch(df, "v", depth=3, width=8)
        .groupBy("r")
        .agg(F.sum("cnt").alias("mass"))
        .collect()
    )
    assert len(rows) == 3
    assert all(r["mass"] == n for r in rows)


def test_cm_heavy_hitters_ranked_exactly(spark):
    """The top-k relation carries exact counts (candidate pass) and CM
    estimates that dominate them."""
    from flink_example_spark.operators.sketch import cm_heavy_hitters

    df = _cm_values(spark)
    out = cm_heavy_hitters(df, "v", depth=3, width=8, topk=10).collect()
    assert len(out) == 10
    assert all(r["est_count"] >= r["true_count"] for r in out)
    # the stream's heaviest values have true count 7
    assert max(r["true_count"] for r in out) == 7


def test_streaming_cm_converges_to_batch(spark):
    """Bounded replay of the streaming counter aggregate equals the batch
    sketch exactly (pure-JVM streaming aggregation state)."""
    from flink_example_spark.operators.sketch import cm_sketch
    from flink_example_spark.operators.text import normalized, tokens
    from flink_example_spark.streaming.sketch_stream import run_streaming_cm_sketch
    from flink_example_spark.tables import load_table

    SF = "/root/testdata/sf0.001"
    streamed = {
        tuple(r) for r in run_streaming_cm_sketch(spark, SF, depth=3, width=8).collect()
    }
    toks = (
        load_table(spark, SF, "documents")
        .select(F.explode(tokens(normalized(F.col("text")))).alias("term"))
        .filter(F.col("term") != "")
    )
    batch = {tuple(r) for r in cm_sketch(toks, "term", depth=3, width=8).collect()}
    assert streamed == batch


# ---------------------------------------------------------------------------
# Hash-rank-sample quantile sketch


def test_kmv_quantiles_exact_below_k(spark):
    """A group with <= k rows reports exact interpolated quantiles."""
    from flink_example_spark.operators.sketch import kmv_quantiles

    df = spark.range(101).select(
        F.lit("g").alias("g"), F.col("id").alias("key"), F.col("id").alias("v")
    )
    row = kmv_quantiles(df, "g", "v", "key", k=256).first()
    assert row["n_sample"] == 101
    assert (row["p25"], row["p50"], row["p75"]) == (25.0, 50.0, 75.0)


def test_kmv_quantiles_estimate_accuracy(spark):
    """On 20k uniform values the k=256 sample's median lands within a few
    sampling sigma of the true median."""
    from flink_example_spark.operators.sketch import kmv_quantiles

    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").alias("key"), F.col("id").alias("v")
    )
    row = kmv_quantiles(df, "g", "v", "key", k=256).first()
    assert row["n_sample"] == 256
    # binomial sigma at the median for k=256 is ~ n * 0.5/sqrt(256) ~ 3.1% of n
    assert abs(row["p50"] - n / 2) / n < 0.15


def test_kmv_quantile_sample_merges_across_shards(spark):
    """Bottom-k-by-hash of the union == merge of per-shard bottom-ks: the
    property that makes the sample (hence the quantiles) shard-mergeable."""
    from flink_example_spark.operators.sketch import kmv_quantile_sample

    df = spark.range(5_000).select(
        F.lit("g").alias("g"), F.col("id").alias("key"), (F.col("id") * 3).alias("v")
    )
    k = 128
    whole = sorted(r["__v"] for r in kmv_quantile_sample(df, "g", "v", "key", k=k).collect())
    a = kmv_quantile_sample(df.filter(F.col("key") % 2 == 0), "g", "v", "key", k=k)
    b = kmv_quantile_sample(df.filter(F.col("key") % 2 == 1), "g", "v", "key", k=k)
    # merge = re-take bottom-k by hash over the union of the two samples;
    # replicate by re-sampling the union of shard-sample SOURCE rows
    merged_src = df.filter(F.col("key") % 2 == 0).union(df.filter(F.col("key") % 2 == 1))
    merged = sorted(
        r["__v"] for r in kmv_quantile_sample(merged_src, "g", "v", "key", k=k).collect()
    )
    assert whole == merged
    # and each shard sample is itself a deterministic subset of size k
    assert a.count() == k and b.count() == k


# --- portable HLL ----------------------------------------------------------


def test_hll_estimate_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    from flink_example_spark.operators.sketch import hll_distinct

    row = hll_distinct(df, "g", "v", p=8).first()
    # raw-HLL relative error ~ 1.04/sqrt(m) = 6.5% at m=256; allow 4 sigma
    assert abs(row["est_distinct"] - n) / n < 0.26
    assert row["n_registers"] <= 256


def test_hll_duplicates_do_not_inflate(spark):
    from flink_example_spark.operators.sketch import hll_distinct

    base = spark.range(3_000).select(F.col("id").cast("string").alias("v"))
    dup = base.union(base).select(F.lit("g").alias("g"), "v")
    one = hll_distinct(base.select(F.lit("g").alias("g"), "v"), "g", "v").first()
    two = hll_distinct(dup, "g", "v").first()
    assert (one["reg_sum"], one["est_distinct"]) == (two["reg_sum"], two["est_distinct"])


def test_hll_shard_merge_equals_global(spark):
    """Register-wise max over shard register relations == registers of the
    union (the monoid that makes HLL shard-composable and streamable)."""
    from flink_example_spark.operators.sketch import (
        hll_finalize,
        hll_merge,
        hll_registers,
    )

    df = spark.range(8_000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    shard_a = df.filter(F.col("v").cast("long") % 2 == 0)
    shard_b = df.filter(F.col("v").cast("long") % 2 == 1)
    merged = hll_finalize(
        hll_merge(["g"], hll_registers(shard_a, "g", "v"), hll_registers(shard_b, "g", "v")),
        "g",
    ).first()
    whole = hll_finalize(hll_registers(df, "g", "v"), "g").first()
    assert (merged["n_registers"], merged["reg_sum"], merged["est_distinct"]) == (
        whole["n_registers"],
        whole["reg_sum"],
        whole["est_distinct"],
    )


def test_hll_engine_parity_and_nulls(spark):
    """The register relation and the estimate must be bit-identical in
    DuckDB (same md5 bucket, same bin()-based rho, same exact integer
    harmonic sum, one shared-literal division), with NULLs dropped."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.sketch import hll_distinct, hll_distinct_oracle

    vals = [("a", str(i)) for i in range(900)] + [("b", str(i)) for i in range(40)]
    with_nulls = vals + [("a", None)] * 5
    df = spark.createDataFrame(with_nulls, "g string, v string")
    got = {
        r["g"]: (r["n_registers"], r["reg_sum"], r["est_distinct"])
        for r in hll_distinct(df, "g", "v", p=6).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(with_nulls, columns=["g", "v"]))
    ora = con.execute(hll_distinct_oracle("SELECT g, v FROM t", ["g"], "v", p=6)).fetchall()
    assert {r[0]: (r[1], r[2], r[3]) for r in ora} == got


# --- KMV set-operation (theta-style) overlap -------------------------------


def test_kmv_overlap_exact_below_k(spark):
    """Disjoint-union small sets: everything exact when |A∪B| < k."""
    from flink_example_spark.operators.sketch import kmv_overlap

    a = spark.range(0, 30).select(F.col("id").cast("string").alias("v"))
    b = spark.range(20, 50).select(F.col("id").cast("string").alias("v"))
    row = kmv_overlap(a, b, "v", k=256).first()
    assert row["n_union_kept"] == 50
    assert row["union_est"] == 50.0
    assert row["n_common"] == 10
    assert abs(row["intersect_est"] - 10.0) < 1e-9


def test_kmv_overlap_estimates_above_k(spark):
    """A=0..4999, B=2500..7499: true union 7500, jaccard 1/3,
    intersection 2500 — estimates within sketch error at k=256."""
    from flink_example_spark.operators.sketch import kmv_overlap

    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 7500).select(F.col("id").cast("string").alias("v"))
    row = kmv_overlap(a, b, "v", k=256).first()
    assert abs(row["union_est"] - 7500) / 7500 < 0.25
    assert abs(row["jaccard_est"] - 1 / 3) < 0.12
    assert abs(row["intersect_est"] - 2500) / 2500 < 0.4


def test_bloom_no_false_negatives_and_fp_bound(spark):
    from flink_example_spark.operators.sketch import bloom_probe_summary, bloom_words

    members = spark.range(500).select(
        F.lit("g").alias("g"), (F.col("id") * 2).cast("string").alias("v")
    )
    probes = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    bloom = bloom_words(members, ["g"], "v", m_bits=8192, k=4)
    row = bloom_probe_summary(
        bloom, probes, members, ["g"], "v", m_bits=8192, k=4
    ).first()
    # every true member flagged (no false negatives)
    assert row["actual_present"] == 500
    assert row["flagged_present"] >= 500
    assert row["false_positives"] == row["flagged_present"] - 500
    # fill ratio ~ 1-exp(-4*500/8192) = 0.22 -> fp rate ~ 0.22^4 ~ 0.23%
    assert row["false_positives"] <= 25


def test_bloom_words_idempotent_merge(spark):
    from flink_example_spark.operators.sketch import bloom_words

    base = spark.range(300).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    tripled = base.union(base).union(base)
    one = {(r["word"], r["bits"]) for r in bloom_words(base, ["g"], "v").collect()}
    three = {(r["word"], r["bits"]) for r in bloom_words(tripled, ["g"], "v").collect()}
    assert one == three


def test_ndcg_perfect_and_degraded(spark):
    from pyspark.sql import Row

    from flink_example_spark.operators.similarity import ndcg_eval

    truth = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=d, rank=r) for r, d in enumerate([10, 20, 30], 1)]
    )
    perfect = ndcg_eval(truth, truth, k=3).first()
    assert perfect["ndcg_ppm"] == 1_000_000
    # swap top two: DCG drops below ideal, stays positive
    swapped = spark.createDataFrame(
        [Row(query_id=1, neighbor_id=d, rank=r) for r, d in enumerate([20, 10, 30], 1)]
    )
    row = ndcg_eval(swapped, truth, k=3).first()
    assert 0 < row["ndcg_ppm"] < 1_000_000
    # empty retrieval -> 0
    empty = swapped.filter("rank > 99")
    row0 = ndcg_eval(empty, truth, k=3).first()
    assert row0["ndcg_ppm"] == 0 and row0["dcg"] == 0


def test_mp_quantile_sketch_accuracy_and_determinism(spark):
    """The deterministic Munro-Paterson sketch: estimated percentiles
    land within the documented rank-error bound of the exact order
    statistics, and two runs are identical."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.sketch import (
        exact_order_stats,
        mp_quantile_sketch,
    )

    n = 20000
    df = spark.range(n).select(
        ((F.col("id") * 37) % 1000).alias("v"), F.col("id")
    )
    R_local, R_merge = 5, 3
    est = {
        r["pct"]: r["est_value"]
        for r in mp_quantile_sketch(
            df, "v", "id", n_shards=8,
            rounds_local=R_local, rounds_merge=R_merge,
        ).collect()
    }
    exact = {
        r["pct"]: r["value"]
        for r in exact_order_stats(df, "v", "id", pcts=(50, 90, 99)).collect()
    }
    # rank error <= R * 2^(R-1); v is uniform over 0..999 with n/1000 rows
    # per value, so value error <= rank_err / (n/1000) + 1
    R = R_local + R_merge
    rank_err = R * (1 << (R - 1))
    val_err = rank_err / (n / 1000) + 1
    for p in (50, 90, 99):
        assert abs(est[p] - exact[p]) <= val_err, (p, est[p], exact[p])
    est2 = {
        r["pct"]: r["est_value"]
        for r in mp_quantile_sketch(
            df, "v", "id", n_shards=8,
            rounds_local=R_local, rounds_merge=R_merge,
        ).collect()
    }
    assert est == est2


def test_kmv_jvm_form_bit_identical_and_partial_aggregated(spark):
    """The JVM bounded-state form (fes.KmvBottomK UDAF): bit-identical
    output to BOTH the window and mapInPandas-merge forms on a
    multi-partition input (exercising update, partial merge, and final
    merge paths), and the executed plan must carry the map-side
    partial_ mode — the whole point of the JVM aggregate."""
    rows = [("g%d" % (i % 3), "v%d" % (i % 157)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v string").repartition(8)
    w = sorted(tuple(r) for r in kmv_distinct(df, "g", "v", k=64).collect())
    j_df = kmv_distinct(df, "g", "v", k=64, method="jvm")
    j = sorted(tuple(r) for r in j_df.collect())
    m = sorted(
        tuple(r)
        for r in kmv_distinct(df, "g", "v", k=64, method="merge").collect()
    )
    assert w == j == m
    plan = j_df._jdf.queryExecution().executedPlan().toString()
    assert "partial_kmv_bottomk64" in plan


def test_kmv_jvm_exact_below_k(spark):
    """Below k the JVM form returns the exact distinct count and a NULL
    kth hash, like the other forms."""
    df = spark.createDataFrame(
        [("a", "v%d" % i) for i in range(10)], "g string, v string"
    )
    row = kmv_distinct(df, "g", "v", k=64, method="jvm").first()
    assert row["n_kept"] == 10
    assert row["kth_hash"] is None
    assert row["est_distinct"] == 10.0


def test_kmv_quantiles_jvm_bit_identical(spark):
    """The payload-carrying JVM sample aggregate draws the bit-identical
    hash-rank sample (zero-padded numeric keys make the UTF-8 tiebreak
    equal the window form's native order), so the quantile outputs match
    exactly; the plan carries the map-side partial_ mode."""
    from flink_example_spark.operators.sketch import kmv_quantiles

    rows = [("g%d" % (i % 3), i, float((i * 37) % 500)) for i in range(900)]
    df = spark.createDataFrame(
        rows, "g string, key long, val double"
    ).repartition(8)
    w = sorted(
        tuple(r) for r in kmv_quantiles(df, "g", "val", "key", k=64).collect()
    )
    j_df = kmv_quantiles(df, "g", "val", "key", k=64, method="jvm")
    j = sorted(tuple(r) for r in j_df.collect())
    assert w == j
    plan = j_df._jdf.queryExecution().executedPlan().toString()
    assert "partial_kmv_sample_bottomk64" in plan


def test_kmv_sample_jvm_rejects_unorderable_keys(spark):
    """Non-string, non-integer key columns must raise (the UTF-8
    tiebreak cannot reproduce their native order) instead of silently
    sampling differently from the window form."""
    import pytest

    from flink_example_spark.operators.sketch import kmv_quantile_sample

    df = spark.createDataFrame(
        [("a", 1.5, 2.0)], "g string, key double, val double"
    )
    with pytest.raises(ValueError, match="window"):
        kmv_quantile_sample(df, "g", "val", "key", k=64, method="jvm")


def test_streaming_kmv_jvm_converges_to_batch(spark):
    """The zero-Python streaming KMV (JVM aggregate state in a plain
    complete-mode streaming aggregation) converges exactly to the batch
    relation across a 3-chunk bounded replay."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.text import fingerprint
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_kmv_jvm,
    )
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in run_streaming_kmv_jvm(spark, sf, k=32).collect()
    )
    d = load_table(spark, sf, "documents").select(
        "lang", fingerprint(F.col("text")).alias("fp")
    )
    want = sorted(
        tuple(r) for r in kmv_distinct(d, "lang", "fp", k=32).collect()
    )
    assert got == want


def test_streaming_quantiles_jvm_converges_to_batch(spark):
    """The zero-Python streaming quantile sketch (payload-carrying JVM
    aggregate state) converges exactly to the batch kmv_quantiles
    relation across a bounded replay."""
    from flink_example_spark.operators.sketch import kmv_quantiles
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_quantiles_jvm,
    )
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r)
        for r in run_streaming_quantiles_jvm(spark, sf, k=64).collect()
    )
    d = load_table(spark, sf, "documents")
    want = sorted(
        tuple(r)
        for r in kmv_quantiles(d, "lang", "n_chars", "doc_id", k=64).collect()
    )
    assert got == want


def _dyadic_brute(vals, k):
    """Closed-form reference: exact bucket counts at the minimal level
    with <= k distinct buckets (the merge-order-invariance theorem)."""
    from collections import Counter

    lvl = 0
    while len({v >> lvl for v in vals}) > k:
        lvl += 1
    return lvl, dict(Counter(v >> lvl for v in vals))


def test_dyadic_hist_matches_closed_form_and_partial_aggregates(spark):
    """The JVM dyadic histogram's (level, buckets, counts) equals the
    closed form min{L : |{v >> L}| <= k} with exact counts, on a
    multi-partition input; the plan carries the map-side partial_ mode."""
    from flink_example_spark.jvm import register_dyadic_hist

    fn = register_dyadic_hist(spark, 64)
    vals = [(i * 7919) % 1_000_003 for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(16)
    g = df.groupBy().agg(__import__("pyspark.sql.functions", fromlist=["expr"]).expr(f"{fn}(v)").alias("a"))
    arr = g.first()["a"]
    lvl, buckets = _dyadic_brute(vals, 64)
    assert arr[0] == lvl
    got = dict(zip(arr[1::2], arr[2::2]))
    assert got == buckets
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "partial_dyadic_hist64" in plan


def test_dyadic_hist_is_merge_order_invariant(spark):
    """Shuffled input + different partitionings produce the IDENTICAL
    array — the property KLL compaction lacks and the reason this sketch
    is oracle-hashable."""
    import random

    from flink_example_spark.jvm import register_dyadic_hist

    fn = register_dyadic_hist(spark, 64)
    vals = [(i * i * 31) % 500_009 for i in range(3000)]
    outs = []
    for seed, parts in ((1, 2), (2, 32), (3, 7)):
        random.Random(seed).shuffle(vals)
        df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(parts)
        outs.append(
            tuple(
                df.groupBy()
                .agg(F.expr(f"{fn}(v)").alias("a"))
                .first()["a"]
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_dyadic_quantiles_bounds_contain_exact_percentiles(spark):
    """Every reported [p_lo, p_hi] interval contains the TRUE exact
    percentile value (rank contract ceil(pct*n/100)), and the bucket
    span is 2^level."""
    from flink_example_spark.operators.sketch import dyadic_quantiles

    rows = [("g", float(((i * 37) % 977) ** 2) / 100.0) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, val double").repartition(8)
    out = {
        r["feature"]: r["value"]
        for r in dyadic_quantiles(df, "g", "val", k=64).collect()
    }
    vq = sorted(int(v * 1_000_000 + 0.5) for _, v in rows)
    n = len(vq)
    assert out["n"] == n
    assert out["n_buckets"] <= 64
    for pct in (25, 50, 75, 90):
        exact = vq[(pct * n + 99) // 100 - 1]
        lo, hi = out[f"p{pct}_lo"], out[f"p{pct}_hi"]
        assert lo <= exact <= hi
        assert hi - lo + 1 == 1 << out["level"]


def test_dyadic_quantiles_negative_values_raise(spark):
    import pytest

    from flink_example_spark.operators.sketch import dyadic_quantiles

    df = spark.createDataFrame([("g", -1.5)], "g string, val double")
    with pytest.raises(Exception, match="negative shifted value"):
        dyadic_quantiles(df, "g", "val", k=64).collect()


def test_streaming_dyadic_jvm_converges_to_batch(spark):
    """The live complete-mode dyadic aggregation replayed over 3 chunks
    equals batch dyadic_quantiles bit-for-bit (merge-order invariance
    across micro-batches)."""
    from flink_example_spark.operators.sketch import dyadic_quantiles
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_dyadic_jvm,
    )
    from flink_example_spark.tables import load_tables

    sf = "/root/testdata/sf0.001"
    live = sorted(
        tuple(r) for r in run_streaming_dyadic_jvm(spark, sf, k=64).collect()
    )
    ev = load_tables(spark, sf, register=False)["events"]
    batch = sorted(
        tuple(r)
        for r in dyadic_quantiles(ev, "event_type", "value", k=64).collect()
    )
    assert live == batch


def _mg_exact(pairs):
    from collections import Counter

    return Counter(k for k in pairs)


def test_mg_summary_bound_and_guarantee_across_partitionings(spark):
    """The MG invariants that hold on EVERY merge order: est <= f (no
    overcount), f - est <= n/(k+1) (bounded undercount), and every key
    with f > n/(k+1) is present. Checked across three different
    partitionings of a skewed multiset."""
    import random

    from flink_example_spark.jvm import register_mg_topk

    k = 8
    fm = register_mg_topk(spark, k)
    keys = (
        ["heavy"] * 400
        + ["second"] * 250
        + [f"mid{i}" for i in range(20) for _ in range(10)]
        + [f"tail{i}" for i in range(150)]
    )
    exact = _mg_exact(keys)
    n = len(keys)
    for seed, parts in ((1, 2), (2, 32), (3, 5)):
        random.Random(seed).shuffle(keys)
        df = spark.createDataFrame([(x,) for x in keys], "k string").repartition(parts)
        arr = df.groupBy().agg(F.expr(f"{fm}(k)").alias("a")).first()["a"]
        summary = dict(
            (e.rsplit("\t", 1)[0], int(e.rsplit("\t", 1)[1])) for e in arr
        )
        assert len(summary) <= k
        for key, est in summary.items():
            assert est <= exact[key]
            assert exact[key] - est <= n / (k + 1)
        for key, f in exact.items():
            if f > n / (k + 1):
                assert key in summary, (key, f, n)


def test_mg_heavy_hitters_certified_read_matches_exact(spark):
    """The recorded relation (exact-heavy semi-join MG survivors) equals
    the pure exact filter — the deterministic read the MG guarantee
    certifies — and the plan carries the map-side partial_ mode."""
    from flink_example_spark.operators.sketch import mg_heavy_hitters

    rows = [("g%d" % (i % 2), "k%d" % min(i % 37, (i * i) % 11)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, key string").repartition(8)
    out = mg_heavy_hitters(df, "g", "key", k=8)
    got = sorted(tuple(r) for r in out.collect())
    from collections import Counter

    exact: dict = {}
    for g_, k_ in rows:
        exact.setdefault(g_, Counter())[k_] += 1
    want = sorted(
        (g_, k_, c, sum(cnt.values()))
        for g_, cnt in exact.items()
        for k_, c in cnt.items()
        if c * 9 > sum(cnt.values())
    )
    assert got == want and len(want) > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial_mg_topk8" in plan


def test_dyadic_preagg_form_bit_identical(spark):
    """The weighted-input form (codegen pre-aggregation feeding
    fes.DyadicHistW with (value, count) pairs) returns the bit-identical
    relation — a weighted multiset is the same multiset under the
    invariance theorem — and plans the weighted partial_ mode."""
    from flink_example_spark.operators.sketch import dyadic_quantiles

    df = spark.range(0, 20000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        ((F.col("id") * 17) % 300 / 7.0).alias("v"),
    ).repartition(8)
    a = sorted(tuple(r) for r in dyadic_quantiles(df, "g", "v", k=64).collect())
    b_df = dyadic_quantiles(df, "g", "v", k=64, pre_agg=True)
    b = sorted(tuple(r) for r in b_df.collect())
    assert a == b
    plan = b_df._jdf.queryExecution().executedPlan().toString()
    assert "partial_dyadic_histw64" in plan


def test_dyadic_selectivity_bounds_contain_truth(spark):
    """n_min <= true range count <= n_max for every group and range —
    exact bounds by construction (only edge-bucket membership is
    unresolved); full-domain range is exact (n_min == n_max == n)."""
    from flink_example_spark.operators.sketch import dyadic_selectivity

    rows = [("g%d" % (i % 2), float((i * 37) % 977)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, val double").repartition(8)
    ranges = ((0.0, 100.0), (100.0, 500.0), (0.0, 1000.0))
    out = {
        (r["g"], r["feature"]): r["value"]
        for r in dyadic_selectivity(df, "g", "val", ranges, k=64).collect()
    }
    from collections import Counter

    per = {}
    for g_, v in rows:
        per.setdefault(g_, []).append(int(v * 1_000_000 + 0.5))
    for g_, vs in per.items():
        for i, (lo, hi) in enumerate(ranges):
            t = sum(1 for v in vs if int(lo * 1e6) <= v < int(hi * 1e6))
            assert out[(g_, f"r{i}_n_min")] <= t <= out[(g_, f"r{i}_n_max")]
        # the full-domain range resolves exactly
        assert out[(g_, "r2_n_min")] == out[(g_, "r2_n_max")] == len(vs)


def test_streaming_mg_jvm_converges_to_batch(spark):
    """The live MG certified read over the 3-chunk replay equals batch
    mg_heavy_hitters exactly (the guarantee holds on every merge order,
    including micro-batch arrival)."""
    from flink_example_spark.operators.sketch import mg_heavy_hitters
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_mg_jvm,
    )
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    live = sorted(
        tuple(r) for r in run_streaming_mg_jvm(spark, sf, k=8).collect()
    )
    ev = load_table(spark, sf, "events").selectExpr(
        "event_type", "CAST(floor(value / 25) AS BIGINT) AS band"
    )
    batch = sorted(
        tuple(r)
        for r in mg_heavy_hitters(ev, "event_type", "band", k=8).collect()
    )
    assert live == batch


def test_dyadic_quantiles_shift_supports_negative_values(spark):
    """A metric with a known lower bound runs through the histogram via
    the shift device: reported bounds come back in the caller's units
    (shift subtracted), contain the exact percentiles, and DuckDB
    agrees with the shifted oracle."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.sketch import (
        dyadic_quantiles,
        dyadic_quantiles_oracle,
    )

    rows = [("g", float(((i * 37) % 977) - 500)) for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, val double")
    shift = 500 * 1_000_000
    out = {
        r["feature"]: r["value"]
        for r in dyadic_quantiles(df, "g", "val", k=64, shift=shift).collect()
    }
    # integer-valued doubles: floor(v*1e6 + 0.5) == v*1e6 exactly,
    # negatives included
    vq = sorted(int(v) * 1_000_000 for _, v in rows)
    n = len(vq)
    assert out["n"] == n
    for pct in (25, 50, 75, 90):
        exact = vq[(pct * n + 99) // 100 - 1]
        assert out[f"p{pct}_lo"] <= exact <= out[f"p{pct}_hi"]
    assert out["p25_lo"] < 0  # bounds really are in caller units

    con = duckdb.connect()
    con.register("neg_t", pd.DataFrame(rows, columns=["g", "val"]))
    ora = con.execute(
        dyadic_quantiles_oracle("neg_t", ["g"], "val", k=64, shift=shift)
    ).df()
    got = {(r["feature"]): int(r["value"]) for _, r in ora.iterrows()}
    assert got == {k: int(v) for k, v in out.items()}


def test_streaming_dyadic_daily_converges_to_batch(spark):
    """The event-time-windowed dyadic stream (one O(k) buffer per day
    window) replays to the bit-identical batch per-day sketch —
    window('1 day').start == date_trunc('day') under the UTC pin."""
    from flink_example_spark.operators.sketch import dyadic_quantiles
    from flink_example_spark.plans.events_demo import load_events
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_dyadic_daily,
    )

    sf = "/root/testdata/sf0.001"
    live = sorted(
        tuple(r)
        for r in run_streaming_dyadic_daily(spark, sf, k=64).collect()
    )
    ev = load_events(spark, sf).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "value"
    )
    batch = sorted(
        tuple(r)
        for r in dyadic_quantiles(
            ev, "day", "value", k=64, pcts=(50, 90)
        ).collect()
    )
    assert live == batch


def test_dyadic_rollup_bounds_contain_weekly_percentiles(spark):
    """Weekly bounds rolled up FROM day sketches (no raw rescan in the
    rollup stage) still contain the exact weekly percentiles, and the
    rollup level is >= every member day's level (the honesty floor)."""
    from flink_example_spark.operators.sketch import dyadic_rollup
    from flink_example_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = dyadic_rollup(ev, k=64, pcts=(50, 90)).collect()
    byweek: dict = {}
    for r in out:
        byweek.setdefault(r["week"], {})[r["feature"]] = r["value"]
    rows = ev.selectExpr(
        "date_trunc('week', ts) AS week",
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vq",
    ).collect()
    per: dict = {}
    for r in rows:
        per.setdefault(r["week"], []).append(r["vq"])
    assert set(per) == set(byweek)
    for wkey, vals in per.items():
        vals.sort()
        n = len(vals)
        got = byweek[wkey]
        assert got["n"] == n
        assert got["n_buckets"] <= 64
        for pct in (50, 90):
            exact = vals[(pct * n + 99) // 100 - 1]
            assert got[f"p{pct}_lo"] <= exact <= got[f"p{pct}_hi"]
            assert (
                got[f"p{pct}_hi"] - got[f"p{pct}_lo"] + 1
                == 1 << got["level"]
            )


def test_streaming_dyadic_rollup_converges_to_batch(spark):
    """Live weekly bounds (read-time rollup over the streamed day-sketch
    state) equal batch dyadic_rollup bit-for-bit."""
    from flink_example_spark.operators.sketch import dyadic_rollup
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_dyadic_rollup,
    )
    from flink_example_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    live = sorted(
        tuple(r)
        for r in run_streaming_dyadic_rollup(spark, sf, k=64).collect()
    )
    batch = sorted(
        tuple(r)
        for r in dyadic_rollup(
            load_table(spark, sf, "events"), k=64, pcts=(50, 90)
        ).collect()
    )
    assert live == batch


def test_kmv_rolling_equals_from_scratch_windows(spark):
    """The no-rescan rolling read (bottom-k of the union of stored day
    sketches) equals kmv_distinct built FROM SCRATCH on each trailing
    window — the KMV merge property made executable; sparse windows
    (< k distinct) come out exact."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from flink_example_spark.operators.sketch import (
        kmv_distinct,
        kmv_rolling_distinct,
    )

    rows = []
    for d in range(12):
        # day d carries users d*3 .. d*3+40 — windows overlap heavily
        for u in range(d * 3, d * 3 + 41):
            rows.append(
                (
                    datetime(2024, 1, 1 + d, 12, 0, tzinfo=timezone.utc)
                    .replace(tzinfo=None),
                    u,
                )
            )
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    rolling = {
        r["day"]: (r["n_kept"], r["kth_hash"], r["est_distinct"])
        for r in kmv_rolling_distinct(df, "ts", "user_id", k=16).collect()
    }
    days = sorted(rolling)
    assert len(days) == 12
    for day in days:
        win = df.filter(
            (F.col("ts") >= F.lit(day) - F.expr("interval 6 days"))
            & (F.date_trunc("day", F.col("ts")) <= F.lit(day))
        ).select(F.lit(0).alias("g"), F.col("user_id").cast("string").alias("u"))
        scratch = kmv_distinct(win, "g", "u", k=16).collect()[0]
        assert rolling[day] == (
            scratch["n_kept"],
            scratch["kth_hash"],
            scratch["est_distinct"],
        ), day


def test_streaming_kmv_rolling_converges_to_batch(spark):
    """The live rolling-distinct profile (per-day KMV state in event-
    time windows, rolling read at read time) replays to the
    bit-identical batch kmv_rolling_distinct."""
    from flink_example_spark.operators.sketch import kmv_rolling_distinct
    from flink_example_spark.plans.events_demo import load_events
    from flink_example_spark.streaming.sketch_stream import (
        run_streaming_kmv_rolling,
    )

    sf = "/root/testdata/sf0.001"
    live = sorted(
        tuple(r) for r in run_streaming_kmv_rolling(spark, sf).collect()
    )
    batch = sorted(
        tuple(r)
        for r in kmv_rolling_distinct(
            load_events(spark, sf), "ts", "user_id", k=16
        ).collect()
    )
    assert live == batch


def test_mp_sketch_local_gate_matches_distributed(spark):
    """r14 crossover: the driver-side phase-2 halving must be BIT-equal to
    the distributed two-phase rank device on the same survivors."""
    import os

    from flink_example_spark.operators.sketch import mp_quantile_sketch

    rows = [(int((i * 37) % 1000), i) for i in range(4000)]
    df = spark.createDataFrame(rows, "value long, event_id long")
    kw = dict(n_shards=4, rounds_local=3, rounds_merge=3, pcts=(10, 50, 99))
    local = sorted(
        tuple(r) for r in mp_quantile_sketch(df, "value", "event_id", **kw).collect()
    )
    os.environ["SPARK_GRAFT_MP_LOCAL_MAX"] = "0"
    try:
        dist = sorted(
            tuple(r)
            for r in mp_quantile_sketch(df, "value", "event_id", **kw).collect()
        )
    finally:
        del os.environ["SPARK_GRAFT_MP_LOCAL_MAX"]
    assert local == dist
