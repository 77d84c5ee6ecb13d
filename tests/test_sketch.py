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
