"""Z-order layout operators (operators/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_example_spark.operators.layout import (
    zorder_bucket_stats,
    zorder_index,
    zorder_layout,
)


def _z(spark, x, y, bits):
    df = spark.createDataFrame([(x, y)], "x long, y long")
    return df.select(
        zorder_index([F.col("x"), F.col("y")], bits=bits).alias("z")
    ).collect()[0]["z"]


def _ref_interleave(vals, bits):
    z = 0
    for c, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + c)
    return z


def test_zorder_bit_interleave_known_values(spark):
    # x=0b11, y=0b01 -> bits: x0->0, y0->1, x1->2, y1->3 => 0b0111 = 7
    assert _z(spark, 3, 1, bits=2) == 7
    assert _z(spark, 0, 0, bits=4) == 0
    for x, y in [(5, 9), (1023, 0), (0, 1023), (700, 300)]:
        assert _z(spark, x, y, bits=10) == _ref_interleave([x, y], 10)


def test_zorder_validation(spark):
    with pytest.raises(ValueError):
        zorder_index([F.col("x")], bits=4)
    with pytest.raises(ValueError):
        zorder_index([F.col("x"), F.col("y")], bits=32)


def test_zorder_layout_partitions_are_disjoint_z_ranges(spark):
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    laid = zorder_layout(df, [F.col("x"), F.col("y")], n_files=8, bits=6)
    parts = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in parts)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "range partitions must cover disjoint z-ranges"


def test_zorder_bucket_stats_boxes(spark):
    # two clusters far apart in both dims: their buckets must not mix, and
    # each bucket's bounding box stays inside its cluster
    rows = [(x, y) for x in range(0, 8) for y in range(0, 8)]
    rows += [(x, y) for x in range(56, 64) for y in range(56, 64)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = zorder_bucket_stats(
        df, {"x": F.col("x"), "y": F.col("y")}, bits=6, bucket_bits=2
    ).collect()
    assert sum(r["n"] for r in stats) == len(rows)
    for r in stats:
        lo_cluster = r["x_max"] < 8 and r["y_max"] < 8
        hi_cluster = r["x_min"] >= 56 and r["y_min"] >= 56
        assert lo_cluster or hi_cluster, "bucket mixes the two clusters"


def test_zorder_write_prunes_files_on_both_dims(spark, tmp_path):
    # the actual pay-off claim: a predicate on EITHER dimension of a
    # z-ordered write touches a small fraction of files; the same data
    # written hash-distributed touches all of them
    df = spark.range(8192).select(
        (F.col("id") % 91).alias("x"), ((F.col("id") * 7) % 89).alias("y")
    )
    zdir, rdir = str(tmp_path / "z"), str(tmp_path / "r")
    zorder_layout(df, [F.col("x"), F.col("y")], n_files=16, bits=7).write.parquet(zdir)
    df.repartition(16).write.parquet(rdir)

    def files_touched(path, pred):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    for pred in (F.col("x") < 8, F.col("y") < 8):
        z = files_touched(zdir, pred)
        r = files_touched(rdir, pred)
        # parquet row-group stats let Spark skip z-files whose bounding
        # box excludes the predicate; the random layout cannot skip any
        assert z < r, f"z-order touched {z} files, random {r}"
        assert z <= 8


def test_range_partition_plan_balances_and_exposes_skew(spark):
    from flink_example_spark.operators.layout import range_partition_plan

    rows = [(k,) for k in [1] * 10 + [2] + [3]]
    df = spark.createDataFrame(rows, "k long")
    got = {
        r["bucket"]: (r["lo_key"], r["hi_key"], r["n_rows"], r["n_keys"])
        for r in range_partition_plan(df, "k", n_buckets=2).collect()
    }
    # hot key 1 fills bucket 0 alone; keys 2,3 share bucket 1
    assert got == {0: (1, 1, 10, 1), 1: (2, 3, 2, 2)}


def test_range_partition_plan_uniform_keys_split_evenly(spark):
    from flink_example_spark.operators.layout import range_partition_plan

    rows = [(k,) for k in range(1, 5) for _ in range(4)]
    df = spark.createDataFrame(rows, "k long")
    got = {r["bucket"]: r["n_rows"] for r in
           range_partition_plan(df, "k", n_buckets=4).collect()}
    assert got == {0: 4, 1: 4, 2: 4, 3: 4}


def test_sort_advisor_detects_presorted_column(spark):
    """A column already correlated with ingest order shows a LOW current
    ratio; a shuffled column shows ~1e6 current but near-perfect sorted."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.layout import sort_advisor

    df = spark.range(4000).select(
        F.col("id"),
        F.col("id").alias("mono"),
        ((F.col("id") * 2654435761) % 4000).alias("shuffled"),
    )
    rows = {
        r["col"]: r
        for r in sort_advisor(
            df, "id", [("mono", "mono"), ("shuffled", "shuffled")], rows_per_file=500
        ).collect()
    }
    # monotone column: each of 8 files covers ~1/8 of the span either way
    assert rows["mono"]["ratio_current_ppm"] < 150_000
    assert rows["mono"]["ratio_sorted_ppm"] < 150_000
    # shuffled column: current layout prunes nothing, sorted layout does
    assert rows["shuffled"]["ratio_current_ppm"] > 900_000
    assert rows["shuffled"]["ratio_sorted_ppm"] < 150_000


def test_compaction_plan_largest_first_cuts(spark):
    from flink_example_spark.operators.layout import compaction_plan

    # sizes desc: 90, 60, 40, 30, 10; target 100
    # excl cumsums: 0, 90, 150, 190, 220 -> bins 0,0,1,1,2
    files = spark.createDataFrame(
        [("a", 40), ("b", 90), ("c", 10), ("d", 60), ("e", 30)],
        "file_id string, bytes long",
    )
    out = {r["bin"]: r for r in compaction_plan(files, target_bytes=100).collect()}
    assert out[0]["n_files"] == 2 and out[0]["total_bytes"] == 150
    assert out[1]["n_files"] == 2 and out[1]["total_bytes"] == 70
    assert out[2]["n_files"] == 1 and out[2]["total_bytes"] == 10
    assert out[0]["is_full"] == 1 and out[1]["is_full"] == 0
    assert out[0]["max_file_bytes"] == 90 and out[2]["min_file_bytes"] == 10


def test_compaction_plan_drops_empty_files(spark):
    from flink_example_spark.operators.layout import compaction_plan

    files = spark.createDataFrame(
        [("a", 0), ("b", None), ("c", 5)], "file_id string, bytes long"
    )
    rows = compaction_plan(files, target_bytes=10).collect()
    assert len(rows) == 1 and rows[0]["n_files"] == 1


def _xy2d_ref(order, x, y):
    """Classic public xy2d loop — the reference for the state machine."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _sm(bits, x, y):
    from flink_example_spark.operators.layout import _H_DIGIT, _H_NEXT

    st = out = 0
    for i in range(bits):
        sh = bits - 1 - i
        q = st * 4 + ((x >> sh) & 1) * 2 + ((y >> sh) & 1)
        out += _H_DIGIT[q] << (2 * sh)
        st = _H_NEXT[q]
    return out


def test_hilbert_state_machine_matches_reference_and_is_adjacent():
    """The derived 4-state machine equals the classic xy2d loop on the
    full 16x16 grid, and consecutive Hilbert indices are always
    grid-ADJACENT (Manhattan distance 1) — the defining jump-free
    property Morton lacks."""
    bits = 4
    inv = {}
    for x in range(16):
        for y in range(16):
            d = _sm(bits, x, y)
            assert d == _xy2d_ref(1 << bits, x, y)
            inv[d] = (x, y)
    assert len(inv) == 256  # bijection
    for i in range(255):
        (x0, y0), (x1, y1) = inv[i], inv[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_hilbert_spark_matches_state_machine_and_duckdb(spark):
    """The chained-projection Spark build and the CTE-chain DuckDB twin
    both equal the Python state machine on an 8x8 grid (bits=3), and on
    a small random-ish fixture at bits=8."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from flink_example_spark.operators.layout import (
        hilbert_index_df,
        hilbert_sql,
    )

    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["__h"]
        for r in hilbert_index_df(df, "x", "y", bits=3).collect()
    }
    assert got == {(x, y): _sm(3, x, y) for x, y in rows}

    con = duckdb.connect()
    con.register("hgrid", pd.DataFrame(rows, columns=["x", "y"]))
    ora = {
        (x, y): h
        for x, y, h in con.execute(
            hilbert_sql("SELECT * FROM hgrid", "x", "y", bits=3)
        ).fetchall()
    }
    assert got == {k: int(v) for k, v in ora.items()}

    pts = [((i * 37) % 256, (i * 101) % 256) for i in range(50)]
    df8 = spark.createDataFrame(pts, "x long, y long")
    got8 = {
        (r["x"], r["y"]): r["__h"]
        for r in hilbert_index_df(df8, "x", "y", bits=8).collect()
    }
    assert got8 == {(x, y): _sm(8, x, y) for x, y in pts}


def test_hilbert_boxes_tighter_than_morton_on_unaligned_segments():
    """The locality claim, measured where it actually bites: on
    power-of-two-ALIGNED buckets both curves give perfect rectangles
    (they tie), but real files are arbitrary curve segments — bucketing
    the full 64x64 grid into 100-cell segments (d div 100), Morton's
    quadrant jumps blow some bounding boxes across the grid while
    Hilbert segments stay compact. Average AND worst-case half-perimeter
    must be strictly smaller for Hilbert. (Pure-curve property — runs on
    the verified state machine, no Spark session needed.)"""
    from collections import defaultdict

    bits = 6

    def morton(x, y):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    def boxes(index_fn):
        seg = defaultdict(list)
        for x in range(64):
            for y in range(64):
                seg[index_fn(x, y) // 100].append((x, y))
        out = []
        for pts in seg.values():
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            out.append((max(xs) - min(xs)) + (max(ys) - min(ys)))
        return out

    hb = boxes(lambda x, y: _sm(bits, x, y))
    zb = boxes(morton)
    assert len(hb) == len(zb)
    assert sum(hb) / len(hb) < sum(zb) / len(zb)
    assert max(hb) < max(zb)


def test_hilbert_index_sixteen_bit_levels(spark):
    """The chained-projection build stays correct (and the plan stays
    tractable) at the full 16-bit depth: spot points match the state
    machine, output is 32 bits."""
    from flink_example_spark.operators.layout import hilbert_index_df

    pts = [(0, 0), (65535, 65535), (12345, 54321), (40000, 1)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["__h"]
        for r in hilbert_index_df(df, "x", "y", bits=16).collect()
    }
    assert got == {(x, y): _sm(16, x, y) for x, y in pts}
    assert all(0 <= h < (1 << 32) for h in got.values())


def test_hilbert_layout_partitions_are_contiguous_segments(spark):
    """Each written partition covers one contiguous Hilbert range: the
    per-partition [min __h, max __h] intervals do not overlap."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.layout import hilbert_layout

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = hilbert_layout(df, "x", "y", n_files=8, bits=5)
    spans = (
        out.select(F.spark_partition_id().alias("pid"), "__h")
        .groupBy("pid")
        .agg(F.min("__h").alias("lo"), F.max("__h").alias("hi"))
        .collect()
    )
    ivs = sorted((r["lo"], r["hi"]) for r in spans)
    assert all(ivs[i][1] < ivs[i + 1][0] for i in range(len(ivs) - 1))
