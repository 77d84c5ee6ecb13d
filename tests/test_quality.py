"""Governance/privacy audits (operators/quality.py)."""

from __future__ import annotations

from flink_example_spark.operators.quality import t_closeness


def test_t_closeness_known_emd(spark):
    # group a: all sensitive=1; group b: all sensitive=2; global is 50/50.
    # Ordered EMD of each group vs global = 0.5 exactly -> 500000 ppm.
    rows = [("a", 1), ("a", 1), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "grp string, s long")
    out = {r["grp"]: r for r in t_closeness(df, ["grp"], "s", t_ppm=400_000).collect()}
    assert out["a"]["emd_ppm"] == 500_000
    assert out["b"]["emd_ppm"] == 500_000
    assert out["a"]["breaches"] == 1 and out["b"]["breaches"] == 1


def test_t_closeness_uniform_group_is_zero(spark):
    # a group mirroring the global distribution has EMD 0
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "grp string, s long")
    out = {r["grp"]: r for r in t_closeness(df, ["grp"], "s").collect()}
    assert out["a"]["emd_ppm"] == 0 and out["a"]["breaches"] == 0
    assert out["b"]["emd_ppm"] == 0


def test_t_closeness_skips_single_value_domain(spark):
    # m == 1 -> EMD undefined (division by m-1) -> no rows, no crash
    df = spark.createDataFrame([("a", 5), ("b", 5)], "grp string, s long")
    assert t_closeness(df, ["grp"], "s").count() == 0


def test_ref_integrity_counts_orphans_and_nulls(spark):
    from flink_example_spark.operators.quality import ref_integrity

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = ref_integrity([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert r["n_rows"] == 6
    assert r["n_null_fk"] == 1
    assert r["n_orphan_rows"] == 2  # the two 99s
    assert r["n_orphan_keys"] == 1
    assert r["holds"] == 0


def test_ref_integrity_clean_fk_holds(spark):
    from flink_example_spark.operators.quality import ref_integrity

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    r = ref_integrity([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert (r["n_orphan_rows"], r["n_orphan_keys"], r["holds"]) == (0, 0, 1)


def test_compression_signal_matches_direct_zlib(spark):
    """The rows-only registry row: pin the Spark mapInPandas path against a
    direct pandas+zlib computation over the same parquet (independent of
    the Spark plumbing — same zlib build, so this checks the distribution
    path: repartition, Arrow batching, schema, integer division)."""
    import zlib

    import pandas as pd

    from flink_example_spark.operators.text import compression_signal

    path = "/root/testdata/sf0.001/documents.parquet"
    docs = spark.read.parquet(path)
    got = (
        compression_signal(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = pd.read_parquet(path, columns=["doc_id", "text"]).sort_values(
        "doc_id"
    )
    raw = pdf["text"].fillna("").str.encode("utf-8")
    want_bytes = raw.str.len().astype("int64").tolist()
    want_comp = [len(zlib.compress(b, 6)) for b in raw]
    assert got["doc_id"].tolist() == pdf["doc_id"].astype("int64").tolist()
    assert got["n_bytes"].tolist() == want_bytes
    assert got["n_compressed"].tolist() == want_comp
    assert got["ratio_milli"].tolist() == [
        (c * 1000) // max(b, 1) for c, b in zip(want_comp, want_bytes)
    ]
    # the signal separates: ratios are non-trivial (not all equal)
    assert got["ratio_milli"].nunique() > 1


def test_deletion_cascade_counts_exact_blast_radius(spark):
    """Planted cascade: request subjects' orders and their lineitems —
    and nothing else — are counted at each level; ppm is the exact
    integer division."""
    from flink_example_spark.operators.quality import deletion_cascade

    cust = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)],
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (12, 1), (13, 1), (13, 2)],
        "l_orderkey long, l_linenumber long",
    )
    out = {
        r["table_name"]: (r["n_rows"], r["n_deleted"], r["deleted_ppm"])
        for r in deletion_cascade(
            cust, orders, li, request_pred="c_custkey IN (1, 3)"
        ).collect()
    }
    assert out["customer"] == (4, 2, 500_000)
    assert out["orders"] == (4, 3, 750_000)  # orders 10, 11, 13
    assert out["lineitem"] == (6, 5, 833_333)  # all but order 12's line
