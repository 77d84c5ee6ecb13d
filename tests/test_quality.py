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
