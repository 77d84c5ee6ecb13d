"""VARIANT-based JSON extraction: typed reads, NULL on missing path or
type mismatch (DuckDB ->> + CAST semantics)."""

from __future__ import annotations

from flink_example_spark.functions.json_ops import flatten_json, props_stats


def test_flatten_json_typed_and_missing(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "x"}'),
            (2, '{"tag": "y"}'),          # k missing -> NULL
            (3, '{"k": "not a number"}'),  # type mismatch -> NULL
            (4, None),                     # null payload -> NULL
        ],
        "id long, props string",
    )
    out = {
        r["id"]: (r["k"], r["tag"])
        for r in flatten_json(
            df, "props", [("k", "$.k", "bigint"), ("tag", "$.tag", "string")]
        ).collect()
    }
    assert out == {1: (7, "x"), 2: (None, "y"), 3: (None, None), 4: (None, None)}


def test_props_stats_counts_presence(spark):
    df = spark.createDataFrame(
        [
            ("a", '{"k": 1}'),
            ("a", '{"k": 3}'),
            ("a", "{}"),
            ("b", '{"k": 5}'),
        ],
        "event_type string, props string",
    )
    rows = {r["event_type"]: r.asDict() for r in props_stats(df).collect()}
    assert rows["a"]["n_events"] == 3
    assert rows["a"]["n_with_field"] == 2
    assert rows["a"]["sum_k"] == 4
    assert rows["a"]["n_distinct_k"] == 2
    assert rows["b"]["min_k"] == rows["b"]["max_k"] == 5
