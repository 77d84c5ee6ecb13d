"""Driver-contract invariants: the shape the grading driver depends on.
Breaks loudly in pytest instead of silently at the driver gate."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_driver_surface_is_exactly_50():
    qs = entrymod.queries()
    assert len(qs) == 50
    assert list(qs) == entrymod.DRIVER_KEYS


def test_every_driver_query_has_an_oracle():
    assert set(entrymod.oracle_sql()) == set(entrymod.queries())


def test_extras_and_driver_keys_disjoint():
    qs, extras = entrymod.queries(), entrymod.extra_queries()
    assert not (set(qs) & set(extras))
    # every extra oracle belongs to an extra query
    assert set(entrymod.extra_oracle_sql()) <= set(extras)


def test_driver_outputs_are_scalar_only(spark):
    """The driver's oracle canonicalizer sorts raw pandas columns before
    hashing; a list/map/struct cell raises `unhashable type` and the row
    errors out before any comparison (CORRECTNESS_r05 ann_kmeans_centroids).
    Every driver-recorded query must therefore emit scalar columns only —
    posexplode/size/element_at the complex value instead."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    # Streaming rows execute a full bounded replay just to expose a schema;
    # each converges row-for-row to a batch twin (they share oracles, so the
    # driver compares them against the same column set) — audit the twin.
    batch_twin = {
        "streaming_features_agg": "features_agg",
        "streaming_pipeline_e2e": "training_examples",
        "streaming_incremental_history": "feature_history",
        "streaming_dedup_exact": "dedup_exact",
        "streaming_tumbling_counts": "tumbling_window_counts",
        "streaming_session_windows": "session_window_counts",
        "streaming_interval_join": "range_join_prior_errors",
    }
    allq = {**entrymod.queries(), **entrymod.extra_queries()}
    sf_dir = "/root/testdata/sf0.001"
    offenders = []
    for name in entrymod.DRIVER_KEYS:
        fn = allq[batch_twin.get(name, name)]
        for field in fn(spark, sf_dir).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(f"{name}.{field.name}: {field.dataType}")
    assert not offenders, f"non-scalar driver outputs: {offenders}"


def test_all_callables_are_two_arg():
    import inspect

    for name, fn in {**entrymod.queries(), **entrymod.extra_queries()}.items():
        n_required = sum(
            1
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        assert n_required == 2, f"{name} must take (spark, sf_dir)"
