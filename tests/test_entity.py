"""Entity resolution (operators/entity.py): exact-group + SymSpell join +
transitive clustering, canonical survivor mapping."""

from __future__ import annotations

from flink_example_spark.operators.entity import record_links, resolve_entities


def _records(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_resolve_merges_exact_and_typo_variants(spark):
    df = _records(
        spark,
        [
            (1, "Acme Corp"),
            (2, "acme corp"),       # exact after normalization
            (3, "acme corpp"),      # insertion typo, dist 1
            (4, "Beta LLC"),
        ],
    )
    ents = {
        r["canonical_id"]: (r["canonical_name"], r["n_variants"], r["n_records"])
        for r in resolve_entities(df, max_dist=1).collect()
    }
    assert ents[1] == ("acme corp", 2, 3)
    assert ents[4] == ("beta llc", 1, 1)


def test_transitive_chain_clusters_beyond_pair_distance(spark):
    # abc ~ abcd ~ abcde: ends are dist 2 apart but share one cluster
    df = _records(spark, [(10, "abc"), (20, "abcd"), (30, "abcde")])
    ents = resolve_entities(df, max_dist=1).collect()
    assert len(ents) == 1
    assert ents[0]["canonical_id"] == 10 and ents[0]["n_variants"] == 3


def test_record_links_maps_every_record(spark):
    df = _records(
        spark, [(1, "acme corp"), (2, "acme corpp"), (3, "zzz inc"), (4, "ACME corp")]
    )
    links = {r["id"]: r["canonical_id"] for r in record_links(df, max_dist=1).collect()}
    assert links == {1: 1, 2: 1, 3: 3, 4: 1}


def test_deletion_typo_requires_dist2_when_doubled(spark):
    # two edits away with NO bridge record: separate at dist 1, merged at 2
    df = _records(spark, [(1, "acme corp"), (2, "acme corpppp")])
    assert resolve_entities(df, max_dist=1).count() == 2


def test_token_resolution_catches_truncation_edit_distance_cannot(spark):
    from flink_example_spark.operators.entity import resolve_entities_tokens

    df = _records(
        spark,
        [
            (1, "acme global corp"),
            (2, "acme global"),       # truncated: J = 2/3 >= 1/2
            (3, "zenith systems"),
        ],
    )
    ents = {
        r["canonical_id"]: (r["n_variants"], r["n_records"])
        for r in resolve_entities_tokens(df).collect()
    }
    assert ents == {1: (2, 2), 3: (1, 1)}


def test_token_resolution_transitive_via_shared_truncation(spark):
    from flink_example_spark.operators.entity import resolve_entities_tokens

    # "alpha" bridges "alpha ring" and "alpha bolt" (each J=1/2 with it)
    # even though the two full names are only J=1/3 with each other
    df = _records(spark, [(1, "alpha ring"), (2, "alpha bolt"), (3, "alpha")])
    ents = resolve_entities_tokens(df).collect()
    assert len(ents) == 1 and ents[0]["canonical_id"] == 1


def test_incremental_links_exact_fuzzy_new(spark):
    from flink_example_spark.operators.entity import (
        canonical_name_map,
        incremental_links,
    )

    base = _records(spark, [(1, "acme corp"), (2, "acme corpp"), (10, "zenith")])
    known = canonical_name_map(base)
    new = _records(
        spark,
        [
            (20, "Acme Corp"),    # exact (after normalization) -> cid 1
            (21, "acme cord"),    # fuzzy dist-1 of "acme corp" -> cid 1
            (22, "brand new co"), # nothing near -> new entity 22
            (23, "brand new co"), # same new name -> same new entity 22
        ],
    )
    got = {
        r["id"]: (r["canonical_id"], r["method"])
        for r in incremental_links(new, known).collect()
    }
    assert got == {
        20: (1, "exact"),
        21: (1, "fuzzy"),
        22: (22, "new"),
        23: (22, "new"),
    }
