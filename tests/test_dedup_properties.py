"""Property tests for paragraph_dedup: a pure-Python model is the oracle
(same spirit as the as-of hypothesis suite — the two implementations share
no code paths)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_example_spark.operators.dedup import paragraph_dedup

paras = st.sampled_from(["alpha", "beta", "gamma", "delta", ""])
doc_strategy = st.lists(
    st.lists(paras, min_size=1, max_size=5), min_size=1, max_size=6
)


def model(docs: list[list[str]]) -> dict[int, tuple[str, int, int]]:
    keeper: dict[str, tuple[int, int]] = {}
    for i, ps in enumerate(docs):
        for j, p in enumerate(ps):
            if p not in keeper:
                keeper[p] = (i, j)
    out = {}
    for i, ps in enumerate(docs):
        kept = [p for j, p in enumerate(ps) if keeper[p] == (i, j)]
        out[i] = ("\n".join(kept), len(kept), len(ps) - len(kept))
    return out


@pytest.mark.usefixtures("spark")
@given(docs=doc_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_paragraph_dedup_matches_model(spark, docs):
    rows = [(i, "\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_kept"], r["n_removed"])
        for r in paragraph_dedup(df).collect()
    }
    assert got == model(docs)


@pytest.mark.usefixtures("spark")
@given(docs=doc_strategy)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_paragraph_dedup_idempotent(spark, docs):
    """Deduping an already-deduped corpus removes nothing further — after
    dropping fully-emptied docs, as a real pipeline does (an emptied doc
    serializes to "" which would collide with other emptied docs as a
    spurious empty paragraph)."""
    from pyspark.sql import functions as F

    rows = [(i, "\n".join(ps)) for i, ps in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = (
        paragraph_dedup(df)
        .filter(F.col("n_kept") > 0)
        .select("doc_id", F.col("text_deduped").alias("text"))
    )
    twice = paragraph_dedup(once).collect()
    assert all(r["n_removed"] == 0 for r in twice)


def test_paragraph_dedup_drops_null_text(spark):
    df = spark.createDataFrame([(1, "a\nb"), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    assert set(out) == {1}
    assert out[1]["n_kept"] == 2 and out[1]["n_removed"] == 0


def test_apply_cluster_dedup_keeps_best_quality(spark):
    """One representative per cluster: the max-quality member wins (ties ->
    lowest id); unclustered docs pass through."""
    from flink_example_spark.operators.dedup import apply_cluster_dedup

    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id bigint, q double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)], "doc_id bigint, cluster_id bigint"
    )
    kept = sorted(r["doc_id"] for r in apply_cluster_dedup(docs, clusters, "q").collect())
    # cluster 1: docs 2 and 3 tie at 0.9 -> 2 wins; cluster 4: only member;
    # doc 9 unclustered
    assert kept == [2, 4, 9]


def test_lsh_cross_pairs_finds_planted_matches(spark):
    """Cross-relation LSH: identical vectors always collide (every band),
    dissimilar ones are filtered by the exact-cosine verify."""
    from pyspark.sql import functions as F

    from flink_example_spark.operators.similarity import lsh_cross_pairs
    from flink_example_spark.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    bench = e.filter(F.col("vec_id") < 10)
    hits = lsh_cross_pairs(e, bench, threshold=0.9, n_bands=4).collect()
    self_hits = {(r["probe_id"], r["ref_id"]) for r in hits if r["probe_id"] == r["ref_id"]}
    assert self_hits == {(i, i) for i in range(10)}
    assert all(r["cos"] >= 0.9 for r in hits)


def test_fuzzy_word_pairs_equals_bruteforce(spark):
    """SymSpell deletion-neighborhood join finds exactly the distance<=1
    pairs (substitution, insertion, deletion) — no more, no less."""
    import itertools

    from flink_example_spark.operators.dedup import fuzzy_word_pairs

    words = ["hello", "hellp", "help", "world", "word", "cat", "cart", "ca"]
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id bigint, text string"
    )
    got = {
        (r["word_a"], r["word_b"])
        for r in fuzzy_word_pairs(docs).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        tuple(sorted(p)) for p in itertools.combinations(words, 2) if lev(*p) <= 1
    }
    assert got == want and len(want) >= 4


def test_fuzzy_word_pairs_dist2_equals_bruteforce(spark):
    """Double deletion-expansion: recall stays perfect at distance 2."""
    import itertools

    from flink_example_spark.operators.dedup import fuzzy_word_pairs

    words = ["kitten", "sitten", "sittin", "mitten", "king", "kin", "k", "zebra"]
    docs = spark.createDataFrame([(0, " ".join(words))], "doc_id bigint, text string")
    got = {
        (r["word_a"], r["word_b"]): r["dist"]
        for r in fuzzy_word_pairs(docs, max_dist=2).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    want = {
        tuple(sorted(p)): lev(*p)
        for p in itertools.combinations(words, 2)
        if lev(*p) <= 2
    }
    assert got == want
    assert 2 in got.values() and 1 in got.values()


def test_minhash_portable_keep_first_semantics(spark):
    """Planted exact twins: the lower id survives, the higher id drops;
    docs too short to shingle survive trivially."""
    from flink_example_spark.operators.dedup import minhash_portable_keep

    long_a = "the quick brown fox jumps over the lazy dog " * 20
    long_b = "a completely different document about spark catalyst plans " * 20
    docs = spark.createDataFrame(
        [
            (1, long_a),
            (2, long_b),
            (3, long_a),   # twin of 1 -> dropped
            (4, "tiny"),   # < shingle_k chars -> kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"] for r in minhash_portable_keep(docs).select("doc_id").collect()
    )
    assert kept == [1, 2, 4]


def test_minhash_portable_bucket_minima_injection(spark):
    """Injecting externally-maintained minima (the streaming sink shape)
    reproduces the in-plan result."""
    from flink_example_spark.operators.dedup import (
        minhash_portable_bands,
        minhash_portable_keep,
    )
    from pyspark.sql import functions as F

    text = "some repeated corpus sentence for the minhash test " * 15
    docs = spark.createDataFrame(
        [(i, text if i % 2 else text + f" unique tail {i} " * 10) for i in range(6)],
        "doc_id long, text string",
    )
    bands = minhash_portable_bands(docs)
    minima = bands.groupBy("band", "key").agg(F.min("doc_id").alias("keeper"))
    inplan = sorted(
        r["doc_id"] for r in minhash_portable_keep(docs).select("doc_id").collect()
    )
    injected = sorted(
        r["doc_id"]
        for r in minhash_portable_keep(docs, bucket_minima=minima)
        .select("doc_id")
        .collect()
    )
    assert inplan == injected


def test_sq8_quantization_recall_vs_exact(spark):
    """SQ8 cosine ranking closely tracks the exact ranking: recall@5 over
    the 8 driver queries must be high (dim-8 int8 is a mild quantization),
    and quantized components are integral in [-127, 127]."""
    from flink_example_spark.operators.similarity import (
        cosine_topk,
        quantize_embeddings,
    )
    from flink_example_spark.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    exact = cosine_topk(e, q, k=5)
    sq8 = cosine_topk(quantize_embeddings(e), quantize_embeddings(q), k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    qz = {(r["query_id"], r["neighbor_id"]) for r in sq8.collect()}
    assert len(ex & qz) / len(ex) >= 0.8
    comps = quantize_embeddings(e).select(
        F.explode("embedding").alias("c")
    ).agg(
        F.max(F.abs(F.col("c"))).alias("mx"),
        F.max(F.abs(F.col("c") - F.round(F.col("c")))).alias("frac"),
    ).first()
    assert comps["mx"] <= 127.0
    assert comps["frac"] == 0.0


def test_jl_projection_properties(spark):
    """Rademacher-JL invariants: output dim is out_dim; E[||Px||^2] =
    out_dim * ||x||^2 (norm preservation in expectation, checked as a
    corpus-average ratio); exact duplicates stay cosine-1 neighbors.

    Top-k recall is NOT asserted here: the synthetic embeddings are
    near-uniform (neighbor margins ~0), where any 4x reduction scrambles
    rankings — the driver row's value is the oracle-checked portability
    of the projection, and real structure (duplicates) IS preserved."""
    from flink_example_spark.operators.similarity import (
        cosine_topk,
        jl_project,
        quantize_embeddings,
    )
    from flink_example_spark.tables import load_table
    from pyspark.sql import functions as F

    e = quantize_embeddings(load_table(spark, "/root/testdata/sf0.001", "embeddings"))
    p = jl_project(e, out_dim=16)
    dims = p.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [16]

    def sumsq(df):
        return df.select(
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x * x
            ).alias("n2")
        ).agg(F.avg("n2")).first()[0]

    ratio = sumsq(p) / (16 * sumsq(e))
    assert 0.8 < ratio < 1.25
    # exact twins: re-tag a copy of the corpus with shifted ids; each twin's
    # nearest projected neighbor is its original at cosine ~1
    twins = e.withColumn("vec_id", F.col("vec_id") + 100000).filter(
        F.col("vec_id") < 100005
    )
    hits = cosine_topk(p, jl_project(twins, out_dim=16), k=1).collect()
    assert all(r["neighbor_id"] == r["query_id"] - 100000 for r in hits)
    assert all(r["cos"] > 0.999999 for r in hits)


def test_ppjoin_matches_brute_force_exactly(spark):
    """Prefix filtering must lose NOTHING: PPJoin output == brute-force
    all-pairs exact Jaccard at the same threshold."""
    from itertools import combinations

    from flink_example_spark.operators.dedup import ppjoin_pairs
    from flink_example_spark.operators.text import normalized

    docs = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),       # J(1,2)=4/6
        (3, "alpha beta gamma delta epsilon"),    # J(1,3)=1
        (4, "omega psi chi phi"),
        (5, "omega psi chi phi upsilon"),         # J(4,5)=4/5
        (6, "totally different words here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tn, td = 3, 5
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["jaccard"])
        for r in ppjoin_pairs(df, tn, td).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if td * i >= tn * u:
            want[(a, b)] = (i, i / u)
    assert got == want
    assert (1, 2) in got and (4, 5) in got and (1, 3) in got


def test_pair_graph_stats_chain_vs_clique(spark):
    """A 4-chain (1-2-3-4), a triangle (10,11,12), and one isolated pair
    (20,21): every output column is hand-checkable."""
    from flink_example_spark.operators.dedup import pair_graph_stats

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    rows = {r["cluster_id"]: r.asDict() for r in pair_graph_stats(pairs).collect()}
    chain = rows[1]
    # 4 members, 3 edges, density 2*3000/12 = 500
    assert (chain["size"], chain["n_edges"], chain["density_milli"]) == (4, 3, 500)
    # 3 and 4 have no direct edge to keeper 1
    assert chain["chained_members"] == 2
    # wedges: mid 2 -> (1,3); mid 3 -> (2,4); both open
    assert (chain["wedges"], chain["closed_wedges"]) == (2, 0)
    assert chain["closure_milli"] == 0
    assert chain["hub_members"] == 0
    tri = rows[10]
    assert (tri["size"], tri["n_edges"], tri["density_milli"]) == (3, 3, 1000)
    assert tri["chained_members"] == 0
    # each of the 3 mids closes its single wedge
    assert (tri["wedges"], tri["closed_wedges"], tri["closure_milli"]) == (3, 3, 1000)
    pair = rows[20]
    assert (pair["size"], pair["n_edges"], pair["density_milli"]) == (2, 1, 1000)
    assert pair["wedges"] == 0 and pair["closure_milli"] is None


def test_pair_graph_stats_neighbor_cap_counts_hubs(spark):
    """A star center with degree 3 and cap=2: the hub is counted and the
    truncated wedge set only sees the 2 lowest-id leaves."""
    from flink_example_spark.operators.dedup import pair_graph_stats

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    row = pair_graph_stats(pairs, neighbor_cap=2).collect()[0]
    assert row["size"] == 4 and row["n_edges"] == 3
    assert row["hub_members"] == 1  # the center (degree 3 > cap)
    # leaves keep their single neighbor; the center is truncated to (2,3)
    # -> ONE wedge (2,3), open
    assert (row["wedges"], row["closed_wedges"]) == (1, 0)
    assert row["chained_members"] == 0  # every leaf touches the keeper=1


def test_substring_spans_dedup_surgery_is_byte_exact(spark):
    """Planted cross-doc repeats: the canonical (lowest doc id) copy
    survives byte-for-byte; every other occurrence loses EXACTLY the
    repeated span; adjacent/overlapping repeats merge into one maximal
    removed interval; a span repeated only WITHIN one doc is untouched."""
    from flink_example_spark.operators.dedup import substring_spans_dedup

    span = " ".join(f"s{i}" for i in range(15))  # 15-token repeated span
    uniq = lambda d, n: " ".join(f"u{d}_{i}" for i in range(n))  # noqa: E731
    rows = [
        # doc 1: canonical holder (lowest id) — must stay intact
        (1, uniq(1, 5) + " " + span + " " + uniq(1, 4)),
        # doc 2: same span mid-doc — must lose exactly the 15 tokens
        (2, uniq(2, 3) + " " + span + " " + uniq(2, 6)),
        # doc 3: span at the very start, plus a SECOND copy adjacent to
        # it (overlap/adjacency must merge into ONE maximal interval)
        (3, span + " " + span + " " + uniq(3, 2)),
        # doc 4: an intra-doc-only repeat (never crosses docs) — kept
        (4, uniq(4, 2) + " intra " * 12 + uniq(4, 2)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"], r["n_spans_removed"])
        for r in substring_spans_dedup(df, k=10).collect()
    }
    assert got[1] == (uniq(1, 5) + " " + span + " " + uniq(1, 4), 0, 0)
    assert got[2] == (uniq(2, 3) + " " + uniq(2, 6), 15, 1)
    # doc 3: both copies are non-canonical -> 30 tokens in ONE merged run
    assert got[3] == (uniq(3, 2), 30, 1)
    intra = rows[3][1].split()
    assert got[4] == (" ".join(intra), 0, 0)


def test_substring_spans_dedup_duckdb_parity_planted(spark):
    """The DuckDB twin reproduces the planted-fixture surgery exactly
    (clean_text string equality — byte-exact reassembly both engines)."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.dedup import (
        substring_spans_dedup,
        substring_spans_dedup_oracle,
    )

    span = " ".join(f"w{i % 7}x{i}" for i in range(12))
    rows = [
        (10, "alpha beta " + span + " gamma"),
        (20, span + " delta epsilon zeta eta theta iota kappa"),
        (30, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        substring_spans_dedup(df, k=10)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(substring_spans_dedup_oracle(10))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str))
    assert got.loc[1, "n_tokens_removed"] == 12
