"""Graph analytics operators (operators/graph.py): integer-arithmetic
PageRank and degree-oriented triangle counting."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from flink_example_spark.operators.graph import (
    MICRO,
    pagerank,
    term_graph,
    triangle_counts,
)


def _pagerank_reference(edges, n_iter, num=17, den=20):
    """Pure-Python integer replica of the operator's contract: ranks in
    micro-units, rational damping, floor divisions, dangling mass dropped."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    base = (MICRO * (den - num)) // (den * n)
    r = {v: MICRO // n for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for src, dst, w in edges:
            s[dst] += (num * r[src] * w) // (den * out_w[src])
        r = {v: base + s[v] for v in nodes}
    return r


def _run_pagerank(spark, edges, n_iter):
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    out = pagerank(df, n_iter=n_iter, weight_col="w")
    return {row["node"]: row["rank_micro"] for row in out.collect()}


def test_pagerank_matches_integer_reference(spark):
    # asymmetric weighted digraph with a dangling node (d has no out-edges)
    edges = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "c", 2),
        ("c", "a", 1),
        ("b", "d", 5),
    ]
    got = _run_pagerank(spark, edges, n_iter=4)
    want = _pagerank_reference(edges, n_iter=4)
    assert got == want


def test_pagerank_symmetric_cycle_is_uniform(spark):
    # 2-cycle with equal weights: ranks stay identical by symmetry
    got = _run_pagerank(spark, [("a", "b", 1), ("b", "a", 1)], n_iter=5)
    assert got["a"] == got["b"]
    # sub-stochastic: total mass never exceeds 1.0 in micro-units
    assert got["a"] + got["b"] <= MICRO


def test_pagerank_rank_column_is_micro_division(spark):
    df = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "src string, dst string, w long"
    )
    row = pagerank(df, n_iter=1, weight_col="w").collect()[0]
    assert row["rank"] == row["rank_micro"] / 1e12


def test_term_graph_is_symmetric(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha beta gamma"), (2, "beta gamma beta gamma")],
        "doc_id long, text string",
    )
    g = term_graph(docs, min_weight=2)
    rows = {(r["src"], r["dst"]): r["w"] for r in g.collect()}
    assert rows, "expected edges at min_weight=2"
    for (s, d), w in rows.items():
        assert rows[(d, s)] == w
    # adjacent-pair counting: alpha-beta appears 3x across doc 1
    assert rows[("alpha", "beta")] == 3


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = {v: 0 for v in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for v in (x, y, z):
                count[v] += 1
    return {v: c for v, c in count.items() if c}


def _run_triangles(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    out = triangle_counts(df)
    return {row["node"]: row["n_triangles"] for row in out.collect()}


def test_triangles_k4(spark):
    # complete graph on 4 nodes: every node sits in C(3,2)=3 triangles
    k4 = [(a, b) for a, b in itertools.combinations("abcd", 2)]
    assert _run_triangles(spark, k4) == {v: 3 for v in "abcd"}


def test_triangles_square_has_none(spark):
    square = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert _run_triangles(spark, square) == {}


def test_triangles_match_brute_force_and_dedup_input(spark):
    # deterministic pseudo-random graph; pairs given unordered + duplicated
    nodes = [f"n{i}" for i in range(12)]
    pairs = []
    for i, a in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            if (i * 7 + j * 13) % 3 == 0:
                pairs.append((nodes[j], a))  # reversed order on purpose
    got = _run_triangles(spark, pairs + pairs[:5])  # duplicates must not count
    assert got == _brute_triangles(pairs)


def test_reachability_bfs_hops_and_cycle_termination(spark):
    """Chain a->b->c->d plus a back-edge d->a (cycle): hops are true BFS
    distances within the bound and the depth bound terminates the
    recursion despite the cycle."""
    from flink_example_spark.operators.graph import reachability

    edges = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 1), ("c", "d", 1), ("d", "a", 1)],
        "src string, dst string, w long",
    )
    got = {r["node"]: r["hops"] for r in reachability(edges, max_hops=3).collect()}
    # hub = a (largest out-weight); the d->a back-edge re-reaches a at
    # dist 4 but MIN keeps 0, and the bound stops the walk there
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_reachability_explicit_source_and_walk_counts(spark):
    """Diamond a->{b,c}->d: two walks reach d, MIN collapses to 2 hops."""
    from flink_example_spark.operators.graph import reachability

    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1), ("b", "d", 1), ("c", "d", 1)],
        "src string, dst string, w long",
    )
    rows = {
        r["node"]: (r["hops"], r["n_walks"])
        for r in reachability(edges, max_hops=4, source="a").collect()
    }
    assert rows["d"] == (2, 2)
    assert rows["a"] == (0, 1)


def test_kcore_cascading_peel(spark):
    """A tail path hanging off a triangle must peel away COMPLETELY under
    k=2 (each removal re-exposes the next node — the cascade k-core exists
    for), leaving exactly the triangle at degree 2."""
    from flink_example_spark.operators.graph import kcore

    # triangle a-b-c, path c-d-e-f
    und = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in und] + [(d, s) for s, d in und], "src string, dst string"
    )
    out = {r["node"]: r["degree"] for r in kcore(edges, k=2, n_rounds=4).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_k_exceeds_density(spark):
    from flink_example_spark.operators.graph import kcore

    und = [("a", "b"), ("b", "c"), ("a", "c")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in und] + [(d, s) for s, d in und], "src string, dst string"
    )
    assert kcore(edges, k=3, n_rounds=3).count() == 0


def test_kcore_spark_matches_unrolled_oracle_fixpoint(spark):
    """One extra round must not change the harness k-core (fixpoint)."""
    from flink_example_spark.operators.graph import kcore, term_graph
    from flink_example_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    g = term_graph(docs, min_weight=2).localCheckpoint()
    a = {tuple(r) for r in kcore(g, k=25, n_rounds=3).collect()}
    b = {tuple(r) for r in kcore(g, k=25, n_rounds=4).collect()}
    assert a == b and a


def test_personalized_pagerank_proximity(spark):
    """With teleport pinned to seed 'a' on a path graph, rank must decay
    with distance from the seed; a non-seed start gets zero initial mass
    but accumulates via walks."""
    from flink_example_spark.operators.graph import pagerank

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(
        [(s, d) for s, d in und] + [(d, s) for s, d in und], "src string, dst string"
    )
    r = {x["node"]: x["rank_micro"] for x in pagerank(edges, seeds=["a"]).collect()}
    # the path is bipartite, so a finite EVEN iteration count carries the
    # classic parity oscillation (even-distance nodes hold the walk mass);
    # assert the decay WITHIN each parity class plus seed dominance
    assert r["a"] == max(r.values())
    assert r["a"] > r["c"] > r["e"]   # even distances from the seed
    assert r["b"] > r["d"]            # odd distances
    # uniform (non-personalized) ranks the path ends LOWEST — different order
    u = {x["node"]: x["rank_micro"] for x in pagerank(edges).collect()}
    assert u["c"] > u["a"] and u["c"] > u["e"]


def test_label_propagation_finds_two_cliques(spark):
    from flink_example_spark.operators.graph import label_propagation

    # two triangles {a,b,c} and {x,y,z} joined by one weak bridge c-x
    und = [("a", "b", 5), ("a", "c", 5), ("b", "c", 5),
           ("x", "y", 5), ("x", "z", 5), ("y", "z", 5),
           ("c", "x", 1)]
    rows = [(s, d, w) for s, d, w in und] + [(d, s, w) for s, d, w in und]
    e = spark.createDataFrame(rows, "src string, dst string, w long")
    out = {r["node"]: r["label"] for r in label_propagation(e, n_rounds=4).collect()}
    assert set(out) == {"a", "b", "c", "x", "y", "z"}
    # each triangle converges to one label; the bridge does not merge them
    assert len({out["a"], out["b"], out["c"]}) == 1
    assert len({out["x"], out["y"], out["z"]}) == 1
    assert out["a"] != out["x"]


def test_clustering_coefficient_known_graph(spark):
    from flink_example_spark.operators.graph import clustering_coefficient

    # triangle {a,b,c} plus pendant d attached to a
    und = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")]
    e = spark.createDataFrame(und, "a string, b string")
    out = {r["node"]: r for r in clustering_coefficient(e).collect()}
    # a: degree 3, 1 triangle -> 2/(3*2) = 1/3; b,c: degree 2, 1 tri -> 1.0
    assert out["a"]["coeff"] == 2 / 6
    assert out["b"]["coeff"] == 1.0 and out["c"]["coeff"] == 1.0
    assert "d" not in out  # degree 1 undefined


def test_sssp_relaxation_and_cost_inversion(spark):
    # cost = max(1, 1_000_000 div w): strong edges are cheap
    edges = [
        ("a", "b", 1_000_000),  # cost 1
        ("b", "c", 500_000),    # cost 2
        ("a", "c", 200_000),    # cost 5 (direct is worse than a->b->c = 3)
        ("c", "d", 250_000),    # cost 4
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    from flink_example_spark.operators.graph import sssp

    got = {r["node"]: r["dist"] for r in sssp(df, n_rounds=3, source="a").collect()}
    assert got == {"a": 0, "b": 1, "c": 3, "d": 7}


def test_sssp_unreachable_nodes_absent_and_hub_default(spark):
    edges = [("a", "b", 10), ("x", "y", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    from flink_example_spark.operators.graph import sssp

    # default source = hub (largest out-weight) = 'a'; x/y unreachable
    got = {r["node"]: r["dist"] for r in sssp(df, n_rounds=2).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"] == 0


def test_modularity_two_cliques_is_half(spark):
    # two disconnected triangles, perfectly partitioned: Q = 0.5 exactly
    tri = lambda ns: [(a, b, 1) for a in ns for b in ns if a != b]
    edges = tri(["a", "b", "c"]) + tri(["x", "y", "z"])
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"), ("z", "x")],
        "node string, label string",
    )
    from flink_example_spark.operators.graph import modularity

    row = modularity(e, labels).first()
    assert row["two_m"] == 12 and row["internal_w"] == 12
    assert row["q_num"] == 72 and row["modularity"] == 0.5


def test_modularity_single_community_is_zero(spark):
    # everything in one community: Q = 0 by construction
    edges = [("a", "b", 1), ("b", "a", 1), ("b", "c", 1), ("c", "b", 1)]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    labels = spark.createDataFrame(
        [("a", "g"), ("b", "g"), ("c", "g")], "node string, label string"
    )
    from flink_example_spark.operators.graph import modularity

    row = modularity(e, labels).first()
    assert row["q_num"] == 0 and row["modularity"] == 0.0


def test_hits_star_hub_and_authority(spark):
    """One spoke node pointing at all others: it is the unique max hub;
    targets share max authority; pure sinks have hub 0."""
    from flink_example_spark.operators.graph import MICRO, hits

    edges = spark.createDataFrame(
        [("s", "a", 1), ("s", "b", 1), ("s", "c", 1), ("a", "b", 1)],
        "src string, dst string, w long",
    )
    r = {x["node"]: (x["hub_micro"], x["auth_micro"]) for x in hits(edges, n_iter=4).collect()}
    # rescale is ceil-divisor (max bounded by MICRO, within a factor of 2)
    assert MICRO // 2 <= r["s"][0] <= MICRO          # unique max hub
    assert r["s"][0] > r["a"][0]
    assert MICRO // 2 <= r["b"][1] <= MICRO          # two in-edges: max authority
    assert r["b"][1] > r["a"][1] > 0
    assert r["b"][0] == 0 and r["c"][0] == 0         # sinks: no out-edges
    assert r["s"][1] == 0                            # nothing points at s
    assert 0 < r["a"][0] < r["s"][0]


def test_link_prediction_known_scores(spark):
    # path graph a-b-c-d plus hub h connected to a,c,d:
    #   deg: a=2(b,h) b=2(a,c) c=3(b,d,h) d=2(c,h) h=3(a,c,d)
    from flink_example_spark.operators.graph import link_prediction

    und = [("a", "b"), ("b", "c"), ("c", "d"), ("h", "a"), ("h", "c"), ("h", "d")]
    edges = spark.createDataFrame(
        [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und],
        "src string, dst string, w long",
    )
    out = {(r["u"], r["v"]): r for r in link_prediction(edges).collect()}
    # non-adjacent pairs with common neighbors:
    #   (a,c): via b(deg2) and h(deg3) -> cn=2, aa = 1e6//1 + 1e6//1 = 2000000
    #          ra = 1e6//2 + 1e6//3 = 500000+333333
    #   (a,d): via h(deg3)            -> cn=1, aa = 1e6//1, ra = 333333
    #   (b,d): via c(deg3)            -> cn=1
    #   (b,h): via a(deg2), c(deg3)   -> cn=2
    assert set(out) == {("a", "c"), ("a", "d"), ("b", "d"), ("b", "h")}
    assert out[("a", "c")]["cn"] == 2
    assert out[("a", "c")]["aa_micro"] == 2_000_000
    assert out[("a", "c")]["ra_micro"] == 833_333
    assert out[("a", "d")]["cn"] == 1
    assert out[("a", "d")]["ra_micro"] == 333_333
    assert out[("b", "h")]["cn"] == 2


def test_link_prediction_hub_cap_excludes_center(spark):
    from flink_example_spark.operators.graph import link_prediction

    # star: hub s connected to 5 leaves; every leaf pair shares only s.
    und = [("s", f"l{i}") for i in range(5)]
    edges = spark.createDataFrame(
        [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und],
        "src string, dst string, w long",
    )
    assert link_prediction(edges, max_hub_degree=4).count() == 0
    assert link_prediction(edges, max_hub_degree=5).count() == 10


def test_assortativity_star_is_negative(spark):
    """A star graph is maximally disassortative: every edge pairs the hub
    (deg n) with a leaf (deg 1) -> r = -1."""
    from flink_example_spark.operators.graph import assortativity

    und = [("s", f"l{i}") for i in range(5)]
    edges = spark.createDataFrame(
        [(u, v, 1) for u, v in und] + [(v, u, 1) for u, v in und],
        "src string, dst string, w long",
    )
    r = assortativity(edges).collect()[0]
    assert r["n_nodes"] == 6 and r["n_edges"] == 10
    assert abs(r["r"] - (-1.0)) < 1e-12


def test_assortativity_regular_graph_degenerate(spark):
    """A cycle is degree-regular: zero degree variance -> no row (the
    coefficient is undefined, not NaN)."""
    from flink_example_spark.operators.graph import assortativity

    cyc = [("a", "b"), ("b", "c"), ("c", "a")]
    edges = spark.createDataFrame(
        [(u, v, 1) for u, v in cyc] + [(v, u, 1) for u, v in cyc],
        "src string, dst string, w long",
    )
    assert assortativity(edges).count() == 0


def test_ktruss_cuts_pendant_triangle_keeps_clique(spark):
    """K4 on {1,2,3,4} + a triangle (3,4,5): K4 edges sit in >= 2
    triangles, the pendant triangle's outer edges in exactly 1 — a
    4-truss (support >= 2) keeps exactly the K4."""
    from flink_example_spark.operators.graph import ktruss

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["truss_degree"] for r in ktruss(pairs, k=4, n_rounds=2).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_ktruss_cascade_and_fixpoint(spark):
    """k=5 (support >= 3) cascades on the same graph: round 1 leaves only
    the (3,4) edge (its K4+pendant support was 3), round 2 kills it
    (support 0) — empty truss. And for k=4 an extra round changes
    nothing (fixpoint)."""
    from flink_example_spark.operators.graph import ktruss

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    assert ktruss(pairs, k=5, n_rounds=2).count() == 0
    two = sorted(map(tuple, ktruss(pairs, k=4, n_rounds=2).collect()))
    three = sorted(map(tuple, ktruss(pairs, k=4, n_rounds=3).collect()))
    assert two == three


def test_ktruss_neighbor_cap_bounds_degree(spark):
    """Mutual truncation at cap=2: node 1 keeps neighbors (2,3); nodes
    4,5 each keep 1 but are NOT kept back -> their edges drop. The K3 on
    {1,2,3} survives a 3-truss intact."""
    from flink_example_spark.operators.graph import ktruss

    edges = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["truss_degree"]
        for r in ktruss(pairs, k=3, n_rounds=1, neighbor_cap=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}


def test_densest_subgraph_picks_best_round(spark):
    """K4 + a pendant path (4-5, 5-6): round 0 peels the path (density
    8/6), round 1 is the K4 (density 6/4 — the argmax), round 2 empties.
    The answer must be the K4 with in-subgraph degrees 3."""
    from flink_example_spark.operators.graph import densest_subgraph

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["degree"]
        for r in densest_subgraph(pairs, n_rounds=5).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_densest_subgraph_empty_input(spark):
    from flink_example_spark.operators.graph import densest_subgraph

    pairs = spark.createDataFrame([], "a long, b long")
    assert densest_subgraph(pairs).count() == 0


def test_ktruss_rejects_k_below_3(spark):
    """k<=2 would have to KEEP triangle-free edges, which the inner-join
    support peel drops — rejected explicitly instead of silently deviating
    (ADVICE r8)."""
    import pytest

    from flink_example_spark.operators.graph import ktruss, ktruss_oracle

    e = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError):
        ktruss(e, k=2)
    with pytest.raises(ValueError):
        ktruss_oracle("SELECT 1 AS a, 2 AS b", k=2)


def test_truss_decomposition_layers_and_oracle(spark):
    """5-clique edges decompose to trussness 5, the attached triangle to
    3, the pendant edge to 2; the early-exit peel is bit-equal to the
    DuckDB full-grid unroll."""
    import duckdb
    import pandas as pd

    from flink_example_spark.operators.graph import (
        truss_decomposition,
        truss_decomposition_oracle,
    )

    edges = [(i, j) for i in range(5) for j in range(5) if i < j]
    edges += [(4, 10), (4, 11), (10, 11), (11, 20)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = sorted(tuple(r) for r in truss_decomposition(df, k_max=6).collect())
    by_k = {}
    for _, _, t in got:
        by_k[t] = by_k.get(t, 0) + 1
    assert by_k == {5: 10, 3: 3, 2: 1}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(edges, columns=["a", "b"]))
    ora = sorted(
        con.execute(
            truss_decomposition_oracle("SELECT * FROM t", k_max=6)
        ).fetchall()
    )
    assert got == ora


def test_truss_decomposition_floor_label_and_guard(spark):
    """Survivors of the k_max peel carry the k_max FLOOR label (a 6-clique
    at k_max=4 labels every edge 4), and k_max < 3 is rejected."""
    import pytest

    from flink_example_spark.operators.graph import (
        truss_decomposition,
        truss_decomposition_oracle,
    )

    edges = [(i, j) for i in range(6) for j in range(6) if i < j]
    df = spark.createDataFrame(edges, "a long, b long")
    out = truss_decomposition(df, k_max=4).collect()
    assert all(r["trussness"] == 4 for r in out) and len(out) == 15
    with pytest.raises(ValueError):
        truss_decomposition(df, k_max=2)
    with pytest.raises(ValueError):
        truss_decomposition_oracle("t", k_max=2)


def test_truss_decomposition_consistent_with_ktruss(spark):
    """Cross-operator invariant on a random-ish graph: the node degrees
    over edges with trussness >= k must equal ktruss(k)'s output (same
    peel, different bookkeeping)."""
    from flink_example_spark.operators.graph import ktruss, truss_decomposition

    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                ((i * 7 + 3) % 23, (i * 11 + 5) % 23) for i in range(60)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    dec = truss_decomposition(df, k_max=5, n_rounds=4)
    for k in (3, 4, 5):
        surv = dec.filter(F.col("trussness") >= k)
        deg = (
            surv.select(F.col("a").alias("node"))
            .union(surv.select(F.col("b").alias("node")))
            .groupBy("node")
            .count()
        )
        got = sorted((r["node"], r["count"]) for r in deg.collect())
        want = sorted(
            (r["node"], r["truss_degree"])
            for r in ktruss(df, k=k, n_rounds=4).collect()
        )
        assert got == want, k


def test_truss_decomposition_label_invariant(spark):
    """Trussness is a structural property: relabeling nodes by any
    order-changing injection leaves the (uncapped) trussness multiset
    unchanged, with edges mapping 1:1."""
    from flink_example_spark.operators.graph import truss_decomposition

    edges = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (((i * 5 + 1) % 17, (i * 3 + 7) % 17) for i in range(45))
            if a != b
        }
    )
    df = spark.createDataFrame(edges, "a long, b long")
    base = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(df, k_max=5).collect()
    }
    relabel = lambda n: (n * 131 + 7) % 1009  # injective on 0..16, reorders
    df2 = spark.createDataFrame(
        [(relabel(a), relabel(b)) for a, b in edges], "a long, b long"
    )
    got = {
        (r["a"], r["b"]): r["trussness"]
        for r in truss_decomposition(df2, k_max=5).collect()
    }
    want = {
        (min(relabel(a), relabel(b)), max(relabel(a), relabel(b))): t
        for (a, b), t in base.items()
    }
    assert got == want


def test_wedge_certificate_exact_counts(spark):
    """Hand-checked certificate on a 4-path plus a triangle: the
    degree-oriented wedge count must equal the enumeration's actual
    join work exactly."""
    from flink_example_spark.operators.graph import wedge_certificate

    # path 0-1-2-3 plus triangle 4-5-6
    edges = [(0, 1), (1, 2), (2, 3), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    cert = wedge_certificate(df)
    assert cert["m"] == 6
    # path: degrees 1,2,2,1 -> orientation by (deg, id): 0->1, 3->2,
    # 1->2 (tie by id); d_out: 0:1, 1:1, 3:1 -> no wedges.
    # triangle: all deg 2, ties by id: 4->5, 4->6, 5->6 -> d_out 4:2,
    # 5:1 -> one wedge.
    assert cert["wedge_work"] == 1
    assert cert["max_dout"] == 2


def test_truss_certified_matches_uncapped_and_rejects_dense(spark):
    """The certified path is bit-equal to truss_decomposition with no
    cap on a sparse graph, and raises (naming the capped fallback) when
    the planted clique blows the wedge budget."""
    import pytest

    from flink_example_spark.operators.graph import (
        truss_decomposition,
        truss_decomposition_certified,
    )

    # sparse: two triangles sharing an edge + a tail
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = sorted(
        tuple(r)
        for r in truss_decomposition_certified(df, k_max=5).collect()
    )
    ref = sorted(
        tuple(r)
        for r in truss_decomposition(
            df, k_max=5, neighbor_cap=None
        ).collect()
    )
    assert got == ref
    t = dict(((a, b), v) for a, b, v in got)
    # both triangles are 3-trusses; the k=4 peel drops the side edges
    # (support 1) and the shared edge's support cascades to 0
    assert t[(1, 2)] == 3 and t[(0, 1)] == 3
    assert t[(3, 4)] == 2  # triangle-free tail

    clique = [(i, j) for i in range(30) for j in range(i + 1, 30)]
    dense = spark.createDataFrame(clique, "a long, b long")
    with pytest.raises(ValueError, match="sparsity certificate"):
        truss_decomposition_certified(dense, wedge_budget=100)
