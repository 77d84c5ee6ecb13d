"""Distributed graph analytics over DataFrame ops.

The reference engine (kerinin/flink-example) has no graph operators; these
extend the engine with the graph primitives a training-data curation
pipeline runs at corpus scale: PageRank (host/domain quality scoring a la
Common Crawl, TextRank keyword extraction) and triangle counting (community
density on near-duplicate graphs). Both are pure DataFrame compositions —
no Python in the loop — and both are engine-portable by construction:

- ``pagerank`` runs the power iteration ENTIRELY in 64-bit integer
  arithmetic (ranks in 1e-12 "micro" units, damping as the exact rational
  num/den), so there is no floating-point accumulation anywhere and any
  engine reproduces the ranks bit-for-bit.  See DESIGN.md: never SUM raw
  doubles across engines.
- ``triangle_counts`` is exact counting (integers only); the
  degree-ordered edge orientation bounds per-node fan-out by O(sqrt(m)),
  the standard device that keeps the wedge join skew-safe on power-law
  graphs at the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MICRO = 10**12


def pagerank(
    edges: DataFrame,
    n_iter: int = 6,
    damping: tuple[int, int] = (17, 20),
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    seeds: list | None = None,
) -> DataFrame:
    """Weighted PageRank power iteration, deterministic across engines.

    ``edges``: (src, dst[, weight]) with INTEGER weights (weight 1 when
    ``weight_col`` is None). ``damping`` is an exact rational (num, den) —
    the default (17, 20) is the classic 0.85.

    All arithmetic is 64-bit integer: ranks live in micro-units (1e12 ==
    mass 1.0); each edge contributes ``(num * r_src * w) div (den *
    out_w_src)`` and every node gets the teleport base ``(micro * (den -
    num)) div (den * n_nodes)``. Floor losses and dangling-node mass are
    simply dropped (sub-stochastic iteration) — identically in any engine,
    which is the point: the output is a deterministic function of the edge
    multiset. Overflow bound: ``num * micro * max_weight < 2^63`` — fine
    for weights up to ~5e5 at the default damping.

    Scale shape: the edge relation (with its precomputed out-weight) is
    shuffled ONCE onto src and kept; each iteration joins the node-sized
    rank relation to it (ranks are the small side) and aggregates
    contributions per dst — the Pregel pattern, with per-round
    ``localCheckpoint`` lineage cuts (DESIGN.md: multi-consumer branches
    recompute their upstream DAG per consumer).

    ``seeds``: optional node list for PERSONALIZED PageRank — the
    teleport mass (and the start vector) concentrates uniformly on the
    seed set instead of all nodes, so ranks measure proximity to the
    seeds (the random-walk-with-restart relevance used for related-item
    retrieval). Same integer arithmetic, seeds inline as literals.

    Output: (node, rank_micro BIGINT, rank DOUBLE) — rank is the single
    exactly-rounded division rank_micro / 1e12.
    """
    num, den = damping
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w_expr.alias("w")
    )
    sc = edges.sparkSession.sparkContext
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_micro"),
            F.lit(0.0).alias("rank"),
        )
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # one shuffle onto src, then the per-iteration rank join reuses it
    # (explicit partition count — AQE coalesces column-only repartition
    # back to 1 on small data, DESIGN.md round-6 rule)
    ee = (
        e.join(out_w, "src")
        .repartition(sc.defaultParallelism, F.col("src"))
        .localCheckpoint(eager=True)
    )
    if seeds is None:
        base_col = F.lit((MICRO * (den - num)) // (den * n_nodes))
        r0 = F.lit(MICRO // n_nodes)
    else:
        n_seeds = len(seeds)
        is_seed = F.col("node").isin(*seeds)
        base_col = F.when(
            is_seed, F.lit((MICRO * (den - num)) // (den * n_seeds))
        ).otherwise(F.lit(0))
        r0 = F.when(is_seed, F.lit(MICRO // n_seeds)).otherwise(F.lit(0))
    ranks = nodes.select(
        "node", r0.cast("long").alias("r")
    ).localCheckpoint(eager=True)
    contrib_expr = F.expr(f"({num} * r * w) div ({den} * out_w)")
    for _ in range(n_iter):
        summed = (
            ee.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), contrib_expr.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (base_col + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        F.col("r").alias("rank_micro"),
        (F.col("r").cast("double") / F.lit(1e12)).alias("rank"),
    )


def pagerank_oracle(
    edges_sql: str,
    n_iter: int = 6,
    damping: tuple[int, int] = (17, 20),
    select_sql: str = "SELECT node, r AS rank_micro, CAST(r AS DOUBLE) / 1e12 AS rank FROM r{n}",
    seeds: list | None = None,
) -> str:
    """DuckDB twin of ``pagerank``: the power iteration unrolled as chained
    MATERIALIZED CTEs (DuckDB inlines non-recursive CTEs per consumer —
    the shared edge/node relations are read every round, DESIGN.md).
    ``edges_sql`` must yield (src, dst, w BIGINT)."""
    num, den = damping
    if seeds is None:
        base_sql = f"(({MICRO} * {den - num}) // ({den} * nn.n))"
        r0_sql = f"CAST({MICRO} // nn.n AS BIGINT)"
    else:
        lits = ", ".join(f"'{s}'" for s in seeds)
        k = len(seeds)
        base_sql = (
            f"(CASE WHEN n.node IN ({lits})"
            f" THEN ({MICRO} * {den - num}) // ({den} * {k}) ELSE 0 END)"
        )
        r0_sql = (
            f"CAST(CASE WHEN node IN ({lits})"
            f" THEN {MICRO} // {k} ELSE 0 END AS BIGINT)"
        )
    rounds = []
    for i in range(n_iter):
        rounds.append(
            f"""r{i + 1} AS MATERIALIZED (
          SELECT n.node,
                 CAST({base_sql}
                      + COALESCE(c.s, 0) AS BIGINT) AS r
          FROM nodes n CROSS JOIN nn
          LEFT JOIN (
            SELECT ee.dst AS node,
                   SUM(({num} * r.r * ee.w) // ({den} * ee.out_w)) AS s
            FROM ee JOIN r{i} r ON ee.src = r.node GROUP BY 1
          ) c ON n.node = c.node
        )"""
        )
    chain = ",\n        ".join(rounds)
    return f"""
        WITH e AS MATERIALIZED ({edges_sql}),
        nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e
        ),
        nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
        ee AS MATERIALIZED (
          SELECT e.src, e.dst, e.w, o.out_w
          FROM e JOIN (
            SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e GROUP BY 1
          ) o USING (src)
        ),
        r0 AS MATERIALIZED (
          SELECT node, {r0_sql} AS r
          FROM nodes CROSS JOIN nn
        ),
        {chain}
        {select_sql.format(n=n_iter)}
    """


def hits(
    edges: DataFrame,
    n_iter: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) as a deterministic integer
    power iteration over a DIRECTED weighted graph: each round computes
    ``h(u) = Σ_{u→v} w·a(v)`` then ``a(v) = Σ_{u→v} w·h(u)``, and
    rescales both vectors back into micro-units by the ceil divisor
    ``x div ((max + MICRO - 1) div MICRO)`` (two integer divisions, no
    sqrt, no float — the max lands in [MICRO/2, MICRO] rather than
    exactly MICRO, which preserves ranking and keeps every op 64-bit),
    so any engine reproduces every score bit-for-bit.
    Nodes without out-edges get hub 0; without in-edges authority 0.

    Overflow bound: Σ w·score ≤ total_w · MICRO, so total edge weight must
    stay below ~9e6 per in/out neighborhood times 1e12 — i.e. total
    weighted degree < 2^63 / MICRO ≈ 9.2e6 per node, ample for term
    graphs; shift MICRO down for heavier graphs.

    Scale shape: identical to :func:`pagerank` — the edge relation is
    shuffled once; each iteration joins the node-sized score relation and
    aggregates per endpoint; the max is one scalar broadcast per half-step.

    Output: ``(node, hub_micro, auth_micro, hub, auth)`` — doubles are the
    single exactly-rounded divisions by 1e12.
    """
    w_expr = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    sc = edges.sparkSession.sparkContext
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w_expr.alias("w")
        )
        .repartition(sc.defaultParallelism, F.col("src"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    auth = nodes.select("node", F.lit(MICRO).cast("long").alias("a"))

    def _rescaled(scores: DataFrame, col: str) -> DataFrame:
        mx = scores.agg(F.max(col).alias("__mx"))
        return (
            scores.crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.expr(
                    f"CASE WHEN __mx > 0 THEN {col} div ((__mx + {MICRO} - 1) div {MICRO})"
                    f" ELSE 0 END"
                )
                .cast("long")
                .alias(col),
            )
        )

    for _ in range(n_iter):
        h_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .select("src", (F.col("w") * F.col("a")).alias("__c"))
            .groupBy("src")
            .agg(F.sum("__c").alias("h"))
        )
        hub = _rescaled(
            nodes.join(h_raw.withColumnRenamed("src", "node"), "node", "left")
            .select("node", F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("h")),
            "h",
        ).localCheckpoint(eager=True)
        a_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .select("dst", (F.col("w") * F.col("h")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("a"))
        )
        auth = _rescaled(
            nodes.join(a_raw.withColumnRenamed("dst", "node"), "node", "left")
            .select("node", F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("a")),
            "a",
        ).localCheckpoint(eager=True)
    return (
        hub.join(auth, "node")
        .select(
            "node",
            F.col("h").alias("hub_micro"),
            F.col("a").alias("auth_micro"),
            (F.col("h").cast("double") / F.lit(1e12)).alias("hub"),
            (F.col("a").cast("double") / F.lit(1e12)).alias("auth"),
        )
    )


def hits_oracle(edges_sql: str, n_iter: int = 6) -> str:
    """DuckDB twin of :func:`hits`: the two half-steps unrolled as chained
    MATERIALIZED CTEs (h{{i}}/a{{i}}), max-rescale as a scalar cross join.
    ``edges_sql`` must yield (src, dst, w BIGINT)."""
    resc = (
        "CASE WHEN mx.m > 0 THEN s // ((mx.m + {M} - 1) // {M}) ELSE 0 END"
    ).format(M=MICRO)
    rounds = []
    prev_a = "a0"
    for i in range(n_iter):
        rounds.append(
            f"""hr{i + 1} AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS s
          FROM nodes n LEFT JOIN (
            SELECT e.src AS node, CAST(SUM(e.w * a.a) AS BIGINT) AS s
            FROM e JOIN {prev_a} a ON e.dst = a.node GROUP BY 1
          ) c ON n.node = c.node
        ),
        h{i + 1} AS MATERIALIZED (
          SELECT node, CAST({resc} AS BIGINT) AS h
          FROM hr{i + 1} CROSS JOIN (SELECT MAX(s) AS m FROM hr{i + 1}) mx
        ),
        ar{i + 1} AS MATERIALIZED (
          SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS s
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS node, CAST(SUM(e.w * h.h) AS BIGINT) AS s
            FROM e JOIN h{i + 1} h ON e.src = h.node GROUP BY 1
          ) c ON n.node = c.node
        ),
        a{i + 1} AS MATERIALIZED (
          SELECT node, CAST({resc} AS BIGINT) AS a
          FROM ar{i + 1} CROSS JOIN (SELECT MAX(s) AS m FROM ar{i + 1}) mx
        )"""
        )
        prev_a = f"a{i + 1}"
    chain = ",\n        ".join(rounds)
    return f"""
        WITH e AS MATERIALIZED ({edges_sql}),
        nodes AS MATERIALIZED (
          SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e
        ),
        a0 AS MATERIALIZED (
          SELECT node, CAST({MICRO} AS BIGINT) AS a FROM nodes
        ),
        {chain}
        SELECT h.node, h.h AS hub_micro, a.a AS auth_micro,
               CAST(h.h AS DOUBLE) / 1e12 AS hub,
               CAST(a.a AS DOUBLE) / 1e12 AS auth
        FROM h{n_iter} h JOIN a{n_iter} a USING (node)
    """


def directed_term_graph(
    documents: DataFrame,
    min_weight: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DIRECTED adjacent-bigram graph: edge a→b with weight = corpus count
    of token a immediately preceding token b (order preserved, unlike
    :func:`term_graph`'s symmetrized edges) — the precedence graph HITS
    scores: hubs are terms that lead into important terms, authorities
    terms that many lead-ins point at."""
    from flink_example_spark.operators.text import normalized, tokens

    toks = documents.select(
        tokens(normalized(F.col(text_col))).alias("__t")
    ).filter(F.size("__t") >= 2)
    bigrams = (
        toks.select(
            F.col("__t"),
            F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        )
        .select(
            F.element_at("__t", F.col("__i")).alias("a"),
            F.element_at("__t", F.col("__i") + 1).alias("b"),
        )
        .filter((F.col("a") != "") & (F.col("b") != "") & (F.col("a") != F.col("b")))
    )
    return (
        bigrams.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= min_weight)
        .select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
    )


def directed_term_graph_sql(min_weight: int = 2) -> str:
    """DuckDB twin of :func:`directed_term_graph`."""
    from flink_example_spark.operators.text import _DUCK_NORM

    return f"""
        SELECT a AS src, b AS dst, CAST(COUNT(*) AS BIGINT) AS w
        FROM (
          SELECT unnest(list_slice(l, 1, len(l) - 1)) AS a,
                 unnest(list_slice(l, 2, len(l))) AS b
          FROM (
            SELECT string_split_regex({_DUCK_NORM}, '\\s+') AS l
            FROM documents
          ) WHERE len(l) >= 2
        ) WHERE a <> '' AND b <> '' AND a <> b
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_weight}
    """


def term_graph(
    documents: DataFrame,
    min_weight: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Undirected term co-occurrence graph from adjacent-token bigrams —
    the TextRank (Mihalcea & Tarau 2004) graph. Edge weight = total count
    of the unordered adjacent pair across the corpus; both directions are
    emitted (symmetric directed edges) so ``pagerank`` walks it as an
    undirected graph. Output: (src, dst, w) with w >= ``min_weight``.

    Bigrams come from exploded per-doc index sequences over the shared
    tokenizer (same device as ``text.pmi_collocations`` — higher-order
    array lambdas are interpreted, explode + codegen is 10-30x faster).
    """
    from flink_example_spark.operators.text import normalized, tokens

    toks = documents.select(
        tokens(normalized(F.col(text_col))).alias("__t")
    ).filter(F.size("__t") >= 2)
    bigrams = (
        toks.select(
            F.col("__t"),
            F.explode(F.sequence(F.lit(1), F.size("__t") - 1)).alias("__i"),
        )
        .select(
            F.element_at("__t", F.col("__i")).alias("a"),
            F.element_at("__t", F.col("__i") + 1).alias("b"),
        )
        .filter((F.col("a") != "") & (F.col("b") != "") & (F.col("a") != F.col("b")))
    )
    und = bigrams.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    )
    cnt = (
        und.groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .filter(F.col("w") >= min_weight)
    )
    return cnt.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).union(cnt.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))


def term_graph_sql(min_weight: int = 2) -> str:
    """DuckDB twin of ``term_graph`` (same normalization/bigram CTEs as
    ``text.pmi_oracle``)."""
    from flink_example_spark.operators.text import _DUCK_NORM

    return f"""
        SELECT CASE WHEN dir.d = 0 THEN u ELSE v END AS src,
               CASE WHEN dir.d = 0 THEN v ELSE u END AS dst, w
        FROM (
          SELECT least(a, b) AS u, greatest(a, b) AS v,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM (
            SELECT unnest(list_slice(l, 1, len(l) - 1)) AS a,
                   unnest(list_slice(l, 2, len(l))) AS b
            FROM (
              SELECT string_split_regex({_DUCK_NORM}, '\\s+') AS l
              FROM documents
            ) WHERE len(l) >= 2
          ) WHERE a <> '' AND b <> '' AND a <> b
          GROUP BY 1, 2
        ) CROSS JOIN (VALUES (0), (1)) dir(d)
        WHERE w >= {min_weight}
    """


def triangle_counts(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected pair set
    (e.g. a near-duplicate graph) — the local community-density metric.
    Output: (node, n_triangles) for nodes in >= 1 triangle.

    Algorithm: canonicalize + dedup edges, then orient every edge from the
    lower (degree, id) endpoint to the higher; wedges are pairs of
    out-edges at a common source and close against an oriented edge. The
    degree orientation bounds out-degree by O(sqrt(m)), so the wedge join
    stays skew-safe on power-law graphs; each triangle is found exactly
    once. Exact integer counting throughout — trivially engine-portable.
    """
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)  # 3 consumers below — cut once
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        F.broadcast(deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))), "a"
    ).join(
        F.broadcast(deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))), "b"
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)  # consumed by both wedge sides + closer
    w1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    w2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = w1.join(w2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closer = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closer, ["v1", "v2"])
    return (
        tri.select(F.explode(F.array("u", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def reachability(
    edges: DataFrame,
    max_hops: int = 3,
    source: str | None = None,
) -> DataFrame:
    """Multi-hop reachability via Spark 4's RECURSIVE CTE — the declarative
    twin of the imperative ``pagerank`` loop: Catalyst owns the iteration
    (one self-referencing UNION ALL term), so each round is a planned join
    against the edge relation instead of a driver-side Python loop.

    BFS from ``source`` (default: the hub — the node with the largest total
    out-weight, deterministic tie-break on name). Spark does not yet
    support UNION-distinct recursion (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE,
    checked on 4.1.2), so termination on cyclic graphs comes from the
    ``max_hops`` bound on the walk depth; the final aggregate collapses
    walks to ``hops`` = MIN(dist) per node (true BFS distance for nodes
    within the bound) and keeps ``n_walks`` as the bounded-walk count.

    Scale shape: each recursion step is frontier JOIN edges — the same
    shuffle a hand-rolled BFS round would pay, with the edge relation
    scan-reused across steps. Walk counts grow with hub degree^max_hops;
    keep max_hops small on dense graphs (the bound is the state cap).

    Output: (node, hops BIGINT, n_walks BIGINT).
    """
    import uuid

    name = f"edges_{uuid.uuid4().hex[:8]}"
    # the recursion scans this view once per step (and the hub anchor once
    # more): checkpoint so the upstream graph build runs once, not hops+2x
    edges.localCheckpoint().createOrReplaceTempView(name)
    anchor = (
        f"SELECT '{source}' AS node, 0 AS dist"
        if source is not None
        else f"""SELECT src AS node, 0 AS dist FROM (
              SELECT src FROM {name} GROUP BY src ORDER BY SUM(w) DESC, src LIMIT 1)"""
    )
    return edges.sparkSession.sql(f"""
        WITH RECURSIVE reach(node, dist) AS (
          {anchor}
          UNION ALL
          SELECT e.dst, r.dist + 1
          FROM reach r JOIN {name} e ON e.src = r.node
          WHERE r.dist < {max_hops}
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS hops,
               CAST(COUNT(*) AS BIGINT) AS n_walks
        FROM reach GROUP BY node
    """)


def reachability_oracle(
    edges_sql: str, max_hops: int = 3, source: str | None = None
) -> str:
    """DuckDB twin of ``reachability`` — the SAME recursive query text over
    the same edge relation (DuckDB needs the recursive block scoped inside
    the aggregate's subquery when the edge CTE is shared)."""
    anchor = (
        f"SELECT '{source}' AS node, 0 AS dist"
        if source is not None
        else """SELECT src AS node, 0 AS dist FROM (
              SELECT src FROM edges_v GROUP BY src ORDER BY SUM(w) DESC, src LIMIT 1)"""
    )
    return f"""
        WITH edges_v AS MATERIALIZED ({edges_sql})
        SELECT node, CAST(MIN(dist) AS BIGINT) AS hops,
               CAST(COUNT(*) AS BIGINT) AS n_walks
        FROM (
          WITH RECURSIVE reach(node, dist) AS (
            {anchor}
            UNION ALL
            SELECT e.dst, r.dist + 1
            FROM reach r JOIN edges_v e ON e.src = r.node
            WHERE r.dist < {max_hops}
          ) SELECT * FROM reach
        ) GROUP BY node
    """


def kcore(
    edges: DataFrame,
    k: int,
    n_rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes of
    degree < ``k`` (removals lower neighbors' degrees, cascading) until
    stable — the standard dense-subgraph extractor (community cores,
    spam-farm detection, graph sparsification before heavier algorithms).

    ``edges`` is symmetric-directed (both directions present, as
    :func:`term_graph` emits); degree = out-neighbor count. Output: the
    k-core members ``(node, degree)`` with their IN-CORE degree after
    ``n_rounds`` peels. The cascade length is bounded by the peel depth,
    not the graph size — ``n_rounds`` rounds guarantee convergence for
    cascades up to that depth (assert a fixpoint via one extra round in
    tests; production would loop on a converged-count check, same per-
    round plan).

    Scale per round: one degree aggregation + two semi-joins against the
    (shrinking) survivor set — all equi-joins on the node id, broadcast
    while survivors fit. localCheckpoint per round caps the plan depth
    (the iterative-loop rule in DESIGN.md).
    """
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    for _ in range(n_rounds):
        deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("s")
        e = (
            e.join(F.broadcast(keep), "s", "left_semi")
            .join(F.broadcast(keep.select(F.col("s").alias("d"))), "d", "left_semi")
            .localCheckpoint()
        )
    return (
        e.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
    )


def kcore_oracle(edges_sql: str, k: int, n_rounds: int = 4) -> str:
    """DuckDB twin: the peel loop unrolled as chained MATERIALIZED CTEs
    (per-round relations feed two consumers — the DESIGN.md inlining rule).
    ``edges_sql`` must yield symmetric (src, dst)."""
    parts = [f"e0 AS MATERIALIZED (SELECT src AS s, dst AS d FROM ({edges_sql}))"]
    for i in range(n_rounds):
        parts.append(
            f"""k{i} AS MATERIALIZED (
              SELECT s FROM e{i} GROUP BY s HAVING COUNT(*) >= {k}
            ), e{i + 1} AS MATERIALIZED (
              SELECT e.s, e.d FROM e{i} e
              WHERE e.s IN (SELECT s FROM k{i}) AND e.d IN (SELECT s FROM k{i})
            )"""
        )
    return f"""
        WITH {", ".join(parts)}
        SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM e{n_rounds} GROUP BY s HAVING COUNT(*) >= {k}
    """


_LPA_INV = 999_999_999_999  # count inversion constant for the argmax key


def label_propagation(
    edges: DataFrame,
    n_rounds: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007) —
    the near-linear community detector. Every node starts labeled with its
    own id; each round it adopts the label carrying the highest total
    edge weight among its neighbors, ties broken to the smallest label.

    Determinism: the per-node argmax is a MIN over a zero-padded
    ``(INV - count) || label`` string key — lexicographic min is the max
    count then the min label, identically in any engine (the repo's
    composite arg-extreme idiom; no struct ordering needed). Synchronous
    updates make the round a pure function of the previous labeling, so
    the result is exactly reproducible for a fixed ``n_rounds`` even
    where asynchronous LPA would be order-dependent.

    Scale per round: one equi-join of edges against the (node, label)
    relation on the neighbor id + two key-sized aggregations — the same
    shuffle shape as one PageRank iteration; labels localCheckpoint per
    round to cap plan depth (DESIGN.md iterative-loop rule).

    ``edges`` must be symmetric-directed (as :func:`term_graph` emits).
    Output: ``(node, label)`` — nodes sharing a label form a community.
    """
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d"),
        F.col(weight_col).cast("long").alias("w"),
    ).localCheckpoint()  # every round joins e: cut the upstream graph build
    labels = e.select(F.col("s").alias("n")).distinct().select(
        "n", F.col("n").alias("lab")
    )
    for _ in range(n_rounds):
        nb = (
            e.join(labels.select(F.col("n").alias("d"), "lab"), "d")
            .groupBy("s", "lab")
            .agg(F.sum("w").alias("c"))
        )
        labels = (
            nb.select(
                "s",
                F.concat(
                    F.lpad((F.lit(_LPA_INV) - F.col("c")).cast("string"), 12, "0"),
                    F.col("lab"),
                ).alias("k"),
            )
            .groupBy("s")
            .agg(F.min("k").alias("k"))
            .select(F.col("s").alias("n"), F.substring("k", 13, 1024).alias("lab"))
            .localCheckpoint()
        )
    return labels.select(F.col("n").alias("node"), F.col("lab").alias("label"))


def label_propagation_oracle(edges_sql: str, n_rounds: int = 4) -> str:
    """DuckDB twin: the propagation loop unrolled as chained MATERIALIZED
    CTEs (each round's labels feed the next — the DESIGN.md inlining rule)."""
    parts = [
        f"e AS MATERIALIZED (SELECT src AS s, dst AS d, CAST(w AS BIGINT) AS w"
        f" FROM ({edges_sql}))",
        "l0 AS MATERIALIZED (SELECT DISTINCT s AS n, s AS lab FROM e)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"""l{i + 1} AS MATERIALIZED (
              SELECT s AS n, substr(MIN(
                lpad(CAST({_LPA_INV} - c AS VARCHAR), 12, '0') || lab), 13) AS lab
              FROM (
                SELECT e.s, l.lab, CAST(SUM(e.w) AS BIGINT) AS c
                FROM e JOIN l{i} l ON e.d = l.n GROUP BY e.s, l.lab
              ) GROUP BY s
            )"""
        )
    return f"""
        WITH {", ".join(parts)}
        SELECT n AS node, lab AS label FROM l{n_rounds}
    """


def clustering_coefficient(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-node LOCAL clustering coefficient ``2T / (d(d-1))`` — how close
    each node's neighborhood is to a clique; the standard community-
    density metric on top of :func:`triangle_counts` (which contributes
    T) and one degree aggregation (d). Nodes with degree < 2 are
    undefined and dropped; the coefficient is one exact double division
    of BIGINTs. Output: ``(node, degree, n_triangles, coeff)``.
    """
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangle_counts(e, "a", "b")
    return (
        deg.filter(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            (
                (F.lit(2) * F.coalesce(F.col("n_triangles"), F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            ).alias("coeff"),
        )
    )


def clustering_coefficient_oracle(edges_sql: str) -> str:
    """DuckDB twin of :func:`clustering_coefficient` (``edges_sql`` yields
    symmetric (src, dst) like :func:`term_graph`)."""
    return f"""
        WITH e AS MATERIALIZED ({edges_sql}),
        p AS MATERIALIZED (SELECT src AS a, dst AS b FROM e WHERE src < dst),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT a AS node FROM p UNION ALL SELECT b AS node FROM p
          ) GROUP BY node
        ), tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM p e1 JOIN p e2 ON e1.b = e2.a
          JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b
        ), tcnt AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM (SELECT unnest([x, y, z]) AS node FROM tri)
          GROUP BY node
        )
        SELECT deg.node, deg.degree,
               COALESCE(tcnt.n_triangles, 0) AS n_triangles,
               CAST(2 * COALESCE(tcnt.n_triangles, 0) AS DOUBLE)
                 / CAST(deg.degree * (deg.degree - 1) AS DOUBLE) AS coeff
        FROM deg LEFT JOIN tcnt USING (node)
        WHERE deg.degree >= 2
    """


def sssp(
    edges: DataFrame,
    n_rounds: int = 6,
    source: str | None = None,
    cost_scale: int = 1_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Bellman-Ford single-source shortest paths with integer edge costs —
    the remaining classic Pregel primitive next to :func:`pagerank` /
    :func:`reachability` (which is the UNWEIGHTED special case).

    Edge cost inverts affinity into distance entirely in BIGINTs:
    ``cost = greatest(1, cost_scale div w)`` — strong co-occurrence is
    cheap to traverse; integer division keeps every distance exact in any
    engine (DESIGN.md: never SUM raw doubles). Source defaults to the hub
    (largest total out-weight, smallest name on ties — the same anchor
    rule as :func:`reachability`).

    Each round relaxes every edge once: dist' = MIN(dist, MIN over
    in-edges of dist[src] + cost). ``n_rounds`` bounds the path length in
    edges; output distances are exact for all shortest paths of at most
    that many hops (Bellman-Ford's invariant), deterministic regardless.

    Scale per round: one equi-join of the node-sized dist relation against
    the once-checkpointed edge relation + one MIN aggregation — the
    PageRank shuffle shape; min is a monoid so every round combines
    map-side. Output: ``(node, dist BIGINT)``.
    """
    e = edges.select(
        F.col(src_col).alias("s"),
        F.col(dst_col).alias("d"),
        F.col(weight_col).cast("long").alias("w"),
        F.greatest(F.lit(1), F.expr(f"{cost_scale} div {weight_col}"))
        .cast("long")
        .alias("cost"),
    ).localCheckpoint()
    if source is not None:
        dist = (
            edges.sparkSession.range(1)
            .select(F.lit(source).alias("node"), F.lit(0).cast("long").alias("dist"))
        )
    else:
        dist = (
            e.groupBy("s")
            .agg(F.sum("w").alias("tw"))
            .orderBy(F.desc("tw"), F.asc("s"))
            .limit(1)
            .select(F.col("s").alias("node"), F.lit(0).cast("long").alias("dist"))
        )
    for _ in range(n_rounds):
        relax = dist.join(
            e, dist["node"] == e["s"]
        ).select(F.col("d").alias("node"), (F.col("dist") + F.col("cost")).alias("dist"))
        dist = (
            dist.union(relax)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return dist.select("node", F.col("dist").cast("long").alias("dist"))


def sssp_oracle(
    edges_sql: str, n_rounds: int = 6, source: str | None = None,
    cost_scale: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`sssp` — the relaxation loop unrolled as
    chained MATERIALIZED CTEs (each round's dist feeds the next round's
    join AND the union — the DESIGN.md inlining rule)."""
    anchor = (
        f"SELECT '{source}' AS node, CAST(0 AS BIGINT) AS dist"
        if source is not None
        else """SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM (
              SELECT s FROM e GROUP BY s ORDER BY SUM(w) DESC, s LIMIT 1)"""
    )
    parts = [
        f"""e AS MATERIALIZED (
          SELECT src AS s, dst AS d, CAST(w AS BIGINT) AS w,
                 CAST(greatest(1, {cost_scale} // w) AS BIGINT) AS cost
          FROM ({edges_sql}))""",
        f"d0 AS MATERIALIZED ({anchor})",
    ]
    for i in range(n_rounds):
        parts.append(
            f"""d{i + 1} AS MATERIALIZED (
              SELECT node, MIN(dist) AS dist FROM (
                SELECT node, dist FROM d{i}
                UNION ALL
                SELECT e.d AS node, x.dist + e.cost AS dist
                FROM d{i} x JOIN e ON e.s = x.node
              ) GROUP BY node
            )"""
        )
    return f"""
        WITH {", ".join(parts)}
        SELECT node, dist FROM d{n_rounds}
    """


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Newman modularity Q of a node labeling over a weighted graph — the
    standard quality score for the communities :func:`label_propagation`
    emits (Newman & Girvan 2004).

    With symmetric-directed edges (both directions present, as
    :func:`term_graph` emits), ``two_m`` = SUM(w) is exactly 2m of the
    undirected graph, ``internal_w`` the weight inside communities, and
    ``deg_c`` each community's total node strength. Everything up to the
    output boundary is exact BIGINT cross-multiplication:
    ``q_num = two_m * internal_w - SUM(deg_c^2)`` and
    ``Q = q_num / two_m^2`` as ONE double division of exact integers
    (engine-portable; overflow bound w_total < ~3e9).

    Scale: two equi-joins of edges against the node-sized label relation
    + three aggregations; no driver materialization. Output: one row
    ``(two_m, internal_w, q_num, modularity)``.
    """
    e = edges.select(
        F.col(src_col).alias("s"), F.col(dst_col).alias("d"),
        F.col(weight_col).cast("long").alias("w"),
    )
    lab = labels.select(F.col("node").alias("n"), F.col("label").alias("lab"))
    # one pass: per-community strengths carry both totals, so the edge
    # relation is consumed ONCE (no multi-consumer recompute)
    per_ls = (
        e.join(lab.select(F.col("n").alias("s"), F.col("lab").alias("ls")), "s")
        .join(lab.select(F.col("n").alias("d"), F.col("lab").alias("ld")), "d")
        .groupBy("ls")
        .agg(
            F.sum("w").alias("deg_c"),
            F.sum(
                F.when(F.col("ls") == F.col("ld"), F.col("w")).otherwise(0)
            ).alias("int_c"),
        )
    )
    return per_ls.agg(
        F.sum("deg_c").alias("two_m"),
        F.sum("int_c").alias("internal_w"),
        F.sum(F.col("deg_c") * F.col("deg_c")).alias("sum_degsq"),
    ).select(
        "two_m",
        "internal_w",
        (F.col("two_m") * F.col("internal_w") - F.col("sum_degsq")).alias("q_num"),
        (
            (F.col("two_m") * F.col("internal_w") - F.col("sum_degsq")).cast("double")
            / (F.col("two_m") * F.col("two_m")).cast("double")
        ).alias("modularity"),
    )


def modularity_oracle(edges_sql: str, n_rounds: int = 4) -> str:
    """DuckDB twin of ``modularity(term_graph, label_propagation(...))`` —
    the unrolled LPA chain with the modularity aggregate on top."""
    lpa = label_propagation_oracle(edges_sql, n_rounds=n_rounds)
    # reuse the LPA oracle's WITH-chain by nesting its full SELECT
    return f"""
        WITH lab AS MATERIALIZED ({lpa}),
        ew AS MATERIALIZED (
          SELECT src AS s, dst AS d, CAST(w AS BIGINT) AS w FROM ({edges_sql})
        ),
        tagged AS MATERIALIZED (
          SELECT ew.w, ls.label AS ls, ld.label AS ld
          FROM ew JOIN lab ls ON ls.node = ew.s JOIN lab ld ON ld.node = ew.d
        ),
        tot AS (
          SELECT CAST(SUM(w) AS BIGINT) AS two_m,
                 CAST(SUM(CASE WHEN ls = ld THEN w ELSE 0 END) AS BIGINT)
                   AS internal_w
          FROM tagged
        ),
        dsq AS (
          SELECT CAST(SUM(deg_c * deg_c) AS BIGINT) AS sum_degsq FROM (
            SELECT CAST(SUM(w) AS BIGINT) AS deg_c FROM tagged GROUP BY ls
          )
        )
        SELECT two_m, internal_w,
               two_m * internal_w - sum_degsq AS q_num,
               CAST(two_m * internal_w - sum_degsq AS DOUBLE)
                 / CAST(two_m * two_m AS DOUBLE) AS modularity
        FROM tot CROSS JOIN dsq
    """


def link_prediction(
    edges: DataFrame,
    max_hub_degree: int = 64,
    topn: int = 50,
) -> DataFrame:
    """Neighborhood-based link prediction (Liben-Nowell & Kleinberg 2003)
    over a symmetric edge set: for every NON-adjacent pair (u, v) sharing
    at least one neighbor, the three classic scores —

    - ``cn``: common-neighbor count (exact integer);
    - ``aa_micro``: Adamic-Adar ``sum(1/log2 deg(w))`` in exact micro
      units via the repo's integer-log2 device ``length(bin(deg)) - 1``
      (a common neighbor has deg >= 2 by construction, so the divisor is
      never 0);
    - ``ra_micro``: resource allocation ``sum(1/deg(w))`` in micro units.

    Candidates come from ONE wedge self-join through each center w —
    never an all-pairs product. Skew posture: a hub center contributes
    deg(w)^2 wedge rows, so centers with deg(w) > ``max_hub_degree`` are
    excluded (the standard AA rationale: a hub's 1/log(deg) contribution
    is negligible while its wedge fan-out is quadratic — dropping it
    bounds the join at max_hub_degree^2 rows per center at any corpus
    size). Existing edges leave via one anti-join on the undirected
    adjacency. Output: top ``topn`` by (aa_micro DESC, cn DESC, u, v).
    """
    adj = edges.select("src", "dst").distinct()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("degw"))
    centers = deg.filter(
        (F.col("degw") >= 2) & (F.col("degw") <= max_hub_degree)
    )
    e1 = adj.join(centers, "src").select(
        F.col("src").alias("w"), F.col("dst").alias("u"), "degw"
    )
    e2 = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = e1.join(e2, "w").filter(F.col("u") < F.col("v"))
    und = adj.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    cand = wedges.join(und, ["u", "v"], "left_anti")
    scored = cand.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum(F.expr("1000000 div (length(bin(degw)) - 1)"))
        .cast("long")
        .alias("aa_micro"),
        F.sum(F.expr("1000000 div degw")).cast("long").alias("ra_micro"),
    )
    return scored.orderBy(
        F.col("aa_micro").desc(), F.col("cn").desc(), "u", "v"
    ).limit(topn)


def link_prediction_oracle(
    edges_sql: str, max_hub_degree: int = 64, topn: int = 50
) -> str:
    """DuckDB twin of :func:`link_prediction`."""
    return f"""
        WITH adj AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM ({edges_sql})
        ),
        deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS degw FROM adj GROUP BY 1
        ),
        centers AS (
          SELECT src AS w, degw FROM deg
          WHERE degw >= 2 AND degw <= {max_hub_degree}
        ),
        wedges AS (
          SELECT e1.dst AS u, e2.dst AS v, c.degw
          FROM centers c
          JOIN adj e1 ON e1.src = c.w
          JOIN adj e2 ON e2.src = c.w
          WHERE e1.dst < e2.dst
        ),
        cand AS (
          SELECT wedges.* FROM wedges
          ANTI JOIN (SELECT src AS u, dst AS v FROM adj WHERE src < dst) x
            USING (u, v)
        )
        SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
               CAST(SUM(1000000 // (length(bin(degw)) - 1)) AS BIGINT)
                 AS aa_micro,
               CAST(SUM(1000000 // degw) AS BIGINT) AS ra_micro
        FROM cand GROUP BY 1, 2
        ORDER BY aa_micro DESC, cn DESC, u, v
        LIMIT {topn}
    """


def assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) — do hubs link to
    hubs (r > 0, social-network shape) or to leaves (r < 0, hub-and-
    spoke / core-periphery)? The one-number mixing diagnostic that tells
    you whether a term/near-dup graph will shatter or percolate under
    node removal.

    r is EXACTLY the Pearson correlation of endpoint degrees over the
    directed edge list, so the repo's linear_fit calculus applies
    verbatim: exact BIGINT sufficient sums over (deg_src, deg_dst)
    pairs, cross-products, and ONE fixed double expression at the end —
    bit-identical across engines. Input: symmetric (src, dst[, w]) edges
    (both directions present, as term_graph emits); degrees count
    distinct neighbors.

    Output one row: ``(n_edges, n_nodes, r)``.

    Scale: one degree aggregation, two broadcast-or-shuffle equi-joins
    edge->degree, one global sum rollup. Nothing quadratic.
    """
    adj = edges.select("src", "dst").distinct()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    paired = (
        adj.join(deg.withColumnRenamed("src", "a").withColumnRenamed("d", "da"),
                 F.col("src") == F.col("a"))
        .join(deg.withColumnRenamed("src", "b").withColumnRenamed("d", "db"),
              F.col("dst") == F.col("b"))
        .select("da", "db")
    )
    s = paired.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("da").alias("sx"),
        F.sum("db").alias("sy"),
        F.sum(F.col("da") * F.col("da")).alias("sxx"),
        F.sum(F.col("db") * F.col("db")).alias("syy"),
        F.sum(F.col("da") * F.col("db")).alias("sxy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        s.crossJoin(F.broadcast(n_nodes))
        .filter((dx > 0) & (dy > 0))
        .select(
            F.col("m").cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            (
                num.cast("double")
                / (
                    F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
                )
            ).alias("r"),
        )
    )


def assortativity_oracle(edges_sql: str) -> str:
    """DuckDB twin of :func:`assortativity` (same fixed double ops)."""
    return f"""
        WITH adj AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM ({edges_sql})
        ),
        deg AS MATERIALIZED (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1
        ),
        paired AS (
          SELECT a.d AS da, b.d AS db
          FROM adj JOIN deg a ON a.src = adj.src
          JOIN deg b ON b.src = adj.dst
        ),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(da) AS BIGINT) AS sx, CAST(SUM(db) AS BIGINT) AS sy,
                 CAST(SUM(da*da) AS BIGINT) AS sxx,
                 CAST(SUM(db*db) AS BIGINT) AS syy,
                 CAST(SUM(da*db) AS BIGINT) AS sxy
          FROM paired
        )
        SELECT m AS n_edges,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               CAST(m * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS r
        FROM s
        WHERE m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
    """


def degree_profile(edges: DataFrame) -> DataFrame:
    """Log2-binned degree distribution — the first thing to look at on
    any large graph (a straight line across the log bins is the
    power-law signature; a hump means a characteristic scale). Bins via
    the integer-log2 device ``length(bin(d)) - 1`` — exact in any
    engine, and the natural binning for heavy tails.

    Input: symmetric (src, dst[, w]) edges. Output per bin:
    ``(deg_bin, lo_deg, n_nodes, edge_endpoints, share_ppm)`` where
    ``edge_endpoints`` sums the bin's degrees (its share of edge mass —
    the skew number a partitioner cares about) and ``share_ppm`` is the
    exact node-share trunc-div.

    Scale: one degree aggregation, one bin rollup — both
    key-cardinality-sized.
    """
    from pyspark.sql import Window

    deg = (
        edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    binned = deg.withColumn(
        "deg_bin", F.expr("length(bin(d)) - 1")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        binned.groupBy("deg_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("d").alias("edge_endpoints"),
        )
        .withColumn("lo_deg", F.expr("CAST(pow(2, deg_bin) AS BIGINT)"))
        .withColumn("n_total", F.sum("n_nodes").over(wall))
        .select(
            F.col("deg_bin").cast("long").alias("deg_bin"),
            "lo_deg",
            "n_nodes",
            "edge_endpoints",
            F.expr("(n_nodes * 1000000) div n_total").alias("share_ppm"),
        )
    )


def degree_profile_oracle(edges_sql: str) -> str:
    """DuckDB twin of :func:`degree_profile`."""
    return f"""
        WITH deg AS (
          SELECT src, CAST(COUNT(*) AS BIGINT) AS d
          FROM (SELECT DISTINCT src, dst FROM ({edges_sql})) GROUP BY 1
        ),
        binned AS (
          SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS deg_bin, d FROM deg
        )
        SELECT deg_bin,
               CAST(pow(2, deg_bin) AS BIGINT) AS lo_deg,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d) AS BIGINT) AS edge_endpoints,
               (CAST(COUNT(*) AS BIGINT) * 1000000)
                 // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS share_ppm
        FROM binned GROUP BY 1
    """


def _edge_support(e: DataFrame) -> DataFrame:
    """Exact per-EDGE triangle counts ("support") over a canonical
    ``(a < b)`` distinct edge relation — the edge-level sibling of
    :func:`triangle_counts`, same degree-oriented wedge device (out-degree
    bounded by O(sqrt(m)), skew-safe on power-law graphs, every triangle
    enumerated exactly once), with the triangle exploded back onto its
    three canonical edges. Output: ``(a, b, s)``; edges in no triangle
    are absent (support 0)."""
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        F.broadcast(deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))),
        "a",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))),
        "b",
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).localCheckpoint(eager=True)  # both wedge sides + the closer
    w1 = o.select("u", F.col("v").alias("v1"), F.col("dv").alias("d1"))
    w2 = o.select("u", F.col("v").alias("v2"), F.col("dv").alias("d2"))
    wedges = w1.join(w2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closer = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedges.join(closer, ["v1", "v2"]).select("u", "v1", "v2")
    sides = (
        tri.select(F.col("u").alias("x"), F.col("v1").alias("y"))
        .union(tri.select(F.col("u").alias("x"), F.col("v2").alias("y")))
        .union(tri.select(F.col("v1").alias("x"), F.col("v2").alias("y")))
    )
    return (
        sides.select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("s"))
    )


def ktruss(
    pairs: DataFrame,
    k: int,
    n_rounds: int = 3,
    neighbor_cap: int | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-truss extraction by iterative support peeling: repeatedly drop
    edges in fewer than ``k - 2`` triangles (removals lower neighboring
    edges' support, cascading) — the EDGE-cohesion complement of
    :func:`kcore` (a k-core can still be a chain of loosely-glued hubs; a
    k-truss edge is wedged into k-2 common-neighbor triangles, the
    standard "is this cluster a real clique-like core or bridged
    chains?" extractor — directly answering what
    ``dedup.transitivity_audit`` measures, by CUTTING the bridges).

    ``neighbor_cap`` bounds the graph BEFORE peeling: keep an edge only
    when each endpoint lists the other among its ``cap`` lowest-id
    neighbors (mutual truncation — max degree <= cap by construction).
    Exact triangle enumeration is inherently cubic on a near-clique (the
    sf0.1 near-dup cluster is ~3.4k docs: ~10^9 oriented wedges, OOM —
    measured), and a templated corpus at 100 TB always contains one;
    the capped subgraph bounds wedges at ``m * (cap-1)/2`` while keeping
    the cohesion structure (same deterministic-truncation contract as
    ``dedup.pair_graph_stats``). ``None`` = exact truss, for graphs
    already degree-bounded.

    Like :func:`kcore`, the peel depth is the bounded contract:
    ``n_rounds`` rounds guarantee convergence for cascades up to that
    depth (fixpoint asserted via one extra round in tests; the probe
    graph converges in 3). Output: per-node truss membership ``(node,
    truss_degree)`` — nodes of the surviving edge relation with their
    in-truss degree.

    Scale per round: one degree-oriented triangle enumeration (wedge
    join bounded by O(sqrt(m)) out-degree — never raw deg² on hubs) +
    one equi-join back to the edge set; edges localCheckpoint per round
    (DESIGN.md iterative-loop rule).

    Requires ``k >= 3``: the support relation comes from an inner join
    against per-edge triangle counts, which drops triangle-free edges —
    correct for any real truss (k-2 >= 1) but a k<=2 "truss" would have
    to KEEP them, so that regime is rejected rather than silently
    deviating from the definition.
    """
    if k < 3:
        raise ValueError("ktruss requires k >= 3 (k<=2 is the raw edge set)")
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    if neighbor_cap is not None:
        e = _mutual_truncate(e, neighbor_cap)
    e = e.localCheckpoint(eager=True)
    for _ in range(n_rounds):
        sup = _edge_support(e)
        e = (
            e.join(sup, ["a", "b"])
            .filter(F.col("s") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("truss_degree"))
        .select(F.col("node").cast("long").alias("node"), "truss_degree")
    )


def ktruss_oracle(
    pairs_sql: str, k: int, n_rounds: int = 3, neighbor_cap: int | None = None
) -> str:
    """DuckDB twin of :func:`ktruss`: the peel loop unrolled as chained
    MATERIALIZED CTEs (each round's edge set feeds the three-way triangle
    self-join AND the survivor join — the DESIGN.md inlining rule).
    ``pairs_sql`` must yield canonical ``(a, b)`` with ``a < b``."""
    if k < 3:
        raise ValueError("ktruss requires k >= 3 (k<=2 is the raw edge set)")
    if neighbor_cap is None:
        e0 = f"SELECT DISTINCT a, b FROM ({pairs_sql}) WHERE a <> b"
    else:
        e0 = f"""
          WITH raw AS (SELECT DISTINCT a, b FROM ({pairs_sql}) WHERE a <> b),
          sym AS (SELECT a AS u, b AS v FROM raw UNION ALL SELECT b, a FROM raw),
          tr AS MATERIALIZED (
            SELECT u, v FROM (
              SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
              FROM sym) WHERE rn <= {neighbor_cap})
          SELECT t1.u AS a, t1.v AS b
          FROM tr t1 JOIN tr t2 ON t1.u = t2.v AND t1.v = t2.u
          WHERE t1.u < t1.v"""
    parts = [f"e0 AS MATERIALIZED ({e0})"]
    for i in range(n_rounds):
        parts.append(
            f"""sup{i} AS MATERIALIZED (
              SELECT a, b, CAST(COUNT(*) AS BIGINT) AS s FROM (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e{i} e1 JOIN e{i} e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e{i} e3 ON e3.a = e1.b AND e3.b = e2.b
              ) tri, LATERAL (VALUES (tri.x, tri.y), (tri.x, tri.z),
                              (tri.y, tri.z)) sides(a, b)
              GROUP BY 1, 2
            ), e{i + 1} AS MATERIALIZED (
              SELECT e.a, e.b FROM e{i} e
              JOIN sup{i} s ON e.a = s.a AND e.b = s.b AND s.s >= {k - 2}
            )"""
        )
    return f"""
        WITH {", ".join(parts)}
        SELECT CAST(node AS BIGINT) AS node,
               CAST(COUNT(*) AS BIGINT) AS truss_degree
        FROM (
          SELECT a AS node FROM e{n_rounds}
          UNION ALL SELECT b FROM e{n_rounds}
        ) GROUP BY node
    """


def wedge_certificate(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> dict:
    """Exact sparsity certificate for uncapped triangle enumeration: the
    degree-oriented wedge device (:func:`_edge_support`) does precisely
    ``sum_u C(d_out(u), 2)`` join work, and that number is computable in
    ONE cheap pass (degrees + orientation + one aggregate) BEFORE any
    enumeration. Returns driver-known scalars ``{'m', 'max_dout',
    'wedge_work'}`` — ``wedge_work`` is the exact count of oriented
    wedges the enumeration would generate, so a caller can gate the
    uncapped exact path on a hard budget instead of guessing from
    degree heuristics (the sf0.1 near-clique OOM lesson, upgraded from
    "always cap" to "measure, then run exact when provably safe")."""
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        F.broadcast(deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))),
        "a",
    ).join(
        F.broadcast(deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))),
        "b",
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    row = (
        ed.select(F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.sum("d").alias("m"),
            F.max("d").alias("max_dout"),
            F.sum(F.expr("d * (d - 1) div 2")).alias("wedge_work"),
        )
        .first()
    )
    return {
        "m": int(row["m"] or 0),
        "max_dout": int(row["max_dout"] or 0),
        "wedge_work": int(row["wedge_work"] or 0),
    }


def truss_decomposition_certified(
    pairs: DataFrame,
    k_max: int = 6,
    n_rounds: int = 3,
    wedge_budget: int = 2_000_000_000,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """UNCAPPED exact truss decomposition, gated by a measured sparsity
    certificate — the no-truncation path :func:`truss_decomposition`'s
    ``neighbor_cap`` exists to protect: the cap changes answers on dense
    graphs, so when the graph is PROVABLY sparse the exact form should
    run instead. "Provably" is :func:`wedge_certificate`'s exact wedge
    count — if the enumeration the peel is about to run would generate
    more than ``wedge_budget`` oriented wedges, this raises loudly
    (pointing at the capped form) rather than risking the executor OOM
    the round-8 near-clique hit. On a pass the result is the TRUE
    trussness (up to the k_max floor), bit-equal to
    ``truss_decomposition(..., neighbor_cap=None)`` and to its oracle.

    Scale: the certificate is one extra degree/orientation pass (cheap,
    broadcast joins); peel work is bounded by the certified wedge count
    per round, so the budget is a real guarantee, not a heuristic.
    """
    cert = wedge_certificate(pairs, a_col=a_col, b_col=b_col)
    if cert["wedge_work"] > wedge_budget:
        raise ValueError(
            f"truss_decomposition_certified: graph fails the sparsity "
            f"certificate (wedge_work={cert['wedge_work']} > budget "
            f"{wedge_budget}; m={cert['m']}, max_dout={cert['max_dout']})"
            f" — use truss_decomposition(..., neighbor_cap=...) for a "
            f"deterministic bounded answer on dense graphs"
        )
    # certificate-driven tuning: the measurement that PROVES the peel is
    # safe also tells us when it is overhead-dominated — a small wedge
    # count means every one of the (k_max-2) x n_rounds rounds shuffles
    # a tiny relation, where ambient 32-partition exchanges pay pure
    # scheduling cost (measured 3.4 -> 2.8s warm at sf0.1). Plan-only
    # change; results identical.
    from flink_example_spark.session import shuffle_partitions

    if cert["wedge_work"] <= 1_000_000:
        with shuffle_partitions(pairs.sparkSession, 4):
            return truss_decomposition(
                pairs, k_max=k_max, n_rounds=n_rounds, neighbor_cap=None,
                a_col=a_col, b_col=b_col,
            )
    return truss_decomposition(
        pairs, k_max=k_max, n_rounds=n_rounds, neighbor_cap=None,
        a_col=a_col, b_col=b_col,
    )


def _mutual_truncate(e: DataFrame, cap: int) -> DataFrame:
    """Degree-bounding sparsifier: keep a canonical ``(a < b)`` edge only
    when EACH endpoint lists the other among its ``cap`` lowest-id
    neighbors — max degree <= cap by construction (deterministic, same
    truncation both engines; the device behind bounded k-truss and
    densest-subgraph peeling on templated corpora whose dup graphs
    always contain one giant near-clique)."""
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    tr = (
        sym.withColumn(
            "rn", F.row_number().over(Window.partitionBy("u").orderBy("v"))
        )
        .filter(F.col("rn") <= cap)
        .select("u", "v")
        .localCheckpoint(eager=True)  # both sides of the mutual join
    )
    return (
        tr.alias("t1")
        .join(
            tr.alias("t2"),
            (F.col("t1.u") == F.col("t2.v")) & (F.col("t1.v") == F.col("t2.u")),
        )
        .filter(F.col("t1.u") < F.col("t1.v"))
        .select(F.col("t1.u").alias("a"), F.col("t1.v").alias("b"))
    )


_MUTUAL_TRUNCATE_SQL = """
  WITH raw AS (SELECT DISTINCT a, b FROM ({pairs_sql}) WHERE a <> b),
  sym AS (SELECT a AS u, b AS v FROM raw UNION ALL SELECT b, a FROM raw),
  tr AS MATERIALIZED (
    SELECT u, v FROM (
      SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
      FROM sym) WHERE rn <= {cap})
  SELECT t1.u AS a, t1.v AS b
  FROM tr t1 JOIN tr t2 ON t1.u = t2.v AND t1.v = t2.u
  WHERE t1.u < t1.v"""


def densest_subgraph(
    pairs: DataFrame,
    n_rounds: int = 5,
    eps_num: int = 1,
    eps_den: int = 10,
    neighbor_cap: int | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Densest-subgraph extraction by batched greedy peeling (Bahmani,
    Kumar & Vassilvitskii 2012, "Densest Subgraph in Streaming and
    MapReduce"): each round removes EVERY node whose degree is below
    ``2(1+eps)`` times the current average density rho = |E|/|S| —
    O(log n) rounds instead of Charikar's n sequential min-degree peels,
    with a 2(1+eps)-approximation guarantee. The answer is the ROUND
    with the best density, not the last survivor set.

    Portability: the peel threshold is the integer cross-multiplication
    ``deg * |S| * eps_den >= 2 * (eps_den + eps_num) * |E|``; round
    densities compare as floor-quantized micros ``(|E| * 1e6) div |S|``
    (ties -> earliest round) — no rational ever becomes a double.

    Output: the best round's members ``(node, degree)`` with their
    in-subgraph degree.

    Scale per round: one degree aggregation + two semi-joins against the
    (shrinking) survivor set (the :func:`kcore` shape); the per-round
    (|S|, |E|) summary is the only thing the driver sees (one row per
    round — the BPE precedent). ``neighbor_cap`` applies
    :func:`_mutual_truncate` first where the input may contain a giant
    near-clique.
    """
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    if neighbor_cap is not None:
        e = _mutual_truncate(e, neighbor_cap)
    e = e.localCheckpoint(eager=True)
    spark = pairs.sparkSession
    rounds: list[tuple[int, DataFrame]] = []  # (dens_micro, edges)
    for _ in range(n_rounds):
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("dg"))
        row = deg.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dg").alias("dd")
        ).first()
        n, n_edges = int(row["n"] or 0), int(row["dd"] or 0) // 2
        if n == 0:
            break  # every later round is empty too — cannot win the argmax
        rounds.append(((n_edges * 1_000_000) // n, e))
        keep = deg.filter(
            F.col("dg") * F.lit(n * eps_den)
            >= F.lit(2 * (eps_den + eps_num) * n_edges)
        ).select(F.col("u"))
        e = (
            e.join(F.broadcast(keep.withColumnRenamed("u", "a")), "a", "left_semi")
            .join(F.broadcast(keep.withColumnRenamed("u", "b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    if not rounds:
        return spark.createDataFrame([], "node long, degree long")
    best = max(range(len(rounds)), key=lambda i: (rounds[i][0], -i))
    eb = rounds[best][1]
    return (
        eb.select(F.col("a").alias("node"))
        .union(eb.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("node").cast("long").alias("node"), "degree")
    )


def densest_subgraph_oracle(
    pairs_sql: str,
    n_rounds: int = 5,
    eps_num: int = 1,
    eps_den: int = 10,
    neighbor_cap: int | None = None,
) -> str:
    """DuckDB twin of :func:`densest_subgraph`: the peel unrolled as
    MATERIALIZED CTE rounds with a per-round (n, e) summary; the best
    round is the earliest floor-quantized density argmax."""
    if neighbor_cap is None:
        e0 = f"SELECT DISTINCT a, b FROM ({pairs_sql}) WHERE a <> b"
    else:
        e0 = _MUTUAL_TRUNCATE_SQL.format(pairs_sql=pairs_sql, cap=neighbor_cap)
    parts = [f"e0 AS MATERIALIZED ({e0})"]
    summaries = []
    degs = []
    for i in range(n_rounds):
        parts.append(
            f"""deg{i} AS MATERIALIZED (
              SELECT u, CAST(COUNT(*) AS BIGINT) AS dg FROM (
                SELECT a AS u FROM e{i} UNION ALL SELECT b FROM e{i}
              ) GROUP BY u),
            s{i} AS MATERIALIZED (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     COALESCE(CAST(SUM(dg) AS BIGINT), 0) // 2 AS e
              FROM deg{i}),
            e{i + 1} AS MATERIALIZED (
              SELECT x.a, x.b FROM e{i} x, s{i}
              WHERE x.a IN (SELECT u FROM deg{i}
                            WHERE dg * s{i}.n * {eps_den}
                                  >= 2 * {eps_den + eps_num} * s{i}.e)
                AND x.b IN (SELECT u FROM deg{i}
                            WHERE dg * s{i}.n * {eps_den}
                                  >= 2 * {eps_den + eps_num} * s{i}.e))"""
        )
        summaries.append(
            f"SELECT {i} AS r, n, e FROM s{i} WHERE n > 0"
        )
        degs.append(f"SELECT {i} AS r, u AS node, dg AS degree FROM deg{i}")
    parts.append(
        f"""summary AS MATERIALIZED ({" UNION ALL ".join(summaries)}),
        best AS (
          SELECT r FROM summary
          ORDER BY (e * 1000000) // n DESC, r ASC LIMIT 1)"""
    )
    return f"""
        WITH {", ".join(parts)}
        SELECT CAST(d.node AS BIGINT) AS node, CAST(d.degree AS BIGINT) AS degree
        FROM ({" UNION ALL ".join(degs)}) d JOIN best ON d.r = best.r
    """


def truss_decomposition(
    pairs: DataFrame,
    k_max: int = 6,
    n_rounds: int = 3,
    neighbor_cap: int | None = None,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Truss decomposition — the MAX-k-per-edge generalization of
    :func:`ktruss`: each edge's trussness is the largest ``k`` such that
    it survives the k-truss peel ("how deep into the cohesion hierarchy
    does this relationship sit" — the edge-level analogue of k-core's
    node coreness, the standard community-strength score). Bounded
    unroll: peel at k = 3, 4, ..., ``k_max`` in sequence; edges dropped
    by the k-peel are labeled trussness k-1 (an edge-sized anti-join at
    each peel boundary), survivors of the final peel are labeled
    ``k_max`` (a floor: their true trussness is >= k_max — the bounded
    contract, like n_rounds).

    Each peel reuses the :func:`ktruss` machinery: ``n_rounds`` support/
    filter rounds (fixpoint for cascades up to that depth), edge sets
    localCheckpoint-ed per round (iterative-loop rule), and the
    ``neighbor_cap`` mutual lowest-id truncation applied ONCE up front
    (every triangle/wedge operator carries the degree bound — the sf0.1
    near-clique OOM lesson).

    Output: ``(a, b, trussness)`` with trussness in [2, k_max]; 2 means
    the edge is in no 3-truss (dropped by the first peel, including
    triangle-free edges).

    Scale: (k_max - 2) peels x n_rounds rounds, each one degree-oriented
    triangle enumeration over a shrinking capped edge set plus an
    edge-sized equi/anti join — the same per-round cost envelope as
    ktruss, k_max - 2 times.
    """
    if k_max < 3:
        raise ValueError("truss_decomposition requires k_max >= 3")
    e = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
    )
    if neighbor_cap is not None:
        e = _mutual_truncate(e, neighbor_cap)
    cur = e.localCheckpoint(eager=True)
    n_cur = cur.count()
    # Early-exit device (bit-identical to the full unroll): peeling only
    # REMOVES edges, so a round that removes nothing makes every further
    # round at that k a no-op, and an unchanged edge set keeps the
    # support relation valid across k (the next k just filters the SAME
    # support at a higher threshold). Counts compare checkpointed sets,
    # so set-shrink == count-drop. The DuckDB twin unrolls the full
    # round grid — no-op rounds are no-ops there too, same fixpoint.
    sup = None
    parts: list[DataFrame] = []
    for k in range(3, k_max + 1):
        nxt = cur
        for _ in range(n_rounds):
            if sup is None:
                sup = _edge_support(nxt)
            cand = (
                nxt.join(sup, ["a", "b"])
                .filter(F.col("s") >= k - 2)
                .select("a", "b")
                .localCheckpoint(eager=True)
            )
            n_nxt = cand.count()
            if n_nxt == n_cur:
                nxt = cand
                break  # fixpoint at this k; support stays valid
            nxt, n_cur, sup = cand, n_nxt, None
        parts.append(
            cur.join(nxt, ["a", "b"], "left_anti").select(
                "a", "b", F.lit(k - 1).cast("long").alias("trussness")
            )
        )
        cur = nxt
    parts.append(
        cur.select("a", "b", F.lit(k_max).cast("long").alias("trussness"))
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def truss_decomposition_oracle(
    pairs_sql: str,
    k_max: int = 6,
    n_rounds: int = 3,
    neighbor_cap: int | None = None,
) -> str:
    """DuckDB twin of :func:`truss_decomposition`: (k_max - 2) peels
    unrolled as chained MATERIALIZED CTEs (every round's edge set feeds
    the triangle self-join, the survivor join AND a peel-boundary
    anti-join — the DESIGN.md inlining rule). ``pairs_sql`` must yield
    ``(a, b)`` rows (any orientation; canonicalized here)."""
    if k_max < 3:
        raise ValueError("truss_decomposition requires k_max >= 3")
    base = f"""
      SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
      FROM ({pairs_sql}) WHERE a <> b"""
    if neighbor_cap is not None:
        base = f"""
          WITH raw AS ({base}),
          sym AS (SELECT a AS u, b AS v FROM raw UNION ALL SELECT b, a FROM raw),
          tr AS MATERIALIZED (
            SELECT u, v FROM (
              SELECT u, v, ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) AS rn
              FROM sym) WHERE rn <= {neighbor_cap})
          SELECT t1.u AS a, t1.v AS b
          FROM tr t1 JOIN tr t2 ON t1.u = t2.v AND t1.v = t2.u
          WHERE t1.u < t1.v"""
    parts = [f"p3_0 AS MATERIALIZED ({base})"]
    for k in range(3, k_max + 1):
        for r in range(n_rounds):
            src = f"p{k}_{r}"
            parts.append(
                f"""sup{k}_{r} AS MATERIALIZED (
                  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS s FROM (
                    SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM {src} e1 JOIN {src} e2 ON e1.a = e2.a AND e1.b < e2.b
                    JOIN {src} e3 ON e3.a = e1.b AND e3.b = e2.b
                  ) tri, LATERAL (VALUES (tri.x, tri.y), (tri.x, tri.z),
                                  (tri.y, tri.z)) sides(a, b)
                  GROUP BY 1, 2
                ), p{k}_{r + 1} AS MATERIALIZED (
                  SELECT e.a, e.b FROM {src} e
                  JOIN sup{k}_{r} s
                    ON e.a = s.a AND e.b = s.b AND s.s >= {k - 2}
                )"""
            )
        if k < k_max:
            parts.append(
                f"p{k + 1}_0 AS MATERIALIZED"
                f" (SELECT a, b FROM p{k}_{n_rounds})"
            )
    selects = []
    for k in range(3, k_max + 1):
        selects.append(
            f"""SELECT c.a, c.b, CAST({k - 1} AS BIGINT) AS trussness
                FROM p{k}_0 c ANTI JOIN p{k}_{n_rounds} n
                  ON c.a = n.a AND c.b = n.b"""
        )
    selects.append(
        f"SELECT a, b, CAST({k_max} AS BIGINT) AS trussness"
        f" FROM p{k_max}_{n_rounds}"
    )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(selects)
