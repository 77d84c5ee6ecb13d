"""Preference-data operators — pairwise-comparison aggregation for
RLHF/eval pipelines: Bradley–Terry strength fitting over match outcomes
and Fleiss' kappa inter-annotator agreement.

Why this family: a training-data pipeline that collects human (or
LLM-judge) preferences needs (a) a principled aggregate of "A beat B"
records into per-item strengths — Bradley–Terry (1952) via Hunter's
(2004) MM iteration — and (b) an agreement audit over the raw
annotations before trusting them — Fleiss' kappa (1971). Both are
expressed here in the repo's engine-portable integer discipline
(DESIGN.md): micro-unit BIGINT state, non-negative `div`, sign-and-
magnitude division where a quantity can go negative, and hand-written
DuckDB oracle twins that evaluate the identical arithmetic.

Scale shape: Bradley–Terry state is item-sized (one weight row per
item); the per-round work is the pair-count relation joined to the
item-sized weight relation twice (both broadcast-able) plus one
aggregate — the Pregel/pagerank pattern with per-round lineage cuts.
Fleiss' kappa is two hash aggregations (per-(item,cat) counts, then the
corpus moments) with every intermediate quantized to micro units
BEFORE summation, so the BIGINT bound is independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO6 = 1_000_000
MICRO12 = 1_000_000_000_000


def synth_matches(
    events: DataFrame, n_items: int = 8, tilt: int = 120_000
) -> DataFrame:
    """Deterministic pairwise matches derived from the events table —
    the fixture generator for the preference family (no RNG state: the
    engine-portable md5 bucket is the noise source, DESIGN.md).

    Each event becomes one match between items ``a = event_id mod
    n_items`` and ``b = (event_id div n_items) mod n_items`` (self-pairs
    dropped); the winner is the larger of ``hash(event_id|x) mod 1e6 +
    x * tilt`` — i.e. uniform noise plus a PLANTED linear strength ramp,
    so higher item ids genuinely win more and a fitted strength order
    is testable. Ties break to ``a`` (>=), identically in both engines.

    Output: ``(match_id, winner, loser)``.
    """
    e = events.select(
        F.col("event_id").cast("long").alias("match_id"),
        (F.abs(F.col("event_id")) % F.lit(n_items)).alias("a"),
        F.expr(
            f"(abs(event_id) div {n_items}) % {n_items}"
        ).alias("b"),
    ).filter(F.col("a") != F.col("b"))

    def score(item: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("match_id").cast("string"),
                        item.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return h % F.lit(MICRO6) + item * F.lit(tilt)

    sa, sb = score(F.col("a")), score(F.col("b"))
    return e.select(
        "match_id",
        F.when(sa >= sb, F.col("a")).otherwise(F.col("b")).alias("winner"),
        F.when(sa >= sb, F.col("b")).otherwise(F.col("a")).alias("loser"),
    )


def synth_matches_sql(n_items: int = 8, tilt: int = 120_000) -> str:
    """DuckDB twin of :func:`synth_matches` over the ``events`` view
    (identical md5 bucket, ramp, and tie-break)."""

    def score(item: str) -> str:
        return (
            f"(CAST(concat('0x', substr(md5(CAST(match_id AS VARCHAR)"
            f" || '|' || CAST({item} AS VARCHAR)), 1, 8)) AS BIGINT)"
            f" % {MICRO6} + {item} * {tilt})"
        )

    return f"""
        SELECT match_id,
               CASE WHEN {score('a')} >= {score('b')} THEN a ELSE b END
                 AS winner,
               CASE WHEN {score('a')} >= {score('b')} THEN b ELSE a END
                 AS loser
        FROM (
          SELECT CAST(event_id AS BIGINT) AS match_id,
                 abs(event_id) % {n_items} AS a,
                 (abs(event_id) // {n_items}) % {n_items} AS b
          FROM events
        ) WHERE a <> b
    """


def bradley_terry(
    matches: DataFrame,
    n_iter: int = 8,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Bradley–Terry strength fit over pairwise match outcomes — the
    aggregate a preference-data (RLHF / arena-eval) pipeline runs to
    turn "A beat B" rows into per-item strengths. Hunter's (2004) MM
    update, deterministic across engines::

        w_i  <-  W_i / sum_j n_ij / (w_i + w_j)      (then max-rescale)

    with ``W_i`` = total wins of i and ``n_ij`` = matches between i and
    j. All arithmetic is 64-bit integer: strengths live in micro units
    (1e6 == strength 1.0); each opponent contributes ``(n_ij * 1e12)
    div (w_i + w_j)`` to the denominator, the update is ``(W_i * 1e12)
    div D_i``, and every round rescales so ``max w == 1e6`` (strengths
    are scale-free, and the rescale keeps the integers bounded — the
    PCA power-iteration device). Zero-win items go to exactly 0; the
    ``greatest(.., 1)`` guards make the all-zero corner total rather
    than a division error. Floor losses are identical in any engine,
    which is the point.

    Overflow bound: ``max(W_i, n_ij) * 1e12 < 2^63`` — i.e. up to ~9.2e6
    wins per item / matches per pair; divide counts by a common factor
    past that (the fit is invariant under count scaling).

    Scale: pair counts shuffle once; each of the ``n_iter`` rounds joins
    the ITEM-SIZED weight relation to them twice (broadcast) and runs
    one aggregate, with a per-round ``localCheckpoint`` lineage cut
    (DESIGN.md multi-consumer rule). State is item-sized throughout.

    Output: ``(item, strength_micro BIGINT, strength DOUBLE, wins,
    n_matches)`` — strength is the single exactly-rounded division
    strength_micro / 1e6.
    """
    wc = match_wincounts(matches, winner_col, loser_col)
    return bradley_terry_from_wincounts(wc, n_iter=n_iter)


def match_wincounts(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Per-pair win-count monoid over match rows: canonical ``(i < j)``
    pair with ``(wi, wj)`` directional win counts — ONE hash aggregation,
    mergeable (sums), so it is also the state a live preference monitor
    keeps (streaming twin: same aggregation in update mode, MM algebra
    at read)."""
    m = matches.select(
        F.col(winner_col).cast("long").alias("winner"),
        F.col(loser_col).cast("long").alias("loser"),
    )
    return (
        m.select(
            F.least("winner", "loser").alias("i"),
            F.greatest("winner", "loser").alias("j"),
            (F.col("winner") < F.col("loser")).cast("long").alias("w_is_i"),
        )
        .groupBy("i", "j")
        .agg(
            F.sum("w_is_i").alias("wi"),
            F.sum(F.lit(1) - F.col("w_is_i")).alias("wj"),
        )
    )


def bradley_terry_from_wincounts(
    wc: DataFrame, n_iter: int = 8
) -> DataFrame:
    """The MM iteration of :func:`bradley_terry` over an already-
    aggregated win-count relation ``(i, j, wi, wj)`` (canonical i < j —
    :func:`match_wincounts`'s output, or a streaming monitor's merged
    state). Identical arithmetic, identical result."""
    sc = wc.sparkSession.sparkContext
    wc = wc.select(
        F.col("i").cast("long"),
        F.col("j").cast("long"),
        F.col("wi").cast("long"),
        F.col("wj").cast("long"),
    )
    pairs = wc.select("i", "j", (F.col("wi") + F.col("wj")).alias("n"))
    adj = (
        pairs.union(pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "n"))
        .repartition(sc.defaultParallelism, F.col("i"))
        .localCheckpoint(eager=True)
    )
    wins = (
        wc.select(F.col("i").alias("item"), F.col("wi").alias("w"))
        .union(wc.select(F.col("j").alias("item"), F.col("wj").alias("w")))
        .groupBy("item")
        .agg(F.sum("w").alias("wins"))
    )
    items = (
        adj.groupBy(F.col("i").alias("item"))
        .agg(F.sum("n").alias("n_matches"))
        .join(wins, "item", "left")
        .select(
            "item",
            F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
            F.col("n_matches").cast("long"),
        )
        .localCheckpoint(eager=True)
    )
    from flink_example_spark.session import shuffle_partitions

    w = items.select("item", F.lit(MICRO6).cast("long").alias("w"))
    # the per-round relations are ITEM-sized; the ambient 32-partition
    # shuffle pays per-partition job overhead 8x per round for nothing
    # (measured 6.8s -> ~5s warm at sf0.1 under 4) — the pair/item
    # checkpoints above already materialized the data-sized aggregation
    # at ambient parallelism, so this narrows only the tiny state loop
    with shuffle_partitions(wc.sparkSession, 4):
        for _ in range(n_iter):
            d = (
                adj.join(
                    F.broadcast(w.select(F.col("item").alias("i"), F.col("w").alias("wi"))),
                    "i",
                )
                .join(
                    F.broadcast(w.select(F.col("item").alias("j"), F.col("w").alias("wj"))),
                    "j",
                )
                .groupBy(F.col("i").alias("item"))
                .agg(
                    F.sum(
                        F.expr(f"(n * {MICRO12}) div greatest(wi + wj, 1)")
                    ).alias("d")
                )
            )
            upd = items.join(d, "item").select(
                "item",
                F.expr(f"(wins * {MICRO12}) div greatest(d, 1)").alias("w"),
            )
            mx = upd.agg(F.max("w").alias("mx"))
            w = (
                upd.crossJoin(F.broadcast(mx))
                .select(
                    "item",
                    F.expr(f"(w * {MICRO6}) div greatest(mx, 1)").alias("w"),
                )
                .localCheckpoint(eager=True)
            )
    return items.join(w, "item").select(
        "item",
        F.col("w").alias("strength_micro"),
        (F.col("w").cast("double") / F.lit(float(MICRO6))).alias("strength"),
        "wins",
        "n_matches",
    )


def bradley_terry_oracle(
    matches_sql: str, n_iter: int = 8, select_sql: str | None = None
) -> str:
    """DuckDB twin of :func:`bradley_terry`: the MM rounds unrolled as
    chained MATERIALIZED CTEs (per-round CTEs feed two consumers —
    DESIGN.md inlining rule). ``matches_sql`` must yield
    ``(winner, loser)``. ``select_sql`` replaces the final projection
    (``{w}`` = final weight CTE name) — the fit-audit twin reads the
    same chain with a different head."""
    rounds = []
    prev = "w0"
    for r in range(n_iter):
        rounds.append(
            f"""d{r} AS MATERIALIZED (
          SELECT a.i AS item,
                 CAST(SUM((a.n * {MICRO12}) // greatest(wi.w + wj.w, 1))
                      AS BIGINT) AS d
          FROM adj a
          JOIN {prev} wi ON a.i = wi.item
          JOIN {prev} wj ON a.j = wj.item
          GROUP BY 1),
        u{r} AS MATERIALIZED (
          SELECT it.item,
                 CAST((it.wins * {MICRO12}) // greatest(d.d, 1) AS BIGINT)
                   AS w
          FROM items it JOIN d{r} d USING (item)),
        mx{r} AS MATERIALIZED (
          SELECT CAST(MAX(w) AS BIGINT) AS mx FROM u{r}),
        w{r + 1} AS MATERIALIZED (
          SELECT item, CAST((w * {MICRO6}) // greatest(mx, 1) AS BIGINT)
                   AS w
          FROM u{r}, mx{r})"""
        )
        prev = f"w{r + 1}"
    chain = ",\n        ".join(rounds)
    if select_sql is None:
        select_sql = f"""SELECT it.item,
               w.w AS strength_micro,
               CAST(w.w AS DOUBLE) / {MICRO6} AS strength,
               it.wins, it.n_matches
        FROM items it JOIN {{w}} w USING (item)"""
    final = select_sql.format(w=prev)
    return f"""
        WITH m AS MATERIALIZED (
          SELECT CAST(winner AS BIGINT) AS winner,
                 CAST(loser AS BIGINT) AS loser
          FROM ({matches_sql})),
        pairs AS MATERIALIZED (
          SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM m GROUP BY 1, 2),
        adj AS MATERIALIZED (
          SELECT i, j, n FROM pairs
          UNION ALL SELECT j, i, n FROM pairs),
        items AS MATERIALIZED (
          SELECT a.i AS item,
                 CAST(COALESCE(wn.c, 0) AS BIGINT) AS wins,
                 CAST(SUM(a.n) AS BIGINT) AS n_matches
          FROM adj a
          LEFT JOIN (
            SELECT winner, COUNT(*) AS c FROM m GROUP BY 1
          ) wn ON a.i = wn.winner
          GROUP BY 1, 2),
        w0 AS MATERIALIZED (
          SELECT item, CAST({MICRO6} AS BIGINT) AS w FROM items),
        {chain}
        {final}
    """


def fleiss_kappa(
    annotations: DataFrame,
    n_raters: int = 4,
    item_col: str = "item",
    cat_col: str = "cat",
    seq_col: str = "seq",
) -> DataFrame:
    """Fleiss' kappa (1971) inter-annotator agreement — the audit a
    labeling pipeline runs over raw annotations before trusting them:
    how much better than chance do the raters agree?

    Fleiss' kappa is defined for a FIXED number of ratings per item, so
    the operator deterministically keeps the ``n_raters`` EARLIEST
    annotations per item (by ``seq_col``; a key-partitioned window) and
    DROPS items with fewer (counted in the audit row). With ``n_ik`` =
    kept ratings of category k on item i::

        P_i = (sum_k n_ik^2 - n) / (n (n - 1))       per-item agreement
        Pbar = mean_i P_i ,  Pe = sum_k p_k^2 ,  p_k = category share
        kappa = (Pbar - Pe) / (1 - Pe)

    Engine-portable integer discipline (quantize-BEFORE-sum, DESIGN.md):
    ``P_i`` and ``p_k`` are quantized to micro units per item / per
    category before any corpus-wide SUM, so every BIGINT stays bounded
    independent of corpus size (no N^2 terms); kappa can be negative,
    so the final division is the sign-and-magnitude form (round-8
    rule). Output values are exact integers — hash-stable anywhere.

    Output (tall, scalar): ``('kappa_micro', v)``, ``('p_bar_micro',
    v)``, ``('p_e_micro', v)``, per-category ``('pcat_<cat>', p_micro)``
    (controlled vocabulary — the string-keyed tall form the DESIGN.md
    round-9 rule allows), audits ``__n_items``, ``__n_raters``,
    ``__n_dropped_items``.

    Scale: one key-partitioned window (items), two hash aggregations.
    """
    n = n_raters
    a = annotations.select(
        F.col(item_col).alias("item"),
        F.col(cat_col).cast("string").alias("cat"),
        F.col(seq_col).cast("long").alias("seq"),
    )
    from pyspark.sql import Window

    ranked = a.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("item").orderBy("seq", "cat")
        ),
    )
    # lineage cuts at the two ITEM-SIZED relations (DESIGN.md
    # multi-consumer rule: the moments below read each of these twice+,
    # and without the cuts the annotation scan re-executes per consumer
    # — measured 7x on the plan audit)
    per_item_n = (
        ranked.groupBy("item")
        .agg(F.max("rn").alias("have"))
        .localCheckpoint(eager=True)
    )
    kept = ranked.filter(F.col("rn") <= n).join(
        per_item_n.filter(F.col("have") >= n).select("item"), "item"
    )
    nik = (
        kept.groupBy("item", "cat")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    # per-item agreement, micro-quantized BEFORE the corpus mean
    pi = nik.groupBy("item").agg(
        F.expr(
            f"((sum(c * c) - {n}) * {MICRO6}) div {n * (n - 1)}"
        ).alias("p_i")
    )
    n_items_kept = pi.agg(
        F.count(F.lit(1)).alias("ni"), F.sum("p_i").alias("sp")
    )
    # per-category share, micro-quantized BEFORE the squares sum
    cat_tot = nik.groupBy("cat").agg(F.sum("c").alias("ck"))
    pcat = cat_tot.crossJoin(
        F.broadcast(n_items_kept.select("ni"))
    ).select(
        "cat",
        F.expr(f"(ck * {MICRO6}) div greatest(ni * {n}, 1)").alias("p_k"),
    )
    pe = pcat.agg(
        F.expr(f"sum((p_k * p_k) div {MICRO6})").alias("pe")
    )
    dropped = per_item_n.filter(F.col("have") < n).agg(
        F.count(F.lit(1)).alias("nd")
    )
    summary = (
        n_items_kept.crossJoin(F.broadcast(pe))
        .crossJoin(F.broadcast(dropped))
        .select(
            F.expr("sp div greatest(ni, 1)").alias("p_bar"),
            F.col("pe"),
            F.col("ni"),
            F.col("nd"),
        )
        .select(
            F.expr(
                f"CASE WHEN p_bar - pe >= 0 THEN 1 ELSE -1 END"
                f" * ((abs(p_bar - pe) * {MICRO6})"
                f" div greatest({MICRO6} - pe, 1))"
            ).alias("kappa_micro"),
            "p_bar",
            "pe",
            "ni",
            "nd",
        )
    )
    tall = summary.selectExpr(
        "stack(6, 'kappa_micro', kappa_micro, 'p_bar_micro', p_bar,"
        " 'p_e_micro', pe, '__n_items', ni, '__n_raters',"
        f" CAST({n} AS BIGINT), '__n_dropped_items', nd)"
        " AS (feature, value)"
    )
    cats = pcat.select(
        F.concat(F.lit("pcat_"), F.col("cat")).alias("feature"),
        F.col("p_k").cast("long").alias("value"),
    )
    return tall.select("feature", F.col("value").cast("long")).union(cats)


def fleiss_kappa_oracle(
    annotations_sql: str, n_raters: int = 4
) -> str:
    """DuckDB twin of :func:`fleiss_kappa` (identical keep-first-n
    window, micro quantization points, and sign-and-magnitude final
    division). ``annotations_sql`` must yield ``(item, cat, seq)``."""
    n = n_raters
    return f"""
        WITH a AS MATERIALIZED (
          SELECT item, CAST(cat AS VARCHAR) AS cat,
                 CAST(seq AS BIGINT) AS seq
          FROM ({annotations_sql})),
        ranked AS MATERIALIZED (
          SELECT item, cat,
                 row_number() OVER (PARTITION BY item ORDER BY seq, cat)
                   AS rn
          FROM a),
        have AS MATERIALIZED (
          SELECT item, MAX(rn) AS have FROM ranked GROUP BY 1),
        kept AS MATERIALIZED (
          SELECT r.item, r.cat FROM ranked r
          JOIN have h ON r.item = h.item AND h.have >= {n}
          WHERE r.rn <= {n}),
        nik AS MATERIALIZED (
          SELECT item, cat, CAST(COUNT(*) AS BIGINT) AS c
          FROM kept GROUP BY 1, 2),
        pi AS MATERIALIZED (
          SELECT item,
                 ((SUM(c * c) - {n}) * {MICRO6}) // {n * (n - 1)} AS p_i
          FROM nik GROUP BY 1),
        moms AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(p_i) AS BIGINT) AS sp
          FROM pi),
        pcat AS MATERIALIZED (
          SELECT cat, (ck * {MICRO6}) // greatest(ni * {n}, 1) AS p_k
          FROM (SELECT cat, CAST(SUM(c) AS BIGINT) AS ck
                FROM nik GROUP BY 1), moms),
        pe AS MATERIALIZED (
          SELECT CAST(SUM((p_k * p_k) // {MICRO6}) AS BIGINT) AS pe
          FROM pcat),
        dropped AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM have
          WHERE have < {n}),
        summary AS MATERIALIZED (
          SELECT (CASE WHEN (sp // greatest(ni, 1)) - pe >= 0
                       THEN 1 ELSE -1 END)
                 * ((abs((sp // greatest(ni, 1)) - pe) * {MICRO6})
                    // greatest({MICRO6} - pe, 1)) AS kappa_micro,
                 sp // greatest(ni, 1) AS p_bar, pe, ni, nd
          FROM moms, pe, dropped)
        SELECT 'kappa_micro' AS feature,
               CAST(kappa_micro AS BIGINT) AS value FROM summary
        UNION ALL SELECT 'p_bar_micro', p_bar FROM summary
        UNION ALL SELECT 'p_e_micro', pe FROM summary
        UNION ALL SELECT '__n_items', ni FROM summary
        UNION ALL SELECT '__n_raters', {n} FROM summary
        UNION ALL SELECT '__n_dropped_items', nd FROM summary
        UNION ALL SELECT 'pcat_' || cat, CAST(p_k AS BIGINT) FROM pcat
    """


def transitivity_audit(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Preference-consistency audit: build the MAJORITY tournament (per
    pair, the direction with more wins; exact ties are undecided and
    excluded) and count CIRCULAR TRIADS — item triples where the
    majority preferences cycle (i beats j beats k beats i), Kendall's
    classic inconsistency evidence. A preference corpus whose circular
    share is high cannot be explained by ANY strength ordering, so this
    is the QA gate to run before fitting :func:`bradley_terry` (which
    assumes one).

    Exact integer counting throughout: decided-pair relation from the
    :func:`match_wincounts` monoid, directed 3-cycles enumerated once
    each by anchoring at the smallest item id (in a tournament each
    cyclic triple carries exactly one directed cycle), triad universe
    counted as triples with all three pairs decided (same cycle-join
    shape on the undirected relation).

    ITEM-BOUNDED CONTRACT: the tournament is pair-dense in the ITEM
    count (models/annotator arms — tens, not data-sized); the cycle
    join is cubic in items and linear in nothing else. For data-sized
    item sets, block first.

    Output (tall, scalar): ``('n_items', v)``, ``('n_pairs_decided',
    v)``, ``('n_ties', v)``, ``('n_triads_decided', v)``,
    ``('n_circular', v)`` — all exact BIGINTs.
    """
    wc = match_wincounts(matches, winner_col, loser_col).localCheckpoint(
        eager=True
    )
    dec = wc.filter(F.col("wi") != F.col("wj")).select(
        F.when(F.col("wi") > F.col("wj"), F.col("i"))
        .otherwise(F.col("j"))
        .alias("src"),
        F.when(F.col("wi") > F.col("wj"), F.col("j"))
        .otherwise(F.col("i"))
        .alias("dst"),
    ).localCheckpoint(eager=True)
    # undirected decided pairs, canonical
    und = dec.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    )
    # triad universe: triples x<y<z with all three pairs decided
    exy = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    exz = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    eyz = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    triads = (
        exy.join(exz, "x")
        .filter(F.col("y") < F.col("z"))
        .join(eyz, ["y", "z"])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # directed 3-cycles, anchored at the smallest id: x->y->z->x or
    # x->z->y->x with x < y and x < z (exactly one per cyclic triple)
    d1 = dec.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    d2 = dec.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    d3 = dec.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    cyc = (
        d1.join(d2, "y")
        .join(d3, ["z", "x"])
        .filter((F.col("x") < F.col("y")) & (F.col("x") < F.col("z")))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    items = wc.select(F.col("i").alias("item")).union(
        wc.select(F.col("j").alias("item"))
    ).distinct().agg(F.count(F.lit(1)).alias("n"))
    pairs = wc.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum((F.col("wi") == F.col("wj")).cast("long")).alias("nt"),
    )
    out = (
        items.crossJoin(F.broadcast(pairs))
        .crossJoin(F.broadcast(triads.withColumnRenamed("n", "n3")))
        .crossJoin(F.broadcast(cyc.withColumnRenamed("n", "nc")))
        .selectExpr(
            "stack(5, 'n_items', n, 'n_pairs_decided', np - nt,"
            " 'n_ties', nt, 'n_triads_decided', n3, 'n_circular', nc)"
            " AS (feature, value)"
        )
    )
    return out.select("feature", F.col("value").cast("long"))


def transitivity_audit_oracle(matches_sql: str) -> str:
    """DuckDB twin of :func:`transitivity_audit` (identical majority
    direction, tie exclusion, and smallest-id cycle anchoring)."""
    return f"""
        WITH m AS MATERIALIZED (
          SELECT CAST(winner AS BIGINT) AS winner,
                 CAST(loser AS BIGINT) AS loser
          FROM ({matches_sql})),
        wc AS MATERIALIZED (
          SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
                 CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wi,
                 CAST(SUM(CASE WHEN winner > loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wj
          FROM m GROUP BY 1, 2),
        dec AS MATERIALIZED (
          SELECT CASE WHEN wi > wj THEN i ELSE j END AS src,
                 CASE WHEN wi > wj THEN j ELSE i END AS dst
          FROM wc WHERE wi <> wj),
        und AS MATERIALIZED (
          SELECT least(src, dst) AS a, greatest(src, dst) AS b FROM dec),
        triads AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n3
          FROM (SELECT a AS x, b AS y FROM und) e1
          JOIN (SELECT a AS x, b AS z FROM und) e2 USING (x)
          JOIN (SELECT a AS y, b AS z FROM und) e3 USING (y, z)
          WHERE e1.y < e2.z),
        cyc AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS nc
          FROM (SELECT src AS x, dst AS y FROM dec) d1
          JOIN (SELECT src AS y, dst AS z FROM dec) d2 USING (y)
          JOIN (SELECT src AS z, dst AS x FROM dec) d3 USING (z, x)
          WHERE d1.x < d1.y AND d1.x < d2.z),
        its AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT i AS item FROM wc UNION SELECT j FROM wc)),
        prs AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS np,
                 CAST(SUM(CASE WHEN wi = wj THEN 1 ELSE 0 END) AS BIGINT)
                   AS nt
          FROM wc)
        SELECT 'n_items' AS feature, n AS value FROM its
        UNION ALL SELECT 'n_pairs_decided', np - nt FROM prs
        UNION ALL SELECT 'n_ties', nt FROM prs
        UNION ALL SELECT 'n_triads_decided', n3 FROM triads
        UNION ALL SELECT 'n_circular', nc FROM cyc
    """


def dpo_pairs(
    scored: DataFrame,
    prompt_col: str = "prompt_id",
    completion_col: str = "completion_id",
    score_col: str = "score",
) -> DataFrame:
    """Chosen/rejected pair assembly for preference-tuning (DPO/RLHF
    reward data): per prompt, pair the HIGHEST-scored completion with
    the LOWEST-scored one — the standard best-vs-worst construction
    over scored candidate pools. Scores must be NON-NEGATIVE integers
    (quantize upstream) — ENFORCED: a negative score raises loudly in
    both engines (a negative's '-' would break the zero-padded key's
    lexicographic == numeric property, so silence is not an option).
    A prompt yields a pair only when it has >= 2 candidates and a
    STRICT margin (chosen score > rejected score — DPO is undefined on
    ties).

    Determinism: arg-extremes ride the zero-padded composite STRING key
    (DESIGN.md round-6: lexicographic == numeric, min_by/max_by stays a
    streaming-able monoid; DuckDB arg_min/arg_max accept no struct
    order). Ties break to the SMALLEST completion id on both sides
    (max side via the complement pad), identically in both engines.

    Output: ``(prompt, chosen, rejected, margin, n_candidates)``.

    Scale: ONE hash aggregation over the scored relation — the pair
    relation is prompt-sized. min_by/max_by merge as monoids, so the
    same aggregation is the live-monitor state shape.
    """
    _id_hi = 999_999_999_999
    sc_raw = F.col(score_col).cast("long")
    s = scored.select(
        F.col(prompt_col).alias("prompt"),
        F.col(completion_col).cast("long").alias("c"),
        F.when(
            sc_raw < 0,
            F.raise_error(
                "dpo_pairs: negative score — scores must be"
                " non-negative integers (quantize upstream)"
            ).cast("long"),
        )
        .otherwise(sc_raw)
        .alias("sc"),
    )
    # max side: higher score first, then SMALLER id (complement pad);
    # min side: lower score first, then smaller id
    g = s.groupBy("prompt").agg(
        F.expr(
            f"max_by(c, concat(lpad(CAST(sc AS STRING), 20, '0'),"
            f" lpad(CAST({_id_hi} - c AS STRING), 12, '0')))"
        ).alias("chosen"),
        F.expr(
            "min_by(c, concat(lpad(CAST(sc AS STRING), 20, '0'),"
            " lpad(CAST(c AS STRING), 12, '0')))"
        ).alias("rejected"),
        F.max("sc").alias("s_hi"),
        F.min("sc").alias("s_lo"),
        F.count(F.lit(1)).alias("n_candidates"),
    )
    return g.filter(
        (F.col("n_candidates") >= 2) & (F.col("s_hi") > F.col("s_lo"))
    ).select(
        "prompt",
        "chosen",
        "rejected",
        (F.col("s_hi") - F.col("s_lo")).alias("margin"),
        "n_candidates",
    )


def dpo_pairs_oracle(scored_sql: str) -> str:
    """DuckDB twin of :func:`dpo_pairs` (identical zero-padded composite
    keys and strict-margin filter). ``scored_sql`` must yield
    ``(prompt, c, sc)``."""
    _id_hi = 999_999_999_999
    return f"""
        WITH s AS MATERIALIZED (
          SELECT prompt, CAST(c AS BIGINT) AS c,
                 CASE WHEN CAST(sc AS BIGINT) < 0
                      THEN error('dpo_pairs: negative score — scores'
                                 ' must be non-negative integers')
                      ELSE CAST(sc AS BIGINT) END AS sc
          FROM ({scored_sql})),
        g AS MATERIALIZED (
          SELECT prompt,
                 arg_max(c, concat(lpad(CAST(sc AS VARCHAR), 20, '0'),
                   lpad(CAST({_id_hi} - c AS VARCHAR), 12, '0'))) AS chosen,
                 arg_min(c, concat(lpad(CAST(sc AS VARCHAR), 20, '0'),
                   lpad(CAST(c AS VARCHAR), 12, '0'))) AS rejected,
                 MAX(sc) AS s_hi, MIN(sc) AS s_lo,
                 CAST(COUNT(*) AS BIGINT) AS n_candidates
          FROM s GROUP BY prompt)
        SELECT prompt, chosen, rejected,
               CAST(s_hi - s_lo AS BIGINT) AS margin, n_candidates
        FROM g WHERE n_candidates >= 2 AND s_hi > s_lo
    """


def bt_fit_audit(
    matches: DataFrame,
    n_iter: int = 8,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Goodness-of-fit audit for :func:`bradley_terry`: per pair, the
    EXPECTED wins of the lower-id item under the fitted strengths
    (``n_ij * w_i / (w_i + w_j)``) against the observed count — the
    residual table that answers "is one strength scale adequate, or do
    intransitive matchups hide inside the fit?" (read together with
    :func:`transitivity_audit`; a pair with a large residual is a
    matchup the model cannot represent).

    Integer discipline: expected wins in micro units via ``(n * w_i *
    1e6) div (w_i + w_j)`` (non-negative — portable div; the product
    ``n_ij * s_i * 1e6 < 2^63`` needs ``n_ij <= ~9.2e6`` at strength
    1e6; rescale match counts past that), residual a plain
    subtraction. One extra join pass over the pair-sized win-count
    relation — the fit itself is shared work (memo shape).

    Output: ``(i, j, n, wins_i, expected_wins_i_micro, residual_micro)``
    — pair-sized, scalar.
    """
    wc = match_wincounts(matches, winner_col, loser_col).localCheckpoint(
        eager=True
    )
    s = bradley_terry_from_wincounts(wc, n_iter=n_iter).select(
        "item", "strength_micro"
    )
    return (
        wc.join(
            F.broadcast(
                s.select(F.col("item").alias("i"), F.col("strength_micro").alias("si"))
            ),
            "i",
        )
        .join(
            F.broadcast(
                s.select(F.col("item").alias("j"), F.col("strength_micro").alias("sj"))
            ),
            "j",
        )
        .select(
            "i",
            "j",
            (F.col("wi") + F.col("wj")).alias("n"),
            F.col("wi").alias("wins_i"),
            F.expr(
                f"((wi + wj) * si * {MICRO6}) div greatest(si + sj, 1)"
            ).alias("expected_wins_i_micro"),
            F.expr(
                f"wi * {MICRO6} - ((wi + wj) * si * {MICRO6})"
                f" div greatest(si + sj, 1)"
            ).alias("residual_micro"),
        )
    )


def bt_fit_audit_oracle(matches_sql: str, n_iter: int = 8) -> str:
    """DuckDB twin of :func:`bt_fit_audit`: the full MM chain from
    :func:`bradley_terry_oracle` with the residual projection as the
    head (identical integer expected-wins arithmetic)."""
    head = f"""SELECT wc.i, wc.j,
               CAST(wc.wi + wc.wj AS BIGINT) AS n,
               wc.wi AS wins_i,
               CAST(((wc.wi + wc.wj) * si.w * {MICRO6})
                    // greatest(si.w + sj.w, 1) AS BIGINT)
                 AS expected_wins_i_micro,
               CAST(wc.wi * {MICRO6} - ((wc.wi + wc.wj) * si.w * {MICRO6})
                    // greatest(si.w + sj.w, 1) AS BIGINT)
                 AS residual_micro
        FROM wc
        JOIN {{w}} si ON wc.i = si.item
        JOIN {{w}} sj ON wc.j = sj.item"""
    # the audit reads the win-count relation the fit itself aggregates:
    # expose it as one more MATERIALIZED CTE by aliasing pairs' source
    head = (
        "SELECT * FROM (" + head + ") _audit"
    )
    base = bradley_terry_oracle(matches_sql, n_iter=n_iter, select_sql=head)
    # bradley_terry_oracle's chain has `pairs` (i, j, n) and `items`
    # (wins) but not the directional (wi, wj) — inject the wc CTE after m
    return base.replace(
        "pairs AS MATERIALIZED (",
        f"""wc AS MATERIALIZED (
          SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
                 CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wi,
                 CAST(SUM(CASE WHEN winner > loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wj
          FROM m GROUP BY 1, 2),
        pairs AS MATERIALIZED (""",
        1,
    )


def kripp_alpha(
    annotations: DataFrame,
    item_col: str = "item",
    cat_col: str = "cat",
) -> DataFrame:
    """Krippendorff's alpha (nominal metric) — the agreement
    coefficient for annotation corpora with a VARYING number of ratings
    per item, exactly the case :func:`fleiss_kappa`'s fixed-quorum
    design drops: every item with >= 2 ratings contributes (singletons
    carry no pairing information and are only counted). Coincidence
    form::

        D_o = sum_i (n_i^2 - sum_c n_ic^2) / (n_i - 1)     observed
        D_e = (n^2 - sum_c n_c^2) / (n - 1)                 expected
        alpha = 1 - D_o / D_e

    Integer discipline: each item's disagreement quantizes to micro
    BEFORE the corpus sum (per-item denominators vary — the
    quantize-before-cumsum rule); D_e is one global expression whose
    ``n^2`` bound (total ratings <= ~3e9) is documented rather than
    hidden; alpha can be negative (systematic disagreement), so the
    final division is sign-and-magnitude. All-one-category corpora
    have D_e = 0 (agreement indistinguishable from chance) — reported
    as alpha 0 via the guard, with the audit rows exposing the
    degeneracy.

    Output (tall, scalar): ``alpha_micro``, ``d_o_micro``,
    ``d_e_micro``, audits ``__n_items``, ``__n_ratings``,
    ``__n_singleton_items``, per-category marginals ``ncat_<cat>``.

    Scale: two hash aggregations (per-(item,cat) counts, then moments)
    — no window at all.
    """
    a = annotations.select(
        F.col(item_col).alias("item"),
        F.col(cat_col).cast("string").alias("cat"),
    )
    nic = a.groupBy("item", "cat").agg(F.count(F.lit(1)).alias("c"))
    return kripp_alpha_from_counts(nic)


def kripp_alpha_from_counts(nic: DataFrame) -> DataFrame:
    """The alpha algebra of :func:`kripp_alpha` over an already-
    aggregated per-(item, cat) count relation ``(item, cat, c)`` — the
    state a live annotation monitor keeps (counts are a pure sum
    monoid: same aggregation in update mode, this algebra at read).
    Identical arithmetic, identical result."""
    nic = nic.select(
        "item", F.col("cat").cast("string"), F.col("c").cast("long")
    ).localCheckpoint(eager=True)  # feeds per_item AND the ncat join
    per_item = nic.groupBy("item").agg(
        F.sum("c").alias("ni"), F.sum(F.expr("c * c")).alias("sq")
    ).localCheckpoint(eager=True)
    do = per_item.filter(F.col("ni") >= 2).agg(
        F.sum(
            F.expr(f"((ni * ni - sq) * {MICRO6}) div (ni - 1)")
        ).alias("do_micro"),
        F.sum("ni").alias("n"),
        F.count(F.lit(1)).alias("n_items"),
    )
    singles = per_item.filter(F.col("ni") < 2).agg(
        F.count(F.lit(1)).alias("n_single")
    )
    # category marginals over INCLUDED items only
    ncat = (
        nic.join(
            per_item.filter(F.col("ni") >= 2).select("item"), "item"
        )
        .groupBy("cat")
        .agg(F.sum("c").alias("nc"))
        .localCheckpoint(eager=True)
    )
    moments = ncat.agg(F.sum(F.expr("nc * nc")).alias("sq_c"))
    summary = (
        do.crossJoin(F.broadcast(moments))
        .crossJoin(F.broadcast(singles))
        .select(
            F.coalesce("do_micro", F.lit(0)).alias("do_micro"),
            F.expr(
                f"CASE WHEN n >= 2 THEN ((n * n - coalesce(sq_c, 0))"
                f" * {MICRO6}) div (n - 1) ELSE 0 END"
            ).alias("de_micro"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            F.coalesce("n_single", F.lit(0)).alias("n_single"),
        )
        .select(
            F.expr(
                f"CASE WHEN de_micro - do_micro >= 0 THEN 1 ELSE -1 END"
                f" * ((abs(de_micro - do_micro) * {MICRO6})"
                f" div greatest(de_micro, 1))"
            ).alias("alpha_micro"),
            "do_micro",
            "de_micro",
            "n",
            "n_items",
            "n_single",
        )
    )
    tall = summary.selectExpr(
        "stack(6, 'alpha_micro', alpha_micro, 'd_o_micro', do_micro,"
        " 'd_e_micro', de_micro, '__n_items', n_items,"
        " '__n_ratings', n, '__n_singleton_items', n_single)"
        " AS (feature, value)"
    )
    cats = ncat.select(
        F.concat(F.lit("ncat_"), F.col("cat")).alias("feature"),
        F.col("nc").cast("long").alias("value"),
    )
    return tall.select("feature", F.col("value").cast("long")).union(cats)


def kripp_alpha_oracle(annotations_sql: str) -> str:
    """DuckDB twin of :func:`kripp_alpha` (identical per-item micro
    quantization, inclusion rule, and sign-safe final division).
    ``annotations_sql`` must yield ``(item, cat)``."""
    return f"""
        WITH a AS MATERIALIZED (
          SELECT item, CAST(cat AS VARCHAR) AS cat
          FROM ({annotations_sql})),
        nic AS MATERIALIZED (
          SELECT item, cat, CAST(COUNT(*) AS BIGINT) AS c
          FROM a GROUP BY 1, 2),
        per_item AS MATERIALIZED (
          SELECT item, CAST(SUM(c) AS BIGINT) AS ni,
                 CAST(SUM(c * c) AS BIGINT) AS sq
          FROM nic GROUP BY 1),
        dobs AS MATERIALIZED (
          SELECT CAST(COALESCE(SUM(((ni * ni - sq) * {MICRO6})
                   // (ni - 1)), 0) AS BIGINT) AS do_micro,
                 CAST(COALESCE(SUM(ni), 0) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS n_items
          FROM per_item WHERE ni >= 2),
        singles AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_single
          FROM per_item WHERE ni < 2),
        ncat AS MATERIALIZED (
          SELECT nic.cat, CAST(SUM(nic.c) AS BIGINT) AS nc
          FROM nic JOIN per_item p ON nic.item = p.item AND p.ni >= 2
          GROUP BY 1),
        moments AS MATERIALIZED (
          SELECT CAST(COALESCE(SUM(nc * nc), 0) AS BIGINT) AS sq_c
          FROM ncat),
        summary AS MATERIALIZED (
          SELECT do_micro,
                 CASE WHEN n >= 2 THEN ((n * n - sq_c) * {MICRO6})
                      // (n - 1) ELSE 0 END AS de_micro,
                 n, n_items, n_single
          FROM dobs, moments, singles),
        final AS MATERIALIZED (
          SELECT (CASE WHEN de_micro - do_micro >= 0 THEN 1 ELSE -1 END)
                 * ((abs(de_micro - do_micro) * {MICRO6})
                    // greatest(de_micro, 1)) AS alpha_micro,
                 do_micro, de_micro, n, n_items, n_single
          FROM summary)
        SELECT 'alpha_micro' AS feature,
               CAST(alpha_micro AS BIGINT) AS value FROM final
        UNION ALL SELECT 'd_o_micro', do_micro FROM final
        UNION ALL SELECT 'd_e_micro', de_micro FROM final
        UNION ALL SELECT '__n_items', n_items FROM final
        UNION ALL SELECT '__n_ratings', n FROM final
        UNION ALL SELECT '__n_singleton_items', n_single FROM final
        UNION ALL SELECT 'ncat_' || cat, nc FROM ncat
    """


def kripp_alpha_interval(
    annotations: DataFrame,
    item_col: str = "item",
    val_col: str = "val",
) -> DataFrame:
    """Krippendorff's alpha with the INTERVAL metric — agreement over
    integer RATING SCALES (1-5 stars, 0-10 quality scores), where
    disagreeing by one step should cost less than disagreeing by four:
    ``delta(c, k) = (v_c - v_k)^2``. The per-item coincidence sums
    collapse to moment arithmetic (no category pivot at all)::

        sum_{c,k} n_c n_k (v_c - v_k)^2  =  2 (n_i * S2_i - S1_i^2)

    with S1/S2 the per-item value sum / sum of squares, so::

        D_o = sum_i 2 (n_i S2_i - S1_i^2) / (n_i - 1)
        D_e = 2 (n S2 - S1^2) / (n - 1)        over included ratings
        alpha = 1 - D_o / D_e

    Integer discipline: per-item D_o quantizes to micro BEFORE the
    corpus sum; D_e scales in TWO x1000 stages around the (n-1) and n
    divisions (one x1e6 stage would overflow 100x sooner, one integer
    floor would cost ~1e-3 relative precision on small corpora — the
    split keeps both bounds); both normalize to PER-RATING units before
    the final sign-safe division, so the alpha arithmetic is
    corpus-size-independent. ``n_i S2_i - S1_i^2`` is EXACTLY
    shift-invariant (v -> v + c), so the coefficient depends only on
    rating differences — pinned by test. Overflow bounds: per item
    ``(n_i * max|v|)^2 * 2e6 < 2^63`` (n_i * max|v| <= ~6.7e4); corpus
    ``2 n S2 * 1e3 < 2^63`` (~2e7 ratings at a 1-10 scale; values scale
    down past that — alpha is scale-invariant up to quantization).

    Output (tall, scalar): ``alpha_micro``, ``d_o_bar_micro``,
    ``d_e_bar_micro`` (per-rating disagreements), audits ``__n_items``,
    ``__n_ratings``, ``__n_singleton_items``.
    """
    a = annotations.select(
        F.col(item_col).alias("item"),
        F.col(val_col).cast("long").alias("v"),
    )
    per_item = a.groupBy("item").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("v").alias("s1"),
        F.sum(F.expr("v * v")).alias("s2"),
    ).localCheckpoint(eager=True)
    inc = per_item.filter(F.col("ni") >= 2).agg(
        F.sum(
            F.expr(f"((2 * (ni * s2 - s1 * s1)) * {MICRO6}) div (ni - 1)")
        ).alias("do_sum_micro"),
        F.sum("ni").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.count(F.lit(1)).alias("n_items"),
    )
    singles = per_item.filter(F.col("ni") < 2).agg(
        F.count(F.lit(1)).alias("n_single")
    )
    summary = (
        inc.crossJoin(F.broadcast(singles))
        .select(
            F.expr(
                "CASE WHEN n >= 2 THEN"
                " ((coalesce(do_sum_micro, 0)) div n) ELSE 0 END"
            ).alias("do_bar"),
            F.expr(
                "CASE WHEN n >= 2 THEN"
                " ((((2 * (n * s2 - s1 * s1)) * 1000) div (n - 1))"
                " * 1000) div n ELSE 0 END"
            ).alias("de_bar"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("n_items", F.lit(0)).alias("n_items"),
            F.coalesce("n_single", F.lit(0)).alias("n_single"),
        )
        .select(
            F.expr(
                f"CASE WHEN de_bar - do_bar >= 0 THEN 1 ELSE -1 END"
                f" * ((abs(de_bar - do_bar) * {MICRO6})"
                f" div greatest(de_bar, 1))"
            ).alias("alpha_micro"),
            "do_bar",
            "de_bar",
            "n",
            "n_items",
            "n_single",
        )
    )
    return summary.selectExpr(
        "stack(6, 'alpha_micro', alpha_micro, 'd_o_bar_micro', do_bar,"
        " 'd_e_bar_micro', de_bar, '__n_items', n_items,"
        " '__n_ratings', n, '__n_singleton_items', n_single)"
        " AS (feature, value)"
    ).select("feature", F.col("value").cast("long"))


def kripp_alpha_interval_oracle(annotations_sql: str) -> str:
    """DuckDB twin of :func:`kripp_alpha_interval` (identical moment
    arithmetic and quantization points). ``annotations_sql`` must yield
    ``(item, val)``."""
    return f"""
        WITH a AS MATERIALIZED (
          SELECT item, CAST(val AS BIGINT) AS v
          FROM ({annotations_sql})),
        per_item AS MATERIALIZED (
          SELECT item, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(v) AS BIGINT) AS s1,
                 CAST(SUM(v * v) AS BIGINT) AS s2
          FROM a GROUP BY 1),
        inc AS MATERIALIZED (
          SELECT CAST(COALESCE(SUM(((2 * (ni * s2 - s1 * s1)) * {MICRO6})
                   // (ni - 1)), 0) AS BIGINT) AS do_sum_micro,
                 CAST(COALESCE(SUM(ni), 0) AS BIGINT) AS n,
                 CAST(COALESCE(SUM(s1), 0) AS BIGINT) AS s1,
                 CAST(COALESCE(SUM(s2), 0) AS BIGINT) AS s2,
                 CAST(COUNT(*) AS BIGINT) AS n_items
          FROM per_item WHERE ni >= 2),
        singles AS MATERIALIZED (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_single
          FROM per_item WHERE ni < 2),
        summary AS MATERIALIZED (
          SELECT CASE WHEN n >= 2 THEN do_sum_micro // n ELSE 0 END
                   AS do_bar,
                 CASE WHEN n >= 2 THEN
                   ((((2 * (n * s2 - s1 * s1)) * 1000) // (n - 1))
                    * 1000) // n
                 ELSE 0 END AS de_bar,
                 n, n_items, n_single
          FROM inc, singles),
        final AS MATERIALIZED (
          SELECT (CASE WHEN de_bar - do_bar >= 0 THEN 1 ELSE -1 END)
                 * ((abs(de_bar - do_bar) * {MICRO6})
                    // greatest(de_bar, 1)) AS alpha_micro,
                 do_bar, de_bar, n, n_items, n_single
          FROM summary)
        SELECT 'alpha_micro' AS feature,
               CAST(alpha_micro AS BIGINT) AS value FROM final
        UNION ALL SELECT 'd_o_bar_micro', do_bar FROM final
        UNION ALL SELECT 'd_e_bar_micro', de_bar FROM final
        UNION ALL SELECT '__n_items', n_items FROM final
        UNION ALL SELECT '__n_ratings', n FROM final
        UNION ALL SELECT '__n_singleton_items', n_single FROM final
    """


def win_ci(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Confidence-adjusted win-rate leaderboard: per item, the Wilson
    score interval (z = 2, i.e. ~95.4%) around the raw win rate — the
    standard fix for "3 wins out of 3 ranks above 95 out of 100": rank
    by the LOWER bound, not the point estimate. With W wins of n
    matches and z^2 = 4 exactly::

        LB, UB = ( (W + 2) -/+ 2 sqrt( W(n-W)/n + 1 ) ) / (n + 4)

    Portability: sqrt is the one IEEE-exact portable non-integer power
    (DESIGN.md) — the radicand quantizes to an INTEGER in milli^2 units
    first via the exact split form ``(a div n)*1e6 + ((a % n)*1e6) div
    n + 1e6`` with ``a = W(n-W)`` (identical to ``(a*1e6) div n + 1e6``
    for every non-negative input, but the largest intermediate is
    ``a < 2^63`` rather than ``a*1e6`` — exact for up to ~6.0e9 matches
    per item, where ``W(n-W) <= n^2/4`` itself reaches int64; the
    radicand ``<= (n/4)*1e6 + 1e6`` stays far below 2^53 there, so the
    double conversion is lossless), the root floors to integer millis, and
    the bounds are single non-negative integer divisions (the exact
    Wilson bound is >= 0 and the floor only widens downward). z is
    FIXED at 2 so z^2, z^2/2, z^2/4 are the integers 4, 2, 1 — no
    transcendental constants anywhere.

    Output per item: ``(item, wins, n_matches, win_rate_micro,
    wilson_lb_micro, wilson_ub_micro)``. One aggregation over the
    win-count monoid; item-sized output.
    """
    wc = match_wincounts(matches, winner_col, loser_col)
    items = (
        wc.select(F.col("i").alias("item"), F.col("wi").alias("w"),
                  (F.col("wi") + F.col("wj")).alias("n"))
        .union(
            wc.select(F.col("j").alias("item"), F.col("wj").alias("w"),
                      (F.col("wi") + F.col("wj")).alias("n"))
        )
        .groupBy("item")
        .agg(F.sum("w").alias("wins"), F.sum("n").alias("n_matches"))
    )
    return items.selectExpr(
        "item",
        "wins",
        "n_matches",
        "(wins * 1000000) div n_matches AS win_rate_micro",
        "(((wins + 2) * 1000 - 2 * CAST(floor(sqrt(CAST("
        "((wins * (n_matches - wins)) div n_matches) * 1000000"
        " + (((wins * (n_matches - wins)) % n_matches) * 1000000)"
        " div n_matches + 1000000"
        " AS DOUBLE))) AS BIGINT)) * 1000000)"
        " div ((n_matches + 4) * 1000) AS wilson_lb_micro",
        "(((wins + 2) * 1000 + 2 * CAST(floor(sqrt(CAST("
        "((wins * (n_matches - wins)) div n_matches) * 1000000"
        " + (((wins * (n_matches - wins)) % n_matches) * 1000000)"
        " div n_matches + 1000000"
        " AS DOUBLE))) AS BIGINT)) * 1000000)"
        " div ((n_matches + 4) * 1000) AS wilson_ub_micro",
    )


def win_ci_oracle(matches_sql: str) -> str:
    """DuckDB twin of :func:`win_ci` (identical integer radicand,
    floored IEEE sqrt, and bound divisions)."""
    s = (
        "CAST(floor(sqrt(CAST(((w * (n - w)) // n) * 1000000"
        " + (((w * (n - w)) % n) * 1000000) // n + 1000000"
        " AS DOUBLE))) AS BIGINT)"
    )
    return f"""
        WITH m AS MATERIALIZED (
          SELECT CAST(winner AS BIGINT) AS winner,
                 CAST(loser AS BIGINT) AS loser
          FROM ({matches_sql})),
        wc AS MATERIALIZED (
          SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
                 CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wi,
                 CAST(SUM(CASE WHEN winner > loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wj
          FROM m GROUP BY 1, 2),
        items AS MATERIALIZED (
          SELECT item, CAST(SUM(w) AS BIGINT) AS w,
                 CAST(SUM(n) AS BIGINT) AS n
          FROM (
            SELECT i AS item, wi AS w, wi + wj AS n FROM wc
            UNION ALL SELECT j, wj, wi + wj FROM wc
          ) GROUP BY 1)
        SELECT item, w AS wins, n AS n_matches,
               (w * 1000000) // n AS win_rate_micro,
               (((w + 2) * 1000 - 2 * {s}) * 1000000)
                 // ((n + 4) * 1000) AS wilson_lb_micro,
               (((w + 2) * 1000 + 2 * {s}) * 1000000)
                 // ((n + 4) * 1000) AS wilson_ub_micro
        FROM items
    """


def rater_quality(
    annotations: DataFrame,
    item_col: str = "item",
    rater_col: str = "rater",
    cat_col: str = "cat",
) -> DataFrame:
    """Per-rater annotation-quality scorecard — the audit that turns the
    corpus-level agreement coefficients (:func:`kripp_alpha`,
    :func:`fleiss_kappa`) into an actionable per-annotator table: for
    each rating, does it agree with the LEAVE-ONE-OUT consensus (the
    strict majority among the item's OTHER ratings)? Raters who
    systematically diverge from consensus are relabel/retrain
    candidates; the coefficient alone cannot point at them.

    Mechanics (all integer, one window): dedupe to one rating per
    ``(item, rater)`` (deterministic ``min(cat)`` — the dropDuplicates
    rule, DESIGN.md round-2); per-(item, cat) counts; per item the top-2
    (count DESC, cat ASC) category rows via an item-partitioned window
    (vocabulary-bounded — the benign-window class); a rating with
    category ``c`` agrees iff ``cnt(c) - 1 > max_{c' != c} cnt(c')`` —
    its own vote removed, STRICT majority (ties are non-consensus,
    identically in both engines). Ratings on SINGLETON items (one rater)
    have no LOO consensus: excluded from both numerator and denominator,
    audited per rater.

    Output per rater: ``(rater, n_ratings, n_scored, n_agree,
    agree_micro, n_cats_used)`` — rater-sized, scalar.

    Scale: two hash aggregations + one vocabulary-bounded window; the
    scoring join broadcasts the item-consensus relation only if small —
    it is item-sized, so at corpus scale it shuffles on item, the same
    key the counts already partitioned by.
    """
    a = (
        annotations.select(
            F.col(item_col).alias("item"),
            F.col(rater_col).cast("long").alias("rater"),
            F.col(cat_col).cast("string").alias("cat"),
        )
        .groupBy("item", "rater")
        .agg(F.min("cat").alias("cat"))
    )
    return rater_quality_from_dedup(a)


def rater_quality_from_dedup(a: DataFrame) -> DataFrame:
    """The scoring algebra of :func:`rater_quality` over an already-
    deduped ``(item, rater, cat)`` relation — the ``<op>_from_counts``
    factor shape (DESIGN.md round-10): the dedupe is a ``min(cat)``
    MONOID, so a live monitor keeps it in one update-mode aggregation
    and reads this identical algebra."""
    from pyspark.sql import Window

    counts = (
        a.groupBy("item", "cat")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # (item x cat)-sized, three consumers (top2 / ni / the scoring
        # join) — cut lineage (DESIGN.md multi-consumer rule)
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("item").orderBy(F.desc("c"), F.asc("cat"))
    top2 = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("item")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cat"))).alias("c1_cat"),
            F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("c1_cnt"),
            F.coalesce(
                F.max(F.when(F.col("rn") == 2, F.col("c"))), F.lit(0)
            ).alias("c2_cnt"),
        )
    )
    ni = counts.groupBy("item").agg(F.sum("c").cast("long").alias("ni"))
    scored = (
        a.join(top2.select("item", "c1_cat", "c1_cnt", "c2_cnt"), "item")
        .join(ni, "item")
        .join(counts, ["item", "cat"])
        .select(
            "rater",
            (F.col("ni") >= 2).cast("long").alias("scored"),
            F.when(
                (F.col("ni") >= 2)
                & (
                    F.col("c") - 1
                    > F.when(
                        F.col("cat") == F.col("c1_cat"), F.col("c2_cnt")
                    ).otherwise(F.col("c1_cnt"))
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("agree"),
            "cat",
        )
    )
    return scored.groupBy("rater").agg(
        F.count(F.lit(1)).cast("long").alias("n_ratings"),
        F.sum("scored").cast("long").alias("n_scored"),
        F.sum("agree").cast("long").alias("n_agree"),
        F.expr(
            "CASE WHEN sum(scored) > 0 THEN"
            " (sum(agree) * 1000000) div sum(scored) ELSE 0 END"
        ).cast("long").alias("agree_micro"),
        F.countDistinct("cat").cast("long").alias("n_cats_used"),
    )


def rater_quality_oracle(annotations_sql: str) -> str:
    """DuckDB twin of :func:`rater_quality` (identical dedupe, top-2
    window, strict LOO majority, singleton exclusion).
    ``annotations_sql`` must yield ``(item, rater, cat)``."""
    return f"""
        WITH a AS MATERIALIZED (
          SELECT item, CAST(rater AS BIGINT) AS rater,
                 MIN(CAST(cat AS VARCHAR)) AS cat
          FROM ({annotations_sql}) GROUP BY 1, 2),
        counts AS MATERIALIZED (
          SELECT item, cat, CAST(COUNT(*) AS BIGINT) AS c
          FROM a GROUP BY 1, 2),
        ranked AS MATERIALIZED (
          SELECT item, cat, c,
                 row_number() OVER (PARTITION BY item
                                    ORDER BY c DESC, cat ASC) AS rn
          FROM counts),
        top2 AS MATERIALIZED (
          SELECT item,
                 MAX(CASE WHEN rn = 1 THEN cat END) AS c1_cat,
                 MAX(CASE WHEN rn = 1 THEN c END) AS c1_cnt,
                 COALESCE(MAX(CASE WHEN rn = 2 THEN c END), 0) AS c2_cnt
          FROM ranked WHERE rn <= 2 GROUP BY 1),
        ni AS MATERIALIZED (
          SELECT item, CAST(SUM(c) AS BIGINT) AS ni
          FROM counts GROUP BY 1),
        scored AS MATERIALIZED (
          SELECT a.rater,
                 CAST(ni.ni >= 2 AS BIGINT) AS scored,
                 CASE WHEN ni.ni >= 2 AND counts.c - 1 >
                   (CASE WHEN a.cat = top2.c1_cat THEN top2.c2_cnt
                         ELSE top2.c1_cnt END)
                   THEN 1 ELSE 0 END AS agree,
                 a.cat
          FROM a
          JOIN top2 ON a.item = top2.item
          JOIN ni ON a.item = ni.item
          JOIN counts ON a.item = counts.item AND a.cat = counts.cat)
        SELECT rater,
               CAST(COUNT(*) AS BIGINT) AS n_ratings,
               CAST(SUM(scored) AS BIGINT) AS n_scored,
               CAST(SUM(agree) AS BIGINT) AS n_agree,
               CAST(CASE WHEN SUM(scored) > 0 THEN
                 (SUM(agree) * 1000000) // SUM(scored) ELSE 0 END
                 AS BIGINT) AS agree_micro,
               CAST(COUNT(DISTINCT cat) AS BIGINT) AS n_cats_used
        FROM scored GROUP BY 1
    """


def copeland_scores(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> DataFrame:
    """Copeland pairwise-majority leaderboard — the voting-theory
    complement to :func:`bradley_terry`: an item scores 1 point per
    opponent it beats on pairwise majority, 1/2 per tie (kept in x2
    integer units — no halves). Where BT fits a latent strength scale,
    Copeland asks only "who wins the head-to-head?" — immune to match-
    count imbalance between pairs, and the standard tournament ranking
    when intransitivity makes a single scale suspect (read with
    :func:`transitivity_audit`).

    Output per item: ``(item, copeland_x2, n_opponents, n_beaten,
    n_tied)`` — item-sized, read-time algebra over the SAME win-count
    monoid the live BT leaderboard keeps
    (:func:`copeland_from_wincounts` is the shared core; the streaming
    twin reads it over its merged state, hash-identical by
    construction).
    """
    return copeland_from_wincounts(
        match_wincounts(matches, winner_col, loser_col)
    )


def copeland_from_wincounts(wc: DataFrame) -> DataFrame:
    """The Copeland point algebra over an already-aggregated win-count
    relation ``(i, j, wi, wj)`` (:func:`match_wincounts` output or a
    live monitor's merged state) — the ``<op>_from_counts`` factor
    shape (DESIGN.md round-10)."""
    both = wc.select(
        F.col("i").alias("item"),
        F.expr(
            "CASE WHEN wi > wj THEN 2 WHEN wi = wj THEN 1 ELSE 0 END"
        ).alias("pts"),
    ).union(
        wc.select(
            F.col("j").alias("item"),
            F.expr(
                "CASE WHEN wj > wi THEN 2 WHEN wi = wj THEN 1 ELSE 0 END"
            ).alias("pts"),
        )
    )
    return both.groupBy("item").agg(
        F.sum("pts").cast("long").alias("copeland_x2"),
        F.count(F.lit(1)).cast("long").alias("n_opponents"),
        F.sum(F.expr("CAST(pts = 2 AS BIGINT)")).cast("long").alias("n_beaten"),
        F.sum(F.expr("CAST(pts = 1 AS BIGINT)")).cast("long").alias("n_tied"),
    )


def copeland_scores_oracle(matches_sql: str) -> str:
    """DuckDB twin of :func:`copeland_scores` (identical win-count
    monoid and x2 point algebra)."""
    return f"""
        WITH m AS MATERIALIZED (
          SELECT CAST(winner AS BIGINT) AS winner,
                 CAST(loser AS BIGINT) AS loser
          FROM ({matches_sql})),
        wc AS MATERIALIZED (
          SELECT least(winner, loser) AS i, greatest(winner, loser) AS j,
                 CAST(SUM(CASE WHEN winner < loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wi,
                 CAST(SUM(CASE WHEN winner > loser THEN 1 ELSE 0 END)
                   AS BIGINT) AS wj
          FROM m GROUP BY 1, 2),
        pts AS MATERIALIZED (
          SELECT i AS item,
                 CASE WHEN wi > wj THEN 2 WHEN wi = wj THEN 1 ELSE 0 END
                   AS pts
          FROM wc
          UNION ALL
          SELECT j,
                 CASE WHEN wj > wi THEN 2 WHEN wi = wj THEN 1 ELSE 0 END
          FROM wc)
        SELECT item,
               CAST(SUM(pts) AS BIGINT) AS copeland_x2,
               CAST(COUNT(*) AS BIGINT) AS n_opponents,
               CAST(SUM(CASE WHEN pts = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_beaten,
               CAST(SUM(CASE WHEN pts = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_tied
        FROM pts GROUP BY 1
    """
