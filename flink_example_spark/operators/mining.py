"""Frequent-pattern mining: a-priori association rules over document
token baskets — the market-basket primitive (support / confidence / lift)
a corpus-analysis pipeline runs to surface co-occurring vocabulary,
template detection, and boilerplate signatures.

Reference parity: the reference engine (kerinin/flink-example,
App.java:96-150) provides grouped counts and joins; association rules are
the same machinery composed — three count aggregations and one self-join,
nothing imperative.

Engine portability: all counts are exact BIGINTs; the confidence gate is
CROSS-MULTIPLIED (``100 * c_ab >= pct * c_a``) so no division happens in
a filter; confidence and lift are single exactly-rounded double divisions
of exact integer products at the output boundary (DESIGN.md: never SUM
raw doubles, one fixed double op sequence is portable).

Scale shape: the a-priori pruning step (frequent items first) bounds the
per-basket self-join to frequent tokens only — the candidate pair count
is sum_d |freq(d)|^2, controlled by ``min_df``. One shuffle for the
distinct (doc, token) relation, one for the pair count; item counts are
broadcast. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assoc_rules(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 300,
    min_pair_count: int = 250,
    min_conf_pct: int = 85,
) -> DataFrame:
    """A-priori association rules over per-document distinct-token baskets.

    A rule ``antecedent -> consequent`` is emitted when both tokens are
    frequent (document frequency >= ``min_df``), the pair co-occurs in
    >= ``min_pair_count`` documents, and confidence
    ``c_ab / c_a >= min_conf_pct / 100`` (evaluated cross-multiplied in
    integers). Output: ``(antecedent, consequent, pair_count, conf,
    lift)`` — conf and lift as doubles from exact integer operands.
    """
    from flink_example_spark.operators.text import normalized, tokens

    dt = (
        documents.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(normalized(F.col(text_col)))).alias("__t"),
        )
        .filter(F.col("__t") != "")
        .distinct()
    )
    items = (
        dt.groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= min_df)
    )
    n_docs = documents.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    # both sides of the pair self-join read this — checkpoint once
    freq = dt.join(F.broadcast(items.select("__t")), "__t").localCheckpoint()
    pairs = (
        freq.select("__id", F.col("__t").alias("__ta"))
        .join(freq.select("__id", F.col("__t").alias("__tb")), "__id")
        .filter(F.col("__ta") < F.col("__tb"))
        .groupBy("__ta", "__tb")
        .agg(F.count(F.lit(1)).alias("__cab"))
    )
    return rules_from_counts(pairs, items, n_docs, min_pair_count, min_conf_pct)


def rules_from_counts(
    pairs: DataFrame,
    items: DataFrame,
    n_docs: DataFrame,
    min_pair_count: int,
    min_conf_pct: int,
) -> DataFrame:
    """Rule selection over already-maintained co-occurrence counts: the
    stateless tail of :func:`assoc_rules`, shared with the streaming twin
    (which maintains ``pairs`` as a live aggregate and applies this
    selection at read time). ``pairs`` = (__ta, __tb, __cab) with
    __ta < __tb; ``items`` = (__t, __c); ``n_docs`` = single-row (__n)."""
    pairs = pairs.filter(F.col("__cab") >= min_pair_count)
    both = pairs.select("__ta", "__tb", "__cab").union(
        pairs.select(
            F.col("__tb").alias("__ta"), F.col("__ta").alias("__tb"), "__cab"
        )
    )
    return (
        both.join(
            F.broadcast(items.select(F.col("__t").alias("__ta"), F.col("__c").alias("__ca"))),
            "__ta",
        )
        .join(
            F.broadcast(items.select(F.col("__t").alias("__tb"), F.col("__c").alias("__cb"))),
            "__tb",
        )
        .crossJoin(F.broadcast(n_docs))
        .filter(F.lit(100) * F.col("__cab") >= F.lit(min_conf_pct) * F.col("__ca"))
        .select(
            F.col("__ta").alias("antecedent"),
            F.col("__tb").alias("consequent"),
            F.col("__cab").alias("pair_count"),
            (F.col("__cab").cast("double") / F.col("__ca").cast("double")).alias(
                "conf"
            ),
            (
                (F.col("__n") * F.col("__cab")).cast("double")
                / (F.col("__ca") * F.col("__cb")).cast("double")
            ).alias("lift"),
        )
    )


def assoc_rules_oracle(
    min_df: int = 300, min_pair_count: int = 250, min_conf_pct: int = 85
) -> str:
    """DuckDB twin of :func:`assoc_rules` (documents table)."""
    from flink_example_spark.operators.text import _DUCK_NORM

    return f"""
        WITH dt AS MATERIALIZED (
          SELECT DISTINCT doc_id, t FROM (
            SELECT doc_id, unnest(string_split_regex({_DUCK_NORM}, '\\s+')) AS t
            FROM documents
          ) WHERE t <> ''
        ), items AS MATERIALIZED (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          FROM dt GROUP BY t HAVING COUNT(*) >= {min_df}
        ), n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
        freq AS MATERIALIZED (
          SELECT dt.doc_id, dt.t FROM dt JOIN items USING (t)
        ), pairs AS MATERIALIZED (
          SELECT a.t AS ta, b.t AS tb, CAST(COUNT(*) AS BIGINT) AS cab
          FROM freq a JOIN freq b ON a.doc_id = b.doc_id AND a.t < b.t
          GROUP BY a.t, b.t HAVING COUNT(*) >= {min_pair_count}
        ), both_dir AS (
          SELECT ta, tb, cab FROM pairs
          UNION ALL
          SELECT tb AS ta, ta AS tb, cab FROM pairs
        )
        SELECT bd.ta AS antecedent, bd.tb AS consequent, bd.cab AS pair_count,
               CAST(bd.cab AS DOUBLE) / CAST(ia.c AS DOUBLE) AS conf,
               CAST(n.n * bd.cab AS DOUBLE) / CAST(ia.c * ib.c AS DOUBLE) AS lift
        FROM both_dir bd
        JOIN items ia ON ia.t = bd.ta
        JOIN items ib ON ib.t = bd.tb
        CROSS JOIN n
        WHERE 100 * bd.cab >= {min_conf_pct} * ia.c
    """


def seq_patterns(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Order-aware sequential patterns (PrefixSpan-style support counts):
    how many keys exhibit ``a -> b`` (some a-event strictly before some
    b-event) and ``a -> b -> c``. The unordered twin is
    :func:`assoc_rules`; ordering is what turns co-occurrence into a
    funnel/journey signal.

    The existence tests collapse to per-(key, type) FIRST/LAST timestamps:
    ``a -> b`` holds iff ``min_ts(a) < max_ts(b)``, and ``a -> b -> c``
    holds iff some b-event lies strictly inside ``(min_ts(a),
    max_ts(c))`` — so support needs ONE per-(key, type) aggregate, a
    type-pair self-join of that (key x K^2 rows, K = observed types), and
    for triples one join of the raw b-events against the pair relation.
    No per-key sequence materialization, no Python.

    Output: ``(kind, a, b, c, support)`` — kind 'pair' (c null) or
    'triple'; support = distinct keys, exact BIGINT.
    """
    ev = events.select(
        F.col(key_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    )
    spans = ev.groupBy("u", "et").agg(
        F.min("us").alias("mn"), F.max("us").alias("mx")
    ).localCheckpoint()  # consumed by a-, b-, and c-side projections
    a = spans.select("u", F.col("et").alias("a"), "mn")
    b = spans.select("u", F.col("et").alias("b"), "mx")
    pair_keys = a.join(b, "u").filter(F.col("mn") < F.col("mx"))
    pairs = (
        pair_keys.groupBy("a", "b")
        .agg(F.countDistinct("u").alias("support"))
        .filter(F.col("support") >= min_support)
        .select(
            F.lit("pair").alias("kind"), "a", "b",
            F.lit(None).cast("string").alias("c"), "support",
        )
    )
    c = spans.select("u", F.col("et").alias("c"), "mx")
    mids = (
        ev.select("u", F.col("et").alias("b"), "us")
        .join(a, "u")
        .join(c, "u")
        .filter((F.col("mn") < F.col("us")) & (F.col("us") < F.col("mx")))
    )
    triples = (
        mids.groupBy("a", "b", "c")
        .agg(F.countDistinct("u").alias("support"))
        .filter(F.col("support") >= min_support)
        .select(F.lit("triple").alias("kind"), "a", "b", "c", "support")
    )
    return pairs.unionByName(triples)


def seq_patterns_oracle(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    min_support: int = 1,
) -> str:
    """DuckDB twin of :func:`seq_patterns`."""
    return f"""
        WITH ev AS MATERIALIZED (
          SELECT {key_col} AS u, {type_col} AS et, epoch_us({ts_col}) AS us
          FROM {table}
        ), spans AS MATERIALIZED (
          SELECT u, et, MIN(us) AS mn, MAX(us) AS mx FROM ev GROUP BY u, et
        ), pairs AS (
          SELECT 'pair' AS kind, a.et AS a, b.et AS b, CAST(NULL AS VARCHAR) AS c,
                 CAST(COUNT(DISTINCT a.u) AS BIGINT) AS support
          FROM spans a JOIN spans b ON a.u = b.u AND a.mn < b.mx
          GROUP BY a.et, b.et HAVING COUNT(DISTINCT a.u) >= {min_support}
        ), triples AS (
          SELECT 'triple' AS kind, a.et AS a, m.et AS b, c.et AS c,
                 CAST(COUNT(DISTINCT m.u) AS BIGINT) AS support
          FROM ev m
          JOIN spans a ON a.u = m.u AND a.mn < m.us
          JOIN spans c ON c.u = m.u AND m.us < c.mx
          GROUP BY a.et, m.et, c.et HAVING COUNT(DISTINCT m.u) >= {min_support}
        )
        SELECT * FROM pairs UNION ALL SELECT * FROM triples
    """
