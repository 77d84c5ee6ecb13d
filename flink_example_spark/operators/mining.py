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
of exact integer products at the output boundary (CLAUDE.md: never SUM
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
    freq = dt.join(F.broadcast(items.select("__t")), "__t")
    pairs = (
        freq.select("__id", F.col("__t").alias("__ta"))
        .join(freq.select("__id", F.col("__t").alias("__tb")), "__id")
        .filter(F.col("__ta") < F.col("__tb"))
        .groupBy("__ta", "__tb")
        .agg(F.count(F.lit(1)).alias("__cab"))
        .filter(F.col("__cab") >= min_pair_count)
    )
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
