"""Scalar functions the reference exercises (F1-F4, SURVEY.md §2.2).

Both are thin wrappers over JVM-side Catalyst built-ins — no Python UDFs in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nullif_(col: Column | str, value) -> Column:
    """``NULLIF(col, value)`` (F1, App.java:70): NULL when equal, else col."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(c, F.lit(value))


def timestampadd_(unit: str, amount: int, ts: Column | str) -> Column:
    """``TIMESTAMPADD(unit, amount, ts)`` (F2, App.java:65)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_add(unit, F.lit(amount), c)


def register_sentence_udtf(spark) -> None:
    """Register the Spark 4 Python UDTF ``split_sentences`` — the
    table-function API surface (one input row → N output rows, usable in
    LATERAL position). Sentence splitting mirrors the readability
    operator's ``[.!?]+`` rule so the oracle re-derives rows with a
    plain ``string_split_regex`` + unnest."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, sentence: string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            for raw in re.split(r"[.!?]+", text):
                s = raw.strip()
                if s:
                    yield (pos, s)
                    pos += 1

    spark.udtf.register("split_sentences", SplitSentences)


def sentence_udtf_query(spark, sf_dir: str):
    """Per-doc sentence stats THROUGH the UDTF in LATERAL position."""
    from flink_example_spark.tables import load_tables

    load_tables(spark, sf_dir)
    register_sentence_udtf(spark)
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_sentences,
               CAST(SUM(length(s.sentence)) AS BIGINT) AS sum_len,
               CAST(MAX(length(s.sentence)) AS BIGINT) AS max_len
        FROM documents d, LATERAL split_sentences(d.text) s
        GROUP BY d.doc_id
        """
    )


SENTENCE_UDTF_ORACLE = """
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sentences,
           CAST(SUM(length(s)) AS BIGINT) AS sum_len,
           CAST(MAX(length(s)) AS BIGINT) AS max_len
    FROM (
      SELECT doc_id, trim(u.s) AS s
      FROM documents, unnest(string_split_regex(text, '[.!?]+')) AS u(s)
    ) WHERE s <> ''
    GROUP BY doc_id
"""


def trimmed_mean_grouped_udf_query(spark, sf_dir: str):
    """Per-type 10%-trimmed mean of event values via a GROUPED_AGG
    pandas UDF — the Arrow-batched custom-aggregate API surface. The UDF
    quantizes to integer cents and sums int64 before the single division
    (the repo's cross-engine rule applied INSIDE Python), so the oracle's
    rank-trimmed SQL mean matches bit-for-bit."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from flink_example_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    def _trimmed_mean_cents(v):
        cents = (v * 100).round().astype("int64").sort_values()
        k = len(cents) // 10
        kept = cents.iloc[k : len(cents) - k] if len(cents) > 2 * k else cents
        return float(int(kept.sum())) / len(kept) / 100.0

    # real class objects in __annotations__: the module-wide
    # `from __future__ import annotations` would stringify inline hints,
    # which pandas_udf's signature inference rejects
    _trimmed_mean_cents.__annotations__ = {"v": pd.Series, "return": float}
    trimmed_mean_cents = pandas_udf(_trimmed_mean_cents, "double")

    return ev.groupBy("event_type").agg(
        trimmed_mean_cents(F.col("value")).alias("trimmed_mean")
    )


TRIMMED_MEAN_ORACLE = """
    WITH cents AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT))
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / COUNT(*) / 100.0
             AS trimmed_mean
    FROM cents
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
"""
