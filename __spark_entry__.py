"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (point-in-time-correct training
examples, the reference's full pipeline, App.java:143-234) at sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-runnable ANSI-SQL equivalent for each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from flink_example_spark.plans import events_demo

    return events_demo.pipeline(spark, SF0001)


# --- core pipeline queries (reference semantics on the events table) --------


def _q_features_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (App.java:47): grouped SUM with filter — final feature state."""
    from pyspark.sql import functions as F

    from flink_example_spark.plans.events_demo import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("loss_value")
        )
    )


def _q_target_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (App.java:52): grouped COUNT — final target state."""
    from pyspark.sql import functions as F

    from flink_example_spark.plans.events_demo import load_events

    ev = load_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").alias("_entity"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _q_feature_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned feature table (T4): cumulative per-key version history."""
    from flink_example_spark.plans.events_demo import feature_history, load_events

    return feature_history(load_events(spark, sf_dir))


def _q_target_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_example_spark.plans.events_demo import load_events, target_history

    return target_history(load_events(spark, sf_dir))


def _q_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + P3 + F2 (App.java:64-77): sliding row-frame count + filter."""
    from flink_example_spark.plans.events_demo import examples, load_events

    return examples(load_events(spark, sf_dir))


def _q_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + J2 (App.java:200-233): the full as-of-join pipeline."""
    from flink_example_spark.plans.events_demo import pipeline

    return pipeline(spark, sf_dir)


def _relational_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flink_example_spark.plans import relational

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in relational.TEMPLATES:
        out[name] = (lambda n: lambda spark, sf_dir: relational.run_sql(spark, sf_dir, n))(name)
    out["semi_join_customers"] = relational.semi_join_customers
    out["anti_join_customers"] = relational.anti_join_customers
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        "features_agg": _q_features_agg,
        "target_agg": _q_target_agg,
        "feature_history": _q_feature_history,
        "target_history": _q_target_history,
        "examples_window": _q_examples,
        "training_examples": _q_training_examples,
    }
    q.update(_relational_queries())
    return q


_FH_SQL = """
  SELECT DISTINCT user_id AS _entity, ts AS _change_time,
         CAST(SUM(CAST(value AS DECIMAL(18,2)))
              OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) AS loss_value
  FROM events WHERE event_type = 'error'
"""

_TH_SQL = """
  SELECT DISTINCT user_id AS _entity, ts AS _change_time,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY ts) AS cnt
  FROM events WHERE event_type = 'purchase'
"""

_EX_SQL = """
  SELECT user_id AS _entity, ts AS _prediction_time,
         ts + INTERVAL 1 HOUR AS _label_time
  FROM (
    SELECT user_id, ts,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS defeat_count
    FROM events
  ) WHERE defeat_count = 2
"""


def oracle_sql() -> dict[str, str]:
    from flink_example_spark.plans import relational

    out = {name: relational.render(name, "duck") for name in relational.TEMPLATES}
    out.update(relational.DF_ORACLES)
    out.update(_core_oracles())
    return out


def _core_oracles() -> dict[str, str]:
    return {
        "features_agg": (
            "SELECT user_id AS _entity, "
            "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS loss_value "
            "FROM events WHERE event_type = 'error' GROUP BY user_id"
        ),
        "target_agg": (
            "SELECT user_id AS _entity, COUNT(*) AS cnt "
            "FROM events WHERE event_type = 'purchase' GROUP BY user_id"
        ),
        "feature_history": _FH_SQL,
        "target_history": _TH_SQL,
        "examples_window": _EX_SQL,
        "training_examples": f"""
            WITH fh AS ({_FH_SQL}), th AS ({_TH_SQL}), ex AS ({_EX_SQL}),
            exf AS (
              SELECT ex._entity, ex._prediction_time, ex._label_time, fh.loss_value
              FROM ex ASOF LEFT JOIN fh
                ON ex._entity = fh._entity AND ex._prediction_time >= fh._change_time
            )
            SELECT exf._entity, exf._prediction_time, exf._label_time,
                   exf.loss_value, th.cnt
            FROM exf ASOF LEFT JOIN th
              ON exf._entity = th._entity AND exf._label_time >= th._change_time
        """,
    }
