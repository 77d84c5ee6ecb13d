"""flink_example_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``kerinin/flink-example``.

The reference (``/root/reference``, App.java) demonstrates point-in-time-correct
training-example generation: time-agnostic aggregate queries are turned into
*versioned tables* (per-key version histories keyed by event time) and probed
with event-time *temporal joins* (``FOR SYSTEM_TIME AS OF``, App.java:200-233).

This package re-expresses those semantics Spark-first:

- :mod:`flink_example_spark.tables`     — EventTable data model (DataFrame + event-time column)
- :mod:`flink_example_spark.operators`  — as-of join, version history, dedup,
  similarity, text analysis, multimodal plumbing
- :mod:`flink_example_spark.plans`      — the training-example pipeline
  (generic re-implementation of App.java:143-234 ``createTrainingExamples``)
- :mod:`flink_example_spark.sources`    — fixtures, parquet loaders, memory sources
- :mod:`flink_example_spark.streaming`  — Structured Streaming parity
- :mod:`flink_example_spark.functions`  — scalar helpers (NULLIF, TIMESTAMPADD, text fns)
"""

from flink_example_spark.session import get_spark, tune
from flink_example_spark.tables import EventTable, load_tables
from flink_example_spark.operators.asof import asof_join
from flink_example_spark.operators.versioned import version_history
from flink_example_spark.plans.training import training_examples

__all__ = [
    "get_spark",
    "tune",
    "EventTable",
    "load_tables",
    "asof_join",
    "version_history",
    "training_examples",
]

__version__ = "0.1.0"
