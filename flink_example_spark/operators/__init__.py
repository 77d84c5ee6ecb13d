from flink_example_spark.operators.asof import asof_join
from flink_example_spark.operators.versioned import latest_versions, version_history

__all__ = ["asof_join", "version_history", "latest_versions"]
