from flink_example_spark.functions.scalar import nullif_, timestampadd_

__all__ = ["nullif_", "timestampadd_"]
