from flink_example_spark.plans.training import (
    consecutive_loss_examples,
    reference_pipeline,
    training_examples,
)

__all__ = ["training_examples", "consecutive_loss_examples", "reference_pipeline"]
