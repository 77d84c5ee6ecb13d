"""The reference's fixture tables, transcribed exactly.

GamePlay rows: App.java:102-111 (schema App.java:112-122).
Purchase rows: App.java:129-131 (schema App.java:132-140).
Timestamps are timezone-less TIMESTAMP(3) (App.java:117) → TimestampNTZType.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

GAME_PLAY_SCHEMA = StructType(
    [
        StructField("ts", TimestampNTZType(), nullable=False),
        StructField("user", StringType(), nullable=False),
        StructField("duration", IntegerType(), nullable=True),
        StructField("won", BooleanType(), nullable=True),
    ]
)

GAME_PLAY_ROWS = [
    (datetime(2021, 8, 21, 2, 30), "Alice", 10, True),
    (datetime(2021, 8, 21, 2, 35), "Bob", 3, False),
    (datetime(2021, 8, 21, 3, 46), "Bob", 8, False),
    (datetime(2021, 8, 21, 3, 58), "Bob", 23, True),
    (datetime(2021, 8, 21, 4, 25), "Bob", 8, True),
    (datetime(2021, 8, 21, 5, 5), "Alice", 53, True),
    (datetime(2021, 8, 21, 5, 36), "Alice", 2, False),
    (datetime(2021, 8, 21, 7, 22), "Bob", 7, False),
    (datetime(2021, 8, 21, 8, 35), "Alice", 5, False),
    (datetime(2021, 8, 21, 10, 1), "Alice", 43, True),
]

PURCHASE_SCHEMA = StructType(
    [
        StructField("ts", TimestampNTZType(), nullable=False),
        StructField("user", StringType(), nullable=False),
    ]
)

PURCHASE_ROWS = [
    (datetime(2021, 8, 21, 1, 2), "Alice"),
    (datetime(2021, 8, 21, 1, 35), "Alice"),
    (datetime(2021, 8, 21, 3, 51), "Bob"),
]

# Golden final output (App.java:80-81): columns _entity, _prediction_time,
# _label_time, loss_duration, cnt — order-insensitive.
GOLDEN_ROWS = [
    ("Bob", datetime(2021, 8, 21, 3, 46), datetime(2021, 8, 21, 4, 46), 11, 1),
    ("Alice", datetime(2021, 8, 21, 8, 35), datetime(2021, 8, 21, 9, 35), 7, 2),
]


def game_play(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(GAME_PLAY_ROWS, GAME_PLAY_SCHEMA)


def purchase(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PURCHASE_ROWS, PURCHASE_SCHEMA)
