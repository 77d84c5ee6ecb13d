"""In-memory collection source (S1, App.java:101-111 ``env.fromElements``).

In Spark the typed-stream decoration (S2, ``.returns(Types.ROW_NAMED(...))``)
is the StructType passed to ``createDataFrame``.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def from_rows(spark: SparkSession, rows: Iterable[tuple], schema: StructType) -> DataFrame:
    return spark.createDataFrame(list(rows), schema)
