from __future__ import annotations

import pytest

from flink_example_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flink-example-spark-tests")
    yield s
    s.stop()
