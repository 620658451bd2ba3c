from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = f"{TESTDATA}/sf0.001"
SF_MEDIUM = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from graph500_spark.session import get_spark

    s = get_spark(app_name="graph500-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
