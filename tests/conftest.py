from __future__ import annotations

import os

import pytest

from flights_data_pipeline_spark.io.jdbc import find_duckdb_jdbc_jar
from flights_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_T2 = os.environ.get("SPARK_GRAFT_T2_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # jars must be on the classpath at JVM start, so the (optional)
    # embedded-DB JDBC driver is wired here for the whole test session
    jar = find_duckdb_jdbc_jar()
    extra = {"spark.jars": jar} if jar else {}
    s = get_spark(
        "fdp-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        driver_memory="8g",
        extra_conf=extra,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
