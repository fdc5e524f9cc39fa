"""Shared pytest fixtures: one SparkSession per test run (session scope
— JVM startup is ~10 s), testdata paths, and the DuckDB oracle."""

from __future__ import annotations

import os

import duckdb
import pytest

from spark_hive_spark.session import get_spark
from spark_hive_spark.tables import TABLES, table_path

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "spark_hive_spark-tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.driver.memory": "8g",
        },
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(SF_ORACLE, name)}'"
        )
    yield con
    con.close()
