"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``spark_hive_spark.plans.registry`` — every implemented
operator from SURVEY.md §2 registers there with a (spark, sf_dir) ->
DataFrame callable and (where SQL-expressible) a DuckDB oracle SQL
string. See the registry module for the determinism rules (aliasing,
rounding, total ordering) that keep the driver's value-hash comparison
stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_hive_spark.plans.registry import all_queries

FLAGSHIP = "ref_building_acctbal_stats_by_nation"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's richest plan shape (`CollegeScorecard.scala:142-157`:
    filter -> groupBy -> {mean, stddev_samp, count} -> HAVING -> sort).
    """
    return all_queries()[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
