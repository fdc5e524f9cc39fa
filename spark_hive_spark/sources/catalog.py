"""Catalog DDL + ORC sink layer (reference S3, S4, D1-D4).

The reference's output pipeline: `create database $db`
(`SparkEnvironment.scala:44-48`), `CREATE TABLE ... STORED AS ORC`
per output table (`DataTest.scala:39-68`), results appended with
`.write.format("ORC").insertInto(db.table)` which matches columns BY
POSITION, not name (`CollegeScorecard.scala:77-79,116-118,154-156`),
plus `createOrReplaceGlobalTempView` registration (`DataTest.scala:36`)
and the dynamic-partition conf (`SparkEnvironment.scala:29`).

We use `USING ORC` (Spark-native ORC, catalog-agnostic) rather than
the Hive SerDe `STORED AS ORC`; with `enableHiveSupport()` the same
helpers drive a real Hive metastore unchanged. Positional insertInto
is easy to silently mis-column (SURVEY.md §7 "hard parts") —
`insert_into` asserts arity and warns-by-raising on type mismatch
before any write happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_database(spark: SparkSession, database: str) -> None:
    """D1: `SparkEnvironment.scala:44-48`."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")


def drop_database(spark: SparkSession, database: str) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {database} CASCADE")


def create_orc_table(
    spark: SparkSession, database: str, table: str, columns: dict[str, str]
) -> None:
    """D2: typed output-table DDL (`DataTest.scala:39-68`), ORC format."""
    cols = ", ".join(f"{name} {typ}" for name, typ in columns.items())
    spark.sql(f"CREATE TABLE IF NOT EXISTS {database}.{table} ({cols}) USING ORC")


def enable_dynamic_partitions(spark: SparkSession) -> None:
    """D4: `SparkEnvironment.scala:29` (only meaningful with Hive
    partitioned writes; harmless otherwise)."""
    spark.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")


def register_global_temp_view(df: DataFrame, name: str) -> str:
    """D3: `DataTest.scala:36`; address as global_temp.<name> (S2)."""
    df.createOrReplaceGlobalTempView(name)
    return f"global_temp.{name}"


def insert_into(df: DataFrame, qualified_table: str) -> None:
    """S3: positional append into a pre-created table
    (`CollegeScorecard.scala:77-79`). Asserts column count and types
    against the target schema first — positional resolution silently
    reorders otherwise (mitigation called for by SURVEY.md §7)."""
    spark = df.sparkSession
    target = spark.table(qualified_table).schema
    source = df.schema
    if len(target) != len(source):
        raise ValueError(
            f"insertInto {qualified_table}: arity mismatch "
            f"{len(source)} vs {len(target)}"
        )
    for i, (s, t) in enumerate(zip(source, target)):
        if s.dataType.simpleString() != t.dataType.simpleString():
            raise ValueError(
                f"insertInto {qualified_table}: position {i} type mismatch "
                f"{s.name}:{s.dataType.simpleString()} -> "
                f"{t.name}:{t.dataType.simpleString()}"
            )
    df.write.format("orc").insertInto(qualified_table)


def save_as_orc_table(
    df: DataFrame,
    qualified_table: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S4: CSV→ORC saveAsTable with optional partitioning
    (`SparkEnvironment.scala:50-56`). Partition columns become
    directory keys — the scan-time pruning lever at 100 TB."""
    writer = df.write.format("orc").mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(qualified_table)
