"""Driver-attested ORC catalog roundtrip (reference S3/S4/D1-D3 in one
registered query): CREATE DATABASE -> typed CREATE TABLE ... USING ORC
(`DataTest.scala:39-68` DDL shape) -> positional ``insertInto``
(`CollegeScorecard.scala:77-79`) -> partitioned ``saveAsTable``
(`SparkEnvironment.scala:50-56`) -> global temp view (`DataTest.scala:36`)
-> read EVERYTHING back and aggregate.

The returned DataFrame scans only the ORC tables just written (never
the source parquet), so a hash-green driver row proves the physical
write/read path end-to-end: any column mis-position, type corruption,
partition mis-bucketing, or name mangling changes the aggregate.

The database lives under an explicit tempdir LOCATION so managed-table
writes never depend on (or pollute) the harness cwd / warehouse conf.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.sources.catalog import (
    create_orc_table,
    insert_into,
    register_global_temp_view,
    save_as_orc_table,
)
from spark_hive_spark.tables import t

# Per-process names: concurrent runs (parallel pytest workers, an
# overlapping driver sweep) must not DROP ... CASCADE + rmtree each
# other's live tables mid-query (ADVICE r3).
_DB = f"shs_orc_check_{os.getpid()}"


def run_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-agnostic core of the roundtrip — runs identically on the
    in-memory catalog (registered driver query) and on a Hive-enabled
    session (`tests/test_hive_catalog.py`, mirroring the reference's
    real `TestHiveContext`, `SparkEnvironment.scala:6-19`)."""
    return ref_orc_roundtrip(spark, sf_dir)


@register(
    "ref_orc_roundtrip",
    oracle="""
        SELECT n_regionkey,
               count(*) AS n_nations,
               min(n_nationkey) AS min_key,
               max(n_nationkey) AS max_key,
               CAST(sum(length(n_name)) AS BIGINT) AS name_chars
        FROM nation
        GROUP BY n_regionkey
        ORDER BY n_regionkey
    """,
    tags=("catalog", "orc", "sink", "roundtrip"),
)
def ref_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write `nation` through BOTH reference sink shapes — positional
    insertInto into a DDL-typed ORC table, and a partitionBy
    saveAsTable — then aggregate the join of the two read-backs via a
    global temp view. Row-for-row identical roundtrips are required
    for the per-region counts/keys/name-lengths to match the oracle
    (computed from the source parquet)."""
    loc = os.path.join(scratch_root(), f"{_DB}_loc")
    # Reset catalog AND filesystem state: a leftover location from a
    # previous session isn't tracked by this session's catalog, and a
    # managed-table CREATE refuses a non-empty location.
    spark.sql(f"DROP DATABASE IF EXISTS {_DB} CASCADE")
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    spark.sql(f"CREATE DATABASE {_DB} LOCATION '{loc}'")
    nation = t(spark, sf_dir, "nation")

    # S3 path: typed DDL + positional append.
    create_orc_table(
        spark,
        _DB,
        "nation_orc",
        {"n_nationkey": "INT", "n_name": "STRING", "n_regionkey": "INT"},
    )
    insert_into(
        nation.select("n_nationkey", "n_name", "n_regionkey"),
        f"{_DB}.nation_orc",
    )

    # S4 path: saveAsTable partitioned by region (directory-key layout,
    # the scan-pruning lever at scale).
    save_as_orc_table(
        nation,
        f"{_DB}.nation_orc_part",
        partition_by=["n_regionkey"],
        mode="overwrite",
    )

    back = spark.table(f"{_DB}.nation_orc")
    part_back = spark.table(f"{_DB}.nation_orc_part").select(
        F.col("n_nationkey").alias("p_nationkey"),
        F.col("n_name").alias("p_name"),
        F.col("n_regionkey").alias("p_regionkey"),
    )
    joined = back.join(
        part_back,
        (F.col("n_nationkey") == F.col("p_nationkey"))
        & (F.col("n_name") == F.col("p_name"))
        & (F.col("n_regionkey") == F.col("p_regionkey")),
        "inner",
    )
    view = register_global_temp_view(joined, f"{_DB}_roundtrip_check")
    return spark.sql(
        f"""
        SELECT n_regionkey,
               count(*) AS n_nations,
               min(n_nationkey) AS min_key,
               max(n_nationkey) AS max_key,
               sum(length(n_name)) AS name_chars
        FROM {view}
        GROUP BY n_regionkey
        ORDER BY n_regionkey
        """
    )
