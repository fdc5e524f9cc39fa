"""JDBC source/sink via the embedded Derby engine that ships in
Spark's own jar set (no external database needed): covers the
`spark.read/write.jdbc` connector surface with a genuine SQL database
behind it — the common production shape where dimension tables live
in an RDBMS while facts live in the lake.

Scale notes: the JDBC side is the SMALL side by design (a dimension
write + read-back); the fact table never touches JDBC. Reading a big
table over JDBC would need `partitionColumn`/`numPartitions` range
splits — documented here, unnecessary for a 25-row dim. The read-back
dim broadcast-joins the parquet fact, so the lake side plans exactly
like any other broadcast dim join.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@register(
    "source_jdbc_dim_enrich",
    oracle=f"""
        SELECT n.n_name,
               count(*) AS n_customers,
               {sql_dsum('c.c_acctbal')} AS total_acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    tags=("source", "jdbc", "derby", "roundtrip"),
)
def source_jdbc_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC roundtrip + lake join: the nation dimension is written
    into an embedded Derby database over `df.write.jdbc`, read back
    over `spark.read.jdbc`, then broadcast-joined to the parquet
    customer fact for a per-nation aggregate. The oracle computes the
    same aggregate straight from parquet, so any loss or mangling in
    the JDBC write/read path (type mapping, row loss, encoding) flips
    the hash.

    The 25-row dim writes through a single connection (coalesce(1) —
    embedded Derby is single-process); the fact-side plan is identical
    to a plain broadcast dim join and never sees JDBC."""
    url = "jdbc:derby:" + os.path.join(
        scratch_root(), f"shs_derby_{uuid.uuid4().hex}"
    ) + ";create=true"
    props = {"driver": _DERBY_DRIVER}
    nation = t(spark, sf_dir, "nation")
    nation.coalesce(1).write.jdbc(url, "nation_dim", mode="overwrite",
                                  properties=props)
    dim = spark.read.jdbc(url, "nation_dim", properties=props).select(
        "n_nationkey", "n_name"
    )
    cust = t(spark, sf_dir, "customer")
    return (
        cust.join(F.broadcast(dim), cust.c_nationkey == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("n_name")
    )
