"""ORC catalog roundtrip on a REAL Hive metastore (VERDICT r3 task 5).

The reference runs against an actual `TestHiveContext`
(`SparkEnvironment.scala:6-19`); the registered `ref_orc_roundtrip`
driver query uses the in-memory catalog. This test closes that fidelity
delta: it runs the SAME roundtrip core (`run_orc_roundtrip`) plus a D4
dynamic-partition Hive-format insert on a `enableHiveSupport()` session
backed by embedded Derby, and checks the aggregate against DuckDB on
the source parquet.

A Hive session can't coexist with the suite's shared in-memory-catalog
session (one JVM, one SparkSession), so the Spark work runs in a
subprocess; derby.log / metastore_db land in a tempdir via session.py's
hive confs, never in the repo cwd.
"""

from __future__ import annotations

import json
import subprocess
import sys

import duckdb

from tests.conftest import SF_SMOKE

_SCRIPT = r"""
import json, sys
from spark_hive_spark.session import get_spark
from spark_hive_spark.jobs.orc_roundtrip import run_orc_roundtrip, _DB
from spark_hive_spark.sources.catalog import enable_dynamic_partitions
from spark_hive_spark.tables import t

sf_dir = sys.argv[1]
spark = get_spark(
    "hive-roundtrip-test",
    hive=True,
    extra_conf={
        "spark.driver.memory": "4g",
        "spark.sql.shuffle.partitions": "4",
        "spark.master": "local[4]",
    },
)
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

out = run_orc_roundtrip(spark, sf_dir)
rows = [[r[0], r[1], r[2], r[3], r[4]] for r in out.collect()]

# D4: dynamic-partition insert through the Hive code path (partitioned
# Hive-format table + INSERT with the partition column resolved per-row)
enable_dynamic_partitions(spark)
spark.conf.set("hive.exec.dynamic.partition", "true")
nation = t(spark, sf_dir, "nation")
nation.createOrReplaceTempView("src_nation")
spark.sql(
    f"CREATE TABLE {_DB}.nation_hive_part (n_nationkey INT, n_name STRING) "
    f"PARTITIONED BY (n_regionkey INT) STORED AS ORC"
)
spark.sql(
    f"INSERT INTO {_DB}.nation_hive_part PARTITION (n_regionkey) "
    f"SELECT n_nationkey, n_name, n_regionkey FROM src_nation"
)
parts = [
    p.partition for p in
    spark.sql(f"SHOW PARTITIONS {_DB}.nation_hive_part").collect()
]
n_back = spark.table(f"{_DB}.nation_hive_part").count()

print("RESULT::" + json.dumps({"rows": rows, "parts": sorted(parts), "n": n_back}))
spark.sql(f"DROP DATABASE IF EXISTS {_DB} CASCADE")
spark.stop()
"""


def test_orc_roundtrip_on_hive_metastore():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, SF_SMOKE],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT::")]
    assert marker, f"subprocess failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    got = json.loads(marker[0][len("RESULT::"):])

    con = duckdb.connect()
    expected = con.execute(
        f"""
        SELECT n_regionkey, count(*) AS n_nations,
               min(n_nationkey) AS min_key, max(n_nationkey) AS max_key,
               CAST(sum(length(n_name)) AS BIGINT) AS name_chars
        FROM '{SF_SMOKE}/nation.parquet'
        GROUP BY n_regionkey ORDER BY n_regionkey
        """
    ).fetchall()
    assert [tuple(r) for r in got["rows"]] == [tuple(r) for r in expected]

    # D4 dynamic-partition write created one partition per region and
    # lost no rows
    assert got["parts"] == [f"n_regionkey={k}" for k in range(5)]
    assert got["n"] == sum(r[1] for r in expected)
