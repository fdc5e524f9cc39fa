"""End-to-end fidelity test of the reference pipeline
(CSV -> project/cast -> global temp view -> 3 jobs -> ORC tables),
following the reference's own test design (`DataTest.scala:71-200`):
schema assertion + row counts + golden values compared with the
round(2) + symmetric-difference idiom (union/intersect/except,
`DataTest.scala:115-121`). The fixture is synthesized per FIXTURES.md
§A guidance (>=50 states, multiple cities per state, nulls, and
single-row groups to exercise the HAVING path).
"""

from __future__ import annotations

import csv
import gzip
import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hive_spark.jobs.scorecard import (
    Configuration,
    run_scorecard_pipeline,
)

HEADER = [
    "UNITID", "OPEID", "INSTNM", "CITY", "STABBR",
    "COSTT4_A", "DEBT_MDN", "C100_4", "C150_4", "IGNORED_EXTRA",
]

STATES = [f"S{i:02d}" for i in range(49)] + ["TX"]


def _make_rows() -> list[list]:
    rng = random.Random(7)
    rows = []
    uid = 10000
    for st in STATES:
        n_cities = 4 if st == "TX" else rng.randint(1, 3)
        for ci in range(n_cities):
            city = f"{st}_CITY{ci}"
            # TX city 3 gets exactly 1 row -> dropped by HAVING COUNT>1
            n = 1 if (st == "TX" and ci == 3) else rng.randint(3, 6)
            for _ in range(n):
                uid += 1
                cost = "NULL" if rng.random() < 0.25 else str(rng.randint(8000, 60000))
                debt = "NULL" if rng.random() < 0.25 else f"{rng.uniform(4000, 30000):.1f}"
                c100 = "NULL" if rng.random() < 0.25 else f"{rng.uniform(0.05, 0.95):.4f}"
                c150 = f"{rng.uniform(0.1, 0.99):.4f}"
                rows.append(
                    [uid, str(uid * 10), f"College {uid}", city, st,
                     cost, debt, c100, c150, "x"]
                )
    return rows


@pytest.fixture(scope="module")
def scorecard_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("scorecard") / "scorecard.csv.gz"
    with gzip.open(path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(_make_rows())
    return str(path)


@pytest.fixture(scope="module")
def pipeline(spark, scorecard_csv):
    config = Configuration(database="college_db_test")
    spark.sql(f"DROP DATABASE IF EXISTS {config.database} CASCADE")
    results = run_scorecard_pipeline(spark, config, scorecard_csv)
    return config, results


def _sym_diff_empty(actual, expected) -> bool:
    """The reference's golden-diff idiom (`DataTest.scala:120-121`):
    df.union(exp).except(df.intersect(exp)).count == 0. Scala `except`
    is EXCEPT DISTINCT — `subtract` here (exceptAll would keep the
    union's intentional duplicates and never return empty)."""
    return actual.union(expected).subtract(actual.intersect(expected)).count() == 0


def test_loaded_schema_and_nulls(spark, scorecard_csv, pipeline):
    """Schema assert (`DataTest.scala:73-88`): inferred-then-coerced
    types, and "NULL" strings became SQL nulls."""
    from spark_hive_spark.jobs.scorecard import load_scorecard_data

    df = load_scorecard_data(spark, scorecard_csv)
    assert [f.name for f in df.schema] == [
        "UNITID", "OPEID", "INSTNM", "CITY", "STABBR",
        "COSTT4_A", "DEBT_MDN", "C100_4", "C150_4",
    ]
    types = {f.name: f.dataType for f in df.schema}
    assert types["UNITID"] == T.IntegerType()
    assert types["OPEID"] == T.IntegerType()          # coerced (`:44`)
    assert types["DEBT_MDN"] == T.DoubleType()        # coerced (`:49`)
    assert types["C100_4"] == T.DoubleType()
    assert df.filter(F.col("DEBT_MDN").isNull()).count() > 0
    assert df.filter(F.col("COSTT4_A").isNull()).count() > 0


def test_most_expensive_states(spark, pipeline):
    config, results = pipeline
    out = spark.table(f"{config.database}.most_expensive")
    assert out.count() == 5
    assert [f.name for f in out.schema] == ["STABBR", "COSTT4_A_MEAN"]
    # golden: recompute independently from the raw rows
    rows = _make_rows()
    by_state: dict[str, list[int]] = {}
    for r in rows:
        if r[5] != "NULL":
            by_state.setdefault(r[4], []).append(int(r[5]))
    means = sorted(
        ((st, sum(v) / len(v)) for st, v in by_state.items()),
        key=lambda x: -x[1],
    )[:5]
    expected = spark.createDataFrame(
        means, ["STABBR", "COSTT4_A_MEAN"]
    ).withColumn("COSTT4_A_MEAN", F.round("COSTT4_A_MEAN", 2))
    actual = out.withColumn("COSTT4_A_MEAN", F.round("COSTT4_A_MEAN", 2))
    assert _sym_diff_empty(actual, expected)


def test_highest_debt(spark, pipeline):
    config, results = pipeline
    out = spark.table(f"{config.database}.highest_debt")
    assert out.count() == 5
    rows = _make_rows()
    tx = sorted(
        (r for r in rows if r[4] == "TX" and r[6] != "NULL"),
        key=lambda r: -float(r[6]),
    )[:5]
    expected = spark.createDataFrame(
        [(r[0], int(r[1]), r[2], r[3], r[4], float(r[6])) for r in tx],
        ["UNITID", "OPEID", "INSTNM", "CITY", "STABBR", "DEBT_MDN"],
    ).withColumn("DEBT_MDN", F.round("DEBT_MDN", 2))
    actual = out.withColumn("DEBT_MDN", F.round("DEBT_MDN", 2))
    assert _sym_diff_empty(actual, expected)


def test_completion_rate_having_drops_singletons(spark, pipeline):
    config, results = pipeline
    out = spark.table(f"{config.database}.completion_rate")
    cities = {r.CITY for r in out.collect()}
    assert "TX_CITY3" not in cities  # the 1-row group (HAVING COUNT>1)
    # stddev defined (non-null) for every emitted group
    assert out.filter(F.col("C100_4_STDDEV").isNull()).count() == 0
    # golden recompute
    rows = _make_rows()
    by_city: dict[str, list[float]] = {}
    for r in rows:
        if r[4] == "TX" and r[7] != "NULL":
            by_city.setdefault(r[3], []).append(float(r[7]))
    expected_rows = []
    for city, vals in by_city.items():
        if len(vals) > 1:
            m = sum(vals) / len(vals)
            sd = math.sqrt(sum((v - m) ** 2 for v in vals) / (len(vals) - 1))
            expected_rows.append((city, m, sd, len(vals)))
    expected = (
        spark.createDataFrame(
            expected_rows, ["CITY", "C100_4_MEAN", "C100_4_STDDEV", "COUNT"]
        )
        .withColumn("COUNT", F.col("COUNT").cast("long"))
        .withColumn("C100_4_MEAN", F.round("C100_4_MEAN", 2))
        .withColumn("C100_4_STDDEV", F.round("C100_4_STDDEV", 2))
    )
    actual = out.withColumn("C100_4_MEAN", F.round("C100_4_MEAN", 2)).withColumn(
        "C100_4_STDDEV", F.round("C100_4_STDDEV", 2)
    )
    assert _sym_diff_empty(actual, expected)


def test_insert_into_positional_guard(spark, pipeline):
    """The arity/type assert must reject a wrong-shaped insert before
    writing (SURVEY.md §7 hard part (a))."""
    from spark_hive_spark.sources.catalog import insert_into

    config, _ = pipeline
    bad = spark.createDataFrame([(1, "x")], ["a", "b"])
    with pytest.raises(ValueError, match="arity|type mismatch"):
        insert_into(bad, f"{config.database}.completion_rate")


def test_partitioned_save_as_table(spark, scorecard_csv):
    """S4: CSV -> ORC saveAsTable with partitionBy
    (`SparkEnvironment.scala:50-56`), then partition-pruned readback."""
    from spark_hive_spark.jobs.scorecard import load_scorecard_data
    from spark_hive_spark.sources.catalog import save_as_orc_table

    df = load_scorecard_data(spark, scorecard_csv)
    save_as_orc_table(df, "scorecard_by_state", partition_by=["STABBR"])
    back = spark.table("scorecard_by_state")
    assert back.count() == df.count()
    tx = back.filter(F.col("STABBR") == "TX")
    assert tx.count() == df.filter(F.col("STABBR") == "TX").count()
    # partition pruning visible in the physical plan
    plan = tx._jdf.queryExecution().executedPlan().toString()
    assert "STABBR" in plan
