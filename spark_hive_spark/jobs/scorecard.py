"""Reference-fidelity jobs (SURVEY.md §2A).

The reference (`CollegeScorecard.scala`) defines one loader + three
analytical jobs over a wide CSV registered in a Hive-style catalog:

1. ``fiveMostExpensiveStates`` (`CollegeScorecard.scala:70-80`):
   groupBy(key).agg(mean(v)) -> orderBy desc -> limit 5.
2. ``fiveTexasCollegesWithHighestMedianDebt`` (`:102-119`):
   filter(null-test AND equality) -> project+cast -> orderBy desc -> limit 5.
3. ``completionRateStatsInTexasByCity`` (`:142-157`):
   filter -> groupBy -> {mean, stddev_samp, count} -> HAVING count>1
   -> orderBy desc.

This module re-implements those *shapes* as generic, reusable PySpark
job functions parameterized the way the reference's ``Configuration``
case class (`Configuration.scala:1-6`) parameterizes db/table names,
and registers testdata instantiations with DuckDB oracles.

Scale notes: all three shapes are single-shuffle plans — partial
(map-side) aggregation then a hash shuffle on the group key;
``orderBy+limit`` fuses to TakeOrderedAndProject (no global sort). They
scale linearly with input and are skew-safe for realistic key
cardinalities (AQE skew handling is on in session.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import davg, sql_davg
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@dataclass(frozen=True)
class Configuration:
    """Port of `Configuration.scala:1-6` — names the catalog objects."""

    database: str = "college_db"
    scorecard_table: str = "college_scorecard"
    most_expensive_table: str = "most_expensive"
    highest_debt_table: str = "highest_debt"
    completion_rate_table: str = "completion_rate"


# --- generic job shapes -------------------------------------------------


def top_k_groups_by_mean(
    df: DataFrame, group_col: str, value_col: str, alias: str, k: int = 5,
    *, tiebreak: str | None = None,
) -> DataFrame:
    """Shape of job 1 (`CollegeScorecard.scala:70-80`): mean per group,
    k largest groups. Sort desc via ``.desc()`` (the reference negates
    the column, `:75` — same plan). Mean computed order-independently
    (exact decimal sum / count) so results are stable across engines
    and cluster sizes."""
    mean_col = davg(value_col).alias(alias)
    order = [F.col(alias).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return df.groupBy(group_col).agg(mean_col).orderBy(*order).limit(k)


def top_k_filtered(
    df: DataFrame, predicate: str, select_cols: list[Column | str],
    order_col: str, k: int = 5, *, tiebreak: str | None = None,
) -> DataFrame:
    """Shape of job 2 (`CollegeScorecard.scala:102-119`): SQL-string
    filter -> projection with casts -> top-k by a measure."""
    order = [F.col(order_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return df.filter(predicate).select(*select_cols).orderBy(*order).limit(k)


def group_stats_with_having(
    df: DataFrame, predicate: str, group_col: str, value_col: str,
    *, mean_alias: str, std_alias: str, count_alias: str = "COUNT",
    tiebreak: str | None = None,
) -> DataFrame:
    """Shape of job 3 (`CollegeScorecard.scala:142-157`): filter ->
    groupBy -> {mean, stddev_samp, count} -> post-agg filter (HAVING
    count>1, which drops the n=1 groups where sample stddev is
    undefined — rationale at `CollegeScorecard.scala:134-136`) ->
    sort desc. stddev is irrational → rounded to 6dp for cross-engine
    stability; mean is exact (decimal sum / count)."""
    out = (
        df.filter(predicate)
        .groupBy(group_col)
        .agg(
            davg(value_col).alias(mean_alias),
            F.round(F.stddev_samp(value_col), 6).alias(std_alias),
            F.count("*").alias(count_alias),
        )
        .filter(F.col(count_alias) > 1)
    )
    order = [F.col(mean_alias).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return out.orderBy(*order)


# --- testdata instantiations (driver-checked) ---------------------------


@register(
    "ref_top5_nations_by_avg_acctbal",
    oracle=f"""
        SELECT c_nationkey, {sql_davg('c_acctbal')} AS acctbal_mean
        FROM customer
        GROUP BY c_nationkey
        ORDER BY acctbal_mean DESC, c_nationkey ASC
        LIMIT 5
    """,
    tags=("reference", "aggregate", "topk"),
)
def ref_top5_nations_by_avg_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-1 shape (`CollegeScorecard.scala:70-80`) on customer:
    5 nations with the highest mean account balance."""
    return top_k_groups_by_mean(
        t(spark, sf_dir, "customer"),
        "c_nationkey", "c_acctbal", "acctbal_mean", 5, tiebreak="c_nationkey",
    )


@register(
    "ref_top5_finished_orders_by_price",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_orderstatus = 'F'
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 5
    """,
    tags=("reference", "filter", "topk"),
)
def ref_top5_finished_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-2 shape (`CollegeScorecard.scala:102-119`): SQL-string filter
    (null test + string equality, `:105`) -> project + cast (`:106-113`)
    -> top-5 by measure."""
    return top_k_filtered(
        t(spark, sf_dir, "orders"),
        "o_totalprice IS NOT NULL AND o_orderstatus = 'F'",
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
        ],
        "totalprice", 5, tiebreak="o_orderkey",
    )


@register(
    "ref_building_acctbal_stats_by_nation",
    oracle=f"""
        SELECT c_nationkey,
               {sql_davg('c_acctbal')} AS acctbal_mean,
               round(stddev_samp(c_acctbal), 6) AS acctbal_stddev,
               count(*) AS "COUNT"
        FROM customer
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal IS NOT NULL
        GROUP BY c_nationkey
        HAVING count(*) > 1
        ORDER BY acctbal_mean DESC, c_nationkey ASC
    """,
    tags=("reference", "aggregate", "having"),
)
def ref_building_acctbal_stats_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job-3 shape (`CollegeScorecard.scala:142-157`): filter -> groupBy
    -> {mean, stddev_samp, count} -> HAVING COUNT>1 -> sort desc."""
    return group_stats_with_having(
        t(spark, sf_dir, "customer"),
        "c_mktsegment = 'BUILDING' AND c_acctbal IS NOT NULL",
        "c_nationkey", "c_acctbal",
        mean_alias="acctbal_mean", std_alias="acctbal_stddev",
        tiebreak="c_nationkey",
    )


# --- full reference pipeline (CSV -> catalog -> jobs -> ORC tables) -----

from pyspark.sql import SparkSession  # noqa: E402  (re-export clarity)

from spark_hive_spark.sources.catalog import (  # noqa: E402
    create_database,
    create_orc_table,
    insert_into,
    register_global_temp_view,
)
from spark_hive_spark.sources.csv import load_csv  # noqa: E402

#: The reference's 9-column projection with coercing casts
#: (`CollegeScorecard.scala:42-52`; OPEID cast at `:44`, DEBT_MDN at `:49`).
SCORECARD_SELECT: tuple[tuple[str, str | None], ...] = (
    ("UNITID", None),
    ("OPEID", "int"),
    ("INSTNM", None),
    ("CITY", None),
    ("STABBR", None),
    ("COSTT4_A", None),
    ("DEBT_MDN", "double"),
    ("C100_4", None),
    ("C150_4", None),
)

#: Output-table DDL (`DataTest.scala:39-68`).
OUTPUT_TABLES: dict[str, dict[str, str]] = {
    "most_expensive": {"STABBR": "STRING", "COSTT4_A_MEAN": "DOUBLE"},
    "highest_debt": {
        "UNITID": "INT", "OPEID": "INT", "INSTNM": "STRING",
        "CITY": "STRING", "STABBR": "STRING", "DEBT_MDN": "DOUBLE",
    },
    "completion_rate": {
        "CITY": "STRING", "C100_4_MEAN": "DOUBLE",
        "C100_4_STDDEV": "DOUBLE", "COUNT": "BIGINT",
    },
}


def load_scorecard_data(spark: SparkSession, path: str) -> DataFrame:
    """Loader (`CollegeScorecard.scala:35-53`): CSV with header /
    nullValue="NULL" / inferSchema, projected to 9 columns with the
    two coercing casts."""
    raw = load_csv(spark, path)
    cols = [
        F.col(name).cast(typ).alias(name) if typ else F.col(name)
        for name, typ in SCORECARD_SELECT
    ]
    return raw.select(*cols)


def create_output_tables(spark: SparkSession, config: Configuration) -> None:
    """`DataTest.scala:28-69` before-block: database + 3 ORC tables."""
    create_database(spark, config.database)
    for table, columns in OUTPUT_TABLES.items():
        create_orc_table(spark, config.database, table, columns)


def five_most_expensive_states(
    spark: SparkSession, config: Configuration
) -> DataFrame:
    """Job 1 (`CollegeScorecard.scala:70-80`): mean cost per state,
    top 5, appended positionally into most_expensive."""
    df = spark.sql(f"select * from global_temp.{config.scorecard_table}")
    out = (
        df.groupBy("STABBR")
        .agg(F.mean("COSTT4_A").alias("COSTT4_A_MEAN"))
        .orderBy(F.col("COSTT4_A_MEAN").desc())
        .limit(5)
    )
    insert_into(out, f"{config.database}.{config.most_expensive_table}")
    return out


def five_texas_colleges_with_highest_median_debt(
    spark: SparkSession, config: Configuration
) -> DataFrame:
    """Job 2 (`CollegeScorecard.scala:102-119`)."""
    df = spark.sql(f"select * from global_temp.{config.scorecard_table}")
    out = (
        df.filter("DEBT_MDN IS NOT NULL AND STABBR == 'TX'")
        .select(
            "UNITID", "OPEID", "INSTNM", "CITY", "STABBR",
            F.col("DEBT_MDN").cast("double").alias("DEBT_MDN"),
        )
        .orderBy(F.col("DEBT_MDN").desc())
        .limit(5)
    )
    insert_into(out, f"{config.database}.{config.highest_debt_table}")
    return out


def completion_rate_stats_in_texas_by_city(
    spark: SparkSession, config: Configuration
) -> DataFrame:
    """Job 3 (`CollegeScorecard.scala:142-157`), incl. the HAVING
    COUNT>1 guard for undefined n=1 sample stddev (`:134-136,152`)."""
    df = spark.sql(f"select * from global_temp.{config.scorecard_table}")
    out = (
        df.filter("STABBR == 'TX' AND C100_4 IS NOT NULL")
        .groupBy("CITY")
        .agg(
            F.mean("C100_4").alias("C100_4_MEAN"),
            F.stddev_samp("C100_4").alias("C100_4_STDDEV"),
            F.count("*").alias("COUNT"),
        )
        .filter("COUNT > 1")
        .orderBy(F.col("C100_4_MEAN").desc())
    )
    insert_into(out, f"{config.database}.{config.completion_rate_table}")
    return out


def run_scorecard_pipeline(
    spark: SparkSession, config: Configuration, csv_path: str,
    *, reset: bool = True,
) -> dict[str, DataFrame]:
    """End-to-end: load -> cache (`DataTest.scala:15`) -> global temp
    view (`:36`) -> three jobs -> ORC tables.

    ``insertInto`` APPENDS (reference semantics) — ``reset=True``
    drops and recreates the database first, mirroring the reference's
    per-test catalog reset (`SparkEnvironment.scala:22-31`
    `TestHive.reset()` + the `DataTest.scala:28-69` before-block);
    pass ``reset=False`` for incremental appends."""
    if reset:
        from spark_hive_spark.sources.catalog import drop_database

        drop_database(spark, config.database)
    data = load_scorecard_data(spark, csv_path).cache()
    register_global_temp_view(data, config.scorecard_table)
    create_output_tables(spark, config)
    return {
        "most_expensive": five_most_expensive_states(spark, config),
        "highest_debt": five_texas_colleges_with_highest_median_debt(spark, config),
        "completion_rate": completion_rate_stats_in_texas_by_city(spark, config),
    }
