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
