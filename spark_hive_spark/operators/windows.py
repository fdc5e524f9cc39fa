"""Window functions (SURVEY.md §2B tier 1): ranking, running
aggregates, lag/lead.

Not present in the reference (SURVEY.md §2A "not present") — standard
analytic surface over the fixtures.

Scale design: a window = one hash shuffle on partitionBy keys + a
per-partition sort. All windows here partition on high-cardinality
keys (supplier, brand, user) so partitions stay small; every orderBy
includes a unique tie-break key so frames are total-ordered and
results are deterministic on any cluster. Running sums use exact
decimal so partial order within equal keys can't change results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dec
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "w_top3_parts_per_brand",
    oracle="""
        WITH part_rev AS (
            SELECT p_brand, p_partkey,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                       AS part_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand, p_partkey
        ),
        ranked AS (
            SELECT p_brand, p_partkey, part_revenue,
                   row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY part_revenue DESC, p_partkey ASC
                   ) AS rn
            FROM part_rev
        )
        SELECT p_brand, p_partkey, part_revenue, rn
        FROM ranked WHERE rn <= 3
        ORDER BY p_brand, rn
    """,
    tags=("window", "topk", "join"),
)
def w_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number: the 3 highest-revenue parts in
    each brand. The per-part aggregate runs BEFORE the window, so the
    window input is |part| rows, not |lineitem| — the canonical
    scale-safe top-k-per-group plan."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    part_rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount")))
            .cast("double")
            .alias("part_revenue")
        )
    )
    w = W.partitionBy("p_brand").orderBy(
        F.col("part_revenue").desc(), F.col("p_partkey").asc()
    )
    return (
        part_rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


@register(
    "w_running_revenue_by_supplier",
    oracle="""
        WITH li AS (
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
            FROM lineitem WHERE l_suppkey < 10
        )
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(sum(rev) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_revenue,
               CAST(count(*) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS running_items
        FROM li
        ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
    tags=("window", "frame"),
)
def w_running_revenue_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregates with an explicit ROWS frame over
    a total order. Decimal accumulation makes the cumulative sum exact
    at every prefix — on a cluster the same frame yields the same
    values regardless of partition placement."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 10)
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount"))
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
            F.sum(rev).over(w).cast("double").alias("running_revenue"),
            F.count(F.lit(1)).over(w).cast("long").alias("running_items"),
        )
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    )


@register(
    "w_customer_rank_in_nation",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               rank()       OVER w AS bal_rank,
               dense_rank() OVER w AS bal_dense_rank,
               round(percent_rank() OVER w, 6) AS bal_pct_rank,
               ntile(4)     OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS bal_quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
        ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    tags=("window", "rank"),
)
def w_customer_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile in one pass (one
    shuffle+sort serves all four). rank windows order by value only
    (ties share ranks — deterministic); ntile needs the unique
    tie-break to be a total order."""
    cust = t(spark, sf_dir, "customer")
    w_val = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_total = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.rank().over(w_val).alias("bal_rank"),
            F.dense_rank().over(w_val).alias("bal_dense_rank"),
            F.round(F.percent_rank().over(w_val), 6).alias("bal_pct_rank"),
            F.ntile(4).over(w_total).alias("bal_quartile"),
        )
        .orderBy("c_nationkey", F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "w_event_lag_lead_gaps",
    oracle="""
        SELECT user_id, event_id, ts, event_type, value,
               lag(value)  OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               epoch_us(ts) - epoch_us(lag(ts) OVER w) AS micros_since_prev
        FROM events
        WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id
    """,
    tags=("window", "lag"),
)
def w_event_lag_lead_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event streams + inter-event gap in exact
    integer microseconds (epoch micros subtraction — no float time
    math, so it's engine- and TZ-independent)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id", "event_id", "ts", "event_type", "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
                "micros_since_prev"
            ),
        )
        .orderBy("user_id", "ts", "event_id")
    )
