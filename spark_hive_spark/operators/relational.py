"""Relational breadth: multi-way joins, semi/anti joins, set ops,
scan-heavy aggregation (SURVEY.md §2B tier 1).

The reference has no joins at all (SURVEY.md §2A "not present") — this
module supplies the star-schema join surface its data model implies,
TPC-H-shaped over the driver fixtures.

Scale design:
- Small dims (region 5, nation 25, supplier O(100·SF)) are broadcast-
  hinted: the probe side streams, no shuffle of the fact table.
- Fact-fact joins (lineitem ⋈ orders) shuffle on the join key only
  after filters have reduced both sides; Catalyst pushes the filters
  below the join, AQE picks SMJ vs shuffled-hash and splits skewed
  partitions at runtime.
- Aggregations are partial (map-side) before the exchange, and money
  measures aggregate in exact decimal (see functions/numeric.py) so
  results are independent of partitioning/summation order — a
  correctness property at 1000 executors, not just an oracle nicety.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import (
    SQL_REVENUE_DEC,
    davg,
    dec,
    dsum,
    revenue_dec,
    sql_davg,
    sql_dsum,
)
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')}      AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS sum_disc_price,
               CAST(sum({SQL_REVENUE_DEC} * (1 + CAST(l_tax AS DECIMAL(18,2))))
                    AS DOUBLE)               AS sum_charge,
               {sql_davg('l_quantity')}      AS avg_qty,
               {sql_davg('l_extendedprice')} AS avg_price,
               {sql_davg('l_discount')}      AS avg_disc,
               count(*)                      AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("aggregate", "scan"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: predicate-pushdown scan -> two-key hash
    aggregate with 8 aggregates in one pass (partial+final). The widest
    single-table aggregation in the surface."""
    li = t(spark, sf_dir, "lineitem")
    charge = revenue_dec() * (F.lit(1).cast("decimal(3,2)") + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(revenue_dec()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l_orderkey,
               CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    tags=("join", "aggregate", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (filtered dims), aggregate, top-10.
    customer (filtered to 1 segment = ~1/5) is broadcast; the
    orders⋈lineitem equi-join shuffles on the order key after date
    filters prune both sides; orderBy+limit fuses to
    TakeOrderedAndProject (no global sort)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cut = F.lit("1998-06-01").cast("timestamp")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_dec()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
        SELECT n_name,
               CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    tags=("join", "aggregate"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All three dims (supplier,
    nation, region) broadcast — the only shuffles are lineitem⋈orders
    on the order key and orders⋈customer on the cust key, then one
    25-group aggregate."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_dec()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    tags=("aggregate", "scan"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive predicate + global
    aggregate. All four predicates push to the parquet reader; the
    aggregate is a single partial+final reduction (no keyed shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "join_semi_active_customers",
    oracle="""
        SELECT c_nationkey, count(*) AS n_customers
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    tags=("join", "semi"),
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (= EXISTS): customers holding at least one open
    order, counted per nation. Semi join never duplicates or widens the
    left side — at scale it shuffles only the join keys of orders."""
    cust = t(spark, sf_dir, "customer")
    open_orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_nationkey")
    )


@register(
    "join_anti_customers_without_pending",
    oracle="""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
        )
        ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def join_anti_customers_without_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (= NOT EXISTS): customers with no pending ('P')
    order. (Every customer has *some* order in the fixtures, so the
    filter keeps the result non-trivial at every SF.)"""
    cust = t(spark, sf_dir, "customer")
    pending = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(pending, cust.c_custkey == pending.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


@register(
    "join_outer_nation_order_volume",
    oracle=f"""
        SELECT n_nationkey, n_name,
               count(o_orderkey) AS n_orders,
               coalesce({sql_dsum('o_totalprice')}, 0.0) AS total_spend
        FROM nation
        LEFT JOIN customer ON c_nationkey = n_nationkey
        LEFT JOIN orders   ON o_custkey = c_custkey
        GROUP BY n_nationkey, n_name
        ORDER BY n_nationkey
    """,
    tags=("join", "outer"),
)
def join_outer_nation_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER joins preserving empty nations (count 0, spend 0).
    At scale we aggregate orders per customer nation FIRST, then
    broadcast-join the tiny 25-row rollup to nation — the outer join
    never touches the fact table directly."""
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("o_orderkey").alias("n_orders_raw"),
            dsum("o_totalprice").alias("spend_raw"),
        )
    )
    return (
        nation.join(
            F.broadcast(per_nation),
            nation.n_nationkey == per_nation.c_nationkey,
            "left",
        )
        .select(
            "n_nationkey",
            "n_name",
            F.coalesce(F.col("n_orders_raw"), F.lit(0).cast("long")).alias(
                "n_orders"
            ),
            F.coalesce(F.col("spend_raw"), F.lit(0.0)).alias("total_spend"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "setops_segment_overlap",
    oracle="""
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        big_spenders AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_totalprice > 300000
        )
        SELECT c_custkey FROM building
        INTERSECT
        SELECT c_custkey FROM big_spenders
        ORDER BY c_custkey
    """,
    tags=("setop",),
)
def setops_segment_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (reference T1-T3, `DataTest.scala:120,154,198` use
    union/intersect/except as the golden-diff idiom): BUILDING-segment
    customers who also placed a >300k order. Built with
    union→intersect→except to exercise all three; the except-empty
    step mirrors the reference's symmetric-difference construction and
    is a no-op by design."""
    cust = t(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    # union-with-self then intersect dedups; except an empty diff is a no-op
    empty = building.exceptAll(building)
    return (
        building.union(building)
        .intersect(big)
        .exceptAll(empty)
        .orderBy("c_custkey")
    )
