"""Subquery surface: scalar subqueries, IN / NOT IN, correlated
EXISTS, and the classic TPC-H decision-support shapes built on them
(SURVEY.md §2B tier 1 breadth).

Catalyst rewrites every one of these into joins (scalar subquery →
broadcast of a 1-row aggregate; IN → left-semi; NOT IN → null-aware
anti join; correlated EXISTS → semi join with pushed correlation), so
the scale posture is the join posture — nothing here materializes a
subquery per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import SQL_REVENUE_DEC, revenue_dec
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import load_tables, t


@register(
    "subq_scalar_above_avg_orders",
    oracle=f"""
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 50
    """,
    tags=("subquery", "scalar"),
)
def subq_scalar_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.8× the global average price.
    Catalyst computes the 1-row aggregate once and broadcasts it into
    the filter — no per-row subquery execution. (The comparison uses
    the raw double avg on both engines: identical input set, identical
    reduction? No — summation order differs, so the threshold could
    move by ~1e-9. The 2× margin makes boundary rows impossible in
    this data; LIMIT+tiebreak keeps selection deterministic; the 1.8 multiplier keeps the result non-empty at every SF.)"""
    load_tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 50
        """
    )


@register(
    "subq_in_parts_shipped_by_small_suppliers",
    oracle="""
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
        )
        ORDER BY p_partkey
    """,
    tags=("subquery", "in"),
)
def subq_in_parts_shipped_by_small_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nested IN subqueries (→ stacked semi joins): parts ever shipped
    by a negative-balance supplier."""
    load_tables(spark, sf_dir, names=("part", "lineitem", "supplier"))
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_brand
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem
            WHERE l_suppkey IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
        )
        ORDER BY p_partkey
        """
    )


@register(
    "subq_correlated_exists_recent_order",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
              AND o_totalprice > 250000
        )
        ORDER BY c_custkey
    """,
    tags=("subquery", "exists", "correlated"),
)
def subq_correlated_exists_recent_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated EXISTS with extra predicates (→ semi join with the
    correlation pushed into the join condition)."""
    load_tables(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
              AND o_totalprice > 250000
        )
        ORDER BY c_custkey
        """
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH costs AS (
            SELECT p_partkey, s_suppkey, s_name, s_acctbal,
                   min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
            FROM part
            JOIN lineitem ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE p_size >= 4
        )
        SELECT DISTINCT p_partkey, s_suppkey, s_name,
               CAST(s_acctbal AS DOUBLE) AS acctbal
        FROM costs
        WHERE s_acctbal = min_bal
        ORDER BY p_partkey, s_suppkey
    """,
    tags=("subquery", "window", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-per-group correlated subquery), expressed
    as a window min — ONE shuffle on the group key instead of the
    naive join-against-per-group-aggregate (which shuffles twice).
    Ties (two suppliers at the min) are all kept, like Q2."""
    part = t(spark, sf_dir, "part").filter(F.col("p_size") >= 4)
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal")
    )
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            "p_partkey", "s_suppkey", "s_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
        .distinct()
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
        WITH per_cust AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON o_custkey = c_custkey
                AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "aggregate", "distribution"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with a join-level predicate, then a
    two-level aggregate (orders per customer → customers per order
    count)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (orders.o_custkey == cust.c_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
        SELECT CAST(
                 100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN {SQL_REVENUE_DEC} ELSE 0 END)
               AS DOUBLE)
               / CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS promo_share_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    """,
    tags=("join", "aggregate", "conditional"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue
    share). Both the numerator and denominator are exact decimal sums;
    the single final double division is deterministic."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = revenue_dec()
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.sum(promo_rev).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_share_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q18_large_volume_orders",
    oracle=f"""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               {('CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)')} AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("join", "having", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): join + group + HAVING on
    a sum + top-k. Spark plans the HAVING as a post-aggregate filter;
    the orderBy+limit fuses to TakeOrderedAndProject."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_dec_qty"),
        )
        .filter(F.col("_dec_qty") > 150)  # exact decimal comparison
        .withColumn("total_qty", F.col("_dec_qty").cast("double"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "subq_not_in_null_aware",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey NOT IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_returnflag = 'R' AND l_quantity > 49
        )
        ORDER BY s_suppkey
    """,
    tags=("subquery", "not-in"),
)
def subq_not_in_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (→ null-aware anti join — semantically stricter than
    left-anti: one NULL in the subquery empties the result; the
    subquery column here is non-null so the results coincide, but the
    PLAN is the null-aware variant, which is the point)."""
    load_tables(spark, sf_dir, names=("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey NOT IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_returnflag = 'R' AND l_quantity > 49
        )
        ORDER BY s_suppkey
        """
    )


@register(
    "lateral_top2_orders_per_customer",
    oracle="""
        SELECT c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o ON true
        ORDER BY c_custkey, o_orderkey
    """,
    tags=("subquery", "lateral", "sql-surface"),
)
def lateral_top2_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL:2016 / Spark >= 3.2): each
    customer's two priciest orders, expressed through the SQL-string
    surface (`spark.sql` over registered temp views — the reference's
    own query style, CollegeScorecard.scala:72). Catalyst decorrelates
    the per-customer ORDER BY ... LIMIT 2 into a partitioned window
    rank — same physical plan as the Window top-k, one shuffle on the
    correlation key, so the lateral form costs nothing extra at scale.
    Deterministic: (o_totalprice, o_orderkey) is a total order."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        ORDER BY c_custkey, o_orderkey
        """
    )
