"""Decision-support breadth, batch 2: multi-nation join graphs,
profit expressions, disjunctive predicate pushdown, combined
scalar-subquery + anti-join shapes (TPC-H Q7/Q9/Q10/Q12/Q19/Q22
analogs on the fixture schema), bag-semantics set ops, window value
functions, and grouping flags.

Same scale rules as operators/relational.py: dims broadcast, facts
shuffle once on their join key, money in exact decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import (
    SQL_REVENUE_DEC,
    dec,
    dsum,
    revenue_dec,
    sql_dsum,
)
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "q7_nation_trade_volume",
    oracle=f"""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               year(l_shipdate) AS ship_year,
               CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
            OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
        ORDER BY supp_nation, cust_nation, ship_year
    """,
    tags=("join", "aggregate"),
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two independent paths to `nation` (supplier's
    and customer's) with a symmetric pair filter, per-year rollup.
    Both nation copies broadcast; the disjunctive pair predicate
    evaluates post-join (it spans both sides)."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    sn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.sum(revenue_dec()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "q9_nation_year_profit",
    oracle="""
        SELECT n_name AS nation, year(o_orderdate) AS order_year,
               CAST(sum(
                   CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                   - CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2)) * CAST(0.10 AS DECIMAL(4,2))
               ) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, order_year
    """,
    tags=("join", "aggregate", "expression"),
)
def q9_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit = revenue − 10% holding cost of retail
    price × quantity, by supplier nation and order year. The profit
    expression stays in exact decimal end-to-end (price 2dp × qty 2dp
    × rate 2dp → 6dp exact), so the sum is order-independent."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    profit = revenue_dec() - (
        dec("p_retailprice") * dec("l_quantity") * F.lit(0.10).cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "order_year")
    )


@register(
    "q10_returned_item_losses",
    oracle=f"""
        SELECT c_custkey, c_name, n_name,
               CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS lost_revenue,
               count(*) AS n_returned_lines
        FROM customer
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "aggregate", "topk"),
)
def q10_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer, top 20.
    Decimal-exact revenue makes the DESC ordering + LIMIT stable."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(revenue_dec()).cast("double").alias("lost_revenue"),
            F.count("*").alias("n_returned_lines"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_by_ship_year",
    oracle="""
        SELECT year(l_shipdate) AS ship_year,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY year(l_shipdate)
        ORDER BY ship_year
    """,
    tags=("join", "conditional", "aggregate"),
)
def q12_priority_by_ship_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority class counts — the fixture has no
    l_shipmode, so order priority plays its role): conditional
    integer aggregation across a fact-fact join."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
        .orderBy("ship_year")
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 30)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 40)
           OR (p_type = 'PROMO' AND l_discount >= 0.05)
    """,
    tags=("join", "disjunction"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three-arm disjunctive predicate spanning both
    join sides. Catalyst extracts the common l/p conjuncts it can push
    (brand/size/type reach the part scan) and evaluates the residual
    disjunction post-join."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    arm3 = (F.col("p_type") == "PROMO") & (F.col("l_discount") >= 0.05)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.sum(revenue_dec()).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_bal
        FROM customer, avg_bal
        WHERE c_acctbal > 1.2 * avg_bal.a
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    tags=("subquery", "anti", "aggregate"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold (positive-balance
    average) + NOT EXISTS anti join + aggregate. The 1.2× margin keeps
    the float threshold off any data point (see
    subq_scalar_above_avg_orders note)."""
    from spark_hive_spark.tables import load_tables

    load_tables(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_bal
        FROM customer
        WHERE c_acctbal > 1.2 * (
                SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
              )
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )


@register(
    "setops_bag_semantics",
    oracle="""
        WITH a AS (
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ),
        b AS (
            SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
        )
        SELECT c_nationkey, count(*) AS n
        FROM (
            SELECT c_nationkey FROM a
            UNION ALL
            SELECT c_nationkey FROM b
            EXCEPT ALL
            SELECT c_nationkey FROM a INTERSECT ALL SELECT c_nationkey FROM b
        )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    tags=("setop", "bag"),
)
def setops_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG-semantics set ops (unionAll / exceptAll / intersectAll) —
    multiplicity-preserving, unlike the reference's distinct except
    idiom: symmetric difference with counts."""
    cust = t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_nationkey")
    sym = a.unionAll(b).exceptAll(a.intersectAll(b))
    return (
        sym.groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("c_nationkey")
    )


@register(
    "w_value_functions",
    oracle="""
        SELECT c_nationkey, c_custkey, c_acctbal,
               first_value(c_custkey) OVER w AS richest_cust,
               last_value(c_custkey) OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS poorest_cust,
               nth_value(c_custkey, 2) OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_richest,
               round(cume_dist() OVER w, 6) AS bal_cume_dist
        FROM customer
        WHERE c_nationkey < 5
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        ORDER BY c_nationkey, c_acctbal DESC, c_custkey
    """,
    tags=("window", "value-functions"),
)
def w_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value (full-partition frames —
    last_value over the default frame is the famous footgun; the
    explicit UNBOUNDED FOLLOWING frame is the correct spelling) +
    cume_dist."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 5)
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    w_running = W.partitionBy("c_nationkey").orderBy(*order)
    w_full = w_running.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        cust.select(
            "c_nationkey", "c_custkey", "c_acctbal",
            F.first("c_custkey").over(w_full).alias("richest_cust"),
            F.last("c_custkey").over(w_full).alias("poorest_cust"),
            F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
            F.round(F.cume_dist().over(w_running), 6).alias("bal_cume_dist"),
        )
        .orderBy("c_nationkey", F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "rollup_grouping_flags",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               count(*) AS n_items,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
                 l_linestatus NULLS FIRST
    """,
    tags=("grouping", "rollup"),
)
def rollup_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicator columns — distinguishes "the
    NULL group" from "the subtotal row", which raw rollup output
    cannot."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.count("*").alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status",
            "n_items", "sum_qty",
        )
        .orderBy(
            "g_flag", "g_status",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q15_top_revenue_suppliers",
    oracle=f"""
        WITH supplier_revenue AS (
            SELECT l_suppkey,
                   CAST(sum({SQL_REVENUE_DEC}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '2000-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN supplier_revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM supplier_revenue)
        ORDER BY s_suppkey
    """,
    tags=("subquery", "view", "aggregate"),
)
def q15_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: CTE aggregate reused twice (revenue per
    supplier; its max as a scalar subquery threshold). Decimal-exact
    revenue means the max-equality predicate can't split ties
    differently across engines; ties all surface, like Q15."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(revenue_dec()).cast("double").alias("total_revenue"))
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        supp.join(rev, supp.s_suppkey == rev.l_suppkey)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_below_avg_quantity_revenue",
    oracle="""
        WITH part_avg AS (
            -- decimal-exact avg: per-part line counts are SMALL, so
            -- integer-ish averages (exact boundary values) are common
            -- and a raw double avg could differ from Spark's by 1 ulp
            SELECT l_partkey AS pk,
                   0.5 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                          / count(l_quantity)) AS half_avg
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
               count(*) AS n_small_lines
        FROM lineitem JOIN part_avg ON l_partkey = pk
        WHERE l_quantity < half_avg
    """,
    tags=("subquery", "correlated", "aggregate"),
)
def q17_below_avg_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated per-group average): lines whose
    quantity is below half their part's average. Decorrelated as
    aggregate-then-rejoin — ONE extra aggregate + an equi-join instead
    of a per-row subquery. (Float note: the 0.5*avg threshold is a
    double in both engines computed from the same per-part value set
    with the same single division — partial-sum order could differ at
    1e-16, but quantities sit far from any threshold in 2dp data.)"""
    li = t(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.5)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("half_avg")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_small_lines"),
        )
    )


@register(
    "cross_join_region_priority_matrix",
    oracle="""
        WITH cells AS (
            SELECT r_regionkey, r_name, o_orderpriority
            FROM region
            CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
        ),
        actual AS (
            SELECT n_regionkey AS rk, o_orderpriority, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_regionkey, o_orderpriority
        )
        SELECT r_name, cells.o_orderpriority AS priority,
               coalesce(n_orders, 0) AS n_orders
        FROM cells
        LEFT JOIN actual
          ON rk = r_regionkey AND actual.o_orderpriority = cells.o_orderpriority
        ORDER BY r_name, priority
    """,
    tags=("join", "cross"),
)
def cross_join_region_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTENTIONAL cross join — the one place it's right: a dense
    dims×dims cell matrix (5 regions × 5 priorities) as the spine for
    a zero-filled report. Both sides are bounded dimensions; the fact
    table is pre-aggregated before touching the spine."""
    region = t(spark, sf_dir, "region")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    priorities = orders.select("o_orderpriority").distinct()
    cells = region.crossJoin(priorities)
    actual = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_regionkey").alias("rk"), F.col("o_orderpriority").alias("ap"))
        .agg(F.count("*").alias("n_orders_raw"))
    )
    return (
        cells.join(
            actual,
            (F.col("rk") == F.col("r_regionkey")) & (F.col("ap") == F.col("o_orderpriority")),
            "left",
        )
        .select(
            "r_name",
            F.col("o_orderpriority").alias("priority"),
            F.coalesce("n_orders_raw", F.lit(0).cast("long")).alias("n_orders"),
        )
        .orderBy("r_name", "priority")
    )


@register(
    "recursive_consecutive_activity",
    oracle="""
        WITH RECURSIVE streak AS (
            SELECT DISTINCT o_custkey AS c, 1995 AS y
            FROM orders WHERE year(o_orderdate) = 1995
            UNION ALL
            SELECT DISTINCT o.o_custkey, s.y + 1
            FROM streak s
            JOIN orders o
              ON o.o_custkey = s.c AND year(o.o_orderdate) = s.y + 1
            WHERE s.y < 2001
        )
        SELECT y AS active_year, count(*) AS n_customers
        FROM streak
        GROUP BY y
        ORDER BY y
    """,
    tags=("recursive", "cohort"),
)
def recursive_consecutive_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark >= 4.0): customers active in EVERY
    consecutive year since 1995 — an iterative cohort that a single
    window can't express (each wave depends on the previous wave's
    membership). Integer-only recursion → engine-exact. Each
    iteration is one equi-join + distinct; depth is bounded by the
    data's year span, not its size."""
    from spark_hive_spark.tables import load_tables

    load_tables(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        WITH RECURSIVE streak AS (
            SELECT DISTINCT o_custkey AS c, 1995 AS y
            FROM orders WHERE year(o_orderdate) = 1995
            UNION ALL
            SELECT DISTINCT o.o_custkey, s.y + 1
            FROM streak s
            JOIN orders o
              ON o.o_custkey = s.c AND year(o.o_orderdate) = s.y + 1
            WHERE s.y < 2001
        )
        SELECT y AS active_year, count(*) AS n_customers
        FROM streak
        GROUP BY y
        ORDER BY y
        """
    )
