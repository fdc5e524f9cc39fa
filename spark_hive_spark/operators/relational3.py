"""Decision-support breadth, batch 3 — the remaining TPC-H shapes
(Q4/Q8/Q11/Q16/Q20/Q21 analogs on the fixture schema). These close out
the 22-query TPC-H family together with operators/relational.py and
operators/relational2.py.

The fixture lacks `partsupp` and commit/receipt dates, so:
- "late" is modelled as ``l_shipdate > o_orderdate + 60 days``;
- supplier-part relationships come from DISTINCT (l_partkey, l_suppkey)
  pairs in `lineitem` (same join graph role as partsupp).

Scale posture (100 TB): every query shuffles the fact table at most
once on its natural key; dims (`part`, `supplier`, `nation`, `region`)
broadcast; correlated EXISTS / NOT-EXISTS shapes are decorrelated into
a single groupBy over the already-shuffled key instead of self-joins
(see q21). Money in exact decimal per functions/numeric.py.

Reference parity: the reference itself has no joins (SURVEY.md §2A
"Not present"); these are §2B extension operators required by the
north star in BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import SQL_REVENUE_DEC, dec, revenue_dec
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "q4_order_priority_checking",
    oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
                SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("subquery", "semi-join", "aggregate"),
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter having at least one late
    line, counted per priority. The EXISTS becomes a LEFT SEMI join
    whose equi part (`l_orderkey = o_orderkey`) drives the shuffle and
    whose residual (`l_shipdate > o_orderdate + 60 days`) evaluates
    in-join — no second pass, no distinct needed (semi join dedups).
    At scale the date filter prunes `orders` before the shuffle."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_nation_market_share",
    oracle=f"""
        SELECT year(o_orderdate) AS o_year,
               round(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                                   THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                     / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT o_orderdate, n2.n_name AS supp_nation,
                   {SQL_REVENUE_DEC} AS rev
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        ) all_nations
        GROUP BY year(o_orderdate)
        ORDER BY o_year
    """,
    tags=("join", "aggregate", "conditional"),
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of the ECONOMY-part
    revenue sold to ASIA customers, the fraction supplied by NATION_1,
    per order year. Two independent paths to `nation` (supplier's vs
    customer's). Join-tree order matters here: resolving the customer
    side FIRST (customers filtered to ASIA, then orders filtered by
    those customers) and joining the fact LAST means `lineitem`
    shuffles exactly once, on l_orderkey — the naive left-deep order
    (fact ⋈ orders ⋈ customer) re-shuffles the fat fact-sized
    intermediate a second time on o_custkey (measured 2.3× slower at
    sf0.1). At cluster scale the customer probe outgrows broadcast and
    becomes a shuffle join on its own key, but the fact still moves
    once. Share = ratio of two exact decimal sums (one double
    division, round 6 per the determinism policy)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    asia_cust = (
        cust.join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    asia_orders = orders.join(
        F.broadcast(asia_cust), orders.o_custkey == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    zero = F.lit(0).cast("decimal(18,4)")
    rev = revenue_dec()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .join(asia_orders, li.l_orderkey == F.col("o_orderkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("supp_nation"),
            rev.alias("rev"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("rev")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("rev").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q11_important_part_values",
    oracle="""
        WITH nation1_lines AS (
            SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS px
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_1'
        ),
        total AS (SELECT sum(px) AS tot FROM nation1_lines)
        SELECT l_partkey AS p_key, CAST(sum(px) AS DOUBLE) AS part_value
        FROM nation1_lines, total
        GROUP BY l_partkey, tot
        HAVING sum(px) > tot * CAST(0.001 AS DECIMAL(6,3))
        ORDER BY part_value DESC, p_key
    """,
    tags=("subquery", "scalar-subquery", "aggregate"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part traded value from
    NATION_1 suppliers, keeping parts above 0.1% of the national total.
    The scalar subquery decorrelates to ONE extra reduce over the same
    filtered lines plus a broadcast of the 1-row total — the fact
    scans once, shuffles once on l_partkey. The HAVING compares exact
    decimals (sum and decimal-scaled total), so boundary parts land
    identically in both engines; the doubles are derived afterwards."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    lines = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("l_partkey"), dec("l_extendedprice").alias("px"))
    )
    per_part = lines.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum("px").alias("value_dec")
    )
    total = lines.agg(F.sum("px").alias("tot"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") > F.col("tot") * F.lit("0.001").cast("decimal(6,3)"))
        .select("p_key", F.col("value_dec").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "p_key")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type <> 'ECONOMY'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("subquery", "anti-join", "distinct", "aggregate"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can supply each
    surviving (brand, type, size) bucket, excluding flagged suppliers.
    DISTINCT (l_partkey, l_suppkey) stands in for partsupp — that
    dedup and the count-distinct reuse the SAME shuffle key family;
    the NOT IN is a broadcast anti-join (s_suppkey is never null in
    the fixture, so NOT IN == anti without the null-aware plan)."""
    pairs = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    flagged = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(flagged, pairs.l_suppkey == flagged.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_majority_share_suppliers",
    oracle="""
        WITH red_1998 AS (
            SELECT l_partkey, l_suppkey,
                   CAST(l_quantity AS DECIMAL(18,2)) AS qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'red%' AND year(l_shipdate) = 1998
        ),
        pair_qty AS (
            SELECT l_partkey, l_suppkey, sum(qty) AS pair_qty
            FROM red_1998 GROUP BY l_partkey, l_suppkey
        ),
        part_qty AS (
            SELECT l_partkey, sum(qty) AS part_total
            FROM red_1998 GROUP BY l_partkey
        )
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM pair_qty
            JOIN part_qty USING (l_partkey)
            WHERE pair_qty * 2 > part_total)
        ORDER BY s_suppkey
    """,
    tags=("subquery", "semi-join", "aggregate"),
)
def q20_majority_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN subqueries): suppliers who shipped
    more than half of some red part's 1998 volume. The correlated
    half-of-total threshold decorrelates into two aggregates over the
    same filtered scan, joined per part. ``pair*2 > total`` keeps the
    comparison in exact integer-scaled decimal — no 0.5 float. The
    final IN is a broadcast semi-join into `supplier` (tiny dim)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    red = (
        li.filter(F.year("l_shipdate") == 1998)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", "l_suppkey", dec("l_quantity").alias("qty"))
    )
    pair_qty = red.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("pair_qty")
    )
    part_qty = red.groupBy("l_partkey").agg(F.sum("qty").alias("part_total"))
    majority = (
        pair_qty.join(part_qty, "l_partkey")
        .filter(F.col("pair_qty") * F.lit(2) > F.col("part_total"))
        .select("l_suppkey")
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        supp.join(
            F.broadcast(majority), supp.s_suppkey == majority.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        WITH f_lines AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        per_order AS (
            SELECT l_orderkey,
                   count(DISTINCT l_suppkey) AS n_supp,
                   count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
            FROM f_lines GROUP BY l_orderkey
        )
        SELECT s_name, count(DISTINCT f.l_orderkey) AS numwait
        FROM f_lines f
        JOIN per_order po ON f.l_orderkey = po.l_orderkey
        JOIN supplier ON f.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE f.is_late AND po.n_supp > 1 AND po.n_late_supp = 1
          AND n_name = 'NATION_2'
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    tags=("subquery", "exists", "not-exists", "window-free-decorrelation"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (EXISTS + NOT EXISTS self-joins): NATION_2
    suppliers who were the SOLE late supplier on a multi-supplier
    finished order. Instead of two correlated self-joins on lineitem
    (three shuffles of the biggest table), decorrelate: one groupBy
    l_orderkey computes (distinct suppliers, distinct late suppliers)
    per order, then late lines join that 1-row-per-order summary on
    the same key — lineitem shuffles on l_orderkey exactly once and
    AQE reuses the exchange. Top-10 with (numwait, s_name) total order.

    Two-level aggregate instead of countDistinct: collapsing to one
    row per (order, supplier) first makes the per-order counts plain
    count/sum — a double countDistinct would plan an Expand that
    doubles the shuffle volume (measured ~3× slower at sf0.1) — and
    `numwait` becomes a plain count because sole-late
    (order, supplier) rows are already unique."""
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    f_lines = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    per_pair = f_lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late_supp"),
    )
    sole_late = (
        per_pair.filter(F.col("late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        sole_late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )
