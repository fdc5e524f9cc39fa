"""Financial-exactness operators: largest-remainder cent allocation
and Lorenz/Gini concentration — the revenue-accounting queries where
"about right" is wrong and the engine must prove cent-exact integer
arithmetic end-to-end (extends the decimal policy of
functions/numeric.py; reference scope: orders/lineitem fixtures).

Scale posture:

- Proration: all arithmetic is BIGINT cents — quotient and remainder
  via integer `DIV`/`%`, never a double division — so the allocation
  is exact and engine-independent by construction. Every window
  partitions by l_orderkey: one shuffle of lineitem on its natural
  join key, reused by all four window computations (Catalyst collapses
  same-partitioning windows into one Window node over one Exchange).
  The order-level residual rank is within-order (bounded 1-7 rows per
  TPC-H order), never global.

- Gini/Lorenz: the only global structure is a rank over customers —
  customer-cardinality, not fact-cardinality (orders collapse first
  via a map-side-combinable decimal sum). The single-partition rank
  window is the honest fixture-scale plan; at 100 TB you'd two-phase
  it (range-partition by revenue, broadcast per-partition row-count
  offsets — the same rewrite operators/analytics.py's
  running_distinct_users documents). Weighted sums rank*r stay in
  exact decimal, so Gini is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dec
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

def allocation_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-line largest-remainder allocation pipeline (shared with
    the plan gate, which asserts all four order-partitioned windows
    collapse onto ONE Exchange of lineitem)."""
    lic = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("w_c"),
    )
    oc = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("total_c"),
    )
    ow = W.partitionBy("l_orderkey")
    return (
        lic.join(oc, lic.l_orderkey == oc.o_orderkey)
        .withColumn("wsum", F.sum("w_c").over(ow))
        .withColumn("q", F.expr("(total_c * w_c) DIV wsum"))
        .withColumn("rem", F.expr("(total_c * w_c) % wsum"))
        .withColumn(
            "rk",
            F.row_number().over(ow.orderBy(F.desc("rem"), "l_linenumber")),
        )
        .withColumn("qsum", F.sum("q").over(ow))
        .withColumn(
            "alloc_c",
            F.col("q")
            + F.when(
                F.col("rk") <= F.col("total_c") - F.col("qsum"), 1
            ).otherwise(0),
        )
    )


_PRORATION_ORACLE = """
    WITH lic AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS w_c
        FROM lineitem
    ),
    oc AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_c
        FROM orders
    ),
    j AS (SELECT * FROM lic JOIN oc ON l_orderkey = o_orderkey),
    a AS (
        SELECT *, sum(w_c) OVER (PARTITION BY l_orderkey) AS wsum FROM j
    ),
    b AS (
        SELECT *,
               (total_c * w_c) // wsum AS q,
               (total_c * w_c) % wsum AS rem
        FROM a
    ),
    c AS (
        SELECT *,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY rem DESC, l_linenumber) AS rk,
               sum(q) OVER (PARTITION BY l_orderkey) AS qsum
        FROM b
    ),
    d AS (
        SELECT *,
               q + CASE WHEN rk <= total_c - qsum THEN 1 ELSE 0 END AS alloc_c
        FROM c
    ),
    mism AS (
        SELECT l_orderkey
        FROM d
        GROUP BY l_orderkey, total_c
        HAVING sum(alloc_c) <> total_c
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(alloc_c) AS BIGINT) AS alloc_cents,
           (SELECT CAST(count(*) AS BIGINT) FROM mism) AS n_mismatched_orders
    FROM d
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@register(
    "proration_largest_remainder",
    oracle=_PRORATION_ORACLE,
    tags=("finance", "allocation", "decimal-exact"),
)
def proration_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CENT-EXACT REVENUE ALLOCATION — distribute each order's
    o_totalprice across its lineitems proportionally to
    l_extendedprice using the largest-remainder (Hamilton) method:
    floor every share to whole cents via integer division, then hand
    the leftover R = total − Σfloor cents to the R lines with the
    largest integer remainders (tie-break: l_linenumber). By
    construction every order's allocations sum EXACTLY to its total —
    the query proves it by reporting the global count of mismatched
    orders (always 0) next to the per-returnflag allocation totals.

    All arithmetic is BIGINT cents (total_c * w_c ≲ 5e14, well inside
    int64); quotient/remainder use integer DIV / %, so no double ever
    touches the money path and both engines agree bit-for-bit."""
    d = allocation_chain(spark, sf_dir)
    # contract the allocation ONCE to (order, returnflag) granularity:
    # both the mismatch audit and the per-flag totals derive from this
    # — without it the whole join+window chain re-executes per
    # consumer (measured 4 logical fact scans).
    per_of = (
        d.groupBy("l_orderkey", "l_returnflag", "total_c")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("alloc_c").alias("alloc_c"),
        )
        .localCheckpoint(eager=True)
    )
    mism = (
        per_of.groupBy("l_orderkey", "total_c")
        .agg(F.sum("alloc_c").alias("alloc_sum"))
        .filter(F.col("alloc_sum") != F.col("total_c"))
        .agg(F.count("*").cast("bigint").alias("n_mismatched_orders"))
    )
    return (
        per_of.groupBy("l_returnflag")
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.count_distinct("l_orderkey").cast("bigint").alias("n_orders"),
            F.sum("alloc_c").cast("bigint").alias("alloc_cents"),
        )
        .crossJoin(F.broadcast(mism))
        .select(
            "l_returnflag",
            "n_rows",
            "n_orders",
            "alloc_cents",
            "n_mismatched_orders",
        )
        .orderBy("l_returnflag")
    )


GINI_DECILES = 10

_GINI_ORACLE = f"""
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, r,
               row_number() OVER (ORDER BY r, o_custkey) AS rk,
               ntile({GINI_DECILES}) OVER (ORDER BY r, o_custkey) AS decile
        FROM rev
    ),
    tot AS (
        SELECT count(*) AS n, sum(r) AS s, sum(rk * r) AS t FROM ranked
    ),
    dc AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               sum(r) AS decile_rev
        FROM ranked GROUP BY decile
    )
    SELECT decile,
           n_customers,
           CAST(decile_rev AS DOUBLE) AS decile_revenue,
           round(CAST(sum(decile_rev) OVER (ORDER BY decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(s AS DOUBLE), 6) AS cum_share,
           round(2.0 * CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM dc, tot
    ORDER BY decile
"""


@register(
    "gini_customer_revenue",
    oracle=_GINI_ORACLE,
    tags=("finance", "concentration", "lorenz"),
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE CONCENTRATION — the Lorenz curve at deciles plus the
    Gini coefficient over per-customer order revenue, the standard
    whale-dependence metric. Gini uses the rank identity
    G = 2·Σ(rank·r) / (n·Σr) − (n+1)/n over revenue ranked ascending
    (tie-break custkey; permuting equal revenues leaves Σ(rank·r)
    unchanged, so the tie-break affects nothing but determinism of
    the decile boundaries).

    rank·r products and all sums stay in exact decimal; the only
    double operations are the two final divisions, written in the
    same shape in both engines."""
    rev = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("r"))
    )
    order = W.orderBy("r", "o_custkey")
    ranked = (
        rev.withColumn("rk", F.row_number().over(order))
        .withColumn("decile", F.ntile(GINI_DECILES).over(order))
        .localCheckpoint(eager=True)  # customer-cardinality contraction;
        # feeds the totals AND the decile aggregate — without it orders
        # re-aggregates per consumer
    )
    tot = ranked.agg(
        F.count("*").alias("n"),
        F.sum("r").alias("s"),
        F.sum(F.col("rk") * F.col("r")).alias("t"),
    )
    dc = ranked.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("r").alias("decile_rev"),
    )
    cum = F.sum("decile_rev").over(
        W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        dc.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            F.col("decile_rev").cast("double").alias("decile_revenue"),
            F.round(
                cum.cast("double") / F.col("s").cast("double"), 6
            ).alias("cum_share"),
            F.round(
                F.lit(2.0)
                * F.col("t").cast("double")
                / (F.col("n").cast("double") * F.col("s").cast("double"))
                - (F.col("n").cast("double") + F.lit(1.0))
                / F.col("n").cast("double"),
                6,
            ).alias("gini"),
        )
        .orderBy("decile")
    )


_WHALE_ORACLE = """
    WITH rev AS (
        SELECT o_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT r, row_number() OVER (ORDER BY r DESC, o_custkey) AS rk,
               count(*) OVER () AS n, sum(r) OVER () AS s
        FROM rev
    ),
    cut AS (SELECT CAST(ceil(n / 100.0) AS BIGINT) AS k, n, s
            FROM ranked LIMIT 1)
    SELECT CAST(c.n AS BIGINT) AS n_customers,
           c.k AS n_top1pct,
           round(CAST(sum(t.r) AS DOUBLE) / CAST(c.s AS DOUBLE), 6)
               AS top1pct_share,
           round(CAST(sum(t.r) AS DOUBLE) / c.k, 2)
               AS avg_top_revenue
    FROM ranked t, cut c
    WHERE t.rk <= c.k
    GROUP BY c.n, c.k, c.s
"""


@register(
    "whale_concentration_top1pct",
    oracle=_WHALE_ORACLE,
    tags=("finance", "concentration", "whales"),
)
def whale_concentration_top1pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHALE CONCENTRATION — the top-1% customers' share of total
    revenue (the single number behind every "whale dependence" slide,
    the pointwise companion to the Lorenz/Gini curve): rank customers
    by exact-decimal revenue (custkey tie-break), take the first
    ⌈n/100⌉, divide their decimal sum by the decimal total. Two
    double divisions at the end, identical in both engines.

    Scale: orders contract to customer grain map-side; the global
    rank is the documented two-phase range-partition rewrite at
    100 TB."""
    from pyspark.sql import Window as W

    rev = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("r"))
    )
    ranked = rev.select(
        "r",
        F.row_number().over(W.orderBy(F.desc("r"), "o_custkey")).alias("rk"),
        F.count("*").over(W.partitionBy()).alias("n"),
        F.sum("r").over(W.partitionBy()).alias("s"),
    ).localCheckpoint(eager=True)  # customer grain; cut + output
    cut = ranked.limit(1).select(
        F.ceil(F.col("n") / 100.0).cast("bigint").alias("k"),
        F.col("n").alias("n_all"),
        F.col("s").alias("s_all"),
    )
    return (
        ranked.drop("n", "s")
        .crossJoin(F.broadcast(cut))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("n_all", "k", "s_all")
        .agg(
            F.sum("r").alias("top_r"),
        )
        .select(
            F.col("n_all").cast("bigint").alias("n_customers"),
            F.col("k").alias("n_top1pct"),
            F.round(
                F.col("top_r").cast("double") / F.col("s_all").cast("double"),
                6,
            ).alias("top1pct_share"),
            F.round(F.col("top_r").cast("double") / F.col("k"), 2).alias(
                "avg_top_revenue"
            ),
        )
    )
