"""Multi-dimensional grouping: rollup / cube / grouping sets, pivot,
distinct and approximate-distinct aggregates, percentiles
(SURVEY.md §2B tier 1).

Scale design: rollup/cube in Spark expand to a single Expand +
hash-aggregate — one shuffle regardless of how many grouping sets.
Pivot with an explicit value list avoids the extra distinct-values
job and keeps the plan static. approx_count_distinct (HyperLogLog++)
is the 100 TB path for distinct counts; the exact variant is kept for
oracle checkability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import load_tables, t


@register(
    "rollup_lineitem_flags",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_items,
               {sql_dsum('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    tags=("grouping", "rollup"),
)
def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (flag, flag+status, grand total)
    in one Expand+aggregate pass."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "cube_orders_status_priority",
    oracle=f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("grouping", "cube"),
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one pass."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "groupingsets_customer",
    oracle=f"""
        SELECT c_nationkey, c_mktsegment,
               count(*) AS n_customers,
               {sql_dsum('c_acctbal')} AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment))
        ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST
    """,
    tags=("grouping", "groupingsets"),
)
def groupingsets_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-nation and
    per-segment totals, no cross combinations. Expressed in SQL over a
    registered view — same Catalyst plan as the DataFrame form."""
    load_tables(spark, sf_dir, names=("customer",))
    return spark.sql(
        f"""
        SELECT c_nationkey, c_mktsegment,
               count(*) AS n_customers,
               {sql_dsum('c_acctbal')} AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_nationkey), (c_mktsegment))
        ORDER BY c_nationkey ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
        """
    )


@register(
    "pivot_revenue_by_linestatus",
    oracle=f"""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN l_linestatus = 'O'
                   THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
               CAST(sum(CASE WHEN l_linestatus = 'F'
                   THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("grouping", "pivot"),
)
def pivot_revenue_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (no extra distinct-scan job;
    plan stays static for any input size). Semantically = grouped
    conditional aggregation, which is exactly the oracle SQL."""
    li = t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    ).orderBy("l_returnflag")


@register(
    "distinct_supplier_part_counts",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_suppliers,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("grouping", "distinct"),
)
def distinct_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst plans a
    single Expand + two-stage aggregate — one shuffle)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_parts",
    oracle="""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               TRUE AS parts_within_3sigma,
               TRUE AS orders_within_3sigma
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("grouping", "approx"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.01): the 100 TB
    path for distinct counts — constant memory per group vs the exact
    variant's full de-dup shuffle.

    Driver-checkable surface for an approximate operator: the HLL++
    estimate itself is engine-specific (DuckDB can't reproduce it), so
    the output exposes the EXACT distinct counts plus a
    ``within_3sigma`` boolean per estimate (|approx − exact| ≤
    3·rsd·exact). The oracle pins the exact counts and expects the
    booleans TRUE — if the sketch ever drifts outside its published
    error envelope the row hash goes red. (The raw estimates stay out
    of the hashed output by design; the tiny-scale agg also exercises
    the double-countDistinct Expand, acceptable at 3 groups.)"""
    li = t(spark, sf_dir, "lineitem")
    sigma3 = 3 * 0.01
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= sigma3 * F.col("exact_parts")
            ).alias("parts_within_3sigma"),
            (
                F.abs(F.col("approx_orders") - F.col("exact_orders"))
                <= sigma3 * F.col("exact_orders")
            ).alias("orders_within_3sigma"),
        )
        .orderBy("l_returnflag")
    )


def _exact_pct_cents(
    li: DataFrame, grp: str, money_col: str, p100s: list[int], names: list[str]
) -> DataFrame:
    """Exact percentile_cont over a 2dp money column with NO float
    interpolation: values become integer cents, h = (n-1)·p has
    weight rem/100 for integer rem = ((n-1)·p100) mod 100, and the
    interpolated value is the exact BIGINT
    lo·(100−rem) + hi·rem, divided by 10000.0 only at the very end —
    one correctly-rounded IEEE division of exact integers, identical
    in any engine. This kills the round(quantile_cont(money)) hazard
    class the `test_no_rounded_interpolated_percentile` lint guards
    (a .xx5 half-boundary in the float interpolation rounds HALF_UP
    in Spark but to-even in DuckDB — the class that genuinely hit
    quantile_mapping_price_drift in round 7).

    Plan: one window shuffle on the group key (rank + group count
    share it), then conditional aggregation picks the two order
    statistics per percentile — no holistic percentile aggregate, so
    the same shape range-partitions at any group cardinality."""
    cents = li.select(
        grp,
        F.round(F.col(money_col) * 100).cast("bigint").alias("cents"),
    )
    wo = W.partitionBy(grp).orderBy("cents")
    wn = W.partitionBy(grp)
    ranked = cents.select(
        grp,
        "cents",
        F.row_number().over(wo).alias("rk"),
        F.count("*").over(wn).alias("n"),
    )
    lo_pos = {
        p: F.floor((F.col("n") - 1) * p / 100) + 1 for p in p100s
    }
    aggs = [F.max("n").alias("n")]
    for p in p100s:
        aggs.append(
            F.max(F.when(F.col("rk") == lo_pos[p], F.col("cents"))).alias(
                f"_lo{p}"
            )
        )
        aggs.append(
            F.max(
                F.when(F.col("rk") == lo_pos[p] + 1, F.col("cents"))
            ).alias(f"_hi{p}")
        )
    picked = ranked.groupBy(grp).agg(*aggs)
    outs = []
    for p, name in zip(p100s, names):
        rem = ((F.col("n") - 1) * p) % 100
        exact = F.col(f"_lo{p}") * (100 - rem) + F.coalesce(
            F.col(f"_hi{p}"), F.col(f"_lo{p}")
        ) * rem
        outs.append((exact.cast("double") / F.lit(10000.0)).alias(name))
    return picked.select(grp, *outs)


def _sql_exact_pct(
    table: str, grp: str, money_col: str, p100s: list[int], names: list[str]
) -> str:
    """DuckDB spelling of `_exact_pct_cents` — identical integer
    arithmetic, one final exact-integer / 10000.0 division."""
    pick_cols = ",\n".join(
        f"""           max(CASE WHEN rk = ((n - 1) * {p}) // 100 + 1
                         THEN cents END) AS _lo{p},
           max(CASE WHEN rk = ((n - 1) * {p}) // 100 + 2
                         THEN cents END) AS _hi{p}"""
        for p in p100s
    )
    val_cols = ",\n".join(
        f"""           CAST(_lo{p} * (100 - ((n - 1) * {p}) % 100)
                    + coalesce(_hi{p}, _lo{p}) * (((n - 1) * {p}) % 100)
                    AS DOUBLE) / 10000.0 AS {name}"""
        for p, name in zip(p100s, names)
    )
    return f"""
        WITH c AS (
            SELECT {grp},
                   CAST(round({money_col} * 100) AS BIGINT) AS cents
            FROM {table}
        ),
        r AS (
            SELECT {grp}, cents,
                   row_number() OVER (PARTITION BY {grp} ORDER BY cents)
                       AS rk,
                   count(*) OVER (PARTITION BY {grp}) AS n
            FROM c
        ),
        a AS (
            SELECT {grp}, max(n) AS n,
{pick_cols}
            FROM r GROUP BY {grp}
        )
        SELECT {grp},
{val_cols}
        FROM a
    """


@register(
    "percentiles_extendedprice",
    oracle=_sql_exact_pct(
        "lineitem",
        "l_returnflag",
        "l_extendedprice",
        [25, 50, 75, 95],
        ["p25", "p50", "p75", "p95"],
    )
    + "ORDER BY l_returnflag",
    tags=("grouping", "percentile"),
)
def percentiles_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SQL percentile_cont semantics)
    computed in exact integer cents — see `_exact_pct_cents` for why
    (cross-engine .xx5 half-boundary class). Exact percentile needs
    the values per group — fine for bounded group counts; the
    streaming/100 TB alternative is `approx_percentile` (KLL-ish
    sketch), audited in `approx_percentile_audit`."""
    return _exact_pct_cents(
        t(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_extendedprice",
        [25, 50, 75, 95],
        ["p25", "p50", "p75", "p95"],
    ).orderBy("l_returnflag")


@register(
    "listagg_top_suppliers_per_nation",
    oracle="""
        WITH ranked AS (
            SELECT n_name, s_name, s_acctbal,
                   row_number() OVER (
                       PARTITION BY n_name
                       ORDER BY s_acctbal DESC, s_name
                   ) AS rk
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
        )
        SELECT n_name,
               string_agg(s_name, ',' ORDER BY rk) AS top_suppliers,
               count(*) AS n_listed
        FROM ranked
        WHERE rk <= 3
        GROUP BY n_name
        ORDER BY n_name
    """,
    tags=("aggregate", "listagg", "string-agg"),
)
def listagg_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2023 LISTAGG ... WITHIN GROUP,
    new in Spark 4): the 3 richest suppliers per nation, concatenated
    in rank order. Every ordering carries a name tie-break, so the
    concatenated string is a total-order artifact both engines build
    identically — the determinism trap with LISTAGG is an unordered
    WITHIN GROUP, which would hash-flake on any cluster.

    Scale posture: rank-then-filter bounds each group to 3 rows BEFORE
    the string aggregate, so no group's string grows with data volume;
    nation is broadcast onto supplier."""
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("n_name").orderBy(F.col("s_acctbal").desc(), "s_name")
    )
    ranked = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("n_name", "s_name", "s_acctbal")
        .withColumn("rk", rk)
        .filter(F.col("rk") <= 3)
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.expr("listagg(s_name, ',') WITHIN GROUP (ORDER BY rk)").alias(
                "top_suppliers"
            ),
            F.count("*").alias("n_listed"),
        )
        .orderBy("n_name")
    )


@register(
    "approx_percentile_audit",
    oracle="SELECT l_returnflag, p50_exact, p90_exact,"
    " TRUE AS p50_within_half_pct, TRUE AS p90_within_half_pct FROM ("
    + _sql_exact_pct(
        "lineitem",
        "l_returnflag",
        "l_extendedprice",
        [50, 90],
        ["p50_exact", "p90_exact"],
    )
    + ") ORDER BY l_returnflag",
    tags=("grouping", "percentile", "approx", "audit"),
)
def approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact quantile audit: `approx_percentile` (the
    KLL-ish mergeable sketch that is the ONLY way to do quantiles in
    one pass at 100 TB or in streaming state) must land within 0.5 %
    of the exact interpolated percentile. The query emits the exact
    values plus the tolerance verdicts, so the driver hash checks
    both the ground truth and the sketch's contract — if the sketch
    drifts out of tolerance the booleans flip and the hash goes red.
    accuracy=10000 bounds rank error at 1/10000 of the group, far
    inside the 0.5 % value tolerance on these distributions.

    Scale: exact percentile materializes per-group value sets
    (bounded groups only); the sketch is map-side mergeable with
    fixed memory — that asymmetry is the audit's point. Exact values
    come from `_exact_pct_cents` (integer-cents interpolation — the
    rounded-float-percentile hazard class is linted out)."""
    li = t(spark, sf_dir, "lineitem")
    exact = _exact_pct_cents(
        li, "l_returnflag", "l_extendedprice", [50, 90], ["p50_exact", "p90_exact"]
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            "approx_percentile(l_extendedprice, 0.50, 10000)"
        ).alias("a50"),
        F.expr(
            "approx_percentile(l_extendedprice, 0.90, 10000)"
        ).alias("a90"),
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "p50_exact",
            "p90_exact",
            (
                F.abs(F.col("a50") - F.col("p50_exact"))
                <= 0.005 * F.col("p50_exact")
            ).alias("p50_within_half_pct"),
            (
                F.abs(F.col("a90") - F.col("p90_exact"))
                <= 0.005 * F.col("p90_exact")
            ).alias("p90_within_half_pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "histogram_equidepth_prices",
    oracle="""
        WITH bounds AS (
            SELECT quantile_cont(l_extendedprice, 0.125) AS b1,
                   quantile_cont(l_extendedprice, 0.250) AS b2,
                   quantile_cont(l_extendedprice, 0.375) AS b3,
                   quantile_cont(l_extendedprice, 0.500) AS b4,
                   quantile_cont(l_extendedprice, 0.625) AS b5,
                   quantile_cont(l_extendedprice, 0.750) AS b6,
                   quantile_cont(l_extendedprice, 0.875) AS b7
            FROM lineitem
        ),
        assigned AS (
            SELECT l_extendedprice AS p,
                   1 + CAST(l_extendedprice > b1 AS INT)
                     + CAST(l_extendedprice > b2 AS INT)
                     + CAST(l_extendedprice > b3 AS INT)
                     + CAST(l_extendedprice > b4 AS INT)
                     + CAST(l_extendedprice > b5 AS INT)
                     + CAST(l_extendedprice > b6 AS INT)
                     + CAST(l_extendedprice > b7 AS INT) AS bucket
            FROM lineitem CROSS JOIN bounds
        )
        SELECT bucket,
               count(*) AS n_rows,
               min(p) AS min_price,
               max(p) AS max_price,
               CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM assigned
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("histogram", "equi-depth", "statistics", "cbo"),
)
def histogram_equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram over lineitem prices — the
    statistic cost-based optimizers keep per column: 8 buckets whose
    BOUNDARIES are exact interpolated octile percentiles, so each
    holds ~1/8 of the rows regardless of value skew (where an
    equi-WIDTH histogram piles skewed data into one bar, cf.
    `histogram_order_prices`).

    Scale shape — deliberately NEITHER ntile() (a global ntile is a
    single-partition window sort) NOR Spark's exact `percentile`
    aggregate (holistic: every task ships its full value buffer to
    one final reducer — measured 3.5 s at sf0.1 and unbounded memory
    at 100 TB). The boundaries are DISTRIBUTED ORDER STATISTICS: one
    range-partitioned sort of the bare column, per-partition row
    counts (32 scalars to the driver), and a lookup of the 14 rows
    straddling the seven target ranks — every stage parallel, driver
    traffic O(partitions). The interpolated boundaries then broadcast
    into 7 codegen'd comparisons feeding a map-side-combinable
    8-group aggregate. Boundary IEEE arithmetic matches DuckDB's
    `quantile_cont` (lo + (hi-lo)*frac over the same exact ranks)."""
    from spark_hive_spark.functions.stats import distributed_quantiles

    li = t(spark, sf_dir, "lineitem")
    vals = li.select("l_extendedprice")
    bnds = distributed_quantiles(
        li, "l_extendedprice", [k / 8.0 for k in range(1, 8)]
    )

    bucket = F.lit(1)
    for b in bnds:
        bucket = bucket + (F.col("l_extendedprice") > F.lit(b)).cast("int")
    assigned = vals.select("l_extendedprice", bucket.alias("bucket"))
    return (
        assigned.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("bucket")
    )


_HIER_ORACLE = """
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY region, nation
    ),
    lv AS (
        SELECT region, nation, rev,
               sum(rev) OVER (PARTITION BY region) AS region_rev,
               sum(rev) OVER () AS total_rev
        FROM rev
    )
    SELECT region, nation,
           CAST(rev AS DOUBLE) AS nation_revenue,
           round(CAST(rev AS DOUBLE) / CAST(region_rev AS DOUBLE), 6)
               AS pct_of_region,
           round(CAST(region_rev AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
               AS region_pct_of_total
    FROM lv
    ORDER BY region, nation
"""


@register(
    "hierarchy_percent_of_parent",
    oracle=_HIER_ORACLE,
    tags=("grouping", "hierarchy", "percent-of-parent"),
)
def hierarchy_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT-OF-PARENT over the region → nation hierarchy — the
    drill-down ratio every OLAP frontend computes: each nation's
    share of its region AND each region's share of the total, in one
    pass via two stacked window partitions over the contracted
    (region, nation) aggregate. Revenue stays exact decimal until
    the two ratio divisions (identical expressions both engines).

    Scale: the fact tables contract to 25 rows before any window;
    dimensions broadcast."""
    from pyspark.sql import Window as W

    rev = (
        t(spark, sf_dir, "orders")
        .join(
            t(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    lv = rev.withColumn(
        "region_rev", F.sum("rev").over(W.partitionBy("region"))
    ).withColumn("total_rev", F.sum("rev").over(W.partitionBy()))
    return (
        lv.select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("nation_revenue"),
            F.round(
                F.col("rev").cast("double")
                / F.col("region_rev").cast("double"),
                6,
            ).alias("pct_of_region"),
            F.round(
                F.col("region_rev").cast("double")
                / F.col("total_rev").cast("double"),
                6,
            ).alias("region_pct_of_total"),
        )
        .orderBy("region", "nation")
    )
