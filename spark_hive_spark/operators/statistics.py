"""Statistical aggregates (SURVEY.md §2B completeness): variance /
covariance / correlation / regression aggregates — the profiling
toolkit over the star schema. All single-pass partial-aggregable
(constant state per group); irrational outputs round to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "stats_variance_family",
    oracle="""
        SELECT l_returnflag,
               round(var_samp(l_extendedprice), 4)  AS price_var_samp,
               round(var_pop(l_extendedprice), 4)   AS price_var_pop,
               round(stddev_samp(l_quantity), 6)    AS qty_std_samp,
               round(stddev_pop(l_quantity), 6)     AS qty_std_pop
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("statistics", "aggregate"),
)
def stats_variance_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """var_samp/var_pop/stddev_samp/stddev_pop per group. (Variance of
    prices is O(1e8)-scaled, so round-4 leaves ~1e-12 relative slack
    for the engines' different single-pass update orders.)"""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.var_samp("l_extendedprice"), 4).alias("price_var_samp"),
            F.round(F.var_pop("l_extendedprice"), 4).alias("price_var_pop"),
            F.round(F.stddev_samp("l_quantity"), 6).alias("qty_std_samp"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("qty_std_pop"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "stats_corr_regression",
    oracle="""
        SELECT round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS price_per_qty,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                   AS price_intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6)    AS r2,
               count(*) AS n
        FROM lineitem
    """,
    tags=("statistics", "aggregate"),
)
def stats_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr / covar_samp / regr_slope / regr_intercept / regr_r2 over
    the whole fact table — one partial+final pass, no shuffle beyond
    the single global reduce."""
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(
            F.regr_slope("l_extendedprice", "l_quantity"), 6
        ).alias("price_per_qty"),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 4
        ).alias("price_intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.count("*").alias("n"),
    )


@register(
    "chisq_segment_priority",
    oracle="""
        WITH obs AS (
            SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
                   count(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT seg, pri, n,
                   sum(n) OVER (PARTITION BY seg) AS row_tot,
                   sum(n) OVER (PARTITION BY pri) AS col_tot,
                   sum(n) OVER () AS grand
            FROM obs
        ),
        stat AS (
            SELECT sum(
                       pow(n - CAST(row_tot AS DOUBLE) * col_tot / grand, 2)
                       / (CAST(row_tot AS DOUBLE) * col_tot / grand)
                   ) AS chi2,
                   CAST((count(DISTINCT seg) - 1)
                        * (count(DISTINCT pri) - 1) AS BIGINT) AS dof,
                   CAST(max(grand) AS BIGINT) AS n_obs,
                   CAST(least(count(DISTINCT seg),
                              count(DISTINCT pri)) - 1 AS BIGINT) AS min_dim
            FROM tot
        )
        SELECT round(chi2, 6) AS chi2, dof, n_obs,
               round(sqrt(chi2 / (n_obs * min_dim)), 6) AS cramers_v
        FROM stat
    """,
    tags=("statistics", "chi-square", "contingency"),
)
def chisq_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market
    segment and order priority (the warehouse question "does segment
    drive priority?"), plus Cramér's V effect size. Observed counts
    come from one join + hash aggregate; expected counts are derived
    from the contingency margins with window sums over the TINY
    aggregate (5×5 cells), so the statistic costs one pass over
    orders regardless of volume.

    The oracle recomputes the identical arithmetic; chi2 rounds at
    6dp (sum of rational cell terms in engine-dependent order —
    1e-15 noise, far below the rounding grain)."""
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from pyspark.sql import Window as W

    obs = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = obs.select(
        "seg",
        "pri",
        "n",
        F.sum("n").over(W.partitionBy("seg")).alias("row_tot"),
        F.sum("n").over(W.partitionBy("pri")).alias("col_tot"),
        F.sum("n").over(W.partitionBy()).alias("grand"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("grand")
    stat = tot.agg(
        F.sum(F.pow(F.col("n") - exp, 2) / exp).alias("chi2"),
        (
            (F.count_distinct("seg") - 1) * (F.count_distinct("pri") - 1)
        ).alias("dof"),
        F.max("grand").alias("n_obs"),
        (
            F.least(F.count_distinct("seg"), F.count_distinct("pri")) - 1
        ).alias("min_dim"),
    )
    return stat.select(
        F.round("chi2", 6).alias("chi2"),
        "dof",
        "n_obs",
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n_obs") * F.col("min_dim"))), 6
        ).alias("cramers_v"),
    )


@register(
    "benford_price_digits",
    oracle="""
        WITH digits AS (
            SELECT CAST(floor(o_totalprice
                              / pow(10, floor(log10(o_totalprice))))
                        AS INT) AS d
            FROM orders WHERE o_totalprice > 0
        ),
        counts AS (
            SELECT d, count(*) AS n FROM digits GROUP BY d
        )
        SELECT d AS first_digit,
               n,
               CAST(n AS DOUBLE) / sum(n) OVER () AS share,
               round(log10(1.0 + 1.0 / d), 6) AS benford_expected,
               round(abs(CAST(n AS DOUBLE) / sum(n) OVER ()
                         - log10(1.0 + 1.0 / d)), 6) AS abs_dev
        FROM counts
        ORDER BY first_digit
    """,
    tags=("statistics", "benford", "data-quality"),
)
def benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic fraud /
    synthetic-data smell test: observed first-significant-digit
    shares against log10(1 + 1/d). The digit extraction is pure
    float math (floor over log10 — identical IEEE in both engines;
    no number→string formatting, which is NOT engine-portable), the
    share is one division of exact counts, and only the irrational
    Benford reference and deviation round (6dp).

    Scale: scan → map-side-combining 9-group aggregate → window over
    9 rows. Nothing here grows with data volume except the scan."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    from pyspark.sql import Window as W

    digits = orders.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("int")
        .alias("d")
    )
    counts = digits.groupBy("d").agg(F.count("*").alias("n"))
    share = F.col("n").cast("double") / F.sum("n").over(W.partitionBy())
    benford = F.log10(1.0 + 1.0 / F.col("d"))
    return counts.select(
        F.col("d").alias("first_digit"),
        "n",
        share.alias("share"),
        F.round(benford, 6).alias("benford_expected"),
        F.round(F.abs(share - benford), 6).alias("abs_dev"),
    ).orderBy("first_digit")


@register(
    "psi_price_drift",
    oracle="""
        WITH bucketed AS (
            SELECT CASE WHEN year(o_orderdate) < 1998
                        THEN 'ref' ELSE 'cur' END AS period,
                   least(CAST(floor(o_totalprice / 50000) AS INT), 9) AS b
            FROM orders
        ),
        counts AS (
            SELECT period, b, count(*) AS n FROM bucketed GROUP BY 1, 2
        ),
        tot AS (
            SELECT period, sum(n) AS total FROM counts GROUP BY period
        ),
        shares AS (
            SELECT b,
                   CAST(max(CASE WHEN c.period = 'ref' THEN n END) AS DOUBLE)
                       / max(CASE WHEN t.period = 'ref' THEN total END) AS p,
                   CAST(max(CASE WHEN c.period = 'cur' THEN n END) AS DOUBLE)
                       / max(CASE WHEN t.period = 'cur' THEN total END) AS q
            FROM counts c JOIN tot t ON c.period = t.period
            GROUP BY b
        )
        SELECT CAST(count(*) AS INT) AS n_buckets,
               round(sum((p - q) * ln(p / q)), 6) AS psi,
               round(sum(CASE WHEN p > q THEN p - q ELSE q - p END) / 2, 6)
                   AS total_variation
        FROM shares
    """,
    tags=("statistics", "drift", "psi", "ml-ops"),
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift detection between a reference and a current
    period — the Population Stability Index every production ML
    monitor computes: order totals bucket into fixed 50k-wide bins
    (capped at 10), per-period shares come from exact counts, and
    PSI = Σ (p−q)·ln(p/q) plus total-variation distance summarize the
    shift. Fixed bin EDGES (not quantiles) are the production choice:
    they make periods comparable without a joint sort, and the bin
    map is a pure row-local expression that pushes into the scan.

    The fixture's generator is stationary, so both metrics land near
    0 — the null result IS the check (a nonzero PSI here would mean
    bucketing or share arithmetic drifted). Scale: one pass, one
    20-group aggregate, window-free."""
    orders = t(spark, sf_dir, "orders")
    bucketed = orders.select(
        F.when(F.year("o_orderdate") < 1998, "ref").otherwise("cur").alias(
            "period"
        ),
        F.least(
            F.floor(F.col("o_totalprice") / 50000).cast("int"), F.lit(9)
        ).alias("b"),
    )
    counts = bucketed.groupBy("period", "b").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    shares = (
        counts.withColumn(
            "total", F.sum("n").over(W.partitionBy("period"))
        )
        .groupBy("b")
        .agg(
            (
                F.max(F.when(F.col("period") == "ref", F.col("n"))).cast(
                    "double"
                )
                / F.max(F.when(F.col("period") == "ref", F.col("total")))
            ).alias("p"),
            (
                F.max(F.when(F.col("period") == "cur", F.col("n"))).cast(
                    "double"
                )
                / F.max(F.when(F.col("period") == "cur", F.col("total")))
            ).alias("q"),
        )
    )
    return shares.agg(
        F.count("*").cast("int").alias("n_buckets"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6
        ).alias("psi"),
        F.round(F.sum(F.abs(F.col("p") - F.col("q"))) / 2, 6).alias(
            "total_variation"
        ),
    )
