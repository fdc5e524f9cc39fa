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


@register(
    "welch_ttest_segments",
    oracle="""
        WITH s AS (
            SELECT
                count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n1,
                CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS sx1,
                CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
                         THEN CAST(c_acctbal AS DECIMAL(18,2))
                              * CAST(c_acctbal AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS sxx1,
                count(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n2,
                CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                         THEN CAST(c_acctbal AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS sx2,
                CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY'
                         THEN CAST(c_acctbal AS DECIMAL(18,2))
                              * CAST(c_acctbal AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS sxx2
            FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        ),
        v AS (
            SELECT n1, n2,
                   sx1 / n1 AS mean1, sx2 / n2 AS mean2,
                   (sxx1 - sx1 * sx1 / n1) / (n1 - 1) AS v1,
                   (sxx2 - sx2 * sx2 / n2) / (n2 - 1) AS v2
            FROM s
        )
        SELECT n1 AS n_building, n2 AS n_machinery,
               mean1 AS mean_building, mean2 AS mean_machinery,
               round(v1, 4) AS var_building, round(v2, 4) AS var_machinery,
               round((mean1 - mean2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
               round(pow(v1 / n1 + v2 / n2, 2)
                     / (pow(v1 / n1, 2) / (n1 - 1)
                        + pow(v2 / n2, 2) / (n2 - 1)), 4) AS welch_dof,
               CAST(CASE WHEN abs((mean1 - mean2)
                                  / sqrt(v1 / n1 + v2 / n2)) > 1.96
                         THEN 1 ELSE 0 END AS INT) AS significant_05
        FROM v
    """,
    tags=("statistics", "hypothesis-test", "ab-testing"),
)
def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    account balances — the A/B-comparison primitive every experiment
    pipeline needs. Every moment comes from EXACT decimal sums
    (c_acctbal is 2dp, its square an exact 4dp decimal), so both
    engines produce bit-identical doubles before any division; the t
    statistic and Welch–Satterthwaite dof are then identical IEEE
    expressions over identical inputs. Only the final display rounds
    (t at 6dp — sqrt makes it irrational; var/dof at 4dp).

    Scale: a single conditional-aggregate pass over customer (both
    groups in one scan, map-side combinable) — no join, no shuffle
    beyond the global reduce; at 100 TB this is the same one-pass
    cost as a count(*)."""
    from spark_hive_spark.functions.numeric import dec

    c = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    x = dec("c_acctbal")
    g1 = F.col("c_mktsegment") == "BUILDING"
    g2 = F.col("c_mktsegment") == "MACHINERY"
    s = c.agg(
        F.count(F.when(g1, 1)).alias("n1"),
        F.sum(F.when(g1, x)).cast("double").alias("sx1"),
        F.sum(F.when(g1, x * x)).cast("double").alias("sxx1"),
        F.count(F.when(g2, 1)).alias("n2"),
        F.sum(F.when(g2, x)).cast("double").alias("sx2"),
        F.sum(F.when(g2, x * x)).cast("double").alias("sxx2"),
    )
    v = s.select(
        "n1",
        "n2",
        (F.col("sx1") / F.col("n1")).alias("mean1"),
        (F.col("sx2") / F.col("n2")).alias("mean2"),
        (
            (F.col("sxx1") - F.col("sx1") * F.col("sx1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (F.col("sxx2") - F.col("sx2") * F.col("sx2") / F.col("n2"))
            / (F.col("n2") - 1)
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    t_stat = (F.col("mean1") - F.col("mean2")) / F.sqrt(se2)
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return v.select(
        F.col("n1").alias("n_building"),
        F.col("n2").alias("n_machinery"),
        F.col("mean1").alias("mean_building"),
        F.col("mean2").alias("mean_machinery"),
        F.round("v1", 4).alias("var_building"),
        F.round("v2", 4).alias("var_machinery"),
        F.round(t_stat, 6).alias("t_stat"),
        F.round(dof, 4).alias("welch_dof"),
        F.when(F.abs(t_stat) > 1.96, 1)
        .otherwise(0)
        .cast("int")
        .alias("significant_05"),
    )


@register(
    "winsorized_price_stats",
    oracle="""
        WITH fences AS (
            SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
                   quantile_cont(l_extendedprice, 0.95) AS hi
            FROM lineitem
        ),
        parts AS (
            SELECT
                count(*) AS n,
                count(CASE WHEN l_extendedprice < lo THEN 1 END) AS n_lo,
                count(CASE WHEN l_extendedprice > hi THEN 1 END) AS n_hi,
                CAST(sum(CASE WHEN l_extendedprice >= lo
                               AND l_extendedprice <= hi
                         THEN CAST(l_extendedprice AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS s_mid,
                CAST(sum(CASE WHEN l_extendedprice >= lo
                               AND l_extendedprice <= hi
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2)) END)
                     AS DOUBLE) AS sxx_mid,
                max(lo) AS lo, max(hi) AS hi
            FROM lineitem CROSS JOIN fences
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n_lo AS BIGINT) AS n_clamped_low,
               CAST(n_hi AS BIGINT) AS n_clamped_high,
               (s_mid + n_lo * lo + n_hi * hi) / n AS win_mean,
               round(sqrt(
                   ((sxx_mid + n_lo * lo * lo + n_hi * hi * hi)
                    - pow(s_mid + n_lo * lo + n_hi * hi, 2) / n)
                   / (n - 1)), 6) AS win_std
        FROM parts
    """,
    tags=("statistics", "robust", "winsorize"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean and standard deviation of lineitem prices —
    the robust-moments counterpart to the median/MAD fence filter
    (`text_mad_outliers`): values below the exact p05 fence clamp UP
    to it, values above p95 clamp DOWN, and the moments come from the
    clamped distribution. Tail-heavy billing data gets a mean a few
    outliers can't drag.

    Determinism without rounding the mean: the interior sum and
    sum-of-squares are EXACT decimal aggregates (2dp values, 4dp
    squares), the clamped tails contribute exact-count multiples of
    the two fence doubles, and the composition is identical IEEE in
    both engines. Only the std rounds (6dp, sqrt-irrational).

    Scale: fences come from the shared range-partitioned
    order-statistics helper (no holistic percentile aggregate), then
    ONE conditional-aggregate pass over the fact table — same cost
    envelope as a plain mean/std."""
    from spark_hive_spark.functions.stats import distributed_quantiles

    li = t(spark, sf_dir, "lineitem")
    lo, hi = distributed_quantiles(li, "l_extendedprice", [0.05, 0.95])
    p = F.col("l_extendedprice")
    pd_ = p.cast("decimal(18,2)")
    mid = (p >= lo) & (p <= hi)
    parts = li.agg(
        F.count("*").alias("n"),
        F.count(F.when(p < lo, 1)).alias("n_lo"),
        F.count(F.when(p > hi, 1)).alias("n_hi"),
        F.sum(F.when(mid, pd_)).cast("double").alias("s_mid"),
        F.sum(F.when(mid, pd_ * pd_)).cast("double").alias("sxx_mid"),
    )
    s_win = F.col("s_mid") + F.col("n_lo") * lo + F.col("n_hi") * hi
    sxx_win = (
        F.col("sxx_mid")
        + F.col("n_lo") * (lo * lo)
        + F.col("n_hi") * (hi * hi)
    )
    return parts.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("n_lo").cast("bigint").alias("n_clamped_low"),
        F.col("n_hi").cast("bigint").alias("n_clamped_high"),
        (s_win / F.col("n")).alias("win_mean"),
        F.round(
            F.sqrt(
                (sxx_win - F.pow(s_win, 2) / F.col("n")) / (F.col("n") - 1)
            ),
            6,
        ).alias("win_std"),
    )


@register(
    "regr_price_size_by_brand",
    oracle="""
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_parts,
               round(regr_slope(p_retailprice, p_size), 6) AS price_per_size,
               round(regr_intercept(p_retailprice, p_size), 4)
                   AS base_price,
               round(regr_r2(p_retailprice, p_size), 6) AS r2
        FROM part
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("statistics", "regression", "grouped"),
)
def regr_price_size_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP least-squares regression (price ~ size within each
    brand) — the grouped companion to the global
    `stats_corr_regression`: one hash aggregate computes an
    independent fit per brand, the shape of a thousand-segment
    model-sanity sweep. regr_* aggregates are single-pass
    partial-aggregable (constant state per group), so the cost is a
    plain groupBy regardless of group count; slopes/r2 round at 6dp
    (engine update-order noise far below the grain), intercepts at
    4dp (price-scaled)."""
    part = t(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.round(F.regr_slope("p_retailprice", "p_size"), 6).alias(
                "price_per_size"
            ),
            F.round(F.regr_intercept("p_retailprice", "p_size"), 4).alias(
                "base_price"
            ),
            F.round(F.regr_r2("p_retailprice", "p_size"), 6).alias("r2"),
        )
        .orderBy("p_brand")
    )


# Half-sample bootstrap geometry: B replicas, each keeping the rows
# whose replica-specific portable hash lands even — deterministic
# "random" subsampling as a pure function of the key.
_BOOT_B = 32
_BOOT_P = 2147483647


@register(
    "stats_bootstrap_se_price",
    oracle=f"""
        WITH reps AS (
            SELECT r AS rep,
                   count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders, unnest(range(0, {_BOOT_B})) AS u(r)
            WHERE (o_orderkey * (1103515245 + 2 * r) + (12345 + r))
                  % {_BOOT_P} % 2 = 0
            GROUP BY r
        ),
        means AS (
            SELECT rep, CAST(s AS DOUBLE) / n AS m FROM reps
        ),
        boot AS (
            SELECT count(*) AS b,
                   round(stddev_samp(m), 6) AS half_sample_sd
            FROM means
        ),
        full_ AS (
            SELECT count(*) AS n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DOUBLE) / count(*) AS mean_price,
                   stddev_samp(o_totalprice) / sqrt(count(*))
                       AS analytic_se
            FROM orders
        )
        SELECT CAST(b AS INT) AS n_replicas,
               CAST(n AS BIGINT) AS n_rows,
               mean_price,
               round(analytic_se, 6) AS analytic_se,
               half_sample_sd,
               CAST(CASE WHEN half_sample_sd
                              BETWEEN 0.4 * analytic_se * sqrt(2)
                                  AND 2.5 * analytic_se * sqrt(2)
                         THEN 1 ELSE 0 END AS INT) AS se_bracket_ok
        FROM boot, full_
    """,
    tags=("statistics", "bootstrap", "uncertainty", "resampling"),
)
def stats_bootstrap_se_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed HALF-SAMPLE BOOTSTRAP standard error of the mean
    order price — the resampling scheme that actually works on a
    cluster: instead of sampling WITH replacement (stateful RNG,
    unmergeable), each of B=32 replicas keeps the rows whose
    replica-keyed portable hash is even. Replica membership is a
    pure function of (key, replica) — reproducible on any
    partitioning — and all B replica sums accumulate in ONE
    conditional-aggregate pass at scale (here: unioned per-replica
    aggregates, which Catalyst shares the scan across). The spread
    of replica means estimates the sampling error; for half-samples
    sd(replica means) ~ SE * sqrt(2), and the audit brackets it
    against the analytic SE (replica means are exact-decimal/count
    divisions, so everything except the two stddevs is
    hash-exact)."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    # replica membership via an exploded replica index: ONE scan, a
    # constant-size plan regardless of B (the 64-conditional-agg
    # formulation paid ~1.8 s of driver-side analysis per call), and
    # the row explosion feeds a map-side-combinable 32-group aggregate
    reps = (
        orders.select(
            "o_orderkey",
            price.alias("p"),
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("r"),
        )
        .filter(
            (
                F.col("o_orderkey") * (1103515245 + 2 * F.col("r"))
                + (12345 + F.col("r"))
            )
            % _BOOT_P
            % 2
            == 0
        )
        .groupBy("r")
        .agg(F.count("*").alias("n"), F.sum("p").alias("s"))
    )
    means = reps.select((F.col("s").cast("double") / F.col("n")).alias("m"))
    boot = means.agg(
        F.count("*").alias("b"),
        F.round(F.stddev_samp("m"), 6).alias("half_sample_sd"),
    )
    full = orders.agg(
        F.count("*").alias("n"),
        (F.sum(price).cast("double") / F.count("*")).alias("mean_price"),
        (F.stddev_samp("o_totalprice") / F.sqrt(F.count("*"))).alias(
            "analytic_se"
        ),
    )
    sq2 = 2.0**0.5
    return boot.crossJoin(F.broadcast(full)).select(
        F.col("b").cast("int").alias("n_replicas"),
        F.col("n").cast("bigint").alias("n_rows"),
        "mean_price",
        F.round("analytic_se", 6).alias("analytic_se"),
        "half_sample_sd",
        F.when(
            F.col("half_sample_sd").between(
                0.4 * F.col("analytic_se") * sq2,
                2.5 * F.col("analytic_se") * sq2,
            ),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("se_bracket_ok"),
    )


_MWU_ORACLE = """
    WITH pool AS (
        SELECT c_mktsegment AS seg,
               CAST(c_acctbal AS DECIMAL(18,2)) AS v
        FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND c_acctbal IS NOT NULL
    ),
    ranked AS (
        SELECT seg, v,
               rank() OVER (ORDER BY v) AS rmin,
               count(*) OVER (PARTITION BY v) AS cnt
        FROM pool
    ),
    avgr AS (
        SELECT seg, rmin + (cnt - 1) / 2.0 AS ar FROM ranked
    ),
    ties AS (
        SELECT sum(t * t * t - t) AS tie_sum FROM (
            SELECT count(*) AS t FROM pool GROUP BY v
        )
    ),
    agg AS (
        SELECT count(CASE WHEN seg = 'BUILDING' THEN 1 END) AS n1,
               count(CASE WHEN seg = 'MACHINERY' THEN 1 END) AS n2,
               sum(CASE WHEN seg = 'BUILDING' THEN ar END) AS r1
        FROM avgr
    )
    SELECT CAST(n1 AS BIGINT) AS n_building,
           CAST(n2 AS BIGINT) AS n_machinery,
           round(r1 - n1 * (n1 + 1) / 2.0, 2) AS u_stat,
           round(
               (r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
               / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                      * ((n1 + n2 + 1)
                         - CAST(tie_sum AS DOUBLE)
                           / ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE)))),
               6) AS z_approx
    FROM agg, ties
"""


@register(
    "mannwhitney_u_segments",
    oracle=_MWU_ORACLE,
    tags=("statistics", "nonparametric", "rank-test"),
)
def mannwhitney_u_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U — the nonparametric companion to
    welch_ttest_segments over the same two customer segments:
    average ranks for ties (rmin + (t−1)/2 over the pooled decimal
    values), U = R1 − n1(n1+1)/2, and the tie-corrected normal
    approximation z (no continuity correction, stated). Rank sums
    add half-integers — exactly representable doubles, so the sum is
    order-independent and both engines agree bit-for-bit before the
    single sqrt.

    Scale: one pooled window on the value order (the same
    range-partitionable global-rank shape as the engine's other
    order-statistics), a tiny tie aggregate, and a one-row reduce —
    no join against the fact tables."""
    from pyspark.sql import Window as W

    pool = (
        t(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_acctbal").isNotNull()
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
        )
    )
    pool = pool.localCheckpoint(eager=True)  # filtered segment rows;
    # feed both the rank window and the tie aggregate
    ranked = pool.withColumn(
        "rmin", F.rank().over(W.orderBy("v"))
    ).withColumn("cnt", F.count("*").over(W.partitionBy("v")))
    avgr = ranked.select(
        "seg", (F.col("rmin") + (F.col("cnt") - 1) / 2.0).alias("ar")
    )
    ties = (
        pool.groupBy("v")
        .agg(F.count("*").alias("tc"))
        .agg(
            F.sum(
                F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")
            ).alias("tie_sum")
        )
    )
    agg = avgr.agg(
        F.count(F.when(F.col("seg") == "BUILDING", 1)).alias("n1"),
        F.count(F.when(F.col("seg") == "MACHINERY", 1)).alias("n2"),
        F.sum(F.when(F.col("seg") == "BUILDING", F.col("ar"))).alias("r1"),
    )
    n1, n2, r1 = F.col("n1"), F.col("n2"), F.col("r1")
    n = n1 + n2
    u = r1 - n1 * (n1 + 1) / 2.0
    sigma = F.sqrt(
        n1.cast("double") * n2 / 12.0
        * (
            (n + 1)
            - F.col("tie_sum").cast("double")
            / (n * (n - 1).cast("double"))
        )
    )
    return agg.crossJoin(F.broadcast(ties)).select(
        n1.cast("bigint").alias("n_building"),
        n2.cast("bigint").alias("n_machinery"),
        F.round(u, 2).alias("u_stat"),
        F.round((u - n1 * n2 / 2.0) / sigma, 6).alias("z_approx"),
    )


_MK_ORACLE = """
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        FROM orders GROUP BY mth
    ),
    idx AS (
        SELECT x, row_number() OVER (ORDER BY mth) AS i FROM monthly
    ),
    pairs AS (
        SELECT a.i AS i, b.i AS j,
               CASE WHEN b.x > a.x THEN 1
                    WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
               CAST(b.x - a.x AS DOUBLE) / (b.i - a.i) AS slope
        FROM idx a JOIN idx b ON b.i > a.i
    ),
    ties AS (
        SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS tsum FROM (
            SELECT count(*) AS t FROM idx GROUP BY x HAVING count(*) > 1
        )
    ),
    agg AS (
        SELECT count(*) AS n FROM idx
    ),
    stat AS (
        SELECT sum(sgn) AS s, count(*) AS n_pairs,
               quantile_cont(slope, 0.5) AS sen_slope
        FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_months,
           CAST(s AS BIGINT) AS s_stat,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round(
               (s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
               / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tsum)
                      / 18.0),
               6) AS z_mk,
           round(sen_slope, 2) AS theil_sen_slope
    FROM stat, agg, ties
"""


@register(
    "mannkendall_theilsen_trend",
    oracle=_MK_ORACLE,
    tags=("statistics", "trend", "robust"),
)
def mannkendall_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL TREND TEST + THEIL-SEN SLOPE over monthly
    revenue — the robust (rank/median-based) alternative to OLS
    trend fitting: S = Σ sign(x_j − x_i) over all i<j pairs,
    tie-corrected variance, continuity-corrected z, and the median
    of all pairwise slopes as the Theil-Sen estimate. Signs compare
    EXACT decimals; slopes divide a decimal difference by an integer
    month gap — identical doubles in both engines; the median of an
    even pair count averages the two middle values identically.

    Scale: the pair join is over the MONTHLY series — calendar-
    bounded (~10³ rows per century), so O(n²) pairs stay trivially
    small no matter the fact volume; the fact table contributes one
    map-side-combinable aggregation."""
    from pyspark.sql import Window as W

    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x"))
    )
    # the contracted series feeds FOUR consumers (both pair sides,
    # ties, count); without a checkpoint each consumer re-scans the
    # fact table — measured 6 parquet scans in the executed plan.
    # Months are calendar-bounded, so the checkpoint is O(10²) rows.
    idx = monthly.select(
        "x", F.row_number().over(W.orderBy("mth")).alias("i")
    ).localCheckpoint(eager=True)
    a = idx.select(F.col("i").alias("i"), F.col("x").alias("xa"))
    b = idx.select(F.col("i").alias("j"), F.col("x").alias("xb"))
    pairs = a.join(b, F.col("j") > F.col("i")).select(
        F.when(F.col("xb") > F.col("xa"), 1)
        .when(F.col("xb") < F.col("xa"), -1)
        .otherwise(0)
        .alias("sgn"),
        (
            (F.col("xb") - F.col("xa")).cast("double")
            / (F.col("j") - F.col("i"))
        ).alias("slope"),
    )
    ties = (
        idx.groupBy("x")
        .agg(F.count("*").alias("tc"))
        .filter(F.col("tc") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)
                ),
                F.lit(0),
            ).alias("tsum")
        )
    )
    agg = idx.agg(F.count("*").alias("n"))
    stat = pairs.agg(
        F.sum("sgn").alias("s"),
        F.count("*").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("sen_slope"),
    )
    s, n = F.col("s"), F.col("n")
    cc = F.when(s > 0, 1).when(s < 0, -1).otherwise(0)
    return (
        stat.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(ties))
        .select(
            n.cast("bigint").alias("n_months"),
            s.cast("bigint").alias("s_stat"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.round(
                (s - cc)
                / F.sqrt(
                    (
                        n.cast("double") * (n - 1) * (2 * n + 5)
                        - F.col("tsum")
                    )
                    / 18.0
                ),
                6,
            ).alias("z_mk"),
            F.round("sen_slope", 2).alias("theil_sen_slope"),
        )
    )


KM_CENSOR_DAYS = 180

_KM_ORACLE = f"""
    WITH obs AS (
        SELECT max(CAST(o_orderdate AS DATE)) AS end_d FROM orders
    ),
    subj AS (
        SELECT o_custkey,
               datediff('day', min(CAST(o_orderdate AS DATE)),
                        max(CAST(o_orderdate AS DATE))) AS lt,
               CASE WHEN max(CAST(o_orderdate AS DATE))
                         < (SELECT end_d FROM obs)
                           - INTERVAL {KM_CENSOR_DAYS} DAY
                    THEN 1 ELSE 0 END AS event
        FROM orders GROUP BY o_custkey
    ),
    per_t AS (
        SELECT lt, count(*) AS cnt, sum(event) AS d
        FROM subj GROUP BY lt
    ),
    risk AS (
        SELECT lt, cnt, d,
               (SELECT count(*) FROM subj) AS total,
               coalesce(sum(cnt) OVER (ORDER BY lt
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS prior
        FROM per_t
    ),
    km AS (
        SELECT lt, d, total - prior AS n_at_risk,
               exp(sum(ln(1.0 - CAST(d AS DOUBLE) / (total - prior)))
                   OVER (ORDER BY lt ROWS UNBOUNDED PRECEDING)) AS s
        FROM risk
    )
    SELECT CAST(lt AS BIGINT) AS lifetime_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk,
           CAST(d AS BIGINT) AS n_events,
           round(s, 6) AS survival
    FROM km
    WHERE d > 0
    ORDER BY lifetime_days
"""


@register(
    "kaplan_meier_customer_lifetime",
    oracle=_KM_ORACLE,
    tags=("statistics", "survival", "kaplan-meier"),
)
def kaplan_meier_customer_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER SURVIVAL CURVE over customer "lifetime" (days
    between first and last order), with real right-censoring: a
    customer whose last order falls inside the final 180 days of the
    observation window may still be active — they enter the risk
    sets but never contribute an event. S(t) = Π_{{t_i<=t}}
    (1 − d_i/n_i), computed as exp of a cumulative Σln (the
    engine-standard rewrite of an ordered product; ln/exp over
    identical doubles accumulate identically in both engines — the
    text-LM log-prob queries set the precedent — and survival rounds
    to 6dp).

    Scale: subjects contract to one row per customer (map-side
    combinable min/max), the curve itself lives on the
    calendar-bounded distinct-lifetime domain, and the only ordered
    window runs over that contracted series."""
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    )
    obs = orders.agg(F.max("d").alias("end_d"))
    subj = (
        orders.groupBy("o_custkey")
        .agg(F.min("d").alias("first_d"), F.max("d").alias("last_d"))
        .crossJoin(F.broadcast(obs))
        .select(
            F.datediff("last_d", "first_d").alias("lt"),
            F.when(
                F.col("last_d") < F.date_sub("end_d", KM_CENSOR_DAYS), 1
            )
            .otherwise(0)
            .alias("event"),
        )
    )
    # checkpoint the calendar-bounded lifetime histogram: its three
    # consumers (risk window, total, output) would otherwise each
    # recompute the per-customer aggregation — measured 8 parquet
    # scans without it. total derives from per_t (Σcnt), not from a
    # second pass over subj.
    per_t = (
        subj.groupBy("lt")
        .agg(F.count("*").alias("cnt"), F.sum("event").alias("d"))
        .localCheckpoint(eager=True)
    )
    total = per_t.agg(F.sum("cnt").alias("total"))
    w = W.orderBy("lt")
    risk = (
        per_t.crossJoin(F.broadcast(total))
        .withColumn(
            "prior",
            F.coalesce(
                F.sum("cnt").over(w.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("n_at_risk", F.col("total") - F.col("prior"))
    )
    km = risk.withColumn(
        "s",
        F.exp(
            F.sum(
                F.log(
                    1.0 - F.col("d").cast("double") / F.col("n_at_risk")
                )
            ).over(w.rowsBetween(W.unboundedPreceding, 0))
        ),
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("lt").cast("bigint").alias("lifetime_days"),
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            F.col("d").cast("bigint").alias("n_events"),
            F.round("s", 6).alias("survival"),
        )
        .orderBy("lifetime_days")
    )


QM_N_GRID = 20  # grid of 20ths: p = k/20, k = 0..20
QM_BASE_YEAR = 1995
QM_TARGET_YEAR = 2000


def _qm_cohort_sql(year: int, alias: str) -> str:
    """Exact rational interpolated quantiles of one cohort: with
    p = k/20 the interpolation fraction is j/20 (j integer), so
    2000·q = cents(m+1)·(20−j) + cents(m+2)·j is an exact BIGINT."""
    return f"""
    {alias}_r AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               row_number() OVER (ORDER BY o_totalprice) AS rk
        FROM orders WHERE year(o_orderdate) = {year}
    ),
    {alias}_n AS (SELECT count(*) AS n FROM {alias}_r),
    {alias}_q AS (
        SELECT g.k,
               sum(CASE WHEN rk = (n - 1) * g.k // {QM_N_GRID} + 1
                        THEN cents * ({QM_N_GRID} - (n - 1) * g.k % {QM_N_GRID})
                        WHEN rk = (n - 1) * g.k // {QM_N_GRID} + 2
                        THEN cents * ((n - 1) * g.k % {QM_N_GRID})
                        END) AS q2000
        FROM {alias}_r, {alias}_n, grid g
        WHERE rk IN ((n - 1) * g.k // {QM_N_GRID} + 1,
                     (n - 1) * g.k // {QM_N_GRID} + 2)
        GROUP BY g.k
    )"""


def _qm_oracle() -> str:
    ks = ", ".join(f"({k})" for k in range(QM_N_GRID + 1))
    return f"""
        WITH grid(k) AS (VALUES {ks}),
        {_qm_cohort_sql(QM_BASE_YEAR, "b")},
        {_qm_cohort_sql(QM_TARGET_YEAR, "t")}
        SELECT round(CAST(b.k AS DOUBLE) / {QM_N_GRID}, 2) AS p,
               CAST(b.q2000 AS DOUBLE) / ({QM_N_GRID} * 100) AS q_base,
               CAST(t.q2000 AS DOUBLE) / ({QM_N_GRID} * 100) AS q_target,
               CAST(t.q2000 - b.q2000 AS DOUBLE) / ({QM_N_GRID} * 100)
                   AS shift
        FROM b_q b JOIN t_q t ON b.k = t.k
        ORDER BY p
    """


def _qm_cohort(spark: SparkSession, sf_dir: str, year: int, grid) -> DataFrame:
    from pyspark.sql import Window as W

    r = (
        t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == year)
        .select(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
            F.row_number()
            .over(W.orderBy("o_totalprice"))
            .alias("rk"),
        )
    )
    n = r.agg(F.count("*").alias("n"))
    m = F.expr(f"(n - 1) * k DIV {QM_N_GRID}")
    j = F.expr(f"(n - 1) * k % {QM_N_GRID}")
    return (
        r.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(grid))
        .filter((F.col("rk") == m + 1) | (F.col("rk") == m + 2))
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    F.col("rk") == m + 1,
                    F.col("cents") * (QM_N_GRID - j),
                ).when(F.col("rk") == m + 2, F.col("cents") * j)
            ).alias("q2000")
        )
    )


@register(
    "quantile_mapping_price_drift",
    oracle=_qm_oracle(),
    tags=("statistics", "quantile-mapping", "drift"),
)
def quantile_mapping_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE MAPPING between two cohorts — the drift-correction
    table that maps the base year's order-price distribution onto
    the target year's on a 21-point grid: the piecewise-linear
    transfer function calibration pipelines apply. Quantiles use the
    standard h = (n−1)p linear interpolation, but computed in EXACT
    INTEGER arithmetic: with p = k/20 the interpolation weight is
    j/20 for integer j, so 2000·q = cents_lo·(20−j) + cents_hi·j is
    a BIGINT and no engine ever rounds an intermediate (the naive
    percentile_cont version hit a genuine .xx5 half-boundary where
    a 1e-10 interpolation difference flipped the 2dp rounding —
    exact rationals, not tighter rounding, are the fix).

    Scale: per-cohort global rank (the documented two-phase
    range-partition rewrite applies) + a broadcast 21-row grid
    join; everything after the rank is integer."""
    grid = spark.createDataFrame(
        [(k,) for k in range(QM_N_GRID + 1)], "k int"
    )
    b = _qm_cohort(spark, sf_dir, QM_BASE_YEAR, grid).select(
        "k", F.col("q2000").alias("qb")
    )
    tq = _qm_cohort(spark, sf_dir, QM_TARGET_YEAR, grid).select(
        "k", F.col("q2000").alias("qt")
    )
    return (
        b.join(tq, "k")
        .select(
            F.round(F.col("k").cast("double") / QM_N_GRID, 2).alias("p"),
            (F.col("qb").cast("double") / (QM_N_GRID * 100)).alias("q_base"),
            (F.col("qt").cast("double") / (QM_N_GRID * 100)).alias("q_target"),
            (
                (F.col("qt") - F.col("qb")).cast("double")
                / (QM_N_GRID * 100)
            ).alias("shift"),
        )
        .orderBy("p")
    )


NEYMAN_FRAC = 10  # total sample = customers DIV 10
_NEY_KNUTH = 2654435761
_NEY_M32 = 2**32

_NEYMAN_ORACLE = f"""
    WITH strata AS (
        SELECT c_mktsegment AS seg,
               count(*) AS nh,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                        * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s2
        FROM customer GROUP BY seg
    ),
    wgt AS (
        SELECT seg, nh,
               nh * sqrt((s2 - s1 * s1 / nh) / (nh - 1)) AS w
        FROM strata
    ),
    tot AS (
        SELECT sum(w) AS wsum, CAST(sum(nh) // {NEYMAN_FRAC} AS BIGINT) AS n
        FROM wgt
    ),
    raw AS (
        SELECT seg, nh, w, n * w / wsum AS raw_q,
               CAST(floor(n * w / wsum) AS BIGINT) AS fq
        FROM wgt, tot
    ),
    resid AS (
        SELECT seg, nh, raw_q, fq,
               row_number() OVER (ORDER BY raw_q - fq DESC, seg) AS rk,
               (SELECT n FROM tot) - sum(fq) OVER () AS r
        FROM raw
    ),
    quota AS (
        SELECT seg, nh,
               fq + CASE WHEN rk <= r THEN 1 ELSE 0 END AS quota
        FROM resid
    ),
    sampled AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey
        FROM customer c
        JOIN quota q ON q.seg = c.c_mktsegment
        QUALIFY row_number() OVER (
            PARTITION BY c.c_mktsegment
            ORDER BY ((c.c_custkey * {_NEY_KNUTH}) % {_NEY_M32}),
                     c.c_custkey
        ) <= q.quota
    )
    SELECT q.seg AS segment,
           CAST(q.nh AS BIGINT) AS stratum_size,
           CAST(q.quota AS BIGINT) AS quota,
           CAST(count(s.c_custkey) AS BIGINT) AS achieved,
           CAST(coalesce(sum(s.c_custkey), 0) AS BIGINT) AS sample_checksum
    FROM quota q LEFT JOIN sampled s ON s.seg = q.seg
    GROUP BY q.seg, q.nh, q.quota
    ORDER BY segment
"""


@register(
    "neyman_stratified_allocation",
    oracle=_NEYMAN_ORACLE,
    tags=("statistics", "sampling", "neyman"),
)
def neyman_stratified_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-ALLOCATION STRATIFIED SAMPLE — the variance-optimal
    sampling design: stratum quotas proportional to N_h·S_h
    (size × stddev), integerized by the same largest-remainder
    method as the proration operator, then drawn deterministically
    per stratum by Knuth-hash order (the engine-wide sampling hash).
    Output attests quota = achieved per stratum plus a sampled-key
    checksum — the oracle recomputes the whole design independently.

    Stddevs come from decimal-exact moments; the only doubles are
    the shared sqrt/ratio formulas, evaluated identically in both
    engines. Scale: one conditional-aggregate pass for the design,
    one window per stratum for the draw — both on customer's
    natural partitioning."""
    from pyspark.sql import Window as W

    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("v"),
    )
    strata = cust.groupBy("seg").agg(
        F.count("*").alias("nh"),
        F.sum("v").cast("double").alias("s1"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("s2"),
    )
    wgt = strata.select(
        "seg",
        "nh",
        (
            F.col("nh")
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("nh"))
                / (F.col("nh") - 1)
            )
        ).alias("w"),
    )
    tot = wgt.agg(
        F.sum("w").alias("wsum"),
        F.expr(f"sum(nh) DIV {NEYMAN_FRAC}").cast("bigint").alias("n"),
    )
    raw = wgt.crossJoin(F.broadcast(tot)).select(
        "seg",
        "nh",
        (F.col("n") * F.col("w") / F.col("wsum")).alias("raw_q"),
        F.floor(F.col("n") * F.col("w") / F.col("wsum"))
        .cast("bigint")
        .alias("fq"),
        "n",
    )
    resid = raw.withColumn(
        "rk",
        F.row_number().over(W.orderBy(F.desc(F.col("raw_q") - F.col("fq")), "seg")),
    ).withColumn(
        "r", F.col("n") - F.sum("fq").over(W.partitionBy())
    )
    quota = resid.select(
        "seg",
        "nh",
        (
            F.col("fq")
            + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0)
        ).alias("quota"),
    ).localCheckpoint(eager=True)  # stratum-cardinality; 2 consumers
    sw = W.partitionBy("seg").orderBy(
        F.pmod(F.col("c_custkey") * _NEY_KNUTH, F.lit(_NEY_M32)),
        "c_custkey",
    )
    sampled = (
        cust.join(F.broadcast(quota.select("seg", "quota")), "seg")
        .withColumn("srk", F.row_number().over(sw))
        .filter(F.col("srk") <= F.col("quota"))
        .groupBy("seg")
        .agg(
            F.count("*").alias("achieved"),
            F.sum("c_custkey").alias("sample_checksum"),
        )
    )
    return (
        quota.join(F.broadcast(sampled), "seg", "left")
        .select(
            F.col("seg").alias("segment"),
            F.col("nh").cast("bigint").alias("stratum_size"),
            F.col("quota").cast("bigint").alias("quota"),
            F.coalesce("achieved", F.lit(0)).cast("bigint").alias("achieved"),
            F.coalesce("sample_checksum", F.lit(0))
            .cast("bigint")
            .alias("sample_checksum"),
        )
        .orderBy("segment")
    )


CUPED_SPLIT = "1998-01-01"  # pre-period before, post-period from here

_CUPED_ORACLE = f"""
    WITH per_cust AS (
        SELECT c.c_custkey, c.c_mktsegment AS seg,
               CAST(coalesce(sum(CASE WHEN o.o_orderdate < DATE '{CUPED_SPLIT}'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DOUBLE) AS x,
               CAST(coalesce(sum(CASE WHEN o.o_orderdate >= DATE '{CUPED_SPLIT}'
                        THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
                    AS DOUBLE) AS y
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment
    ),
    theta AS (
        SELECT (sum(x * y) - sum(x) * sum(y) / count(*))
               / (sum(x * x) - sum(x) * sum(x) / count(*)) AS th,
               sum(x) / count(*) AS mx
        FROM per_cust
    ),
    adj AS (
        SELECT seg, x, y, y - th * (x - mx) AS y_adj
        FROM per_cust, theta
    )
    SELECT seg AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(y) / count(*), 2) AS mean_post,
           round(sum(y_adj) / count(*), 2) AS mean_post_cuped,
           round(1.0 - (sum(y_adj * y_adj) - sum(y_adj) * sum(y_adj)
                        / count(*))
                       / (sum(y * y) - sum(y) * sum(y) / count(*)),
                 4) AS variance_reduction
    FROM adj
    GROUP BY seg
    ORDER BY segment
"""


@register(
    "cuped_adjusted_segment_lift",
    oracle=_CUPED_ORACLE,
    tags=("statistics", "experimentation", "cuped"),
)
def cuped_adjusted_segment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION (Deng et al., WSDM'13) — the
    experimentation-platform workhorse: per-customer post-period
    revenue adjusted by the pre-period covariate,
    y_adj = y − θ(x − x̄) with θ = cov(x,y)/var(x), reported per
    segment with the achieved variance-reduction ratio
    (1 − var(y_adj)/var(y), ≈ ρ² when θ is fitted globally).

    x and y start as decimal-exact per-customer sums cast once to
    double, so every engine computes θ and the adjusted moments from
    identical inputs with identical expressions. The sums of
    products are plain double aggregations — order-sensitive in the
    last ULP, but the outputs round at 2dp/4dp, eleven orders of
    magnitude above the noise floor.

    Scale: one join + one conditional aggregate to per-customer
    grain, a broadcast 1-row θ, one final reduce — the canonical
    two-pass CUPED shape."""
    per_cust = (
        t(spark, sf_dir, "customer")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", F.col("c_mktsegment").alias("seg"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderdate") < CUPED_SPLIT,
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= CUPED_SPLIT,
                        F.col("o_totalprice").cast("decimal(18,2)"),
                    )
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("y"),
        )
        .localCheckpoint(eager=True)  # customer grain; theta + output
    )
    theta = per_cust.agg(
        (
            (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.count("*"))
            / (
                F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x") / F.count("*")
            )
        ).alias("th"),
        (F.sum("x") / F.count("*")).alias("mx"),
    )
    adj = per_cust.crossJoin(F.broadcast(theta)).select(
        "seg",
        "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))).alias("y_adj"),
    )
    n = F.count("*")
    return (
        adj.groupBy(F.col("seg").alias("segment"))
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.round(F.sum("y") / n, 2).alias("mean_post"),
            F.round(F.sum("y_adj") / n, 2).alias("mean_post_cuped"),
            F.round(
                1.0
                - (
                    F.sum(F.col("y_adj") * F.col("y_adj"))
                    - F.sum("y_adj") * F.sum("y_adj") / n
                )
                / (
                    F.sum(F.col("y") * F.col("y"))
                    - F.sum("y") * F.sum("y") / n
                ),
                4,
            ).alias("variance_reduction"),
        )
        .orderBy("segment")
    )


_DID_ORACLE = f"""
    WITH cell AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING'
                    THEN 'treat' ELSE 'control' END AS grp,
               CASE WHEN o.o_orderdate >= DATE '{CUPED_SPLIT}'
                    THEN 'post' ELSE 'pre' END AS period,
               count(*) AS n,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS mean_price
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY grp, period
    ),
    wide AS (
        SELECT
            max(CASE WHEN grp='treat' AND period='pre' THEN mean_price END)
                AS tp0,
            max(CASE WHEN grp='treat' AND period='post' THEN mean_price END)
                AS tp1,
            max(CASE WHEN grp='control' AND period='pre' THEN mean_price END)
                AS cp0,
            max(CASE WHEN grp='control' AND period='post' THEN mean_price END)
                AS cp1
        FROM cell
    )
    SELECT round(tp0, 2) AS treat_pre, round(tp1, 2) AS treat_post,
           round(cp0, 2) AS control_pre, round(cp1, 2) AS control_post,
           round(round(tp1, 2) - round(tp0, 2)
                 - (round(cp1, 2) - round(cp0, 2)), 2) AS did_estimate
    FROM wide
"""


@register(
    "did_revenue_estimator",
    oracle=_DID_ORACLE,
    tags=("statistics", "experimentation", "diff-in-diff"),
)
def did_revenue_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the 2×2 quasi-experimental
    estimator: (treat_post − treat_pre) − (control_post −
    control_pre) over mean order price, BUILDING as the treated
    segment, the 1998 split as the intervention. Cell means are
    decimal-exact sums over one conditional aggregate; the estimate
    derives from the ROUNDED cell means (the engine-standard guard
    against independent-rounding flips)."""
    cell = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .join(
            t(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.when(F.col("c_mktsegment") == "BUILDING", "treat")
            .otherwise("control")
            .alias("grp"),
            F.when(F.col("o_orderdate") >= CUPED_SPLIT, "post")
            .otherwise("pre")
            .alias("period"),
        )
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                / F.count("*")
            ).alias("mean_price")
        )
    )
    wide = cell.agg(
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "pre"),
                F.col("mean_price"),
            )
        ).alias("tp0"),
        F.max(
            F.when(
                (F.col("grp") == "treat") & (F.col("period") == "post"),
                F.col("mean_price"),
            )
        ).alias("tp1"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "pre"),
                F.col("mean_price"),
            )
        ).alias("cp0"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "post"),
                F.col("mean_price"),
            )
        ).alias("cp1"),
    )
    r = lambda c: F.round(F.col(c), 2)  # noqa: E731
    return wide.select(
        r("tp0").alias("treat_pre"),
        r("tp1").alias("treat_post"),
        r("cp0").alias("control_pre"),
        r("cp1").alias("control_post"),
        F.round(r("tp1") - r("tp0") - (r("cp1") - r("cp0")), 2).alias(
            "did_estimate"
        ),
    )


CONF_ALPHA_NUM = 9  # target coverage 9/10
CONF_KNUTH = 2654435761
CONF_M32 = 2**32

_CONFORMAL_ORACLE = f"""
    WITH base AS (
        SELECT p_partkey, p_brand,
               CAST(p_size AS DOUBLE) AS x,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS y,
               ((p_partkey * {CONF_KNUTH}) % {CONF_M32}) % 4 AS fold
        FROM part
    ),
    train AS (SELECT * FROM base WHERE fold IN (0, 1)),
    cal   AS (SELECT * FROM base WHERE fold = 2),
    test  AS (SELECT * FROM base WHERE fold = 3),
    fit AS (
        SELECT (sum(x * y) - sum(x) * sum(y) / count(*))
               / (sum(x * x) - sum(x) * sum(x) / count(*)) AS b,
               sum(y) / count(*)
               - (sum(x * y) - sum(x) * sum(y) / count(*))
                 / (sum(x * x) - sum(x) * sum(x) / count(*))
                 * sum(x) / count(*) AS a
        FROM train
    ),
    calres AS (
        SELECT abs(y - (a + b * x)) AS r, p_partkey,
               count(*) OVER () AS n_cal
        FROM cal, fit
    ),
    q AS (
        SELECT r AS qhat FROM (
            SELECT r, p_partkey, n_cal,
                   row_number() OVER (ORDER BY r, p_partkey) AS rk
            FROM calres
        )
        WHERE rk = least(
            CAST(ceil((n_cal + 1) * {CONF_ALPHA_NUM} / 10.0) AS BIGINT),
            n_cal)
    )
    SELECT t.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(CASE WHEN abs(t.y - (f.a + f.b * t.x)) <= q.qhat
                      THEN 1 END) AS BIGINT) AS n_covered,
           round(CAST(count(CASE WHEN abs(t.y - (f.a + f.b * t.x))
                                      <= q.qhat THEN 1 END) AS DOUBLE)
                 / count(*), 4) AS coverage,
           round(q.qhat, 2) AS qhat
    FROM test t, fit f, q
    GROUP BY t.p_brand, q.qhat
    ORDER BY brand
"""


@register(
    "conformal_price_intervals",
    oracle=_CONFORMAL_ORACLE,
    tags=("statistics", "conformal", "calibration"),
)
def conformal_price_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVALS — the
    distribution-free uncertainty method: deterministic Knuth-hash
    folds split parts into train (50%) / calibration (25%) / test
    (25%); an OLS price~size model fits on train; the conformal
    radius q̂ is the ⌈0.9·(n+1)⌉-th smallest absolute calibration
    residual selected by RANK (exact — no quantile interpolation to
    diverge); per-brand test coverage is then attested (≈ 0.9
    marginally, by the exchangeability guarantee). OLS coefficients
    come from decimal-exact moments; residual comparisons run on
    identical doubles in both engines."""
    from pyspark.sql import Window as W

    base = t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("double").alias("x"),
        F.col("p_retailprice").cast("decimal(18,2)").cast("double").alias("y"),
        F.pmod(
            F.pmod(F.col("p_partkey") * CONF_KNUTH, F.lit(CONF_M32)),
            F.lit(4),
        ).alias("fold"),
    ).localCheckpoint(eager=True)  # three fold consumers
    train = base.filter(F.col("fold").isin(0, 1))
    cal = base.filter(F.col("fold") == 2)
    test = base.filter(F.col("fold") == 3)
    n = F.count("*")
    sxy = F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / n
    sxx = F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n
    fit = train.agg(
        (sxy / sxx).alias("b"),
        (F.sum("y") / n - sxy / sxx * F.sum("x") / n).alias("a"),
    )
    calres = cal.crossJoin(F.broadcast(fit)).select(
        F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x"))).alias("r"),
        "p_partkey",
        F.count("*").over(W.partitionBy()).alias("n_cal"),
    )
    q = (
        calres.withColumn(
            "rk", F.row_number().over(W.orderBy("r", "p_partkey"))
        )
        .filter(
            F.col("rk")
            == F.least(
                F.ceil((F.col("n_cal") + 1) * CONF_ALPHA_NUM / 10.0).cast(
                    "bigint"
                ),
                F.col("n_cal"),
            )
        )
        .select(F.col("r").alias("qhat"))
    )
    covered = F.count(
        F.when(
            F.abs(F.col("y") - (F.col("a") + F.col("b") * F.col("x")))
            <= F.col("qhat"),
            1,
        )
    )
    return (
        test.crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(q))
        .groupBy(F.col("p_brand").alias("brand"), F.col("qhat"))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            covered.cast("bigint").alias("n_covered"),
            F.round(covered.cast("double") / F.count("*"), 4).alias("coverage"),
        )
        .select(
            "brand",
            "n_test",
            "n_covered",
            "coverage",
            F.round("qhat", 2).alias("qhat"),
        )
        .orderBy("brand")
    )


_ELASTICITY_ORACLE = """
    WITH obs AS (
        SELECT p.p_brand AS brand,
               ln(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
                  / l.l_quantity) AS lp,
               ln(CAST(l.l_quantity AS DOUBLE)) AS lq
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    )
    SELECT brand,
           CAST(count(*) AS BIGINT) AS n_obs,
           round((sum(lp * lq) - sum(lp) * sum(lq) / count(*))
                 / (sum(lp * lp) - sum(lp) * sum(lp) / count(*)), 4)
               AS elasticity,
           round(
               (sum(lp * lq) - sum(lp) * sum(lq) / count(*))
               / sqrt((sum(lp * lp) - sum(lp) * sum(lp) / count(*))
                      * (sum(lq * lq) - sum(lq) * sum(lq) / count(*))),
               4) AS correlation
    FROM obs
    GROUP BY brand
    ORDER BY brand
"""


@register(
    "price_elasticity_by_brand",
    oracle=_ELASTICITY_ORACLE,
    tags=("statistics", "elasticity", "log-log"),
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE ELASTICITY — the econometric log-log regression
    ln(quantity) ~ ln(unit price) per brand: the OLS slope IS the
    elasticity (%Δq per %Δp), reported with the log-log correlation.
    Unit price derives from the decimal-snapped extended price over
    quantity; both engines take ln of identical doubles, and the
    per-brand moment sums feed one closed-form slope each.

    Scale: one join (part broadcasts at any SF relative to lineitem)
    + one map-side-combinable grouped aggregate — the canonical
    GLM-feature-pass shape."""
    obs = (
        t(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(
            F.broadcast(
                t(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.log(
                F.col("l_extendedprice").cast("decimal(18,2)").cast("double")
                / F.col("l_quantity")
            ).alias("lp"),
            F.log(F.col("l_quantity").cast("double")).alias("lq"),
        )
    )
    n = F.count("*")
    spq = F.sum(F.col("lp") * F.col("lq")) - F.sum("lp") * F.sum("lq") / n
    spp = F.sum(F.col("lp") * F.col("lp")) - F.sum("lp") * F.sum("lp") / n
    sqq = F.sum(F.col("lq") * F.col("lq")) - F.sum("lq") * F.sum("lq") / n
    return (
        obs.groupBy("brand")
        .agg(
            n.cast("bigint").alias("n_obs"),
            F.round(spq / spp, 4).alias("elasticity"),
            F.round(spq / F.sqrt(spp * sqq), 4).alias("correlation"),
        )
        .orderBy("brand")
    )


@register(
    "ks_test_segments",
    oracle="""
        WITH s AS (
            SELECT o.o_totalprice AS x,
                   CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN 1 ELSE 0 END AS g
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        ),
        n AS (
            SELECT CAST(sum(g) AS BIGINT) AS n1,
                   CAST(count(*) - sum(g) AS BIGINT) AS n2
            FROM s
        ),
        e AS (  -- default RANGE frame: ties share the cumulative count
            SELECT x,
                   sum(g) OVER (ORDER BY x) AS c1,
                   count(*) OVER (ORDER BY x) AS call
            FROM s
        ),
        d AS (
            SELECT max(abs(
                       CAST(e.c1 AS DOUBLE) / n.n1
                       - CAST(e.call - e.c1 AS DOUBLE) / n.n2
                   )) AS dstat
            FROM e, n
        )
        SELECT n.n1, n.n2,
               round(d.dstat, 6) AS d_stat,
               round(1.358 * sqrt(CAST(n.n1 + n.n2 AS DOUBLE)
                                  / (n.n1 * n.n2)), 6) AS crit_05,
               CAST(CASE WHEN d.dstat > 1.358 * sqrt(
                        CAST(n.n1 + n.n2 AS DOUBLE) / (n.n1 * n.n2))
                    THEN 1 ELSE 0 END AS INT) AS reject_05
        FROM d, n
    """,
    tags=("statistics", "hypothesis-test", "ks", "distribution"),
)
def ks_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (round 10) — the standard
    distribution-drift check a data pipeline runs between cohorts or
    between a training batch and production traffic: D = sup |F1 -
    F2| over the pooled sample, computed EXACTLY with one
    cumulative-count window (the default RANGE frame makes tied
    values share their cumulative count, which is what the ECDF
    definition requires), compared against the 5% asymptotic
    critical value 1.358*sqrt((n1+n2)/(n1*n2)).

    Determinism: counts are integers, D is a max of quotients of
    integers (identical IEEE arithmetic in both engines), and sqrt
    is correctly rounded by IEEE-754 — no libm-dependent
    transcendental (exp-series p-values are deliberately left out:
    exp is NOT correctly-rounded and can differ across engines).

    Scale posture: one join (the dim side broadcastable), one
    value-ordered window — the same global-sort shape as any
    ECDF/quantile computation — and a scalar max; no driver-side
    data movement."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    )
    s = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("o_totalprice").alias("x"),
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("g"),
    )
    from pyspark.sql import Window as W

    # totals come from an unbounded window over the SAME pass (not a
    # second aggregate over s — that would re-scan both tables, the
    # multi-consumer recompute class the scan lint guards against)
    whole = W.partitionBy()
    e = s.select(
        F.sum("g").over(W.orderBy("x")).alias("c1"),
        F.count("*").over(W.orderBy("x")).alias("call"),
    ).select(
        "c1",
        "call",
        F.max("c1").over(whole).alias("n1"),
        (F.max("call").over(whole) - F.max("c1").over(whole)).alias(
            "n2"
        ),
    )
    d = e.agg(
        F.max(
            F.abs(
                F.col("c1").cast("double") / F.col("n1")
                - (F.col("call") - F.col("c1")).cast("double")
                / F.col("n2")
            )
        ).alias("dstat"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    )
    crit = 1.358 * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double")
        / (F.col("n1") * F.col("n2"))
    )
    return d.select(
        "n1",
        "n2",
        F.round("dstat", 6).alias("d_stat"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("dstat") > crit).cast("int").alias("reject_05"),
    )


@register(
    "cvm_test_segments",
    oracle="""
        WITH s AS (
            SELECT o.o_totalprice AS x,
                   CASE WHEN c.c_mktsegment = 'BUILDING'
                        THEN 1 ELSE 0 END AS g
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        ),
        e AS (
            SELECT sum(g) OVER (ORDER BY x) AS c1,
                   count(*) OVER (ORDER BY x) AS call
            FROM s
        ),
        w AS (
            SELECT c1, call,
                   max(c1) OVER () AS n1,
                   max(call) OVER () - max(c1) OVER () AS n2
            FROM e
        ),
        q AS (  -- exact decimal accumulation: the squared integer
                -- numerator outgrows int64 near 100k rows/side, so
                -- square and sum as DECIMAL(38,0) (exact to ~1e38,
                -- good past sf100) and divide ONCE at the end
            SELECT max(n1) AS n1, max(n2) AS n2,
                   sum(CAST(c1 * n2 - (call - c1) * n1
                            AS DECIMAL(19,0))
                       * CAST(c1 * n2 - (call - c1) * n1
                              AS DECIMAL(19,0))) AS ss
            FROM w
        )
        SELECT CAST(n1 AS BIGINT) AS n1,
               CAST(n2 AS BIGINT) AS n2,
               round(CAST(ss AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * n2
                        * (n1 + n2) * (n1 + n2)), 6) AS t_stat,
               -- 5% asymptotic critical value (Anderson 1962)
               CAST(CASE WHEN CAST(ss AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) * n2
                           * (n1 + n2) * (n1 + n2)) > 0.461
                    THEN 1 ELSE 0 END AS INT) AS reject_05
        FROM q
    """,
    tags=("statistics", "hypothesis-test", "cvm", "distribution"),
)
def cvm_test_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises test (round 10) — KS's
    integral-sensitive sibling (KS sees the worst single gap, CvM
    the whole squared-gap area, so it catches broad mild drift KS
    misses). T = n1*n2/N² · Σ (F1−F2)² over the pooled sample,
    against the 5% asymptotic critical value 0.461 (Anderson 1962).

    The determinism trick: the squared ECDF gap at each pooled point
    is ((c1·n2 − c2·n1)/(n1·n2))², so the SUM accumulates squared
    INTEGER numerators exactly — as DECIMAL(38,0), since the squares
    outgrow int64 near 100k rows per side — and divides ONCE at the
    end. Order-independent where a per-term float sum would
    hash-differ between engines' partial-aggregation orders; exact
    past sf100 (sum < 1e28 at sf1).

    Scale posture: identical to the KS query — one broadcast join,
    one value-ordered window pass with unbounded-window totals
    (single scan per table), one integer-sum aggregate."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    )
    s = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("o_totalprice").alias("x"),
        (F.col("c_mktsegment") == "BUILDING").cast("long").alias("g"),
    )
    from pyspark.sql import Window as W

    whole = W.partitionBy()
    w = s.select(
        F.sum("g").over(W.orderBy("x")).alias("c1"),
        F.count("*").over(W.orderBy("x")).alias("call"),
    ).select(
        "c1",
        "call",
        F.max("c1").over(whole).alias("n1"),
        (F.max("call").over(whole) - F.max("c1").over(whole)).alias(
            "n2"
        ),
    )
    num = (
        F.col("c1") * F.col("n2")
        - (F.col("call") - F.col("c1")) * F.col("n1")
    ).cast("decimal(19,0)")
    agg = w.agg(
        F.sum(num * num).alias("ss"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    nn = F.col("n1") + F.col("n2")
    t_stat = F.col("ss").cast("double") / (
        F.col("n1").cast("double") * F.col("n2") * nn * nn
    )
    return agg.select(
        "n1",
        "n2",
        F.round(t_stat, 6).alias("t_stat"),
        (t_stat > 0.461).cast("int").alias("reject_05"),
    )
