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
