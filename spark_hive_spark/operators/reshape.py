"""Reshaping + misc scalar breadth, batch 3: unpivot (stack),
numeric histograms, edit-distance string similarity, date arithmetic
(SURVEY.md §2B tier 1 completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "unpivot_lineitem_measures",
    oracle=f"""
        WITH per_flag AS (
            SELECT l_returnflag,
                   {sql_dsum('l_quantity')}      AS qty,
                   {sql_dsum('l_extendedprice')} AS price,
                   {sql_dsum('l_tax')}           AS tax
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, measure, amount
        FROM per_flag
        UNPIVOT (amount FOR measure IN (qty, price, tax))
        ORDER BY l_returnflag, measure
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): three per-flag measures melt into
    (measure, amount) rows via `DataFrame.unpivot` (= SQL stack) —
    the inverse of the pivot query. Constant-factor row growth, no
    shuffle beyond the aggregate's."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("qty"),
        dsum("l_extendedprice").alias("price"),
        dsum("l_tax").alias("tax"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["qty", "price", "tax"],
            variableColumnName="measure",
            valueColumnName="amount",
        )
        .orderBy("l_returnflag", "measure")
    )


@register(
    "histogram_order_prices",
    oracle="""
        SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
               CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000
                   AS bucket_lo,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1, 2
        ORDER BY bucket
    """,
    tags=("aggregate", "histogram"),
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing — the
    deterministic, scale-free histogram shape (one partial-agg pass;
    contrast Spark's histogram_numeric whose bin placement is
    input-order dependent and so unusable under a value-hash gate)."""
    orders = t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        orders.groupBy(
            bucket.alias("bucket"), (bucket * 50000).alias("bucket_lo")
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy("bucket")
    )


@register(
    "string_edit_distance_pairs",
    oracle="""
        WITH names AS (
            SELECT p_partkey, p_name FROM part WHERE p_partkey < 100
        )
        SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
               levenshtein(a.p_name, b.p_name) AS edit_dist
        FROM names a JOIN names b ON a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 4
        ORDER BY part_a, part_b
    """,
    tags=("string", "similarity"),
)
def string_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit-distance near-match pairs over a bounded name
    slice — the string-similarity primitive for entity resolution.
    (All-pairs on a SLICE by design: at corpus scale the blocking
    front-end — fingerprint/LSH from operators/dedup.py — bounds the
    candidate set first; edit distance then verifies candidates.)"""
    names = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 100).select(
        "p_partkey", "p_name"
    )
    a = names.select(
        F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a")
    )
    b = names.select(
        F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b")
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, F.col("part_a") < F.col("part_b"))
        .filter(dist <= 4)
        .select("part_a", "part_b", dist.alias("edit_dist"))
        .orderBy("part_a", "part_b")
    )


@register(
    "date_arithmetic_orders",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)
                   AS due_date,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS review_date,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
                   AS days_to_epoch_end,
               dayofweek(CAST(o_orderdate AS DATE)) AS dow
        FROM orders
        WHERE o_orderkey < 100
        ORDER BY o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic sweep: date_add / add_months / last_day /
    datediff / day-of-week. DuckDB dayofweek is 0=Sunday while Spark
    dayofweek is 1=Sunday — normalized to the DuckDB convention here
    (one of the classic cross-engine calendar traps, pinned by test).
    The +INTERVAL forms in the oracle return DATEs like Spark's
    date_add/add_months."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.add_months(d, 3).alias("review_date"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias(
            "days_to_epoch_end"
        ),
        (F.dayofweek(d) - 1).alias("dow"),
    ).orderBy("o_orderkey")
