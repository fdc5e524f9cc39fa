"""Scale patterns as first-class operators: skew salting, two-phase
aggregation, bucketed (shuffle-free) joins, and partitioned writes.

These encode the 100 TB playbook (SURVEY.md §7 step 6) as reusable,
TESTED code rather than advice:

- `salted_agg`: two-phase aggregation — partial aggregate on
  (key, salt) spreads a hot key over `salt_buckets` reducers, then a
  tiny final aggregate on key merges. For decimal/count/min/max
  aggregates the result is bit-identical to the direct groupBy.
- `salted_join`: replicate the small side per salt bucket so a skewed
  join key fans out over many reducers. (AQE's skew-join handles most
  cases at runtime; explicit salting covers the planner-blind ones,
  e.g. a single mega-key.)
- `write_bucketed` + co-bucketed join: pre-shuffle ONCE at write
  time; every later equi-join/aggregate on the bucket key runs with
  zero Exchange (verified by plan test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


def salt_col(cols: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of stable row columns
    (NOT rand(), which changes on task retry and breaks exactly-once
    semantics)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    merge_aggs: list[Column],
    *,
    salt_from: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).
    `aggs` compute partials per (key, salt); `merge_aggs` combine the
    partials (e.g. sum of partial sums, sum of partial counts)."""
    salted = df.withColumn("_salt", salt_col(salt_from, buckets))
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    return partial.groupBy(key).agg(*merge_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    salt_from: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: left rows get a deterministic salt; the
    (smaller) right side is replicated once per bucket; the join runs
    on (key, salt) so one hot key spreads over `buckets` reducers."""
    l_salted = left.withColumn("_salt", salt_col(salt_from, buckets))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key)) & (l_salted._salt == r_replicated._salt),
    )
    return out.drop("_salt")


@register(
    "skew_salted_user_totals",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_events,
               {sql_dsum('value')} AS total_value,
               max(value) AS max_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("scale", "skew", "aggregate"),
)
def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over events, result-identical to
    the direct groupBy (which is exactly what the oracle runs): counts
    and maxes merge losslessly, sums are decimal-exact so the split
    into partials cannot change the value."""
    ev = t(spark, sf_dir, "events")
    partial_aggs = [
        F.count("*").alias("_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum"),
        F.max("value").alias("_max"),
    ]
    merge_aggs = [
        F.sum("_n").alias("n_events"),
        F.sum("_sum").cast("double").alias("total_value"),
        F.max("_max").alias("max_value"),
    ]
    return salted_agg(
        ev, "user_id", partial_aggs, merge_aggs,
        salt_from=["event_id"], buckets=16,
    ).orderBy("user_id")


@register(
    "skew_salted_join_order_revenue",
    oracle=f"""
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("scale", "skew", "join"),
)
def skew_salted_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join (lineitem salted on its line identity,
    orders replicated 8×), then aggregate — result-identical to the
    plain join the oracle runs. The pattern for a single white-hot
    order key that AQE's quantile-based skew split can't catch."""
    from spark_hive_spark.functions.numeric import revenue_dec

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_from=["l_orderkey", "l_linenumber"], buckets=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(revenue_dec()).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, *, sort: bool = True
) -> None:
    """Bucketed managed table: pre-shuffles on `key` at write time so
    later joins/aggregations on `key` are exchange-free."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed join demo: both fact tables bucketed by order key,
    then joined — the plan must contain NO Exchange (asserted in
    tests/test_scale.py). At 100 TB this is THE lever for repeated
    fact-fact joins: one shuffle at ingest, zero per query."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey")
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    # merge hint: force SMJ so the bucket layout (not a broadcast of
    # the locally-tiny side) carries the join — at 100 TB neither side
    # broadcasts and this IS the plan
    joined = bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )
