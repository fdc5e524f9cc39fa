"""UDF surface (SURVEY.md §2B "UDF surface"): the three Python
extension points, each oracle-checked by reproducing the same math in
plain SQL —

1. row-at-a-time Python UDF: exists for API completeness; registered
   for SQL use via spark.udf.register. THE SLOW PATH — pickled per
   row, breaks codegen; every docstring here says so and the hot-path
   operators elsewhere never use it.
2. scalar pandas_udf: Arrow-vectorized, ~10-100x the row UDF.
3. grouped-agg pandas_udf: custom aggregate (weighted mean) that
   composes with groupBy like a built-in.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import load_tables, t

# Cogroup bucket fan-out for cogroup_click_purchase_latency: a pure
# performance knob (per-group framework overhead amortization) that
# must NEVER change results — tests/test_invariants.py re-runs the
# operator under a different value and asserts identical output.
COGROUP_BUCKETS = 64


@register(
    "udf_python_row_clean_names",
    oracle="""
        SELECT s_suppkey,
               'SUP:' || upper(replace(s_name, 'Supplier#', '')) AS clean_name
        FROM supplier
        ORDER BY s_suppkey
    """,
    tags=("udf", "python-row"),
)
def udf_python_row_clean_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF registered for SQL use
    (spark.udf.register). Deliberately applied only to the smallest
    table — this path serializes every row through pickle and is
    10-100x slower than pandas_udf; it exists to cover the API."""

    def clean(name: str) -> str:
        return "SUP:" + name.replace("Supplier#", "").upper()

    spark.udf.register("clean_supplier_name", clean, T.StringType())
    load_tables(spark, sf_dir, names=("supplier",))
    return spark.sql(
        """
        SELECT s_suppkey, clean_supplier_name(s_name) AS clean_name
        FROM supplier ORDER BY s_suppkey
        """
    )


@register(
    "udf_pandas_scalar_risk_score",
    oracle="""
        SELECT c_custkey,
               round(1.0 / (1.0 + exp(-(c_acctbal / 1000.0 - 2.0))), 6)
                   AS risk_score
        FROM customer
        ORDER BY c_custkey
    """,
    tags=("udf", "pandas-scalar"),
)
def udf_pandas_scalar_risk_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: vectorized logistic score over Arrow
    batches — one numpy expression per batch, no per-row Python.
    (exp goes through libm on both engines — round-6.)"""

    @F.pandas_udf(T.DoubleType())
    def risk(bal: pd.Series) -> pd.Series:
        return 1.0 / (1.0 + np.exp(-(bal / 1000.0 - 2.0)))

    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey", F.round(risk("c_acctbal"), 6).alias("risk_score")
    ).orderBy("c_custkey")


@register(
    "udf_grouped_agg_weighted_mean",
    oracle="""
        SELECT c_nationkey,
               round(
                 CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))
                          * (c_custkey % 7 + 1)) AS DOUBLE)
                 / sum(c_custkey % 7 + 1), 6) AS weighted_bal
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    tags=("udf", "pandas-agg"),
)
def udf_grouped_agg_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: a custom weighted mean that
    composes with groupBy like a built-in aggregate. Weights are
    derived (custkey % 7 + 1) so the oracle can reproduce them.
    Numeric note: the UDF sums decimal-as-object exactly via int
    cents to stay order-independent, mirroring the engine-wide
    decimal-exact policy."""

    @F.pandas_udf(T.DoubleType())
    def wmean(bal: pd.Series, w: pd.Series) -> float:
        cents = np.rint(bal.to_numpy() * 100).astype(np.int64)
        wi = w.to_numpy().astype(np.int64)
        return float((cents * wi).sum()) / 100.0 / float(wi.sum())

    cust = t(spark, sf_dir, "customer").withColumn(
        "w", (F.col("c_custkey") % 7 + 1)
    )
    return (
        cust.groupBy("c_nationkey")
        .agg(F.round(wmean("c_acctbal", "w"), 6).alias("weighted_bal"))
        .orderBy("c_nationkey")
    )


@register(
    "cogroup_click_purchase_latency",
    oracle="""
        WITH p AS (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, ts FROM events WHERE event_type = 'click'
        ),
        m AS (
            SELECT p.user_id, p.ts,
                   (SELECT max(c.ts) FROM c
                    WHERE c.user_id = p.user_id AND c.ts <= p.ts)
                       AS click_ts
            FROM p
        )
        SELECT user_id,
               count(*) AS n_purchases,
               CAST(sum(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_matched,
               round(COALESCE(sum(epoch_us(ts) - epoch_us(click_ts)), 0)
                     / 1000000.0, 6) AS total_latency_sec
        FROM m
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("udf", "cogroup", "pandas", "asof"),
)
def cogroup_click_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth Python extension point: COGROUPED applyInPandas
    (`df.groupBy(k).cogroup(other.groupBy(k))`) — both sides shuffle
    once on user_id and arrive as aligned pandas frames, the shape for
    per-key algorithms that need BOTH relations in memory at once
    (here: pandas merge_asof matching each purchase to the user's
    latest prior click, the in-worker twin of the DataFrame as-of
    join in operators/temporal.py).

    Latency accumulates as exact int64 microseconds inside the worker
    and only the final fixed-power-of-10 division is floating —
    hash-stable against the oracle's epoch_us arithmetic.

    Scale/perf: the cogroup KEY is a hash BUCKET of the user, not the
    user itself — per-group Arrow+pandas framework overhead is paid
    per GROUP (~6 ms), so user-grained groups cost |users|·6 ms
    (measured 10 s for 1500 users at sf0.1) while 64 bucket groups
    amortize it to 1.6 s. Inside a bucket, `merge_asof(by=user_id)`
    does the per-user as-of matching vectorized across every user at
    once — identical results, and the group count is a knob
    independent of user cardinality (size it to cores × small
    constant at any scale). Same bucketing trick as the LSH per-task
    cap. No global collect anywhere."""
    # The two sides carry DISTINCT column names (c_ts / p_ts), not a
    # shared "ts": when a parent demands no output columns (count()),
    # Spark's attribute dedup for FlatMapCoGroupsInPandas drops the
    # right side's same-named non-key columns from the child scan and
    # the worker receives a key-only frame. Distinct names keep both
    # sides' payloads alive under any downstream pruning.
    n_buckets = COGROUP_BUCKETS
    ev = t(spark, sf_dir, "events")
    # EVERY payload column is side-prefixed (c_user/c_ts vs
    # p_user/p_ts) — the pruning hazard above applies to any shared
    # name, including user_id now that the cogroup key is the bucket
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.pmod("user_id", F.lit(n_buckets)).alias("bucket"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.pmod("user_id", F.lit(n_buckets)).alias("bucket"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )

    def per_bucket(key, clicks_pdf: pd.DataFrame, purch_pdf: pd.DataFrame):
        empty = pd.DataFrame(
            {
                "user_id": pd.Series(dtype="int64"),
                "n_purchases": pd.Series(dtype="int64"),
                "n_matched": pd.Series(dtype="int64"),
                "total_latency_sec": pd.Series(dtype="float64"),
            }
        )
        if purch_pdf.empty:
            return empty
        # merge_asof wants both sides sorted by the ON key; `by`
        # restricts matches to the same user within that order
        p = purch_pdf.sort_values("p_ts", kind="mergesort")
        if clicks_pdf.empty:
            user = p["p_user"].to_numpy()
            click_ns = np.full(len(p), np.iinfo("int64").min, dtype="int64")
        else:
            c = clicks_pdf.sort_values("c_ts", kind="mergesort")
            m = pd.merge_asof(
                p,
                c[["c_user", "c_ts"]],
                left_on="p_ts",
                right_on="c_ts",
                left_by="p_user",
                right_by="c_user",
                direction="backward",
            )
            user = m["p_user"].to_numpy()
            click_ns = (
                m["c_ts"].to_numpy("datetime64[ns]").astype("int64")
            )  # NaT -> int64 min sentinel
        ts_ns = p["p_ts"].to_numpy("datetime64[ns]").astype("int64")
        matched = click_ns != np.iinfo("int64").min
        # exact int64 µs; unmatched rows contribute 0 (diff vs self)
        lat_us = (ts_ns - np.where(matched, click_ns, ts_ns)) // 1000
        g = (
            pd.DataFrame(
                {
                    "user_id": user,
                    "matched": matched.astype("int64"),
                    "lat_us": lat_us,
                }
            )
            .groupby("user_id", sort=False)
            .agg(
                n_purchases=("matched", "size"),
                n_matched=("matched", "sum"),
                lat_us=("lat_us", "sum"),
            )
            .reset_index()
        )
        # k/1e6 carries at most 6 decimals — round(…, 6) is exact
        g["total_latency_sec"] = g.pop("lat_us") / 1_000_000
        return g

    out = (
        clicks.groupBy("bucket")
        .cogroup(purchases.groupBy("bucket"))
        .applyInPandas(
            per_bucket,
            "user_id long, n_purchases long, n_matched long,"
            " total_latency_sec double",
        )
    )
    return out.orderBy("user_id")
