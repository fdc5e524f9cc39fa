"""Mergeable-sketch aggregates (Apache DataSketches HLL, built into
Spark >= 3.5 as `hll_sketch_agg` / `hll_union_agg`).

Why this matters at 100 TB: exact `count(DISTINCT)` re-shuffles raw
keys for every rollup level, but a SKETCH is a mergeable partial
aggregate — build one per (fine-grained) partition or day, persist a
few KB each, then answer any coarser rollup (month, all-time, any
union of days) by merging sketches WITHOUT touching the raw data
again. That partial-aggregate reuse is the production pattern for
distinct-user dashboards over petabyte event logs.

No SQL oracle (estimates are sketch-algorithm-specific); correctness
is pinned by tests/test_invariants.py: the merged daily rollup must
EQUAL the direct single-pass estimate (same lgK -> same sketch state),
and the estimate must sit within HLL's published error envelope of
the exact distinct count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

HLL_LGK = 12  # 2^12 registers -> ~1.6% relative standard error


@register(
    "sketch_hll_mergeable_rollup",
    oracle=None,  # approximate; invariants asserted in tests
    tags=("sketch", "approx", "aggregate", "streaming-friendly"),
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user rollup from mergeable HLL sketches:
    build a per-(event_type, day) sketch, then union the daily
    sketches per event_type — the raw events are read exactly once,
    and the second level aggregates kilobyte sketches, not users.
    Output: per event_type, the merged estimate (rounded to a long),
    the day count, and the direct exact distinct for reference."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk"))).cast("bigint").alias(
            "approx_users"
        ),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").orderBy("event_type")
