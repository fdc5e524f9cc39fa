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
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS merged_eq_direct,
               TRUE AS within_err
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("sketch", "approx", "aggregate", "streaming-friendly"),
)
def sketch_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distinct-user rollup from mergeable HLL sketches:
    build a per-(event_type, day) sketch, then union the daily
    sketches per event_type — the raw events are read exactly once,
    and the second level aggregates kilobyte sketches, not users.

    Driver-checkable surface: the estimate value is
    sketch-implementation-specific, so the hashed output carries the
    EXACT distinct count and day count plus two invariant booleans the
    oracle pins TRUE — ``merged_eq_direct`` (the unioned daily
    sketches estimate EXACTLY equals a direct single-pass sketch over
    the raw events: same lgK ⇒ same register state, the mergeability
    guarantee) and ``within_err`` (estimate within 3× HLL's published
    ~1.04/√2^lgK relative error of exact)."""
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .cast("bigint")
        .alias("approx_users"),
        F.count("*").alias("n_days"),
    )
    direct = ev.groupBy("event_type").agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(HLL_LGK))))
        .cast("bigint")
        .alias("direct_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rel_err = 3 * 1.04 / (2.0**HLL_LGK) ** 0.5
    return (
        merged.join(direct, "event_type")
        .select(
            "event_type",
            "n_days",
            "exact_users",
            (F.col("approx_users") == F.col("direct_users")).alias(
                "merged_eq_direct"
            ),
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= rel_err * F.col("exact_users")
            ).alias("within_err"),
        )
        .orderBy("event_type")
    )


@register(
    "sketch_hll_builtin_rollup",
    oracle="""
        WITH per_type AS (
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
        ),
        total AS (
            SELECT 'ALL' AS event_type,
                   count(DISTINCT user_id) AS exact_users
            FROM events
        )
        SELECT event_type, exact_users, TRUE AS within_5pct
        FROM (SELECT * FROM per_type UNION ALL SELECT * FROM total)
        ORDER BY event_type
    """,
    tags=("sketch", "hll", "datasketches", "rollup"),
)
def sketch_hll_builtin_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's BUILT-IN Apache DataSketches HLL surface
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate, Spark
    3.5+), complementing the hand-rolled register-level rollup in
    `sketch_hll_mergeable_rollup`: per-type sketches aggregate once
    over the fact table, and the corpus-total row is a UNION OF
    SKETCHES — no second scan, the mergeability that makes HLL the
    100 TB cardinality workhorse.

    Driver-hashable by the exactness-bracket recipe (VERDICT r4 #4):
    the sketch estimate itself is deterministic but not portable to
    DuckDB, so the emitted columns are the EXACT distinct count plus
    a `within_5pct` accuracy verdict on the estimate (lgK=12 gives
    ~1.6% rse; 5% is a 3-sigma bound) — both engines agree on those,
    and a broken sketch path flips the boolean loudly."""
    ev = t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    total = per_type.agg(
        F.hll_union_agg("sk").alias("sk"),
        # exact total distinct must rescan (exact counts don't merge);
        # the SKETCH path is the one that avoids it — which is the
        # point being attested
        F.lit(None).cast("long").alias("exact_users"),
    ).withColumn("event_type", F.lit("ALL"))
    exact_total = ev.agg(F.count_distinct("user_id").alias("exact_total"))
    total = total.crossJoin(F.broadcast(exact_total)).select(
        "event_type", F.col("exact_total").alias("exact_users"), "sk"
    )
    unioned = per_type.select("event_type", "exact_users", "sk").unionByName(total)
    est = F.hll_sketch_estimate("sk")
    return (
        unioned.select(
            "event_type",
            "exact_users",
            (
                F.abs(est - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "bitmap_distinct_rollup",
    oracle="""
        WITH per_type AS (
            SELECT event_type,
                   count(DISTINCT user_id) AS n_distinct_users
            FROM events GROUP BY event_type
        ),
        total AS (
            SELECT 'ALL' AS event_type,
                   count(DISTINCT user_id) AS n_distinct_users
            FROM events
        )
        SELECT event_type, n_distinct_users
        FROM (SELECT * FROM per_type UNION ALL SELECT * FROM total)
        ORDER BY event_type
    """,
    tags=("sketch", "bitmap", "distinct", "rollup"),
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via Spark's bitmap functions
    (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the exact
    counterpart of the HLL rollup: per-(key, bucket) bitmaps build in
    one map-side-combinable scan, per-type counts sum the bucket
    bitmaps' bits, and the corpus-total row ORs the same bitmaps
    across types — no second scan and no Expand, which is how exact
    distinct rollups stay one-pass at 100 TB when the id domain is
    dense enough for bitmaps (user ids are). Agrees bit-for-bit with
    count(DISTINCT) in the oracle."""
    ev = t(spark, sf_dir, "events")
    base = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    base = base.localCheckpoint(eager=True)  # feeds per-type AND total
    per_type = base.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_distinct_users")
    )
    total = (
        base.groupBy("bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_distinct_users"))
        .select(F.lit("ALL").alias("event_type"), "n_distinct_users")
    )
    return per_type.unionByName(total).orderBy("event_type")
