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


# Count-min sketch geometry: d=3 hash rows x w=1024 counters. The hash
# family is plain modular arithmetic ((k%P)*A + B) % P % w — portable
# to any SQL engine, and reducing k mod P FIRST keeps the product
# within int64 for arbitrarily large 100 TB-scale keys.
_CMS_P = 2147483647
_CMS_W = 1024
_CMS_ROWS = ((1103515245, 12345), (1299709, 54321), (15485863, 98765))


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
        WITH rows_ AS (
            {' UNION ALL '.join(
                f'''SELECT {r} AS r,
                       ((l_partkey % {_CMS_P}) * {a} + {b})
                           % {_CMS_P} % {_CMS_W} AS b
                FROM lineitem'''
                for r, (a, b) in enumerate(_CMS_ROWS)
            )}
        ),
        counters AS (
            SELECT r, b, count(*) AS c FROM rows_ GROUP BY r, b
        ),
        exact AS (
            SELECT l_partkey, count(*) AS n
            FROM lineitem GROUP BY l_partkey
            ORDER BY n DESC, l_partkey LIMIT 10
        ),
        probes AS (
            {' UNION ALL '.join(
                f'''SELECT l_partkey, n, {r} AS r,
                       ((l_partkey % {_CMS_P}) * {a} + {b})
                           % {_CMS_P} % {_CMS_W} AS b
                FROM exact'''
                for r, (a, b) in enumerate(_CMS_ROWS)
            )}
        )
        SELECT l_partkey, n AS exact_n,
               CAST(min(c) AS BIGINT) AS cms_est,
               CAST(min(c) - n AS BIGINT) AS overestimate
        FROM probes JOIN counters USING (r, b)
        GROUP BY l_partkey, n
        ORDER BY exact_n DESC, l_partkey
    """,
    tags=("sketch", "count-min", "heavy-hitters", "mergeable"),
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates for the top-10 heaviest
    parts, audited against exact counts. The sketch state is a FIXED
    3x1024 counter grid regardless of data volume — built in one scan
    with map-side combine (the explode happens before the aggregate,
    so each task ships at most 3072 partial counters), mergeable
    across partitions/days by cell-wise addition, and probed with a
    broadcast join of the 10 candidates against the tiny counter
    table. That bounded-state mergeability is why CMS (not exact
    counts) backs per-key frequency monitors over 100 TB streams.

    Unlike HLL, every number here is exact integer arithmetic over a
    portable hash family, so the ESTIMATE ITSELF is driver-hashable —
    the oracle reproduces the full sketch, and the overestimate
    column doubles as the CMS guarantee (est >= exact, always)."""
    li = t(spark, sf_dir, "lineitem")
    pm = F.col("l_partkey") % _CMS_P

    def bucket(a: int, b: int):
        return (pm * a + b) % _CMS_P % _CMS_W

    cells = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"), bucket(a, b).alias("b")
                    )
                    for r, (a, b) in enumerate(_CMS_ROWS)
                ]
            )
        ).alias("rb")
    ).select("rb.r", "rb.b")
    counters = cells.groupBy("r", "b").agg(F.count("*").alias("c"))

    exact = (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "l_partkey")
        .limit(10)
    )
    epm = F.col("l_partkey") % _CMS_P
    probes = exact.select(
        "l_partkey",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        ((epm * a + b) % _CMS_P % _CMS_W).alias("b"),
                    )
                    for r, (a, b) in enumerate(_CMS_ROWS)
                ]
            )
        ).alias("rb"),
    ).select("l_partkey", "n", "rb.r", "rb.b")
    return (
        F.broadcast(probes)
        .join(counters, ["r", "b"])
        .groupBy("l_partkey", "n")
        .agg(F.min("c").alias("est"))
        .select(
            "l_partkey",
            F.col("n").alias("exact_n"),
            F.col("est").cast("bigint").alias("cms_est"),
            (F.col("est") - F.col("n")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("exact_n"), "l_partkey")
    )


# Bloom filter geometry: m=8192 bits, k=3 hashes from the same
# portable modular family as the CMS above.
_BLOOM_M = 8192


@register(
    "sketch_bloom_membership_audit",
    oracle=f"""
        WITH members AS (
            SELECT DISTINCT o_custkey AS k FROM orders
            WHERE o_orderpriority = '1-URGENT'
        ),
        bits AS (
            SELECT DISTINCT r, pos FROM (
                {' UNION ALL '.join(
                    f'''SELECT {r} AS r,
                           ((k % {_CMS_P}) * (k % {_CMS_P}) % {_CMS_P}
                            * {a} + {b}) % {_CMS_P} % {_BLOOM_M} AS pos
                    FROM members'''
                    for r, (a, b) in enumerate(_CMS_ROWS)
                )}
            )
        ),
        probes AS (
            {' UNION ALL '.join(
                f'''SELECT c_custkey, {r} AS r,
                       ((c_custkey % {_CMS_P}) * (c_custkey % {_CMS_P})
                        % {_CMS_P} * {a} + {b})
                           % {_CMS_P} % {_BLOOM_M} AS pos
                FROM customer'''
                for r, (a, b) in enumerate(_CMS_ROWS)
            )}
        ),
        verdicts AS (
            SELECT p.c_custkey,
                   count(bits.r) = 3 AS maybe
            FROM probes p LEFT JOIN bits
                ON p.r = bits.r AND p.pos = bits.pos
            GROUP BY p.c_custkey
        ),
        labeled AS (
            SELECT v.c_custkey, v.maybe,
                   m.k IS NOT NULL AS is_member
            FROM verdicts v LEFT JOIN members m ON v.c_custkey = m.k
        )
        SELECT CAST(count(CASE WHEN is_member THEN 1 END) AS BIGINT)
                   AS n_members,
               CAST(count(*) AS BIGINT) AS n_probes,
               CAST(count(CASE WHEN maybe THEN 1 END) AS BIGINT) AS n_maybe,
               CAST(count(CASE WHEN is_member AND NOT maybe THEN 1 END)
                   AS BIGINT) AS false_negatives,
               CAST(count(CASE WHEN maybe AND NOT is_member THEN 1 END)
                   AS BIGINT) AS false_positives,
               CAST(count(CASE WHEN maybe AND NOT is_member THEN 1 END)
                    AS DOUBLE)
                   / count(CASE WHEN NOT is_member THEN 1 END) AS fpr
        FROM labeled
    """,
    tags=("sketch", "bloom-filter", "membership", "mergeable"),
)
def sketch_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter built over 'customers with an URGENT
    order', probed by every customer, audited against the exact
    semi-join. The filter is a FIXED k*m = 3x8192 bit set no matter
    how many members feed it: member keys hash map-side, the DISTINCT
    (row, bit) dedup partial-aggregates before its shuffle (the
    shuffle carries at most 24576 rows per task), and the probe side
    joins against the broadcast bit table — the shape that replaces a
    100 TB semi-join with a kilobyte filter when a few percent false
    positives are acceptable (and why engines inject runtime bloom
    filters into joins; here the filter is a first-class queryable
    artifact).

    Every column is exact integer arithmetic over the portable hash
    family, so the audit is fully driver-hashable: false_negatives is
    pinned 0 (the Bloom guarantee), and fpr is the measured
    false-positive rate among true non-members (an unrounded division
    of exact counts — bit-identical IEEE in both engines)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    members = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def positions(col, m: int):
        # quadratic mixing ((k^2 mod P)*a + b): an affine-only hash of
        # CONTIGUOUS surrogate keys maps members onto arithmetic
        # progressions, which collapses the measured FPR to an
        # unrepresentative 0 — squaring first breaks the structure
        # while staying exact int64 arithmetic in both engines
        km = col % _CMS_P
        km2 = km * km % _CMS_P
        return F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    ((km2 * a + b) % _CMS_P % m).alias("pos"),
                )
                for r, (a, b) in enumerate(_CMS_ROWS)
            ]
        )

    bits = (
        members.select(F.explode(positions(F.col("k"), _BLOOM_M)).alias("rp"))
        .select("rp.r", "rp.pos")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probes = cust.select(
        "c_custkey",
        F.explode(positions(F.col("c_custkey"), _BLOOM_M)).alias("rp"),
    ).select("c_custkey", "rp.r", "rp.pos")
    verdicts = (
        probes.join(F.broadcast(bits), ["r", "pos"], "left")
        .groupBy("c_custkey")
        .agg((F.count("present") == 3).alias("maybe"))
    )
    labeled = verdicts.join(
        F.broadcast(members), verdicts.c_custkey == members.k, "left"
    ).select("c_custkey", "maybe", F.col("k").isNotNull().alias("is_member"))
    member = F.when(F.col("is_member"), 1)
    return labeled.agg(
        F.count(member).cast("bigint").alias("n_members"),
        F.count("*").cast("bigint").alias("n_probes"),
        F.count(F.when(F.col("maybe"), 1)).cast("bigint").alias("n_maybe"),
        F.count(F.when(F.col("is_member") & ~F.col("maybe"), 1))
        .cast("bigint")
        .alias("false_negatives"),
        F.count(F.when(F.col("maybe") & ~F.col("is_member"), 1))
        .cast("bigint")
        .alias("false_positives"),
        (
            F.count(F.when(F.col("maybe") & ~F.col("is_member"), 1)).cast(
                "double"
            )
            / F.count(F.when(~F.col("is_member"), 1))
        ).alias("fpr"),
    )


# KMV (k-minimum-values) sketch size. rse ~ 1/sqrt(k) ~ 12.5%.
_KMV_K = 64


@register(
    "sketch_kmv_intersection",
    oracle="""
        WITH c AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        )
        SELECT CAST(64 AS INT) AS kmv_k,
               CAST((SELECT count(*) FROM c) AS BIGINT) AS exact_click_users,
               CAST((SELECT count(*) FROM p) AS BIGINT)
                   AS exact_purchase_users,
               CAST((SELECT count(*) FROM c JOIN p USING (user_id))
                   AS BIGINT) AS exact_both_users,
               CAST(1 AS INT) AS union_within_err,
               CAST(1 AS INT) AS intersect_within_err
    """,
    tags=("sketch", "kmv", "set-intersection", "mergeable"),
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketches with SET INTERSECTION — the
    operation HLL cannot do (HLL unions only; intersection needs
    inclusion-exclusion with exploding error): keep the k=64 smallest
    xxhash64 values per user set, estimate the union cardinality from
    the k-th smallest of the merged sketch ((k-1)/u_k), and the
    intersection via the Jaccard fraction of merged-sketch members
    present in BOTH input sketches — distinct-users-who-click AND
    purchase from two kilobyte summaries. When a set has fewer than k
    distinct members its sketch IS the set and the estimate is exact.

    Driver-hashable by the exactness-bracket recipe: hash values are
    engine-local (xxhash64), so the output carries the EXACT
    cardinalities plus two accuracy verdicts the oracle pins TRUE
    (union within 3/sqrt(k)~37%; intersection within 50% or +-1 —
    J*D error compounds).

    Scale: per-type k-min is a bounded-state mergeable summary (here
    a per-type window over distinct user hashes; at fleet scale a
    bottom-k partial aggregate), and everything after the k-row
    sketches is driver-free DataFrame algebra on <=2k rows."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    hashed = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .select(
            "event_type",
            "user_id",
            F.xxhash64("user_id").alias("h"),
        )
    )
    w = W.partitionBy("event_type").orderBy("h")
    kmv = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .select("event_type", "h")
    )
    kmv = kmv.localCheckpoint(eager=True)  # reused 3x below
    a = kmv.filter(F.col("event_type") == "click").select("h")
    b = kmv.filter(F.col("event_type") == "purchase").select("h")
    merged = a.unionByName(b).distinct().orderBy("h").limit(_KMV_K)
    am = a.withColumnRenamed("h", "ha")
    bm = b.withColumnRenamed("h", "hb")
    marked = (
        merged.join(F.broadcast(am), merged.h == am.ha, "left")
        .join(F.broadcast(bm), merged.h == bm.hb, "left")
        .select(
            "h",
            F.col("ha").isNotNull().cast("int").alias("in_a"),
            F.col("hb").isNotNull().cast("int").alias("in_b"),
        )
    )
    # u in [0,1): signed int64 hash shifted into the unit interval
    u = (F.col("h").cast("double") / F.lit(2.0**64)) + 0.5
    stats = marked.agg(
        F.count("*").alias("m"),
        F.max(u).alias("u_k"),
        F.sum(
            (F.col("in_a") * F.col("in_b")).cast("long")
        ).alias("n_both"),
    )
    exact = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_types"))
        .agg(
            F.count("*").alias("exact_union"),
            F.count(F.when(F.col("n_types") == 2, 1)).alias("exact_both"),
        )
    )
    per_type = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .groupBy()
        .pivot("event_type", ["click", "purchase"])
        .sum("n")
    )
    est = (
        stats.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(per_type))
    )
    d_union = F.when(
        F.col("m") < _KMV_K, F.col("m").cast("double")
    ).otherwise((F.lit(_KMV_K - 1)) / F.col("u_k"))
    j_est = F.col("n_both").cast("double") / F.col("m")
    d_both = j_est * d_union
    return est.select(
        F.lit(_KMV_K).cast("int").alias("kmv_k"),
        F.col("click").cast("bigint").alias("exact_click_users"),
        F.col("purchase").cast("bigint").alias("exact_purchase_users"),
        F.col("exact_both").cast("bigint").alias("exact_both_users"),
        (
            F.abs(d_union - F.col("exact_union"))
            <= 0.375 * F.col("exact_union")
        )
        .cast("int")
        .alias("union_within_err"),
        (
            F.abs(d_both - F.col("exact_both"))
            <= F.greatest(
                0.5 * F.col("exact_both"), F.lit(1.0)
            )
        )
        .cast("int")
        .alias("intersect_within_err"),
    )
