"""Product-analytics operators over the event stream — ordered funnel
conversion and signup-cohort retention, the two queries every
clickstream warehouse runs daily (reference scope: the events fixture;
extends the temporal family in operators/temporal.py).

Scale posture: both operators reduce events to one row per (user,
stage) / (user, week) BEFORE any join, so the shuffled relations are
user-cardinality, not event-cardinality — at 100 TB of raw events the
heavy table is collapsed by a map-side-combinable min()/distinct
aggregation on the natural user_id partitioning, and every subsequent
join is user-sized. No window over the raw event stream, no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark import api
from spark_hive_spark.functions.numeric import sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# Ordered funnel: a user converts to a stage only with an event
# STRICTLY AFTER their conversion time for the previous stage — the
# standard "ordered funnel" semantics (not windowed-funnel).
_FUNNEL_ORACLE = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        UNION ALL
        SELECT 2, 'click', count(*) FROM c
        UNION ALL
        SELECT 3, 'purchase', count(*) FROM p
    )
    SELECT stage_idx, stage, n_users,
           CAST(n_users AS DOUBLE)
               / lag(n_users, 1, n_users) OVER (ORDER BY stage_idx)
               AS conv_from_prev
    FROM stages
    ORDER BY stage_idx
"""


@register(
    "funnel_view_click_purchase",
    oracle=_FUNNEL_ORACLE,
    tags=("analytics", "funnel", "events"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel: per stage, the number
    of users whose stage event strictly follows their previous-stage
    conversion time, plus the step conversion rate.

    Plan shape: three user-grain min() aggregations chained by
    user_id equi-joins — each join input is |users|, never |events|;
    the per-stage candidate filter (event_type pushdown) reaches the
    parquet scan. conv_from_prev is a single IEEE division of two
    exact counts (bit-identical in any engine, no rounding needed);
    the lag window runs over the 3-row stage summary, not data.

    Implementation: `api.funnel` — the parameterized N-step former
    (steps=..., user_col=..., ts_col=...); this query pins its
    3-step instantiation against the SQL oracle. The /0 semantics
    note lives in the api docstring: only the FIRST stage's missing
    lag defaults to its own count (ratio 1.0); a later empty stage
    yields NULL in both engines (try_divide here, native /0 there)."""
    return api.funnel(
        t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


_RETENTION_ORACLE = """
    WITH s AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    act AS (
        SELECT DISTINCT s.user_id,
               strftime(date_trunc('week', s.cohort_day), '%Y-%m-%d')
                   AS cohort_week,
               datediff('day', s.cohort_day, CAST(e.ts AS DATE)) // 7
                   AS week_offset
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE CAST(e.ts AS DATE) >= s.cohort_day
    )
    SELECT cohort_week, week_offset, count(*) AS n_active_users
    FROM act
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
"""


@register(
    "retention_signup_cohorts",
    oracle=_RETENTION_ORACLE,
    tags=("analytics", "retention", "cohort", "events"),
)
def retention_signup_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: users grouped into weekly signup
    cohorts (Monday-truncated week of their first signup), counted as
    active in week-offset k if ANY event falls k weeks after their
    cohort day.

    Plan shape: signup min() collapses events to user grain; one
    user_id equi-join tags each event with its owner's cohort; the
    DISTINCT collapses to (user, cohort, offset) before the final
    count — so the last aggregation's input is bounded by
    |users| x |weeks|, not |events|. All shuffles are on user_id or
    the small (cohort, offset) key. Integer week arithmetic only —
    no float in any key."""
    events = t(spark, sf_dir, "events")
    s = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("cohort_day"))
    )
    act = (
        events.select("user_id", F.to_date("ts").alias("d"))
        .join(s, "user_id")
        .filter(F.col("d") >= F.col("cohort_day"))
        .select(
            "user_id",
            # ISO string, not DATE: engines' date→dataframe mappings
            # disagree on rendering (date vs midnight timestamp), and
            # the driver hashes stringified values
            F.date_format(F.date_trunc("week", F.col("cohort_day")), "yyyy-MM-dd")
            .alias("cohort_week"),
            # `div` = integer division; identical to DuckDB's `//`
            # for the non-negative offsets the filter guarantees
            F.expr("datediff(d, cohort_day) div 7").alias("week_offset"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


_ROLLING_ORACLE = """
    SELECT event_id, user_id, ts,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
               AS val_last_hour
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
    )
    ORDER BY event_id
"""


@register(
    "w_rolling_hour_user_value",
    oracle=_ROLLING_ORACLE,
    tags=("analytics", "window-frame", "range-between", "events"),
)
def w_rolling_hour_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event, the trailing-1-hour activity of its user: event count
    and exact-decimal value sum over a RANGE frame keyed on epoch
    microseconds — the time-based window-frame surface (rangeBetween),
    distinct from the tumbling/sliding bucketed windows.

    Determinism: the frame is defined by the ORDER-BY VALUE range, so
    peer-row (duplicate-timestamp) ordering cannot change membership,
    and the decimal sum is order-independent — exact in both engines.

    Scale posture: one shuffle on user_id, then a sorted scan per
    partition with a sliding two-pointer frame — linear in events per
    user, no self-join, no explode. The natural plan for trailing
    aggregates at 100 TB."""
    from spark_hive_spark.functions.numeric import dec

    events = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            F.count("*").over(w).alias("n_last_hour"),
            F.sum(dec("value")).over(w).cast("double").alias("val_last_hour"),
        )
        .orderBy("event_id")
    )


_RFM_ORACLE = """
    WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS a FROM events),
    u AS (
        SELECT user_id,
               datediff('day', max(CAST(ts AS DATE)), (SELECT a FROM anchor))
                   AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT user_id, recency_days, frequency, monetary,
           ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS r_bucket,
           ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_bucket,
           ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_bucket
    FROM u
    ORDER BY user_id
"""


@register(
    "rfm_user_scores",
    oracle=_RFM_ORACLE,
    tags=("analytics", "rfm", "ntile", "events"),
)
def rfm_user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over purchase events: per-user recency (days
    since last purchase, anchored at the corpus max date so the result
    is reproducible), frequency, exact-decimal monetary, and quintile
    buckets for each (bucket 1 = best). Every ntile ordering carries a
    user_id tie-break, so bucket assignment is a total order both
    engines agree on.

    Scale posture: the input to the ntile sorts is USER-grain (one row
    per purchasing user), collapsed by a map-side-combinable aggregate
    from event grain; the global sort a windowed ntile needs is over
    that reduced set. At extreme user counts the same scores come from
    approx-quantile bucket edges (percentile_approx + width_bucket)
    without a global sort — this operator keeps exact ntile semantics
    so it can BE the oracle for that variant."""
    from spark_hive_spark.functions.numeric import dsum

    events = t(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.to_date("ts")).alias("a"))
    u = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_purchase"),
            F.count("*").alias("frequency"),
            dsum("value").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("a", "last_purchase").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    return (
        u.select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            F.ntile(5).over(W.orderBy(F.col("recency_days").asc(), "user_id")).alias("r_bucket"),
            F.ntile(5).over(W.orderBy(F.col("frequency").desc(), "user_id")).alias("f_bucket"),
            F.ntile(5).over(W.orderBy(F.col("monetary").desc(), "user_id")).alias("m_bucket"),
        )
        .orderBy("user_id")
    )


@register(
    "rfm_user_scores_approx",
    oracle=None,  # approx bucket EDGES differ from exact ntile at
    # boundaries; invariant tests assert agreement + monotonicity
    # against rfm_user_scores (the exact twin IS the oracle).
    tags=("analytics", "rfm", "approx", "scale-path"),
)
def rfm_user_scores_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path RFM: quintile bucket EDGES from percentile_approx
    (one pass, mergeable sketch, no global sort), then a row-local
    bucket assignment — the plan that replaces exact ntile when the
    user table itself is cluster-sized. Semantics match
    `rfm_user_scores` up to edge-tie placement; the exact twin serves
    as its oracle in tests/test_invariants.py (agreement floor +
    bucket monotonicity).

    Plan shape: user-grain aggregate (as the exact twin), a 1-row
    edges aggregate broadcast back, and a map-side CASE per metric —
    zero sorts, two shuffles total (user groupBy + the scalar agg)."""
    from spark_hive_spark.functions.numeric import dsum

    events = t(spark, sf_dir, "events")
    anchor = events.agg(F.max(F.to_date("ts")).alias("a"))
    u = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_purchase"),
            F.count("*").alias("frequency"),
            dsum("value").alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("a", "last_purchase").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    edges = u.agg(
        F.percentile_approx("recency_days", [0.2, 0.4, 0.6, 0.8], 10_000).alias("re"),
        F.percentile_approx("frequency", [0.2, 0.4, 0.6, 0.8], 10_000).alias("fe"),
        F.percentile_approx("monetary", [0.2, 0.4, 0.6, 0.8], 10_000).alias("me"),
    )

    def asc_bucket(col: str, e: str):  # smaller value => bucket 1
        b = F.lit(1)
        for i in range(4):
            b = b + (F.col(col) > F.col(e).getItem(i)).cast("int")
        return b

    def desc_bucket(col: str, e: str):  # larger value => bucket 1
        b = F.lit(1)
        for i in range(4):
            b = b + (F.col(col) < F.col(e).getItem(3 - i)).cast("int")
        return b

    return (
        u.crossJoin(F.broadcast(edges))
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary",
            asc_bucket("recency_days", "re").alias("r_bucket"),
            desc_bucket("frequency", "fe").alias("f_bucket"),
            desc_bucket("monetary", "me").alias("m_bucket"),
        )
        .orderBy("user_id")
    )


_TRANSITIONS_ORACLE = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n,
           CAST(count(*) AS DOUBLE)
               / sum(count(*)) OVER (PARTITION BY prev_type) AS p_next
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
"""


@register(
    "events_type_transitions",
    oracle=_TRANSITIONS_ORACLE,
    tags=("analytics", "sequence", "markov", "events"),
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for each ordered pair
    of consecutive event types within a user's timeline, the count and
    the row-normalized transition probability — the Markov-chain
    summary behind next-action prediction and bot detection.

    Determinism: the lag ordering carries an event_id tie-break for
    duplicate timestamps; p_next is one IEEE division of exact counts
    (the window-sum denominator is an integer), so no rounding is
    needed.

    Scale posture: one shuffle on user_id for the lag, then the pair
    aggregate collapses to |types|² rows — the probability
    normalization runs on that tiny matrix. Event-grain work is one
    linear pass."""
    events = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    wp = W.partitionBy("prev_type")
    return (
        counts.select(
            "prev_type",
            "next_type",
            "n",
            (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p_next"),
        )
        .orderBy("prev_type", "next_type")
    )


_ANOMALY_ORACLE = """
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
               event_type, count(*) AS n
        FROM events
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT hour_start, event_type, n,
               avg(n) OVER (PARTITION BY event_type) AS mean_n,
               stddev_samp(n) OVER (PARTITION BY event_type) AS sd_n
        FROM hourly
    )
    SELECT hour_start, event_type, n,
           round((n - mean_n) / sd_n, 6) AS zscore,
           abs((n - mean_n) / sd_n) > 2.0 AS is_anomaly
    FROM stats
    WHERE sd_n > 0
    ORDER BY event_type, hour_start
"""


@register(
    "events_hourly_anomaly",
    oracle=_ANOMALY_ORACLE,
    tags=("analytics", "anomaly", "zscore", "events"),
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: z-score of each (hour, event_type)
    bucket's event count against that type's hourly distribution, with
    the standard |z| > 2 flag — the ops query behind alerting on
    traffic spikes/drops.

    Determinism: counts are exact integers; mean is an exact-integer
    sum divided once; stddev is irrational so the z-score carries the
    engine-wide round-6 (half-boundaries are measure-zero there). The
    flag compares the UNROUNDED z, identically in both engines.

    Scale posture: events collapse to (hour x type) buckets in one
    map-side-combinable aggregate; the stats window runs over that
    small bucket table partitioned by type. Nothing downstream of the
    first aggregate scales with raw volume."""
    events = t(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    wt = W.partitionBy("event_type")
    z = (F.col("n") - F.avg("n").over(wt)) / F.stddev_samp("n").over(wt)
    return (
        hourly.withColumn("sd_n", F.stddev_samp("n").over(wt))
        .filter(F.col("sd_n") > 0)
        .select(
            "hour_start",
            "event_type",
            "n",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > 2.0).alias("is_anomaly"),
        )
        .orderBy("event_type", "hour_start")
    )


_FUNNEL_7D_ORACLE = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
          AND e.ts <= v.t1 + INTERVAL '7 days'
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
          AND e.ts <= c.t2 + INTERVAL '7 days'
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        UNION ALL SELECT 2, 'click', count(*) FROM c
        UNION ALL SELECT 3, 'purchase', count(*) FROM p
    )
    SELECT stage_idx, stage, n_users,
           CAST(n_users AS DOUBLE)
               / lag(n_users, 1, n_users) OVER (ORDER BY stage_idx)
               AS conv_from_prev
    FROM stages
    ORDER BY stage_idx
"""


@register(
    "funnel_windowed_7d",
    oracle=_FUNNEL_7D_ORACLE,
    tags=("analytics", "funnel", "windowed", "events"),
)
def funnel_windowed_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed-funnel variant of `funnel_view_click_purchase`: each
    step must land within 7 days of the previous step's conversion —
    the semantics product analytics tools call a 'conversion window',
    which separates genuine journeys from coincidental far-future
    events. Same user-grain join plan as the ordered funnel; the
    window bound is a residual predicate on the same equi-join."""
    events = t(spark, sf_dir, "events")

    def stage_within(prev: DataFrame, etype: str, prev_ts: str, out_ts: str) -> DataFrame:
        cand = events.filter(F.col("event_type") == etype)
        if prev is None:
            grp = cand
        else:
            grp = cand.join(prev, "user_id").filter(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + F.expr("INTERVAL 7 DAYS"))
            )
        return grp.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = stage_within(None, "view", "", "t1")
    c = stage_within(v, "click", "t1", "t2")
    p = stage_within(c, "purchase", "t2", "t3")
    stages = (
        v.agg(F.lit(1).alias("stage_idx"), F.lit("view").alias("stage"),
              F.count("*").alias("n_users"))
        .unionByName(c.agg(F.lit(2).alias("stage_idx"), F.lit("click").alias("stage"),
                           F.count("*").alias("n_users")))
        .unionByName(p.agg(F.lit(3).alias("stage_idx"), F.lit("purchase").alias("stage"),
                           F.count("*").alias("n_users")))
    )
    w = W.orderBy("stage_idx")
    # same null semantics as funnel_view_click_purchase: first row's
    # missing lag defaults to its own count; a 0-user stage divides to
    # NULL in both engines instead of coalescing to 1.0
    prev = F.coalesce(F.lag("n_users", 1).over(w), F.col("n_users"))
    return (
        stages.withColumn(
            "conv_from_prev",
            F.try_divide(F.col("n_users").cast("double"), prev.cast("double")),
        )
        .orderBy("stage_idx")
    )


_REPEAT_ORDERS_ORACLE = """
    SELECT a.o_custkey AS c_custkey,
           count(*) AS n_repeat_pairs,
           min(datediff('day', CAST(a.o_orderdate AS DATE),
                        CAST(b.o_orderdate AS DATE))) AS min_gap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND b.o_orderdate > a.o_orderdate
     AND b.o_orderdate <= a.o_orderdate + INTERVAL '7 days'
    GROUP BY a.o_custkey
    ORDER BY c_custkey
"""


@register(
    "repeat_orders_within_week",
    oracle=_REPEAT_ORDERS_ORACLE,
    tags=("analytics", "self-join", "range-join", "orders"),
)
def repeat_orders_within_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase detection: ordered pairs of a customer's orders
    placed within 7 days of each other — the self-range-join shape
    behind churn/loyalty features (distinct from the events range join,
    which pairs two DIFFERENT streams).

    Scale posture: the self-join is equi on o_custkey (one shuffle,
    both sides co-partitioned) with the time window as residual; pair
    blowup is bounded by orders-per-customer-per-week, which data
    skew aside is O(1). AQE's skew-join handles the heavy customer
    tail."""
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    a = o.toDF("c_custkey", "d1")
    b = o.toDF("c_custkey", "d2")
    pairs = a.join(b, "c_custkey").filter(
        (F.col("d2") > F.col("d1"))
        & (F.col("d2") <= F.col("d1") + F.expr("INTERVAL 7 DAYS"))
    )
    return (
        pairs.groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_repeat_pairs"),
            F.min(F.datediff(F.to_date("d2"), F.to_date("d1"))).alias(
                "min_gap_days"
            ),
        )
        .orderBy("c_custkey")
    )


_RATIO_ORACLE = """
    WITH cust_rev AS (
        SELECT n_name, c_custkey,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        GROUP BY n_name, c_custkey
    )
    -- the decimal sum stays un-cast through the window aggregate and
    -- becomes DOUBLE only at the final division, mirroring the
    -- implementation exactly (a per-customer DOUBLE window-sum would
    -- diverge by an ulp on round-6 boundaries at larger row counts)
    SELECT n_name, c_custkey,
           CAST(rev_dec AS DOUBLE) AS revenue,
           round(
               CAST(rev_dec AS DOUBLE)
               / CAST(sum(rev_dec) OVER (PARTITION BY n_name) AS DOUBLE),
               6
           ) AS share_of_nation
    FROM cust_rev
    ORDER BY n_name, c_custkey
"""


@register(
    "ratio_to_report_customer_revenue",
    oracle=_RATIO_ORACLE,
    tags=("analytics", "ratio-to-report", "window"),
)
def ratio_to_report_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their nation's total
    order revenue — the percent-of-total window pattern every BI layer
    ships. Revenue aggregates in exact decimal; the share is one IEEE
    division of two exact sums, rounded 6 (the denominator window-sum
    is itself decimal-exact, so the division is the only float op).

    Scale posture: the customer-grain aggregate shuffles once on
    (nation, customer); the share window re-partitions only the
    aggregated customer rows by nation. nation broadcast onto
    customer."""
    from spark_hive_spark.functions.numeric import dec

    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    rev = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    )
    wn = W.partitionBy("n_name")
    return (
        rev.select(
            "n_name",
            "c_custkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(wn).cast("double"),
                6,
            ).alias("share_of_nation"),
        )
        .orderBy("n_name", "c_custkey")
    )


@register(
    "rfm_approx_audit",
    oracle="""
        SELECT m.metric,
               (SELECT count(DISTINCT user_id) FROM events
                WHERE event_type = 'purchase') AS n_users,
               CAST(0 AS BIGINT) AS tie_split_violations,
               CAST(0 AS BIGINT) AS monotonicity_violations,
               TRUE AS tie_free_agreement_ok
        FROM (VALUES ('frequency'), ('monetary'), ('recency_days'))
             AS m(metric)
        ORDER BY m.metric
    """,
    tags=("analytics", "rfm", "audit", "approx"),
)
def rfm_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable contract check for `rfm_user_scores_approx`
    (the rows-only scale path): per metric it emits the three
    properties the invariant suite asserts, computed distributedly —
    (1) tie splits: metric values mapped to more than one bucket
    (edge bucketing must keep ties together; exact ntile cannot),
    (2) monotonicity violations: buckets must be monotone in the
    metric, (3) >=90% agreement with the exact-ntile twin on
    tie-free values. The oracle pins zero violations and the
    agreement verdict, and reproduces n_users independently — so a
    broken percentile-edge path flips a driver row."""
    exact = rfm_user_scores(spark, sf_dir).localCheckpoint(eager=True)
    approx = rfm_user_scores_approx(spark, sf_dir).localCheckpoint(eager=True)
    both = approx.alias("a").join(
        exact.alias("e"), F.col("a.user_id") == F.col("e.user_id")
    )

    rows = []
    for metric, col, reverse in (
        ("frequency", "f_bucket", True),
        ("monetary", "m_bucket", True),
        ("recency_days", "r_bucket", False),
    ):
        n_users = approx.agg(F.count("*").alias("n_users"))
        ties = (
            approx.groupBy(metric)
            .agg(F.count_distinct(col).alias("nb"))
            .filter(F.col("nb") > 1)
            .agg(F.count("*").alias("tie_split_violations"))
        )
        # sorted ascending by metric: buckets must be nondecreasing
        # (recency: higher = worse = higher bucket) or nonincreasing
        # (frequency/monetary: higher = better = lower bucket)
        w = W.orderBy(metric, "user_id").rowsBetween(
            W.unboundedPreceding, -1
        )
        if reverse:
            bad = F.col(col) > F.min(col).over(w)
        else:
            bad = F.col(col) < F.max(col).over(w)
        mono = approx.select(
            F.coalesce(bad, F.lit(False)).alias("bad")
        ).agg(F.sum(F.col("bad").cast("long")).alias("monotonicity_violations"))
        counts = approx.groupBy(metric).agg(F.count("*").alias("n_same"))
        # `both` carries every metric column twice (approx + exact
        # side); project to unambiguous names BEFORE the using-column
        # join so it doesn't ride on ambiguous-reference resolution
        # that other Spark versions reject (AMBIGUOUS_REFERENCE).
        pair = both.select(
            F.col(f"a.{metric}").alias(metric),
            F.col(f"a.{col}").alias("a_bucket"),
            F.col(f"e.{col}").alias("e_bucket"),
        )
        tf = (
            pair.join(counts, metric)
            .filter(F.col("n_same") == 1)
            .agg(
                F.count("*").alias("n_tf"),
                F.sum(
                    (F.col("a_bucket") == F.col("e_bucket")).cast("long")
                ).alias("n_agree"),
            )
            .select(
                # vacuously true below 20 tie-free users: a 0.9 rate
                # on a handful of boundary samples is noise (the
                # smoke fixture has 15 users, ALL boundary — same
                # reason the invariant test pins sf0.01)
                F.coalesce(
                    (F.col("n_tf") < 20)
                    | (F.col("n_agree") / F.col("n_tf") >= 0.9),
                    F.lit(True),
                ).alias("tie_free_agreement_ok")
            )
        )
        rows.append(
            n_users.crossJoin(ties)
            .crossJoin(mono)
            .crossJoin(tf)
            .select(
                F.lit(metric).alias("metric"),
                F.col("n_users").cast("bigint"),
                F.col("tie_split_violations").cast("bigint"),
                F.col("monotonicity_violations").cast("bigint"),
                "tie_free_agreement_ok",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("metric")


@register(
    "running_distinct_users",
    oracle="""
        WITH first_seen AS (
            SELECT event_type, user_id,
                   min(CAST(ts AS DATE)) AS first_day
            FROM events GROUP BY event_type, user_id
        ),
        daily_new AS (
            SELECT event_type, first_day AS day,
                   count(*) AS n_new_users
            FROM first_seen GROUP BY event_type, first_day
        )
        SELECT event_type, day, n_new_users,
               CAST(sum(n_new_users) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_distinct_users
        FROM daily_new
        ORDER BY event_type, day
    """,
    tags=("analytics", "window", "distinct", "rewrite"),
)
def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-user count per event type by day — the query
    Spark cannot express directly (COUNT(DISTINCT) OVER a running
    frame is unsupported) and the naive workaround
    (size(collect_set() OVER ...)) materializes the full set per row.
    The scalable rewrite: distinct-to-date == users whose FIRST
    occurrence is <= the day, so one (type, user) min-date aggregate
    + a daily-new count + a running integer sum gives the exact
    answer with state linear in |days x types|, never in users.

    Scale posture: two map-side-combinable aggregates over the fact
    table, then a window over the tiny (type x day) grid. This is
    the standard production rewrite for cumulative-uniques dashboards
    at any volume."""
    ev = t(spark, sf_dir, "events")
    first_seen = ev.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    daily_new = first_seen.groupBy(
        "event_type", F.col("first_day").alias("day")
    ).agg(F.count("*").alias("n_new_users"))
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return daily_new.select(
        "event_type",
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    ).orderBy("event_type", "day")


def _pareto_front(pdf):
    """Exact 2-D skyline of one pandas frame: minimize p_retailprice,
    maximize p_size. Price-ascending sweep; within a price group only
    the max-size rows survive, and only if they strictly beat the
    best size seen at any lower price. Equal (price, size) rows all
    survive (neither strictly dominates)."""
    out = []
    best_size = None
    for price, grp in pdf.sort_values("p_retailprice").groupby(
        "p_retailprice", sort=True
    ):
        gmax = grp["p_size"].max()
        if best_size is None or gmax > best_size:
            out.append(grp[grp["p_size"] == gmax])
            best_size = gmax if best_size is None else max(best_size, gmax)
    import pandas as pd

    if not out:
        return pdf.iloc[0:0]
    return pd.concat(out, ignore_index=True)


@register(
    "skyline_price_size_parts",
    oracle="""
        SELECT a.p_partkey, a.p_retailprice, a.p_size
        FROM part a
        WHERE NOT EXISTS (
            SELECT 1 FROM part b
            WHERE b.p_retailprice <= a.p_retailprice
              AND b.p_size >= a.p_size
              AND (b.p_retailprice < a.p_retailprice
                   OR b.p_size > a.p_size)
        )
        ORDER BY a.p_partkey
    """,
    tags=("analytics", "skyline", "pareto"),
)
def skyline_price_size_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) query — "parts where no other part is
    both cheaper and larger": minimize p_retailprice, maximize p_size
    (the EDBT'23 "Integration of Skyline Queries into Spark SQL"
    operator, built from DataFrame primitives instead of an optimizer
    extension).

    Distributed strategy, NOT the O(N^2) dominance self-join the
    naive SQL implies: phase 1 computes each scan partition's LOCAL
    skyline inside mapInPandas — genuinely shuffle-free, running on
    the parquet scan's own partitions (a per-batch linear sweep, then
    one sweep over the batch survivors; points dominated within any
    subset are dominated globally, so discarding them early is safe
    and global skyline points always survive). Phase 2 re-runs the
    same sweep over the union of local skylines, which is
    frontier-sized (≈sqrt-ish of N for independent dims), in one
    task — the query's only shuffle, and it moves only the frontier.
    The oracle's NOT EXISTS is exact but quadratic — feasible only at
    oracle scale, which is the point of the rewrite."""
    cols = ["p_partkey", "p_retailprice", "p_size"]
    part = t(spark, sf_dir, "part").select(*cols)
    schema = "p_partkey long, p_retailprice double, p_size int"

    def _local_skyline(batches):
        import pandas as pd

        fronts = [_pareto_front(pdf) for pdf in batches if len(pdf)]
        if fronts:
            yield _pareto_front(pd.concat(fronts, ignore_index=True))[cols]

    local = part.mapInPandas(_local_skyline, schema)
    merged = local.groupBy(F.lit(1).alias("one")).applyInPandas(
        lambda pdf: _pareto_front(pdf)[cols],
        schema,
    )
    return merged.orderBy("p_partkey")


JOURNEY_LEN = 3
JOURNEY_TOP = 10


@register(
    "journey_top_paths",
    oracle=f"""
        WITH o AS (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        p AS (
            SELECT user_id,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM o WHERE rn <= {JOURNEY_LEN}
            GROUP BY user_id
        )
        SELECT path, count(*) AS n_users
        FROM p
        GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT {JOURNEY_TOP}
    """,
    tags=("analytics", "journey", "sequence", "path"),
)
def journey_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-journey path analysis: each user's first
    {JOURNEY_LEN} events (totally ordered by ts with event_id
    tie-break) collapse to a '>'-joined path string; the top
    {JOURNEY_TOP} paths by user count come back with a deterministic
    (count, path) order — the entry-funnel report every product
    analytics stack runs.

    Scale: one shuffle on user_id covers both the per-user window and
    the path build (same key, Catalyst reuses the partitioning); the
    path-level aggregate shuffles path strings of bounded length
    (cardinality ≤ |event_types|^{JOURNEY_LEN}), then TakeOrdered
    handles the top-k without a global sort."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= JOURNEY_LEN)
    )
    p = o.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count("*").alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(JOURNEY_TOP)
    )


BASKET_MIN_ORDERS = 2
BASKET_TOP = 20


@register(
    "basket_part_pairs",
    oracle=f"""
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_orders
            FROM op a
            JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
        )
        SELECT p.part_a, pa.p_name AS name_a,
               p.part_b, pb.p_name AS name_b, p.n_orders
        FROM pairs p
        JOIN part pa ON p.part_a = pa.p_partkey
        JOIN part pb ON p.part_b = pb.p_partkey
        WHERE p.n_orders >= {BASKET_MIN_ORDERS}
        ORDER BY p.n_orders DESC, p.part_a, p.part_b
        LIMIT {BASKET_TOP}
    """,
    tags=("market-basket", "co-occurrence", "self-join"),
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in
    at least {BASKET_MIN} orders, top {BASKET_TOP} with a total-order
    tie-break (count desc, then both keys). The pair generator is the
    within-basket self-join on the order key — cost is quadratic in
    BASKET size, linear in order count, so it scales while baskets
    stay bounded (TPC-H-ish baskets hold <= 7 items; on real carts,
    cap the basket or pre-filter to frequent single items a la
    apriori before pairing). Dedup to DISTINCT (order, part) first so
    multi-line quantities don't inflate co-occurrence, then broadcast
    the part dimension for display names.

    Scale: one shuffle on l_orderkey for the self-join, one hash
    aggregate on the pair key, TakeOrdered for the top-k — no
    all-pairs anywhere."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= BASKET_MIN_ORDERS)
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        pairs.join(
            F.broadcast(part.withColumnRenamed("p_name", "name_a")),
            F.col("part_a") == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(part.withColumnRenamed("p_name", "name_b")),
            F.col("part_b") == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .select("part_a", "name_a", "part_b", "name_b", "n_orders")
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(BASKET_TOP)
    )


EWMA_ALPHA = 0.5  # powers of (1-alpha)=0.5 are exact binary doubles


@register(
    "ewma_user_event_values",
    oracle="""
        WITH seq AS (
            SELECT user_id, value,
                   row_number() OVER w AS i,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(max(n) AS BIGINT) AS n_events,
               round(sum(CASE WHEN i = 1 THEN value * pow(0.5, n - 1)
                              ELSE value * pow(0.5, n - i + 1) END),
                     6) AS ewma
        FROM seq
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("timeseries", "ewma", "window"),
)
def ewma_user_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially weighted moving average of event values
    (alpha = 0.5), evaluated in CLOSED FORM instead of a recurrence:
    e_n = v_1·(1-a)^(n-1) + Σ_{i>=2} a·v_i·(1-a)^(n-i). The rewrite
    turns a sequential per-row recurrence — which would force
    applyInPandas or a driver loop — into one window (row_number +
    per-key count) plus one hash aggregate: fully codegen'd, one
    shuffle on user_id, linear at any scale.

    alpha = 1/2 makes every (1-a)^k an exact binary double, so both
    engines compute identical per-term products; only the final sum
    order differs (1e-16), absorbed by the 6dp round. For non-dyadic
    alphas the same plan applies with one extra rounding guard."""
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("i"),
        F.count("*").over(W.partitionBy("user_id")).alias("n"),
    )
    term = F.when(
        F.col("i") == 1, F.col("value") * F.pow(F.lit(0.5), F.col("n") - 1)
    ).otherwise(
        F.col("value") * F.pow(F.lit(0.5), F.col("n") - F.col("i") + 1)
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.round(F.sum(term), 6).alias("ewma"),
        )
        .orderBy("user_id")
    )


@register(
    "yoy_monthly_revenue_growth",
    oracle=f"""
        WITH monthly AS (
            SELECT year(o_orderdate) AS o_year,
                   month(o_orderdate) AS o_month,
                   {sql_dsum("o_totalprice")} AS revenue
            FROM orders
            GROUP BY 1, 2
        )
        SELECT o_year, o_month, revenue,
               lag(revenue, 12) OVER (ORDER BY o_year, o_month)
                   AS revenue_prior_year,
               round(
                   (revenue - lag(revenue, 12) OVER (ORDER BY o_year, o_month))
                   / lag(revenue, 12) OVER (ORDER BY o_year, o_month) * 100,
                   4) AS yoy_pct
        FROM monthly
        ORDER BY o_year, o_month
    """,
    tags=("analytics", "yoy", "window", "bi"),
)
def yoy_monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth — the standard BI period comparison:
    monthly revenue (exact-decimal sums) joined to itself 12 rows
    back via lag(12) over the month sequence, growth as one rounded
    percentage. The calendar here is dense (every month has orders),
    so lag(12) IS the same month last year; on sparse calendars,
    densify first (`calendar_densified_daily_orders` is the spine
    builder for that).

    Scale: the window runs over the MONTHLY aggregate (|years|x12
    rows) — a single-partition window over an already-reduced table
    is fine precisely because aggregation came first; the fact table
    itself shuffles once into (year, month) groups with map-side
    partials."""
    from spark_hive_spark.functions.numeric import dsum

    orders = t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = W.orderBy("o_year", "o_month")
    prior = F.lag("revenue", 12).over(w)
    return monthly.select(
        "o_year",
        "o_month",
        "revenue",
        prior.alias("revenue_prior_year"),
        F.round((F.col("revenue") - prior) / prior * 100, 4).alias("yoy_pct"),
    ).orderBy("o_year", "o_month")


@register(
    "supplier_pareto_abc",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey, {sql_dsum("l_extendedprice")} AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        ranked AS (
            SELECT l_suppkey, revenue,
                   sum(revenue) OVER (
                       ORDER BY revenue DESC, l_suppkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_rev,
                   sum(revenue) OVER () AS total_rev,
                   row_number() OVER (ORDER BY revenue DESC, l_suppkey)
                       AS rk
            FROM rev
        ),
        classed AS (
            SELECT *,
                   CASE WHEN cum_rev <= 0.8 * total_rev THEN 'A'
                        WHEN cum_rev <= 0.95 * total_rev THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM ranked
        )
        SELECT abc_class,
               count(*) AS n_suppliers,
               CAST(min(rk) AS BIGINT) AS first_rank,
               CAST(sum(CAST(round(revenue * 100) AS BIGINT)) AS DOUBLE)
                   / 100 AS class_revenue
        FROM classed
        GROUP BY abc_class
        ORDER BY abc_class
    """,
    tags=("analytics", "pareto", "abc", "bi"),
)
def supplier_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC classification — "which suppliers make 80 % of
    revenue": per-supplier exact-decimal revenue, a running cumulative
    share over the total-ordered ranking (revenue desc, key
    tie-break), and the classic A (first 80 %), B (to 95 %), C (tail)
    classes. Class boundaries compare exact 2-decimal cumulative sums
    against 0.8/0.95 of the exact total — the revenue values carry
    exactly 2 decimals, so cum_rev and total_rev are exact doubles
    and the boundary comparison is deterministic cross-engine.

    Scale: one fact aggregate (map-side partials), then windows over
    the |suppliers| aggregate — the window table is orders of
    magnitude smaller than the fact; the global ORDER BY inside it is
    a single range partition of supplier-count rows."""
    li = t(spark, sf_dir, "lineitem")
    from spark_hive_spark.functions.numeric import dsum

    rev = li.groupBy("l_suppkey").agg(dsum("l_extendedprice").alias("revenue"))
    w_ord = W.orderBy(F.desc("revenue"), "l_suppkey")
    ranked = rev.select(
        "l_suppkey",
        "revenue",
        F.sum("revenue")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_rev"),
        F.sum("revenue").over(W.partitionBy()).alias("total_rev"),
        F.row_number().over(w_ord).alias("rk"),
    )
    classed = ranked.withColumn(
        "abc_class",
        F.when(F.col("cum_rev") <= 0.8 * F.col("total_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("total_rev"), "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.min("rk").cast("bigint").alias("first_rank"),
            # round-then-cast: Spark's double->bigint cast TRUNCATES
            # while DuckDB's ROUNDS — x.71*100 = x70.999... splits
            # the engines without the explicit round
            (
                F.sum(F.round(F.col("revenue") * 100).cast("bigint"))
                .cast("double")
                / 100
            ).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "monthly_seasonality_index",
    oracle=f"""
        WITH monthly AS (
            SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
                   {sql_dsum("o_totalprice")} AS rev
            FROM orders GROUP BY 1, 2
        ),
        by_month AS (
            SELECT m,
                   CAST(count(*) AS BIGINT) AS n_years,
                   CAST(sum(CAST(round(rev * 100) AS BIGINT)) AS BIGINT)
                       AS rev_cents
            FROM monthly GROUP BY m
        ),
        tot AS (
            SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents,
                   CAST(sum(n_years) AS BIGINT) AS total_months
            FROM by_month
        )
        SELECT m AS month,
               n_years,
               CAST(rev_cents AS DOUBLE) / 100 / n_years AS avg_revenue,
               round((CAST(rev_cents AS DOUBLE) / n_years)
                     / (CAST(total_cents AS DOUBLE) / total_months), 6)
                   AS seasonality_index
        FROM by_month CROSS JOIN tot
        ORDER BY month
    """,
    tags=("analytics", "seasonality", "bi"),
)
def monthly_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal index per calendar month — mean monthly revenue over
    the mean across all months (1.0 = no seasonality), the
    multiplicative decomposition a demand forecast starts from.
    Revenue carries as exact integer cents through both aggregation
    levels; the index is a ratio of two single divisions of exact
    values, rounded at 6dp only because the ratio itself is a
    non-terminating rational.

    Scale: fact → (year, month) aggregate → 12-row month aggregate →
    1-row total, each level orders of magnitude smaller; the final
    cross join is a 1-row broadcast scalar."""
    orders = t(spark, sf_dir, "orders")
    from spark_hive_spark.functions.numeric import dsum

    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(dsum("o_totalprice").alias("rev"))
    by_month = monthly.groupBy("m").agg(
        F.count("*").alias("n_years"),
        F.sum(F.round(F.col("rev") * 100).cast("bigint")).alias("rev_cents"),
    )
    tot = by_month.agg(
        F.sum("rev_cents").alias("total_cents"),
        F.sum("n_years").alias("total_months"),
    )
    return (
        by_month.crossJoin(F.broadcast(tot))
        .select(
            F.col("m").alias("month"),
            "n_years",
            (F.col("rev_cents").cast("double") / 100 / F.col("n_years")).alias(
                "avg_revenue"
            ),
            F.round(
                (F.col("rev_cents").cast("double") / F.col("n_years"))
                / (F.col("total_cents").cast("double") / F.col("total_months")),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("month")
    )


@register(
    "lift_decile_table",
    oracle="""
        WITH bounds AS (
            SELECT quantile_cont(c_acctbal, 0.1) AS b1,
                   quantile_cont(c_acctbal, 0.2) AS b2,
                   quantile_cont(c_acctbal, 0.3) AS b3,
                   quantile_cont(c_acctbal, 0.4) AS b4,
                   quantile_cont(c_acctbal, 0.5) AS b5,
                   quantile_cont(c_acctbal, 0.6) AS b6,
                   quantile_cont(c_acctbal, 0.7) AS b7,
                   quantile_cont(c_acctbal, 0.8) AS b8,
                   quantile_cont(c_acctbal, 0.9) AS b9
            FROM customer
        ),
        labels AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        ),
        scored AS (
            SELECT c.c_custkey,
                   10 - (CAST(c.c_acctbal > b1 AS INT)
                       + CAST(c.c_acctbal > b2 AS INT)
                       + CAST(c.c_acctbal > b3 AS INT)
                       + CAST(c.c_acctbal > b4 AS INT)
                       + CAST(c.c_acctbal > b5 AS INT)
                       + CAST(c.c_acctbal > b6 AS INT)
                       + CAST(c.c_acctbal > b7 AS INT)
                       + CAST(c.c_acctbal > b8 AS INT)
                       + CAST(c.c_acctbal > b9 AS INT)) AS decile,
                   CASE WHEN l.o_custkey IS NOT NULL THEN 1 ELSE 0 END
                       AS is_pos
            FROM customer c
            CROSS JOIN bounds
            LEFT JOIN labels l ON c.c_custkey = l.o_custkey
        ),
        per_decile AS (
            SELECT decile,
                   count(*) AS n_customers,
                   sum(is_pos) AS n_pos
            FROM scored GROUP BY decile
        )
        SELECT decile,
               CAST(n_customers AS BIGINT) AS n_customers,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_pos AS DOUBLE) / n_customers AS pos_rate,
               (CAST(n_pos AS DOUBLE) / n_customers)
                   / (CAST(sum(n_pos) OVER () AS DOUBLE)
                      / sum(n_customers) OVER ()) AS lift,
               CAST(sum(n_pos) OVER (ORDER BY decile) AS DOUBLE)
                   / sum(n_pos) OVER () AS cum_gain
        FROM per_decile
        ORDER BY decile
    """,
    tags=("ml-eval", "lift", "gains", "bi"),
)
def lift_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative-gains table — the standard targeting-
    model evaluation: customers decile by account balance (decile 1 =
    richest), the 'conversion' label is having placed an URGENT
    order, and each decile reports its positive rate, lift over the
    base rate, and cumulative share of all positives captured.

    Scale shape: deciles come from percentile BOUNDARIES computed as
    range-partitioned distributed order statistics (shared helper
    `functions.stats.distributed_quantiles` — no holistic percentile
    aggregate, no single-partition ntile window), folded into 9
    codegen'd comparisons per row; the label attaches via one equi-join
    against the distinct URGENT custkeys; the lift/gain windows then
    run over the 10-row decile aggregate, where a window is free.
    Rates and lift are divisions of exact counts — identical IEEE in
    both engines, emitted unrounded."""
    from spark_hive_spark.functions.stats import distributed_quantiles

    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    # exact decile boundaries via range-partitioned order statistics
    # (shared helper) — never a holistic percentile aggregate
    bnds = distributed_quantiles(
        cust, "c_acctbal", [k / 10.0 for k in range(1, 10)]
    )
    labels = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    above = F.lit(0)
    for b in bnds:
        above = above + (F.col("c_acctbal") > F.lit(b)).cast("int")
    scored = (
        cust.select("c_custkey", "c_acctbal")
        .join(labels, cust.c_custkey == labels.o_custkey, "left")
        .select(
            (F.lit(10) - above).alias("decile"),
            F.col("o_custkey").isNotNull().cast("int").alias("is_pos"),
        )
    )
    per_decile = scored.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.sum("is_pos").cast("bigint").alias("n_pos"),
    )
    w_all = W.partitionBy()
    w_cum = W.partitionBy().orderBy("decile")
    pos_rate = F.col("n_pos").cast("double") / F.col("n_customers")
    base_rate = (
        F.sum("n_pos").over(w_all).cast("double")
        / F.sum("n_customers").over(w_all)
    )
    return per_decile.select(
        "decile",
        "n_customers",
        "n_pos",
        pos_rate.alias("pos_rate"),
        (pos_rate / base_rate).alias("lift"),
        (
            F.sum("n_pos").over(w_cum).cast("double")
            / F.sum("n_pos").over(w_all)
        ).alias("cum_gain"),
    ).orderBy("decile")


@register(
    "cohort_ltv_curve",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   min(date_trunc('month', o_orderdate)) AS cohort_month
            FROM orders GROUP BY o_custkey
        ),
        sized AS (
            SELECT cohort_month, count(*) AS n_customers
            FROM firsts GROUP BY cohort_month
        ),
        spend AS (
            SELECT f.cohort_month,
                   (year(o.o_orderdate) - year(f.cohort_month)) * 12
                   + (month(o.o_orderdate) - month(f.cohort_month))
                       AS month_offset,
                   sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
            GROUP BY 1, 2
        )
        SELECT CAST(s.cohort_month AS DATE) AS cohort_month,
               CAST(month_offset AS INT) AS month_offset,
               CAST(z.n_customers AS BIGINT) AS n_customers,
               CAST(sum(s.rev) OVER (
                   PARTITION BY s.cohort_month ORDER BY s.month_offset
               ) AS DOUBLE) AS cum_revenue,
               CAST(sum(s.rev) OVER (
                   PARTITION BY s.cohort_month ORDER BY s.month_offset
               ) AS DOUBLE) / z.n_customers AS cum_ltv_per_customer
        FROM spend s JOIN sized z ON s.cohort_month = z.cohort_month
        ORDER BY cohort_month, month_offset
    """,
    tags=("bi", "cohort", "ltv", "retention"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the revenue-side companion to
    `retention_signup_cohorts`: customers cohort by first-order
    month, every later order lands at its integer month offset from
    the cohort, and each (cohort, offset) cell reports CUMULATIVE
    revenue and cumulative LTV per cohort member. Month offsets use
    explicit (year*12+month) integer arithmetic — portable, no
    months_between float semantics.

    Scale: two hash aggregates over orders (first-order month, then
    per-cell revenue) joined on the customer key; the cumulative
    window runs over the bounded (cohorts x offsets) aggregate, not
    the fact table. Revenue stays exact decimal through the window
    sum; per-customer LTV is one double division."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort_month")
    )
    sized = firsts.groupBy("cohort_month").agg(
        F.count("*").alias("n_customers")
    )
    offset = (
        (F.year("o_orderdate") - F.year("cohort_month")) * 12
        + (F.month("o_orderdate") - F.month("cohort_month"))
    )
    spend = (
        orders.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month", offset.cast("int").alias("month_offset")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    w_cum = W.partitionBy("cohort_month").orderBy("month_offset")
    cum = F.sum("rev").over(w_cum).cast("double")
    return (
        spend.join(sized, "cohort_month")
        .select(
            F.col("cohort_month").cast("date").alias("cohort_month"),
            "month_offset",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            cum.alias("cum_revenue"),
            (cum / F.col("n_customers")).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort_month", "month_offset")
    )


@register(
    "audience_overlap_matrix",
    oracle="""
        WITH m AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        sizes AS (
            SELECT event_type, count(*) AS n FROM m GROUP BY event_type
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_common
            FROM m a JOIN m b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b,
               CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
                   AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.event_type = type_a
        JOIN sizes sb ON sb.event_type = type_b
        ORDER BY type_a, type_b
    """,
    tags=("bi", "audience", "overlap", "set-similarity"),
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between ALL event types — the
    segment-overlap matrix a marketing/product dashboard shows
    (upper triangle: |A∩B|, sizes, Jaccard). Generalizes the
    two-set `setops_segment_overlap` to the full type x type grid
    in ONE self-join of the distinct (type, user) membership table —
    not one query per pair.

    Scale: membership dedups first (map-side partial distinct), the
    self-join keys on user_id (hash-partitioned; per-user fan-out is
    #types, bounded), and sizes broadcast back onto the tiny pair
    grid. Jaccard is one division of exact counts."""
    ev = t(spark, sf_dir, "events")
    m = ev.select("event_type", "user_id").distinct()
    sizes = m.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = m.alias("a"), m.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(
        F.col("event_type").alias("ta"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("tb"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), pairs.type_a == sa.ta)
        .join(F.broadcast(sb), pairs.type_b == sb.tb)
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "revenue_bridge_price_volume",
    oracle="""
        WITH yearly AS (
            SELECT year(o_orderdate) AS yr,
                   count(*) AS volume,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
            FROM orders GROUP BY 1
        ),
        bridged AS (
            SELECT yr,
                   volume, revenue,
                   lag(volume) OVER (ORDER BY yr) AS v0,
                   lag(revenue) OVER (ORDER BY yr) AS r0
            FROM yearly
        )
        SELECT yr,
               CAST(volume AS BIGINT) AS volume,
               CAST(revenue AS DOUBLE) AS revenue,
               CAST(revenue - r0 AS DOUBLE) AS total_change,
               CAST((volume - v0) * (CAST(r0 AS DOUBLE) / v0) AS DOUBLE)
                   AS volume_effect,
               CAST(volume * (CAST(revenue AS DOUBLE) / volume
                              - CAST(r0 AS DOUBLE) / v0) AS DOUBLE)
                   AS price_effect
        FROM bridged
        WHERE v0 IS NOT NULL
        ORDER BY yr
    """,
    tags=("bi", "finance", "waterfall", "decomposition"),
)
def revenue_bridge_price_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue BRIDGE (waterfall decomposition):
    ΔR = volume effect (Δv x last year's average price) + price
    effect (this year's volume x Δavg-price) — the two terms sum to
    the total change ALGEBRAICALLY, which is what makes this the
    finance-review standard. Inputs are exact decimal revenue and
    exact counts; the average prices are single IEEE divisions of
    those, so both engines produce identical doubles without any
    rounding.

    Scale: one year-grain aggregate over orders, then lag/arithmetic
    over the handful of year rows."""
    orders = t(spark, sf_dir, "orders")
    yearly = orders.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.count("*").alias("volume"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"),
    )
    w = W.partitionBy().orderBy("yr")
    bridged = yearly.select(
        "yr",
        "volume",
        "revenue",
        F.lag("volume").over(w).alias("v0"),
        F.lag("revenue").over(w).alias("r0"),
    ).filter(F.col("v0").isNotNull())
    p0 = F.col("r0").cast("double") / F.col("v0")
    p1 = F.col("revenue").cast("double") / F.col("volume")
    return bridged.select(
        "yr",
        F.col("volume").cast("bigint").alias("volume"),
        F.col("revenue").cast("double").alias("revenue"),
        (F.col("revenue") - F.col("r0")).cast("double").alias("total_change"),
        ((F.col("volume") - F.col("v0")) * p0).cast("double").alias(
            "volume_effect"
        ),
        (F.col("volume") * (p1 - p0)).cast("double").alias("price_effect"),
    ).orderBy("yr")


@register(
    "attribution_first_vs_last_touch",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        touches AS (
            SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                   ts AS touch_ts
            FROM events WHERE event_type IN ('click', 'view')
        ),
        cand AS (
            SELECT p.event_id, t.touch_type,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY t.touch_ts, t.touch_id
                   ) AS rn_first,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY t.touch_ts DESC, t.touch_id DESC
                   ) AS rn_last
            FROM purchases p
            JOIN touches t
              ON p.user_id = t.user_id
             AND t.touch_ts < p.ts
             AND t.touch_ts >= p.ts - INTERVAL 24 HOUR
        ),
        per_purchase AS (
            SELECT p.event_id,
                   coalesce(f.touch_type, 'none') AS first_touch,
                   coalesce(l.touch_type, 'none') AS last_touch
            FROM purchases p
            LEFT JOIN (SELECT event_id, touch_type FROM cand
                       WHERE rn_first = 1) f USING (event_id)
            LEFT JOIN (SELECT event_id, touch_type FROM cand
                       WHERE rn_last = 1) l USING (event_id)
        )
        SELECT first_touch, last_touch,
               count(*) AS n_purchases,
               CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
        FROM per_purchase
        GROUP BY first_touch, last_touch
        ORDER BY first_touch, last_touch
    """,
    tags=("bi", "attribution", "marketing", "funnel"),
)
def attribution_first_vs_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution comparison — the marketing-analytics
    staple: for every purchase, the FIRST and LAST touch (click or
    view) by the same user in the preceding 24 h, cross-tabulated.
    Where the two models disagree (off-diagonal cells) is exactly
    where channel budgets shift when a team switches attribution
    models; purchases with no touch report 'none'. Winner selection
    is total-ordered ((ts, event_id) both directions), so the matrix
    is deterministic.

    Scale: the touch candidates come from ONE banded user-keyed
    equi-join (24 h residual bounds per-key fan-out); both winners
    come from the same candidate set via two window rankings that
    share the purchase-id shuffle; the final matrix is a bounded
    aggregate."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    cond = (
        (purchases.user_id == touches.t_user_id)
        & (touches.touch_ts < purchases.ts)
        & (touches.touch_ts >= purchases.ts - F.expr("INTERVAL 24 HOURS"))
    )
    cand = purchases.join(touches, cond).select(
        "event_id", "touch_type", "touch_ts", "touch_id"
    )
    w_first = W.partitionBy("event_id").orderBy("touch_ts", "touch_id")
    w_last = W.partitionBy("event_id").orderBy(
        F.desc("touch_ts"), F.desc("touch_id")
    )
    ranked = cand.select(
        "event_id",
        "touch_type",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    firsts = ranked.filter(F.col("rn_first") == 1).select(
        "event_id", F.col("touch_type").alias("first_touch")
    )
    lasts = ranked.filter(F.col("rn_last") == 1).select(
        "event_id", F.col("touch_type").alias("last_touch")
    )
    per_purchase = (
        purchases.select("event_id")
        .join(firsts, "event_id", "left")
        .join(lasts, "event_id", "left")
        .select(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
    )
    counts = per_purchase.groupBy("first_touch", "last_touch").agg(
        F.count("*").alias("n_purchases")
    )
    return counts.select(
        "first_touch",
        "last_touch",
        "n_purchases",
        (
            F.col("n_purchases").cast("double")
            / F.sum("n_purchases").over(W.partitionBy())
        ).alias("share"),
    ).orderBy("first_touch", "last_touch")


_AGING_ORACLE = """
    WITH months AS (
        SELECT DISTINCT last_day(CAST(o_orderdate AS DATE)) AS me
        FROM orders
    ),
    open_items AS (
        SELECT m.me,
               (year(m.me) * 12 + month(m.me))
               - (year(o.o_orderdate) * 12 + month(o.o_orderdate)) AS age_m,
               CAST(l.l_extendedprice AS DECIMAL(18,2)) AS val
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN months m
          ON CAST(o.o_orderdate AS DATE) <= m.me
         AND CAST(l.l_shipdate AS DATE) > m.me
    )
    SELECT strftime(me, '%Y-%m') AS snapshot_month,
           CASE WHEN age_m <= 0 THEN '0-1'
                WHEN age_m = 1 THEN '1-2'
                WHEN age_m = 2 THEN '2-3'
                ELSE '3+' END AS age_bucket,
           CAST(count(*) AS BIGINT) AS n_open_items,
           CAST(sum(val) AS DOUBLE) AS open_value
    FROM open_items
    GROUP BY snapshot_month, age_bucket
    ORDER BY snapshot_month, age_bucket
"""


@register(
    "aging_waterfall_open_lineitems",
    oracle=_AGING_ORACLE,
    tags=("analytics", "aging", "snapshot"),
)
def aging_waterfall_open_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGING WATERFALL — the AR-style month-end snapshot report: for
    every month-end, lineitems ordered but not yet shipped, bucketed
    by age in whole calendar months (integer year·12+month
    arithmetic — identical in both engines, unlike the engines'
    divergent months_between functions) with decimal-exact open
    value.

    Scale: the month grid is calendar-bounded and broadcast; the
    non-equi span join fans each lineitem out only to the month-ends
    inside its order→ship window (order-to-ship spans are short, so
    the fan-out is a small constant, not |months|)."""
    months = (
        t(spark, sf_dir, "orders")
        .select(F.last_day(F.col("o_orderdate").cast("date")).alias("me"))
        .distinct()
    )
    # A lineitem is open at month-end me exactly for the months
    # od_month .. ship_month−1 (od <= last_day(od month) always;
    # ship > me fails only in ship's own month) — so openness depends
    # ONLY on the (order-month, ship-month) pair. Contract lineitems
    # to those ~|months|² pairs FIRST (map-side combinable count +
    # decimal sum), then explode the tiny pair table: measured 7.3 s
    # (per-row explode, 8.8M rows) → join-bound (the naive non-equi
    # broadcast join was 6.2 s of predicate evaluation).
    spans = (
        t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.col("l_shipdate").cast("date").alias("ship"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("val"),
        )
        .join(
            t(spark, sf_dir, "orders").select(
                "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.trunc("od", "MM").alias("odm"),
            F.trunc("ship", "MM").alias("shipm"),
        )
        .agg(F.count("*").alias("n"), F.sum("val").alias("valsum"))
        .filter(F.col("shipm") > F.col("odm"))
    )
    j = (
        spans.withColumn(
            "me",
            F.explode(
                F.expr(
                    "transform(sequence(odm, add_months(shipm, -1),"
                    " interval 1 month), m -> last_day(m))"
                )
            ),
        )
        .join(F.broadcast(months), "me", "left_semi")
        .withColumn("od", F.col("odm"))
    )
    age = (F.year("me") * 12 + F.month("me")) - (
        F.year("od") * 12 + F.month("od")
    )
    bucket = (
        F.when(age <= 0, "0-1")
        .when(age == 1, "1-2")
        .when(age == 2, "2-3")
        .otherwise("3+")
    )
    return (
        j.groupBy(
            F.date_format("me", "yyyy-MM").alias("snapshot_month"),
            bucket.alias("age_bucket"),
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_open_items"),
            F.sum("valsum").cast("double").alias("open_value"),
        )
        .orderBy("snapshot_month", "age_bucket")
    )


BACKTEST_MONTHS = 24

_BACKTEST_ORACLE = f"""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY mth
    ),
    idx AS (
        SELECT mth, rev,
               row_number() OVER (ORDER BY mth) AS i,
               count(*) OVER () AS n
        FROM monthly
    ),
    joined AS (
        SELECT a.mth, a.rev AS actual, b.rev AS forecast, a.n
        FROM idx a JOIN idx b ON b.i = a.i - 12
        WHERE a.i > a.n - {BACKTEST_MONTHS}
    ),
    scored AS (
        SELECT mth, actual, forecast,
               2.0 * abs(CAST(actual - forecast AS DOUBLE))
                   / CAST(actual + forecast AS DOUBLE) AS smape_term
        FROM joined
    )
    SELECT strftime(mth, '%Y-%m') AS month,
           CAST(actual AS DOUBLE) AS actual,
           CAST(forecast AS DOUBLE) AS seasonal_naive,
           round(smape_term, 6) AS smape_term,
           round((SELECT avg(smape_term) FROM scored), 6) AS smape_overall
    FROM scored
    ORDER BY month
"""


@register(
    "forecast_backtest_seasonal_naive",
    oracle=_BACKTEST_ORACLE,
    tags=("analytics", "forecasting", "backtest"),
)
def forecast_backtest_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST BACKTEST — the baseline every forecasting system must
    beat: seasonal-naive (ŷ_m = y_{m−12}) evaluated over the last 24
    months with per-month and overall sMAPE. Revenues are exact
    decimals; each sMAPE term is one double division (identical both
    engines), and the overall mean averages 24 rounded-input terms —
    a bounded sum of identically-computed doubles.

    Scale: the fact table contracts to the calendar-bounded monthly
    series (checkpointed — self-join + the overall-mean scalar are
    three consumers); everything after is 24-row arithmetic."""
    from pyspark.sql import Window as W

    monthly = (
        t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").alias("mth"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    idx = monthly.select(
        "mth",
        "rev",
        F.row_number().over(W.orderBy("mth")).alias("i"),
        F.count("*").over(W.partitionBy()).alias("n"),
    ).localCheckpoint(eager=True)
    a = idx.select("mth", F.col("rev").alias("actual"), "i", "n")
    b = idx.select(F.col("rev").alias("forecast"), F.col("i").alias("j"))
    scored = (
        a.join(F.broadcast(b), F.col("j") == F.col("i") - 12)
        .filter(F.col("i") > F.col("n") - BACKTEST_MONTHS)
        .select(
            "mth",
            "actual",
            "forecast",
            (
                2.0
                * F.abs((F.col("actual") - F.col("forecast")).cast("double"))
                / (F.col("actual") + F.col("forecast")).cast("double")
            ).alias("smape_term"),
        )
        .localCheckpoint(eager=True)  # 24 rows; overall mean + output
    )
    overall = scored.agg(F.avg("smape_term").alias("o"))
    return (
        scored.crossJoin(F.broadcast(overall))
        .select(
            F.date_format("mth", "yyyy-MM").alias("month"),
            F.col("actual").cast("double").alias("actual"),
            F.col("forecast").cast("double").alias("seasonal_naive"),
            F.round("smape_term", 6).alias("smape_term"),
            F.round("o", 6).alias("smape_overall"),
        )
        .orderBy("month")
    )


_DECAY_ORACLE = """
    WITH signups AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events
        GROUP BY user_id
    ),
    activity AS (
        SELECT s.user_id,
               datediff('day', s.d0, CAST(e.ts AS DATE)) // 7 AS wk
        FROM events e JOIN signups s ON e.user_id = s.user_id
        WHERE CAST(e.ts AS DATE) >= s.d0
        GROUP BY s.user_id, wk
    ),
    base AS (SELECT count(*) AS n0 FROM signups),
    weekly AS (
        SELECT wk, count(*) AS active
        FROM activity WHERE wk BETWEEN 1 AND 4 GROUP BY wk
    ),
    rates AS (
        SELECT wk, active,
               CAST(active AS DOUBLE) / n0 AS rate,
               ln(CAST(active AS DOUBLE) / n0) AS lr
        FROM weekly, base
    ),
    fit AS (
        SELECT count(*) AS m, sum(wk) AS sx, sum(lr) AS sy,
               sum(wk * lr) AS sxy, sum(wk * wk) AS sxx
        FROM rates
    )
    SELECT CAST(r.wk AS BIGINT) AS week,
           CAST(r.active AS BIGINT) AS n_active,
           round(r.rate, 6) AS retention_rate,
           round(-(f.sxy - f.sx * f.sy / f.m)
                 / (f.sxx - f.sx * f.sx / f.m) + 0.0, 4) AS decay_lambda,
           round(exp(f.sy / f.m
                     + (f.sxy - f.sx * f.sy / f.m)
                       / (f.sxx - f.sx * f.sx / f.m)
                       * (0 - f.sx / f.m)), 4) AS fitted_r0
    FROM rates r, fit f
    ORDER BY week
"""


@register(
    "retention_decay_fit",
    oracle=_DECAY_ORACLE,
    tags=("analytics", "retention", "decay-fit"),
)
def retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION DECAY FIT — the exponential model r(w) ≈ r₀·e^{−λw}
    over weeks 1-4 of whole-population retention (active in week w
    after first-seen), fitted by log-linear OLS: λ is the decay rate
    every growth team quotes, r₀ the extrapolated week-0 intercept.
    Rates are ratios of exact integers; the four-point fit runs the
    same closed-form expressions in both engines.

    Scale: events contract to (user, week) then to 4 weekly counts —
    two map-side-combinable aggregates; the fit is 4-row
    arithmetic."""
    from pyspark.sql import Window as W  # noqa: F401 (module convention)

    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    signups = ev.groupBy("user_id").agg(F.min("d").alias("d0"))
    activity = (
        ev.join(signups, "user_id")
        .filter(F.col("d") >= F.col("d0"))
        .select(
            "user_id",
            F.floor(F.datediff("d", "d0") / 7).cast("bigint").alias("wk"),
        )
        .distinct()
    )
    base = signups.agg(F.count("*").alias("n0"))
    weekly = (
        activity.filter(F.col("wk").between(1, 4))
        .groupBy("wk")
        .agg(F.count("*").alias("active"))
    )
    rates = weekly.crossJoin(F.broadcast(base)).select(
        "wk",
        "active",
        (F.col("active").cast("double") / F.col("n0")).alias("rate"),
        F.log(F.col("active").cast("double") / F.col("n0")).alias("lr"),
    ).localCheckpoint(eager=True)  # 4 rows; fit + output
    m = F.count("*")
    fit = rates.agg(
        m.alias("m"),
        F.sum("wk").alias("sx"),
        F.sum("lr").alias("sy"),
        F.sum(F.col("wk") * F.col("lr")).alias("sxy"),
        F.sum(F.col("wk") * F.col("wk")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m")
    )
    return (
        rates.crossJoin(F.broadcast(fit))
        .select(
            F.col("wk").cast("bigint").alias("week"),
            F.col("active").cast("bigint").alias("n_active"),
            F.round("rate", 6).alias("retention_rate"),
            F.round(-slope + 0.0, 4).alias("decay_lambda"),
            F.round(
                F.exp(
                    F.col("sy") / F.col("m")
                    + slope * (0 - F.col("sx") / F.col("m"))
                ),
                4,
            ).alias("fitted_r0"),
        )
        .orderBy("week")
    )


REPEAT_MAX_IDX = 8
REPEAT_WINDOW_DAYS = 30

_REPEAT_CURVE_ORACLE = f"""
    WITH seq AS (
        SELECT o_custkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS idx,
               datediff('day', CAST(o_orderdate AS DATE),
                        lead(CAST(o_orderdate AS DATE)) OVER
                        (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)) AS gap
        FROM orders
    )
    SELECT CAST(idx AS BIGINT) AS order_index,
           CAST(count(gap) AS BIGINT) AS n_with_next,
           CAST(count(CASE WHEN gap <= {REPEAT_WINDOW_DAYS} THEN 1 END)
                AS BIGINT) AS n_within_30d,
           round(CAST(count(CASE WHEN gap <= {REPEAT_WINDOW_DAYS} THEN 1 END)
                      AS DOUBLE) / count(gap), 6) AS p_repeat_30d,
           round(CAST(sum(gap) AS DOUBLE) / count(gap), 2) AS mean_gap_days
    FROM seq
    WHERE idx <= {REPEAT_MAX_IDX} AND gap IS NOT NULL
    GROUP BY idx
    ORDER BY order_index
"""


@register(
    "repeat_purchase_cadence_curve",
    oracle=_REPEAT_CURVE_ORACLE,
    tags=("analytics", "cadence", "repeat-purchase"),
)
def repeat_purchase_cadence_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEAT-PURCHASE CADENCE — for each order index (1st, 2nd, …
    8th order of a customer), the probability the NEXT order arrives
    within 30 days and the mean inter-order gap: the curve that
    shows whether customers accelerate or decay as they mature
    (habit formation vs churn drift). One customer-partitioned
    window (row_number + lead over the same frame), exact integer
    gaps, ratio-of-counts probabilities.

    Scale: a single window over orders on its natural customer
    partitioning, then an 8-group reduce."""
    from pyspark.sql import Window as W

    uw = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = t(spark, sf_dir, "orders").select(
        F.row_number().over(uw).alias("idx"),
        F.datediff(
            F.lead(F.col("o_orderdate").cast("date")).over(uw),
            F.col("o_orderdate").cast("date"),
        ).alias("gap"),
    )
    hit = F.count(F.when(F.col("gap") <= REPEAT_WINDOW_DAYS, 1))
    return (
        seq.filter(
            (F.col("idx") <= REPEAT_MAX_IDX) & F.col("gap").isNotNull()
        )
        .groupBy(F.col("idx").cast("bigint").alias("order_index"))
        .agg(
            F.count("gap").cast("bigint").alias("n_with_next"),
            hit.cast("bigint").alias("n_within_30d"),
            F.round(hit.cast("double") / F.count("gap"), 6).alias(
                "p_repeat_30d"
            ),
            F.round(
                F.sum("gap").cast("double") / F.count("gap"), 2
            ).alias("mean_gap_days"),
        )
        .orderBy("order_index")
    )
