"""Time-series operators over the `events` stream table: tumbling and
sliding window aggregation (batch form), sessionization, as-of joins,
and time-range joins (SURVEY.md §2B; batch twins of §5's streaming
surface — see spark_hive_spark/streaming/).

Spark has no native AS-OF join; `asof_join` implements it as the
union-sort-backfill composition: union both sides tagged, one window
per key ordered by time with `last(..., ignorenulls=True)` carrying
the most recent right-side row forward. Cost = ONE shuffle on the key
+ a per-key sort — the same complexity as a regular sort-merge join,
no row explosion, no driver involvement; this is the scalable plan at
100 TB (pd.merge_asof via applyInPandas would force all of a key's
history into one pandas frame; rejected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join (inclusive): for each left row, attach the
    right row with the greatest ``right_ts`` <= ``left_ts`` within the
    same ``on`` key. Column sets of the two sides must be disjoint
    except ``on``.

    Plan: union(tagged) -> window(partitionBy on, orderBy ts) ->
    last(ignorenulls) backfill of ONE struct holding the whole right
    row -> filter left rows -> unpack. Right rows sort before left
    rows at equal timestamps so exact matches are included.

    The right payload travels as a single struct so all its columns
    come from the SAME right row: per-column last(ignorenulls) would
    let a genuine NULL in one payload column pull that column from an
    earlier row (a silent row-mixing bug this operator had before
    round 3).
    """
    right_cols = [c for c in right.columns if c != on and c != right_ts]
    left_cols = [c for c in left.columns if c != on]

    payload = F.struct(
        F.col(right_ts).alias(right_ts),
        *[F.col(c).alias(c) for c in right_cols],
    )
    payload_type = T.StructType(
        [right.schema[right_ts]] + [right.schema[c] for c in right_cols]
    )
    tagged_right = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    tagged_left = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(payload_type).alias("_r"),
        *[F.col(c) for c in left_cols],
    )
    # total order: ts, then right-before-left at equal ts (inclusive
    # match), then the payload struct itself (field-wise comparison)
    # so duplicate right timestamps resolve deterministically (the max
    # payload tuple wins)
    w = (
        W.partitionBy(on)
        .orderBy(
            F.col("_ts").asc(),
            F.col("_side").asc(),
            F.col("_r").asc_nulls_first(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    backfilled = tagged_left.unionByName(tagged_right).select(
        F.col(on),
        F.col("_side"),
        *[F.col(c) for c in left_cols],
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    # getField, not a dotted string path: robust to column names that
    # would need backtick-quoting (ADVICE r3).
    out = backfilled.filter(F.col("_side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left_cols],
        F.col("_r").getField(right_ts).alias(right_ts),
        *[F.col("_r").getField(c).alias(c) for c in right_cols],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    return out


@register(
    "window_tumbling_events",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("temporal", "window-agg"),
)
def window_tumbling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the streaming
    windowed count — same F.window operator Structured Streaming
    uses). Epoch-aligned in both engines under UTC."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "window_sliding_events",
    oracle="""
        WITH halves AS (
            SELECT time_bucket(INTERVAL '30 minutes', ts) AS tb, value
            FROM events
        ),
        assigned AS (
            SELECT unnest([tb, tb - INTERVAL '30 minutes']) AS window_start,
                   value
            FROM halves
        )
        SELECT window_start, count(*) AS n_events
        FROM assigned
        GROUP BY window_start
        ORDER BY window_start
    """,
    tags=("temporal", "window-agg"),
)
def window_sliding_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute slide — each event lands
    in 2 windows (Spark's F.window expands rows; the oracle mirrors the
    expansion with unnest)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


@register(
    "sessionize_events",
    oracle="""
        WITH gaps AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS is_new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, event_id, ts,
                   CAST(sum(is_new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS session_num
            FROM gaps
        )
        SELECT user_id, session_num,
               count(*) AS n_events,
               min(ts) AS session_start,
               max(ts) AS session_end,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_micros
        FROM numbered
        GROUP BY user_id, session_num
        ORDER BY user_id, session_num
    """,
    tags=("temporal", "session"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag to find
    session breaks, running sum to number sessions, then per-session
    rollup. One shuffle on user_id serves the window AND the final
    aggregate (same partitioning). Streaming twin: session_window in
    spark_hive_spark/streaming/."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    numbered = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(is_new)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("session_num"),
    )
    return (
        numbered.groupBy("user_id", "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
                "duration_micros"
            ),
        )
        .orderBy("user_id", "session_num")
    )


@register(
    "asof_purchase_last_click",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT event_id AS click_event_id, user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts, p.value,
               c.click_event_id, c.click_ts,
               epoch_us(p.ts) - epoch_us(c.click_ts) AS micros_since_click
        FROM purchases p
        ASOF JOIN clicks c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY p.event_id
    """,
    tags=("temporal", "asof", "join"),
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase matched to the same user's most recent
    click at-or-before it (inner: purchases with no prior click drop).
    Uses the generic `asof_join` union-sort operator; the oracle is
    DuckDB's native ASOF JOIN."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "click_event_id",
        "click_ts",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias(
            "micros_since_click"
        ),
    ).orderBy("event_id")


@register(
    "range_join_clicks_before_purchase",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts AS click_ts FROM events
            WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts,
               count(c.click_ts) AS n_clicks_prev_hour
        FROM purchases p
        LEFT JOIN clicks c
          ON p.user_id = c.user_id
         AND c.click_ts >  p.ts - INTERVAL '1 hour'
         AND c.click_ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id
    """,
    tags=("temporal", "range-join"),
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join: clicks in the hour before each purchase,
    counted per purchase (left join keeps zero-click purchases). The
    equality on user_id makes this a plain equi-join with a range
    residual — hash-partitioned on user, NOT a nested-loop cross
    product; at scale the band condition caps the per-key fan-out."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"), F.col("ts").alias("click_ts")
    )
    cond = (
        (purchases.user_id == clicks.c_user_id)
        & (clicks.click_ts > purchases.ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.click_ts <= purchases.ts)
    )
    return (
        purchases.join(clicks, cond, "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count("click_ts").alias("n_clicks_prev_hour"))
        .orderBy("event_id")
    )


@register(
    "scd2_customer_spend_versions",
    oracle="""
        WITH ordered AS (
            SELECT o_custkey, o_orderkey, o_orderdate,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
            WHERE o_custkey < 100
        )
        SELECT o_custkey AS custkey,
               row_number() OVER w AS version,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END
                   AS is_current,
               CAST(sum(price) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS total_spend
        FROM ordered
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY custkey, version
    """,
    tags=("temporal", "scd2", "cdc"),
)
def scd2_customer_spend_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing dimension type 2) emulation WITHOUT
    MERGE INTO (no Delta/Iceberg in this image): each order closes the
    customer's previous version and opens a new one — valid_from /
    valid_to intervals via lead(), a current-row flag, and the
    versioned cumulative spend in exact decimal. One shuffle on the
    business key serves numbering, interval stitching, and the running
    total. This is the anti-join+union-free formulation when the full
    history is (re)built batch-style; incremental upserts at scale
    would go through a transactional table format's MERGE."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.row_number().over(w).alias("version"),
            F.col("o_orderdate").alias("valid_from"),
            F.lead("o_orderdate").over(w).alias("valid_to"),
            F.when(F.lead("o_orderdate").over(w).isNull(), 1)
            .otherwise(0)
            .alias("is_current"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .over(wcum)
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("custkey", "version")
    )


@register(
    "timeseries_gapfill_locf",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   {sql_dsum('value')} AS hour_value,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, min(hour) AS mn, max(hour) AS mx
            FROM hourly GROUP BY 1
        ),
        spine AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        )
        SELECT s.event_type, s.hour,
               coalesce(h.n_events, 0) AS n_events,
               (h.hour_value IS NULL) AS is_gap,
               last_value(h.hour_value IGNORE NULLS) OVER (
                   PARTITION BY s.event_type ORDER BY s.hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_locf
        FROM spine s
        LEFT JOIN hourly h
          ON s.event_type = h.event_type AND s.hour = h.hour
        ORDER BY s.event_type, s.hour
    """,
    tags=("temporal", "timeseries", "gapfill", "locf", "hypertable"),
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket gap-fill with last-observation-
    carried-forward (the TimescaleDB `time_bucket_gapfill` + `locf`
    recipe): hourly buckets per event type, a dense per-type hour
    spine (sequence over the type's observed [min, max] range), and
    LOCF of the exact-decimal hourly value sum across the gaps.

    Scale shape: raw events collapse to (type x hour) buckets in one
    map-side-combinable aggregate; everything after — spine
    generation, the left join, the LOCF window — runs on the bucket
    table, whose size is |types| x hours, independent of event
    volume. The LOCF window partitions by type, so no global sort."""
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(dsum("value").alias("hour_value"), F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("hour"), "event_type", "hour_value", "n_events")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 hour"))).alias("hour"),
    )
    filled = spine.join(hourly, ["event_type", "hour"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "event_type",
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("hour_value").isNull().alias("is_gap"),
        F.last("hour_value", ignorenulls=True).over(w).alias("value_locf"),
    ).orderBy("event_type", "hour")


@register(
    "fx_asof_converted_revenue",
    oracle="""
        WITH months AS (
            SELECT DISTINCT year(o_orderdate) * 12 + month(o_orderdate) AS mk
            FROM orders
        ),
        sparse AS (
            SELECT mk, 100 + mk % 7 AS rate_cents
            FROM months WHERE mk % 3 = 1
        ),
        effective AS (
            SELECT mk,
                   last_value(rate_cents IGNORE NULLS) OVER (
                       ORDER BY mk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS rate_cents
            FROM (SELECT m.mk, s.rate_cents
                  FROM months m LEFT JOIN sparse s USING (mk))
        )
        SELECT year(o.o_orderdate) AS o_year,
               count(*) AS n_orders,
               CAST(sum(CASE WHEN e.rate_cents IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_unrated,
               CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))
                             * coalesce(e.rate_cents, 100)) AS DOUBLE)
                    / 100 AS DOUBLE) AS converted_revenue
        FROM orders o
        JOIN effective e
          ON year(o.o_orderdate) * 12 + month(o.o_orderdate) = e.mk
        GROUP BY 1
        ORDER BY o_year
    """,
    tags=("temporal", "asof", "fx", "locf"),
)
def fx_asof_converted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency conversion against a SPARSE rate dimension — the
    other as-of-join shape: the dimension is global (no join key) and
    tiny, so instead of windowing the FACT table (what
    `asof_purchase_last_click` does for per-key as-of), the rate
    table is densified ONCE by LOCF over the month spine — a window
    over |months| rows — and the fact then equi-joins the effective
    rate by month through a broadcast. Same semantics as a backward
    as-of join, zero fact-side windows: the scalable plan when the
    as-of side is a dimension rather than a peer fact.

    Rates derive deterministically from the month key (every third
    month posts 1.00-1.06, carried as integer CENTS — DuckDB's `/`
    on decimals returns DOUBLE, so portable exactness means decimal ×
    int sums with ONE final division); months before the first posted
    rate convert at 1.00 and are counted in `n_unrated`."""
    orders = t(spark, sf_dir, "orders")
    mk = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mk")
    months = orders.select(mk).distinct()
    sparse = months.filter(F.col("mk") % 3 == 1).select(
        "mk", (F.lit(100) + F.col("mk") % 7).alias("rate_cents")
    )
    w = W.orderBy("mk").rowsBetween(W.unboundedPreceding, W.currentRow)
    effective = (
        months.join(sparse, "mk", "left")
        .withColumn(
            "rate_cents", F.last("rate_cents", ignorenulls=True).over(w)
        )
        .select("mk", "rate_cents")
    )
    return (
        orders.select(mk, "o_orderdate", "o_totalprice")
        .join(F.broadcast(effective), "mk")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("rate_cents").isNull().cast("long")).alias(
                "n_unrated"
            ),
            (
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,2)")
                    * F.coalesce("rate_cents", F.lit(100))
                ).cast("double")
                / 100
            )
            .cast("double")
            .alias("converted_revenue"),
        )
        .orderBy("o_year")
    )


@register(
    "asof_nearest_click_purchase",
    oracle="""
        WITH purchases AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT event_id AS click_id, user_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        cand AS (
            SELECT p.event_id, p.user_id, p.ts, c.click_id, c.click_ts,
                   row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY abs(date_diff('microsecond',
                                              c.click_ts, p.ts)),
                                c.click_ts, c.click_id
                   ) AS rn
            FROM purchases p
            LEFT JOIN clicks c
              ON p.user_id = c.user_id
             AND c.click_ts >= p.ts - INTERVAL '1 hour'
             AND c.click_ts <= p.ts + INTERVAL '1 hour'
        )
        SELECT event_id, user_id, ts, click_id,
               CAST(date_diff('microsecond', ts, click_ts) AS BIGINT)
                   AS signed_gap_us
        FROM cand WHERE rn = 1
        ORDER BY event_id
    """,
    tags=("temporal", "asof", "nearest", "tolerance"),
)
def asof_nearest_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with tolerance — the third as-of
    flavor next to backward (`asof_purchase_last_click`) and the
    banded range join: each purchase attaches the click closest in
    time within +/-1 hour, whichever side it falls on (pandas
    merge_asof(direction='nearest')). Ties at equal distance resolve
    deterministically: earlier click first, then click id. Purchases
    with no click in the band survive with a NULL match (left join).

    Scale: the +/-1 h band on top of the user_id equality keeps this
    a hash-partitioned equi-join with a range residual (never a
    cross product), and the winner-per-purchase window partitions by
    purchase id — maximal parallelism, no global sort. The signed
    gap is exact integer microseconds, so the hash is
    arithmetic-free (no truncation-direction semantics to match)."""
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    cond = (
        (purchases.user_id == clicks.c_user_id)
        & (clicks.click_ts >= purchases.ts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.click_ts <= purchases.ts + F.expr("INTERVAL 1 HOUR"))
    )
    abs_gap = F.abs(
        F.unix_micros("click_ts") - F.unix_micros("ts")
    )
    w = W.partitionBy("event_id").orderBy(
        abs_gap.asc(), F.col("click_ts").asc(), F.col("click_id").asc()
    )
    return (
        purchases.join(clicks, cond, "left")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            "click_id",
            (F.unix_micros("click_ts") - F.unix_micros("ts"))
            .cast("bigint")
            .alias("signed_gap_us"),
        )
        .orderBy("event_id")
    )


@register(
    "timeseries_twap_user_value",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id, value,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
            FROM events
        ),
        seg AS (
            SELECT user_id,
                   CAST(CAST(value AS DECIMAL(9,2)) * 100
                        AS DECIMAL(11,0)) AS v_cents,
                   epoch_us(next_ts) - epoch_us(ts) AS dur_us
            FROM seq WHERE next_ts IS NOT NULL
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(dur_us) AS BIGINT) AS span_us,
               CAST(sum(v_cents * CAST(dur_us AS DECIMAL(16,0)))
                        AS DOUBLE)
                   / (sum(dur_us) * 100.0) AS twap_value
        FROM seg
        GROUP BY user_id
        HAVING sum(dur_us) > 0
        ORDER BY user_id
    """,
    tags=("temporal", "twap", "time-weighted", "finance"),
)
def timeseries_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP) — the
    finance/metering primitive a plain AVG gets wrong when
    observations are irregular: each event's value HOLDS until the
    user's next event, so its weight is that duration, not 1. The
    last observation (no successor) carries no weight.

    Determinism at the hash level: weights are exact integer
    microseconds, values are exact 2dp decimals, so the weighted sum
    is a DECIMAL x DECIMAL(20,0) product aggregated exactly —
    order-independent across any partitioning — and TWAP is one
    double division of two exact quantities.

    Scale: one user-partitioned window (lead) riding the same
    shuffle as the final per-user aggregate — Spark plans exactly
    one exchange on user_id for both."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "value",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    seg = seq.select(
        "user_id",
        # integer CENTS x integer microseconds, summed in scale-0
        # decimal: a scale-2 decimal sum cast to double converts via
        # int/10^2 in DuckDB but via correctly-rounded BigDecimal in
        # the JVM (sub-ULP hash flake, observed); a scale-0 decimal is
        # a plain integer whose ->double rounding is identical in both
        (F.col("value").cast("decimal(9,2)") * 100)
        .cast("decimal(11,0)")
        .alias("v_cents"),
        (F.unix_micros("next_ts") - F.unix_micros("ts")).alias("dur_us"),
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            (
                F.sum(
                    F.col("v_cents") * F.col("dur_us").cast("decimal(16,0)")
                ).cast("double")
                / (F.sum("dur_us") * F.lit(100.0))
            ).alias("twap_value"),
        )
        .filter(F.col("span_us") > 0)
        .orderBy("user_id")
    )


@register(
    "pit_scd2_revenue_by_tier",
    oracle="""
        WITH versions AS (
            SELECT o_custkey AS custkey,
                   row_number() OVER w AS version,
                   o_orderdate AS valid_from,
                   lead(o_orderdate) OVER w AS valid_to
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ),
        matched AS (
            SELECT CASE WHEN v.version >= 4 THEN '4+'
                        ELSE CAST(v.version AS VARCHAR) END AS tier,
                   o.o_totalprice, o.o_custkey
            FROM orders o
            JOIN versions v
              ON o.o_custkey = v.custkey
             AND o.o_orderdate >= v.valid_from
             AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
        )
        SELECT tier,
               count(*) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM matched
        GROUP BY tier
        ORDER BY tier
    """,
    tags=("temporal", "scd2", "point-in-time", "interval-join"),
)
def pit_scd2_revenue_by_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-correct join against an SCD2 dimension — the
    pattern that prevents feature leakage in ML training sets and
    restatement errors in finance: each order joins the customer
    VERSION that was valid on its order date (version = how many
    orders the customer had placed up to then, bucketed into tiers
    1/2/3/4+), never a later one. The interval condition
    `valid_from <= d < valid_to` makes zero-width versions (same-day
    successors) unmatchable, so every fact row lands on exactly one
    version deterministically.

    Scale: version construction is one customer-partitioned window;
    the PIT join is an equi-join on the business key with a range
    residual — per-key fan-out bounded by that customer's version
    count, never a cross product. Revenue stays exact decimal."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    cond = (
        (orders.o_custkey == versions.custkey)
        & (orders.o_orderdate >= versions.valid_from)
        & (
            versions.valid_to.isNull()
            | (orders.o_orderdate < versions.valid_to)
        )
    )
    tier = F.when(F.col("version") >= 4, "4+").otherwise(
        F.col("version").cast("string")
    )
    return (
        orders.join(versions, cond)
        .select(tier.alias("tier"), "o_totalprice", "o_custkey")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("tier")
    )


@register(
    "events_downtime_gaps",
    oracle="""
        WITH seq AS (
            SELECT event_type, ts,
                   lag(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events
        ),
        gaps AS (
            SELECT event_type,
                   prev_ts AS gap_start,
                   ts AS gap_end,
                   date_diff('microsecond', prev_ts, ts) AS gap_us,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY date_diff('microsecond', prev_ts, ts) DESC,
                                prev_ts
                   ) AS rk
            FROM seq WHERE prev_ts IS NOT NULL
        )
        SELECT event_type, gap_start, gap_end,
               CAST(gap_us AS BIGINT) AS gap_us
        FROM gaps WHERE rk <= 3
        ORDER BY event_type, gap_us DESC, gap_start
    """,
    tags=("temporal", "gaps", "sre", "monitoring"),
)
def events_downtime_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downtime / silence detection — the SRE complement of
    sessionization: the TOP-3 LONGEST gaps between consecutive
    events per type (start, end, exact-microsecond duration). Top-k
    rather than a fixed threshold because silence is relative to the
    stream's density — a 2-hour cutoff that fires constantly on a
    sparse dev stream matches nothing on a dense production one (at
    sf0.1 the longest gap is ~24 min; an absolute-threshold version
    of this query returned an empty — trivially correct — result).

    Scale: one lag window + one rank window, both partitioned by
    event type and riding a single shuffle; no global sort."""
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).filter(F.col("prev_ts").isNotNull())
    gap_us = F.unix_micros("ts") - F.unix_micros("prev_ts")
    gaps = seq.select(
        "event_type",
        F.col("prev_ts").alias("gap_start"),
        F.col("ts").alias("gap_end"),
        gap_us.cast("bigint").alias("gap_us"),
    )
    wr = W.partitionBy("event_type").orderBy(
        F.desc("gap_us"), "gap_start"
    )
    return (
        gaps.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 3)
        .drop("rk")
        .orderBy("event_type", F.desc("gap_us"), "gap_start")
    )
