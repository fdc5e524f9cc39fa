"""Ordered-time operators: sweep-line peak concurrency, CUSUM
change-point detection, and CEP-style rising-run detection — the
monitoring/alerting queries an events warehouse runs on top of the
sessionization and anomaly family (extends operators/temporal.py and
analytics.py; reference scope: the events/orders fixtures).

Scale posture, per operator:

- Sweep-line concurrency: sessions contract the event stream to one
  row per (user, session) via a user-partitioned window (one shuffle,
  the same one sessionize_events already pays), then the sweep runs
  over MINUTE-BUCKETED boundary deltas — the ordered domain is
  calendar-bounded (~5.3M minutes per decade) and delta rows are
  capped at 2× the session count, so the final ordered cumulative sum
  is over a contracted series, not the raw events. At 100 TB you'd
  range-partition that series by month and two-phase the prefix sum
  (per-partition partial + broadcast offsets); at fixture scale a
  single ordered window over the contracted deltas is the honest
  plan and is named here.

- CUSUM: the recursion S_i = max(0, S_{i-1} + z_i - k) looks
  inherently sequential, but unrolls to the prefix-sum identity
  S_i = P_i - min(0, min_{j<=i} P_j) with P = cumsum(z - k)
  (induction: S_1 = P_1 - min(0, P_1); if S_{i-1} = P_{i-1} - m
  with m = min(0, P_1..P_{i-1}), then max(0, P_i - m) =
  P_i - min(m, P_i) = P_i - min(0, P_1..P_i)). Two stacked window
  functions over the daily series, no recursion, no UDF, same
  two-phase range-partition escape hatch at scale. Day-series means
  and variances come from decimal-exact sums (repo float policy),
  so z-scores are bit-identical across engines.

- Rising runs: the classic gaps-and-islands rewrite (lag → break
  flag → running sum = run id) — one user-partitioned window, fully
  codegen'd, no state beyond the window frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dec
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

SESSION_GAP_US = 1800 * 1_000_000  # 30-min inactivity gap, microseconds

_CONCURRENCY_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 1
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                         > {SESSION_GAP_US} THEN 1
                    ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM ev
    ),
    bounds AS (
        SELECT date_trunc('minute', min(ts)) AS sm,
               date_trunc('minute', max(ts)) + INTERVAL 1 MINUTE AS em
        FROM sess GROUP BY user_id, sid
    ),
    deltas AS (
        SELECT m, CAST(sum(d) AS BIGINT) AS delta FROM (
            SELECT sm AS m, 1 AS d FROM bounds
            UNION ALL
            SELECT em AS m, -1 AS d FROM bounds
        ) GROUP BY m
    ),
    sweep AS (
        SELECT m,
               sum(delta) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS conc
        FROM deltas
    ),
    daymax AS (
        SELECT m, conc,
               max(conc) OVER (PARTITION BY CAST(m AS DATE)) AS pk
        FROM sweep
    )
    SELECT strftime(CAST(m AS DATE), '%Y-%m-%d') AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(epoch(min(m) FILTER (WHERE conc = pk)) AS BIGINT)
               AS peak_minute_epoch
    FROM daymax
    GROUP BY strftime(CAST(m AS DATE), '%Y-%m-%d')
    ORDER BY day
"""


@register(
    "concurrency_peak_sweepline",
    oracle=_CONCURRENCY_ORACLE,
    tags=("timeseries", "sweep-line", "sessionization"),
)
def concurrency_peak_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PEAK CONCURRENT SESSIONS BY DAY — the capacity-planning query:
    sessionize the event stream (30-min inactivity gap, microsecond-
    exact), turn each session into minute-bucketed +1/-1 boundary
    deltas, sweep a cumulative sum over the bucketed timeline, and
    report each day's peak concurrency plus the first minute (epoch
    seconds) at which that peak is reached.

    The running sum changes only at delta minutes, so the day-level
    max over delta rows equals the max over the continuous timeline
    for every day with at least one session boundary (days without
    boundaries carry no row — identical in the oracle). Deltas are
    summed per minute BEFORE the global window (map-side
    combinable), so the single ordered scan sees at most one row per
    active minute."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(uw)
    brk = (
        F.when(prev.isNull(), 1)
        .when(
            F.unix_micros(F.col("ts")) - F.unix_micros(prev) > SESSION_GAP_US,
            1,
        )
        .otherwise(0)
    )
    sess = ev.withColumn("brk", brk).withColumn(
        "sid", F.sum("brk").over(uw.rowsBetween(W.unboundedPreceding, 0))
    )
    bounds = sess.groupBy("user_id", "sid").agg(
        F.date_trunc("minute", F.min("ts")).alias("sm"),
        (F.date_trunc("minute", F.max("ts")) + F.expr("INTERVAL 1 MINUTE")).alias(
            "em"
        ),
    ).localCheckpoint(eager=True)  # session-cardinality; 2 consumers
    deltas = (
        bounds.select(F.col("sm").alias("m"), F.lit(1).alias("d"))
        .unionAll(bounds.select(F.col("em").alias("m"), F.lit(-1).alias("d")))
        .groupBy("m")
        .agg(F.sum("d").cast("bigint").alias("delta"))
    )
    sweep = deltas.withColumn(
        "conc",
        F.sum("delta").over(W.orderBy("m").rowsBetween(W.unboundedPreceding, 0)),
    )
    daymax = sweep.withColumn(
        "day", F.date_format(F.col("m"), "yyyy-MM-dd")
    ).withColumn("pk", F.max("conc").over(W.partitionBy("day")))
    return (
        daymax.groupBy("day")
        .agg(
            F.max("conc").cast("bigint").alias("peak_concurrency"),
            F.unix_seconds(
                F.min(F.when(F.col("conc") == F.col("pk"), F.col("m")))
            ).alias("peak_minute_epoch"),
        )
        .orderBy("day")
    )


CUSUM_K = 0.5  # slack, in sigma units
CUSUM_TOP = 15

_CUSUM_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    stats AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS DOUBLE) AS s1,
               CAST(sum(x * x) AS DOUBLE) AS s2
        FROM daily
    ),
    z AS (
        SELECT day,
               (CAST(x AS DOUBLE) - s1 / n)
                   / sqrt((s2 - s1 * s1 / n) / (n - 1)) - {CUSUM_K} AS q
        FROM daily, stats
    ),
    p1 AS (
        SELECT day, sum(q) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pf
        FROM z
    ),
    p2 AS (
        SELECT day, pf,
               min(pf) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS runmin
        FROM p1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(pf - least(0, runmin), 4) AS cusum_pos
    FROM p2
    ORDER BY cusum_pos DESC, day
    LIMIT {CUSUM_TOP}
"""


@register(
    "cusum_changepoint_daily_revenue",
    oracle=_CUSUM_ORACLE,
    tags=("timeseries", "changepoint", "cusum"),
)
def cusum_changepoint_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGE-POINT SCAN over daily order revenue — the upper
    Page statistic S_i = max(0, S_{i-1} + z_i - k), k = 0.5σ,
    reporting the top-15 days by S (a sustained upward revenue shift
    shows up as a high CUSUM ridge).

    The sequential recursion is rewritten to its closed form
    S_i = P_i - min(0, min_{j<=i} P_j) with P = prefix-sum(z - k) —
    two stacked window functions, zero iteration (induction proof in
    the module docstring). z-scores derive from decimal-exact
    sum / sum-of-squares; the prefix sums accumulate in day order in
    both engines, so the IEEE addition order is identical and the
    4dp rounding cannot diverge."""
    orders = t(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice")).alias("x"))
        .localCheckpoint(eager=True)  # calendar-bounded; 2 consumers
    )
    stats = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("s2"),
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        (
            (F.col("x").cast("double") - F.col("s1") / F.col("n"))
            / F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            )
            - F.lit(CUSUM_K)
        ).alias("q"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    p = z.withColumn("pf", F.sum("q").over(w)).withColumn(
        "runmin", F.min("pf").over(w)
    )
    return (
        p.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(
                F.col("pf") - F.least(F.lit(0.0), F.col("runmin")), 4
            ).alias("cusum_pos"),
        )
        .orderBy(F.desc("cusum_pos"), "day")
        .limit(CUSUM_TOP)
    )


MIN_RUN = 3

_RISING_ORACLE = f"""
    WITH ev AS (
        SELECT user_id, ts, event_id,
               CASE WHEN value > lag(value) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 0 ELSE 1 END AS brk
        FROM events
    ),
    runs AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS rid
        FROM ev
    ),
    lens AS (
        SELECT user_id, rid, count(*) AS run_len
        FROM runs GROUP BY user_id, rid
        HAVING count(*) >= {MIN_RUN}
    )
    SELECT CAST(run_len AS BIGINT) AS run_len,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM lens
    GROUP BY run_len
    ORDER BY run_len
"""


@register(
    "cep_rising_value_runs",
    oracle=_RISING_ORACLE,
    tags=("timeseries", "cep", "gaps-and-islands"),
)
def cep_rising_value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-STYLE PATTERN DETECTION — maximal runs of strictly
    increasing `value` per user (the MATCH_RECOGNIZE `A B+` shape,
    Flink CEP's canonical demo) via the gaps-and-islands rewrite:
    lag() marks streak breaks, a running sum of breaks numbers the
    runs, a group-by measures them. Output: distribution of run
    lengths >= 3 as (run_len, n_runs, n_users).

    Total order inside each user is (ts, event_id) — event_id is
    unique, so the lag frame is deterministic under duplicate
    timestamps in both engines."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(F.col("value") > F.lag("value").over(uw), 0).otherwise(1)
    runs = ev.withColumn("brk", brk).withColumn(
        "rid", F.sum("brk").over(uw.rowsBetween(W.unboundedPreceding, 0))
    )
    lens = (
        runs.groupBy("user_id", "rid")
        .agg(F.count("*").alias("run_len"))
        .filter(F.col("run_len") >= MIN_RUN)
    )
    return (
        lens.groupBy(F.col("run_len").cast("bigint").alias("run_len"))
        .agg(
            F.count("*").cast("bigint").alias("n_runs"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("run_len")
    )


BURN_BIN_US = 600 * 1_000_000  # 10-minute bins
BURN_SHORT_BINS = 5  # current + 5 preceding = 1 h
BURN_LONG_BINS = 35  # current + 35 preceding = 6 h
BURN_FACTOR = 1.15  # alert when BOTH windows exceed base_rate * this
BURN_TOP = 50

_BURNRATE_ORACLE = f"""
    WITH bins AS (
        SELECT epoch_us(ts) // {BURN_BIN_US} AS bin,
               count(*) AS n,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS ne
        FROM events GROUP BY bin
    ),
    base AS (
        SELECT CAST(sum(ne) AS DOUBLE) / sum(n) AS b FROM bins
    ),
    rolled AS (
        SELECT bin,
               sum(n) OVER ws AS n_1h, sum(ne) OVER ws AS ne_1h,
               sum(n) OVER wl AS n_6h, sum(ne) OVER wl AS ne_6h
        FROM bins
        WINDOW ws AS (ORDER BY bin
                      RANGE BETWEEN {BURN_SHORT_BINS} PRECEDING
                                AND CURRENT ROW),
               wl AS (ORDER BY bin
                      RANGE BETWEEN {BURN_LONG_BINS} PRECEDING
                                AND CURRENT ROW)
    )
    SELECT CAST(bin * {BURN_BIN_US} // 1000000 AS BIGINT) AS bin_start_epoch,
           CAST(n_1h AS BIGINT) AS n_1h,
           CAST(n_6h AS BIGINT) AS n_6h,
           round(CAST(ne_1h AS DOUBLE) / n_1h, 6) AS rate_1h,
           round(CAST(ne_6h AS DOUBLE) / n_6h, 6) AS rate_6h,
           round(b, 6) AS base_rate
    FROM rolled, base
    WHERE CAST(ne_1h AS DOUBLE) / n_1h > b * {BURN_FACTOR}
      AND CAST(ne_6h AS DOUBLE) / n_6h > b * {BURN_FACTOR}
    ORDER BY round(CAST(ne_1h AS DOUBLE) / n_1h, 6) DESC, bin_start_epoch
    LIMIT {BURN_TOP}
"""


@register(
    "slo_burnrate_multiwindow",
    oracle=_BURNRATE_ORACLE,
    tags=("timeseries", "slo", "burn-rate"),
)
def slo_burnrate_multiwindow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-WINDOW SLO BURN-RATE ALERT (the Google SRE workbook
    pattern): page only when the error rate exceeds the threshold in
    BOTH a short (1 h) and a long (6 h) rolling window — the short
    window gives fast detection, the long window suppresses blips.
    The threshold adapts to the corpus (base error rate × 1.15), and
    the output is the top-50 alert bins by short-window rate
    (rounded-rate + bin total order) so it stays bounded at any SF.
    Events bucket into 10-minute bins FIRST (map-side combinable
    count + conditional count), then two RANGE-frame rolling sums
    over the bin index handle missing bins identically in both
    engines. Rates are ratios of exact integers — one double
    division each, bit-identical."""
    ev = t(spark, sf_dir, "events")
    bins = ev.groupBy(
        (F.unix_micros(F.col("ts")) / F.lit(BURN_BIN_US))
        .cast("bigint")
        .alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("ne"),
    ).localCheckpoint(eager=True)  # bin-cardinality; base + rolling
    ws = W.orderBy("bin").rangeBetween(-BURN_SHORT_BINS, 0)
    wl = W.orderBy("bin").rangeBetween(-BURN_LONG_BINS, 0)
    base = bins.agg(
        (F.sum("ne").cast("double") / F.sum("n")).alias("b")
    )
    rolled = bins.select(
        "bin",
        F.sum("n").over(ws).alias("n_1h"),
        F.sum("ne").over(ws).alias("ne_1h"),
        F.sum("n").over(wl).alias("n_6h"),
        F.sum("ne").over(wl).alias("ne_6h"),
    ).crossJoin(F.broadcast(base))
    r1 = F.col("ne_1h").cast("double") / F.col("n_1h")
    r6 = F.col("ne_6h").cast("double") / F.col("n_6h")
    return (
        rolled.filter(
            (r1 > F.col("b") * BURN_FACTOR) & (r6 > F.col("b") * BURN_FACTOR)
        )
        .select(
            (F.col("bin") * BURN_BIN_US / 1_000_000)
            .cast("bigint")
            .alias("bin_start_epoch"),
            F.col("n_1h").cast("bigint").alias("n_1h"),
            F.col("n_6h").cast("bigint").alias("n_6h"),
            F.round(r1, 6).alias("rate_1h"),
            F.round(r6, 6).alias("rate_6h"),
            F.round("b", 6).alias("base_rate"),
        )
        .orderBy(F.desc("rate_1h"), "bin_start_epoch")
        .limit(BURN_TOP)
    )


_ENTROPY_ORACLE = """
    WITH cnt AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    per_user AS (
        SELECT user_id, sum(c) AS n,
               CAST(round(ln(sum(c))
                          - sum(c * ln(c)) / sum(c), 6)
                    AS DECIMAL(9,6)) AS h
        FROM cnt GROUP BY user_id
    )
    SELECT CAST(n // 10 AS BIGINT) AS events_band,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(h) AS DOUBLE) / count(*), 6) AS avg_entropy,
           CAST(min(h) AS DOUBLE) AS min_entropy,
           CAST(max(h) AS DOUBLE) AS max_entropy
    FROM per_user
    GROUP BY n // 10
    ORDER BY events_band
"""


@register(
    "events_user_entropy",
    oracle=_ENTROPY_ORACLE,
    tags=("timeseries", "entropy", "behavior"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEHAVIORAL ENTROPY — Shannon entropy of each user's event-type
    mix via the H = ln(n) − (Σ c·ln c)/n identity (exact integer
    counts feed the logs), bucketed by activity band (total events
    DIV 10). Per-user entropy rounds to 6dp and is summed as EXACT
    DECIMAL(9,6) — the band average is then a single double
    division, immune to summation-order ULP drift (repo float
    policy)."""
    cnt = (
        t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
    )
    per_user = cnt.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.round(
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
            6,
        )
        .cast("decimal(9,6)")
        .alias("h"),
    )
    return (
        per_user.groupBy(
            F.expr("n DIV 10").cast("bigint").alias("events_band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(
                F.sum("h").cast("double") / F.count("*"), 6
            ).alias("avg_entropy"),
            F.min("h").cast("double").alias("min_entropy"),
            F.max("h").cast("double").alias("max_entropy"),
        )
        .orderBy("events_band")
    )


XCORR_MAX_LAG = 7

_XCORR_ORACLE = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS buys
        FROM events GROUP BY day
    ),
    lags AS (
        SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1)) AS lag
    ),
    pairs AS (
        SELECT l.lag,
               CAST(a.clicks AS DOUBLE) AS x,
               CAST(b.buys AS DOUBLE) AS y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INTEGER))
    )
    SELECT CAST(lag AS BIGINT) AS lag_days,
           CAST(count(*) AS BIGINT) AS n_days,
           round((sum(x * y) - sum(x) * sum(y) / count(*))
                 / sqrt((sum(x * x) - sum(x) * sum(x) / count(*))
                        * (sum(y * y) - sum(y) * sum(y) / count(*)))
                 + 0.0, 6) AS xcorr
    FROM pairs
    GROUP BY lag
    ORDER BY lag_days
"""


@register(
    "xcorr_click_purchase_lag",
    oracle=_XCORR_ORACLE,
    tags=("timeseries", "cross-correlation", "lead-lag"),
)
def xcorr_click_purchase_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORRELATION LAG SCAN — Pearson correlation between daily
    click counts and daily purchase counts at every lag in ±7 days
    (the lead-lag question behind attribution windows: how long
    after click activity do purchases move?). Counts are exact
    integers per calendar day; each lag's correlation is one
    closed-form expression over the day-aligned join, signed-zero
    guarded.

    Scale: events contract to the calendar-bounded daily series
    (checkpointed — 15 lag consumers), the lag join is
    |days|×15 rows, and the moment sums reduce per lag."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("buys"),
        )
        .localCheckpoint(eager=True)
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select("day", F.col("clicks").cast("double").alias("x"))
    b = daily.select(
        F.col("day").alias("bday"), F.col("buys").cast("double").alias("y")
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bday") == F.date_add("day", F.col("lag")))
    )
    n = F.count("*")
    sxy = F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / n
    sxx = F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / n
    syy = F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y") / n
    return (
        pairs.groupBy(F.col("lag").cast("bigint").alias("lag_days"))
        .agg(
            n.cast("bigint").alias("n_days"),
            F.round(sxy / F.sqrt(sxx * syy) + 0.0, 6).alias("xcorr"),
        )
        .orderBy("lag_days")
    )
