"""Structured Streaming surface over the `events` fixture
(SURVEY.md §2B / §7 step 5): tumbling-window aggregation, session
windows, watermarking for late data, and a custom stateful operator
(applyInPandasWithState).

Test strategy: drive each streaming query from the static parquet via
`readStream` with a memory sink and `processAllAvailable()` — a real
streaming execution (incremental state store, same operators a Kafka
source would feed) that completes synchronously. The tumbling/session
aggregations in COMPLETE output mode end at the same result as their
batch twins in operators/temporal.py, so they get full DuckDB oracles
— the driver's strongest check applied to streaming code paths.

Scale notes: watermark bounds state (drop-late beyond 1 hour);
windowed aggs shuffle on (window, key) exactly like batch groupBy;
session windows use Spark's built-in session_window merge state.
foreachBatch is the exactly-once sink seam for real deployments.
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t, table_path


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the static events parquet (ts normalized to
    TIMESTAMP exactly as the batch reader does — adaptively, since the
    fixture has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS);
    see tables._normalize_event_ts)."""
    # Self-sufficient on ANY session (the grading driver builds its
    # own, without session.py's conf block): nanosAsLong is
    # runtime-settable and must be on before both the schema probe and
    # the stream's own parquet reads.
    from spark_hive_spark.tables import _normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # FileStreamSource requires a directory: stream the fixture dir
    # with a glob that selects only the events file.
    stream = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return stream.withColumn(
        "ts", _normalize_event_ts(stream, path=table_path(sf_dir, "events"))
    )


STATE_PARTITIONS = 8
"""Shuffle/state partition count for the streaming queries.

A streaming stateful operator opens one state store PER shuffle
partition PER stateful operator, and that per-store cost (store init,
checkpoint files, commit round) is paid every micro-batch regardless
of data volume. Sizing the stream's shuffle to the data — not to the
CPU count — is standard streaming-job tuning: at fixture scale 8
partitions cut the two-sided stream-stream join from 7.1 s to 3.3 s
(measured, sf0.1) with identical results. At 100 TB this knob goes UP
(partitions ~ state volume / target-state-per-store), which is why it
is a named constant and not a hard-coded literal. The conf is set only
while the streaming query plans and runs, then restored — Spark pins
a stream's partitioning at its first checkpoint, so the setting rides
with the query, not the session.
"""


class _stream_shuffle:
    """Scoped spark.sql.shuffle.partitions override (set at stream
    planning time, restored after the drain)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(STATE_PARTITIONS))

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def _run_to_completion(agg: DataFrame, mode: str) -> DataFrame:
    """Start a memory-sink query, drain all available input, return
    the sink table as a DataFrame."""
    name = f"strm_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory(prefix="ckpt_", dir=scratch_root()) as ckpt, _stream_shuffle(
        agg.sparkSession
    ):
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(ckpt, "cp"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    spark = agg.sparkSession
    # materialize before the memory sink is dropped by later queries
    out = spark.table(name)
    return out


@register(
    "stream_tumbling_counts",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "window-agg"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation, complete mode: the
    incremental state-store execution must converge to exactly the
    batch/oracle result once the input drains."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )
    out = _run_to_completion(agg, "complete")
    return (
        out.select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "stream_watermarked_windows",
    oracle="""
        WITH m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events
        FROM events, m
        WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR <= wm
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "watermark"),
)
def stream_watermarked_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling windows with a 1-hour watermark in APPEND mode — the
    production shape for late-data handling: a window emits only once
    the watermark passes its end, and state for closed windows is
    dropped.

    The drained result IS deterministic, so it gets a full oracle:
    a single-file FileStreamSource drains in one batch, the final
    watermark is max(ts) − 1h, and the trailing no-data micro-batch
    (on by default) flushes every closed window. Emission boundary is
    ``window_end <= watermark`` — ties EMIT (verified empirically with
    a crafted max(ts) landing exactly one hour past a window end) —
    which is exactly what the oracle's WHERE clause replays."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_completion(agg, "append")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n_events"
    ).orderBy("window_start", "event_type")


@register(
    "stream_session_windows",
    oracle="""
        WITH gaps AS (
            SELECT user_id, ts,
                   -- session_window semantics: a gap of EXACTLY the
                   -- 30-min threshold starts a new session (>=)
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
            SELECT user_id, ts,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_num
            FROM gaps
        )
        SELECT user_id,
               min(ts) AS session_start,
               count(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_num
        ORDER BY user_id, session_start
    """,
    tags=("streaming", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (built-in session_window, 30-min gap,
    complete mode). Converges to the same sessions as the batch
    lag/cumsum twin (`sessionize_events`) — which is exactly what the
    oracle computes."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = _run_to_completion(agg, "complete")
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        "n_events",
    ).orderBy("user_id", "session_start")


def running_user_totals_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total maintained in explicit state,
    emitting one update row per (user, micro-batch). The template for
    operators session_window can't express (custom eviction, nested
    state). Returns the final per-user state after draining."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = _event_stream(spark, sf_dir)

    def update(key, pdfs, state: GroupState):
        total_n, total_v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            total_n += len(pdf)
            total_v += float(pdf["value"].sum())
        state.update((total_n, total_v))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [total_n], "sum_value": [total_v]}
        )

    agg = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, v double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_completion(agg, "update")
    # keep the last emission per user (one drain → usually exactly one)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


@register(
    "stream_stateful_user_totals",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_events,
               round({sql_dsum('value')}, 6) AS sum_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("streaming", "stateful", "udf"),
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked wrapper: the custom stateful operator's final
    state must equal the batch per-user aggregate. (Float note: state
    accumulates via pandas sum per batch — round-6 on both sides.)"""
    out = running_user_totals_stateful(spark, sf_dir)
    return out.select(
        "user_id", "n_events", F.round("sum_value", 6).alias("sum_value")
    ).orderBy("user_id")


@register(
    "stream_dedup_within_watermark",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("streaming", "dedup", "watermark"),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: `dropDuplicatesWithinWatermark` on
    (user_id, event_type) — the bounded-state alternative to streaming
    `dropDuplicates`, whose state would otherwise grow forever. The
    1-hour watermark caps how long each key is remembered, which is
    the only deployable dedup shape on an unbounded 100 TB/day feed.

    The post-sink `countDistinct` summary makes the result independent
    of how the source chops batches (cross-batch re-emits collapse),
    so the streaming path gets a full DuckDB oracle."""
    ev = _event_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    sink = _run_to_completion(deduped, "append")
    return (
        sink.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


# transformWithStateInPandas ships its state protocol over protobuf.
# This container has no pip-installed google.protobuf, but the on-box
# google-cloud-sdk vendors a pure-Python protobuf runtime; when the
# normal import fails we zip that runtime (BSD-licensed) and use it as
# a fallback — sys.path for the driver, sc.addPyFile for the Python
# workers (worker.py prepends pyFiles to sys.path before any UDF or
# state-API code runs, so the lazy StateMessage_pb2 imports inside
# pyspark's StatefulProcessorApiClient resolve worker-side too).
# Activation is PORTABLE (VERDICT r7 task 5): the probe order is
# (1) an installed google.protobuf (pip/conda — the normal case on a
# real cluster image), (2) a vendored pure-Python runtime rooted at
# $SPARK_HIVE_PB_PATH if set, (3) the on-box google-cloud-sdk path
# this container happens to have. _PB_SOURCE records which one won,
# and the gate logs it, so "why did TWS (de)activate here" is a log
# line, not an archaeology session.
_PB_FALLBACK_SDK = os.environ.get(
    "SPARK_HIVE_PB_PATH",
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)
# cache key includes the source path, so an SPARK_HIVE_PB_PATH
# override can never be shadowed by a zip built from a different root
_PB_ZIP = os.path.join(
    scratch_root(),
    "spark_hive_pb_runtime."
    f"{hashlib.sha256(_PB_FALLBACK_SDK.encode()).hexdigest()[:12]}.zip",
)
_PB_FROM_ZIP = False
_PB_SOURCE = "unavailable"
_PB_SHIPPED_TO: set[str] = set()


def _build_protobuf_zip() -> str | None:
    """Zip the SDK-vendored pure-Python protobuf into an addPyFile-able
    archive (~150 KB). The vendored runtime is 6.32.0-dev while
    pyspark 4.1.2's generated StateMessage_pb2 declares gencode 6.33.0
    — a one-minor skew its strict check rejects — so the copy we ship
    sets protobuf's own documented escape hatch
    (TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK) at import time,
    scoped to processes that load this fallback zip."""
    import zipfile

    if os.path.exists(_PB_ZIP):
        return _PB_ZIP
    src = os.path.join(_PB_FALLBACK_SDK, "google", "protobuf")
    if not os.path.isdir(src):  # pragma: no cover - environment-dependent
        return None
    tmp = _PB_ZIP + f".{uuid.uuid4().hex}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("google/__init__.py", "")
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d not in ("pyext", "blaze-out", "net")]
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                path = os.path.join(root, fname)
                arc = os.path.relpath(path, _PB_FALLBACK_SDK)
                if fname == "runtime_version.py" and root == src:
                    with open(path) as fh:
                        body = fh.read()
                    body = body.replace(
                        "from enum import Enum",
                        "from enum import Enum\n"
                        "import os as _os\n"
                        "_os.environ.setdefault("
                        "'TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK', 'true')",
                        1,
                    )
                    z.writestr(arc, body)
                else:
                    z.write(path, arc)
    os.replace(tmp, _PB_ZIP)  # atomic: concurrent builders race safely
    return _PB_ZIP


def _protobuf_available() -> bool:
    """True if google.protobuf is importable driver-side, installing
    the fallback zip onto sys.path when needed. Sets _PB_SOURCE and
    logs the decision (probe order in the _PB_FALLBACK_SDK note)."""
    global _PB_FROM_ZIP, _PB_SOURCE
    log = logging.getLogger(__name__)
    try:
        import google.protobuf  # noqa: F401

        _PB_SOURCE = "installed google.protobuf"
        log.info("TWS protobuf gate: using %s", _PB_SOURCE)
        return True
    except ImportError:  # pragma: no cover - environment-dependent
        pass
    import sys

    zpath = _build_protobuf_zip()
    if zpath is None:  # pragma: no cover - environment-dependent
        log.info(
            "TWS protobuf gate: no installed protobuf and no vendored "
            "runtime at %s (set SPARK_HIVE_PB_PATH to activate) — "
            "transformWithState queries are gated off",
            _PB_FALLBACK_SDK,
        )
        return False
    if zpath not in sys.path:
        sys.path.insert(0, zpath)
    try:
        import google.protobuf  # noqa: F401

        _PB_FROM_ZIP = True
        _PB_SOURCE = f"vendored runtime zipped from {_PB_FALLBACK_SDK}"
        log.info("TWS protobuf gate: using %s", _PB_SOURCE)
        return True
    except ImportError:  # pragma: no cover - environment-dependent
        sys.path.remove(zpath)
        log.info(
            "TWS protobuf gate: vendored runtime at %s failed to "
            "import — transformWithState queries are gated off",
            _PB_FALLBACK_SDK,
        )
        return False


def _ship_protobuf(spark: SparkSession) -> None:
    """Make google.protobuf importable in this session's Python
    workers. No-op when the driver found a real install (local-mode
    workers share that env); otherwise addPyFile the fallback zip,
    once per SparkContext."""
    if not _PB_FROM_ZIP:
        return
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _PB_SHIPPED_TO:
        return
    sc.addPyFile(_PB_ZIP)
    _PB_SHIPPED_TO.add(app_id)


_HAS_PROTOBUF = _protobuf_available()

_TWS_ORACLE = """
        SELECT user_id,
               count(*) AS n_events,
               count(DISTINCT event_type) AS n_types
        FROM events
        GROUP BY user_id
        ORDER BY user_id
"""


def stream_tws_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator on the arbitrary-state API that
    SUPERSEDES applyInPandasWithState (Spark >= 4.0,
    `transformWithStateInPandas`): a StatefulProcessor holding typed
    composite state per user — a ValueState for the event counter and
    a MapState for per-event-type counts (RocksDB-backed, so map
    entries update point-wise without rewriting the whole value: the
    property that keeps huge per-key state cheap at 100 TB).

    Integer-only state (counts), so the result is bit-deterministic
    regardless of batch slicing; the oracle is the batch aggregate."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # transformWithState spawns python workers (one driver-side for
    # PRE_INIT, plus task workers) whose sys.path comes from the JVM's
    # env, not this process — the fallback-zip path installed by
    # _protobuf_available() doesn't reach them, and the driver-side
    # worker doesn't process addPyFile includes at all. Both, however,
    # unpickle this processor BEFORE the first lazy StateMessage_pb2
    # import, so the processor's own reconstruction hook installs the
    # zip worker-side. None when a real protobuf install exists.
    pb_zip = _PB_ZIP if _PB_FROM_ZIP else None

    class UserProfile(StatefulProcessor):
        def __reduce__(self):
            return (_mk_profile, (pb_zip,))

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n bigint")
            self._types = handle.getMapState("types", "t string", "c bigint")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for et, cnt in pdf.groupby("event_type").size().items():
                    prev = (
                        self._types.getValue((et,))[0]
                        if self._types.containsKey((et,))
                        else 0
                    )
                    self._types.updateValue((et,), (prev + int(cnt),))
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "n_types": [n_types]}
            )

        def close(self) -> None:
            pass

    def _mk_profile(zp):
        # runs in the unpickling worker; local[n] shares /tmp with the
        # driver so the literal zip path resolves. Cluster task
        # workers get the same zip via addPyFile (_ship_protobuf).
        import os as _os
        import sys as _sys

        if zp and _os.path.exists(zp) and zp not in _sys.path:
            _sys.path.insert(0, zp)
        return UserProfile.__new__(UserProfile)

    _ship_protobuf(spark)
    ev = _event_stream(spark, sf_dir)
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        agg = ev.groupBy("user_id").transformWithStateInPandas(
            UserProfile(),
            outputStructType="user_id bigint, n_events bigint, n_types bigint",
            outputMode="Update",
            timeMode="None",
        )
        out = _run_to_completion(agg, "update")
    finally:
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    # last emission per user wins (one per batch; single drain here)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .orderBy("user_id")
    )


if _HAS_PROTOBUF:  # pragma: no cover - environment-dependent
    register(
        "stream_tws_user_profile",
        oracle=_TWS_ORACLE,
        tags=("streaming", "stateful", "transformWithState"),
    )(stream_tws_user_profile)


@register(
    "stream_stream_interval_join",
    oracle="""
        SELECT c.user_id,
               c.event_id AS click_id,
               p.event_id AS purchase_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL '1 hour'
        ORDER BY c.user_id, click_id, purchase_id
    """,
    tags=("streaming", "stream-stream-join", "interval-join"),
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval (time-bounded) inner join: each click
    joined to the same user's purchases landing within the following
    hour — the canonical attribution join, run as a REAL stream-stream
    join (two streaming sources, state on both sides).

    Determinism: inner-join matches are emitted in whatever micro-batch
    completes the pair, independent of watermark timing (watermarks
    only bound state eviction), so after the input drains the append
    stream equals the batch interval join — full DuckDB oracle.

    Scale posture: both sides carry watermarks and the join condition
    time-bounds each side relative to the other, so Spark derives state
    eviction for BOTH join buffers (unbounded state is the failure mode
    of naive stream-stream joins). The gap is integer microseconds
    (exact in both engines); state shuffles on user_id, the natural
    key."""
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts > click_ts
            AND purchase_ts <= click_ts + INTERVAL 1 HOUR
            """
        ),
        "inner",
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
    out = _run_to_completion(joined, "append")
    return out.orderBy("user_id", "click_id", "purchase_id")


@register(
    "stream_foreachbatch_parquet_sink",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "foreachbatch", "sink"),
)
def stream_foreachbatch_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production sink seam: a streaming aggregation delivered via
    foreachBatch with idempotent full-overwrite — each micro-batch
    rewrites the complete result, so replays after failure converge to
    the same files (the exactly-once recipe when the sink itself is
    not transactional). The returned DataFrame is read back from the
    parquet the sink wrote, so the oracle attests the WHOLE path:
    stream -> state store -> foreachBatch -> parquet -> scan.

    Scale posture: the aggregate is (window x event_type)-bounded, so
    the per-batch overwrite is small regardless of input volume; for
    fact-grain sinks the same seam switches to MERGE / partition
    overwrite. Complete mode keeps state bounded by the group count,
    exactly like stream_tumbling_counts."""
    ev = _event_stream(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n_events"), dsum("value").alias("sum_value")
    )
    out_dir = os.path.join(
        scratch_root(), f"shs_fb_sink_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    with tempfile.TemporaryDirectory(prefix="ckpt_fb_", dir=scratch_root()) as ckpt, _stream_shuffle(
        spark
    ):
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(ckpt, "cp"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
    out = spark.read.parquet(out_dir).orderBy("window_start", "event_type")
    # materialize before the temp sink dir could be cleaned by callers
    out = out.cache()
    out.count()
    return out


@register(
    "stream_static_enrich_segments",
    oracle=f"""
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_events,
               {sql_dsum('e.value')} AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
        ORDER BY segment
    """,
    tags=("streaming", "stream-static-join", "enrichment"),
)
def stream_static_enrich_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment — the standard streaming
    ETL shape: an unbounded event stream inner-joins a bounded dim
    table (user -> market segment), then aggregates per segment.

    Scale notes: a stream-static INNER join is stateless (no
    watermark, no state store — each micro-batch joins against the
    static side and forgets), and the static side is broadcast, so
    the stream never shuffles before the aggregate. The dim table is
    re-read per micro-batch by design (that is how Spark picks up
    slowly-changing dims); at 100 TB you'd pin it with a cache() if
    staleness is acceptable. Complete-mode aggregate converges to the
    batch result once the input drains — which is what the oracle
    attests."""
    ev = _event_stream(spark, sf_dir)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id")
    agg = joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"), dsum("value").alias("sum_value")
    )
    out = _run_to_completion(agg, "complete")
    return out.orderBy("segment")


@register(
    "stream_multibatch_tumbling",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "window-agg", "multi-batch"),
)
def stream_multibatch_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling aggregate as `stream_tumbling_counts`, but
    forced through MULTIPLE micro-batches: the fixture is re-sharded
    into 4 files and the stream reads with maxFilesPerTrigger=1, so
    the state store must merge partial window aggregates across 4
    real batch boundaries before the oracle comparison. The
    single-file drains elsewhere in this module never exercise that
    merge path; this query attests it (a pytest additionally asserts
    the run really took >= 4 batches and that a stop/restart from the
    checkpoint converges to the same result).

    Scale note: maxFilesPerTrigger is the backpressure knob of file
    sources; the per-batch work is one partial aggregate of a file's
    rows — state size stays |windows x types| regardless of batch
    count or input volume."""
    ev = t(spark, sf_dir, "events").select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory(prefix="mbatch_", dir=scratch_root()) as d:
        data_dir = os.path.join(d, "events4")
        ev.repartition(4).write.parquet(data_dir)
        schema = spark.read.parquet(data_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data_dir)
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        out = _run_to_completion(agg, "complete")
        # materialize inside the tempdir's lifetime
        out = out.select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        ).orderBy("window_start", "event_type")
        out = out.localCheckpoint(eager=True)
    return out


@register(
    "stream_stream_left_outer_join",
    oracle="""
        WITH cutoff AS (
            SELECT least(
                       max(CASE WHEN event_type = 'click' THEN ts END),
                       max(CASE WHEN event_type = 'purchase' THEN ts END)
                   ) - INTERVAL 3 HOUR AS c
            FROM events
        ),
        clicks AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
              AND ts <= (SELECT c FROM cutoff)
        ),
        purchases AS (
            SELECT user_id AS p_user_id, event_id AS purchase_id,
                   ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id, c.click_id, p.purchase_id,
               epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
        FROM clicks c
        LEFT JOIN purchases p
          ON c.user_id = p.p_user_id
         AND p.purchase_ts > c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        ORDER BY c.user_id, c.click_id, p.purchase_id NULLS FIRST
    """,
    tags=("streaming", "stream-stream-join", "outer-join", "watermark"),
)
def stream_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join — the "clicks that never
    converted" side the inner join can't show. Outer (null-matched)
    rows are watermark-driven: Spark may emit a click-with-no-purchase
    only once the watermark proves no future purchase can match, so
    unlike the inner variant the result DEPENDS on how far the final
    watermark advanced. The query pins that boundary explicitly:
    clicks within 3 hours of the stream's end (1 h join interval +
    1 h watermark delay + 1 h safety) are dropped by a post-join
    filter, so every retained click's outer fate is decidable before
    the input drains — and the batch oracle applies the identical
    cutoff.
    The cutoff scalar comes from a batch read of the same source (one
    bounded collect, driver-side).

    Scale posture: same two-sided watermark + time-bounded condition
    as the inner join (state eviction derived for both buffers),
    state shuffled on user_id; the outer buffer additionally holds
    each click until watermark expiry — exactly the state the 3-hour
    cutoff bounds."""
    from spark_hive_spark.tables import t as _t

    # The final watermark is min over BOTH inputs of (max ts seen -
    # delay); on a sparse fixture the last purchase can trail the last
    # click by hours, so the cutoff anchors to the EARLIER of the two
    # stream maxima (observed: one unflushed outer row at sf0.001 when
    # anchored to max(ts)).
    cutoff = (
        _t(spark, sf_dir, "events")
        .agg(
            (
                F.least(
                    F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                    F.max(
                        F.when(F.col("event_type") == "purchase", F.col("ts"))
                    ),
                )
                - F.expr("INTERVAL 3 HOURS")
            ).alias("c")
        )
        .collect()[0][0]
    )
    # NOTE the cutoff is applied AFTER the join: filtering the click
    # stream first would compute the clicks-side watermark over the
    # truncated stream, dragging the query's combined watermark to
    # cutoff-1h and leaving the last clicks' outer fate undecided at
    # drain time (observed: 7 rows short at sf0.01).
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            user_id = p_user_id
            AND purchase_ts > click_ts
            AND purchase_ts <= click_ts + INTERVAL 1 HOUR
            """
        ),
        "leftOuter",
    ).filter(F.col("click_ts") <= F.lit(cutoff)).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
    out = _run_to_completion(joined, "append")
    return out.orderBy("user_id", "click_id", F.col("purchase_id").asc_nulls_first())


@register(
    "stream_session_dynamic_gap",
    oracle="""
        WITH ev AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN event_type = 'purchase'
                        THEN 1800000000 ELSE 900000000 END AS gap_us
            FROM events
        ),
        marked AS (
            SELECT user_id, ts, event_id, gap_us,
                   CASE WHEN max(epoch_us(ts) + gap_us) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                          OR epoch_us(ts) >= max(epoch_us(ts) + gap_us) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
                        THEN 1 ELSE 0 END AS is_new
            FROM ev
        ),
        numbered AS (
            SELECT user_id, ts, gap_us,
                   sum(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_num
            FROM marked
        )
        SELECT user_id,
               min(ts) AS session_start,
               make_timestamp(max(epoch_us(ts) + gap_us)) AS session_end,
               count(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_num
        ORDER BY user_id, session_start
    """,
    tags=("streaming", "session", "dynamic-gap"),
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the EVENT —
    purchases hold a session open 30 minutes, everything else 15
    (the standard "conversion events extend engagement" shape).
    Dynamic gaps are a Column argument to `session_window`, so the
    merge logic stays in the state store; the batch twin (and oracle)
    is the interval-merge rewrite — a session breaks where an event's
    start reaches the running max of previous event-ends — which is
    also the proof the streaming semantics match the declarative
    definition. The emitted session_end is max(ts + gap), so a wrong
    per-event gap or a wrong merge boundary flips the hash.

    Scale posture: identical to fixed-gap sessions — state shuffles
    on user_id, sessions merge in-store; complete mode is fixture
    convenience, production uses watermark + append."""
    ev = _event_stream(spark, sf_dir)
    # dynamic gaps are STRING-valued columns (session_window parses
    # them to CalendarInterval; a DayTimeInterval column is rejected)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("15 minutes"))
    agg = ev.groupBy(
        F.session_window("ts", gap).alias("sw"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    out = _run_to_completion(agg, "complete")
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
    ).orderBy("user_id", "session_start")


@register(
    "stream_stream_full_outer_join",
    oracle="""
        WITH cutoff AS (
            SELECT least(
                       max(CASE WHEN event_type = 'click' THEN ts END),
                       max(CASE WHEN event_type = 'purchase' THEN ts END)
                   ) - INTERVAL 3 HOUR AS c
            FROM events
        ),
        clicks AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id AS p_user_id, event_id AS purchase_id,
                   ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT coalesce(c.user_id, p.p_user_id) AS user_id,
               c.click_id, p.purchase_id,
               epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS gap_us
        FROM clicks c
        FULL JOIN purchases p
          ON c.user_id = p.p_user_id
         AND p.purchase_ts > c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        WHERE (c.click_ts IS NULL OR c.click_ts <= (SELECT c FROM cutoff))
          AND (p.purchase_ts IS NULL
               OR p.purchase_ts <= (SELECT c FROM cutoff))
        ORDER BY user_id, click_id NULLS FIRST, purchase_id NULLS FIRST
    """,
    tags=("streaming", "stream-stream-join", "outer-join", "watermark"),
)
def stream_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join — both unmatched sides
    at once: clicks that never converted AND purchases with no click
    in the preceding hour (organic conversions). Completes the
    stream-stream join family (inner interval / left outer / full
    outer). Both outer directions are watermark-driven, so the
    3-hour end-of-stream cutoff from the left-outer variant applies
    to BOTH sides post-join: every retained row's outer fate —
    click-side and purchase-side — is decidable before the input
    drains, and the batch oracle applies the identical two-sided
    cutoff to a batch FULL JOIN.

    Scale posture: two-sided watermark + time-bounded condition give
    Spark eviction bounds for BOTH state buffers (each row held ~2 h
    past its timestamp); state shuffles on the user key; outer-null
    emission happens on watermark advance, never at drain."""
    from spark_hive_spark.tables import t as _t

    cutoff = (
        _t(spark, sf_dir, "events")
        .agg(
            (
                F.least(
                    F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                    F.max(
                        F.when(F.col("event_type") == "purchase", F.col("ts"))
                    ),
                )
                - F.expr("INTERVAL 3 HOURS")
            ).alias("c")
        )
        .collect()[0][0]
    )
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = (
        clicks.join(
            purchases,
            F.expr(
                """
                user_id = p_user_id
                AND purchase_ts > click_ts
                AND purchase_ts <= click_ts + INTERVAL 1 HOUR
                """
            ),
            "fullOuter",
        )
        .filter(
            (F.col("click_ts").isNull() | (F.col("click_ts") <= F.lit(cutoff)))
            & (
                F.col("purchase_ts").isNull()
                | (F.col("purchase_ts") <= F.lit(cutoff))
            )
        )
        .select(
            F.coalesce("user_id", "p_user_id").alias("user_id"),
            "click_id",
            "purchase_id",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("gap_us"),
        )
    )
    out = _run_to_completion(joined, "append")
    return out.orderBy(
        "user_id",
        F.col("click_id").asc_nulls_first(),
        F.col("purchase_id").asc_nulls_first(),
    )


@register(
    "stream_update_mode_counts",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value,
               CAST(count(DISTINCT event_id % 4) AS BIGINT) AS n_updates
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "update-mode", "window-agg", "multi-batch"),
)
def stream_update_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode — the third and last aggregate output mode
    (complete and append are attested elsewhere): the sink receives
    only the CHANGED window aggregates each micro-batch. The input
    splits into 4 deterministic hash shards (event_id % 4) consumed
    one file per trigger, so each (window, type) key's update count
    equals the number of shards containing at least one of its
    events — which the oracle recomputes as count(DISTINCT
    event_id % 4). The final state per key is recovered from the
    update stream with max_by over the strictly-increasing event
    count (exactly how a downstream upsert sink compacts an update
    feed), and must match the batch aggregate.

    Scale: update mode is the production choice for keyed sinks —
    per-batch output is O(changed keys), not O(all keys) like
    complete mode; state size is unchanged."""
    ev = t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    with tempfile.TemporaryDirectory(prefix="updm_", dir=scratch_root()) as d:
        data_dir = os.path.join(d, "events4")
        for i in range(4):
            ev.filter(F.col("event_id") % 4 == i).coalesce(1).write.parquet(
                os.path.join(data_dir, f"shard={i}")
            )
        schema = spark.read.parquet(data_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data_dir)
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count("*").alias("n_events"), dsum("value").alias("sum_value")
        )
        updates = _run_to_completion(agg, "update")
        out = (
            updates.groupBy(
                F.col("w.start").alias("window_start"), "event_type"
            )
            .agg(
                F.max("n_events").alias("n_events"),
                F.expr("max_by(sum_value, n_events)").alias("sum_value"),
                F.count("*").cast("bigint").alias("n_updates"),
            )
            .orderBy("window_start", "event_type")
        )
        out = out.localCheckpoint(eager=True)
    return out


@register(
    "stream_available_now_catchup",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               {sql_dsum('value')} AS sum_value,
               TRUE AS caught_up_multi_batch
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type
    """,
    tags=("streaming", "trigger", "available-now", "backfill"),
)
def stream_available_now_catchup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigger.AvailableNow — the BACKFILL trigger: process everything
    already in the source and then STOP, while still honoring the
    source's rate limits (maxFilesPerTrigger=1 over a 4-file reshard
    here, so the catch-up runs as >= 4 real micro-batches with state
    carried across batch boundaries — unlike Trigger.Once, which
    would slurp everything into one giant batch and OOM a year-long
    backlog at 100 TB). The query self-terminates; the audit column
    pins that the engine genuinely took the multi-batch path
    (lastProgress batchId >= 3), and the windowed aggregate must
    equal the batch oracle exactly — catch-up then stop must lose
    nothing.

    Scale: THE operational pattern for periodic jobs over streaming
    sources — a cron-scheduled cluster processes the backlog in
    bounded batches (state, not memory, absorbs the volume) and
    releases the hardware; the checkpoint makes the next run
    incremental."""
    ev = t(spark, sf_dir, "events").select("ts", "event_type", "value")
    name = f"strm_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory(prefix="anow_", dir=scratch_root()) as d, _stream_shuffle(
        spark
    ):
        data_dir = os.path.join(d, "events4")
        ev.repartition(4).write.parquet(data_dir)
        schema = spark.read.parquet(data_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(data_dir)
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(
            F.count("*").alias("n_events"), dsum("value").alias("sum_value")
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(d, "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()  # AvailableNow self-terminates at drain
        last_batch = (q.lastProgress or {}).get("batchId", 0)
        out = (
            spark.table(name)
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
                F.lit(int(last_batch) >= 3).alias(
                    "caught_up_multi_batch"
                ),
            )
            .orderBy("window_start", "event_type")
            .localCheckpoint(eager=True)
        )
    return out
