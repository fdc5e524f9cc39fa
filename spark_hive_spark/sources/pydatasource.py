"""Custom Python data source (Spark 4 DataSource API) — the
extensible-source surface: a deterministic synthetic table generated
IN PARALLEL across partitions, registered as a real
``spark.read.format(...)`` source.

Why it matters at 100 TB: the DataSource API is how Spark ingests
systems it has no built-in connector for (internal services, RPC
feeds, proprietary stores). The two properties that make such a source
cluster-worthy are exercised here: (1) `partitions()` splits the scan
so every executor reads its own slice — no driver funnel; (2) the
generator is a pure function of (row id), so retries and speculative
tasks are idempotent — the same guarantee a production source derives
from offsets/snapshots.

Determinism: rows derive from the same Knuth multiplicative hash the
curation suite uses (arithmetic exact in int64 for both engines), so a
DuckDB `generate_series` twin reproduces the table bit-for-bit —
giving a full value-hash oracle for a source that reads no file at
all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root

_KNUTH = 2654435761
_M32 = 4294967296

try:  # pragma: no cover - import surface depends on pyspark version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    _HAS_DATASOURCE_API = False


if _HAS_DATASOURCE_API:

    class SyntheticEventsReader(DataSourceReader):
        """Range-partitioned deterministic generator: partition i
        yields ids [i*n/p, (i+1)*n/p) — contiguous slices, zero
        coordination, executor-side only."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 10_000))
            self.num_partitions = int(options.get("partitions", 8))

        def partitions(self):
            return [InputPartition(i) for i in range(self.num_partitions)]

        def read(self, partition):
            i = partition.value
            lo = i * self.n // self.num_partitions
            hi = (i + 1) * self.n // self.num_partitions
            for rid in range(lo, hi):
                h = (rid * _KNUTH) % _M32
                bucket = h % 10
                cents = h % 10_000
                yield (rid, bucket, cents)

    class SyntheticEventsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_rows"

        def schema(self) -> str:
            return "id bigint, bucket int, cents bigint"

        def reader(self, schema) -> "SyntheticEventsReader":
            return SyntheticEventsReader(self.options)


_N = 100_000
_PARTS = 16


@register(
    "source_python_datasource",
    oracle=f"""
        SELECT bucket,
               count(*) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents,
               CAST(sum(cents) AS DOUBLE) / (100 * count(*)) AS avg_score
        FROM (
            SELECT id,
                   ((id * {_KNUTH}) % {_M32}) % 10 AS bucket,
                   ((id * {_KNUTH}) % {_M32}) % 10000 AS cents
            FROM generate_series(0, {_N - 1}) AS g(id)
        )
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("source", "datasource-api", "python"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a 100k-row table from the custom Python data source (16
    parallel partitions) and aggregate per bucket. Money stays integer
    cents through the sum (order-independent); the average is one IEEE
    division at the end.

    The sf_dir parameter is unused by design: this query attests the
    no-file ingestion path."""
    if not _HAS_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError(
            "pyspark.sql.datasource API not available in this PySpark"
        )
    # idempotent per-session registration (re-register overwrites)
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_rows")
        .option("n", str(_N))
        .option("partitions", str(_PARTS))
        .load()
    )
    return (
        df.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("cents").alias("sum_cents"),
            (F.sum("cents").cast("double") / (F.lit(100) * F.count("*"))).alias(
                "avg_score"
            ),
        )
        .orderBy("bucket")
    )


if _HAS_DATASOURCE_API:
    try:  # pragma: no cover - version-dependent
        from pyspark.sql.datasource import DataSourceStreamReader

        _HAS_STREAM_READER = True
    except ImportError:  # pragma: no cover
        _HAS_STREAM_READER = False

    if _HAS_STREAM_READER:

        class SyntheticEventsStreamReader(DataSourceStreamReader):
            """Offset-tracked streaming twin of the batch reader: each
            micro-batch admits the next `chunk` ids (admission control,
            the maxOffsetsPerTrigger pattern), the offset is the next
            unread id, and the generator is the same pure function of
            id — so replay from any offset is idempotent (exactly-once
            under retries, the property a production source derives
            from log offsets).

            This is the PARTITIONED DataSourceStreamReader tier: each
            micro-batch's id range splits into executor-side partitions
            and `read` yields one Arrow RecordBatch per slice (numpy
            arithmetic, no per-row Python) — the same plan a
            production-scale source runs. The earlier driver-side
            SimpleDataSourceStreamReader form measured ~1 s slower at
            the 100k-row fixture purely in pickled-tuple transfer."""

            def __init__(self, options: dict) -> None:
                self.n = int(options.get("n", 10_000))
                self.chunk = int(options.get("chunk", 20_000))
                self.parts = int(options.get("partitions", 8))
                self._cursor = 0

            def initialOffset(self) -> dict:
                return {"next": 0}

            def latestOffset(self) -> dict:
                # admit one chunk per trigger so the drain exercises
                # multiple real micro-batches (offset-protocol attest)
                self._cursor = min(self._cursor + self.chunk, self.n)
                return {"next": self._cursor}

            def partitions(self, start: dict, end: dict):
                lo, hi = int(start["next"]), int(end["next"])
                # recovery contract (ADVICE r19): a restarted reader's
                # admission cursor starts at 0 while Spark replans from
                # the CHECKPOINTED offsets — never re-admit below them,
                # so latestOffset() keeps moving forward after restart
                self._cursor = max(self._cursor, lo, hi)
                k = max(1, min(self.parts, hi - lo))
                bounds = [
                    lo + (hi - lo) * i // k for i in range(k + 1)
                ]
                return [
                    InputPartition((bounds[i], bounds[i + 1]))
                    for i in range(k)
                ]

            def read(self, partition):
                import numpy as np
                import pyarrow as pa

                lo, hi = partition.value
                ids = np.arange(lo, hi, dtype=np.int64)
                h = (ids * _KNUTH) % _M32
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids, type=pa.int64()),
                        pa.array((h % 10).astype(np.int32),
                                 type=pa.int32()),
                        pa.array(h % 10_000, type=pa.int64()),
                    ],
                    names=["id", "bucket", "cents"],
                )

            def commit(self, end: dict) -> None:
                pass

        class SyntheticEventsStreamSource(DataSource):
            @classmethod
            def name(cls) -> str:
                return "synthetic_rows_stream"

            def schema(self) -> str:
                return "id bigint, bucket int, cents bigint"

            def streamReader(self, schema):
                return SyntheticEventsStreamReader(self.options)


@register(
    "source_python_datasource_stream",
    oracle=f"""
        SELECT bucket,
               count(*) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM (
            SELECT id,
                   ((id * {_KNUTH}) % {_M32}) % 10 AS bucket,
                   ((id * {_KNUTH}) % {_M32}) % 10000 AS cents
            FROM generate_series(0, {_N - 1}) AS g(id)
        )
        GROUP BY bucket
        ORDER BY bucket
    """,
    tags=("source", "datasource-api", "python", "streaming"),
)
def source_python_datasource_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING ingestion through the custom Python data source: the
    offset-tracked reader feeds 100k rows in 20k-row micro-batches
    (5 real batches), a complete-mode aggregate folds them, and the
    drained result must equal the batch/oracle table — attesting the
    offset protocol (no loss, no double-read across batch boundaries)
    end to end. sf_dir is unused by design: no file is read."""
    if not (_HAS_DATASOURCE_API and _HAS_STREAM_READER):  # pragma: no cover
        raise NotImplementedError(
            "pyspark.sql.datasource streaming API not available"
        )
    from spark_hive_spark.streaming.windows import _run_to_completion

    spark.dataSource.register(SyntheticEventsStreamSource)
    stream = (
        spark.readStream.format("synthetic_rows_stream")
        .option("n", str(_N))
        .option("chunk", "20000")
        .load()
    )
    agg = stream.groupBy("bucket").agg(
        F.count("*").alias("n_rows"), F.sum("cents").alias("sum_cents")
    )
    out = _run_to_completion(agg, "complete")
    return out.orderBy("bucket")


if _HAS_DATASOURCE_API and _HAS_STREAM_READER:

    class HudiTimelineStreamReader(DataSourceStreamReader):
        """Streaming INCREMENTAL reader over a Hudi COW timeline —
        the offset IS the last-consumed instant, exactly how Hudi's
        own streaming read (hoodiestreamer / spark readStream on a
        Hudi table) checkpoints progress. Each micro-batch serves
        ONE commit: the write-stats name the commit's file slices,
        and the per-row ``_hoodie_commit_time`` filter keeps only
        rows the commit actually wrote (COW rewrites carry the
        unchanged remainder forward — serving the whole slice would
        re-emit carried rows every batch). Replay between offsets
        re-reads the same commits idempotently (exactly-once under
        retries, derived from the timeline like a log offset).

        Partitioned DataSourceStreamReader tier: only the timeline
        LISTING runs on the driver (O(#commits) metadata, like any
        offset probe); each commit's file slices become input
        partitions read EXECUTOR-SIDE as Arrow record batches with
        the commit-time filter applied per batch in pyarrow.compute
        — no per-row Python, no driver funnel. (The earlier
        driver-side SimpleDataSourceStreamReader form shipped the
        150k-row bootstrap batch as pickled tuples: measured ~2 s of
        pure boundary cost at sf0.1.)"""

        def __init__(self, options: dict) -> None:
            self.table = options["table_path"]
            self._cursor: str | None = None

        def initialOffset(self) -> dict:
            return {"last": "000"}

        def _completed(self) -> dict:
            import json as _json
            import os as _os

            hdir = _os.path.join(self.table, ".hoodie")
            out = {}
            for f in _os.listdir(hdir):
                parts = f.split(".")
                if len(parts) == 2 and parts[1] == "commit":
                    with open(_os.path.join(hdir, f)) as fh:
                        out[parts[0]] = _json.load(fh)
            return out

        def latestOffset(self) -> dict:
            # admit ONE commit per trigger — each micro-batch is one
            # commit's change set, the Hudi incremental-read contract
            if self._cursor is None:
                self._cursor = "000"
            nxt = min(
                (ts for ts in self._completed() if ts > self._cursor),
                default=None,
            )
            if nxt is not None:
                self._cursor = nxt
            return {"last": self._cursor}

        def partitions(self, start: dict, end: dict):
            import os as _os

            # recovery contract (ADVICE r19): never re-admit instants
            # at or below the checkpointed offsets after a restart
            # (instants are zero-padded, so string max is ordered)
            self._cursor = max(
                self._cursor or "000", start["last"], end["last"]
            )
            commits = self._completed()
            parts = []
            for ts in sorted(commits):
                if start["last"] < ts <= end["last"]:
                    for s in commits[ts]["partitionToWriteStats"][""]:
                        parts.append(InputPartition(
                            (_os.path.join(self.table, s["path"]), ts)
                        ))
            # Spark requires at least one partition per batch
            return parts or [InputPartition((None, None))]

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as _pq

            path, instant = partition.value
            if path is None:
                return
            tbl = _pq.read_table(
                path,
                columns=["o_orderkey", "o_totalprice",
                         "_hoodie_commit_time"],
            )
            tbl = tbl.filter(
                pc.equal(tbl["_hoodie_commit_time"], instant)
            ).rename_columns(
                ["o_orderkey", "o_totalprice", "commit_time"]
            )
            yield from tbl.to_batches()

        def commit(self, end: dict) -> None:
            pass

    class HudiTimelineStreamSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "hudi_timeline_stream"

        def schema(self) -> str:
            return ("o_orderkey bigint, o_totalprice double, "
                    "commit_time string")

        def streamReader(self, schema):
            return HudiTimelineStreamReader(self.options)


@register(
    "stream_hudi_timeline_microbatch",
    oracle="""
        SELECT * FROM (
            SELECT '001' AS commit_time,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DOUBLE) AS revenue
            FROM orders
            UNION ALL
            SELECT '002', CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(o_totalprice + 100.00
                                 AS DECIMAL(18,2))) AS DOUBLE)
            FROM orders WHERE o_orderkey % 10 = 6
            UNION ALL
            SELECT '003', CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(o_totalprice + 50.00
                                 AS DECIMAL(18,2))) AS DOUBLE)
            FROM orders WHERE o_orderkey % 10 = 7
        )
        ORDER BY commit_time
    """,
    tags=("source", "hudi", "streaming", "datasource-api", "python",
          "incremental", "lakehouse"),
)
def stream_hudi_timeline_microbatch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING over a lakehouse timeline (round 19 compose) — the
    three families meet: a custom Python streaming DataSource whose
    offsets are HUDI INSTANTS serves one commit per micro-batch
    (batch 1 = the bootstrap snapshot at t1, then one batch per
    later commit's changed rows), and Structured Streaming folds
    them with a complete-mode aggregate. This is the
    consume-the-table-as-a-changelog pattern every incremental
    training-data pipeline runs against a lakehouse landing zone.

    The per-commit filter on ``_hoodie_commit_time`` is the
    load-bearing piece: COW rewrites carry unchanged rows forward,
    so a reader that serves whole slices re-emits the carried rows
    in every later batch — n_rows for commits 002/003 would inflate
    from the changed subset to the full file-group and flip the
    hash. Offsets make replay idempotent: the drained aggregate
    equals the oracle exactly once, no loss and no double-read
    across batch boundaries.

    Scale posture: offsets are O(#commits) timeline metadata probed
    driver-side; each batch reads only its commit's slices, one
    executor-side Arrow partition per slice."""
    import json as _json
    import os
    import shutil
    import tempfile
    import uuid

    if not (_HAS_DATASOURCE_API and _HAS_STREAM_READER):
        raise NotImplementedError(
            "pyspark.sql.datasource streaming API not available"
        )
    from spark_hive_spark.functions.numeric import dsum
    from spark_hive_spark.sources.staging import stage_single_parquet
    from spark_hive_spark.streaming.windows import _run_to_completion
    from spark_hive_spark.tables import t

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudistream_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    t1, t2, t3 = "001", "002", "003"
    par = F.col("o_orderkey") % 2
    base = orders.withColumn("_hoodie_commit_time", F.lit(t1))

    def _write(file_id: str, instant: str, df) -> tuple[str, int]:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        path = stage_single_parquet(df, root, tdir, name)
        # numWrites from the staged file's own footer — exact, and no
        # second Spark job per slice (was: df.count())
        import pyarrow.parquet as _pq

        return name, _pq.read_metadata(path).num_rows

    def _rewrite(src, mod_rem: int, bump: float, instant: str):
        changed = F.col("o_orderkey") % 10 == mod_rem
        return src.select(
            "o_orderkey",
            F.when(
                changed,
                (F.col("o_totalprice").cast("decimal(18,2)")
                 + F.lit(bump).cast("decimal(18,2)")).cast("double"),
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
            F.when(changed, F.lit(instant))
            .otherwise(F.col("_hoodie_commit_time"))
            .alias("_hoodie_commit_time"),
        )

    # the four slice writes are independent jobs — overlap them
    # (guide §2.6) instead of paying four sequential stage tails
    from spark_hive_spark.scratch import run_parallel

    a1, b1, a2, b3 = run_parallel(
        lambda: _write("fg-A", t1, base.filter(par == 0)),
        lambda: _write("fg-B", t1, base.filter(par == 1)),
        lambda: _write(
            "fg-A", t2, _rewrite(base.filter(par == 0), 6, 100.0, t2)
        ),
        lambda: _write(
            "fg-B", t3, _rewrite(base.filter(par == 1), 7, 50.0, t3)
        ),
    )

    def _commit(instant: str, stats) -> None:
        for sfx in (".commit.requested", ".commit.inflight"):
            open(os.path.join(hdir, instant + sfx), "w").close()
        with open(os.path.join(hdir, f"{instant}.commit"), "w") as fh:
            _json.dump({"partitionToWriteStats": {"": [
                {"fileId": n.split("_")[0], "path": n, "numWrites": c}
                for n, c in stats
            ]}}, fh)

    _commit(t1, [a1, b1])
    _commit(t2, [a2])
    _commit(t3, [b3])

    spark.dataSource.register(HudiTimelineStreamSource)
    stream = (
        spark.readStream.format("hudi_timeline_stream")
        .option("table_path", tdir)
        .load()
    )
    agg = stream.groupBy("commit_time").agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    )
    out = (
        _run_to_completion(agg, "complete")
        .orderBy("commit_time")
        .localCheckpoint(eager=True)  # 3 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out
