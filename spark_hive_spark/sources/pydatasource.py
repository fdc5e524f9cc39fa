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
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        _HAS_STREAM_READER = True
    except ImportError:  # pragma: no cover
        _HAS_STREAM_READER = False

    if _HAS_STREAM_READER:

        class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
            """Offset-tracked streaming twin of the batch reader: each
            micro-batch emits the next `chunk` ids, the offset is the
            next unread id, and the generator is the same pure
            function of id — so replay from any offset is idempotent
            (exactly-once under retries, the property a production
            source derives from log offsets).

            SimpleDataSourceStreamReader runs driver-side (the
            prototyping tier of the API); a production-scale source
            implements the partitioned DataSourceStreamReader so each
            executor reads its own slice per batch — the BATCH reader
            above demonstrates that partitioned shape."""

            def __init__(self, options: dict) -> None:
                self.n = int(options.get("n", 10_000))
                self.chunk = int(options.get("chunk", 20_000))

            def initialOffset(self) -> dict:
                return {"next": 0}

            def read(self, start: dict):
                lo = int(start["next"])
                hi = min(lo + self.chunk, self.n)
                return self._rows(lo, hi), {"next": hi}

            def readBetweenOffsets(self, start: dict, end: dict):
                return self._rows(int(start["next"]), int(end["next"]))

            @staticmethod
            def _rows(lo: int, hi: int):
                # iter(list), not a bare generator or list: the engine
                # both advances the result with next() AND copies the
                # cached (rows, offset) pair — a list-iterator is the
                # one container that is an iterator and picklable
                return iter(
                    [
                        (
                            rid,
                            (rid * _KNUTH) % _M32 % 10,
                            (rid * _KNUTH) % _M32 % 10_000,
                        )
                        for rid in range(lo, hi)
                    ]
                )

        class SyntheticEventsStreamSource(DataSource):
            @classmethod
            def name(cls) -> str:
                return "synthetic_rows_stream"

            def schema(self) -> str:
                return "id bigint, bucket int, cents bigint"

            def simpleStreamReader(self, schema):
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
