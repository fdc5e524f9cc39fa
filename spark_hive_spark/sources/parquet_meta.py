"""Parquet footer reading WITHOUT the parquet library — the file-format
floor under every lakehouse data-skipping layer (SURVEY.md §2B source
surface).

Delta and Iceberg keep min/max stats in *table-level* manifests (see
`snapshot_file_skipping_audit`), but the same statistics exist one
level down, inside every parquet file's own footer: per-ROW-GROUP
min/max/null-count per column. A scan that has already picked its
files still prunes row groups against these footer stats — that is
what `spark.sql.parquet.filterPushdown` ultimately does — so this
module hand-builds that layer from the two public specs:

- **Thrift Compact Protocol** (thrift.apache.org compact-protocol
  spec): varint + zigzag field headers with delta-encoded ids,
  size-in-nibble lists, byte-level bool fields, recursive structs —
  a generic `{field-id: value}` struct walker, ~60 lines.
- **parquet-format `parquet.thrift`** (github.com/apache/parquet-
  format): `FileMetaData` (1:version, 2:schema, 3:num_rows,
  4:row_groups, 6:created_by) → `RowGroup` (1:columns, 3:num_rows)
  → `ColumnChunk` (3:meta_data) → `ColumnMetaData` (1:type,
  3:path_in_schema, 4:codec, 5:num_values, 12:statistics) →
  `Statistics` (5:max_value/6:min_value, with the pre-2.4
  1:max/2:min fallback); plain-encoded stat payloads per physical
  type (INT32/INT64/DOUBLE little-endian, BYTE_ARRAY UTF-8).

The footer decode is DIFFERENTIALLY TESTED against pyarrow's own
metadata API (`tests/test_parquet_meta.py`): every row group, every
column, min/max/null-count/num-rows byte-identical — the same
reference-implementation discipline as the zstd decoder's CLI
differential (operators/zstd.py).

Scale posture: footer decode is O(footer bytes) and happens at scan
*planning* time — exactly what a real reader does per file. At 100 TB
the per-file footers are read in parallel (a mapInPandas over the
file listing yields one stats row per row group); the data pages of a
pruned row group are never fetched, which is the entire point. Row
groups selected by planning are then read as independent splits —
here literally, one `pyarrow.ParquetFile.read_row_group` per task —
matching Spark's own row-group-aligned split model.

Reference parity: the reference engine reads its inputs whole
(CollegeScorecard.scala:35-157 has no statistics pruning); this is
north-star surface per SURVEY.md §2B.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import struct
import tempfile
import uuid
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

_MAGIC = b"PAR1"
_N_GROUPS = 8  # fixture row-group count (ceil-divide split, any sf)

# physical types (parquet.thrift Type enum)
_BOOLEAN, _INT32, _INT64, _INT96 = 0, 1, 2, 3
_FLOAT, _DOUBLE, _BYTE_ARRAY, _FLBA = 4, 5, 6, 7
_PHYS = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}


# ---------------------------------------------------------------------------
# Thrift Compact Protocol — generic struct decoder
# ---------------------------------------------------------------------------

def _uvarint(b: bytes, p: int) -> tuple[int, int]:
    """ULEB128 -> (value, next pos); rejects truncation / >64-bit runs."""
    u = shift = 0
    while True:
        if p >= len(b):
            raise ValueError("truncated thrift varint")
        c = b[p]
        p += 1
        u |= (c & 0x7F) << shift
        if not (c & 0x80):
            return u, p
        shift += 7
        if shift > 63:
            raise ValueError("thrift varint overruns 64 bits")


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _read_value(b: bytes, p: int, ctype: int) -> tuple[Any, int]:
    """Decode one compact-protocol value of wire type ``ctype``."""
    if ctype in (1, 2):  # bool inside list/map: one payload byte
        v = b[p]
        return v == 1, p + 1
    if ctype == 3:  # byte
        return struct.unpack_from("<b", b, p)[0], p + 1
    if ctype in (4, 5, 6):  # i16/i32/i64: zigzag varint
        u, p = _uvarint(b, p)
        return _unzigzag(u), p
    if ctype == 7:  # double: 8 bytes little-endian
        return struct.unpack_from("<d", b, p)[0], p + 8
    if ctype == 8:  # binary / string: length varint + bytes
        n, p = _uvarint(b, p)
        if p + n > len(b):
            raise ValueError("truncated thrift binary")
        return bytes(b[p : p + n]), p + n
    if ctype in (9, 10):  # list / set: (size<<4|etype), size 15 -> varint
        h = b[p]
        p += 1
        size, etype = h >> 4, h & 0x0F
        if size == 15:
            size, p = _uvarint(b, p)
        out = []
        for _ in range(size):
            v, p = _read_value(b, p, etype)
            out.append(v)
        return out, p
    if ctype == 11:  # map: size varint, then (ktype<<4|vtype) if non-empty
        size, p = _uvarint(b, p)
        if size == 0:
            return {}, p
        h = b[p]
        p += 1
        ktype, vtype = h >> 4, h & 0x0F
        m = {}
        for _ in range(size):
            k, p = _read_value(b, p, ktype)
            v, p = _read_value(b, p, vtype)
            m[k] = v
        return m, p
    if ctype == 12:  # struct
        return _read_struct(b, p)
    raise ValueError(f"unknown thrift compact wire type {ctype}")


def _read_struct(b: bytes, p: int) -> tuple[dict[int, Any], int]:
    """Struct -> {field id: value}; field ids are delta-encoded in the
    header nibble (0 => explicit zigzag-varint id); stops at 0x00."""
    fid = 0
    out: dict[int, Any] = {}
    while True:
        if p >= len(b):
            raise ValueError("unterminated thrift struct")
        h = b[p]
        p += 1
        if h == 0x00:  # STOP
            return out, p
        delta, ctype = h >> 4, h & 0x0F
        if delta:
            fid += delta
        else:
            u, p = _uvarint(b, p)
            fid = _unzigzag(u)
        if ctype == 1:  # BOOLEAN_TRUE: value lives in the type nibble
            out[fid] = True
            continue
        if ctype == 2:  # BOOLEAN_FALSE
            out[fid] = False
            continue
        out[fid], p = _read_value(b, p, ctype)


# ---------------------------------------------------------------------------
# parquet.thrift interpretation
# ---------------------------------------------------------------------------

def decode_footer(data: bytes) -> dict[int, Any]:
    """Raw parquet file bytes -> FileMetaData as nested {field-id: value}
    dicts (file layout: ``PAR1 .. footer .. <u32 len> PAR1``)."""
    if len(data) < 12 or data[:4] != _MAGIC or data[-4:] != _MAGIC:
        raise ValueError("not a parquet file (PAR1 magic missing)")
    flen = struct.unpack("<I", data[-8:-4])[0]
    start = len(data) - 8 - flen
    if start < 4:
        raise ValueError("parquet footer length overruns file")
    fmd, _ = _read_struct(data, start)
    return fmd


def _decode_stat(raw: bytes | None, phys: int) -> Any:
    """Plain-encoded Statistics payload -> python value per physical type."""
    if raw is None:
        return None
    if phys == _INT32:
        return struct.unpack("<i", raw)[0]
    if phys == _INT64:
        return struct.unpack("<q", raw)[0]
    if phys == _FLOAT:
        return struct.unpack("<f", raw)[0]
    if phys == _DOUBLE:
        return struct.unpack("<d", raw)[0]
    if phys == _BOOLEAN:
        return raw[0] != 0
    if phys == _BYTE_ARRAY:
        return raw.decode("utf-8", errors="replace")
    return raw  # INT96 / FLBA stay opaque


def footer_summary(data: bytes) -> dict[str, Any]:
    """Interpreted footer: file-level info + per-row-group column stats.

    -> {"version", "num_rows", "created_by", "columns": [names...],
        "row_groups": [{"num_rows", "stats": {col: {"min", "max",
        "null_count", "type"}}}]}
    """
    fmd = decode_footer(data)
    schema = fmd[2]  # list<SchemaElement>; [0] is the root group
    col_names = [
        se[4].decode() for se in schema[1:] if 5 not in se  # leaves only
    ]
    groups = []
    for rg in fmd[4]:
        stats: dict[str, dict[str, Any]] = {}
        for cc in rg[1]:  # list<ColumnChunk>
            cmd = cc[3]  # ColumnMetaData
            phys = cmd[1]
            path = ".".join(seg.decode() for seg in cmd[3])
            st = cmd.get(12, {})
            # 5/6 = max_value/min_value (logical order); 1/2 legacy
            stats[path] = {
                "type": _PHYS.get(phys, str(phys)),
                "min": _decode_stat(st.get(6, st.get(2)), phys),
                "max": _decode_stat(st.get(5, st.get(1)), phys),
                "null_count": st.get(3),
                "num_values": cmd[5],
            }
        groups.append({"num_rows": rg[3], "stats": stats})
    return {
        "version": fmd[1],
        "num_rows": fmd[3],
        "created_by": (fmd.get(6) or b"").decode() or None,
        "columns": col_names,
        "row_groups": groups,
    }


# ---------------------------------------------------------------------------
# fixture: one parquet file, 8 deterministic row groups
# ---------------------------------------------------------------------------

def _write_fixture(spark: SparkSession, sf_dir: str, root: str) -> str:
    """orders (3 cols) sorted by (o_orderdate, o_orderkey), written as a
    single parquet file with exactly ceil(n/8)-row row groups.

    The WRITER is pyarrow (a real engine's parquet writer — the hand-
    built part of this module is the *reader*, which the differential
    pytest checks against pyarrow's own metadata API). The sort gives
    row groups disjoint o_orderdate ranges, the layout a clustered
    ingest (OPTIMIZE ... ZORDER / sorted write) produces, which is
    what makes min/max pruning effective. Fixture construction
    collects one bounded 3-column slice driver-side (toArrow); in
    production the files already exist — the operator under test is
    the footer decoder + planner, not the write."""
    import pyarrow.parquet as pq

    tbl = (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .sort("o_orderdate", "o_orderkey")
        .toArrow()
    )
    n = tbl.num_rows
    path = os.path.join(root, "orders_sorted.parquet")
    pq.write_table(tbl, path, row_group_size=(n + _N_GROUPS - 1) // _N_GROUPS)
    return path


# the same group arithmetic, as SQL the DuckDB oracle can run: group i
# covers rows [i*g, (i+1)*g) of the (o_orderdate, o_orderkey) order,
# g = ceil(n/8) — integer arithmetic identical to the writer's split.
_SQL_GROUPED = f"""
    WITH numbered AS (
        SELECT o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1
                   AS rn,
               count(*) OVER () AS n
        FROM orders
    ),
    grouped AS (
        SELECT *, CAST(rn // ((n + {_N_GROUPS - 1}) // {_N_GROUPS})
                       AS INT) AS rg
        FROM numbered
    )
"""


@register(
    "source_parquet_footer_stats",
    oracle=f"""
        {_SQL_GROUPED}
        SELECT rg,
               CAST(count(*) AS BIGINT) AS n_rows,
               min(o_orderkey) AS min_orderkey,
               max(o_orderkey) AS max_orderkey,
               min(o_orderdate) AS min_orderdate,
               max(o_orderdate) AS max_orderdate,
               CAST(0 AS BIGINT) AS null_count
        FROM grouped
        GROUP BY rg
        ORDER BY rg
    """,
    tags=("source", "parquet", "metadata", "thrift", "statistics"),
)
def source_parquet_footer_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hand-decoded parquet footer statistics (round 10): write orders
    date-sorted as ONE parquet file with exactly 8 ceil-divide row
    groups, then read the per-row-group min/max/null-count column
    statistics back **from the raw footer bytes** through the
    hand-built Thrift-Compact-Protocol + parquet.thrift decoder above
    — no parquet library on the read path.

    The oracle recomputes every row group's min/max orderkey and
    orderdate from the source table with the identical
    row_number/ceil-divide arithmetic, so a varint, zigzag, field-id
    delta, list-header, stat-payload-endianness, or group-boundary
    bug flips the driver's value hash. The differential pytest
    additionally checks the decode byte-for-byte against pyarrow's
    metadata API on every row group and column.

    Scale posture: the decode is O(footer bytes) per file — real scan
    planning cost; nothing here reads a data page."""
    root = os.path.join(tempfile.gettempdir(), f"shs_pqm_{uuid.uuid4().hex}")
    os.makedirs(root)
    path = _write_fixture(spark, sf_dir, root)
    with open(path, "rb") as fh:
        summ = footer_summary(fh.read())
    rows = []
    for i, rg in enumerate(summ["row_groups"]):
        key, date = rg["stats"]["o_orderkey"], rg["stats"]["o_orderdate"]
        rows.append(
            (
                i,
                int(rg["num_rows"]),
                int(key["min"]),
                int(key["max"]),
                # timestamp[us] stats are INT64 micros since epoch
                dt.datetime(1970, 1, 1)
                + dt.timedelta(microseconds=date["min"]),
                dt.datetime(1970, 1, 1)
                + dt.timedelta(microseconds=date["max"]),
                int(key["null_count"] or 0) + int(date["null_count"] or 0),
            )
        )
    out = spark.createDataFrame(
        rows,
        "rg int, n_rows bigint, min_orderkey bigint, max_orderkey bigint,"
        " min_orderdate timestamp, max_orderdate timestamp,"
        " null_count bigint",
    ).localCheckpoint(eager=True)  # frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


_PRUNE_LO = dt.datetime(1995, 4, 1)
_PRUNE_HI = dt.datetime(1996, 3, 31, 23, 59, 59, 999999)


@register(
    "source_parquet_rowgroup_skipping",
    oracle=f"""
        {_SQL_GROUPED},
        rg_stats AS (
            SELECT rg, count(*) AS rg_rows,
                   min(o_orderdate) AS mn, max(o_orderdate) AS mx
            FROM grouped GROUP BY rg
        ),
        planned AS (
            SELECT rg, rg_rows FROM rg_stats
            WHERE NOT (mx < TIMESTAMP '1995-04-01 00:00:00'
                       OR mn > TIMESTAMP '1996-03-31 23:59:59.999999')
        )
        SELECT CAST({_N_GROUPS} AS INT) AS rowgroups_total,
               CAST((SELECT count(*) FROM planned) AS INT)
                   AS rowgroups_scanned,
               CAST({_N_GROUPS} - (SELECT count(*) FROM planned) AS INT)
                   AS rowgroups_skipped,
               CAST((SELECT sum(rg_rows) FROM planned) AS BIGINT)
                   AS rows_planned,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-04-01 00:00:00'
                              AND TIMESTAMP '1996-03-31 23:59:59.999999'
    """,
    tags=("source", "parquet", "pruning", "data-skipping", "thrift"),
)
def source_parquet_rowgroup_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Row-group min/max pruning from hand-decoded footer stats (round
    10) — the file-format floor under `snapshot_file_skipping_audit`:
    planning intersects a two-fiscal-quarter o_orderdate predicate
    with each row group's footer [min, max] BEFORE any data page is
    touched, then reads ONLY the surviving row groups, one per task
    (`ParquetFile.read_row_group` inside mapInPandas — literally
    Spark's row-group-aligned split model), and applies the residual
    predicate exactly.

    The oracle recomputes the planned-group set with the identical
    row_number/ceil-divide + interval-overlap arithmetic and the
    aggregate over the FULL table: wrongly pruning a needed group
    flips n_orders/revenue, failing to prune flips
    rowgroups_scanned/rows_planned.

    Scale posture: planning is O(#row-groups) footer arithmetic;
    the scan fans out one task per surviving row group — at 100 TB
    both are per-file-parallel and pruned pages are never fetched."""
    root = os.path.join(tempfile.gettempdir(), f"shs_pqs_{uuid.uuid4().hex}")
    os.makedirs(root)
    path = _write_fixture(spark, sf_dir, root)
    with open(path, "rb") as fh:
        summ = footer_summary(fh.read())

    lo_us = int((_PRUNE_LO - dt.datetime(1970, 1, 1)).total_seconds()) * 10**6
    hi_us = (
        int((_PRUNE_HI - dt.datetime(1970, 1, 1)).total_seconds()) * 10**6
        + _PRUNE_HI.microsecond
    )
    selected = [
        (i, int(rg["num_rows"]))
        for i, rg in enumerate(summ["row_groups"])
        if not (
            rg["stats"]["o_orderdate"]["max"] < lo_us
            or rg["stats"]["o_orderdate"]["min"] > hi_us
        )
    ]
    n_total = len(summ["row_groups"])
    rows_planned = sum(r for _, r in selected)

    plan = spark.createDataFrame(
        [(path, i) for i, _ in selected], "path string, rg int"
    ).repartition(max(len(selected), 1))

    def _read_groups(batches) -> Iterator:
        import pyarrow.parquet as pq

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                pf = pq.ParquetFile(rec.path)
                yield pf.read_row_group(
                    rec.rg, columns=["o_orderdate", "o_totalprice"]
                ).to_pandas()

    scanned = plan.mapInPandas(
        _read_groups, "o_orderdate timestamp, o_totalprice double"
    ).filter(
        (F.col("o_orderdate") >= F.lit(_PRUNE_LO))
        & (F.col("o_orderdate") <= F.lit(_PRUNE_HI))
    )
    out = scanned.agg(
        F.lit(n_total).cast("int").alias("rowgroups_total"),
        F.lit(len(selected)).cast("int").alias("rowgroups_scanned"),
        F.lit(n_total - len(selected)).cast("int").alias(
            "rowgroups_skipped"
        ),
        F.lit(rows_planned).cast("bigint").alias("rows_planned"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
