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
from spark_hive_spark.scratch import scratch_root
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


def _decode_stat(
    raw: bytes | None, phys: int, scale: int | None = None
) -> Any:
    """Plain-encoded Statistics payload -> python value per physical
    type. For FIXED_LEN_BYTE_ARRAY with a decimal ``scale``, decodes
    the big-endian two's-complement unscaled value the spec
    prescribes for DECIMAL stats."""
    if raw is None:
        return None
    if phys == _FLBA and scale is not None:
        from decimal import Decimal

        unscaled = int.from_bytes(raw, "big", signed=True)
        return Decimal(unscaled).scaleb(-scale)
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


def _leaf_paths(schema: list[dict[int, Any]]) -> list[tuple[str, dict[int, Any]]]:
    """Flattened SchemaElement list -> [(dotted path, leaf element)].

    The schema is a pre-order tree flattening where groups carry
    field 5 (num_children); the dotted path is what ColumnMetaData's
    path_in_schema (field 3) joins to, so stats lookups for leaves
    nested inside groups need the path, not the bare leaf name."""
    out: list[tuple[str, dict[int, Any]]] = []
    # stack of [remaining-children, prefix] frames; root is schema[0]
    stack: list[list[Any]] = [[schema[0].get(5, 0), ()]]
    for se in schema[1:]:
        while stack and stack[-1][0] == 0:
            stack.pop()
        if not stack:
            raise ValueError("schema walk overran the declared tree")
        stack[-1][0] -= 1
        name = se[4].decode()
        path = stack[-1][1] + (name,)
        if 5 in se:  # group node
            stack.append([se[5], path])
        else:
            out.append((".".join(path), se))
    return out


def leaf_field_ids(
    schema: list[dict[int, Any]],
) -> dict[str, int | None]:
    """Flattened SchemaElement list -> {dotted leaf path: field_id}
    (SchemaElement field 9, None when the writer recorded none).
    Field ids are the resolution key for Delta column mapping's ID
    mode and Iceberg's schema evolution — physical column NAMES are
    explicitly not identity there."""
    out: dict[str, int | None] = {}
    stack: list[list[Any]] = [[schema[0].get(5, 0), ()]]
    for se in schema[1:]:
        while stack and stack[-1][0] == 0:
            stack.pop()
        if not stack:
            raise ValueError("schema walk overran the declared tree")
        stack[-1][0] -= 1
        name = se[4].decode()
        path = stack[-1][1] + (name,)
        if 5 in se:  # group node
            stack.append([se[5], path])
        else:
            out[".".join(path)] = se.get(9)
    return out


def schema_field_ids(
    schema: list[dict[int, Any]],
) -> dict[str, int | None]:
    """Flattened SchemaElement list -> {dotted path: field_id} for
    EVERY node, groups included (round 15). Leaf ids resolve scalar
    and struct-nested Delta id-mode fields, but an ARRAY or MAP
    field's id lives on its outer GROUP node — `leaf_field_ids`
    never sees it — while the repeated wrapper levels ('list',
    'key_value') and their primitive children typically carry
    none."""
    out: dict[str, int | None] = {}
    stack: list[list[Any]] = [[schema[0].get(5, 0), ()]]
    for se in schema[1:]:
        while stack and stack[-1][0] == 0:
            stack.pop()
        if not stack:
            raise ValueError("schema walk overran the declared tree")
        stack[-1][0] -= 1
        name = se[4].decode()
        path = stack[-1][1] + (name,)
        out[".".join(path)] = se.get(9)
        if 5 in se:  # group node
            stack.append([se[5], path])
    return out


def _leaf_repetitions(
    schema: list[dict[int, Any]],
) -> dict[str, list[int]]:
    """Flattened SchemaElement list -> {dotted leaf path: the
    repetition_type (field 3: 0=REQUIRED 1=OPTIONAL 2=REPEATED) of
    every node on the root→leaf path, root excluded}.

    This is what fixes a leaf's max definition / repetition levels
    (Dremel encoding): max_def = count of OPTIONAL+REPEATED ancestors
    incl. the leaf, max_rep = count of REPEATED ones — the page
    readers need both to size the level streams."""
    out: dict[str, list[int]] = {}
    stack: list[list[Any]] = [[schema[0].get(5, 0), (), []]]
    for se in schema[1:]:
        while stack and stack[-1][0] == 0:
            stack.pop()
        if not stack:
            raise ValueError("schema walk overran the declared tree")
        stack[-1][0] -= 1
        name = se[4].decode()
        path = stack[-1][1] + (name,)
        reps = stack[-1][2] + [se.get(3, 0)]
        if 5 in se:  # group node
            stack.append([se[5], path, reps])
        else:
            out[".".join(path)] = reps
    return out


def max_levels(repetitions: list[int]) -> tuple[int, int]:
    """Repetition-type chain -> (max_def_level, max_rep_level)."""
    max_def = sum(1 for r in repetitions if r in (1, 2))
    max_rep = sum(1 for r in repetitions if r == 2)
    return max_def, max_rep


def footer_summary(data: bytes) -> dict[str, Any]:
    """Interpreted footer: file-level info + per-row-group column stats.

    -> {"version", "num_rows", "created_by", "columns": [names...],
        "row_groups": [{"num_rows", "stats": {col: {"min", "max",
        "null_count", "type"}}}]}
    """
    fmd = decode_footer(data)
    schema = fmd[2]  # list<SchemaElement>; [0] is the root group
    leaves = _leaf_paths(schema)
    col_names = [p for p, _ in leaves]
    # DECIMAL leaves (converted_type 5) carry their scale in field 7 —
    # FLBA stats then decode as big-endian unscaled per the spec.
    # Keyed by the full dotted path so decimals nested inside groups
    # resolve (stats lookups below use path_in_schema).
    scales = {
        p: se.get(7)
        for p, se in leaves
        if se.get(6) == 5
    }
    groups = []
    for rg in fmd[4]:
        stats: dict[str, dict[str, Any]] = {}
        for cc in rg[1]:  # list<ColumnChunk>
            cmd = cc[3]  # ColumnMetaData
            phys = cmd[1]
            path = ".".join(seg.decode() for seg in cmd[3])
            scale = scales.get(path)
            st = cmd.get(12, {})
            # 5/6 = max_value/min_value (logical order); 1/2 legacy
            stats[path] = {
                "type": _PHYS.get(phys, str(phys)),
                "min": _decode_stat(st.get(6, st.get(2)), phys, scale),
                "max": _decode_stat(st.get(5, st.get(1)), phys, scale),
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
    root = os.path.join(scratch_root(), f"shs_pqm_{uuid.uuid4().hex}")
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


# ---------------------------------------------------------------------------
# data-page decode: PageHeader thrift + RLE/bit-packed levels + PLAIN
# ---------------------------------------------------------------------------

def decode_rle_hybrid(
    buf: bytes, bit_width: int, total: int, length_prefixed: bool = True
) -> tuple[list[int], int]:
    """Parquet's RLE/bit-packed hybrid (4-byte LE length prefix for
    v1 LEVEL streams — dictionary-index streams are NOT prefixed and
    run to the page end — then runs: header varint
    `(count<<1)|is_bitpacked`; RLE runs repeat a ceil(bw/8)-byte LE
    value, bit-packed runs carry (count)*8 values LSB-first)
    -> (values, bytes consumed incl. any prefix)."""
    if length_prefixed:
        if len(buf) < 4:
            raise ValueError("truncated RLE length prefix")
        ln = struct.unpack_from("<I", buf, 0)[0]
        body = buf[4 : 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated RLE hybrid body")
        prefix = 4
    else:
        body, ln, prefix = buf, len(buf), 0
    vals: list[int] = []
    p = 0
    while len(vals) < total:
        if p >= len(body):
            raise ValueError("RLE hybrid underruns the level count")
        h, p = _uvarint(body, p)
        if h & 1:  # bit-packed group: (h>>1)*8 values
            ngroups = h >> 1
            nbytes = ngroups * bit_width
            if p + nbytes > len(body):
                raise ValueError("truncated bit-packed run")
            bits = body[p : p + nbytes]
            p += nbytes
            bitpos = 0
            for _ in range(ngroups * 8):
                v = 0
                for b in range(bit_width):
                    v |= ((bits[bitpos >> 3] >> (bitpos & 7)) & 1) << b
                    bitpos += 1
                vals.append(v)
        else:  # RLE run
            count = h >> 1
            wbytes = (bit_width + 7) // 8
            if p + wbytes > len(body):
                raise ValueError("truncated RLE run value")
            v = int.from_bytes(body[p : p + wbytes], "little")
            p += wbytes
            vals.extend([v] * count)
    return vals[:total], prefix + ln


def decode_delta_binary_packed(b: bytes, expected: int) -> list[int]:
    """Parquet DELTA_BINARY_PACKED (encodings.md): header of
    <block size> <miniblocks/block> <total count> (uvarints) and the
    zigzag first value; then per block a zigzag min-delta, one
    bit-width byte PER miniblock, and the STARTED miniblocks'
    LSB-first bit-packed delta offsets (the last started miniblock is
    zero-padded to its full width; never-started trailing miniblocks
    carry width bytes but no data). Thin wrapper over the
    span-returning `decode_delta_binary_packed_prefix`."""
    return decode_delta_binary_packed_prefix(b, expected)[0]


def _decompress_page(body: bytes, codec: int, uncomp_size: int) -> bytes:
    """Page-body decompression through THIS repo's codec stack:
    0=UNCOMPRESSED, 1=SNAPPY (operators/snappy.py), 6=ZSTD
    (operators/zstd.py — parquet-mr's and Spark's default)."""
    if codec == 0:
        out = body
    elif codec == 1:
        from spark_hive_spark.operators.snappy import snappy_decompress

        out = snappy_decompress(body)
    elif codec == 6:
        from spark_hive_spark.operators.zstd import zstd_decompress

        out = zstd_decompress(body)
    else:
        raise NotImplementedError(f"parquet page codec {codec}")
    if len(out) != uncomp_size:
        raise ValueError(
            f"page decompressed to {len(out)}, header says {uncomp_size}"
        )
    return out


def read_int64_column_pages(
    data: bytes, cmd: dict[int, Any], max_def_level: int = 1
) -> tuple[list[int | None], int]:
    """Walk one fixed-width column chunk's pages (INT32/INT64/FLOAT/
    DOUBLE) -> (values with None for nulls, data-page count).

    ``max_def_level`` mirrors the leaf SchemaElement's
    repetition_type: 1 for OPTIONAL (the default — a v1 page then
    starts with a length-prefixed RLE/bit-packed definition-levels
    stream), 0 for REQUIRED (no levels stream at all; the page body
    is values from byte 0 — parsing a levels stream there would
    misread the first 4 data bytes as an RLE length prefix).
    Levels deeper than 1 (a leaf inside OPTIONAL groups, i.e. struct
    fields) extract the leaf with None wherever any ancestor or the
    leaf itself is null — presence is ``def == max_def_level``.
    Repetition levels (lists) go through `read_list_column_pages`.

    Handles the full default layout a Spark/parquet-mr writer emits:
    an optional DICTIONARY page (type 2, PLAIN-encoded dict values)
    followed by v1 DATA pages whose values are either PLAIN (enc 0)
    or dictionary indices (enc 2 PLAIN_DICTIONARY / 8 RLE_DICTIONARY:
    one bit-width byte + an UNPREFIXED RLE/bit-packed hybrid), each
    page independently compressed (UNCOMPRESSED / SNAPPY / ZSTD via
    the hand-built codecs). ``cmd`` is the hand-decoded
    ColumnMetaData (1:type, 4:codec, 5:num_values,
    7:total_compressed_size, 9:data_page_offset,
    11:dictionary_page_offset)."""
    phys = cmd[1]
    fixed = {_INT32: ("<i", 4), _INT64: ("<q", 8),
             _FLOAT: ("<f", 4), _DOUBLE: ("<d", 8)}
    if phys not in fixed:
        raise NotImplementedError(
            f"page decode implemented for fixed-width types, not "
            f"{_PHYS.get(phys, phys)}"
        )
    fmt_ch, width = fixed[phys]
    codec = cmd[4]
    off = cmd.get(11, cmd[9])  # dictionary page precedes data pages
    size, total = cmd[7], cmd[5]
    pos = off
    out: list[int | None] = []
    dictionary: list[int] | None = None
    n_pages = 0
    while pos < off + size:
        hdr, body_start = _read_struct(data, pos)
        ptype = hdr[1]
        if ptype == 2:  # DICTIONARY_PAGE
            dictionary, pos = _decode_fixed_dict_page(
                data, pos, codec, fmt_ch, width
            )
        elif ptype in (0, 3):  # DATA_PAGE v1 / v2
            vals, pos = _decode_fixed_data_page(
                data, pos, codec, fmt_ch, width, phys, dictionary,
                max_def_level,
            )
            out.extend(vals)
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(out) != total:
        raise ValueError(
            f"page walk produced {len(out)} values, chunk says {total}"
        )
    return out, n_pages


_JULIAN_EPOCH_DAY = 2440588  # 1970-01-01 as a Julian day number


def _unpack_fixed_values(
    raw: bytes, n: int, fmt_ch: str | None, width: int
) -> list:
    """``n`` PLAIN fixed-width values. ``fmt_ch`` is a struct format
    pair for the machine types; None means FIXED_LEN_BYTE_ARRAY of
    ``width`` bytes, decoded as big-endian signed unscaled ints (the
    DECIMAL physical layout); "i96" means the INT96 legacy timestamp
    (8-byte LE nanos-of-day + 4-byte LE Julian day), decoded to epoch
    MICROSECONDS — still what Spark writes by default
    (spark.sql.parquet.outputTimestampType=INT96)."""
    if len(raw) < width * n:
        raise ValueError("PLAIN page underruns its value count")
    if fmt_ch is None:
        return [
            int.from_bytes(raw[i * width : (i + 1) * width],
                           "big", signed=True)
            for i in range(n)
        ]
    if fmt_ch == "i96":
        out = []
        for i in range(n):
            nanos = int.from_bytes(raw[12 * i : 12 * i + 8], "little")
            julian = int.from_bytes(raw[12 * i + 8 : 12 * i + 12],
                                    "little")
            out.append(
                (julian - _JULIAN_EPOCH_DAY) * 86_400_000_000
                + nanos // 1_000
            )
        return out
    return list(struct.unpack(f"{fmt_ch[0]}{n}{fmt_ch[1]}",
                              raw[: width * n]))


def _decode_fixed_dict_page(
    data: bytes, pos: int, codec: int, fmt_ch: str | None, width: int
) -> tuple[list, int]:
    """One DICTIONARY page (PLAIN values) -> (dictionary, next pos)."""
    hdr, body_start = _read_struct(data, pos)
    if hdr[1] != 2:
        raise ValueError(f"expected a dictionary page, got type {hdr[1]}")
    comp_size = hdr[3]
    body = data[body_start : body_start + comp_size]
    dict_hdr = hdr[7]
    if dict_hdr[2] not in (0, 2):  # PLAIN / PLAIN_DICTIONARY
        raise NotImplementedError(
            f"dictionary page encoding {dict_hdr[2]}"
        )
    raw = _decompress_page(body, codec, hdr[2])
    dictionary = _unpack_fixed_values(raw, dict_hdr[1], fmt_ch, width)
    return dictionary, body_start + comp_size


def read_flba_column_pages(
    data: bytes,
    cmd: dict[int, Any],
    type_length: int,
    max_def_level: int = 1,
) -> tuple[list[int | None], int]:
    """Walk one FIXED_LEN_BYTE_ARRAY column chunk's pages — the
    physical layout of wide DECIMALs (precision > 18; parquet-mr
    stores the unscaled value big-endian two's-complement in
    ``type_length`` bytes, from SchemaElement field 2) -> (unscaled
    ints with None for nulls, data-page count). The caller applies
    the schema's scale (field 7)."""
    if cmd[1] != _FLBA:
        raise NotImplementedError("expected a FIXED_LEN_BYTE_ARRAY column")
    codec = cmd[4]
    off = cmd.get(11, cmd[9])
    size, total = cmd[7], cmd[5]
    pos = off
    out: list[int | None] = []
    dictionary: list | None = None
    n_pages = 0
    while pos < off + size:
        hdr, _ = _read_struct(data, pos)
        ptype = hdr[1]
        if ptype == 2:
            dictionary, pos = _decode_fixed_dict_page(
                data, pos, codec, None, type_length
            )
        elif ptype in (0, 3):
            vals, pos = _decode_fixed_data_page(
                data, pos, codec, None, type_length, _FLBA, dictionary,
                max_def_level,
            )
            out.extend(vals)
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(out) != total:
        raise ValueError("page walk produced the wrong value count")
    return out, n_pages


def read_int96_column_pages(
    data: bytes, cmd: dict[int, Any], max_def_level: int = 1
) -> tuple[list[int | None], int]:
    """Walk one INT96 column chunk's pages -> (epoch MICROSECONDS
    with None for nulls, data-page count). INT96 is the deprecated
    12-byte timestamp layout parquet officially discourages and Spark
    still WRITES BY DEFAULT, so any reader of Spark-produced lake
    data meets it: 8 LE bytes of nanoseconds within the day + 4 LE
    bytes of Julian day number. Dictionary pages (Spark's default for
    timestamps) and PLAIN both decode."""
    if cmd[1] != _INT96:
        raise NotImplementedError("expected an INT96 column")
    codec = cmd[4]
    off = cmd.get(11, cmd[9])
    size, total = cmd[7], cmd[5]
    pos = off
    out: list[int | None] = []
    dictionary: list | None = None
    n_pages = 0
    while pos < off + size:
        hdr, _ = _read_struct(data, pos)
        ptype = hdr[1]
        if ptype == 2:
            dictionary, pos = _decode_fixed_dict_page(
                data, pos, codec, "i96", 12
            )
        elif ptype in (0, 3):
            vals, pos = _decode_fixed_data_page(
                data, pos, codec, "i96", 12, _INT96, dictionary,
                max_def_level,
            )
            out.extend(vals)
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(out) != total:
        raise ValueError("page walk produced the wrong value count")
    return out, n_pages


def read_boolean_column_pages(
    data: bytes, cmd: dict[int, Any], max_def_level: int = 1
) -> tuple[list[bool | None], int]:
    """Walk one BOOLEAN column chunk's pages -> (values with None for
    nulls, data-page count). PLAIN booleans are BIT-PACKED LSB-first
    (one bit per present value — the only physical type whose PLAIN
    encoding is not byte-aligned); parquet-mr may also write the
    values stream itself as RLE (encoding 3, 4-byte-length-prefixed
    hybrid) for long runs."""
    if cmd[1] != _BOOLEAN:
        raise NotImplementedError("expected a BOOLEAN column")
    codec = cmd[4]
    off = cmd.get(11, cmd[9])
    size, total = cmd[7], cmd[5]
    pos = off
    out: list[bool | None] = []
    n_pages = 0
    def_bw = max_def_level.bit_length()
    while pos < off + size:
        hdr, body_start = _read_struct(data, pos)
        ptype, comp_size = hdr[1], hdr[3]
        if ptype == 0:
            dph = hdr[5]
            nv, enc = dph[1], dph[2]
            raw = _decompress_page(
                data[body_start : body_start + comp_size], codec, hdr[2]
            )
            if max_def_level == 0:
                defs, vals_buf = [0] * nv, raw
            else:
                defs, consumed = decode_rle_hybrid(raw, def_bw, nv)
                vals_buf = raw[consumed:]
            n_present = sum(1 for d in defs if d == max_def_level)
            if enc == 0:  # PLAIN: bit-packed LSB-first
                if len(vals_buf) < (n_present + 7) // 8:
                    raise ValueError("boolean page underruns bit count")
                vals = [
                    bool(vals_buf[i >> 3] >> (i & 7) & 1)
                    for i in range(n_present)
                ]
            elif enc == 3:  # RLE values stream (prefixed, bw 1)
                bits, _ = decode_rle_hybrid(vals_buf, 1, n_present)
                vals = [bool(b) for b in bits]
            else:
                raise NotImplementedError(f"boolean encoding {enc}")
            it = iter(vals)
            out.extend(
                next(it) if d == max_def_level else None for d in defs
            )
            n_pages += 1
            pos = body_start + comp_size
        else:
            raise NotImplementedError(
                f"page type {ptype} on a boolean chunk"
            )
    if len(out) != total:
        raise ValueError("page walk produced the wrong value count")
    return out, n_pages


def _decode_fixed_data_page(
    data: bytes,
    pos: int,
    codec: int,
    fmt_ch: str | None,
    width: int,
    phys: int,
    dictionary: list | None,
    max_def_level: int,
) -> tuple[list, int]:
    """One FLAT v1/v2 DATA page at ``pos`` -> (values with None for
    nulls, next pos). Shared by the sequential chunk walker and the
    OffsetIndex-driven selective reader; nested columns go through
    `_decode_fixed_page_levels` directly."""
    defs, _reps, vals, nxt = _decode_fixed_page_levels(
        data, pos, codec, fmt_ch, width, phys, dictionary,
        max_def_level, 0,
    )
    present = iter(vals)
    return [next(present) if d == max_def_level else None for d in defs], nxt


def _decode_fixed_page_levels(
    data: bytes,
    pos: int,
    codec: int,
    fmt_ch: str,
    width: int,
    phys: int,
    dictionary: list | None,
    max_def_level: int,
    max_rep_level: int,
) -> tuple[list[int], list[int], list, int]:
    """One v1/v2 DATA page at ``pos`` -> (definition levels,
    repetition levels, PRESENT values only, next pos) — the Dremel
    triplet a nested reader assembles records from.

    Level streams per the spec: v1 pages carry repetition levels
    FIRST (4-byte-length-prefixed RLE/bit-packed hybrid, bit width =
    bit_length(max_rep_level)), then definition levels (same
    framing, bit width = bit_length(max_def_level)), inside the
    page's compressed body; v2 pages carry both UNPREFIXED and
    UNCOMPRESSED before the data blob, sized by the header's
    repetition_levels_byte_length / definition_levels_byte_length.
    A level stream is entirely absent when its max level is 0."""
    hdr, body_start = _read_struct(data, pos)
    ptype, comp_size = hdr[1], hdr[3]
    body = data[body_start : body_start + comp_size]
    def_bw = max_def_level.bit_length()
    rep_bw = max_rep_level.bit_length()
    if ptype == 0:
        dph = hdr[5]
        nv, enc = dph[1], dph[2]
        raw = _decompress_page(body, codec, hdr[2])
        p = 0
        if max_rep_level == 0:
            reps = [0] * nv
        else:
            reps, consumed = decode_rle_hybrid(raw, rep_bw, nv)
            p += consumed
        if max_def_level == 0:  # REQUIRED: no levels stream
            defs = [max_def_level] * nv
        else:
            defs, consumed = decode_rle_hybrid(raw[p:], def_bw, nv)
            p += consumed
        vals_buf = raw[p:]
    elif ptype == 3:  # v2: levels sit UNCOMPRESSED before the data blob
        dph = hdr[8]  # DataPageHeaderV2
        nv, enc = dph[1], dph[4]
        dll = dph.get(5, 0)
        rll = dph.get(6, 0)
        reps = (
            decode_rle_hybrid(
                body[:rll], rep_bw, nv, length_prefixed=False
            )[0]
            if rll
            else [0] * nv
        )
        defs = (
            decode_rle_hybrid(
                body[rll : rll + dll], def_bw, nv, length_prefixed=False
            )[0]
            if dll
            else [max_def_level] * nv
        )
        vals_buf = bytes(body[rll + dll :])
        if dph.get(7, True) and codec != 0:
            vals_buf = _decompress_page(
                vals_buf, codec, hdr[2] - dll - rll
            )
    else:
        raise ValueError(f"expected a data page, got type {ptype}")
    n_present = sum(1 for d in defs if d == max_def_level)
    if enc == 0:  # PLAIN
        vals = _unpack_fixed_values(vals_buf, n_present, fmt_ch, width)
    elif enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
        if dictionary is None:
            raise ValueError(
                "dictionary-encoded page before dictionary page"
            )
        bw = vals_buf[0]
        idx, _ = decode_rle_hybrid(
            vals_buf[1:], bw, n_present, length_prefixed=False
        )
        vals = [dictionary[i] for i in idx]
    elif enc == 5:  # DELTA_BINARY_PACKED (integer types only)
        if phys not in (_INT32, _INT64):
            raise NotImplementedError(
                "DELTA_BINARY_PACKED on a non-integer column"
            )
        vals = decode_delta_binary_packed(vals_buf, n_present)
    elif enc == 9:  # BYTE_STREAM_SPLIT (round 13)
        # Encodings.md: the K-byte values are transposed into K
        # streams — all 1st bytes, then all 2nd bytes, ... — so
        # same-position bytes (exponents, high mantissa) sit together
        # and the page codec compresses them; the page data is
        # EXACTLY n*K bytes, no header
        if len(vals_buf) != n_present * width:
            raise ValueError(
                f"BYTE_STREAM_SPLIT page has {len(vals_buf)} bytes "
                f"for {n_present} x {width}"
            )
        vals = [
            struct.unpack(
                fmt_ch,
                bytes(vals_buf[i + j * n_present]
                      for j in range(width)),
            )[0]
            for i in range(n_present)
        ]
    else:
        raise NotImplementedError(f"value encoding {enc}")
    if len(vals) != n_present:
        raise ValueError(
            f"page decoded {len(vals)} values, levels say {n_present}"
        )
    return defs, reps, vals, body_start + comp_size


def read_list_column_pages(
    data: bytes, cmd: dict[int, Any], repetitions: list[int]
) -> tuple[list[list | None], int]:
    """Walk one NESTED (one-level list) column chunk's pages
    -> (one entry per top-level row: None for a null list, a python
    list — possibly with None elements — otherwise; data-page count).
    Fixed-width elements (INT32/INT64/FLOAT/DOUBLE) and BYTE_ARRAY
    (utf-8 string) elements are supported.

    ``repetitions`` is the leaf's root→leaf repetition-type chain
    from `_leaf_repetitions`; only the standard 3-level list shape
    both Spark (optional col / repeated "list" / element) and
    pyarrow (optional col / repeated "list" / item) write is
    accepted — max_rep_level 1, max_def_level 2 (REQUIRED element)
    or 3 (OPTIONAL element). Deeper nesting (lists of lists, structs
    in lists) stays a loud seam.

    Record assembly is Dremel's: a repetition level of 0 starts a
    new top-level row, 1 appends to the current row's list; the
    definition level then disambiguates null list (0) / empty list
    (1) / null element (2, OPTIONAL element only) / present value
    (max_def). Levels and values are concatenated across ALL data
    pages before assembly, so a row whose list spans a page boundary
    (legal in v1 files) reassembles correctly."""
    max_def, max_rep = max_levels(repetitions)
    if max_rep != 1:
        raise NotImplementedError(
            f"nested shape {repetitions} has {max_rep} repetition "
            "levels; use read_nested_list_column_pages"
        )
    above, _below = _single_rep_split(repetitions)
    defs, reps, vals, n_pages = _walk_leaf_pages(
        data, cmd, max_def, max_rep
    )
    return (
        _assemble_single_rep(defs, reps, vals, above, max_def),
        n_pages,
    )


def _single_rep_split(repetitions: list[int]) -> tuple[int, int]:
    """A root→leaf repetition-type chain with exactly ONE repeated
    node -> (A, B): A = def levels contributed ABOVE the repeated
    node (optional ancestors), B = def levels contributed BELOW it
    (optional descendants incl. the leaf). Def semantics follow:
    d < A some ancestor null, d == A entry list empty, d == A+1+k
    first k optional nodes below defined, d == max_def value present.
    Covers the standard 3-level list (A=1), the spec's 3-level map
    key_value leaves (A=1), and either nested inside optional structs
    (A>1, e.g. a Delta checkpoint's add.partitionValues)."""
    rep_idx = [i for i, r in enumerate(repetitions) if r == 2]
    if len(rep_idx) != 1:
        raise NotImplementedError(
            f"chain {repetitions} has {len(rep_idx)} repeated nodes "
            "(single-rep-level assembly only)"
        )
    j = rep_idx[0]
    above = sum(1 for r in repetitions[:j] if r == 1)
    below = sum(1 for r in repetitions[j + 1 :] if r == 1)
    return above, below


def _walk_leaf_pages(
    data: bytes, cmd: dict[int, Any], max_def: int, max_rep: int
) -> tuple[list[int], list[int], list, int]:
    """Walk one leaf column chunk's pages -> (def levels, rep levels,
    present values, data-page count) concatenated across ALL data
    pages (a row whose entries span a page boundary — legal in v1
    files — needs the full streams before assembly). Fixed-width
    (INT32/INT64/FLOAT/DOUBLE) and BYTE_ARRAY (utf-8) leaves."""
    phys = cmd[1]
    fixed = {_INT32: ("<i", 4), _INT64: ("<q", 8),
             _FLOAT: ("<f", 4), _DOUBLE: ("<d", 8)}
    if phys not in fixed and phys != _BYTE_ARRAY:
        raise NotImplementedError(
            f"nested page decode implemented for fixed-width and "
            f"BYTE_ARRAY types, not {_PHYS.get(phys, phys)}"
        )
    codec = cmd[4]
    off = cmd.get(11, cmd[9])  # dictionary page precedes data pages
    size, total = cmd[7], cmd[5]
    pos = off
    defs: list[int] = []
    reps: list[int] = []
    vals: list = []
    dictionary: list | None = None
    n_pages = 0
    while pos < off + size:
        hdr, body_start = _read_struct(data, pos)
        ptype = hdr[1]
        if ptype == 2:  # DICTIONARY_PAGE
            if phys == _BYTE_ARRAY:
                dict_hdr = hdr[7]
                raw = _decompress_page(
                    data[body_start : body_start + hdr[3]],
                    codec, hdr[2],
                )
                dictionary = _split_byte_array_plain(raw, dict_hdr[1])
                pos = body_start + hdr[3]
            else:
                fmt_ch, width = fixed[phys]
                dictionary, pos = _decode_fixed_dict_page(
                    data, pos, codec, fmt_ch, width
                )
        elif ptype in (0, 3):  # DATA_PAGE v1 / v2
            if phys == _BYTE_ARRAY:
                d, r, v, pos = _decode_byte_array_page_levels(
                    data, pos, codec, dictionary, max_def, max_rep
                )
                v = [x.decode("utf-8") for x in v]
            else:
                fmt_ch, width = fixed[phys]
                d, r, v, pos = _decode_fixed_page_levels(
                    data, pos, codec, fmt_ch, width, phys, dictionary,
                    max_def, max_rep,
                )
            defs.extend(d)
            reps.extend(r)
            vals.extend(v)
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(defs) != total:
        raise ValueError(
            f"page walk produced {len(defs)} level entries, chunk "
            f"says {total}"
        )
    return defs, reps, vals, n_pages


# round-12 first name, kept as an alias (the original accepted only
# fixed-width elements; BYTE_ARRAY support folded in same-round)
read_list_fixed_column_pages = read_list_column_pages


def read_leaf_pages_with_levels(
    data: bytes, cmd: dict[int, Any], max_def_level: int
) -> tuple[list, list[int], int]:
    """Walk one non-repeated leaf chunk (fixed-width or BYTE_ARRAY)
    -> (values with None for any null, raw definition levels, page
    count). A STRUCT reader needs the levels, not just values: for an
    optional struct with an optional leaf (max_def 2), def 0 is
    'struct itself null' while def 1 is 'struct present, leaf null' —
    indistinguishable from values alone."""
    phys = cmd[1]
    fixed = {_INT32: ("<i", 4), _INT64: ("<q", 8),
             _FLOAT: ("<f", 4), _DOUBLE: ("<d", 8)}
    codec = cmd[4]
    off = cmd.get(11, cmd[9])
    size, total = cmd[7], cmd[5]
    pos = off
    out: list = []
    defs_all: list[int] = []
    dictionary: list | None = None
    n_pages = 0
    while pos < off + size:
        hdr, body_start = _read_struct(data, pos)
        ptype = hdr[1]
        if ptype == 2:  # DICTIONARY_PAGE
            if phys == _BYTE_ARRAY:
                raw = _decompress_page(
                    data[body_start : body_start + hdr[3]], codec, hdr[2]
                )
                dictionary = _split_byte_array_plain(raw, hdr[7][1])
                pos = body_start + hdr[3]
            elif phys in fixed:
                fmt_ch, width = fixed[phys]
                dictionary, pos = _decode_fixed_dict_page(
                    data, pos, codec, fmt_ch, width
                )
            else:
                raise NotImplementedError(
                    f"leaf type {_PHYS.get(phys, phys)}"
                )
        elif ptype in (0, 3):
            if phys == _BYTE_ARRAY:
                d, _r, v, pos = _decode_byte_array_page_levels(
                    data, pos, codec, dictionary, max_def_level, 0
                )
                v = [x.decode("utf-8") for x in v]
            elif phys in fixed:
                fmt_ch, width = fixed[phys]
                d, _r, v, pos = _decode_fixed_page_levels(
                    data, pos, codec, fmt_ch, width, phys, dictionary,
                    max_def_level, 0,
                )
            else:
                raise NotImplementedError(
                    f"leaf type {_PHYS.get(phys, phys)}"
                )
            it = iter(v)
            out.extend(
                next(it) if dd == max_def_level else None for dd in d
            )
            defs_all.extend(d)
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(out) != total:
        raise ValueError("page walk produced the wrong value count")
    return out, defs_all, n_pages


def _assemble_single_rep(
    defs: list[int],
    reps: list[int],
    vals: list,
    above: int,
    max_def: int,
) -> list[list | None]:
    """Dremel record assembly for any single-repetition-level leaf:
    ``above`` def levels come from optional ancestors of the repeated
    node (1 for the standard 3-level list, more when the list/map
    hangs inside optional structs). d < above -> some ancestor null
    (row None), d == above -> empty, above < d < max_def -> entry
    present but null below the repeated node, d == max_def -> value."""
    rows: list[list | None] = []
    cur: list | None = None
    started = False
    it = iter(vals)
    for d, r in zip(defs, reps):
        if r == 0:  # new top-level row
            if started:
                rows.append(cur)
            started = True
            if d < above:
                cur = None
            elif d == above:
                cur = []
            elif d == max_def:
                cur = [next(it)]
            elif above < d < max_def:
                cur = [None]
            else:
                raise ValueError(f"definition level {d} at rep 0")
        else:  # r == 1: continuation of the current list
            if cur is None:
                raise ValueError("continuation level before any row")
            if d == max_def:
                cur.append(next(it))
            elif above < d < max_def:
                cur.append(None)
            else:
                raise ValueError(f"definition level {d} at rep 1")
    if started:
        rows.append(cur)
    for _ in it:
        raise ValueError("record assembly left values unconsumed")
    return rows


def _assemble_slot_rows(
    defs: list[int],
    reps: list[int],
    vals: list,
    above: int,
    max_def: int,
) -> list[list[tuple[int, Any]] | None]:
    """Like `_assemble_single_rep` but each entry keeps its raw
    definition level: rows of None / [] / [(def, value-or-None)...].
    The struct zipper needs the level itself — for a list<struct>
    leaf, def distinguishes 'struct slot null' from 'struct present,
    this field null', which collapsed values cannot."""
    rows: list[list[tuple[int, Any]] | None] = []
    cur: list[tuple[int, Any]] | None = None
    started = False
    it = iter(vals)
    for d, r in zip(defs, reps):
        if r == 0:
            if started:
                rows.append(cur)
            started = True
            if d < above:
                cur = None
                continue
            cur = []
            if d == above:
                continue
        elif cur is None:
            raise ValueError("continuation level before any row")
        if d == max_def:
            cur.append((d, next(it)))
        elif above < d < max_def:
            cur.append((d, None))
        else:
            raise ValueError(f"definition level {d} at rep {r}")
    if started:
        rows.append(cur)
    for _ in it:
        raise ValueError("record assembly left values unconsumed")
    return rows


def read_map_column_pages(
    data: bytes,
    key_cmd: dict[int, Any],
    val_cmd: dict[int, Any],
    key_reps: list[int],
    val_reps: list[int],
) -> tuple[list[dict | None], int]:
    """Decode one MAP column (the spec's 3-level key_value group —
    parquet LogicalTypes.md: ``optional group m (MAP) { repeated
    group key_value { required K key; <required|optional> V value
    } }``) from its TWO leaf chunks -> (one dict-or-None per
    top-level row, total data pages walked).

    The two leaves share the repeated ``key_value`` node, so their
    repetition streams describe the same entry structure; each side
    is assembled independently by the single-rep-level Dremel path
    and then zipped entry-wise, with every structural property
    validated: same row count, null/empty agreement, equal entry
    counts per row, and no null keys (the spec requires key to be
    REQUIRED). Works equally when the map hangs inside optional
    structs (above > 1, e.g. a Delta checkpoint's
    ``add.partitionValues``)."""
    k_above, _ = _single_rep_split(key_reps)
    v_above, _ = _single_rep_split(val_reps)
    if k_above != v_above:
        raise ValueError("map key/value ancestor depths disagree")
    if key_reps[-1] != 0:
        raise ValueError("map key leaf must be REQUIRED per the spec")
    keys, kp = read_list_column_pages(data, key_cmd, key_reps)
    vals, vp = read_list_column_pages(data, val_cmd, val_reps)
    if len(keys) != len(vals):
        raise ValueError("map key/value leaves disagree on row count")
    out: list[dict | None] = []
    for krow, vrow in zip(keys, vals):
        if (krow is None) != (vrow is None):
            raise ValueError("map key/value null-row mismatch")
        if krow is None:
            out.append(None)
            continue
        if len(krow) != len(vrow):
            raise ValueError("map key/value entry counts disagree")
        if any(k is None for k in krow):
            raise ValueError("null map key")
        out.append(dict(zip(krow, vrow)))
    return out, kp + vp


def read_list_struct_column_pages(
    data: bytes,
    leaf_specs: list[tuple[str, dict[int, Any], list[int]]],
) -> tuple[list[list[dict | None] | None], int]:
    """Decode one list<struct> column from ALL its leaf chunks ->
    (one entry per top-level row: None / [] / a list whose slots are
    None for a null struct or {field: value-or-None}; total data
    pages). ``leaf_specs`` is [(field name, ColumnMetaData,
    root→leaf repetition chain)] for every leaf of the repeated
    struct element, in struct field order.

    Assembly: each leaf runs the single-rep-level Dremel path keeping
    raw definition levels (`_assemble_slot_rows`); slots then zip
    across leaves. The element group's own def level (elem_def =
    above+1 normally, +1 more when the element group is OPTIONAL —
    Spark writes it optional) splits 'slot exists but struct is null'
    from 'struct present, field null'. Leaves must agree on row
    count, row nullness, slot counts, and struct-null slots — each
    checked, since they are independent page streams."""
    per_leaf: list[tuple[str, int, int, list]] = []
    above0: int | None = None
    total_pages = 0
    for name, cmd, chain in leaf_specs:
        above, below = _single_rep_split(chain)
        if above0 is None:
            above0 = above
        elif above != above0:
            raise ValueError("struct leaves disagree on ancestor depth")
        max_def, max_rep = max_levels(chain)
        if max_rep != 1:
            raise NotImplementedError(
                f"list<struct> leaf {name} has {max_rep} repetition "
                "levels"
            )
        j = chain.index(2)
        if len(chain) < j + 3:
            raise ValueError(
                f"leaf {name} is not nested inside a struct element"
            )
        elem_def = above + 1 + (1 if chain[j + 1] == 1 else 0)
        defs, reps, vals, n_pages = _walk_leaf_pages(
            data, cmd, max_def, max_rep
        )
        total_pages += n_pages
        slots = _assemble_slot_rows(defs, reps, vals, above, max_def)
        per_leaf.append((name, elem_def, max_def, slots))
    n_rows = len(per_leaf[0][3])
    if any(len(pl[3]) != n_rows for pl in per_leaf):
        raise ValueError("struct leaves disagree on row count")
    out: list[list[dict | None] | None] = []
    for i in range(n_rows):
        rows_i = [pl[3][i] for pl in per_leaf]
        if any((r is None) != (rows_i[0] is None) for r in rows_i):
            raise ValueError("struct leaves disagree on row nullness")
        if rows_i[0] is None:
            out.append(None)
            continue
        if len({len(r) for r in rows_i}) != 1:
            raise ValueError("struct leaves disagree on slot count")
        slots_out: list[dict | None] = []
        for j in range(len(rows_i[0])):
            struct_null = rows_i[0][j][0] < per_leaf[0][1]
            rec: dict | None = None if struct_null else {}
            for (name, elem_def, _md, _s), row in zip(per_leaf, rows_i):
                d, v = row[j]
                if (d < elem_def) != struct_null:
                    raise ValueError(
                        "struct leaves disagree on struct-null slot"
                    )
                if rec is not None:
                    rec[name] = v
            slots_out.append(rec)
        out.append(slots_out)
    return out, total_pages


def assemble_nested_leaf(
    defs: list[int],
    reps: list[int],
    vals: list,
    repetitions: list[int],
) -> list:
    """GENERAL Dremel record assembly for one leaf with any number of
    repetition levels (Melnik et al. 2010 §4 / parquet-format
    Nested-Encoding): REPEATED nodes materialize as python lists;
    d < the def count of a node means that node (or an ancestor) is
    undefined -> None/absence at the outermost undefined position;
    a value is consumed only at d == max_def. Handles list<list<T>>
    and deeper, which the single-rep fast path rejects.

    Level bookkeeping: for rep level l (1-based), start_def[l] is the
    cumulative def count THROUGH the l-th repeated node — an entry at
    rep r continues the list at depth r, and its def level then says
    how far below that list the path stays defined."""
    max_def, max_rep = max_levels(repetitions)
    # rep_def[l] = cumulative def count THROUGH the l-th repeated node
    cum = 0
    rep_def: list[int] = [0]
    for rt in repetitions:
        if rt in (1, 2):
            cum += 1
        if rt == 2:
            rep_def.append(cum)
    if len(rep_def) - 1 != max_rep:
        raise ValueError("repetition chain/levels disagree")
    rows: list = []
    # stack[l] = the currently-open list at rep depth l (1-based)
    stack: list[list | None] = [None] * (max_rep + 1)
    it = iter(vals)
    started = False

    def _descend(level: int, d: int) -> None:
        """Add one entry inside the open list at `level`,
        materializing deeper lists as far as d keeps the path
        defined."""
        while True:
            if level == max_rep:
                stack[level].append(next(it) if d == max_def else None)
                return
            nxt = rep_def[level + 1]
            if d >= nxt:  # the next repeated node is defined: open it
                new: list = []
                stack[level].append(new)
                stack[level + 1] = new
                level += 1
                continue
            if d == nxt - 1:
                # everything above the next repeated node is defined
                # but the node itself has no entries: empty inner list
                stack[level].append([])
            else:
                # an optional node between the lists is null
                stack[level].append(None)
            for stale in range(level + 1, max_rep + 1):
                stack[stale] = None
            return

    for d, r in zip(defs, reps):
        if r == 0:  # new top-level record
            started = True
            for stale in range(1, max_rep + 1):
                stack[stale] = None
            if d < rep_def[1] - 1:
                rows.append(None)  # an ancestor of the outer list null
                continue
            top: list = []
            rows.append(top)
            if d == rep_def[1] - 1:
                continue  # outer list present but empty
            stack[1] = top
            _descend(1, d)
        else:
            if not started:
                raise ValueError("continuation level before any row")
            if stack[r] is None:
                raise ValueError(f"continuation at closed rep depth {r}")
            _descend(r, d)
    for _ in it:
        raise ValueError("record assembly left values unconsumed")
    return rows


def read_nested_list_column_pages(
    data: bytes,
    cmd: dict[int, Any],
    repetitions: list[int],
) -> tuple[list, int]:
    """Decode one multi-repetition-level scalar leaf (list<list<T>>
    and deeper) via the general Dremel assembler."""
    max_def, max_rep = max_levels(repetitions)
    if max_rep < 2:
        return read_list_column_pages(data, cmd, repetitions)
    defs, reps, vals, n_pages = _walk_leaf_pages(
        data, cmd, max_def, max_rep
    )
    return assemble_nested_leaf(defs, reps, vals, repetitions), n_pages


def read_fixed_pages_at(
    data: bytes,
    cmd: dict[int, Any],
    offsets: list[int],
    max_def_level: int = 1,
) -> list[list]:
    """SELECTIVE page decode: the dictionary page (when the chunk has
    one) plus exactly the data pages whose OffsetIndex
    `page_locations[].offset` values are given — the bytes of
    unselected pages are never parsed, which is the entire point of
    the page index. Returns one value-list per requested offset, in
    the given order."""
    phys = cmd[1]
    fixed = {_INT32: ("<i", 4), _INT64: ("<q", 8),
             _FLOAT: ("<f", 4), _DOUBLE: ("<d", 8)}
    if phys not in fixed:
        raise NotImplementedError(
            f"page decode implemented for fixed-width types, not "
            f"{_PHYS.get(phys, phys)}"
        )
    fmt_ch, width = fixed[phys]
    codec = cmd[4]
    dictionary: list | None = None
    if 11 in cmd:  # dictionary page precedes data pages
        dictionary, _ = _decode_fixed_dict_page(
            data, cmd[11], codec, fmt_ch, width
        )
    return [
        _decode_fixed_data_page(
            data, off, codec, fmt_ch, width, phys, dictionary,
            max_def_level,
        )[0]
        for off in offsets
    ]


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
    root = os.path.join(scratch_root(), f"shs_pqs_{uuid.uuid4().hex}")
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


@register(
    "source_parquet_page_decode",
    oracle=f"""
        WITH numbered AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_orderkey END AS k,
                   row_number() OVER (ORDER BY o_orderkey) - 1 AS rn,
                   count(*) OVER () AS n
            FROM orders
        ),
        grouped AS (
            SELECT k, CAST(rn // ((n + 3) // 4) AS INT) AS rg
            FROM numbered
        )
        SELECT rg,
               CAST(count(*) AS BIGINT) AS n_values,
               CAST(count(*) - count(k) AS BIGINT) AS n_nulls,
               CAST(sum(k) AS BIGINT) AS key_sum,
               min(k) AS key_min,
               max(k) AS key_max,
               TRUE AS pages_consistent
        FROM grouped
        GROUP BY rg
        ORDER BY rg
    """,
    tags=("source", "parquet", "pages", "thrift", "encoding"),
)
def source_parquet_page_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet DATA PAGES decoded by hand (round 10) — completing the
    no-library vertical slice the footer queries started: each task
    walks one row group's column chunk from ``data_page_offset``,
    reading every PageHeader (the same Thrift-Compact walker as the
    footer), the definition levels as the RLE/BIT-PACKED HYBRID
    (4-byte length prefix; varint run headers; LSB-first bit groups —
    the fixture nulls every o_orderkey divisible by 97, so the level
    stream carries real mixed 0/1 runs, not a degenerate all-ones
    RLE), and the PLAIN little-endian INT64 values. Dictionary
    encoding, compression, and non-INT64 types stay loud
    NotImplementedError seams.

    The fixture is the key-sorted orders table in ONE uncompressed,
    dictionary-free file with exactly 4 ceil-divide row groups and
    ~4 KiB pages (several pages per group); the oracle recomputes
    every group's count/null-count/sum/min/max with the identical
    row_number arithmetic — a levels bug miscounts nulls, an
    endianness or page-boundary bug flips the sums.
    ``pages_consistent`` additionally pins, engine-side, that page
    value counts sum to the chunk total, that >1 page was walked
    per group (at sf>=0.01), and that the page-decoded min/max equal
    the footer statistics decoded by the OTHER hand-built path.

    Scale posture: one task per row group (mapInPandas over the plan
    rows — Spark's own split model); the pure-python decode is the
    demonstrator for the format layer, while production scans stay
    on the JVM reader."""
    import pandas as _pd

    root = os.path.join(scratch_root(), f"shs_pgd_{uuid.uuid4().hex}")
    os.makedirs(root)
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    # deterministic global order: nulls carry no payload bytes, but
    # their POSITIONS must match the oracle's row_number over
    # o_orderkey — build in o_orderkey order, then nullify %97 keys
    orders_sorted = (
        t(spark, sf_dir, "orders").select("o_orderkey").sort("o_orderkey")
        .toArrow()
    )
    keys = orders_sorted["o_orderkey"].to_pylist()
    vals = [None if k % 97 == 0 else k for k in keys]
    tbl = _pa.table({"k": _pa.array(vals, _pa.int64())})
    n = tbl.num_rows
    path = os.path.join(root, "orders_keys.parquet")
    _pq.write_table(
        tbl, path,
        row_group_size=(n + 3) // 4,
        use_dictionary=False,
        compression="NONE",
        data_page_size=4096,
    )
    with open(path, "rb") as fh:
        raw = fh.read()
    fmd = decode_footer(raw)
    n_groups = len(fmd[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd_l = decode_footer(data)
                rg = fmd_l[4][rec.rg]
                cmd = rg[1][0][3]
                values, n_pages = read_int64_column_pages(data, cmd)
                present = [v for v in values if v is not None]
                st = cmd.get(12, {})
                foot_min = _decode_stat(st.get(6), _INT64)
                foot_max = _decode_stat(st.get(5), _INT64)
                consistent = (
                    len(values) == rg[3]
                    and n_pages >= (2 if rg[3] > 1000 else 1)
                    and min(present) == foot_min
                    and max(present) == foot_max
                )
                rows.append(
                    (
                        rec.rg, len(values), len(values) - len(present),
                        sum(present), min(present), max(present),
                        bool(consistent),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "rg", "n_values", "n_nulls", "key_sum",
                    "key_min", "key_max", "pages_consistent",
                ],
            )

    out = plan.mapInPandas(
        _decode_groups,
        "rg int, n_values bigint, n_nulls bigint, key_sum bigint,"
        " key_min bigint, key_max bigint, pages_consistent boolean",
    ).orderBy("rg").localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_spark_native_decode",
    oracle="""
        WITH v AS (
            SELECT nullif(o_orderkey % 1000, 13) AS val FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
               CAST(sum(val) AS BIGINT) AS val_sum,
               CAST(min(val) AS BIGINT) AS val_min,
               CAST(max(val) AS BIGINT) AS val_max,
               TRUE AS layout_consistent
        FROM v
    """,
    tags=("source", "parquet", "pages", "zstd", "dictionary"),
)
def source_parquet_spark_native_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-NATIVE parquet file decoded entirely by hand (round
    10) — the capstone of the no-library stack: Spark's own writer
    (parquet-mr defaults: ZSTD-compressed pages, dictionary
    encoding) writes `nullif(o_orderkey % 1000, 13)`, and the reader
    recovers every value through nothing but this repo's hand-built
    layers — Thrift-Compact footer + PageHeaders, the DICTIONARY
    page (PLAIN values) and PLAIN_DICTIONARY index streams (bit-width
    byte + UNPREFIXED RLE/bit-packed hybrid), v1 definition levels
    with real nulls, and page decompression through the hand-built
    RFC 8878 zstd decoder (operators/zstd.py — real frames from the
    JVM's zstd, not our own encoder's output).

    The oracle recomputes count/nulls/sum/min/max from the raw
    table; ``layout_consistent`` pins engine-side that the file
    really exercised the default layout (dictionary encoding
    present, non-UNCOMPRESSED codec, page-decoded extrema equal to
    the independently hand-decoded footer statistics).

    Scale posture: the decode runs as one task per file via
    mapInPandas (files are the split unit); pure-python page decode
    is the format-layer demonstrator — production scans stay on the
    JVM reader, which this query's output certifies against."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqn_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr("nullif(o_orderkey % 1000, 13) AS val")
        .coalesce(1)
        .write.parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                values: list[int | None] = []
                n_pages = 0
                saw_dict = saw_compressed = True
                stats_ok = True
                for rg in fmd[4]:
                    cmd = rg[1][0][3]
                    vs, np_ = read_int64_column_pages(data, cmd)
                    values.extend(vs)
                    n_pages += np_
                    saw_dict = saw_dict and 11 in cmd
                    saw_compressed = saw_compressed and cmd[4] != 0
                    st = cmd.get(12, {})
                    pres = [v for v in vs if v is not None]
                    stats_ok = stats_ok and (
                        min(pres) == _decode_stat(st.get(6), _INT64)
                        and max(pres) == _decode_stat(st.get(5), _INT64)
                    )
                present = [v for v in values if v is not None]
                consistent = (
                    n_pages >= 1 and saw_dict and saw_compressed
                    and stats_ok
                    and len(values) == fmd[3]
                )
                rows.append(
                    (
                        len(values), len(values) - len(present),
                        sum(present), min(present), max(present),
                        bool(consistent),
                    )
                )
            yield _pd.DataFrame(
                rows,
                columns=["n_rows", "n_nulls", "val_sum", "val_min",
                         "val_max", "layout_consistent"],
            )

    out = plan.mapInPandas(
        _decode,
        "n_rows bigint, n_nulls bigint, val_sum bigint,"
        " val_min bigint, val_max bigint, layout_consistent boolean",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def _split_byte_array_plain(buf: bytes, count: int) -> list[bytes]:
    """PLAIN BYTE_ARRAY: 4-byte LE length + bytes, per value."""
    out: list[bytes] = []
    p = 0
    for _ in range(count):
        if p + 4 > len(buf):
            raise ValueError("truncated PLAIN byte-array length")
        n = struct.unpack_from("<I", buf, p)[0]
        p += 4
        if p + n > len(buf):
            raise ValueError("truncated PLAIN byte-array value")
        out.append(buf[p : p + n])
        p += n
    return out


def _delta_length_byte_array(
    buf: bytes, count: int
) -> tuple[list[bytes], int]:
    """DELTA_LENGTH_BYTE_ARRAY -> (values, bytes consumed)."""
    # the lengths run is self-delimiting; decode it, then measure
    # its byte span by re-walking the header geometry
    lengths = decode_delta_binary_packed_prefix(buf, count)
    vals: list[bytes] = []
    p = lengths[1]
    for n in lengths[0]:
        vals.append(buf[p : p + n])
        p += n
    return vals, p


def _decode_byte_array_page_levels(
    data: bytes,
    pos: int,
    codec: int,
    dictionary: list[bytes] | None,
    max_def_level: int,
    max_rep_level: int,
) -> tuple[list[int], list[int], list[bytes], int]:
    """One v1/v2 BYTE_ARRAY DATA page -> (definition levels,
    repetition levels, PRESENT raw values, next pos) — the string
    counterpart of `_decode_fixed_page_levels`, every encoding a
    pyarrow/parquet-mr writer emits: PLAIN, PLAIN_/RLE_DICTIONARY,
    DELTA_LENGTH_BYTE_ARRAY (6) and DELTA_BYTE_ARRAY (7,
    front-coding)."""
    hdr, body_start = _read_struct(data, pos)
    ptype, comp_size = hdr[1], hdr[3]
    body = data[body_start : body_start + comp_size]
    def_bw = max_def_level.bit_length()
    rep_bw = max_rep_level.bit_length()
    if ptype == 0:
        dph = hdr[5]
        nv, enc = dph[1], dph[2]
        raw = _decompress_page(body, codec, hdr[2])
        p = 0
        if max_rep_level == 0:
            reps = [0] * nv
        else:
            reps, consumed = decode_rle_hybrid(raw, rep_bw, nv)
            p += consumed
        if max_def_level == 0:  # REQUIRED: no levels stream
            defs = [0] * nv
        else:
            defs, consumed = decode_rle_hybrid(raw[p:], def_bw, nv)
            p += consumed
        vals_buf = raw[p:]
    elif ptype == 3:
        dph = hdr[8]
        nv, enc = dph[1], dph[4]
        dll, rll = dph.get(5, 0), dph.get(6, 0)
        reps = (
            decode_rle_hybrid(
                body[:rll], rep_bw, nv, length_prefixed=False
            )[0]
            if rll
            else [0] * nv
        )
        defs = (
            decode_rle_hybrid(
                body[rll : rll + dll], def_bw, nv, length_prefixed=False
            )[0]
            if dll
            else [max_def_level] * nv
        )
        vals_buf = bytes(body[rll + dll :])
        if dph.get(7, True) and codec != 0:
            vals_buf = _decompress_page(
                vals_buf, codec, hdr[2] - dll - rll
            )
    else:
        raise ValueError(f"expected a data page, got type {ptype}")
    n_present = sum(1 for d in defs if d == max_def_level)
    if enc == 0:  # PLAIN
        vals = _split_byte_array_plain(vals_buf, n_present)
    elif enc in (2, 8):  # dictionary indices
        if dictionary is None:
            raise ValueError("dictionary page missing")
        bw = vals_buf[0]
        idx, _ = decode_rle_hybrid(
            vals_buf[1:], bw, n_present, length_prefixed=False
        )
        vals = [dictionary[i] for i in idx]
    elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
        vals, _ = _delta_length_byte_array(vals_buf, n_present)
    elif enc == 7:  # DELTA_BYTE_ARRAY: prefix lens + suffixes
        prefixes, consumed = decode_delta_binary_packed_prefix(
            vals_buf, n_present
        )
        suffixes, _ = _delta_length_byte_array(
            vals_buf[consumed:], n_present
        )
        vals = []
        prev = b""
        for plen, suf in zip(prefixes, suffixes):
            prev = prev[:plen] + suf
            vals.append(prev)
    else:
        raise NotImplementedError(f"byte-array encoding {enc}")
    if len(vals) != n_present:
        raise ValueError(
            f"page decoded {len(vals)} values, levels say {n_present}"
        )
    return defs, reps, vals, body_start + comp_size


def read_byte_array_column_pages(
    data: bytes, cmd: dict[int, Any], max_def_level: int = 1
) -> tuple[list[str | None], int]:
    """Walk one FLAT BYTE_ARRAY (string) column chunk's pages — the
    string counterpart of `read_int64_column_pages`, across v1 and v2
    data pages and the compressed-page codecs.

    ``max_def_level`` as in `read_int64_column_pages`: 0 = REQUIRED
    leaf (v1 pages carry no definition-levels stream); levels > 1
    (a leaf inside OPTIONAL groups, i.e. struct fields) extract the
    leaf values with None for any ancestor-or-leaf null — presence is
    ``def == max_def_level``. Repetition levels (lists) go through
    `read_list_column_pages`."""
    if cmd[1] != _BYTE_ARRAY:
        raise NotImplementedError("expected a BYTE_ARRAY column")
    codec = cmd[4]
    off = cmd.get(11, cmd[9])
    size, total = cmd[7], cmd[5]
    pos = off
    out: list[str | None] = []
    dictionary: list[bytes] | None = None
    n_pages = 0
    while pos < off + size:
        hdr, body_start = _read_struct(data, pos)
        ptype, comp_size = hdr[1], hdr[3]
        if ptype == 2:  # DICTIONARY_PAGE: PLAIN byte arrays
            dict_hdr = hdr[7]
            raw = _decompress_page(
                data[body_start : body_start + comp_size], codec, hdr[2]
            )
            dictionary = _split_byte_array_plain(raw, dict_hdr[1])
            pos = body_start + comp_size
        elif ptype in (0, 3):
            defs, _reps, vals, pos = _decode_byte_array_page_levels(
                data, pos, codec, dictionary, max_def_level, 0
            )
            present = iter(vals)
            out.extend(
                next(present).decode("utf-8")
                if d == max_def_level
                else None
                for d in defs
            )
            n_pages += 1
        else:
            raise NotImplementedError(f"page type {ptype}")
    if len(out) != total:
        raise ValueError("page walk produced the wrong value count")
    return out, n_pages


def decode_delta_binary_packed_prefix(
    b: bytes, expected: int
) -> tuple[list[int], int]:
    """Like `decode_delta_binary_packed`, but also returns the byte
    length of the run — needed where another stream follows it in the
    same buffer (DELTA_LENGTH/DELTA_BYTE_ARRAY)."""
    p = 0
    block_size, p = _uvarint(b, p)
    miniblocks, p = _uvarint(b, p)
    total, p = _uvarint(b, p)
    u, p = _uvarint(b, p)
    first = _unzigzag(u)
    if total != expected:
        raise ValueError(
            f"DELTA header count {total} != expected {expected}"
        )
    if total == 0:
        return [], p
    if miniblocks == 0 or block_size % miniblocks:
        raise ValueError("malformed DELTA block geometry")
    vpm = block_size // miniblocks
    vals = [first]
    while len(vals) < total:
        u, p = _uvarint(b, p)
        min_delta = _unzigzag(u)
        widths = b[p : p + miniblocks]
        if len(widths) != miniblocks:
            raise ValueError("truncated DELTA miniblock widths")
        p += miniblocks
        for w in widths:
            if len(vals) >= total:
                break
            nbytes = (vpm * w + 7) >> 3
            chunk = b[p : p + nbytes]
            if len(chunk) != nbytes:
                raise ValueError("truncated DELTA miniblock data")
            p += nbytes
            bitpos = 0
            for _ in range(vpm):
                if len(vals) >= total:
                    break
                d = 0
                for k in range(w):
                    d |= ((chunk[bitpos >> 3] >> (bitpos & 7)) & 1) << k
                    bitpos += 1
                vals.append(vals[-1] + min_delta + d)
    return vals[:total], p


# ---------------------------------------------------------------------------
# Page Index (ColumnIndex / OffsetIndex) — page-level skipping
# ---------------------------------------------------------------------------

def read_offset_index(
    data: bytes, cc: dict[int, Any]
) -> list[tuple[int, int, int]]:
    """ColumnChunk fields 4/5 (offset_index_offset/length) ->
    [(page offset, compressed size, first_row_index), ...] per the
    parquet.thrift OffsetIndex/PageLocation structs."""
    if 4 not in cc:
        raise ValueError("column chunk carries no offset index")
    oi, _ = _read_struct(data, cc[4])
    return [(pl[1], pl[2], pl[3]) for pl in oi[1]]


def read_column_index(data: bytes, cc: dict[int, Any]) -> dict[str, Any]:
    """ColumnChunk fields 6/7 (column_index_offset/length) -> the
    per-PAGE statistics that drive page-level skipping:
    {"null_pages": [bool], "mins"/"maxs": [raw bytes],
    "boundary_order": 0 UNORDERED / 1 ASCENDING / 2 DESCENDING,
    "null_counts": [int] | None}. Raw min/max payloads are
    plain-encoded per physical type — decode with `_decode_stat`."""
    if 6 not in cc:
        raise ValueError("column chunk carries no column index")
    ci, _ = _read_struct(data, cc[6])
    return {
        "null_pages": ci[1],
        "mins": ci[2],
        "maxs": ci[3],
        "boundary_order": ci[4],
        "null_counts": ci.get(5),
    }


_PAGE_ROWS = 500  # fixture: parquet.page.row.count.limit (exact split)
_PG_LO = dt.date(1995, 4, 1)
_PG_HI = dt.date(1996, 3, 31)


@register(
    "source_parquet_page_skipping",
    oracle=f"""
        WITH numbered AS (
            SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice,
                   row_number() OVER (
                       ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                   ) - 1 AS rn
            FROM orders
        ),
        pg AS (
            SELECT d, o_totalprice, CAST(rn // {_PAGE_ROWS} AS INT) AS p
            FROM numbered
        ),
        stats AS (
            SELECT p, count(*) AS pr, min(d) AS mn, max(d) AS mx
            FROM pg GROUP BY p
        ),
        sel AS (
            SELECT * FROM stats
            WHERE NOT (mx < DATE '1995-04-01' OR mn > DATE '1996-03-31')
        )
        SELECT (SELECT CAST(count(*) AS INT) FROM stats) AS pages_total,
               (SELECT CAST(count(*) AS INT) FROM sel) AS pages_selected,
               (SELECT CAST(count(*) AS INT) FROM stats)
                   - (SELECT CAST(count(*) AS INT) FROM sel)
                   AS pages_skipped,
               (SELECT CAST(sum(pr) AS BIGINT) FROM sel) AS rows_planned,
               TRUE AS boundary_ascending,
               TRUE AS index_consistent,
               CAST(count(*) AS BIGINT) AS n_in_window,
               {sql_dsum('o_totalprice')} AS revenue_in_window
        FROM orders
        WHERE CAST(o_orderdate AS DATE)
              BETWEEN DATE '1995-04-01' AND DATE '1996-03-31'
    """,
    tags=("source", "parquet", "page-index", "metadata", "data-skipping"),
)
def source_parquet_page_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PAGE-level skipping via the parquet Page Index (round 11) —
    the finest skipping granularity the format defines, completing
    the hand-built vertical: footer stats (file) → row-group min/max
    → Bloom (point lookups) → **ColumnIndex/OffsetIndex (pages)**.

    The fixture is a SPARK-written file (zstd + dictionary defaults)
    of orders sorted by (date, key) with
    `parquet.page.row.count.limit=500`, so pages split at exactly
    500 rows and the whole plan is oracle-computable. The planner
    decodes the date column's ColumnIndex (per-page min/max,
    boundary_order must say ASCENDING for a sorted write, null_pages
    all false) and OffsetIndex, intersects a two-fiscal-quarter
    window with the page ranges, and spawns ONE TASK PER SELECTED
    PAGE; each task re-decodes only its own date page plus the
    o_totalprice pages covering the same row range — located by
    first_row_index, the row-synchronization rule real readers use,
    since pages do NOT align across columns in general — through the
    hand-built thrift/dictionary/zstd stack, applies the exact
    residual filter, and partial-aggregates. Unselected pages' bytes
    are never parsed.

    `index_consistent` additionally pins, engine-side, that each
    selected page's DECODED min/max equal its ColumnIndex entry.
    The oracle recomputes the page grid with row_number arithmetic
    and the window aggregate from the raw table — a wrong page
    boundary, a missed page, or an off-by-one first_row_index flips
    rows_planned or the hash.

    Scale posture: planning is O(index bytes); data I/O is exactly
    the selected pages (at 100 TB with range reads, ~rows_planned/n
    of the column bytes); tasks are independent splits."""
    import json as _json

    root = os.path.join(
        scratch_root(), f"shs_pgidx_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
        )
        .coalesce(1)
        .sortWithinPartitions("o_orderdate", "o_orderkey")
        .write.option("parquet.page.row.count.limit", str(_PAGE_ROWS))
        .parquet(root + "/t")
    )
    import glob as _glob

    (path,) = _glob.glob(root + "/t/*.parquet")
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    if len(fmd[4]) != 1:
        raise ValueError("fixture expects a single row group")
    rg = fmd[4][0]
    n_rows = rg[3]
    names = [p for p, _ in _leaf_paths(fmd[2])]
    cc_date = rg[1][names.index("o_orderdate")]
    cc_price = rg[1][names.index("o_totalprice")]

    ci = read_column_index(data, cc_date)
    oi = read_offset_index(data, cc_date)
    oi_price = read_offset_index(data, cc_price)
    if ci["boundary_order"] != 1:
        raise ValueError("sorted write must yield ASCENDING boundaries")
    if any(ci["null_pages"]):
        raise ValueError("unexpected null pages in sorted fixture")
    epoch = dt.date(1970, 1, 1)
    lo_days, hi_days = (_PG_LO - epoch).days, (_PG_HI - epoch).days
    page_rows = [
        (oi[i + 1][2] if i + 1 < len(oi) else n_rows) - oi[i][2]
        for i in range(len(oi))
    ]
    selected = [
        i
        for i in range(len(oi))
        if not (
            struct.unpack("<i", ci["maxs"][i])[0] < lo_days
            or struct.unpack("<i", ci["mins"][i])[0] > hi_days
        )
    ]

    def _covering(first_rows: list[tuple[int, int, int]],
                  lo: int, hi: int) -> list[int]:
        """Offsets of the pages of a column whose row spans intersect
        [lo, hi) — the cross-column row-synchronization rule."""
        out = []
        for j, (off, _, fr) in enumerate(first_rows):
            nxt = (
                first_rows[j + 1][2]
                if j + 1 < len(first_rows)
                else n_rows
            )
            if fr < hi and nxt > lo:
                out.append(off)
        return out

    tasks = []
    for i in selected:
        row_lo = oi[i][2]
        row_hi = row_lo + page_rows[i]
        tasks.append((
            path,
            _json.dumps({
                "date_off": oi[i][0],
                "idx_min": struct.unpack("<i", ci["mins"][i])[0],
                "idx_max": struct.unpack("<i", ci["maxs"][i])[0],
                "row_lo": row_lo,
                "row_hi": row_hi,
                "price_offs": _covering(oi_price, row_lo, row_hi),
                "price_first_rows": [
                    fr for off, _, fr in oi_price
                    if off in set(_covering(oi_price, row_lo, row_hi))
                ],
                "cmd_date": {str(k): v for k, v in cc_date[3].items()
                             if isinstance(v, int)},
                "cmd_price": {str(k): v for k, v in cc_price[3].items()
                              if isinstance(v, int)},
                "lo_days": lo_days,
                "hi_days": hi_days,
            }),
        ))

    # several pages per task: page decode is cheap, task launch and
    # the per-task file read are not — real readers coalesce adjacent
    # selected pages into one range read the same way
    plan = spark.createDataFrame(
        tasks or [("", "")], "path string, spec string"
    ).repartition(max(min(len(tasks), 32), 1))

    def _read_pages(batches) -> Iterator:
        import json as _json2

        import pandas as pd

        blob_cache: dict[str, bytes] = {}
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                if not rec.path:
                    continue
                spec = _json2.loads(rec.spec)
                blob = blob_cache.get(rec.path)
                if blob is None:
                    with open(rec.path, "rb") as fh:
                        blob = blob_cache[rec.path] = fh.read()
                cmd_d = {int(k): v for k, v in spec["cmd_date"].items()}
                cmd_p = {int(k): v for k, v in spec["cmd_price"].items()}
                (dates,) = read_fixed_pages_at(
                    blob, cmd_d, [spec["date_off"]]
                )
                consistent = (
                    min(dates) == spec["idx_min"]
                    and max(dates) == spec["idx_max"]
                )
                prices: list[float] = []
                for off, fr in zip(
                    spec["price_offs"], spec["price_first_rows"]
                ):
                    (vals,) = read_fixed_pages_at(blob, cmd_p, [off])
                    s = max(spec["row_lo"] - fr, 0)
                    e = min(spec["row_hi"] - fr, len(vals))
                    prices.extend(vals[s:e])
                if len(prices) != len(dates):
                    raise ValueError("row-sync produced ragged columns")
                cents = n = 0
                for d, p in zip(dates, prices):
                    if spec["lo_days"] <= d <= spec["hi_days"]:
                        n += 1
                        cents += round(p * 100)
                yield pd.DataFrame({
                    "n": [n], "cents": [cents],
                    "consistent": [bool(consistent)],
                })

    partials = plan.mapInPandas(
        _read_pages, "n long, cents long, consistent boolean"
    )
    out = partials.agg(
        F.lit(len(oi)).cast("int").alias("pages_total"),
        F.lit(len(selected)).cast("int").alias("pages_selected"),
        F.lit(len(oi) - len(selected)).cast("int").alias("pages_skipped"),
        F.lit(int(sum(page_rows[i] for i in selected)))
        .cast("bigint").alias("rows_planned"),
        F.lit(True).alias("boundary_ascending"),
        F.min("consistent").alias("index_consistent"),
        F.sum("n").alias("n_in_window"),
        (F.sum("cents").cast("decimal(18,0)") / 100)
        .cast("double").alias("revenue_in_window"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_nested_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        elems AS (
            SELECT b.k, gs.i,
                   CASE WHEN (b.k + gs.i) % 7 = 0 THEN NULL
                        ELSE b.k * 10 + gs.i END AS v
            FROM base b, generate_series(1, 4) AS gs(i)
            WHERE b.k % 11 <> 0 AND gs.i <= b.k % 5
        )
        SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM base WHERE k % 11 = 0)
                    AS BIGINT) AS n_null_lists,
               CAST((SELECT count(*) FROM base
                     WHERE k % 11 <> 0 AND k % 5 = 0)
                    AS BIGINT) AS n_empty_lists,
               CAST(count(*) AS BIGINT) AS n_entries,
               CAST(count(*) - count(v) AS BIGINT) AS n_null_elements,
               CAST(sum(v) AS BIGINT) AS elem_sum,
               TRUE AS nested_consistent
        FROM elems
    """,
    tags=("source", "parquet", "pages", "nested", "dremel"),
)
def source_parquet_nested_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN `array<bigint>` column decoded entirely by
    hand (round 12) — the nested-types extension of
    `source_parquet_spark_native_decode`, closing the top "What's
    missing" seam from round 11: real lakehouse tables carry
    lists/structs, and until now the hand-built page readers
    rejected any column with repetition levels.

    The fixture derives one list per order from o_orderkey k:
    NULL when k % 11 = 0, else the (possibly empty) k % 5 elements
    `k*10 + i` with every (k+i) % 7 = 0 element nulled — so the
    Dremel streams carry all four definition levels (0 null list,
    1 empty list, 2 null element, 3 value) and both repetition
    levels (0 new row, 1 continuation), not a degenerate shape.
    Spark's parquet-mr writer emits the standard 3-level list
    (optional group (LIST) / repeated group "list" / optional
    "element") with SNAPPY pages; the reader recovers every row
    through nothing but this repo's layers — Thrift-Compact footer +
    PageHeaders, `_leaf_repetitions` fixing max_def/max_rep from the
    schema's repetition chain, the multi-bit RLE/bit-packed level
    streams (def levels need 2 bits here, not the flat path's 1),
    the hand-built snappy decoder, and Dremel record assembly
    (`_assemble_single_rep`) that concatenates levels across
    pages so lists spanning page boundaries reassemble.

    The oracle recomputes every count and the element sum from the
    raw orders table via a lateral generate_series — a levels bug
    miscounts null/empty lists, a repetition bug splices adjacent
    rows' lists, an assembly bug double-consumes values.
    ``nested_consistent`` additionally pins, engine-side, that the
    file really exercised the nested shape: the leaf's repetition
    chain is exactly optional/repeated/optional, >1 data page was
    walked, per-row-group assembled row counts match the footer, and
    the codec is SNAPPY (hand-built decode, not a pass-through).

    Scale posture: one task per row group (mapInPandas over the plan
    rows — Spark's own split model); per-task partial aggregates
    combine in a single final reduce, so nothing row-shaped crosses
    the shuffle. The pure-python decode is the format-layer
    demonstrator; production scans stay on the JVM vectorized
    reader, which this query's output certifies against.
    """
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqnest_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 11 = 0 THEN CAST(NULL AS array<bigint>)
                 ELSE transform(
                     slice(array(1, 2, 3, 4), 1,
                           CAST(o_orderkey % 5 AS INT)),
                     i -> CASE WHEN (o_orderkey + i) % 7 = 0
                               THEN CAST(NULL AS BIGINT)
                               ELSE o_orderkey * 10 + i END)
            END AS vals
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                rep_chain = next(iter(_leaf_repetitions(fmd[2]).values()))
                rg = fmd[4][rec.rg]
                cmd = rg[1][0][3]
                rows, n_pages = read_list_fixed_column_pages(
                    data, cmd, rep_chain
                )
                n_null_lists = sum(1 for r in rows if r is None)
                n_empty = sum(1 for r in rows if r == [])
                entries = [e for r in rows if r for e in r]
                present = [e for e in entries if e is not None]
                ok = (
                    rep_chain == [1, 2, 1]
                    and len(rows) == rg[3]
                    and cmd[4] == 1  # SNAPPY through the hand decoder
                )
                yield _pd.DataFrame(
                    [(
                        len(rows), n_null_lists, n_empty, len(entries),
                        len(entries) - len(present), sum(present),
                        n_pages, bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_lists", "n_empty_lists",
                        "n_entries", "n_null_elements", "elem_sum",
                        "pages", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_lists bigint, n_empty_lists bigint,"
        " n_entries bigint, n_null_elements bigint, elem_sum bigint,"
        " pages int, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_lists").alias("n_null_lists"),
        F.sum("n_empty_lists").alias("n_empty_lists"),
        F.sum("n_entries").alias("n_entries"),
        F.sum("n_null_elements").alias("n_null_elements"),
        F.sum("elem_sum").alias("elem_sum"),
        (F.min("ok") & (F.sum("pages") > F.lit(1)))
        .alias("nested_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_struct_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null_structs,
               CAST(sum(CASE WHEN k % 13 <> 0 AND k % 17 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
               CAST(sum(CASE WHEN k % 13 <> 0 AND k % 5 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_null_tags,
               CAST(sum(CASE WHEN k % 13 <> 0 AND k % 17 <> 0
                             THEN k END) AS BIGINT) AS k_sum,
               CAST(sum(CASE WHEN k % 13 <> 0 AND k % 5 <> 0
                             THEN 2 END) AS BIGINT) AS tag_chars,
               TRUE AS struct_consistent
        FROM base
    """,
    tags=("source", "parquet", "pages", "nested", "struct"),
)
def source_parquet_struct_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN struct<k bigint, tag string> column decoded by
    hand (round 12) — the non-repeated half of the nested-types seam
    (`source_parquet_nested_decode` covers lists): a struct column
    flattens to one leaf chunk per field whose definition levels run
    DEEPER than 1 (optional struct + optional leaf = max_def 2) with
    no repetition levels, so a reader must (a) size the level stream
    at 2 bits, and (b) disambiguate def 0 (the STRUCT is null) from
    def 1 (struct present, leaf null) — value extraction alone cannot.

    The fixture nulls the whole struct on keys ≡ 0 (mod 13), the k
    field on keys ≡ 0 (mod 17), the tag field on keys ≡ 0 (mod 5);
    both leaves decode through `read_leaf_pages_with_levels` (INT64
    and BYTE_ARRAY paths, dictionary + snappy pages — Spark's writer
    defaults). ``struct_consistent`` pins engine-side that the two
    leaves AGREE on which rows are struct-null (identical def-0
    position sets — the structural invariant Dremel guarantees), that
    both leaves' max_def is 2, and that >1 data page was walked.

    The oracle recomputes every count from the raw table: a level-
    stream sizing bug miscounts everything, a def-0/def-1 mixup swaps
    null-struct and null-field counts, an alignment bug flips k_sum.

    Scale posture: one task per row group via mapInPandas; partial
    counts combine in one final reduce. The pure-python decode is the
    format-layer demonstrator; production scans stay on the JVM
    vectorized reader."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqstruct_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 13 = 0
                 THEN CAST(NULL AS struct<k: bigint, tag: string>)
                 ELSE named_struct(
                     'k', CASE WHEN o_orderkey % 17 = 0
                               THEN CAST(NULL AS BIGINT)
                               ELSE o_orderkey END,
                     'tag', CASE WHEN o_orderkey % 5 = 0
                                 THEN CAST(NULL AS STRING)
                                 ELSE concat('P', o_orderkey % 7) END)
            END AS s
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                reps = _leaf_repetitions(fmd[2])
                levels = {p: max_levels(c) for p, c in reps.items()}
                rg = fmd[4][rec.rg]
                by_path = {
                    ".".join(seg.decode() for seg in cc[3][3]): cc[3]
                    for cc in rg[1]
                }
                k_vals, k_defs, k_pages = read_leaf_pages_with_levels(
                    data, by_path["s.k"], levels["s.k"][0]
                )
                t_vals, t_defs, t_pages = read_leaf_pages_with_levels(
                    data, by_path["s.tag"], levels["s.tag"][0]
                )
                null_structs_k = [i for i, d in enumerate(k_defs)
                                  if d == 0]
                null_structs_t = [i for i, d in enumerate(t_defs)
                                  if d == 0]
                ok = (
                    levels["s.k"] == (2, 0)
                    and levels["s.tag"] == (2, 0)
                    and null_structs_k == null_structs_t
                    and len(k_vals) == rg[3]
                    and len(t_vals) == rg[3]
                    and k_pages + t_pages > 2
                )
                present_k = [v for v in k_vals if v is not None]
                yield _pd.DataFrame(
                    [(
                        len(k_vals),
                        len(null_structs_k),
                        sum(1 for d in k_defs if d == 1),
                        sum(1 for d in t_defs if d == 1),
                        sum(present_k),
                        sum(len(v) for v in t_vals if v is not None),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_structs", "n_null_k",
                        "n_null_tags", "k_sum", "tag_chars", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_structs bigint, n_null_k bigint,"
        " n_null_tags bigint, k_sum bigint, tag_chars bigint,"
        " ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_structs").alias("n_null_structs"),
        F.sum("n_null_k").alias("n_null_k"),
        F.sum("n_null_tags").alias("n_null_tags"),
        F.sum("k_sum").alias("k_sum"),
        F.sum("tag_chars").alias("tag_chars"),
        F.min("ok").alias("struct_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_list_strings_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        elems AS (
            SELECT b.k, gs.i,
                   CASE WHEN (b.k + gs.i) % 7 = 0 THEN NULL
                        ELSE 'w' || CAST(b.k % 100 AS VARCHAR) || '_'
                             || CAST(gs.i AS VARCHAR) END AS v
            FROM base b, generate_series(1, 4) AS gs(i)
            WHERE b.k % 11 <> 0 AND gs.i <= b.k % 5
        )
        SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM base WHERE k % 11 = 0)
                    AS BIGINT) AS n_null_lists,
               CAST((SELECT count(*) FROM base
                     WHERE k % 11 <> 0 AND k % 5 = 0)
                    AS BIGINT) AS n_empty_lists,
               CAST(count(*) AS BIGINT) AS n_entries,
               CAST(count(*) - count(v) AS BIGINT) AS n_null_elements,
               CAST(sum(length(v)) AS BIGINT) AS chars_sum,
               TRUE AS nested_consistent
        FROM elems
    """,
    tags=("source", "parquet", "pages", "nested", "strings"),
)
def source_parquet_list_strings_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN `array<string>` column decoded by hand (round
    12) — `source_parquet_nested_decode`'s BYTE_ARRAY sibling: string
    elements route the Dremel level streams through the byte-array
    page decoder (dictionary-encoded values under snappy — Spark's
    defaults for a low-cardinality string like this fixture's), so a
    repetition bug here splices STRINGS across rows and a dictionary
    bug swaps whole words. Same four-definition-level shape as the
    int64 fixture (null list / empty list / null element / value);
    the oracle recomputes counts and total character mass via a
    lateral generate_series. Scale posture: one task per row group,
    partial aggregates, single final reduce."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqls_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 11 = 0 THEN CAST(NULL AS array<string>)
                 ELSE transform(
                     slice(array(1, 2, 3, 4), 1,
                           CAST(o_orderkey % 5 AS INT)),
                     i -> CASE WHEN (o_orderkey + i) % 7 = 0
                               THEN CAST(NULL AS STRING)
                               ELSE concat('w', o_orderkey % 100, '_', i)
                          END)
            END AS vals
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                rep_chain = next(iter(_leaf_repetitions(fmd[2]).values()))
                rg = fmd[4][rec.rg]
                cmd = rg[1][0][3]
                rows, n_pages = read_list_column_pages(
                    data, cmd, rep_chain
                )
                n_null_lists = sum(1 for r in rows if r is None)
                n_empty = sum(1 for r in rows if r == [])
                entries = [e for r in rows if r for e in r]
                present = [e for e in entries if e is not None]
                ok = (
                    rep_chain == [1, 2, 1]
                    and len(rows) == rg[3]
                    and cmd[1] == _BYTE_ARRAY
                    and cmd[4] == 1  # SNAPPY through the hand decoder
                )
                yield _pd.DataFrame(
                    [(
                        len(rows), n_null_lists, n_empty, len(entries),
                        len(entries) - len(present),
                        sum(len(e) for e in present),
                        n_pages, bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_lists", "n_empty_lists",
                        "n_entries", "n_null_elements", "chars_sum",
                        "pages", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_lists bigint, n_empty_lists bigint,"
        " n_entries bigint, n_null_elements bigint, chars_sum bigint,"
        " pages int, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_lists").alias("n_null_lists"),
        F.sum("n_empty_lists").alias("n_empty_lists"),
        F.sum("n_entries").alias("n_entries"),
        F.sum("n_null_elements").alias("n_null_elements"),
        F.sum("chars_sum").alias("chars_sum"),
        (F.min("ok") & (F.sum("pages") > F.lit(1)))
        .alias("nested_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_decimal_bool_decode",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum((o_orderkey * 137 % 100000) * 100) AS BIGINT)
                   AS dec_unscaled_sum,
               CAST(count(*) FILTER (WHERE o_orderkey % 3 = 0)
                    AS BIGINT) AS n_true_flags,
               CAST(count(*) FILTER (WHERE o_orderkey % 50 = 0)
                    AS BIGINT) AS n_null_flag_n,
               CAST(count(*) FILTER (WHERE o_orderkey % 50 <> 0
                                       AND o_orderkey % 7 < 3)
                    AS BIGINT) AS n_true_flag_n,
               CAST(sum(CASE WHEN o_orderkey % 50 <> 0
                             THEN (o_orderkey * 211 % 100000) * 100 END)
                    AS BIGINT) AS dec_n_unscaled_sum,
               TRUE AS layout_consistent
        FROM orders
    """,
    tags=("source", "parquet", "pages", "decimal", "boolean"),
)
def source_parquet_decimal_bool_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark-written DECIMAL(25,2) (FIXED_LEN_BYTE_ARRAY) and BOOLEAN
    columns decoded by hand (round 12) — the two physical types the
    page readers still rejected after the nested work: wide decimals
    store the unscaled value big-endian two's-complement in
    type_length bytes (11 for precision 25), and PLAIN booleans are
    the one BIT-PACKED physical layout (LSB-first, not byte-aligned).
    The fixture carries a never-null decimal, a nullable decimal,
    and two nullable booleans with real mixed runs; max_def for each
    leaf comes from the schema's repetition chain, never assumed
    (Spark's % operator forces nullability, so all four leaves are
    OPTIONAL here — the REQUIRED/no-levels FLBA+boolean path is
    pinned by the spark.range differential in
    tests/test_parquet_meta.py).

    The oracle recomputes the unscaled sums and true/null counts from
    the raw table: a sign-extension bug flips big unscaled values, a
    bit-order bug scrambles every boolean run, a levels bug shifts
    the whole bitstream by the null count.

    Scale posture: one task per row group (mapInPandas), four column
    chunks decoded per task, partial sums combine in one reduce."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqdec_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(o_orderkey * 137 % 100000 AS decimal(25,2)) AS dec",
            "o_orderkey % 3 = 0 AS flag",
            """CASE WHEN o_orderkey % 50 = 0 THEN CAST(NULL AS BOOLEAN)
                    ELSE o_orderkey % 7 < 3 END AS flag_n""",
            """CAST(CASE WHEN o_orderkey % 50 = 0 THEN NULL
                         ELSE o_orderkey * 211 % 100000 END
                    AS decimal(25,2)) AS dec_n""",
        )
        .coalesce(1)
        .write.option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 4 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                ses = {se[4].decode(): se for se in fmd[2][1:]}
                levels = {
                    k: max_levels(v)[0]
                    for k, v in _leaf_repetitions(fmd[2]).items()
                }
                rg = fmd[4][rec.rg]
                by_path = {
                    ".".join(s.decode() for s in cc[3][3]): cc[3]
                    for cc in rg[1]
                }
                n_pages = 0
                dec, np_ = read_flba_column_pages(
                    data, by_path["dec"], ses["dec"][2], levels["dec"]
                )
                n_pages += np_
                dec_n, np_ = read_flba_column_pages(
                    data, by_path["dec_n"], ses["dec_n"][2],
                    levels["dec_n"],
                )
                n_pages += np_
                flag, np_ = read_boolean_column_pages(
                    data, by_path["flag"], levels["flag"]
                )
                n_pages += np_
                flag_n, np_ = read_boolean_column_pages(
                    data, by_path["flag_n"], levels["flag_n"]
                )
                n_pages += np_
                ok = (
                    ses["dec"][6] == 5  # converted_type DECIMAL
                    and ses["dec"][2] == 11  # FLBA(11) for precision 25
                    and ses["dec"][7] == 2  # scale
                    and all(levels[c] == 1 for c in by_path)
                    and len(dec) == rg[3]
                    and not any(v is None for v in dec)
                    and n_pages > 4
                )
                yield _pd.DataFrame(
                    [(
                        len(dec),
                        sum(dec),
                        sum(1 for b in flag if b),
                        sum(1 for b in flag_n if b is None),
                        sum(1 for b in flag_n if b),
                        sum(v for v in dec_n if v is not None),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "dec_unscaled_sum", "n_true_flags",
                        "n_null_flag_n", "n_true_flag_n",
                        "dec_n_unscaled_sum", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, dec_unscaled_sum bigint, n_true_flags bigint,"
        " n_null_flag_n bigint, n_true_flag_n bigint,"
        " dec_n_unscaled_sum bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("dec_unscaled_sum").alias("dec_unscaled_sum"),
        F.sum("n_true_flags").alias("n_true_flags"),
        F.sum("n_null_flag_n").alias("n_null_flag_n"),
        F.sum("n_true_flag_n").alias("n_true_flag_n"),
        F.sum("dec_n_unscaled_sum").alias("dec_n_unscaled_sum"),
        F.min("ok").alias("layout_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_int96_timestamp_decode",
    oracle="""
        WITH v AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                   ELSE epoch_us(o_orderdate
                        + (o_orderkey % 24) * INTERVAL 1 HOUR
                        + (o_orderkey % 60) * INTERVAL 1 MINUTE)
                   END AS us
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(us) AS BIGINT) AS n_nulls,
               CAST(min(us) AS BIGINT) AS min_us,
               CAST(max(us) AS BIGINT) AS max_us,
               CAST(sum(us // 1000000 - 700000000) AS BIGINT)
                   AS sum_off_sec,
               TRUE AS int96_consistent
        FROM v
    """,
    tags=("source", "parquet", "pages", "int96", "timestamp"),
)
def source_parquet_int96_timestamp_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark's DEFAULT parquet timestamp layout decoded by hand
    (round 12): INT96 — the 12-byte legacy type the parquet format
    officially deprecates and `spark.sql.parquet.outputTimestampType`
    still defaults to, so virtually every Spark-produced lake table
    with timestamps carries it. Layout per the Impala/Hive
    convention: 8 LE bytes of nanoseconds within the day, then 4 LE
    bytes of the JULIAN day number (epoch day 2440588); the reader
    converts to epoch microseconds. Spark dictionary-encodes INT96 by
    default, so the chunk walk exercises the 12-byte values through
    BOTH the dictionary page and the RLE index stream, under snappy.

    The oracle recomputes epoch microseconds with DuckDB's own
    timestamp arithmetic (`epoch_us` over the same
    o_orderdate + key-derived hour/minute intervals): a Julian-epoch
    off-by-one shifts every value by 86.4e9 us, a nanos/micros slip
    scales them by 1000, and either flips min/max/sum.
    ``int96_consistent`` pins the layout really was INT96 +
    dictionary + snappy with >1 data page per group.

    Scale posture: one task per row group, partial min/max/sum
    combine in one reduce; production scans stay on the JVM reader
    this certifies against."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqi96_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 97 = 0 THEN CAST(NULL AS TIMESTAMP)
                 ELSE CAST(o_orderdate AS TIMESTAMP) + make_interval(
                     0, 0, 0, 0, CAST(o_orderkey % 24 AS INT),
                     CAST(o_orderkey % 60 AS INT), 0)
            END AS ts
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                (_, chain), = _leaf_repetitions(fmd[2]).items()
                max_def = max_levels(chain)[0]
                rg = fmd[4][rec.rg]
                cmd = rg[1][0][3]
                vals, n_pages = read_int96_column_pages(
                    data, cmd, max_def
                )
                present = [v for v in vals if v is not None]
                ok = (
                    cmd[1] == _INT96
                    and 11 in cmd  # dictionary page present
                    and cmd[4] == 1  # snappy
                    and len(vals) == rg[3]
                    and n_pages > 1
                )
                yield _pd.DataFrame(
                    [(
                        len(vals), len(vals) - len(present),
                        min(present), max(present),
                        sum(v // 1_000_000 - 700_000_000
                            for v in present),
                        bool(ok),
                    )],
                    columns=["n_rows", "n_nulls", "min_us", "max_us",
                             "sum_off_sec", "ok"],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_nulls bigint, min_us bigint, max_us bigint,"
        " sum_off_sec bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
        F.sum("sum_off_sec").alias("sum_off_sec"),
        F.min("ok").alias("int96_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_map_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        ent AS (
            SELECT k, i - 1 AS j
            FROM base, generate_series(1, 4) AS gs(i)
            WHERE k % 11 <> 0 AND k % 7 <> 0 AND i <= k % 4 + 1
        ),
        rowagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_maps,
                   CAST(sum(CASE WHEN k % 11 <> 0 AND k % 7 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_empty_maps
            FROM base
        ),
        entagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_entries,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 5 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_null_values,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 5 <> 0
                                          THEN k * 10 + j END), 0)
                        AS BIGINT) AS val_sum,
                   CAST(2 * count(*) AS BIGINT) AS key_chars
            FROM ent
        )
        SELECT n_rows, n_null_maps, n_empty_maps, n_entries,
               n_null_values, val_sum, key_chars,
               TRUE AS map_consistent
        FROM rowagg, entagg
    """,
    tags=("source", "parquet", "pages", "nested", "map"),
)
def source_parquet_map_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN ``map<string,bigint>`` column decoded entirely
    by hand (round 13) — the top "What's missing" seam from round 12:
    the spec's 3-level key_value group (LogicalTypes.md MAP) is what
    Delta checkpoints themselves use for partitionValues, so a nested
    reader without maps stops at the most common real-file shape.

    A map column flattens to TWO leaf chunks — key_value.key
    (required, chain [1,2,0]) and key_value.value (optional, chain
    [1,2,1]) — that share the repeated node. Each side runs the same
    single-rep-level Dremel assembly as lists
    (`read_map_column_pages`), then zips entry-wise with every
    structural invariant checked: row counts, null/empty agreement,
    per-row entry counts, and the spec's no-null-keys rule.

    The fixture derives one map per order from o_orderkey k: NULL
    when k % 11 = 0, EMPTY when k % 7 = 0, else k % 4 + 1 entries
    'kj' -> k*10+j with every (k+j) % 5 = 0 value nulled — all def
    levels on both leaves (0 null map, 1 empty, 2 key present /
    value null, 3 value) and both rep levels. The oracle recomputes
    every count from raw orders via a lateral generate_series; the
    zipper's validation errors surface as job failures, not wrong
    sums. ``map_consistent`` pins engine-side that the leaf chains
    are exactly the spec's, >1 data page was walked per chunk, and
    the codec is SNAPPY (hand-built decode).

    Scale posture: one task per row group (mapInPandas over plan
    rows); per-task partials combine in one reduce. Differentially
    tested against pyarrow across v1/v2 pages, dict on/off, and
    codecs in tests/test_parquet_meta.py."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqmap_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS map<string,bigint>)
                 WHEN o_orderkey % 7 = 0
                 THEN CAST(map() AS map<string,bigint>)
                 ELSE map_from_arrays(
                     transform(
                         slice(array(0, 1, 2, 3), 1,
                               CAST(o_orderkey % 4 AS INT) + 1),
                         j -> concat('k', j)),
                     transform(
                         slice(array(0, 1, 2, 3), 1,
                               CAST(o_orderkey % 4 AS INT) + 1),
                         j -> CASE WHEN (o_orderkey + j) % 5 = 0
                                   THEN CAST(NULL AS BIGINT)
                                   ELSE o_orderkey * 10 + j END))
            END AS m
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                reps = _leaf_repetitions(fmd[2])
                kp = next(p for p in reps if p.endswith(".key"))
                vp = next(p for p in reps if p.endswith(".value"))
                rg = fmd[4][rec.rg]
                by_path = {
                    ".".join(seg.decode() for seg in cc[3][3]): cc[3]
                    for cc in rg[1]
                }
                rows, n_pages = read_map_column_pages(
                    data, by_path[kp], by_path[vp], reps[kp], reps[vp]
                )
                n_null = sum(1 for r in rows if r is None)
                n_empty = sum(1 for r in rows if r == {})
                entries = [
                    (k, v) for r in rows if r for k, v in r.items()
                ]
                present = [v for _k, v in entries if v is not None]
                ok = (
                    reps[kp] == [1, 2, 0]
                    and reps[vp] == [1, 2, 1]
                    and len(rows) == rg[3]
                    and by_path[kp][4] == 1  # SNAPPY, hand decoder
                    and n_pages > 2
                )
                yield _pd.DataFrame(
                    [(
                        len(rows), n_null, n_empty, len(entries),
                        len(entries) - len(present), sum(present),
                        sum(len(k) for k, _v in entries), bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_maps", "n_empty_maps",
                        "n_entries", "n_null_values", "val_sum",
                        "key_chars", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_maps bigint, n_empty_maps bigint,"
        " n_entries bigint, n_null_values bigint, val_sum bigint,"
        " key_chars bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_maps").alias("n_null_maps"),
        F.sum("n_empty_maps").alias("n_empty_maps"),
        F.sum("n_entries").alias("n_entries"),
        F.sum("n_null_values").alias("n_null_values"),
        F.sum("val_sum").alias("val_sum"),
        F.sum("key_chars").alias("key_chars"),
        F.min("ok").alias("map_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_list_struct_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        slot AS (
            SELECT k, i - 1 AS j
            FROM base, generate_series(1, 3) AS gs(i)
            WHERE k % 13 <> 0 AND i <= k % 4
        ),
        rowagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_lists,
                   CAST(sum(CASE WHEN k % 13 <> 0 AND k % 4 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_empty_lists
            FROM base
        ),
        slotagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_slots,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 6 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_null_structs,
                   CAST(coalesce(sum(
                       CASE WHEN (k + j) % 6 <> 0 AND (k + j) % 5 <> 0
                            THEN k * 10 + j END), 0) AS BIGINT)
                       AS a_sum,
                   CAST(coalesce(sum(
                       CASE WHEN (k + j) % 6 <> 0 AND (k + j) % 4 <> 0
                            THEN 2 END), 0) AS BIGINT) AS s_chars
            FROM slot
        )
        SELECT n_rows, n_null_lists, n_empty_lists, n_slots,
               n_null_structs, a_sum, s_chars,
               TRUE AS struct_list_consistent
        FROM rowagg, slotagg
    """,
    tags=("source", "parquet", "pages", "nested", "struct", "list"),
)
def source_parquet_list_struct_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN ``array<struct<a bigint, s string>>`` column
    decoded by hand (round 13) — struct-inside-list, the second half
    of the round-12 nesting seam: each struct field is its own leaf
    chunk (chain [1,2,1,1], max_def 4) and record assembly must keep
    RAW definition levels per slot so 'slot exists but the struct is
    null' (def 2) splits from 'struct present, this field null'
    (def 3) — collapsed values cannot tell them apart. The two
    leaves' independent page streams are then zipped slot-wise
    (`read_list_struct_column_pages`) with row counts, row nullness,
    slot counts, and struct-null positions all cross-checked — the
    structural agreement Dremel guarantees and a correct reader must
    verify.

    Fixture per order k: NULL list when k % 13 = 0, else k % 4 slots
    (empty list at k % 4 = 0) where slot j is a NULL struct when
    (k+j) % 6 = 0, field a NULL when (k+j) % 5 = 0, field s ('s' +
    one digit) NULL when (k+j) % 4 = 0 — every definition level 0-4
    occurs on both leaves. The oracle recomputes all seven aggregates
    from raw orders via a lateral generate_series.

    Scale posture: one task per row group; partials combine in one
    reduce. Differentially tested against pyarrow and Spark's own
    reader in tests/test_parquet_meta.py."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqls_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 13 = 0
                 THEN CAST(NULL AS array<struct<a: bigint, s: string>>)
                 ELSE transform(
                     slice(array(0, 1, 2), 1,
                           CAST(o_orderkey % 4 AS INT)),
                     j -> CASE
                         WHEN (o_orderkey + j) % 6 = 0
                         THEN CAST(NULL AS struct<a: bigint, s: string>)
                         ELSE named_struct(
                             'a', CASE WHEN (o_orderkey + j) % 5 = 0
                                       THEN CAST(NULL AS BIGINT)
                                       ELSE o_orderkey * 10 + j END,
                             's', CASE WHEN (o_orderkey + j) % 4 = 0
                                       THEN CAST(NULL AS STRING)
                                       ELSE concat(
                                           's', (o_orderkey + j) % 9)
                                  END) END)
            END AS ls
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                reps = _leaf_repetitions(fmd[2])
                ap = next(p for p in reps if p.endswith(".a"))
                sp = next(p for p in reps if p.endswith(".s"))
                rg = fmd[4][rec.rg]
                by_path = {
                    ".".join(seg.decode() for seg in cc[3][3]): cc[3]
                    for cc in rg[1]
                }
                rows, n_pages = read_list_struct_column_pages(
                    data,
                    [("a", by_path[ap], reps[ap]),
                     ("s", by_path[sp], reps[sp])],
                )
                n_null = sum(1 for r in rows if r is None)
                n_empty = sum(1 for r in rows if r == [])
                slots = [s for r in rows if r for s in r]
                structs = [s for s in slots if s is not None]
                ok = (
                    reps[ap] == [1, 2, 1, 1]
                    and reps[sp] == [1, 2, 1, 1]
                    and len(rows) == rg[3]
                    and by_path[ap][4] == 1  # SNAPPY, hand decoder
                    and n_pages > 2
                )
                yield _pd.DataFrame(
                    [(
                        len(rows), n_null, n_empty, len(slots),
                        len(slots) - len(structs),
                        sum(s["a"] for s in structs
                            if s["a"] is not None),
                        sum(len(s["s"]) for s in structs
                            if s["s"] is not None),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_lists", "n_empty_lists",
                        "n_slots", "n_null_structs", "a_sum",
                        "s_chars", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_lists bigint, n_empty_lists bigint,"
        " n_slots bigint, n_null_structs bigint, a_sum bigint,"
        " s_chars bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_lists").alias("n_null_lists"),
        F.sum("n_empty_lists").alias("n_empty_lists"),
        F.sum("n_slots").alias("n_slots"),
        F.sum("n_null_structs").alias("n_null_structs"),
        F.sum("a_sum").alias("a_sum"),
        F.sum("s_chars").alias("s_chars"),
        F.min("ok").alias("struct_list_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_nested_list_decode",
    oracle="""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderkey % 17 AS m FROM orders
        ),
        oe AS (
            SELECT k, gi - 1 AS i
            FROM base, generate_series(1, 4) AS go(gi)
            WHERE m >= 5 AND gi <= k % 4 + 1
        ),
        fi AS (
            SELECT k, i FROM oe
            WHERE (k + i) % 7 <> 0 AND (k + i) % 5 <> 0
        ),
        vals AS (
            SELECT k, i, gj - 1 AS j
            FROM fi, generate_series(1, 3) AS gv(gj)
            WHERE gj <= k % 3 + 1
        ),
        rowagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_outer,
                   CAST(sum(CASE WHEN m IN (2, 3, 4) THEN 1 ELSE 0 END)
                        AS BIGINT) AS sentinel_entries,
                   CAST(sum(CASE WHEN m = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS m2,
                   CAST(sum(CASE WHEN m = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS m3,
                   CAST(sum(CASE WHEN m = 4 THEN 1 ELSE 0 END)
                        AS BIGINT) AS m4
            FROM base
        ),
        oagg AS (
            SELECT CAST(count(*) AS BIGINT) AS gen_entries,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 7 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS gen_null_inner,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 7 <> 0
                                          AND (k + i) % 5 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS gen_empty_inner
            FROM oe
        ),
        vagg AS (
            SELECT CAST(count(*) AS BIGINT) AS gen_values,
                   CAST(coalesce(sum(CASE WHEN (k + i + j) % 6 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS gen_null_values,
                   CAST(coalesce(sum(CASE WHEN (k + i + j) % 6 <> 0
                                          THEN k * 100 + i * 10 + j
                                     END), 0) AS BIGINT) AS val_sum
            FROM vals
        )
        SELECT n_rows, n_null_outer,
               sentinel_entries + gen_entries AS n_outer_entries,
               m2 + gen_null_inner AS n_null_inner,
               m3 + gen_empty_inner AS n_empty_inner,
               m4 + gen_values AS n_values,
               m4 + gen_null_values AS n_null_values,
               val_sum,
               TRUE AS nested_list_consistent
        FROM rowagg, oagg, vagg
    """,
    tags=("source", "parquet", "pages", "nested", "list", "deep"),
)
def source_parquet_nested_list_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A SPARK-WRITTEN ``array<array<bigint>>`` column decoded by
    hand (round 13) — TWO repetition levels (chain [1,2,1,2,1],
    max_def 5, max_rep 2), which the single-rep fast path rejects:
    this runs the GENERAL Dremel record assembler
    (`assemble_nested_leaf`, Melnik et al. 2010 §4), where a rep
    level r continues the open list at depth r and the def level
    materializes structure downward — distinguishing null outer (0),
    empty outer (1), null INNER list (2), empty inner (3), null
    element (4), and value (5).

    The fixture cycles o_orderkey % 17 through the five degenerate
    shapes (NULL / [] / [NULL] / [[]] / [[NULL]]) that pin each def
    level in isolation, then general rows with k%4+1 outer entries,
    (k+i)-modulated null/empty inner lists, and k%3+1 inner values
    with (k+i+j)-modulated nulls. The oracle recomputes all eight
    aggregates from raw orders through two chained lateral
    generate_series — one per repetition level.

    Scale posture: one task per row group; partials combine in one
    reduce. Differentially tested against pyarrow (v1/v2, dict,
    codecs) in tests/test_parquet_meta.py."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_pqll_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 17 = 0
                 THEN CAST(NULL AS array<array<bigint>>)
                 WHEN o_orderkey % 17 = 1
                 THEN CAST(array() AS array<array<bigint>>)
                 WHEN o_orderkey % 17 = 2
                 THEN array(CAST(NULL AS array<bigint>))
                 WHEN o_orderkey % 17 = 3
                 THEN array(CAST(array() AS array<bigint>))
                 WHEN o_orderkey % 17 = 4
                 THEN array(array(CAST(NULL AS BIGINT)))
                 ELSE transform(
                     slice(array(0, 1, 2, 3), 1,
                           CAST(o_orderkey % 4 AS INT) + 1),
                     i -> CASE
                         WHEN (o_orderkey + i) % 7 = 0
                         THEN CAST(NULL AS array<bigint>)
                         WHEN (o_orderkey + i) % 5 = 0
                         THEN CAST(array() AS array<bigint>)
                         ELSE transform(
                             slice(array(0, 1, 2), 1,
                                   CAST(o_orderkey % 3 AS INT) + 1),
                             j -> CASE
                                 WHEN (o_orderkey + i + j) % 6 = 0
                                 THEN CAST(NULL AS BIGINT)
                                 ELSE o_orderkey * 100 + i * 10 + j
                             END) END)
            END AS ll
            """
        )
        .coalesce(1)
        .write.option("compression", "snappy")
        .option("parquet.block.size", 2 * 1024 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .parquet(root)
    )
    path = _glob.glob(os.path.join(root, "*.parquet"))[0]
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                (lp, chain), = _leaf_repetitions(fmd[2]).items()
                rg = fmd[4][rec.rg]
                cmd = rg[1][0][3]
                rows, n_pages = read_nested_list_column_pages(
                    data, cmd, chain
                )
                n_null_outer = sum(1 for r in rows if r is None)
                outer = [e for r in rows if r is not None for e in r]
                n_null_inner = sum(1 for e in outer if e is None)
                n_empty_inner = sum(1 for e in outer if e == [])
                values = [v for e in outer if e for v in e]
                present = [v for v in values if v is not None]
                ok = (
                    chain == [1, 2, 1, 2, 1]
                    and max_levels(chain) == (5, 2)
                    and len(rows) == rg[3]
                    and cmd[4] == 1  # SNAPPY, hand decoder
                    and n_pages > 1
                )
                yield _pd.DataFrame(
                    [(
                        len(rows), n_null_outer, len(outer),
                        n_null_inner, n_empty_inner, len(values),
                        len(values) - len(present), sum(present),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "n_null_outer", "n_outer_entries",
                        "n_null_inner", "n_empty_inner", "n_values",
                        "n_null_values", "val_sum", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, n_null_outer bigint, n_outer_entries bigint,"
        " n_null_inner bigint, n_empty_inner bigint, n_values bigint,"
        " n_null_values bigint, val_sum bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null_outer").alias("n_null_outer"),
        F.sum("n_outer_entries").alias("n_outer_entries"),
        F.sum("n_null_inner").alias("n_null_inner"),
        F.sum("n_empty_inner").alias("n_empty_inner"),
        F.sum("n_values").alias("n_values"),
        F.sum("n_null_values").alias("n_null_values"),
        F.sum("val_sum").alias("val_sum"),
        F.min("ok").alias("nested_list_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_byte_stream_split_decode",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey % 53 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
               CAST(coalesce(sum(CASE WHEN o_orderkey % 53 <> 0
                   THEN CAST(round(o_totalprice * 100) AS BIGINT)
                   END), 0) AS BIGINT) AS cents,
               CAST(sum(CASE WHEN o_orderkey % 37 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS f_nulls,
               CAST(coalesce(sum(CASE WHEN o_orderkey % 37 <> 0
                   THEN o_orderkey % 1000 END), 0) AS BIGINT)
                   AS f_quarters,
               TRUE AS bss_consistent
        FROM orders
    """,
    tags=("source", "parquet", "pages", "encoding",
          "byte-stream-split"),
)
def source_parquet_byte_stream_split_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet BYTE_STREAM_SPLIT pages decoded by hand (round 13) —
    the modern float encoding (Encodings.md, enc 9): a page's K-byte
    values are TRANSPOSED into K byte streams (all 1st bytes, then
    all 2nd bytes, ...) so same-position bytes — exponents, high
    mantissa — sit together and the page codec can actually compress
    IEEE data; scientific/embedding-heavy lakes increasingly write it
    (pyarrow: use_byte_stream_split). A reader without it rejects the
    column outright; one that forgets the transpose produces byte-
    shuffled garbage floats — which is why the oracle runs on EXACT
    integer images (cents of the double column, quarter-counts of the
    float32 column) where any byte swap flips the sum.

    DOUBLE (8 streams) and FLOAT (4 streams) columns, nulls on both
    (the def-level stream sits in front, its count sizes the n×K data
    blob — the size identity the reader validates), ZSTD pages
    through the repo's own decoder. ``bss_consistent`` pins that both
    chunks' encoding lists actually carry enc 9 and >1 data page was
    walked per chunk.

    Scale posture: one task per row group via mapInPandas, partials
    in one reduce — the same split model as every page-decode
    demonstrator here."""
    import glob as _glob

    import pandas as _pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    root = os.path.join(
        scratch_root(), f"shs_pqbss_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    path = os.path.join(root, "bss.parquet")
    src = (
        t(spark, sf_dir, "orders")
        .selectExpr(
            "CASE WHEN o_orderkey % 53 = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE o_totalprice END AS d",
            "CASE WHEN o_orderkey % 37 = 0 THEN CAST(NULL AS FLOAT)"
            " ELSE CAST((o_orderkey % 1000) * 0.25 AS FLOAT) END AS f",
        )
        .toArrow()
    )
    tbl = _pa.table({
        "d": src["d"].cast(_pa.float64()),
        "f": src["f"].cast(_pa.float32()),
    })
    _pq.write_table(
        tbl, path,
        use_dictionary=False, compression="ZSTD",
        use_byte_stream_split=["d", "f"],
        # small pages so even the sf0.001 smoke fixture walks >1 page
        # per chunk (pyarrow splits at write_batch_size=1024 values)
        data_page_size=2 * 1024,
        row_group_size=max(2048, tbl.num_rows // 32),
    )
    with open(path, "rb") as fh:
        raw = fh.read()
    n_groups = len(decode_footer(raw)[4])

    plan = spark.createDataFrame(
        [(path, i) for i in range(n_groups)], "path string, rg int"
    ).repartition(n_groups)

    def _decode_groups(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                fmd = decode_footer(data)
                rg = fmd[4][rec.rg]
                by_path = {
                    ".".join(seg.decode() for seg in cc[3][3]): cc[3]
                    for cc in rg[1]
                }
                d_vals, _dd, d_pages = read_leaf_pages_with_levels(
                    data, by_path["d"], 1
                )
                f_vals, _fd, f_pages = read_leaf_pages_with_levels(
                    data, by_path["f"], 1
                )
                d_present = [v for v in d_vals if v is not None]
                f_present = [v for v in f_vals if v is not None]
                ok = (
                    9 in by_path["d"][2] and 9 in by_path["f"][2]
                    and len(d_vals) == rg[3] == len(f_vals)
                    and by_path["d"][4] == 6  # ZSTD, hand decoder
                )
                yield _pd.DataFrame(
                    [(
                        len(d_vals),
                        len(d_vals) - len(d_present),
                        sum(round(v * 100) for v in d_present),
                        len(f_vals) - len(f_present),
                        sum(round(v * 4) for v in f_present),
                        d_pages + f_pages,
                        bool(ok),
                    )],
                    columns=["n_rows", "d_nulls", "cents", "f_nulls",
                             "f_quarters", "pages", "ok"],
                )

    partials = plan.mapInPandas(
        _decode_groups,
        "n_rows bigint, d_nulls bigint, cents bigint, f_nulls bigint,"
        " f_quarters bigint, pages int, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("d_nulls").alias("d_nulls"),
        F.sum("cents").alias("cents"),
        F.sum("f_nulls").alias("f_nulls"),
        F.sum("f_quarters").alias("f_quarters"),
        (F.min("ok") & (F.sum("pages") > 2 * F.count("*")))
        .alias("bss_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
