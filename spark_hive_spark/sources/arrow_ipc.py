"""Arrow IPC (Feather V2) read WITHOUT the Arrow IPC reader — the
in-memory-format floor next to the parquet/ORC verticals (SURVEY.md
§2B source surface, round 11).

Arrow IPC is the interchange format of the modern data stack (Flight,
DuckDB/Polars handoff, Spark's own Arrow-batched Python exchange), and
its metadata layer is FLATBUFFERS, not thrift/protobuf — so this
module hand-builds a third metadata walker from the public specs:

- **Flatbuffers wire format** (google.github.io/flatbuffers): root
  uoffset; tables as soffset→vtable indirection (u16 vtable size,
  u16 table size, per-slot u16 offsets, 0 = absent/default); scalars
  inline, strings/vectors/tables as u32 relative offsets; vectors
  length-prefixed; structs inline; unions as a (type byte, offset)
  slot pair. All little-endian.
- **Arrow Message/Schema/File** (arrow/format/*.fbs): encapsulated
  messages `[0xFFFFFFFF][i32 metadata size][Message][padded body]`;
  Message = version/header-union(Schema=1, DictionaryBatch=2,
  RecordBatch=3)/bodyLength; Schema→Field(name, nullable,
  type-union Int=2/FloatingPoint=3/Utf8=5/Timestamp=10);
  RecordBatch = length + FieldNode{length,null_count} structs +
  Buffer{offset,length} structs (+ optional BodyCompression);
  buffers per column in spec order (validity, [offsets,] data),
  validity LSB-first. The FILE wrapper adds `ARROW1` magic and a
  seekable Footer of Block{offset, metaDataLength, bodyLength}
  structs — random batch access, which is what makes IPC files
  splittable scan inputs.
- **Compressed bodies**: BodyCompression wraps each buffer as
  `[i64 uncompressed length][frame]` — ZSTD(1) flows through the
  repo's own RFC 8878 decoder (operators/zstd.py), LZ4_FRAME(0)
  through the hand-built frame parser added round 12
  (operators/lz4.py: xxHash32-validated descriptor, independent and
  linked blocks, content checksum) around the existing block codec.
- **Dictionary encoding** (round 12): Field.dictionary carries the
  id + index type (int32 default); DictionaryBatch messages —
  reached via Footer.dictionaries blocks in the FILE layout —
  deliver the value arrays, and record batches then store only
  validity + index buffers. DELTA dictionary batches (round 13,
  isDelta=true — the streaming-writer vocabulary-growth mechanism)
  APPEND to the id's accumulated dictionary; repeated non-delta
  batches REPLACE it, per the stream spec.

Differentially tested against pyarrow's own IPC reader
(tests/test_arrow_ipc.py): every batch, every column, values + nulls
identical, compressed and not, both the streaming and file layouts.

Scale posture: the Footer gives O(1) access to any batch — one task
per Block, no scan-to-position; metadata decode is O(flatbuffer
bytes) at planning time. The registered query reads one batch per
task through the hand-built walker.

Reference parity: the reference has no Arrow surface
(CollegeScorecard.scala:35-157); north-star per SURVEY §2B.
"""

from __future__ import annotations

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

_MAGIC = b"ARROW1"


# ---------------------------------------------------------------------------
# flatbuffers wire format
# ---------------------------------------------------------------------------

class FBTable:
    """A flatbuffers table: slot accessors over the vtable."""

    __slots__ = ("buf", "pos", "vt", "vt_len")

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        soffset = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soffset
        self.vt_len = struct.unpack_from("<H", buf, self.vt)[0]

    def _slot(self, idx: int) -> int:
        """Byte offset of field ``idx`` from table pos, 0 if absent."""
        off = 4 + 2 * idx
        if off >= self.vt_len:
            return 0
        return struct.unpack_from("<H", self.buf, self.vt + off)[0]

    def scalar(self, idx: int, fmt: str, default=0):
        s = self._slot(idx)
        if not s:
            return default
        return struct.unpack_from(fmt, self.buf, self.pos + s)[0]

    def _indirect(self, idx: int) -> int | None:
        s = self._slot(idx)
        if not s:
            return None
        p = self.pos + s
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, idx: int) -> str | None:
        p = self._indirect(idx)
        if p is None:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode()

    def table(self, idx: int) -> "FBTable | None":
        p = self._indirect(idx)
        return None if p is None else FBTable(self.buf, p)

    def vector_len(self, idx: int) -> int:
        p = self._indirect(idx)
        return 0 if p is None else struct.unpack_from("<I", self.buf, p)[0]

    def vector_tables(self, idx: int) -> list["FBTable"]:
        p = self._indirect(idx)
        if p is None:
            return []
        n = struct.unpack_from("<I", self.buf, p)[0]
        out = []
        for i in range(n):
            ep = p + 4 + 4 * i
            out.append(
                FBTable(self.buf, ep + struct.unpack_from("<I", self.buf, ep)[0])
            )
        return out

    def vector_structs(self, idx: int, fmt: str, width: int) -> list[tuple]:
        p = self._indirect(idx)
        if p is None:
            return []
        n = struct.unpack_from("<I", self.buf, p)[0]
        return [
            struct.unpack_from(fmt, self.buf, p + 4 + width * i)
            for i in range(n)
        ]


def fb_root(buf: bytes) -> FBTable:
    return FBTable(buf, struct.unpack_from("<I", buf, 0)[0])


# ---------------------------------------------------------------------------
# Arrow metadata interpretation
# ---------------------------------------------------------------------------

_INT_FMTS = {(8, True): "<b", (16, True): "<h", (32, True): "<i",
             (64, True): "<q"}


def _parse_schema(tbl: FBTable) -> list[dict[str, Any]]:
    """Schema flatbuffer -> [{"name", "kind", ...}] per field.
    kind: int64/float64/utf8/timestamp_us (everything else loud).

    A DICTIONARY-ENCODED field (Field.dictionary set — the wild
    default for string-heavy feathers) keeps its VALUE kind here and
    additionally carries ``dict_id`` plus the index scalar format
    (DictionaryEncoding.indexType, int32 when absent per the spec):
    its record-batch buffers are then validity + indices, resolved
    against the DictionaryBatch with the same id."""
    fields = []
    for f in tbl.vector_tables(1):  # Schema.fields
        name = f.string(0)
        ttype = f.scalar(2, "<B")  # type_type (union code)
        tt = f.table(3)
        if ttype == 2:  # Int
            bw = tt.scalar(0, "<i") if tt else 0
            signed = tt.scalar(1, "<b") if tt else 0
            if bw != 64 or not signed:
                raise NotImplementedError(f"Int{bw} unsigned={not signed}")
            kind = "int64"
        elif ttype == 3:  # FloatingPoint
            if (tt.scalar(0, "<h") if tt else -1) != 2:  # DOUBLE
                raise NotImplementedError("non-double float")
            kind = "float64"
        elif ttype == 5:  # Utf8
            kind = "utf8"
        elif ttype == 10:  # Timestamp
            if (tt.scalar(0, "<h") if tt else -1) != 2:  # MICROSECOND
                raise NotImplementedError("non-microsecond timestamp")
            kind = "timestamp_us"
        else:
            raise NotImplementedError(f"Arrow type union code {ttype}")
        field: dict[str, Any] = {"name": name, "kind": kind}
        enc = f.table(4)  # Field.dictionary (DictionaryEncoding)
        if enc is not None:
            idx_t = enc.table(1)  # indexType (Int)
            bw, signed = (32, True)
            if idx_t is not None:
                bw = idx_t.scalar(0, "<i")
                signed = bool(idx_t.scalar(1, "<b"))
            if (bw, signed) not in _INT_FMTS:
                raise NotImplementedError(
                    f"dictionary index Int{bw} unsigned={not signed}"
                )
            field["dict_id"] = enc.scalar(0, "<q")
            field["index_fmt"] = _INT_FMTS[(bw, signed)]
            field["index_width"] = bw // 8
        fields.append(field)
    return fields


def _decompress_buffer(raw: bytes, codec: int | None) -> bytes:
    if codec is None or not raw:
        return raw
    if codec in (0, 1):  # LZ4_FRAME / ZSTD
        (n,) = struct.unpack_from("<q", raw, 0)
        if n == -1:  # spec: -1 = buffer stored uncompressed
            return raw[8:]
        if codec == 1:
            from spark_hive_spark.operators.zstd import zstd_decompress

            out = zstd_decompress(raw[8:])
        else:
            from spark_hive_spark.operators.lz4 import lz4_frame_decompress

            out = lz4_frame_decompress(raw[8:])
        if len(out) != n:
            raise ValueError("IPC buffer decompressed to wrong length")
        return out
    raise NotImplementedError(f"IPC body compression codec {codec}")


def _bit(validity: bytes, i: int) -> bool:
    return bool(validity[i >> 3] >> (i & 7) & 1) if validity else True


def _decode_batch(
    fields: list[dict],
    rb: FBTable,
    body: bytes,
    dictionaries: dict[int, list] | None = None,
) -> dict[str, list]:
    """RecordBatch metadata + body -> {column name: python values}.
    Dictionary-encoded fields read validity + index buffers and
    resolve through ``dictionaries[dict_id]``."""
    n_rows = rb.scalar(0, "<q")
    nodes = rb.vector_structs(1, "<qq", 16)  # FieldNode
    buffers = rb.vector_structs(2, "<qq", 16)  # Buffer
    comp = rb.table(3)  # BodyCompression
    codec = comp.scalar(0, "<b") if comp is not None else None
    if len(nodes) != len(fields):
        raise ValueError("field node count != schema fields")
    bi = 0

    def _next_buf() -> bytes:
        nonlocal bi
        off, ln = buffers[bi]
        bi += 1
        return _decompress_buffer(body[off : off + ln], codec)

    out: dict[str, list] = {}
    for field, (length, null_count) in zip(fields, nodes):
        if length != n_rows:
            raise ValueError("ragged field node")
        validity = _next_buf()
        if null_count and not validity:
            raise ValueError("nulls declared but no validity buffer")
        if "dict_id" in field:
            if dictionaries is None or field["dict_id"] not in dictionaries:
                raise ValueError(
                    f"dictionary id {field.get('dict_id')} not delivered "
                    "before its record batch"
                )
            dvals = dictionaries[field["dict_id"]]
            data = _next_buf()
            fmt, w = field["index_fmt"], field["index_width"]
            vals = [
                dvals[struct.unpack_from(fmt, data, w * i)[0]]
                if _bit(validity, i)
                else None
                for i in range(length)
            ]
        elif field["kind"] in ("int64", "float64", "timestamp_us"):
            data = _next_buf()
            fmt = "<d" if field["kind"] == "float64" else "<q"
            vals = [
                struct.unpack_from(fmt, data, 8 * i)[0]
                if _bit(validity, i)
                else None
                for i in range(length)
            ]
        else:  # utf8: offsets + data
            offsets = _next_buf()
            data = _next_buf()
            offs = struct.unpack_from(f"<{length + 1}i", offsets, 0)
            vals = [
                data[offs[i] : offs[i + 1]].decode()
                if _bit(validity, i)
                else None
                for i in range(length)
            ]
        if null_count >= 0 and vals.count(None) != null_count:
            raise ValueError("null_count inconsistent with validity")
        out[field["name"]] = vals
    if bi != len(buffers):
        raise ValueError("unconsumed record-batch buffers")
    return out


def _read_message(data: bytes, pos: int) -> tuple[FBTable, bytes, int]:
    """One encapsulated message -> (Message table, body, next pos)."""
    (cont,) = struct.unpack_from("<I", data, pos)
    if cont != 0xFFFFFFFF:
        raise ValueError("missing IPC continuation marker")
    (mlen,) = struct.unpack_from("<i", data, pos + 4)
    meta = data[pos + 8 : pos + 8 + mlen]
    msg = fb_root(meta)
    body_len = msg.scalar(3, "<q")
    body_start = pos + 8 + mlen
    return msg, data[body_start : body_start + body_len], body_start + body_len


def _decode_dictionary_message(
    fields: list[dict], msg: FBTable, body: bytes,
    dictionaries: dict[int, list],
) -> None:
    """One DictionaryBatch message: decode its single-column
    RecordBatch with the owning field's VALUE type and store the
    values under the dictionary id. A DELTA batch (isDelta=true —
    how streaming writers GROW a string vocabulary without resending
    it) APPENDS its values to the id's existing dictionary, which
    must already exist; a repeated non-delta batch REPLACES it (the
    stream spec's replacement semantics)."""
    db = msg.table(2)  # DictionaryBatch
    did = db.scalar(0, "<q")
    owners = [f for f in fields if f.get("dict_id") == did]
    if not owners:
        raise ValueError(f"dictionary batch for unknown id {did}")
    value_field = [{"name": "values", "kind": owners[0]["kind"]}]
    cols = _decode_batch(value_field, db.table(1), body)
    if db.scalar(2, "<b"):  # isDelta
        if did not in dictionaries:
            raise ValueError(
                f"delta dictionary batch for id {did} before its base"
            )
        dictionaries[did] = dictionaries[did] + cols["values"]
    else:
        dictionaries[did] = cols["values"]


def parse_ipc_file(data: bytes) -> tuple[list[dict], list[dict[str, list]]]:
    """Arrow FILE layout -> (schema fields, decoded batches), batches
    located via the seekable Footer blocks (never by scanning);
    Footer.dictionaries blocks are decoded first, so record batches
    resolve their dictionary-encoded columns."""
    if data[:6] != _MAGIC or data[-6:] != _MAGIC:
        raise ValueError("not an Arrow IPC file (ARROW1 magic missing)")
    (flen,) = struct.unpack_from("<i", data, len(data) - 10)
    footer = fb_root(data[len(data) - 10 - flen : len(data) - 10])
    schema_tbl = footer.table(1)  # Footer.schema
    fields = _parse_schema(schema_tbl)
    dictionaries = _decode_file_dictionaries(data, footer, fields)
    # Block struct: {offset: i64, metaDataLength: i32 (+pad), bodyLength: i64}
    blocks = footer.vector_structs(3, "<qiiq", 24)
    batches = []
    for off, _mlen, _pad, _blen in blocks:
        msg, body, _ = _read_message(data, off)
        if msg.scalar(1, "<B") != 3:  # header_type: RecordBatch
            raise ValueError("footer block is not a record batch")
        batches.append(
            _decode_batch(fields, msg.table(2), body, dictionaries)
        )
    return fields, batches


def parse_ipc_stream(
    data: bytes,
    stats: dict | None = None,
) -> tuple[list[dict], list[dict[str, list]], bool]:
    """Arrow STREAMING layout -> (schema fields, decoded batches,
    saw end-of-stream marker). The stream is a plain message
    sequence — Schema first, then DictionaryBatch / RecordBatch
    messages INLINE (no footer, no random access; dictionaries must
    precede the batches that use them), terminated by a 4-byte 0
    (legacy) or a continuation marker with metadata length 0. This
    is the Flight / stdin-pipe / socket shape of the format — a
    reader must process it sequentially, which is why the registered
    query runs it as a single task.

    ``stats``, when given, is filled with dictionary-message
    accounting: n_dict_messages, n_delta_messages, and the final
    per-id dictionary sizes — what the delta-dictionary query pins."""
    pos = 0
    fields: list[dict] | None = None
    dictionaries: dict[int, list] = {}
    batches: list[dict[str, list]] = []
    saw_eos = False
    while pos < len(data):
        (cont,) = struct.unpack_from("<I", data, pos)
        if cont == 0:  # legacy end-of-stream
            saw_eos = True
            pos += 4
            break
        if cont != 0xFFFFFFFF:
            raise ValueError("missing IPC continuation marker")
        (mlen,) = struct.unpack_from("<i", data, pos + 4)
        if mlen == 0:  # end-of-stream marker
            saw_eos = True
            pos += 8
            break
        msg, body, pos = _read_message(data, pos)
        htype = msg.scalar(1, "<B")
        if htype == 1:  # Schema
            if fields is not None:
                raise ValueError("duplicate schema message in stream")
            fields = _parse_schema(msg.table(2))
        elif htype == 2:  # DictionaryBatch
            if fields is None:
                raise ValueError("dictionary batch before schema")
            if stats is not None:
                stats["n_dict_messages"] = (
                    stats.get("n_dict_messages", 0) + 1
                )
                if msg.table(2).scalar(2, "<b"):
                    stats["n_delta_messages"] = (
                        stats.get("n_delta_messages", 0) + 1
                    )
            _decode_dictionary_message(fields, msg, body, dictionaries)
        elif htype == 3:  # RecordBatch
            if fields is None:
                raise ValueError("record batch before schema")
            batches.append(
                _decode_batch(fields, msg.table(2), body, dictionaries)
            )
        else:
            raise NotImplementedError(f"IPC message header type {htype}")
    if fields is None:
        raise ValueError("IPC stream carries no schema message")
    if stats is not None:
        stats["dict_sizes"] = {
            did: len(vals) for did, vals in dictionaries.items()
        }
    return fields, batches, saw_eos


def _decode_file_dictionaries(
    data: bytes, footer: FBTable, fields: list[dict]
) -> dict[int, list]:
    """Footer.dictionaries blocks -> {dict id: values}."""
    dictionaries: dict[int, list] = {}
    for off, _mlen, _pad, _blen in footer.vector_structs(2, "<qiiq", 24):
        msg, body, _ = _read_message(data, off)
        if msg.scalar(1, "<B") != 2:  # header_type: DictionaryBatch
            raise ValueError("dictionary block is not a dictionary batch")
        _decode_dictionary_message(fields, msg, body, dictionaries)
    return dictionaries


# one decode task per footer block; 32 saturates local[32] and is the
# right shape anyway (more, smaller splits) — r12 scale fix after the
# sf1 datapoint showed 8 blocks leaving 3/4 of the cores idle
_IPC_BATCHES = 32


@register(
    "source_arrow_ipc_records",
    oracle=f"""
        SELECT CAST({_IPC_BATCHES} AS INT) AS n_batches,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE o_orderkey % 97 = 0)
                    AS BIGINT) AS n_nulls,
               CAST(sum(CASE WHEN o_orderkey % 97 <> 0
                             THEN o_orderkey END) AS BIGINT)
                   AS sum_key,
               {sql_dsum('o_totalprice')} AS sum_price,
               CAST(sum(length(o_orderpriority)) AS BIGINT)
                   AS sum_prio_chars,
               TRUE AS layout_consistent
        FROM orders
    """,
    tags=("source", "arrow", "ipc", "flatbuffers", "zstd"),
)
def source_arrow_ipc_records(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arrow IPC file read by hand (round 11): orders (int64 with
    nulls on every key ≡ 0 mod 97, double, utf8) written by pyarrow
    as a FILE-layout IPC with {8} record batches and ZSTD body
    compression, then read back through nothing but the hand-built
    flatbuffers walker — Footer blocks (seekable batch access),
    Message/Schema/RecordBatch tables, FieldNode/Buffer structs,
    LSB-first validity bitmaps, utf8 offset buffers — with every
    compressed buffer flowing through the repo's own RFC 8878 zstd
    decoder. One Spark task per Footer block decodes one batch
    (`layout_consistent` pins that declared null counts match the
    validity bitmaps and every buffer was consumed); the oracle
    recomputes all aggregates from the raw table."""
    import pyarrow as pa
    import pyarrow.ipc as pipc

    root = os.path.join(
        scratch_root(), f"shs_ipc_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    path = os.path.join(root, "orders.arrow")
    tbl = (
        t(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 97 == 0, None)
            .otherwise(F.col("o_orderkey")).alias("o_orderkey"),
            "o_totalprice",
            "o_orderpriority",
        )
        .toArrow()
    ).combine_chunks()  # single-chunk slices -> one batch per block
    n = tbl.num_rows
    opts = pipc.IpcWriteOptions(compression="zstd")
    with pipc.new_file(path, tbl.schema, options=opts) as w:
        g = (n + _IPC_BATCHES - 1) // _IPC_BATCHES
        for i in range(_IPC_BATCHES):
            part = tbl.slice(i * g, g)
            w.write_table(part)

    # planning: footer blocks only (driver never decodes bodies)
    with open(path, "rb") as fh:
        data = fh.read()
    (flen,) = struct.unpack_from("<i", data, len(data) - 10)
    footer = fb_root(data[len(data) - 10 - flen : len(data) - 10])
    blocks = footer.vector_structs(3, "<qiiq", 24)
    if len(blocks) != _IPC_BATCHES:
        raise ValueError("unexpected batch count in footer")

    plan = spark.createDataFrame(
        [(path, off) for off, _, _, _ in blocks], "path string, off long"
    ).repartition(_IPC_BATCHES)

    def _decode(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    blob = fh.read()
                # decode ONLY this task's block
                (fl,) = struct.unpack_from("<i", blob, len(blob) - 10)
                ft = fb_root(blob[len(blob) - 10 - fl : len(blob) - 10])
                fields = _parse_schema(ft.table(1))
                msg, body, _ = _read_message(blob, rec.off)
                cols = _decode_batch(fields, msg.table(2), body)
                keys = cols["o_orderkey"]
                prices = cols["o_totalprice"]
                prios = cols["o_orderpriority"]
                yield pd.DataFrame({
                    "rows": [len(keys)],
                    "nulls": [keys.count(None)],
                    "sum_key": [sum(k for k in keys if k is not None)],
                    "cents": [sum(round(p * 100) for p in prices)],
                    "prio_chars": [sum(len(s) for s in prios)],
                })

    partials = plan.mapInPandas(
        _decode,
        "rows long, nulls long, sum_key long, cents long, prio_chars long",
    )
    out = partials.agg(
        F.lit(_IPC_BATCHES).cast("int").alias("n_batches"),
        F.sum("rows").alias("n_rows"),
        F.sum("nulls").alias("n_nulls"),
        F.sum("sum_key").alias("sum_key"),
        (F.sum("cents").cast("decimal(18,0)") / 100)
        .cast("double").alias("sum_price"),
        F.sum("prio_chars").alias("sum_prio_chars"),
        F.lit(True).alias("layout_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_arrow_ipc_dictionary",
    oracle=f"""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue,
               TRUE AS dict_consistent
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("source", "arrow", "ipc", "dictionary", "lz4"),
)
def source_arrow_ipc_dictionary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dictionary-encoded Arrow IPC read by hand (round 12) — the
    wild-feather default for string-heavy files, closing round 11's
    #2 "What's missing" seam: o_orderpriority dictionary-encoded
    (DictionaryBatch delivered via Footer.dictionaries blocks,
    int8/int32 indices resolved per batch) alongside o_totalprice,
    with LZ4_FRAME body compression flowing through the repo's new
    hand-built frame parser (operators/lz4.py: xxHash32-validated
    descriptor, independent/linked blocks, content checksum) — the
    second of the two IPC body codecs after round 11's zstd.

    Revenue grouped BY the dictionary-resolved column is the
    correctness lever: an index-resolution bug reshuffles group
    totals, a frame bug corrupts prices. ``dict_consistent`` pins
    engine-side that the schema really carried a dictionary id for
    the priority field, that a DictionaryBatch block preceded the
    record batches, and that the body codec was LZ4_FRAME (0).

    Scale posture: one task per Footer block (seekable batch
    access), per-batch partial (priority, n, cents) rows combine in
    one final groupBy — the same partial-aggregate shape as the rest
    of the format floor."""
    import pyarrow as pa
    import pyarrow.ipc as pipc

    root = os.path.join(
        scratch_root(), f"shs_ipcd_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    path = os.path.join(root, "orders_dict.arrow")
    tbl = (
        t(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .toArrow()
    ).combine_chunks()
    tbl = tbl.set_column(
        0, "o_orderpriority", tbl["o_orderpriority"].dictionary_encode()
    )
    n = tbl.num_rows
    opts = pipc.IpcWriteOptions(compression="lz4")
    with pipc.new_file(path, tbl.schema, options=opts) as w:
        g = (n + _IPC_BATCHES - 1) // _IPC_BATCHES
        for i in range(_IPC_BATCHES):
            w.write_table(tbl.slice(i * g, g))

    with open(path, "rb") as fh:
        data = fh.read()
    (flen,) = struct.unpack_from("<i", data, len(data) - 10)
    footer = fb_root(data[len(data) - 10 - flen : len(data) - 10])
    blocks = footer.vector_structs(3, "<qiiq", 24)
    n_dict_blocks = footer.vector_len(2)

    plan = spark.createDataFrame(
        [(path, off) for off, _, _, _ in blocks], "path string, off long"
    ).repartition(len(blocks))

    def _decode(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    blob = fh.read()
                (fl,) = struct.unpack_from("<i", blob, len(blob) - 10)
                ft = fb_root(blob[len(blob) - 10 - fl : len(blob) - 10])
                fields = _parse_schema(ft.table(1))
                dicts = _decode_file_dictionaries(blob, ft, fields)
                msg, body, _ = _read_message(blob, rec.off)
                rb = msg.table(2)
                comp = rb.table(3)
                codec = comp.scalar(0, "<b") if comp is not None else None
                cols = _decode_batch(fields, rb, body, dicts)
                agg: dict[str, list] = {}
                for prio, price in zip(
                    cols["o_orderpriority"], cols["o_totalprice"]
                ):
                    cur = agg.setdefault(prio, [0, 0])
                    cur[0] += 1
                    cur[1] += round(price * 100)
                ok = (
                    any("dict_id" in f for f in fields)
                    and len(dicts) >= 1
                    and codec == 0  # LZ4_FRAME
                )
                yield pd.DataFrame({
                    "o_orderpriority": list(agg),
                    "n": [v[0] for v in agg.values()],
                    "cents": [v[1] for v in agg.values()],
                    "ok": [bool(ok)] * len(agg),
                })

    partials = plan.mapInPandas(
        _decode,
        "o_orderpriority string, n long, cents long, ok boolean",
    )
    out = (
        partials.groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("cents").cast("decimal(18,0)") / 100)
            .cast("double").alias("revenue"),
            F.min("ok").alias("dict_consistent"),
        )
        .orderBy("o_orderpriority")
        .localCheckpoint(eager=True)  # 5 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_arrow_ipc_stream",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_customers,
               {sql_dsum('c_acctbal')} AS acctbal_sum,
               TRUE AS stream_consistent
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    tags=("source", "arrow", "ipc", "streaming", "dictionary"),
)
def source_arrow_ipc_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arrow IPC STREAMING layout read by hand (round 12) — the
    footer-less message-sequence shape Flight, socket pipes, and
    `pyarrow.ipc.new_stream` produce: Schema message first, then
    DictionaryBatch messages INLINE before the record batches that
    reference them (no Footer.dictionaries indirection), terminated
    by an end-of-stream marker the reader must actually see (a
    truncated stream is an error, not an EOF). Customer segments are
    dictionary-encoded, bodies ZSTD-compressed — both resolved by the
    same hand-built walkers as the FILE layout.

    Grouped acctbal by the dictionary-resolved segment is the
    correctness lever; ``stream_consistent`` pins that the schema
    message arrived first (the parser enforces it), a dictionary
    message preceded the batches, the EOS marker was consumed, and
    every batch decoded.

    Scale posture: a stream is sequential BY CONSTRUCTION — one task
    walks it end to end (that is the honest cost of the layout; the
    seekable FILE variant `source_arrow_ipc_records` is the fan-out
    path). Customer is the smallest fact table, keeping the
    single-task demonstrator cheap."""
    import pyarrow as pa
    import pyarrow.ipc as pipc

    root = os.path.join(
        scratch_root(), f"shs_ipcs_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    path = os.path.join(root, "customer.arrows")
    tbl = (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_acctbal")
        .toArrow()
    ).combine_chunks()
    tbl = tbl.set_column(
        0, "c_mktsegment", tbl["c_mktsegment"].dictionary_encode()
    )
    opts = pipc.IpcWriteOptions(compression="zstd")
    with pipc.new_stream(path, tbl.schema, options=opts) as w:
        w.write_table(tbl, max_chunksize=max(1, tbl.num_rows // 8))

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    blob = fh.read()
                fields, bats, saw_eos = parse_ipc_stream(blob)
                agg: dict[str, list] = {}
                for b in bats:
                    for seg, bal in zip(b["c_mktsegment"],
                                        b["c_acctbal"]):
                        cur = agg.setdefault(seg, [0, 0])
                        cur[0] += 1
                        cur[1] += round(bal * 100)
                ok = (
                    saw_eos
                    and len(bats) >= 2
                    and any("dict_id" in f for f in fields)
                )
                yield pd.DataFrame({
                    "c_mktsegment": list(agg),
                    "n": [v[0] for v in agg.values()],
                    "cents": [v[1] for v in agg.values()],
                    "ok": [bool(ok)] * len(agg),
                })

    partials = plan.mapInPandas(
        _decode, "c_mktsegment string, n long, cents long, ok boolean"
    )
    out = (
        partials.groupBy("c_mktsegment")
        .agg(
            F.sum("n").alias("n_customers"),
            (F.sum("cents").cast("decimal(18,0)") / 100)
            .cast("double").alias("acctbal_sum"),
            F.min("ok").alias("stream_consistent"),
        )
        .orderBy("c_mktsegment")
        .localCheckpoint(eager=True)  # 5 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_arrow_ipc_delta_dictionary",
    oracle=f"""
        SELECT concat('w', c_custkey % 50) AS cat,
               CAST(count(*) AS BIGINT) AS n_rows,
               {sql_dsum('c_acctbal')} AS acctbal_sum,
               TRUE AS delta_consistent
        FROM customer
        GROUP BY cat
        ORDER BY cat
    """,
    tags=("source", "arrow", "ipc", "streaming", "dictionary",
          "delta"),
)
def source_arrow_ipc_delta_dictionary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Arrow IPC DELTA dictionaries read by hand (round 13, the r12
    verdict's seam 2): ``isDelta=true`` DictionaryBatch messages are
    how streaming writers GROW a string vocabulary without resending
    it — each delta APPENDS to the id's accumulated dictionary, and
    later record batches index into the concatenation, so an
    append-order or offset bug scrambles every category decoded
    after the first delta.

    Fixture: customer keyed into 50 categories. Four key-range
    batches each extend a SHARED prefix dictionary (13 new entries
    per delta, 11 on the last — pyarrow emits true deltas only for
    prefix extensions;
    anything else falls back to replacement, which
    `test_arrow_ipc.py` pins separately), then a fifth batch whose
    rows span ALL ranges — its indices reach across every delta
    region while introducing nothing new (no fifth message). The
    stream is ZSTD-compressed through the hand-built RFC 8878
    decoder.

    ``delta_consistent`` pins the exact message accounting the
    fixture must produce — 4 dictionary messages of which 3 are
    deltas, one dictionary id whose final size is 50, 5 record
    batches, EOS consumed — so a fixture regression to replacement
    emission (or a reader that silently re-bases) flips the driver
    row. The grouped acctbal oracle recomputes the data itself.

    Scale posture: a stream is sequential by construction — one task
    walks it (the FILE layout is the fan-out path); customer is the
    smallest fact table."""
    import pyarrow as pa
    import pyarrow.ipc as pipc

    root = os.path.join(
        scratch_root(), f"shs_ipcdd_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    path = os.path.join(root, "customer_delta.arrows")
    src = (
        t(spark, sf_dir, "customer")
        .select(
            (F.col("c_custkey") % 50).cast("int").alias("key"),
            (F.col("c_custkey") % 7 == 0).alias("spanner"),
            F.round(F.col("c_acctbal") * 100).cast("long")
            .alias("cents"),
        )
        .toArrow()
    )
    keys = src["key"].to_pylist()
    spanner = src["spanner"].to_pylist()
    cents = src["cents"].to_pylist()
    vocab = [f"w{i}" for i in range(50)]
    schema = pa.schema([
        ("cat", pa.dictionary(pa.int32(), pa.string())),
        ("cents", pa.int64()),
    ])

    def _mk(rows: list[tuple[int, int]], upto: int) -> pa.RecordBatch:
        d = pa.array(vocab[:upto])
        arr = pa.DictionaryArray.from_arrays(
            pa.array([k for k, _c in rows], pa.int32()), d
        )
        return pa.record_batch(
            [arr, pa.array([c for _k, c in rows], pa.int64())],
            schema=schema,
        )

    batches = []
    for b in range(4):
        rows = [(k, c) for k, s, c in zip(keys, spanner, cents)
                if not s and k // 13 == b]
        batches.append(_mk(rows, min(13 * (b + 1), 50)))
    batches.append(_mk(
        [(k, c) for k, s, c in zip(keys, spanner, cents) if s], 50
    ))
    opts = pipc.IpcWriteOptions(
        emit_dictionary_deltas=True, compression="zstd"
    )
    with pipc.new_stream(path, schema, options=opts) as w:
        for b in batches:
            w.write_batch(b)

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(pdfs) -> Iterator:
        import pandas as pd

        for pdf in pdfs:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    blob = fh.read()
                stats: dict = {}
                fields, bats, saw_eos = parse_ipc_stream(blob, stats)
                agg: dict[str, list] = {}
                for b in bats:
                    for cat, cv in zip(b["cat"], b["cents"]):
                        cur = agg.setdefault(cat, [0, 0])
                        cur[0] += 1
                        cur[1] += cv
                sizes = stats.get("dict_sizes", {})
                ok = (
                    saw_eos
                    and len(bats) == 5
                    and stats.get("n_dict_messages") == 4
                    and stats.get("n_delta_messages") == 3
                    and list(sizes.values()) == [50]
                )
                yield pd.DataFrame({
                    "cat": list(agg),
                    "n": [v[0] for v in agg.values()],
                    "cents": [v[1] for v in agg.values()],
                    "ok": [bool(ok)] * len(agg),
                })

    partials = plan.mapInPandas(
        _decode, "cat string, n long, cents long, ok boolean"
    )
    out = (
        partials.groupBy("cat")
        .agg(
            F.sum("n").alias("n_rows"),
            (F.sum("cents").cast("decimal(18,0)") / 100)
            .cast("double").alias("acctbal_sum"),
            F.min("ok").alias("delta_consistent"),
        )
        .orderBy("cat")
        .localCheckpoint(eager=True)  # 50 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out
