"""Iceberg v3 DELETION VECTORS in PUFFIN files, read and written
WITHOUT any Iceberg library (round 14, the r13 verdict's seam 1 /
task 2) — the v3 answer to `source_iceberg_position_deletes`' v2
position-delete files: a v3 DELETE commits one roaring bitmap per
referenced data file into a Puffin sidecar, and the manifest entry
addresses the blob directly (``referenced_data_file``,
``content_offset``, ``content_size_in_bytes``), so readers apply
deletes without scanning a position-delete table.

Hand-built layers, all from the two public specs:

- **Puffin file format** (iceberg.apache.org/puffin-spec): magic
  ``PFA1`` at file start and footer start; blobs concatenated; the
  footer is ``Magic | FooterPayload (UTF-8 JSON FileMetadata) |
  FooterPayloadSize (u32 LE) | Flags (4 bytes; byte 0 bit 0 =
  payload LZ4-compressed — rejected loudly here) | Magic``.
  FileMetadata: ``{"blobs": [{type, fields, snapshot-id,
  sequence-number, offset, length, properties}, ...]}``.
- **deletion-vector-v1 blob** (iceberg spec v3): ``u32 BE combined
  length of magic+vector | magic D1 D3 39 64 | vector | u32 BE
  CRC-32 of magic+vector``; the vector is the STANDARD portable
  64-bit roaring serialization (`roaring64_portable_serialize` in
  sources/delta_dv.py — sparse keyed buckets, unlike Delta's
  contiguous keyless RoaringBitmapArray). The magic bytes are
  Delta's RBA magic 1681511377 in byte order — the v3 spec chose
  them for cross-format compatibility. Blob properties carry
  ``referenced-data-file`` and ``cardinality``; both are
  cross-checked against the manifest entry and the decoded bitmap,
  and every mismatch is loud.

Scale posture: identical to the v2 position-delete path — a DV is
O(deleted positions) planning-side metadata decoded once per file;
masking is a broadcast anti-join against ``_metadata.row_index``
(the format's design assumption: deletes ≪ data). Nothing
driver-side grows with table rows.

Reference parity: the reference reads static inputs
(CollegeScorecard.scala:35-157); lakehouse compat is north-star
surface per SURVEY.md §2B.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import tempfile
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.sources.delta_dv import (
    roaring64_portable_deserialize,
    roaring64_portable_serialize,
)
from spark_hive_spark.sources.staging import stage_single_parquet
from spark_hive_spark.tables import t

_PUFFIN_MAGIC = b"PFA1"
_DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])  # == Delta RBA magic, LE


def dv_blob_encode(positions: list[int]) -> bytes:
    """Row positions -> a framed deletion-vector-v1 blob payload."""
    vec = roaring64_portable_serialize(positions)
    body = _DV_MAGIC + vec
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body))
    )


def dv_blob_decode(blob: bytes) -> list[int]:
    """Framed blob bytes -> row positions, every integrity field
    validated loudly (length prefix, magic, CRC, trailing bytes)."""
    if len(blob) < 12:
        raise ValueError("deletion-vector blob shorter than framing")
    (body_len,) = struct.unpack_from(">I", blob, 0)
    if 4 + body_len + 4 != len(blob):
        raise ValueError(
            f"DV blob length prefix {body_len} disagrees with "
            f"blob size {len(blob)}"
        )
    body = blob[4 : 4 + body_len]
    if body[:4] != _DV_MAGIC:
        raise ValueError(f"bad DV magic {body[:4].hex()}")
    (want_crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    if zlib.crc32(body) != want_crc:
        raise ValueError("DV blob CRC-32 mismatch")
    return roaring64_portable_deserialize(body[4:])


def puffin_write(
    path: str,
    blobs: list[tuple[bytes, dict]],
    compress_footer: bool = False,
) -> list[dict]:
    """Write a Puffin file; ``blobs`` pairs payload bytes with extra
    BlobMetadata fields (type/properties/...). Returns the footer's
    blob metadata list (with offset/length filled in).
    ``compress_footer`` sets flags byte 0 bit 0 and LZ4-frames the
    FooterPayload (round 15 — the spec's only footer codec, 'single
    compression frame with content size present')."""
    from spark_hive_spark.operators.lz4 import lz4_frame_compress

    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(_PUFFIN_MAGIC)
        off = 4
        for payload, meta in blobs:
            m = dict(meta)
            m["offset"] = off
            m["length"] = len(payload)
            metas.append(m)
            fh.write(payload)
            off += len(payload)
        footer_payload = json.dumps({"blobs": metas}).encode("utf-8")
        if compress_footer:
            footer_payload = lz4_frame_compress(footer_payload)
        fh.write(_PUFFIN_MAGIC)
        fh.write(footer_payload)
        fh.write(struct.pack("<I", len(footer_payload)))
        fh.write(bytes([1 if compress_footer else 0, 0, 0, 0]))
        fh.write(_PUFFIN_MAGIC)
    return metas


def puffin_read(path: str) -> tuple[bytes, list[dict]]:
    """Puffin file -> (raw file bytes, footer blob metadata list),
    with both magics, the flags, and the payload framing validated.
    Flags byte 0 bit 0 (LZ4-compressed FooterPayload) is decoded via
    the repo's own LZ4 frame codec (round 15); all other flag bits
    stay loud (the spec reserves them)."""
    from spark_hive_spark.operators.lz4 import lz4_frame_decompress

    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != _PUFFIN_MAGIC or data[-4:] != _PUFFIN_MAGIC:
        raise ValueError("not a Puffin file (magic)")
    (payload_len,) = struct.unpack_from("<I", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    if any(flags) and flags != b"\x01\x00\x00\x00":
        raise NotImplementedError(f"Puffin footer flags {flags.hex()}")
    payload_start = len(data) - 12 - payload_len
    if data[payload_start - 4 : payload_start] != _PUFFIN_MAGIC:
        raise ValueError("Puffin footer start magic missing")
    payload = data[payload_start : payload_start + payload_len]
    if flags[0] & 1:
        payload = lz4_frame_decompress(payload)
    meta = json.loads(payload)
    return data, meta["blobs"]


@register(
    "source_iceberg_v3_deletion_vectors",
    oracle=f"""
        WITH doomed AS (
            SELECT o_orderkey FROM orders
            WHERE (o_orderkey % 2 = 0 AND o_orderkey % 10 = 4)
               OR (o_orderkey % 2 = 1 AND o_orderkey % 7 = 3)
        )
        SELECT CAST(2 AS INT) AS data_files,
               CAST(2 AS INT) AS dv_blobs,
               (SELECT CAST(count(*) AS BIGINT) FROM doomed)
                   AS rows_deleted,
               TRUE AS dv_integrity_ok,
               CAST(count(*) AS BIGINT) AS n_live,
               {sql_dsum('o_totalprice')} AS revenue_live
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM doomed)
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "deletion-vectors",
          "puffin", "merge-on-read"),
)
def source_iceberg_v3_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg FORMAT-VERSION 3 deletion vectors (round 14): both
    DVs for the table live as ``deletion-vector-v1`` blobs in ONE
    hand-built Puffin sidecar, and the delete manifest entry
    addresses each blob directly (``referenced_data_file`` +
    ``content_offset`` + ``content_size_in_bytes``), which the
    reader cross-validates against the Puffin footer's own blob
    directory — either side lying about offset, length, referenced
    file, or cardinality is loud, as are CRC/magic/framing errors
    (module docstring has the byte layout).

    Snapshot 1 adds two data files; snapshot 2 deletes o_orderkey
    %10==4 rows from file A and %7==3 rows from file B via one
    Puffin file. The v2 `source_iceberg_position_deletes` recipe
    carries over unchanged downstream of blob decode: scan with
    ``_metadata.row_index``, LEFT ANTI against the broadcast
    positions. `iceberg_format_gate` (sources/evolution.py) accepts
    the v3 metadata here with ``deletion-vectors`` declared
    supported, while row-lineage and schema default values — the
    other v3 features — stay loud by name.

    Scale posture: DV decode is O(deleted positions) at planning;
    the anti-join broadcasts the delete set; data files scan
    partition-parallel with positions generated scan-side."""
    return _dv_query(spark, sf_dir, compress_footer=False)


@register(
    "source_iceberg_v3_dv_lz4_footer",
    oracle=f"""
        WITH doomed AS (
            SELECT o_orderkey FROM orders
            WHERE (o_orderkey % 2 = 0 AND o_orderkey % 10 = 4)
               OR (o_orderkey % 2 = 1 AND o_orderkey % 7 = 3)
        )
        SELECT CAST(2 AS INT) AS data_files,
               CAST(2 AS INT) AS dv_blobs,
               (SELECT CAST(count(*) AS BIGINT) FROM doomed)
                   AS rows_deleted,
               TRUE AS dv_integrity_ok,
               CAST(count(*) AS BIGINT) AS n_live,
               {sql_dsum('o_totalprice')} AS revenue_live
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM doomed)
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "deletion-vectors",
          "puffin", "lz4", "merge-on-read"),
)
def source_iceberg_v3_dv_lz4_footer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Puffin LZ4-COMPRESSED FooterPayload (round 15, the r14
    verdict's task 7 — previously a loud seam): same DV pipeline as
    `source_iceberg_v3_deletion_vectors`, but the Puffin footer's
    FileMetadata JSON is wrapped in a single LZ4 frame (flags byte 0
    bit 0 set), the spec's only footer codec, written and read by
    the repo's own hand-built LZ4 frame codec (operators/lz4.py —
    xxh32 header/content checksums validated on read). A reader
    that ignores the flag feeds LZ4 bytes to the JSON parser; a
    writer that lies about the flag trips the frame magic check —
    both are loud, and the identical oracle pins the decode path end
    to end."""
    return _dv_query(spark, sf_dir, compress_footer=True)


def _dv_query(
    spark: SparkSession, sf_dir: str, compress_footer: bool
) -> DataFrame:
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import iceberg_format_gate

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(), f"shs_icev3dv_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    k = F.col("o_orderkey") % 2
    stage_single_parquet(orders.filter(k == 0), root, ddir, "A.parquet")
    stage_single_parquet(orders.filter(k == 1), root, ddir, "B.parquet")

    # the DV WRITER: positions come from each data file itself
    def _positions(fname: str, mod: int, rem: int) -> list[int]:
        rows = (
            spark.read.parquet(os.path.join(ddir, fname))
            .select(F.col("_metadata.row_index").alias("pos"))
            .filter(F.col("o_orderkey") % mod == rem)
            .collect()
        )
        return sorted(r["pos"] for r in rows)

    pos_a = _positions("A.parquet", 10, 4)
    pos_b = _positions("B.parquet", 7, 3)
    puffin_path = os.path.join(ddir, "deletes.puffin")
    blob_meta = puffin_write(puffin_path, compress_footer=compress_footer, blobs=[
        (dv_blob_encode(pos_a), {
            "type": "deletion-vector-v1", "fields": [2147483546],
            "snapshot-id": 2, "sequence-number": 2,
            "properties": {"referenced-data-file": "A.parquet",
                           "cardinality": str(len(pos_a))},
        }),
        (dv_blob_encode(pos_b), {
            "type": "deletion-vector-v1", "fields": [2147483546],
            "snapshot-id": 2, "sequence-number": 2,
            "properties": {"referenced-data-file": "B.parquet",
                           "cardinality": str(len(pos_b))},
        }),
    ])

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},  # 1=ADDED
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "referenced_data_file",
             "type": ["null", "string"]},
            {"name": "content_offset", "type": ["null", "long"]},
            {"name": "content_size_in_bytes",
             "type": ["null", "long"]},
        ],
    }
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "content", "type": "long"},  # 0=data 1=deletes
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }

    def _manifest(name: str, entries: list[dict]) -> str:
        path = os.path.join(mdir, name)
        with open(path, "wb") as fh:
            fh.write(
                encode_avro_ocf(entries, entry_schema, codec="deflate")
            )
        return path

    def _none_dv(d: dict) -> dict:
        return {"referenced_data_file": None, "content_offset": None,
                "content_size_in_bytes": None, **d}

    m_data = _manifest("m-data.avro", [
        _none_dv({"status": 1, "file_path": "A.parquet",
                  "file_format": "PARQUET"}),
        _none_dv({"status": 1, "file_path": "B.parquet",
                  "file_format": "PARQUET"}),
    ])
    m_del = _manifest("m-del.avro", [
        {"status": 1, "file_path": "deletes.puffin",
         "file_format": "PUFFIN",
         "referenced_data_file": bm["properties"]
             ["referenced-data-file"],
         "content_offset": bm["offset"],
         "content_size_in_bytes": bm["length"]}
        for bm in blob_meta
    ])

    def _manifest_list(name: str, rows: list[dict]) -> str:
        path = os.path.join(mdir, name)
        with open(path, "wb") as fh:
            fh.write(encode_avro_ocf(rows, mlist_schema, codec="snappy"))
        return path

    ml1 = _manifest_list("snap-1.avro", [
        {"manifest_path": m_data, "content": 0, "added_snapshot_id": 1},
    ])
    ml2 = _manifest_list("snap-2.avro", [
        {"manifest_path": m_data, "content": 0, "added_snapshot_id": 1},
        {"manifest_path": m_del, "content": 1, "added_snapshot_id": 2},
    ])
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 3,
            "current-snapshot-id": 2,
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": ml1},
                {"snapshot-id": 2, "manifest-list": ml2},
            ],
        }, fh)

    # ---- the reader: metadata tree -> Puffin DVs -> anti-join ----
    with open(os.path.join(mdir, "v3.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md, supported=frozenset({"deletion-vectors"}))
    current = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifest_rows = parse_avro_ocf(fh.read())
    data_files: set[str] = set()
    dv_entries: list[dict] = []
    for mrow in manifest_rows:
        with open(mrow["manifest_path"], "rb") as fh:
            _, entries = parse_avro_ocf(fh.read())
        for e in entries:
            if e["status"] != 1:
                raise ValueError(f"unexpected status {e['status']}")
            if mrow["content"] == 0:
                data_files.add(e["file_path"])
            elif e["file_format"] == "PUFFIN":
                if e["referenced_data_file"] is None:
                    raise ValueError(
                        "DV manifest entry lacks referenced_data_file"
                    )
                dv_entries.append(e)
            else:
                raise NotImplementedError(
                    f"v3 delete file format {e['file_format']}"
                )

    # decode each DV, cross-validating manifest addressing against
    # the Puffin footer's own directory
    deletes: list[tuple[str, int]] = []
    integrity_ok = True
    puffin_cache: dict[str, tuple[bytes, list[dict]]] = {}
    for e in dv_entries:
        ppath = os.path.join(ddir, e["file_path"])
        if ppath not in puffin_cache:
            puffin_cache[ppath] = puffin_read(ppath)
        raw, blobs = puffin_cache[ppath]
        bm = next(
            (b for b in blobs if b["offset"] == e["content_offset"]),
            None,
        )
        if bm is None:
            raise ValueError(
                f"no Puffin blob at manifest offset "
                f"{e['content_offset']}"
            )
        if bm["type"] != "deletion-vector-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        integrity_ok &= (
            bm["length"] == e["content_size_in_bytes"]
            and bm["properties"]["referenced-data-file"]
                == e["referenced_data_file"]
        )
        blob = raw[bm["offset"] : bm["offset"] + bm["length"]]
        positions = dv_blob_decode(blob)
        integrity_ok &= (
            int(bm["properties"]["cardinality"]) == len(positions)
        )
        deletes += [
            (e["referenced_data_file"], p) for p in positions
        ]

    data = spark.read.parquet(
        *(os.path.join(ddir, p) for p in sorted(data_files))
    ).select(
        "o_orderkey",
        "o_totalprice",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("fname"),
        F.col("_metadata.row_index").alias("pos"),
    )
    dels = spark.createDataFrame(
        deletes, "file_path string, pos bigint"
    )
    survivors = data.join(
        F.broadcast(dels),
        (data["fname"] == dels["file_path"]) & (data["pos"] == dels["pos"]),
        "left_anti",
    )
    out = survivors.agg(
        F.lit(len(data_files)).cast("int").alias("data_files"),
        F.lit(len(dv_entries)).cast("int").alias("dv_blobs"),
        F.lit(len(deletes)).cast("bigint").alias("rows_deleted"),
        F.lit(bool(integrity_ok)).alias("dv_integrity_ok"),
        F.count("*").alias("n_live"),
        dsum("o_totalprice").alias("revenue_live"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
