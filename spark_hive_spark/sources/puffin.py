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
from spark_hive_spark.scratch import scratch_root
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
        scratch_root(), f"shs_icev3dv_{uuid.uuid4().hex}"
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


# ---------------------------------------------------------------------------
# apache-datasketches-theta-v1 NDV sketches (round 18, r17 verdict
# item 3) — the stats blob Iceberg CBO reads. Public layers:
#
# - **Iceberg Puffin spec, blob type `apache-datasketches-theta-v1`**:
#   "a serialized form of a 'compact' Theta sketch produced by the
#   Apache DataSketches library", fed with values converted by
#   Iceberg's single-value serialization (long -> 8-byte
#   little-endian), required blob property ``ndv`` = the estimate.
# - **DataSketches compact-theta serial format v3**
#   (datasketches.apache.org, Theta sketch format): long 0 =
#   [preLongs | serVer=3 | famID=3 (COMPACT) | lgNomLongs | lgArrLongs
#   | flags | seedHash u16]; long 1 (preLongs>=2) = curCount u32 LE;
#   long 2 (preLongs==3, estimation mode) = thetaLong u64 LE; then
#   curCount retained hash longs, ascending when the ORDERED flag is
#   set. Flags: bit1 READ_ONLY, bit2 EMPTY, bit3 COMPACT, bit4
#   ORDERED. Hash function: MurmurHash3 x64_128 with the library
#   default seed 9001; the sketch keeps ``hash[0] >>> 1`` (63-bit,
#   zero excluded) for values below theta.
#
# The WRITER here picks theta KMV-style (theta = the (k+1)-th
# smallest hash, retaining the k below it) — a valid theta-choosing
# rule in the theta-sketch framework whose estimator
# curCount / (theta / 2^63) is the classic unbiased (K-1)/ζ(K) KMV
# estimate; the READER decodes any conforming compact image (empty /
# exact / estimation preambles).
# ---------------------------------------------------------------------------

_THETA_SEED = 9001  # DataSketches DEFAULT_UPDATE_SEED
_THETA_MAX = 1 << 63
_F_READONLY, _F_EMPTY, _F_COMPACT, _F_ORDERED = 0x02, 0x04, 0x08, 0x10


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Full MurmurHash3 x64_128 (both lanes) — the DataSketches hash
    (its MurmurHash3.java is the reference x64_128 with long-seed
    support; distinct from ORC's single-lane hash64 variant in
    orc_meta.py)."""
    mask = (1 << 64) - 1
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(v: int, n: int) -> int:
        return ((v << n) | (v >> (64 - n))) & mask

    def fmix(h: int) -> int:
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) & mask
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) & mask
        return h ^ (h >> 33)

    h1 = h2 = seed & mask
    nblocks = len(data) >> 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (rotl((k1 * c1) & mask, 31) * c2) & mask
        h1 ^= k1
        h1 = ((rotl(h1, 27) + h2) * 5 + 0x52DCE729) & mask
        k2 = (rotl((k2 * c2) & mask, 33) * c1) & mask
        h2 ^= k2
        h2 = ((rotl(h2, 31) + h1) * 5 + 0x38495AB5) & mask
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        for j in range(len(tail) - 1, 7, -1):
            k2 = (k2 << 8) | tail[j]
        k2 = (rotl((k2 * c2) & mask, 33) * c1) & mask
        h2 ^= k2
    if tail:
        for j in range(min(len(tail), 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[j]
        k1 = (rotl((k1 * c1) & mask, 31) * c2) & mask
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = (h1 + h2) & mask
    h2 = (h2 + h1) & mask
    return h1, h2


def theta_hash_long(v: int, seed: int = _THETA_SEED) -> int:
    """A long value -> its 63-bit theta hash: Iceberg single-value
    serialization (8-byte LE) through MurmurHash3 x64_128, first
    lane, unsigned-shifted right by one (zero is excluded by the
    update rule, matching DataSketches)."""
    h1, _ = murmur3_x64_128(
        (v & ((1 << 64) - 1)).to_bytes(8, "little"), seed
    )
    return h1 >> 1


def theta_hash_longs_np(values, seed: int = _THETA_SEED):
    """Vectorized `theta_hash_long` over a numpy int64/uint64 array —
    the 8-byte-LE MurmurHash3 x64_128 path specialized (nblocks=0,
    tail=8: k2 never mixes and h2 only feeds h1 through the final
    adds), all in wrapping uint64 numpy ops. Pinned element-wise
    against the scalar path in tests; this is what lets the sketch
    build hash millions of values per second inside mapInPandas
    instead of ~30 µs/value in the Python loop."""
    import numpy as np

    mask64 = np.uint64(0xFFFFFFFFFFFFFFFF)
    v = np.asarray(values).astype(np.uint64) & mask64
    c1 = np.uint64(0x87C37B91114253D5)
    c2 = np.uint64(0x4CF5AD432745937F)

    def rotl31(x):
        return (x << np.uint64(31)) | (x >> np.uint64(33))

    def fmix(h):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        return h ^ (h >> np.uint64(33))

    k1 = rotl31(v * c1) * c2
    h1 = np.uint64(seed) ^ k1
    h2 = np.full_like(h1, np.uint64(seed))
    eight = np.uint64(8)
    h1 = h1 ^ eight
    h2 = h2 ^ eight
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = fmix(h1)
    h2 = fmix(h2)
    h1 = h1 + h2
    return h1 >> np.uint64(1)


def theta_hash_bytes(data: bytes, seed: int = _THETA_SEED) -> int:
    """A byte string -> its 63-bit theta hash — the STRING path of
    Iceberg single-value serialization (UTF-8 bytes, no length
    prefix; datasketches update(String) hashes the same UTF-8
    form)."""
    h1, _ = murmur3_x64_128(data, seed)
    return h1 >> 1


def _theta_seed_hash(seed: int) -> int:
    """DataSketches computeSeedHash: murmur the seed itself (as one
    long), low 16 bits, zero is loud (the library reserves it)."""
    h1, _ = murmur3_x64_128(seed.to_bytes(8, "little"), 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError(f"theta seed {seed} hashes to the reserved 0")
    return sh


def theta_sketch_serialize(
    hashes: list[int], theta: int = _THETA_MAX,
    seed: int = _THETA_SEED,
) -> bytes:
    """Retained 63-bit hashes (+ theta) -> a compact-ordered theta
    sketch image (serial format v3), byte-identical to
    DataSketches' CompactSketch.toByteArray for the same retained
    set (verified against datasketches-java 6.2 via py4j: compact
    images ZERO the lgNomLongs/lgArrLongs bytes and long 1 carries
    curCount u32 + sampling probability p as float 1.0). ``theta ==
    2^63`` serializes the exact-mode 2-preamble-long form; empty
    serializes the 1-long form with the EMPTY flag."""
    hs = sorted(hashes)
    if any(h <= 0 or h >= theta for h in hs):
        raise ValueError("retained hash outside (0, theta)")
    if len(set(hs)) != len(hs):
        raise ValueError("duplicate retained hash")
    est_mode = theta != _THETA_MAX
    pre_longs = 1 if not hs and not est_mode else (3 if est_mode else 2)
    flags = _F_READONLY | _F_COMPACT | _F_ORDERED
    if not hs and not est_mode:
        flags |= _F_EMPTY
    out = bytearray()
    out += bytes([pre_longs, 3, 3, 0, 0, flags])
    out += struct.pack("<H", _theta_seed_hash(seed))
    if pre_longs >= 2:
        out += struct.pack("<If", len(hs), 1.0)
    if pre_longs == 3:
        out += struct.pack("<Q", theta)
    for h in hs:
        out += struct.pack("<Q", h)
    return bytes(out)


def theta_sketch_deserialize(
    blob: bytes, seed: int = _THETA_SEED
) -> tuple[list[int], int]:
    """Compact theta sketch image -> (retained hashes, theta), every
    preamble field validated loudly (serial version, family, flags,
    seed hash, length arithmetic, hash ordering/range)."""
    if len(blob) < 8:
        raise ValueError("theta sketch shorter than one preamble long")
    pre_longs, ser_ver, fam = blob[0], blob[1], blob[2]
    if ser_ver != 3:
        raise NotImplementedError(f"theta serial version {ser_ver}")
    if fam != 3:
        raise NotImplementedError(
            f"sketch family {fam} (only 3 = COMPACT theta)"
        )
    flags = blob[5]
    if not (flags & _F_COMPACT) or not (flags & _F_READONLY):
        raise NotImplementedError(
            f"non-compact theta image (flags {flags:#x})"
        )
    (seed_hash,) = struct.unpack_from("<H", blob, 6)
    if seed_hash != _theta_seed_hash(seed):
        raise ValueError(
            f"seed hash {seed_hash:#x} != expected "
            f"{_theta_seed_hash(seed):#x} (sketch built with a "
            "different seed)"
        )
    if flags & _F_EMPTY:
        if pre_longs != 1:
            raise ValueError(f"empty sketch with preLongs {pre_longs}")
        return [], _THETA_MAX
    if pre_longs == 2:
        theta = _THETA_MAX
    elif pre_longs == 3:
        (theta,) = struct.unpack_from("<Q", blob, 16)
        if not (0 < theta <= _THETA_MAX):
            raise ValueError(f"theta {theta} out of range")
    else:
        raise NotImplementedError(f"theta preLongs {pre_longs}")
    (cur_count,) = struct.unpack_from("<I", blob, 8)
    start = pre_longs * 8
    if len(blob) != start + 8 * cur_count:
        raise ValueError(
            f"sketch length {len(blob)} != preamble {start} + "
            f"{cur_count} hash longs"
        )
    hashes = list(
        struct.unpack_from(f"<{cur_count}Q", blob, start)
    ) if cur_count else []
    prev = 0
    for h in hashes:
        if not (prev < h < theta):
            raise ValueError(
                "retained hashes must be ascending in (0, theta)"
            )
        prev = h
    return hashes, theta


def theta_estimate(hashes: list[int], theta: int) -> float:
    """The theta estimator: curCount / (theta / 2^63); exact when
    theta is at its maximum."""
    if theta == _THETA_MAX:
        return float(len(hashes))
    return len(hashes) * float(_THETA_MAX) / theta


def theta_sketch_build(
    spark: SparkSession, vals, k: int = 256,
    value_type: str = "long",
) -> bytes:
    """Distributed theta-sketch build over a one-column DataFrame of
    longs: distinct (the format hashes dedup anyway, but distinct
    shrinks the Python hashing work), MurmurHash3 per Arrow batch in
    ``mapInPandas`` (the only Python-side step — O(distinct values),
    parallel across partitions), then a distributed top-(k+1)
    (TakeOrderedAndProject — each partition contributes at most k+1
    rows to the driver). KMV theta choice: the (k+1)-th smallest
    hash; at or below k distinct the sketch is exact. At 100 TB this
    is the standard stats-collection pass: one shuffle for distinct,
    one bounded top-k — nothing driver-side grows with table rows.
    ``value_type`` picks the Iceberg single-value serialization:
    "long" (8-byte LE, numpy-vectorized hash) or "string" (UTF-8
    bytes, per-row hash over the already-distinct values)."""
    col = vals.columns[0]

    def _hash_batches(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            col_vals = pdf[col].dropna()
            if value_type == "long":
                hs = theta_hash_longs_np(col_vals.to_numpy())
                hs = hs[hs != 0].astype(_np.int64)  # 63-bit sign-safe
            elif value_type == "string":
                # datasketches update(String) ignores null AND empty
                hs = _np.array(
                    [theta_hash_bytes(v.encode("utf-8"))
                     for v in col_vals if v],
                    dtype=_np.int64,
                )
                hs = hs[hs != 0]
            else:
                raise NotImplementedError(
                    f"theta single-value type {value_type!r}"
                )
            yield _pd.DataFrame({"h": hs})

    hashed = (
        vals.distinct()
        .mapInPandas(_hash_batches, "h bigint")
        # dedupe HASHES too (r18 advice): a 63-bit murmur collision
        # between distinct values must collapse to one retained
        # hash, matching theta_sketch_build_grouped
        .distinct()
    )
    smallest = [r["h"] for r in hashed.orderBy("h").limit(k + 1).collect()]
    if len(smallest) <= k:
        return theta_sketch_serialize(smallest, _THETA_MAX)
    return theta_sketch_serialize(smallest[:k], smallest[k])


@register(
    "source_puffin_theta_ndv",
    oracle="""
        WITH dl AS (
            SELECT count(DISTINCT l_orderkey) AS v FROM lineitem
        ),
        do_ AS (
            SELECT count(DISTINCT o_orderkey) AS v FROM orders
        ),
        actual AS (
            SELECT count(*) AS v
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT CAST((SELECT v FROM dl) AS BIGINT) AS exact_ndv_lineitem,
               CAST((SELECT v FROM do_) AS BIGINT) AS exact_ndv_orders,
               CAST(2 AS INT) AS sketch_blobs,
               CASE WHEN (SELECT v FROM dl) > 256
                    THEN 'estimation' ELSE 'exact' END
                   AS sketch_mode_lineitem,
               CASE WHEN (SELECT v FROM do_) > 256
                    THEN 'estimation' ELSE 'exact' END
                   AS sketch_mode_orders,
               TRUE AS ndv_within_20pct,
               TRUE AS cbo_estimate_within_20pct,
               TRUE AS roundtrip_ok,
               CAST((SELECT v FROM actual) AS BIGINT) AS actual_join_rows
    """,
    tags=("source", "iceberg", "puffin", "theta-sketch", "ndv",
          "cbo", "stats", "audit"),
)
def source_puffin_theta_ndv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Puffin `apache-datasketches-theta-v1` NDV sketches feeding the
    CBO (round 18, r17 verdict item 3) — the stats blob Iceberg's
    cost-based optimizer reads. The repo WRITES compact theta
    sketches for `lineitem.l_orderkey` and `orders.o_orderkey` (the
    distributed build in `theta_sketch_build`: hash per Arrow batch,
    distributed top-k), stores both in ONE Puffin file with the
    spec-required ``ndv`` property, RE-READS them through
    `puffin_read`, and feeds the decoded estimates into the
    `join_cardinality_estimation_audit` shape — the uniform
    join-size formula |L|·|R| / max(d_L, d_R) now uses SKETCH NDVs
    where that audit used exact pre-counts.

    Exactness bracket (every approximate number rides a hash-checked
    verdict): `exact_ndv_*` and `actual_join_rows` recompute exactly
    in both engines; `ndv_within_20pct` pins both sketch estimates
    within 20% of exact (k=256 -> RSE ~1/√256 ≈ 6.3%, and the
    hash-defined candidate set makes the estimate DETERMINISTIC per
    dataset); `cbo_estimate_within_20pct` pins that the
    sketch-driven uniform join estimate lands within 20% of the
    exact-NDV-driven one; `roundtrip_ok` pins blob-property/decode
    agreement and byte-identical re-serialization. A reader that
    mis-places theta (preamble long 2), mis-orders hashes, or drops
    the >>>1 sign clear inflates the estimate past the bracket and
    flips the hash.

    Scale posture: sketch build is one distinct + one bounded top-k
    per column (nothing driver-side grows with rows); the sketches
    themselves are the POINT at 100 TB — 2 KB per column replaces a
    count-distinct over the table, and theta sketches merge
    associatively across partitions/snapshots."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = t(spark, sf_dir, "orders")

    root = os.path.join(
        scratch_root(), f"shs_theta_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    K = 256
    sk_li = theta_sketch_build(spark, li, k=K)
    sk_ord = theta_sketch_build(
        spark, orders.select("o_orderkey"), k=K
    )

    def _est(blob: bytes) -> float:
        return theta_estimate(*theta_sketch_deserialize(blob))

    ppath = os.path.join(root, "stats.puffin")
    puffin_write(ppath, [
        (sk_li, {
            "type": "apache-datasketches-theta-v1",
            "fields": [1],  # l_orderkey field id
            "properties": {"ndv": str(round(_est(sk_li)))},
        }),
        (sk_ord, {
            "type": "apache-datasketches-theta-v1",
            "fields": [101],  # o_orderkey field id
            "properties": {"ndv": str(round(_est(sk_ord)))},
        }),
    ])

    # ---- the reader: re-read, decode, estimate, cross-validate ----
    raw, blobs = puffin_read(ppath)
    ests: dict[int, float] = {}
    roundtrip_ok = len(blobs) == 2
    for bm in blobs:
        if bm["type"] != "apache-datasketches-theta-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        blob = raw[bm["offset"] : bm["offset"] + bm["length"]]
        hashes, theta = theta_sketch_deserialize(blob)
        est = theta_estimate(hashes, theta)
        # the spec-required ndv property must agree with the sketch,
        # and re-serialization must be byte-identical
        roundtrip_ok &= int(bm["properties"]["ndv"]) == round(est)
        roundtrip_ok &= (
            theta_sketch_serialize(hashes, theta) == blob
        )
        ests[bm["fields"][0]] = est
    est_dl, est_do = ests[1], ests[101]
    mode_li = "estimation" if len(
        theta_sketch_deserialize(sk_li)[0]
    ) == K and theta_sketch_deserialize(sk_li)[1] != _THETA_MAX \
        else "exact"
    mode_ord = "estimation" if theta_sketch_deserialize(sk_ord)[1] \
        != _THETA_MAX else "exact"
    shutil.rmtree(root, ignore_errors=True)

    # exact ground truth + the CBO formula, distributed
    lo = t(spark, sf_dir, "lineitem").select("l_orderkey")
    counts = lo.agg(
        F.count("*").alias("nl_tot"),
        F.count_distinct("l_orderkey").alias("dl"),
    ).crossJoin(
        orders.agg(
            F.count("*").alias("no_tot"),
            F.count_distinct("o_orderkey").alias("do_"),
        )
    )
    actual = (
        lo.join(
            orders.select("o_orderkey"),
            lo.l_orderkey == F.col("o_orderkey"),
        ).agg(F.count("*").alias("actual"))
    )
    uniform_exact = (
        F.col("nl_tot").cast("double") * F.col("no_tot")
        / F.greatest("dl", "do_")
    )
    uniform_sketch = (
        F.col("nl_tot").cast("double") * F.col("no_tot")
        / F.greatest(F.lit(est_dl), F.lit(est_do))
    )
    within = lambda a, b: (  # noqa: E731
        F.abs(a / b - 1.0) <= 0.2
    )
    return counts.crossJoin(F.broadcast(actual)).select(
        F.col("dl").cast("bigint").alias("exact_ndv_lineitem"),
        F.col("do_").cast("bigint").alias("exact_ndv_orders"),
        F.lit(2).cast("int").alias("sketch_blobs"),
        F.when(F.col("dl") > K, "estimation").otherwise("exact")
        .alias("sketch_mode_lineitem"),
        F.when(F.col("do_") > K, "estimation").otherwise("exact")
        .alias("sketch_mode_orders"),
        (
            within(F.lit(est_dl), F.col("dl"))
            & within(F.lit(est_do), F.col("do_"))
            # the decoded mode must MATCH the data's regime
            & (F.when(F.col("dl") > K, "estimation")
               .otherwise("exact") == F.lit(mode_li))
            & (F.when(F.col("do_") > K, "estimation")
               .otherwise("exact") == F.lit(mode_ord))
        ).alias("ndv_within_20pct"),
        within(uniform_sketch, uniform_exact)
        .alias("cbo_estimate_within_20pct"),
        F.lit(bool(roundtrip_ok)).alias("roundtrip_ok"),
        F.col("actual").cast("bigint").alias("actual_join_rows"),
    )


def theta_union(
    sketches: list[tuple[list[int], int]], k: int = 256
) -> tuple[list[int], int]:
    """DataSketches theta Union semantics: theta = min over inputs,
    keep the distinct retained hashes below it, and if more than k
    survive lower theta to the (k+1)-th smallest — for the KMV
    chooser this is EXACTLY the sketch a monolithic build over the
    concatenated inputs produces (each input retained everything
    below its own theta >= the global (k+1)-th smallest hash, so no
    candidate below the final theta was ever lost) — the provable
    mergeability `source_puffin_theta_union_ndv` attests
    byte-for-byte."""
    theta = min(th for _, th in sketches)
    hs = sorted({h for part, th in sketches for h in part if h < theta})
    if len(hs) > k:
        theta = hs[k]
        hs = hs[:k]
    return hs, theta


def theta_sketch_build_grouped(
    df, group_col: str, k: int = 256
) -> dict[int, bytes]:
    """Per-group theta sketches in ONE dataflow: distinct
    (group, value), MurmurHash3 per Arrow batch, then a per-group
    top-(k+1) window — one shuffle partitioned by group, at most
    groups x (k+1) rows ever reach the driver. The per-partition /
    per-snapshot build a 100 TB stats collector actually runs: each
    group's sketch is written independently and any subset merges
    associatively via `theta_union`."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F  # noqa: PLC0415

    vcol = [c for c in df.columns if c != group_col][0]

    def _hash_batches(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            pdf = pdf.dropna()
            hs = theta_hash_longs_np(pdf[vcol].to_numpy())
            keep = hs != 0
            yield _pd.DataFrame({
                "g": pdf[group_col].to_numpy()[keep],
                "h": hs[keep].astype(_np.int64),
            })

    hashed = df.distinct().mapInPandas(_hash_batches, "g int, h bigint")
    w = W.partitionBy("g").orderBy("h")
    ranked = (
        hashed.distinct()  # same value in one group hashes once
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k + 1)
    )
    per: dict[int, list[int]] = {}
    for r in ranked.collect():
        per.setdefault(r["g"], []).append(r["h"])
    out: dict[int, bytes] = {}
    for g, hs in per.items():
        hs.sort()
        if len(hs) <= k:
            out[g] = theta_sketch_serialize(hs, _THETA_MAX)
        else:
            out[g] = theta_sketch_serialize(hs[:k], hs[k])
    return out


@register(
    "source_puffin_theta_union_ndv",
    oracle="""
        WITH yearly AS (
            SELECT year(o_orderdate) AS y,
                   count(DISTINCT o_custkey) AS ndv
            FROM orders GROUP BY 1
        )
        SELECT CAST((SELECT count(*) FROM yearly) AS INT) AS years,
               CAST(count(DISTINCT o_custkey) AS BIGINT)
                   AS exact_ndv_union,
               (SELECT CAST(sum(ndv) AS BIGINT) FROM yearly)
                   AS exact_ndv_year_sum,
               CASE WHEN count(DISTINCT o_custkey) > 256
                    THEN 'estimation' ELSE 'exact' END
                   AS union_mode,
               TRUE AS union_within_20pct,
               TRUE AS merge_matches_monolithic,
               TRUE AS roundtrip_ok
        FROM orders
    """,
    tags=("source", "iceberg", "puffin", "theta-sketch", "ndv",
          "mergeable", "stats", "audit"),
)
def source_puffin_theta_union_ndv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta-sketch UNION across per-year NDV sketches (round 18) —
    the property that makes sketch stats work at 100 TB: sketches
    merge ASSOCIATIVELY, so per-partition / per-snapshot sketches
    written independently answer corpus-wide NDV questions without
    ever rescanning data. One Puffin file carries seven
    `apache-datasketches-theta-v1` blobs — one per o_orderdate year
    (the fixture's 1995-2001 span) for `orders.o_custkey`, built in
    ONE dataflow (`theta_sketch_build_grouped`: distinct + hash per
    Arrow batch + per-group top-k window). The reader re-reads all
    seven, merges them with `theta_union` (min-theta, re-trim — the
    DataSketches Union rule), and attests:

    - ``merge_matches_monolithic``: the merged sketch is
      BYTE-IDENTICAL to a monolithic sketch built over all years at
      once — for the KMV theta chooser the union provably loses
      nothing below the final theta (docstring proof in
      `theta_union`), so this pin catches any drift in either path;
    - ``union_within_20pct``: the merged estimate brackets against
      the exact distinct-customer count;
    - ``exact_ndv_year_sum`` vs ``exact_ndv_union``: the sum of
      yearly NDVs overcounts repeat customers — the question unions
      exist to answer correctly.

    Scale posture: the grouped build is one shuffle partitioned by
    year with at most years x (k+1) rows collected; the union is
    O(years x k) driver arithmetic over KB-scale blobs."""
    orders = t(spark, sf_dir, "orders")
    K = 256
    pairs = orders.select(
        F.year("o_orderdate").alias("y"), "o_custkey"
    )
    per_year = theta_sketch_build_grouped(pairs, "y", k=K)
    mono = theta_sketch_build(
        spark, orders.select("o_custkey"), k=K
    )

    root = os.path.join(
        scratch_root(), f"shs_thetau_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    ppath = os.path.join(root, "yearly.puffin")
    puffin_write(ppath, [
        (img, {
            "type": "apache-datasketches-theta-v1",
            "fields": [2],
            "properties": {
                "ndv": str(round(theta_estimate(
                    *theta_sketch_deserialize(img)))),
                "year": str(y),
            },
        })
        for y, img in sorted(per_year.items())
    ])

    # ---- the reader: re-read every blob, merge, attest ----
    raw, blobs = puffin_read(ppath)
    parts: list[tuple[list[int], int]] = []
    roundtrip_ok = len(blobs) == len(per_year)
    for bm in blobs:
        if bm["type"] != "apache-datasketches-theta-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        blob = raw[bm["offset"] : bm["offset"] + bm["length"]]
        hs, th = theta_sketch_deserialize(blob)
        roundtrip_ok &= (
            int(bm["properties"]["ndv"]) == round(theta_estimate(hs, th))
        )
        parts.append((hs, th))
    shutil.rmtree(root, ignore_errors=True)

    u_hashes, u_theta = theta_union(parts, k=K)
    merged_img = theta_sketch_serialize(u_hashes, u_theta)
    merge_matches = merged_img == mono
    est = theta_estimate(u_hashes, u_theta)
    u_mode = "estimation" if u_theta != _THETA_MAX else "exact"

    data_mode = (
        F.when(F.col("exact_ndv_union") > K, "estimation")
        .otherwise("exact")
    )
    return orders.agg(
        F.countDistinct(F.year("o_orderdate")).cast("int")
        .alias("years"),
        F.countDistinct("o_custkey").cast("bigint")
        .alias("exact_ndv_union"),
    ).crossJoin(
        F.broadcast(
            orders.groupBy(F.year("o_orderdate"))
            .agg(F.countDistinct("o_custkey").alias("ndv"))
            .agg(F.sum("ndv").cast("bigint")
                 .alias("exact_ndv_year_sum"))
        )
    ).select(
        "years",
        "exact_ndv_union",
        "exact_ndv_year_sum",
        # the decoded sketch's mode must MATCH the data's regime
        data_mode.alias("union_mode"),
        (
            (F.abs(F.lit(est) / F.col("exact_ndv_union") - 1.0) <= 0.2)
            & (F.lit(u_mode) == data_mode)
        ).alias("union_within_20pct"),
        F.lit(bool(merge_matches)).alias("merge_matches_monolithic"),
        F.lit(bool(roundtrip_ok)).alias("roundtrip_ok"),
    )


@register(
    "source_puffin_theta_ndv_strings",
    oracle="""
        WITH b AS (SELECT count(DISTINCT p_brand) AS v FROM part),
        n AS (SELECT count(DISTINCT p_name) AS v FROM part)
        SELECT CAST((SELECT v FROM b) AS BIGINT) AS exact_ndv_brand,
               CAST((SELECT v FROM n) AS BIGINT) AS exact_ndv_name,
               CAST(2 AS INT) AS sketch_blobs,
               CASE WHEN (SELECT v FROM b) > 256
                    THEN 'estimation' ELSE 'exact' END
                   AS sketch_mode_brand,
               CASE WHEN (SELECT v FROM n) > 256
                    THEN 'estimation' ELSE 'exact' END
                   AS sketch_mode_name,
               TRUE AS brand_estimate_exact,
               TRUE AS name_within_20pct,
               TRUE AS roundtrip_ok
    """,
    tags=("source", "iceberg", "puffin", "theta-sketch", "ndv",
          "strings", "stats", "audit"),
)
def source_puffin_theta_ndv_strings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta-sketch NDV over STRING columns (round 18, completing
    the theta family's type coverage): Iceberg single-value
    serialization feeds strings to the sketch as raw UTF-8 bytes —
    no length prefix — and datasketches' update(String) hashes the
    same form (pinned byte-identical against the JVM in
    tests/test_puffin.py, incl. its ignore-empty rule, which the
    build path mirrors). Two part-catalog columns exercise both
    preamble forms at every SF: `p_brand` (25 values — EXACT mode,
    2-long preamble, estimate == exact pinned) and `p_name`
    (one per part — ESTIMATION mode past k=256, 3-long preamble
    with theta, 20% bracket). Both blobs live in one Puffin file
    with the spec-required ndv property, re-read and
    re-serialization-checked like the long-column sibling.

    Scale posture: same as `source_puffin_theta_ndv` — distinct +
    hash per Arrow batch + bounded top-k per column; the string hash
    is per-distinct-value Python (var-len murmur doesn't vectorize),
    which is exactly where the distinct-first order pays."""
    part = t(spark, sf_dir, "part")
    K = 256
    sk_brand = theta_sketch_build(
        spark, part.select("p_brand"), k=K, value_type="string"
    )
    sk_name = theta_sketch_build(
        spark, part.select("p_name"), k=K, value_type="string"
    )

    root = os.path.join(
        scratch_root(), f"shs_thetas_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    ppath = os.path.join(root, "stats.puffin")

    def _est(img: bytes) -> float:
        return theta_estimate(*theta_sketch_deserialize(img))

    puffin_write(ppath, [
        (sk_brand, {
            "type": "apache-datasketches-theta-v1",
            "fields": [4],  # p_brand field id
            "properties": {"ndv": str(round(_est(sk_brand)))},
        }),
        (sk_name, {
            "type": "apache-datasketches-theta-v1",
            "fields": [2],  # p_name field id
            "properties": {"ndv": str(round(_est(sk_name)))},
        }),
    ])
    raw, blobs = puffin_read(ppath)
    ests: dict[int, float] = {}
    modes: dict[int, str] = {}
    roundtrip_ok = len(blobs) == 2
    for bm in blobs:
        if bm["type"] != "apache-datasketches-theta-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        blob = raw[bm["offset"] : bm["offset"] + bm["length"]]
        hs, th = theta_sketch_deserialize(blob)
        est = theta_estimate(hs, th)
        roundtrip_ok &= int(bm["properties"]["ndv"]) == round(est)
        roundtrip_ok &= theta_sketch_serialize(hs, th) == blob
        ests[bm["fields"][0]] = est
        modes[bm["fields"][0]] = (
            "exact" if th == _THETA_MAX else "estimation"
        )
    shutil.rmtree(root, ignore_errors=True)

    mode_of = lambda col: (  # noqa: E731
        F.when(col > K, "estimation").otherwise("exact")
    )
    return part.agg(
        F.countDistinct("p_brand").cast("bigint")
        .alias("exact_ndv_brand"),
        F.countDistinct("p_name").cast("bigint")
        .alias("exact_ndv_name"),
    ).select(
        "exact_ndv_brand",
        "exact_ndv_name",
        F.lit(2).cast("int").alias("sketch_blobs"),
        mode_of(F.col("exact_ndv_brand")).alias("sketch_mode_brand"),
        mode_of(F.col("exact_ndv_name")).alias("sketch_mode_name"),
        # exact mode means the sketch IS the answer — pin equality
        (
            (F.lit(ests[4]) == F.col("exact_ndv_brand")
             .cast("double"))
            & (F.lit(modes[4])
               == mode_of(F.col("exact_ndv_brand")))
        ).alias("brand_estimate_exact"),
        (
            (F.abs(F.lit(ests[2]) / F.col("exact_ndv_name") - 1.0)
             <= 0.2)
            & (F.lit(modes[2]) == mode_of(F.col("exact_ndv_name")))
        ).alias("name_within_20pct"),
        F.lit(bool(roundtrip_ok)).alias("roundtrip_ok"),
    )


@register(
    "source_puffin_theta_join_order",
    oracle=f"""
        WITH m AS (
            SELECT (SELECT count(*) FROM lineitem) AS nl,
                   (SELECT count(*) FROM orders) AS no,
                   (SELECT count(*) FROM customer) AS nc,
                   (SELECT count(DISTINCT l_orderkey)
                    FROM lineitem) AS dlo,
                   (SELECT count(DISTINCT o_orderkey)
                    FROM orders) AS doo,
                   (SELECT count(DISTINCT o_custkey)
                    FROM orders) AS doc,
                   (SELECT count(DISTINCT c_custkey)
                    FROM customer) AS dcc
        )
        SELECT CASE WHEN CAST(nl AS DOUBLE) * no / greatest(dlo, doo)
                         <= CAST(no AS DOUBLE) * nc
                            / greatest(doc, dcc)
                    THEN 'lineitem_orders'
                    ELSE 'orders_customer' END AS chosen_first,
               CASE WHEN CAST(nl AS DOUBLE) * no / greatest(dlo, doo)
                         <= CAST(no AS DOUBLE) * nc
                            / greatest(doc, dcc)
                    THEN CASE WHEN CAST(nl AS DOUBLE) * no
                                   / greatest(dlo, doo) <= nc
                              THEN 'intermediate' ELSE 'customer' END
                    ELSE CASE WHEN CAST(no AS DOUBLE) * nc
                                   / greatest(doc, dcc) <= nl
                              THEN 'intermediate' ELSE 'lineitem' END
               END AS second_build,
               TRUE AS decision_match,
               CAST(4 AS INT) AS sketches_read,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey)
                   AS actual_lineitem_orders,
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                JOIN customer c ON o.o_custkey = c.c_custkey)
                   AS actual_orders_customer,
               TRUE AS choice_optimal,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey)
                   AS three_way_rows,
               (SELECT {sql_dsum('l_extendedprice')} FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey)
                   AS revenue
        FROM m
    """,
    tags=("source", "iceberg", "puffin", "theta-sketch", "cbo",
          "join-order", "audit"),
)
def source_puffin_theta_join_order(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theta-sketch-DRIVEN join ordering (round 19, r18 verdict #6)
    — closing the loop the Puffin NDV blobs opened: a three-table
    join (lineitem ⋈ orders ⋈ customer) whose ORDER and BUILD-SIDE
    choices are made from the SKETCH NDVs read back from the Puffin
    file — never from exact pre-counts — then attested against the
    exact-NDV decision and the realized cardinalities:

    - four `apache-datasketches-theta-v1` blobs (l_orderkey,
      o_orderkey, o_custkey, c_custkey) are written and RE-READ;
      the uniform formula |L|·|R| / max(d_L, d_R) with sketch d's
      picks which pair joins first, and the second join's build
      side comes from the estimated intermediate size vs the
      remaining table;
    - ``decision_match`` recomputes both choices with EXACT distinct
      counts (distributed, in-plan) and pins agreement — the
      sketch's ~6% RSE must not flip a decision whose margin is 4×;
    - ``choice_optimal`` pins the chosen first pair is genuinely
      the smaller REALIZED join (the audit's ground truth);
    - the three-way join then actually EXECUTES in the chosen order
      (broadcast on the sketch-chosen build side) — three_way_rows
      + revenue pin the plan ran and joined correctly.

    Scale posture: this is the 100 TB planning story end-to-end —
    2 KB of sketch per column answers the ordering question that
    would otherwise cost a count-distinct per key column; the audit
    pair joins exist only as ground truth."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey")

    root = os.path.join(
        scratch_root(), f"shs_thetajo_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    K = 256
    cols = [
        (1, theta_sketch_build(spark, li.select("l_orderkey"), k=K)),
        (101, theta_sketch_build(
            spark, orders.select("o_orderkey"), k=K)),
        (102, theta_sketch_build(
            spark, orders.select("o_custkey"), k=K)),
        (201, theta_sketch_build(
            spark, cust.select("c_custkey"), k=K)),
    ]
    ppath = os.path.join(root, "stats.puffin")
    puffin_write(ppath, [
        (blob, {
            "type": "apache-datasketches-theta-v1",
            "fields": [fid],
            "properties": {"ndv": str(round(theta_estimate(
                *theta_sketch_deserialize(blob))))},
        })
        for fid, blob in cols
    ])

    raw, blobs = puffin_read(ppath)
    est: dict[int, float] = {}
    for bm in blobs:
        if bm["type"] != "apache-datasketches-theta-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        est[bm["fields"][0]] = theta_estimate(
            *theta_sketch_deserialize(
                raw[bm["offset"] : bm["offset"] + bm["length"]]
            )
        )
    shutil.rmtree(root, ignore_errors=True)

    # row counts are manifest metadata for a real CBO — only the
    # NDVs come from the sketches
    nl, no, nc = li.count(), orders.count(), cust.count()
    est_lo = nl * no / max(est[1], est[101])
    est_oc = no * nc / max(est[102], est[201])
    if est_lo <= est_oc:
        sk_first = "lineitem_orders"
        sk_build = "intermediate" if est_lo <= nc else "customer"
    else:
        sk_first = "orders_customer"
        sk_build = "intermediate" if est_oc <= nl else "lineitem"

    # execute in the sketch-chosen order, broadcasting the chosen
    # build side of the second join
    if sk_first == "lineitem_orders":
        first = li.join(orders,
                        li.l_orderkey == orders.o_orderkey)
        rest, key = cust, first["o_custkey"] == cust["c_custkey"]
    else:
        first = orders.join(cust,
                            orders.o_custkey == cust.c_custkey)
        rest, key = li, li["l_orderkey"] == first["o_orderkey"]
    if sk_build == "intermediate":
        three = rest.join(F.broadcast(first), key)
    else:
        three = first.join(F.broadcast(rest), key)
    executed = three.agg(
        F.count("*").alias("three_way_rows"),
        dsum("l_extendedprice").alias("revenue"),
    )

    # exact-side decision, distributed — the attest twin
    exact = li.agg(
        F.count_distinct("l_orderkey").alias("dlo"),
    ).crossJoin(orders.agg(
        F.count_distinct("o_orderkey").alias("doo"),
        F.count_distinct("o_custkey").alias("doc"),
    )).crossJoin(cust.agg(
        F.count_distinct("c_custkey").alias("dcc"),
    ))
    x_lo = F.lit(float(nl)) * no / F.greatest("dlo", "doo")
    x_oc = F.lit(float(no)) * nc / F.greatest("doc", "dcc")
    x_first = F.when(x_lo <= x_oc, "lineitem_orders") \
        .otherwise("orders_customer")
    x_build = F.when(
        x_lo <= x_oc,
        F.when(x_lo <= nc, "intermediate").otherwise("customer"),
    ).otherwise(
        F.when(x_oc <= nl, "intermediate").otherwise("lineitem"),
    )
    a_lo = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).agg(F.count("*").alias("a_lo"))
    a_oc = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).agg(F.count("*").alias("a_oc"))

    return (
        exact.crossJoin(F.broadcast(a_lo))
        .crossJoin(F.broadcast(a_oc))
        .crossJoin(F.broadcast(executed))
        .select(
            F.lit(sk_first).alias("chosen_first"),
            F.lit(sk_build).alias("second_build"),
            ((F.lit(sk_first) == x_first)
             & (F.lit(sk_build) == x_build)).alias("decision_match"),
            F.lit(len(blobs)).cast("int").alias("sketches_read"),
            F.col("a_lo").cast("bigint")
            .alias("actual_lineitem_orders"),
            F.col("a_oc").cast("bigint")
            .alias("actual_orders_customer"),
            F.when(
                F.lit(sk_first) == "lineitem_orders",
                F.col("a_lo") <= F.col("a_oc"),
            ).otherwise(F.col("a_oc") <= F.col("a_lo"))
            .alias("choice_optimal"),
            F.col("three_way_rows").cast("bigint")
            .alias("three_way_rows"),
            "revenue",
        )
    )


@register(
    "source_iceberg_table_statistics_lineage",
    oracle="""
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS snapshot_id,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT o_custkey) AS BIGINT)
                       AS exact_ndv_custkey,
                   CASE WHEN count(DISTINCT o_custkey) > 256
                        THEN 'estimation' ELSE 'exact' END
                       AS sketch_mode,
                   TRUE AS ndv_within_20pct,
                   TRUE AS registry_ok
            FROM orders WHERE o_orderkey % 2 = 0
            UNION ALL
            SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
                   CAST(count(DISTINCT o_custkey) AS BIGINT),
                   CASE WHEN count(DISTINCT o_custkey) > 256
                        THEN 'estimation' ELSE 'exact' END,
                   TRUE, TRUE
            FROM orders
        )
        ORDER BY snapshot_id
    """,
    tags=("source", "iceberg", "puffin", "theta-sketch", "stats",
          "lineage", "time-travel"),
)
def source_iceberg_table_statistics_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SNAPSHOT table-statistics lineage (round 19 compose) —
    the registration half the theta queries skipped: the spec's
    ``statistics`` list in metadata.json binds ONE stats file PER
    SNAPSHOT (``snapshot-id`` / ``statistics-path`` /
    ``file-size-in-bytes`` / ``blob-metadata``), so a TIME-TRAVELED
    read must plan with ITS snapshot's sketches, not the current
    ones — an NDV estimated from the wrong snapshot's blob
    mis-costs every join in the traveled plan.

    Fixture: snapshot 1 commits the even-key half (its Puffin file
    sketches o_custkey over that half); snapshot 2 appends the odd
    half (fresh sketch over the full table). The reader resolves
    each snapshot's statistics entry BY SNAPSHOT ID, validates the
    registered byte size and the blob-metadata's snapshot binding,
    decodes the theta blob, and attests the estimate within 20% of
    that snapshot's OWN exact NDV (computed in-plan, distributed).
    ``registry_ok`` also pins that the two files differ (a writer
    that re-registers one file for every snapshot passes nothing).

    Scale posture: stats files are O(KB) per snapshot; lineage
    resolution is a metadata.json lookup — the 100 TB win is that
    time travel keeps CBO-quality plans without recomputing stats
    for historical states."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_thetalin_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    okey = F.col("o_orderkey")
    stage_single_parquet(
        orders.filter(okey % 2 == 0), root, ddir, "A.parquet"
    )
    stage_single_parquet(
        orders.filter(okey % 2 == 1), root, ddir, "B.parquet"
    )
    K = 256
    snap_files = {1: ["A.parquet"], 2: ["A.parquet", "B.parquet"]}
    stats_entries = []
    for snap, files in snap_files.items():
        scan = spark.read.parquet(
            *(os.path.join(ddir, f) for f in files)
        ).select("o_custkey")
        blob = theta_sketch_build(spark, scan, k=K)
        ppath = os.path.join(mdir, f"stats-snap-{snap}.puffin")
        puffin_write(ppath, [(blob, {
            "type": "apache-datasketches-theta-v1",
            "fields": [2],  # o_custkey field id
            "snapshot-id": snap,
            "properties": {"ndv": str(round(theta_estimate(
                *theta_sketch_deserialize(blob))))},
        })])
        stats_entries.append({
            "snapshot-id": snap,
            "statistics-path": ppath,
            "file-size-in-bytes": os.path.getsize(ppath),
        })
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 2,
            "current-snapshot-id": 2,
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": "ml-1"},
                {"snapshot-id": 2, "manifest-list": "ml-2"},
            ],
            "statistics": stats_entries,
        }, fh)

    # ---- the reader: per-snapshot stats resolution ----
    with open(os.path.join(mdir, "v2.metadata.json")) as fh:
        md = json.load(fh)
    regs = {s["snapshot-id"]: s for s in md["statistics"]}
    paths = {s["statistics-path"] for s in md["statistics"]}
    registry_ok = len(regs) == 2 and len(paths) == 2 and all(
        os.path.getsize(s["statistics-path"])
        == s["file-size-in-bytes"] for s in regs.values()
    )
    per_snap = []
    for snap, files in snap_files.items():
        raw, blobs = puffin_read(regs[snap]["statistics-path"])
        (bm,) = blobs
        if bm["type"] != "apache-datasketches-theta-v1":
            raise NotImplementedError(f"Puffin blob type {bm['type']}")
        registry_ok &= bm["snapshot-id"] == snap
        hashes, theta = theta_sketch_deserialize(
            raw[bm["offset"] : bm["offset"] + bm["length"]]
        )
        est = theta_estimate(hashes, theta)
        mode = "estimation" if theta != _THETA_MAX else "exact"
        scan = spark.read.parquet(
            *(os.path.join(ddir, f) for f in files)
        )
        per_snap.append(
            scan.agg(
                F.lit(snap).cast("bigint").alias("snapshot_id"),
                F.count("*").alias("n_rows"),
                F.count_distinct("o_custkey")
                .alias("exact_ndv_custkey"),
            ).select(
                "snapshot_id", "n_rows", "exact_ndv_custkey",
                F.when(F.col("exact_ndv_custkey") > K, "estimation")
                .otherwise("exact").alias("sketch_mode"),
                (
                    (F.abs(F.lit(est) / F.col("exact_ndv_custkey")
                           - 1.0) <= 0.2)
                    # the decoded regime must match the data's
                    & (F.when(F.col("exact_ndv_custkey") > K,
                              "estimation").otherwise("exact")
                       == F.lit(mode))
                ).alias("ndv_within_20pct"),
                F.lit(bool(registry_ok)).alias("registry_ok"),
            )
        )
    out = (
        per_snap[0].unionByName(per_snap[1])
        .orderBy("snapshot_id")
        .localCheckpoint(eager=True)  # 2 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_expire_statistics",
    oracle=f"""
        SELECT CAST(2 AS INT) AS stats_entries_before,
               CAST(1 AS INT) AS stats_entries_after,
               CAST(2 AS INT) AS partition_stats_entries_before,
               CAST(1 AS INT) AS partition_stats_entries_after,
               CAST(2 AS INT) AS orphan_stats_files_removed,
               TRUE AS current_stats_intact,
               TRUE AS expired_travel_fails,
               CAST(count(DISTINCT o_custkey) AS BIGINT)
                   AS exact_ndv_custkey,
               TRUE AS ndv_within_20pct,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
    """,
    tags=("source", "iceberg", "puffin", "stats", "maintenance",
          "expire-snapshots", "retention"),
)
def source_iceberg_expire_statistics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXPIRE SNAPSHOTS cleans up STATISTICS files (round 19) — the
    maintenance interaction `source_iceberg_expire_snapshots` and
    the stats registries leave open: per the spec's RemoveSnapshots
    semantics, expiring a snapshot must also drop its entries from
    BOTH the ``statistics`` and ``partition-statistics`` lists and
    the files they reference become orphans to delete — a cleaner
    that prunes only data files leaks one stats file per expired
    snapshot forever (at daily stats on a busy table, that is the
    dominant leak).

    Fixture: snapshots 1 (half the table) and 2 (all of it), each
    with a Puffin theta NDV file AND a partition-stats parquet
    registered. Expiry of snapshot 1 rewrites metadata.json and
    physically removes its two stats files. Attested: entry counts
    before/after in both lists, both orphans gone from disk, the
    CURRENT snapshot's stats file untouched AND still loadable (the
    theta blob decodes and its estimate stays within 20% of the
    exact NDV — a cleaner that deleted the wrong file fails here,
    not just on byte counts), time travel to the expired id fails
    by name, and the current read reproduces the raw aggregate.

    Scale posture: expiry is metadata arithmetic + O(expired) file
    deletes; the stats-registry sweep is O(len(statistics)) — the
    lists a planner reads on every query stay bounded by LIVE
    snapshots."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_thetaexp_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    import pandas as _pd

    okey = F.col("o_orderkey")
    stage_single_parquet(
        orders.filter(okey % 2 == 0), root, ddir, "A.parquet"
    )
    stage_single_parquet(
        orders.filter(okey % 2 == 1), root, ddir, "B.parquet"
    )
    K = 256
    snap_files = {1: ["A.parquet"], 2: ["A.parquet", "B.parquet"]}
    stats, pstats = [], []
    for snap, files in snap_files.items():
        scan = spark.read.parquet(
            *(os.path.join(ddir, f) for f in files)
        )
        blob = theta_sketch_build(
            spark, scan.select("o_custkey"), k=K
        )
        ppath = os.path.join(mdir, f"stats-{snap}.puffin")
        puffin_write(ppath, [(blob, {
            "type": "apache-datasketches-theta-v1",
            "fields": [2], "snapshot-id": snap,
            "properties": {"ndv": str(round(theta_estimate(
                *theta_sketch_deserialize(blob))))},
        })])
        stats.append({
            "snapshot-id": snap, "statistics-path": ppath,
            "file-size-in-bytes": os.path.getsize(ppath),
        })
        sp = os.path.join(mdir, f"partition-stats-{snap}.parquet")
        stage_single_parquet(
            spark.createDataFrame(
                _pd.DataFrame([{
                    "part_value": "ALL", "spec_id": 0,
                    "data_record_count": scan.count(),
                    "data_file_count": len(files),
                }]),
                "part_value string, spec_id int, "
                "data_record_count bigint, data_file_count bigint",
            ),
            root, mdir, f"partition-stats-{snap}.parquet",
        )
        pstats.append({
            "snapshot-id": snap, "statistics-path": sp,
            "file-size-in-bytes": os.path.getsize(sp),
        })
    meta_path = os.path.join(mdir, "v2.metadata.json")
    with open(meta_path, "w") as fh:
        json.dump({
            "format-version": 2,
            "current-snapshot-id": 2,
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": "ml-1"},
                {"snapshot-id": 2, "manifest-list": "ml-2"},
            ],
            "statistics": stats,
            "partition-statistics": pstats,
        }, fh)

    # ---- EXPIRE snapshot 1: metadata rewrite + orphan cleanup ----
    with open(meta_path) as fh:
        md = json.load(fh)
    before_stats = len(md["statistics"])
    before_pstats = len(md["partition-statistics"])
    live = {2}
    expired = {s["snapshot-id"] for s in md["snapshots"]} - live
    orphans = [
        e["statistics-path"]
        for key in ("statistics", "partition-statistics")
        for e in md[key] if e["snapshot-id"] in expired
    ]
    md["snapshots"] = [
        s for s in md["snapshots"] if s["snapshot-id"] in live
    ]
    for key in ("statistics", "partition-statistics"):
        md[key] = [e for e in md[key] if e["snapshot-id"] in live]
    with open(meta_path, "w") as fh:
        json.dump(md, fh)
    removed = 0
    for p in orphans:
        os.remove(p)
        removed += not os.path.exists(p)

    # ---- the post-expiry reader ----
    with open(meta_path) as fh:
        md2 = json.load(fh)
    try:
        next(s for s in md2["snapshots"] if s["snapshot-id"] == 1)
        expired_travel_fails = False
    except StopIteration:
        expired_travel_fails = True
    (reg,) = md2["statistics"]
    current_intact = bool(
        reg["snapshot-id"] == 2
        and os.path.getsize(reg["statistics-path"])
        == reg["file-size-in-bytes"]
        and len(md2["partition-statistics"]) == 1
    )
    raw, blobs = puffin_read(reg["statistics-path"])
    (bm,) = blobs
    est = theta_estimate(*theta_sketch_deserialize(
        raw[bm["offset"] : bm["offset"] + bm["length"]]
    ))
    scan = spark.read.parquet(
        *(os.path.join(ddir, f) for f in snap_files[2])
    )
    out = scan.agg(
        F.lit(before_stats).cast("int").alias("stats_entries_before"),
        F.lit(len(md2["statistics"])).cast("int")
        .alias("stats_entries_after"),
        F.lit(before_pstats).cast("int")
        .alias("partition_stats_entries_before"),
        F.lit(len(md2["partition-statistics"])).cast("int")
        .alias("partition_stats_entries_after"),
        F.lit(removed).cast("int").alias("orphan_stats_files_removed"),
        F.lit(bool(current_intact)).alias("current_stats_intact"),
        F.lit(bool(expired_travel_fails)).alias("expired_travel_fails"),
        F.count_distinct("o_custkey").alias("exact_ndv_custkey"),
        (F.abs(F.lit(est) / F.count_distinct("o_custkey") - 1.0)
         <= 0.2).alias("ndv_within_20pct"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
