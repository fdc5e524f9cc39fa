"""Delta Lake DELETION VECTORS, read and written WITHOUT the Delta
library (SURVEY.md §2B lakehouse-compat surface, round 11).

`source_delta_log_replay` / `source_delta_checkpoint_replay` cover
copy-on-write Delta; modern Delta deletes are MERGE-ON-READ: a DELETE
commits an `add` action that re-lists the SAME data file with a
`deletionVector` descriptor, and readers mask the dead row POSITIONS
at scan time. This module hand-builds every layer of that stack from
the public specs:

- **Z85** (ZeroMQ spec 32): 4-byte big-endian groups -> 5 chars of
  an 85-symbol alphabet — Delta encodes the DV file's UUID (and
  inline DV payloads) this way in `pathOrInlineDv`.
- **Roaring bitmap, 32-bit portable format** (RoaringFormatSpec):
  cookie 12346 (no runs, explicit size + offset header) or 12347
  (run-aware: size embedded in the cookie's high 16 bits, a
  run-flag bitset, offsets only at >= 4 containers); per-container
  descriptive header (u16 key, u16 cardinality-1); and all three
  container bodies — sorted-u16 ARRAY (card <= 4096), 1024-word
  BITMAP, and RUN (u16 n_runs + (start, length-1) pairs). The
  encoder picks the container exactly like `runOptimize`: runs when
  `2 + 4*n_runs` beats both alternatives, else array/bitmap by
  cardinality.
- **RoaringBitmapArray "portable" format** (Delta PROTOCOL.md):
  magic 1681511377 (LE), u64 bitmap count, then each 32-bit bitmap;
  a 64-bit position p lives in bitmap `p >> 32` at value
  `p & 0xFFFFFFFF`.
- **DV file storage format** (PROTOCOL.md): a version byte (1),
  then each vector at its descriptor `offset` as
  `[i32 BE size][data][i32 BE CRC-32(data)]`, with the descriptor's
  `sizeInBytes` = size and `cardinality` cross-checked against the
  decoded bitmap — mismatch and checksum failure are loud.

Storage types implemented: `u` (UUID-named file under the table
root, path recovered by z85-decoding the last 20 chars of
`pathOrInlineDv`), `i` (inline: the z85-encoded serialized bitmap
rides in the action itself), `p` (absolute path). Unknown types
raise.

Scale posture: a DV is O(deleted positions) planning-side metadata,
decoded once per file per scan; masking is a broadcast anti-join
against `_metadata.row_index` — identical shape to the Iceberg
position-delete query (`source_iceberg_position_deletes`), which is
exactly how Spark's own DV reader applies them (a bitmap filter on
the row index). Nothing driver-side grows with table rows — only
with deleted positions per file.

Reference parity: the reference reads static inputs
(CollegeScorecard.scala:35-157); north-star per SURVEY §2B.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
import uuid as uuid_mod
import zlib
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t

# ---------------------------------------------------------------------------
# Z85 (ZeroMQ spec 32)
# ---------------------------------------------------------------------------

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be 4-byte aligned")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError("z85 input must be 5-char aligned")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# Roaring bitmap — 32-bit portable format
# ---------------------------------------------------------------------------

_COOKIE_RUN = 12347
_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4  # spec: run-cookie files omit offsets below this


def _containers(values: Iterable[int]) -> list[tuple[int, list[int]]]:
    """Sorted distinct u32 values -> [(chunk key, sorted u16 list)]."""
    chunks: dict[int, list[int]] = {}
    last = -1
    for v in sorted(set(values)):
        if not 0 <= v <= 0xFFFFFFFF:
            raise ValueError(f"value {v} outside u32")
        chunks.setdefault(v >> 16, []).append(v & 0xFFFF)
        last = v
    return sorted(chunks.items())


def _runs(vals: list[int]) -> list[tuple[int, int]]:
    """Sorted u16 list -> [(start, length-1)] maximal runs."""
    runs: list[tuple[int, int]] = []
    start = prev = vals[0]
    for v in vals[1:]:
        if v == prev + 1:
            prev = v
            continue
        runs.append((start, prev - start))
        start = prev = v
    runs.append((start, prev - start))
    return runs


def roaring32_serialize(values: Iterable[int]) -> bytes:
    """Portable serialization with runOptimize container choice."""
    conts = _containers(values)
    bodies: list[bytes] = []
    is_run: list[bool] = []
    for _, vals in conts:
        card = len(vals)
        runs = _runs(vals)
        run_size = 2 + 4 * len(runs)
        array_size, bitmap_size = 2 * card, 8192
        if run_size < min(array_size, bitmap_size):
            bodies.append(
                struct.pack("<H", len(runs))
                + b"".join(struct.pack("<HH", s, l) for s, l in runs)
            )
            is_run.append(True)
        elif card <= 4096:
            bodies.append(struct.pack(f"<{card}H", *vals))
            is_run.append(False)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            bodies.append(struct.pack("<1024Q", *words))
            is_run.append(False)
    n = len(conts)
    out = bytearray()
    if any(is_run):
        out += struct.pack("<I", _COOKIE_RUN | ((n - 1) << 16))
        bits = bytearray((n + 7) // 8)
        for i, r in enumerate(is_run):
            if r:
                bits[i // 8] |= 1 << (i % 8)
        out += bits
    else:
        out += struct.pack("<II", _COOKIE_NO_RUN, n)
    for (key, vals), _ in zip(conts, bodies):
        out += struct.pack("<HH", key, len(vals) - 1)
    if not any(is_run) or n >= _NO_OFFSET_THRESHOLD:
        off = len(out) + 4 * n
        for b in bodies:
            out += struct.pack("<I", off)
            off += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def roaring32_deserialize(data: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Portable bytes -> (sorted values, next position)."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_bits = data[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
        is_run = [bool(run_bits[i // 8] >> (i % 8) & 1) for i in range(n)]
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        has_offsets = True
        is_run = [False] * n
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")
    keys: list[int] = []
    cards: list[int] = []
    for _ in range(n):
        key, cm1 = struct.unpack_from("<HH", data, pos)
        keys.append(key)
        cards.append(cm1 + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # trust sequential layout; offsets are redundant
    out: list[int] = []
    for key, card, run in zip(keys, cards, is_run):
        base = key << 16
        if run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            got = 0
            for _ in range(n_runs):
                s, lm1 = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.extend(range(base + s, base + s + lm1 + 1))
                got += lm1 + 1
            if got != card:
                raise ValueError("run container cardinality mismatch")
        elif card <= 4096:
            out.extend(
                base + v
                for v in struct.unpack_from(f"<{card}H", data, pos)
            )
            pos += 2 * card
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            got = 0
            for wi, w in enumerate(words):
                while w:
                    b = (w & -w).bit_length() - 1
                    out.append(base + (wi << 6) + b)
                    w &= w - 1
                    got += 1
            if got != card:
                raise ValueError("bitmap container cardinality mismatch")
    return out, pos


# ---------------------------------------------------------------------------
# RoaringBitmapArray (Delta PROTOCOL.md portable format) + DV file
# ---------------------------------------------------------------------------

_RBA_MAGIC = 1681511377
_DV_FILE_VERSION = 1


def rba_serialize(positions: Iterable[int]) -> bytes:
    """64-bit row positions -> Delta's portable RoaringBitmapArray:
    magic, u64 bitmap count, bitmaps for indexes 0..max (contiguous,
    empty ones included — the reference implementation's layout)."""
    by_idx: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError("negative row position")
        by_idx.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_idx) + 1) if by_idx else 0
    out = struct.pack("<IQ", _RBA_MAGIC, n)
    for i in range(n):
        out += roaring32_serialize(by_idx.get(i, []))
    return out


def rba_deserialize(data: bytes) -> list[int]:
    magic, n = struct.unpack_from("<IQ", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(n):
        vals, pos = roaring32_deserialize(data, pos)
        out.extend((i << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError("trailing bytes after last bitmap")
    return out


def roaring64_portable_serialize(positions: Iterable[int]) -> bytes:
    """64-bit positions -> the STANDARD portable 64-bit roaring
    serialization (RoaringFormatSpec "portable format for 64-bit
    implementations"): u64 LE count of non-empty 32-bit buckets,
    then per bucket in increasing key order a u32 LE high-32-bit
    key followed by the 32-bit portable bitmap.

    This is what Iceberg v3 `deletion-vector-v1` Puffin blobs carry.
    It differs from Delta's RoaringBitmapArray (`rba_serialize`
    above) in exactly two ways: buckets are SPARSE and KEYED here
    (Delta writes contiguous keyless bitmaps 0..max, empties
    included) and there is no leading magic (Iceberg moves the
    D1 D3 39 64 magic into the blob framing instead)."""
    by_key: dict[int, list[int]] = {}
    for p in positions:
        if p < 0:
            raise ValueError("negative row position")
        by_key.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = struct.pack("<Q", len(by_key))
    for key in sorted(by_key):
        out += struct.pack("<I", key) + roaring32_serialize(by_key[key])
    return out


def roaring64_portable_deserialize(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<Q", data, 0)
    pos = 8
    out: list[int] = []
    last_key = -1
    for _ in range(n):
        (key,) = struct.unpack_from("<I", data, pos)
        if key <= last_key:
            raise ValueError("64-bit roaring keys not increasing")
        last_key = key
        vals, pos = roaring32_deserialize(data, pos + 4)
        out.extend((key << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError("trailing bytes after last 64-bit bucket")
    return out


def write_dv_file(path: str, dv_datas: list[bytes]) -> list[int]:
    """PROTOCOL.md DV file: version byte, then per vector
    [i32 BE size][data][i32 BE crc32(data)] -> per-vector offsets."""
    offsets: list[int] = []
    with open(path, "wb") as fh:
        fh.write(bytes([_DV_FILE_VERSION]))
        off = 1
        for data in dv_datas:
            offsets.append(off)
            blob = (
                struct.pack(">i", len(data))
                + data
                + struct.pack(">I", zlib.crc32(data))
            )
            fh.write(blob)
            off += len(blob)
    return offsets


def read_dv_descriptor(table_root: str, desc: dict) -> list[int]:
    """A Delta `deletionVector` descriptor -> decoded row positions,
    with every integrity field validated loudly."""
    st = desc["storageType"]
    if st == "i":
        # inline payloads are zero-padded to the 4-byte z85 group
        # boundary on encode; sizeInBytes recovers the true length
        data = z85_decode(desc["pathOrInlineDv"])[: desc["sizeInBytes"]]
    else:
        if st == "u":
            enc = desc["pathOrInlineDv"]
            prefix, uid_z85 = enc[:-20], enc[-20:]
            uid = uuid_mod.UUID(bytes=z85_decode(uid_z85))
            path = os.path.join(
                table_root, *((prefix,) if prefix else ()),
                f"deletion_vector_{uid}.bin",
            )
        elif st == "p":
            path = desc["pathOrInlineDv"]
        else:
            raise NotImplementedError(f"DV storage type {st!r}")
        with open(path, "rb") as fh:
            raw = fh.read()
        if raw[0] != _DV_FILE_VERSION:
            raise NotImplementedError(f"DV file version {raw[0]}")
        off = desc["offset"]
        (size,) = struct.unpack_from(">i", raw, off)
        data = raw[off + 4 : off + 4 + size]
        (want_crc,) = struct.unpack_from(">I", raw, off + 4 + size)
        if zlib.crc32(data) != want_crc:
            raise ValueError("DV checksum mismatch")
    if len(data) != desc["sizeInBytes"]:
        raise ValueError("DV sizeInBytes mismatch")
    positions = rba_deserialize(data)
    if len(positions) != desc["cardinality"]:
        raise ValueError("DV cardinality mismatch")
    return positions


_N_RUN_DELETE = 100  # contiguous head-of-file delete (run container)


@register(
    "source_delta_deletion_vectors",
    oracle=f"""
        WITH evens AS (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderkey % 2 = 0
        ),
        odds_head AS (
            SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 1
            ORDER BY o_orderkey LIMIT {_N_RUN_DELETE}
        ),
        deleted AS (
            SELECT o_orderkey FROM evens WHERE o_orderkey % 10 = 4
            UNION ALL SELECT o_orderkey FROM odds_head
        )
        SELECT CAST(2 AS INT) AS n_files,
               CAST(2 AS INT) AS dvs_applied,
               (SELECT CAST(count(*) AS BIGINT) FROM deleted)
                   AS rows_deleted,
               TRUE AS dv_integrity_ok,
               CAST(count(*) AS BIGINT) AS n_live,
               {sql_dsum('o_totalprice')} AS revenue_live
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM deleted)
    """,
    tags=("source", "delta", "lakehouse", "deletion-vectors", "compat"),
)
def source_delta_deletion_vectors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta MERGE-ON-READ (round 11): two sorted data files (orders
    split by key parity); a DELETE of every key ≡ 4 (mod 10) on the
    even file commits as a UUID-named DV file ('u' storage: z85 path
    in the action, size/CRC-framed roaring bitmap on disk), and a
    contiguous head-of-file delete of the first {100} rows of the odd
    file rides INLINE in the log ('i' storage, z85 payload — and, the
    run-container path, since 100 consecutive positions serialize as
    one run). The reader replays the log, decodes both DVs through
    the hand-built Z85/roaring/CRC stack with every integrity field
    checked, and masks dead positions with a broadcast anti-join on
    `_metadata.row_index`.

    The oracle recomputes live rows and revenue from the raw table by
    the same predicates — an off-by-one run length, a misdecoded
    container, or a CRC/cardinality slip either raises loudly or
    flips the hash; `rows_deleted` pins the decoded cardinalities.

    Scale posture: DV decode is O(deleted positions) planning-side;
    the mask is a broadcast anti-join per file on row_index —
    Spark's own DV application shape. Data files are read once, in
    parallel, columns pruned."""
    import json as _json

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_dv_{uuid_mod.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    ldir = os.path.join(tdir, "_delta_log")
    os.makedirs(ldir)

    def _write_part(name: str, df: DataFrame) -> None:
        tmp = os.path.join(root, f"stage_{name}")
        df.coalesce(1).sortWithinPartitions("o_orderkey").write.parquet(
            tmp
        )
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, src), os.path.join(tdir, name))
        shutil.rmtree(tmp, ignore_errors=True)

    par = F.col("o_orderkey") % 2
    _write_part("part-e.parquet", orders.filter(par == 0))
    _write_part("part-o.parquet", orders.filter(par == 1))

    # -- the DELETE writer: positions from each file's actual layout
    import pyarrow.parquet as pq

    keys_e = pq.read_table(
        os.path.join(tdir, "part-e.parquet"), columns=["o_orderkey"]
    )["o_orderkey"].to_pylist()
    pos_e = [i for i, k in enumerate(keys_e) if k % 10 == 4]
    pos_o = list(range(_N_RUN_DELETE))  # head-of-file → one run

    dv_e = rba_serialize(pos_e)
    dv_o = rba_serialize(pos_o)

    uid = uuid_mod.uuid4()
    dv_path = os.path.join(tdir, f"deletion_vector_{uid}.bin")
    (off_e,) = write_dv_file(dv_path, [dv_e])

    def _add(p: str, dv: dict | None) -> dict:
        a = {"path": p, "size": os.path.getsize(os.path.join(tdir, p)),
             "modificationTime": 0, "dataChange": True}
        if dv is not None:
            a["deletionVector"] = dv
        return a

    def _commit(version: int, actions: list[dict]) -> None:
        with open(os.path.join(ldir, f"{version:020d}.json"), "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in actions) + "\n")

    _commit(0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "shs-dv-fixture", "format":
            {"provider": "parquet", "options": {}},
            "schemaString": "{}", "partitionColumns": []}},
        {"add": _add("part-e.parquet", None)},
        {"add": _add("part-o.parquet", None)},
    ])
    _commit(1, [
        {"remove": {"path": "part-e.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": _add("part-e.parquet", {
            "storageType": "u",
            "pathOrInlineDv": z85_encode(uid.bytes),
            "offset": off_e, "sizeInBytes": len(dv_e),
            "cardinality": len(pos_e)})},
        {"remove": {"path": "part-o.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
        {"add": _add("part-o.parquet", {
            "storageType": "i",
            "pathOrInlineDv": z85_encode(
                dv_o + b"\0" * (-len(dv_o) % 4)
            ),
            "offset": 0, "sizeInBytes": len(dv_o),
            "cardinality": len(pos_o)})},
    ])

    # ---- the reader: replay, decode DVs, mask row positions ----
    live: dict[str, dict | None] = {}
    for v in sorted(
        int(f[:20]) for f in os.listdir(ldir) if f.endswith(".json")
    ):
        with open(os.path.join(ldir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = _json.loads(line)
                if "protocol" in action:
                    feats = action["protocol"].get("readerFeatures", [])
                    unknown = set(feats) - {"deletionVectors"}
                    if unknown:
                        raise NotImplementedError(
                            f"Delta reader features {sorted(unknown)}"
                        )
                elif "add" in action:
                    a = action["add"]
                    live[a["path"]] = a.get("deletionVector")
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)

    deletes: list[tuple[str, int]] = []
    n_deleted = 0
    for p, desc in sorted(live.items()):
        if desc is None:
            continue
        positions = read_dv_descriptor(tdir, desc)
        n_deleted += len(positions)
        deletes.extend((p, pos) for pos in positions)

    scan = spark.read.parquet(
        *(os.path.join(tdir, p) for p in sorted(live))
    ).select(
        "o_orderkey", "o_totalprice",
        # join on the unique basename (file URIs vary by scheme form)
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("fp"),
        F.col("_metadata.row_index").alias("ri"),
    )
    del_df = spark.createDataFrame(
        deletes or [("", -1)],
        "fp string, ri bigint",
    )
    survivors = scan.join(
        F.broadcast(del_df), on=["fp", "ri"], how="left_anti"
    )
    out = survivors.agg(
        F.lit(len(live)).cast("int").alias("n_files"),
        F.lit(sum(d is not None for d in live.values()))
        .cast("int").alias("dvs_applied"),
        F.lit(n_deleted).cast("bigint").alias("rows_deleted"),
        F.lit(True).alias("dv_integrity_ok"),
        F.count("*").alias("n_live"),
        dsum("o_totalprice").alias("revenue_live"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
