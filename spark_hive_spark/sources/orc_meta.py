"""ORC reading WITHOUT the ORC library — the columnar sibling of the
hand-built parquet reader (sources/parquet_meta.py): the file TAIL
(postscript/footer/metadata, stripe statistics, stripe skipping) and
the DATA layer itself (PRESENT bitmaps + RLEv2 integer streams, all
four sub-encodings), from the two public specs:

- **Protocol Buffers wire format** (protobuf.dev/programming-guides/
  encoding): varint keys `(field<<3)|wiretype`, wiretypes 0/1/2/5,
  zigzag for the `sint*` fields — a generic `{field: [values]}`
  message walker, ~30 lines.
- **ORC v1** (orc.apache.org/specification/ORCv1): the file tail is
  `... metadata | footer | postscript | u8 postscript-length`; the
  PostScript (NEVER compressed) carries footerLength/compression/
  compressionBlockSize/metadataLength; footer and metadata sections
  are framed as compression chunks with 3-byte little-endian headers
  `(chunkLen<<1)|isOriginal`. Footer: 3=stripes (offset/indexLen/
  dataLen/footerLen/numberOfRows), 4=types, 6=numberOfRows,
  7=file-level ColumnStatistics; Metadata: 1=per-stripe
  StripeStatistics. IntegerStatistics min/max/sum are sint64,
  DateStatistics min/max sint32 days-since-epoch.

The chunk codecs come from THIS repo's stack: SNAPPY through the
hand-built raw-snappy decoder (operators/snappy.py), ZLIB as raw
RFC 1951 via stdlib, ZSTD through the hand-built RFC 8878 decoder
(operators/zstd.py), LZ4 through the hand-built raw-block decoder
(operators/lz4.py) — so reading a real engine's ORC metadata
exercises the same codec layer the Avro source attested. LZO stays
a loud seam.

Differentially tested against pyarrow's ORC reader
(tests/test_orc_meta.py) across all four supported compressions,
and — like every stats decode in this repo — the registered query's
DuckDB oracle recomputes every decoded number from the source table,
so a varint, zigzag, chunk-framing, or section-boundary bug flips
the driver's value hash.

Scale posture: tail decode is O(tail bytes) at scan-planning time;
stripe skipping reads only surviving stripes, one
`ORCFile.read_stripe` per task (mapInPandas) — ORC's stripe is
exactly Spark's split unit for ORC scans at 100 TB.

Reference parity: the reference engine writes/reads ORC whole via
the session catalog (`DataTest.scala:93-118` — our §2A S3/S4); the
statistics-pruning layer is north-star surface per SURVEY.md §2B.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import struct
import tempfile
import uuid
import zlib
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.operators.lz4 import lz4_block_decompress
from spark_hive_spark.operators.snappy import snappy_decompress
from spark_hive_spark.operators.zstd import zstd_decompress
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t

_COMPRESSION = {0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4",
                5: "ZSTD"}


# ---------------------------------------------------------------------------
# protobuf wire format — generic message decoder
# ---------------------------------------------------------------------------

class TruncatedRun(ValueError):
    """A read ran past the END of the buffer — the shape a resumable
    decoder may legitimately see when fed compression chunks
    incrementally (more bytes fix it). Distinct from in-buffer
    corruption (bad patch gaps, impossible widths), which stays a
    plain ValueError and must NOT be retried with more data:
    ``decode_rlev2(resumable=True)`` resumes only on this class, so
    a genuinely corrupt stream fails loudly at the corrupt run
    instead of draining every remaining chunk and mis-reporting
    'ran out of compression chunks' (round-17 ADVICE)."""


def _uvarint(b: bytes, p: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        if p >= len(b):
            raise TruncatedRun("truncated protobuf varint")
        c = b[p]
        p += 1
        u |= (c & 0x7F) << shift
        if not (c & 0x80):
            return u, p
        shift += 7
        if shift > 70:
            raise ValueError("protobuf varint overruns 64 bits")


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def decode_message(buf: bytes) -> dict[int, list[Any]]:
    """Protobuf message -> {field number: [raw values]} (repeated
    fields accumulate; `sint*` zigzag is applied by the caller, which
    knows the schema). Wiretypes: 0 varint, 1 fixed64, 2 bytes,
    5 fixed32."""
    out: dict[int, list[Any]] = {}
    p = 0
    while p < len(buf):
        key, p = _uvarint(buf, p)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, p = _uvarint(buf, p)
        elif wt == 1:
            v = struct.unpack_from("<q", buf, p)[0]
            p += 8
        elif wt == 2:
            n, p = _uvarint(buf, p)
            if p + n > len(buf):
                raise ValueError("truncated protobuf bytes field")
            v = buf[p : p + n]
            p += n
        elif wt == 5:
            v = struct.unpack_from("<i", buf, p)[0]
            p += 4
        else:
            raise ValueError(f"unsupported protobuf wiretype {wt}")
        out.setdefault(field, []).append(v)
    return out


# ---------------------------------------------------------------------------
# ORC tail interpretation
# ---------------------------------------------------------------------------

def _unchunk(raw: bytes, codec: int) -> bytes:
    """Decompress an ORC compressed section: 3-byte LE chunk headers
    `(len<<1)|isOriginal`, chunks independently compressed."""
    if codec == 0:
        return raw
    out = bytearray()
    p = 0
    while p < len(raw):
        if p + 3 > len(raw):
            raise ValueError("truncated ORC chunk header")
        h = raw[p] | (raw[p + 1] << 8) | (raw[p + 2] << 16)
        p += 3
        n, original = h >> 1, h & 1
        if p + n > len(raw):
            raise ValueError("ORC chunk overruns section")
        blk = bytes(raw[p : p + n])
        p += n
        if original:
            out += blk
        elif codec == 1:  # ZLIB: raw RFC 1951, no wrapper
            out += zlib.decompress(blk, -15)
        elif codec == 2:  # SNAPPY: hand-built raw-snappy decoder
            out += snappy_decompress(blk)
        elif codec == 4:  # LZ4: hand-built raw-block decoder
            out += lz4_block_decompress(blk)
        elif codec == 5:  # ZSTD: hand-built RFC 8878 decoder
            out += zstd_decompress(blk)
        else:
            raise NotImplementedError(
                f"ORC compression {_COMPRESSION.get(codec, codec)}"
            )
    return bytes(out)


def _col_stats(raw: bytes) -> dict[str, Any]:
    """One ColumnStatistics message -> interpreted stats (integer +
    date variants; others stay raw)."""
    msg = decode_message(raw)
    out: dict[str, Any] = {
        "num_values": msg.get(1, [None])[0],
        "has_null": bool(msg.get(10, [0])[0]),
    }
    if 2 in msg:  # IntegerStatistics: sint64 min/max/sum
        ints = decode_message(msg[2][0])
        out["int"] = {
            "min": _unzigzag(ints[1][0]) if 1 in ints else None,
            "max": _unzigzag(ints[2][0]) if 2 in ints else None,
            "sum": _unzigzag(ints[3][0]) if 3 in ints else None,
        }
    if 7 in msg:  # DateStatistics: sint32 days since epoch
        dates = decode_message(msg[7][0])
        out["date"] = {
            "min": _unzigzag(dates[1][0]) if 1 in dates else None,
            "max": _unzigzag(dates[2][0]) if 2 in dates else None,
        }
    return out


def read_orc_tail(data: bytes) -> dict[str, Any]:
    """Raw ORC file bytes -> interpreted tail:
    {"compression", "num_rows", "stripes": [{"num_rows", "offset"}...],
     "file_stats": [per-column stats], "stripe_stats":
     [[per-column stats] per stripe]}."""
    if data[:3] != b"ORC":
        raise ValueError("not an ORC file (magic missing)")
    ps_len = data[-1]
    ps_end = len(data) - 1
    ps = decode_message(data[ps_end - ps_len : ps_end])
    if (ps.get(8000, [b""])[0]) != b"ORC":
        raise ValueError("ORC PostScript magic missing")
    codec = ps.get(2, [0])[0]
    foot_len = ps[1][0]
    meta_len = ps.get(5, [0])[0]
    foot_start = ps_end - ps_len - foot_len
    footer = decode_message(_unchunk(data[foot_start : ps_end - ps_len],
                                     codec))
    stripes = [decode_message(s) for s in footer.get(3, [])]
    meta_raw = data[foot_start - meta_len : foot_start]
    meta = decode_message(_unchunk(meta_raw, codec)) if meta_len else {}
    return {
        "compression": _COMPRESSION.get(codec, str(codec)),
        "num_rows": footer[6][0],
        "n_types": len(footer.get(4, [])),
        "stripes": [
            {"offset": s[1][0], "num_rows": s[5][0]} for s in stripes
        ],
        "file_stats": [_col_stats(c) for c in footer.get(7, [])],
        "stripe_stats": [
            [_col_stats(c) for c in decode_message(ss).get(1, [])]
            for ss in meta.get(1, [])
        ],
    }


# ---------------------------------------------------------------------------
# fixture + registered query
# ---------------------------------------------------------------------------

def stripe_date_ranges(
    tail: dict[str, Any], date_col: int
) -> list[dict[str, int]]:
    """Per-stripe {min, max} day ranges for column `date_col`, for
    stripe pruning. When the tail has NO Metadata section (no
    StripeStatistics — the spec makes it optional), nothing can be
    pruned: every stripe is assigned the file-level range, which
    intersects any window the file intersects, so the planner reads
    ALL stripes instead of silently collapsing a multi-stripe file
    to a single pseudo-stripe (a reader that did that would drop
    every row outside stripe 0)."""
    if tail["stripe_stats"]:
        return [sc[date_col]["date"] for sc in tail["stripe_stats"]]
    file_range = tail["file_stats"][date_col]["date"]
    return [file_range] * len(tail["stripes"])


_ORC_LO = dt.date(1995, 4, 1)
_ORC_HI = dt.date(1996, 3, 31)


def _write_orc_fixture(spark: SparkSession, sf_dir: str, root: str) -> str:
    """orders (orderkey, orderdate AS DATE, totalprice) date-sorted,
    written as one snappy-compressed ORC file with 64 KiB stripes
    (pyarrow's ORC writer — a real engine's writer; the hand-built
    part is the tail READER). Stripe boundaries are byte-driven and
    therefore sf-dependent, so the oracle pins whole-file aggregates
    and consistency booleans, never stripe counts."""
    import pyarrow.orc as po

    tbl = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
        )
        .sort("o_orderdate", "o_orderkey")
        .toArrow()
    )
    path = os.path.join(root, "orders_sorted.orc")
    po.write_table(tbl, path, stripe_size=64 * 1024, compression="snappy")
    return path


@register(
    "source_orc_stripe_skipping",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_orderkey,
               min(o_orderkey) AS min_orderkey,
               max(o_orderkey) AS max_orderkey,
               min(CAST(o_orderdate AS DATE)) AS min_orderdate,
               max(CAST(o_orderdate AS DATE)) AS max_orderdate,
               TRUE AS stripes_consistent,
               CAST((SELECT count(*) FROM orders
                     WHERE CAST(o_orderdate AS DATE)
                           BETWEEN DATE '1995-04-01' AND DATE '1996-03-31')
                    AS BIGINT) AS n_in_window,
               (SELECT {sql_dsum('o_totalprice')} FROM orders
                WHERE CAST(o_orderdate AS DATE)
                      BETWEEN DATE '1995-04-01' AND DATE '1996-03-31')
                   AS revenue_in_window
        FROM orders
    """,
    tags=("source", "orc", "metadata", "protobuf", "data-skipping"),
)
def source_orc_stripe_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC tail statistics + stripe min/max pruning, read WITHOUT the
    ORC library (round 10): the PostScript/footer/metadata protobuf
    walk above — through the repo's own snappy codec for the chunked
    sections — yields file-level IntegerStatistics (zigzag min/max/
    sum of o_orderkey) and DateStatistics, cross-stripe consistency
    (stripe rows sum to numberOfRows; stripe-stat extrema reproduce
    the file extrema), and per-stripe date ranges that PLAN a
    two-fiscal-quarter scan: only stripes whose [min,max] intersect
    the window are read (one `read_stripe` per task), with the
    residual filter exact.

    Every emitted number is recomputed by the DuckDB oracle from the
    raw table — decoded stats must equal true aggregates, and a
    wrongly-pruned stripe flips n_in_window/revenue_in_window.
    Stripe boundaries are byte-driven (sf-dependent), so pruning
    effectiveness is attested by construction (selected ⊆ stripes,
    equality of the window aggregate) rather than pinned counts.

    Scale posture: planning is O(tail bytes) + O(#stripes) arithmetic
    driver-side — the same contract as real ORC split planning; data
    pages of pruned stripes are never read."""
    root = os.path.join(scratch_root(), f"shs_orc_{uuid.uuid4().hex}")
    os.makedirs(root)
    path = _write_orc_fixture(spark, sf_dir, root)
    with open(path, "rb") as fh:
        tail = read_orc_tail(fh.read())

    # schema: col 0 is the root struct; 1=o_orderkey, 2=o_orderdate
    key_stats = tail["file_stats"][1]["int"]
    date_stats = tail["file_stats"][2]["date"]
    epoch = dt.date(1970, 1, 1)
    stripe_rows = [s["num_rows"] for s in tail["stripes"]]
    per_stripe_dates = stripe_date_ranges(tail, date_col=2)
    consistent = sum(stripe_rows) == tail["num_rows"]
    if tail["stripe_stats"]:
        consistent = (
            consistent
            and min(d["min"] for d in per_stripe_dates) == date_stats["min"]
            and max(d["max"] for d in per_stripe_dates) == date_stats["max"]
            and all(
                ss[1]["num_values"] == s_rows
                for ss, s_rows in zip(tail["stripe_stats"], stripe_rows)
            )
            and sum(
                ss[1]["int"]["sum"] for ss in tail["stripe_stats"]
            ) == key_stats["sum"]
        )

    lo_days = (_ORC_LO - epoch).days
    hi_days = (_ORC_HI - epoch).days
    selected = [
        i
        for i, d in enumerate(per_stripe_dates)
        if not (d["max"] < lo_days or d["min"] > hi_days)
    ]
    plan = spark.createDataFrame(
        [(path, i) for i in selected], "path string, stripe int"
    ).repartition(max(len(selected), 1))

    def _read_stripes(batches) -> Iterator:
        import pyarrow.orc as po

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                of = po.ORCFile(rec.path)
                yield of.read_stripe(
                    rec.stripe, columns=["o_orderdate", "o_totalprice"]
                ).to_pandas()

    window = plan.mapInPandas(
        _read_stripes, "o_orderdate date, o_totalprice double"
    ).filter(
        (F.col("o_orderdate") >= F.lit(_ORC_LO))
        & (F.col("o_orderdate") <= F.lit(_ORC_HI))
    )
    out = window.agg(
        F.lit(int(tail["num_rows"])).cast("bigint").alias("n_rows"),
        F.lit(int(key_stats["sum"])).cast("bigint").alias("sum_orderkey"),
        F.lit(int(key_stats["min"])).cast("bigint").alias("min_orderkey"),
        F.lit(int(key_stats["max"])).cast("bigint").alias("max_orderkey"),
        F.lit(epoch + dt.timedelta(days=date_stats["min"])).alias(
            "min_orderdate"
        ),
        F.lit(epoch + dt.timedelta(days=date_stats["max"])).alias(
            "max_orderdate"
        ),
        F.lit(bool(consistent)).alias("stripes_consistent"),
        F.count("*").alias("n_in_window"),
        dsum("o_totalprice").alias("revenue_in_window"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# ORC data streams: RLEv2 integers + boolean PRESENT — read by hand
# ---------------------------------------------------------------------------

_FBS = tuple(range(1, 25)) + (26, 28, 30, 32, 40, 48, 56, 64)


def _closest_fbs(bits: int) -> int:
    """Round a bit width UP to the nearest FixedBitSizes entry — the
    rounding the PATCHED_BASE patch list is packed at (ORC spec +
    RunLengthIntegerWriterV2.preparePatchedBlob: closestFixedBits of
    patchGapWidth + patchWidth, NOT the byte-aligned family). Using
    the aligned family here mis-frames every patch list whose summed
    width has a non-aligned FBS entry (e.g. 10 bits) — a latent bug
    sf1-scale data exposed in round 13: runs 0-80 of a real stream
    decoded fine, run 81's 10-bit patch list read as 16-bit produced
    gaps past the run length."""
    for a in _FBS:
        if bits <= a:
            return a
    raise ValueError(f"no fixed bit size for {bits} bits")


def _svarint(b: bytes, p: int) -> tuple[int, int]:
    u, p = _uvarint(b, p)
    return _unzigzag(u), p


def _read_bits_msb(
    b: bytes, p: int, width: int, count: int
) -> tuple[list[int], int]:
    """MSB-first bit-unpacking of ``count`` ``width``-bit values,
    advancing to the next byte boundary (ORC's packing rule)."""
    out = []
    bitpos = 0
    for _ in range(count):
        v = 0
        for _ in range(width):
            byte_idx = p + (bitpos >> 3)
            if byte_idx >= len(b):
                raise TruncatedRun(
                    "bit-packed run overruns the stream"
                )
            v = (v << 1) | ((b[byte_idx] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        out.append(v)
    return out, p + ((bitpos + 7) >> 3)


def decode_rlev2(
    b: bytes, signed: bool = True, max_values: int | None = None,
    resumable: bool = False
) -> list[int] | tuple[list[int], int]:
    """ORC RunLength-v2 integer decoding (ORCv1 spec §Run Length
    Encoding v2) — ALL FOUR sub-encodings: SHORT_REPEAT (3-10 copies
    of a 1-8-byte big-endian value), DIRECT (9-bit length, FBS-coded
    bit width, MSB-first packing), DELTA (zigzag base + signed first
    delta, then unsigned delta magnitudes at the coded width, or a
    fixed-delta run at width 0), and PATCHED_BASE (sign-magnitude
    base, reduced-width values, and a patch list of (gap, patch)
    pairs packed at the ALIGNED combined width, restoring outlier
    high bits). Signed streams zigzag in SHORT_REPEAT/DIRECT per the
    spec; DELTA bases zigzag only when signed.

    ``max_values`` (round 15, row-index seeking): stop decoding as
    soon as that many values are out — a seek-decode starting at a
    ROW_INDEX byte position only pays for the row groups it serves,
    never the stream tail (the cap may overshoot by at most one run,
    which is the encoding's seek granularity).

    ``resumable`` (round 16, chunk-indirected seeking): return
    ``(values, consumed)`` where ``consumed`` is the byte offset
    after the last COMPLETELY decoded run; a run truncated by the
    buffer end returns what precedes it instead of raising, so a
    caller feeding compression chunks incrementally decodes every
    byte exactly ONCE (re-decoding the growing buffer per chunk is
    quadratic in the chunks a row group spans). Safe because every
    run either appends atomically or raises before appending — all
    four sub-encodings bounds-check their payload reads. Resumption
    triggers ONLY on `TruncatedRun` (a read past the buffer end);
    in-buffer corruption — a patch gap past the run, an impossible
    width — raises plain ValueError straight through, so the chunk
    feeder fails at the corrupt run instead of draining its
    remaining chunks first (round-17 ADVICE)."""
    out: list[int] = []
    p = 0
    run_start = 0
    while p < len(b):
        run_start = p
        if max_values is not None and len(out) >= max_values:
            break
        try:
            h = b[p]
            enc = h >> 6
            if enc == 0:  # SHORT_REPEAT
                w = ((h >> 3) & 7) + 1
                rep = (h & 7) + 3
                if p + 1 + w > len(b):
                    raise TruncatedRun("truncated SHORT_REPEAT run")
                v = int.from_bytes(b[p + 1 : p + 1 + w], "big")
                p += 1 + w
                out += [_unzigzag(v) if signed else v] * rep
            elif enc == 1:  # DIRECT
                width = _FBS[(h >> 1) & 31]
                if p + 1 >= len(b):
                    raise TruncatedRun("truncated DIRECT header")
                length = ((h & 1) << 8 | b[p + 1]) + 1
                vals, p = _read_bits_msb(b, p + 2, width, length)
                out += [_unzigzag(v) for v in vals] if signed else vals
            elif enc == 3:  # DELTA: length+1 total values incl. the base
                wcode = (h >> 1) & 31
                width = 0 if wcode == 0 else _FBS[wcode]
                if p + 1 >= len(b):
                    raise TruncatedRun("truncated DELTA header")
                total = ((h & 1) << 8 | b[p + 1]) + 1
                p += 2
                base, p = _svarint(b, p) if signed else _uvarint(b, p)
                delta0, p = _svarint(b, p)
                vals = [base]
                if total > 1:
                    vals.append(base + delta0)
                if width and total > 2:
                    rest, p = _read_bits_msb(b, p, width, total - 2)
                    sign = 1 if delta0 >= 0 else -1
                    cur = vals[-1]
                    for d in rest:
                        cur += sign * d
                        vals.append(cur)
                else:
                    while len(vals) < total:
                        vals.append(vals[-1] + delta0)
                out += vals[:total]
            else:  # PATCHED_BASE
                w = _FBS[(h >> 1) & 31]
                if p + 3 >= len(b):
                    raise TruncatedRun("truncated PATCHED_BASE header")
                length = ((h & 1) << 8 | b[p + 1]) + 1
                third, fourth = b[p + 2], b[p + 3]
                bw = ((third >> 5) & 7) + 1
                pw = _FBS[third & 31]
                pgw = ((fourth >> 5) & 7) + 1
                pll = fourth & 31
                p += 4
                if p + bw > len(b):
                    raise TruncatedRun("truncated PATCHED_BASE base")
                base = int.from_bytes(b[p : p + bw], "big")
                msb = 1 << (bw * 8 - 1)
                if base & msb:  # sign-magnitude, not two's complement
                    base = -(base ^ msb)
                p += bw
                vals, p = _read_bits_msb(b, p, w, length)
                patches, p = _read_bits_msb(
                    b, p, _closest_fbs(pgw + pw), pll
                )
                idx = 0
                for pv in patches:
                    gap = pv >> pw
                    patch = pv & ((1 << pw) - 1)
                    idx += gap
                    if patch:  # (255, 0) entries only advance the cursor
                        if idx >= length:
                            # in-buffer corruption, not truncation —
                            # more bytes cannot fix a bad gap
                            raise ValueError(
                                "PATCHED_BASE patch gap overruns "
                                "the run"
                            )
                        vals[idx] |= patch << w
                out += [base + v for v in vals]
        except TruncatedRun:
            if resumable:
                return out, run_start
            raise
    return (out, p) if resumable else out


def decode_byte_rle(b: bytes) -> bytes:
    """ORC byte-level RLE (v1): control < 128 -> control+3 copies of
    the next byte; control >= 128 -> 256-control literal bytes."""
    out = bytearray()
    p = 0
    while p < len(b):
        c = b[p]
        p += 1
        if c < 128:
            if p >= len(b):
                raise ValueError("truncated byte-RLE run")
            out += bytes([b[p]]) * (c + 3)
            p += 1
        else:
            n = 256 - c
            if p + n > len(b):
                raise ValueError("truncated byte-RLE literals")
            out += b[p : p + n]
            p += n
    return bytes(out)


def decode_present(b: bytes, count: int) -> list[int]:
    """PRESENT stream: byte-RLE over a bitmap, bits MSB-first."""
    raw = decode_byte_rle(b)
    bits: list[int] = []
    for byte in raw:
        for k in range(8):
            bits.append((byte >> (7 - k)) & 1)
    if len(bits) < count:
        raise ValueError("PRESENT stream shorter than the row count")
    return bits[:count]


def read_orc_int64_column(
    data: bytes, column: int = 1
) -> tuple[list[int | None], int]:
    """Read one int64 column's VALUES from raw ORC bytes — no ORC
    library anywhere on the path: postscript/footer protobuf, per-
    stripe footers (stream directory + column encodings), chunk
    decompression via the repo's codecs, the PRESENT bitmap, and
    RLEv2 DATA streams. -> (values with None for nulls, n_stripes).

    Loud seams: non-DIRECT_V2 column encodings and stream kinds
    other than PRESENT/DATA/ROW_INDEX for the target column."""
    ps_len = data[-1]
    ps_end = len(data) - 1
    ps = decode_message(data[ps_end - ps_len : ps_end])
    codec = ps.get(2, [0])[0]
    foot_len = ps[1][0]
    footer = decode_message(
        _unchunk(data[ps_end - ps_len - foot_len : ps_end - ps_len], codec)
    )
    out: list[int | None] = []
    stripes = footer.get(3, [])
    for sraw in stripes:
        st = decode_message(sraw)
        off, ilen, dlen, flen, nrows = (
            st[1][0], st[2][0], st[3][0], st[4][0], st[5][0]
        )
        sfoot = decode_message(
            _unchunk(data[off + ilen + dlen : off + ilen + dlen + flen],
                     codec)
        )
        encodings = [decode_message(e).get(1, [0])[0] for e in sfoot[2]]
        if encodings[column] not in (0, 2):  # DIRECT (v1) / DIRECT_V2
            raise NotImplementedError(
                f"ORC column encoding {encodings[column]}"
            )
        pos = off
        present_raw = data_raw = None
        for s in sfoot[1]:
            m = decode_message(s)
            kind, col, ln = m.get(1, [0])[0], m.get(2, [0])[0], m[3][0]
            if col == column and kind == 0:  # PRESENT
                present_raw = data[pos : pos + ln]
            elif col == column and kind == 1:  # DATA
                data_raw = data[pos : pos + ln]
            elif col == column and kind != 6:  # ROW_INDEX is fine
                raise NotImplementedError(f"ORC stream kind {kind}")
            pos += ln
        if data_raw is None:
            raise ValueError("ORC stripe missing the DATA stream")
        vals = _int_rle_decode(
            encodings[column], _unchunk(data_raw, codec), signed=True
        )
        if present_raw is None:
            if len(vals) != nrows:
                raise ValueError("DATA stream row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(present_raw, codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if bit else None for bit in bits]
    return out, len(stripes)


@register(
    "source_orc_rlev2_decode",
    oracle="""
        WITH v AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_orderkey END AS val
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
               CAST(sum(val) AS BIGINT) AS val_sum,
               CAST(min(val) AS BIGINT) AS val_min,
               CAST(max(val) AS BIGINT) AS val_max,
               TRUE AS decode_consistent
        FROM v
    """,
    tags=("source", "orc", "rlev2", "encoding", "data-read"),
)
def source_orc_rlev2_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC DATA streams decoded by hand (round 10) — the columnar
    capstone matching `source_parquet_spark_native_decode`: a real
    engine's ORC file (pyarrow writer, snappy chunks, 64 KiB stripes)
    is read back with NO ORC LIBRARY anywhere on the path —
    postscript/footer protobuf, per-stripe footers (stream directory
    + column encodings), the PRESENT bitmap (byte-RLE + MSB-first
    bits; the fixture nulls every o_orderkey divisible by 97, so the
    bitmap carries real mixed runs), and the RLEv2 integer DATA
    stream with all four sub-encodings implemented (SHORT_REPEAT /
    DIRECT / DELTA / PATCHED_BASE — `decode_rlev2` above, exercised
    against every sub-encoding by the pyarrow differential pytest).

    The oracle recomputes count/nulls/sum/min/max from the raw
    table; ``decode_consistent`` additionally pins engine-side that
    the decoded row count equals the footer's numberOfRows, that
    non-null counts match the file-level IntegerStatistics
    num_values, and that decoded extrema equal the independently
    decoded statistics.

    Scale posture: one task reads the file (files/stripes are the
    split unit); the pure-python RLEv2 walk is the format-layer
    demonstrator — production scans stay on the JVM reader this
    query certifies against."""
    import pandas as _pd
    import pyarrow as _pa
    import pyarrow.orc as _po

    root = os.path.join(
        scratch_root(), f"shs_orcd_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    keys = (
        t(spark, sf_dir, "orders").select("o_orderkey")
        .sort("o_orderkey").toArrow()["o_orderkey"].to_pylist()
    )
    vals = [None if k % 97 == 0 else k for k in keys]
    path = os.path.join(root, "orders_keys.orc")
    _po.write_table(
        _pa.table({"val": _pa.array(vals, _pa.int64())}),
        path, stripe_size=64 * 1024, compression="snappy",
    )

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                values, n_stripes = read_orc_int64_column(data)
                present = [v for v in values if v is not None]
                ints = tail["file_stats"][1]["int"]
                consistent = (
                    len(values) == tail["num_rows"]
                    and n_stripes == len(tail["stripes"])
                    and len(present)
                        == tail["file_stats"][1]["num_values"]
                    and min(present) == ints["min"]
                    and max(present) == ints["max"]
                    and sum(present) == ints["sum"]
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
                         "val_max", "decode_consistent"],
            )

    out = plan.mapInPandas(
        _decode,
        "n_rows bigint, n_nulls bigint, val_sum bigint,"
        " val_min bigint, val_max bigint, decode_consistent boolean",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


_ORC_TS_BASE = 1420070400  # 2015-01-01 00:00:00 UTC, the spec's epoch


def _stripe_streams(
    data: bytes, codec: int, sraw: bytes, column: int
) -> tuple[dict[int, bytes], int, list[dict], str | None]:
    """One StripeInformation -> ({stream kind: raw bytes} for
    ``column``, stripe row count, per-column encoding messages,
    writer timezone — StripeFooter field 3, None when absent)."""
    st = decode_message(sraw)
    off, ilen, dlen, flen, nrows = (
        st[1][0], st[2][0], st[3][0], st[4][0], st[5][0]
    )
    sfoot = decode_message(
        _unchunk(data[off + ilen + dlen : off + ilen + dlen + flen],
                 codec)
    )
    enc_msgs = [decode_message(e) for e in sfoot[2]]
    wtz_raw = sfoot.get(3, [None])[0]
    writer_tz = (
        wtz_raw.decode("utf-8") if isinstance(wtz_raw, bytes) else wtz_raw
    )
    pos = off
    streams: dict[int, bytes] = {}
    for s in sfoot[1]:
        m = decode_message(s)
        kind, col, ln = m.get(1, [0])[0], m.get(2, [0])[0], m[3][0]
        if col == column and kind != 6:  # ROW_INDEX not needed
            streams[kind] = data[pos : pos + ln]
        pos += ln
    return streams, nrows, enc_msgs, writer_tz


_UTC_TZ_NAMES = frozenset(
    {"UTC", "GMT", "Etc/UTC", "Etc/GMT", "GMT0", "Greenwich",
     "Universal", "Zulu", "Z", "UCT", "Etc/UCT", "Etc/Greenwich",
     "Etc/Universal", "Etc/Zulu", "Etc/GMT0", "Etc/GMT+0",
     "Etc/GMT-0"}
)


def _orc_ts_base(writer_tz: str | None) -> int:
    """Epoch seconds of the ORC timestamp base (2015-01-01 00:00:00)
    in the stripe's writer timezone. ORC TIMESTAMP is wall-clock
    (timezone-less) semantics: the writer stores seconds since the
    base *in its own zone* and records that zone in the stripe footer
    so readers reproduce the wall clock exactly; verified empirically
    against Spark's bundled ORC writer under both Etc/UTC and
    America/New_York JVM zones. Unknown zone names stay a loud seam."""
    if writer_tz is None or writer_tz in _UTC_TZ_NAMES:
        return _ORC_TS_BASE
    try:
        from zoneinfo import ZoneInfo

        zone = ZoneInfo(writer_tz)
    except Exception as exc:  # missing tzdata entry / bad name
        raise NotImplementedError(
            f"ORC writer timezone {writer_tz!r} not resolvable"
        ) from exc
    import datetime as _dt

    return int(_dt.datetime(2015, 1, 1, tzinfo=zone).timestamp())


def _orc_file_tail(data: bytes) -> tuple[dict, int]:
    ps_len = data[-1]
    ps_end = len(data) - 1
    ps = decode_message(data[ps_end - ps_len : ps_end])
    codec = ps.get(2, [0])[0]
    foot_len = ps[1][0]
    footer = decode_message(
        _unchunk(data[ps_end - ps_len - foot_len : ps_end - ps_len],
                 codec)
    )
    return footer, codec


def read_orc_double_column(
    data: bytes, column: int = 1
) -> tuple[list[float | None], int]:
    """Read one DOUBLE column from raw ORC bytes: the DATA stream is
    plain IEEE 754 little-endian 8-byte values (present rows only),
    plus the PRESENT bitmap — the simplest ORC physical layout and
    the one every revenue/measure column uses."""
    footer, codec = _orc_file_tail(data)
    out: list[float | None] = []
    stripes = footer.get(3, [])
    for sraw in stripes:
        streams, nrows, _enc, _wtz = _stripe_streams(data, codec, sraw, column)
        if 1 not in streams:
            raise ValueError("ORC double stripe missing DATA")
        raw = _unchunk(streams[1], codec)
        if len(raw) % 8:
            raise ValueError("double DATA stream not 8-byte aligned")
        vals = list(struct.unpack(f"<{len(raw) // 8}d", raw))
        if 0 not in streams:
            if len(vals) != nrows:
                raise ValueError("double DATA row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(streams[0], codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if b else None for b in bits]
    return out, len(stripes)


def read_orc_timestamp_column(
    data: bytes, column: int = 1
) -> tuple[list[int | None], int]:
    """Read one TIMESTAMP column from raw ORC bytes -> wall-clock
    MICROSECONDS since the epoch (ORC TIMESTAMP is timezone-less
    wall-clock semantics; under a UTC writer+reader this IS the
    instant). The spec's two-stream layout: DATA is signed RLEv2
    SECONDS relative to 2015-01-01 00:00:00 *in the writer timezone*
    recorded in each stripe footer (negative for anything older —
    most data); SECONDARY is unsigned RLEv2 nanoseconds with the
    trailing-zeros trick: the low 3 bits ``c`` are 0 when no zeros
    were stripped, else ``c + 1`` zeros were —
    nanos = (v >> 3) * 10^(c+1 if c else 0).

    Three quirks verified empirically against BOTH writer lineages:
    (1) the base offset must come from the writer timezone (Spark
    under Etc/UTC and America/New_York JVM zones) or every value in a
    non-UTC-written file shifts by the zone offset; (2) the JAVA
    writer truncates millis/1000 toward zero and keeps nanos
    POSITIVE, so the reader subtracts 1 second whenever the absolute
    seconds are negative and nanos are nonzero; (3) the C++ writer
    (pyarrow, Impala) instead keeps the trunc-toward-zero NEGATIVE
    remainder: it trailing-zero-encodes a SIGNED nano value — e.g.
    -0.5 s is secs 0 + encoded (-5<<3)|7 = -33 — and stores it in
    the nominally-unsigned SECONDARY stream as 64-bit
    two's-complement. The reader re-signs values >= 2^63 and adds
    the (negative) nanos directly, no -1s adjustment."""
    footer, codec = _orc_file_tail(data)
    out: list[int | None] = []
    stripes = footer.get(3, [])
    for sraw in stripes:
        streams, nrows, enc_msgs, wtz = _stripe_streams(
            data, codec, sraw, column
        )
        base = _orc_ts_base(wtz)
        if 1 not in streams or 5 not in streams:
            raise ValueError(
                "ORC timestamp stripe missing DATA/SECONDARY"
            )
        # round 15: DATA/SECONDARY follow the column's declared
        # encoding — DIRECT(0) under a 0.11 writer is RLEv1 (same
        # 2015 base + nano trailing-zero trick, only the int
        # encoding differs), DIRECT_V2(2) is RLEv2
        enc = enc_msgs[column].get(1, [0])[0]
        secs = _int_rle_decode(
            enc, _unchunk(streams[1], codec), signed=True
        )
        nanos_enc = _int_rle_decode(
            enc, _unchunk(streams[5], codec), signed=False
        )
        if len(secs) != len(nanos_enc):
            raise ValueError("timestamp DATA/SECONDARY length mismatch")
        vals: list[int] = []
        for s, v in zip(secs, nanos_enc):
            if v >= 1 << 63:  # C++ writer: signed value, 2^64-wrapped
                v -= 1 << 64
            c = v & 7
            nanos = (v >> 3) * (10 ** (c + 1) if c else 1)
            if not -1_000_000_000 < nanos < 1_000_000_000:
                raise ValueError(f"decoded nanos {nanos} out of range")
            abs_secs = s + base
            if nanos < 0:
                # C++ convention: negative trunc remainder rides the
                # nano field; add it directly (abs_secs is the
                # toward-zero truncation already)
                vals.append(abs_secs * 1_000_000 + nanos // 1_000)
            else:
                if abs_secs < 0 and nanos:
                    # Java convention: positive nanos + trunc-toward-
                    # zero seconds need the -1 s compensation
                    abs_secs -= 1
                vals.append(abs_secs * 1_000_000 + nanos // 1_000)
        if 0 not in streams:
            if len(vals) != nrows:
                raise ValueError("timestamp row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(streams[0], codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if b else None for b in bits]
    return out, len(stripes)


def read_orc_date_column(
    data: bytes, column: int = 1
) -> tuple[list[int | None], int]:
    """Read one DATE column from raw ORC bytes -> days since
    1970-01-01 (signed RLEv2 DATA + PRESENT), completing the scalar
    type floor next to int64/double/timestamp/string."""
    footer, codec = _orc_file_tail(data)
    out: list[int | None] = []
    stripes = footer.get(3, [])
    for sraw in stripes:
        streams, nrows, enc_msgs, _wtz = _stripe_streams(
            data, codec, sraw, column
        )
        if 1 not in streams:
            raise ValueError("ORC date stripe missing DATA")
        vals = _int_rle_decode(
            enc_msgs[column].get(1, [0])[0],
            _unchunk(streams[1], codec), signed=True,
        )
        if 0 not in streams:
            if len(vals) != nrows:
                raise ValueError("date DATA row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(streams[0], codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if b else None for b in bits]
    return out, len(stripes)


def read_orc_string_column(
    data: bytes, column: int = 1
) -> tuple[list[str | None], int]:
    """Read one string column's values from raw ORC bytes, both spec
    encodings: DIRECT_V2 (a LENGTH stream — RLEv2 unsigned — sizing
    each value, DATA = the concatenated UTF-8 bytes; what pyarrow
    writes) and DICTIONARY_V2 (LENGTH sizes the dictionarySize sorted
    dictionary entries carried in DICTIONARY_DATA, and DATA becomes
    unsigned-RLEv2 dictionary INDICES — what Spark's JVM writer emits
    for low-cardinality columns), plus the PRESENT bitmap for
    nullable rows. -> (values, n_stripes)."""
    ps_len = data[-1]
    ps_end = len(data) - 1
    ps = decode_message(data[ps_end - ps_len : ps_end])
    codec = ps.get(2, [0])[0]
    foot_len = ps[1][0]
    footer = decode_message(
        _unchunk(data[ps_end - ps_len - foot_len : ps_end - ps_len], codec)
    )
    out: list[str | None] = []
    stripes = footer.get(3, [])
    for sraw in stripes:
        st = decode_message(sraw)
        off, ilen, dlen, flen, nrows = (
            st[1][0], st[2][0], st[3][0], st[4][0], st[5][0]
        )
        sfoot = decode_message(
            _unchunk(data[off + ilen + dlen : off + ilen + dlen + flen],
                     codec)
        )
        enc_msgs = [decode_message(e) for e in sfoot[2]]
        encoding = enc_msgs[column].get(1, [0])[0]
        # 0/1 = DIRECT/DICTIONARY (RLEv1, ORC 0.11 files);
        # 2/3 = DIRECT_V2/DICTIONARY_V2 (RLEv2)
        if encoding not in (0, 1, 2, 3):
            raise NotImplementedError(
                f"ORC string encoding {encoding}"
            )
        pos = off
        present_raw = data_raw = length_raw = dict_raw = None
        for s in sfoot[1]:
            m = decode_message(s)
            kind, col, ln = m.get(1, [0])[0], m.get(2, [0])[0], m[3][0]
            if col == column and kind == 0:
                present_raw = data[pos : pos + ln]
            elif col == column and kind == 1:
                data_raw = data[pos : pos + ln]
            elif col == column and kind == 2:
                length_raw = data[pos : pos + ln]
            elif col == column and kind == 3:
                dict_raw = data[pos : pos + ln]
            elif col == column and kind != 6:
                raise NotImplementedError(f"ORC stream kind {kind}")
            pos += ln
        if data_raw is None or length_raw is None:
            raise ValueError("ORC string stripe missing DATA/LENGTH")
        lengths = _int_rle_decode(
            encoding, _unchunk(length_raw, codec), signed=False
        )

        def _split(blob: bytes, lens: list[int]) -> list[str]:
            parts: list[str] = []
            bp = 0
            for ln_ in lens:
                parts.append(blob[bp : bp + ln_].decode("utf-8"))
                bp += ln_
            if bp != len(blob):
                raise ValueError("string stream has trailing bytes")
            return parts

        if encoding in (1, 3):  # DICTIONARY / DICTIONARY_V2
            if dict_raw is None:
                raise ValueError(
                    "DICTIONARY stripe missing DICTIONARY_DATA"
                )
            dict_size = enc_msgs[column].get(2, [None])[0]
            if dict_size is not None and len(lengths) != dict_size:
                raise ValueError(
                    "LENGTH count disagrees with dictionarySize"
                )
            entries = _split(_unchunk(dict_raw, codec), lengths)
            idx = _int_rle_decode(
                encoding, _unchunk(data_raw, codec), signed=False
            )
            strs = [entries[i] for i in idx]
        else:  # DIRECT / DIRECT_V2
            strs = _split(_unchunk(data_raw, codec), lengths)
        if present_raw is None:
            if len(strs) != nrows:
                raise ValueError("LENGTH stream row count mismatch")
            out += strs
        else:
            bits = decode_present(_unchunk(present_raw, codec), nrows)
            if sum(bits) != len(strs):
                raise ValueError("PRESENT bits disagree with LENGTH count")
            it = iter(strs)
            out += [next(it) if bit else None for bit in bits]
    return out, len(stripes)


@register(
    "source_orc_timestamp_double_decode",
    oracle=f"""
        WITH v AS (
            SELECT CASE WHEN o_orderkey % 89 = 0 THEN NULL
                   ELSE epoch_us(o_orderdate)
                        + (o_orderkey % 86400) * 1000000
                        + (o_orderkey % 1000) * 1000
                        + o_orderkey % 97
                   END AS us,
                   CASE WHEN o_orderkey % 53 = 0 THEN NULL
                        ELSE o_totalprice END AS d
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(us) AS BIGINT) AS ts_nulls,
               CAST(min(us) AS BIGINT) AS min_us,
               CAST(max(us) AS BIGINT) AS max_us,
               CAST(sum(us // 1000000 - 700000000) AS BIGINT)
                   AS sum_off_sec,
               CAST(count(*) - count(d) AS BIGINT) AS d_nulls,
               {sql_dsum('d')} AS revenue,
               TRUE AS orc_ts_consistent
        FROM v
    """,
    tags=("source", "orc", "timestamp", "double", "data-read"),
)
def source_orc_timestamp_double_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC TIMESTAMP + DOUBLE columns decoded by hand (round 12) —
    completing the ORC type floor (int64 and string landed rounds
    10-11) on the format the REFERENCE engine itself sinks to
    (CollegeScorecard.scala writes ORC tables): timestamps are the
    spec's two-stream layout — signed RLEv2 seconds from the
    2015-01-01 epoch (negative for the TPC-H date range, exercising
    the signed path) + unsigned RLEv2 nanoseconds carrying the
    trailing-zeros trick in the low 3 bits, with the fixture mixing
    millisecond-, microsecond-, and zero-fraction values so all three
    zero-stripping shapes occur — and doubles are plain IEEE 754 LE
    DATA bytes behind the PRESENT bitmap, all under Spark's ZSTD ORC
    chunks through the repo's own decoder.

    The oracle recomputes epoch micros via DuckDB's own timestamp
    arithmetic and the exact-cents revenue: a 2015-epoch slip shifts
    everything by 1.42e15 us, a trailing-zeros bug scales fractions
    by powers of 10, a PRESENT misalignment shuffles values into the
    wrong rows on BOTH columns at once.

    Scale posture: the fixture is written as 8 Spark ORC files and
    decoded one file per task (files, then stripes, are ORC's split
    units); per-file partial aggregates combine in one reduce.
    Production ORC scans stay on the JVM reader this certifies
    against."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orctd_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 89 = 0 THEN CAST(NULL AS TIMESTAMP)
                 ELSE timestamp_micros(CAST(
                     unix_micros(CAST(o_orderdate AS TIMESTAMP))
                     + (o_orderkey % 86400) * 1000000
                     + (o_orderkey % 1000) * 1000
                     + o_orderkey % 97 AS BIGINT))
            END AS ts
            """,
            """
            CASE WHEN o_orderkey % 53 = 0 THEN CAST(NULL AS DOUBLE)
                 ELSE o_totalprice END AS d
            """,
        )
        .repartition(32)  # one ORC file per decode task
        .write.orc(root)
    )
    paths = sorted(_glob.glob(os.path.join(root, "*.orc")))

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def _decode(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                ts_vals, n_stripes = read_orc_timestamp_column(data, 1)
                d_vals, _ = read_orc_double_column(data, 2)
                ts_present = [v for v in ts_vals if v is not None]
                d_present = [v for v in d_vals if v is not None]
                ok = (
                    len(ts_vals) == tail["num_rows"]
                    and len(d_vals) == tail["num_rows"]
                    and n_stripes == len(tail["stripes"])
                )
                yield _pd.DataFrame(
                    [(
                        len(ts_vals),
                        len(ts_vals) - len(ts_present),
                        min(ts_present), max(ts_present),
                        sum(v // 1_000_000 - 700_000_000
                            for v in ts_present),
                        len(d_vals) - len(d_present),
                        sum(round(v * 100) for v in d_present),
                        bool(ok),
                    )],
                    columns=["n_rows", "ts_nulls", "min_us", "max_us",
                             "sum_off_sec", "d_nulls", "cents", "ok"],
                )

    partials = plan.mapInPandas(
        _decode,
        "n_rows bigint, ts_nulls bigint, min_us bigint, max_us bigint,"
        " sum_off_sec bigint, d_nulls bigint, cents bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("ts_nulls").alias("ts_nulls"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
        F.sum("sum_off_sec").alias("sum_off_sec"),
        F.sum("d_nulls").alias("d_nulls"),
        (F.sum("cents").cast("decimal(18,0)") / 100)
        .cast("double").alias("revenue"),
        F.min("ok").alias("orc_ts_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# nested types: type tree + list/map/struct readers (round 13)
# ---------------------------------------------------------------------------

_ORC_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char",
}


def _packed_uvarints(blob: bytes) -> list[int]:
    """A PACKED repeated-varint protobuf field -> the int list (how
    Type.subtypes arrives; single-element repeats may come through as
    a bare int from the generic walker)."""
    out: list[int] = []
    p = 0
    while p < len(blob):
        v, p = _uvarint(blob, p)
        out.append(v)
    return out


def orc_type_tree(footer: dict) -> list[dict[str, Any]]:
    """Footer field 4 (repeated Type, pre-order by column id) ->
    [{"kind", "subtypes": [column ids], "names": [...]}] — the map a
    nested reader needs to find a list's element column, a map's
    key/value columns, or a struct's children."""
    out: list[dict[str, Any]] = []
    for traw in footer.get(4, []):
        m = decode_message(traw)
        kind = m.get(1, [0])[0]
        subs: list[int] = []
        for v in m.get(2, []):
            if isinstance(v, bytes):
                subs.extend(_packed_uvarints(v))
            else:
                subs.append(v)
        out.append({
            "kind": _ORC_KINDS.get(kind, kind),
            "subtypes": subs,
            "names": [x.decode() for x in m.get(3, [])],
        })
    return out


def _stripe_streams_multi(
    data: bytes, codec: int, sraw: bytes, columns: set[int]
) -> tuple[dict[tuple[int, int], bytes], int, list[dict]]:
    """One StripeInformation -> ({(column, stream kind): raw bytes}
    for every requested column, stripe row count, per-column encoding
    messages) — the multi-column sibling of `_stripe_streams`, which
    a nested reader needs because one logical column spans several
    physical column ids."""
    st = decode_message(sraw)
    off, ilen, dlen, flen, nrows = (
        st[1][0], st[2][0], st[3][0], st[4][0], st[5][0]
    )
    sfoot = decode_message(
        _unchunk(data[off + ilen + dlen : off + ilen + dlen + flen],
                 codec)
    )
    enc_msgs = [decode_message(e) for e in sfoot[2]]
    pos = off
    streams: dict[tuple[int, int], bytes] = {}
    for s in sfoot[1]:
        m = decode_message(s)
        kind, col, ln = m.get(1, [0])[0], m.get(2, [0])[0], m[3][0]
        if col in columns and kind != 6:  # ROW_INDEX not needed
            streams[(col, kind)] = data[pos : pos + ln]
        pos += ln
    return streams, nrows, enc_msgs


def _dec_entries(
    streams: dict[tuple[int, int], bytes],
    codec: int,
    enc_msgs: list[dict],
    tree: list[dict],
    col: int,
    n_entries: int,
) -> list:
    """Decode one child column's entries RECURSIVELY — ORC's nested
    encoding composes cleanly: every column's PRESENT bitmap is
    relative to its parent-present entries, LIST/MAP columns add a
    LENGTH stream (one count per present entry) whose children hold
    the concatenated elements, STRUCT columns are PRESENT-only with
    children holding one entry per struct-present slot. So
    list<struct>, list<list<T>>, map<_, struct>, ... all fall out of
    the same recursion. -> n_entries python values (None / scalar /
    list / dict)."""
    kind = tree[col]["kind"]
    if kind in ("list", "map", "struct"):
        present_raw = streams.get((col, 0))
        pres = (decode_present(_unchunk(present_raw, codec), n_entries)
                if present_raw is not None else [1] * n_entries)
        n_present = sum(pres)
        if kind == "struct":
            children = [
                _dec_entries(streams, codec, enc_msgs, tree, c,
                             n_present)
                for c in tree[col]["subtypes"]
            ]
            names = tree[col]["names"]
            its = [iter(ch) for ch in children]
            return [
                {n: next(i) for n, i in zip(names, its)} if b else None
                for b in pres
            ]
        length_raw = streams.get((col, 2))
        if length_raw is None:
            if n_present:
                raise ValueError(f"ORC {kind} column {col} missing "
                                 "LENGTH")
            lengths: list[int] = []
        else:
            lengths = _int_rle_decode(
                enc_msgs[col].get(1, [0])[0],
                _unchunk(length_raw, codec), signed=False,
            )
        if len(lengths) != n_present:
            raise ValueError(f"{kind} LENGTH count != present entries")
        total = sum(lengths)
        if kind == "list":
            (elem_col,) = tree[col]["subtypes"]
            elems = _dec_entries(streams, codec, enc_msgs, tree,
                                 elem_col, total)
            li, ei = iter(lengths), iter(elems)
            return [
                [next(ei) for _ in range(next(li))] if b else None
                for b in pres
            ]
        key_col, val_col = tree[col]["subtypes"]
        keys = _dec_entries(streams, codec, enc_msgs, tree, key_col,
                            total)
        vals = _dec_entries(streams, codec, enc_msgs, tree, val_col,
                            total)
        if any(k is None for k in keys):
            raise ValueError("null ORC map key")
        li, ki, vi = iter(lengths), iter(keys), iter(vals)
        return [
            {next(ki): next(vi) for _ in range(next(li))} if b
            else None
            for b in pres
        ]
    present_raw = streams.get((col, 0))
    if kind in ("varchar", "char"):
        kind = "string"  # same physical layout (LENGTH/DATA/DICT)
    if kind == "long":
        data_raw = streams.get((col, 1))
        if data_raw is None:
            if n_entries:
                raise ValueError(f"ORC column {col} missing DATA")
            return []
        vals = _int_rle_decode(
            enc_msgs[col].get(1, [0])[0],
            _unchunk(data_raw, codec), signed=True,
        )
    elif kind == "string":
        encoding = enc_msgs[col].get(1, [0])[0]
        if encoding not in (0, 1, 2, 3):
            raise NotImplementedError(f"ORC string encoding {encoding}")
        data_raw = streams.get((col, 1))
        length_raw = streams.get((col, 2))
        if data_raw is None or length_raw is None:
            if n_entries:
                raise ValueError(
                    f"ORC string column {col} missing DATA/LENGTH"
                )
            return []
        lengths = _int_rle_decode(
            encoding, _unchunk(length_raw, codec), signed=False
        )
        if encoding in (0, 2):  # DIRECT (RLEv1) / DIRECT_V2
            blob = _unchunk(data_raw, codec)
            vals, bp = [], 0
            for ln_ in lengths:
                vals.append(blob[bp : bp + ln_].decode("utf-8"))
                bp += ln_
            if bp != len(blob):
                raise ValueError("string DATA has trailing bytes")
        else:  # DICTIONARY (RLEv1) / DICTIONARY_V2
            dict_raw = streams.get((col, 3))
            if dict_raw is None:
                raise ValueError(
                    f"ORC dict string column {col} missing "
                    "DICTIONARY_DATA"
                )
            blob = _unchunk(dict_raw, codec)
            entries, bp = [], 0
            for ln_ in lengths:
                entries.append(blob[bp : bp + ln_].decode("utf-8"))
                bp += ln_
            if bp != len(blob):
                raise ValueError("dictionary blob has trailing bytes")
            idx = _int_rle_decode(
                encoding, _unchunk(data_raw, codec), signed=False
            )
            vals = [entries[i] for i in idx]
    else:
        raise NotImplementedError(
            f"ORC nested scalar child kind {kind!r}"
        )
    if present_raw is None:
        if len(vals) != n_entries:
            raise ValueError(
                f"ORC column {col}: {len(vals)} values for "
                f"{n_entries} entries"
            )
        return vals
    bits = decode_present(_unchunk(present_raw, codec), n_entries)
    if sum(bits) != len(vals):
        raise ValueError(f"ORC column {col} PRESENT/DATA mismatch")
    it = iter(vals)
    return [next(it) if b else None for b in bits]


def _subtree_columns(tree: list[dict], col: int) -> set[int]:
    """All column ids in the type subtree rooted at ``col``."""
    out = {col}
    for c in tree[col]["subtypes"]:
        out |= _subtree_columns(tree, c)
    return out


def _read_orc_nested_column(
    data: bytes, column: int, expect_kind: str
) -> tuple[list, int]:
    footer, codec = _orc_file_tail(data)
    tree = orc_type_tree(footer)
    if tree[column]["kind"] != expect_kind:
        raise ValueError(f"column {column} is {tree[column]['kind']}")
    cols = _subtree_columns(tree, column)
    out: list = []
    n_stripes = 0
    for sraw in footer.get(3, []):
        n_stripes += 1
        streams, nrows, enc = _stripe_streams_multi(
            data, codec, sraw, cols
        )
        out += _dec_entries(streams, codec, enc, tree, column, nrows)
    return out, n_stripes


def read_orc_list_column(
    data: bytes, column: int
) -> tuple[list[list | None], int]:
    """Read one LIST column from raw ORC bytes -> one entry per row
    (None / possibly-empty python list). ORC's nested encoding
    (orc.apache.org/specification, "List Columns"): the list column
    carries PRESENT + a LENGTH stream (unsigned RLEv2, ONE entry per
    present list), children hold the concatenated elements with their
    own present bitmaps relative to entries — and because the scheme
    COMPOSES, elements may themselves be lists, maps, or structs
    (round-13 recursion via `_dec_entries`): list<struct> and
    list<list<T>> decode through the same path as list<scalar>."""
    return _read_orc_nested_column(data, column, "list")


def read_orc_map_column(
    data: bytes, column: int
) -> tuple[list[dict | None], int]:
    """Read one MAP column from raw ORC bytes -> one dict-or-None per
    row: the list layout with TWO children (keys carry no PRESENT —
    the spec's keys are non-null, validated — values recurse like any
    child, so map values may be structs or lists)."""
    return _read_orc_nested_column(data, column, "map")


def read_orc_struct_column(
    data: bytes, column: int
) -> tuple[list[dict | None], int]:
    """Read one STRUCT column from raw ORC bytes -> one dict-or-None
    per row: PRESENT-only on the struct column, each child holding
    one entry per STRUCT-PRESENT row — the child-count contract the
    recursion validates at every level."""
    return _read_orc_nested_column(data, column, "struct")


@register(
    "source_orc_list_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        ve AS (
            SELECT k, gi AS i
            FROM base, generate_series(1, 4) AS gv(gi)
            WHERE k % 11 <> 0 AND gi <= k % 5
        ),
        te AS (
            SELECT k, gi AS i
            FROM base, generate_series(1, 3) AS gt(gi)
            WHERE k % 9 <> 0 AND gi <= k % 4
        ),
        rowagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS v_null_lists,
                   CAST(sum(CASE WHEN k % 11 <> 0 AND k % 5 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS v_empty_lists,
                   CAST(sum(CASE WHEN k % 9 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS t_null_lists
            FROM base
        ),
        vagg AS (
            SELECT CAST(count(*) AS BIGINT) AS v_entries,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 7 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS v_null_elems,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 7 <> 0
                                          THEN k * 10 + i END), 0)
                        AS BIGINT) AS v_sum
            FROM ve
        ),
        tagg AS (
            SELECT CAST(count(*) AS BIGINT) AS t_entries,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 6 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS t_null_elems,
                   CAST(coalesce(sum(CASE WHEN (k + i) % 6 <> 0
                                          THEN 1 + CASE WHEN
                                              (k + i) % 13 >= 10
                                              THEN 2 ELSE 1 END
                                     END), 0) AS BIGINT) AS t_chars
            FROM te
        )
        SELECT n_rows, v_null_lists, v_empty_lists, v_entries,
               v_null_elems, v_sum, t_null_lists, t_entries,
               t_null_elems, t_chars, TRUE AS list_consistent
        FROM rowagg, vagg, tagg
    """,
    tags=("source", "orc", "nested", "list"),
)
def source_orc_list_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC LIST columns decoded by hand (round 13) — the nested half
    of the ORC floor, mirroring the round-12/13 parquet nesting work
    on the format the REFERENCE engine itself sinks to: ORC encodes
    a list as PRESENT + a LENGTH stream (unsigned RLEv2, one entry
    per present list) on the list column, with the child column
    carrying the concatenated elements and its OWN present bitmap
    relative to element entries — a completely different nested
    contract from parquet's rep/def levels, so nothing is shared but
    the RLEv2/PRESENT primitives.

    Two list columns exercise both element decoders:
    ``array<bigint>`` (signed RLEv2 elements) and ``array<string>``
    (DICTIONARY_V2 elements — Spark dictionary-encodes the
    low-cardinality tags, so element decode goes through
    index+LENGTH+DICTIONARY_DATA). Fixtures carry null lists, empty
    lists, and null elements; the type tree (footer Type messages,
    packed-varint subtypes) locates the element columns — column ids
    are never assumed. Everything under Spark's ZSTD chunks through
    the repo's own RFC 8878 decoder.

    The oracle recomputes all ten aggregates from raw orders via
    lateral generate_series; ``list_consistent`` pins engine-side
    that the tree shapes are list(long)/list(string), row counts
    match the tail, and >1 file was decoded.

    Scale posture: 32 Spark ORC files, one per decode task (files,
    then stripes, are ORC's split units); per-file partials combine
    in one reduce."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orclist_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 11 = 0
                 THEN CAST(NULL AS array<bigint>)
                 ELSE transform(
                     slice(array(1, 2, 3, 4), 1,
                           CAST(o_orderkey % 5 AS INT)),
                     i -> CASE WHEN (o_orderkey + i) % 7 = 0
                               THEN CAST(NULL AS BIGINT)
                               ELSE o_orderkey * 10 + i END)
            END AS vals
            """,
            """
            CASE WHEN o_orderkey % 9 = 0
                 THEN CAST(NULL AS array<string>)
                 ELSE transform(
                     slice(array(1, 2, 3), 1,
                           CAST(o_orderkey % 4 AS INT)),
                     i -> CASE WHEN (o_orderkey + i) % 6 = 0
                               THEN CAST(NULL AS STRING)
                               ELSE concat('w', (o_orderkey + i) % 13)
                          END)
            END AS tags
            """,
        )
        .repartition(32)  # one ORC file per decode task
        .write.option("compression", "zstd").orc(root)
    )
    paths = sorted(_glob.glob(os.path.join(root, "*.orc")))

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def _decode(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                footer, _codec = _orc_file_tail(data)
                tree = orc_type_tree(footer)
                lists = [i for i, tp in enumerate(tree)
                         if tp["kind"] == "list"]
                vcol = next(
                    c for c in lists
                    if tree[tree[c]["subtypes"][0]]["kind"] == "long"
                )
                tcol = next(
                    c for c in lists
                    if tree[tree[c]["subtypes"][0]]["kind"] == "string"
                )
                v_rows, _ns = read_orc_list_column(data, vcol)
                t_rows, _ns2 = read_orc_list_column(data, tcol)
                v_entries = [e for r in v_rows if r is not None
                             for e in r]
                t_entries = [e for r in t_rows if r is not None
                             for e in r]
                ok = (
                    len(lists) == 2
                    and len(v_rows) == tail["num_rows"]
                    and len(t_rows) == tail["num_rows"]
                    and tail["compression"] == "ZSTD"
                )
                yield _pd.DataFrame(
                    [(
                        len(v_rows),
                        sum(1 for r in v_rows if r is None),
                        sum(1 for r in v_rows if r == []),
                        len(v_entries),
                        sum(1 for e in v_entries if e is None),
                        sum(e for e in v_entries if e is not None),
                        sum(1 for r in t_rows if r is None),
                        len(t_entries),
                        sum(1 for e in t_entries if e is None),
                        sum(len(e) for e in t_entries
                            if e is not None),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "v_null_lists", "v_empty_lists",
                        "v_entries", "v_null_elems", "v_sum",
                        "t_null_lists", "t_entries", "t_null_elems",
                        "t_chars", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode,
        "n_rows bigint, v_null_lists bigint, v_empty_lists bigint,"
        " v_entries bigint, v_null_elems bigint, v_sum bigint,"
        " t_null_lists bigint, t_entries bigint, t_null_elems bigint,"
        " t_chars bigint, ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("v_null_lists").alias("v_null_lists"),
        F.sum("v_empty_lists").alias("v_empty_lists"),
        F.sum("v_entries").alias("v_entries"),
        F.sum("v_null_elems").alias("v_null_elems"),
        F.sum("v_sum").alias("v_sum"),
        F.sum("t_null_lists").alias("t_null_lists"),
        F.sum("t_entries").alias("t_entries"),
        F.sum("t_null_elems").alias("t_null_elems"),
        F.sum("t_chars").alias("t_chars"),
        (F.min("ok") & (F.count("*") > 1)).alias("list_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_map_struct_decode",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        me AS (
            SELECT k, gi - 1 AS j
            FROM base, generate_series(1, 3) AS gm(gi)
            WHERE k % 13 <> 0 AND k % 7 <> 0 AND gi <= k % 3 + 1
        ),
        rowagg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(sum(CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS m_nulls,
                   CAST(sum(CASE WHEN k % 13 <> 0 AND k % 7 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS m_empty,
                   CAST(sum(CASE WHEN k % 8 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS st_nulls,
                   CAST(sum(CASE WHEN k % 8 <> 0 AND k % 5 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS st_k_nulls,
                   CAST(sum(CASE WHEN k % 8 <> 0 AND k % 4 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS st_s_nulls,
                   CAST(sum(CASE WHEN k % 8 <> 0 AND k % 5 <> 0
                                 THEN k END) AS BIGINT) AS st_k_sum,
                   CAST(sum(CASE WHEN k % 8 <> 0 AND k % 4 <> 0
                                 THEN 2 END) AS BIGINT) AS st_s_chars
            FROM base
        ),
        magg AS (
            SELECT CAST(count(*) AS BIGINT) AS m_entries,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 5 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS m_null_vals,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 5 <> 0
                                          THEN k * 10 + j END), 0)
                        AS BIGINT) AS m_val_sum,
                   CAST(2 * count(*) AS BIGINT) AS m_key_chars
            FROM me
        )
        SELECT n_rows, m_nulls, m_empty, m_entries, m_null_vals,
               m_val_sum, m_key_chars, st_nulls, st_k_nulls,
               st_s_nulls, st_k_sum, st_s_chars,
               TRUE AS nested_consistent
        FROM rowagg, magg
    """,
    tags=("source", "orc", "nested", "map", "struct"),
)
def source_orc_map_struct_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC MAP + STRUCT columns decoded by hand (round 13) —
    completing the ORC nested floor next to lists: a map is the
    list layout with TWO children (keys carry no PRESENT, the spec's
    keys are non-null; values carry their own PRESENT over entries),
    and a struct is PRESENT-only on the struct column with each
    child holding one entry per STRUCT-PRESENT row — ORC's
    child-count contract, the analogue of what parquet needed
    definition levels for, validated entry-for-entry by the readers.

    Fixture: ``map<string,bigint>`` with null maps, EMPTY maps, and
    null values (the empty-vs-null split rides the PRESENT/LENGTH
    interaction), and ``struct<k bigint, s string>`` with the
    three-way null pattern (struct / k / s). String children are
    Spark's DICTIONARY_V2; everything under ZSTD chunks through the
    repo's own decoder. The oracle recomputes all twelve aggregates
    from raw orders; ``nested_consistent`` pins the tree shapes, the
    tail row counts, and multi-file decode.

    Scale posture: 32 files, one per task; partials combine in one
    reduce."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcms_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            """
            CASE WHEN o_orderkey % 13 = 0
                 THEN CAST(NULL AS map<string,bigint>)
                 WHEN o_orderkey % 7 = 0
                 THEN CAST(map() AS map<string,bigint>)
                 ELSE map_from_arrays(
                     transform(
                         slice(array(0, 1, 2), 1,
                               CAST(o_orderkey % 3 AS INT) + 1),
                         j -> concat('k', j)),
                     transform(
                         slice(array(0, 1, 2), 1,
                               CAST(o_orderkey % 3 AS INT) + 1),
                         j -> CASE WHEN (o_orderkey + j) % 5 = 0
                                   THEN CAST(NULL AS BIGINT)
                                   ELSE o_orderkey * 10 + j END))
            END AS m
            """,
            """
            CASE WHEN o_orderkey % 8 = 0
                 THEN CAST(NULL AS struct<k: bigint, s: string>)
                 ELSE named_struct(
                     'k', CASE WHEN o_orderkey % 5 = 0
                               THEN CAST(NULL AS BIGINT)
                               ELSE o_orderkey END,
                     's', CASE WHEN o_orderkey % 4 = 0
                               THEN CAST(NULL AS STRING)
                               ELSE concat('x', o_orderkey % 3) END)
            END AS st
            """,
        )
        .repartition(32)  # one ORC file per decode task
        .write.option("compression", "zstd").orc(root)
    )
    paths = sorted(_glob.glob(os.path.join(root, "*.orc")))

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def _decode(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                footer, _codec = _orc_file_tail(data)
                tree = orc_type_tree(footer)
                mcol = next(i for i, tp in enumerate(tree)
                            if tp["kind"] == "map")
                scol = next(i for i, tp in enumerate(tree)
                            if tp["kind"] == "struct" and i > 0)
                m_rows, _ns = read_orc_map_column(data, mcol)
                s_rows, _ns2 = read_orc_struct_column(data, scol)
                entries = [(kk, vv) for r in m_rows if r
                           for kk, vv in r.items()]
                structs = [r for r in s_rows if r is not None]
                ok = (
                    len(m_rows) == tail["num_rows"]
                    and len(s_rows) == tail["num_rows"]
                    and tree[scol]["names"] == ["k", "s"]
                    and tail["compression"] == "ZSTD"
                )
                yield _pd.DataFrame(
                    [(
                        len(m_rows),
                        sum(1 for r in m_rows if r is None),
                        sum(1 for r in m_rows if r == {}),
                        len(entries),
                        sum(1 for _k, v in entries if v is None),
                        sum(v for _k, v in entries if v is not None),
                        sum(len(kk) for kk, _v in entries),
                        len(s_rows) - len(structs),
                        sum(1 for r in structs if r["k"] is None),
                        sum(1 for r in structs if r["s"] is None),
                        sum(r["k"] for r in structs
                            if r["k"] is not None),
                        sum(len(r["s"]) for r in structs
                            if r["s"] is not None),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "m_nulls", "m_empty", "m_entries",
                        "m_null_vals", "m_val_sum", "m_key_chars",
                        "st_nulls", "st_k_nulls", "st_s_nulls",
                        "st_k_sum", "st_s_chars", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode,
        "n_rows bigint, m_nulls bigint, m_empty bigint,"
        " m_entries bigint, m_null_vals bigint, m_val_sum bigint,"
        " m_key_chars bigint, st_nulls bigint, st_k_nulls bigint,"
        " st_s_nulls bigint, st_k_sum bigint, st_s_chars bigint,"
        " ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("m_nulls").alias("m_nulls"),
        F.sum("m_empty").alias("m_empty"),
        F.sum("m_entries").alias("m_entries"),
        F.sum("m_null_vals").alias("m_null_vals"),
        F.sum("m_val_sum").alias("m_val_sum"),
        F.sum("m_key_chars").alias("m_key_chars"),
        F.sum("st_nulls").alias("st_nulls"),
        F.sum("st_k_nulls").alias("st_k_nulls"),
        F.sum("st_s_nulls").alias("st_s_nulls"),
        F.sum("st_k_sum").alias("st_k_sum"),
        F.sum("st_s_chars").alias("st_s_chars"),
        (F.min("ok") & (F.count("*") > 1)).alias("nested_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# decimal / boolean / float scalar readers (round 13)
# ---------------------------------------------------------------------------

def _signed_varints(b: bytes) -> list[int]:
    """A whole stream of zigzag base-128 varints (ORC's 'unbounded
    varint' decimal DATA encoding) -> signed ints; python ints make
    decimal128 (precision > 18) free."""
    out: list[int] = []
    p = 0
    while p < len(b):
        u, p = _uvarint(b, p)
        out.append(_unzigzag(u))
    return out


def read_orc_decimal_column(
    data: bytes, column: int
) -> tuple[list[int | None], int, int]:
    """Read one DECIMAL column from raw ORC bytes -> (one UNSCALED
    int per row normalized to the TYPE's scale — exact, no floats —
    or None, stripe count, the type scale). Spec layout: DATA is a
    stream of zigzag unbounded varints (arbitrary precision — this is
    how decimal128 rides), SECONDARY is the per-value scale as signed
    RLEv2; a value's scale may be smaller than the type's (trailing
    zeros stripped), so the reader rescales by 10^(type_scale -
    value_scale) and rejects scales LARGER than the type's loudly."""
    footer, codec = _orc_file_tail(data)
    tree = orc_type_tree(footer)
    if tree[column]["kind"] != "decimal":
        raise ValueError(f"column {column} is {tree[column]['kind']}")
    tmsg = decode_message(footer[4][column])
    type_scale = tmsg.get(6, [0])[0]
    out: list[int | None] = []
    n_stripes = 0
    for sraw in footer.get(3, []):
        n_stripes += 1
        streams, nrows, enc_msgs, _wtz = _stripe_streams(
            data, codec, sraw, column
        )
        if 1 not in streams or 5 not in streams:
            raise ValueError("ORC decimal stripe missing DATA/SECONDARY")
        unscaled = _signed_varints(_unchunk(streams[1], codec))
        # SECONDARY scale stream follows the column's declared
        # encoding (RLEv1 under a 0.11 writer); DATA is version-less
        # unbounded varints in both lineages
        scales = _int_rle_decode(
            enc_msgs[column].get(1, [0])[0],
            _unchunk(streams[5], codec), signed=True,
        )
        if len(unscaled) != len(scales):
            raise ValueError("decimal DATA/SECONDARY length mismatch")
        vals: list[int] = []
        for u, sc in zip(unscaled, scales):
            if sc > type_scale:
                raise NotImplementedError(
                    f"decimal value scale {sc} exceeds type scale "
                    f"{type_scale}"
                )
            vals.append(u * 10 ** (type_scale - sc))
        if 0 not in streams:
            if len(vals) != nrows:
                raise ValueError("decimal row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(streams[0], codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if b else None for b in bits]
    return out, n_stripes, type_scale


def read_orc_boolean_column(
    data: bytes, column: int
) -> tuple[list[bool | None], int]:
    """Read one BOOLEAN column from raw ORC bytes: DATA is the same
    byte-RLE + MSB-first bit packing as PRESENT bitmaps, sized by the
    count of present rows."""
    footer, codec = _orc_file_tail(data)
    out: list[bool | None] = []
    n_stripes = 0
    for sraw in footer.get(3, []):
        n_stripes += 1
        streams, nrows, _enc, _wtz = _stripe_streams(
            data, codec, sraw, column
        )
        if 1 not in streams:
            raise ValueError("ORC boolean stripe missing DATA")
        if 0 not in streams:
            bits = decode_present(_unchunk(streams[1], codec), nrows)
            out += [bool(b) for b in bits]
        else:
            pres = decode_present(_unchunk(streams[0], codec), nrows)
            vals = decode_present(
                _unchunk(streams[1], codec), sum(pres)
            )
            it = iter(vals)
            out += [bool(next(it)) if b else None for b in pres]
    return out, n_stripes


def read_orc_float_column(
    data: bytes, column: int
) -> tuple[list[float | None], int]:
    """Read one FLOAT (binary32) column: IEEE 754 LE 4-byte DATA
    behind PRESENT — the 4-byte sibling of the double reader."""
    footer, codec = _orc_file_tail(data)
    out: list[float | None] = []
    n_stripes = 0
    for sraw in footer.get(3, []):
        n_stripes += 1
        streams, nrows, _enc, _wtz = _stripe_streams(
            data, codec, sraw, column
        )
        if 1 not in streams:
            raise ValueError("ORC float stripe missing DATA")
        raw = _unchunk(streams[1], codec)
        if len(raw) % 4:
            raise ValueError("float DATA stream not 4-byte aligned")
        vals = list(struct.unpack(f"<{len(raw) // 4}f", raw))
        if 0 not in streams:
            if len(vals) != nrows:
                raise ValueError("float DATA row count mismatch")
            out += vals
        else:
            bits = decode_present(_unchunk(streams[0], codec), nrows)
            if sum(bits) != len(vals):
                raise ValueError("PRESENT bits disagree with DATA count")
            it = iter(vals)
            out += [next(it) if b else None for b in bits]
    return out, n_stripes


@register(
    "source_orc_decimal_boolean_decode",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN o_orderkey % 53 = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS dec_nulls,
               CAST(coalesce(sum(CASE WHEN o_orderkey % 53 <> 0
                   THEN CAST(round(o_totalprice * 100) AS BIGINT)
                   END), 0) AS BIGINT) AS dec_cents,
               CAST(sum(CAST(round(o_totalprice * 10000) AS BIGINT))
                    AS BIGINT) AS bigdec_unscaled,
               CAST(sum(CASE WHEN o_orderkey % 5 <> 0
                             AND o_orderkey % 3 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN o_orderkey % 5 <> 0
                             AND o_orderkey % 3 <> 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false,
               CAST(sum(CASE WHEN o_orderkey % 5 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS b_nulls,
               CAST(sum(CASE WHEN o_orderkey % 9 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS f_nulls,
               CAST(coalesce(sum(CASE WHEN o_orderkey % 9 <> 0
                   THEN o_orderkey % 1000 END), 0) AS BIGINT)
                   AS f_quarters,
               TRUE AS decimal_consistent
        FROM orders
    """,
    tags=("source", "orc", "decimal", "boolean", "float"),
)
def source_orc_decimal_boolean_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC DECIMAL + BOOLEAN + FLOAT columns decoded by hand
    (round 13) — completing the ORC scalar floor in parity with the
    round-12 parquet decimal/boolean query, on the reference's own
    sink format. Decimals are the spec's two-stream layout: DATA as
    zigzag UNBOUNDED varints of the unscaled value (python ints make
    the DECIMAL(28,4) column's >64-bit unscaled range free — this is
    how decimal128 rides in ORC), SECONDARY as signed-RLEv2 per-value
    scales with trailing zeros stripped, rescaled to the type scale
    exactly (no floats anywhere — the oracle compares integer
    unscaled sums). Booleans are byte-RLE + MSB-first bit packing
    (the PRESENT machinery re-used as DATA, sized by present rows);
    floats are IEEE binary32 LE behind PRESENT.

    ``decimal_consistent`` pins the type tree (decimal(12,2) +
    decimal(28,4) with the scales read from the Type message, not
    assumed), row counts, and multi-file decode; the DuckDB oracle
    recomputes every integer image from raw orders.

    Scale posture: 32 Spark ORC files, one per decode task."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcdec_{uuid.uuid4().hex}"
    )
    (
        t(spark, sf_dir, "orders")
        .selectExpr(
            "CASE WHEN o_orderkey % 53 = 0"
            " THEN CAST(NULL AS DECIMAL(12,2))"
            " ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS dec",
            "CAST(o_totalprice AS DECIMAL(28,4)) AS bigdec",
            "CASE WHEN o_orderkey % 5 = 0 THEN CAST(NULL AS BOOLEAN)"
            " ELSE o_orderkey % 3 = 0 END AS b",
            "CASE WHEN o_orderkey % 9 = 0 THEN CAST(NULL AS FLOAT)"
            " ELSE CAST((o_orderkey % 1000) * 0.25 AS FLOAT) END AS f",
        )
        .repartition(32)  # one ORC file per decode task
        .write.option("compression", "zstd").orc(root)
    )
    paths = sorted(_glob.glob(os.path.join(root, "*.orc")))

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def _decode(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                footer, _codec = _orc_file_tail(data)
                tree = orc_type_tree(footer)
                decs = [i for i, tp in enumerate(tree)
                        if tp["kind"] == "decimal"]
                bcol = next(i for i, tp in enumerate(tree)
                            if tp["kind"] == "boolean")
                fcol = next(i for i, tp in enumerate(tree)
                            if tp["kind"] == "float")
                d_vals, _n, d_scale = read_orc_decimal_column(
                    data, decs[0]
                )
                bd_vals, _n2, bd_scale = read_orc_decimal_column(
                    data, decs[1]
                )
                b_vals, _n3 = read_orc_boolean_column(data, bcol)
                f_vals, _n4 = read_orc_float_column(data, fcol)
                d_present = [v for v in d_vals if v is not None]
                f_present = [v for v in f_vals if v is not None]
                ok = (
                    d_scale == 2 and bd_scale == 4
                    and len(decs) == 2
                    and all(len(x) == tail["num_rows"] for x in
                            (d_vals, bd_vals, b_vals, f_vals))
                    and all(v is not None for v in bd_vals)
                    and tail["compression"] == "ZSTD"
                )
                yield _pd.DataFrame(
                    [(
                        len(d_vals),
                        len(d_vals) - len(d_present),
                        sum(d_present),
                        sum(bd_vals),
                        sum(1 for v in b_vals if v is True),
                        sum(1 for v in b_vals if v is False),
                        sum(1 for v in b_vals if v is None),
                        len(f_vals) - len(f_present),
                        sum(round(v * 4) for v in f_present),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "dec_nulls", "dec_cents",
                        "bigdec_unscaled", "n_true", "n_false",
                        "b_nulls", "f_nulls", "f_quarters", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode,
        "n_rows bigint, dec_nulls bigint, dec_cents bigint,"
        " bigdec_unscaled bigint, n_true bigint, n_false bigint,"
        " b_nulls bigint, f_nulls bigint, f_quarters bigint,"
        " ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("dec_nulls").alias("dec_nulls"),
        F.sum("dec_cents").alias("dec_cents"),
        F.sum("bigdec_unscaled").alias("bigdec_unscaled"),
        F.sum("n_true").alias("n_true"),
        F.sum("n_false").alias("n_false"),
        F.sum("b_nulls").alias("b_nulls"),
        F.sum("f_nulls").alias("f_nulls"),
        F.sum("f_quarters").alias("f_quarters"),
        (F.min("ok") & (F.count("*") > 1)).alias("decimal_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_deep_nested_decode",
    oracle="""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderkey % 17 AS m FROM orders
        ),
        slot AS (
            SELECT k, gi - 1 AS j
            FROM base, generate_series(1, 3) AS gs(gi)
            WHERE k % 13 <> 0 AND gi <= k % 4
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
                   CAST(sum(CASE WHEN k % 13 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ls_null,
                   CAST(sum(CASE WHEN k % 13 <> 0 AND k % 4 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS ls_empty,
                   CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ll_null,
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
        slotagg AS (
            SELECT CAST(count(*) AS BIGINT) AS ls_slots,
                   CAST(coalesce(sum(CASE WHEN (k + j) % 6 = 0
                                          THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS ls_null_structs,
                   CAST(coalesce(sum(
                       CASE WHEN (k + j) % 6 <> 0 AND (k + j) % 5 <> 0
                            THEN k * 10 + j END), 0) AS BIGINT)
                       AS ls_a_sum,
                   CAST(coalesce(sum(
                       CASE WHEN (k + j) % 6 <> 0 AND (k + j) % 4 <> 0
                            THEN 2 END), 0) AS BIGINT) AS ls_s_chars
            FROM slot
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
                                     END), 0) AS BIGINT) AS ll_sum
            FROM vals
        )
        SELECT n_rows, ls_null, ls_empty, ls_slots, ls_null_structs,
               ls_a_sum, ls_s_chars, ll_null,
               sentinel_entries + gen_entries AS ll_entries,
               m2 + gen_null_inner AS ll_null_inner,
               m3 + gen_empty_inner AS ll_empty_inner,
               m4 + gen_values AS ll_values,
               m4 + gen_null_values AS ll_null_values,
               ll_sum, TRUE AS deep_consistent
        FROM rowagg, slotagg, oagg, vagg
    """,
    tags=("source", "orc", "nested", "deep", "struct", "list"),
)
def source_orc_deep_nested_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC DEEP nesting decoded by hand (round 13): ``array<struct>``
    and ``array<array<bigint>>`` — the shapes the scalar-child
    readers rejected an hour earlier — through the RECURSIVE child
    decoder (`_dec_entries`): ORC's nested encoding composes (every
    column's PRESENT is relative to parent-present entries, LENGTH
    counts per present entry, struct children hold one entry per
    struct-present slot), so arbitrary depth falls out of one
    recursion rather than per-shape assemblers. The fixtures are the
    SAME modular constructions as the parquet
    `source_parquet_list_struct_decode` /
    `source_parquet_nested_list_decode` queries — fifteen aggregates,
    one oracle, directly comparable across the two formats' opposite
    nesting philosophies (composed per-column streams vs flattened
    rep/def levels).

    Scale posture: 32 Spark ORC files, one per decode task; partials
    combine in one reduce."""
    import glob as _glob

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcdeep_{uuid.uuid4().hex}"
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
            """,
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
            """,
        )
        .repartition(32)  # one ORC file per decode task
        .write.option("compression", "zstd").orc(root)
    )
    paths = sorted(_glob.glob(os.path.join(root, "*.orc")))

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(len(paths))

    def _decode(batches) -> Iterator:
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                footer, _codec = _orc_file_tail(data)
                tree = orc_type_tree(footer)
                ls_col, ll_col = tree[0]["subtypes"]
                ls_rows, _n = read_orc_list_column(data, ls_col)
                ll_rows, _n2 = read_orc_list_column(data, ll_col)
                slots = [e for r in ls_rows if r is not None
                         for e in r]
                structs = [e for e in slots if e is not None]
                outer = [e for r in ll_rows if r is not None
                         for e in r]
                values = [v for e in outer if e for v in e]
                present = [v for v in values if v is not None]
                ok = (
                    tree[ls_col]["kind"] == "list"
                    and tree[tree[ls_col]["subtypes"][0]]["kind"]
                    == "struct"
                    and tree[ll_col]["kind"] == "list"
                    and tree[tree[ll_col]["subtypes"][0]]["kind"]
                    == "list"
                    and len(ls_rows) == tail["num_rows"]
                    == len(ll_rows)
                    and tail["compression"] == "ZSTD"
                )
                yield _pd.DataFrame(
                    [(
                        len(ls_rows),
                        sum(1 for r in ls_rows if r is None),
                        sum(1 for r in ls_rows if r == []),
                        len(slots),
                        len(slots) - len(structs),
                        sum(e["a"] for e in structs
                            if e["a"] is not None),
                        sum(len(e["s"]) for e in structs
                            if e["s"] is not None),
                        sum(1 for r in ll_rows if r is None),
                        len(outer),
                        sum(1 for e in outer if e is None),
                        sum(1 for e in outer if e == []),
                        len(values),
                        len(values) - len(present),
                        sum(present),
                        bool(ok),
                    )],
                    columns=[
                        "n_rows", "ls_null", "ls_empty", "ls_slots",
                        "ls_null_structs", "ls_a_sum", "ls_s_chars",
                        "ll_null", "ll_entries", "ll_null_inner",
                        "ll_empty_inner", "ll_values",
                        "ll_null_values", "ll_sum", "ok",
                    ],
                )

    partials = plan.mapInPandas(
        _decode,
        "n_rows bigint, ls_null bigint, ls_empty bigint,"
        " ls_slots bigint, ls_null_structs bigint, ls_a_sum bigint,"
        " ls_s_chars bigint, ll_null bigint, ll_entries bigint,"
        " ll_null_inner bigint, ll_empty_inner bigint,"
        " ll_values bigint, ll_null_values bigint, ll_sum bigint,"
        " ok boolean",
    )
    out = partials.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("ls_null").alias("ls_null"),
        F.sum("ls_empty").alias("ls_empty"),
        F.sum("ls_slots").alias("ls_slots"),
        F.sum("ls_null_structs").alias("ls_null_structs"),
        F.sum("ls_a_sum").alias("ls_a_sum"),
        F.sum("ls_s_chars").alias("ls_s_chars"),
        F.sum("ll_null").alias("ll_null"),
        F.sum("ll_entries").alias("ll_entries"),
        F.sum("ll_null_inner").alias("ll_null_inner"),
        F.sum("ll_empty_inner").alias("ll_empty_inner"),
        F.sum("ll_values").alias("ll_values"),
        F.sum("ll_null_values").alias("ll_null_values"),
        F.sum("ll_sum").alias("ll_sum"),
        (F.min("ok") & (F.count("*") > 1)).alias("deep_consistent"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# RLE v1 — the ORC 0.11 ("Hive 0.11") integer encoding family
# ---------------------------------------------------------------------------


def decode_rlev1(b: bytes, signed: bool = True) -> list[int]:
    """ORC Run-Length Encoding VERSION 1 (spec "Integer Run Length
    Encoding, version 1"; what Hive 0.11-era writers and any modern
    writer pinned to ``orc.write.format=0.11`` emit):

    - header byte ``h < 0x80``: a RUN of ``h + 3`` values (3..130)
      followed by one SIGNED delta byte (-128..127) and the base
      value as a varint — values are ``base + i*delta``;
    - header byte ``h >= 0x80``: ``256 - h`` LITERAL varints (1..128).

    Signed streams zigzag each varint; unsigned streams (string
    LENGTH, dictionary indices) do not. Unlike v2 there are no
    bit-packed or patched forms — just these two cases, which is why
    legacy files are bigger but trivially seekable."""
    out: list[int] = []
    p, n = 0, len(b)
    while p < n:
        h = b[p]
        p += 1
        if h < 0x80:
            run = h + 3
            if p >= n:
                raise ValueError("RLEv1 run truncated before delta")
            delta = b[p] - 256 if b[p] >= 0x80 else b[p]
            p += 1
            base, p = _uvarint(b, p)
            if signed:
                base = _unzigzag(base)
            out.extend(base + i * delta for i in range(run))
        else:
            for _ in range(256 - h):
                v, p = _uvarint(b, p)
                out.append(_unzigzag(v) if signed else v)
    return out


def _int_rle_decode(encoding: int, raw: bytes, signed: bool) -> list[int]:
    """Integer-stream dispatch: DIRECT/DICTIONARY (0/1) are RLEv1,
    DIRECT_V2/DICTIONARY_V2 (2/3) are RLEv2; anything else is loud."""
    if encoding in (0, 1):
        return decode_rlev1(raw, signed=signed)
    if encoding in (2, 3):
        return decode_rlev2(raw, signed=signed)
    raise NotImplementedError(f"ORC column encoding {encoding}")


@register(
    "source_orc_rlev1_decode",
    oracle="""
        WITH v AS (
            SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_orderkey END AS val,
                   3000 - o_orderkey AS neg,
                   o_orderpriority AS prio,
                   'k' || CAST(o_orderkey AS VARCHAR) AS tag
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(val) AS BIGINT) AS n_nulls,
               CAST(sum(val) AS BIGINT) AS val_sum,
               CAST(sum(neg) AS BIGINT) AS neg_sum,
               CAST(min(neg) AS BIGINT) AS neg_min,
               CAST(count(DISTINCT prio) AS BIGINT) AS n_prios,
               CAST(sum(CASE WHEN prio = '1-URGENT' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_urgent,
               CAST(sum(length(tag)) AS BIGINT) AS tag_chars,
               TRUE AS rlev1_attested
        FROM v
    """,
    tags=("source", "orc", "rlev1", "encoding", "legacy", "data-read"),
)
def source_orc_rlev1_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC **RLE v1** columns decoded by hand (round 14, the r13
    verdict's seam 3) — the legacy Hive-0.11 encoding family the
    readers above rejected loudly until now. The independent v1
    WRITER this container does have is Spark's own JVM ORC writer
    pinned to the old format (``orc.write.format=0.11``), which the
    fixture uses; its stripe footers really carry encodings
    DIRECT(0)/DICTIONARY(1), asserted below so the query can never
    silently attest the v2 path.

    Exercised shapes: run headers with delta +1 (sorted keys), delta
    -1 and a sign-crossing zigzag base (``neg = 3000 - o_orderkey``),
    literal groups wherever the %97 PRESENT gaps break runs, an
    unsigned-RLEv1 LENGTH stream (unique ``tag`` strings, DIRECT),
    and RLEv1 dictionary indices (5-value ``prio``, DICTIONARY).

    ``rlev1_attested`` pins engine-side that every observed column
    encoding is the v1 family AND that decoded count/sum/extrema
    equal the file-level IntegerStatistics — a run/literal, delta
    sign, zigzag, or dictionary-index bug flips the hash.

    Scale posture: identical to `source_orc_rlev2_decode` — one task
    per file (the stripe is the split unit), pure-Python decode as
    the format-layer demonstrator; production scans stay on the JVM
    reader this query certifies against."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcv1_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.when(F.col("o_orderkey") % 97 != 0, F.col("o_orderkey"))
            .alias("val"),
            (F.lit(3000) - F.col("o_orderkey")).alias("neg"),
            F.col("o_orderpriority").alias("prio"),
            F.concat(F.lit("k"), F.col("o_orderkey")).alias("tag"),
        )
        .sort("neg")
    )
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("orc.write.format", "0.11")
        .option("compression", "snappy")
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "orders_v1.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                # stripe-footer encodings must be the v1 family
                footer, codec = _orc_file_tail(data)
                encs: set[int] = set()
                for sraw in footer.get(3, []):
                    _, _, enc_msgs, _ = _stripe_streams(
                        data, codec, sraw, column=1
                    )
                    encs.update(
                        m.get(1, [0])[0] for m in enc_msgs[1:]
                    )
                vals, _ = read_orc_int64_column(data, column=1)
                negs, _ = read_orc_int64_column(data, column=2)
                prios, _ = read_orc_string_column(data, column=3)
                tags, _ = read_orc_string_column(data, column=4)
                present = [v for v in vals if v is not None]
                ints = tail["file_stats"][1]["int"]
                nstat = tail["file_stats"][2]["int"]
                attested = (
                    encs <= {0, 1}
                    and len(vals) == tail["num_rows"]
                    and len(present)
                        == tail["file_stats"][1]["num_values"]
                    and sum(present) == ints["sum"]
                    and min(present) == ints["min"]
                    and max(present) == ints["max"]
                    and sum(negs) == nstat["sum"]
                    and min(negs) == nstat["min"]
                    and None not in negs
                    and None not in prios
                    and None not in tags
                )
                rows.append((
                    len(vals), len(vals) - len(present), sum(present),
                    sum(negs), min(negs), len(set(prios)),
                    sum(1 for p in prios if p == "1-URGENT"),
                    sum(len(s) for s in tags), bool(attested),
                ))
            yield _pd.DataFrame(
                rows,
                columns=["n_rows", "n_nulls", "val_sum", "neg_sum",
                         "neg_min", "n_prios", "n_urgent",
                         "tag_chars", "rlev1_attested"],
            )

    out = plan.mapInPandas(
        _decode,
        "n_rows bigint, n_nulls bigint, val_sum bigint,"
        " neg_sum bigint, neg_min bigint, n_prios bigint,"
        " n_urgent bigint, tag_chars bigint, rlev1_attested boolean",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_rlev1_typed",
    oracle=f"""
        WITH v AS (
            SELECT CASE WHEN o_orderkey % 89 = 0 THEN NULL
                        ELSE epoch_us(o_orderdate) END AS us,
                   o_totalprice, o_orderkey, o_orderstatus,
                   o_orderpriority, o_orderdate
            FROM orders
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count(us) AS BIGINT) AS ts_nulls,
               CAST(min(us) AS BIGINT) AS min_us,
               CAST(max(us) AS BIGINT) AS max_us,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS dec_cents,
               CAST(2 * count(*) AS BIGINT) AS arr_elems,
               CAST(sum(length(o_orderpriority)) + 2 * count(*)
                    AS BIGINT) AS arr_chars,
               CAST(sum(o_orderkey) AS BIGINT) AS st_key_sum,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0
                        END) AS BIGINT) AS st_f_rows,
               CAST(min(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                    AS BIGINT) AS min_days,
               CAST(max(CAST(o_orderdate AS DATE) - DATE '1970-01-01')
                    AS BIGINT) AS max_days,
               TRUE AS rlev1_attested
        FROM v
    """,
    tags=("source", "orc", "rlev1", "timestamp", "decimal", "nested",
          "legacy", "data-read"),
)
def source_orc_rlev1_typed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC RLE v1 across the TYPED column floor (round 15, the r14
    verdict's task 5) — `source_orc_rlev1_decode` covered int64 +
    string; this closes the rest of the dispatch seam: under
    ``orc.write.format=0.11`` every integer-coded stream in the file
    is RLEv1, so TIMESTAMP (DATA seconds + SECONDARY nanos, same
    2015 base and trailing-zero trick as v2), DECIMAL (version-less
    varint DATA but RLEv1 SECONDARY scales), and the NESTED readers'
    LENGTH / child-DATA / dictionary-index streams all had to learn
    the `_int_rle_decode` dispatch (they previously hard-called
    `decode_rlev2`).

    Fixture columns over `orders` (one 0.11 file, Spark's own JVM
    writer as the independent v1 producer): nullable ``ts``
    (PRESENT gaps at %89 break runs), ``dec`` decimal(12,2),
    ``arr = [o_orderpriority, 'zz']`` (list<string>: RLEv1 LENGTH +
    DICTIONARY child), ``st = struct(k, s)`` (RLEv1 long child +
    dictionary string child), and ``dt`` DATE (signed RLEv1 days). ``rlev1_attested`` pins that every
    observed column encoding in every stripe is the v1 family (0/1)
    — the query can never silently attest the v2 path — and that
    decoded counts agree across columns.

    Scale posture: one task per file via mapInPandas, pure-Python
    decode as the format-layer demonstrator; production scans stay
    on the JVM reader this query certifies against."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcv1t_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .sort("o_orderkey")
        .select(
            # cast NTZ->LTZ under the UTC session: Spark writes
            # TimestampNTZ to ORC as a LONG with a catalyst-type
            # attribute, not an ORC timestamp column
            F.when(
                F.col("o_orderkey") % 89 != 0,
                F.col("o_orderdate").cast("timestamp"),
            ).alias("ts"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("dec"),
            F.array(F.col("o_orderpriority"), F.lit("zz")).alias("arr"),
            F.struct(
                F.col("o_orderkey").alias("k"),
                F.col("o_orderstatus").alias("s"),
            ).alias("st"),
            F.col("o_orderdate").cast("date").alias("dt"),
        )
    )
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("orc.write.format", "0.11")
        .option("compression", "zlib")
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "typed_v1.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame([(path,)], "path string")

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                tail = read_orc_tail(data)
                footer, codec = _orc_file_tail(data)
                # columns: 0 root, 1 ts, 2 dec, 3 arr, 4 elem,
                # 5 st, 6 k, 7 s, 8 dt — every encoding must be v1
                encs: set[int] = set()
                for sraw in footer.get(3, []):
                    _, _, enc_msgs, _ = _stripe_streams(
                        data, codec, sraw, column=1
                    )
                    encs.update(
                        m.get(1, [0])[0] for m in enc_msgs[1:]
                    )
                ts, _ = read_orc_timestamp_column(data, column=1)
                dec, _, scale = read_orc_decimal_column(data, column=2)
                arr, _ = _read_orc_nested_column(data, 3, "list")
                st, _ = _read_orc_nested_column(data, 5, "struct")
                dt, _ = read_orc_date_column(data, column=8)
                ts_present = [v for v in ts if v is not None]
                n = tail["num_rows"]
                attested = (
                    encs <= {0, 1}
                    and scale == 2
                    and len(ts) == len(dec) == len(arr) == len(st) == n
                    and len(dt) == n
                    and None not in dt
                    and None not in dec
                    and all(a is not None and a[1] == "zz" for a in arr)
                    and all(
                        r is not None and r["k"] is not None for r in st
                    )
                )
                rows.append((
                    n, len(ts) - len(ts_present),
                    min(ts_present), max(ts_present),
                    sum(dec),  # unscaled at scale 2 == cents
                    sum(len(a) for a in arr),
                    sum(len(s) for a in arr for s in a),
                    sum(r["k"] for r in st),
                    sum(1 for r in st if r["s"] == "F"),
                    min(dt), max(dt),
                    bool(attested),
                ))
            yield _pd.DataFrame(
                rows,
                columns=["n_rows", "ts_nulls", "min_us", "max_us",
                         "dec_cents", "arr_elems", "arr_chars",
                         "st_key_sum", "st_f_rows", "min_days",
                         "max_days", "rlev1_attested"],
            )

    out = plan.mapInPandas(
        _decode,
        "n_rows bigint, ts_nulls bigint, min_us bigint,"
        " max_us bigint, dec_cents bigint, arr_elems bigint,"
        " arr_chars bigint, st_key_sum bigint, st_f_rows bigint,"
        " min_days bigint, max_days bigint, rlev1_attested boolean",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def orc_index_positions(
    positions: list[int], compressed: bool
) -> tuple[int, ...]:
    """Validate + split one ROW_INDEX entry's seek positions for a
    NON-NULL integer DATA stream (ORCv1 spec §Row Group Index).

    Uncompressed: ``[byte offset, values to skip]`` (2). Compressed:
    chunk indirection prepends the compressed-chunk offset —
    ``[compressed chunk offset, decompressed offset within chunk,
    values to skip]`` (3). A NULLABLE column's entry carries the
    PRESENT stream's positions too (prepended, same arity rules) —
    that stays a NAMED loud seam, mirroring the compression gate
    (ADVICE r15), instead of a bare tuple-unpack ValueError."""
    want = 3 if compressed else 2
    if len(positions) != want:
        raise NotImplementedError(
            "row-index seek positions for a nullable column "
            f"(got {len(positions)} positions, expected {want}: "
            "the PRESENT stream adds bit-offset positions)"
        )
    return tuple(positions)


def orc_index_positions_nullable(
    positions: list[int], compressed: bool
) -> tuple[tuple[int, ...], tuple[int, ...]]:
    """Split a NULLABLE integer column's ROW_INDEX positions into the
    PRESENT and DATA stream seek tuples (round 16, closing the seam
    `orc_index_positions` named): stream positions concatenate in
    stream order, PRESENT first. Uncompressed PRESENT (bit-field
    over byte-RLE) records ``[byte offset, bytes to skip in the
    run, bits to skip]``; DATA appends its usual
    ``[byte offset, values to skip]`` — 5 total. Compression
    prepends chunk indirection to BOTH streams: PRESENT becomes
    ``[compressed chunk offset, decompressed offset within chunk,
    bytes to skip in the run, bits to skip]`` and DATA
    ``[chunk offset, decompressed offset, values to skip]`` —
    7 total. Wrong arity is the NAMED loud seam."""
    want = 7 if compressed else 5
    if len(positions) != want:
        raise NotImplementedError(
            f"nullable row-index entry with {len(positions)} "
            f"positions (expected {want}: PRESENT "
            f"{'chunk/dec/run/bit' if compressed else 'byte/run/bit'}"
            f" + DATA "
            f"{'chunk/dec/values' if compressed else 'byte/values'})"
        )
    split = 4 if compressed else 3
    return tuple(positions[:split]), tuple(positions[split:])


def orc_byte_rle_seek(
    stream: bytes, boff: int, vskip: int, max_bytes: int
) -> bytes:
    """Seek-decode ORC byte-RLE: start at byte offset ``boff``, skip
    ``vskip`` DECODED bytes (a run may span the row-group boundary),
    return the next ``max_bytes``. Decoding stops as soon as enough
    bytes are out — the stream tail past the requested window is
    never walked (the byte-RLE analogue of `decode_rlev2`'s
    ``max_values`` cap)."""
    need = vskip + max_bytes
    out = bytearray()
    p = boff
    while len(out) < need:
        if p >= len(stream):
            raise ValueError("byte-RLE seek ran out of stream")
        c = stream[p]
        p += 1
        if c < 128:
            if p >= len(stream):
                raise ValueError("truncated byte-RLE run")
            out += bytes([stream[p]]) * (c + 3)
            p += 1
        else:
            n = 256 - c
            if p + n > len(stream):
                raise ValueError("truncated byte-RLE literals")
            out += stream[p : p + n]
            p += n
    return bytes(out[vskip:need])


def _byte_rle_resumable(
    b: bytes, max_bytes: int
) -> tuple[bytes, int]:
    """Byte-RLE decode up to the last COMPLETE run -> (decoded bytes,
    consumed offset); a run truncated by the buffer end is left for
    the caller to retry with more bytes. Stops once ``max_bytes``
    are out (may overshoot by one run — the seek granularity)."""
    out = bytearray()
    p = 0
    while p < len(b) and len(out) < max_bytes:
        start = p
        c = b[p]
        p += 1
        if c < 128:
            if p >= len(b):
                return bytes(out), start
            out += bytes([b[p]]) * (c + 3)
            p += 1
        else:
            n = 256 - c
            if p + n > len(b):
                return bytes(out), start
            out += b[p : p + n]
            p += n
    return bytes(out), p


def orc_byte_rle_seek_compressed(
    stream: bytes,
    codec: int,
    chunk_off: int,
    dec_off: int,
    vskip: int,
    max_bytes: int,
    touched: set[int] | None = None,
) -> bytes:
    """Chunk-indirected byte-RLE seek (round 16): start at the
    compression chunk at ``chunk_off``, drop ``dec_off`` leading
    decompressed bytes, then byte-RLE-decode skipping ``vskip``
    output bytes and returning the next ``max_bytes``. Chunks are
    decompressed lazily — `orc_byte_rle_seek` raising on a
    run-spanning truncation carries the undecoded tail into the next
    chunk (`_byte_rle_resumable` — every byte decoded exactly once,
    the same non-quadratic discipline as `orc_seek_decode_compressed`);
    chunks past the window are never decompressed (``touched``
    collects decompressed header offsets)."""
    need = vskip + max_bytes
    out = bytearray()
    tail = b""
    p = chunk_off
    first = True
    while len(out) < need:
        if p + 3 > len(stream):
            raise ValueError(
                "byte-RLE seek ran out of compression chunks"
            )
        h = stream[p] | (stream[p + 1] << 8) | (stream[p + 2] << 16)
        clen = h >> 1
        dec = _unchunk(stream[p : p + 3 + clen], codec)
        if touched is not None:
            touched.add(p)
        if first:
            dec = dec[dec_off:]
            first = False
        buf = tail + dec
        p += 3 + clen
        got, consumed = _byte_rle_resumable(buf, need - len(out))
        out += got
        tail = buf[consumed:]
    return bytes(out[vskip:need])


def orc_present_seek_compressed(
    stream: bytes,
    codec: int,
    positions: tuple[int, int, int, int],
    n_bits: int,
    touched: set[int] | None = None,
) -> list[int]:
    """Compressed-variant of `orc_present_seek`: four positions
    (chunk offset, decompressed offset, bytes to skip, bits to
    skip) resolve one row group's PRESENT bitmap without touching
    chunks outside its window."""
    chunk_off, dec_off, vskip, bitskip = positions
    nbytes = (bitskip + n_bits + 7) // 8
    raw = orc_byte_rle_seek_compressed(
        stream, codec, chunk_off, dec_off, vskip, nbytes, touched
    )
    bits: list[int] = []
    for byte in raw:
        for k in range(8):
            bits.append((byte >> (7 - k)) & 1)
    return bits[bitskip : bitskip + n_bits]


def orc_present_seek(
    stream: bytes, positions: tuple[int, int, int], n_bits: int
) -> list[int]:
    """Seek-decode ``n_bits`` PRESENT bits for one row group from its
    index positions (byte offset, bytes to skip, bits to skip) —
    bits are MSB-first within each byte-RLE-decoded byte."""
    boff, vskip, bitskip = positions
    nbytes = (bitskip + n_bits + 7) // 8
    raw = orc_byte_rle_seek(stream, boff, vskip, nbytes)
    bits: list[int] = []
    for byte in raw:
        for k in range(8):
            bits.append((byte >> (7 - k)) & 1)
    return bits[bitskip : bitskip + n_bits]


def orc_stream_chunk_offsets(stream: bytes) -> list[int]:
    """Byte offsets of every compression-chunk header in an ORC
    compressed stream (header walk only — nothing is decompressed)."""
    offs = []
    p = 0
    while p < len(stream):
        if p + 3 > len(stream):
            raise ValueError("truncated ORC chunk header")
        h = stream[p] | (stream[p + 1] << 8) | (stream[p + 2] << 16)
        offs.append(p)
        p += 3 + (h >> 1)
    return offs


def orc_seek_decode_compressed(
    stream: bytes,
    codec: int,
    chunk_off: int,
    dec_off: int,
    vskip: int,
    n: int,
    touched: set[int] | None = None,
) -> list[int]:
    """Seek-decode ``n`` RLEv2 values from a COMPRESSED ORC stream
    using one ROW_INDEX entry's chunk-indirection positions
    (ORCv1 spec §Row Group Index): start at the compression chunk
    whose header sits at ``chunk_off``, drop ``dec_off`` leading
    bytes of its DECOMPRESSED output (a row group rarely starts on a
    chunk boundary), skip ``vskip`` decoded values (a run may span
    the group boundary), return the next ``n``.

    Chunks are decompressed LAZILY, one at a time, and decoded
    INCREMENTALLY: ``decode_rlev2(resumable=True)`` consumes the
    buffer up to the last complete run and the undecoded tail is
    prepended to the next chunk, so every byte is decoded exactly
    ONCE — re-decoding the growing buffer per chunk is quadratic in
    the chunks a group spans and falls over exactly at scale (a
    250k-row group under 1 KiB chunks spans ~700 of them). Chunks
    before ``chunk_off`` and after the group's last run are NEVER
    decompressed — ``touched`` (when given) collects the header
    offsets actually decompressed so callers can attest that
    against `orc_stream_chunk_offsets`."""
    need = vskip + n
    out: list[int] = []
    tail = b""
    p = chunk_off
    first = True
    while len(out) < need:
        if p + 3 > len(stream):
            raise ValueError(
                "seek-decode ran out of compression chunks"
            )
        h = stream[p] | (stream[p + 1] << 8) | (stream[p + 2] << 16)
        clen = h >> 1
        dec = _unchunk(stream[p : p + 3 + clen], codec)
        if touched is not None:
            touched.add(p)
        if first:
            dec = dec[dec_off:]
            first = False
        buf = tail + dec
        p += 3 + clen
        vals, consumed = decode_rlev2(
            buf, signed=True, max_values=need - len(out),
            resumable=True,
        )
        out += vals
        tail = buf[consumed:]
    return out[vskip:need]


@register(
    "source_orc_row_index_skipping",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "data-read"),
)
def source_orc_row_index_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC ROW-GROUP skipping via the ROW_INDEX stream (round 15) —
    the level BELOW `source_orc_stripe_skipping`: every stripe
    carries a kind-6 ROW_INDEX per column with one entry per row
    group (stride sized for ~6 groups per SF here) holding (a) IntegerStatistics min/max
    and (b) SEEK POSITIONS into the value streams — for an
    uncompressed non-null RLEv2 column, ``[byte offset, values to
    skip]``, because a run may span the group boundary. The reader
    selects row groups whose [min, max] intersects the predicate
    range, then SEEK-DECODES each selected group: `decode_rlev2`
    starts at the indexed byte offset and its ``max_values`` cap
    stops after skip+rows values — skipped groups are never decoded
    and the stream tail is never touched (``partial_decode`` pins
    that decoded rows < file rows; ``seek_attested`` pins that every
    selected group's decode really started mid-stream and produced
    exactly the index's numberOfValues). Compressed stripes — where
    positions gain chunk indirection — are the sibling
    `source_orc_row_index_skipping_compressed` (round 16).

    The fixture sorts orders by key so group min/max are tight; the
    value-range predicate (30-45% of the key span) lands strictly
    inside the file. The oracle recomputes the range aggregate raw —
    a positions misread shifts values between groups and breaks the
    cents sum; an off-by-one in the value skip misaligns both
    columns at once.

    Scale posture: this is the granularity that makes point/range
    reads cheap INSIDE a stripe at 100 TB — stripe pruning bounds
    I/O, row-index seeking bounds decode; one task per file as in
    the sibling ORC demonstrators."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcri_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long").alias("cents"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    # ~6 row groups at any SF (ORC's stride floor is 1000) so the
    # skip/selection split exists from sf0.001 up
    stride = max(1000, n_rows_total // 6)
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi)], "path string, lo long, hi long"
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed "
                        "(the compressed path is the _compressed "
                        "sibling query)"
                    )
                g_total = g_sel = n_matched = 0
                cents_sum = 0
                rows_decoded = 0
                seek_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    # stream map: (col, kind) -> bytes
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln
                    # row index entries: positions + int stats
                    def _index(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            positions = _packed_uvarints(
                                b"".join(e.get(1, []))
                            )
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": positions,
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out
                    idx_k = _index(1)
                    idx_c = _index(2)
                    if len(idx_k) != len(idx_c):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    c_stream = streams[(2, 1)]

                    def _group_vals(stream: bytes, ent: dict) -> list[int]:
                        boff, vskip = orc_index_positions(
                            ent["positions"], compressed=False
                        )
                        vals = decode_rlev2(
                            stream[boff:], signed=True,
                            max_values=vskip + ent["n"],
                        )
                        if len(vals) < vskip + ent["n"]:
                            raise ValueError(
                                "seek-decode came up short"
                            )
                        return vals[vskip : vskip + ent["n"]]

                    for ek, ec in zip(idx_k, idx_c):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        ks = _group_vals(k_stream, ek)
                        cs = _group_vals(c_stream, ec)
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == len(cs)
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                        )
                        for kv, cv in zip(ks, cs):
                            if rec.lo <= kv <= rec.hi:
                                n_matched += 1
                                cents_sum += cv
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(seek_ok),
                    n_matched, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "seek_attested", "n_matched", "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " seek_attested boolean, n_matched bigint, cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_compressed",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS chunks_skipped,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "compression", "data-read"),
)
def source_orc_row_index_skipping_compressed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group skipping under COMPRESSED stripes (round 16,
    the r15 verdict's top item) — the PRODUCTION shape of
    `source_orc_row_index_skipping`: real ORC files default to
    zlib/snappy/zstd, where every stream is a sequence of 3-byte-
    headered compression chunks and ROW_INDEX seek positions gain
    CHUNK INDIRECTION (ORCv1 spec §Row Group Index): for a non-null
    RLEv2 column, ``[compressed chunk offset, decompressed offset
    within chunk, values to skip]``. The reader selects row groups
    by index min/max, then `orc_seek_decode_compressed` starts at
    the indexed CHUNK header, drops the indexed number of leading
    decompressed bytes, and decompresses chunks LAZILY one at a
    time until the group's skip+rows values are out — chunks before
    the seek point and after the group's last run are NEVER
    decompressed.

    Attestations: ``partial_decode`` pins decoded rows < file rows;
    ``chunks_skipped`` pins (per stream) that the set of chunk
    headers actually decompressed is a strict subset of
    `orc_stream_chunk_offsets`; ``seek_attested`` pins every
    selected group's mid-stream decode produced exactly the index's
    numberOfValues with the index's min/max. The fixture shrinks
    ``orc.compress.size`` to 4 KiB so streams span many chunks even
    at sf0.001 and group starts land mid-chunk (nonzero
    decompressed-offset positions get exercised, not just the
    degenerate chunk-0 case).

    Scale posture: identical to the uncompressed sibling — at
    100 TB this is what bounds DECOMPRESSION (the dominant CPU cost
    of an ORC range read) to the row groups a predicate selects,
    inside stripes that stripe-level pruning already bounded. One
    task per file; the driver sees only the 1-row attestation."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcric_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long").alias("cents"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "zlib")
        .option("orc.compress.size", "1024")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi)], "path string, lo long, hi long"
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec == 0:
                    raise ValueError(
                        "compressed-stripe fixture came back "
                        "uncompressed"
                    )
                g_total = g_sel = n_matched = 0
                cents_sum = 0
                rows_decoded = 0
                seek_ok = True
                chunks_skipped = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            positions = _packed_uvarints(
                                b"".join(e.get(1, []))
                            )
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": positions,
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    idx_k = _index(1)
                    idx_c = _index(2)
                    if len(idx_k) != len(idx_c):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    c_stream = streams[(2, 1)]
                    touched_k: set[int] = set()
                    touched_c: set[int] = set()

                    def _group_vals(
                        stream: bytes, ent: dict, touched: set[int]
                    ) -> list[int]:
                        chunk_off, dec_off, vskip = orc_index_positions(
                            ent["positions"], compressed=True
                        )
                        return orc_seek_decode_compressed(
                            stream, codec, chunk_off, dec_off,
                            vskip, ent["n"], touched,
                        )

                    for ek, ec in zip(idx_k, idx_c):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decompressed
                        g_sel += 1
                        ks = _group_vals(k_stream, ek, touched_k)
                        cs = _group_vals(c_stream, ec, touched_c)
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == len(cs)
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                        )
                        for kv, cv in zip(ks, cs):
                            if rec.lo <= kv <= rec.hi:
                                n_matched += 1
                                cents_sum += cv
                    # skipped chunks provably never decompressed:
                    # strict subset of the stripe's DATA chunks.
                    # Combined across the two streams — the sorted
                    # key column DELTA-compresses to a single chunk,
                    # where a per-stream strict subset is impossible
                    # by construction; the incompressible cents
                    # stream carries the skip evidence.
                    offs_k = orc_stream_chunk_offsets(k_stream)
                    offs_c = orc_stream_chunk_offsets(c_stream)
                    chunks_skipped &= (
                        touched_k <= set(offs_k)
                        and touched_c <= set(offs_c)
                        and len(touched_k) + len(touched_c)
                        < len(offs_k) + len(offs_c)
                    )
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(chunks_skipped),
                    bool(seek_ok),
                    n_matched, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "chunks_skipped", "seek_attested",
                         "n_matched", "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " chunks_skipped boolean, seek_attested boolean,"
        " n_matched bigint, cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_nullable",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN o_orderkey % 10 = 7
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(sum(CASE WHEN o_orderkey % 10 <> 7
                             THEN CAST(round(o_totalprice * 100)
                                       AS BIGINT) END) AS BIGINT)
                   AS cents
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "nullable", "present", "data-read"),
)
def source_orc_row_index_skipping_nullable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode on a NULLABLE column (round 16,
    closing the PRESENT-stream seam `orc_index_positions` named in
    the ADVICE r15 fix): a nullable column's ROW_INDEX entry carries
    FIVE positions — the PRESENT bit-field's ``[byte offset, bytes
    to skip in the byte-RLE run, bits to skip]`` followed by the
    DATA stream's usual ``[byte offset, values to skip]`` — and the
    entry's numberOfValues counts NON-NULL values only, while the
    group spans a full stride of rows. A reader that seeks only the
    DATA stream misplaces every value after the first null; one
    that forgets the bit offset shears the bitmap by up to 7 rows.

    The seek path: `orc_present_seek` byte-RLE-decodes the group's
    bitmap mid-stream (`orc_byte_rle_seek` skips run-spanning bytes
    and stops as soon as the group's bits are out), the RLEv2 DATA
    seek takes exactly popcount(bits) values, and the two weave
    back into per-row values with nulls where the bit is 0
    (``seek_attested`` pins bitmap length == group rows, popcount ==
    the index's numberOfValues == decoded values, plus the key
    column's min/max echo). Nulls fall on keys ≡ 7 (mod 10), so
    every group mixes nulls and values and both the null count and
    the non-null sum cross-check the weave against the oracle.

    Compression × nullability (7 positions) is the sibling
    `source_orc_row_index_skipping_nullable_compressed`.

    Scale posture: same as the siblings — seeking bounds decode to
    selected groups inside already-pruned stripes; nullable columns
    are the COMMON case in real warehouse data, so this is the shape
    a 100 TB range read actually executes."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcrin_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 10 != 7,
                F.round(F.col("o_totalprice") * 100).cast("long"),
            ).alias("cents"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi, stride)],
        "path string, lo long, hi long, stride long",
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                g_total = g_sel = n_matched = n_nulls = 0
                cents_sum = 0
                rows_decoded = 0
                seek_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    if 5 not in st:
                        raise ValueError(
                            "stripe information missing "
                            "numberOfRows (field 5)"
                        )
                    n_stripe_rows = st[5][0]
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            positions = _packed_uvarints(
                                b"".join(e.get(1, []))
                            )
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": positions,
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    idx_k = _index(1)
                    idx_c = _index(2)
                    if len(idx_k) != len(idx_c):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    c_present = streams[(2, 0)]
                    c_data = streams[(2, 1)]

                    for gi, (ek, ec) in enumerate(zip(idx_k, idx_c)):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        g_rows = min(
                            rec.stride,
                            n_stripe_rows - gi * rec.stride,
                        )
                        # key column: non-null 2-position seek
                        kb, kv = orc_index_positions(
                            ek["positions"], compressed=False
                        )
                        ks = decode_rlev2(
                            k_stream[kb:], signed=True,
                            max_values=kv + ek["n"],
                        )[kv : kv + ek["n"]]
                        # cents column: PRESENT + DATA 5-position seek
                        ppos, (db, dv) = orc_index_positions_nullable(
                            ec["positions"], compressed=False
                        )
                        bits = orc_present_seek(c_present, ppos, g_rows)
                        n_vals = sum(bits)
                        vals = decode_rlev2(
                            c_data[db:], signed=True,
                            max_values=dv + n_vals,
                        )[dv : dv + n_vals]
                        # weave values back onto rows
                        it = iter(vals)
                        cs = [next(it) if b else None for b in bits]
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == g_rows
                            and len(bits) == g_rows
                            and n_vals == ec["n"] == len(vals)
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                        )
                        for kv_, cv in zip(ks, cs):
                            if rec.lo <= kv_ <= rec.hi:
                                n_matched += 1
                                if cv is None:
                                    n_nulls += 1
                                else:
                                    cents_sum += cv
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(seek_ok),
                    n_matched, n_nulls, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "seek_attested", "n_matched", "n_nulls",
                         "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " seek_attested boolean, n_matched bigint, n_nulls bigint,"
        " cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_nullable_compressed",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS chunks_skipped,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CASE WHEN o_orderkey % 10 = 7
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               CAST(sum(CASE WHEN o_orderkey % 10 <> 7
                             THEN CAST(round(o_totalprice * 100)
                                       AS BIGINT) END) AS BIGINT)
                   AS cents
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "nullable", "present", "compression", "data-read"),
)
def source_orc_row_index_skipping_nullable_compressed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode, NULLABLE × COMPRESSED (round 16) —
    the full production shape, completing the row-index family
    (uncompressed / compressed / nullable siblings): a nullable
    column in a compressed stripe carries SEVEN index positions,
    chunk indirection prepended to both streams — PRESENT
    ``[chunk offset, decompressed offset, bytes to skip in the
    byte-RLE run, bits to skip]`` and DATA ``[chunk offset,
    decompressed offset, values to skip]``. Every failure mode of
    the two dimensions compounds here: a reader that forgets the
    chunk layer decodes garbage mid-stream; one that seeks only
    DATA misplaces every value after the first null; one that
    decompresses eagerly loses the entire point of the index.

    `orc_byte_rle_seek_compressed` / `orc_present_seek_compressed`
    resolve the bitmap and `orc_seek_decode_compressed` the values,
    all decompressing chunks lazily — ``chunks_skipped`` pins that
    the union of chunks decompressed across the key DATA, cents
    PRESENT and cents DATA streams is a strict subset of the
    stripe's chunks; ``seek_attested`` pins bitmap length == group
    rows, popcount == the index's numberOfValues == decoded values,
    and the key column's min/max echo.

    Scale posture: this is THE hot path of a 100 TB ORC range read —
    real warehouse columns are nullable and real files are
    compressed; decompression (the dominant CPU cost) is bounded to
    exactly the selected groups' chunks."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcrinc_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 10 != 7,
                F.round(F.col("o_totalprice") * 100).cast("long"),
            ).alias("cents"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "zlib")
        .option("orc.compress.size", "1024")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi, stride)],
        "path string, lo long, hi long, stride long",
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec == 0:
                    raise ValueError(
                        "compressed fixture came back uncompressed"
                    )
                g_total = g_sel = n_matched = n_nulls = 0
                cents_sum = 0
                rows_decoded = 0
                seek_ok = True
                chunks_skipped = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    n_stripe_rows = st[5][0]
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            positions = _packed_uvarints(
                                b"".join(e.get(1, []))
                            )
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": positions,
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    idx_k = _index(1)
                    idx_c = _index(2)
                    if len(idx_k) != len(idx_c):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    c_present = streams[(2, 0)]
                    c_data = streams[(2, 1)]
                    touched_k: set[int] = set()
                    touched_p: set[int] = set()
                    touched_d: set[int] = set()

                    for gi, (ek, ec) in enumerate(zip(idx_k, idx_c)):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decompressed
                        g_sel += 1
                        g_rows = min(
                            rec.stride,
                            n_stripe_rows - gi * rec.stride,
                        )
                        kc, kd, kv = orc_index_positions(
                            ek["positions"], compressed=True
                        )
                        ks = orc_seek_decode_compressed(
                            k_stream, codec, kc, kd, kv, ek["n"],
                            touched_k,
                        )
                        ppos, (dc, dd, dv) = \
                            orc_index_positions_nullable(
                                ec["positions"], compressed=True
                            )
                        bits = orc_present_seek_compressed(
                            c_present, codec, ppos, g_rows, touched_p
                        )
                        n_vals = sum(bits)
                        vals = orc_seek_decode_compressed(
                            c_data, codec, dc, dd, dv, n_vals,
                            touched_d,
                        )
                        it = iter(vals)
                        cs = [next(it) if b else None for b in bits]
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == g_rows
                            and len(bits) == g_rows
                            and n_vals == ec["n"] == len(vals)
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                        )
                        for kv_, cv in zip(ks, cs):
                            if rec.lo <= kv_ <= rec.hi:
                                n_matched += 1
                                if cv is None:
                                    n_nulls += 1
                                else:
                                    cents_sum += cv
                    # strict subset of the stripe's chunks, combined
                    # across the three streams (PRESENT and the key
                    # DATA each compress to 1-2 chunks; the
                    # incompressible cents DATA carries the evidence)
                    totals = sum(
                        len(orc_stream_chunk_offsets(s))
                        for s in (k_stream, c_present, c_data)
                    )
                    chunks_skipped &= (
                        len(touched_k) + len(touched_p)
                        + len(touched_d) < totals
                    )
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(chunks_skipped),
                    bool(seek_ok),
                    n_matched, n_nulls, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "chunks_skipped", "seek_attested",
                         "n_matched", "n_nulls", "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " chunks_skipped boolean, seek_attested boolean,"
        " n_matched bigint, n_nulls bigint, cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_string",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(length(o_orderpriority)) AS BIGINT)
                   AS len_sum,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_urgent
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "string", "data-read"),
)
def source_orc_row_index_skipping_string(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode on a STRING column (round 16) —
    extends the row-index family beyond integers: a DIRECT_V2
    string column splits values across TWO streams (DATA =
    concatenated UTF-8 bytes, LENGTH = unsigned RLEv2), and its
    index entry carries THREE positions — ``[DATA byte offset,
    LENGTH byte offset, LENGTH values to skip]``. The DATA stream
    needs no value skip: lengths delimit it, so the group's bytes
    are exactly ``DATA[offset : offset + sum(group lengths)]`` — a
    reader that skips values in DATA (as it would for RLE) shears
    every string; one that decodes LENGTH as SIGNED zigzags every
    length.

    Selection is by the key column's IntegerStatistics; the string
    column's entries carry StringStatistics (min/max string, total
    length) and ``seek_attested`` pins the seek-decoded group
    against all three (count == numberOfValues, lexicographic
    min/max == stats, byte sum == stats sum). The fixture forces
    DIRECT_V2 via ``orc.dictionary.key.threshold=0`` — priorities
    would otherwise dictionary-encode; that shape is the sibling
    `source_orc_row_index_skipping_dictionary`.

    Scale posture: string predicates (status, category, priority)
    are the most common real filters after keys and dates; bounding
    their decode to selected row groups is what this family exists
    for."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcris_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("s"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .option("orc.dictionary.key.threshold", "0")
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi)], "path string, lo long, hi long"
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                g_total = g_sel = n_matched = 0
                len_sum = n_urgent = 0
                rows_decoded = 0
                seek_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    enc_s = decode_message(
                        sfoot[2][2]
                    ).get(1, [0])[0]
                    if enc_s != 2:  # DIRECT_V2 only
                        raise NotImplementedError(
                            "string row-index seek under encoding "
                            f"{enc_s} (dictionary seeks are "
                            "dictionary-global)"
                        )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index_int(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    def _index_str(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            # StringStatistics is ColumnStatistics
                            # field 4 (3 is DoubleStatistics)
                            strs = decode_message(stats[4][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": strs[1][0].decode(),
                                "max": strs[2][0].decode(),
                                # sum is sint64 -> zigzag
                                "len_sum": _unzigzag(strs[3][0]),
                            })
                        return out

                    idx_k = _index_int(1)
                    idx_s = _index_str(2)
                    if len(idx_k) != len(idx_s):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    s_data = streams[(2, 1)]
                    s_len = streams[(2, 2)]

                    for ek, es in zip(idx_k, idx_s):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        kb, kv = orc_index_positions(
                            ek["positions"], compressed=False
                        )
                        ks = decode_rlev2(
                            k_stream[kb:], signed=True,
                            max_values=kv + ek["n"],
                        )[kv : kv + ek["n"]]
                        doff, loff, lskip = es["positions"]
                        lens = decode_rlev2(
                            s_len[loff:], signed=False,
                            max_values=lskip + es["n"],
                        )[lskip : lskip + es["n"]]
                        blob = s_data[doff : doff + sum(lens)]
                        vals, p = [], 0
                        for ln_ in lens:
                            vals.append(
                                blob[p : p + ln_].decode()
                            )
                            p += ln_
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == len(vals) == es["n"]
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                            and min(vals) == es["min"]
                            and max(vals) == es["max"]
                            and sum(lens) == es["len_sum"]
                        )
                        for kv_, sv in zip(ks, vals):
                            if rec.lo <= kv_ <= rec.hi:
                                n_matched += 1
                                len_sum += len(sv)
                                n_urgent += sv == "1-URGENT"
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(seek_ok),
                    n_matched, len_sum, n_urgent,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "seek_attested", "n_matched", "len_sum",
                         "n_urgent"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " seek_attested boolean, n_matched bigint, len_sum bigint,"
        " n_urgent bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_dictionary",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS seek_attested,
               CAST((SELECT count(DISTINCT o_orderpriority)
                     FROM orders) AS INT) AS dict_size,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(length(o_orderpriority)) AS BIGINT)
                   AS len_sum,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_urgent
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "string", "dictionary", "data-read"),
)
def source_orc_row_index_skipping_dictionary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode on a DICTIONARY_V2 string column
    (round 16) — what the writer actually emits for low-cardinality
    strings (the `_string` sibling had to force DIRECT_V2; this one
    attests encoding 3, the default for the 5-value priority
    column). The split of responsibilities IS the point:

    - the DICTIONARY (LENGTH + DICTIONARY_DATA streams) is
      STRIPE-GLOBAL — decoded once per stripe, O(distinct values),
      never per group; its entry count is attested against the
      encoding's declared dictionarySize (and the oracle's DISTINCT
      count);
    - the per-row cost is the DATA stream of dictionary INDICES
      (unsigned RLEv2), whose index-entry positions are exactly the
      integer column's ``[byte offset, values to skip]`` — so the
      seek machinery is `orc_index_positions` + `decode_rlev2`
      unchanged, and only SELECTED groups' indices ever decode
      (``partial_decode`` counts index values, not dictionary
      reads).

    A reader that re-reads the dictionary per group does O(groups ×
    dict) redundant work; one that seeks the dictionary streams
    with the index positions decodes garbage — the positions refer
    ONLY to streams with per-row data. StringStatistics attestation
    is the same as the DIRECT_V2 sibling (count, min/max, zigzag
    length sum).

    Scale posture: dictionary columns are the COMMON string shape in
    warehouse data (status/priority/category); at 100 TB the
    dictionary stays KB-scale per stripe while index seeking bounds
    the per-row decode to selected groups."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcrid_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("s"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi)], "path string, lo long, hi long"
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                g_total = g_sel = n_matched = 0
                len_sum = n_urgent = 0
                dict_size = 0
                rows_decoded = 0
                seek_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    enc_msg = decode_message(sfoot[2][2])
                    enc_s = enc_msg.get(1, [0])[0]
                    declared = enc_msg.get(2, [0])[0]
                    if enc_s != 3:  # DICTIONARY_V2 only
                        raise ValueError(
                            "dictionary fixture came back with "
                            f"encoding {enc_s}"
                        )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index_int(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    def _index_str(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            strs = decode_message(stats[4][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": strs[1][0].decode(),
                                "max": strs[2][0].decode(),
                                "len_sum": _unzigzag(strs[3][0]),
                            })
                        return out

                    idx_k = _index_int(1)
                    idx_s = _index_str(2)
                    if len(idx_k) != len(idx_s):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    # the stripe-global dictionary: decoded ONCE
                    dict_lens = decode_rlev2(
                        streams[(2, 2)], signed=False
                    )
                    blob = streams[(2, 3)]
                    dictionary, p = [], 0
                    for ln_ in dict_lens:
                        dictionary.append(blob[p : p + ln_].decode())
                        p += ln_
                    if p != len(blob):
                        raise ValueError(
                            "dictionary bytes not fully consumed"
                        )
                    if len(dictionary) != declared:
                        raise ValueError(
                            "dictionary size disagrees with the "
                            "encoding's dictionarySize"
                        )
                    dict_size = max(dict_size, len(dictionary))
                    s_idx_stream = streams[(2, 1)]

                    for ek, es in zip(idx_k, idx_s):
                        if ek["max"] < rec.lo or ek["min"] > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        kb, kv = orc_index_positions(
                            ek["positions"], compressed=False
                        )
                        ks = decode_rlev2(
                            k_stream[kb:], signed=True,
                            max_values=kv + ek["n"],
                        )[kv : kv + ek["n"]]
                        ib, iv = orc_index_positions(
                            es["positions"], compressed=False
                        )
                        idxs = decode_rlev2(
                            s_idx_stream[ib:], signed=False,
                            max_values=iv + es["n"],
                        )[iv : iv + es["n"]]
                        vals = [dictionary[i] for i in idxs]
                        rows_decoded += len(ks)
                        seek_ok &= (
                            len(ks) == ek["n"] == len(vals) == es["n"]
                            and min(ks) == ek["min"]
                            and max(ks) == ek["max"]
                            and min(vals) == es["min"]
                            and max(vals) == es["max"]
                            and sum(map(len, vals)) == es["len_sum"]
                        )
                        for kv_, sv in zip(ks, vals):
                            if rec.lo <= kv_ <= rec.hi:
                                n_matched += 1
                                len_sum += len(sv)
                                n_urgent += sv == "1-URGENT"
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(seek_ok),
                    dict_size,
                    n_matched, len_sum, n_urgent,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "seek_attested", "dict_size", "n_matched",
                         "len_sum", "n_urgent"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " seek_attested boolean, dict_size int, n_matched bigint,"
        " len_sum bigint, n_urgent bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_timestamp",
    oracle="""
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS seek_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders
        WHERE o_orderdate >= DATE '1997-01-01'
          AND o_orderdate < DATE '1998-01-01'
    """,
    tags=("source", "orc", "row-index", "skipping", "pruning",
          "timestamp", "data-read"),
)
def source_orc_row_index_skipping_timestamp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode on a TIMESTAMP column (round 16) —
    time ranges are THE canonical 100 TB predicate, and timestamps
    are the family's first TWO-VALUE-STREAM seek: DATA (seconds
    relative to the 2015-01-01 writer-zone base, signed RLEv2) and
    SECONDARY (nanos under the trailing-zero trick, unsigned RLEv2)
    each carry their own ``[byte offset, values to skip]`` — FOUR
    positions per entry, and both streams must land on the same row
    or every value pairs a wrong sub-second part.

    Selection is by the column's own TimestampStatistics
    (``minimumUtc``/``maximumUtc``, proto fields 3/4, sint64 zigzag
    MILLIS — a reader that takes them unzigzagged or as micros
    selects wrong groups); ``seek_attested`` pins each decoded
    group's count and min/max epoch-millis against them. The
    predicate is calendar-1997 over the 1995-2001 testdata span, so
    a middle slice of the ts-sorted file is selected and both edges
    skip.

    Scale posture: identical to the integer siblings — the seek
    bounds decode to the selected time slice, which is exactly how
    a time-partitioned 100 TB table serves "last month" without
    touching history."""
    import datetime as _dt

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcrit_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.to_timestamp(F.col("o_orderdate")).alias("ts"),
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("cents"),
        )
        .sort("ts")
    )
    n_rows_total = fixture.count()
    stride = max(1000, n_rows_total // 6)  # ~6 groups at any SF
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    utc = _dt.timezone.utc
    lo_us = int(_dt.datetime(1997, 1, 1, tzinfo=utc).timestamp()) \
        * 1_000_000
    hi_us = int(_dt.datetime(1998, 1, 1, tzinfo=utc).timestamp()) \
        * 1_000_000 - 1
    plan = spark.createDataFrame(
        [(path, lo_us, hi_us)], "path string, lo long, hi long"
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                g_total = g_sel = n_matched = 0
                cents_sum = 0
                rows_decoded = 0
                seek_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    wtz = sfoot.get(3, [None])[0]
                    base = _orc_ts_base(
                        wtz.decode() if isinstance(wtz, bytes)
                        else wtz
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    # ts column index: TimestampStatistics min/max
                    # UTC millis (sint64 zigzag, proto fields 3/4)
                    idx = []
                    ri = decode_message(
                        _unchunk(streams[(1, 6)], codec)
                    )
                    for eraw in ri.get(1, []):
                        e = decode_message(eraw)
                        stats = decode_message(e[2][0])
                        tstat = decode_message(stats[9][0])
                        idx.append({
                            "positions": _packed_uvarints(
                                b"".join(e.get(1, []))
                            ),
                            "n": stats[1][0],
                            "min_ms": _unzigzag(tstat[3][0]),
                            "max_ms": _unzigzag(tstat[4][0]),
                        })
                    # cents column index (integer)
                    idx_c = []
                    ri = decode_message(
                        _unchunk(streams[(2, 6)], codec)
                    )
                    for eraw in ri.get(1, []):
                        e = decode_message(eraw)
                        stats = decode_message(e[2][0])
                        idx_c.append({
                            "positions": _packed_uvarints(
                                b"".join(e.get(1, []))
                            ),
                            "n": stats[1][0],
                        })
                    if len(idx) != len(idx_c):
                        raise ValueError("column row indexes disagree")
                    g_total += len(idx)
                    ts_data = streams[(1, 1)]
                    ts_sec = streams[(1, 5)]
                    c_stream = streams[(2, 1)]

                    for et, ec in zip(idx, idx_c):
                        if et["max_ms"] * 1000 < rec.lo \
                                or et["min_ms"] * 1000 > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        db, dv, sb, sv = et["positions"]
                        secs = decode_rlev2(
                            ts_data[db:], signed=True,
                            max_values=dv + et["n"],
                        )[dv : dv + et["n"]]
                        nanos_enc = decode_rlev2(
                            ts_sec[sb:], signed=False,
                            max_values=sv + et["n"],
                        )[sv : sv + et["n"]]
                        if len(secs) != len(nanos_enc):
                            raise ValueError(
                                "DATA/SECONDARY seek misaligned"
                            )
                        vals = []
                        for s_, v in zip(secs, nanos_enc):
                            if v >= 1 << 63:
                                v -= 1 << 64
                            c = v & 7
                            nanos = (v >> 3) * (
                                10 ** (c + 1) if c else 1
                            )
                            abs_secs = s_ + base
                            if nanos < 0:
                                vals.append(abs_secs * 1_000_000
                                            + nanos // 1_000)
                            else:
                                if abs_secs < 0 and nanos:
                                    abs_secs -= 1
                                vals.append(abs_secs * 1_000_000
                                            + nanos // 1_000)
                        cb, cv = orc_index_positions(
                            ec["positions"], compressed=False
                        )
                        cs = decode_rlev2(
                            c_stream[cb:], signed=True,
                            max_values=cv + ec["n"],
                        )[cv : cv + ec["n"]]
                        rows_decoded += len(vals)
                        seek_ok &= (
                            len(vals) == et["n"] == len(cs)
                            and min(vals) // 1000 == et["min_ms"]
                            and max(vals) // 1000 == et["max_ms"]
                        )
                        for tv, cval in zip(vals, cs):
                            if rec.lo <= tv <= rec.hi:
                                n_matched += 1
                                cents_sum += cval
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < n_rows_total),
                    bool(seek_ok),
                    n_matched, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "seek_attested", "n_matched", "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " seek_attested boolean, n_matched bigint, cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def orc_bloom_long_hash(key: int) -> int:
    """ORC's long hash for bloom filters (org.apache.orc.util
    .BloomFilter#getLongHash) — Thomas Wang's 64-bit mix, BUT with
    ARITHMETIC right shifts: the bytecode uses ``lshr`` (signed
    ``>>``) where Wang's published function uses ``>>>``. The two
    agree while intermediates stay non-negative (most keys), and
    diverge exactly on the values a naive port gets wrong —
    getLongHash(0) is 0 only under signed shifts (step 1 yields −1,
    and −1 >> 24 == −1 cancels it), so a ``>>>`` port produces a
    filter that FALSE-NEGATIVES key 0 and every other
    negative-intermediate value: silent data loss on point lookups.
    Verified against JVM-written filters for 0 / ±1 / 7 / 255 /
    12345 at three filter sizes."""
    def s(v: int) -> int:
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= (1 << 63) else v

    k = s(key)
    k = s(~k + (k << 21))
    k ^= k >> 24  # arithmetic, not logical
    k = s(k + (k << 3) + (k << 8))
    k ^= k >> 14
    k = s(k + (k << 2) + (k << 4))
    k ^= k >> 28
    k = s(k + (k << 31))
    return k & ((1 << 64) - 1)


def orc_bloom_maybe(num_hash: int, bitset: bytes, h64: int) -> bool:
    """ORC bloom membership (BloomFilter#testHash): h1 = low int32,
    h2 = high int32 (both SIGNED casts); position i (1-based) is
    ``(h1 + i*h2)`` in wrapping int32 arithmetic, bit-flipped via
    ``~`` when negative, modulo the bit count; the utf8bitset lays
    the long array out little-endian, so bit p lives at byte p>>3,
    bit p&7. Any clear bit => definitely absent."""
    def to_i32(v: int) -> int:
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    h1, h2 = to_i32(h64), to_i32(h64 >> 32)
    nbits = len(bitset) * 8
    for i in range(1, num_hash + 1):
        c = to_i32(h1 + i * h2)
        if c < 0:
            c = to_i32(~c & 0xFFFFFFFF)
        pos = c % nbits
        if not (bitset[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def orc_bloom_index(
    stream: bytes, codec: int
) -> list[tuple[int, bytes]]:
    """Decode a kind-8 BLOOM_FILTER_UTF8 stream -> one
    (numHashFunctions, utf8 bitset bytes) per ROW GROUP (the index
    stride granularity — finer than parquet's per-chunk filters).
    The deprecated kind-7 fixed64 form (field 2; pre-ORC-101 default
    charset hashing) stays a loud seam."""
    bfi = decode_message(_unchunk(stream, codec))
    out = []
    for raw in bfi.get(1, []):
        bf = decode_message(raw)
        if 2 in bf and bf[2]:
            raise NotImplementedError(
                "deprecated ORC BLOOM_FILTER (fixed64 bitset / "
                "default-charset hashing) — only BLOOM_FILTER_UTF8 "
                "is supported"
            )
        out.append((bf[1][0], bf[3][0]))
    return out


@register(
    "source_orc_bloom_skipping",
    oracle="""
        WITH ranked AS (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (ORDER BY o_orderkey) AS rn,
                   count(*) OVER () AS n
            FROM orders
        )
        SELECT TRUE AS no_false_negatives,
               TRUE AS minmax_cannot_prune,
               TRUE AS skipping_effective,
               TRUE AS fp_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               CAST(sum(k) AS BIGINT) AS found_key_sum,
               CAST(sum(cents) AS BIGINT) AS found_cents
        FROM ranked,
             (SELECT unnest(range(1, 21)) AS j) js
        WHERE rn = CAST(floor(n * j / 21.0) AS BIGINT)
    """,
    tags=("source", "orc", "bloom-filter", "row-index", "skipping",
          "point-lookup", "data-read"),
)
def source_orc_bloom_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC BLOOM-FILTER row-GROUP skipping (round 16) — the ORC twin
    of `source_parquet_bloom_skipping`, one level finer: ORC blooms
    live per ROW GROUP beside the ROW_INDEX (stream kind 8,
    ``orc.bloom.filter.columns``), so a point lookup skips at the
    stride granularity and the surviving groups SEEK-DECODE through
    this round's row-index machinery — blooms decide WHICH groups,
    positions bound the decode, one composition.

    The fixture hash-shuffles the keys so every group's [min, max]
    covers every probe key (``minmax_cannot_prune`` — stats skipping
    would read everything) while the blooms answer per group. The
    probe stack is the hand-built `orc_bloom_long_hash` /
    `orc_bloom_maybe` — and the hash is the round's sharpest
    finding: ORC's getLongHash is Thomas Wang's mix with ARITHMETIC
    (``lshr``) shifts, not the published ``>>>`` form; the two agree
    on most keys and silently false-negative key 0 (and every
    negative-intermediate value) under a naive port. Key 0-class
    regressions are pinned by the JVM-differential unit test; here
    20 rank-sampled present keys must all be recovered from
    bloom-passing groups only (``no_false_negatives``) and 20
    absent keys attest ``skipping_effective`` + ``fp_bounded``
    (≤ 10% observed; ~1% design rate). The testdata key space is
    DENSE (0..N−1), so absent probes sit past the maximum — the
    reader never consults min/max, so the bloom rejections are
    attested on their own; with any real (gappy) key space the same
    path serves in-range misses identically.

    Scale posture: a needle lookup at 100 TB reads the bloom bytes
    (KB per stripe, already fetched with the index) and decodes
    only the groups that might match — versus scanning every row
    of every group a min/max check cannot exclude."""
    import pandas as _pd

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        scratch_root(), f"shs_orcbloom_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    n_rows = orders.count()
    w = Window.orderBy("k")
    ranked = orders.withColumn("rn", F.row_number().over(w))
    ranks = [n_rows * j // 21 for j in range(1, 21)]
    present = [
        (r["k"], r["cents"])
        for r in ranked.filter(F.col("rn").isin(ranks)).collect()
    ]
    max_k = orders.agg(F.max("k")).collect()[0][0]
    absent = [max_k + 1 + i for i in range(20)]
    stride = max(1000, n_rows // 6)
    stage = os.path.join(root, "stage")
    (
        orders.orderBy(F.hash("k"))  # shuffle: min/max can't prune
        .coalesce(1)
        .write.option("compression", "none")
        .option("orc.bloom.filter.columns", "k")
        # pinned: the writer default is 0.05, which leaves only 2x
        # headroom under the 10% fp_bounded assert — at 0.01 the
        # bound has real margin at any stride/SF (round-17 ADVICE)
        .option("orc.bloom.filter.fpp", "0.01")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "shuffled.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(
            path,
            json.dumps([[int(k), int(c)] for k, c in present]),
            json.dumps([int(k) for k in absent]),
        )],
        "path string, present string, absent string",
    )
    def _probe(batches) -> Iterator:
        import json as _json

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                present = _json.loads(rec.present)
                absent = _json.loads(rec.absent)
                no_fn = True
                minmax_cover = True
                n_found = 0
                key_sum = cents_sum = 0
                false_pass = 0
                total_groups = 0
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _index(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            ints = decode_message(stats[2][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": _unzigzag(ints[1][0]),
                                "max": _unzigzag(ints[2][0]),
                            })
                        return out

                    idx_k = _index(1)
                    idx_c = _index(2)
                    blooms = orc_bloom_index(streams[(1, 8)], codec)
                    if len(blooms) != len(idx_k):
                        raise ValueError(
                            "bloom entries disagree with row groups"
                        )
                    total_groups += len(blooms)
                    k_stream = streams[(1, 1)]
                    c_stream = streams[(2, 1)]
                    group_cache: dict[int, dict[int, int]] = {}

                    def _group(g: int) -> dict[int, int]:
                        if g not in group_cache:
                            ek, ec = idx_k[g], idx_c[g]
                            kb, kv = orc_index_positions(
                                ek["positions"], compressed=False
                            )
                            ks = decode_rlev2(
                                k_stream[kb:], signed=True,
                                max_values=kv + ek["n"],
                            )[kv : kv + ek["n"]]
                            cb, cv = orc_index_positions(
                                ec["positions"], compressed=False
                            )
                            cs = decode_rlev2(
                                c_stream[cb:], signed=True,
                                max_values=cv + ec["n"],
                            )[cv : cv + ec["n"]]
                            group_cache[g] = dict(zip(ks, cs))
                        return group_cache[g]

                    for k, cents in present:
                        h = orc_bloom_long_hash(k)
                        minmax_cover &= all(
                            e["min"] <= k <= e["max"] for e in idx_k
                        )
                        hit = False
                        for g, (nh, bits) in enumerate(blooms):
                            if not orc_bloom_maybe(nh, bits, h):
                                continue  # definitely absent here
                            got = _group(g).get(k)
                            if got is not None:
                                hit = True
                                n_found += 1
                                key_sum += k
                                cents_sum += got
                                break
                        no_fn &= hit
                    for k in absent:
                        h = orc_bloom_long_hash(k)
                        for g, (nh, bits) in enumerate(blooms):
                            if orc_bloom_maybe(nh, bits, h):
                                if _group(g).get(k) is not None:
                                    raise ValueError(
                                        "absent probe key found"
                                    )
                                false_pass += 1
                total_absent = len(absent) * total_groups
                rows.append((
                    bool(no_fn),
                    bool(minmax_cover and total_groups >= 2),
                    bool(false_pass < total_absent),
                    bool(false_pass <= total_absent // 10),
                    n_found, key_sum, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["no_false_negatives", "minmax_cannot_prune",
                         "skipping_effective", "fp_bounded",
                         "n_found", "found_key_sum", "found_cents"],
            )

    out = plan.mapInPandas(
        _probe,
        "no_false_negatives boolean, minmax_cannot_prune boolean,"
        " skipping_effective boolean, fp_bounded boolean,"
        " n_found bigint, found_key_sum bigint, found_cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def orc_murmur3_hash64(data: bytes, seed: int = 104729) -> int:
    """ORC's Murmur3 64-bit hash (org.apache.orc.util.Murmur3
    .hash64, DEFAULT_SEED 104729) — the byte-array hash behind
    BloomFilterUtf8.addString/addBytes, i.e. the x64_128 block mix
    keeping only the first lane: little-endian 8-byte blocks through
    (k*C1, rotl31, *C2) into ``h = rotl27(h^k)*5 + 0x52DCE729``, a
    tail XOR-accumulated low-to-high through the same k-mix, then
    ``h ^= length`` and the standard fmix64 avalanche. Unlike
    `orc_bloom_long_hash` there is no shift-semantics trap here —
    everything stays in unsigned 64-bit space — but the SEED is the
    catch: the class-private 104729 (not 0, not the 42 some ports
    assume), so every vector is pinned against the JVM class
    (Murmur3.hash64 via py4j) in the unit test."""
    mask = (1 << 64) - 1
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F

    def rotl(v: int, n: int) -> int:
        return ((v << n) | (v >> (64 - n))) & mask

    h = seed
    n8 = len(data) >> 3
    for i in range(n8):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * c1) & mask
        k = (rotl(k, 31) * c2) & mask
        h = (rotl(h ^ k, 27) * 5 + 0x52DCE729) & mask
    tail = data[n8 * 8 :]
    if tail:
        k1 = 0
        for j in range(len(tail) - 1, -1, -1):
            k1 ^= tail[j] << (8 * j)
        k1 = (k1 * c1) & mask
        k1 = (rotl(k1, 31) * c2) & mask
        h ^= k1
    h ^= len(data)
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & mask
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & mask
    return h ^ (h >> 33)


def orc_bloom_utf8_hash(s: str) -> int:
    """BloomFilterUtf8.addString's hash input: Murmur3 hash64 over
    the string's UTF-8 bytes (BloomFilterUtf8 replaced the
    default-charset hashing of the deprecated kind-7 form — ORC-101;
    `orc_bloom_index` keeps that old form a loud seam). The 64-bit
    result feeds the same (h1 + i*h2) position schedule as long
    keys — `orc_bloom_maybe` is shared."""
    return orc_murmur3_hash64(s.encode("utf-8"))


@register(
    "source_orc_bloom_skipping_string",
    oracle="""
        WITH ranked AS (
            SELECT 'ORD-' || lpad(CAST(o_orderkey AS VARCHAR), 9, '0')
                       AS s,
                   o_orderkey AS k,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (ORDER BY o_orderkey) AS rn,
                   count(*) OVER () AS n
            FROM orders
        )
        SELECT TRUE AS no_false_negatives,
               TRUE AS minmax_cannot_prune,
               TRUE AS skipping_effective,
               TRUE AS fp_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               CAST(sum(k) AS BIGINT) AS found_key_sum,
               CAST(sum(cents) AS BIGINT) AS found_cents
        FROM ranked,
             (SELECT unnest(range(1, 21)) AS j) js
        WHERE rn = CAST(floor(n * j / 21.0) AS BIGINT)
    """,
    tags=("source", "orc", "bloom-filter", "row-index", "skipping",
          "point-lookup", "string", "data-read"),
)
def source_orc_bloom_skipping_string(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC BLOOM-FILTER row-group skipping on a STRING column
    (round 17) — the commonest real bloom shape: point lookups on
    dimension-ish string keys (order ids, UUIDs, emails), where
    min/max statistics are nearly useless because shuffled string
    keys give every row group the same lexicographic span. The
    probe stack is `orc_bloom_utf8_hash` (Murmur3 hash64 over UTF-8
    bytes, seed 104729 — JVM-vector-pinned) into the SHARED
    `orc_bloom_maybe` position schedule; surviving groups
    seek-decode through the STRING path — the DIRECT_V2 three-
    position entry ``[DATA byte, LENGTH byte, LENGTH vskip]`` from
    `source_orc_row_index_skipping_string`, composed here with
    bloom selection instead of min/max selection (the round-16
    verdict's top item: the bloom machinery existed for longs, the
    seek machinery existed for strings; this query is their
    composition).

    The fixture derives a 13-byte string key 'ORD-%09d' from
    o_orderkey (so the DuckDB oracle can rebuild it exactly),
    hash-shuffles row order so every group's [min, max] string span
    covers every present probe (``minmax_cannot_prune``), and
    disables dictionary encoding (dictionary seeks are dictionary-
    global — that sibling seam stays loud in the string seek
    query). 20 rank-sampled present keys must each be recovered
    from bloom-passing groups only (``no_false_negatives`` — the
    found key's numeric suffix re-derives found_key_sum, tying the
    DECODED string bytes, not just the bloom answer, to the
    oracle); 20 absent keys (past the dense keyspace maximum, so
    13 bytes like every present key) attest ``skipping_effective``
    and ``fp_bounded`` (≤ 10% observed vs the pinned 1% design
    rate).

    Scale posture: identical to the long sibling — blooms are KB
    per stripe riding the index read, probing is planning-side,
    and only bloom-passing groups pay LENGTH+DATA decode. At 100 TB
    a string point lookup touches a handful of row groups instead
    of every group min/max cannot exclude (all of them, for hash-
    distributed string keys)."""
    import pandas as _pd

    orders = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("ORD-"),
            F.lpad(F.col("o_orderkey").cast("string"), 9, "0"),
        ).alias("s"),
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        scratch_root(), f"shs_orcbloomstr_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    n_rows = orders.count()
    w = Window.orderBy("k")
    ranked = orders.withColumn("rn", F.row_number().over(w))
    ranks = [n_rows * j // 21 for j in range(1, 21)]
    present = [
        (r["s"], r["cents"])
        for r in ranked.filter(F.col("rn").isin(ranks)).collect()
    ]
    max_k = orders.agg(F.max("k")).collect()[0][0]
    absent = [f"ORD-{max_k + 1 + i:09d}" for i in range(20)]
    stride = max(1000, n_rows // 6)
    stage = os.path.join(root, "stage")
    (
        orders.select("s", "cents")
        .orderBy(F.hash("s"))  # shuffle: min/max can't prune
        .coalesce(1)
        .write.option("compression", "none")
        .option("orc.bloom.filter.columns", "s")
        # pinned (not the 0.05 default) so the 10% fp bound has
        # margin at any stride/SF — same rationale as the long twin
        .option("orc.bloom.filter.fpp", "0.01")
        .option("orc.row.index.stride", str(stride))
        .option("orc.dictionary.key.threshold", "0")
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "shuffled.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(
            path,
            json.dumps([[s, int(c)] for s, c in present]),
            json.dumps(absent),
        )],
        "path string, present string, absent string",
    )

    def _probe(batches) -> Iterator:
        import json as _json

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                present = _json.loads(rec.present)
                absent = _json.loads(rec.absent)
                no_fn = True
                minmax_cover = True
                n_found = 0
                key_sum = cents_sum = 0
                false_pass = 0
                total_groups = 0
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    enc_s = decode_message(
                        sfoot[2][1]
                    ).get(1, [0])[0]
                    if enc_s != 2:  # DIRECT_V2 only
                        raise NotImplementedError(
                            "string bloom seek under encoding "
                            f"{enc_s} (dictionary seeks are "
                            "dictionary-global)"
                        )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    ri_s = decode_message(
                        _unchunk(streams[(1, 6)], codec)
                    )
                    idx_s = []
                    for eraw in ri_s.get(1, []):
                        e = decode_message(eraw)
                        stats = decode_message(e[2][0])
                        # StringStatistics = ColumnStatistics field 4
                        strs = decode_message(stats[4][0])
                        idx_s.append({
                            "positions": _packed_uvarints(
                                b"".join(e.get(1, []))
                            ),
                            "n": stats[1][0],
                            "min": strs[1][0].decode(),
                            "max": strs[2][0].decode(),
                        })
                    ri_c = decode_message(
                        _unchunk(streams[(2, 6)], codec)
                    )
                    idx_c = []
                    for eraw in ri_c.get(1, []):
                        e = decode_message(eraw)
                        stats = decode_message(e[2][0])
                        ints = decode_message(stats[2][0])
                        idx_c.append({
                            "positions": _packed_uvarints(
                                b"".join(e.get(1, []))
                            ),
                            "n": stats[1][0],
                        })
                    blooms = orc_bloom_index(streams[(1, 8)], codec)
                    if not (len(blooms) == len(idx_s) == len(idx_c)):
                        raise ValueError(
                            "bloom entries disagree with row groups"
                        )
                    total_groups += len(blooms)
                    s_data = streams[(1, 1)]
                    s_len = streams[(1, 2)]
                    c_stream = streams[(2, 1)]
                    group_cache: dict[int, dict[str, int]] = {}

                    def _group(g: int) -> dict[str, int]:
                        if g not in group_cache:
                            es, ec = idx_s[g], idx_c[g]
                            doff, loff, lskip = es["positions"]
                            lens = decode_rlev2(
                                s_len[loff:], signed=False,
                                max_values=lskip + es["n"],
                            )[lskip : lskip + es["n"]]
                            blob = s_data[
                                doff : doff + sum(lens)
                            ]
                            vals = []
                            at = 0
                            for ln in lens:
                                vals.append(
                                    blob[at : at + ln].decode()
                                )
                                at += ln
                            cb, cv = orc_index_positions(
                                ec["positions"], compressed=False
                            )
                            cs = decode_rlev2(
                                c_stream[cb:], signed=True,
                                max_values=cv + ec["n"],
                            )[cv : cv + ec["n"]]
                            if len(vals) != len(cs):
                                raise ValueError(
                                    "string/cents group sizes "
                                    "disagree"
                                )
                            group_cache[g] = dict(zip(vals, cs))
                        return group_cache[g]

                    for sk, cents in present:
                        h = orc_bloom_utf8_hash(sk)
                        minmax_cover &= all(
                            e["min"] <= sk <= e["max"]
                            for e in idx_s
                        )
                        hit = False
                        for g, (nh, bits) in enumerate(blooms):
                            if not orc_bloom_maybe(nh, bits, h):
                                continue  # definitely absent here
                            got = _group(g).get(sk)
                            if got is not None:
                                if got != cents:
                                    raise ValueError(
                                        "decoded cents disagree"
                                    )
                                hit = True
                                n_found += 1
                                # numeric suffix of the DECODED
                                # string, not the probe: a shear in
                                # the LENGTH/DATA split flips this
                                key_sum += int(sk[4:])
                                cents_sum += got
                                break
                        no_fn &= hit
                    for sk in absent:
                        h = orc_bloom_utf8_hash(sk)
                        for g, (nh, bits) in enumerate(blooms):
                            if orc_bloom_maybe(nh, bits, h):
                                if _group(g).get(sk) is not None:
                                    raise ValueError(
                                        "absent probe key found"
                                    )
                                false_pass += 1
                total_absent = len(absent) * total_groups
                rows.append((
                    bool(no_fn),
                    bool(minmax_cover and total_groups >= 2),
                    bool(false_pass < total_absent),
                    bool(false_pass <= total_absent // 10),
                    n_found, key_sum, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["no_false_negatives", "minmax_cannot_prune",
                         "skipping_effective", "fp_bounded",
                         "n_found", "found_key_sum", "found_cents"],
            )

    out = plan.mapInPandas(
        _probe,
        "no_false_negatives boolean, minmax_cannot_prune boolean,"
        " skipping_effective boolean, fp_bounded boolean,"
        " n_found bigint, found_key_sum bigint, found_cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_row_index_skipping_decimal",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS decimal_stats_attested,
               TRUE AS date_stats_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(min(CAST(o_orderdate AS DATE)) AS DATE)
                   AS min_orderdate,
               CAST(max(CAST(o_orderdate AS DATE)) AS DATE)
                   AS max_orderdate
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "decimal",
          "date", "data-read"),
)
def source_orc_row_index_skipping_decimal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC row-group seek-decode on DECIMAL and DATE columns
    (round 17) — the last TYPED seams of the seek family (int /
    string / dictionary / timestamp / nullable / compressed came
    before). Each type's position arity is its stream anatomy:

    - DECIMAL (non-decimal64 form: the one ORC writers emit for
      precision <= 18 with a SECONDARY stream): DATA is UNBOUNDED
      zigzag varints of the unscaled value — self-delimiting, so
      its index position is a BYTE OFFSET ONLY (no value skip: a
      row group always starts on a varint boundary); SECONDARY is
      the per-value scale as signed RLEv2 with the usual
      ``[byte offset, values to skip]`` — THREE positions total.
      A reader that assumes the int shape (2 positions) mis-splits
      the entry; one that reads DATA as RLEv2 decodes garbage. And
      the round's typed finding: the SECONDARY stream is NOT the
      declared scale repeated — HiveDecimal NORMALIZES (strips
      trailing zeros) before writing, so a decimal(18,2) column
      carries per-value scales 0..2 (100.50 -> unscaled 1005 at
      scale 1) and a reader that applies the declared scale
      uniformly mis-scales every normalized value (~11% of this
      fixture).
    - DATE: the int machinery verbatim on days-since-epoch (signed
      RLEv2 DATA, 2 positions) — the seam worth attesting is the
      STATISTICS shape, not the stream.

    Selection is by the key column's IntegerStatistics; every
    surviving group is attested against its own typed statistics —
    DecimalStatistics (ColumnStatistics field 6: min/max/sum as
    DECIMAL STRINGS, compared against the decoded unscaled/scale
    pairs reformatted) and DateStatistics (field 7: min/max as
    zigzag sint32 DAYS) — so a varint slip, a scale mis-skip, or a
    days-vs-millis confusion is loud before it can flip the
    aggregate (`decimal_stats_attested` / `date_stats_attested`
    ride the output row too).

    Scale posture: same as the whole family — selected groups pay
    decode, skipped groups pay nothing, and the decimal DATA
    stream's byte-offset-only seek means a group's cost is its own
    bytes, never a scan from the stripe start."""
    import datetime as _dt

    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcdec_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("d"),
            F.to_date("o_orderdate").alias("dt"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "none")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi, n_rows_total)],
        "path string, lo long, hi long, n_total long",
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                # schema gate: col 2 must be DECIMAL, col 3 DATE
                kinds = [
                    decode_message(traw).get(1, [0])[0]
                    for traw in footer.get(4, [])
                ]
                if kinds[2] != 14 or kinds[3] != 15:
                    raise ValueError(
                        f"fixture schema drifted: kinds {kinds}"
                    )
                g_total = g_sel = n_matched = 0
                cents_sum = 0
                rows_decoded = 0
                dec_ok = date_ok = True
                min_days = max_days = None
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _entries(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "stats": decode_message(e[2][0]),
                            })
                        return out

                    idx_k = _entries(1)
                    idx_d = _entries(2)
                    idx_t = _entries(3)
                    if not (len(idx_k) == len(idx_d) == len(idx_t)):
                        raise ValueError(
                            "column row indexes disagree"
                        )
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    d_data = streams[(2, 1)]
                    d_sec = streams[(2, 5)]
                    t_stream = streams[(3, 1)]

                    for ek, ed, et in zip(idx_k, idx_d, idx_t):
                        ik = decode_message(ek["stats"][2][0])
                        kmin = _unzigzag(ik[1][0])
                        kmax = _unzigzag(ik[2][0])
                        if kmax < rec.lo or kmin > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        n = ek["stats"][1][0]
                        kb, kv = orc_index_positions(
                            ek["positions"], compressed=False
                        )
                        ks = decode_rlev2(
                            k_stream[kb:], signed=True,
                            max_values=kv + n,
                        )[kv : kv + n]
                        # DECIMAL: [DATA byte] + [SECONDARY byte,
                        # SECONDARY vskip]
                        if len(ed["positions"]) != 3:
                            raise NotImplementedError(
                                "decimal row-index entry with "
                                f"{len(ed['positions'])} positions "
                                "(expected 3: DATA byte + SECONDARY "
                                "byte/values — nullable/compressed "
                                "add their usual prefixes)"
                            )
                        db, sb, sv = ed["positions"]
                        p = db
                        unscaled = []
                        for _ in range(n):
                            u, p = _uvarint(d_data, p)
                            unscaled.append(_unzigzag(u))
                        scales = decode_rlev2(
                            d_sec[sb:], signed=True,
                            max_values=sv + n,
                        )[sv : sv + n]
                        # HiveDecimal normalization: the writer
                        # STRIPS trailing zeros, so a decimal(18,2)
                        # column's scale stream is NOT constant —
                        # 100.50 lands as (1005, scale 1), 100.00
                        # as (100, scale 0); a reader assuming the
                        # declared scale mis-scales ~10% of values
                        if not set(scales) <= {0, 1, 2}:
                            raise ValueError(
                                "decimal(18,2) scale outside 0..2"
                            )
                        cents = [
                            u * 10 ** (2 - s)
                            for u, s in zip(unscaled, scales)
                        ]
                        # attest against DecimalStatistics (field 6:
                        # min/max/sum as normalized decimal strings)
                        ds = decode_message(ed["stats"][6][0])

                        def _fmt(c: int) -> str:
                            sign = "-" if c < 0 else ""
                            a = abs(c)
                            s = f"{sign}{a // 100}.{a % 100:02d}"
                            return s.rstrip("0").rstrip(".")

                        dec_ok &= (
                            len(cents) == ed["stats"][1][0]
                            and _fmt(min(cents))
                            == ds[1][0].decode()
                            and _fmt(max(cents))
                            == ds[2][0].decode()
                            and _fmt(sum(cents))
                            == ds[3][0].decode()
                        )
                        # DATE: int machinery on days
                        tb, tv = orc_index_positions(
                            et["positions"], compressed=False
                        )
                        days = decode_rlev2(
                            t_stream[tb:], signed=True,
                            max_values=tv + n,
                        )[tv : tv + n]
                        # DateStatistics (field 7: sint32 days)
                        ts = decode_message(et["stats"][7][0])
                        date_ok &= (
                            min(days) == _unzigzag(ts[1][0])
                            and max(days) == _unzigzag(ts[2][0])
                        )
                        rows_decoded += n
                        for kvv, cv, dd in zip(ks, cents, days):
                            if rec.lo <= kvv <= rec.hi:
                                n_matched += 1
                                cents_sum += cv
                                if (min_days is None
                                        or dd < min_days):
                                    min_days = dd
                                if (max_days is None
                                        or dd > max_days):
                                    max_days = dd
                epoch = _dt.date(1970, 1, 1)
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < rec.n_total),
                    bool(dec_ok),
                    bool(date_ok),
                    n_matched, cents_sum,
                    epoch + _dt.timedelta(days=min_days),
                    epoch + _dt.timedelta(days=max_days),
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "decimal_stats_attested",
                         "date_stats_attested",
                         "n_matched", "cents",
                         "min_orderdate", "max_orderdate"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " decimal_stats_attested boolean,"
        " date_stats_attested boolean, n_matched bigint,"
        " cents bigint, min_orderdate date, max_orderdate date",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_orc_bloom_skipping_dictionary",
    oracle="""
        WITH r AS (
            SELECT 'CUST-' || lpad(CAST(o_orderkey % 1000 AS VARCHAR),
                                   4, '0') AS s,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        ),
        probes AS (
            SELECT 'CUST-' || lpad(CAST(CAST(floor(1000 * j / 21.0)
                                             AS BIGINT) AS VARCHAR),
                                   4, '0') AS s
            FROM (SELECT unnest(range(1, 21)) AS j)
        )
        SELECT TRUE AS no_false_negatives,
               TRUE AS minmax_cannot_prune,
               TRUE AS dict_decoded_once_per_stripe,
               TRUE AS skipping_effective,
               TRUE AS fp_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               CAST(sum(cents) AS BIGINT) AS found_cents
        FROM r JOIN probes USING (s)
    """,
    tags=("source", "orc", "bloom-filter", "dictionary", "row-index",
          "skipping", "point-lookup", "string", "data-read"),
)
def source_orc_bloom_skipping_dictionary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC bloom skipping composed with DICTIONARY_V2 decoding
    (round 17) — closes the seam the DIRECT_V2 string-bloom query
    declares ("dictionary seeks are dictionary-global"). This is
    the realistic warehouse shape the two parents individually
    dodge: a REPEATED string key (here ~15 rows per key) always
    dictionary-encodes, and point lookups on it want blooms because
    hash-clustered layout makes every row group's [min, max] span
    the whole lexicographic range.

    The division of labor under a bloom hit: blooms answer per ROW
    GROUP (hashing the VALUE strings — `orc_bloom_utf8_hash`, same
    Murmur3 as DIRECT_V2: the writer hashes what was added, not how
    it is stored); the DICTIONARY (LENGTH + DICTIONARY_DATA) is
    decoded ONCE per stripe, O(distinct); only bloom-passing
    groups' INDEX runs (unsigned RLEv2 DATA, int-style
    ``[byte, values-to-skip]`` positions) ever decode. A reader
    that seeks the dictionary streams with the index positions
    decodes garbage; one that re-reads the dictionary per group
    does O(groups x distinct) redundant work.

    The fixture clusters rows by hash(s) so each key's ~15 rows are
    CONTIGUOUS (bloom-localized to ~1 group, possibly straddling a
    boundary — the reader must collect from EVERY passing group,
    not stop at the first hit) while group min/max stay useless;
    keys derive from o_orderkey % 1000 so the DuckDB oracle
    recomputes the 20 rank-sampled present probes and their full
    row sets exactly. 20 absent probes (CUST-1000..1019, same byte
    length) attest skipping and the <= 10% fp bound against the
    pinned 1% design rate.

    Scale posture: dictionary KB-scale per stripe; bloom probing
    planning-side; per-probe decode bounded to the passing groups'
    index runs — at 100 TB a repeated-key lookup reads one group's
    indices, not every group a useless min/max check keeps."""
    import pandas as _pd

    orders = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("CUST-"),
            F.lpad((F.col("o_orderkey") % 1000).cast("string"),
                   4, "0"),
        ).alias("s"),
        F.round(F.col("o_totalprice") * 100).cast("long")
        .alias("cents"),
    )
    root = os.path.join(
        scratch_root(), f"shs_orcbloomdict_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    n_rows = orders.count()
    stride = max(1000, n_rows // 6)
    stage = os.path.join(root, "stage")
    (
        orders.orderBy(F.hash("s"))  # cluster keys, scramble lex
        .coalesce(1)
        .write.option("compression", "none")
        .option("orc.bloom.filter.columns", "s")
        .option("orc.bloom.filter.fpp", "0.01")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "clustered.orc")
    os.replace(os.path.join(stage, src), path)

    present = [f"CUST-{1000 * j // 21:04d}" for j in range(1, 21)]
    absent = [f"CUST-{1000 + i:04d}" for i in range(20)]
    plan = spark.createDataFrame(
        [(path, json.dumps(present), json.dumps(absent))],
        "path string, present string, absent string",
    )

    def _probe(batches) -> Iterator:
        import json as _json

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec != 0:
                    raise ValueError(
                        "uncompressed fixture came back compressed"
                    )
                present = _json.loads(rec.present)
                absent = _json.loads(rec.absent)
                no_fn = True
                minmax_cover = True
                dict_once = True
                n_found = 0
                cents_sum = 0
                false_pass = 0
                total_groups = 0
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    enc = decode_message(sfoot[2][1])
                    if enc.get(1, [0])[0] != 3:  # DICTIONARY_V2
                        raise NotImplementedError(
                            "dictionary bloom seek under encoding "
                            f"{enc.get(1, [0])[0]}"
                        )
                    dict_size = enc[2][0]
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    # dictionary: ONCE per stripe, O(distinct)
                    lens = decode_rlev2(
                        streams[(1, 2)], signed=False,
                        max_values=dict_size,
                    )[:dict_size]
                    blob = streams[(1, 3)]
                    if sum(lens) != len(blob):
                        raise ValueError(
                            "dictionary blob disagrees with LENGTH"
                        )
                    words = []
                    at = 0
                    for ln in lens:
                        words.append(blob[at : at + ln].decode())
                        at += ln
                    dict_once &= len(words) == dict_size

                    def _entries(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            stats = decode_message(e[2][0])
                            strs = decode_message(stats[4][0])
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "n": stats[1][0],
                                "min": strs[1][0].decode(),
                                "max": strs[2][0].decode(),
                            })
                        return out

                    idx_s = _entries(1)
                    ri_c = decode_message(
                        _unchunk(streams[(2, 6)], codec)
                    )
                    idx_c = []
                    for eraw in ri_c.get(1, []):
                        e = decode_message(eraw)
                        stats = decode_message(e[2][0])
                        idx_c.append({
                            "positions": _packed_uvarints(
                                b"".join(e.get(1, []))
                            ),
                            "n": stats[1][0],
                        })
                    blooms = orc_bloom_index(streams[(1, 8)], codec)
                    if not (len(blooms) == len(idx_s) == len(idx_c)):
                        raise ValueError(
                            "bloom entries disagree with row groups"
                        )
                    total_groups += len(blooms)
                    s_idx_stream = streams[(1, 1)]
                    c_stream = streams[(2, 1)]
                    group_cache: dict[int, list] = {}

                    def _group(g: int) -> list:
                        if g not in group_cache:
                            es, ec = idx_s[g], idx_c[g]
                            sb, sv = orc_index_positions(
                                es["positions"], compressed=False
                            )
                            idxs = decode_rlev2(
                                s_idx_stream[sb:], signed=False,
                                max_values=sv + es["n"],
                            )[sv : sv + es["n"]]
                            cb, cv = orc_index_positions(
                                ec["positions"], compressed=False
                            )
                            cs = decode_rlev2(
                                c_stream[cb:], signed=True,
                                max_values=cv + ec["n"],
                            )[cv : cv + ec["n"]]
                            group_cache[g] = list(zip(idxs, cs))
                        return group_cache[g]

                    for sk in present:
                        h = orc_bloom_utf8_hash(sk)
                        minmax_cover &= all(
                            e["min"] <= sk <= e["max"]
                            for e in idx_s
                        )
                        found_here = 0
                        for g, (nh, bits) in enumerate(blooms):
                            if not orc_bloom_maybe(nh, bits, h):
                                continue  # definitely absent here
                            # collect from EVERY passing group: a
                            # key's run may straddle a boundary
                            for di, cv in _group(g):
                                if words[di] == sk:
                                    found_here += 1
                                    cents_sum += cv
                        n_found += found_here
                        no_fn &= found_here > 0
                    for sk in absent:
                        h = orc_bloom_utf8_hash(sk)
                        for g, (nh, bits) in enumerate(blooms):
                            if orc_bloom_maybe(nh, bits, h):
                                if any(words[di] == sk
                                       for di, _ in _group(g)):
                                    raise ValueError(
                                        "absent probe key found"
                                    )
                                false_pass += 1
                total_absent = len(absent) * total_groups
                rows.append((
                    bool(no_fn),
                    bool(minmax_cover and total_groups >= 2),
                    bool(dict_once),
                    bool(false_pass < total_absent),
                    bool(false_pass <= total_absent // 10),
                    n_found, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["no_false_negatives", "minmax_cannot_prune",
                         "dict_decoded_once_per_stripe",
                         "skipping_effective", "fp_bounded",
                         "n_found", "found_cents"],
            )

    out = plan.mapInPandas(
        _probe,
        "no_false_negatives boolean, minmax_cannot_prune boolean,"
        " dict_decoded_once_per_stripe boolean,"
        " skipping_effective boolean, fp_bounded boolean,"
        " n_found bigint, found_cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def orc_seek_varints_compressed(
    stream: bytes, codec: int, chunk_off: int, dec_off: int,
    n: int, touched: set[int] | None = None,
) -> list[int]:
    """Seek-decode ``n`` signed (zigzag) UNBOUNDED VARINTS from a
    COMPRESSED ORC stream — the decimal DATA shape under the
    default codecs: start at the chunk whose header sits at
    ``chunk_off``, drop ``dec_off`` leading bytes of its
    decompressed output (no value skip: varints are self-delimiting
    and row groups start on varint boundaries). Chunks decompress
    LAZILY: a varint truncated by the buffer end (`TruncatedRun` —
    the round's truncation/corruption split doing real work) pulls
    exactly one more chunk and the unconsumed tail (< 10 bytes, a
    partial varint) carries over — chunks before the seek point and
    after the group's last varint are never decompressed
    (``touched`` collects decompressed header offsets for the
    laziness attestation)."""
    out: list[int] = []
    buf = b""
    pos = 0
    p = chunk_off
    first = True
    while len(out) < n:
        try:
            u, pos = _uvarint(buf, pos)
        except TruncatedRun:
            if p + 3 > len(stream):
                raise ValueError(
                    "varint seek-decode ran out of compression "
                    "chunks"
                )
            h = (stream[p] | (stream[p + 1] << 8)
                 | (stream[p + 2] << 16))
            clen = h >> 1
            dec = _unchunk(stream[p : p + 3 + clen], codec)
            if touched is not None:
                touched.add(p)
            if first:
                dec = dec[dec_off:]
                first = False
            buf = buf[pos:] + dec
            pos = 0
            p += 3 + clen
            continue
        out.append(_unzigzag(u))
    return out


@register(
    "source_orc_row_index_skipping_decimal_compressed",
    oracle="""
        WITH bounds AS (
            SELECT CAST(floor(0.30 * max(o_orderkey)) AS BIGINT)
                       AS lo,
                   CAST(floor(0.45 * max(o_orderkey)) AS BIGINT)
                       AS hi
            FROM orders
        )
        SELECT TRUE AS skipping_effective,
               TRUE AS partial_decode,
               TRUE AS lazy_decompression,
               TRUE AS decimal_stats_attested,
               CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders, bounds
        WHERE o_orderkey BETWEEN lo AND hi
    """,
    tags=("source", "orc", "row-index", "skipping", "decimal",
          "compressed", "data-read"),
)
def source_orc_row_index_skipping_decimal_compressed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC DECIMAL row-group seek-decode under COMPRESSION
    (round 17) — the production shape of the decimal seam: under
    the default codecs the decimal entry carries FIVE positions,
    chunk indirection prepended per stream asymmetrically — DATA
    gets ``[chunk offset, decompressed offset]`` ONLY (varints are
    self-delimiting, no value skip) while SECONDARY gets the full
    ``[chunk, decompressed offset, values to skip]`` — so a reader
    that splits 5 symmetrically mis-seeks both streams.
    `orc_seek_varints_compressed` pulls chunks lazily, one per
    `TruncatedRun`, with the partial-varint tail carried over;
    scales ride the existing `orc_seek_decode_compressed`. The
    per-group DecimalStatistics string attestation (normalized
    HiveDecimal form) and the laziness attestation (touched chunk
    headers a strict subset of each stream's chunk-header walk)
    both ride the output row.

    Scale posture: the group's cost is its own chunks — the
    1 KiB ``orc.compress.size`` fixture makes streams span many
    chunks at every SF so the strict-subset claim has teeth."""
    import pandas as _pd

    root = os.path.join(
        scratch_root(), f"shs_orcdecc_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    fixture = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("d"),
        )
        .sort("k")
    )
    row = fixture.agg(
        F.floor(F.max("k") * 0.30).cast("long").alias("lo"),
        F.floor(F.max("k") * 0.45).cast("long").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    lo, hi, n_rows_total = row["lo"], row["hi"], row["n"]
    stride = max(1000, n_rows_total // 6)
    stage = os.path.join(root, "stage")
    (
        fixture.coalesce(1)
        .write.option("compression", "zlib")
        .option("orc.compress.size", "1024")
        .option("orc.row.index.stride", str(stride))
        .orc(stage)
    )
    src = next(f for f in os.listdir(stage) if f.endswith(".orc"))
    path = os.path.join(root, "sorted.orc")
    os.replace(os.path.join(stage, src), path)

    plan = spark.createDataFrame(
        [(path, lo, hi, n_rows_total)],
        "path string, lo long, hi long, n_total long",
    )

    def _decode(batches) -> Iterator:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    data = fh.read()
                footer, codec = _orc_file_tail(data)
                if codec == 0:
                    raise ValueError(
                        "compressed fixture came back uncompressed"
                    )
                g_total = g_sel = n_matched = 0
                cents_sum = 0
                rows_decoded = 0
                dec_ok = lazy_ok = True
                for sraw in footer.get(3, []):
                    st = decode_message(sraw)
                    off, ilen, dlen, flen = (
                        st[1][0], st[2][0], st[3][0], st[4][0]
                    )
                    sfoot = decode_message(
                        _unchunk(data[off + ilen + dlen
                                      : off + ilen + dlen + flen],
                                 codec)
                    )
                    pos = off
                    streams: dict[tuple[int, int], bytes] = {}
                    for s in sfoot[1]:
                        m = decode_message(s)
                        kind, col, ln = (
                            m.get(1, [0])[0], m.get(2, [0])[0],
                            m[3][0],
                        )
                        streams[(col, kind)] = data[pos : pos + ln]
                        pos += ln

                    def _entries(col: int) -> list[dict]:
                        ri = decode_message(
                            _unchunk(streams[(col, 6)], codec)
                        )
                        out = []
                        for eraw in ri.get(1, []):
                            e = decode_message(eraw)
                            out.append({
                                "positions": _packed_uvarints(
                                    b"".join(e.get(1, []))
                                ),
                                "stats": decode_message(e[2][0]),
                            })
                        return out

                    idx_k = _entries(1)
                    idx_d = _entries(2)
                    if len(idx_k) != len(idx_d):
                        raise ValueError(
                            "column row indexes disagree"
                        )
                    g_total += len(idx_k)
                    k_stream = streams[(1, 1)]
                    d_data = streams[(2, 1)]
                    d_sec = streams[(2, 5)]
                    touched_data: set[int] = set()
                    touched_sec: set[int] = set()

                    any_sel = False
                    for ek, ed in zip(idx_k, idx_d):
                        ik = decode_message(ek["stats"][2][0])
                        kmin = _unzigzag(ik[1][0])
                        kmax = _unzigzag(ik[2][0])
                        if kmax < rec.lo or kmin > rec.hi:
                            continue  # skipped: never decoded
                        g_sel += 1
                        any_sel = True
                        n = ek["stats"][1][0]
                        kc, kd, kv = orc_index_positions(
                            ek["positions"], compressed=True
                        )
                        ks = orc_seek_decode_compressed(
                            k_stream, codec, kc, kd, kv, n
                        )
                        if len(ed["positions"]) != 5:
                            raise NotImplementedError(
                                "compressed decimal row-index "
                                f"entry with {len(ed['positions'])} "
                                "positions (expected 5: DATA "
                                "chunk/dec + SECONDARY "
                                "chunk/dec/values)"
                            )
                        dc, dd, sc, sd, sv = ed["positions"]
                        unscaled = orc_seek_varints_compressed(
                            d_data, codec, dc, dd, n,
                            touched=touched_data,
                        )
                        scales = orc_seek_decode_compressed(
                            d_sec, codec, sc, sd, sv, n,
                            touched=touched_sec,
                        )
                        if not set(scales) <= {0, 1, 2}:
                            raise ValueError(
                                "decimal(18,2) scale outside 0..2"
                            )
                        cents = [
                            u * 10 ** (2 - s)
                            for u, s in zip(unscaled, scales)
                        ]
                        ds = decode_message(ed["stats"][6][0])

                        def _fmt(c: int) -> str:
                            sign = "-" if c < 0 else ""
                            a = abs(c)
                            s = f"{sign}{a // 100}.{a % 100:02d}"
                            return s.rstrip("0").rstrip(".")

                        dec_ok &= (
                            len(cents) == ed["stats"][1][0]
                            and _fmt(min(cents))
                            == ds[1][0].decode()
                            and _fmt(max(cents))
                            == ds[2][0].decode()
                            and _fmt(sum(cents))
                            == ds[3][0].decode()
                        )
                        rows_decoded += n
                        for kvv, cv in zip(ks, cents):
                            if rec.lo <= kvv <= rec.hi:
                                n_matched += 1
                                cents_sum += cv
                    if any_sel:
                        # laziness: decompressed headers a STRICT
                        # subset of each stream's chunk walk
                        lazy_ok &= (
                            touched_data
                            < set(orc_stream_chunk_offsets(d_data))
                            and touched_sec
                            <= set(orc_stream_chunk_offsets(d_sec))
                        )
                rows.append((
                    bool(1 <= g_sel < g_total),
                    bool(rows_decoded < rec.n_total),
                    bool(lazy_ok),
                    bool(dec_ok),
                    n_matched, cents_sum,
                ))
            yield _pd.DataFrame(
                rows,
                columns=["skipping_effective", "partial_decode",
                         "lazy_decompression",
                         "decimal_stats_attested",
                         "n_matched", "cents"],
            )

    out = plan.mapInPandas(
        _decode,
        "skipping_effective boolean, partial_decode boolean,"
        " lazy_decompression boolean,"
        " decimal_stats_attested boolean, n_matched bigint,"
        " cents bigint",
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
