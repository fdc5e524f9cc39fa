"""LZ4 block format — hand-built from the public spec
(github.com/lz4/lz4/blob/dev/doc/lz4_Block_format.md), since no lz4
library ships in this container. Closes the ORC ``LZ4`` chunk-codec
seam in sources/orc_meta.py (ORC compresses its tail sections and
streams with raw LZ4 blocks inside its own 3-byte chunk framing).

Decoder: the complete sequence grammar — token with 4-bit literal /
match length nibbles, 255-saturated extension bytes, 2-byte
little-endian match offsets (0 is malformed), OVERLAPPING matches
(offset < length replicates byte-by-byte, the LZ77 run idiom), and
the spec's end conditions (a block ends on a literals-only final
sequence; a match token at end-of-input is malformed).

Encoder: a greedy matcher over a 4-byte-prefix hash table (same
shape as operators/snappy.py) — real compression on repetitive
input; offsets capped at 65535 per the format.

DIFFERENTIALLY TESTED against pyarrow's bundled reference codec
(``pa.Codec("lz4_raw")``) in both directions: our decoder must decode
reference-compressed blocks byte-identically, and the reference must
decode ours (tests/test_orc_meta.py) — the same discipline as the
zstd CLI differential.
"""

from __future__ import annotations

_MIN_MATCH = 4


def lz4_block_decompress(payload: bytes, expected_len: int | None = None) -> bytes:
    """Decode one raw LZ4 block. ``expected_len``, when given, is
    verified against the produced output (callers like ORC know the
    uncompressed chunk size from their own framing)."""
    out = bytearray()
    pos = 0
    n = len(payload)
    if n == 0:
        raise ValueError("empty LZ4 block")
    while pos < n:
        token = payload[pos]
        pos += 1
        # literal length: high nibble, 15 => extension bytes until !=255
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 literal length")
                b = payload[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("truncated LZ4 literals")
        out += payload[pos : pos + lit_len]
        pos += lit_len
        if pos == n:  # spec: the last sequence is literals-only
            break
        if pos + 2 > n:
            raise ValueError("truncated LZ4 match offset")
        offset = payload[pos] | (payload[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("LZ4 match offset out of range")
        match_len = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 match length")
                b = payload[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(match_len):  # byte-by-byte: overlap replicates
            out.append(out[start + k])
    if expected_len is not None and len(out) != expected_len:
        raise ValueError(
            f"LZ4 length mismatch: expected {expected_len}, got {len(out)}"
        )
    return bytes(out)


def _push_len(out: bytearray, extra: int) -> None:
    """Emit a 255-saturated length extension."""
    while extra >= 255:
        out.append(255)
        extra -= 255
    out.append(extra)


def lz4_block_compress(data: bytes) -> bytes:
    """Encode one raw LZ4 block: greedy 4-byte-prefix matcher with
    2-byte offsets; honors the spec's end conditions (final sequence
    is literals-only, matches never start within the last 12 bytes)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    i = lit_start = 0
    # spec end conditions: last match must start >= 12 bytes before
    # the block end and leave >= 5 literal bytes after it
    match_limit = max(n - 12, 0)
    while i < match_limit:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j : j + 4] == key:
            length = _MIN_MATCH
            max_len = n - 5 - i  # keep the required literal tail
            while length < max_len and data[j + length] == data[i + length]:
                length += 1
            lits = data[lit_start:i]
            lit_nib = min(len(lits), 15)
            mat_nib = min(length - _MIN_MATCH, 15)
            out.append((lit_nib << 4) | mat_nib)
            if lit_nib == 15:
                _push_len(out, len(lits) - 15)
            out += lits
            out += (i - j).to_bytes(2, "little")
            if mat_nib == 15:
                _push_len(out, length - _MIN_MATCH - 15)
            i += length
            lit_start = i
        else:
            i += 1
    # final literals-only sequence
    lits = data[lit_start:]
    lit_nib = min(len(lits), 15)
    out.append(lit_nib << 4)
    if lit_nib == 15:
        _push_len(out, len(lits) - 15)
    out += lits
    return bytes(out)


# ---------------------------------------------------------------------------
# LZ4 FRAME format (lz4_Frame_format.md) — the container Arrow IPC's
# LZ4_FRAME body compression and most `.lz4` files use around the
# block format above.
# ---------------------------------------------------------------------------

_XXH32_P1, _XXH32_P2 = 2654435761, 2246822519
_XXH32_P3, _XXH32_P4, _XXH32_P5 = 3266489917, 668265263, 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 (github.com/Cyan4973/xxHash spec) — LZ4 frames use it
    for the header-checksum byte and the content checksum."""
    n = len(data)
    p = 0
    if n >= 16:
        v1 = (seed + _XXH32_P1 + _XXH32_P2) & _M32
        v2 = (seed + _XXH32_P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXH32_P1) & _M32
        while p + 16 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                lane = int.from_bytes(data[p + 4 * i : p + 4 * i + 4],
                                      "little")
                v = (v + lane * _XXH32_P2) & _M32
                v = (_rotl32(v, 13) * _XXH32_P1) & _M32
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            p += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7)
             + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _XXH32_P5) & _M32
    h = (h + n) & _M32
    while p + 4 <= n:
        h = (h + int.from_bytes(data[p : p + 4], "little")
             * _XXH32_P3) & _M32
        h = (_rotl32(h, 17) * _XXH32_P4) & _M32
        p += 4
    while p < n:
        h = (h + data[p] * _XXH32_P5) & _M32
        h = (_rotl32(h, 11) * _XXH32_P1) & _M32
        p += 1
    h ^= h >> 15
    h = (h * _XXH32_P2) & _M32
    h ^= h >> 13
    h = (h * _XXH32_P3) & _M32
    h ^= h >> 16
    return h


_LZ4F_MAGIC = 0x184D2204


def lz4_frame_decompress(data: bytes) -> bytes:
    """One LZ4 frame -> content bytes, validating the header checksum
    byte, per-block checksums when flagged, the declared content size,
    and the trailing content checksum when flagged.

    Frame grammar: magic u32; FLG (version must be 01, flags for
    block independence / block checksum / content size / content
    checksum / dictionary id); BD (block max size code 4-7); optional
    u64 content size; optional u32 dict id (loud — needs external
    state); HC byte = (xxh32(descriptor)>>8)&0xFF; then blocks of
    u32 size (high bit set = stored uncompressed) + data
    (+ u32 xxh32 block checksum when flagged) until a 0x00000000
    end mark; then u32 xxh32(content) when flagged."""
    if len(data) < 7 or int.from_bytes(data[:4], "little") != _LZ4F_MAGIC:
        raise ValueError("not an LZ4 frame (magic missing)")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 0b01:
        raise NotImplementedError(f"LZ4 frame version {flg >> 6}")
    block_indep = bool(flg & 0x20)
    block_checksum = bool(flg & 0x10)
    content_size_flag = bool(flg & 0x08)
    content_checksum = bool(flg & 0x04)
    dict_id = bool(flg & 0x01)
    if dict_id:
        raise NotImplementedError("LZ4 frame dictionary id")
    if (bd >> 4) & 0x7 not in (4, 5, 6, 7):
        raise ValueError(f"LZ4 frame block-size code {(bd >> 4) & 0x7}")
    p = 6
    declared_size = None
    if content_size_flag:
        declared_size = int.from_bytes(data[p : p + 8], "little")
        p += 8
    hc = data[p]
    p += 1
    if ((xxh32(data[4 : p - 1]) >> 8) & 0xFF) != hc:
        raise ValueError("LZ4 frame header checksum mismatch")
    out = bytearray()
    while True:
        if p + 4 > len(data):
            raise ValueError("LZ4 frame truncated before end mark")
        bsize = int.from_bytes(data[p : p + 4], "little")
        p += 4
        if bsize == 0:  # end mark
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if p + bsize > len(data):
            raise ValueError("LZ4 frame block overruns input")
        blk = data[p : p + bsize]
        p += bsize
        if block_checksum:
            want = int.from_bytes(data[p : p + 4], "little")
            p += 4
            if xxh32(blk) != want:
                raise ValueError("LZ4 frame block checksum mismatch")
        if uncompressed:
            out += blk
        elif block_indep:
            out += lz4_block_decompress(blk)
        else:
            # linked blocks: matches may reach back into prior blocks'
            # last 64 KiB — decode against the running output
            out += _lz4_block_with_prefix(blk, bytes(out[-65536:]))
    if content_checksum:
        want = int.from_bytes(data[p : p + 4], "little")
        p += 4
        if xxh32(bytes(out)) != want:
            raise ValueError("LZ4 frame content checksum mismatch")
    if p != len(data):
        raise ValueError("LZ4 frame has trailing bytes")
    if declared_size is not None and len(out) != declared_size:
        raise ValueError("LZ4 frame content size mismatch")
    return bytes(out)


def _lz4_block_with_prefix(payload: bytes, prefix: bytes) -> bytes:
    """Decode one linked-mode block whose matches may reference the
    previous blocks' window: decompress with the prefix prepended to
    the output window, return only the new bytes."""
    # reuse the block decoder by seeding its output with the prefix:
    # simplest correct form — inline the same grammar with a seeded
    # window (the standalone decoder has no seed parameter).
    out = bytearray(prefix)
    base = len(prefix)
    p = 0
    n = len(payload)
    while True:
        if p >= n:
            raise ValueError("LZ4 block ended without a final sequence")
        token = payload[p]
        p += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if p >= n:
                    raise ValueError("truncated LZ4 literal length")
                b = payload[p]
                p += 1
                lit_len += b
                if b != 255:
                    break
        if p + lit_len > n:
            raise ValueError("truncated LZ4 literals")
        out += payload[p : p + lit_len]
        p += lit_len
        if p == n:
            break  # literals-only final sequence
        if p + 2 > n:
            raise ValueError("truncated LZ4 match offset")
        offset = int.from_bytes(payload[p : p + 2], "little")
        p += 2
        if offset == 0 or offset > len(out):
            raise ValueError("LZ4 match offset out of range")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if p >= n:
                    raise ValueError("truncated LZ4 match length")
                b = payload[p]
                p += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ValueError("LZ4 match reaches before window start")
        for i in range(mlen):
            out.append(out[start + i])
    return bytes(out[base:])


def lz4_frame_compress(data: bytes) -> bytes:
    """Content bytes -> ONE LZ4 frame, the shape Puffin's ``lz4``
    codec names ("single compression frame with content size
    present"): version-01 FLG with block independence + content size
    + content checksum, 4 MiB block-size code, independent blocks
    (stored uncompressed when LZ4 would not shrink them), end mark,
    xxh32 content checksum. Round-trips through
    `lz4_frame_decompress`."""
    flg = (0b01 << 6) | 0x20 | 0x08 | 0x04  # indep + size + checksum
    bd = 7 << 4  # 4 MiB max block size
    desc = bytes([flg, bd]) + len(data).to_bytes(8, "little")
    out = bytearray()
    out += _LZ4F_MAGIC.to_bytes(4, "little")
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    block_max = 4 * 1024 * 1024
    for i in range(0, len(data), block_max):
        blk = data[i : i + block_max]
        comp = lz4_block_compress(blk)
        if len(comp) < len(blk):
            out += len(comp).to_bytes(4, "little")
            out += comp
        else:
            out += (len(blk) | 0x80000000).to_bytes(4, "little")
            out += blk
    out += (0).to_bytes(4, "little")  # end mark
    out += xxh32(data).to_bytes(4, "little")
    return bytes(out)
