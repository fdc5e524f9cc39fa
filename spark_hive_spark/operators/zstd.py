"""Zstandard frame layer — hand-built from RFC 8878 (no zstd library
in this container). Scope: the FRAME machinery end-to-end — magic,
frame-header descriptor (all four FCS sizes, single-segment flag,
window descriptor, dictionary-ID rejection), Raw and RLE blocks, the
last-block flag, and the optional content checksum (the low 32 bits
of XXH64, hand-rolled below with the published test vectors).

Raw/RLE-only frames are LEGAL zstd — this is what the format emits
for incompressible data — so `zstd_compress` produces real frames
any zstd tool can read, and `zstd_decompress` reads any frame whose
blocks are Raw/RLE. Compressed blocks (FSE/Huffman literals +
sequences) are the documented loud seam: a wrong guess there would
silently corrupt real files, so the error names exactly what's
missing.

Used by the Avro OCF source's ``zstandard`` codec arm (Avro frames
zstd blocks with no extra trailer).
"""

from __future__ import annotations

_MAGIC = 0xFD2FB528

# ---- XXH64 (hand-rolled; public test vectors in the unit test) ----
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 per the public spec (xxhash.com); zstd's content
    checksum is the low 32 bits with seed 0."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(
                v2, int.from_bytes(data[i + 8 : i + 16], "little")
            )
            v3 = _round(
                v3, int.from_bytes(data[i + 16 : i + 24], "little")
            )
            v4 = _round(
                v4, int.from_bytes(data[i + 24 : i + 32], "little")
            )
            i += 32
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        acc = _merge(acc, v1)
        acc = _merge(acc, v2)
        acc = _merge(acc, v3)
        acc = _merge(acc, v4)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i + 8 <= n:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _M
        acc = (_rotl(acc, 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


# ---- frame layer ---------------------------------------------------
_MAX_BLOCK = (1 << 17) - 1  # Block_Maximum_Size cap from the spec


def zstd_compress(data: bytes, checksum: bool = True) -> bytes:
    """A legal zstd frame using Raw blocks (RLE where a block is one
    repeated byte): single-segment layout with the exact
    Frame_Content_Size, optional XXH64 content checksum. Real zstd
    tools decode this output; it is what the format itself falls
    back to on incompressible input."""
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    n = len(data)
    # frame header descriptor: single-segment, checksum flag, FCS size
    if n <= 255 and n > 0:
        fcs_code, fcs_bytes = 0, 1  # single-segment: 1-byte FCS
    elif n <= 0xFFFF + 256:
        fcs_code, fcs_bytes = 1, 2  # stored as n - 256
    elif n <= 0xFFFFFFFF:
        fcs_code, fcs_bytes = 2, 4
    else:
        fcs_code, fcs_bytes = 3, 8
    if n == 0:
        fcs_code, fcs_bytes = 2, 4  # 0 needs explicit FCS (not 1-byte)
    descriptor = (fcs_code << 6) | (1 << 5) | ((1 if checksum else 0) << 2)
    out.append(descriptor)  # single-segment => no window descriptor
    fcs_val = n - 256 if fcs_code == 1 else n
    out += fcs_val.to_bytes(fcs_bytes, "little")
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, Raw, size 0
    pos = 0
    while pos < n:
        chunk = data[pos : pos + _MAX_BLOCK]
        pos += len(chunk)
        last = 1 if pos >= n else 0
        if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
            header = last | (1 << 1) | (len(chunk) << 3)  # RLE
            out += header.to_bytes(3, "little")
            out.append(chunk[0])
        else:
            header = last | (0 << 1) | (len(chunk) << 3)  # Raw
            out += header.to_bytes(3, "little")
            out += chunk
    if checksum:
        out += (xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


def zstd_decompress(payload: bytes) -> bytes:
    """Decode a zstd frame whose blocks are Raw or RLE, verifying the
    magic, header geometry, Frame_Content_Size, and the XXH64
    content checksum when present. Compressed blocks raise loudly —
    the FSE/Huffman machinery is the documented seam."""
    if len(payload) < 4 or int.from_bytes(payload[:4], "little") != _MAGIC:
        raise ValueError("bad zstd magic")
    pos = 4
    if pos >= len(payload):
        raise ValueError("truncated zstd frame header")
    desc = payload[pos]
    pos += 1
    fcs_code = desc >> 6
    single_segment = bool(desc & 0x20)
    has_checksum = bool(desc & 0x04)
    if desc & 0x03:
        raise NotImplementedError(
            "zstd dictionary IDs: this reader handles dictionary-less "
            "frames only"
        )
    if desc & 0x18:
        raise ValueError("reserved/unused frame descriptor bits set")
    if not single_segment:
        pos += 1  # window descriptor (size bound only; unused here)
    fcs_bytes = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[
        fcs_code
    ]
    expected: int | None = None
    if fcs_bytes:
        expected = int.from_bytes(
            payload[pos : pos + fcs_bytes], "little"
        )
        if fcs_code == 1:
            expected += 256
        pos += fcs_bytes
    out = bytearray()
    while True:
        if pos + 3 > len(payload):
            raise ValueError("truncated zstd block header")
        header = int.from_bytes(payload[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = header & 1, (header >> 1) & 3, header >> 3
        if btype == 0:  # Raw
            if pos + bsize > len(payload):
                raise ValueError("truncated zstd raw block")
            out += payload[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: one byte repeated bsize times
            if pos >= len(payload):
                raise ValueError("truncated zstd RLE block")
            out += payload[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            raise NotImplementedError(
                "zstd compressed block (FSE/Huffman literals + "
                "sequences): this reader covers the frame layer and "
                "Raw/RLE blocks — a real-file decoder needs RFC 8878 "
                "sections 4.1-4.2; swap in the zstandard wheel on a "
                "cluster image that has it"
            )
        else:
            raise ValueError("reserved zstd block type")
        if last:
            break
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"zstd content size mismatch: header {expected}, "
            f"got {len(out)}"
        )
    if has_checksum:
        if pos + 4 > len(payload):
            raise ValueError("truncated zstd content checksum")
        want = int.from_bytes(payload[pos : pos + 4], "little")
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ValueError("zstd content checksum mismatch")
    return bytes(out)
