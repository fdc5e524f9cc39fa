"""Snappy (raw format) — hand-built from the public format
description (github.com/google/snappy format_description.txt), since
no snappy library ships in this container. Used by the Avro OCF
source for its ``snappy`` codec arm (Avro frames each block as raw
snappy + a 4-byte big-endian CRC32 of the UNCOMPRESSED bytes).

Decoder: the complete element grammar — literals with 1-4 extra
length bytes, and all three copy forms (1-byte-offset tag 01 with
the 3-bit length and offset high bits in the tag, 2- and
4-byte little-endian offsets), including OVERLAPPING copies
(offset < length replicates the trailing pattern byte-by-byte, the
LZ77 run idiom).

Encoder: a greedy matcher over a 4-byte-prefix hash table emitting
tag-10 copies (64-byte max per element, re-emitted for longer
matches) with literal gaps — real compression on repetitive input,
and every decoder path is exercised by our own output plus
handcrafted overlap/long-literal vectors in the tests.
"""

from __future__ import annotations


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy length varint")
        if shift > 35:
            raise ValueError("snappy length varint too long")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    n = len(chunk) - 1
    if n < 60:
        out.append(n << 2)
    else:
        nbytes = (n.bit_length() + 7) // 8
        out.append((59 + nbytes) << 2)
        out += n.to_bytes(nbytes, "little")
    out += chunk


def snappy_compress(data: bytes) -> bytes:
    """Raw-snappy compress: greedy 4-byte-prefix matcher emitting
    2-byte-offset copies (the tag-10 form covers offsets to 65535 —
    enough for the block sizes Avro uses) with literal gaps."""
    out = bytearray(_uvarint(len(data)))
    if not data:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = lit_start = 0
    n = len(data)
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF:
            length = 4
            while i + length < n and data[j + length] == data[i + length]:
                length += 1
            if i > lit_start:
                _emit_literal(out, data[lit_start:i])
            offset = i - j
            remaining = length
            while remaining > 0:  # tag-10 encodes lengths 1-64
                step = min(64, remaining)
                out.append(((step - 1) << 2) | 0b10)
                out += offset.to_bytes(2, "little")
                remaining -= step
            i += length
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def snappy_decompress(payload: bytes) -> bytes:
    """Raw-snappy decompress: full element grammar, overlap-safe
    copies, exact output-length verification."""
    total, pos = _read_uvarint(payload, 0)
    out = bytearray()
    n = len(payload)
    while pos < n:
        tag = payload[pos]
        pos += 1
        kind = tag & 0b11
        if kind == 0b00:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(payload[pos : pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("truncated snappy literal")
            out += payload[pos : pos + ln]
            pos += ln
            continue
        if kind == 0b01:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0b111) + 4
            if pos >= n:
                raise ValueError("truncated snappy copy-1 offset")
            offset = ((tag >> 5) << 8) | payload[pos]
            pos += 1
        elif kind == 0b10:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("truncated snappy copy-2 offset")
            offset = int.from_bytes(payload[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("truncated snappy copy-4 offset")
            offset = int.from_bytes(payload[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        start = len(out) - offset
        for k in range(ln):  # byte-by-byte: overlap replicates
            out.append(out[start + k])
    if len(out) != total:
        raise ValueError(
            f"snappy length mismatch: header {total}, got {len(out)}"
        )
    return bytes(out)
