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
