"""FLAC codec — hand-built from the public FLAC format specification
(xiph.org / RFC 9639), no codec library.

Implemented surface:
- "fLaC" magic + STREAMINFO metadata block (other metadata blocks
  skip structurally on decode).
- Frames under the fixed-blocksize strategy: 14-bit sync, UTF-8
  coded frame numbers, blocksize/sample-rate codes (including the
  16-bit get-from-end-of-header form), CRC-8 frame headers and
  CRC-16 whole-frame checks (polys 0x07 / 0x8005), byte-alignment
  padding.
- Channel assignments: mono, independent stereo, and all three
  decorrelated stereo forms (left/side, right/side, mid/side — the
  side channel carries bps+1 bits, mid reconstructs via the
  shift-and-or trick).
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4 (the spec's
  binomial predictors), and LPC (order, coefficient precision,
  quantization shift, signed coefficients; prediction is the exact
  integer (sum c_j * s[i-1-j]) >> shift the spec defines).
- Residuals: partitioned Rice (method 0, 4-bit parameters, zigzag
  fold, unary quotient + low bits), multiple partition orders, and
  the 0b1111 escape to raw fixed-width residuals.

FLAC is LOSSLESS: the registered query's oracle reproduces exact
sample values, so any Rice, predictor, CRC, channel-decorrelation,
or partition bug flips the value hash.

Loud seams (NotImplementedError): variable-blocksize streams and
bits-per-sample other than 16.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

try:  # pandas only needed executor-side
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0 (the FLAC frame CRC)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _FlacBitWriter:
    """MSB-first bit packer."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.out)


class _FlacBitReader:
    """MSB-first bit reader; fails loudly on truncation."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(n: int) -> bytes:
    """The frame header's UTF-8-style coded number."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (1 + 5 * nbytes)):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _FlacBitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad FLAC coded number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("bad FLAC coded number continuation")
        n = (n << 6) | (b & 0x3F)
    return n


def _rice_write(w: _FlacBitWriter, residuals, order: int, po: int) -> None:
    """Partitioned Rice, method 0: 2^po partitions, per-partition
    4-bit parameter chosen from the partition's mean magnitude, with
    the 0b1111 escape to raw bits when residuals are too wide."""
    n = len(residuals) + order  # block size
    w.write(0, 2)  # coding method 0: 4-bit rice
    w.write(po, 4)
    idx = 0
    for k in range(1 << po):
        cnt = (n >> po) - (order if k == 0 else 0)
        part = residuals[idx : idx + cnt]
        idx += cnt
        folded = [
            (v << 1) if v >= 0 else (((-v) << 1) - 1) for v in part
        ]
        mean = (sum(folded) // max(1, len(folded))) if folded else 0
        p = 0
        while (1 << (p + 1)) < mean + 1 and p < 14:
            p += 1
        max_fold = max(folded, default=0)
        if max_fold >> p > 1 << 16:  # pathological: escape to raw
            width = max(1, max(abs(v) for v in part).bit_length() + 1)
            w.write(0xF, 4)
            w.write(width, 5)
            for v in part:
                w.write(v & ((1 << width) - 1), width)
            continue
        w.write(p, 4)
        for u in folded:
            w.write_unary(u >> p)
            if p:
                w.write(u & ((1 << p) - 1), p)


def _rice_read(r: _FlacBitReader, n: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 if method == 0 else 5
    po = r.read(4)
    if n % (1 << po):
        raise ValueError("FLAC partition order does not divide block")
    out: list[int] = []
    for k in range(1 << po):
        cnt = (n >> po) - (order if k == 0 else 0)
        if cnt < 0:
            raise ValueError("FLAC predictor order exceeds partition")
        p = r.read(pbits)
        if p == (1 << pbits) - 1:  # escape: raw residuals
            width = r.read(5)
            for _ in range(cnt):
                out.append(r.read_signed(width) if width else 0)
            continue
        for _ in range(cnt):
            q = r.read_unary()
            u = (q << p) | (r.read(p) if p else 0)
            out.append(u >> 1 if (u & 1) == 0 else -((u + 1) >> 1))
    return out


def _best_fixed_order(ch: list[int]) -> int:
    best, best_cost = 0, None
    for order in range(5):
        if order >= len(ch):
            break
        coeffs = _FIXED_COEFFS[order]
        cost = 0
        for i in range(order, len(ch)):
            pred = sum(c * ch[i - 1 - j] for j, c in enumerate(coeffs))
            cost += abs(ch[i] - pred)
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _encode_subframe(
    w: _FlacBitWriter, ch: list[int], bps: int, po: int,
    lpc_order: int = 0,
) -> None:
    if all(v == ch[0] for v in ch):
        w.write(0, 1)
        w.write(0, 6)  # constant
        w.write(0, 1)  # no wasted bits
        w.write(ch[0] & ((1 << bps) - 1), bps)
        return
    if len(ch) < 5:  # tiny blocks: verbatim
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in ch:
            w.write(v & ((1 << bps) - 1), bps)
        return
    n = len(ch)
    while n % (1 << po):
        po -= 1
    if lpc_order and lpc_order < n:
        order = lpc_order
        precision = 12
        shift = 10
        coeffs = _lpc_coeffs(ch, order, precision, shift)
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)  # LPC
        w.write(0, 1)
        for v in ch[:order]:
            w.write(v & ((1 << bps) - 1), bps)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coeffs:
            w.write(c & ((1 << precision) - 1), precision)
        resid = [
            ch[i]
            - (sum(c * ch[i - 1 - j] for j, c in enumerate(coeffs)) >> shift)
            for i in range(order, n)
        ]
    else:
        order = _best_fixed_order(ch)
        coeffs = _FIXED_COEFFS[order]
        w.write(0, 1)
        w.write(0x08 | order, 6)  # fixed
        w.write(0, 1)
        for v in ch[:order]:
            w.write(v & ((1 << bps) - 1), bps)
        resid = [
            ch[i] - sum(c * ch[i - 1 - j] for j, c in enumerate(coeffs))
            for i in range(order, n)
        ]
    while (len(ch) >> po) < max(order, 1) or len(ch) % (1 << po):
        po -= 1
    _rice_write(w, resid, order, po)


def _lpc_coeffs(ch: list[int], order: int, precision: int, shift: int):
    """Quantized LPC coefficients via least squares on the block.
    Coefficient QUALITY only affects compression — the encoder
    computes residuals with the exact integer prediction the decoder
    inverts, so any quantized values round-trip losslessly."""
    import numpy as np

    x = np.asarray(ch, dtype=np.float64)
    rows = [x[order - 1 - j : len(x) - 1 - j] for j in range(order)]
    A = np.stack(rows, axis=1)
    y = x[order:]
    sol, *_ = np.linalg.lstsq(A, y, rcond=None)
    lim = (1 << (precision - 1)) - 1
    return [
        int(max(-lim - 1, min(lim, round(c * (1 << shift))))) for c in sol
    ]


def _decode_subframe(r: _FlacBitReader, n: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("bad FLAC subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits-per-sample flag: unary count - 1
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # constant
        v = r.read(eff)
        v = v - (1 << eff) if v >= (1 << (eff - 1)) else v
        out = [v] * n
    elif stype == 1:  # verbatim
        out = [r.read_signed(eff) for _ in range(n)]
    elif 8 <= stype <= 12:  # fixed, order = stype - 8
        order = stype - 8
        out = [r.read_signed(eff) for _ in range(order)]
        resid = _rice_read(r, n, order)
        coeffs = _FIXED_COEFFS[order]
        for i, res in enumerate(resid):
            k = order + i
            out.append(
                res + sum(c * out[k - 1 - j] for j, c in enumerate(coeffs))
            )
    elif stype & 0x20:  # LPC, order = low 5 bits + 1
        order = (stype & 0x1F) + 1
        out = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision escape")
        shift = r.read(5)
        coeffs = [r.read_signed(precision) for _ in range(order)]
        resid = _rice_read(r, n, order)
        for i, res in enumerate(resid):
            k = order + i
            out.append(
                res
                + (
                    sum(c * out[k - 1 - j] for j, c in enumerate(coeffs))
                    >> shift
                )
            )
    else:
        raise ValueError(f"reserved FLAC subframe type {stype:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def encode_flac(
    samples,
    rate: int = 44100,
    block_size: int = 1024,
    stereo_mode: str = "independent",
    partition_order: int = 2,
    lpc_order: int = 0,
) -> bytes:
    """Serialize int16 samples — (N,) mono or (N, 2) stereo — as a
    genuine FLAC stream: STREAMINFO, fixed-blocksize frames with
    UTF-8 frame numbers and CRC-8/CRC-16, and per-channel subframes
    (constant where a block is flat, verbatim for tiny tails, else
    FIXED predictors of the best order — or LPC at ``lpc_order``
    with least-squares quantized coefficients) over partitioned Rice
    residuals. ``stereo_mode`` picks the channel assignment:
    independent / left_side / right_side / mid_side (the
    decorrelated forms store a bps+1-bit side channel). Inverse of
    `decode_flac`."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64)
    stereo = x.ndim == 2
    if stereo and x.shape[1] != 2:
        raise ValueError("stereo input must be (N, 2)")
    n_total = x.shape[0]
    bps = 16
    modes = {
        "independent": 0b0001 if stereo else 0b0000,
        "left_side": 0b1000,
        "right_side": 0b1001,
        "mid_side": 0b1010,
    }
    if stereo_mode not in modes:
        raise ValueError(f"unknown stereo_mode {stereo_mode!r}")
    if not stereo and stereo_mode != "independent":
        raise ValueError("decorrelated modes need stereo input")
    chan_code = modes[stereo_mode]

    out = bytearray(b"fLaC")
    info = _FlacBitWriter()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(0, 24)  # min frame size unknown
    info.write(0, 24)  # max frame size unknown
    info.write(rate, 20)
    info.write((2 if stereo else 1) - 1, 3)
    info.write(bps - 1, 5)
    info.write(n_total, 36)
    body = info.bytes() + b"\x00" * 16  # MD5 unset
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fno, start in enumerate(range(0, n_total, block_size)):
        blk = x[start : start + block_size]
        n = blk.shape[0]
        hdr = _FlacBitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(0b0111, 4)  # blocksize: 16 bits at end of header
        hdr.write(0b0000, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_code, 4)
        hdr.write(0b100, 3)  # 16 bits per sample
        hdr.write(0, 1)  # reserved
        head = hdr.bytes()
        head += _utf8_number(fno)
        head += struct.pack(">H", n - 1)
        head += bytes([_crc8(head)])

        w = _FlacBitWriter()
        if not stereo:
            chans = [blk.tolist()]
            widths = [bps]
        elif stereo_mode == "independent":
            chans = [blk[:, 0].tolist(), blk[:, 1].tolist()]
            widths = [bps, bps]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = (left - right).tolist()
            if stereo_mode == "left_side":
                chans = [left.tolist(), side]
                widths = [bps, bps + 1]
            elif stereo_mode == "right_side":
                chans = [side, right.tolist()]
                widths = [bps + 1, bps]
            else:  # mid_side: mid = (l + r) >> 1, side = l - r
                mid = ((left + right) >> 1).tolist()
                chans = [mid, side]
                widths = [bps, bps + 1]
        for ch, cw in zip(chans, widths):
            _encode_subframe(w, ch, cw, partition_order, lpc_order)
        w.align()
        frame = head + w.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)


def decode_flac(payload: bytes):
    """Decode a FLAC stream to (rate, samples) — (N,) int32 for mono
    or (N, 2) for stereo — walking STREAMINFO, skipping other
    metadata blocks, and decoding every frame with CRC-8 header and
    CRC-16 frame verification, all subframe types, and all four
    channel assignments."""
    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos]
        (length,) = struct.unpack(
            ">I", b"\x00" + payload[pos + 1 : pos + 4]
        )
        btype = hdr & 0x7F
        body = payload[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if btype == 0:
            r = _FlacBitReader(body)
            min_bs = r.read(16)
            max_bs = r.read(16)
            r.read(24)
            r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            n_total = r.read(36)
            info = (min_bs, max_bs, rate, channels, bps, n_total)
        if hdr & 0x80:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    min_bs, max_bs, rate, channels, bps, n_total = info
    if bps != 16:
        raise NotImplementedError(f"FLAC bits-per-sample {bps}")
    if channels > 2:
        raise NotImplementedError("FLAC with more than 2 channels")

    chans_out: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while got < n_total:
        frame_start = pos
        r = _FlacBitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.read(1)
        if r.read(1):
            raise NotImplementedError("variable-blocksize FLAC stream")
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            n = r.read(8) + 1
        elif bs_code == 0b0111:
            n = r.read(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved FLAC blocksize code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid FLAC sample-rate code")
        if ss_code != 0b100:
            raise NotImplementedError("FLAC sample size code != 16-bit")
        r.align()
        if r.byte >= len(payload):
            raise ValueError("truncated FLAC frame header")
        if _crc8(payload[frame_start : r.byte]) != payload[r.byte]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        r.byte += 1  # consume the CRC-8 byte

        if chan_code <= 0b0111:
            nch = chan_code + 1
            if nch != channels:
                raise ValueError("frame channel count != STREAMINFO")
            subs = [_decode_subframe(r, n, bps) for _ in range(nch)]
            frame_chans = subs
        elif chan_code == 0b1000:  # left/side
            left = _decode_subframe(r, n, bps)
            side = _decode_subframe(r, n, bps + 1)
            frame_chans = [left, [l - s for l, s in zip(left, side)]]
        elif chan_code == 0b1001:  # right/side
            side = _decode_subframe(r, n, bps + 1)
            right = _decode_subframe(r, n, bps)
            frame_chans = [[rr + s for rr, s in zip(right, side)], right]
        elif chan_code == 0b1010:  # mid/side
            mid = _decode_subframe(r, n, bps)
            side = _decode_subframe(r, n, bps + 1)
            frame_chans = [[], []]
            for m, s in zip(mid, side):
                mm = (m << 1) | (s & 1)
                frame_chans[0].append((mm + s) >> 1)
                frame_chans[1].append((mm - s) >> 1)
        else:
            raise ValueError("reserved FLAC channel assignment")
        r.align()
        end = r.byte
        (crc,) = struct.unpack_from(">H", payload, end)
        if _crc16(payload[frame_start:end]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = end + 2
        for c in range(channels):
            chans_out[c].extend(frame_chans[c])
        got += n
    if got != n_total:
        raise ValueError("FLAC sample count mismatch")
    arr = np.asarray(chans_out, dtype=np.int64)
    return rate, (arr[0] if channels == 1 else arr.T.copy())


FLAC_DOCS = 48
_FLAC_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, n_channels int,"
    " sum_l long, sum_r long, wsum_l long, max_abs int"
)


@register(
    "multimodal_flac_decode",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, 700 + 37 * (doc_id % 8) AS n
            FROM documents WHERE doc_id < {FLAC_DOCS}
        ),
        s AS (
            SELECT doc_id, n, i,
                   ((doc_id * 7919 + i * i * 13 + i * 104729) % 65536)
                       - 32768 AS l,
                   ((doc_id * 104729 + i * i * 7 + i * 7919) % 65536)
                       - 32768 AS r
            FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)
        )
        SELECT doc_id,
               CAST(n AS INT) AS n_samples,
               CAST(44100 AS INT) AS sample_rate,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS INT)
                   AS n_channels,
               CAST(sum(l) AS BIGINT) AS sum_l,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE sum(r) END
                    AS BIGINT) AS sum_r,
               CAST(sum(l * i) AS BIGINT) AS wsum_l,
               CAST(max(CASE WHEN doc_id % 2 = 0 THEN abs(l)
                             ELSE greatest(abs(l), abs(r)) END) AS INT)
                   AS max_abs
        FROM s
        GROUP BY doc_id, n
        ORDER BY doc_id
    """,
    tags=("multimodal", "codec", "flac", "audio", "llm-pipeline"),
)
def multimodal_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC bytes→samples end to end (round 10 — compressed
    audio; WAV covered only raw PCM): per document a deterministic
    int16 waveform (quadratic-phase congruential samples — noisy
    enough that Rice coding and the predictors do real work) encodes
    through `encode_flac` with a rotating profile — even docs MONO,
    odd docs STEREO with the channel assignment cycling independent
    → left/side → mid/side → right/side, block size 256 (multi-frame
    streams with UTF-8 frame numbers), partition order 2, and every
    third doc using LPC instead of fixed predictors — then decodes
    back through full CRC-8/CRC-16 verification.

    FLAC is lossless ⇒ the oracle reproduces the exact sample
    formulas; the i-weighted sum pins sample ORDER across frame
    boundaries, and max_abs pins the int16 range (a sign or
    zigzag-fold bug saturates it).

    Scale posture: identical to the codec image queries — two narrow
    Arrow `mapInPandas` stages, zero shuffles, no driver decode."""

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < FLAC_DOCS)
        .select("doc_id")
    )

    def encode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        stereo_modes = ["independent", "left_side", "mid_side",
                        "right_side"]
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                n = 700 + 37 * (d % 8)
                i = np.arange(n, dtype=np.int64)
                left = (d * 7919 + i * i * 13 + i * 104729) % 65536 - 32768
                right = (d * 104729 + i * i * 7 + i * 7919) % 65536 - 32768
                if d % 2 == 0:
                    samples = left
                    mode = "independent"
                else:
                    samples = np.stack([left, right], axis=1)
                    mode = stereo_modes[(d // 2) % 4]
                payloads.append(
                    encode_flac(
                        samples,
                        rate=44100,
                        block_size=256,
                        stereo_mode=mode,
                        partition_order=2,
                        lpc_order=4 if d % 3 == 0 else 0,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        cols = (
            "doc_id n_samples sample_rate n_channels sum_l sum_r"
            " wsum_l max_abs"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, samples = decode_flac(bytes(p))
                if samples.ndim == 1:
                    nch = 1
                    left = samples
                    right = None
                else:
                    nch = 2
                    left = samples[:, 0]
                    right = samples[:, 1]
                n = len(left)
                i = np.arange(n, dtype=np.int64)
                max_abs = int(np.abs(left).max())
                sum_r = 0
                if right is not None:
                    max_abs = max(max_abs, int(np.abs(right).max()))
                    sum_r = int(right.sum())
                vals = (
                    int(d), n, rate, nch, int(left.sum()), sum_r,
                    int((left * i).sum()), max_abs,
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.mapInPandas(decode_batches, _FLAC_SCHEMA)
        .orderBy("doc_id")
    )
