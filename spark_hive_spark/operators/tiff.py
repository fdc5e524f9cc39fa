"""TIFF codec (baseline, TIFF 6.0) — hand-built from the public TIFF
6.0 specification, no codec library.

Implemented surface:
- Both byte orders (II little-endian and MM big-endian), the 42
  magic, and the IFD entry walk (SHORT/LONG values, inline vs
  offset storage).
- Grayscale (PhotometricInterpretation 1) and RGB (2) at 8 bits per
  sample, chunky planar config, multi-strip layouts (RowsPerStrip).
- Three compressions: 1 = none, 32773 = PACKBITS (per-row RLE:
  literal runs, repeat runs, the 128 noop), and 5 = TIFF-variant
  LZW — MSB-first bit packing with the spec's EARLY-CHANGE width
  rule (grow at 2^w - 1, one code earlier than GIF's LSB-first
  variant), Clear(256)/EOI(257), dictionary reset at 4094 — plus
  the horizontal-differencing PREDICTOR (tag 317 = 2) real writers
  pair with LZW.

TIFF is lossless, so the registered query's oracle reproduces exact
pixels; any endianness, strip, RLE, LZW width, or predictor bug
flips the value hash.

Loud seams (NotImplementedError): bit depths other than 8, planar
config 2, palette/YCbCr photometrics, tiled layouts, and other
compressions (Deflate/JPEG-in-TIFF/CCITT).
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

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PREDICTOR = 317


def _packbits_encode(row: bytes) -> bytes:
    """PackBits one row (TIFF 6.0 section 9): repeat runs >= 3 as
    (257 - n, byte), literals as (n - 1, bytes)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        j = i
        while j + 1 < n and row[j + 1] == row[i] and (j - i) < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j + 1
            continue
        # literal run: until the next >= 3 repeat (or 128 bytes)
        k = i
        while k < n and (k - i) < 128:
            if (
                k + 2 < n
                and row[k] == row[k + 1] == row[k + 2]
            ):
                break
            k += 1
        out.append(k - i - 1)
        out.extend(row[i:k])
        i = k
    return bytes(out)


def _packbits_decode(data: bytes, n: int) -> bytes:
    """Inverse of _packbits_encode: exactly n bytes or ValueError."""
    out = bytearray()
    i = 0
    while len(out) < n:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        c = data[i]
        i += 1
        if c < 128:  # literal of c+1 bytes
            if i + c + 1 > len(data):
                raise ValueError("truncated PackBits literal")
            out.extend(data[i : i + c + 1])
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            if i >= len(data):
                raise ValueError("truncated PackBits repeat")
            out.extend(bytes([data[i]]) * (257 - c))
            i += 1
        # c == 128: noop
    if len(out) != n:
        raise ValueError("PackBits output length mismatch")
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW (spec section 13): byte alphabet, Clear=256,
    EOI=257, codes packed MSB-first, EARLY-CHANGE width growth (the
    encoder widens when the next code to assign reaches 2^w - 1),
    dictionary reset at 4094."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    table: dict = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # Clear
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        emit(table[seq], width)
        # mirror the decoder for EOI: after its FINAL append the
        # decoder's table size equals next_code exactly (its appends
        # lag one behind, but the flush emit assigns nothing), and
        # the decoder widens at size 2^w - 2
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
    emit(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, n: int) -> bytes:
    """Inverse of _tiff_lzw_encode: exactly n bytes or ValueError."""
    pos = acc = nbits = 0
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW stream")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return code

    while True:
        code = read_code()
        if code == 256:  # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("TIFF LZW code before dictionary entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code beyond dictionary")
        out.extend(entry)
        if len(out) > n:
            raise ValueError("TIFF LZW output exceeds strip size")
        # early change, one-behind: the encoder widens when its next
        # available code reaches 2^w - 1; this table lags one entry,
        # so it widens at size 2^w - 2 (the spec's "switch after
        # adding the 510/1022/2046 entry")
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) != n:
        raise ValueError("TIFF LZW output length mismatch")
    return bytes(out)


def encode_tiff(
    pixels,
    big_endian: bool = False,
    compression: int = 1,
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Serialize an (H, W) grayscale or (H, W, 3) RGB uint8 array as
    a genuine baseline TIFF: header + IFD in the chosen byte order,
    multi-strip layout, ``compression`` 1 (none), 5 (TIFF LZW), or
    32773 (PackBits, per-row as the spec requires), and the
    horizontal-differencing predictor (tag 317 = 2, LZW only).
    Inverse of `decode_tiff`."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    spp = 1 if gray else 3
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor and compression != 5:
        raise ValueError("predictor 2 pairs with LZW here")
    rps = rows_per_strip or h
    e = ">" if big_endian else "<"
    rows = px.reshape(h, w * spp).astype(np.int64)
    strips = []
    for y0 in range(0, h, rps):
        chunk = rows[y0 : y0 + rps]
        if predictor:  # horizontal differencing per row, per sample
            c3 = chunk.reshape(chunk.shape[0], -1, spp)
            d = c3.copy()
            d[:, 1:] = (c3[:, 1:] - c3[:, :-1]) % 256
            raw = d.reshape(chunk.shape[0], -1).astype(np.uint8).tobytes()
        else:
            raw = chunk.astype(np.uint8).tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 5:
            strips.append(_tiff_lzw_encode(raw))
        else:  # PackBits packs each ROW separately (spec section 9)
            rb = w * spp
            strips.append(
                b"".join(
                    _packbits_encode(raw[r * rb : (r + 1) * rb])
                    for r in range(len(chunk))
                )
            )

    n_strips = len(strips)
    entries = [
        (_TAG_WIDTH, 3, 1, w),
        (_TAG_HEIGHT, 3, 1, h),
        (_TAG_BITS, 3, spp, None),  # value or offset, filled below
        (_TAG_COMPRESSION, 3, 1, compression),
        (_TAG_PHOTOMETRIC, 3, 1, 1 if gray else 2),
        (_TAG_STRIP_OFFSETS, 4, n_strips, None),
        (_TAG_SPP, 3, 1, spp),
        (_TAG_ROWS_PER_STRIP, 3, 1, rps),
        (_TAG_STRIP_COUNTS, 4, n_strips, None),
    ]
    if predictor:
        entries.append((_TAG_PREDICTOR, 3, 1, 2))
    entries.sort()
    # layout: header(8) + IFD + external arrays + strip data
    ifd_size = 2 + 12 * len(entries) + 4
    ext = bytearray()
    ext_base = 8 + ifd_size

    def ext_store(fmt_vals: bytes) -> int:
        off = ext_base + len(ext)
        ext.extend(fmt_vals)
        return off

    bits_field = None
    if spp == 3:
        bits_field = ext_store(struct.pack(e + "HHH", 8, 8, 8))
    data_base = None  # filled after ext arrays are known
    # strip offsets/counts arrays (externalize when n_strips > 1)
    counts = [len(s) for s in strips]
    # reserve arrays now; strip data begins after ext
    if n_strips > 1:
        counts_off = ext_store(struct.pack(e + f"{n_strips}I", *counts))
        offsets_pos = ext_store(b"\x00" * 4 * n_strips)  # patched below
    data_base = ext_base + len(ext)
    offsets = []
    acc = data_base
    for c in counts:
        offsets.append(acc)
        acc += c
    if n_strips > 1:
        struct.pack_into(
            e + f"{n_strips}I", ext, offsets_pos - ext_base, *offsets
        )

    out = bytearray()
    out += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    out += struct.pack(e + "I", 8)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == _TAG_BITS:
            if spp == 1:  # single SHORT fits inline
                field = struct.pack(e + "H", 8) + b"\x00\x00"
            else:
                field = struct.pack(e + "I", bits_field)
        elif tag == _TAG_STRIP_OFFSETS:
            field = struct.pack(
                e + "I", offsets[0] if n_strips == 1 else offsets_pos
            )
        elif tag == _TAG_STRIP_COUNTS:
            field = struct.pack(
                e + "I", counts[0] if n_strips == 1 else counts_off
            )
        elif typ == 3:
            field = struct.pack(e + "H", val) + b"\x00\x00"
        else:
            field = struct.pack(e + "I", val)
        out += struct.pack(e + "HHI", tag, typ, cnt) + field
    out += struct.pack(e + "I", 0)  # no next IFD
    out += ext
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF into (H, W) or (H, W, 3) uint8: walks
    the first IFD in either byte order, reads multi-strip gray/RGB
    8-bit chunky data under compression none/LZW/PackBits, and
    inverts the horizontal predictor when tag 317 = 2."""
    import numpy as np

    if payload[:4] == b"II\x2a\x00":
        e = "<"
    elif payload[:4] == b"MM\x00\x2a":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, base)
        tags[tag] = (typ, cnt, payload[base + 8 : base + 12])

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return [default]
        typ, cnt, field = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise NotImplementedError(f"TIFF tag type {typ}")
        fmt = "H" if typ == 3 else "I"
        if size * cnt <= 4:
            return list(
                struct.unpack_from(e + fmt * cnt, field, 0)
            )
        (off,) = struct.unpack_from(e + "I", field, 0)
        return list(struct.unpack_from(e + fmt * cnt, payload, off))

    w = values(_TAG_WIDTH)[0]
    h = values(_TAG_HEIGHT)[0]
    spp = values(_TAG_SPP, 1)[0]
    bits = values(_TAG_BITS, 8)
    comp = values(_TAG_COMPRESSION, 1)[0]
    photo = values(_TAG_PHOTOMETRIC)[0]
    pred = values(_TAG_PREDICTOR, 1)[0]
    rps = values(_TAG_ROWS_PER_STRIP, h)[0]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError(
            f"only 8-bit gray/RGB TIFF (bits={bits}, spp={spp})"
        )
    if photo not in (1, 2):
        raise NotImplementedError(f"TIFF photometric {photo}")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp}")
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred}")
    offsets = values(_TAG_STRIP_OFFSETS)
    counts = values(_TAG_STRIP_COUNTS)
    if len(offsets) != len(counts):
        raise ValueError("strip offsets/counts length mismatch")
    rb = w * spp
    rows = np.zeros((h, rb), dtype=np.int64)
    y = 0
    for off, cnt in zip(offsets, counts):
        nrows = min(rps, h - y)
        raw_len = nrows * rb
        blob = payload[off : off + cnt]
        if len(blob) != cnt:
            raise ValueError("truncated TIFF strip")
        if comp == 1:
            raw = blob
            if len(raw) != raw_len:
                raise ValueError("TIFF strip size mismatch")
        elif comp == 5:
            raw = _tiff_lzw_decode(blob, raw_len)
        else:
            raw = _packbits_decode(blob, raw_len)
        chunk = np.frombuffer(raw, dtype=np.uint8).reshape(
            nrows, rb
        ).astype(np.int64)
        if pred == 2:  # invert horizontal differencing per sample
            c3 = chunk.reshape(nrows, w, spp)
            c3 = np.cumsum(c3, axis=1) % 256
            chunk = c3.reshape(nrows, rb)
        rows[y : y + nrows] = chunk
        y += nrows
    if y != h:
        raise ValueError("TIFF strips do not cover the image")
    out = rows.astype(np.uint8)
    return out.reshape(h, w) if spp == 1 else out.reshape(h, w, 3)


TIFF_DOCS = 48
_TIFF_SCHEMA = (
    "doc_id long, in_w int, in_h int, n_channels int, sum_c0 long,"
    " sum_c1 long, sum_c2 long, wsum_c0 long"
)


@register(
    "multimodal_tiff_decode",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, doc_id % 6 + 2 AS wb, doc_id % 4 + 2 AS hb
            FROM documents WHERE doc_id < {TIFF_DOCS}
        ),
        px AS (
            SELECT doc_id, wb, hb,
                   i % (8 * wb) AS x, i // (8 * wb) AS y
            FROM (SELECT doc_id, wb, hb,
                         unnest(range(0, 64 * wb * hb)) AS i
                  FROM d)
        ),
        chan AS (
            SELECT doc_id, wb, hb, x, y,
                   CASE WHEN doc_id % 2 = 0
                        THEN (doc_id * 7 + 5 * x + 3 * y) % 256
                        ELSE (doc_id * 5
                              + 37 * ((doc_id + x // 4 + 2 * (y // 4))
                                      % 16)) % 256 END AS c0,
                   CASE WHEN doc_id % 2 = 0 THEN 0
                        ELSE (doc_id * 3
                              + 59 * ((doc_id + x // 4 + 2 * (y // 4))
                                      % 16) + 11) % 256 END AS c1,
                   CASE WHEN doc_id % 2 = 0 THEN 0
                        ELSE (doc_id * 7
                              + 83 * ((doc_id + x // 4 + 2 * (y // 4))
                                      % 16) + 5) % 256 END AS c2
            FROM px
        )
        SELECT doc_id,
               CAST(8 * wb AS INT) AS in_w,
               CAST(8 * hb AS INT) AS in_h,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
                   AS n_channels,
               CAST(sum(c0) AS BIGINT) AS sum_c0,
               CAST(sum(c1) AS BIGINT) AS sum_c1,
               CAST(sum(c2) AS BIGINT) AS sum_c2,
               CAST(sum(c0 * (2 * x + y)) AS BIGINT) AS wsum_c0
        FROM chan
        GROUP BY doc_id, wb, hb
        ORDER BY doc_id
    """,
    tags=("multimodal", "codec", "tiff", "lzw", "llm-pipeline"),
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline TIFF bytes→pixels end to end (round 10 — the
    scanned-document container): even docs are grayscale gradients,
    odd docs 16-color RGB cell images; the LAYOUT rotates so the
    corpus exercises the whole implemented matrix — byte order
    alternates II/MM by doc%2, compression rotates none → TIFF-LZW
    (MSB-first, EARLY-CHANGE widths) → LZW+PREDICTOR(2) → PackBits
    by doc%4, and every doc splits into 5-row strips (multi-strip
    offset/count arrays externalized past the IFD).

    TIFF is lossless ⇒ the oracle reproduces exact pixels; an
    endianness swap, early-change off-by-one, predictor, PackBits
    run, or strip-boundary bug flips the hash.

    Scale posture: identical to the other codec queries — two narrow
    Arrow `mapInPandas` stages, zero shuffles, no driver decode."""

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < TIFF_DOCS)
        .select("doc_id")
    )

    def encode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                wb, hb = d % 6 + 2, d % 4 + 2
                w, h = 8 * wb, 8 * hb
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                if d % 2 == 0:
                    img = ((d * 7 + 5 * x + 3 * y) % 256).astype(np.uint8)
                else:
                    ci = (d + x // 4 + 2 * (y // 4)) % 16
                    img = np.stack(
                        [
                            (d * 5 + 37 * ci) % 256,
                            (d * 3 + 59 * ci + 11) % 256,
                            (d * 7 + 83 * ci + 5) % 256,
                        ],
                        axis=2,
                    ).astype(np.uint8)
                comp, pred = [(1, False), (5, False), (5, True),
                              (32773, False)][d % 4]
                payloads.append(
                    encode_tiff(
                        img,
                        big_endian=bool(d % 2),
                        compression=comp,
                        predictor=pred,
                        rows_per_strip=5,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        cols = (
            "doc_id in_w in_h n_channels sum_c0 sum_c1 sum_c2 wsum_c0"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_tiff(bytes(p)).astype(np.int64)
                if px.ndim == 2:
                    px = px[:, :, None]
                h, w, nch = px.shape
                wgt = 2 * np.arange(w)[None, :] + np.arange(h)[:, None]
                sums = [
                    int(px[:, :, c].sum()) if c < nch else 0
                    for c in range(3)
                ]
                vals = (
                    int(d), w, h, nch, sums[0], sums[1], sums[2],
                    int((px[:, :, 0] * wgt).sum()),
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.mapInPandas(decode_batches, _TIFF_SCHEMA)
        .orderBy("doc_id")
    )
