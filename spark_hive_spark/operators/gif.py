"""GIF codec (GIF87a/89a) — hand-built from the public GIF
specification (CompuServe GIF89a + RFC-adjacent LZW details), no
codec library.

Implemented surface:
- Header + logical screen descriptor + global color table.
- Image descriptors with LOCAL color tables and the 4-pass GIF
  interlace (rows 0/8, 4/8, 2/4, 1/2).
- REAL LZW, both directions: variable-width codes packed LSB-first
  into 255-byte sub-blocks, clear/EOI codes, code width growth at
  2^n boundaries up to 12 bits, dictionary reset on overflow, and
  the KwKwK (code == next_code) case.
- 89a extension blocks: Graphic Control Extensions parse (per-frame
  transparency index + delay), comment/application/plain-text
  blocks skip structurally.
- Multi-frame files: `decode_gif` returns the FIRST frame plus the
  frame count and total animation delay; frame COMPOSITING
  (disposal methods) is out of scope — each frame here is full-size
  replace, which is also what `encode_gif` writes.

GIF is palette-based and lossless within its <= 256 colors, so the
registered query's oracle reproduces exact pixels with no codec
math — any LZW width-growth, sub-block, interlace, or palette bug
flips the value hash.
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

# GIF interlace passes: (row_start, row_step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_compress(indices, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emit a Clear code first, grow the code width
    when the next code to be assigned reaches 2^width, reset the
    dictionary with a Clear code at 4096, and close with EOI.
    Codes pack least-significant-bit first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple = ()
    for sym in indices:
        sym = int(sym)
        cand = seq + (sym,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:  # dictionary full: reset (exercises the Clear path)
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (sym,)
    if seq:
        emit(table[seq], width)
        # the decoder appends one dictionary entry for this final
        # data code too; if that append crosses a 2^width boundary
        # the decoder reads EOI one bit wider — mirror it
        if next_code < 4096:
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int, n: int):
    """Inverse of _lzw_compress: returns exactly ``n`` indices or
    raises. Handles width growth, Clear resets, and KwKwK."""
    import numpy as np

    clear = 1 << min_code_size
    eoi = clear + 1
    pos = acc = nbits = 0
    width = min_code_size + 1
    table: list[tuple] = [(i,) for i in range(clear)] + [(), ()]
    out = np.zeros(n, dtype=np.int64)
    filled = 0
    prev: tuple | None = None

    def read_code() -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    while True:
        code = read_code()
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW code before dictionary entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # KwKwK
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("GIF LZW code beyond dictionary")
        if filled + len(entry) > n:
            raise ValueError("GIF LZW output exceeds image size")
        out[filled : filled + len(entry)] = entry
        filled += len(entry)
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    if filled != n:
        raise ValueError("GIF LZW output short of image size")
    return out


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <= 255-byte GIF data sub-blocks + block
    terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames,
    interlace: bool = False,
    transparent_color: tuple | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Serialize one (H, W, 3) uint8 frame — or a list of same-size
    frames (animated, full-frame replace, ``delay_cs`` centiseconds
    each) — as a genuine GIF89a: global color table built from the
    <= 256 distinct colors across all frames (padded to a power of
    two), real LZW with Clear/EOI and width growth, 255-byte
    sub-blocks, optional 4-pass interlace, and a Graphic Control
    Extension per frame (carrying the transparency index when
    ``transparent_color`` names a palette color). Inverse of
    `decode_gif`."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all GIF frames must be (H, W, 3), same size")
    colors: dict = {}
    for f in frames:
        for p in f.reshape(-1, 3):
            colors.setdefault(tuple(int(v) for v in p), len(colors))
    if len(colors) > 256:
        raise ValueError("GIF needs <= 256 distinct colors")
    bits = max(1, (max(len(colors) - 1, 1)).bit_length())
    gct_size = 1 << bits
    pal = list(colors) + [(0, 0, 0)] * (gct_size - len(colors))
    trans_idx = None
    if transparent_color is not None:
        key = tuple(int(v) for v in transparent_color)
        if key not in colors:
            raise ValueError("transparent_color not in the palette")
        trans_idx = colors[key]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    for c in pal:
        out += bytes(c)
    mcs = max(2, bits)
    for f in frames:
        flags = 0x40 if interlace else 0
        # Graphic Control Extension (89a): delay + transparency
        gce_flags = 0x01 if trans_idx is not None else 0x00
        out += struct.pack(
            "<BBBBHBB", 0x21, 0xF9, 4, gce_flags, delay_cs,
            trans_idx if trans_idx is not None else 0, 0,
        )
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, flags)
        idx = np.array(
            [colors[tuple(int(v) for v in p)] for p in f.reshape(-1, 3)],
            dtype=np.int64,
        ).reshape(h, w)
        if interlace:
            rows = [
                idx[start::step] for start, step in _GIF_INTERLACE
            ]
            idx = np.concatenate([r for r in rows if r.shape[0]], axis=0)
        out.append(mcs)
        out += _sub_blocks(_lzw_compress(idx.reshape(-1), mcs))
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes):
    """Decode a GIF87a/89a payload: returns (first_frame, n_frames,
    total_delay_cs) where the frame is (H, W, 3) uint8 RGB — or
    (H, W, 4) RGBA when the first frame's Graphic Control Extension
    declares a transparency index. Parses the global/local color
    tables, the 4-pass interlace, every extension block
    structurally, and the full LZW state machine. Frames after the
    first are LZW-decoded and counted (validating their streams) but
    not composited — disposal-method compositing is the documented
    out-of-scope seam."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated GIF stream") from exc


def _decode_gif_body(payload: bytes):
    import numpy as np

    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=n * 3, offset=pos
        ).reshape(n, 3)
        pos += n * 3
    first = None
    n_frames = 0
    total_delay = 0
    trans_idx = None
    pending_trans = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                size = payload[pos]
                if size != 4:
                    raise ValueError("bad GCE block size")
                gflags, delay, tidx = struct.unpack_from(
                    "<BHB", payload, pos + 1
                )
                total_delay += delay
                pending_trans = tidx if (gflags & 0x01) else None
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("unterminated GCE")
                pos += 1
            else:  # comment/app/plain-text: skip sub-blocks
                while True:
                    size = payload[pos]
                    pos += 1 + size
                    if size == 0:
                        break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame without any color table")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise ValueError(f"bad GIF LZW min code size {mcs}")
        lzw = bytearray()
        while True:
            size = payload[pos]
            pos += 1
            if size == 0:
                break
            lzw.extend(payload[pos : pos + size])
            pos += size
        idx = _lzw_decompress(bytes(lzw), mcs, fw * fh).reshape(fh, fw)
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("GIF index beyond color table")
        if iflags & 0x40:  # de-interlace
            grid = np.zeros((fh, fw), dtype=np.int64)
            r = 0
            for start, step in _GIF_INTERLACE:
                cnt = len(range(start, fh, step))
                grid[start::step] = idx[r : r + cnt]
                r += cnt
            idx = grid
        n_frames += 1
        if first is None:
            if (left, top, fw, fh) != (0, 0, w, h):
                raise NotImplementedError(
                    "first GIF frame smaller than the logical screen"
                )
            rgb = pal[idx]
            if pending_trans is not None:
                trans_idx = pending_trans
                alpha = np.where(idx == trans_idx, 0, 255).astype(np.uint8)
                first = np.concatenate([rgb, alpha[:, :, None]], axis=2)
            else:
                first = rgb
        pending_trans = None
    if first is None:
        raise ValueError("GIF contains no image frame")
    return first, n_frames, total_delay


GIF_DOCS = 48
_GIF_SCHEMA = (
    "doc_id long, in_w int, in_h int, n_frames int, total_delay int,"
    " sum_r long, sum_g long, sum_b long, wsum_g long, n_transparent long"
)


@register(
    "multimodal_gif_decode",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, doc_id % 6 + 2 AS wb, doc_id % 4 + 2 AS hb
            FROM documents WHERE doc_id < {GIF_DOCS}
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
                   (doc_id + x // 4 + 2 * (y // 4)) % 16 AS ci
            FROM px
        ),
        rgb AS (
            SELECT doc_id, wb, hb, x, y, ci,
                   (doc_id * 5 + 37 * ci) % 256 AS r,
                   (doc_id * 3 + 59 * ci + 11) % 256 AS g,
                   (doc_id * 7 + 83 * ci + 5) % 256 AS b
            FROM chan
        )
        SELECT doc_id,
               CAST(8 * wb AS INT) AS in_w,
               CAST(8 * hb AS INT) AS in_h,
               CAST(doc_id % 3 + 1 AS INT) AS n_frames,
               CAST(4 * (doc_id % 3 + 1) AS INT) AS total_delay,
               CAST(sum(r) AS BIGINT) AS sum_r,
               CAST(sum(g) AS BIGINT) AS sum_g,
               CAST(sum(b) AS BIGINT) AS sum_b,
               CAST(sum(g * (2 * x + y)) AS BIGINT) AS wsum_g,
               CAST(sum(CASE WHEN doc_id % 2 = 1 AND ci = 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_transparent
        FROM rgb
        GROUP BY doc_id, wb, hb
        ORDER BY doc_id
    """,
    tags=("multimodal", "codec", "gif", "lzw", "llm-pipeline"),
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF bytes→pixels end to end (round 10 — the web-corpus
    format the multimodal stack lacked): per document a 16-color
    cell image (the same quantized construction as the WebP
    full-profile fixture, different channel constants) serializes
    through `encode_gif` — global color table, genuine LZW
    (Clear/EOI, LSB-first variable-width codes, sub-blocks), a
    Graphic Control Extension per frame — and decodes back through
    the full state machine. Per doc: doc%3+1 FRAMES (frames 2+ are
    LZW-validated and counted — animation metadata a frame-sampling
    pipeline needs), every third doc INTERLACED (4-pass row
    shuffle), odd docs carry a TRANSPARENCY index (palette color 0)
    so the decode returns RGBA and the alpha-0 count is pinned.

    GIF is lossless over its palette ⇒ the oracle reproduces exact
    pixels, frame counts, delays, and the transparent-pixel count;
    any LZW width-growth, sub-block, interlace, GCE, or palette bug
    flips the hash.

    Scale posture: identical to the other codec queries — two narrow
    Arrow `mapInPandas` stages, zero shuffles, no driver decode."""

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < GIF_DOCS)
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
                ci = (d + x // 4 + 2 * (y // 4)) % 16
                img = np.stack(
                    [
                        (d * 5 + 37 * ci) % 256,
                        (d * 3 + 59 * ci + 11) % 256,
                        (d * 7 + 83 * ci + 5) % 256,
                    ],
                    axis=2,
                ).astype(np.uint8)
                # later frames: rolled copies (same palette, new LZW)
                frames = [
                    np.roll(img, k, axis=1) for k in range(d % 3 + 1)
                ]
                trans = None
                if d % 2 == 1:  # palette color of cell index 0
                    trans = (
                        (d * 5) % 256,
                        (d * 3 + 11) % 256,
                        (d * 7 + 5) % 256,
                    )
                payloads.append(
                    encode_gif(
                        frames,
                        interlace=(d % 3 == 0),
                        transparent_color=trans,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np

        cols = (
            "doc_id in_w in_h n_frames total_delay sum_r sum_g sum_b"
            " wsum_g n_transparent"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                frame, n_frames, delay = decode_gif(bytes(p))
                px = frame.astype(np.int64)
                h, w, nch = px.shape
                wgt = 2 * np.arange(w)[None, :] + np.arange(h)[:, None]
                n_trans = (
                    int((px[:, :, 3] == 0).sum()) if nch == 4 else 0
                )
                vals = (
                    int(d), w, h, n_frames, delay,
                    int(px[:, :, 0].sum()), int(px[:, :, 1].sum()),
                    int(px[:, :, 2].sum()),
                    int((px[:, :, 1] * wgt).sum()),
                    n_trans,
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.mapInPandas(decode_batches, _GIF_SCHEMA)
        .orderBy("doc_id")
    )
