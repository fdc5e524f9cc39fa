"""AVI/MJPEG video container + index-driven FRAME SAMPLING — the
video half of the multimodal training-pipeline surface (SURVEY.md
§2B; the task brief's "frame-sample" operation made real).

`multimodal_container_metadata` reads ISO-BMFF sample tables without
touching codec payloads; this module goes one level deeper on the
container whose payloads the repo CAN decode: Motion-JPEG in AVI,
where every frame is a complete baseline JPEG. Hand-built from the
public AVI RIFF spec (Microsoft "AVI RIFF File Reference"):

- **RIFF tree**: `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
  strf)) LIST('movi' 00dc...) idx1)`, chunks word-aligned with the
  odd-length pad byte.
- **avih** (MainAVIHeader): dwMicroSecPerFrame / dwTotalFrames /
  dwWidth / dwHeight — validated against the stream header and the
  decoded frames.
- **strh/strf**: fccType 'vids', handler/biCompression 'MJPG',
  scale/rate (the rational frame rate), BITMAPINFOHEADER dims.
- **idx1**: one entry per frame — ckid, AVIIF_KEYFRAME flags,
  chunk offset (from the 'movi' fourcc, the de-facto convention),
  chunk length. THE POINT of the format for sampling: a reader
  seeks straight to every k-th frame and never touches the bytes
  in between (every MJPEG frame is a keyframe, so any stride is
  seekable — unlike inter-coded streams where sampling snaps to
  keyframes).

The frame payloads are real JPEGs from the repo's own encoder, and
sampled frames decode through `decode_jpeg`, so the whole dataflow
is value-hashed end-to-end: the DuckDB oracle regenerates each
sampled frame's block-constant pixels through the SAME DC-only
closed form as the color-JPEG queries (`_sql_jpeg_dc` chain), with a
(f+1)-weighted green sum pinning WHICH frames were sampled — an
off-by-one stride, a wrong idx1 offset, or a swapped frame order
flips the hash.

Scale posture: at 100 TB, video sampling is the canonical
"decode 1% of the bytes" pipeline — the container walk is
O(header + index), each sampled frame decodes independently inside
an Arrow batch, and unsampled frame bytes are never parsed. Two
narrow mapInPandas stages, zero shuffles, doc-partition parallel.

Reference parity: the reference has no media surface
(CollegeScorecard.scala:35-157); north-star per SURVEY §2B.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.operators.multimodal import (
    _sql_jpeg_dc,
    decode_jpeg,
    encode_jpeg,
)
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

AVI_DOCS = 48
_US_PER_FRAME = 40_000  # 25 fps
_AVIIF_KEYFRAME = 0x10


# ---------------------------------------------------------------------------
# fixture frames (block-constant color, seeded by doc AND frame)
# ---------------------------------------------------------------------------

def avi_frame_image(d: int, f: int):
    """Frame f of doc d: wb×hb grid of 8×8-constant RGB blocks with
    seed s = 31·d + 101·f — same construction as
    `jpeg_color_fixture_image`, frame-dependent so sampling the
    wrong frame is detectable. Dims depend on d only (AVI streams
    have fixed dims)."""
    import numpy as np

    wb, hb = d % 4 + 2, d % 3 + 2
    s = 31 * d + 101 * f
    bx = np.arange(wb)[None, :]
    by = np.arange(hb)[:, None]
    chans = [
        (s * 7 + 13 * bx + 29 * by) % 256,
        (s * 11 + 17 * bx + 31 * by) % 256,
        (s * 13 + 19 * bx + 37 * by) % 256,
    ]
    return np.stack(
        [np.repeat(np.repeat(c, 8, axis=0), 8, axis=1) for c in chans],
        axis=2,
    ).astype(np.uint8)


def n_frames(d: int) -> int:
    return d % 5 + 6


def sample_stride(d: int) -> int:
    return d % 3 + 2


# ---------------------------------------------------------------------------
# AVI writer
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int,
    us_per_frame: int = _US_PER_FRAME,
) -> bytes:
    """JPEG payloads -> a complete AVI: hdrl (avih + vids/MJPG
    strl), movi of 00dc chunks, and an idx1 with offsets from the
    'movi' fourcc (the de-facto convention)."""
    avih = struct.pack(
        "<14I",
        us_per_frame,
        0,  # dwMaxBytesPerSec (advisory)
        0,  # dwPaddingGranularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG",
        0, 0, 0, 0,
        us_per_frame,  # dwScale
        1_000_000,  # dwRate: rate/scale = fps
        0,
        len(frames),
        0, 0xFFFFFFFF, 0,
        0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    index: list[tuple[int, int]] = []  # (offset from 'movi' tag, size)
    for payload in frames:
        # offset convention: from the first byte of the 'movi' fourcc;
        # the fourcc itself is 4 bytes, so the first chunk sits at 4
        index.append((4 + len(movi_body), len(payload)))
        movi_body += _chunk(b"00dc", payload)
    movi = _list(b"movi", bytes(movi_body))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in index
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


# ---------------------------------------------------------------------------
# AVI reader
# ---------------------------------------------------------------------------

def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) over a chunk sequence;
    LIST chunks yield their list-type as fourcc 'LIST:xxxx'."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated RIFF chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("RIFF chunk overruns its parent")
        yield fourcc, body, size
        pos = body + size + (size & 1)  # word alignment


def parse_avi(data: bytes) -> dict:
    """-> {"n_frames", "us_per_frame", "width", "height",
    "frame_spans": [(start, size)...] from idx1,
    "movi_spans": [(start, size)...] from a sequential movi walk}.
    Handler/compression must be MJPG; anything else raises."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' magic missing)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = 8 + riff_size
    header: dict | None = None
    movi_start = None
    movi_spans: list[tuple[int, int]] = []
    frame_spans: list[tuple[int, int]] = []
    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc == b"LIST":
            ltype = data[body : body + 4]
            if ltype == b"hdrl":
                for fc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                    if fc2 == b"avih":
                        a = struct.unpack_from("<14I", data, b2)
                        header = {
                            "us_per_frame": a[0], "n_frames": a[4],
                            "width": a[8], "height": a[9],
                        }
                    elif fc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                        for fc3, b3, s3 in _walk_chunks(
                            data, b2 + 4, b2 + s2
                        ):
                            if fc3 == b"strh":
                                if data[b3 : b3 + 4] != b"vids":
                                    raise NotImplementedError(
                                        "non-video AVI stream"
                                    )
                                if data[b3 + 4 : b3 + 8] != b"MJPG":
                                    raise NotImplementedError(
                                        "AVI codec beyond MJPG"
                                    )
                            elif fc3 == b"strf":
                                comp = data[b3 + 16 : b3 + 20]
                                if comp != b"MJPG":
                                    raise NotImplementedError(
                                        f"biCompression {comp!r}"
                                    )
            elif ltype == b"movi":
                movi_start = body  # position of the 'movi' fourcc
                for fc2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                    if fc2[2:4] in (b"dc", b"db"):
                        movi_spans.append((b2, s2))
        elif fourcc == b"idx1":
            if movi_start is None:
                raise ValueError("idx1 before movi")
            n = size // 16
            for i in range(n):
                ckid, flags, off, ln = struct.unpack_from(
                    "<4sIII", data, body + 16 * i
                )
                if ckid[2:4] not in (b"dc", b"db"):
                    continue
                # offset counts from the 'movi' fourcc; +8 skips the
                # chunk's own header to the JPEG bytes
                frame_spans.append((movi_start + off + 8, ln))
    if header is None:
        raise ValueError("AVI missing avih header")
    return {
        **header,
        "frame_spans": frame_spans,
        "movi_spans": movi_spans,
    }


# closed-form pixels for the sampled frames — the color-JPEG DC
# chain (multimodal._jpeg_color_cte) keyed by (doc, frame, seed)
_AVI_PIXELS_CTE = f"""
    d AS (
        SELECT doc_id, doc_id % 4 + 2 AS wb, doc_id % 3 + 2 AS hb,
               doc_id % 5 + 6 AS nf, doc_id % 3 + 2 AS k
        FROM documents WHERE doc_id < {AVI_DOCS}
    ),
    sampled AS (
        SELECT * FROM (
            SELECT doc_id, wb, hb, nf, k, unnest(range(0, nf)) AS f
            FROM d
        ) WHERE f % k = 0
    ),
    blocks AS (
        SELECT doc_id, wb, hb, nf, k, f,
               31 * doc_id + 101 * f AS s,
               i % wb AS bx, i // wb AS by
        FROM (SELECT *, unnest(range(0, wb * hb)) AS i FROM sampled)
    ),
    colored AS (
        SELECT *, (s * 7 + 13 * bx + 29 * by) % 256 AS r,
               (s * 11 + 17 * bx + 31 * by) % 256 AS g,
               (s * 13 + 19 * bx + 37 * by) % 256 AS b
        FROM blocks
    ),
    ycc AS (
        SELECT *, 0.299 * r + 0.587 * g + 0.114 * b AS y,
               -0.168736 * r - 0.331264 * g + 0.5 * b + 128 AS cbv,
               0.5 * r - 0.418688 * g - 0.081312 * b + 128 AS crv
        FROM colored
    ),
    recon AS (
        SELECT doc_id, nf, k, wb, hb, f, bx, by,
               16 * {_sql_jpeg_dc('y', 16)} / 8 + 128 AS ry,
               17 * {_sql_jpeg_dc('cbv', 17)} / 8 + 128 AS rcb,
               17 * {_sql_jpeg_dc('crv', 17)} / 8 + 128 AS rcr
        FROM ycc
    ),
    rgb AS (
        SELECT doc_id, nf, k, wb, hb, f, bx, by,
               LEAST(255, GREATEST(0, CAST(floor(
                   (ry + 1.402 * (rcr - 128)) + 0.5) AS BIGINT)))
                   AS pr,
               LEAST(255, GREATEST(0, CAST(floor(
                   (ry - 0.344136 * (rcb - 128)
                       - 0.714136 * (rcr - 128)) + 0.5) AS BIGINT)))
                   AS pg,
               LEAST(255, GREATEST(0, CAST(floor(
                   (ry + 1.772 * (rcb - 128)) + 0.5) AS BIGINT)))
                   AS pb
        FROM recon
    )
"""


@register(
    "multimodal_avi_frame_sampling",
    oracle=f"""
        WITH {_AVI_PIXELS_CTE}
        SELECT doc_id,
               CAST(max(nf) AS INT) AS n_frames,
               CAST(count(DISTINCT f) AS INT) AS n_sampled,
               CAST({_US_PER_FRAME} AS INT) AS us_per_frame,
               CAST(8 * max(wb) AS INT) AS width,
               CAST(8 * max(hb) AS INT) AS height,
               TRUE AS index_consistent,
               CAST(sum(64 * pr) AS BIGINT) AS sum_r,
               CAST(sum(64 * pg) AS BIGINT) AS sum_g,
               CAST(sum(64 * pb) AS BIGINT) AS sum_b,
               CAST(sum(64 * pg * (f + 1)) AS BIGINT) AS wsum_g
        FROM rgb
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("multimodal", "video", "container", "mjpeg", "llm-pipeline"),
)
def multimodal_avi_frame_sampling(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Index-driven video frame sampling (round 11): per document an
    AVI/MJPEG clip of 6-10 frames (each a REAL baseline color JPEG
    from the repo's encoder, frame-seeded block-constant content);
    the reader walks the RIFF tree, validates avih/strh/strf, and
    uses **idx1** to seek straight to every k-th frame (k = 2..4 per
    doc) — unsampled frames' bytes are never parsed — then decodes
    the sampled JPEGs through `decode_jpeg`.

    `index_consistent` pins engine-side that the idx1 spans equal an
    independent sequential movi walk and match dwTotalFrames; the
    (f+1)-weighted green sum pins WHICH frames were sampled, so a
    stride slip, a wrong offset convention (±8 around the chunk
    header is the classic AVI bug), or frame-order confusion flips
    the hash. The DuckDB oracle regenerates every sampled pixel via
    the DC-only closed form shared with the color-JPEG queries.

    Scale posture: container walk O(header+index); only sampled
    payload bytes decode, Arrow-batched, zero shuffles."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < AVI_DOCS)
        .select("doc_id")
    )

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                img0 = avi_frame_image(d, 0)
                h, w, _ = img0.shape
                frames = [
                    encode_jpeg(avi_frame_image(d, f))
                    for f in range(n_frames(d))
                ]
                payloads.append(encode_avi_mjpeg(frames, w, h))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    schema = (
        "doc_id long, n_frames int, n_sampled int, us_per_frame int, "
        "width int, height int, index_consistent boolean, "
        "sum_r long, sum_g long, sum_b long, wsum_g long"
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                d = int(d)
                data = bytes(p)
                info = parse_avi(data)
                consistent = (
                    info["frame_spans"] == info["movi_spans"]
                    and len(info["frame_spans"]) == info["n_frames"]
                )
                k = sample_stride(d)
                sums = np.zeros(3, dtype=np.int64)
                wsum_g = 0
                n_sampled = 0
                for f in range(0, info["n_frames"], k):
                    start, size = info["frame_spans"][f]
                    px = decode_jpeg(data[start : start + size])
                    px = px.astype(np.int64)
                    sums += px.sum(axis=(0, 1))
                    wsum_g += int(px[:, :, 1].sum()) * (f + 1)
                    n_sampled += 1
                rows.append((
                    d, info["n_frames"], n_sampled,
                    info["us_per_frame"], info["width"], info["height"],
                    bool(consistent),
                    int(sums[0]), int(sums[1]), int(sums[2]), wsum_g,
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_sampled", "us_per_frame",
                    "width", "height", "index_consistent",
                    "sum_r", "sum_g", "sum_b", "wsum_g",
                ],
            )

    return media.mapInPandas(decode_batches, schema).orderBy("doc_id")
