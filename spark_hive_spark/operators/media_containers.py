"""Video/audio CONTAINER parsing (ISO-BMFF/MP4 boxes, MP3 frame
headers) — hand-built from the public specs (ISO/IEC 14496-12, the
MPEG-1/2 audio frame header layout), no media library.

This is the north star's "video/audio as opaque binary + typed
metadata" path made real: a frame-sampling or duration-bucketing
pipeline needs the CONTAINER walk (track layout, sample tables,
keyframe positions, frame counts, durations) long before it needs a
codec — and the container layer is pure structured parsing:

- MP4/ISO-BMFF: the box tree (size/type headers, nesting), ftyp,
  mvhd (timescale + duration), per-track tkhd/mdhd/hdlr, and the
  sample tables — stts (decode deltas), stsz (sample sizes), stss
  (sync/keyframe samples). The encoder writes a genuine box tree
  with deterministic sample tables around an opaque mdat.
- MP3: the 11-bit-sync frame header walk — MPEG-1 Layer III
  bitrate/sample-rate tables, padding bit, frame length arithmetic
  (144 * bitrate / rate + pad) — counting frames and summing
  durations without touching the audio payload (the standard way
  crawlers estimate duration). CBR and mixed-bitrate (VBR-style)
  streams both walk.

Payload DECODE for these formats stays the documented loud seam
(H.264/AAC/MP3 synthesis needs codec tables outside this
container's scope); the metadata layer is complete and exact, so
the registered query carries a full value-hash oracle.
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


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full_box(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version) + struct.pack(
        ">I", flags
    )[1:] + body)


def encode_mp4(
    tracks,
    timescale: int = 1000,
) -> bytes:
    """Write a genuine ISO-BMFF box tree: ftyp + moov(mvhd + one trak
    per entry + per-track mdhd/hdlr/stbl with stts/stsz/stss) + an
    opaque mdat. ``tracks`` is a list of dicts with keys:
    kind ('vide'|'soun'), sample_deltas (list[int], in track
    timescale ticks), sample_sizes (list[int]), keyframes
    (1-based sample indices, video only), track_timescale.
    The mdat payload is a deterministic filler of sum(sample_sizes)
    bytes — opaque, as a real pipeline would treat undecoded media."""
    moov_children = []
    total_dur_movie = 0
    for i, tr in enumerate(tracks):
        deltas = list(tr["sample_deltas"])
        sizes = list(tr["sample_sizes"])
        if len(deltas) != len(sizes):
            raise ValueError("sample_deltas and sample_sizes must align")
        tts = tr.get("track_timescale", timescale)
        dur_track = sum(deltas)
        dur_movie = dur_track * timescale // tts
        total_dur_movie = max(total_dur_movie, dur_movie)
        # stts: run-length (count, delta) pairs
        runs = []
        for d in deltas:
            if runs and runs[-1][1] == d:
                runs[-1][0] += 1
            else:
                runs.append([1, d])
        stts = _full_box(
            b"stts", 0, 0,
            struct.pack(">I", len(runs))
            + b"".join(struct.pack(">II", c, d) for c, d in runs),
        )
        stsz = _full_box(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stbl_children = stts + stsz
        if tr.get("keyframes"):
            stbl_children += _full_box(
                b"stss", 0, 0,
                struct.pack(">I", len(tr["keyframes"]))
                + b"".join(
                    struct.pack(">I", k) for k in tr["keyframes"]
                ),
            )
        stbl = _box(b"stbl", stbl_children)
        mdhd = _full_box(
            b"mdhd", 0, 0,
            struct.pack(">IIIIHH", 0, 0, tts, dur_track, 0x55C4, 0),
        )
        hdlr = _full_box(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + tr["kind"].encode()
            + b"\x00" * 12 + b"\x00",
        )
        mdia = _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl))
        tkhd = _full_box(
            b"tkhd", 0, 7,
            struct.pack(">IIIII", 0, 0, i + 1, 0, dur_movie)
            + b"\x00" * 60,  # reserved/layer/volume/matrix/w/h (v0 = 84B)
        )
        moov_children.append(_box(b"trak", tkhd + mdia))
    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, total_dur_movie)
        + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd + b"".join(moov_children))
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    n_bytes = sum(sum(tr["sample_sizes"]) for tr in tracks)
    mdat = _box(b"mdat", bytes((i * 37 + 11) & 0xFF for i in range(n_bytes)))
    return ftyp + moov + mdat


def parse_mp4(payload: bytes) -> dict:
    """Walk the ISO-BMFF box tree and return the metadata a sampling
    pipeline needs: movie timescale/duration, and per track — kind,
    timescale, duration, sample count, total sample bytes, min/max
    sample size, and keyframe count (video). Unknown boxes skip by
    size; structural damage fails loudly."""

    def walk(data: bytes, start: int, end: int):
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise ValueError("truncated MP4 box header")
            (size,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            if size == 1:
                raise NotImplementedError("64-bit MP4 box sizes")
            if size < 8 or pos + size > end:
                raise ValueError(f"bad MP4 box size for {tag!r}")
            yield tag, pos + 8, pos + size
            pos += size

    out: dict = {"tracks": []}
    saw_ftyp = False
    for tag, b0, b1 in walk(payload, 0, len(payload)):
        if tag == b"ftyp":
            saw_ftyp = True
        elif tag == b"moov":
            for t2, c0, c1 in walk(payload, b0, b1):
                if t2 == b"mvhd":
                    ts, dur = struct.unpack_from(">II", payload, c0 + 12)
                    out["timescale"] = ts
                    out["duration"] = dur
                elif t2 == b"trak":
                    out["tracks"].append(
                        _parse_trak(payload, c0, c1, walk)
                    )
    if not saw_ftyp or "timescale" not in out:
        raise ValueError("MP4 missing ftyp/moov/mvhd")
    return out


def _parse_trak(payload: bytes, b0: int, b1: int, walk) -> dict:
    tr: dict = {"keyframes": 0}
    for tag, c0, c1 in walk(payload, b0, b1):
        if tag == b"mdia":
            for t2, d0, d1 in walk(payload, c0, c1):
                if t2 == b"mdhd":
                    ts, dur = struct.unpack_from(">II", payload, d0 + 12)
                    tr["timescale"] = ts
                    tr["duration"] = dur
                elif t2 == b"hdlr":
                    tr["kind"] = payload[d0 + 8 : d0 + 12].decode(
                        "ascii", "replace"
                    )
                elif t2 == b"minf":
                    for t3, e0, e1 in walk(payload, d0, d1):
                        if t3 == b"stbl":
                            _parse_stbl(payload, e0, e1, walk, tr)
    for req in ("timescale", "duration", "kind", "n_samples"):
        if req not in tr:
            raise ValueError(f"MP4 track missing {req}")
    return tr


def _parse_stbl(payload: bytes, b0: int, b1: int, walk, tr: dict) -> None:
    for tag, c0, c1 in walk(payload, b0, b1):
        if tag == b"stts":
            (n,) = struct.unpack_from(">I", payload, c0 + 4)
            total = ticks = 0
            for k in range(n):
                c, d = struct.unpack_from(">II", payload, c0 + 8 + 8 * k)
                total += c
                ticks += c * d
            tr["n_samples"] = total
            tr["sample_ticks"] = ticks
        elif tag == b"stsz":
            fixed, n = struct.unpack_from(">II", payload, c0 + 4)
            if fixed:
                sizes = [fixed] * n
            else:
                sizes = list(
                    struct.unpack_from(f">{n}I", payload, c0 + 12)
                )
            tr["total_bytes"] = sum(sizes)
            tr["min_size"] = min(sizes) if sizes else 0
            tr["max_size"] = max(sizes) if sizes else 0
        elif tag == b"stss":
            (n,) = struct.unpack_from(">I", payload, c0 + 4)
            tr["keyframes"] = n


# MPEG-1 Layer III frame header tables (public ISO/IEC 11172-3 layout)
_MP3_BITRATES = (  # kbps, index 1..14 (0 = free, 15 = bad)
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
_MP3_RATES = (44100, 48000, 32000)  # index 0..2 (3 = reserved)


def encode_mp3_frames(specs) -> bytes:
    """Write a sequence of MPEG-1 Layer III FRAMES — valid sync +
    header + correctly sized opaque payload per (bitrate_index,
    rate_index, padding) spec tuple. The audio payload is filler
    (this is the container/metadata layer); frame lengths follow the
    spec arithmetic 144 * bitrate / sample_rate + padding."""
    out = bytearray()
    for k, (bi, ri, pad) in enumerate(specs):
        if not 1 <= bi <= 14 or not 0 <= ri <= 2 or pad not in (0, 1):
            raise ValueError("bad MP3 frame spec")
        # sync(11) version(2)=11 layer(2)=01 noprot(1)=1
        b0 = 0xFF
        b1 = 0xFB
        b2 = (bi << 4) | (ri << 2) | (pad << 1)
        b3 = 0x00
        flen = 144 * _MP3_BITRATES[bi] * 1000 // _MP3_RATES[ri] + pad
        frame = bytearray([b0, b1, b2, b3])
        while len(frame) < flen:
            frame.append((k * 31 + len(frame) * 7) & 0xFF)
        out.extend(frame)
    return bytes(out)


def scan_mp3_frames(payload: bytes) -> dict:
    """Walk MP3 frame headers without decoding audio: sync on
    0xFFE, parse MPEG-1 Layer III headers, hop by the computed frame
    length, and return frame count, total bytes, duration in
    milliseconds (1152 samples per frame), and the min/max bitrate
    seen — the crawl-time duration/bitrate estimator."""
    pos = 0
    n = len(payload)
    frames = 0
    dur_us = 0
    brs = []
    while pos + 4 <= n:
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 frame sync at byte {pos}")
        version = (payload[pos + 1] >> 3) & 0x03
        layer = (payload[pos + 1] >> 1) & 0x03
        if version != 3 or layer != 1:
            raise NotImplementedError("only MPEG-1 Layer III frames")
        bi = payload[pos + 2] >> 4
        ri = (payload[pos + 2] >> 2) & 0x03
        pad = (payload[pos + 2] >> 1) & 0x01
        if bi in (0, 15) or ri == 3:
            raise ValueError("free/bad MP3 bitrate or reserved rate")
        rate = _MP3_RATES[ri]
        flen = 144 * _MP3_BITRATES[bi] * 1000 // rate + pad
        if pos + flen > n:
            raise ValueError("truncated MP3 frame")
        frames += 1
        brs.append(_MP3_BITRATES[bi])
        dur_us += 1152 * 1_000_000 // rate
        pos += flen
    if frames == 0:
        raise ValueError("no MP3 frames")
    return {
        "frames": frames,
        "bytes": n,
        "duration_ms": dur_us // 1000,
        "min_kbps": min(brs),
        "max_kbps": max(brs),
    }


MEDIA_META_DOCS = 48
_MEDIA_META_SCHEMA = (
    "doc_id long, container int, n_tracks int, n_samples int,"
    " total_bytes long, duration_ms int, keyframes int,"
    " min_rate int, max_rate int"
)


@register(
    "multimodal_container_metadata",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   doc_id % 2 AS container,
                   60 + doc_id % 30 AS nv,      -- video samples
                   40 + doc_id % 20 AS na,      -- audio samples / mp3 frames
                   doc_id % 5 AS pads           -- mp3 padded frames
            FROM documents WHERE doc_id < {MEDIA_META_DOCS}
        ),
        idx AS (SELECT unnest(range(0, 90)) AS i),  -- covers max(nv, na)
        sums AS (
            SELECT d.doc_id,
                   sum(CASE WHEN i < nv THEN 900 + 17 * (i % 23)
                            ELSE 0 END)
                   + sum(CASE WHEN i < na THEN 120 + 7 * (i % 11)
                              ELSE 0 END) AS mp4_bytes,
                   sum(CASE WHEN i < na THEN
                        144 * (CASE (d.doc_id + i) % 3
                               WHEN 0 THEN 128 WHEN 1 THEN 192
                               ELSE 320 END) * 1000 // 44100
                        + CASE WHEN i < pads THEN 1 ELSE 0 END
                       ELSE 0 END) AS mp3_bytes
            FROM d, idx
            GROUP BY d.doc_id
        ),
        mp4 AS (
            SELECT d.doc_id, 0 AS container,
                   2 AS n_tracks,
                   nv + na AS n_samples,
                   s.mp4_bytes AS total_bytes,
                   -- video: nv samples x 512 ticks @ 12800 = 40ms each
                   CAST(nv * 40 AS INT) AS duration_ms,
                   CAST((nv + 11) // 12 AS INT) AS keyframes,
                   0 AS min_rate, 0 AS max_rate
            FROM d JOIN sums s USING (doc_id) WHERE container = 0
        ),
        mp3 AS (
            SELECT d.doc_id, 1 AS container,
                   1 AS n_tracks,
                   na AS n_samples,
                   s.mp3_bytes AS total_bytes,
                   CAST(na * (1152 * 1000000 // 44100) // 1000 AS INT)
                       AS duration_ms,
                   0 AS keyframes,
                   CAST(128 AS INT) AS min_rate,
                   CAST(320 AS INT) AS max_rate
            FROM d JOIN sums s USING (doc_id) WHERE container = 1
        )
        SELECT doc_id, CAST(container AS INT) AS container,
               CAST(n_tracks AS INT) AS n_tracks,
               CAST(n_samples AS INT) AS n_samples,
               CAST(total_bytes AS BIGINT) AS total_bytes,
               duration_ms,
               CAST(keyframes AS INT) AS keyframes,
               min_rate, max_rate
        FROM (SELECT * FROM mp4 UNION ALL SELECT * FROM mp3)
        ORDER BY doc_id
    """,
    tags=("multimodal", "container", "mp4", "mp3", "llm-pipeline"),
)
def multimodal_container_metadata(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VIDEO/AUDIO CONTAINER metadata extraction (round 10) — the
    layer a frame-sampling pipeline runs over undecoded media: even
    docs synthesize a genuine two-track MP4 (video trak with 512-tick
    samples at timescale 12800, every-12th-sample keyframes in stss,
    size-varying stsz; audio trak with its own timescale) and the box
    walker recovers track count, sample counts, byte totals,
    duration, and keyframe count from the REAL ISO-BMFF sample
    tables; odd docs synthesize an MPEG-1 Layer III stream with
    per-frame bitrates cycling 128/192/320 kbps and leading padded
    frames, and the frame walker counts frames / duration / bitrate
    band by hopping the spec's 144·bitrate/rate+pad lengths — losing
    sync or mis-sizing one frame cascades into a loud error, and any
    arithmetic slip flips the hash.

    The oracle recomputes every field from the same closed forms
    (per-sample size/duration series) without touching bytes. Codec
    payloads stay opaque filler — the documented seam is the codec
    layer, not the container walk.

    Scale posture: identical to the codec queries — two narrow Arrow
    `mapInPandas` stages, zero shuffles, no driver parsing."""

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < MEDIA_META_DOCS)
        .select("doc_id")
    )

    def encode_batches(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                nv, na = 60 + d % 30, 40 + d % 20
                if d % 2 == 0:
                    video = {
                        "kind": "vide",
                        "track_timescale": 12800,
                        "sample_deltas": [512] * nv,
                        "sample_sizes": [
                            900 + 17 * (i % 23) for i in range(nv)
                        ],
                        "keyframes": list(range(1, nv + 1, 12)),
                    }
                    audio = {
                        "kind": "soun",
                        "track_timescale": 44100,
                        "sample_deltas": [1024] * na,
                        "sample_sizes": [
                            120 + 7 * (i % 11) for i in range(na)
                        ],
                    }
                    payloads.append(encode_mp4([video, audio]))
                else:
                    pads = d % 5
                    specs = [
                        (
                            {0: 9, 1: 11, 2: 14}[(d + i) % 3],  # 128/192/320
                            0,  # 44100
                            1 if i < pads else 0,
                        )
                        for i in range(na)
                    ]
                    payloads.append(encode_mp3_frames(specs))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(batches):
        import pandas as pd  # noqa: PLC0415

        cols = (
            "doc_id container n_tracks n_samples total_bytes"
            " duration_ms keyframes min_rate max_rate"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                d = int(d)
                blob = bytes(p)
                if d % 2 == 0:
                    meta = parse_mp4(blob)
                    vid = next(
                        tr for tr in meta["tracks"] if tr["kind"] == "vide"
                    )
                    n_samples = sum(
                        tr["n_samples"] for tr in meta["tracks"]
                    )
                    total = sum(
                        tr["total_bytes"] for tr in meta["tracks"]
                    )
                    dur_ms = (
                        meta["duration"] * 1000 // meta["timescale"]
                    )
                    vals = (
                        d, 0, len(meta["tracks"]), n_samples, total,
                        dur_ms, vid["keyframes"], 0, 0,
                    )
                else:
                    meta = scan_mp3_frames(blob)
                    vals = (
                        d, 1, 1, meta["frames"], meta["bytes"],
                        meta["duration_ms"], 0, meta["min_kbps"],
                        meta["max_kbps"],
                    )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return (
        media.mapInPandas(decode_batches, _MEDIA_META_SCHEMA)
        .orderBy("doc_id")
    )
