"""IMA/DVI ADPCM audio (WAVE format tag 0x11), decoded by hand — the
4-bit compressed-telephony/game-audio codec between G.711 (8-bit
memoryless) and FLAC (lossless) in the repo's audio surface
(SURVEY.md §2B multimodal).

Hand-built from the public specs (IMA "Recommended Practices for
Enhancing Digital Audio Compatibility", the MS WAVE registry for
tag 0x0011):

- **Container**: RIFF/WAVE with wFormatTag 0x11, nBlockAlign-sized
  blocks, wSamplesPerBlock in the fmt extension, and the `fact`
  chunk's dwSampleLength (mandatory for compressed WAVE) validated
  against the decoded count.
- **Block layout** (mono): a 4-byte header — initial predictor
  (i16 LE, which IS sample 0), step index (u8), reserved — then
  (nBlockAlign − 4) bytes of 4-bit codes, LOW nibble first.
- **Decoder recurrence** per code n: `diff = step/8 + (n&1)·step/4
  + (n&2)·step/2 + (n&4)·step` (integer shifts), sign bit n&8,
  predictor clamped to int16, step index moved by the 16-entry
  index table and clamped to [0, 88] over the 89-entry step table.

THE ORACLE IS THE POINT here: ADPCM is stateful (every sample
depends on the whole prefix), so unlike the memoryless G.711 oracle
the DuckDB side cannot expand codes independently — instead the
oracle DECODES THE STREAM IN SQL with a recursive CTE that carries
(predictor, step index) through the identical integer recurrence,
step/index tables inlined as VALUES. The code stream itself is a
deterministic formula of (doc, block, position), so both sides
regenerate it independently and every decoded sample is value-hashed
— a clamp slip, a nibble-order swap, or an index-table error
diverges immediately and flips the hash.

Scale posture: blocks are the format's parallelism unit (each
carries its own predictor/index — that is WHY the header exists),
so a 100 TB audio corpus decodes block-parallel with no cross-block
state; here each doc's payload decodes inside an Arrow batch, zero
shuffles.

Reference parity: the reference has no audio surface
(CollegeScorecard.scala:35-157); north-star per SURVEY §2B.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

ADPCM_DOCS = 48
_RATE = 8000
_BLOCK_ALIGN = 256  # -> 505 samples per mono block
_N_BLOCKS = 2

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def samples_per_block(block_align: int = _BLOCK_ALIGN) -> int:
    return (block_align - 4) * 2 + 1


def _code(d: int, b: int, j: int) -> int:
    """The deterministic 4-bit code stream both sides regenerate."""
    return (d + 5 * b + 3 * j) % 16


def _init_state(d: int, b: int) -> tuple[int, int]:
    """(initial predictor, initial step index) per block."""
    return ((d * 997 + b * 131) % 4000) - 2000, (d + 7 * b) % 89


def ima_decode_block(
    predictor: int, index: int, codes: bytes
) -> list[int]:
    """Block header state + packed nibbles -> samples (header
    predictor included as sample 0), the exact IMA recurrence."""
    out = [predictor]
    for byte in codes:
        for n in (byte & 0x0F, byte >> 4):  # LOW nibble first
            step = STEP_TABLE[index]
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            predictor += -diff if n & 8 else diff
            predictor = max(-32768, min(32767, predictor))
            index = max(0, min(88, index + INDEX_TABLE[n]))
            out.append(predictor)
    return out


def encode_ima_wav(doc_id: int) -> bytes:
    """The doc's deterministic code stream packed into a legal
    IMA-ADPCM WAVE file (fmt 0x11 + fact + data)."""
    spb = samples_per_block()
    blocks = bytearray()
    for b in range(_N_BLOCKS):
        pred, idx = _init_state(doc_id, b)
        blocks += struct.pack("<hBB", pred, idx, 0)
        for jbyte in range(_BLOCK_ALIGN - 4):
            lo = _code(doc_id, b, 2 * jbyte)
            hi = _code(doc_id, b, 2 * jbyte + 1)
            blocks.append(lo | (hi << 4))
    total_samples = _N_BLOCKS * spb
    byte_rate = (_RATE * _BLOCK_ALIGN) // spb  # advisory
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, _RATE, byte_rate, _BLOCK_ALIGN, 4, 2, spb
    )
    fact = struct.pack("<I", total_samples)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_ima_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """-> (rate, fact sample count, decoded samples); every header
    field cross-checked, non-IMA formats loud."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + struct.unpack_from("<I", payload, 4)[0]
    fmt = fact_n = data = None
    while pos < end:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHHHH", body[:20])
        elif tag == b"fact":
            (fact_n,) = struct.unpack_from("<I", body)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data")
    tag_, channels, rate, _, block_align, bits, _, spb = fmt
    if tag_ != 0x11:
        raise NotImplementedError(f"WAVE format tag 0x{tag_:x}")
    if channels != 1 or bits != 4:
        raise NotImplementedError("only mono 4-bit IMA implemented")
    if spb != samples_per_block(block_align):
        raise ValueError("wSamplesPerBlock inconsistent with align")
    if fact_n is None:
        raise ValueError("compressed WAVE missing fact chunk")
    samples: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        pred, idx, _ = struct.unpack_from("<hBB", block)
        samples.extend(ima_decode_block(pred, idx, block[4:]))
    if len(samples) != fact_n:
        raise ValueError(
            f"decoded {len(samples)} samples, fact says {fact_n}"
        )
    return rate, fact_n, samples


def _sql_tables() -> str:
    steps = ", ".join(f"({i}, {s})" for i, s in enumerate(STEP_TABLE))
    itab = ", ".join(f"({n}, {d})" for n, d in enumerate(INDEX_TABLE))
    return f"""
        steps(si, step) AS (VALUES {steps}),
        itab(code, di) AS (VALUES {itab})
    """


_NIBBLES = (_BLOCK_ALIGN - 4) * 2


@register(
    "multimodal_adpcm_audio_decode",
    oracle=f"""
        WITH RECURSIVE
        {_sql_tables()},
        blocks AS (
            SELECT doc_id, b,
                   (doc_id * 997 + b * 131) % 4000 - 2000 AS pred0,
                   (doc_id + 7 * b) % 89 AS idx0
            FROM (SELECT doc_id, unnest(range(0, {_N_BLOCKS})) AS b
                  FROM documents WHERE doc_id < {ADPCM_DOCS})
        ),
        dec(doc_id, b, j, pred, idx) AS (
            SELECT doc_id, b, 0, pred0, idx0 FROM blocks
            UNION ALL
            SELECT d.doc_id, d.b, d.j + 1,
                   LEAST(32767, GREATEST(-32768, d.pred +
                       CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 16 >= 8
                            THEN -(st.step // 8
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 2 = 1
                              THEN st.step // 4 ELSE 0 END
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 16
                                   // 2 % 2 = 1
                              THEN st.step // 2 ELSE 0 END
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 16
                                   // 4 % 2 = 1
                              THEN st.step ELSE 0 END)
                            ELSE (st.step // 8
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 2 = 1
                              THEN st.step // 4 ELSE 0 END
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 16
                                   // 2 % 2 = 1
                              THEN st.step // 2 ELSE 0 END
                       + CASE WHEN (d.doc_id + 5*d.b + 3*d.j) % 16
                                   // 4 % 2 = 1
                              THEN st.step ELSE 0 END) END)),
                   LEAST(88, GREATEST(0, d.idx + it.di))
            FROM dec d
            JOIN steps st ON st.si = d.idx
            JOIN itab it
              ON it.code = (d.doc_id + 5*d.b + 3*d.j) % 16
            WHERE d.j < {_NIBBLES}
        )
        SELECT doc_id,
               CAST({_N_BLOCKS} AS INT) AS n_blocks,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST({_RATE} AS INT) AS rate,
               CAST(sum(pred) AS BIGINT) AS sum_pcm,
               CAST(sum((1000 * b + j + 1) * pred) AS BIGINT)
                   AS wsum_pcm,
               CAST(min(pred) AS INT) AS min_pcm,
               CAST(max(pred) AS INT) AS max_pcm
        FROM dec
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    tags=("multimodal", "audio", "codec", "adpcm", "llm-pipeline"),
)
def multimodal_adpcm_audio_decode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IMA ADPCM bytes→PCM (round 11): per document a two-block
    4-bit stream in a legal fmt-0x11 WAVE container decodes through
    the hand-built recurrence; the DuckDB oracle decodes the SAME
    stream with a recursive CTE carrying (predictor, step index)
    through the identical clamped integer updates — the stateful
    sibling of the memoryless G.711 SQL oracle. The
    (1000·block + position)-weighted sum pins sample ORDER and
    block boundaries; `fact`-vs-decoded count mismatches raise."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < ADPCM_DOCS)
        .select("doc_id")
    )

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            yield pd.DataFrame({
                "doc_id": ids,
                "payload": [encode_ima_wav(int(d)) for d in ids],
            })

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    spb = samples_per_block()
    schema = (
        "doc_id long, n_blocks int, n_samples long, rate int, "
        "sum_pcm long, wsum_pcm long, min_pcm int, max_pcm int"
    )

    def decode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                rate, fact_n, samples = decode_ima_wav(bytes(p))
                wsum = s = 0
                for i, v in enumerate(samples):
                    b, j = divmod(i, spb)
                    s += v
                    wsum += (1000 * b + j + 1) * v
                rows.append((
                    int(d), _N_BLOCKS, fact_n, rate, s, wsum,
                    min(samples), max(samples),
                ))
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_blocks", "n_samples", "rate",
                "sum_pcm", "wsum_pcm", "min_pcm", "max_pcm",
            ],
        )

    return media.mapInPandas(decode_batches, schema).orderBy("doc_id")
