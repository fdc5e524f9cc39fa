"""Multimodal column plumbing (SURVEY.md §2B tier 2 / north star):
treat image/audio/video payloads as opaque `binary` columns with typed
metadata, processed by Arrow-batched `mapInPandas` stages.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (`decode_image` raises NotImplementedError; a
deterministic fake decoder stands in for tests and the registered
query). Everything around it — binary column handling, schema,
batching, partition sizing — is real Spark plumbing and is what this
module actually tests.

Scale notes: media blobs make rows huge; keep
`spark.sql.files.maxPartitionBytes` bounded so a partition of blobs
fits executor memory, and carry metadata (width/height/frames) in
plain columns so filters prune BEFORE any decode runs. mapInPandas
streams Arrow batches — per-batch Python cost, never per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

MEDIA_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, "
    "fake_n_frames int, checksum long"
)


def decode_image(payload: bytes) -> "object":
    """REAL decode would go through PIL/libjpeg — not present in this
    container. Kept as an explicit seam: swap in a real decoder on a
    cluster image that has the codec libraries."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "use fake_decode (deterministic stub) or install PIL on the cluster"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a media decoder: derives fake
    dimensions/frame-count and a checksum purely from the bytes, so
    the full pipeline (binary col → Arrow batch → decoded features) is
    testable without codecs."""
    n = len(payload)
    return (
        n % 640 + 1,          # fake_width
        n % 480 + 1,          # fake_height
        n % 30 + 1,           # fake_n_frames
        sum(payload) % (1 << 31),  # checksum
    )


def decode_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode stage over (doc_id long, payload binary).

    Arrow streams batches of binary payloads into pandas; the stub
    decoder runs per row INSIDE the batch (a real decoder would too —
    decode is inherently per-payload), and one output batch goes back
    per input batch."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "fake_width": [f[0] for f in feats],
                    "fake_height": [f[1] for f in feats],
                    "fake_n_frames": [f[2] for f in feats],
                    "checksum": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


@register(
    "multimodal_media_features",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               octet_length(encode(text)) % 640 + 1 AS fake_width,
               octet_length(encode(text)) % 480 + 1 AS fake_height,
               octet_length(encode(text)) % 30 + 1 AS fake_n_frames
        FROM documents
        WHERE doc_id < 200
        ORDER BY doc_id
    """,
    tags=("multimodal", "udf", "binary"),
)
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal plumbing: build a binary payload column
    (UTF-8 bytes of `text` stand in for a media blob), run the
    mapInPandas decode stage, return the feature table. The
    length-derived features are SQL-expressible, so the whole
    binary→Arrow→pandas→features path gets a real oracle; `checksum`
    is validated in tests (not SQL-portable)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    feats = decode_media_features(media)
    return feats.select(
        "doc_id", "n_bytes", "fake_width", "fake_height", "fake_n_frames"
    ).orderBy("doc_id")


FRAME_SCHEMA = "doc_id long, frame_idx int, byte_offset int, frame_bytes int"


def sample_frames(media: DataFrame) -> DataFrame:
    """One-to-many decode stage: each payload expands to its sampled
    'frames' (deterministic count/offsets from the byte length — the
    stub stands in for a real keyframe sampler). mapInPandas yields
    MORE rows than it consumes — the row-expanding UDF shape
    (batch-in, exploded-batch-out, still zero per-row Python calls
    beyond the loop)."""
    import numpy as np

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(lambda p: len(bytes(p))).to_numpy()
            n_frames = n_bytes % 30 + 1
            doc_ids = pdf["doc_id"].to_numpy()
            out_doc, out_idx, out_off, out_len = [], [], [], []
            for d, nb, nf in zip(doc_ids, n_bytes, n_frames):
                stride = nb // nf
                idx = np.arange(nf)
                out_doc.append(np.full(nf, d))
                out_idx.append(idx)
                out_off.append(idx * stride)
                out_len.append(np.full(nf, stride))
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_doc),
                    "frame_idx": np.concatenate(out_idx).astype("int32"),
                    "byte_offset": np.concatenate(out_off).astype("int32"),
                    "frame_bytes": np.concatenate(out_len).astype("int32"),
                }
            )

    return media.mapInPandas(expand, schema=FRAME_SCHEMA)


@register(
    "multimodal_frame_samples",
    oracle="""
        WITH media AS (
            SELECT doc_id, octet_length(encode(text)) AS n_bytes
            FROM documents WHERE doc_id < 50
        ),
        frames AS (
            SELECT doc_id,
                   n_bytes % 30 + 1 AS n_frames,
                   n_bytes // (n_bytes % 30 + 1) AS stride,
                   unnest(range(0, n_bytes % 30 + 1)) AS frame_idx
            FROM media
        )
        SELECT doc_id,
               CAST(frame_idx AS INT) AS frame_idx,
               CAST(frame_idx * stride AS INT) AS byte_offset,
               CAST(stride AS INT) AS frame_bytes
        FROM frames
        ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "udf", "explode"),
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: binary payloads expand to per-frame
    rows (offset + length) inside a row-expanding mapInPandas stage —
    the video-keyframe / audio-chunk extraction shape with the codec
    stubbed. Integer-only math, so the whole one-to-many Arrow path
    gets a value-hash oracle."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(media).orderBy("doc_id", "frame_idx")


RESIZE_TARGET = 224  # the ubiquitous vision-model input edge
RESIZE_SCHEMA = (
    "doc_id long, in_w int, in_h int, out_w int, out_h int, out_bytes long"
)


def plan_resize(decoded: DataFrame) -> DataFrame:
    """Resize stage over decoded frames: computes the aspect-
    preserving fit into RESIZE_TARGET² (the letterbox geometry every
    vision preprocessor needs) as a vectorized mapInPandas stage.
    The actual pixel resample is the same codec seam as decode_image
    — on a real cluster the numpy block below calls the resampling
    kernel; the geometry arithmetic, Arrow batch shape, and schema
    are the production plumbing and are oracle-checked."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            w = pdf["fake_width"].to_numpy(dtype="float64")
            h = pdf["fake_height"].to_numpy(dtype="float64")
            scale = np.minimum(RESIZE_TARGET / w, RESIZE_TARGET / h)
            out_w = np.maximum(1, np.floor(w * scale)).astype("int64")
            out_h = np.maximum(1, np.floor(h * scale)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "in_w": pdf["fake_width"],
                    "in_h": pdf["fake_height"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "out_bytes": out_w * out_h * 3,
                }
            )

    return decoded.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)


@register(
    "multimodal_resize_plan",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   octet_length(encode(text)) % 640 + 1 AS in_w,
                   octet_length(encode(text)) % 480 + 1 AS in_h
            FROM documents
            WHERE doc_id < 200
        ),
        g AS (
            SELECT doc_id, in_w, in_h,
                   least({RESIZE_TARGET}.0 / in_w,
                         {RESIZE_TARGET}.0 / in_h) AS scale
            FROM d
        )
        SELECT doc_id, in_w, in_h,
               CAST(greatest(1, floor(in_w * scale)) AS INT) AS out_w,
               CAST(greatest(1, floor(in_h * scale)) AS INT) AS out_h,
               CAST(greatest(1, floor(in_w * scale))
                    * greatest(1, floor(in_h * scale)) * 3 AS BIGINT)
                   AS out_bytes
        FROM g
        ORDER BY doc_id
    """,
    tags=("multimodal", "udf", "resize", "llm-pipeline"),
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → resize-geometry pipeline: the decode mapInPandas
    stage feeds the resize mapInPandas stage (both Arrow-vectorized),
    producing the aspect-preserving 224×224 fit every
    vision preprocessor computes before the pixel kernel. Both
    engines evaluate the identical IEEE expression (min of two double
    ratios, multiply, floor), so the geometry is exactly hashable.

    Scale: two chained narrow map stages — no shuffle at all; the
    plan streams binary batches through decode and geometry through
    resize, partition-local end to end."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    decoded = decode_media_features(media)
    return plan_resize(decoded).orderBy("doc_id")
