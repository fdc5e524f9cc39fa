"""WebDataset-style tar shard reading — the de-facto container for
large multimodal training corpora (LAION, DataComp et al. ship as
POSIX tar shards where each sample is a group of adjacently-stored
files sharing a basename key: ``000123.jpg`` + ``000123.txt`` +
``000123.cls``). Hand-built from the public POSIX.1-1988 ustar spec
(no tarfile import executor-side, so every framing rule is explicit
and checkable).

Implemented surface:
- ustar member framing: 512-byte headers (name, octal size/mode/
  mtime, ``ustar\\0`` magic), the space-seeded header checksum, data
  rounded up to 512-byte blocks, and the two-zero-block terminator.
- WebDataset sample grouping: adjacent members sharing the basename
  key (up to the first dot) form one sample; extensions map fields.
- Per-extension decoding: ``.cls`` ASCII int labels, ``.txt`` UTF-8
  captions, ``.pgm`` images through the repo's own netpbm codec —
  shard ingestion composes with the multimodal decode layer.

The registered query's oracle recomputes sample/file counts, label
and caption totals, decoded pixel sums, AND the exact shard byte
size (headers + block padding + terminator) from closed forms, so a
header-layout, checksum, padding, or grouping bug flips the hash.

Scale posture: shards are the unit of parallelism (exactly how real
WebDataset loaders shard work across nodes) — one tar per task row,
two narrow Arrow ``mapInPandas`` stages, zero shuffles.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

try:  # pandas only needed executor-side
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None

_BLOCK = 512


def _octal(value: int, width: int) -> bytes:
    """POSIX octal numeric field: zero-padded digits + NUL."""
    return f"{value:0{width - 1}o}".encode() + b"\x00"


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``(name, data)`` members as a ustar archive:
    512-byte headers with the space-seeded checksum, data padded to
    block multiples, two zero blocks at the end. Inverse of
    `parse_tar`."""
    out = bytearray()
    for name, data in members:
        raw = name.encode()
        if len(raw) > 100:
            raise ValueError(f"tar member name too long: {name!r}")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(raw)] = raw
        hdr[100:108] = _octal(0o644, 8)  # mode
        hdr[108:116] = _octal(0, 8)  # uid
        hdr[116:124] = _octal(0, 8)  # gid
        hdr[124:136] = _octal(len(data), 12)
        hdr[136:148] = _octal(0, 12)  # mtime (deterministic)
        hdr[148:156] = b" " * 8  # checksum seed
        hdr[156] = 0x30  # typeflag '0' = regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:155] = f"{chk:06o}".encode() + b"\x00"
        hdr[155] = 0x20
        out += hdr
        out += data
        pad = -len(data) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """Walk a ustar archive into ``(name, data)`` members, verifying
    the magic, the space-seeded header checksum, size framing, and
    the zero-block terminator."""
    members: list[tuple[str, bytes]] = []
    pos = 0
    while True:
        hdr = payload[pos : pos + _BLOCK]
        if len(hdr) < _BLOCK:
            raise ValueError("truncated tar header")
        if hdr == b"\x00" * _BLOCK:  # terminator
            if payload[pos + _BLOCK : pos + 2 * _BLOCK] != b"\x00" * _BLOCK:
                raise ValueError("tar missing second terminator block")
            return members
        if hdr[257:262] != b"ustar":
            raise ValueError("bad ustar magic")
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        seeded = bytearray(hdr)
        seeded[148:156] = b" " * 8
        if sum(seeded) != stored:
            raise ValueError("tar header checksum mismatch")
        name = hdr[:100].split(b"\x00")[0].decode()
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        start = pos + _BLOCK
        data = payload[start : start + size]
        if len(data) != size:
            raise ValueError(f"truncated tar member {name!r}")
        members.append((name, data))
        pos = start + size + (-size % _BLOCK)


def group_samples(
    members: list[tuple[str, bytes]],
) -> list[tuple[str, dict[str, bytes]]]:
    """WebDataset grouping: ADJACENT members whose basename up to the
    first dot matches form one sample; the remainder is the field
    extension. A key reappearing non-adjacently is a corrupt shard
    (real loaders stream, so they cannot regroup across the gap)."""
    samples: list[tuple[str, dict[str, bytes]]] = []
    seen: set[str] = set()
    for name, data in members:
        base = name.rsplit("/", 1)[-1]
        key, dot, ext = base.partition(".")
        if not dot:
            raise ValueError(f"tar member {name!r} has no extension")
        if samples and samples[-1][0] == key:
            samples[-1][1][ext] = data
        else:
            if key in seen:
                raise ValueError(f"non-adjacent sample key {key!r}")
            seen.add(key)
            samples.append((key, {ext: data}))
    return samples


WDS_SHARDS = 40
_WDS_SCHEMA = (
    "doc_id long, n_samples int, n_files int, tar_bytes long,"
    " label_sum long, caption_chars long, pixel_sum long"
)


@register(
    "source_webdataset_tar",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, doc_id % 4 + 2 AS nsamp
            FROM documents WHERE doc_id < {WDS_SHARDS}
        ),
        s AS (
            SELECT doc_id, nsamp, i,
                   (doc_id * 3 + i) % 10 AS label,
                   5 + (doc_id * 5 + i * 3) % 40 AS clen,
                   4 + i % 3 AS w,
                   (doc_id * 7 + i * 11) % 251 AS v
            FROM (SELECT doc_id, nsamp, unnest(range(0, nsamp)) AS i
                  FROM d)
        )
        SELECT doc_id,
               CAST(nsamp AS INT) AS n_samples,
               CAST(3 * nsamp AS INT) AS n_files,
               -- every field is < 512 bytes: header block + one data
               -- block per member, plus the two-block terminator
               CAST(3 * nsamp * 1024 + 1024 AS BIGINT) AS tar_bytes,
               CAST(sum(label) AS BIGINT) AS label_sum,
               CAST(sum(clen) AS BIGINT) AS caption_chars,
               CAST(sum(w * 3 * v) AS BIGINT) AS pixel_sum
        FROM s
        GROUP BY doc_id, nsamp
        ORDER BY doc_id
    """,
    tags=("source", "webdataset", "multimodal", "llm-pipeline"),
)
def source_webdataset_tar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard ingestion (round 10) — the tar-of-samples
    container multimodal training sets ship in. Per document a
    synthetic ustar shard holds doc%4+2 samples, each the standard
    adjacent triplet ``key.cls`` (ASCII label), ``key.txt``
    (caption), ``key.pgm`` (a netpbm P5 image decoded through the
    repo's own codec). The reader walks ustar framing (checksums
    verified), regroups adjacent members into samples, and
    aggregates per shard: sample/file counts, exact shard bytes,
    label and caption totals, and decoded pixel sums.

    The oracle recomputes every column — including the exact tar
    byte size from the 512-byte block arithmetic — from the
    fixture's closed forms, so a header, checksum, padding,
    grouping, or pixel-decode bug flips the hash.

    Scale posture: shards ARE the parallelism unit (as in real
    WebDataset training jobs); two narrow Arrow ``mapInPandas``
    stages, zero shuffles."""
    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_pnm,
        encode_pnm,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < WDS_SHARDS)
        .select("doc_id")
    )

    def encode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy()
            payloads = []
            for d in ids:
                d = int(d)
                members: list[tuple[str, bytes]] = []
                for s in range(d % 4 + 2):
                    key = f"{d:05d}-{s:03d}"
                    label = (d * 3 + s) % 10
                    caption = "x" * (5 + (d * 5 + s * 3) % 40)
                    w, v = 4 + s % 3, (d * 7 + s * 11) % 251
                    img = np.full((3, w), v, dtype=np.uint8)
                    members += [
                        (f"{key}.cls", str(label).encode()),
                        (f"{key}.txt", caption.encode()),
                        (f"{key}.pgm", encode_pnm(img, "P5")),
                    ]
                payloads.append(encode_tar(members))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        cols = (
            "doc_id n_samples n_files tar_bytes label_sum"
            " caption_chars pixel_sum"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                files = parse_tar(payload)
                samples = group_samples(files)
                label_sum = caption_chars = pixel_sum = 0
                for _, fields in samples:
                    if set(fields) != {"cls", "txt", "pgm"}:
                        raise ValueError("incomplete WebDataset sample")
                    label_sum += int(fields["cls"].decode())
                    caption_chars += len(fields["txt"].decode())
                    px = decode_pnm(fields["pgm"])
                    pixel_sum += int(px.astype("int64").sum())
                vals = (
                    int(d), len(samples), len(files), len(payload),
                    label_sum, caption_chars, pixel_sum,
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, _WDS_SCHEMA).orderBy("doc_id")
