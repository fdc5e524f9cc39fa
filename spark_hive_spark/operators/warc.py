"""WARC (Web ARChive, ISO 28500) reading — the container web-crawl
training corpora actually ship in (Common Crawl et al.), hand-built
from the public spec with stdlib zlib only.

Implemented surface:
- WARC/1.0 record framing: header block (CRLF-terminated named
  fields, case-insensitive names), Content-Length body framing, the
  mandatory blank line and the two CRLF record separators.
- Record types: request / response / metadata / warcinfo /
  conversion (any type parses; the reader surfaces the type string).
- HTTP payload introspection for response records: status-line
  parse (the code a quality filter keys on) and header/body split.
- The standard ``.warc.gz`` layout: ONE GZIP MEMBER PER RECORD
  (what makes the format splittable at scale), walked member by
  member with raw zlib (wbits=31) so each record's compressed
  extent is recovered — exactly how a distributed reader computes
  split offsets.

The registered query's oracle recomputes record counts, HTTP status
tallies, and body-byte totals from the fixture's closed forms, so a
framing, Content-Length, member-boundary, or status-parse bug flips
the value hash.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

try:  # pandas only needed executor-side
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None


def encode_warc(records, gzip_per_record: bool = False) -> bytes:
    """Serialize WARC/1.0 records — each a dict with ``type``,
    ``uri`` (optional), and ``payload`` bytes. With
    ``gzip_per_record`` every record becomes its own gzip member
    (the splittable .warc.gz layout). Inverse of `parse_warc`."""
    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        head = [
            "WARC/1.0",
            f"WARC-Type: {rec['type']}",
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            "WARC-Date: 2024-01-01T00:00:00Z",
        ]
        if rec.get("uri"):
            head.append(f"WARC-Target-URI: {rec['uri']}")
        head.append(f"Content-Length: {len(payload)}")
        raw = (
            ("\r\n".join(head) + "\r\n\r\n").encode()
            + payload
            + b"\r\n\r\n"
        )
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip member
            out += co.compress(raw) + co.flush()
        else:
            out += raw
    return bytes(out)


def _parse_record(data: bytes, pos: int) -> tuple[dict, int]:
    """One uncompressed WARC record at ``pos`` -> (record, next_pos)."""
    end = data.find(b"\r\n\r\n", pos)
    if end < 0:
        raise ValueError("truncated WARC header block")
    lines = data[pos:end].split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if not _:
            raise ValueError(f"bad WARC header line {ln!r}")
        fields[k.strip().decode().lower()] = v.strip().decode()
    try:
        length = int(fields["content-length"])
    except (KeyError, ValueError) as exc:
        raise ValueError("WARC record missing Content-Length") from exc
    body_start = end + 4
    body = data[body_start : body_start + length]
    if len(body) != length:
        raise ValueError("truncated WARC record body")
    tail = data[body_start + length : body_start + length + 4]
    if tail != b"\r\n\r\n":
        raise ValueError("WARC record missing terminating CRLFs")
    rec = {
        "type": fields.get("warc-type", ""),
        "uri": fields.get("warc-target-uri", ""),
        "body": body,
    }
    return rec, body_start + length + 4


def _http_status(body: bytes) -> int:
    """Status code from an HTTP response payload's first line."""
    line, _, _ = body.partition(b"\r\n")
    parts = line.split()
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError("WARC response payload is not HTTP")
    return int(parts[1])


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC file — plain or per-record-gzipped (.warc.gz) —
    into records: type, target URI, body length, and for HTTP
    responses the status code and the header-free content length.
    Gzip members walk one record at a time via zlib's unused_data,
    the splittability contract of the .gz layout."""
    records: list[dict] = []

    def absorb(raw: bytes) -> None:
        pos = 0
        while pos < len(raw):
            rec, pos = _parse_record(raw, pos)
            out = {
                "type": rec["type"],
                "uri": rec["uri"],
                "body_len": len(rec["body"]),
                "status": 0,
                "content_len": 0,
            }
            if rec["type"] == "response":
                out["status"] = _http_status(rec["body"])
                sep = rec["body"].find(b"\r\n\r\n")
                out["content_len"] = (
                    len(rec["body"]) - sep - 4 if sep >= 0 else 0
                )
            records.append(out)

    if payload[:2] == b"\x1f\x8b":  # .warc.gz: one member per record
        rest = payload
        while rest:
            if rest[:2] != b"\x1f\x8b":
                raise ValueError("garbage between WARC gzip members")
            d = zlib.decompressobj(31)
            raw = d.decompress(rest)
            if not d.eof:
                raise ValueError("truncated WARC gzip member")
            absorb(raw)
            rest = d.unused_data
    else:
        absorb(payload)
    if not records:
        raise ValueError("empty WARC file")
    return records


WARC_DOCS = 48
_WARC_SCHEMA = (
    "doc_id long, gzipped int, n_records int, n_responses int,"
    " n_ok long, total_body long, total_content long"
)


@register(
    "source_warc_records",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, doc_id % 2 AS gz, doc_id % 5 + 3 AS nresp
            FROM documents WHERE doc_id < {WARC_DOCS}
        ),
        resp AS (
            SELECT doc_id, gz, nresp, i,
                   CASE (doc_id + i) % 3 WHEN 0 THEN 200
                        WHEN 1 THEN 404 ELSE 301 END AS status,
                   50 + 13 * ((doc_id * 7 + i) % 40) AS clen
            FROM (SELECT doc_id, gz, nresp, unnest(range(0, nresp)) AS i
                  FROM d)
        )
        SELECT doc_id,
               CAST(gz AS INT) AS gzipped,
               -- warcinfo + (request + response) per page + metadata
               CAST(1 + 2 * nresp + 1 AS INT) AS n_records,
               CAST(nresp AS INT) AS n_responses,
               CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ok,
               -- response body = status line (17) + Content-Length
               -- header (32, 14-digit padded) + blank CRLF (2) + body
               CAST(sum(51 + clen) AS BIGINT) AS total_body,
               CAST(sum(clen) AS BIGINT) AS total_content
        FROM resp
        GROUP BY doc_id, gz, nresp
        ORDER BY doc_id
    """,
    tags=("source", "warc", "crawl", "llm-pipeline"),
)
def source_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive ingestion (round 10) — the container
    pre-training corpora actually arrive in: per document a
    synthetic WARC/1.0 file with a warcinfo record, doc%5+3
    request/response pairs (HTTP payloads with status codes cycling
    200/404/301 and deterministic body lengths), and a metadata
    record; ODD docs use the splittable .warc.gz layout (one gzip
    member per record, walked via zlib unused_data). The reader
    recovers record counts by type, HTTP status tallies (the
    200-only filter every crawl pipeline starts with), and
    body/content byte totals.

    The oracle recomputes every total from the fixture's closed
    forms — a Content-Length, member-boundary, CRLF-framing, or
    status-parse bug flips the hash.

    Scale posture: two narrow Arrow `mapInPandas` stages, zero
    shuffles; per-record gzip members are what make real .warc.gz
    splittable across executors."""

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < WARC_DOCS)
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
                nresp = d % 5 + 3
                recs = [
                    {
                        "type": "warcinfo",
                        "payload": b"software: spark_hive_spark\r\n",
                    }
                ]
                for i in range(nresp):
                    status = [200, 404, 301][(d + i) % 3]
                    clen = 50 + 13 * ((d * 7 + i) % 40)
                    content = bytes(
                        (d + i + k) % 256 for k in range(clen)
                    )
                    url = f"http://example.com/{d}/{i}"
                    recs.append(
                        {
                            "type": "request",
                            "uri": url,
                            "payload": (
                                f"GET /{d}/{i} HTTP/1.1\r\n"
                                "Host: example.com\r\n\r\n"
                            ).encode(),
                        }
                    )
                    reason = {200: "OK", 404: "NF", 301: "MP"}[status]
                    http = (
                        f"HTTP/1.1 {status} {reason}\r\n".encode()
                        + f"Content-Length: {clen:014d}\r\n".encode()
                        + b"\r\n"
                        + content
                    )
                    recs.append(
                        {"type": "response", "uri": url, "payload": http}
                    )
                recs.append(
                    {"type": "metadata", "payload": b"fetch: complete\r\n"}
                )
                payloads.append(
                    encode_warc(recs, gzip_per_record=bool(d % 2))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    media = docs.mapInPandas(encode_batches, "doc_id long, payload binary")

    def decode_batches(
        batches: Iterator["pd.DataFrame"],
    ) -> Iterator["pd.DataFrame"]:
        cols = (
            "doc_id gzipped n_records n_responses n_ok total_body"
            " total_content"
        ).split()
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                recs = parse_warc(bytes(p))
                resp = [r for r in recs if r["type"] == "response"]
                vals = (
                    int(d), int(d) % 2, len(recs), len(resp),
                    sum(1 for r in resp if r["status"] == 200),
                    sum(r["body_len"] for r in resp),
                    sum(r["content_len"] for r in resp),
                )
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, _WARC_SCHEMA).orderBy("doc_id")
