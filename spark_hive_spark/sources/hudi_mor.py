"""Apache Hudi MERGE-ON-READ snapshot read — the write-optimized half
of the Hudi story (`source_hudi_timeline_replay` covers copy-on-write).

MOR is Hudi's answer to high-frequency upserts at lake scale: instead
of rewriting a whole base parquet file per upsert batch (COW), each
file group accumulates row-level changes in an append-only LOG FILE,
and a snapshot reader merges base + log at query time. Read WITHOUT
the Hudi library from the public on-disk contract
(hudi.apache.org/tech-specs, "Log File Format"):

- **Log file naming**: ``.{fileId}_{baseInstant}.log.{version}_{token}``
  (dot-prefixed, one per file slice).
- **Log block framing** (format v1): per block
  ``#HUDI#`` magic | block length (8 BE, bytes after this field) |
  format version (4 BE) | block type (4 BE) | header length (8 BE) |
  header | content length (8 BE) | content | footer length (8 BE) |
  footer | total block length (8 BE, whole block incl. magic — the
  field reverse readers seek by). Header/footer are maps of
  ``n (4 BE) { metadataType (4 BE), len (4 BE), utf8 }`` with
  INSTANT_TIME=0, TARGET_INSTANT_TIME=1, SCHEMA=2, COMMAND_TYPE=3.
- **Block types**: 1 = DELETE_BLOCK, 3 = AVRO_DATA_BLOCK,
  0 = COMMAND_BLOCK (COMMAND_TYPE 0 = ROLLBACK_PREVIOUS_BLOCK:
  invalidates earlier blocks of the TARGET_INSTANT_TIME — the trace
  of a rolled-back failed deltacommit), 5 = PARQUET_DATA_BLOCK
  (round 17), 4 = HFILE_DATA_BLOCK (round 18 — the metadata table's
  block type, content is a complete HFile image, sources/hfile.py;
  the order-change data-log readers refuse it since data logs are
  never HFile). Other command types and 2 corrupt stay loud
  NotImplementedError seams.
- **Avro data block content**: version (4 BE) | record count (4 BE) |
  per record: size (4 BE) + Avro-binary record bytes (schema in the
  SCHEMA header entry; decoded by the repo's own Avro codec,
  operators/avro.py).
- **Delete block content**: version (4 BE) | tombstone byte-length
  (4 BE) | an Avro array of ``{recordKey: string}`` records
  (HoodieKey record keys are strings; the reader casts).

The semantics a snapshot reader MUST get right (and the fixture
traps): log blocks carry their writer's INSTANT_TIME in the header,
and only blocks whose instant is COMPLETED on the timeline are
visible — an appended-but-uncommitted block (writer crash shape)
sits in the same file after committed blocks and must be skipped.
Merge order is per record key by instant time, last writer wins,
tombstones drop the row.

Reference parity: the reference has no lakehouse surface
(CollegeScorecard.scala:35-157); north-star item per SURVEY.md §2B's
source/compat family.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.operators.avro import _dec_field, _enc_field
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.sources.staging import (
    stage_many_parquet,
    stage_single_parquet,
)
from spark_hive_spark.tables import t

_MAGIC = b"#HUDI#"
_FMT_VERSION = 1
# HoodieLogBlockType ordinals (tech-specs block type table)
_CMD_BLOCK, _DELETE_BLOCK, _CORRUPT_BLOCK, _AVRO_BLOCK = 0, 1, 2, 3
_HFILE_BLOCK, _PARQUET_BLOCK = 4, 5
# HeaderMetadataType ordinals
_H_INSTANT, _H_TARGET_INSTANT, _H_SCHEMA, _H_COMMAND = 0, 1, 2, 3

_LOG_SCHEMA = {
    "type": "record",
    "name": "order_change",
    "fields": [
        {"name": "o_orderkey", "type": "long"},
        {"name": "o_totalprice", "type": "double"},
    ],
}
_DELETE_SCHEMA = {"type": "array", "items": "string"}


# ---------------------------------------------------------------------------
# log block codec
# ---------------------------------------------------------------------------

def _enc_header(entries: dict[int, str]) -> bytes:
    out = struct.pack(">i", len(entries))
    for mtype, val in sorted(entries.items()):
        raw = val.encode()
        out += struct.pack(">ii", mtype, len(raw)) + raw
    return out


def _dec_header(buf: bytes) -> dict[int, str]:
    (n,) = struct.unpack_from(">i", buf, 0)
    pos, out = 4, {}
    for _ in range(n):
        mtype, ln = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out[mtype] = buf[pos : pos + ln].decode()
        pos += ln
    if pos != len(buf):
        raise ValueError("log block header map has trailing bytes")
    return out


def encode_log_block(
    block_type: int, header: dict[int, str], content: bytes
) -> bytes:
    """One HoodieLogFormat v1 block, framed exactly as parsed back by
    ``walk_log_blocks`` (field list from hudi tech-specs)."""
    hdr = _enc_header(header)
    body = (
        struct.pack(">ii", _FMT_VERSION, block_type)
        + struct.pack(">q", len(hdr)) + hdr
        + struct.pack(">q", len(content)) + content
        + struct.pack(">q", 0)  # footer: empty map not even written
    )
    total = len(_MAGIC) + 8 + len(body) + 8
    body += struct.pack(">q", total)
    return _MAGIC + struct.pack(">q", len(body)) + body


def walk_log_blocks(data: bytes) -> list[dict]:
    """Parse every block in a log file -> [{type, header, content}].
    Validates magic, the forward length, and the trailing
    total-block-length back-pointer (the reverse-traversal field)."""
    pos, out = 0, []
    while pos < len(data):
        if data[pos : pos + 6] != _MAGIC:
            raise ValueError(f"bad log block magic at {pos}")
        (blen,) = struct.unpack_from(">q", data, pos + 6)
        start, end = pos + 14, pos + 14 + blen
        if end > len(data):
            raise ValueError("log block overruns file")
        version, btype = struct.unpack_from(">ii", data, start)
        if version != _FMT_VERSION:
            raise NotImplementedError(f"log format version {version}")
        p = start + 8
        (hlen,) = struct.unpack_from(">q", data, p)
        header = _dec_header(data[p + 8 : p + 8 + hlen])
        p += 8 + hlen
        (clen,) = struct.unpack_from(">q", data, p)
        content = data[p + 8 : p + 8 + clen]
        p += 8 + clen
        (flen,) = struct.unpack_from(">q", data, p)
        p += 8 + flen
        (total,) = struct.unpack_from(">q", data, p)
        if total != end - pos or p + 8 != end:
            raise ValueError("log block total-length back-pointer wrong")
        out.append({"type": btype, "header": header, "content": content})
        pos = end
    return out


def _enc_avro_content(records: list[dict]) -> bytes:
    # bytearray, not bytes += — immutable concatenation is quadratic
    # in the record count (visible from ~100k records per block)
    out = bytearray(struct.pack(">ii", 1, len(records)))
    for rec in records:
        raw = b"".join(
            _enc_field(rec[f["name"]], f["type"])
            for f in _LOG_SCHEMA["fields"]
        )
        out += struct.pack(">i", len(raw)) + raw
    return bytes(out)


def _dec_avro_content(content: bytes, schema: dict) -> list[dict]:
    version, count = struct.unpack_from(">ii", content, 0)
    if version != 1:
        raise NotImplementedError(f"avro data block version {version}")
    pos, out = 8, []
    for _ in range(count):
        (size,) = struct.unpack_from(">i", content, pos)
        raw, pos = content[pos + 4 : pos + 4 + size], pos + 4 + size
        rec, p = {}, 0
        for f in schema["fields"]:
            rec[f["name"]], p = _dec_field(raw, p, f["type"])
        if p != size:
            raise ValueError("avro record has trailing bytes")
        out.append(rec)
    if pos != len(content):
        raise ValueError("avro data block has trailing bytes")
    return out


def parse_log_name(fname: str) -> tuple[str, str, int]:
    """``.{fileId}_{baseInstant}.log.{version}_{writeToken}`` ->
    (file id, base instant, version). A file slice can span several
    log files (``.log.1``, ``.log.2``, ...); version order IS the
    block-stream order a reader must merge in."""
    if not fname.startswith(".") or ".log." not in fname:
        raise ValueError(f"not a hudi log file name: {fname!r}")
    stem, rest = fname[1:].split(".log.", 1)
    file_id, base_instant = stem.rsplit("_", 1)
    version = int(rest.split("_", 1)[0])
    return file_id, base_instant, version


def apply_command_blocks(blocks: list[dict]) -> tuple[list[dict], int]:
    """Process COMMAND blocks over one file group's ordered block
    stream -> (surviving data/delete blocks, #blocks rolled back).

    Per the Hudi log reader contract, a COMMAND block with
    COMMAND_TYPE 0 (ROLLBACK_PREVIOUS_BLOCK) invalidates every
    EARLIER block in the stream whose INSTANT_TIME equals the
    command's TARGET_INSTANT_TIME — the on-disk trace of a failed
    deltacommit that was rolled back without rewriting the log
    (appends are immutable; the tombstone-the-instant command is how
    Hudi 'deletes' them). Command blocks themselves never carry
    data. Other command types stay loud."""
    out: list[dict] = []
    rolled = 0
    for blk in blocks:
        if blk["type"] != _CMD_BLOCK:
            out.append(blk)
            continue
        cmd = blk["header"].get(_H_COMMAND, "")
        if cmd != "0":  # ROLLBACK_PREVIOUS_BLOCK ordinal
            raise NotImplementedError(f"hudi command block type {cmd!r}")
        target = blk["header"][_H_TARGET_INSTANT]
        before = len(out)
        out = [b for b in out if b["header"].get(_H_INSTANT) != target]
        rolled += before - len(out)
    return out, rolled


def _enc_delete_content(keys: list[str]) -> bytes:
    raw = _enc_field(keys, {"type": "array", "items": "string"})
    return struct.pack(">ii", 1, len(raw)) + raw


def _dec_delete_content(content: bytes) -> list[str]:
    version, ln = struct.unpack_from(">ii", content, 0)
    if version != 1:
        raise NotImplementedError(f"delete block version {version}")
    keys, pos = _dec_field(
        content[8 : 8 + ln], 0, {"type": "array", "items": "string"}
    )
    if pos != ln:
        raise ValueError("delete block tombstone array has trailing bytes")
    if 8 + ln != len(content):
        raise ValueError("delete block content has trailing bytes")
    return keys


# ---------------------------------------------------------------------------
# the registered query
# ---------------------------------------------------------------------------

@register(
    "source_hudi_mor_snapshot",
    oracle=f"""
        SELECT CAST(o_orderkey % 10 AS INT) AS key_mod,
               CAST(3 AS INT) AS blocks_applied,
               CAST(1 AS INT) AS blocks_skipped,
               CAST(1 AS INT) AS blocks_rolled_back,
               count(*) AS n_orders,
               {sql_dsum(
                   "o_totalprice"
                   " + CASE WHEN o_orderkey % 10 = 6 THEN 100.00 ELSE 0 END"
                   " + CASE WHEN o_orderkey % 10 = 8 THEN 50.00 ELSE 0 END"
               )} AS revenue
        FROM orders
        WHERE o_orderkey % 10 <> 3
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("source", "hudi", "merge-on-read", "lakehouse", "compat"),
)
def source_hudi_mor_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi MERGE-ON-READ snapshot read (round 11, hardened round 12),
    hand-built from the public log-file contract — completes the
    lakehouse trio's write-optimized arm (Delta DVs and Iceberg
    deletes are the others).

    Fixture: two file groups (orders split by key parity) get base
    parquet at instant 001 (commit). Group A accumulates a MULTI-FILE
    log slice: ``.log.1`` holds deltacommit 002 (+100.00 on keys ≡ 6
    mod 10) plus a CRASHED writer's block (instant 004, +1000.00 on
    keys ≡ 0 — never completes, must be timeline-skipped), and
    ``.log.2`` holds deltacommit 005 (+50.00 on keys ≡ 8) — version
    order is the merge order. Group B's log holds deltacommit 003
    (DELETE block tombstoning keys ≡ 3), then a FAILED deltacommit
    006's data block (+999.00 on keys ≡ 5), then rollback 007's
    COMMAND block (COMMAND_TYPE 0, TARGET_INSTANT 006) that
    invalidates it — the reader must drop 006's block via the command
    (`blocks_rolled_back` = 1), NOT merely via the timeline
    (`blocks_skipped` = 1 counts only the 004 crash appendix).

    Log parsing runs as ONE TASK PER FILE GROUP (mapInPandas over the
    slice plan — the docstring's own 100 TB posture, executed): each
    task walks its group's log files in version order, applies
    command-block rollbacks, timeline-filters, decodes avro/delete
    content, and emits change rows plus one per-group counter row.
    Merge is Spark-side: base rows tag instant '001', log
    upserts/tombstones their block's instant, one union + per-key
    row_number window (ordered by instant desc) keeps the last writer
    and drops tombstones — the same single shuffle-by-record-key a
    distributed MOR merge costs.

    Oracle recomputes the merged aggregate from the raw table: stale
    base (missing +100s/+50s), a served crash block (+1000s), a
    survived rolled-back block (+999s), undeleted tombstones, or
    mis-ordered log versions each flip the hash.
    """
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    root = os.path.join(scratch_root(), f"shs_hudi_mor_{uuid.uuid4().hex}")
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)

    def _write_base(file_id: str, instant: str, df: DataFrame) -> str:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        stage_single_parquet(df, root, tdir, name)
        return name

    t1, t2, t3, t4 = "001", "002", "003", "004"
    t5, t6, t7 = "005", "006", "007"
    par = F.col("o_orderkey") % 2
    _write_base("fg-A", t1, orders.filter(par == 0))
    _write_base("fg-B", t1, orders.filter(par == 1))

    # one Arrow pass pulls every change set the writer needs (the
    # collect is fixture construction, not the read path under test)
    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(0, 3, 5, 6, 8))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _upserts(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    # deltacommit 002: +100.00 on keys ≡ 6 (mod 10) — even, group A
    # (exact +100: 2dp-representable, oracle adds the same literal)
    upserts_002 = _upserts(6, 100.0)
    # deltacommit 003: tombstone keys ≡ 3 (mod 10) — odd, group B
    del_keys_003 = [str(int(k)) for k in changes[mod == 3]["o_orderkey"]]
    # crashed 004: +1000.00 on keys ≡ 0 — must stay timeline-invisible
    upserts_004 = _upserts(0, 1000.0)
    # deltacommit 005 (in .log.2): +50.00 on keys ≡ 8 — even, group A
    upserts_005 = _upserts(8, 50.0)
    # failed deltacommit 006, rolled back by command block 007:
    # +999.00 on keys ≡ 5 — odd, group B; must stay invisible
    upserts_006 = _upserts(5, 999.0)

    log_a1 = os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0")
    log_a2 = os.path.join(tdir, f".fg-A_{t1}.log.2_0-1-0")
    log_b1 = os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0")
    with open(log_a1, "wb") as fh:
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(upserts_002),
        ))
        fh.write(encode_log_block(  # the crash appendix
            _AVRO_BLOCK,
            {_H_INSTANT: t4, _H_SCHEMA: schema_json},
            _enc_avro_content(upserts_004),
        ))
    with open(log_a2, "wb") as fh:  # the slice's second log file
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t5, _H_SCHEMA: schema_json},
            _enc_avro_content(upserts_005),
        ))
    with open(log_b1, "wb") as fh:
        fh.write(encode_log_block(
            _DELETE_BLOCK, {_H_INSTANT: t3},
            _enc_delete_content(del_keys_003),
        ))
        fh.write(encode_log_block(  # failed 006's data block...
            _AVRO_BLOCK,
            {_H_INSTANT: t6, _H_SCHEMA: schema_json},
            _enc_avro_content(upserts_006),
        ))
        fh.write(encode_log_block(  # ...rolled back by command 007
            _CMD_BLOCK,
            {_H_INSTANT: t7, _H_TARGET_INSTANT: t6, _H_COMMAND: "0"},
            b"",
        ))

    # timeline: 001 commit, 002/003/005 deltacommit completed,
    # 004 inflight (crash), 006 failed then rolled back by 007
    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight", f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.deltacommit.requested", f"{t4}.deltacommit.inflight",
        f"{t5}.deltacommit.requested", f"{t5}.deltacommit.inflight",
        f"{t5}.deltacommit",
        f"{t6}.deltacommit.requested", f"{t6}.deltacommit.inflight",
        f"{t7}.rollback.requested", f"{t7}.rollback.inflight",
        f"{t7}.rollback",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the reader ----
    completed: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        # only data-bearing completed instants gate visibility
        if len(parts) == 2 and parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])

    base_paths: list[str] = []
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed:
                base_paths.append(os.path.join(tdir, f))
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    # one task per file group: walk its logs in version order
    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    completed_b = sorted(completed)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "is_delete", "applied", "skipped", "rolled",
                "is_meta"]
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, rolled = apply_command_blocks(stream)
                rows = []
                applied = skipped = 0
                seq = 0  # block/record scan order: later wins ties
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        skipped += 1
                        continue
                    applied += 1
                    if blk["type"] == _AVRO_BLOCK:
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"], schema):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, 0, 0, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        for key in _dec_delete_content(blk["content"]):
                            seq += 1
                            rows.append((int(key), 0.0, instant, seq,
                                         True, 0, 0, 0, False))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                rows.append((None, 0.0, "", 0, False,
                             applied, skipped, rolled, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, is_delete boolean, applied int, skipped int,"
        " rolled int, is_meta boolean",
    ).localCheckpoint(eager=True)  # split meta/data without re-parsing

    counters = parsed.filter("is_meta").agg(
        F.sum("applied").cast("int").alias("blocks_applied"),
        F.sum("skipped").cast("int").alias("blocks_skipped"),
        F.sum("rolled").cast("int").alias("blocks_rolled_back"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq", "is_delete"
    )
    base = (
        spark.read.parquet(*base_paths)
        .withColumn("instant", F.lit(t1))
        .withColumn("seq", F.lit(0))
        .withColumn("is_delete", F.lit(False))
    )
    # within-instant scan order breaks same-instant ties — see the
    # incremental sibling's window note (round-17 ADVICE)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    merged = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
    )
    out = (
        merged.groupBy((F.col("o_orderkey") % 10).cast("int").alias("key_mod"))
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "key_mod", "blocks_applied", "blocks_skipped",
            "blocks_rolled_back", "n_orders", "revenue",
        )
        .orderBy("key_mod")
        .localCheckpoint(eager=True)  # 10 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_mor_compaction",
    oracle=f"""
        SELECT CAST(o_orderkey % 10 AS INT) AS key_mod,
               count(*) AS n_orders,
               {sql_dsum(
                   "o_totalprice"
                   " + CASE WHEN o_orderkey % 10 = 6 THEN 100.00 ELSE 0 END"
                   " + CASE WHEN o_orderkey % 10 = 8 THEN 50.00 ELSE 0 END"
                   " + CASE WHEN o_orderkey % 10 = 4 THEN 25.00 ELSE 0 END"
               )} AS revenue,
               CAST(1 AS INT) AS compactions_completed,
               CAST(1 AS INT) AS stale_bases_ignored,
               CAST(1 AS INT) AS superseded_logs,
               TRUE AS compaction_consistent
        FROM orders
        WHERE o_orderkey % 10 <> 3
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("source", "hudi", "merge-on-read", "lakehouse", "compat",
          "compaction"),
)
def source_hudi_mor_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi MOR COMPACTION (round 13, the r12 verdict's seam 4 —
    'real MOR tables compact'): compaction is the table service that
    merges a file slice's base + accumulated log files into a NEW
    base file at the compaction instant, starting a fresh slice. On
    the timeline it is scheduled as ``{ts}.compaction.requested`` /
    ``.inflight`` but COMPLETES as ``{ts}.commit`` — a reader that
    only knows commit/deltacommit/rollback refuses the table; one
    that ignores slice boundaries double-applies the compacted log
    blocks or serves the stale base.

    Fixture: group A gets base 001 + log slice 001 (deltacommits 002
    +100.00 on keys ≡ 6, 003 +50.00 on keys ≡ 8), then compaction
    005 writes the merged base ``fg-A_..._005.parquet`` and a
    POST-compaction deltacommit 006 (+25.00 on keys ≡ 4) lands in
    the NEW slice's log ``.fg-A_005.log.1``. Group B (base 001 +
    delete of keys ≡ 3 at deltacommit 004) is NOT compacted —
    compaction is per file group. Nothing is cleaned: the stale base
    and the superseded slice-001 log remain on disk and must be
    ignored via slice resolution (log baseInstant == chosen base
    instant), not via luck.

    ``compaction_consistent`` pins the service's CONTRACT engine-side:
    group A merged from the compacted base 005 + new-slice logs is
    row-for-row aggregate-identical to the full pre-compaction replay
    (base 001 + slice-001 blocks + new-slice blocks) — the audit
    deliberately runs both paths, like every *_audit query here.

    Scale posture: timeline + slice resolution stay O(#instants +
    #files) driver-side planning metadata; log parsing is one task
    per file group; both merges are the same single
    shuffle-by-record-key the MOR snapshot costs."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_cpt_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)
    schema_json = json.dumps(_LOG_SCHEMA)

    def _write_base(file_id: str, instant: str, df: DataFrame) -> str:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        stage_single_parquet(df, root, tdir, name)
        return name

    t1, t2, t3, t4, t5, t6 = "001", "002", "003", "004", "005", "006"
    par = F.col("o_orderkey") % 2
    evens = orders.filter(par == 0)
    _write_base("fg-A", t1, evens)
    _write_base("fg-B", t1, orders.filter(par == 1))

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(3, 4, 6, 8))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _upserts(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    with open(os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _AVRO_BLOCK, {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 100.0)),
        ))
        fh.write(encode_log_block(
            _AVRO_BLOCK, {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(8, 50.0)),
        ))
    with open(os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _DELETE_BLOCK, {_H_INSTANT: t4},
            _enc_delete_content(
                [str(int(k)) for k in changes[mod == 3]["o_orderkey"]]
            ),
        ))

    # compaction 005: the merged base for group A (001 + 002 + 003)
    km = F.col("o_orderkey") % 10
    compacted = evens.withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,2)")
         + F.when(km == 6, 100).when(km == 8, 50).otherwise(0)
         .cast("decimal(18,2)")).cast("double"),
    )
    _write_base("fg-A", t5, compacted)
    # post-compaction deltacommit 006 opens the NEW slice's log
    with open(os.path.join(tdir, f".fg-A_{t5}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _AVRO_BLOCK, {_H_INSTANT: t6, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(4, 25.0)),
        ))

    # timeline: compaction completes as {ts}.commit
    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.deltacommit.requested", f"{t4}.deltacommit.inflight",
        f"{t4}.deltacommit",
        f"{t5}.compaction.requested", f"{t5}.compaction.inflight",
        f"{t5}.commit",
        f"{t6}.deltacommit.requested", f"{t6}.deltacommit.inflight",
        f"{t6}.deltacommit",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the reader ----
    completed: set[str] = set()
    compaction_scheduled: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        action = parts[1]
        if action not in ("commit", "deltacommit", "rollback",
                          "compaction"):
            raise NotImplementedError(f"Hudi action {action!r}")
        if action == "compaction":
            if parts[-1] == "requested":
                compaction_scheduled.add(parts[0])
            continue  # scheduled/inflight service states don't gate
        if len(parts) == 2 and action in ("commit", "deltacommit"):
            completed.add(parts[0])
    compactions_completed = sorted(compaction_scheduled & completed)

    # fileId -> sorted completed base instants (last = the served one;
    # earlier entries are the stale bases slice resolution ignores)
    base_instants: dict[str, list[str]] = {}
    logs: dict[tuple[str, str], list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            file_id, _tok, tail = f.rsplit("_", 2)
            instant = tail[: -len(".parquet")]
            if instant not in completed:
                continue
            base_instants.setdefault(file_id, []).append(instant)
        elif f.startswith(".") and ".log." in f:
            file_id, base_instant, version = parse_log_name(f)
            logs.setdefault((file_id, base_instant), []).append(
                (version, os.path.join(tdir, f))
            )
    for insts in base_instants.values():
        insts.sort()
    bases = {
        fid: (insts[-1], f"{fid}_0-1-0_{insts[-1]}.parquet")
        for fid, insts in base_instants.items()
    }
    stale_bases = sum(len(v) - 1 for v in base_instants.values())
    superseded_logs = sum(
        len(v) for (fid, bi), v in logs.items()
        if fid in bases and bi != bases[fid][0]
    )

    # one task per (file group, slice): parse blocks, tag the slice
    plan_rows = [
        (fid, bi, json.dumps([p for _, p in sorted(paths)]))
        for (fid, bi), paths in sorted(logs.items())
    ]
    plan = spark.createDataFrame(
        plan_rows, "file_id string, base_instant string, logs string"
    ).repartition(len(plan_rows))
    completed_b = sorted(completed)

    def _read_slice_logs(batches):
        import pandas as pd

        done = set(completed_b)
        cols = ["file_id", "base_instant", "o_orderkey",
                "o_totalprice", "instant", "is_delete"]
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _rolled = apply_command_blocks(stream)
                rows = []
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        continue
                    if blk["type"] == _AVRO_BLOCK:
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"],
                                                   schema):
                            rows.append((rec.file_id, rec.base_instant,
                                         r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        for key in _dec_delete_content(blk["content"]):
                            rows.append((rec.file_id, rec.base_instant,
                                         int(key), 0.0, instant, True))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_slice_logs,
        "file_id string, base_instant string, o_orderkey long,"
        " o_totalprice double, instant string, is_delete boolean",
    ).localCheckpoint(eager=True)  # consumed by main merge AND audit

    def _merge(base_df: DataFrame, log_df: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("instant").desc()
        )
        return (
            base_df.unionByName(log_df)
            .withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & ~F.col("is_delete"))
            .select("o_orderkey", "o_totalprice")
        )

    def _base_df(file_id: str, instant: str) -> DataFrame:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        return (
            spark.read.parquet(os.path.join(tdir, name))
            .withColumn("instant", F.lit(instant))
            .withColumn("is_delete", F.lit(False))
        )

    log_cols = ("o_orderkey", "o_totalprice", "instant", "is_delete")
    # main read: per group, the LATEST completed base + ITS slice logs
    base_union = None
    for fid, (bi, _name) in sorted(bases.items()):
        df = _base_df(fid, bi)
        base_union = df if base_union is None else base_union.unionByName(df)
    current_logs = None
    for fid, (bi, _name) in sorted(bases.items()):
        df = parsed.filter(
            (F.col("file_id") == fid) & (F.col("base_instant") == bi)
        ).select(*log_cols)
        current_logs = df if current_logs is None \
            else current_logs.unionByName(df)
    merged = _merge(base_union, current_logs)

    # the compaction contract audit: group A replayed WITHOUT the
    # compacted base (001 + slice-001 blocks + new-slice blocks)
    # must equal group A served FROM it (005 + new-slice blocks)
    fid_a = compactions_completed and sorted(
        fid for fid, (bi, _n) in bases.items()
        if bi in compactions_completed
    )
    consistent = bool(fid_a)
    if fid_a:
        fid = fid_a[0]
        bi = bases[fid][0]
        via_compacted = _merge(
            _base_df(fid, bi),
            parsed.filter(
                (F.col("file_id") == fid)
                & (F.col("base_instant") == bi)
            ).select(*log_cols),
        )
        # the pre-compaction base = the newest STALE base on disk
        old_bi = base_instants[fid][-2]
        replayed = _merge(
            _base_df(fid, old_bi),
            parsed.filter(F.col("file_id") == fid).select(*log_cols),
        )

        def _sig(df: DataFrame) -> tuple:
            row = df.agg(
                F.count("*").alias("n"),
                F.sum(
                    F.col("o_totalprice").cast("decimal(18,2)")
                ).alias("cents"),
                F.sum("o_orderkey").alias("keys"),
            ).collect()[0]
            return (row["n"], row["cents"], row["keys"])

        consistent = _sig(via_compacted) == _sig(replayed)

    out = (
        merged.groupBy(
            (F.col("o_orderkey") % 10).cast("int").alias("key_mod")
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            F.lit(len(compactions_completed)).cast("int")
            .alias("compactions_completed"),
            F.lit(stale_bases).cast("int").alias("stale_bases_ignored"),
            F.lit(superseded_logs).cast("int").alias("superseded_logs"),
            F.lit(bool(consistent)).alias("compaction_consistent"),
        )
        .orderBy("key_mod")
        .localCheckpoint(eager=True)  # 10 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_clean_replay",
    oracle=f"""
        SELECT CAST(o_orderkey % 10 AS INT) AS key_mod,
               count(*) AS n_orders,
               {sql_dsum(
                   "o_totalprice"
                   " + CASE WHEN o_orderkey % 10 = 6 THEN 100.00 ELSE 0 END"
               )} AS revenue,
               CAST(1 AS INT) AS cleans_completed,
               CAST(1 AS INT) AS cleans_pending,
               CAST(1 AS INT) AS files_cleaned,
               TRUE AS clean_safety_ok
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("source", "hudi", "lakehouse", "compat", "table-service",
          "clean"),
)
def source_hudi_clean_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi CLEAN instants (round 13) — the second table service
    after compaction (`source_hudi_mor_compaction`): cleaning
    physically deletes file slices older than the retention horizon,
    recording what it removed in the completed ``{ts}.clean``
    metadata. Two things a reader must get right: (a) the timeline
    actions ``clean.requested`` / ``clean.inflight`` / ``clean`` are
    KNOWN non-data instants (a reader that only knows commit-family
    actions refuses every production table, since cleaning runs
    continuously), and (b) visibility is unchanged — the latest file
    slices must be served exactly as before the clean, with the
    removed stale base genuinely gone from disk.

    Fixture: group A gets base 001 then an upsert rewrite at commit
    002 (+100.00 on keys ≡ 6); group B keeps its 001 base. Clean 003
    completes, deleting A's stale 001 base and recording it in
    HoodieCleanMetadata-shaped JSON (partitionMetadata →
    successDeleteFiles); clean 004 is left INFLIGHT (scheduled,
    nothing deleted — the steady-state shape on a busy table).
    ``clean_safety_ok`` pins the service's safety contract
    engine-side: every successDeleteFiles entry is (1) actually
    absent from disk and (2) NOT a file the current slice resolution
    serves — a clean that deleted a live file is data loss and must
    flip the driver row, not pass silently.

    Scale posture: clean replay is O(#instants) driver-side metadata;
    the data read is the same latest-base-per-group resolution as the
    COW reader."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_cln_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    def _write_base(file_id: str, instant: str, df: DataFrame) -> str:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        stage_single_parquet(df, root, tdir, name)
        return name

    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    evens = orders.filter(par == 0)
    a1 = _write_base("fg-A", t1, evens)
    _write_base("fg-B", t1, orders.filter(par == 1))
    km = F.col("o_orderkey") % 10
    _write_base("fg-A", t2, evens.withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,2)")
         + F.when(km == 6, 100).otherwise(0).cast("decimal(18,2)")
         ).cast("double"),
    ))

    # clean 003 executes: A's stale 001 base is deleted and recorded
    os.remove(os.path.join(tdir, a1))
    clean_meta = {
        "startCleanTime": t3,
        "partitionMetadata": {
            "": {"deletePathPatterns": [a1],
                 "successDeleteFiles": [a1],
                 "failedDeleteFiles": []}
        },
        "totalFilesDeleted": 1,
    }
    for name, body in (
        (f"{t1}.commit.requested", "{}"),
        (f"{t1}.commit.inflight", "{}"),
        (f"{t1}.commit", "{}"),
        (f"{t2}.commit.requested", "{}"),
        (f"{t2}.commit.inflight", "{}"),
        (f"{t2}.commit", "{}"),
        (f"{t3}.clean.requested", "{}"),
        (f"{t3}.clean.inflight", "{}"),
        (f"{t3}.clean", json.dumps(clean_meta)),
        (f"{t4}.clean.requested", "{}"),  # scheduled, never ran
        (f"{t4}.clean.inflight", "{}"),
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write(body)

    # ---- the reader ----
    completed: set[str] = set()
    cleans_completed: list[dict] = []
    cleans_pending: set[str] = set()
    for f in sorted(os.listdir(hdir)):
        parts = f.split(".")
        instant, action = parts[0], parts[1]
        if action not in ("commit", "deltacommit", "rollback",
                          "compaction", "clean"):
            raise NotImplementedError(f"Hudi action {action!r}")
        if action == "clean":
            if len(parts) == 2:  # completed clean, carries metadata
                with open(os.path.join(hdir, f)) as fh:
                    cleans_completed.append(json.load(fh))
            else:
                cleans_pending.add(instant)
            continue
        if len(parts) == 2 and action in ("commit", "deltacommit"):
            completed.add(instant)
    n_pending = len(
        cleans_pending
        - {m["startCleanTime"] for m in cleans_completed}
    )

    bases: dict[str, tuple[str, str]] = {}
    for f in sorted(os.listdir(tdir)):
        if not f.endswith(".parquet"):
            continue
        file_id, _tok, tail = f.rsplit("_", 2)
        instant = tail[: -len(".parquet")]
        if instant not in completed:
            continue
        if file_id not in bases or instant > bases[file_id][0]:
            bases[file_id] = (instant, f)
    served = {name for _i, name in bases.values()}

    # the safety contract: cleaned files are gone AND not served
    files_cleaned = 0
    safety_ok = bool(cleans_completed)
    for m in cleans_completed:
        for pmeta in m["partitionMetadata"].values():
            for name in pmeta["successDeleteFiles"]:
                files_cleaned += 1
                safety_ok = safety_ok and not os.path.exists(
                    os.path.join(tdir, name)
                ) and name not in served

    scan = None
    for fid, (instant, name) in sorted(bases.items()):
        df = spark.read.parquet(os.path.join(tdir, name))
        scan = df if scan is None else scan.unionByName(df)
    out = (
        scan.groupBy(
            (F.col("o_orderkey") % 10).cast("int").alias("key_mod")
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            F.lit(len(cleans_completed)).cast("int")
            .alias("cleans_completed"),
            F.lit(n_pending).cast("int").alias("cleans_pending"),
            F.lit(files_cleaned).cast("int").alias("files_cleaned"),
            F.lit(bool(safety_ok)).alias("clean_safety_ok"),
        )
        .orderBy("key_mod")
        .localCheckpoint(eager=True)  # 10 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_mor_incremental",
    oracle=f"""
        SELECT CAST(2 AS INT) AS commits_in_range,
               CAST(4 AS INT) AS blocks_applied,
               CAST(1 AS INT) AS blocks_rolled_back,
               CAST(1 AS INT) AS blocks_out_of_range,
               CAST(sum(CASE WHEN o_orderkey % 10 IN (5, 6, 8)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_changed,
               CAST(sum(CASE WHEN o_orderkey % 10 = 3
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_deleted,
               {sql_dsum(
                   "CASE WHEN o_orderkey % 10 = 6"
                   " THEN o_totalprice + 150.00"
                   " WHEN o_orderkey % 10 = 8"
                   " THEN o_totalprice + 20.00"
                   " WHEN o_orderkey % 10 = 5"
                   " THEN o_totalprice + 50.00 END"
               )} AS changed_revenue
        FROM orders
    """,
    tags=("source", "hudi", "merge-on-read", "lakehouse",
          "incremental", "cdc"),
)
def source_hudi_mor_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi MERGE-ON-READ incremental query (round 16, the r15
    verdict's #2) — incremental pull over ``(begin, end]`` when the
    in-range changes live in LOG BLOCKS, not rewritten base files
    (the streaming-ingest default). `source_hudi_incremental` covers
    the COW shape; MOR adds the merge obligations the fixture traps
    one by one:

    - **Same-key collapse**: deltacommit 002 upserts keys ≡ 6
      (mod 10) to +100 and deltacommit 003 upserts the SAME keys to
      +150 — both in range. Reading "COW-style" (emitting every
      in-range block's records as changed rows) DOUBLE-COUNTS every
      such key: n_changed gains the key twice and changed_revenue
      gains both the +100 and the +150 value. Correct output is one
      row per key at its latest in-range state.
    - **In-range update then delete**: keys ≡ 3 are upserted at 002
      (+30) and tombstoned at 003 — they must NOT appear as changed
      (final in-range state is the tombstone; counted in
      ``n_deleted``), which only falls out of a real merge.
    - **Rollback**: failed deltacommit 004's block (+999 on keys
      ≡ 1) sits in the log INSIDE the range, invalidated by rollback
      005's command block — `apply_command_blocks` must drop it
      (``blocks_rolled_back``), not the timeline filter.
    - **End scoping**: completed deltacommit 006 (+77 on keys ≡ 7)
      is PAST ``end`` — its block is walked but excluded
      (``blocks_out_of_range``); a reader that only checks
      "completed" serves it.

    The merge is the same shape as `source_hudi_mor_snapshot`: one
    task per file group walks its logs in version order
    (command-block rollbacks first, then timeline + range
    filtering), and a single per-key row_number window over
    base ∪ log rows keeps the last writer ≤ end; rows whose winning
    instant is > begin are the incremental answer (tombstone winners
    are deletions).

    Scale posture: planning is O(#commits in range) timeline
    metadata; only file groups whose slices carry in-range log
    blocks are scanned, one task per group, and the merge costs the
    same single shuffle-by-record-key as the snapshot read. (With
    full-row log blocks the base scan is only needed to decide
    which keys' winners predate the range — real Hudi reads the
    merged slice exactly the same way.)"""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_morinc_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3, t4, t5, t6 = "001", "002", "003", "004", "005", "006"

    par = F.col("o_orderkey") % 2
    stage_many_parquet(
        [(orders.filter(par == half), f"{fid}_0-1-0_{t1}.parquet")
         for fid, half in (("fg-A", 0), ("fg-B", 1))],
        root, tdir,
    )

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(1, 3, 5, 6, 7, 8))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _upserts(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    log_a1 = os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0")
    log_a2 = os.path.join(tdir, f".fg-A_{t1}.log.2_0-1-0")
    log_b1 = os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0")
    with open(log_a1, "wb") as fh:
        fh.write(encode_log_block(  # 002: first write to keys ≡ 6
            _AVRO_BLOCK, {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 100.0)),
        ))
    with open(log_a2, "wb") as fh:
        fh.write(encode_log_block(  # 003 REWRITES keys ≡ 6, adds ≡ 8
            _AVRO_BLOCK, {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 150.0) + _upserts(8, 20.0)),
        ))
    with open(log_b1, "wb") as fh:
        fh.write(encode_log_block(  # 002: +50 on ≡ 5, +30 on ≡ 3
            _AVRO_BLOCK, {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(5, 50.0) + _upserts(3, 30.0)),
        ))
        fh.write(encode_log_block(  # 003 tombstones keys ≡ 3
            _DELETE_BLOCK, {_H_INSTANT: t3},
            _enc_delete_content(
                [str(int(k)) for k in changes[mod == 3]["o_orderkey"]]
            ),
        ))
        fh.write(encode_log_block(  # failed 004's data block...
            _AVRO_BLOCK, {_H_INSTANT: t4, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(1, 999.0)),
        ))
        fh.write(encode_log_block(  # ...rolled back by command 005
            _CMD_BLOCK,
            {_H_INSTANT: t5, _H_TARGET_INSTANT: t4, _H_COMMAND: "0"},
            b"",
        ))
        fh.write(encode_log_block(  # completed 006 — PAST end
            _AVRO_BLOCK, {_H_INSTANT: t6, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(7, 77.0)),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight", f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.deltacommit.requested", f"{t4}.deltacommit.inflight",
        f"{t5}.rollback.requested", f"{t5}.rollback.inflight",
        f"{t5}.rollback",
        f"{t6}.deltacommit.requested", f"{t6}.deltacommit.inflight",
        f"{t6}.deltacommit",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the reader: MOR incremental pull over (begin, end] ----
    begin, end = t1, t5
    completed: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) == 2 and parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])
    commits_in_range = sorted(
        ts for ts in completed if begin < ts <= end
    )

    base_paths: list[str] = []
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed:
                base_paths.append(os.path.join(tdir, f))
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    completed_b = sorted(completed)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "is_delete", "applied", "rolled", "out_of_range",
                "is_meta"]
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, rolled = apply_command_blocks(stream)
                rows = []
                applied = out_of_range = 0
                seq = 0  # block/record scan order: later wins ties
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        continue  # crash appendix (timeline skip)
                    if instant > end:
                        out_of_range += 1
                        continue
                    applied += 1
                    if blk["type"] == _AVRO_BLOCK:
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"],
                                                   schema):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, 0, 0, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        for key in _dec_delete_content(blk["content"]):
                            seq += 1
                            rows.append((int(key), 0.0, instant, seq,
                                         True, 0, 0, 0, False))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                rows.append((None, 0.0, "", 0, False,
                             applied, rolled, out_of_range, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, is_delete boolean, applied int, rolled int,"
        " out_of_range int, is_meta boolean",
    ).localCheckpoint(eager=True)  # split meta/data without re-parsing

    counters = parsed.filter("is_meta").agg(
        F.sum("applied").cast("int").alias("blocks_applied"),
        F.sum("rolled").cast("int").alias("blocks_rolled_back"),
        F.sum("out_of_range").cast("int").alias("blocks_out_of_range"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq", "is_delete"
    )
    base = (
        spark.read.parquet(*base_paths)
        .withColumn("instant", F.lit(t1))
        .withColumn("seq", F.lit(0))
        .withColumn("is_delete", F.lit(False))
    )
    # instant first, then within-instant block/record scan order —
    # two records for one key in the SAME deltacommit (two blocks,
    # or a duplicate inside one block) must resolve to the LATER
    # record in scan order, as the reference log scanner does; a
    # bare instant-desc window breaks that tie arbitrarily
    # (round-17 ADVICE)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    latest = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col("instant") > begin)  # winner inside the range
    )
    out = (
        latest.agg(
            F.lit(len(commits_in_range)).cast("int")
            .alias("commits_in_range"),
            F.sum((~F.col("is_delete")).cast("long")).cast("bigint")
            .alias("n_changed"),
            F.sum(F.col("is_delete").cast("long")).cast("bigint")
            .alias("n_deleted"),
            dsum(F.when(~F.col("is_delete"), F.col("o_totalprice")))
            .alias("changed_revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "commits_in_range", "blocks_applied", "blocks_rolled_back",
            "blocks_out_of_range", "n_changed", "n_deleted",
            "changed_revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_mor_time_travel",
    oracle=f"""
        SELECT '002' AS asof_instant,
               CAST(2 AS INT) AS commits_visible,
               CAST(1 AS INT) AS blocks_applied,
               CAST(3 AS INT) AS blocks_beyond_asof,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice
                   + CASE WHEN o_orderkey % 10 = 6
                          THEN 100.00 ELSE 0 END
                   AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "merge-on-read",
          "time-travel", "point-in-time", "compat"),
)
def source_hudi_mor_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi MOR POINT-IN-TIME (as-of instant) read (round 17) —
    completes the Hudi query-type triangle (snapshot
    `source_hudi_mor_snapshot`, incremental
    `source_hudi_mor_incremental`): "the table as it stood at
    instant t". Per the Hudi spec, time travel is TIMELINE
    truncation — only instants completed at or before t are
    visible — which for MOR means log blocks must be cut at the
    BLOCK level: a file group's log carries blocks from many
    deltacommits interleaved in the same physical files, and the
    reader keeps a block iff its INSTANT_TIME header is a completed
    instant <= t.

    The fixture puts the as-of instant BETWEEN TWO UPSERTS OF THE
    SAME KEYS — the case that separates time travel from snapshot:
    deltacommit 002 writes +100.00 on keys ≡ 6 (mod 10),
    deltacommit 003 re-upserts the SAME keys at +200.00, and the
    read is AS OF 002 — the merge must surface 002's values even
    though 003 is fully committed (a reader that filters only
    FILES, or only incomplete instants, serves 003 and flips the
    hash). Also beyond the as-of point: 003's DELETE block on group
    B (its tombstoned keys must still be VISIBLE at 002) and
    deltacommit 004 in a second log file (version-order truncation)
    — three blocks counted ``blocks_beyond_asof``, none applied.

    Merge is the module's standard single shuffle: union base rows
    (instant 001) with surviving log rows, one per-key row_number
    window over (instant desc, within-instant scan order desc).

    Scale posture: as-of filtering is a per-block header comparison
    inside the same one-task-per-file-group log walk the snapshot
    read pays; the timeline scan is O(instants) planning metadata.
    Nothing additional touches the data path."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_tt_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    stage_single_parquet(
        orders.filter(par == 0), root, tdir,
        f"fg-A_0-1-0_{t1}.parquet",
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir,
        f"fg-B_0-1-0_{t1}.parquet",
    )

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(3, 6, 8))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _upserts(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    log_a1 = os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0")
    log_a2 = os.path.join(tdir, f".fg-A_{t1}.log.2_0-1-0")
    log_b1 = os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0")
    with open(log_a1, "wb") as fh:
        fh.write(encode_log_block(  # the visible upsert
            _AVRO_BLOCK,
            {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 100.0)),
        ))
        fh.write(encode_log_block(  # SAME keys again, after as-of
            _AVRO_BLOCK,
            {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 200.0)),
        ))
    with open(log_a2, "wb") as fh:  # later log file, after as-of
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t4, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(8, 50.0)),
        ))
    with open(log_b1, "wb") as fh:  # delete after as-of: keys live
        fh.write(encode_log_block(
            _DELETE_BLOCK, {_H_INSTANT: t3},
            _enc_delete_content(
                [str(int(k)) for k in
                 changes[mod == 3]["o_orderkey"]]
            ),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.deltacommit.requested", f"{t4}.deltacommit.inflight",
        f"{t4}.deltacommit",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the reader: snapshot AS OF instant 002 ----
    asof = t2
    completed: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) == 2 and parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])
    visible = {i for i in completed if i <= asof}

    base_paths: list[str] = []
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in visible:  # base files cut at t too
                base_paths.append(os.path.join(tdir, f))
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    visible_b = sorted(visible)
    completed_b = sorted(completed)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "is_delete", "applied", "beyond", "is_meta"]
        vis = set(visible_b)
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _rolled = apply_command_blocks(stream)
                rows = []
                applied = beyond = 0
                seq = 0  # block/record scan order: later wins ties
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        continue  # crash appendix (timeline skip)
                    if instant not in vis:
                        beyond += 1  # completed but after as-of
                        continue
                    applied += 1
                    if blk["type"] == _AVRO_BLOCK:
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"],
                                                   schema):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, 0, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        for key in _dec_delete_content(blk["content"]):
                            seq += 1
                            rows.append((int(key), 0.0, instant, seq,
                                         True, 0, 0, False))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                rows.append((None, 0.0, "", 0, False,
                             applied, beyond, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, is_delete boolean, applied int, beyond int,"
        " is_meta boolean",
    ).localCheckpoint(eager=True)  # split meta/data without re-parsing

    counters = parsed.filter("is_meta").agg(
        F.sum("applied").cast("int").alias("blocks_applied"),
        F.sum("beyond").cast("int").alias("blocks_beyond_asof"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq", "is_delete"
    )
    base = (
        spark.read.parquet(*base_paths)
        .withColumn("instant", F.lit(t1))
        .withColumn("seq", F.lit(0))
        .withColumn("is_delete", F.lit(False))
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    merged = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
    )
    out = (
        merged.agg(
            F.lit(asof).alias("asof_instant"),
            F.lit(len(visible)).cast("int").alias("commits_visible"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "asof_instant", "commits_visible", "blocks_applied",
            "blocks_beyond_asof", "n_orders", "revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_clustering_replacecommit",
    oracle=f"""
        SELECT CAST(2 AS INT) AS groups_replaced,
               CAST(1 AS INT) AS groups_visible,
               TRUE AS inflight_replace_ignored,
               CAST(1 AS INT) AS blocks_applied,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice
                   + CASE WHEN o_orderkey % 10 = 6
                          THEN 100.00 ELSE 0 END
                   AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "clustering",
          "replacecommit", "merge-on-read", "compat"),
)
def source_hudi_clustering_replacecommit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi CLUSTERING via REPLACECOMMIT (round 17) — the fourth
    timeline action (after commit/deltacommit/rollback, which the
    other Hudi readers gate loudly): clustering and
    insert-overwrite write a ``replacecommit`` whose metadata
    carries ``partitionToReplaceFileIds`` — FILE GROUPS logically
    deleted even though their parquet files stay on disk until
    clean. The visibility rules a reader must get right, each
    trapped by the fixture:

    - a COMPLETED replacecommit (002: fg-A + fg-B clustered into
      fg-C) hides the replaced groups AND shows the new one — and
      because clustering preserves rows, a reader that serves the
      STALE groups is only caught once deltacommit 003 upserts
      +100.00 (keys ≡ 6 mod 10) into fg-C's LOG: the stale groups
      miss the log (logs attach to the new file group), flipping
      the hash;
    - reading replaced AND new groups together double-counts every
      row (count flips);
    - an INFLIGHT replacecommit (004: would cluster fg-C into fg-D,
      whose on-disk parquet carries poisoned +999 prices) is
      invisible BOTH ways: fg-D must not be read and fg-C must
      REMAIN visible — a reader honoring requested/inflight replace
      intents serves a half-committed table.

    The merge is the module's standard per-key window over
    base ∪ log. Scale posture: replace resolution is O(#replace
    commits) timeline metadata on top of the existing slice
    listing; the data path is unchanged — exactly why clustering is
    cheap to plan at 100 TB."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_cl_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    stage_single_parquet(
        orders.filter(par == 0), root, tdir,
        f"fg-A_0-1-0_{t1}.parquet",
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir,
        f"fg-B_0-1-0_{t1}.parquet",
    )
    stage_single_parquet(  # the clustered rewrite: full table
        orders, root, tdir, f"fg-C_0-1-0_{t2}.parquet",
    )
    stage_single_parquet(  # inflight 004's poisoned output
        orders.select(
            "o_orderkey",
            (F.col("o_totalprice") + 999.0).alias("o_totalprice"),
        ),
        root, tdir, f"fg-D_0-1-0_{t4}.parquet",
    )

    changes = (
        orders.filter(F.col("o_orderkey") % 10 == 6).toPandas()
    )
    upserts = [
        {"o_orderkey": int(k), "o_totalprice": float(p) + 100.0}
        for k, p in zip(changes["o_orderkey"],
                        changes["o_totalprice"])
    ]
    with open(os.path.join(tdir, f".fg-C_{t2}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(upserts),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.replacecommit.requested",
        f"{t2}.replacecommit.inflight",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.replacecommit.requested",
        f"{t4}.replacecommit.inflight",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")
    # the COMPLETED replacecommit carries the replace metadata
    with open(os.path.join(hdir, f"{t2}.replacecommit"), "w") as fh:
        json.dump({
            "partitionToReplaceFileIds": {"": ["fg-A", "fg-B"]},
            "partitionToWriteStats": {"": [{"fileId": "fg-C"}]},
        }, fh)

    # ---- the reader ----
    completed: set[str] = set()
    replaced_ids: set[str] = set()
    inflight_replace = 0
    for f in sorted(os.listdir(hdir)):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback",
                            "replacecommit"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) != 2:
            if parts[1] == "replacecommit" and parts[2] == "inflight":
                inflight_replace += 1  # intent only: changes nothing
            continue
        if parts[1] in ("commit", "deltacommit", "replacecommit"):
            completed.add(parts[0])
        if parts[1] == "replacecommit":
            with open(os.path.join(hdir, f)) as fh:
                meta = json.load(fh)
            for ids in meta["partitionToReplaceFileIds"].values():
                replaced_ids.update(ids)
    # completed replaces have a completed file too; count intents
    # that never completed
    inflight_replace -= sum(
        1 for f in os.listdir(hdir)
        if f.endswith(".replacecommit")
    )

    base_paths: list[str] = []
    visible_groups: set[str] = set()
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            file_id = f.split("_", 1)[0]
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed and file_id not in replaced_ids:
                base_paths.append(os.path.join(tdir, f))
                visible_groups.add(file_id)
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            if file_id in replaced_ids:
                continue  # logs of a replaced group die with it
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(max(len(slices), 1))
    completed_b = sorted(completed)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "is_delete", "applied", "is_meta"]
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _rolled = apply_command_blocks(stream)
                rows = []
                applied = 0
                seq = 0
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        continue
                    applied += 1
                    if blk["type"] == _AVRO_BLOCK:
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"],
                                                   schema):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        for key in _dec_delete_content(blk["content"]):
                            seq += 1
                            rows.append((int(key), 0.0, instant, seq,
                                         True, 0, False))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                rows.append((None, 0.0, "", 0, False, applied, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, is_delete boolean, applied int, is_meta boolean",
    ).localCheckpoint(eager=True)

    counters = parsed.filter("is_meta").agg(
        F.sum("applied").cast("int").alias("blocks_applied"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq", "is_delete"
    )
    # each base file carries ITS OWN commit instant (parsed from the
    # slice name) — after a partial clustering, visible groups span
    # instants, and a blanket literal mis-orders the merge
    base_parts = []
    for p in base_paths:
        instant = os.path.basename(p).rsplit("_", 1)[1][
            : -len(".parquet")
        ]
        base_parts.append(
            spark.read.parquet(p)
            .withColumn("instant", F.lit(instant))
            .withColumn("seq", F.lit(0))
            .withColumn("is_delete", F.lit(False))
        )
    base = base_parts[0]
    for df in base_parts[1:]:
        base = base.unionByName(df)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    merged = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
    )
    out = (
        merged.agg(
            F.lit(len(replaced_ids)).cast("int")
            .alias("groups_replaced"),
            F.lit(len(visible_groups)).cast("int")
            .alias("groups_visible"),
            F.lit(inflight_replace == 1)
            .alias("inflight_replace_ignored"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "groups_replaced", "groups_visible",
            "inflight_replace_ignored", "blocks_applied",
            "n_orders", "revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _enc_parquet_content(records: list[dict]) -> bytes:
    """PARQUET data block content (HoodieLogBlockType 5): the
    serialized records ARE a complete parquet file — unlike the
    Avro block there is no version/record-count preamble; the
    parquet footer carries both (tech-specs §Log File Format /
    HoodieParquetDataBlock.serializeRecords)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array(
                [r["o_orderkey"] for r in records], pa.int64()
            ),
            "o_totalprice": pa.array(
                [r["o_totalprice"] for r in records], pa.float64()
            ),
        }),
        buf,
    )
    return buf.getvalue()


def _dec_parquet_content(content: bytes) -> list[dict]:
    """Decode a PARQUET data block's content: the bytes are a
    self-contained parquet file."""
    import io

    import pyarrow.parquet as pq

    tbl = pq.read_table(io.BytesIO(content))
    return [
        {"o_orderkey": int(k), "o_totalprice": float(p)}
        for k, p in zip(
            tbl.column("o_orderkey").to_pylist(),
            tbl.column("o_totalprice").to_pylist(),
        )
    ]


@register(
    "source_hudi_mor_parquet_log_blocks",
    oracle=f"""
        SELECT CAST(1 AS INT) AS parquet_blocks,
               CAST(1 AS INT) AS avro_blocks,
               CAST(1 AS INT) AS delete_blocks,
               CAST((SELECT count(*) FROM orders
                     WHERE o_orderkey % 10 = 3) AS BIGINT)
                   AS n_deleted,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(o_totalprice
                   + CASE WHEN o_orderkey % 10 = 6 THEN 100.00
                          WHEN o_orderkey % 10 = 8 THEN 50.00
                          ELSE 0 END
                   AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_orderkey % 10 <> 3
    """,
    tags=("source", "hudi", "lakehouse", "merge-on-read",
          "parquet-log-block", "compat"),
)
def source_hudi_mor_parquet_log_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi MOR snapshot over PARQUET log blocks (round 17) — log
    block type 5, the `hoodie.logfile.data.block.format=parquet`
    shape modern write paths emit for columnar log scans; the other
    Hudi readers keep it a loud seam. The content framing is the
    trap: an Avro block's content opens with [version, record
    count] before the records, but a PARQUET block's content IS a
    complete parquet file — a reader that strips an 8-byte preamble
    feeds the decoder garbage, and one that writes one assumes a
    framing no real reader expects (the parquet footer already
    carries the count).

    The fixture's single log file MIXES formats in one slice —
    parquet block (deltacommit 002, +100.00 on keys ≡ 6), Avro
    block (003, +50.00 on keys ≡ 8), delete block (004, tombstones
    keys ≡ 3) — so the merge must be format-blind: per-key window
    over (instant, within-instant scan order), exactly the module's
    standard shape. Block-type counters attest each format actually
    decoded; HFILE blocks (type 4) stay a loud seam.

    Scale posture: identical to the Avro sibling — one task per
    file group, per-block decode through Arrow, merge one
    shuffle-by-key."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_pq_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    stage_single_parquet(
        orders.filter(par == 0), root, tdir,
        f"fg-A_0-1-0_{t1}.parquet",
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir,
        f"fg-B_0-1-0_{t1}.parquet",
    )

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(3, 6, 8))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _ups(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    # both groups get all three block formats' keys where they live:
    # ≡6, ≡8 are even (group A); ≡3 odd (group B)
    with open(os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _PARQUET_BLOCK, {_H_INSTANT: t2},
            _enc_parquet_content(_ups(6, 100.0)),
        ))
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_ups(8, 50.0)),
        ))
    with open(os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _DELETE_BLOCK, {_H_INSTANT: t4},
            _enc_delete_content(
                [str(int(k)) for k in
                 changes[mod == 3]["o_orderkey"]]
            ),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t3}.deltacommit",
        f"{t4}.deltacommit.requested", f"{t4}.deltacommit.inflight",
        f"{t4}.deltacommit",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the reader ----
    completed: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) == 2 and parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])

    base_paths: list[str] = []
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed:
                base_paths.append(os.path.join(tdir, f))
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    completed_b = sorted(completed)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "is_delete", "n_pq", "n_avro", "n_del", "is_meta"]
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _rolled = apply_command_blocks(stream)
                rows = []
                n_pq = n_avro = n_del = 0
                seq = 0
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done:
                        continue
                    if blk["type"] == _PARQUET_BLOCK:
                        n_pq += 1
                        for r in _dec_parquet_content(
                            blk["content"]
                        ):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, 0, 0, False))
                    elif blk["type"] == _AVRO_BLOCK:
                        n_avro += 1
                        schema = json.loads(blk["header"][_H_SCHEMA])
                        for r in _dec_avro_content(blk["content"],
                                                   schema):
                            seq += 1
                            rows.append((r["o_orderkey"],
                                         r["o_totalprice"],
                                         instant, seq, False,
                                         0, 0, 0, False))
                    elif blk["type"] == _DELETE_BLOCK:
                        n_del += 1
                        for key in _dec_delete_content(blk["content"]):
                            seq += 1
                            rows.append((int(key), 0.0, instant, seq,
                                         True, 0, 0, 0, False))
                    else:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                rows.append((None, 0.0, "", 0, False,
                             n_pq, n_avro, n_del, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, is_delete boolean, n_pq int, n_avro int,"
        " n_del int, is_meta boolean",
    ).localCheckpoint(eager=True)

    counters = parsed.filter("is_meta").agg(
        F.sum("n_pq").cast("int").alias("parquet_blocks"),
        F.sum("n_avro").cast("int").alias("avro_blocks"),
        F.sum("n_del").cast("int").alias("delete_blocks"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq", "is_delete"
    )
    n_deleted = log_df.filter("is_delete").count()
    base = (
        spark.read.parquet(*base_paths)
        .withColumn("instant", F.lit(t1))
        .withColumn("seq", F.lit(0))
        .withColumn("is_delete", F.lit(False))
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    merged = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
    )
    out = (
        merged.agg(
            F.lit(n_deleted).cast("bigint").alias("n_deleted"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "parquet_blocks", "avro_blocks", "delete_blocks",
            "n_deleted", "n_orders", "revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


_CDC_BLOCK = 6  # HoodieLogBlockType CDC_DATA_BLOCK (RFC-51)

_CDC_SCHEMA = {
    "type": "record",
    "name": "cdc_change",
    "fields": [
        {"name": "op", "type": "string"},
        {"name": "ts_ms", "type": "long"},
        {"name": "before", "type": ["null", _LOG_SCHEMA]},
        {"name": "after", "type": ["null", _LOG_SCHEMA]},
    ],
}


def _enc_cdc_content(records: list[dict]) -> bytes:
    """CDC data block content: same version/count/record framing as
    the Avro data block (HoodieCDCDataBlock extends
    HoodieAvroDataBlock), records in the debezium-style CDC shape —
    op i/u/d with nullable before/after row images (RFC-51)."""
    out = bytearray(struct.pack(">ii", 1, len(records)))
    for rec in records:
        raw = b"".join(
            _enc_field(rec[f["name"]], f["type"])
            for f in _CDC_SCHEMA["fields"]
        )
        out += struct.pack(">i", len(raw)) + raw
    return bytes(out)


@register(
    "source_hudi_cdc_incremental",
    oracle=f"""
        SELECT 'd' AS op,
               CAST(count(*) AS BIGINT) AS n_changes,
               {sql_dsum('o_totalprice')} AS revenue_before,
               CAST(NULL AS DOUBLE) AS revenue_after
        FROM orders WHERE o_orderkey % 10 = 3
        UNION ALL
        SELECT 'u',
               CAST(count(*) AS BIGINT),
               {sql_dsum('o_totalprice')},
               {sql_dsum('o_totalprice + 100.00')}
        FROM orders WHERE o_orderkey % 10 = 6
        ORDER BY op
    """,
    tags=("source", "hudi", "lakehouse", "cdc", "changelog",
          "merge-on-read", "compat"),
)
def source_hudi_cdc_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi CDC read (round 17) — CDC DATA BLOCKS (log block type
    6, RFC-51), completing the CDC triangle across the lakehouse
    trio: Delta CDF (`source_delta_cdf_changes`), Iceberg changelog
    (`source_iceberg_changelog_scan` family), and now Hudi's — the
    writer persists debezium-style change records (op i/u/d with
    nullable BEFORE/AFTER row images) as dedicated log blocks
    alongside the data blocks of the same deltacommit, so a CDC
    consumer reads changes DIRECTLY instead of diffing snapshots
    (the supplemental-logging design: before-images are only
    available this way — a base+log diff cannot recover them after
    the next compaction).

    The fixture's deltacommit 002 carries BOTH its Avro data block
    and its CDC block in one log file — the reader must select by
    BLOCK TYPE, not position; deltacommit 003's CDC block is
    INFLIGHT (timeline-skipped, attested), and the delete's after
    image is null while the update carries both images (+100.00 on
    keys ≡ 6; deletes on ≡ 3) — sum aggregates over before AND
    after images pin that the right image landed on the right side
    (a reader that swaps them, or serves after for deletes, flips
    the hash).

    Scale posture: one task per file group walks its logs once;
    CDC rows are Arrow-batched out and aggregated in one narrow
    shuffle by op — the read never touches base files at all."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_cdc_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3 = "001", "002", "003"
    par = F.col("o_orderkey") % 2
    stage_single_parquet(
        orders.filter(par == 0), root, tdir,
        f"fg-A_0-1-0_{t1}.parquet",
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir,
        f"fg-B_0-1-0_{t1}.parquet",
    )

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(3, 6))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _row(k, p) -> dict:
        return {"o_orderkey": int(k), "o_totalprice": float(p)}

    upd = changes[mod == 6]
    dels = changes[mod == 3]
    cdc_updates = [
        {"op": "u", "ts_ms": 2000,
         "before": _row(k, p), "after": _row(k, float(p) + 100.0)}
        for k, p in zip(upd["o_orderkey"], upd["o_totalprice"])
    ]
    cdc_deletes = [
        {"op": "d", "ts_ms": 2000,
         "before": _row(k, p), "after": None}
        for k, p in zip(dels["o_orderkey"], dels["o_totalprice"])
    ]
    # bogus changes under an INFLIGHT instant: must stay invisible
    cdc_phantom = [
        {"op": "u", "ts_ms": 3000,
         "before": _row(k, p), "after": _row(k, float(p) + 999.0)}
        for k, p in zip(upd["o_orderkey"][:5],
                        upd["o_totalprice"][:5])
    ]

    # keys ≡6 are even (group A); ≡3 odd (group B); each log carries
    # the deltacommit's DATA block AND its CDC block
    with open(os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _AVRO_BLOCK,
            {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(
                [{"o_orderkey": int(k),
                  "o_totalprice": float(p) + 100.0}
                 for k, p in zip(upd["o_orderkey"],
                                 upd["o_totalprice"])]
            ),
        ))
        fh.write(encode_log_block(
            _CDC_BLOCK, {_H_INSTANT: t2},
            _enc_cdc_content(cdc_updates),
        ))
        fh.write(encode_log_block(  # inflight: timeline-skipped
            _CDC_BLOCK, {_H_INSTANT: t3},
            _enc_cdc_content(cdc_phantom),
        ))
    with open(os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(
            _DELETE_BLOCK, {_H_INSTANT: t2},
            _enc_delete_content(
                [str(int(k)) for k in dels["o_orderkey"]]
            ),
        ))
        fh.write(encode_log_block(
            _CDC_BLOCK, {_H_INSTANT: t2},
            _enc_cdc_content(cdc_deletes),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t2}.deltacommit",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")

    # ---- the CDC reader over (001, 002] ----
    begin, end = t1, t2
    completed: set[str] = set()
    for f in os.listdir(hdir):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "rollback"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) == 2 and parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])

    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    completed_b = sorted(completed)

    def _read_cdc(batches):
        import pandas as pd

        cols = ["op", "before_price", "after_price",
                "cdc_blocks", "skipped_blocks", "is_meta"]
        done = set(completed_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _rolled = apply_command_blocks(stream)
                rows = []
                n_cdc = skipped = 0
                for blk in stream:
                    if blk["type"] != _CDC_BLOCK:
                        continue  # data/delete blocks: snapshot path
                    instant = blk["header"][_H_INSTANT]
                    if instant not in done or not (
                        begin < instant <= end
                    ):
                        skipped += 1
                        continue
                    n_cdc += 1
                    for r in _dec_avro_content_cdc(blk["content"]):
                        b, a = r["before"], r["after"]
                        rows.append((
                            r["op"],
                            None if b is None
                            else b["o_totalprice"],
                            None if a is None
                            else a["o_totalprice"],
                            0, 0, False,
                        ))
                rows.append((None, None, None, n_cdc, skipped, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_cdc,
        "op string, before_price double, after_price double,"
        " cdc_blocks int, skipped_blocks int, is_meta boolean",
    ).localCheckpoint(eager=True)
    n_cdc = parsed.filter("is_meta").agg(
        F.sum("cdc_blocks")
    ).collect()[0][0]
    n_skipped = parsed.filter("is_meta").agg(
        F.sum("skipped_blocks")
    ).collect()[0][0]
    if n_cdc != 2 or n_skipped != 1:
        raise ValueError(
            f"CDC block accounting drifted: {n_cdc} read, "
            f"{n_skipped} skipped"
        )
    out = (
        parsed.filter(~F.col("is_meta"))
        .groupBy("op")
        .agg(
            F.count("*").alias("n_changes"),
            dsum("before_price").alias("revenue_before"),
            dsum("after_price").alias("revenue_after"),
        )
        .orderBy("op")
        .localCheckpoint(eager=True)  # 2 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def _dec_avro_content_cdc(content: bytes) -> list[dict]:
    """Decode a CDC block's content with the RFC-51 change schema —
    the framing is the Avro data block's, so the generic decoder
    serves with the CDC schema."""
    return _dec_avro_content(content, _CDC_SCHEMA)


# ---------------------------------------------------------------------------
# the METADATA TABLE: HFile base files + HFILE log blocks (round 18)
# ---------------------------------------------------------------------------

# HoodieMetadataRecord, the subset the `files` partition uses (the
# real schema is HoodieMetadataPayload's; type 1 = partition list
# under the __all_partitions__ key, type 2 = files-in-partition;
# filesystemMetadata maps filename -> (size, isDeleted) and merges by
# map union with newer-instant wins / isDeleted tombstones)
_METADATA_RECORD_SCHEMA = {
    "type": "record", "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {"name": "filesystemMetadata", "type": ["null", {
            "type": "map", "values": {
                "type": "record", "name": "HoodieMetadataFileInfo",
                "fields": [
                    {"name": "size", "type": "long"},
                    {"name": "isDeleted", "type": "boolean"},
                ],
            },
        }]},
    ],
}
_ALL_PARTITIONS_KEY = "__all_partitions__"


def enc_metadata_record(key: str, rtype: int, fsmeta: dict) -> bytes:
    """(key, type, {filename: (size, isDeleted)}) -> Avro binary of
    the HoodieMetadataRecord subset (an HFile cell value)."""
    rec = {
        "key": key, "type": rtype,
        "filesystemMetadata": {
            n: {"size": s, "isDeleted": d}
            for n, (s, d) in sorted(fsmeta.items())
        },
    }
    return b"".join(
        _enc_field(rec[f["name"]], f["type"])
        for f in _METADATA_RECORD_SCHEMA["fields"]
    )


def dec_metadata_record(raw: bytes) -> dict:
    rec, pos = {}, 0
    for f in _METADATA_RECORD_SCHEMA["fields"]:
        rec[f["name"]], pos = _dec_field(raw, pos, f["type"])
    if pos != len(raw):
        raise ValueError("metadata record has trailing bytes")
    return rec


@register(
    "source_hudi_metadata_table_files",
    oracle=f"""
        SELECT CAST(2 AS INT) AS partitions_listed,
               CAST(3 AS INT) AS files_listed,
               CAST(1 AS INT) AS log_hfile_blocks,
               CAST(3 AS INT) AS hfile_index_entries,
               CAST(3 AS INT) AS hfile_blocks_read,
               TRUE AS listing_consistent,
               TRUE AS sizes_consistent,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum(
                   "o_totalprice"
                   " + CASE WHEN o_orderkey % 10 = 6 THEN 100.00 ELSE 0 END"
               )} AS revenue
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "merge-on-read", "compat"),
)
def source_hudi_metadata_table_files(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi METADATA TABLE `files` partition over HFile (round 18,
    r17 verdict item 2 — closing log block type 4, the last loud
    Hudi block type): since Hudi 0.11 the metadata table is ON by
    default, and a reader without it must physically LIST files —
    correct but unscalable on object stores (LIST is rate-limited
    and eventually consistent; the metadata table makes file listing
    a keyed read). The metadata table is itself a MOR table under
    ``.hoodie/metadata/`` whose base files are HFILE (HBase v3
    format, `sources/hfile.py`) and whose deltacommits append HFILE
    LOG BLOCKS (HoodieLogBlockType 4) — each block's content is a
    complete HFile image merged into the base by record key.

    Fixture: a partitioned COW table (par=0 even / par=1 odd orders)
    commits at 001; 002 rewrites par=0's file group with +100.00 on
    keys ≡ 6 (mod 10). The metadata table mirrors it: a base HFile
    (instant 001) with three cells — ``__all_partitions__`` (type-1
    partition list) plus one type-2 files record per partition — and
    a log file whose HFILE block (instant 002, gated by the metadata
    table's OWN timeline) adds the rewritten file. Both HFiles are
    GZ-compressed (hadoop GzipCodec per block — the Hudi base-file
    default; the colstats sibling keeps NONE so both codecs stay
    exercised). Cells are Avro HoodieMetadataRecords;
    ``filesystemMetadata`` maps merge by union.

    The reader serves file listing ONLY from the metadata table:
    point-GETs through the HFile root index (``hfile_blocks_read``
    pins that 3 keyed gets read exactly 3 of the 3 data blocks — the
    index-selected block each, never a full scan), merges the log
    block, then applies the normal file-slice rule to the LISTED
    names and reads the chosen base files. ``listing_consistent`` /
    ``sizes_consistent`` pin the physical cross-check the verdict
    asked for: the metadata listing must equal os.listdir and every
    size must match the file system. A reader that misses the log
    block serves the stale 001 slice (missing the +100s); one that
    scans instead of seeking flips the blocks-read pin; a broken
    map-merge loses a file and flips the listing pin.

    Scale posture: the metadata table turns O(files) LIST calls into
    O(partitions-touched) keyed HFile gets, each reading one block —
    Hudi's own design goal; data files are read once, in parallel,
    exactly as every other fixture here."""
    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_mdt_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mfiles = os.path.join(hdir, "metadata", "files")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mfiles)
    os.makedirs(mhdir)

    t1, t2 = "001", "002"
    par = F.col("o_orderkey") % 2
    f0_1 = f"fg-0_0-1-0_{t1}.parquet"
    f1_1 = f"fg-1_0-1-0_{t1}.parquet"
    f0_2 = f"fg-0_0-1-0_{t2}.parquet"
    stage_single_parquet(
        orders.filter(par == 0), root, tdir, f"par=0/{f0_1}"
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir, f"par=1/{f1_1}"
    )
    upserted = orders.filter(par == 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 6,
            (F.col("o_totalprice").cast("decimal(18,2)")
             + F.lit(100).cast("decimal(18,2)")).cast("double"),
        ).otherwise(F.col("o_totalprice")),
    )
    stage_single_parquet(upserted, root, tdir, f"par=0/{f0_2}")

    def _size(p: str, n: str) -> int:
        return os.path.getsize(os.path.join(tdir, p, n))

    # data-table timeline (001, 002 completed commits)
    for instant in (t1, t2):
        for suffix in (".commit.requested", ".commit.inflight",
                       ".commit"):
            with open(os.path.join(hdir, instant + suffix), "w") as fh:
                fh.write("{}")
    # the metadata table's OWN timeline: deltacommits mirroring the
    # data instants (Hudi commits them synchronously)
    for instant in (t1, t2):
        for suffix in (".deltacommit.requested",
                       ".deltacommit.inflight", ".deltacommit"):
            with open(os.path.join(mhdir, instant + suffix), "w") as fh:
                fh.write("{}")

    # metadata base HFile at 001: tiny block size -> one data block
    # per cell, a 3-entry root index the point gets must seek through
    base_img = hfile_encode({
        _ALL_PARTITIONS_KEY.encode(): enc_metadata_record(
            _ALL_PARTITIONS_KEY, 1,
            {"par=0": (0, False), "par=1": (0, False)},
        ),
        b"par=0": enc_metadata_record(
            "par=0", 2, {f0_1: (_size("par=0", f0_1), False)}
        ),
        b"par=1": enc_metadata_record(
            "par=1", 2, {f1_1: (_size("par=1", f1_1), False)}
        ),
    }, block_size=32, compression="gz")  # the Hudi base default
    with open(
        os.path.join(mfiles, f"files-0000_0-0-0_{t1}.hfile"), "wb"
    ) as fh:
        fh.write(base_img)
    # deltacommit 002's HFILE log block: a complete HFile image as
    # block content, merged into the base by record key
    delta_img = hfile_encode({
        b"par=0": enc_metadata_record(
            "par=0", 2, {f0_2: (_size("par=0", f0_2), False)}
        ),
    }, compression="gz")
    with open(
        os.path.join(mfiles, f".files-0000_{t1}.log.1_0-1-0"), "wb"
    ) as fh:
        fh.write(encode_log_block(_HFILE_BLOCK, {_H_INSTANT: t2},
                                  delta_img))

    # ---- the reader: listing served ONLY by the metadata table ----
    def _completed(timeline_dir: str, action: str) -> set[str]:
        out = set()
        for f in os.listdir(timeline_dir):
            parts = f.split(".")
            if len(parts) == 2 and parts[1] == action:
                out.add(parts[0])
        return out

    completed_data = _completed(hdir, "commit")
    completed_meta = _completed(mhdir, "deltacommit")

    base_files = [
        f for f in os.listdir(mfiles) if f.endswith(".hfile")
    ]
    log_files = [
        f for f in os.listdir(mfiles) if ".log." in f
    ]
    (base_name,) = base_files  # one file group in `files`
    with open(os.path.join(mfiles, base_name), "rb") as fh:
        rd = HFileReader(fh.read())
    index_entries = len(rd.index)
    all_parts = dec_metadata_record(rd.get(_ALL_PARTITIONS_KEY.encode()))
    if all_parts["type"] != 1:
        raise ValueError("partition-list record has wrong type")
    partitions = sorted(all_parts["filesystemMetadata"])
    listing: dict[str, dict[str, int]] = {}
    for p in partitions:
        rec = dec_metadata_record(rd.get(p.encode()))
        if rec["type"] != 2 or rec["key"] != p:
            raise ValueError(f"files record mismatch for {p!r}")
        listing[p] = {
            n: m["size"]
            for n, m in rec["filesystemMetadata"].items()
            if not m["isDeleted"]
        }
    blocks_read = rd.blocks_read  # the point-get attestation

    n_hfile_blocks = 0
    for lf in sorted(log_files, key=lambda n: parse_log_name(n)[2]):
        with open(os.path.join(mfiles, lf), "rb") as fh:
            blocks = walk_log_blocks(fh.read())
        for blk in blocks:
            if blk["type"] != _HFILE_BLOCK:
                raise NotImplementedError(
                    f"log block type {blk['type']} in the metadata "
                    "table (files partition is HFILE-only)"
                )
            if blk["header"][_H_INSTANT] not in completed_meta:
                continue  # uncommitted metadata deltacommit
            n_hfile_blocks += 1
            for row, val in HFileReader(blk["content"]).scan():
                rec = dec_metadata_record(val)
                if rec["key"] == _ALL_PARTITIONS_KEY:
                    continue
                part = listing.setdefault(rec["key"], {})
                for n, m in rec["filesystemMetadata"].items():
                    if m["isDeleted"]:
                        part.pop(n, None)
                    else:
                        part[n] = m["size"]

    # the verdict's physical cross-check: metadata listing == LIST
    listing_consistent = partitions == sorted(
        d for d in os.listdir(tdir) if d.startswith("par=")
    )
    sizes_consistent = True
    for p in partitions:
        physical = {
            n for n in os.listdir(os.path.join(tdir, p))
            if n.endswith(".parquet")
        }
        listing_consistent &= set(listing[p]) == physical
        sizes_consistent &= all(
            _size(p, n) == sz for n, sz in listing[p].items()
        )

    # file-slice resolution over the METADATA listing
    latest = max(completed_data)
    serve: list[str] = []
    for p in partitions:
        by_fid: dict[str, tuple[str, str]] = {}
        for name in listing[p]:
            fid = name.split("_", 1)[0]
            instant = name[: -len(".parquet")].rsplit("_", 1)[1]
            if instant not in completed_data or instant > latest:
                continue
            if fid not in by_fid or instant > by_fid[fid][0]:
                by_fid[fid] = (instant, name)
        serve += [os.path.join(tdir, p, n) for _, n in by_fid.values()]

    df = spark.read.parquet(*sorted(serve))
    out = df.agg(
        F.lit(len(partitions)).cast("int").alias("partitions_listed"),
        F.lit(sum(len(v) for v in listing.values())).cast("int")
        .alias("files_listed"),
        F.lit(n_hfile_blocks).cast("int").alias("log_hfile_blocks"),
        F.lit(index_entries).cast("int").alias("hfile_index_entries"),
        F.lit(blocks_read).cast("int").alias("hfile_blocks_read"),
        F.lit(bool(listing_consistent)).alias("listing_consistent"),
        F.lit(bool(sizes_consistent)).alias("sizes_consistent"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# HoodieMetadataColumnStats, the subset the `column_stats` partition
# uses (the real schema wraps min/max in per-type union records; this
# fixture's sketched columns are both longs)
_COLSTATS_RECORD_SCHEMA = {
    "type": "record", "name": "HoodieMetadataColumnStats",
    "fields": [
        {"name": "columnName", "type": "string"},
        {"name": "fileName", "type": "string"},
        {"name": "minValue", "type": "long"},
        {"name": "maxValue", "type": "long"},
        {"name": "nullCount", "type": "long"},
        {"name": "valueCount", "type": "long"},
    ],
}


def enc_colstats_record(
    col: str, fname: str, vmin: int, vmax: int, nulls: int, count: int
) -> bytes:
    rec = {"columnName": col, "fileName": fname, "minValue": vmin,
           "maxValue": vmax, "nullCount": nulls, "valueCount": count}
    return b"".join(
        _enc_field(rec[f["name"]], f["type"])
        for f in _COLSTATS_RECORD_SCHEMA["fields"]
    )


def dec_colstats_record(raw: bytes) -> dict:
    rec, pos = {}, 0
    for f in _COLSTATS_RECORD_SCHEMA["fields"]:
        rec[f["name"]], pos = _dec_field(raw, pos, f["type"])
    if pos != len(raw):
        raise ValueError("column-stats record has trailing bytes")
    return rec


@register(
    "source_hudi_metadata_table_colstats",
    oracle=f"""
        WITH m AS (SELECT max(o_orderkey) AS mx FROM orders),
        b AS (
            SELECT CAST(floor(mx * 0.30) AS BIGINT) AS lo,
                   CAST(floor(mx * 0.45) AS BIGINT) AS hi
            FROM m
        )
        SELECT CAST(4 AS INT) AS data_files,
               CAST(8 AS INT) AS stats_records,
               CAST(5 AS INT) AS hfile_blocks_read,
               CAST(3 AS INT) AS files_pruned,
               TRUE AS stats_match_footers,
               CAST(count(*) AS BIGINT) AS n_rows,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders, b
        WHERE o_orderkey BETWEEN b.lo AND b.hi
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "column-stats", "skipping", "compat"),
)
def source_hudi_metadata_table_colstats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi METADATA TABLE `column_stats` partition (round 18, the
    files-partition sibling): data skipping served from the metadata
    table instead of per-file footer reads — at object-store scale a
    predicate consults ONE keyed HFile range instead of opening N
    parquet footers. Records are keyed ``{{column}}.{{file}}`` so one
    column's stats are KEY-CONTIGUOUS: the reader's
    ``HFileReader.scan_range`` walks only the blocks whose index
    range can intersect the ``o_orderkey.`` prefix
    (``hfile_blocks_read`` pins 5 of the 8 one-cell blocks — the
    four o_orderkey blocks plus the one boundary predecessor — while
    the o_custkey stats are never decoded).

    Fixture: four base files split by o_orderkey quartile (commit
    001), so per-file [min,max] are tight disjoint ranges; the
    column_stats HFile carries 8 records (2 sketched columns x 4
    files). The predicate ``o_orderkey BETWEEN floor(0.30·max) AND
    floor(0.45·max)`` lands strictly inside quartile 1 (testdata
    orderkeys are dense 0..N-1), so exactly 3 files prune —
    ``files_pruned`` pins it, and reading a pruned file's rows or
    dropping the survivor's out-of-range tail flips n_rows/revenue.

    ``stats_match_footers`` is the integrity pin the files sibling
    has for sizes: every metadata record is cross-validated against
    the file's OWN parquet footer (repo footer reader
    `parquet_meta.footer_summary` — file-level min/max folded over
    row groups, null and value counts) — a stale or hand-rotted
    stats record is caught engine-side, not trusted.

    Scale posture: stats lookup is O(blocks of one column's range);
    pruning is driver-side arithmetic over O(files) records; the
    surviving file is read once with the predicate pushed into the
    scan. The metadata table is the only stats source consulted —
    footers are opened here solely as the audit."""
    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode
    from spark_hive_spark.sources.parquet_meta import footer_summary

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_mdcs_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mcs = os.path.join(hdir, "metadata", "column_stats")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mcs)
    os.makedirs(mhdir)

    t1 = "001"
    n_total = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    quart = F.floor(F.col("o_orderkey") * 4 / F.lit(n_total))
    fnames = [f"fg-{i}_0-1-0_{t1}.parquet" for i in range(4)]
    stage_many_parquet(
        [(orders.filter(quart == i), fnames[i]) for i in range(4)],
        root, tdir,
    )
    for suffix in (".commit.requested", ".commit.inflight", ".commit"):
        with open(os.path.join(hdir, t1 + suffix), "w") as fh:
            fh.write("{}")
    for suffix in (".deltacommit.requested", ".deltacommit.inflight",
                   ".deltacommit"):
        with open(os.path.join(mhdir, t1 + suffix), "w") as fh:
            fh.write("{}")

    # the stats WRITER derives records from the real footers (what a
    # Hudi writer commits alongside the data)
    cells: dict[bytes, bytes] = {}
    for name in fnames:
        with open(os.path.join(tdir, name), "rb") as fh:
            summ = footer_summary(fh.read())
        for col in ("o_custkey", "o_orderkey"):
            st = [g["stats"][col] for g in summ["row_groups"]]
            cells[f"{col}.{name}".encode()] = enc_colstats_record(
                col, name,
                min(s["min"] for s in st),
                max(s["max"] for s in st),
                sum(s["null_count"] or 0 for s in st),
                summ["num_rows"],
            )
    base_img = hfile_encode(cells, block_size=32)  # one cell/block
    with open(
        os.path.join(mcs, f"col-stats-0000_0-0-0_{t1}.hfile"), "wb"
    ) as fh:
        fh.write(base_img)

    # ---- the reader: metadata-served pruning + footer audit ----
    completed_meta = {
        f.split(".")[0] for f in os.listdir(mhdir)
        if len(f.split(".")) == 2 and f.endswith(".deltacommit")
    }
    if t1 not in completed_meta:
        raise ValueError("metadata deltacommit missing")
    (base_name,) = [f for f in os.listdir(mcs) if f.endswith(".hfile")]
    with open(os.path.join(mcs, base_name), "rb") as fh:
        rd = HFileReader(fh.read())
    stats_records = rd.entry_count
    recs = [
        dec_colstats_record(v)
        for _, v in rd.scan_range(b"o_orderkey.", b"o_orderkey/")
    ]
    blocks_read = rd.blocks_read
    if len(recs) != 4:
        raise ValueError(f"expected 4 o_orderkey records, {len(recs)}")
    mx = max(r["maxValue"] for r in recs)
    lo, hi = int(mx * 0.30), int(mx * 0.45)
    survivors = [
        r["fileName"] for r in recs
        if r["minValue"] <= hi and r["maxValue"] >= lo
    ]
    pruned = len(recs) - len(survivors)

    # the audit: every metadata record vs the file's OWN footer
    stats_ok = True
    full = HFileReader(base_img)
    for _, v in full.scan():
        r = dec_colstats_record(v)
        with open(os.path.join(tdir, r["fileName"]), "rb") as fh:
            summ = footer_summary(fh.read())
        st = [g["stats"][r["columnName"]] for g in summ["row_groups"]]
        stats_ok &= (
            r["minValue"] == min(s["min"] for s in st)
            and r["maxValue"] == max(s["max"] for s in st)
            and r["nullCount"] == sum(s["null_count"] or 0 for s in st)
            and r["valueCount"] == summ["num_rows"]
        )

    df = spark.read.parquet(
        *(os.path.join(tdir, n) for n in sorted(survivors))
    ).filter(F.col("o_orderkey").between(lo, hi))
    out = df.agg(
        F.lit(len(fnames)).cast("int").alias("data_files"),
        F.lit(stats_records).cast("int").alias("stats_records"),
        F.lit(blocks_read).cast("int").alias("hfile_blocks_read"),
        F.lit(pruned).cast("int").alias("files_pruned"),
        F.lit(bool(stats_ok)).alias("stats_match_footers"),
        F.count("*").alias("n_rows"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# HoodieMetadataBloomFilter, the bloom_filters partition's record
_BLOOM_RECORD_SCHEMA = {
    "type": "record", "name": "HoodieMetadataBloomFilter",
    "fields": [
        {"name": "type", "type": "string"},
        {"name": "timestamp", "type": "string"},
        {"name": "bloomFilter", "type": "bytes"},
        {"name": "isDeleted", "type": "boolean"},
    ],
}


def enc_bloom_record(
    btype: str, instant: str, bloom: bytes, deleted: bool = False
) -> bytes:
    rec = {"type": btype, "timestamp": instant,
           "bloomFilter": bloom, "isDeleted": deleted}
    return b"".join(
        _enc_field(rec[f["name"]], f["type"])
        for f in _BLOOM_RECORD_SCHEMA["fields"]
    )


def dec_bloom_record(raw: bytes) -> dict:
    rec, pos = {}, 0
    for f in _BLOOM_RECORD_SCHEMA["fields"]:
        rec[f["name"]], pos = _dec_field(raw, pos, f["type"])
    if pos != len(raw):
        raise ValueError("bloom record has trailing bytes")
    return rec


@register(
    "source_hudi_metadata_table_bloom_filters",
    oracle=f"""
        SELECT CAST(4 AS INT) AS data_files,
               CAST(4 AS INT) AS bloom_records,
               TRUE AS no_false_negatives,
               TRUE AS skipping_effective,
               TRUE AS fp_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               {sql_dsum('o_totalprice')} AS revenue_found
        FROM orders WHERE o_orderkey % 937 = 0
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "bloom", "skipping", "compat"),
)
def source_hudi_metadata_table_bloom_filters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi METADATA TABLE `bloom_filters` partition (round 18, the
    third metadata partition after `files` and `column_stats`):
    Hudi's bloom index keys every upsert — "which file group might
    already hold this record key?" — and the metadata table stores
    each base file's SimpleBloomFilter bytes so the answer is a
    keyed metadata read instead of N parquet-footer fetches. The
    bloom bytes are the real thing: hadoop's BloomFilter writable
    (`sources/hadoop_bloom.py` — the nonstandard signed reversed-
    tail murmur2, chained nbHash rounds, LSB-first bit packing, all
    pinned byte-identical against the bundled
    org.apache.hadoop.util.bloom classes via py4j), sized by Hudi's
    m/k formulas at fpp 0.01, BUILT EXECUTOR-SIDE (one
    applyInPandas task per file group — where a Hudi writer computes
    them) and carried as Avro HoodieMetadataBloomFilter cells in the
    partition's HFile.

    The probe workload is the bloom index's: present record keys
    (o_orderkey % 937 == 0) plus 20 keys past the dense-key ceiling
    (testdata orderkeys are 0..N-1, so in-range absences don't
    exist). Per key the reader tests all four file blooms from the
    METADATA table and reads only candidate files to verify:

    - ``no_false_negatives``: every present key's true quartile
      file is among its candidates (the bloom contract);
    - ``skipping_effective`` / ``fp_bounded``: false passes across
      all negative tests stay under 10x the fpp budget — absent
      keys mostly match NO file, which is exactly the I/O the
      index saves on every upsert;
    - ``n_found`` / ``revenue_found``: recomputed by reading ONLY
      candidate files — a bloom that drops a needed file loses rows
      and flips the hash.

    Scale posture: bloom build is one pass per file group,
    executor-side; the index read is O(probes x files) driver-side
    BIT TESTS over KB blobs (Hudi shards this by key hash at real
    file counts); verification reads candidate files once."""
    from spark_hive_spark.sources.hadoop_bloom import (
        HadoopBloomFilter,
        hudi_bloom_sizing,
    )
    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_mdbf_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mbf = os.path.join(hdir, "metadata", "bloom_filters")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mbf)
    os.makedirs(mhdir)

    t1 = "001"
    n_total = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    quart = F.floor(F.col("o_orderkey") * 4 / F.lit(n_total))
    fnames = {i: f"fg-{i}_0-1-0_{t1}.parquet" for i in range(4)}
    stage_many_parquet(
        [(orders.filter(quart == i), fnames[i]) for i in range(4)],
        root, tdir,
    )
    for suffix in (".commit.requested", ".commit.inflight", ".commit"):
        with open(os.path.join(hdir, t1 + suffix), "w") as fh:
            fh.write("{}")
    for suffix in (".deltacommit.requested", ".deltacommit.inflight",
                   ".deltacommit"):
        with open(os.path.join(mhdir, t1 + suffix), "w") as fh:
            fh.write("{}")

    # blooms build EXECUTOR-SIDE, one task per file group; keys hash
    # through the vectorized murmur2 (one numpy pass per group, not a
    # per-row Python add — pinned bit-identical to the scalar path in
    # tests/test_hadoop_bloom.py)
    from spark_hive_spark.sources.hadoop_bloom import bloom_bit_indexes

    def _build(pdf):
        import pandas as _pd

        m, k = hudi_bloom_sizing(len(pdf), 0.01)
        keys = pdf["o_orderkey"].astype("int64").astype(str)
        idx = bloom_bit_indexes(keys.to_numpy(dtype="bytes"), m, k)
        bf = HadoopBloomFilter(m, k, bits=set(idx.tolist()))
        return _pd.DataFrame(
            {"q": [int(pdf["q"].iloc[0])], "bloom": [bf.serialize()]}
        )

    built = (
        orders.withColumn("q", quart.cast("int"))
        .groupBy("q")
        .applyInPandas(_build, "q int, bloom binary")
        .collect()
    )
    cells = {
        fnames[r["q"]].encode(): enc_bloom_record(
            "SIMPLE", t1, bytes(r["bloom"])
        )
        for r in built
    }
    with open(
        os.path.join(mbf, f"bloom-filters-0000_0-0-0_{t1}.hfile"), "wb"
    ) as fh:
        fh.write(hfile_encode(cells, compression="gz"))

    # ---- the reader: metadata blooms -> candidate files -> verify --
    completed_meta = {
        f.split(".")[0] for f in os.listdir(mhdir)
        if len(f.split(".")) == 2 and f.endswith(".deltacommit")
    }
    if t1 not in completed_meta:
        raise ValueError("metadata deltacommit missing")
    (base_name,) = [f for f in os.listdir(mbf) if f.endswith(".hfile")]
    with open(os.path.join(mbf, base_name), "rb") as fh:
        rd = HFileReader(fh.read())
    blooms: dict[str, HadoopBloomFilter] = {}
    for row, val in rd.scan():
        rec = dec_bloom_record(val)
        if rec["type"] != "SIMPLE":
            raise NotImplementedError(
                f"hudi bloom filter type {rec['type']!r}"
            )
        if rec["isDeleted"]:
            continue
        blooms[row.decode()] = HadoopBloomFilter.deserialize(
            rec["bloomFilter"]
        )

    present = [
        r[0] for r in orders.filter(F.col("o_orderkey") % 937 == 0)
        .select("o_orderkey").collect()
    ]
    absent = list(range(n_total, n_total + 20))
    no_fn = True
    false_passes = 0
    candidate_files: set[str] = set()
    for key in present:
        true_file = fnames[key * 4 // n_total]
        cands = {
            f for f, bf in blooms.items()
            if bf.test(str(key).encode())
        }
        no_fn &= true_file in cands
        false_passes += len(cands - {true_file})
        candidate_files |= cands
    absent_passes = 0
    for key in absent:
        absent_passes += sum(
            1 for bf in blooms.values() if bf.test(str(key).encode())
        )
    neg_tests = len(present) * 3 + len(absent) * 4
    fp_budget = max(2, (neg_tests + 9) // 10)  # 10x the 0.01 fpp
    skipping_effective = absent_passes < len(absent) * 4
    fp_bounded = (false_passes + absent_passes) <= fp_budget

    # verification reads ONLY candidate files
    df = spark.read.parquet(
        *(os.path.join(tdir, n) for n in sorted(candidate_files))
    ).filter(F.col("o_orderkey") % 937 == 0)
    out = df.agg(
        F.lit(len(fnames)).cast("int").alias("data_files"),
        F.lit(len(blooms)).cast("int").alias("bloom_records"),
        F.lit(bool(no_fn)).alias("no_false_negatives"),
        F.lit(bool(skipping_effective)).alias("skipping_effective"),
        F.lit(bool(fp_bounded)).alias("fp_bounded"),
        F.count("*").alias("n_found"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_metadata_table_compaction",
    oracle=f"""
        SELECT CAST(2 AS INT) AS file_groups,
               CAST(2 AS INT) AS log_blocks_compacted,
               CAST(1 AS INT) AS files_tombstoned,
               TRUE AS compaction_equivalent,
               TRUE AS listing_consistent,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum(
                   "o_totalprice"
                   " + CASE WHEN o_orderkey % 10 = 6 THEN 100.00 ELSE 0 END"
               )} AS revenue
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "compaction", "merge-on-read", "compat"),
)
def source_hudi_metadata_table_compaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi METADATA TABLE COMPACTION (round 18) — the maintenance
    half of the metadata-table story: the `files` partition is MOR,
    so every data-table commit APPENDS an HFILE log block, and
    without compaction a reader replays an ever-growing log chain.
    Compaction merges base + logs into a NEW base HFile under a
    fresh instant; the old slice stays on disk until clean, and the
    file-slice rule (logs attach to their base instant) makes the
    new base self-contained.

    The fixture walks the full lifecycle INCLUDING the tombstone
    path the files sibling doesn't exercise: commit 001 bases two
    file groups; 002 rewrites fg-0 (+100.00 on keys ≡ 6 mod 10) and
    its metadata log block ADDS the new file; 003 CLEANS the stale
    fg-0 base — physically deleting it AND logging an ``isDeleted``
    tombstone; 004 COMPACTS the metadata slice (base 001 + two log
    blocks -> base 004, tombstoned entries dropped from the merged
    map — the net state, not the event history).

    The reader resolves the metadata table's own latest slice (base
    004, to which NO logs attach) and attests
    ``compaction_equivalent``: the listing served by the compacted
    base alone equals the listing replayed from the OLD slice (base
    001 + logs) — a compactor that loses the tombstone re-lists the
    cleaned file (its reads then crash), one that loses the upsert
    serves the stale group; ``listing_consistent`` re-pins the
    physical cross-check after the clean. Data files then serve
    through the usual slice rule.

    Scale posture: compaction reads each log block once and writes
    O(net records) — the same bounded merge every MOR table pays;
    reads afterward are back to one keyed base lookup."""
    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_mdc_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mfiles = os.path.join(hdir, "metadata", "files")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mfiles)
    os.makedirs(mhdir)

    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    f0_1 = f"fg-0_0-1-0_{t1}.parquet"
    f1_1 = f"fg-1_0-1-0_{t1}.parquet"
    f0_2 = f"fg-0_0-1-0_{t2}.parquet"
    stage_single_parquet(orders.filter(par == 0), root, tdir, f0_1)
    stage_single_parquet(orders.filter(par == 1), root, tdir, f1_1)
    upserted = orders.filter(par == 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 6,
            (F.col("o_totalprice").cast("decimal(18,2)")
             + F.lit(100).cast("decimal(18,2)")).cast("double"),
        ).otherwise(F.col("o_totalprice")),
    )
    stage_single_parquet(upserted, root, tdir, f0_2)

    def _size(n: str) -> int:
        return os.path.getsize(os.path.join(tdir, n))

    # data timeline: 001/002 commits, 003 clean
    for instant, action in ((t1, "commit"), (t2, "commit"),
                            (t3, "clean")):
        for suffix in (f".{action}.requested", f".{action}.inflight",
                       f".{action}"):
            with open(os.path.join(hdir, instant + suffix), "w") as fh:
                fh.write("{}")
    # metadata timeline: deltacommits mirroring 001-003, then the
    # compaction lands as a COMMIT at 004
    for instant in (t1, t2, t3):
        for suffix in (".deltacommit.requested",
                       ".deltacommit.inflight", ".deltacommit"):
            with open(os.path.join(mhdir, instant + suffix), "w") as fh:
                fh.write("{}")
    for suffix in (".commit.requested", ".commit.inflight", ".commit"):
        with open(os.path.join(mhdir, t4 + suffix), "w") as fh:
            fh.write("{}")

    base_img = hfile_encode({
        b"par": enc_metadata_record(
            "par", 2,
            {f0_1: (_size(f0_1), False), f1_1: (_size(f1_1), False)},
        ),
    }, compression="gz")
    base_001 = os.path.join(mfiles, f"files-0000_0-0-0_{t1}.hfile")
    with open(base_001, "wb") as fh:
        fh.write(base_img)
    log_path = os.path.join(mfiles, f".files-0000_{t1}.log.1_0-1-0")
    with open(log_path, "wb") as fh:
        fh.write(encode_log_block(_HFILE_BLOCK, {_H_INSTANT: t2},
                                  hfile_encode({
            b"par": enc_metadata_record(
                "par", 2, {f0_2: (_size(f0_2), False)}),
        }, compression="gz")))
        fh.write(encode_log_block(_HFILE_BLOCK, {_H_INSTANT: t3},
                                  hfile_encode({
            b"par": enc_metadata_record("par", 2, {f0_1: (0, True)}),
        }, compression="gz")))
    # 003's clean PHYSICALLY removes the stale base file
    os.remove(os.path.join(tdir, f0_1))

    # ---- shared replay: one metadata slice -> {file: size} --------
    completed_meta = set()
    for f in os.listdir(mhdir):
        parts = f.split(".")
        if len(parts) == 2 and parts[1] in ("deltacommit", "commit"):
            completed_meta.add(parts[0])

    def _replay(base_path: str, log_paths: list[str]) -> dict:
        with open(base_path, "rb") as fh:
            rd = HFileReader(fh.read())
        listing: dict[str, int] = {}
        tombstoned = 0
        blocks = 0
        for row, val in rd.scan():
            rec = dec_metadata_record(val)
            listing.update({
                n: m["size"]
                for n, m in rec["filesystemMetadata"].items()
                if not m["isDeleted"]
            })
        for lp in sorted(log_paths, key=lambda p: parse_log_name(
                os.path.basename(p))[2]):
            with open(lp, "rb") as fh:
                for blk in walk_log_blocks(fh.read()):
                    if blk["type"] != _HFILE_BLOCK:
                        raise NotImplementedError(
                            f"log block type {blk['type']} in the "
                            "metadata table"
                        )
                    if blk["header"][_H_INSTANT] not in completed_meta:
                        continue
                    blocks += 1
                    for _row, val in HFileReader(
                            blk["content"]).scan():
                        rec = dec_metadata_record(val)
                        for n, m in rec["filesystemMetadata"].items():
                            if m["isDeleted"]:
                                listing.pop(n, None)
                                tombstoned += 1
                            else:
                                listing[n] = m["size"]
        return {"listing": listing, "blocks": blocks,
                "tombstoned": tombstoned}

    # ---- the COMPACTOR: old slice -> new self-contained base ------
    old = _replay(base_001, [log_path])
    compacted_img = hfile_encode({
        b"par": enc_metadata_record(
            "par", 2,
            {n: (sz, False) for n, sz in sorted(
                old["listing"].items())},
        ),
    }, compression="gz")
    base_004 = os.path.join(mfiles, f"files-0000_0-0-0_{t4}.hfile")
    with open(base_004, "wb") as fh:
        fh.write(compacted_img)

    # ---- the reader: latest slice = base 004, no logs attach ------
    bases = {
        f[: -len(".hfile")].rsplit("_", 1)[1]: f
        for f in os.listdir(mfiles) if f.endswith(".hfile")
    }
    latest_base = max(i for i in bases if i in completed_meta)
    logs_for_latest = [
        os.path.join(mfiles, f) for f in os.listdir(mfiles)
        if ".log." in f
        and f.split(".log.")[0].rsplit("_", 1)[1] == latest_base
    ]
    new = _replay(os.path.join(mfiles, bases[latest_base]),
                  logs_for_latest)
    compaction_equivalent = (
        new["listing"] == old["listing"] and not logs_for_latest
    )
    physical = {
        n for n in os.listdir(tdir) if n.endswith(".parquet")
    }
    listing_consistent = set(new["listing"]) == physical and all(
        _size(n) == sz for n, sz in new["listing"].items()
    )

    # file-slice resolution over the compacted listing
    completed_data = {
        f.split(".")[0] for f in os.listdir(hdir)
        if len(f.split(".")) == 2 and f.endswith(".commit")
    }
    by_fid: dict[str, tuple[str, str]] = {}
    for name in new["listing"]:
        fid = name.split("_", 1)[0]
        instant = name[: -len(".parquet")].rsplit("_", 1)[1]
        if instant not in completed_data:
            continue
        if fid not in by_fid or instant > by_fid[fid][0]:
            by_fid[fid] = (instant, name)
    serve = sorted(os.path.join(tdir, n) for _, n in by_fid.values())

    df = spark.read.parquet(*serve)
    out = df.agg(
        F.lit(len(by_fid)).cast("int").alias("file_groups"),
        F.lit(old["blocks"]).cast("int")
        .alias("log_blocks_compacted"),
        F.lit(old["tombstoned"]).cast("int").alias("files_tombstoned"),
        F.lit(bool(compaction_equivalent))
        .alias("compaction_equivalent"),
        F.lit(bool(listing_consistent)).alias("listing_consistent"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


# HoodieRecordIndexInfo, the record_index partition's record (subset:
# the fileId splits into UUID high/low bits + the integer file index
# — Hudi 1.0 fileIds are "{uuid}-{index}")
_RLI_RECORD_SCHEMA = {
    "type": "record", "name": "HoodieRecordIndexInfo",
    "fields": [
        {"name": "partitionName", "type": "string"},
        {"name": "fileIdHighBits", "type": "long"},
        {"name": "fileIdLowBits", "type": "long"},
        {"name": "fileIndex", "type": "long"},
        {"name": "instantTime", "type": "long"},
    ],
}


def enc_rli_record(partition: str, file_uuid, file_index: int,
                   instant: int) -> bytes:
    hi = (file_uuid.int >> 64) - (1 << 64) \
        if (file_uuid.int >> 64) >= (1 << 63) else file_uuid.int >> 64
    lo_raw = file_uuid.int & ((1 << 64) - 1)
    lo = lo_raw - (1 << 64) if lo_raw >= (1 << 63) else lo_raw
    rec = {"partitionName": partition, "fileIdHighBits": hi,
           "fileIdLowBits": lo, "fileIndex": file_index,
           "instantTime": instant}
    return b"".join(
        _enc_field(rec[f["name"]], f["type"])
        for f in _RLI_RECORD_SCHEMA["fields"]
    )


def dec_rli_record(raw: bytes) -> dict:
    import uuid as _uuid

    rec, pos = {}, 0
    for f in _RLI_RECORD_SCHEMA["fields"]:
        rec[f["name"]], pos = _dec_field(raw, pos, f["type"])
    if pos != len(raw):
        raise ValueError("record-index record has trailing bytes")
    hi = rec["fileIdHighBits"] & ((1 << 64) - 1)
    lo = rec["fileIdLowBits"] & ((1 << 64) - 1)
    rec["fileId"] = str(_uuid.UUID(int=(hi << 64) | lo))
    return rec


@register(
    "source_hudi_metadata_table_record_index",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS index_entries,
               CAST(2 AS INT) AS index_levels,
               TRUE AS locations_correct,
               TRUE AS absent_misses_clean,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 937 = 0) AS n_found,
               (SELECT {sql_dsum('o_totalprice')} FROM orders
                WHERE o_orderkey % 937 = 0) AS revenue_found
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "record-index", "point-lookup", "compat"),
)
def source_hudi_metadata_table_record_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hudi METADATA TABLE `record_index` partition (round 18,
    completing all four standard metadata partitions after files /
    column_stats / bloom_filters): Hudi 1.0's record-level index
    maps EVERY record key directly to its file group — upsert tagging
    becomes one exact keyed lookup instead of bloom candidates +
    file probes. One HFile cell per record key means the index file
    is finally big enough to exercise the TWO-LEVEL data index at
    real cardinality (one cell per order row; the trailer pins
    numDataIndexLevels=2 and every point GET walks root -> leaf ->
    one data block, leaves cached). Values are Avro
    HoodieRecordIndexInfo with the 1.0 fileId encoding: the
    "{{uuid}}-{{index}}" fileId splits into signed UUID high/low
    longs plus the integer file index, reassembled on read.

    Cell payloads are built EXECUTOR-SIDE (mapInPandas over each
    file's rows — where a Hudi writer tags records); the driver only
    sorts and assembles the HFile, exactly the shuffle-then-write a
    metadata-table commit performs. Probes: every key ≡ 0 mod 937
    resolves through the index to its (fileId, instant), the
    resolved files are read ONCE each and ``locations_correct`` pins
    that every probed key was found in EXACTLY the file the index
    named (an index that maps a key to the wrong group loses the row
    — n_found/revenue flip); 20 past-ceiling keys pin
    ``absent_misses_clean`` — the record index is EXACT, no false
    positives, unlike the bloom partition.

    Scale posture: the index is O(records) — the one metadata
    partition that scales with rows, which is why Hudi shards it
    into many file groups hashed by key (one group here; the HFile
    two-level index is the in-file analogue); lookups are
    O(log blocks) seeks; the per-row Avro encode rides executors."""
    import uuid as _uuid

    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_rli_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mrli = os.path.join(hdir, "metadata", "record_index")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mrli)
    os.makedirs(mhdir)

    t1 = "001"
    fids = {0: _uuid.UUID(int=0xA), 1: _uuid.UUID(int=0xB)}
    par = F.col("o_orderkey") % 2
    fnames = {
        i: f"{fids[i]}-0_0-1-0_{t1}.parquet" for i in range(2)
    }
    stage_many_parquet(
        [(orders.filter(par == i), fnames[i]) for i in range(2)],
        root, tdir,
    )
    for suffix in (".commit.requested", ".commit.inflight", ".commit"):
        with open(os.path.join(hdir, t1 + suffix), "w") as fh:
            fh.write("{}")
    for suffix in (".deltacommit.requested", ".deltacommit.inflight",
                   ".deltacommit"):
        with open(os.path.join(mhdir, t1 + suffix), "w") as fh:
            fh.write("{}")

    # cell payloads build executor-side; the driver sorts + assembles.
    # The Avro payload depends only on the key's parity (two file
    # groups, constant fileIndex/instant), so the per-row
    # enc_rli_record collapses to a 2-way select; keys encode in one
    # vectorized pass.
    val_by_parity = {
        i: enc_rli_record("", fids[i], 0, int(t1)) for i in range(2)
    }

    def _cells(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            k = pdf["o_orderkey"].astype("int64")
            par = (k % 2).to_numpy() == 0
            vals = _np.empty(len(k), dtype=object)
            vals[par] = val_by_parity[0]
            vals[~par] = val_by_parity[1]
            yield _pd.DataFrame({
                "key": k.astype(str).str.encode("ascii"),
                "val": vals,
            })

    built = orders.select("o_orderkey").mapInPandas(
        _cells, "key binary, val binary"
    ).toPandas()  # Arrow transfer — py4j row collect is ~10x slower
    img = hfile_encode(
        dict(zip(
            (bytes(k) for k in built["key"]),
            (bytes(v) for v in built["val"]),
        )),
        block_size=1024, max_root_entries=16, compression="gz",
    )
    with open(
        os.path.join(mrli, f"record-index-0000_0-0-0_{t1}.hfile"), "wb"
    ) as fh:
        fh.write(img)

    # ---- the reader: exact keyed lookups through the index ----
    completed_meta = {
        f.split(".")[0] for f in os.listdir(mhdir)
        if len(f.split(".")) == 2 and f.endswith(".deltacommit")
    }
    if t1 not in completed_meta:
        raise ValueError("metadata deltacommit missing")
    (base_name,) = [f for f in os.listdir(mrli) if f.endswith(".hfile")]
    with open(os.path.join(mrli, base_name), "rb") as fh:
        rd = HFileReader(fh.read())
    if rd.levels != 2:
        raise ValueError("record index fixture must be two-level")

    present = [
        r[0] for r in orders.filter(F.col("o_orderkey") % 937 == 0)
        .select("o_orderkey").collect()
    ]
    ceiling = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    by_file: dict[str, list[int]] = {}
    locations_correct = True
    for key in present:
        raw = rd.get(str(key).encode())
        if raw is None:
            locations_correct = False
            continue
        rec = dec_rli_record(raw)
        fname = (
            f"{rec['fileId']}-{rec['fileIndex']}"
            f"_0-1-0_{rec['instantTime']:03d}.parquet"
        )
        # the index must name EXACTLY the parity file the key lives in
        locations_correct &= fname == fnames[key % 2]
        by_file.setdefault(fname, []).append(key)
    absent_misses_clean = all(
        rd.get(str(k).encode()) is None
        for k in range(ceiling, ceiling + 20)
    )

    # read each resolved file ONCE; keys must be found where named
    found = None
    for fname, keys in sorted(by_file.items()):
        d = (
            spark.read.parquet(os.path.join(tdir, fname))
            .filter(F.col("o_orderkey").isin(keys))
        )
        found = d if found is None else found.unionByName(d)
    n_present = len(present)
    out = found.agg(
        F.lit(rd.entry_count).cast("bigint").alias("index_entries"),
        F.lit(rd.levels).cast("int").alias("index_levels"),
        (F.lit(bool(locations_correct))
         & (F.count("*") == n_present)).alias("locations_correct"),
        F.lit(bool(absent_misses_clean)).alias("absent_misses_clean"),
        F.count("*").alias("n_found"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


def hudi_rli_file_group_index_vec(keys, n_groups: int):
    """Vectorized twin of `hudi_rli_file_group_index` over a numpy
    bytes array of ASCII record keys (the record keys here are
    decimal digit strings, where Java char == byte): Horner 31-hash
    in uint32 per length group, then the same signed double-abs mod.
    Pinned against the scalar form in tests/test_hfile.py. Keys must
    not end in a NUL byte (see `ascii_keys_array`)."""
    import numpy as np

    from spark_hive_spark.sources.hadoop_bloom import ascii_keys_array

    keys = ascii_keys_array(keys)
    out = np.empty(len(keys), dtype=np.int64)
    lens = np.char.str_len(keys)
    with np.errstate(over="ignore"):
        for L in np.unique(lens):
            mask = lens == L
            mat = keys[mask].astype(f"S{int(L)}").view(
                np.uint8
            ).reshape(-1, int(L))
            h = np.zeros(mat.shape[0], dtype=np.uint32)
            for j in range(int(L)):
                h = h * np.uint32(31) + mat[:, j].astype(np.uint32)
            signed = h.astype(np.int64)
            signed[signed >= 1 << 31] -= 1 << 32
            a = np.abs(signed)
            # Java Math.abs(Integer.MIN_VALUE) stays negative; the
            # floored % then folds it non-negative like the scalar
            a[signed == -(1 << 31)] = -(1 << 31)
            out[mask] = a % n_groups
    return out


def hudi_rli_file_group_index(record_key: str, n_groups: int) -> int:
    """Record key -> record_index file-group ordinal, Hudi's
    HoodieTableMetadataUtil.mapRecordKeyToFileGroupIndex: Java
    String.hashCode (31-multiplier, 32-bit wraparound) double-abs'd
    mod the group count. Reimplemented bit-exactly (signed int32
    semantics, Integer.MIN_VALUE surviving the first abs) so index
    files this repo writes land keys in the SAME shard a Hudi
    reader would probe (py4j-verified against java.lang.String in
    tests/test_hfile.py)."""
    h = 0
    for ch in record_key:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    if h >= 1 << 31:
        h -= 1 << 32
    a = h if h >= 0 else (-h if h != -(1 << 31) else h)
    m = a % n_groups
    if m < 0:
        m += n_groups  # python % already >= 0; kept for symmetry
    return m


@register(
    "source_hudi_metadata_record_index_sharded",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS index_entries,
               CAST(4 AS INT) AS file_groups,
               TRUE AS shards_exclusive,
               TRUE AS locations_correct,
               TRUE AS absent_misses_clean,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 937 = 0) AS n_found,
               (SELECT {sql_dsum('o_totalprice')} FROM orders
                WHERE o_orderkey % 937 = 0) AS revenue_found
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "record-index", "sharding", "point-lookup", "compat"),
)
def source_hudi_metadata_record_index_sharded(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SHARDED record_index (round 19 compose) — the layout the
    single-group r18 fixture's docstring promised: because the
    record index is O(records), Hudi splits it across N file groups
    with keys routed by `mapRecordKeyToFileGroupIndex` (Java
    String.hashCode, double-abs, mod N — `hudi_rli_file_group_index`
    here, bit-exact). A lookup hashes the key, opens ONLY that
    shard's HFile, and point-GETs — the shard fan-out multiplies
    the single-file two-level-index capacity by N without changing
    per-lookup cost.

    Four file groups over the orders keys; shard routing runs
    EXECUTOR-side in the same mapInPandas that builds cell
    payloads, the driver assembles one HFile per shard (the
    shuffle-by-shard a metadata commit performs). Attests:
    ``locations_correct`` — every probed key ≡ 0 mod 937 resolves
    through ITS OWN shard to exactly the parity data file holding
    it; ``shards_exclusive`` — each probed key is ABSENT from the
    other three shards (a router that double-writes would serve
    stale locations after one shard compacts); ``index_entries``
    sums shard entry counts back to the exact row count (no key
    lost or double-routed); absent keys past the ceiling miss
    cleanly in their routed shard.

    Scale posture: per-lookup cost stays O(log blocks-per-shard)
    (SCALE.md round-19: 2 touched blocks at 1M cells/shard); the
    shard count is the knob that scales the index to 10^9 records —
    routing is pure per-key arithmetic, no directory listing."""
    import uuid as _uuid

    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    N_GROUPS = 4
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_rlis_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mrli = os.path.join(hdir, "metadata", "record_index")
    os.makedirs(mrli)

    t1 = "001"
    fids = {0: _uuid.UUID(int=0xA), 1: _uuid.UUID(int=0xB)}
    par = F.col("o_orderkey") % 2
    fnames = {
        i: f"{fids[i]}-0_0-1-0_{t1}.parquet" for i in range(2)
    }
    stage_many_parquet(
        [(orders.filter(par == i), fnames[i]) for i in range(2)],
        root, tdir,
    )

    # payloads are constant per parity; keys/shards vectorize (the
    # shard router is the numpy twin of hudi_rli_file_group_index)
    val_by_parity = {
        i: enc_rli_record("", fids[i], 0, int(t1)) for i in range(2)
    }

    def _cells(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            k = pdf["o_orderkey"].astype("int64")
            keys = k.astype(str).str.encode("ascii")
            even = (k % 2).to_numpy() == 0
            vals = _np.empty(len(k), dtype=object)
            vals[even] = val_by_parity[0]
            vals[~even] = val_by_parity[1]
            yield _pd.DataFrame({
                "key": keys,
                "val": vals,
                "shard": hudi_rli_file_group_index_vec(
                    keys.to_numpy(dtype="bytes"), N_GROUPS
                ).astype("int32"),
            })

    # each shard's HFile encodes EXECUTOR-side in one applyInPandas
    # task per shard (the 4 encodes run in parallel instead of
    # serializing ~0.5 s each on the driver, and the 150k-row cell
    # frame never funnels through the driver); the image bytes are
    # the only thing collected. hfile_encode sorts its cells, so the
    # image is byte-identical to the former driver-side loop.
    def _encode_shard(key: tuple, pdf) -> "pd.DataFrame":
        import pandas as _pd

        from spark_hive_spark.sources.hfile import (
            hfile_encode as _enc,
        )

        img = _enc(
            dict(zip(
                (bytes(k) for k in pdf["key"]),
                (bytes(v) for v in pdf["val"]),
            )),
            block_size=1024, max_root_entries=16, compression="gz",
        )
        return _pd.DataFrame({"shard": [int(key[0])], "img": [img]})

    imgs = {
        r["shard"]: r["img"]
        for r in orders.select("o_orderkey").mapInPandas(
            _cells, "key binary, val binary, shard int"
        ).groupBy("shard").applyInPandas(
            _encode_shard, "shard int, img binary"
        ).collect()
    }
    for g in range(N_GROUPS):
        if g not in imgs:
            raise ValueError(f"record-index shard {g} is empty")
        with open(os.path.join(
            mrli, f"record-index-{g:04d}_0-0-0_{t1}.hfile"
        ), "wb") as fh:
            fh.write(imgs[g])

    # ---- the reader: route -> one shard -> point GET ----
    readers: dict[int, HFileReader] = {}
    for f in os.listdir(mrli):
        g = int(f.split("_")[0].rsplit("-", 1)[1])
        with open(os.path.join(mrli, f), "rb") as fh:
            readers[g] = HFileReader(fh.read())
    if sorted(readers) != list(range(N_GROUPS)):
        raise ValueError("record-index shard set incomplete")
    index_entries = sum(r.entry_count for r in readers.values())

    present = [
        r[0] for r in orders.filter(F.col("o_orderkey") % 937 == 0)
        .select("o_orderkey").collect()
    ]
    ceiling = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    by_file: dict[str, list[int]] = {}
    locations_correct = True
    shards_exclusive = True
    for key in present:
        ks = str(key)
        g = hudi_rli_file_group_index(ks, N_GROUPS)
        raw = readers[g].get(ks.encode())
        if raw is None:
            locations_correct = False
            continue
        rec = dec_rli_record(raw)
        fname = (
            f"{rec['fileId']}-{rec['fileIndex']}"
            f"_0-1-0_{rec['instantTime']:03d}.parquet"
        )
        locations_correct &= fname == fnames[key % 2]
        by_file.setdefault(fname, []).append(key)
        shards_exclusive &= all(
            readers[o].get(ks.encode()) is None
            for o in range(N_GROUPS) if o != g
        )
    absent_misses_clean = all(
        readers[hudi_rli_file_group_index(str(k), N_GROUPS)]
        .get(str(k).encode()) is None
        for k in range(ceiling, ceiling + 20)
    )

    found = None
    for fname, keys in sorted(by_file.items()):
        d = (
            spark.read.parquet(os.path.join(tdir, fname))
            .filter(F.col("o_orderkey").isin(keys))
        )
        found = d if found is None else found.unionByName(d)
    n_present = len(present)
    out = found.agg(
        F.lit(index_entries).cast("bigint").alias("index_entries"),
        F.lit(N_GROUPS).cast("int").alias("file_groups"),
        F.lit(bool(shards_exclusive)).alias("shards_exclusive"),
        (F.lit(bool(locations_correct))
         & (F.count("*") == n_present)).alias("locations_correct"),
        F.lit(bool(absent_misses_clean)).alias("absent_misses_clean"),
        F.count("*").alias("n_found"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_restore_mor",
    oracle=f"""
        SELECT CAST(3 AS INT) AS commits_visible,
               CAST(1 AS INT) AS commits_rolled_back,
               CAST(2 AS INT) AS blocks_applied,
               CAST(2 AS INT) AS blocks_skipped_rolled_back,
               TRUE AS savepoint_ok,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN o_orderkey % 10 = 6
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_at_t2,
               CAST(sum(CASE WHEN o_orderkey % 10 = 3
                        THEN 1 ELSE 0 END) AS BIGINT) AS rows_at_t5,
               {sql_dsum(
                   "o_totalprice + CASE"
                   " WHEN o_orderkey % 10 = 6 THEN 100.00"
                   " WHEN o_orderkey % 10 = 3 THEN 75.00"
                   " ELSE 0.00 END"
               )} AS revenue
        FROM orders
    """,
    tags=("source", "hudi", "merge-on-read", "lakehouse", "timeline",
          "restore", "savepoint"),
)
def source_hudi_restore_mor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RESTORE on a MERGE-ON-READ table (round 19 compose) — the
    block-level half `source_hudi_restore` cannot show: rolled-back
    deltacommits live as LOG BLOCKS interleaved inside SHARED log
    files, so a restore cannot mask them at file granularity — the
    same physical log must be walked for the surviving commit's
    block while the rolled-back commit's block beside it is
    excluded BY INSTANT (timeline after restore application; the
    fixture models cleanup lag, so t3's completed deltacommit file
    is still on the timeline and a plain completed-check serves its
    blocks).

    Timeline: t2 upserts fg-A (+100.00 on keys ≡ 6, savepointed);
    t3 appends blocks to BOTH groups' logs (+55.00 on ≡ 2, +50.00
    on ≡ 7); t4 RESTOREs to t2; t5 upserts fg-B (+75.00 on ≡ 3)
    APPENDED AFTER the rolled-back block in the same log file —
    both groups end with a mixed visible/invisible block sequence.
    A reader that skips restore application double-serves ≡ 2 / ≡ 7
    and (because the merge window takes the latest instant) masks
    nothing — revenue and both per-instant row counts flip.

    Scale posture: identical to the MOR snapshot read — one task
    per file group walks its logs once, one shuffle-by-key merge
    window; restore application is O(#instants) planning."""
    import pandas as _pd  # noqa: F401 (mapInPandas batches)

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_resmor_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    schema_json = json.dumps(_LOG_SCHEMA)
    t1, t2, t3, t4, t5 = "001", "002", "003", "004", "005"

    par = F.col("o_orderkey") % 2
    stage_many_parquet(
        [(orders.filter(par == half), f"{fid}_0-1-0_{t1}.parquet")
         for fid, half in (("fg-A", 0), ("fg-B", 1))],
        root, tdir,
    )

    changes = (
        orders.filter((F.col("o_orderkey") % 10).isin(2, 3, 6, 7))
        .toPandas()
    )
    mod = changes["o_orderkey"] % 10

    def _upserts(m: int, delta: float) -> list[dict]:
        sel = changes[mod == m]
        return [
            {"o_orderkey": int(k), "o_totalprice": float(p) + delta}
            for k, p in zip(sel["o_orderkey"], sel["o_totalprice"])
        ]

    with open(os.path.join(tdir, f".fg-A_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(  # t2: survives the restore
            _AVRO_BLOCK, {_H_INSTANT: t2, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(6, 100.0)),
        ))
        fh.write(encode_log_block(  # t3: rolled back, same file
            _AVRO_BLOCK, {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(2, 55.0)),
        ))
    with open(os.path.join(tdir, f".fg-B_{t1}.log.1_0-1-0"),
              "wb") as fh:
        fh.write(encode_log_block(  # t3: rolled back
            _AVRO_BLOCK, {_H_INSTANT: t3, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(7, 50.0)),
        ))
        fh.write(encode_log_block(  # t5: post-restore, after it
            _AVRO_BLOCK, {_H_INSTANT: t5, _H_SCHEMA: schema_json},
            _enc_avro_content(_upserts(3, 75.0)),
        ))

    for name in (
        f"{t1}.commit.requested", f"{t1}.commit.inflight",
        f"{t1}.commit",
        f"{t2}.deltacommit.requested", f"{t2}.deltacommit.inflight",
        f"{t3}.deltacommit.requested", f"{t3}.deltacommit.inflight",
        f"{t5}.deltacommit.requested", f"{t5}.deltacommit.inflight",
        f"{t2}.savepoint.inflight",
        f"{t4}.restore.requested", f"{t4}.restore.inflight",
    ):
        with open(os.path.join(hdir, name), "w") as fh:
            fh.write("{}")
    for inst in (t2, t3, t5):
        with open(os.path.join(hdir, f"{inst}.deltacommit"),
                  "w") as fh:
            fh.write("{}")
    with open(os.path.join(hdir, f"{t2}.savepoint"), "w") as fh:
        json.dump({"savepointedAt": t2}, fh)
    with open(os.path.join(hdir, f"{t4}.restore"), "w") as fh:
        json.dump({
            "savepointToRestoreTimestamp": t2,
            "instantsToRollback": [t3],
        }, fh)

    # ---- the reader: timeline -> restore applied -> block walk ----
    completed: set[str] = set()
    savepoints: set[str] = set()
    restores: dict[str, dict] = {}
    for f in sorted(os.listdir(hdir)):
        parts = f.split(".")
        if parts[1] not in ("commit", "deltacommit", "savepoint",
                           "restore"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) > 2:
            continue
        if parts[1] in ("commit", "deltacommit"):
            completed.add(parts[0])
        elif parts[1] == "savepoint":
            savepoints.add(parts[0])
        else:
            with open(os.path.join(hdir, f)) as fh:
                restores[parts[0]] = json.load(fh)

    from spark_hive_spark.sources.evolution import (
        hudi_apply_restores,
    )

    rolled_back, savepoint_ok = hudi_apply_restores(
        restores, savepoints, completed.discard
    )

    base_paths: list[str] = []
    slices: dict[str, list[tuple[int, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed:
                base_paths.append(os.path.join(tdir, f))
        elif f.startswith(".") and ".log." in f:
            file_id, _base, version = parse_log_name(f)
            slices.setdefault(file_id, []).append(
                (version, os.path.join(tdir, f))
            )

    plan = spark.createDataFrame(
        [
            (fid, json.dumps([p for _, p in sorted(paths)]))
            for fid, paths in sorted(slices.items())
        ],
        "file_id string, logs string",
    ).repartition(len(slices))
    visible_b = sorted(completed)
    rolled_b = sorted(rolled_back)

    def _read_group_logs(batches):
        import pandas as pd

        cols = ["o_orderkey", "o_totalprice", "instant", "seq",
                "applied", "skipped_rb", "is_meta"]
        visible = set(visible_b)
        rolled = set(rolled_b)
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                stream: list[dict] = []
                for path in json.loads(rec.logs):
                    with open(path, "rb") as fh:
                        stream.extend(walk_log_blocks(fh.read()))
                stream, _ = apply_command_blocks(stream)
                rows = []
                applied = skipped_rb = 0
                seq = 0
                for blk in stream:
                    instant = blk["header"][_H_INSTANT]
                    if instant in rolled:
                        skipped_rb += 1  # restore exclusion, by
                        continue         # instant inside the file
                    if instant not in visible:
                        continue
                    applied += 1
                    if blk["type"] != _AVRO_BLOCK:
                        raise NotImplementedError(
                            f"log block type {blk['type']}"
                        )
                    schema = json.loads(blk["header"][_H_SCHEMA])
                    for r in _dec_avro_content(blk["content"],
                                               schema):
                        seq += 1
                        rows.append((r["o_orderkey"],
                                     r["o_totalprice"],
                                     instant, seq, 0, 0, False))
                rows.append((None, 0.0, "", 0,
                             applied, skipped_rb, True))
                yield pd.DataFrame(rows, columns=cols)

    parsed = plan.mapInPandas(
        _read_group_logs,
        "o_orderkey long, o_totalprice double, instant string,"
        " seq int, applied int, skipped_rb int, is_meta boolean",
    ).localCheckpoint(eager=True)

    counters = parsed.filter("is_meta").agg(
        F.sum("applied").cast("int").alias("blocks_applied"),
        F.sum("skipped_rb").cast("int")
        .alias("blocks_skipped_rolled_back"),
    )
    log_df = parsed.filter(~F.col("is_meta")).select(
        "o_orderkey", "o_totalprice", "instant", "seq"
    )
    base = (
        spark.read.parquet(*base_paths)
        .withColumn("instant", F.lit(t1))
        .withColumn("seq", F.lit(0))
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("instant").desc(), F.col("seq").desc()
    )
    merged = (
        base.unionByName(log_df)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    out = (
        merged.agg(
            F.lit(len(completed)).cast("int").alias("commits_visible"),
            F.lit(len(rolled_back)).cast("int")
            .alias("commits_rolled_back"),
            F.count("*").alias("n_orders"),
            F.sum((F.col("instant") == t2).cast("long"))
            .cast("bigint").alias("rows_at_t2"),
            F.sum((F.col("instant") == t5).cast("long"))
            .cast("bigint").alias("rows_at_t5"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(counters))
        .select(
            "commits_visible", "commits_rolled_back",
            "blocks_applied", "blocks_skipped_rolled_back",
            F.lit(bool(savepoint_ok)).alias("savepoint_ok"),
            "n_orders", "rows_at_t2", "rows_at_t5", "revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_clean_savepoint_guard",
    oracle=f"""
        SELECT CAST(3 AS INT) AS commits_completed,
               CAST(1 AS INT) AS files_cleaned,
               CAST(1 AS INT) AS pinned_retained,
               CAST(2 AS INT) AS would_delete_without_guard,
               TRUE AS clean_safety_ok,
               TRUE AS savepoint_readable,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum(
                   "o_totalprice + CASE"
                   " WHEN o_orderkey % 10 = 6 THEN 100.00"
                   " WHEN o_orderkey % 10 = 2 THEN 25.00"
                   " ELSE 0.00 END"
               )} AS revenue,
               CAST(count(*) AS BIGINT) AS asof_n_orders,
               {sql_dsum('o_totalprice')} AS asof_revenue
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "timeline", "clean",
          "savepoint", "retention"),
)
def source_hudi_clean_savepoint_guard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLEAN blocked by a SAVEPOINT (round 19) — the interaction the
    two table services exist to get right: a savepoint pins its
    commit's file slices against cleaning, so a retention policy
    that would otherwise delete them must retain exactly the pinned
    slices and delete the rest. The query runs the CLEAN PLANNER
    engine-side: with keep-latest-1 retention, fg-A's 001 and 002
    bases are both stale — but the savepoint at 001 pins the 001
    base, so the clean deletes ONLY 002
    (``would_delete_without_guard`` = 2 vs ``files_cleaned`` = 1),
    records it in HoodieCleanMetadata shape, and physically removes
    it.

    Post-clean attests close the loop: the current serve (fg-A@003
    + fg-B@001) is unchanged and none of its files were deleted
    (``clean_safety_ok``, the r13 clean contract); and — the point
    of the guard — TIME TRAVEL TO THE SAVEPOINT still reads the
    full 001 state (``savepoint_readable``; asof aggregates pin it
    row-exactly). A cleaner that ignores savepoints passes the
    current-state checks and silently destroys the restore target —
    only the as-of read exposes it.

    Scale posture: clean planning is O(#slices) timeline metadata;
    the pinned-set lookup is O(#savepoints); both reads are the
    usual latest-visible-slice resolution."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_clnsp_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    os.makedirs(hdir)

    t1, t2, t3, t4 = "001", "002", "003", "004"
    par = F.col("o_orderkey") % 2
    km = F.col("o_orderkey") % 10
    evens = orders.filter(par == 0)

    def _write_base(file_id: str, instant: str,
                    df: DataFrame) -> str:
        name = f"{file_id}_0-1-0_{instant}.parquet"
        stage_single_parquet(df, root, tdir, name)
        return name

    def _bump(df: DataFrame, rem: int, delta: int) -> DataFrame:
        return df.withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(18,2)")
             + F.when(km == rem, delta).otherwise(0)
             .cast("decimal(18,2)")).cast("double"),
        )

    a1 = _write_base("fg-A", t1, evens)
    _write_base("fg-B", t1, orders.filter(par == 1))
    a2 = _write_base("fg-A", t2, _bump(evens, 6, 100))
    _write_base("fg-A", t3, _bump(_bump(evens, 6, 100), 2, 25))

    for instant in (t1, t2, t3):
        for sfx in (".commit.requested", ".commit.inflight",
                    ".commit"):
            with open(os.path.join(hdir, instant + sfx), "w") as fh:
                fh.write("{}")
    open(os.path.join(hdir, f"{t1}.savepoint.inflight"), "w").close()
    with open(os.path.join(hdir, f"{t1}.savepoint"), "w") as fh:
        json.dump({"savepointedAt": t1}, fh)

    # ---- the CLEAN PLANNER (keep latest 1 slice per group) ----
    completed: set[str] = set()
    savepoints: set[str] = set()
    for f in sorted(os.listdir(hdir)):
        parts = f.split(".")
        if parts[1] not in ("commit", "savepoint", "clean"):
            raise NotImplementedError(f"Hudi action {parts[1]!r}")
        if len(parts) == 2:
            if parts[1] == "commit":
                completed.add(parts[0])
            elif parts[1] == "savepoint":
                savepoints.add(parts[0])

    groups: dict[str, list[tuple[str, str]]] = {}
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".parquet"):
            fid = f.split("_")[0]
            instant = f.rsplit("_", 1)[1][: -len(".parquet")]
            if instant in completed:
                groups.setdefault(fid, []).append((instant, f))
    stale: list[str] = []
    for fid, slices in groups.items():
        slices.sort()
        stale += [name for _inst, name in slices[:-1]]
    would_delete = len(stale)
    # the GUARD: slices any savepoint pins are not deletable
    pinned = {
        name
        for fid, slices in groups.items()
        for inst, name in slices
        if inst in savepoints
    }
    deletable = [name for name in stale if name not in pinned]
    for name in deletable:
        os.remove(os.path.join(tdir, name))
    with open(os.path.join(hdir, f"{t4}.clean"), "w") as fh:
        json.dump({
            "startCleanTime": t4,
            "partitionMetadata": {"": {
                "deletePathPatterns": deletable,
                "successDeleteFiles": deletable,
                "failedDeleteFiles": [],
            }},
            "totalFilesDeleted": len(deletable),
        }, fh)
    for sfx in (".clean.requested", ".clean.inflight"):
        open(os.path.join(hdir, t4 + sfx), "w").close()

    # ---- post-clean reads + attests ----
    latest = {
        fid: slices[-1][1] for fid, slices in groups.items()
    }
    clean_safety_ok = all(
        not os.path.exists(os.path.join(tdir, name))
        and name not in latest.values()
        for name in deletable
    )
    # pinned slices the retention policy WOULD have deleted — the
    # guard's actual work (fg-B's pinned base is also its latest
    # slice and was never at risk)
    pinned_retained = sum(
        os.path.exists(os.path.join(tdir, name))
        for name in pinned if name in stale
    )
    current = spark.read.parquet(
        *(os.path.join(tdir, n) for n in sorted(latest.values()))
    )
    # time travel to the savepoint: latest slice AS OF t1 per group
    asof = {
        fid: next(
            name for inst, name in reversed(slices) if inst <= t1
        )
        for fid, slices in groups.items()
    }
    savepoint_readable = all(
        os.path.exists(os.path.join(tdir, n)) for n in asof.values()
    )
    asof_df = spark.read.parquet(
        *(os.path.join(tdir, n) for n in sorted(asof.values()))
    )
    cur = current.agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    trav = asof_df.agg(
        F.count("*").alias("asof_n_orders"),
        dsum("o_totalprice").alias("asof_revenue"),
    )
    out = (
        cur.crossJoin(F.broadcast(trav))
        .select(
            F.lit(len(completed)).cast("int")
            .alias("commits_completed"),
            F.lit(len(deletable)).cast("int").alias("files_cleaned"),
            F.lit(int(pinned_retained)).cast("int")
            .alias("pinned_retained"),
            F.lit(would_delete).cast("int")
            .alias("would_delete_without_guard"),
            F.lit(bool(clean_safety_ok)).alias("clean_safety_ok"),
            F.lit(bool(savepoint_readable))
            .alias("savepoint_readable"),
            "n_orders", "revenue", "asof_n_orders", "asof_revenue",
        )
        .localCheckpoint(eager=True)  # 1 row; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_hudi_record_index_update",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS index_entries,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 10 = 5) AS log_updates,
               CAST(1 AS INT) AS log_hfile_blocks,
               TRUE AS moved_keys_resolve_new,
               TRUE AS locations_correct,
               (SELECT CAST(count(*) AS BIGINT) FROM orders
                WHERE o_orderkey % 625 = 0) AS n_found,
               (SELECT {sql_dsum(
                   "o_totalprice + CASE WHEN o_orderkey % 10 = 5"
                   " THEN 100.00 ELSE 0.00 END"
               )} FROM orders WHERE o_orderkey % 625 = 0)
                   AS revenue_found
        FROM orders
    """,
    tags=("source", "hudi", "lakehouse", "metadata-table", "hfile",
          "record-index", "merge-on-read", "point-lookup"),
)
def source_hudi_record_index_update(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """record_index UPDATES through metadata LOG BLOCKS (round 19)
    — what happens to the record-level index when records MOVE file
    groups: a clustering-style upsert at t2 relocates keys ≡ 5
    (mod 10) from fg-B into a new fg-C (+100.00) and rewrites fg-B
    without them; the metadata table does NOT rewrite its record
    index base — the t2 deltacommit appends an HFILE LOG BLOCK
    whose cells carry the moved keys' NEW locations, and lookups
    resolve through the MERGED slice (log wins per key, the same
    MOR rule as every other metadata partition).

    The trap has teeth in both directions: a reader that ignores
    the log block sends the moved keys to fg-B@t2 — which no longer
    CONTAINS them, so every moved probe misses and n_found drops;
    one that replays the log without per-key override serves the
    stale fg-B location for keys present in both images. Probes
    (keys ≡ 0 mod 625 — alternating ≡ 0 and ≡ 5 mod 10, so the set
    crosses moved and unmoved keys) resolve through the merge, the
    named files are read ONCE each, and ``locations_correct`` pins
    every probed key found exactly where the index said;
    ``moved_keys_resolve_new`` pins all moved probes at fg-C@t2.

    Scale posture: the index update is O(moved records) appended —
    never an O(records) base rewrite (that is compaction's job,
    `source_hudi_metadata_table_compaction`); lookups stay
    O(log blocks-per-slice) point gets."""
    import uuid as _uuid

    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_hudi_rliu_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    hdir = os.path.join(tdir, ".hoodie")
    mrli = os.path.join(hdir, "metadata", "record_index")
    mhdir = os.path.join(hdir, "metadata", ".hoodie")
    os.makedirs(mrli)
    os.makedirs(mhdir)

    t1, t2 = "001", "002"
    fids = {
        "fg-A": _uuid.UUID(int=0xA),
        "fg-B": _uuid.UUID(int=0xB),
        "fg-C": _uuid.UUID(int=0xC),
    }
    okey = F.col("o_orderkey")
    par, mod = okey % 2, okey % 10

    def _fname(fid: str, instant: str) -> str:
        return f"{fids[fid]}-0_0-1-0_{instant}.parquet"

    bump = (F.col("o_totalprice").cast("decimal(18,2)")
            + F.lit(100).cast("decimal(18,2)")).cast("double")
    stage_single_parquet(
        orders.filter(par == 0), root, tdir, _fname("fg-A", t1)
    )
    stage_single_parquet(
        orders.filter(par == 1), root, tdir, _fname("fg-B", t1)
    )
    # t2: keys ≡ 5 MOVE to fg-C (+100); fg-B rewritten without them
    stage_single_parquet(
        orders.filter(mod == 5)
        .withColumn("o_totalprice", bump),
        root, tdir, _fname("fg-C", t2),
    )
    stage_single_parquet(
        orders.filter((par == 1) & (mod != 5)), root, tdir,
        _fname("fg-B", t2),
    )
    for instant in (t1, t2):
        for sfx in (".commit.requested", ".commit.inflight",
                    ".commit"):
            with open(os.path.join(hdir, instant + sfx), "w") as fh:
                fh.write("{}")
        for sfx in (".deltacommit.requested", ".deltacommit.inflight",
                    ".deltacommit"):
            with open(os.path.join(mhdir, instant + sfx), "w") as fh:
                fh.write("{}")

    # RLI base at t1 (initial locations), update LOG BLOCK at t2.
    # Payloads are constant per parity file group, so the per-row
    # enc_rli_record collapses to a 2-way select; keys/flags
    # vectorize.
    val_by_parity = {
        0: enc_rli_record("", fids["fg-A"], 0, int(t1)),
        1: enc_rli_record("", fids["fg-B"], 0, int(t1)),
    }

    def _cells(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            k = pdf["o_orderkey"].astype("int64")
            even = (k % 2).to_numpy() == 0
            vals = _np.empty(len(k), dtype=object)
            vals[even] = val_by_parity[0]
            vals[~even] = val_by_parity[1]
            yield _pd.DataFrame({
                "key": k.astype(str).str.encode("ascii"),
                "val": vals,
                "moved": (k % 10).to_numpy() == 5,
            })

    built = orders.select("o_orderkey").mapInPandas(
        _cells, "key binary, val binary, moved boolean"
    ).toPandas()
    base_img = hfile_encode(
        dict(zip(
            (bytes(k) for k in built["key"]),
            (bytes(v) for v in built["val"]),
        )),
        block_size=1024, max_root_entries=16, compression="gz",
    )
    with open(os.path.join(
        mrli, f"record-index-0000_0-0-0_{t1}.hfile"
    ), "wb") as fh:
        fh.write(base_img)
    movers = built[built["moved"]]
    moved_val = enc_rli_record("", fids["fg-C"], 0, int(t2))
    upd_img = hfile_encode(
        {bytes(k): moved_val for k in movers["key"]},
        block_size=1024, max_root_entries=16,
    )
    with open(os.path.join(
        mrli, f".record-index-0000_{t1}.log.1_0-1-0"
    ), "wb") as fh:
        fh.write(encode_log_block(
            _HFILE_BLOCK, {_H_INSTANT: t2}, upd_img
        ))

    # ---- the reader: merged RLI slice -> keyed lookups ----
    completed_meta = {
        f.split(".")[0] for f in os.listdir(mhdir)
        if len(f.split(".")) == 2 and f.endswith(".deltacommit")
    }
    (base_name,) = [
        f for f in os.listdir(mrli) if f.endswith(".hfile")
    ]
    with open(os.path.join(mrli, base_name), "rb") as fh:
        rd = HFileReader(fh.read())
    overrides: dict[bytes, bytes] = {}
    n_blocks = 0
    for lf in sorted(
        (f for f in os.listdir(mrli) if ".log." in f),
        key=lambda n: parse_log_name(n)[2],
    ):
        with open(os.path.join(mrli, lf), "rb") as fh:
            for blk in walk_log_blocks(fh.read()):
                if blk["type"] != _HFILE_BLOCK:
                    raise NotImplementedError(
                        f"log block type {blk['type']} in the "
                        "record_index partition"
                    )
                if blk["header"][_H_INSTANT] not in completed_meta:
                    continue
                n_blocks += 1
                for row, val in HFileReader(blk["content"]).scan():
                    overrides[row] = val  # log wins per key

    def _lookup(key: int) -> dict | None:
        kb = str(key).encode()
        raw = overrides.get(kb)
        if raw is None:
            raw = rd.get(kb)
        return None if raw is None else dec_rli_record(raw)

    present = [
        r[0] for r in orders.filter(okey % 625 == 0)
        .select("o_orderkey").collect()
    ]
    by_file: dict[str, list[int]] = {}
    locations_correct = True
    moved_resolve_new = True
    for key in present:
        rec = _lookup(key)
        if rec is None:
            locations_correct = False
            continue
        fname = (
            f"{rec['fileId']}-{rec['fileIndex']}"
            f"_0-1-0_{rec['instantTime']:03d}.parquet"
        )
        if key % 10 == 5:
            moved_resolve_new &= fname == _fname("fg-C", t2)
        elif key % 2 == 0:
            locations_correct &= fname == _fname("fg-A", t1)
        by_file.setdefault(fname, []).append(key)

    found = None
    for fname, keys in sorted(by_file.items()):
        d = (
            spark.read.parquet(os.path.join(tdir, fname))
            .filter(F.col("o_orderkey").isin(keys))
        )
        found = d if found is None else found.unionByName(d)
    n_present = len(present)
    out = found.agg(
        F.lit(rd.entry_count).cast("bigint").alias("index_entries"),
        F.lit(len(overrides)).cast("bigint").alias("log_updates"),
        F.lit(n_blocks).cast("int").alias("log_hfile_blocks"),
        F.lit(bool(moved_resolve_new))
        .alias("moved_keys_resolve_new"),
        (F.lit(bool(locations_correct))
         & (F.count("*") == n_present)).alias("locations_correct"),
        F.count("*").alias("n_found"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
