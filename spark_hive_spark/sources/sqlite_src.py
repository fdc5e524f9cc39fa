"""SQLite database files, read WITHOUT the sqlite library — the
row-store/OLTP ingest floor next to the columnar verticals
(SURVEY.md §2B source surface, round 11).

Operational data reaches analytics pipelines as SQLite files
constantly (mobile app exports, embedded-device logs, browser
profiles), and the format is one of the best-specified on earth
(sqlite.org/fileformat2.html, frozen since 2004). Hand-built here:

- **File header**: the 100-byte prolog — magic, BE page size (1 ⇒
  65536), page count, text encoding (UTF-8 enforced), reserved
  bytes per page.
- **Table b-trees**: page types 5 (interior) / 13 (leaf), the
  8/12-byte page headers, BE cell-pointer arrays, interior cells
  (left-child page + rowid key) and leaf cells (payload length,
  rowid, record), walked in rowid order; page 1's header offset
  quirk handled for the schema tree.
- **Overflow chains**: the spec's minLocal/maxLocal arithmetic
  decides how much payload stays on the leaf; the remainder follows
  a u32-linked page chain — implemented and differentially tested
  with >1-page TEXT values.
- **Record format**: varint header (SQLite's BIG-endian 7-bit
  varints — 9th byte carries 8 bits), serial types 0 NULL /
  1-6 BE two's-complement ints / 7 BE float64 / 8-9 literal 0,1 /
  ≥12 blob / ≥13 text.
- **sqlite_schema**: the catalog is itself a table b-tree on page
  1; the named table's rootpage is resolved from it. An INTEGER
  PRIMARY KEY column is the rowid alias (stored as NULL in the
  record, materialized from the key) — the spec rule every real
  SQLite file exercises.

DIFFERENTIALLY TESTED against the real SQLite engine (Python's
stdlib sqlite3 writes every fixture): values, NULLs, negative ints,
floats, blobs, overflow text — byte-identical table contents
(tests/test_sqlite_src.py).

Scale posture: one SQLite file is one operational shard — the 100 TB
shape is millions of small files, each decoded independently inside
an Arrow batch (binaryFile-style), which is how the registered query
maps them; within a file the b-tree walk is O(pages).

Reference parity: the reference has no row-store surface
(CollegeScorecard.scala:35-157); north-star per SURVEY §2B.
"""

from __future__ import annotations

import os
import shutil
import struct
import tempfile
import uuid
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t

_SQLITE_MAGIC = b"SQLite format 3\x00"


def _varint(b: bytes, p: int) -> tuple[int, int]:
    """SQLite varint: BIG-endian 7-bit groups, at most 9 bytes; the
    9th byte contributes all 8 bits. -> (value as signed 64-bit, pos)."""
    v = 0
    for i in range(8):
        c = b[p + i]
        v = (v << 7) | (c & 0x7F)
        if not c & 0x80:
            return v, p + i + 1
    v = (v << 8) | b[p + 8]
    if v & (1 << 63):
        v -= 1 << 64
    return v, p + 9


class SQLiteFile:
    """Minimal table-b-tree reader over one database image."""

    def __init__(self, data: bytes) -> None:
        if data[:16] != _SQLITE_MAGIC:
            raise ValueError("not a SQLite database (magic missing)")
        ps = struct.unpack_from(">H", data, 16)[0]
        self.page_size = 65536 if ps == 1 else ps
        self.reserved = data[20]
        self.usable = self.page_size - self.reserved
        (enc,) = struct.unpack_from(">I", data, 56)
        if enc != 1:
            raise NotImplementedError(f"text encoding {enc} (not UTF-8)")
        self.n_pages = struct.unpack_from(">I", data, 28)[0]
        self.data = data
        self.pages_touched = 0

    def _page(self, num: int) -> tuple[int, int]:
        """Page number (1-based) -> (byte offset, header offset)."""
        off = (num - 1) * self.page_size
        return off, off + (100 if num == 1 else 0)

    def _record(self, payload: bytes) -> list[Any]:
        hlen, p = _varint(payload, 0)
        types = []
        while p < hlen:
            st, p = _varint(payload, p)
            types.append(st)
        vals: list[Any] = []
        p = hlen
        for st in types:
            if st == 0:
                vals.append(None)
            elif 1 <= st <= 6:
                width = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}[st]
                v = int.from_bytes(
                    payload[p : p + width], "big", signed=True
                )
                vals.append(v)
                p += width
            elif st == 7:
                vals.append(struct.unpack_from(">d", payload, p)[0])
                p += 8
            elif st in (8, 9):
                vals.append(st - 8)
            elif st >= 13 and st % 2 == 1:
                n = (st - 13) // 2
                vals.append(payload[p : p + n].decode())
                p += n
            elif st >= 12:
                n = (st - 12) // 2
                vals.append(payload[p : p + n])
                p += n
            else:
                raise NotImplementedError(f"serial type {st}")
        return vals

    def _payload(self, page_off: int, p: int, plen: int) -> bytes:
        """Leaf-cell payload starting at ``p``: local part + the
        overflow chain when the spec's threshold arithmetic says the
        payload spills (fileformat2.html §B-tree Pages)."""
        u = self.usable
        max_local = u - 35
        if plen <= max_local:
            return self.data[p : p + plen]
        min_local = (u - 12) * 32 // 255 - 23
        local = min_local + (plen - min_local) % (u - 4)
        if local > max_local:
            local = min_local
        out = bytearray(self.data[p : p + local])
        (nxt,) = struct.unpack_from(">I", self.data, p + local)
        while nxt:
            self.pages_touched += 1
            off, _ = self._page(nxt)
            (nxt,) = struct.unpack_from(">I", self.data, off)
            take = min(plen - len(out), u - 4)
            out += self.data[off + 4 : off + 4 + take]
        if len(out) != plen:
            raise ValueError("overflow chain underruns payload length")
        return bytes(out)

    def walk_table(self, root: int) -> Iterator[tuple[int, list[Any]]]:
        """Yield (rowid, record values) in rowid order from a table
        b-tree rooted at page ``root``."""
        self.pages_touched += 1
        off, hoff = self._page(root)
        ptype = self.data[hoff]
        ncells = struct.unpack_from(">H", self.data, hoff + 3)[0]
        if ptype == 5:  # interior table page
            ptr_base = hoff + 12
            children = []
            for i in range(ncells):
                cp = off + struct.unpack_from(
                    ">H", self.data, ptr_base + 2 * i
                )[0]
                (child,) = struct.unpack_from(">I", self.data, cp)
                children.append(child)
            children.append(
                struct.unpack_from(">I", self.data, hoff + 8)[0]
            )
            for child in children:
                yield from self.walk_table(child)
        elif ptype == 13:  # leaf table page
            ptr_base = hoff + 8
            for i in range(ncells):
                cp = off + struct.unpack_from(
                    ">H", self.data, ptr_base + 2 * i
                )[0]
                plen, p = _varint(self.data, cp)
                rowid, p = _varint(self.data, p)
                payload = self._payload(off, p, plen)
                yield rowid, self._record(payload)
        else:
            raise NotImplementedError(f"b-tree page type {ptype}")

    def table_root(self, name: str) -> int:
        """Resolve a table's root page from sqlite_schema (page 1)."""
        for _rowid, row in self.walk_table(1):
            # (type, name, tbl_name, rootpage, sql)
            if row[0] == "table" and row[1] == name:
                return int(row[3])
        raise ValueError(f"table {name!r} not in sqlite_schema")

    def read_table(self, name: str) -> list[list[Any]]:
        """Full table in rowid order, with the INTEGER-PRIMARY-KEY
        rowid alias materialized (NULL in column 0 of a rowid table
        whose first column is the alias)."""
        root = self.table_root(name)
        out = []
        for rowid, row in self.walk_table(root):
            if row and row[0] is None:
                row = [rowid] + row[1:]
            out.append(row)
        return out


_SQLITE_SHARDS = 6


@register(
    "source_sqlite_table_scan",
    oracle=f"""
        SELECT CAST({_SQLITE_SHARDS} AS INT) AS n_shards,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_key,
               CAST(sum(length(o_orderpriority)) AS BIGINT)
                   AS sum_prio_chars,
               {sql_dsum('o_totalprice')} AS revenue,
               TRUE AS btree_multilevel
        FROM orders
    """,
    tags=("source", "sqlite", "rowstore", "btree", "compat"),
)
def source_sqlite_table_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Operational-SQLite ingest (round 11): orders is sharded into
    {6} SQLite database files (written by the REAL SQLite engine —
    stdlib sqlite3 — the shape mobile/embedded exports arrive in),
    and each shard is decoded executor-side through nothing but the
    hand-built layers above: header, sqlite_schema catalog walk,
    multi-level table b-tree in rowid order, BE varints, record
    serial types, the INTEGER-PRIMARY-KEY rowid alias.

    One Arrow-batched task per shard (the 100 TB shape is millions
    of independent small files); `btree_multilevel` pins that every
    shard actually had interior pages (a reader that only handled
    leaf roots would raise). The oracle recomputes all aggregates
    from the raw table — any varint/serial-type/b-tree slip flips
    the hash."""
    import sqlite3

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_sqlite_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    rows = orders.collect()  # bounded fixture-build materialization
    paths = []
    for s in range(_SQLITE_SHARDS):
        path = os.path.join(root, f"shard{s}.db")
        con = sqlite3.connect(path)
        con.execute("PRAGMA page_size = 512")  # force deep b-trees
        con.execute(
            "CREATE TABLE orders ("
            "o_orderkey INTEGER PRIMARY KEY, "
            "o_orderpriority TEXT, o_totalprice REAL)"
        )
        con.executemany(
            "INSERT INTO orders VALUES (?,?,?)",
            [
                (r[0], r[1], r[2])
                for r in rows
                if r[0] % _SQLITE_SHARDS == s
            ],
        )
        con.commit()
        con.close()
        paths.append(path)

    plan = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(_SQLITE_SHARDS)

    def _scan(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                with open(rec.path, "rb") as fh:
                    db = SQLiteFile(fh.read())
                troot = db.table_root("orders")
                _, hoff = db._page(troot)
                multilevel = db.data[hoff] == 5  # interior root
                n = key_sum = chars = cents = 0
                for rowid, row in db.walk_table(troot):
                    key = rowid if row[0] is None else row[0]
                    n += 1
                    key_sum += key
                    chars += len(row[1])
                    cents += round(row[2] * 100)
                yield pd.DataFrame({
                    "n": [n], "key_sum": [key_sum], "chars": [chars],
                    "cents": [cents], "multilevel": [bool(multilevel)],
                })

    partials = plan.mapInPandas(
        _scan,
        "n long, key_sum long, chars long, cents long, "
        "multilevel boolean",
    )
    out = partials.agg(
        F.lit(_SQLITE_SHARDS).cast("int").alias("n_shards"),
        F.sum("n").alias("n_rows"),
        F.sum("key_sum").alias("sum_key"),
        F.sum("chars").alias("sum_prio_chars"),
        (F.sum("cents").cast("decimal(18,0)") / 100)
        .cast("double").alias("revenue"),
        F.min("multilevel").alias("btree_multilevel"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
