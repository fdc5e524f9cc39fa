"""Differential tests for the hand-built SQLite reader
(sources/sqlite_src.py) against the REAL SQLite engine (stdlib
sqlite3 writes every fixture): values, NULLs, negative ints, floats,
blobs, overflow chains — byte-identical table contents."""

from __future__ import annotations

import os
import random
import sqlite3

import pytest

from spark_hive_spark.sources.sqlite_src import SQLiteFile, _varint


def _db(tmp_path, name, page_size=512):
    p = str(tmp_path / name)
    con = sqlite3.connect(p)
    con.execute(f"PRAGMA page_size = {page_size}")
    return p, con


def test_full_differential(tmp_path):
    p, con = _db(tmp_path, "t.db")
    con.execute(
        "CREATE TABLE t (k INTEGER PRIMARY KEY, s TEXT, v REAL, b BLOB)"
    )
    rnd = random.Random(42)
    rows = []
    for i in range(3000):
        s = None if i % 71 == 0 else "x" * rnd.randrange(0, 40) + str(i)
        v = None if i % 113 == 0 else rnd.uniform(-1e6, 1e6)
        b = None if i % 97 == 0 else bytes([i % 256]) * (i % 13)
        rows.append((i * 3 - 1500, s, v, b))
    rows.append((999999, "Z" * 5000, 1.5, b"\x01" * 2000))  # overflow
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()
    db = SQLiteFile(open(p, "rb").read())
    got = db.read_table("t")
    ref = sqlite3.connect(p).execute(
        "SELECT k,s,v,b FROM t ORDER BY k"
    ).fetchall()
    assert [tuple(g) for g in got] == ref
    # 3000 rows at 512B pages must be a multi-level tree
    root = db.table_root("t")
    _, hoff = db._page(root)
    assert db.data[hoff] == 5


def test_int_widths_and_literals(tmp_path):
    """Serial types 1-6 (all integer widths) + the 0/1 literals."""
    p, con = _db(tmp_path, "w.db")
    con.execute("CREATE TABLE w (k INTEGER PRIMARY KEY, v INTEGER)")
    vals = [0, 1, -1, 127, -128, 32767, -32768, 8388607, -8388608,
            2**31 - 1, -(2**31), 2**47 - 1, -(2**47), 2**63 - 1,
            -(2**63)]
    con.executemany(
        "INSERT INTO w VALUES (?,?)", list(enumerate(vals))
    )
    con.commit()
    con.close()
    got = SQLiteFile(open(p, "rb").read()).read_table("w")
    assert [g[1] for g in got] == vals


def test_varint_big_endian_9byte():
    # 9-byte varint: 8 continuation bytes + full 8-bit tail
    assert _varint(bytes([0x81, 0x00]), 0) == (128, 2)
    assert _varint(bytes([0xFF] * 8 + [0xFF]), 0)[0] == -1


def test_loud_seams(tmp_path):
    with pytest.raises(ValueError, match="magic"):
        SQLiteFile(b"not a database" + b"\0" * 100)
    p, con = _db(tmp_path, "m.db")
    con.execute("CREATE TABLE m (a TEXT)")
    con.commit()
    con.close()
    db = SQLiteFile(open(p, "rb").read())
    with pytest.raises(ValueError, match="not in sqlite_schema"):
        db.table_root("nope")
