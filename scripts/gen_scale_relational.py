"""Generate a 10x relational fixture (orders/lineitem/customer/
supplier/part/events + unchanged nation/region dims) for the sf1
scale datapoints of the RELATIONAL core (VERDICT r8 task 4) — the
existing sf1 fixture covers only documents/embeddings.

Scale model: each fact table is replicated MULT times with per-replica
key offsets applied consistently across tables, so every replica is a
self-contained copy of the sf0.1 universe — join fan-outs, group
sizes per key, date ranges, and value distributions are IDENTICAL to
sf0.1 while row counts and distinct-key counts grow 10x. That is the
right model for measuring shuffle/scan growth: per-key work is
constant, the number of keys scales. Dims (nation/region) stay fixed,
as they would at 100 TB.

Deterministic (pure arithmetic on source rows, no RNG). Output:
testdata_scale/sf1/{orders,lineitem,...}.parquet (next to the
documents/embeddings the text generator wrote).
Usage: python scripts/gen_scale_relational.py [mult] [out_label]
       # defaults: 10 sf1   (e.g. "50 sf5" for the 50x fixture)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
_SCALE_ROOT = os.path.join(os.path.dirname(__file__), "..", "testdata_scale")

KO = 10_000_000   # orderkey offset per replica
KC = 1_000_000    # custkey offset
KS = 100_000      # suppkey offset
KP = 1_000_000    # partkey offset
KE = 10_000_000   # event_id offset
KU = 1_000_000    # user_id offset

# per-table: {column: offset}; every other column passes through
OFFSETS = {
    "orders": {"o_orderkey": KO, "o_custkey": KC},
    "lineitem": {"l_orderkey": KO, "l_partkey": KP, "l_suppkey": KS},
    "customer": {"c_custkey": KC},
    "supplier": {"s_suppkey": KS},
    "part": {"p_partkey": KP},
    "events": {"event_id": KE, "user_id": KU},
}


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    OUT = os.path.join(  # noqa: N806
        _SCALE_ROOT, sys.argv[2] if len(sys.argv) > 2 else "sf1"
    )
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for tbl, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r * {offs[c]} AS {c}" if c in offs else c for c in cols
        )
        dst = os.path.join(OUT, f"{tbl}.parquet")
        con.sql(
            f"""COPY (SELECT {sel}
                      FROM '{SRC}/{tbl}.parquet', range({mult}) t(r)
                      ORDER BY r) TO '{dst}' (FORMAT PARQUET)"""
        )
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{tbl}: {n} rows")
    for tbl in ("nation", "region"):
        dst = os.path.join(OUT, f"{tbl}.parquet")
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{dst}'"
            " (FORMAT PARQUET)"
        )
        print(f"{tbl}: copied unchanged")


if __name__ == "__main__":
    main()
