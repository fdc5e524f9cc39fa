"""Local mirror of the driver's correctness gate.

For a registered query with an oracle, run the Spark DataFrame and the
DuckDB SQL over the same parquet tables and compare: row count, column
names, and order-insensitive values (exact for ints/strings/timestamps;
tight tolerance for floats so genuine logic errors surface while
sub-ULP engine differences don't — queries are expected to round
float aggregates themselves, per the registry's determinism rules).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

FLOAT_ABS = 1e-8
FLOAT_REL = 1e-9


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
        return _dt.datetime(v.year, v.month, v.day)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(spark_df, duck_rel, name: str = "query") -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = list(duck_rel.columns)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems

    # align duck column order to spark's, then sort columns by name as
    # the driver does
    order = sorted(s_cols)
    s_rows = [
        tuple(_norm(row[c]) for c in order) for row in spark_df.collect()
    ]
    d_idx = {c: i for i, c in enumerate(d_cols)}
    d_rows = [
        tuple(_norm(r[d_idx[c]]) for c in order) for r in duck_rel.fetchall()
    ]
    if len(s_rows) != len(d_rows):
        problems.append(
            f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
        )
        return problems

    s_rows.sort(key=_sort_key)
    d_rows.sort(key=_sort_key)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in zip(order, zip(sr, dr)):
            if sv is None and dv is None:
                continue
            if isinstance(sv, float) or isinstance(dv, float):
                if sv is None or dv is None:
                    ok = False
                elif math.isnan(sv) and math.isnan(dv):
                    ok = True
                else:
                    ok = math.isclose(
                        sv, dv, rel_tol=FLOAT_REL, abs_tol=FLOAT_ABS
                    )
                if not ok:
                    problems.append(
                        f"{name}: row {i} col {c}: spark={sv!r} duck={dv!r}"
                    )
                    n_bad += 1
            elif sv != dv:
                problems.append(
                    f"{name}: row {i} col {c}: spark={sv!r} duck={dv!r}"
                )
                n_bad += 1
            if n_bad >= 5:
                problems.append(f"{name}: ... (stopping after 5 diffs)")
                return problems
    return problems
