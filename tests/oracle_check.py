"""Local mirror of the driver's correctness gate.

For a registered query with an oracle, run the Spark DataFrame and the
DuckDB SQL over the same parquet tables and compare: row count, column
names, and order-insensitive values. Comparison is EXACT on the
stringified values (like the driver's value hash) — queries must
produce bit-identical results in both engines, which the registry's
determinism rules (decimal-exact sums, round-6 irrational stats,
matching output types) are designed to guarantee. Timestamps are
compared tz-naive; Decimals compare as their exact string.
"""

from __future__ import annotations

import datetime as _dt
from decimal import Decimal


def assert_canonicalizable(df, name: str = "query") -> None:
    """Fail if the DataFrame's top-level schema contains a type the
    grading driver cannot canonicalize.

    The driver compares results by loading both engines' rows into
    pandas and running ``sort_values`` over ALL columns; list / map /
    struct cells are unhashable there and crash the comparison before
    any values are checked (round-4 postmortem: ``arr_order_line_parts``).
    Every registered query must therefore return only scalar columns —
    serialize arrays with ``array_join``/``to_json`` in BOTH engines."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns break the driver's pandas "
        f"canonicalization (sort_values over list/map/struct cells raises "
        f"'unhashable type') — array_join/to_json them in both engines: {bad}"
    )


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple(
        (x is None, str(type(x).__name__), str(x)) for x in row
    )


def compare(
    spark_df, duck_rel, name: str = "query", stats: dict | None = None
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass).

    If ``stats`` is passed, records ``stats["n_rows"]`` from the one
    collect() so callers don't re-execute the query for a row count."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = list(duck_rel.columns)
    # DuckDB sum() over any integer type yields HUGEINT (int128). Python's
    # fetchall() hides this (plain int), but the driver hashes via Arrow,
    # where int128 -> decimal128(38,0) != Spark's int64 — a guaranteed
    # hash-fail. Lint it here so it can't pass locally and fail the sweep.
    for c, ty in zip(d_cols, duck_rel.types):
        if str(ty) == "HUGEINT":
            problems.append(
                f"{name}: oracle col {c} is HUGEINT (integer sum?) — "
                f"CAST(... AS BIGINT) or the driver value-hash will differ"
            )
    if problems:
        return problems
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems

    order = sorted(s_cols)
    s_rows = [
        tuple(_norm(row[c]) for c in order) for row in spark_df.collect()
    ]
    if stats is not None:
        stats["n_rows"] = len(s_rows)
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
            # exact: value AND python type (int 5 != float 5.0 — the
            # driver hashes stringified values, so types must align)
            if type(sv) is not type(dv) or str(sv) != str(dv):
                problems.append(
                    f"{name}: row {i} col {c}: spark={sv!r} duck={dv!r}"
                )
                n_bad += 1
            if n_bad >= 5:
                problems.append(f"{name}: ... (stopping after 5 diffs)")
                return problems
    return problems


# ---- scan-duplication lint (VERDICT r9 task 3) ----------------------
# The multi-consumer recompute class (one stage re-derived per
# consumer: r7 caught 9 queries, r9 caught pipeline_corpus_curation at
# 9 scans) kept reappearing because the plan audit was manual. Every
# parity test now also counts `Relation [...]` leaves per table on the
# optimized LOGICAL plan (pre-AQE — physical treeStrings double-print
# under AQE) and compares against the committed per-query budget in
# tests/scan_budget.json. Cached stages (InMemoryRelation) print their
# fill-plan innerChildren, so a budget also pins HOW a stage is served.

_FIRST_COL_TO_TABLE = {
    "r_regionkey": "region",
    "n_nationkey": "nation",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "ps_partkey": "partsupp",
    "o_orderkey": "orders",
    "l_orderkey": "lineitem",
    "event_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# headroom for queries not yet in scan_budget.json: enough for a join
# of a few tables or an intentional small self-join, far below the
# 8-14-scan pathology this lint exists to catch
DEFAULT_TABLE_SCAN_BUDGET = 4


def scan_counts(df) -> dict:
    """Per-table `Relation [` leaf counts on the optimized plan."""
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    out: dict[str, int] = {}
    for m in re.finditer(r"Relation \[([A-Za-z0-9_]+)", plan):
        tbl = _FIRST_COL_TO_TABLE.get(m.group(1), f"?{m.group(1)}")
        out[tbl] = out.get(tbl, 0) + 1
    return out


def check_scan_budget(df, name: str, budgets: dict) -> list:
    """Return violation strings if `df` scans any table more often
    than its committed budget (or the default for new queries)."""
    counts = scan_counts(df)
    budget = budgets.get(name, {})
    problems = []
    for tbl, n in counts.items():
        allowed = budget.get(tbl, DEFAULT_TABLE_SCAN_BUDGET)
        if n > allowed:
            problems.append(
                f"{name}: {n} scans of {tbl} (budget {allowed}) — a new "
                "multi-consumer recompute? cache the shared stage, or if "
                "the extra scan is intentional (self-join, audit twin), "
                "raise this query's entry in tests/scan_budget.json"
            )
    return problems
