"""The main correctness gate, run locally: every registered query with
an oracle must match DuckDB on the same data (count + schema + values).
Mirrors the driver's CORRECTNESS check at a smaller SF."""

from __future__ import annotations

import pytest

import json
import pathlib

from spark_hive_spark.plans.registry import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_check import (
    assert_canonicalizable,
    check_scan_budget,
    compare,
)

_QUERIES = all_queries()
_SCAN_BUDGETS = json.loads(
    (pathlib.Path(__file__).parent / "scan_budget.json").read_text()
)


def test_no_round_over_rational_avg():
    """Lint: round(avg(...)) over an integer/2dp-valued expression is a
    cross-engine hash hazard (a rational .xxxxxx5 quotient rounds
    HALF_UP in Spark but to-nearest-even binary in DuckDB). Only
    genuinely irrational inputs (sqrt/stddev/ln/acos — half-boundaries
    are measure-zero there) may round an average; everything else must
    use the exact-sum / single-division form (sql_davg)."""
    irrational_markers = ("sqrt", "stddev", "ln(", "acos", "log(")
    offenders = [
        name
        for name, q in _QUERIES.items()
        if q.oracle
        and "round(avg(" in q.oracle.lower().replace(" ", "")
        and not any(m in q.oracle.lower() for m in irrational_markers)
    ]
    assert not offenders, f"round-over-avg in oracle SQL: {offenders}"


@pytest.mark.parametrize(
    "name", sorted(_QUERIES), ids=sorted(_QUERIES)
)
def test_query_matches_oracle(spark, duck, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    # the driver's pandas canonicalization cannot hash list/map/struct
    # cells — every query's output must be scalar-only (round-4 bug)
    assert_canonicalizable(df, name)
    # scan-duplication lint (VERDICT r9 task 3): the optimized plan
    # must not scan any table more often than its committed budget —
    # the automated gate for the multi-consumer recompute class
    scan_problems = check_scan_budget(df, name, _SCAN_BUDGETS)
    assert not scan_problems, "\n".join(scan_problems)
    if q.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, duck.sql(q.oracle), name)
    assert not problems, "\n".join(problems)


def test_no_rounded_interpolated_percentile():
    """Lint: round(quantile_cont(...)) / round(percentile_cont(...))
    over terminating-decimal inputs (money columns) is the next
    cross-engine hash hazard class after round(avg(...)): linear
    interpolation between two 2dp cents values lands EXACTLY on a
    .xx5 half-boundary whenever the interpolation weight is a dyadic
    fraction, and Spark rounds HALF_UP where DuckDB rounds
    to-nearest-even (this genuinely hit quantile_mapping_price_drift
    in round 7 — the fix is exact-integer cents interpolation, see
    `_qm_cohort`, not tighter rounding). Irrational inputs
    (sqrt/stddev/ln/acos) are measure-zero at half-boundaries and may
    round, same escape as the avg lint."""
    import re

    irrational_markers = ("sqrt", "stddev", "ln(", "acos", "log(")
    pat = re.compile(r"round\(\s*(quantile_cont|percentile_cont|percentile)\(")
    offenders = [
        name
        for name, q in _QUERIES.items()
        if q.oracle
        and pat.search(q.oracle.lower())
        and not any(m in q.oracle.lower() for m in irrational_markers)
    ]
    assert not offenders, (
        f"round over interpolated percentile in oracle SQL: {offenders} — "
        "interpolate in exact integer cents instead"
    )


def test_no_naked_spark_partition_id_grouping():
    """Lint: spark_partition_id() is only stable while the exact
    physical partitioning it was read from stays pinned — grouping by
    it directly (groupBy(spark_partition_id())), or deriving a pid
    column without immediately freezing the frame (cache /
    localCheckpoint in the same fluent chain), lets a re-executed or
    AQE-re-planned stage assign DIFFERENT pids across the two jobs
    that consume it (the distributed_quantiles counts-then-pick
    pattern would silently mis-pick). Every use must be
    materialize-then-freeze."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parents[1] / "spark_hive_spark"
    offenders = []
    for path in sorted(root.rglob("*.py")):
        src = path.read_text()
        for m in re.finditer(r"spark_partition_id\(\)", src):
            before = src[max(0, m.start() - 120) : m.start()]
            after = src[m.end() : m.end() + 250]
            if re.search(r"groupBy\(\s*[^)]*$", before):
                offenders.append(f"{path.name}: groupBy on naked pid")
            elif not re.search(r"\.(cache|localCheckpoint)\(", after):
                offenders.append(
                    f"{path.name}: pid column not frozen "
                    "(cache/localCheckpoint) in the same chain"
                )
    assert not offenders, offenders


def test_no_unguarded_negated_round():
    """Lint: round(-expr, k) where expr can be ~0 stringifies as -0.0
    in one engine and 0.0 in the other (bit twice in round 7: Heaps
    beta, retention decay lambda — both only at the sf0.001 scale).
    Any negation directly inside a round() must carry the `+ 0.0`
    normalization."""
    import re

    offenders = []
    for name, q in _QUERIES.items():
        if not q.oracle:
            continue
        for m in re.finditer(r"round\(\s*-", q.oracle):
            seg = q.oracle[m.start():]
            depth, call = 0, seg
            for i, ch in enumerate(seg):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        call = seg[: i + 1]
                        break
            if "+ 0.0" not in call:
                offenders.append(name)
    assert not offenders, f"unguarded round(-...): {sorted(set(offenders))}"
