"""The main correctness gate, run locally: every registered query with
an oracle must match DuckDB on the same data (count + schema + values).
Mirrors the driver's CORRECTNESS check at a smaller SF."""

from __future__ import annotations

import pytest

from spark_hive_spark.plans.registry import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_check import assert_canonicalizable, compare

_QUERIES = all_queries()


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
    if q.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, duck.sql(q.oracle), name)
    assert not problems, "\n".join(problems)


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
