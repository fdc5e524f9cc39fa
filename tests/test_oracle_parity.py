"""The main correctness gate, run locally: every registered query with
an oracle must match DuckDB on the same data (count + schema + values).
Mirrors the driver's CORRECTNESS check at a smaller SF."""

from __future__ import annotations

import pytest

from spark_hive_spark.plans.registry import all_queries
from tests.conftest import SF_ORACLE
from tests.oracle_check import compare

_QUERIES = all_queries()


@pytest.mark.parametrize(
    "name", sorted(_QUERIES), ids=sorted(_QUERIES)
)
def test_query_matches_oracle(spark, duck, name):
    q = _QUERIES[name]
    df = q.fn(spark, SF_ORACLE)
    assert df.columns, f"{name}: no columns"
    if q.oracle is None:
        # rows-only check, like the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, duck.sql(q.oracle), name)
    assert not problems, "\n".join(problems)
