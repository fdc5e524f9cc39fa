"""Deterministic numeric aggregation helpers.

Money columns in the fixtures are 2-decimal values stored as doubles.
Summing doubles is order-dependent (partition/shuffle order differs
between engines and between runs), and ``round(avg(money), 2)`` lands
on exact .xx5 half-boundaries where Spark (decimal-string HALF_UP) and
DuckDB (binary) disagree. Both break an exact value-hash comparison —
and at 1000-executor scale the summation order is genuinely
nondeterministic run to run.

Fix, mirroring TPC-H's actual data model (money is DECIMAL): cast the
measure to an exact decimal of sufficient scale, aggregate in decimal
(exact integer arithmetic — order-independent), and cast the final
result to double. Ratios divide two exact values with one IEEE double
division — bit-identical everywhere. Only genuinely irrational stats
(stddev, sqrt, cosine) need a final round (use 6dp: half-boundaries
there are measure-zero).

Scale note: decimal sums use Spark's built-in decimal aggregate
(JVM, codegen) — no perf downside vs double sums; precision 38 holds
sums far beyond 100 TB row counts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dec(col: Column | str, scale: int = 2) -> Column:
    """Exact-decimal view of a 2dp-ish double column (lossless: the
    stored double is within 5e-15 of its true 2dp value, so nearest-
    scale decimal recovers it identically in Spark and DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent exact sum of a money-ish column, as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: str, scale: int = 2) -> Column:
    """Deterministic average: exact decimal sum, then one double
    division by the non-null count (matches SQL AVG null semantics)."""
    return F.sum(dec(col, scale)).cast("double") / F.count(col)


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"{sql_dsum(expr, scale)} / count({expr})"


def revenue_dec() -> Column:
    """lineitem revenue l_extendedprice*(1-l_discount) in exact decimal
    (price 2dp × discount-complement 2dp → 4dp product, exact)."""
    return dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec("l_discount", 2))


SQL_REVENUE_DEC = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
)
