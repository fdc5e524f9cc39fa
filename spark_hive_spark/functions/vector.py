"""Vector math over `array<float>` embedding columns — pure built-in
higher-order functions (zip_with / aggregate / transform), evaluated
JVM-side inside codegen. No Python in the hot path; elements are
widened to double BEFORE any multiply so results match engines that
compute in float64 (widening float→double is exact).

The sequential fold in `F.aggregate` differs from other engines'
summation order only below 1e-15 relative — callers round cosine /
norm outputs to 6dp (registry determinism rules).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """Squared L2 norm."""
    return dot(a, a)


def norm(a: Column) -> Column:
    return F.sqrt(norm2(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe for zero vectors via nullif."""
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# DuckDB spellings of the same math (1-based list indexing), used by
# oracle SQL strings. `{a}`/`{b}` are list expressions of DOUBLE.
def sql_dot(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i] * {b}[i]))"
    )


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({sql_dot(a, b)} / nullif(sqrt({sql_dot(a, a)})"
        f" * sqrt({sql_dot(b, b)}), 0.0))"
    )
