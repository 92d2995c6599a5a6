"""Vector math over ``array<float>`` columns via higher-order functions.

All JVM-side (no Python UDFs): ``zip_with`` + ``aggregate`` compile to
codegen'd expressions, so dot products over 64-dim embeddings stay in the
hot path (SURVEY.md §2.H8, §2.L3). Accumulation is sequential left-to-right
in both Spark and DuckDB's list_* equivalents, which keeps float results
deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns (double accumulation)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a: Column | str) -> Column:
    """Squared L2 norm."""
    a = F.col(a) if isinstance(a, str) else a
    return F.aggregate(
        F.transform(a, lambda x: _d(x) * _d(x)), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(norm2(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns NULL)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)
