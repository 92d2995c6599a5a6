"""Helpers shared by the declared-query modules.

Float determinism (SURVEY.md §7.4 trap #1): parallel double summation is
order-dependent, so a raw ``SUM(double)`` can differ in the last bits
between Spark and DuckDB and flip a rounded digit. The fix used everywhere:
cast each (deterministically computed) double value to DECIMAL first, sum
exactly in decimal, cast the total back to double, round. Both engines then
produce bit-identical results regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from oeem_etl_spark.catalog import load_table

T = load_table  # T(spark, sf_dir, name) -> DataFrame


def dsum(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent SUM over doubles: decimal-accumulated, rounded.

    ``scale`` must exceed the data's intrinsic decimal precision: at a tie
    (value exactly ``.5`` at the last kept digit) Spark rounds half-up but
    DuckDB half-even. The fixtures' money-like columns have ≤2dp and their
    2-term products ≤6dp, so scale 6 never ties; arbitrary random doubles
    tie with probability ~ulp/10^-scale ≈ 0.
    """
    c = F.col(col) if isinstance(col, str) else col
    dec = f"decimal(30,{scale})"
    return F.round(F.sum(c.cast(dec)).cast("double"), scale).alias(alias)


def davg(col: Column | str, alias: str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum / count, then round."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast("decimal(30,6)")).cast("double")
    return F.round(total / F.count(c), scale).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`dsum`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,{scale}))) AS DOUBLE), {scale})"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 6) -> str:
    """DuckDB-side mirror of :func:`davg`."""
    return (
        f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({expr}), {scale}) AS {alias}"
    )
