"""Registry of declared queries: name -> (Spark callable, DuckDB oracle SQL).

Every operator claimed done in SURVEY.md §2 registers here with:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-side implementation,
  exercising the library operator(s) under test;
- ``sql`` — the equivalent ANSI SQL for the DuckDB oracle, or ``None`` for
  genuinely non-SQL-expressible ops (streaming state machines, approx
  sketches, RNG-dependent sampling) which get a rows-only check.

Contract rules baked in (SURVEY.md §5.2, §7.4): alias every computed column
identically on both sides; round float aggregates on both sides; spell out
null ordering; give every LIMIT a total order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle; None => rows-only check
    tier: str
    survey: str  # SURVEY.md §2 row(s) this query covers, e.g. "D1,F1"


def query(name: str, sql: str | None = None, tier: str = "T1", survey: str = ""):
    """Decorator: register a declared query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, sql=sql, tier=tier, survey=survey)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.sql for n, q in _REGISTRY.items() if q.sql is not None}
