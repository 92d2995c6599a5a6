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


def _ordered_names() -> list[str]:
    """Driver-sweep order: the round-1 driver recorded CORRECTNESS entries
    for exactly the first 50 names yielded by ``queries()`` (a prefix cap),
    so yield the generated greedy set-cover order (plans/query_order.py):
    a short prefix spans every SURVEY §2 tag, the rest run cheapest-first.
    Names missing from the generated file (newly added queries) append in
    registration order; stale names are ignored."""
    try:
        from oeem_etl_spark.plans.query_order import ORDER
    except ImportError:
        ORDER = []
    ordered = [n for n in ORDER if n in _REGISTRY]
    return ordered + [n for n in _REGISTRY if n not in set(ordered)]


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: _REGISTRY[n].sql for n in _ordered_names() if _REGISTRY[n].sql is not None
    }
