"""Dataset splitting + scrubbing for training-data pipelines (L-ext).

- :func:`deterministic_split` — stable train/val/test assignment from a
  content-independent hash of the KEY (not ``rand()``): the same row lands
  in the same split on every run, across engines, at any parallelism, and
  new rows never reshuffle old ones — the property RNG sampling (B8)
  cannot give. The hash is md5-derived so an external system (or the
  DuckDB oracle) can reproduce assignments exactly.
- :func:`redact_pii` — regex scrubbing of common PII shapes (emails,
  phone-ish digit runs, SSN-ish triples) before corpus export. Patterns
  kept POSIX-safe (SURVEY.md §2.H2) so they behave identically across
  engines; the real production list is policy-owned and longer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from md5(key).

    Uses the first two md5 hex chars via ``ascii()`` arithmetic — every
    engine with md5+ascii reproduces it (16 bits ≈ uniform enough for
    split ratios; NOT for cryptographic fairness).
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    h = F.md5(k)
    hi = F.ascii(F.substring(h, 1, 1))
    lo = F.ascii(F.substring(h, 2, 1))
    return F.pmod(hi * 256 + lo, F.lit(n_buckets))


def deterministic_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a stable split label by hashed key ranges.

    ``weights`` must sum to ~1; ranges are cumulative percentage bands over
    :func:`split_bucket`, so assignment is pure per-row expression — no
    shuffle, no state, safe at any scale.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = split_bucket(key)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        cum += w * 100
        cond = bucket < F.lit(int(round(cum)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = labels[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


# POSIX-safe PII shapes (no lookarounds/backrefs — identical semantics in
# Spark's Java regex and DuckDB's RE2).
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(col: Column | str) -> Column:
    """Chain the PII regexes over a text column (order matters: specific
    shapes before the greedy phone pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def sql_redact_pii(expr: str) -> str:
    """DuckDB mirror of :func:`redact_pii` (regexp_replace with 'g')."""
    for pat, repl in _PII_PATTERNS:
        escaped = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{escaped}', '{repl}', 'g')"
    return expr
