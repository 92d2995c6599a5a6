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


def hash_uniform(key: Column | str, seed: int = 0) -> Column:
    """Deterministic uniform in [0, 1) from md5(key:seed) — the seeded-RNG
    replacement for distributed sampling (SURVEY.md §2.L11).

    First 8 md5 hex chars → 32-bit int → /2^32. Engine-portable: Spark's
    ``conv(hex,16,10)`` and DuckDB's ``'0x'||hex`` cast produce the same
    integer, so samples are reproducible across engines, partitionings and
    reruns — the property `rand(seed)` loses the moment partitioning
    changes. 32 bits of resolution is ample for sampling weights (ties
    broken by key below).
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    h = F.substring(F.md5(F.concat(k, F.lit(f":{seed}"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(float(1 << 32))


def sql_hash_uniform(expr: str, seed: int = 0) -> str:
    """DuckDB mirror of :func:`hash_uniform`."""
    return (
        f"CAST(CAST(concat('0x', substring(md5(concat(CAST({expr} AS VARCHAR),"
        f" ':{seed}')), 1, 8)) AS UBIGINT) AS DOUBLE) / {float(1 << 32)}"
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    key: str,
    weight: Column | str,
    k: int,
    group_by: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Efraimidis–Spirakis A-ES weighted sampling without replacement:
    per row draw u = hash_uniform(key), score = u^(1/w); the top-k scores
    ARE a weighted sample without replacement (Efraimidis & Spirakis 2006,
    "Weighted random sampling with a reservoir").

    The 100 TB shape: scoring is a pure per-row expression, selection is
    one top-k — per group via a rank window (WindowGroupLimit pushes the
    cut map-side, same audited shape as E5), or global via orderBy+limit
    (TakeOrdered, no full sort). Deterministic end-to-end: the "random"
    key is the md5 hash, so resampling a grown corpus keeps every
    previously-chosen row whose score still makes the cut — stable
    incremental mixtures, and exactly reproducible by the DuckDB oracle
    (m3 query). Rows with weight ≤ 0 or NULL are excluded (zero-weight
    items are never sampled; E-S scores them 0 anyway).
    """
    from pyspark.sql import Window

    w = (F.col(weight) if isinstance(weight, str) else weight).cast("double")
    scored = df.where(w.isNotNull() & (w > 0)).withColumn(
        "__score", F.pow(hash_uniform(key, seed), F.lit(1.0) / w)
    )
    if group_by:
        win = Window.partitionBy(*group_by).orderBy(
            F.col("__score").desc(), F.col(key).asc()
        )
        return (
            scored.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") <= k)
            .drop("__rn", "__score")
        )
    return (
        scored.orderBy(F.col("__score").desc(), F.col(key).asc())
        .limit(k)
        .drop("__score")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: Column | str,
    fractions: dict[str, float],
    default: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (B8's stratified face, the
    engine-portable twin of ``DataFrame.sampleBy``): keep a row iff
    ``hash_uniform(key, seed) < fraction(stratum)``.

    Pure per-row expression — no shuffle, no state, and (unlike
    ``sampleBy``'s Bernoulli RNG) the kept set is identical across reruns,
    engines and partitionings, and stable under corpus growth: adding rows
    never flips an existing row's keep decision. Strata absent from
    ``fractions`` fall back to ``default``.
    """
    s = F.col(strata) if isinstance(strata, str) else strata
    frac = None
    for label, f_ in fractions.items():
        cond = s == F.lit(label)
        frac = F.when(cond, F.lit(f_)) if frac is None else frac.when(cond, F.lit(f_))
    frac = F.lit(default) if frac is None else frac.otherwise(F.lit(default))
    return df.where(hash_uniform(key, seed) < frac)
