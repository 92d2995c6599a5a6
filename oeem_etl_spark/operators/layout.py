"""Data-layout operators: Z-order (Morton) clustering keys.

Z-ordering interleaves the bits of several bounded integer columns so
that rows close in EVERY dimension land close in the one-dimensional
sort order — the standard lakehouse technique (Delta/Iceberg `OPTIMIZE
ZORDER BY`) for making per-file min/max statistics prune multi-column
predicates: after range-repartitioning and writing in z order, a filter
on ANY of the interleaved columns touches O(N^((d-1)/d)) of the files
instead of all of them.

The key is pure integer arithmetic (bit j of column c contributes
``2^(j·d + i)``), so it is engine-identical and the layout queries are
hash-exactly oracle-checkable; no UDF, stays in whole-stage codegen.
Columns must first be mapped to bounded non-negative ints — rank, bucket
or truncate upstream (``dense_ids`` composes for strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_width(n_cols: int, bits: int) -> None:
    # the interleaved key must fit a SIGNED 64-bit int: bit position
    # (bits-1)*d + d-1 = d*bits - 1 must stay <= 62, else F.lit(1 << 63)
    # overflows Spark's LongType while DuckDB silently widens the same
    # literal to HUGEINT — a cross-engine divergence, so fail loudly here.
    if n_cols * bits > 63:
        raise ValueError(
            f"z-order key needs {n_cols} cols x {bits} bits = "
            f"{n_cols * bits} interleaved bits; max is 63 (signed 64-bit "
            f"key) — lower `bits` or drop columns"
        )


def _check_hilbert_bits(bits: int) -> None:
    # same signed-64 rule as _check_width for the 2-D Hilbert index:
    # d spans [0, 4^bits), so 2*bits must stay <= 62 or the s*s round
    # literals / final key overflow LongType (ANSI runtime error at
    # best, silent wraparound at worst). Inputs are assumed in
    # [0, 2^bits) — out-of-range x/y produce wrong keys, same contract
    # as zorder_key.
    if bits < 1 or 2 * bits > 62:
        raise ValueError(
            f"hilbert key needs 1 <= bits <= 31 (2*bits <= 62 so the "
            f"[0, 4^bits) key fits a signed 64-bit int); got bits={bits}"
        )


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton code of ``cols`` (each assumed in [0, 2^bits)): bit j of
    cols[i] lands at interleaved position j·d + i. Division/modulo form
    (no bitwise ops) so the identical arithmetic runs in any SQL engine.
    Requires ``len(cols) * bits <= 63`` (signed-64 key)."""
    _check_width(len(cols), bits)
    d = len(cols)
    terms = []
    for i, c in enumerate(cols):
        x = F.col(c).cast("long")
        for j in range(bits):
            bit = (x / F.lit(1 << j)).cast("long") % 2
            terms.append(bit * F.lit(1 << (j * d + i)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_zorder_key(cols: list[str], bits: int = 16) -> str:
    """The DuckDB/ANSI twin of :func:`zorder_key` (same arithmetic).
    Requires ``len(cols) * bits <= 63`` (signed-64 key)."""
    _check_width(len(cols), bits)
    d = len(cols)
    terms = [
        f"((CAST({c} AS BIGINT) // {1 << j}) % 2) * {1 << (j * d + i)}"
        for i, c in enumerate(cols)
        for j in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 16, files: int = 64
) -> DataFrame:
    """Cluster ``df`` for writing: range-repartition on the Morton key
    into ``files`` output partitions and sort within each — one range
    shuffle, after which every written file owns a compact z-range and
    its min/max stats prune on every interleaved column. The helper
    returns the clustered frame (with ``__z``) so callers compose it
    with any sink (parquet/ORC/snapshots)."""
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    return keyed.repartitionByRange(files, "__z").sortWithinPartitions("__z")


def hilbert_key_2d(xcol: str, ycol: str, bits: int = 8) -> Column:
    """2-D Hilbert-curve index of (x, y), each in [0, 2^bits) — the
    locality-superior alternative to :func:`zorder_key`: consecutive key
    values are always GRID NEIGHBORS (no Z-shape jumps), so range reads
    touch tighter rectangles and per-file min/max stats prune better on
    box predicates (Faloutsos & Roseman, PODS'89 — public method).

    The classic per-bit rotate-and-accumulate loop, unrolled at plan
    time into pure integer arithmetic (division/modulo form — the same
    expression runs in any SQL engine; no bitwise ops, no UDF):

    per round s = 2^(bits-1) .. 1:
        rx = (x // s) % 2; ry = (y // s) % 2
        d += s·s·(3·rx + ry - 2·rx·ry)        # == (3*rx) XOR ry
        (x, y) rotates: ry=0 & rx=1 -> (n-1-y, n-1-x); ry=0 -> (y, x)

    ``bits`` is capped at 6 in THIS single-Column form: the inlined tree
    grows ~5x per round (each rotation re-references both coordinates),
    so 8 rounds already OOMs the analyzer. For larger grids use
    :func:`with_hilbert_key`, which stages the rounds as chained selects
    (linear plan — CollapseProject keeps rounds separate because each
    references the previous round's non-trivial columns several times).
    """
    if bits > 6:
        raise ValueError(
            f"hilbert_key_2d inlines {bits} rounds into one expression "
            "(~5^bits tree nodes); use with_hilbert_key for bits > 6"
        )
    n = 1 << bits
    x = F.col(xcol).cast("long")
    y = F.col(ycol).cast("long")
    d = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = (x / F.lit(s)).cast("long") % 2
        ry = (y / F.lit(s)).cast("long") % 2
        d = d + F.lit(s * s) * (F.lit(3) * rx + ry - F.lit(2) * rx * ry)
        nx = (
            F.when(ry == 1, x)
            .when(rx == 1, F.lit(n - 1) - y)
            .otherwise(y)
        )
        ny = (
            F.when(ry == 1, y)
            .when(rx == 1, F.lit(n - 1) - x)
            .otherwise(x)
        )
        x, y = nx, ny
    return d


def with_hilbert_key(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bits: int = 8,
    out: str = "h",
) -> DataFrame:
    """``df`` plus Hilbert index column ``out`` of (xcol, ycol) — the
    scalable form of :func:`hilbert_key_2d`: each rotate-accumulate round
    is one SELECT stage over the previous round's materialized columns,
    so the plan grows LINEARLY in ``bits`` (still pure integer
    expressions, single map stage at runtime, no UDF/shuffle).
    Requires ``bits <= 31`` (signed-64 key) and inputs in [0, 2^bits)."""
    _check_hilbert_bits(bits)
    n = 1 << bits
    cur = df.select(
        "*",
        F.col(xcol).cast("long").alias("__hx"),
        F.col(ycol).cast("long").alias("__hy"),
        F.lit(0).cast("long").alias("__hd"),
    )
    others = [c for c in df.columns]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = (F.col("__hx") / F.lit(s)).cast("long") % 2
        ry = (F.col("__hy") / F.lit(s)).cast("long") % 2
        cur = cur.select(
            *others,
            F.when(ry == 1, F.col("__hx"))
            .when(rx == 1, F.lit(n - 1) - F.col("__hy"))
            .otherwise(F.col("__hy"))
            .alias("__hx"),
            F.when(ry == 1, F.col("__hy"))
            .when(rx == 1, F.lit(n - 1) - F.col("__hx"))
            .otherwise(F.col("__hx"))
            .alias("__hy"),
            (
                F.col("__hd")
                + F.lit(s * s) * (F.lit(3) * rx + ry - F.lit(2) * rx * ry)
            ).alias("__hd"),
        )
    return cur.select(*others, F.col("__hd").alias(out))


def sql_hilbert_cte(src: str, key: str, xexpr: str, yexpr: str,
                    bits: int = 8) -> str:
    """DuckDB/ANSI twin of :func:`hilbert_key_2d`: the same per-bit
    rounds unrolled as chained CTEs h0..h{bits} over ``src`` (each round
    carries (key, x, y, d) — linear SQL, no expression blowup). The
    final CTE is ``h{bits}`` with columns (``key``, d).
    Requires ``bits <= 31`` (signed-64 key) and inputs in [0, 2^bits)."""
    _check_hilbert_bits(bits)
    n = 1 << bits
    parts = [
        f"h0 AS (SELECT {key}, CAST({xexpr} AS BIGINT) AS x,"
        f" CAST({yexpr} AS BIGINT) AS y, CAST(0 AS BIGINT) AS d FROM {src})"
    ]
    for r, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        parts.append(f"""h{r + 1} AS (
      SELECT {key},
        CASE WHEN (y // {s}) % 2 = 1 THEN x
             WHEN (x // {s}) % 2 = 1 THEN {n - 1} - y
             ELSE y END AS x,
        CASE WHEN (y // {s}) % 2 = 1 THEN y
             WHEN (x // {s}) % 2 = 1 THEN {n - 1} - x
             ELSE x END AS y,
        d + {s * s} * (3 * ((x // {s}) % 2) + (y // {s}) % 2
                       - 2 * ((x // {s}) % 2) * ((y // {s}) % 2)) AS d
      FROM h{r})""")
    return ",\n    ".join(parts)
