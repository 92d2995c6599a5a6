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
