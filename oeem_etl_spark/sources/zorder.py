"""Z-order (Morton) clustering for multi-dimensional data skipping.

Parquet scans skip row groups whose min/max column statistics exclude the
query predicate. A sort on one column gives perfect skipping on that
column and none on others; interleaving the bits of two bucketized columns
(the Morton curve) clusters rows so that BOTH columns' min/max ranges are
narrow within each row group — box predicates on either or both dimensions
skip most of the file. This is the same idea behind Delta/Iceberg
Z-ORDER/OPTIMIZE, built here from plain Spark expressions:

- :func:`zorder_key` — 2×``bits``-bit Morton key as an integer Column
  (pure shift/mask arithmetic, whole-stage-codegen'd).
- :func:`write_zordered` — range-partition + sort by the key, write
  parquet. Range partitioning keeps the curve contiguous across files so
  file-level stats prune too, not just row groups.

At 100 TB this is a layout decision made once per table at write time;
readers need no code change — pruning happens in the parquet reader from
footer statistics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a value into [0, 2^bits) given per-column min/max bounds."""
    span = (hi - lo).cast("double")
    scaled = F.when(
        span > 0,
        ((c.cast("double") - lo.cast("double")) / span * ((1 << bits) - 1)),
    ).otherwise(F.lit(0.0))
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints: Morton
    order. a's bit i lands at position 2i, b's at 2i+1."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        key = key + abit * F.lit(1 << (2 * i)) + bbit * F.lit(1 << (2 * i + 1))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    n_files: int = 4,
    small_row_groups: bool = False,
) -> None:
    """Write ``df`` parquet clustered on the Morton curve of two columns.

    Bounds for bucketization are computed in the same job via window-free
    scalar aggregation (one extra pass over the two columns — cheap next
    to the write). ``small_row_groups`` shrinks parquet row groups so
    pruning granularity is visible on KB-scale test data; production keeps
    the default ~128 MB groups.
    """
    assert len(cols) == 2, "z-order here is 2-D; chain keys for more dims"
    a, b = (F.col(c) for c in cols)
    bounds = df.agg(
        F.min(a).alias("__alo"),
        F.max(a).alias("__ahi"),
        F.min(b).alias("__blo"),
        F.max(b).alias("__bhi"),
    )
    with_key = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__zkey",
        zorder_key(
            _bucket(a, F.col("__alo"), F.col("__ahi"), bits),
            _bucket(b, F.col("__blo"), F.col("__bhi"), bits),
            bits,
        ),
    ).drop("__alo", "__ahi", "__blo", "__bhi")
    out = (
        with_key.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
    w = out.write.mode("overwrite")
    if small_row_groups:
        w = w.option("parquet.block.size", str(8 * 1024)).option(
            "parquet.page.size", str(2 * 1024)
        )
    w.parquet(path)
