"""DataFrame-native count-min sketch: approximate frequencies / heavy
hitters with bounded state (SURVEY.md §2.D7-D8 family — the third sketch
surface next to approx_percentile and the HLL rollup in d15).

Spark ships ``F.count_min_sketch`` but it emits an opaque JVM binary with
no SQL-side query surface. This module keeps the sketch AS A DATAFRAME of
(row, bucket, cnt) cells, which buys three things the binary can't do:

- **queryable**: estimates are a join, so probing 10⁶ tokens is one
  broadcast hash join, not a driver loop over a deserialized object;
- **mergeable in SQL**: sketches add cell-wise — union + groupBy sum —
  so per-partition / per-day sketches roll up without ever rescanning
  rows (same persist-partial-sketches pattern as the d15 HLL rollup);
- **bounded state**: ≤ depth·width cells regardless of input cardinality
  (cells materialize only when hit, so the frame is also sparse).

Estimate guarantee (standard CMS, Cormode & Muthukrishnan 2005):
``exact ≤ estimate ≤ exact + ε·N`` with probability 1−δ where
ε = e/width, δ = e^−depth; the lower bound is deterministic. Property-
tested in tests/test_clustering.py against exact counts.

Scale shape: building is explode(depth)→one map-combinable groupBy on
(row, bucket) — the combine collapses to ≤ depth·width cells per task
before the shuffle, so shuffle bytes are bounded by the sketch size times
task count, independent of input rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(col: Column, depth: int, width: int, seed: int) -> Column:
    """array<struct<row,bucket>> — the depth (row, bucket) targets of one
    item. xxhash64(item, seed+row) gives depth independent hash families;
    pmod keeps buckets in [0, width)."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(F.xxhash64(col, F.lit(seed + i)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Build a count-min sketch of ``col`` values → (row, bucket, cnt)."""
    c = F.col(col)
    return (
        df.where(c.isNotNull())
        .select(F.explode(_cells(c, depth, width, seed)).alias("__cell"))
        .groupBy(
            F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (exact: CMS is a linear
    sketch, so merge-then-estimate equals build-on-the-union)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Estimated count per probe row: min over the probe's depth cells.

    The sketch side is ≤ depth·width rows and is broadcast, so probing is
    a map-side join however many probes there are. Missing cells count 0
    (value never seen in that row — CMS min is then exact).
    """
    c = F.col(col)
    exploded = probes.select(
        c, F.explode(_cells(c, depth, width, seed)).alias("__cell")
    ).select(c, F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket"))
    joined = exploded.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def heavy_hitters_exact(
    df: DataFrame, token_col: Column | str, k: int = 20
) -> DataFrame:
    """Exact corpus-wide top-k values with counts — the two-phase
    (map-combine then single reduced top-k) verify twin for CMS-based
    candidate generation. Total order (n desc, token asc)."""
    c = F.col(token_col) if isinstance(token_col, str) else token_col
    return (
        df.select(c.alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


HLL_REM_BITS = 56  # top 8 hash bits select the register bucket


def hll_registers(df: DataFrame, key_col: str, group_col: str) -> DataFrame:
    """HyperLogLog REGISTER frame per group — the exact-oracle-checkable
    half of HLL (the float estimate lives with Spark's Datasketches
    surface, d15): bucket = top 8 bits of xxhash64(key), rank =
    leading-zero count of the remaining 56 bits + 1, one (group, bucket,
    max rank) row per occupied register. Unions/rollups are CELL-WISE
    MAX — exactly mergeable, ≤ 256 rows per group regardless of input
    rows. bin() has no leading zeros in Spark, so 57 − length(bin(rem))
    is the exact integer leading-zero rank (rem = 0 ⇒ rank 57)."""
    h = F.xxhash64(key_col)
    rem = h.bitwiseAND(F.lit((1 << HLL_REM_BITS) - 1))
    rank = F.when(rem == 0, F.lit(57)).otherwise(
        F.lit(57) - F.length(F.bin(rem))
    )
    return (
        df.select(
            F.col(group_col),
            F.shiftrightunsigned(h, HLL_REM_BITS).alias("bucket"),
            rank.alias("rank"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("rank").cast("long").alias("r"))
    )
