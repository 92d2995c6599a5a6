"""Bloom-filter join pruning (SURVEY.md §2.C11) — an explicit, composable
analogue of Spark's AQE runtime bloom filter (`spark.sql.optimizer.runtime.
bloomFilter.enabled`), for the places the built-in rule does not reach:
non-equi follow-ups, pre-shuffle pruning ahead of a SortMergeJoin whose
build side the optimizer won't materialize, or pruning a scan that feeds
several downstream joins with the same selective dimension.

Why this shape at 100 TB: a fact-side shuffle moves every row that will
later fail the join. Probing a bitmap of the dimension's join keys BEFORE
the shuffle drops non-matching rows at scan time — the filter is a pure
column expression (xxhash64 + bit_get, whole-stage-codegen-able, no UDF,
no extra shuffle), so the only cost is one tiny job over the build side.
False positives are possible (classic Bloom), false negatives are not, so
``bloom_pruned_join`` keeps the real join afterwards and the result is
EXACTLY the plain join's result — the bitmap only sheds shuffle bytes.

The bitmap itself is driver-held (packed ``list[int]`` of 64-bit words,
default 2^16 bits = 8 KiB) and embedded as a literal array — the same
"materialize small build side, broadcast a compact filter" move the engine
itself makes for runtime filters; size is independent of fact-side rows.

Sizing: fpp ≈ (1 − e^{−k·n/m})^k for n distinct keys, m bits, k hashes —
defaults (m=2^16, k=3) give <0.1% at n=2 000; raise ``num_bits`` for wider
builds (8 KiB per 2^16 bits; a 2^24-bit/2 MiB filter still broadcasts
free).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD = 64


def _positions(col: Column, num_bits: int, k: int, seed: int) -> list[Column]:
    """k independent bit positions for one key: xxhash64(col, seed+i) pmod m.

    Same hash-family construction as the count-min sketch (sketch.py) and
    MinHash (dedup.py): distinct seeds give effectively independent
    64-bit hashes, pmod folds them into [0, num_bits).
    """
    return [
        F.pmod(F.xxhash64(col.cast("string"), F.lit(seed + i)), F.lit(num_bits))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    key: Column | str,
    num_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> list[int]:
    """ONE small job over the build (dimension) side → packed bitmap words.

    Explodes each key to its k bit positions, ORs position bits into
    64-bit words with a map-combinable ``bit_or`` aggregate (shuffle is
    ≤ num_bits/64 rows regardless of build rows), and collects the ≤8 KiB
    word table. The collect is the point — like the engine's own runtime
    filter, the bitmap must reach the driver to be pushed into the fact
    scan as a literal predicate. Only call on dimension-sized inputs.
    """
    if num_bits % _WORD:
        raise ValueError("num_bits must be a multiple of 64")
    c = F.col(key) if isinstance(key, str) else key
    pos = F.explode(F.array(*_positions(c, num_bits, k, seed))).alias("pos")
    words = (
        df.where(c.isNotNull())
        .select(pos)
        .select(
            F.shiftright("pos", 6).alias("widx"),
            F.pmod("pos", F.lit(_WORD)).cast("int").alias("bit"),
        )
        .groupBy("widx")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).alias("word"))
        .collect()
    )
    bitmap = [0] * (num_bits // _WORD)
    for row in words:
        bitmap[row["widx"]] = row["word"]
    return bitmap


def bloom_might_contain(
    key: Column | str,
    bitmap: list[int],
    k: int = 3,
    seed: int = 7,
) -> Column:
    """Pure-expression membership probe: AND over the key's k bits.

    ``bit_get(word, bit)`` keeps the probe inside whole-stage codegen —
    no UDF, no join, so Catalyst can push the resulting predicate into
    the parquet scan's post-scan filter and AQE still sees a plain
    ``Filter``. NULL keys probe NULL (→ dropped by ``filter``), matching
    inner-join semantics.
    """
    c = F.col(key) if isinstance(key, str) else key
    num_bits = len(bitmap) * _WORD
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    cond = F.lit(True)
    for pos in _positions(c, num_bits, k, seed):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        cond = cond & (F.bit_get(word, F.pmod(pos, F.lit(_WORD)).cast("int")) == 1)
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    num_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a Bloom prefilter shedding fact rows first.

    Result is identical to ``fact.join(dim, on, how)`` for inner/semi
    joins (Bloom has no false negatives; the real join removes the false
    positives). The win is upstream: the fact side entering the join's
    exchange is already pruned to ~|matching| + fpp·|fact| rows.
    """
    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError("bloom pruning preserves semantics only for inner/semi joins")
    bitmap = bloom_build(dim, on, num_bits=num_bits, k=k, seed=seed)
    pruned = fact.where(bloom_might_contain(on, bitmap, k=k, seed=seed))
    return pruned.join(dim, on, how)
