"""Skew-mitigation operators (SURVEY.md §4, §7.4 trap #7).

AQE's skew handling only splits oversized partitions in *joins*; a skewed
aggregation key or an extreme hot key still lands on one task. These
helpers implement the classic salting patterns as reusable compositions:

- :func:`salted_agg` — two-stage aggregation: stage 1 aggregates on
  (key, salt) so a hot key spreads over ``n_salts`` tasks; stage 2 merges
  the per-salt partials. Works for any algebraic aggregate (sum/count/
  min/max — pass the merge expression for stage 2).
- :func:`salted_join` — replicate the small side ``n_salts`` times and
  salt the big side's key, turning one hot-key partition into
  ``n_salts`` even ones. For bounded dims prefer broadcast; salting is
  for when BOTH sides are too big to broadcast and one key is hot.

Salt = ``pmod(hash(entire row), n)`` on the big side — deterministic,
uniform, and free of RNG state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Deterministic uniform salt in [0, n_salts) derived from all columns."""
    return df.withColumn(
        salt_col, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``partial_aggs`` aggregate raw rows per (keys, salt); ``merge_aggs``
    combine the ≤ ``n_salts`` partials per key (referencing the partial
    aliases). Example::

        salted_agg(df, ["k"],
                   [F.sum("v").alias("s"), F.count("v").alias("c")],
                   [F.sum("s").alias("total"), F.sum("c").alias("cnt")])

    Cost model: stage 1's shuffle is keyed on (key, salt) — a key receiving
    X rows now spreads over n_salts reducers; stage 2 shuffles only
    (#keys × n_salts) partial rows. For non-skewed data this wastes one
    tiny extra shuffle, so apply it to known-hot aggregations, not
    everywhere.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, explode the small side.

    The small side is replicated ``n_salts``× (explode of a literal
    sequence — cheap relative to shuffling a hot key into one task), the
    big side gets a uniform salt, and the join key becomes
    (on..., salt) — a hot key's rows now hash to ``n_salts`` partitions.
    Equivalent rows/results to ``big.join(small, on, how)`` for inner and
    left joins (small-side row multiplicity is restored by the salt match).
    """
    salted_big = with_salt(big, n_salts)
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted_big.join(replicated_small, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_collect_list(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """Skew-proof collect_list — the aggregation that partial aggregation
    canNOT collapse (every row survives to the reduce side, so a hot key
    ships all its values to one task). Two stages: collect per (key, salt)
    — a hot key's values spread over ``n_salts`` reducers — then flatten
    the ≤ n_salts partial arrays per key. ``sort=True`` sorts the final
    array so results are deterministic (salt assignment is not an order)."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        F.collect_list(value_col).alias("__part")
    )
    merged = partial.groupBy(*keys).agg(
        F.flatten(F.collect_list("__part")).alias("values")
    )
    if sort:
        merged = merged.withColumn("values", F.sort_array("values"))
    return merged
