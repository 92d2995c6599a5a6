"""History-tracking operators (K-ext): SCD2 versioning and snapshot CDC.

The reference's upload model is last-writer-wins upsert (K6); production
warehouses usually also need the two history-preserving forms:

- :func:`scd2_from_events` — build a slowly-changing-dimension type-2
  history from a change stream: one row per (key, version) with
  ``valid_from`` / ``valid_to`` / ``is_current``, consecutive same-value
  versions collapsed.
- :func:`diff_snapshots` — change-data-capture between two snapshots of
  the same keyed table: each key labeled ``insert`` / ``delete`` /
  ``update`` (value change), unchanged keys dropped.

Both are pure window/join compositions — one shuffle on the key each — and
oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_events(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """SCD2 history from a change stream.

    Rows are versions ordered by ``ts_col`` (ties broken by ``tiebreak``)
    per key; runs of identical ``value_cols`` collapse into one version
    (the first event of the run); ``valid_to`` is the next version's
    ``valid_from`` (NULL for the current version), ``is_current`` marks
    the open row. Single shuffle on ``key``; windows reuse the same
    partitioning so Catalyst plans one Exchange.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    vals = [F.col(c) for c in value_cols]
    # eqNullSafe, not `!=`: ordinary struct comparison returns NULL when a
    # member is NULL, which would silently swallow null->value transitions.
    prev = F.lag(F.struct(*vals)).over(w)
    changed = F.when(
        prev.isNull() | ~prev.eqNullSafe(F.struct(*vals)), F.lit(1)
    ).otherwise(F.lit(0))
    runs = df.withColumn("__chg", changed).withColumn(
        "__version", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # first event of each run opens the version
    opened = (
        runs.where(F.col("__chg") == 1)
        .select(
            F.col(key),
            *vals,
            F.col(ts_col).alias("valid_from"),
            F.col("__version").alias("version"),
        )
    )
    # version in the orderBy: when two collapsed versions share a
    # valid_from timestamp (possible with tied event timestamps), ordering
    # by valid_from alone leaves the lead() — and hence which version gets
    # the empty interval — shuffle-order-dependent, while oracles order by
    # (valid_from, version). version is the deterministic tie-break.
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from").asc(), F.col("version").asc())
    return opened.select(
        key,
        *value_cols,
        "version",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key: str,
    value_cols: list[str],
) -> DataFrame:
    """CDC between snapshots: (key, change, value_cols from the surviving
    side — new for insert/update, old for delete). One full-outer join on
    the key; unchanged rows are filtered before any downstream work."""
    o = old.select(
        F.col(key).alias("__ok"),
        *[F.col(c).alias(f"__o_{c}") for c in value_cols],
    )
    n = new.select(
        F.col(key).alias("__nk"),
        *[F.col(c).alias(f"__n_{c}") for c in value_cols],
    )
    j = o.join(n, o["__ok"] == n["__nk"], "full_outer")
    o_struct = F.struct(*[F.col(f"__o_{c}") for c in value_cols])
    n_struct = F.struct(*[F.col(f"__n_{c}") for c in value_cols])
    change = (
        F.when(F.col("__ok").isNull(), "insert")
        .when(F.col("__nk").isNull(), "delete")
        .when(~o_struct.eqNullSafe(n_struct), "update")  # null-safe: see scd2
    )
    # Per-column values come from the surviving side: old for delete, new
    # otherwise.  NOT coalesce(new, old) — an update that sets a value column
    # to NULL must emit NULL, not the stale old value.
    is_delete = F.col("__nk").isNull()
    out_vals = [
        F.when(is_delete, F.col(f"__o_{c}")).otherwise(F.col(f"__n_{c}")).alias(c)
        for c in value_cols
    ]
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            F.coalesce(F.col("__nk"), F.col("__ok")).alias(key), F.col("change"), *out_vals
        )
    )
