"""Time-series / interval ETL operators (SURVEY.md §2.K).

The reference's core domain job: irregular interval meter reads →
calendarized, gap-filled, deduplicated series (SURVEY.md §2.K [PK-high]).
Re-expressed as DataFrame compositions: each operator is one or two
shuffles, no UDFs, and works identically on batch and (where marked)
streaming inputs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_FREQ_INTERVAL = {
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 7 DAY",
    "month": None,  # months are irregular; use add_months on the grid
}


def resample_interval(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    freq: str,
    aggs: Sequence[Column],
) -> DataFrame:
    """Bucket irregular records into a fixed frequency per key (K3).

    ``date_trunc`` keeps the bucket computation JVM-side and lets the
    single hash-aggregate do partial (map-side) combining — at 100 TB the
    shuffle carries only one row per (key, bucket), not the raw reads.
    Streaming-safe: substitute ``F.window`` when a watermark is attached.
    """
    bucket = F.date_trunc(freq, F.col(ts)).alias("bucket")
    return df.groupBy(*[F.col(k) for k in keys], bucket).agg(*aggs)


def fill_gaps(
    df: DataFrame,
    keys: Sequence[str],
    bucket: str,
    value: str,
    freq: str = "day",
    forward_fill: bool = True,
) -> DataFrame:
    """Materialize missing buckets per key between each key's min and max,
    optionally forward-filling the value (K4).

    The dense grid is generated with ``sequence()`` + ``explode`` from one
    (min, max) row per key — the expensive part is one groupBy over the
    input and one re-join; grid cardinality is bounded by time span, not
    input rows, so this scales independently of read volume.
    """
    interval = _FREQ_INTERVAL[freq]
    span = df.groupBy(*keys).agg(
        F.min(bucket).alias("__min_b"), F.max(bucket).alias("__max_b")
    )
    if interval is not None:
        grid = span.select(
            *keys,
            F.explode(F.expr(f"sequence(__min_b, __max_b, {interval})")).alias(bucket),
        )
    else:  # month: irregular length — explode a month-offset index, add_months
        assert freq == "month", freq
        n_months = F.expr("months_between(__max_b, __min_b)").cast("int")
        grid = span.select(
            *keys,
            F.col("__min_b"),
            F.explode(F.sequence(F.lit(0), n_months)).alias("__m"),
        ).select(
            *keys,
            # add_months yields DATE; cast back so bucket keeps its type
            F.add_months(F.col("__min_b"), F.col("__m"))
            .cast("timestamp")
            .alias(bucket),
        )
    joined = grid.join(df, [*keys, bucket], "left")
    if not forward_fill:
        return joined
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.withColumn(value, F.last(value, ignorenulls=True).over(w))


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_minutes: int,
) -> DataFrame:
    """Gaps-and-islands sessionization (batch twin of §2.I3 session_window):
    a new session starts when the gap from the previous event exceeds the
    threshold. Returns the input plus a ``session_id`` (per-key ordinal).

    Same shuffle shape as streaming ``session_window`` state: partition by
    key, order by time, two window passes (lag + running sum).
    """
    w = Window.partitionBy(*keys).orderBy(ts)
    gap_us = gap_minutes * 60_000_000
    is_new = (
        (F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(w))
        > gap_us
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(F.coalesce(is_new, F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def standardize_schema(
    df: DataFrame,
    mapping: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Rename/cast/reorder raw columns to a canonical schema (K1 — the
    reference parser's core move). ``mapping``: canonical_name ->
    (source_column, cast_type|None). Output column order follows mapping
    order."""
    cols = []
    for canon, (src, typ) in mapping.items():
        c = F.col(src)
        if typ is not None:
            c = c.cast(typ)
        cols.append(c.alias(canon))
    return df.select(*cols)
