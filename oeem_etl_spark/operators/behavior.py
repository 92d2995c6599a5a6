"""Event-behavior analytics: funnel progression and cohort retention
(SURVEY.md §2.K domain tier — the product-analytics queries every event
warehouse runs next to the K-family time-series ops).

Both operators shuffle only on the user key, and every stage/period
aggregation is map-combinable; at cluster scale pre-bucketing the events
table by user_id makes the whole chain exchange-free after the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    user_key: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Greedy-earliest funnel progression per user: stage i counts only if
    an event of type stages[i] happens STRICTLY AFTER the timestamp that
    satisfied stage i-1 (the earliest such chain — equivalent to ordered-
    subsequence existence). Output: (user_key, stage int) with stage =
    number of funnel steps completed, 0..len(stages).

    Shape: one conditional min-aggregation per stage, each joined back on
    the user key — len(stages) co-partitioned shuffles, no window over
    full event lists and no per-user state blowup (each intermediate is
    one row per user).
    """
    out = df.select(user_key).distinct()
    for i, s in enumerate(stages, 1):
        ev = df.where(F.col(type_col) == s).select(user_key, ts_col)
        if i > 1:
            ev = ev.join(
                out.where(F.col(f"__t{i - 1}").isNotNull()).select(
                    user_key, f"__t{i - 1}"
                ),
                user_key,
            ).where(F.col(ts_col) > F.col(f"__t{i - 1}"))
        ti = ev.groupBy(user_key).agg(F.min(ts_col).alias(f"__t{i}"))
        out = out.join(ti, user_key, "left")
    stage = sum(
        (F.col(f"__t{i}").isNotNull().cast("int") for i in range(1, len(stages) + 1)),
        F.lit(0),
    )
    return out.select(user_key, stage.cast("int").alias("stage"))


def cohort_retention(
    df: DataFrame,
    user_key: str,
    ts_col: str,
    bucket: str = "week",
    days_per_bucket: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users bucketed by their first-activity
    period; output (cohort date, period_offset int, n_users) — how many of
    each cohort were active N periods later.

    date_trunc keeps periods engine-aligned (ISO Monday weeks); offsets
    are exact day arithmetic. Two aggregations + one user-key join; the
    (user, period) distinct is map-combinable.
    """
    period = F.date_trunc(bucket, F.col(ts_col)).cast("date")
    first = df.groupBy(user_key).agg(F.min(period).alias("cohort"))
    active = df.select(F.col(user_key), period.alias("period")).distinct()
    return (
        active.join(first, user_key)
        .groupBy(
            "cohort",
            (F.datediff(F.col("period"), F.col("cohort")) / days_per_bucket)
            .cast("int")
            .alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_key)).alias("n_users"))
    )
