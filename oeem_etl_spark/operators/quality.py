"""Data-quality audit operator (SURVEY.md §2.K9).

The reference validated parsed records before upload; here the audit is a
single grouped aggregation producing one row per source partition with
null rates, duplicate counts, range violations, and row counts — map-side
combinable, so the audit costs one shuffle of one row per group at any
scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def validate_quality(
    df: DataFrame,
    group_by: Sequence[str],
    key: str,
    checks: dict[str, Column],
) -> DataFrame:
    """Audit per group: row count, distinct-key count, plus caller checks.

    ``checks``: audit_column -> boolean Column marking a VIOLATION; each is
    summed into a violation count. Key-duplicate count is derived as
    ``rows - distinct(key)``.
    """
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key)).alias("n_distinct_keys"),
        (F.count(F.lit(1)) - F.count_distinct(F.col(key))).alias("n_dup_keys"),
    ]
    for name, cond in checks.items():
        aggs.append(F.sum(cond.cast("bigint")).alias(name))
    return df.groupBy(*group_by).agg(*aggs)
