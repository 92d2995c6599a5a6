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


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str],
    string_cols: Sequence[str] = (),
) -> DataFrame:
    """One-pass column profiler: (column, n_rows, n_nulls, n_distinct,
    min_val, max_val) per profiled column, numeric min/max as doubles and
    string min/max lexicographic (cast to string for a uniform schema).

    Single aggregation job — every per-column statistic is an aggregate
    expression in ONE groupBy().agg(), so the table is scanned once
    regardless of how many columns are profiled (the profiling shape that
    matters at 100 TB). Output is unpivoted to one row per column.
    """
    from pyspark.sql import functions as F

    aggs = []
    fields = []
    for c in [*numeric_cols, *string_cols]:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(col.isNull().cast("bigint")).alias(f"__nulls_{c}"),
            F.count_distinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
        fields.append(c)
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__dist_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_val"),
            F.col(f"__max_{c}").alias("max_val"),
        )
        for c in fields
    ]
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def observe_load(
    df: DataFrame,
    cols: list[str],
    observation=None,
    name: str = "load_metrics",
) -> DataFrame:
    """Piggyback load metrics on a DataFrame without a second scan
    (Spark's ``observe`` surface): row count plus per-column null counts
    ride the next action as accumulator-style metrics — the monitoring
    pattern for ETL loads where a separate ``count()``/profile pass over
    100 TB is unaffordable.

    Pass a ``pyspark.sql.Observation`` to read the metrics after an
    action (``obs.get``); pass ``observation=None`` to attach by name for
    listener-based collection (QueryExecutionListener / streaming
    progress). The returned frame is row-identical to the input — metric
    evaluation adds one whole-stage-codegen aggregate alongside the scan,
    no shuffle and no extra job.
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        metrics.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"null_{c}")
        )
    return df.observe(observation if observation is not None else name, *metrics)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    k: int,
    report_by: Sequence[str] | None = None,
) -> DataFrame:
    """Privacy-release audit: k-anonymity over the quasi-identifier tuple.

    An equivalence class is one distinct value of ``quasi_cols``; a class
    with fewer than ``k`` rows re-identifies its members and must be
    suppressed or generalized before release. The audit reports, per
    ``report_by`` group (default: one global row): class count, unsafe
    class count, rows in unsafe classes, total rows, and the suppression
    rate a k-threshold release would pay.

    Two grouped aggregations, both map-side combinable: the class-size
    count shuffles one row per distinct quasi tuple (bounded by the
    generalization grain, not the data), the audit rollup one row per
    report group. No windows, no self-joins — the same shape at 100 TB.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    names = [f"__q{i}" for i in range(len(cols))]
    by = list(report_by or [])
    cls = df.groupBy(
        *by, *[c.alias(n) for c, n in zip(cols, names)]
    ).agg(F.count(F.lit(1)).alias("__n"))
    unsafe = F.col("__n") < k
    return cls.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(unsafe.cast("bigint")).alias("n_unsafe_classes"),
        F.sum(F.when(unsafe, F.col("__n")).otherwise(0)).alias("n_suppressed"),
        F.sum("__n").alias("n_rows"),
        F.round(
            F.sum(F.when(unsafe, F.col("__n")).otherwise(0))
            / F.sum("__n"),
            6,
        ).alias("suppression_rate"),
    )
