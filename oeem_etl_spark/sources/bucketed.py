"""Bucketed-table helpers: shuffle-free co-located joins (SURVEY.md §4).

At 100 TB the dominant cost of a big×big equi-join is shuffling both sides.
Bucketing pre-partitions data *at rest* on the join key: writing with
``bucketBy(n, key)`` + ``sortBy(key)`` puts co-joinable rows in matching
bucket files, so Catalyst plans the join with NO Exchange on either side
(verified by tests/test_bucketed.py). The trade: bucketed tables live in
the session catalog (``saveAsTable``), and both sides must agree on bucket
count and key.

This is the batch analogue of the streaming state-store partitioning: pay
the shuffle once at ingest, reuse it for every subsequent join/agg on the
same key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (optionally sort-within-bucket)
    managed parquet table, replacing any previous version."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed previous run can leave the physical location behind after
    # the catalog entry is gone — managed-table creation then fails with
    # LOCATION_ALREADY_EXISTS, so clear it explicitly
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both Exchanges when
    bucket specs line up (assert via explain; see tests)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
