"""SparkSession factory with the scale-aware config block (SURVEY.md §4).

Local-mode knobs are sized for the test harness (local[32], single JVM);
the same settings are the right defaults on a real cluster:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  plan switching — the primary defense against skew at 100 TB.
- ``spark.sql.shuffle.partitions`` starts at the core count locally; on a
  cluster you'd raise the floor, but AQE coalesce makes the exact value
  non-critical.
- Arrow on: every Python<->JVM crossing (pandas_udf, applyInPandas,
  toPandas) is columnar-batched instead of row-pickled.
- Session timezone pinned UTC: timestamp semantics must match the DuckDB
  oracle and be deterministic across machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_session(app_name: str = "oeem_etl_spark", cpus: str | None = None) -> SparkSession:
    """Build (or reuse) the shared SparkSession.

    One session is amortized across an entire run — cold JVM start is ~7 s,
    warm queries are sub-second (BASELINE.md), so callers must never tear
    the session down between queries.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Parquet vectorized reader + pushdown are on by default; pinned here
        # so a misconfigured parent environment can't silently disable them.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # ANSI mode is the 4.x default; pinned so the dsum/davg
        # integer-micros aggregates (plans/util.py) keep their engine-level
        # overflow check even under a parent env that flips the default.
        .config("spark.sql.ansi.enabled", "true")
        # Warehouse + metastore under tmp so bucketed saveAsTable works
        # without polluting the repo (static confs — first session wins).
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/oeem_spark_warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home=/tmp/oeem_derby",
        )
        # Spark cannot read parquet TIMESTAMP(NANOS) natively
        # (PARQUET_TYPE_ILLEGAL); read as int64 nanos and let the catalog
        # convert to a microsecond TimestampType (matches DuckDB's ns→µs
        # truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
