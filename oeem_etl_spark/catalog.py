"""Catalog: load the fixture parquet tables and register temp views.

The engine's tables (TESTDATA.md / FIXTURES.md): a TPC-H-ish star schema,
an ``events`` stream table, and the LLM-pipeline ``documents`` /
``embeddings`` tables. All reads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown / column pruning / partition pruning for
free on every downstream query (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_session_confs(spark: SparkSession) -> None:
    """Set correctness- and perf-critical SQL confs on an external session.

    The driver (and any library user) may hand us a SparkSession without
    our factory's config block. Correctness-required:

    - ``nanosAsLong``: parquet TIMESTAMP(NANOS) columns (events.ts) are
      unreadable otherwise (PARQUET_TYPE_ILLEGAL); verified runtime-settable.
    - UTC session timezone: timestamp collection/rendering must be
      timezone-stable to match the oracle.

    Performance (all runtime-settable SQL confs, harmless if already set):
    a bare session defaults to 200 shuffle partitions, which is pathological
    for iterative jobs (minhash-LSH connected components ran ~100 stages of
    200 near-empty tasks each). AQE + a core-count-sized partition floor fix
    that locally and are the right defaults on a real cluster too.

    Set-once (marker conf): callers that deliberately override a knob after
    session setup (e.g. bench.py's local-latency regime) must not be
    clobbered by the next load_table call.
    """
    if spark.conf.get("spark.oeem.confsApplied", None) == "true":
        return
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cpus = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 8)))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.oeem.confsApplied", "true")


# (session, sf_dir, table) -> DataFrame. A DataFrame is an immutable logical
# plan, so reuse is safe; rebuilding one costs ~90 ms of driver-side file
# listing + footer schema reads (measured), re-paid per table per query
# without this — exactly the metadata a production engine caches in its
# catalog. Fixture dirs are immutable, so no invalidation is needed.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    key = (spark, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        df = _canonicalize(spark.read.parquet(table_path(sf_dir, name)))
        _TABLE_CACHE[key] = df
    return df


def _canonicalize(df: DataFrame) -> DataFrame:
    """Normalize engine-unreadable physical types to the logical model.

    ``events.ts`` has shipped in two physical vintages:

    - parquet TIMESTAMP(NANOS), which Spark reads only as int64 nanos
      (session config ``nanosAsLong``); convert to a microsecond
      TimestampType — the same floor-truncation DuckDB applies when
      casting TIMESTAMP_NS to TIMESTAMP, so both engines see identical
      values.
    - parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4
      scans as TIMESTAMP_NTZ; the epoch/watermark/window surfaces
      (unix_micros, withWatermark, …) require TIMESTAMP, so cast. The
      session timezone is pinned UTC (ensure_session_confs), making the
      NTZ→LTZ cast value-exact and matching the oracle's NTZ reading.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as Ty

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, Ty.LongType):
            # integer DIV: float division would lose precision on epoch-ns
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif field.name == "ts" and isinstance(field.dataType, Ty.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (SQL entry point, EP3)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
