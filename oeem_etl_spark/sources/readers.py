"""File-format readers (SURVEY.md §2.A): explicit-schema scans.

The reference fetched/parsed CSVs, JSON API payloads, and XML documents
into fixed record shapes (SURVEY.md §1.1 [PK-high]). Spark mapping: every
reader takes an explicit StructType/DDL schema — inference is a dev-only
convenience that breaks determinism and costs an extra pass at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def scan_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def scan_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with explicit DDL schema (A2). Column pruning + predicate
    pushdown still apply (Spark's CSV source supports both)."""
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def scan_json(spark: SparkSession, path: str, schema: str, **options: str) -> DataFrame:
    """Line-delimited JSON with explicit schema (A3)."""
    return spark.read.schema(schema).options(**options).json(path)


def scan_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw lines (A4): XML staging / log ingest front door. Returns a
    single ``value: string`` column; parse downstream with from_xml /
    regexp / UDTF."""
    return spark.read.text(path)


def scan_binary(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary-file source (L8 plumbing): path, modificationTime, length,
    content columns — the multimodal ingestion front door."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def scan_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (A-family extension): Spark's second built-in columnar
    format — same vectorized reader + predicate pushdown machinery as
    parquet, relevant when interoperating with Hive-era warehouses."""
    return spark.read.orc(path)


def scan_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV scan with a quarantine channel: rows that fail the
    explicit schema land in a reject frame (raw line preserved) instead of
    aborting the load or being silently dropped — the malformed-feed
    reality of utility-file ingest. Returns (good, quarantined).

    The corrupt-record column only materializes if the parsed frame is
    cached before filtering on it (Spark disallows corrupt-only
    projections on the raw scan), so this caches the parsed batch; callers
    should unpersist after the two sides are consumed. At scale, route
    ``quarantined`` to a dead-letter sink and alert on its count via
    operators/quality.observe_load.
    """
    raw = (
        spark.read.schema(schema + ", _corrupt string")
        .options(
            header=str(header).lower(),
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt",
            **options,
        )
        .csv(path)
    )
    raw = raw.cache()
    good = raw.where(raw["_corrupt"].isNull()).drop("_corrupt")
    bad = raw.where(raw["_corrupt"].isNotNull()).select("_corrupt")
    return good, bad
