"""Incremental file-manifest ingestion (SURVEY.md §2.A8 / §2.K10).

The Luigi target-existence idiom re-expressed for Spark: a manifest table
records already-processed input files; new loads anti-join against it so
only unseen files are read. At scale the manifest is tiny relative to the
data — always the broadcast side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_source_file(df: DataFrame) -> DataFrame:
    """Tag every row with its originating file (A8 primitive)."""
    return df.withColumn("__source_file", F.input_file_name())


def incremental_load(
    spark: SparkSession,
    df: DataFrame,
    manifest: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Split a tagged scan into (new_rows, new_manifest_entries).

    ``manifest`` has one column ``__source_file``. Returns rows from files
    not yet in the manifest, plus the manifest delta to append after a
    successful load (the caller owns transactionality — write the data,
    then the manifest, mirroring Luigi's output-target-last discipline).
    """
    tagged = df if "__source_file" in df.columns else with_source_file(df)
    new_rows = tagged.join(F.broadcast(manifest), ["__source_file"], "left_anti")
    new_files = new_rows.select("__source_file").distinct()
    return new_rows, new_files
