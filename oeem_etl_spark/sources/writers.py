"""File-format writers / sinks (SURVEY.md §2.A6-A7).

Parquet is the engine's at-rest format; ``partition_by`` should be a
low-cardinality date-ish key on big sinks so downstream scans get static +
dynamic partition pruning (SURVEY.md §4). CSV is the reference's
upload-format export analogue.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_orc(df: DataFrame, path: str, partition_by: Sequence[str] | None = None) -> None:
    """ORC sink (A-family extension)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    partition_by: Sequence[str] = (),
) -> int:
    """Compact a small-files parquet directory toward ``target_file_mb``
    output files; returns the number of files written.

    The small-files problem is a first-order 100 TB concern: streaming
    upserts and per-batch appends leave thousands of KB-scale files whose
    open/footer costs dominate scans. Strategy: size the output file count
    from the directory's actual bytes (driver-side metadata listing only —
    no data through the driver), rewrite via repartition (round-robin when
    unpartitioned, hash on the partition keys otherwise), then swap
    directories.

    The swap is two sequential renames, NOT atomic: a crash between them
    leaves ``path`` absent with the data intact at ``<path>.compact_old``
    (recovery: rename it back), and a concurrent reader can observe the
    gap. Run it in a maintenance window, or on a table-format layer
    (Delta/Iceberg) use its transactional rewrite instead.
    """
    import math
    import os
    import shutil

    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    if partition_by:
        df = df.repartition(n_files, *[df[c] for c in partition_by])
    else:
        df = df.repartition(n_files)
    tmp = f"{path}.compact_tmp"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    old = f"{path}.compact_old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_files


def write_sharded(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    order_by: Sequence[str] = (),
) -> list[tuple[str, int]]:
    """Training-shard writer: parquet files capped at
    ``max_records_per_file`` rows (Spark splits any task's output at the
    cap — no shuffle is added), optionally sorted WITHIN partitions first
    so same-key rows co-locate (run-length/dict encoding wins, and
    sequence-packed corpora keep pack order inside a shard).

    Returns the shard manifest [(file, rows)] read back from the written
    footers (one metadata-only scan — row counts come from parquet
    statistics, not a data pass). Downstream trainers consume the manifest
    for deterministic shard assignment; re-writes are overwrite-atomic at
    the directory level like every sink here.
    """
    out = df.sortWithinPartitions(*order_by) if order_by else df
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )
    spark = df.sparkSession
    from pyspark.sql import functions as F

    manifest = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .count()
        .collect()
    )
    return sorted((r["file"], r["count"]) for r in manifest)
