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
