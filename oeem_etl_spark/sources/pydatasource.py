"""Spark 4 Python DataSource: an ESPI/Green Button directory as a
first-class ``spark.read.format("espi_dir")`` source.

The JVM path for the same files is :func:`oeem_etl_spark.sources.espi.
read_espi_dir` (wholetext scan → ``from_xml``). This module declares the
identical canonical consumption-record schema through the OTHER extension
surface — the pluggable Python DataSource API (``pyspark.sql.datasource``,
new in Spark 4) — because a reference-era user migrating custom
Luigi-target readers needs exactly this hook: pure-Python parse logic that
still gets Spark's partition planning, predicate-agnostic scan
parallelism, and schema enforcement.

Scale posture: ``partitions()`` returns one :class:`InputPartition` per
XML file, so a 100k-file landing directory fans out across every executor
(file listing happens once, on the driver, like Spark's own file index);
each partition parses with stdlib ElementTree and yields plain tuples —
no driver data movement. For multi-GB single files you would split on
IntervalBlock offsets instead; landing files here are per-fetch-task and
small by construction (sources/fetch.py writes one file per task).

Register once per session (idempotent) via :func:`register`, then::

    spark.read.format("espi_dir").option("path", landing_dir).load()
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: Canonical record shape — matches espi.CONSUMPTION_COLUMNS.
ESPI_DIR_SCHEMA = (
    "trace_id string, start timestamp, end timestamp, "
    "value double, unit string, estimated boolean"
)

_EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z


class _EspiFilePartition(InputPartition):
    def __init__(self, path: str, trace_id: str):
        self.path = path
        self.trace_id = trace_id


class EspiDirReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("espi_dir: option 'path' is required")
        self.unit = options.get("unit", "kWh")
        self.scale = float(options.get("scale", "0.001"))

    def partitions(self):  # driver-side: metadata listing only
        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(".xml") and not f.startswith((".", "_"))
        )
        return [
            _EspiFilePartition(os.path.join(self.path, f), f[: -len(".xml")])
            for f in files
        ]

    def read(self, partition: _EspiFilePartition):  # executor-side
        import xml.etree.ElementTree as ET

        root = ET.parse(partition.path).getroot()
        for reading in root.iter("IntervalReading"):
            tp = reading.find("timePeriod")
            start_s = int(tp.find("start").text)
            dur_s = int(tp.find("duration").text)
            quality = reading.find("ReadingQuality/quality")
            yield (
                partition.trace_id,
                datetime.fromtimestamp(start_s, tz=timezone.utc),
                datetime.fromtimestamp(start_s + dur_s, tz=timezone.utc),
                int(reading.find("value").text) * self.scale,
                self.unit,
                quality is not None and quality.text == "estimated",
            )


class EspiDirStreamReader(DataSourceStreamReader):
    """Streaming face of the same directory (``spark.readStream.format(
    "espi_dir")``): the offset is the count of files (sorted listing)
    already committed, so each micro-batch plans one InputPartition per
    NEWLY-landed file and parses it executor-side — the fetch tier keeps
    appending files, the stream keeps draining them, and Spark's
    checkpoint holds the offset for exactly-once recovery (the same
    contract the built-in file source provides, through the pure-Python
    extension surface)."""

    def __init__(self, options: dict):
        self._batch = EspiDirReader(options)

    def _listing(self) -> list[_EspiFilePartition]:
        return self._batch.partitions()

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._listing())}

    def partitions(self, start: dict, end: dict):
        files = self._listing()[start["index"] : end["index"]]
        return files if files else [_EspiFilePartition("", "")]

    def read(self, partition: _EspiFilePartition):
        if not partition.path:  # empty batch placeholder
            return
        yield from self._batch.read(partition)

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        pass


class EspiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "espi_dir"

    def schema(self) -> str:
        return ESPI_DIR_SCHEMA

    def reader(self, schema) -> EspiDirReader:
        return EspiDirReader(self.options)

    def streamReader(self, schema) -> EspiDirStreamReader:
        return EspiDirStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the ``espi_dir`` format on this session."""
    spark.dataSource.register(EspiDataSource)


def synthetic_espi_xml(trace: int, n_readings: int = 24) -> str:
    """Deterministic ESPI IntervalBlock document for trace ``trace``:
    hourly readings from 2024-01-01T00Z, value (trace*1000 + i*37) Wh,
    every 5th reading flagged estimated. Purely arithmetic so the DuckDB
    oracle can reproduce the parsed records without touching XML."""
    parts = ["<IntervalBlock><interval><duration>%d</duration>" % (3600 * n_readings)]
    parts.append("<start>%d</start></interval>" % _EPOCH_2024)
    for i in range(n_readings):
        quality = (
            "<ReadingQuality><quality>estimated</quality></ReadingQuality>"
            if i % 5 == 0
            else ""
        )
        parts.append(
            "<IntervalReading><timePeriod><duration>3600</duration>"
            "<start>%d</start></timePeriod><value>%d</value>%s</IntervalReading>"
            % (_EPOCH_2024 + i * 3600, trace * 1000 + i * 37, quality)
        )
    parts.append("</IntervalBlock>")
    return "".join(parts)


class SyntheticEspiFetcher:
    """Mock transport whose "remote" is :func:`synthetic_espi_xml` — the
    uri is ``synthetic://<trace>``. Module-level and stateless, so it
    pickles by reference for executor-side construction."""

    def fetch(self, uri: str) -> bytes:
        trace = int(uri.rsplit("//", 1)[1])
        return synthetic_espi_xml(trace).encode()
