"""ESPI / Green Button XML → standardized consumption records.

The reference's core parser turns ESPI ``IntervalBlock`` XML (utility
billing/interval payloads) into rows of (trace, start, end, value, unit,
estimated) — its "consumption record" shape (SURVEY.md §1.1 [PK-high],
§3.1 step 2). Here that is a declarative pipeline on Spark's native XML
expressions (``from_xml`` + explode), so parsing runs JVM-side inside
whole-stage codegen — no Python per-row cost, arbitrarily parallel over a
directory of raw payload files.

ESPI notes encoded below (public Green Button/NAESB knowledge):
- ``interval/start`` and ``timePeriod/start`` are epoch seconds;
  ``duration`` is seconds;
- readings carry integer ``value`` in the unit implied by the parent
  ReadingType ``powerOfTenMultiplier`` (handled by ``scale``);
- a ``ReadingQuality`` of ``estimated`` marks non-actual reads — mapped to
  the record's ``estimated`` boolean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Schema of one IntervalBlock element (subset that carries data we keep).
INTERVAL_BLOCK_SCHEMA = (
    "struct<"
    "interval: struct<duration: long, start: long>, "
    "IntervalReading: array<struct<"
    "  timePeriod: struct<duration: long, start: long>, "
    "  value: long, "
    "  ReadingQuality: struct<quality: string>"
    ">>"
    ">"
)

CONSUMPTION_COLUMNS = ["trace_id", "start", "end", "value", "unit", "estimated"]


def parse_interval_block(
    xml: Column | str,
    trace_id: Column | str,
    unit: str = "kWh",
    scale: float = 0.001,
) -> tuple[Column, Column]:
    """Parse one IntervalBlock XML string column.

    Returns (parsed_struct, readings_array) columns; compose with
    :func:`espi_to_records` (kept separate so callers can keep the raw
    struct for audit columns).
    """
    c = F.col(xml) if isinstance(xml, str) else xml
    parsed = F.from_xml(c, INTERVAL_BLOCK_SCHEMA)
    return parsed, parsed.getField("IntervalReading")


def espi_to_records(
    df: DataFrame,
    xml_col: str,
    trace_col: str,
    unit: str = "kWh",
    scale: float = 0.001,
) -> DataFrame:
    """IntervalBlock XML rows → one standardized record per IntervalReading.

    Output schema: trace_id string, start/end timestamp, value double
    (input integer Wh × ``scale``), unit string, estimated boolean —
    the engine's canonical consumption-record shape (SURVEY.md §1.1).
    """
    parsed, readings = parse_interval_block(xml_col, trace_col, unit, scale)
    exploded = df.select(
        F.col(trace_col).cast("string").alias("trace_id"),
        F.explode(readings).alias("__r"),
    )
    r = F.col("__r")
    start_s = r.getField("timePeriod").getField("start")
    dur_s = r.getField("timePeriod").getField("duration")
    quality = r.getField("ReadingQuality").getField("quality")
    return exploded.select(
        "trace_id",
        F.timestamp_seconds(start_s).alias("start"),
        F.timestamp_seconds(start_s + dur_s).alias("end"),
        (r.getField("value") * F.lit(scale)).alias("value"),
        F.lit(unit).alias("unit"),
        F.coalesce(quality == F.lit("estimated"), F.lit(False)).alias("estimated"),
    )


def read_espi_dir(spark, path: str, unit: str = "kWh", scale: float = 0.001) -> DataFrame:
    """Directory of ESPI payload files → records (A4 text scan feeding the
    parser; one file = one IntervalBlock document, wholetext mode).

    At 100 TB this is the ingest fan-out: files parallelize across
    executors, and everything downstream of ``spark.read`` is columnar.
    """
    # NB: wholetext must be the .text() kwarg — DataFrameReader.option is
    # ignored by the text format's python wrapper (verified empirically).
    raw = spark.read.text(path, wholetext=True)
    named = raw.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.xml$", 1).alias("trace"),
        F.col("value").alias("xml"),
    )
    return espi_to_records(named, "xml", "trace", unit=unit, scale=scale)
