"""ESPI / Green Button parser fixtures (reference-style exact-record
assertions, SURVEY.md §5.2(5)): literal IntervalBlock XML → expected
standardized consumption records."""

from __future__ import annotations

import datetime as dt
import os

from oeem_etl_spark.sources.espi import espi_to_records, read_espi_dir

XML = """
<IntervalBlock>
  <interval><duration>7200</duration><start>1704067200</start></interval>
  <IntervalReading>
    <timePeriod><duration>3600</duration><start>1704067200</start></timePeriod>
    <value>1500</value>
  </IntervalReading>
  <IntervalReading>
    <timePeriod><duration>3600</duration><start>1704070800</start></timePeriod>
    <value>2250</value>
    <ReadingQuality><quality>estimated</quality></ReadingQuality>
  </IntervalReading>
</IntervalBlock>
"""


def test_espi_to_records_exact(spark):
    df = spark.createDataFrame([("trace-1", XML)], "trace string, xml string")
    out = espi_to_records(df, "xml", "trace").orderBy("start").collect()
    assert len(out) == 2

    r0, r1 = out
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    assert (r0["trace_id"], r0["start"], r0["end"]) == ("trace-1", t0, t0 + dt.timedelta(hours=1))
    assert r0["value"] == 1.5  # 1500 Wh × 0.001 = kWh
    assert (r0["unit"], r0["estimated"]) == ("kWh", False)

    assert r1["start"] == t0 + dt.timedelta(hours=1)
    assert r1["value"] == 2.25
    assert r1["estimated"] is True


def test_read_espi_dir_roundtrip(spark, tmp_path):
    d = tmp_path / "espi"
    d.mkdir()
    (d / "meter-a.xml").write_text(XML)
    (d / "meter-b.xml").write_text(XML.replace("1500", "3000"))
    out = read_espi_dir(spark, str(d)).collect()
    assert len(out) == 4
    by_trace = {}
    for r in out:
        by_trace.setdefault(r["trace_id"], []).append(r["value"])
    assert sorted(by_trace) == ["meter-a", "meter-b"]
    assert sorted(by_trace["meter-b"]) == [2.25, 3.0]


def test_espi_parse_is_jvm_side(spark):
    """The parser must stay in whole-stage codegen (no Python UDFs)."""
    df = spark.createDataFrame([("t", XML)], "trace string, xml string")
    out = espi_to_records(df, "xml", "trace")
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_python_datasource_partitions_per_file(spark, tmp_path):
    """espi_dir (Python DataSource): one InputPartition per landing file —
    the fan-out contract that makes a 100k-file directory parallelize —
    and parse parity with the JVM from_xml path on the same documents."""
    from oeem_etl_spark.sources import pydatasource as pds

    d = tmp_path / "landing"
    d.mkdir()
    for t in range(5):
        (d / f"{t}.xml").write_text(pds.synthetic_espi_xml(t, n_readings=4))
    (d / "_SUCCESS").write_text("")  # marker files must be ignored
    reader = pds.EspiDirReader({"path": str(d)})
    parts = reader.partitions()
    assert len(parts) == 5
    assert [p.trace_id for p in parts] == ["0", "1", "2", "3", "4"]

    pds.register(spark)
    pds.register(spark)  # re-registration must not raise
    got = (
        spark.read.format("espi_dir")
        .option("path", str(d))
        .load()
        .orderBy("trace_id", "start")
        .collect()
    )
    assert len(got) == 20
    first = got[0]
    assert (first["trace_id"], first["value"], first["estimated"]) == ("0", 0.0, True)

    # parity with the JVM wholetext+from_xml path on identical files
    jvm = read_espi_dir(spark, str(d)).orderBy("trace_id", "start").collect()
    assert [tuple(r) for r in jvm] == [tuple(r) for r in got]
