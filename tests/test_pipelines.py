"""Task-DAG orchestration: target-existence skipping, dependency order,
incremental re-runs — the reference's Luigi contract (SURVEY.md §3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oeem_etl_spark.catalog import load_table
from oeem_etl_spark.pipelines import Task, run_pipeline, target_exists

SMALL_SF = "/root/testdata/sf0.001"


def _pipeline(tmp_path, calls):
    def fetch(spark, inputs):
        calls.append("fetch")
        return load_table(spark, SMALL_SF, "events").select(
            "event_id", "user_id", "event_type", "value", "ts"
        )

    def parse(spark, inputs):
        calls.append("parse")
        return inputs["fetch"].withColumn("day", F.to_date("ts"))

    def transform(spark, inputs):
        calls.append("transform")
        return (
            inputs["parse"]
            .groupBy("day", "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    return [
        Task("fetch", str(tmp_path / "raw"), fetch),
        Task("parse", str(tmp_path / "parsed"), parse, deps=["fetch"]),
        Task("transform", str(tmp_path / "out"), transform, deps=["parse"]),
    ]


def test_pipeline_builds_in_dependency_order(spark, tmp_path):
    calls: list[str] = []
    status = run_pipeline(spark, _pipeline(tmp_path, calls))
    assert status == {"fetch": "built", "parse": "built", "transform": "built"}
    assert calls == ["fetch", "parse", "transform"]
    assert target_exists(str(tmp_path / "out"))
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0


def test_pipeline_skips_existing_targets(spark, tmp_path):
    calls: list[str] = []
    run_pipeline(spark, _pipeline(tmp_path, calls))
    calls.clear()
    status = run_pipeline(spark, _pipeline(tmp_path, calls))
    assert status == {"fetch": "skipped", "parse": "skipped", "transform": "skipped"}
    assert calls == []  # nothing re-executed — the Luigi idiom


def test_pipeline_rebuilds_only_missing(spark, tmp_path):
    calls: list[str] = []
    run_pipeline(spark, _pipeline(tmp_path, calls))
    calls.clear()
    import shutil

    shutil.rmtree(tmp_path / "out")
    status = run_pipeline(spark, _pipeline(tmp_path, calls))
    assert status == {"fetch": "skipped", "parse": "skipped", "transform": "built"}
    assert calls == ["transform"]


def test_pipeline_cycle_detection(spark, tmp_path):
    t1 = Task("a", str(tmp_path / "a"), lambda s, i: None, deps=["b"])
    t2 = Task("b", str(tmp_path / "b"), lambda s, i: None, deps=["a"])
    with pytest.raises(ValueError, match="cycle"):
        run_pipeline(spark, [t1, t2])


def test_pipeline_unknown_dep(spark, tmp_path):
    t1 = Task("a", str(tmp_path / "a"), lambda s, i: None, deps=["nope"])
    with pytest.raises(ValueError, match="unknown"):
        run_pipeline(spark, [t1])
