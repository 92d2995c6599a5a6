"""Unit tests for operators/ids.py (distributed surrogate keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators.ids import dense_ids, incremental_ids


def _keys(spark, xs, parts=1):
    return spark.createDataFrame(
        [(x,) for x in xs], "k string"
    ).repartition(parts)


def test_dense_ids_are_key_rank(spark):
    xs = ["m", "b", "z", "a", "q", "b", None, "a"]
    got = {r["k"]: r["id"] for r in dense_ids(_keys(spark, xs), "k").collect()}
    assert got == {"a": 0, "b": 1, "m": 2, "q": 3, "z": 4}


def test_dense_ids_partition_and_bucket_invariant(spark):
    # the contract: ids = global key rank, independent of input
    # partitioning AND bucket count (range boundaries move, ids don't)
    xs = [f"k{i:04d}" for i in range(311)]
    import random

    rng = random.Random(7)
    rng.shuffle(xs)
    expect = {k: i for i, k in enumerate(sorted(xs))}
    for parts, buckets in [(1, 1), (3, 4), (16, 7), (5, 64)]:
        got = {
            r["k"]: r["id"]
            for r in dense_ids(_keys(spark, xs, parts), "k", buckets=buckets).collect()
        }
        assert got == expect, (parts, buckets)


def test_dense_ids_start_offset(spark):
    got = {
        r["k"]: r["id"]
        for r in dense_ids(_keys(spark, ["b", "a"]), "k", start=100).collect()
    }
    assert got == {"a": 100, "b": 101}


def test_incremental_ids_stability(spark):
    old = dense_ids(_keys(spark, ["c", "a", "e"]), "k")
    new = _keys(spark, ["a", "b", "c", "d", "e", "f"], parts=4)
    got = {r["k"]: r["id"] for r in incremental_ids(new, old, "k").collect()}
    # existing keep their ids; unseen appended densely in key order
    assert got == {"a": 0, "c": 1, "e": 2, "b": 3, "d": 4, "f": 5}
    # idempotent: re-upserting the same keys changes nothing
    again = incremental_ids(
        new,
        spark.createDataFrame([(k, v) for k, v in got.items()], "k string, id long"),
        "k",
    )
    assert {r["k"]: r["id"] for r in again.collect()} == got


def test_incremental_ids_empty_existing(spark):
    empty = spark.createDataFrame([], "k string, id long")
    got = {
        r["k"]: r["id"]
        for r in incremental_ids(_keys(spark, ["b", "a"]), empty, "k").collect()
    }
    assert got == {"a": 0, "b": 1}
