"""Unit tests for operators/layout.py (Z-order clustering)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators.layout import zorder_key, zorder_layout


def _morton(xs: list[int], bits: int) -> int:
    d = len(xs)
    z = 0
    for i, x in enumerate(xs):
        for j in range(bits):
            z |= ((x >> j) & 1) << (j * d + i)
    return z


def test_zorder_key_matches_bitwise_reference(spark):
    rows = [(x, y) for x in [0, 1, 2, 3, 7, 100, 255] for y in [0, 1, 5, 254, 255]]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(["x", "y"], bits=8)).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 8), (x, y)


def test_zorder_key_three_dims(spark):
    rows = [(1, 2, 3), (7, 0, 5), (15, 15, 15)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = [
        r["z"]
        for r in df.withColumn("z", zorder_key(["a", "b", "c"], bits=4)).collect()
    ]
    assert got == [_morton(list(r), 4) for r in rows]


def test_zorder_layout_partitions_own_disjoint_ranges(spark):
    # after layout, every output partition's [min z, max z] is disjoint —
    # the property that makes per-file stats prune on either column
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = zorder_layout(df, ["x", "y"], bits=5, files=8)
    per = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(per) > 1
    for a, b in zip(per, per[1:]):
        assert a["hi"] < b["lo"]


def test_zorder_key_rejects_64bit_overflow():
    # 4 cols x 16 bits puts a bit at position 63 — signed-long overflow in
    # Spark, HUGEINT widening in DuckDB (cross-engine divergence). Both
    # builders must refuse loudly.
    import pytest

    from oeem_etl_spark.operators.layout import sql_zorder_key

    with pytest.raises(ValueError, match="63"):
        zorder_key(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="63"):
        sql_zorder_key(["a", "b", "c", "d"], bits=16)
    # 63 bits exactly is fine (bit positions 0..62)
    zorder_key(["a", "b", "c"], bits=21)
    assert "BIGINT" in sql_zorder_key(["a", "b", "c"], bits=21)
