"""Bucketed co-located joins and dynamic partition pruning — the two §4
scale claims that need plan-level proof, not prose."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from oeem_etl_spark.catalog import load_table
from oeem_etl_spark.sources.bucketed import bucketed_join, write_bucketed


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(li, "t_lineitem_b", ["o_orderkey"], n_buckets=8)

    # the fixture tables are broadcast-small; disable broadcast so the plan
    # shows what bucketing buys at big×big scale (no Exchange on either side)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", ["o_orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: the whole point
        assert "SelectedBucketsCount" in plan

        # and the result matches the plain (shuffling) join
        plain = orders.join(li, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucket_pruning_on_key_filter(spark, sf_dir):
    # autoBucketedScan turns bucketed reading off when no join/agg needs the
    # distribution — disable it so the key filter can prune buckets
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        filtered = spark.table("t_orders_b").where(F.col("o_orderkey") == 42)
        plan = _plan(filtered)
        # filter on the bucket key scans 1 of 8 buckets
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and m.group(1) == "1" and m.group(2) == "8", plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A date-partitioned fact joined to a filtered dim must scan only the
    partitions the dim filter selects (DPP — 'dynamicpruning' in the plan)."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "ev_part")
    ev.write.mode("overwrite").partitionBy("day").parquet(path)
    fact = spark.read.parquet(path)

    # dim filter must be genuinely selective (a constant-true filter folds
    # away and DPP never fires) — tag 3 days 'hot' and filter on the tag
    days = [r["day"] for r in ev.select("day").distinct().orderBy("day").limit(5).collect()]
    dim = spark.createDataFrame(
        [(d, "hot" if i < 3 else "cold") for i, d in enumerate(days)],
        "day date, temp string",
    )
    joined = fact.join(dim.where(F.col("temp") == "hot"), "day")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    # the pruned scan reads only the 3 'hot' partitions' rows
    hot = {str(d) for i, d in enumerate(days) if i < 3}
    got_days = {str(r["day"]) for r in joined.select("day").distinct().collect()}
    assert got_days == hot
