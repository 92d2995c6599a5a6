"""Skew helpers: result-equivalence with the unsalted plans, plus the plan
property that makes them worth it (stage-1 shuffle keyed on (key, salt))."""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators.skew import salted_agg, salted_join, with_salt


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    from oeem_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["cnt"], r["s"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(F.round("value", 2).cast("decimal(20,2)")).alias("s"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["cnt"], r["s"])
        for r in salted_agg(
            ev,
            ["event_type"],
            [F.count(F.lit(1)).alias("c1"), F.sum(F.round("value", 2).cast("decimal(20,2)")).alias("s1")],
            [F.sum("c1").alias("cnt"), F.sum("s1").alias("s")],
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark, sf_dir):
    from oeem_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plain = sorted(map(tuple, ev.join(dim, "user_id").collect()))
    salted = sorted(
        map(tuple, salted_join(ev, dim, ["user_id"], n_salts=4).select(*[c for c in ev.join(dim, "user_id").columns]).collect())
    )
    assert plain == salted


def test_salt_is_uniform_and_deterministic(spark, sf_dir):
    from oeem_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    n = 8
    counts = (
        with_salt(ev, n).groupBy("__salt").count().collect()
    )
    assert len(counts) == n
    total = sum(r["count"] for r in counts)
    for r in counts:  # no salt bucket dominates (within 3x of fair share)
        assert r["count"] < 3 * total / n
    a = with_salt(ev, n).select("event_id", "__salt").collect()
    b = with_salt(ev, n).select("event_id", "__salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_shuffles_on_key_and_salt(spark, sf_dir):
    from oeem_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        [F.count(F.lit(1)).alias("c1")],
        [F.sum("c1").alias("cnt")],
        n_salts=8,
    )
    sc = spark.sparkContext
    plan = sc._jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(event_type" in plan and "__salt" in plan

def test_dense_ids_under_extreme_key_skew(spark, sf_dir):
    # 100k rows, 5 distinct keys: the distinct() collapses skew before the
    # range repartition, so ids are still the key rank and nothing hot-keys
    from pyspark.sql import functions as F

    from oeem_etl_spark.operators.ids import dense_ids

    df = spark.range(100_000).select(
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("k")
    )
    got = {r["k"]: r["id"] for r in dense_ids(df, "k", buckets=16).collect()}
    assert got == {f"k{i}": i for i in range(5)}


def test_label_propagation_star_graph(spark, sf_dir):
    # star: hub 0 with 200 leaves. Round 1: hub takes min leaf label (1),
    # every leaf takes hub's label (0). Round 2: hub -> 0 (all leaves carry
    # 0), leaves -> 1 (hub carries 1). The adversarial oscillation case for
    # sync LPA — the operator must reproduce it deterministically, and the
    # hub's degree-sized neighbor-count group must not break anything.
    from oeem_etl_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 201)], "src long, dst long"
    )
    l1 = {r["node"]: r["label"] for r in label_propagation(edges, rounds=1).collect()}
    assert l1[0] == 1 and all(l1[i] == 0 for i in range(1, 201))
    l2 = {r["node"]: r["label"] for r in label_propagation(edges, rounds=2).collect()}
    assert l2[0] == 0 and all(l2[i] == 1 for i in range(1, 201))
