"""Remaining declared operators (SURVEY.md §2): B8 sample, D7/D8 approx
sketches, H10 map functions, H13 engine-misc functions, J6 UDTF.

Approx sketches and RNG sampling are declared rows-only by design (§7.4
trap #5: approximate ≠ oracle); their sanity bounds are asserted in
tests/test_misc.py against exact equivalents instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators.layout import sql_zorder_key
from oeem_etl_spark.operators.splits import hash_uniform, sql_hash_uniform
from oeem_etl_spark.plans.registry import query
from oeem_etl_spark.plans.util import T, dsum

_SQL_Z = sql_zorder_key(["(o_custkey % 256)", "(o_orderkey % 256)"], 8)


@query(
    "b8_sample",
    sql=f"""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE {sql_hash_uniform("concat(CAST(l_orderkey AS VARCHAR), '|', CAST(l_linenumber AS VARCHAR))", 42)} < 0.1
    """,
    tier="T3",
    survey="B8",
)
def b8_sample(spark, sf_dir):
    """Deterministic Bernoulli sample via md5-derived uniforms (the L11
    hash_uniform machinery): keep rows whose per-key uniform < fraction.
    Unlike ``df.sample(seed=...)`` — whose draw depends on the engine RNG
    and partitioning, so it can never be oracle-checked — the hash draw is
    a pure per-row expression, reproducible across engines, partitionings
    and reruns, which is the property a 100 TB sampling step actually
    needs (resampling a grown corpus keeps every previously-chosen row).
    The engine-RNG ``.sample()`` path stays covered in tests/test_misc.py
    with statistical bounds."""
    li = T(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )
    return (
        li.where(hash_uniform(key, seed=42) < 0.1)
        .select("l_orderkey", "l_linenumber")
    )


@query("d7_approx_percentile", sql=None, tier="T3", survey="D7")
def d7_approx_percentile(spark, sf_dir):
    """Sketch-based percentiles (single pass, mergeable across partitions —
    the 100 TB path where exact percentile would need a full sort)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("p50"),
            F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("p90"),
        )
    )


@query("d8_approx_count_distinct", sql=None, tier="T3", survey="D8")
def d8_approx_count_distinct(spark, sf_dir):
    """HyperLogLog++ distinct counting (constant memory vs exact's hash set)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.01).alias("approx_customers"))
    )


@query(
    "h10_map_funcs",
    sql="""
    SELECT event_type,
           CAST(CASE event_type WHEN 'view' THEN 1.0 WHEN 'click' THEN 2.0
                WHEN 'purchase' THEN 10.0 ELSE 0.5 END AS DOUBLE) AS weight,
           CAST(CASE event_type WHEN 'view' THEN 2.0 WHEN 'click' THEN 4.0
                WHEN 'purchase' THEN 20.0 ELSE 1.0 END AS DOUBLE) AS weight2x,
           COUNT(*) AS cnt
    FROM events GROUP BY event_type
    """,
    tier="T3",
    survey="H10",
)
def h10_map_funcs(spark, sf_dir):
    """MapType surface: create_map → transform_values → element_at. Output
    is scalar columns, so the oracle needs no DuckDB MAP semantics."""
    weights = F.create_map(
        F.lit("view"), F.lit(1.0),
        F.lit("click"), F.lit(2.0),
        F.lit("purchase"), F.lit(10.0),
    )
    doubled = F.transform_values(weights, lambda k, v: v * 2)
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_type",
            F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0.5)).alias("weight"),
            F.coalesce(F.element_at(doubled, F.col("event_type")), F.lit(1.0)).alias("weight2x"),
        )
        .groupBy("event_type", "weight", "weight2x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "h13_misc_funcs",
    sql="""
    SELECT COUNT(*) AS n, COUNT(*) AS n_unique_ids,
           TRUE AS ids_nonnegative, TRUE AS ids_increase_within_partition
    FROM orders
    """,
    tier="T3",
    survey="H13",
)
def h13_misc_funcs(spark, sf_dir):
    """Engine-misc functions. The values of monotonically_increasing_id /
    spark_partition_id are engine-specific; their INVARIANTS are not:
    ids are unique, non-negative, and increase within a partition. The
    query outputs the invariants so the oracle can check them as constants.
    """
    df = (
        T(spark, sf_dir, "orders")
        .select("o_orderkey")
        .withColumn("mid", F.monotonically_increasing_id())
        .withColumn("pid", F.spark_partition_id())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pid").orderBy("mid")
    flags = df.withColumn("prev", F.lag("mid").over(w)).select(
        "mid",
        "pid",
        (F.col("prev").isNull() | (F.col("mid") > F.col("prev"))).alias("inc"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("mid").alias("n_unique_ids"),
        F.min(F.col("mid") >= 0).alias("ids_nonnegative"),
        F.min("inc").alias("ids_increase_within_partition"),
    )


_J6_SQL = """
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS tok,
           CAST(unnest(generate_series(0, len(string_split(text, ' ')) - 1)) AS INT) AS pos
    FROM documents WHERE doc_id <= 50
"""


@query("j6_udtf_tokenize", sql=_J6_SQL, tier="T3", survey="J6,H9")
def j6_udtf_tokenize(spark, sf_dir):
    """Python UDTF (Spark 3.5+): one-to-many record expansion — the
    reference's raw-payload → records parser shape, reached via the SQL
    entry point (LATERAL join)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    spark.udtf.register("oeem_tokenize", Tokenize)
    T(spark, sf_dir, "documents").where(F.col("doc_id") <= 50).createOrReplaceTempView(
        "j6_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, t.tok, t.pos FROM j6_docs d, LATERAL oeem_tokenize(d.text) t"
    )


@query(
    "d5b_salted_collect_list",
    sql="""
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',') AS ids,
           COUNT(*) AS n
    FROM events WHERE user_id <= 50 GROUP BY user_id
    """,
    tier="T3",
    survey="D5",
)
def d5b_salted_collect_list(spark, sf_dir):
    """Skew-proof collect_list (two-stage salted collect + flatten):
    collect_list is the aggregation partial aggregation cannot collapse,
    so a hot key ships every value to one reducer — the salted form
    spreads it over n_salts reducers and must produce identical arrays."""
    from oeem_etl_spark.operators.skew import salted_collect_list

    ev = T(spark, sf_dir, "events").where(F.col("user_id") <= 50)
    out = salted_collect_list(ev, ["user_id"], "event_id")
    return out.select(
        "user_id",
        F.array_join(F.transform("values", lambda x: x.cast("string")), ",").alias("ids"),
        F.size("values").cast("long").alias("n"),
    )


_G5_RECURSIVE = """
WITH RECURSIVE up AS (
  SELECT c_custkey AS start_key, c_custkey AS cur, 0 AS depth
  FROM {customer}
  UNION ALL
  SELECT start_key, cur {div} 10, depth + 1 FROM up WHERE cur >= 10
)
SELECT depth, COUNT(*) AS n_nodes,
       MIN(start_key) AS min_start, MAX(start_key) AS max_start
FROM up GROUP BY depth ORDER BY depth
"""


@query(
    "g5_recursive_hierarchy",
    sql=_G5_RECURSIVE.format(customer="customer", div="//"),
    tier="T3",
    survey="G1,D1",
)
def g5_recursive_hierarchy(spark, sf_dir):
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk every customer up a
    key-derived hierarchy (parent = key DIV 10) to the root, then profile
    the ancestor chain per depth.

    The fixtures carry no parent-child column, so the tree is synthesized
    from the key itself — the recursion SHAPE (seed UNION ALL step-join,
    fixpoint iteration inside the engine) is the real surface being
    declared: it is the SQL-native expression of iterative reachability
    (the DataFrame twin is operators/dedup.py connected_components, which
    drives the loop from Python with localCheckpoint lineage cuts).

    Scale notes: each recursion step is a self-union of the frontier only
    (rows with cur >= 10), not the full closure; depth is bounded by
    log10(max key), so the plan is ~6 unioned steps after unrolling —
    no driver-side loop, no lineage blowup at fixture depths. For
    unbounded-depth graphs at 100 TB prefer the checkpointed DataFrame
    loop, which this query's docstring exists to point at."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("g5_customer")
    return spark.sql(_G5_RECURSIVE.format(customer="g5_customer", div="DIV"))


@query("d15_hll_mergeable_rollup", sql=None, tier="T3", survey="D8")
def d15_hll_mergeable_rollup(spark, sf_dir):
    """Mergeable HLL sketches (Datasketches): per-language document
    sketches unioned into a corpus-wide estimate WITHOUT rescanning the
    data — the incremental-rollup pattern that matters at 100 TB (persist
    per-partition sketch binaries, union them at query time; re-aggregation
    cost is O(sketches), not O(rows)).

    Unlike approx_count_distinct (d8, estimate-only output), the sketch
    itself is a first-class binary value here: hll_sketch_agg → group rows,
    hll_union_agg → register-wise merge. The union is NOT guaranteed
    bit-identical to sketching the whole column directly (Datasketches
    unions promote through HLL_8/coupon paths), but both estimates carry
    the same error bound — tests/test_misc.py asserts merged and direct
    estimates agree with each other and with the exact count to within the
    sketch's relative standard error. Rows-only by design: DuckDB's
    approx_count_distinct is a different HLL implementation with different
    estimates."""
    per = (
        T(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.hll_sketch_agg("doc_id").alias("sk"))
    )
    per_lang = per.select("lang", F.hll_sketch_estimate("sk").alias("approx_docs"))
    total = per.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("lang"), F.hll_sketch_estimate("sk").alias("approx_docs")
    )
    return per_lang.unionAll(total)


@query(
    "b9_stratified_sample",
    sql=f"""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE {sql_hash_uniform('c_custkey')} < CASE c_mktsegment
        WHEN 'BUILDING' THEN 0.2
        WHEN 'MACHINERY' THEN 0.05
        ELSE 0.01 END
    """,
    tier="T3",
    survey="B8,B4",
)
def b9_stratified_sample(spark, sf_dir):
    """Deterministic stratified sample of customers by market segment:
    20% of BUILDING, 5% of MACHINERY, 1% of everything else — the
    engine-portable ``sampleBy`` (md5-threshold per stratum, so the DuckDB
    oracle reproduces the exact kept set; see operators/splits.py)."""
    from oeem_etl_spark.operators.splits import stratified_sample

    cust = T(spark, sf_dir, "customer")
    out = stratified_sample(
        cust,
        key="c_custkey",
        strata="c_mktsegment",
        fractions={"BUILDING": 0.2, "MACHINERY": 0.05},
        default=0.01,
    )
    return out.select("c_custkey", "c_mktsegment")


@query(
    "d19_histogram",
    sql="""
    WITH b AS (
      SELECT LEAST(CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 500000, 19)
               AS bucket_id,
             l_extendedprice
      FROM lineitem
    )
    SELECT CAST(bucket_id AS INTEGER) AS bucket_id,
           CAST(bucket_id * 5000 AS DOUBLE) AS lo_edge,
           CAST((bucket_id + 1) * 5000 AS DOUBLE) AS hi_edge,
           COUNT(*) AS n_items,
           ROUND(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                 / 1000000.0, 6) AS sum_price
    FROM b GROUP BY bucket_id ORDER BY bucket_id
    """,
    tier="T2",
    survey="D1,H5,F1",
)
def d19_histogram(spark, sf_dir):
    """Equi-width price histogram (20 × $5000 buckets, last open-ended):
    bucketing in integer cents with `div`, so bucket edges are exact and
    engine-identical (a double floor((x-lo)/w) flips on representation
    boundaries). Map-side combinable single aggregate — the 100 TB shape
    for any profile/histogram pass."""
    li = T(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("__cents"),
        "l_extendedprice",
    )
    li = li.withColumn(
        "bucket_id", F.least(F.expr("__cents div 500000"), F.lit(19)).cast("int")
    )
    return (
        li.groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
        .select(
            "bucket_id",
            (F.col("bucket_id") * 5000).cast("double").alias("lo_edge"),
            ((F.col("bucket_id") + 1) * 5000).cast("double").alias("hi_edge"),
            "n_items",
            "sum_price",
        )
        .orderBy("bucket_id")
    )


@query("d20_kll_quantile_rollup", sql=None, tier="T3", survey="D7,D8")
def d20_kll_quantile_rollup(spark, sf_dir):
    """Mergeable quantile sketches (Datasketches KLL, Spark 4 native —
    the quantile member of the sketch family next to d15's HLL and the
    count-min queries): one KLL per event_type, quantiles read per group,
    then the per-group sketches MERGE into an ALL row without touching
    the raw data again — the two-level rollup shape that lets a 100 TB
    pipeline keep per-partition sketches and aggregate them upward.
    Rows-only by nature (approximate); error bounds asserted against
    exact percentiles in tests/test_misc.py."""
    ev = T(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk")
    )
    quantiles = per.select(
        "event_type",
        F.kll_sketch_get_n_double("sk").alias("n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )
    total = per.agg(F.kll_merge_agg_double("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.kll_sketch_get_n_double("sk").alias("n"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.5)).alias("p50"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.95)).alias("p95"),
        F.kll_sketch_get_quantile_double("sk", F.lit(0.99)).alias("p99"),
    )
    return quantiles.unionAll(total)


@query("g7_theta_distinct_algebra", sql=None, tier="T3", survey="D8,G3,G4")
def g7_theta_distinct_algebra(spark, sf_dir):
    """Set algebra over DISTINCT counts without a distinct shuffle
    (Datasketches theta, Spark 4 native): users who clicked vs users who
    purchased — union / intersection / difference cardinalities from two
    mergeable sketches built in ONE scan. HLL can only union; theta's
    intersection/difference is what audience-overlap questions need at
    corpus scale. Rows-only (approximate); exactness bounds asserted in
    tests/test_misc.py."""
    ev = T(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("b"),
    )
    return sk.select(
        F.theta_sketch_estimate("a").alias("n_click_users"),
        F.theta_sketch_estimate("b").alias("n_purchase_users"),
        F.theta_sketch_estimate(F.theta_union("a", "b")).alias("n_either"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias("n_both"),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
            "n_click_only"
        ),
    )


@query(
    "m17_dense_ids",
    sql="""
    SELECT c_name AS key,
           CAST(row_number() OVER (ORDER BY c_name) - 1 AS BIGINT) AS id
    FROM (SELECT DISTINCT c_name FROM customer)
    ORDER BY key
    """,
    tier="T2",
    survey="E1,F1,D11",
)
def m17_dense_ids(spark, sf_dir):
    """Distributed surrogate-key assignment (operators/ids.py): contiguous
    0..N-1 ids in key order WITHOUT row_number's empty-PARTITION-BY
    single-task global sort — range-repartition, bucket-local rank,
    B-row offset cumsum broadcast back. Ids equal the global key rank
    regardless of sampled range boundaries, so the scalable plan is
    hash-exactly oracle-checkable against the naive window."""
    from oeem_etl_spark.operators.ids import dense_ids

    cust = T(spark, sf_dir, "customer")
    return dense_ids(cust, "c_name", buckets=16).select(
        F.col("c_name").alias("key"), "id"
    ).orderBy("key")


@query(
    "m17b_incremental_ids",
    sql="""
    WITH old AS MATERIALIZED (
      SELECT DISTINCT c_name FROM customer WHERE c_custkey <= 500
    ),
    oldids AS (
      SELECT c_name, row_number() OVER (ORDER BY c_name) - 1 AS id FROM old
    ),
    unseen AS (
      SELECT DISTINCT c_name FROM customer
      WHERE c_name NOT IN (SELECT c_name FROM old)
    ),
    n AS (SELECT COUNT(*) AS c FROM old)
    SELECT key, CAST(id AS BIGINT) AS id FROM (
      SELECT c_name AS key, id FROM oldids
      UNION ALL
      SELECT c_name AS key,
             (SELECT c FROM n) + row_number() OVER (ORDER BY c_name) - 1 AS id
      FROM unseen
    ) ORDER BY key
    """,
    tier="T2",
    survey="E1,C4,G1,K6",
)
def m17b_incremental_ids(spark, sf_dir):
    """Surrogate-key UPSERT: keys in the existing mapping keep their ids;
    unseen keys get dense ids appended after max(existing) — the
    dimension-load stability contract, deterministic at any parallelism.
    The unseen set is a broadcast anti-join; new ids reuse dense_ids
    started at max+1."""
    from oeem_etl_spark.operators.ids import dense_ids, incremental_ids

    cust = T(spark, sf_dir, "customer")
    existing = dense_ids(
        cust.where(F.col("c_custkey") <= 500), "c_name", buckets=8
    )
    return (
        incremental_ids(cust, existing, "c_name", buckets=8)
        .select(F.col("c_name").alias("key"), "id")
        .orderBy("key")
    )


@query(
    "m18_zorder_layout",
    sql=f"""
    WITH keyed AS (
      SELECT o_orderkey, o_custkey % 256 AS cx, o_orderkey % 256 AS cy,
             {_SQL_Z} AS z
      FROM orders
    )
    SELECT o_orderkey, cx, cy, CAST(z AS BIGINT) AS z
    FROM keyed ORDER BY z, o_orderkey LIMIT 300
    """,
    tier="T2",
    survey="B2,F1,F3,H5",
)
def m18_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustering key for multi-column file skipping
    (operators/layout.py — the lakehouse OPTIMIZE ZORDER BY primitive):
    bit-interleaves two bounded dimensions in pure integer arithmetic
    (engine-identical, whole-stage-codegen, no UDF), then takes the
    first 300 rows of the layout order — exactly the rows the first
    z-clustered file would own. At write time zorder_layout
    range-repartitions on this key so every file's min/max stats prune
    on EITHER dimension."""
    from oeem_etl_spark.operators.layout import zorder_key

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("cx"),
        (F.col("o_orderkey") % 256).alias("cy"),
    )
    return (
        o.withColumn("z", zorder_key(["cx", "cy"], bits=8))
        .select("o_orderkey", "cx", "cy", "z")
        .orderBy("z", "o_orderkey")
        .limit(300)
    )


_M22_HILBERT_CTE = None  # built lazily to keep import order simple


def _m22_sql() -> str:
    from oeem_etl_spark.operators.layout import sql_hilbert_cte

    cte = sql_hilbert_cte(
        "(SELECT o_orderkey, o_custkey % 256 AS cx, o_orderkey % 256 AS cy"
        " FROM orders)",
        "o_orderkey, cx, cy",  # carried through every round untouched
        "cx", "cy", bits=8,
    )
    return f"""
    WITH {cte}
    SELECT o_orderkey, cx, cy, CAST(d AS BIGINT) AS h
    FROM h8 ORDER BY h, o_orderkey LIMIT 300
    """


@query(
    "m22_hilbert_layout",
    sql=_m22_sql(),
    tier="T2",
    survey="B2,F1,F3,H5",
)
def m22_hilbert_layout(spark, sf_dir):
    """Hilbert-curve clustering key (operators/layout.hilbert_key_2d) —
    m18's Z-order with strictly better locality: consecutive key values
    are always grid neighbors, so range-partitioned files own tighter
    (cx, cy) rectangles and min/max stats prune harder on box predicates.
    Pure unrolled integer arithmetic (8 rotate-accumulate rounds, no
    UDF, whole-stage codegen); the oracle replays the identical rounds
    as chained CTEs. First 300 rows of the layout order = the first
    hilbert-clustered file."""
    from oeem_etl_spark.operators.layout import with_hilbert_key

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).alias("cx"),
        (F.col("o_orderkey") % 256).alias("cy"),
    )
    return (
        with_hilbert_key(o, "cx", "cy", bits=8, out="h")
        .select("o_orderkey", "cx", "cy", "h")
        .orderBy("h", "o_orderkey")
        .limit(300)
    )


_J12_SQL = """
    SELECT doc_id,
           string_split(text, ' ')[1] AS p0,
           string_split(text, ' ')[2] AS p1,
           string_split(text, ' ')[3] AS p2,
           string_split(text, ' ')[4] AS p3
    FROM documents WHERE doc_id <= 80
"""


@query("j12_udtf_analyze", sql=_J12_SQL, tier="T3", survey="J6,H1")
def j12_udtf_analyze(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4's analyze-time schema): the
    output column set (p0..p{n-1}) is derived from a CONSTANT argument
    at plan time via the static ``analyze`` hook — the API a
    fixed-width-splitter / configurable parser needs, where j6's
    declared-returnType form cannot change shape per call site. The
    oracle pins n=4 with plain array indexing."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitParts:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            assert n.isConstantExpression, "n must be a literal"
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"p{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            parts = text.split(" ")
            yield tuple(parts[i] if i < len(parts) else None for i in range(n))

    spark.udtf.register("oeem_split_parts", udtf(SplitParts))
    T(spark, sf_dir, "documents").where(F.col("doc_id") <= 80).createOrReplaceTempView(
        "j12_docs"
    )
    return spark.sql(
        "SELECT d.doc_id, s.p0, s.p1, s.p2, s.p3 "
        "FROM j12_docs d, LATERAL oeem_split_parts(d.text, 4) s"
    )


@query(
    "m19_auc_mann_whitney",
    # Exact ROC-AUC via the Mann-Whitney rank-sum: group by score, average
    # tie ranks (kept as 2×rank so everything stays integer), U = R_pos −
    # n_pos(n_pos+1)/2, AUC = U / (n_pos·n_neg). Integer-exact end to end;
    # the one ordered pass runs over DISTINCT scores (statistic-sized, not
    # row-sized — fixture values are cent-quantized).
    sql="""
    WITH labeled AS (
      SELECT value AS score,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      FROM events WHERE value IS NOT NULL
    ),
    grp AS (
      SELECT score, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS np
      FROM labeled GROUP BY score
    ),
    ranked AS (
      SELECT score, n, np,
             COALESCE(SUM(n) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM grp
    ),
    tot AS (
      SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(n - np) AS BIGINT) AS n_neg,
             CAST(SUM(np * (2 * before + n + 1)) AS BIGINT) AS r2
      FROM ranked
    )
    SELECT n_pos, n_neg,
           ROUND((r2 - n_pos * (n_pos + 1))
                 / (2.0 * n_pos * n_neg), 6) AS auc
    FROM tot
    """,
    tier="T2",
    survey="D1,E3,H5,B4",
)
def m19_auc_mann_whitney(spark, sf_dir):
    """Exact ROC-AUC of `value` as a score for purchase events — the
    rank-sum (Mann-Whitney U) formulation with proper tie handling
    (average ranks, carried as 2×rank so the whole computation is
    integer-exact; AUC ≈ 0.5 on the synthetic fixture, which is the
    correct null reading). Scale: one hash agg to score groups, one
    ordered pass over the DISTINCT-score table (statistic-sized), no
    row-level sort."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    grp = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    ).groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("pos").alias("np")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.withColumn("before", F.coalesce(F.sum("n").over(w), F.lit(0)))
    tot = ranked.agg(
        F.sum("np").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).alias("n_neg"),
        F.sum(F.col("np") * (2 * F.col("before") + F.col("n") + 1)).alias("r2"),
    )
    return tot.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc"),
    )


@query(
    "m20_ks_two_sample",
    # Two-sample Kolmogorov-Smirnov D between click and view value
    # distributions: D = max |F1(v) − F2(v)| over score groups. The max is
    # taken on the INTEGER cross-product |c1·n2 − c2·n1| (exact; ties in
    # the max are irrelevant because only the max value survives), divided
    # once at the end. Statistic-sized ordered pass, same scaffold as m19.
    sql="""
    WITH labeled AS (
      SELECT value AS score,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS b
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'view')
    ),
    grp AS (
      SELECT score, CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM labeled GROUP BY score
    ),
    cum AS (
      SELECT score,
             SUM(na) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
             SUM(nb) OVER (ORDER BY score
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
      FROM grp
    ),
    tot AS (SELECT CAST(SUM(na) AS BIGINT) AS n1, CAST(SUM(nb) AS BIGINT) AS n2
            FROM grp)
    SELECT n1, n2,
           ROUND(MAX(ABS(ca * n2 - cb * n1)) / (1.0 * n1 * n2), 6) AS ks_d
    FROM cum, tot GROUP BY n1, n2
    """,
    tier="T2",
    survey="D1,E3,H5,G4",
)
def m20_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov D statistic (click vs view value
    distributions) — the classic distribution-equality test a feature
    pipeline runs next to k44's PSI. The supremum is maximized on the
    exact integer cross-product |c1·n2 − c2·n1| before the single final
    division, so the statistic is engine-identical; the ordered pass
    runs over distinct scores (statistic-sized), not rows."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("event_type").isin("click", "view")
    )
    grp = ev.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("a"),
        F.when(F.col("event_type") == "view", 1).otherwise(0).alias("b"),
    ).groupBy("score").agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    cum = grp.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    tot = grp.agg(F.sum("na").alias("n1"), F.sum("nb").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(
            F.round(
                F.max(F.abs(F.col("ca") * F.col("n2") - F.col("cb") * F.col("n1")))
                / (1.0 * F.col("n1") * F.col("n2")),
                6,
            ).alias("ks_d")
        )
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            "ks_d",
        )
    )


@query(
    "m21_spearman_corr",
    # Spearman rank correlation between event value and event time, per
    # event type: Pearson on average-tie ranks. Ranks are carried as
    # 2×rank (integers), so all five sums are exact; the final formula is
    # one identical double expression per engine. The rank windows run
    # over DISTINCT values per type (statistic-sized).
    sql="""
    WITH rows_ AS (
      SELECT event_type, value AS x, epoch_us(CAST(ts AS TIMESTAMP)) AS y
      FROM events WHERE value IS NOT NULL
    ),
    rx AS (
      SELECT event_type, x,
             CAST(2 * COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + n + 1 AS BIGINT) AS rx2
      FROM (SELECT event_type, x, COUNT(*) AS n FROM rows_ GROUP BY event_type, x)
    ),
    ry AS (
      SELECT event_type, y,
             CAST(2 * COALESCE(SUM(n) OVER (PARTITION BY event_type ORDER BY y
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + n + 1 AS BIGINT) AS ry2
      FROM (SELECT event_type, y, COUNT(*) AS n FROM rows_ GROUP BY event_type, y)
    ),
    j AS (
      SELECT r.event_type, rx2, ry2
      FROM rows_ r JOIN rx ON r.event_type = rx.event_type AND r.x = rx.x
                  JOIN ry ON r.event_type = ry.event_type AND r.y = ry.y
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
             CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy,
             CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
             CAST(SUM(ry2 * ry2) AS BIGINT) AS syy
      FROM j GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman
    FROM s ORDER BY event_type
    """,
    tier="T2",
    survey="D3,E3,D1,H5",
)
def m21_spearman_corr(spark, sf_dir):
    """Spearman rank correlation (value vs event time, per type) — the
    tie-correct form (Pearson on average ranks, NOT the 6Σd²/n(n²−1)
    shortcut, which is wrong under ties). Ranks carried as 2×rank keep
    every sum integer-exact; the ranks come from DISTINCT-value windows
    per type and join back, so the row-sized work is two hash joins and
    one aggregate — no row-level sort."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    rows_ = ev.select(
        "event_type",
        F.col("value").alias("x"),
        F.unix_micros(F.col("ts")).alias("y"),
    )

    def rank2(col):
        g = rows_.groupBy("event_type", col).agg(F.count(F.lit(1)).alias("n"))
        w = (
            Window.partitionBy("event_type")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return g.select(
            "event_type",
            col,
            (
                2 * F.coalesce(F.sum("n").over(w), F.lit(0)) + F.col("n") + 1
            ).alias(f"r{col}2"),
        )

    j = rows_.join(rank2("x"), ["event_type", "x"]).join(
        rank2("y"), ["event_type", "y"]
    )
    s = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )
    rho = (n * sxy - sx * sy) / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return s.select(
        "event_type",
        n.cast("long").alias("n"),
        F.round(rho, 6).alias("spearman"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Exact-register sketch twins (r6 continuation): the approx-sketch family's
# ALGEBRA — register building, cell-wise merge, k-smallest-sample set ops —
# value-checked via the xxh64-in-SQL machinery (plans/xxh64_sql.py), while
# the float ESTIMATES stay with the rows-only Datasketches queries
# (d15/d20/g7/d7/d8).
# ---------------------------------------------------------------------------

_HLL_REM_BITS = 56  # top 8 hash bits select the register bucket
_SIGN_FLIP = -(1 << 63)  # XOR flips the sign bit: signed order == unsigned


def _d15b_sql() -> str:
    from oeem_etl_spark.plans import xxh64_sql

    rem = f"CAST(lx_u % {1 << _HLL_REM_BITS} AS BIGINT)"
    return f"""
    WITH {xxh64_sql.xxh64_long_cte('documents', 'doc_id', 'lx')},
    h AS (
      SELECT lang, CAST(lx_u // {1 << _HLL_REM_BITS} AS BIGINT) AS bucket,
             CASE WHEN {rem} = 0 THEN 57
                  ELSE 57 - length(bin({rem})) END AS rank
      FROM lxf
    ),
    per AS (SELECT lang, bucket, CAST(MAX(rank) AS BIGINT) AS r
            FROM h GROUP BY lang, bucket)
    SELECT lang, bucket, r FROM per
    UNION ALL
    SELECT 'ALL' AS lang, bucket, MAX(r) AS r FROM per GROUP BY bucket
    ORDER BY lang, bucket
    """


@query(
    "d15b_hll_register_rollup",
    sql=_d15b_sql(),
    tier="T3",
    survey="D8,H6,D1",
)
def d15b_hll_register_rollup(spark, sf_dir):
    """HyperLogLog REGISTERS with an exact oracle — the register-algebra
    twin of d15 (whose Datasketches estimates are engine-specific and
    stay rows-only): bucket = top 8 bits of xxhash64(doc_id), rank =
    leading-zero count of the remaining 56 bits + 1, one register frame
    per language (max rank per bucket), and the corpus-wide rollup as
    the CELL-WISE MAX of the per-language frames — HLL's union is a max,
    so the two-level merge is exact and the oracle value-checks it
    (plans/xxh64_sql.py reproduces the hash; bin()-length is the exact
    integer bit-length in both engines). Register state: ≤ 256 rows per
    group regardless of input rows — the same persist-partial-sketches
    shape as d15, now hash-verifiable."""
    from oeem_etl_spark.operators.sketch import hll_registers

    docs = T(spark, sf_dir, "documents")
    per = hll_registers(docs, "doc_id", "lang")
    total = per.groupBy("bucket").agg(F.max("r").alias("r")).select(
        F.lit("ALL").alias("lang"), "bucket", "r"
    )
    return per.unionByName(total).orderBy("lang", "bucket")


def _g7b_sql(k: int = 64) -> str:
    from oeem_etl_spark.plans import xxh64_sql

    def side(ev_type: str, p: str) -> str:
        return f"""{p}u AS (SELECT DISTINCT user_id FROM events
              WHERE event_type = '{ev_type}'),
    {xxh64_sql.xxh64_long_cte(f'{p}u', 'user_id', p)},
    {p}s AS (SELECT CAST({p}_u - {1 << 63} AS BIGINT) AS fl
             FROM {p}f ORDER BY fl LIMIT {k})"""

    return f"""
    WITH {side('click', 'ca')},
    {side('purchase', 'pb')},
    un AS (SELECT fl FROM (SELECT fl FROM cas UNION SELECT fl FROM pbs)
           ORDER BY fl LIMIT {k})
    SELECT
      (SELECT COUNT(*) FROM cas) AS a_n_sample,
      (SELECT MAX(fl) FROM cas) AS a_kth_flipped,
      (SELECT COUNT(*) FROM pbs) AS b_n_sample,
      (SELECT MAX(fl) FROM pbs) AS b_kth_flipped,
      (SELECT MAX(fl) FROM un) AS union_kth_flipped,
      (SELECT COUNT(*) FROM cas JOIN pbs USING (fl)) AS n_common_sample,
      (SELECT COUNT(*) FROM cas ANTI JOIN pbs USING (fl)) AS n_a_only_sample
    """


@query(
    "g7b_theta_sample_algebra",
    # KMV/theta-sketch SAMPLE algebra with an exact oracle: the k smallest
    # unsigned xxhash64 values per class are a deterministic set, so the
    # k-th smallest (the theta threshold), the merged sketch's k-th
    # smallest, and the sample-set intersection/difference counts are all
    # integers both engines must agree on. Both sides order by the
    # sign-bit-flipped hash: (u XOR 2^63) as signed == u - 2^63 for every
    # u, so Spark's h.bitwiseXOR(LONG_MIN) and the oracle's
    # CAST(u - 2^63 AS BIGINT) are the SAME number with unsigned order.
    # The float ESTIMATES stay with g7 (rows-only, Datasketches).
    sql=_g7b_sql(),
    tier="T3",
    survey="D8,G3,G4,F3,H6",
)
def g7b_theta_sample_algebra(spark, sf_dir):
    """KMV (theta-sketch) sample algebra, exactly oracle-checked: per
    class keep the 64 smallest unsigned xxhash64(user_id) of DISTINCT
    users (one scan + global top-k — bounded state like g7's sketches);
    union = 64 smallest of the merged samples; intersection/difference
    cardinalities on the retained samples. Every output is an integer
    the DuckDB oracle recomputes from the same hash."""
    ev = T(spark, sf_dir, "events")

    def sample(ev_type: str):
        fl = F.xxhash64("user_id").bitwiseXOR(F.lit(_SIGN_FLIP))
        return (
            ev.where(F.col("event_type") == ev_type)
            .select("user_id")
            .distinct()
            .select(fl.alias("fl"))
            .orderBy("fl")
            .limit(64)
        )

    a = sample("click").cache()
    b = sample("purchase").cache()
    un = a.unionByName(b).distinct().orderBy("fl").limit(64)
    row = (
        a.agg(
            F.count(F.lit(1)).alias("a_n_sample"),
            F.max("fl").alias("a_kth_flipped"),
        )
        .crossJoin(
            b.agg(
                F.count(F.lit(1)).alias("b_n_sample"),
                F.max("fl").alias("b_kth_flipped"),
            )
        )
        .crossJoin(un.agg(F.max("fl").alias("union_kth_flipped")))
        .crossJoin(
            a.join(b, "fl").agg(F.count(F.lit(1)).alias("n_common_sample"))
        )
        .crossJoin(
            a.join(b, "fl", "left_anti").agg(
                F.count(F.lit(1)).alias("n_a_only_sample")
            )
        )
    )
    return row.select(
        "a_n_sample",
        "a_kth_flipped",
        "b_n_sample",
        "b_kth_flipped",
        "union_kth_flipped",
        "n_common_sample",
        "n_a_only_sample",
    )


_D7B_W = 10_000_000  # histogram bucket width in integer micros (10.0 units)


def _d7b_sql() -> str:
    def pcol(p: int, name: str) -> str:
        tgt = f"((n * {p} + 99) // 100)"
        return (
            f"ROUND(CAST(MAX(CASE WHEN cb < {tgt} AND cum >= {tgt}"
            f" THEN b * {_D7B_W} + (({tgt} - cb) * {_D7B_W}) // cnt"
            f" END) AS DOUBLE) / 1000000, 6) AS {name}"
        )

    return f"""
    WITH vm AS (
      -- NULL values excluded on BOTH sides: Spark's window ORDER BY
      -- sorts a NULL bucket NULLS FIRST, DuckDB 1.0 NULLS LAST, so a
      -- NULL-valued row would shift every cumulative count differently
      SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    bk AS (SELECT event_type, vm // {_D7B_W} AS b, COUNT(*) AS cnt
           FROM vm GROUP BY event_type, b),
    cm AS (SELECT event_type, b, cnt,
                  SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum,
                  SUM(cnt) OVER (PARTITION BY event_type) AS n
           FROM bk),
    est AS (SELECT event_type, n, b, cnt, cum, cum - cnt AS cb FROM cm)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           {pcol(50, 'p50')},
           {pcol(95, 'p95')},
           {pcol(99, 'p99')}
    FROM est GROUP BY event_type ORDER BY event_type
    """


@query(
    "d7b_histogram_percentile",
    sql=_d7b_sql(),
    tier="T3",
    survey="D7,D1,E3",
)
def d7b_histogram_percentile(spark, sf_dir):
    """Approximate percentiles you can actually VERIFY — the
    deterministic member of the D7 family (d7/d20's Spark-internal
    sketches are engine-specific by design): fixed-width integer-micros
    histogram (bounded state: one row per occupied bucket, error bounded
    by the bucket width), cumulative counts, and ceil-rank linear
    interpolation inside the target bucket — ALL integer arithmetic
    until the final display division, so the DuckDB oracle reproduces
    p50/p95/p99 exactly. This is the 100 TB shape: the histogram is one
    map-combinable groupBy, mergeable across partitions/days by cell-wise
    sum (CMS-style), and the percentile read is a window over <= ~50
    bucket rows per group."""
    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    from pyspark.sql import Window

    vm = F.round(F.col("value") * 1_000_000).cast("long")
    bk = (
        ev.select("event_type", vm.alias("vm"))
        .withColumn("b", F.expr(f"vm DIV {_D7B_W}"))
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_ord = Window.partitionBy("event_type").orderBy("b")
    w_all = Window.partitionBy("event_type")
    cm = bk.select(
        "event_type",
        "b",
        "cnt",
        F.sum("cnt").over(w_ord).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    ).withColumn("cb", F.col("cum") - F.col("cnt"))

    def pcol(p: int, name: str):
        tgt = F.expr(f"(n * {p} + 99) DIV 100")
        est = F.col("b") * _D7B_W + F.expr(
            f"(((n * {p} + 99) DIV 100) - cb) * {_D7B_W} DIV cnt"
        )
        hit = (F.col("cb") < tgt) & (F.col("cum") >= tgt)
        return F.round(
            F.max(F.when(hit, est)).cast("double") / 1_000_000, 6
        ).alias(name)

    return (
        cm.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            pcol(50, "p50"),
            pcol(95, "p95"),
            pcol(99, "p99"),
        )
        .orderBy("event_type")
    )
