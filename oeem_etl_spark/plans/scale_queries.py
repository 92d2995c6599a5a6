"""Scale-extension operators (SURVEY.md §2 rows C11, L10, L11): explicit
Bloom join pruning, link-graph centrality, and deterministic weighted
sampling — the three 100 TB moves that have no single built-in operator:
shed shuffle bytes before the exchange, score corpus quality from the link
graph, and draw reproducible weighted mixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oeem_etl_spark.operators.graph import pagerank, sql_pagerank
from oeem_etl_spark.operators.pruning import bloom_pruned_join
from oeem_etl_spark.operators.splits import (
    hash_uniform,
    sql_hash_uniform,
    weighted_sample_without_replacement,
)
from oeem_etl_spark.plans.registry import query
from oeem_etl_spark.plans.util import T, dsum, sql_dsum
from oeem_etl_spark.functions.fixedpoint import qlong


@query(
    "m1_bloom_pruned_join",
    sql=f"""
    SELECT l.l_suppkey AS suppkey,
           COUNT(*) AS n_lines,
           {sql_dsum("l.l_extendedprice", "revenue")}
    FROM lineitem l
    JOIN (SELECT s_suppkey FROM supplier WHERE s_nationkey <= 2) s
      ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_suppkey
    ORDER BY suppkey
    """,
    tier="T2",
    survey="C11,C1,D1",
)
def m1_bloom_pruned_join(spark, sf_dir):
    """Bloom-prefiltered fact⋈dim: the dimension (suppliers in 3 nations)
    is hashed into an 8 KiB bitmap pushed into the lineitem scan as a pure
    predicate, so fact rows for the other ~22 nations never reach the join
    exchange. The oracle is the PLAIN join — pruning must not change one
    row. Plan shape asserted in tests/test_scale_ops.py (pure Filter on
    the scan — no UDF, no extra shuffle)."""
    dim = (
        T(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") <= 2)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    fact = T(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    joined = bloom_pruned_join(fact, F.broadcast(dim), on="l_suppkey")
    return (
        joined.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum("l_extendedprice", "revenue"),
        )
        .orderBy("suppkey")
    )


_PR_EDGES_SPARK_BOUND = 150  # custkeys in the oracle-sized subgraph


def _purchase_edges(spark, sf_dir):
    """Bipartite purchase graph: customer↔supplier via lineitem×orders,
    edges both directions so the random walk alternates sides. Orders are
    filtered to a bounded custkey range FIRST (predicate reaches the
    parquet scan), then broadcast into lineitem — the fact table never
    shuffles to build edges."""
    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= _PR_EDGES_SPARK_BOUND)
        .select("o_orderkey", "o_custkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"]).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cust"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("supp"),
    )
    fwd = pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst"))
    rev = pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    return fwd.unionByName(rev)


_PR_EDGES_SQL = f"""
    SELECT concat('c', CAST(o.o_custkey AS VARCHAR)) AS src,
           concat('s', CAST(l.l_suppkey AS VARCHAR)) AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey <= {_PR_EDGES_SPARK_BOUND}
    UNION ALL
    SELECT concat('s', CAST(l.l_suppkey AS VARCHAR)) AS src,
           concat('c', CAST(o.o_custkey AS VARCHAR)) AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_custkey <= {_PR_EDGES_SPARK_BOUND}
"""


@query(
    "m2_pagerank_centrality",
    sql=sql_pagerank(_PR_EDGES_SQL, iterations=3, damping=0.85),
    tier="T3",
    survey="L10,C1,D1",
)
def m2_pagerank_centrality(spark, sf_dir):
    """3-iteration PageRank over the customer↔supplier purchase graph —
    the corpus-quality link-score shape (operators/graph.py). Ranks are
    integer-micros deterministic, so the layered-CTE DuckDB oracle matches
    hash-exactly despite 3 rounds of double arithmetic."""
    ranks = pagerank(_purchase_edges(spark, sf_dir), iterations=3, damping=0.85)
    return ranks.select("node", F.round("rank", 9).alias("rank")).orderBy("node")


@query(
    "m3_weighted_sample",
    sql=f"""
    SELECT source, doc_id, n_chars
    FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY pow({sql_hash_uniform("doc_id", seed=11)},
                         1.0 / CAST(n_chars AS DOUBLE)) DESC,
                        doc_id ASC
             ) AS rn
      FROM documents WHERE n_chars > 0
    ) WHERE rn <= 5
    ORDER BY source, doc_id
    """,
    tier="T3",
    survey="L11,B8,E5",
)
def m3_weighted_sample(spark, sf_dir):
    """Length-weighted 5-doc sample per source, without replacement
    (Efraimidis–Spirakis over an md5-derived uniform). Fully deterministic
    → oracle-checked, unlike rand(seed) sampling (b8) which is engine- and
    partitioning-specific. Tie risk in the pow() comparison across libm
    implementations is measure-zero (md5 spreads scores apart)."""
    docs = T(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    picked = weighted_sample_without_replacement(
        docs, key="doc_id", weight="n_chars", k=5, group_by=["source"], seed=11
    )
    return picked.select("source", "doc_id", "n_chars").orderBy("source", "doc_id")


@query(
    "m5_triangle_count",
    sql="""
    WITH pairs AS (
      SELECT DISTINCT least(l1.l_suppkey, l2.l_suppkey) AS lo,
             greatest(l1.l_suppkey, l2.l_suppkey) AS hi
      FROM lineitem l1
      JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
                      AND l1.l_suppkey <> l2.l_suppkey
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
      WHERE o.o_custkey <= 3
    ),
    ab AS (SELECT lo AS a, hi AS b FROM pairs),
    bc AS (SELECT lo AS b, hi AS c FROM pairs),
    ac AS (SELECT lo AS a, hi AS c FROM pairs)
    SELECT ab.a, ab.b, bc.c
    FROM ab JOIN bc USING (b) JOIN ac ON ac.a = ab.a AND ac.c = bc.c
    """,
    tier="T3",
    survey="L10,C10,G2",
)
def m5_triangle_count(spark, sf_dir):
    """Triangles in the supplier co-purchase graph (suppliers appearing on
    the same order of a bounded customer set): the graph-community twin
    of m2's centrality. Edge build: order-local supplier self-join with
    the bounded order list broadcast; triangle join produces each
    triangle once via the a<b<c total order."""
    from oeem_etl_spark.operators.graph import triangles

    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 3)
        .select("o_orderkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    li = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(F.col("l_orderkey"), F.col("l_suppkey").alias("s2"))
    edges = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_suppkey") != F.col("s2"))
        .select(F.col("l_suppkey").alias("src"), F.col("s2").alias("dst"))
    )
    return triangles(edges)


@query(
    "m6_bloom_rebased_rollup",
    sql=f"""
    WITH pruned AS (
      SELECT l.l_suppkey, l.l_returnflag, l.l_linestatus, l.l_extendedprice
      FROM lineitem l
      JOIN (SELECT s_suppkey FROM supplier WHERE s_nationkey <= 12) s
        ON l.l_suppkey = s.s_suppkey
    ), rebased AS (
      SELECT l_returnflag, l_linestatus,
             l_extendedprice - MIN(l_extendedprice)
               OVER (PARTITION BY l_suppkey) AS rebased
      FROM pruned
    )
    SELECT l_returnflag, l_linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n_lines,
           {sql_dsum('rebased', 'total_rebased')}
    FROM rebased
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tier="T2",
    survey="C11,J3,D9",
)
def m6_bloom_rebased_rollup(spark, sf_dir):
    """Fused scale pipeline: (1) C11 bloom-pruned fact⋈dim — suppliers of
    3 nations hashed into a bitmap pushed into the lineitem scan, so
    non-matching fact rows die at the scan, not the exchange; (2) J3
    applyInPandas grouped-map per supplier (price rebased to the
    supplier's min — the per-trace transform idiom, min-based so the float
    math is exact on both engines); (3) D9 ROLLUP over
    (returnflag, linestatus) with grouping-id disambiguation. The grouped
    map reuses the shuffle the bloom join's aggregation would need anyway;
    the rollup's Expand collapses map-side before its single exchange."""
    from oeem_etl_spark.functions import udfs

    dim = (
        T(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey") <= 12)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    fact = T(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    joined = bloom_pruned_join(fact, F.broadcast(dim), on="l_suppkey")
    rebased = udfs.rebase_per_group(
        joined, "l_suppkey", "l_extendedprice", "rebased"
    )
    return rebased.rollup("l_returnflag", "l_linestatus").agg(
        (2 * F.grouping("l_returnflag") + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).alias("n_lines"),
        dsum("rebased", "total_rebased"),
    )


@query(
    "l42_udtf_weighted_sample",
    sql=f"""
    WITH weighted AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    )
    SELECT source, doc_id, n_tokens
    FROM (
      SELECT source, doc_id, n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY pow({sql_hash_uniform("doc_id", seed=23)},
                         1.0 / CAST(n_tokens AS DOUBLE)) DESC,
                        doc_id ASC
             ) AS rn
      FROM weighted
    ) WHERE rn <= 5
    ORDER BY source, doc_id
    """,
    tier="T3",
    survey="J6,L11,B8",
)
def l42_udtf_weighted_sample(spark, sf_dir):
    """Fused corpus-sampling pipeline: J6 Python UDTF tokenization (the
    raw-payload → records parser surface, reached via SQL LATERAL join)
    produces per-document token counts, which drive L11 length-weighted
    Efraimidis–Spirakis sampling without replacement (5 docs per source,
    md5-derived uniforms → fully deterministic, oracle-checked). This is
    the standard 'sample training docs proportional to token count' step,
    with the weight computed by the user-extension path instead of a
    built-in — proving the two surfaces compose in one plan."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string, pos int")
    class TokenizeW:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    spark.udtf.register("oeem_tokenize_w", TokenizeW)
    T(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).createOrReplaceTempView("l42_docs")
    weighted = spark.sql(
        """
        SELECT d.source, d.doc_id, COUNT(*) AS n_tokens
        FROM l42_docs d, LATERAL oeem_tokenize_w(d.text) t
        GROUP BY d.source, d.doc_id
        """
    )
    picked = weighted_sample_without_replacement(
        weighted, key="doc_id", weight="n_tokens", k=5,
        group_by=["source"], seed=23,
    )
    return picked.select("source", "doc_id", "n_tokens").orderBy("source", "doc_id")


@query(
    "m7_entity_resolution_cc",
    sql="""
    WITH RECURSIVE c AS (
      SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 400
    ), e0 AS (
      SELECT a.c_custkey AS a, b.c_custkey AS b
      FROM c a, c b
      WHERE a.c_custkey < b.c_custkey
        AND levenshtein(a.c_name, b.c_name) <= 1
    ), e AS (
      SELECT a, b FROM e0 UNION SELECT b, a FROM e0
    ), nodes AS (
      SELECT DISTINCT a AS node FROM e
    ), r(node, lbl) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.lbl FROM r JOIN e ON e.a = r.node
    )
    SELECT node, CAST(MIN(lbl) AS BIGINT) AS label
    FROM r GROUP BY node
    """,
    tier="T3",
    survey="H3,G1,D1",
)
def m7_entity_resolution_cc(spark, sf_dir):
    """Entity resolution end to end, ORACLE-checked through the iterative
    part: fuzzy-name candidate pairs (deletion-neighborhood join) feed
    min-label connected components; the oracle recomputes the SAME
    component labels with a recursive-CTE reachability fixpoint — so the
    DataFrame iteration (operators/dedup.connected_components: one job
    per round, lineage-truncated) is verified against SQL's declarative
    fixpoint semantics, not just unit fixtures.

    Deliberately calls the PURE min-label variant, not
    connected_components_hybrid (the near-dup default since r5): every
    production call site uses the hybrid, so this query is the one
    remaining direct ORACLE check of the pure iteration the hybrid's
    probe rounds are built from (tests/test_scale_ops.py pins
    hybrid == pure == star on shared fixtures; this pins pure == SQL
    fixpoint on driver-checked data). Not a silent divergence."""
    from oeem_etl_spark.operators.dedup import connected_components
    from oeem_etl_spark.operators.text import fuzzy_join

    c = T(spark, sf_dir, "customer").where(F.col("c_custkey") <= 400)
    left = c.select(F.col("c_custkey").alias("a_id"), F.col("c_name").alias("a_name"))
    right = c.select(F.col("c_custkey").alias("b_id"), F.col("c_name").alias("b_name"))
    pairs = (
        fuzzy_join(left, right, "a_name", "b_name")
        .where(F.col("a_id") < F.col("b_id"))
        .select(F.col("a_id").alias("key_a"), F.col("b_id").alias("key_b"))
    )
    return connected_components(pairs)


@query(
    "m8_copurchase_lift",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
    pc AS (SELECT l_partkey, COUNT(*) AS n_p FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b, COUNT(*) AS n_ab
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pk_a, pk_b
    )
    SELECT pk_a, pk_b, n_ab,
           ROUND(CAST(n_ab AS DOUBLE) * n_orders / (ca.n_p * cb.n_p), 6)
             AS lift
    FROM pairs JOIN pc ca ON ca.l_partkey = pk_a
               JOIN pc cb ON cb.l_partkey = pk_b
               CROSS JOIN n
    WHERE n_ab >= 2
    ORDER BY lift DESC, pk_a, pk_b LIMIT 100
    """,
    tier="T2",
    survey="C10,C5,D1,F3",
)
def m8_copurchase_lift(spark, sf_dir):
    """Market-basket co-occurrence with lift scoring: parts co-ordered in
    the same order, lift = P(a,b)/(P(a)P(b)). The pair stage is the
    order-key self-join — bounded fan-out (≤7 lines/order in TPC-H shape;
    a real catalog would cap basket size the same way), so pair volume is
    linear in orders, not quadratic in parts. Per-part totals attach by
    broadcast; the top-100 is fully tie-broken (lift, pk_a, pk_b) so
    LIMIT is deterministic across engines."""
    li = T(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.select(F.count_distinct("l_orderkey").alias("n_orders"))
    pc = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk_a"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    ca = F.broadcast(pc.select(F.col("l_partkey").alias("pk_a"), F.col("n_p").alias("n_a")))
    cb = F.broadcast(pc.select(F.col("l_partkey").alias("pk_b"), F.col("n_p").alias("n_b")))
    return (
        pairs.join(ca, "pk_a")
        .join(cb, "pk_b")
        .crossJoin(F.broadcast(n))
        .select(
            "pk_a",
            "pk_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pk_a", "pk_b")
        .limit(100)
    )


@query(
    "m10_touch_attribution",
    sql="""
    WITH conv AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts, value AS p_value
      FROM events WHERE event_type = 'purchase'
    ), touch AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type
      FROM events WHERE event_type IN ('view', 'click')
    ), joined AS (
      SELECT c.p_id, c.p_ts, c.p_value, t.t_id, t.t_ts, t.event_type,
             row_number() OVER (PARTITION BY c.p_id
               ORDER BY t.t_ts, t.t_id) AS rn,
             COUNT(*) OVER (PARTITION BY c.p_id) AS n
      FROM conv c JOIN touch t
        ON c.user_id = t.user_id
       AND t.t_ts < c.p_ts
       AND t.t_ts >= c.p_ts - INTERVAL 7 DAY
    ), credited AS (
      SELECT p_id, p_ts, event_type,
             CAST(ROUND((CASE WHEN n = 1 THEN 1.0
                              WHEN n = 2 THEN 0.5
                              WHEN rn = 1 OR rn = n THEN 0.4
                              ELSE 0.2 / (n - 2) END)
                        * p_value * 1000000) AS BIGINT) AS cm
      FROM joined
    )
    SELECT CAST(date_trunc('month', p_ts) AS TIMESTAMP) AS month,
           event_type,
           COUNT(*) AS n_touches,
           COUNT(DISTINCT p_id) AS n_conversions,
           ROUND(CAST(SUM(cm) AS BIGINT) / 1000000.0, 6) AS credited_value
    FROM credited GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tier="T2",
    survey="C6,E1,E3,D1,D2",
)
def m10_touch_attribution(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution: every purchase
    distributes its value over the user's view/click touches in the
    preceding 7 days — 40/20/40 first/middle/last (100% single-touch,
    50/50 two-touch) — rolled up to credited value per month and touch
    channel. The conversion-touch pairing is a per-user range join
    (user-key equi-join + time predicate: fan-out bounded by per-user
    touch rate, never cross-user), positions come from one window over
    the pair frame, and credits are micros-quantized per touch so the
    rollup is order-independent in both engines."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    joined = conv.join(touch, "user_id").where(
        (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY"))
    )
    wp = Window.partitionBy("p_id")
    joined = joined.withColumn(
        "rn", F.row_number().over(wp.orderBy("t_ts", "t_id"))
    ).withColumn("n", F.count(F.lit(1)).over(wp))
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    credited = joined.select(
        "p_id",
        "p_ts",
        "event_type",
        qlong(weight * F.col("p_value"), 1_000_000).alias("cm"),
    )
    return (
        credited.groupBy(
            F.date_trunc("month", F.col("p_ts")).cast("timestamp_ntz").alias("month"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.count_distinct("p_id").alias("n_conversions"),
            F.round(F.sum("cm") / F.lit(1e6), 6).alias("credited_value"),
        )
        .orderBy("month", "event_type")
    )


@query(
    "m13_top_session_paths",
    sql="""
    WITH g AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id, event_type,
               epoch_us(ts) - lag(epoch_us(ts))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
      )
    ), paths AS (
      SELECT user_id, session_id,
             array_to_string(
               list_slice(list(event_type ORDER BY ts, event_id), 1, 5),
               '>') AS path
      FROM g GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 20
    """,
    tier="T2",
    survey="K-ext,E2,H7,D5,F3",
)
def m13_top_session_paths(spark, sf_dir):
    """Top navigation paths: sessionize (30-min gap), render each
    session's first five event types as an ordered path string, count
    and rank. The in-session ordering is materialized with
    sort_array-of-structs (no order-sensitive collect_list contract
    needed — the sort is explicit and total on (ts, event_id)), so both
    engines produce identical paths under any partitioning; top-20 is
    fully tie-broken."""
    from oeem_etl_spark.operators.timeseries import sessionize

    ev = T(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    sess = sessionize(
        ev, keys=["user_id"], ts="ts", gap_minutes=30, tiebreak=["event_id"]
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(F.col("evs"), lambda e: e["event_type"]), 1, 5
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


@query(
    "m14_retention_cohorts",
    # Weekly retention triangle: cohort = user's first active week; one
    # row per (cohort_week, week_offset<=12) with distinct active users
    # and the retention ratio against the cohort size. Week arithmetic is
    # Monday-truncated in both engines; the ratio divides two exact
    # BIGINTs once, so no summation-order hazard.
    sql="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(active_week) AS cohort_week FROM uw GROUP BY user_id
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM cohort GROUP BY cohort_week
    ), tri AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', CAST(c.cohort_week AS DATE),
                            CAST(u.active_week AS DATE)) // 7 AS INT)
               AS week_offset,
             COUNT(DISTINCT u.user_id) AS n_active
      FROM uw u JOIN cohort c USING (user_id)
      GROUP BY 1, 2
    )
    SELECT t.cohort_week, t.week_offset, t.n_active, s.n_cohort,
           ROUND(CAST(t.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
    FROM tri t JOIN sizes s USING (cohort_week)
    WHERE t.week_offset <= 12
    ORDER BY t.cohort_week, t.week_offset
    """,
    tier="T2",
    survey="K-ext,D1,D2,H4,C1",
)
def m14_retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort triangle over the events stream. Shape for
    100 TB: the raw stream is collapsed FIRST to distinct (user, week) —
    the only pass over the full data — and everything after (first-week
    cohort, triangle counts, cohort sizes) operates on that collapsed
    set, keyed by user_id so the cohort join co-partitions with the
    activity rows. Cohort sizes are a tiny dimension broadcast onto the
    triangle."""
    ev = T(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("timestamp_ntz").alias("active_week"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("active_week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    tri = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return (
        tri.join(F.broadcast(sizes), "cohort_week")
        .where(F.col("week_offset") <= 12)
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active").cast("double") / F.col("n_cohort"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "m15_funnel_conversion",
    # Strictly-ordered funnel view -> click -> purchase: each stage's
    # timestamp must follow the user's FIRST timestamp of the previous
    # stage. Windowed per-user mins chain inside one partitioning; the
    # final answer is a single row of counts and exact one-shot ratios.
    sql="""
    WITH s1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS first_view
      FROM events
    ), s2 AS (
      SELECT user_id, ts, event_type, first_view,
             MIN(CASE WHEN event_type = 'click' AND ts > first_view
                      THEN ts END)
               OVER (PARTITION BY user_id) AS first_click
      FROM s1
    ), s3 AS (
      SELECT user_id, first_view, first_click,
             MIN(CASE WHEN event_type = 'purchase' AND ts > first_click
                      THEN ts END)
               OVER (PARTITION BY user_id) AS first_purchase
      FROM s2
    ), per_user AS (
      SELECT user_id, MAX(first_view IS NOT NULL) AS did_view,
             MAX(first_click IS NOT NULL) AS did_click,
             MAX(first_purchase IS NOT NULL) AS did_purchase
      FROM s3 GROUP BY user_id
    )
    SELECT COUNT(*) FILTER (WHERE did_view) AS n_view,
           COUNT(*) FILTER (WHERE did_click) AS n_click,
           COUNT(*) FILTER (WHERE did_purchase) AS n_purchase,
           ROUND(CAST(COUNT(*) FILTER (WHERE did_click) AS DOUBLE)
                 / COUNT(*) FILTER (WHERE did_view), 6) AS view_to_click,
           ROUND(CAST(COUNT(*) FILTER (WHERE did_purchase) AS DOUBLE)
                 / COUNT(*) FILTER (WHERE did_click), 6) AS click_to_purchase,
           ROUND(CAST(COUNT(*) FILTER (WHERE did_purchase) AS DOUBLE)
                 / COUNT(*) FILTER (WHERE did_view), 6) AS overall
    FROM per_user
    """,
    tier="T2",
    survey="K-ext,E3,B4,D1,H4",
)
def m15_funnel_conversion(spark, sf_dir):
    """Strict-order funnel conversion (view -> click -> purchase, each
    stage after the user's first hit of the previous stage). The three
    chained per-user MIN windows share one hash partitioning on user_id
    — Catalyst plans a single exchange and three Window ops over it — and
    the per-user flags collapse with a map-side-combinable group-by, so
    the whole funnel is one shuffle of (user, flags) regardless of event
    volume."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = Window.partitionBy("user_id")
    s = ev.withColumn(
        "first_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s = s.withColumn(
        "first_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("first_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s = s.withColumn(
        "first_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("first_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = s.groupBy("user_id").agg(
        F.max(F.col("first_view").isNotNull()).alias("did_view"),
        F.max(F.col("first_click").isNotNull()).alias("did_click"),
        F.max(F.col("first_purchase").isNotNull()).alias("did_purchase"),
    )
    nv = F.count(F.when(F.col("did_view"), 1))
    nc = F.count(F.when(F.col("did_click"), 1))
    np_ = F.count(F.when(F.col("did_purchase"), 1))
    return per_user.agg(
        nv.alias("n_view"),
        nc.alias("n_click"),
        np_.alias("n_purchase"),
        F.round(nc.cast("double") / nv, 6).alias("view_to_click"),
        F.round(np_.cast("double") / nc, 6).alias("click_to_purchase"),
        F.round(np_.cast("double") / nv, 6).alias("overall"),
    )


@query(
    "m16_label_propagation",
    sql="""
    WITH bounded AS (SELECT o_orderkey FROM orders WHERE o_custkey <= 5),
    li AS MATERIALIZED (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN bounded ON l_orderkey = o_orderkey
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT l1.l_suppkey AS u, l2.l_suppkey AS v
      FROM li l1 JOIN li l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
    ),
    l0 AS MATERIALIZED (
      SELECT node, node AS label
      FROM (SELECT DISTINCT u AS node FROM e0)
    ),
    c1 AS (
      SELECT e0.u AS node, l.label, COUNT(*) AS c
      FROM e0 JOIN l0 l ON e0.v = l.node GROUP BY e0.u, l.label
    ),
    l1 AS MATERIALIZED (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label)
                 AS rn
        FROM c1
      ) WHERE rn = 1
    ),
    c2 AS (
      SELECT e0.u AS node, l.label, COUNT(*) AS c
      FROM e0 JOIN l1 l ON e0.v = l.node GROUP BY e0.u, l.label
    ),
    l2 AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, label)
                 AS rn
        FROM c2
      ) WHERE rn = 1
    )
    SELECT node, label FROM l2 ORDER BY node
    """,
    tier="T3",
    survey="L10,C10,D1,E1",
)
def m16_label_propagation(spark, sf_dir):
    """Community detection on the supplier co-purchase graph via
    2-round synchronous label propagation (operators/graph.py
    label_propagation — deterministic min-tie-break variant, so the
    unrolled-CTE oracle matches exactly). Edge build is m5's: suppliers
    sharing an order of a bounded customer set, order list broadcast.
    Each round is two edge-sized shuffles (neighbor-label join +
    count-argmax window) — pagerank's cost shape, converging in O(5)
    rounds on community-structured graphs."""
    from oeem_etl_spark.operators.graph import label_propagation

    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 5)
        .select("o_orderkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    li = li.join(F.broadcast(o), li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(F.col("l_orderkey"), F.col("l_suppkey").alias("s2"))
    edges = (
        li.join(l2, "l_orderkey")
        .where(F.col("l_suppkey") != F.col("s2"))
        .select(F.col("l_suppkey").alias("src"), F.col("s2").alias("dst"))
    )
    return label_propagation(edges, rounds=2).orderBy("node")
