"""Third-face queries for rotation-starved §2 rows (round 6).

After five driver rounds, 43 SURVEY §2 tags had no never-driver-checked
query left (tools/gen_driver_checked.py ledger) — the r5 second faces
(plans/breadth_queries.py) were themselves certified in r5, so the
50-slot prefix was again pinned to already-checked picks for those rows.
Every query here gives one of those rows a THIRD independently-shaped
face: different fixtures, different compositions than both the anchor
and the second face, each with a full DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window
from pyspark.sql import functions as F

from oeem_etl_spark.plans.registry import query
from oeem_etl_spark.plans.util import T, dsum, sql_dsum

_TMP = os.path.join(
    tempfile.gettempdir(), f"oeem_etl_spark_breadth3_{os.getpid()}"
)

_CAST_TS = "CAST(ts AS TIMESTAMP)"


# ---------------------------------------------------------------------------
# Source/sink faces
# ---------------------------------------------------------------------------


@query(
    "a41_csv_quote_roundtrip",
    sql="""
    SELECT p_partkey,
           translate(upper(p_name), ' ', '_') AS tag,
           lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
           CAST(round(p_retailprice * 1000000) AS BIGINT) AS price_micros
    FROM part WHERE p_partkey <= 400
    """,
    tier="T2",
    survey="A2,A7,B5,H1",
)
def a41_csv_quote_roundtrip(spark, sf_dir):
    """CSV round-trip under QUOTING (p_name contains the delimiter-free
    but space-laden catalog strings; the writer quotes, the schema'd
    reader must un-quote losslessly), then the string toolkit face:
    translate + upper + lpad — all JVM built-ins with exact DuckDB
    twins."""
    sub = (
        T(spark, sf_dir, "part")
        .where(F.col("p_partkey") <= 400)
        .select("p_partkey", "p_name", "p_retailprice")
    )
    path = os.path.join(_TMP, "a41_csv")
    sub.write.mode("overwrite").option("header", True).option(
        "quoteAll", True
    ).csv(path)
    back = spark.read.option("header", True).schema(
        "p_partkey BIGINT, p_name STRING, p_retailprice DOUBLE"
    ).csv(path)
    return back.select(
        "p_partkey",
        F.translate(F.upper("p_name"), " ", "_").alias("tag"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded"),
        F.round(F.col("p_retailprice") * 1_000_000)
        .cast("long")
        .alias("price_micros"),
    )


@query(
    "a42_json_path_extract",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_prop,
           CAST(json_extract(payload, '$.meta.bucket') AS BIGINT) AS bucket,
           json_extract_string(payload, '$.meta.kind') AS kind
    FROM (
      SELECT event_id, props,
             to_json(struct_pack(meta := struct_pack(
               bucket := user_id % 16, kind := event_type))) AS payload
      FROM events WHERE event_id <= 400
    )
    """,
    tier="T2",
    survey="A3,H12,B7",
)
def a42_json_path_extract(spark, sf_dir):
    """JSON scan + path-extraction face: events round-trip through an
    ndjson sink carrying BOTH the fixture's raw ``props`` JSON string and
    a freshly-serialized nested payload; the reader drops the unused
    columns (B7 = the projection) and digs values back out with
    get_json_object paths — the schemaless-JSON access pattern, vs a32's
    fully-schema'd map/struct reassembly."""
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_id") <= 400)
        .select(
            "event_id",
            "props",
            F.to_json(
                F.struct(
                    F.struct(
                        (F.col("user_id") % 16).alias("bucket"),
                        F.col("event_type").alias("kind"),
                    ).alias("meta")
                )
            ).alias("payload"),
        )
    )
    path = os.path.join(_TMP, "a42_json")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "event_id BIGINT, props STRING, payload STRING"
    ).json(path)
    return back.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_prop"),
        F.get_json_object("payload", "$.meta.bucket")
        .cast("long")
        .alias("bucket"),
        F.get_json_object("payload", "$.meta.kind").alias("kind"),
    )


@query(
    "a43_catalog_set_algebra",
    sql="""
    WITH expected(event_type) AS (
      VALUES ('view'), ('click'), ('purchase'), ('signup'),
             ('error'), ('refund')
    ),
    observed AS (SELECT DISTINCT event_type FROM events)
    SELECT 'known' AS bucket, event_type
    FROM (SELECT event_type FROM expected
          INTERSECT SELECT event_type FROM observed)
    UNION ALL
    SELECT 'all' AS bucket, event_type
    FROM (SELECT event_type FROM expected
          UNION SELECT event_type FROM observed)
    """,
    tier="T2",
    survey="A5,D11,G2,G3",
)
def a43_catalog_set_algebra(spark, sf_dir):
    """In-memory catalog (driver literal) vs observed DISTINCT event
    types, pushed through INTERSECT and UNION DISTINCT and labeled per
    branch — the set-algebra face over a mixed literal/scan pair, where
    a32/g9 used homogeneous table sides."""
    expected = spark.createDataFrame(
        [("view",), ("click",), ("purchase",), ("signup",), ("error",),
         ("refund",)],
        "event_type string",
    )
    observed = T(spark, sf_dir, "events").select("event_type").distinct()
    known = expected.intersect(observed).select(
        F.lit("known").alias("bucket"), "event_type"
    )
    union = expected.union(observed).distinct().select(
        F.lit("all").alias("bucket"), "event_type"
    )
    return known.unionByName(union)


@query(
    "a44_fetch_upload_by_lang",
    sql="""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE doc_id <= 600
    GROUP BY lang
    """,
    tier="T2",
    survey="A11,A12,A2",
)
def a44_fetch_upload_by_lang(spark, sf_dir):
    """Fetch→parse→upload face over the DOCUMENTS corpus (a14/a36 used
    events): language-sharded CSVs behind a doubly-flaky transport
    (fail_times=2, so the retry loop is exercised past one attempt),
    per-lang rollup, chunked idempotent bulk-upsert; the result is the
    datastore's materialized state, so the oracle match proves
    exactly-once delivery through BOTH injected failure edges."""
    import functools
    import shutil

    from oeem_etl_spark.sources import fetch as fx
    from oeem_etl_spark.sources import upload as up

    root = os.path.join(
        _TMP, f"a44_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(root, ignore_errors=True)
    remote = os.path.join(root, "remote")
    fstate = os.path.join(root, "fstate")
    ustate = os.path.join(root, "ustate")
    landing = os.path.join(root, "landing")
    dsroot = os.path.join(root, "ds")
    for d in (remote, fstate, ustate):
        os.makedirs(d, exist_ok=True)

    docs = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") <= 600)
        .select("lang", "n_chars")
    )
    docs.repartition(5, "lang").write.mode("overwrite").option(
        "header", True
    ).csv(remote)
    shards = sorted(
        f
        for f in os.listdir(remote)
        if f.endswith(".csv") and not f.startswith(("_", "."))
    )
    tasks = spark.createDataFrame(
        [(s, s) for s in shards], "task_id string, uri string"
    )
    ffactory = functools.partial(
        fx.local_flaky_fetcher, remote=remote, fail_times=2, state_dir=fstate
    )
    statuses = {
        r["status"]
        for r in fx.fetch_to_landing(tasks, ffactory, landing).collect()
    }
    assert statuses <= {"fetched", "skipped"}

    raw = spark.read.option("header", True).schema(
        "lang string, n_chars long"
    ).csv(landing)
    agg = raw.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    ufactory = functools.partial(
        up.local_flaky_datastore, root=dsroot, fail_times=2, state_dir=ustate
    )
    up.bulk_upload(
        agg.withColumn("seq", F.lit(1)),
        ufactory,
        epoch_id=0,
        batch_size=2,
        max_attempts=5,
    )
    state = up.FilesystemDatastore(dsroot).state("lang", "seq")
    rows = [
        (str(v["lang"]), int(v["n_docs"]), int(v["total_chars"]))
        for v in state.values()
    ]
    return spark.createDataFrame(rows, "lang string, n_docs long, total_chars long")


# ---------------------------------------------------------------------------
# Streaming faces
# ---------------------------------------------------------------------------


@query(
    "i31_stream_sink_rewindow",
    sql=f"""
    SELECT time_bucket(INTERVAL '15 minutes', {_CAST_TS}) AS window_start,
           COUNT(*) AS cnt, {sql_dsum("value", "sum_value")}
    FROM events WHERE event_type = 'purchase'
    GROUP BY window_start
    """,
    tier="T3",
    survey="A9,A10,I1,I8",
)
def i31_stream_sink_rewindow(spark, sf_dir):
    """Source→sink→source→window chain: purchases stream through a
    foreachBatch PARQUET sink (append per micro-batch), then the sink
    directory itself becomes a SECOND file stream feeding a 15-minute
    tumbling aggregation in complete mode — the relay topology a
    multi-hop pipeline runs, where i1's face is a single hop."""
    import shutil

    from oeem_etl_spark.streaming import harness, ops
    from oeem_etl_spark.streaming.source import events_stream

    relay = os.path.join(
        _TMP, f"i31_relay_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(relay, ignore_errors=True)
    stage1 = events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    ).select("ts", "value")
    harness.foreach_batch_to_parquet(stage1, relay)
    schema = spark.read.parquet(relay).schema
    stage2 = spark.readStream.schema(schema).parquet(relay)
    out = ops.tumbling_agg(
        stage2,
        "15 minutes",
        [],
        [F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value")],
    )
    return harness.run_available_now(out, "complete")


@query(
    "i32_stream_sliding_90m",
    sql=f"""
    WITH cand AS (
      SELECT unnest(list_transform(generate_series(0, 2), k ->
               time_bucket(INTERVAL '30 minutes', {_CAST_TS})
                 - k * INTERVAL '30 minutes')) AS window_start,
             event_type, value
      FROM events
    )
    SELECT window_start, event_type, COUNT(*) AS cnt,
           {sql_dsum("value", "sum_value")}
    FROM cand GROUP BY window_start, event_type
    """,
    tier="T3",
    survey="I2,I8",
)
def i32_stream_sliding_90m(spark, sf_dir):
    """90-minute windows sliding every 30 (each event lands in exactly 3
    overlapping windows — i19's face used 2h/1h = 2), keyed by event
    type, complete mode."""
    from oeem_etl_spark.streaming import harness, ops
    from oeem_etl_spark.streaming.source import events_stream

    sdf = events_stream(spark, sf_dir)
    out = ops.sliding_agg(
        sdf,
        "90 minutes",
        "30 minutes",
        ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value")],
    )
    return harness.run_available_now(out, "complete")


@query(
    "i33_stream_dedup_user_days",
    sql=f"""
    SELECT user_id, COUNT(DISTINCT date_trunc('day', {_CAST_TS})) AS n_days
    FROM events GROUP BY user_id
    """,
    tier="T3",
    survey="I5,D11",
)
def i33_stream_dedup_user_days(spark, sf_dir):
    """Streaming dedup face on a DERIVED key: state keeps one row per
    (user, activity day) — the daily-active dedup shape — and a post-
    drain batch agg counts distinct active days per user (i5 deduped raw
    key pairs; this face proves derived-column dedup state)."""
    from oeem_etl_spark.streaming import harness, ops
    from oeem_etl_spark.streaming.source import events_stream

    sdf = events_stream(spark, sf_dir).select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    out = ops.dedup_keys(sdf, ["user_id", "day"])
    drained = harness.run_available_now(out, "append")
    return drained.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days")
    )


@query(
    "i34_stateful_bucket_totals",
    sql=f"""
    SELECT CAST(user_id % 16 AS BIGINT) AS bucket16,
           COUNT(*) AS n_events, {sql_dsum("value", "total_value")}
    FROM events GROUP BY 1
    """,
    tier="T3",
    survey="I6,I8",
)
def i34_stateful_bucket_totals(spark, sf_dir):
    """applyInPandasWithState face on a COARSE derived key (16 hash
    buckets instead of i6's per-user state): the state store holds 16
    rows total at any corpus size — the bounded-cardinality rollup shape
    — and the last update-mode emission per bucket must equal the batch
    aggregate exactly (integer-micros accumulation)."""
    from oeem_etl_spark.streaming import harness, ops
    from oeem_etl_spark.streaming.source import events_stream

    sdf = events_stream(spark, sf_dir).withColumn(
        "bucket16", (F.col("user_id") % 16).cast("long")
    )
    updates = ops.running_totals_state(sdf, key="bucket16")
    drained = harness.run_available_now(updates, "update")
    w = Window.partitionBy("bucket16").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Join faces
# ---------------------------------------------------------------------------


@query(
    "c41_maintenance_overlap",
    sql=f"""
    WITH spans AS (
      SELECT event_id, {_CAST_TS} AS s,
             {_CAST_TS} + INTERVAL '30 minutes' AS e
      FROM events WHERE event_type = 'error'
    ),
    mw(mw_name, ms, me) AS (VALUES
      ('patch-a', TIMESTAMP '2024-01-05 00:00:00',
                  TIMESTAMP '2024-01-05 12:00:00'),
      ('patch-b', TIMESTAMP '2024-01-14 18:00:00',
                  TIMESTAMP '2024-01-15 06:00:00'),
      ('audit',   TIMESTAMP '2024-01-27 00:00:00',
                  TIMESTAMP '2024-01-28 00:00:00'))
    SELECT mw.mw_name, COUNT(*) AS n_overlapping
    FROM spans JOIN mw ON spans.s < mw.me AND mw.ms < spans.e
    GROUP BY mw.mw_name
    """,
    tier="T2",
    survey="C7,A5,C9",
)
def c41_maintenance_overlap(spark, sf_dir):
    """Interval-overlap face against an IN-MEMORY dimension: error-event
    spans ([ts, ts+30min)) overlapped with three literal maintenance
    windows (broadcast — the small side ships, the event side never
    shuffles); c32's face used quarter spans from the same table."""
    from oeem_etl_spark.operators.relational import interval_overlap_join

    spans = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(
            "event_id",
            F.col("ts").alias("s"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
        )
    )
    mw = spark.createDataFrame(
        [
            ("patch-a", "2024-01-05 00:00:00", "2024-01-05 12:00:00"),
            ("patch-b", "2024-01-14 18:00:00", "2024-01-15 06:00:00"),
            ("audit", "2024-01-27 00:00:00", "2024-01-28 00:00:00"),
        ],
        "mw_name string, ms string, me string",
    ).select(
        "mw_name",
        F.col("ms").cast("timestamp").alias("ms"),
        F.col("me").cast("timestamp").alias("me"),
    )
    joined = interval_overlap_join(
        spans, F.broadcast(mw), "s", "e", "ms", "me"
    )
    return joined.groupBy("mw_name").agg(
        F.count(F.lit(1)).alias("n_overlapping")
    )


@query(
    "c42_asof_next_error",
    sql=f"""
    WITH pur AS (
      SELECT event_id, user_id, {_CAST_TS} AS ts
      FROM events WHERE event_type = 'purchase'
    ),
    err AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, {_CAST_TS} AS ts, value,
               row_number() OVER (PARTITION BY user_id, {_CAST_TS}
                                  ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'error'
      ) WHERE rn = 1
    ),
    nxt AS (
      SELECT p.event_id, p.user_id, MIN(e.ts) AS nts
      FROM pur p LEFT JOIN err e
        ON e.user_id = p.user_id AND e.ts > p.ts
      GROUP BY p.event_id, p.user_id
    )
    SELECT n.event_id, n.user_id,
           CAST(epoch_us(n.nts) AS BIGINT) AS err_micros,
           ROUND(e.value, 6) AS err_value
    FROM nxt n LEFT JOIN err e
      ON e.user_id = n.user_id AND e.ts = n.nts
    """,
    tier="T2",
    survey="C8,E2",
)
def c42_asof_next_error(spark, sf_dir):
    """FORWARD as-of (strict): for each purchase, the user's next error
    event — direction="forward", allow_exact=False, the
    next-reading-after semantics c8/k26 (both backward) never exercise.
    The right side is pre-deduped per (user, ts) so the winner is
    deterministic; one shuffle on user_id over |L|+|R| rows, same
    union+window plan as backward."""
    from oeem_etl_spark.operators.relational import asof_join

    ev = T(spark, sf_dir, "events")
    pur = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    err = (
        ev.where(F.col("event_type") == "error")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.unix_micros("ts").alias("err_micros"),
            F.round("value", 6).alias("err_value"),
        )
    )
    out = asof_join(
        pur,
        err,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["err_micros", "err_value"],
        allow_exact=False,
        direction="forward",
    )
    return out.select("event_id", "user_id", "err_micros", "err_value")


# ---------------------------------------------------------------------------
# Relational / window / function faces
# ---------------------------------------------------------------------------


@query(
    "d41_ship_extremes",
    sql="""
    WITH ranked AS (
      SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn_a,
             row_number() OVER (PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_shipdate DESC, l_orderkey DESC,
                        l_linenumber DESC) AS rn_d
      FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           MAX(CASE WHEN rn_a = 1
               THEN l_orderkey * 10 + l_linenumber END) AS first_line,
           MAX(CASE WHEN rn_d = 1
               THEN l_orderkey * 10 + l_linenumber END) AS last_line
    FROM ranked GROUP BY l_returnflag, l_linestatus
    """,
    tier="T2",
    survey="D4,D1",
)
def d41_ship_extremes(spark, sf_dir):
    """Ordered first/last per (returnflag, linestatus) via min_by/max_by
    on the composite (shipdate, orderkey, linenumber) total order — the
    lineitem face of D4 (a33's second face used events); the extreme is
    encoded as orderkey*10+linenumber so a single bigint carries the
    identity."""
    li = T(spark, sf_dir, "lineitem")
    key = F.struct(
        F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    line_id = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.min_by(line_id, key).alias("first_line"),
        F.max_by(line_id, key).alias("last_line"),
    )


@query(
    "d42_quarter_pivot_roundtrip",
    sql="""
    WITH q AS (
      SELECT o_custkey % 10 AS cohort,
             'q' || CAST(quarter(o_orderdate) AS VARCHAR) AS qtr,
             CAST(round(o_totalprice * 1000000) AS BIGINT) AS price_m
      FROM orders WHERE year(o_orderdate) = 1996
    ),
    piv AS (
      SELECT cohort,
             SUM(CASE WHEN qtr = 'q1' THEN price_m END) AS q1,
             SUM(CASE WHEN qtr = 'q2' THEN price_m END) AS q2,
             SUM(CASE WHEN qtr = 'q3' THEN price_m END) AS q3,
             SUM(CASE WHEN qtr = 'q4' THEN price_m END) AS q4
      FROM q GROUP BY cohort
    )
    SELECT cohort, qtr, ROUND(price_m / 1000000.0, 6) AS revenue
    FROM (
      SELECT cohort, 'q1' AS qtr, q1 AS price_m FROM piv
      UNION ALL SELECT cohort, 'q2', q2 FROM piv
      UNION ALL SELECT cohort, 'q3', q3 FROM piv
      UNION ALL SELECT cohort, 'q4', q4 FROM piv
    ) WHERE price_m IS NOT NULL
    """,
    tier="T2",
    survey="D13,D14,H4",
)
def d42_quarter_pivot_roundtrip(spark, sf_dir):
    """Pivot 1996 order revenue to quarter columns per customer cohort,
    then unpivot back to (cohort, qtr, revenue) — the calendar-quarter
    face of the D13→D14 round trip (d34 pivoted event-type buckets);
    integer-micros sums so the pivot cells are exact."""
    o = T(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1996)
    q = o.select(
        (F.col("o_custkey") % 10).alias("cohort"),
        F.concat(F.lit("q"), F.quarter("o_orderdate")).alias("qtr"),
        F.round(F.col("o_totalprice") * 1_000_000).cast("long").alias("price_m"),
    )
    piv = q.groupBy("cohort").pivot("qtr", ["q1", "q2", "q3", "q4"]).sum("price_m")
    unp = piv.unpivot(["cohort"], ["q1", "q2", "q3", "q4"], "qtr", "price_m")
    return unp.where(F.col("price_m").isNotNull()).select(
        "cohort", "qtr",
        F.round(F.col("price_m") / 1_000_000.0, 6).alias("revenue"),
    )


@query(
    "e21_nth_value_range_frame",
    sql="""
    SELECT c_custkey, c_nationkey,
           nth_value(c_custkey, 3) OVER w AS third_in_nation,
           first_value(c_custkey) OVER w2 AS cheapest_so_far
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
           w2 AS (PARTITION BY c_nationkey
                  ORDER BY round(c_acctbal, 2), c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tier="T2",
    survey="E4,E3",
)
def e21_nth_value_range_frame(spark, sf_dir):
    """nth_value over the full-partition frame plus a running
    first_value over an ordered growing frame — the customer/acctbal
    face of E4 (e12's second face used orders); the acctbal order is
    rounded + custkey-tie-broken so the frame contents are total-ordered
    on both engines."""
    c = T(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w2 = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.round("c_acctbal", 2), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.nth_value("c_custkey", 3).over(w).alias("third_in_nation"),
        F.first("c_custkey").over(w2).alias("cheapest_so_far"),
    )


@query(
    "f11_grouped_page3",
    sql="""
    WITH g AS (
      SELECT o_custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 1000000) AS BIGINT))
                  AS BIGINT) AS spend_m
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, n_orders, spend_m
    FROM g ORDER BY spend_m DESC, o_custkey
    LIMIT 25 OFFSET 50
    """,
    tier="T2",
    survey="F2,F3,D1",
)
def f11_grouped_page3(spark, sf_dir):
    """Page 3 (offset 50, limit 25) of a grouped aggregate under a fully
    tie-broken order — pagination AFTER a shuffle stage (f5's second face
    paged a raw scan), so the offset must compose with the agg, not the
    file order."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(
            F.round(F.col("o_totalprice") * 1_000_000).cast("long")
        ).alias("spend_m"),
    )
    return (
        g.orderBy(F.col("spend_m").desc(), F.col("o_custkey"))
        .offset(50)
        .limit(25)
    )


@query(
    "h51_map_algebra",
    sql="""
    WITH m AS (
      SELECT user_id,
             map(list(event_type ORDER BY event_type),
                 list(cnt ORDER BY event_type)) AS counts
      FROM (SELECT user_id, event_type, COUNT(*) AS cnt
            FROM events GROUP BY user_id, event_type)
      GROUP BY user_id
    )
    SELECT user_id, et AS event_type, n * 2 AS doubled
    FROM (
      SELECT user_id, unnest(map_keys(counts)) AS et,
             unnest(map_values(counts)) AS n
      FROM m
    ) WHERE n >= 3
    """,
    tier="T2",
    survey="H10,H8,D1",
)
def h51_map_algebra(spark, sf_dir):
    """Map-builder face: per-user event-type count MAPS assembled with
    map_from_entries over sorted entries, values doubled via
    transform_values, entries below 3 dropped via map_filter, then
    exploded back to rows — h22/a32 accessed maps; this face REWRITES
    them."""
    ev = T(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("counts")
    )
    rewritten = m.select(
        "user_id",
        F.map_filter(
            F.transform_values(
                F.col("counts"), lambda _, v: v * 2
            ),
            lambda _, v: v >= 6,
        ).alias("counts"),
    )
    return rewritten.select(
        "user_id", F.explode("counts").alias("event_type", "doubled")
    )


@query(
    "h52_struct_minmax_sort",
    sql="""
    WITH s AS (
      SELECT user_id,
             min(struct_pack(ts := CAST(ts AS TIMESTAMP), event_id := event_id))
               AS first_s,
             max(struct_pack(ts := CAST(ts AS TIMESTAMP), event_id := event_id))
               AS last_s
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT user_id, first_s.event_id AS first_event,
           last_s.event_id AS last_event,
           CAST(epoch_us(last_s.ts) - epoch_us(first_s.ts) AS BIGINT)
             AS span_micros
    FROM s
    """,
    tier="T2",
    survey="H11,D4",
)
def h52_struct_minmax_sort(spark, sf_dir):
    """STRUCT ordering as the aggregation key: min/max over
    struct(ts, event_id) uses the struct's lexicographic total order
    directly (no min_by indirection — the H11 face is the struct
    comparator itself), then field access unpacks the winners."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    s = F.struct(F.col("ts"), F.col("event_id"))
    g = ev.groupBy("user_id").agg(
        F.min(s).alias("first_s"), F.max(s).alias("last_s")
    )
    return g.select(
        "user_id",
        F.col("first_s.event_id").alias("first_event"),
        F.col("last_s.event_id").alias("last_event"),
        (
            F.unix_micros("last_s.ts") - F.unix_micros("first_s.ts")
        ).alias("span_micros"),
    )


@query(
    "h53_try_parse_family",
    sql="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           TRY_CAST('20' || CAST(user_id AS VARCHAR) AS BIGINT) AS fused,
           CASE WHEN user_id % 7 = 0 THEN NULL
                ELSE CAST(event_id // (user_id % 7) AS BIGINT) END AS safe_div
    FROM events WHERE event_id <= 1500
    """,
    tier="T2",
    survey="H13,B6,H12",
)
def h53_try_parse_family(spark, sf_dir):
    """try_-family face over SEMI-STRUCTURED input (h14 tried casts on
    clean columns): numbers dug out of the props JSON with try_cast,
    string-fused bigints, and integer try_divide — every failure lane
    yields NULL instead of an ANSI abort."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") <= 1500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_num"),
        F.concat(F.lit("20"), F.col("user_id").cast("string"))
        .try_cast("long")
        .alias("fused"),
        F.try_divide(F.col("event_id"), F.col("user_id") % 7)
        .cast("long")
        .alias("safe_div"),
    )
