"""Bit-exactness of the DuckDB XXH64 generators vs Spark's F.xxhash64.

Three-way parity: Spark (ground truth) == pure-python reference ==
generated DuckDB SQL, over the byte-length boundary cases (empty, every
tail combination, exactly 31/32/33 bytes around the stripe threshold,
multi-byte UTF-8) and the chained ``xxhash64(str, lit(k))`` form the
count-min sketch uses.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oeem_etl_spark.plans import xxh64_sql as X

CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "abcdefghijk",
    "hello world",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "x" * 36,
    "x" * 39,
    "x" * 40,
    "x" * 44,
    "x" * 63,
    "x" * 64,
    "x" * 65,
    "y" * 100,
    "héllo wörld",
    "日本語のテキスト mixed with ascii to exceed thirty-two bytes",
    "the quick brown fox jumps over the lazy dog",
    "1",
    "42",
    "user_9981",
]


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_python_reference_matches_spark(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(CASES)], "id int, s string")
    rows = df.select(
        "id", "s", F.xxhash64("s").alias("h"),
        F.xxhash64("s", F.lit(7)).alias("h7i"),
        F.xxhash64("s", F.lit(7).cast("long")).alias("h7l"),
    ).collect()
    assert len(rows) == len(CASES)
    for r in rows:
        b = r["s"].encode("utf-8")
        inner = X.py_xxh64_bytes(b)
        assert r["h"] == _signed(inner), r["s"][:20]
        # an INT literal chains through the 4-byte hashInt path, a LONG
        # literal through the 8-byte hashLong path — both must match
        assert r["h7i"] == _signed(X.py_xxh64_int(7, seed=inner)), r["s"][:20]
        assert r["h7l"] == _signed(X.py_xxh64_long(7, seed=inner)), r["s"][:20]


def test_python_reference_matches_spark_long_path(spark):
    vals = [0, 1, -1, 42, -42, 10**15, -(10**15), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert r["h"] == _signed(X.py_xxh64_long(r["v"]))


def test_duckdb_cte_matches_reference():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(CASES)))
        + ") v(id, s)",
        CASES,
    )
    sql = (
        f"WITH {X.xxh64_bytes_cte('t', 's', max_len=128)} "
        "SELECT id, s, bx_xxh, bx_u FROM bxf ORDER BY id"
    )
    for (_i, s, xxh, u) in con.execute(sql).fetchall():
        ref = X.py_xxh64_bytes(s.encode("utf-8"))
        assert int(u) == ref and xxh == _signed(ref), s[:20]

    sql2 = (
        f"WITH {X.xxh64_bytes_cte('t', 's', max_len=128)},\n"
        f"{X.hashlong_const_ctes('bxf', 45, 'bx_u', 'cl')},\n"
        f"{X.hashint_const_ctes('clf', 45, 'bx_u', 'ci')}\n"
        "SELECT id, s, cl_xxh, ci_xxh FROM cif ORDER BY id"
    )
    for (_i, s, xxh_l, xxh_i) in con.execute(sql2).fetchall():
        inner = X.py_xxh64_bytes(s.encode("utf-8"))
        assert xxh_l == _signed(X.py_xxh64_long(45, seed=inner)), s[:20]
        assert xxh_i == _signed(X.py_xxh64_int(45, seed=inner)), s[:20]


def test_duckdb_cte_on_fixture_tokens(spark, duck, sf_dir):
    """End-to-end over real fixture data: every distinct token of 30
    sampled documents hashes identically in Spark and the DuckDB CTE."""
    from oeem_etl_spark.plans.util import T
    from oeem_etl_spark.operators import text

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") <= 300)
    toks = (
        docs.select(F.explode(text.tokenize("text")).alias("tok"))
        .distinct()
        .select("tok", F.xxhash64("tok").alias("h"))
    )
    got = {r["tok"]: r["h"] for r in toks.collect()}
    assert len(got) > 20  # synthetic corpus: ~31-token vocabulary
    sql = (
        "WITH src AS (SELECT DISTINCT unnest(str_split(text, ' ')) AS tok "
        "FROM documents WHERE doc_id <= 300),\n"
        f"{X.xxh64_bytes_cte('src', 'tok')} "
        "SELECT tok, bx_xxh FROM bxf"
    )
    oracle = {tok: h for tok, h in duck.execute(sql).fetchall()}
    missing = set(got) - set(oracle)
    assert not missing, sorted(missing)[:5]
    bad = [t for t in got if oracle[t] != got[t]]
    assert not bad, bad[:5]


def test_max_len_guard_is_loud():
    """An input longer than the unroll bound must raise, never mis-hash."""
    con = duckdb.connect()
    con.execute("CREATE TABLE g AS SELECT 'x' AS s UNION ALL SELECT repeat('y', 70)")
    sql = f"WITH {X.xxh64_bytes_cte('g', 's', max_len=64)} SELECT bx_xxh FROM bxf"
    with pytest.raises(duckdb.Error, match="max_len"):
        con.execute(sql).fetchall()


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    batch=st.lists(
        st.text(max_size=40).filter(lambda s: len(s.encode()) <= 128),
        min_size=1,
        max_size=24,
    )
)
def test_duckdb_cte_random_strings_match_reference(batch):
    """Random-unicode fuzz of the straight-line unroll vs the python
    reference (which test_python_reference_matches_spark pins to Spark):
    one batched DuckDB query per example, arbitrary lengths 0..128."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i in range(len(batch)))
        + ") v(id, s)",
        batch,
    )
    sql = (
        f"WITH {X.xxh64_bytes_cte('t', 's', max_len=128)} "
        "SELECT id, s, bx_xxh FROM bxf ORDER BY id"
    )
    for (_i, s, xxh) in con.execute(sql).fetchall():
        assert xxh == _signed(X.py_xxh64_bytes(s.encode("utf-8"))), repr(s)
    con.close()
