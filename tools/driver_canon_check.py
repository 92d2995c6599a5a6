"""Replay the DRIVER's pandas canonicalization over every oracle query.

The per-round driver gate (CORRECTNESS_r{N}.json) compares Spark vs DuckDB
by materializing both sides to pandas, sorting columns by name, running
``sort_values`` over all columns, and hashing the values. That pipeline
has failure modes the repr-based local sweep (tools/verify_all.py) never
sees — e.g. an ``array<string>`` output column materializes as
numpy.ndarray cells, which are unhashable/unorderable in pandas
(``h19_soundex_blocking``, CORRECTNESS_r04's one red row).

This tool closes that harness-fidelity gap: for every oracle-checked
query it runs BOTH engines at the given scale factor and pushes both
frames through the same canonicalization the driver uses. The gate is
that canonicalization *completes* on both sides and the shapes agree;
value equality is already covered (more strictly) by tests/test_oracle.py
and verify_all.py.

Usage:
    python tools/driver_canon_check.py            # sf0.001 (fast gate)
    python tools/driver_canon_check.py sf0.01
    python tools/driver_canon_check.py sf0.001 --only h19,d5

Exit 0 iff every oracle query canonicalizes cleanly on both engines.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonicalize(df: pd.DataFrame) -> pd.Series:
    """The driver's canonical form: name-sorted columns, row-sorted over
    all columns, per-row value hash. Raises (like the driver) on cells
    pandas cannot sort or hash — numpy arrays, dicts, Rows."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return pd.util.hash_pandas_object(df, index=False)


def main() -> int:
    argv = sys.argv[1:]
    only: list[str] = []
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    sf = argv[0] if argv else "sf0.001"
    sf_dir = sf if "/" in sf else f"/root/testdata/{sf}"

    repo = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", repo / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    mod.entry(spark).collect()  # session confs warm-up, same as the driver

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    names = sorted(n for n in osql if not only or any(p in n for p in only))
    bad: list[str] = []
    for name in names:
        try:
            s = canonicalize(qs[name](spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001 — the gate IS "does it raise"
            bad.append(name)
            print(f"{name}: SPARK-side canonicalization failed: {str(e)[:200]}")
            continue
        try:
            d = canonicalize(con.sql(osql[name]).df())
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ORACLE-side canonicalization failed: {str(e)[:200]}")
            continue
        if len(s) != len(d):
            bad.append(name)
            print(f"{name}: shape mismatch {len(s)} vs {len(d)}")
    print(f"{sf}: {len(names)} oracle queries canonicalized; failures: {bad or 'none'}")
    con.close()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
