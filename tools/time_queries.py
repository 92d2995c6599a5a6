"""Time every declared query driver-style (Spark collect + DuckDB oracle)
at sf0.01 in a bare session; write tools/query_times.json sorted slowest
first. Used to order ``queries()`` cheapest-first so a time-capped driver
sweep covers the maximum number of queries.
"""

from __future__ import annotations

import importlib.util
import json
import time
from pathlib import Path

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
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

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    times: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).collect()
            if name in osql:
                con.sql(osql[name]).fetchall()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            times[name] = -1.0
            print(f"{name} ERROR {str(e)[:120]}", flush=True)
        print(f"{name}\t{times[name]}", flush=True)

    out = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    (repo / "tools" / "query_times.json").write_text(json.dumps(out, indent=1))
    total = sum(v for v in times.values() if v > 0)
    print(f"total {total:.1f}s over {len(times)} queries")


if __name__ == "__main__":
    main()
