"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total warm sec>, "unit": "sec",
   "queries": {"q01_...": sec, ...}, "sf": 0.1}

Methodology (BASELINE.md): one shared SparkSession for the whole run; each
query is executed once untimed (warms JVM/codegen/file-footer caches — the
8.8 s cold vs 0.31 s warm gap is session overhead, not query cost), then
timed. Results are consumed via count() so the full plan executes without
driver-side row materialization costs skewing the measure.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oeem_etl_spark import plans
from oeem_etl_spark.plans import registry
from oeem_etl_spark.session import get_session

# Headline set: the flagship scan→agg, the join-heavy rollup, the window
# top-k, the time-bucket rollup, plus the heaviest operators (as-of join,
# dedup, pivot) — one per physical-plan family.
HEADLINE = [
    "q01_pricing_summary",
    "q02_top_revenue_customers",
    "q03_hourly_rollup",
    "c8_asof_join",
    "d12_dedup_keep_latest",
    "e5_topk_per_group",
    "d13_pivot",
    "k6_merge_upsert",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    plans.load_all()
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs]

    spark = get_session("oeem-etl-spark-bench")

    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        df.count()  # warm-up: plan + codegen + IO caches
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "headline_queries_warm_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
