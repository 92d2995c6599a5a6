"""Optimization-round profiler: capture plans + isolated timings.

For each requested query (default: the bench HEADLINE + EXTRA sets), under
the exact bench session confs:

- writes ``plans/r10/<name>_<tag>.txt`` with ``explain('formatted')``
- times the query warm with BOTH the bench action (count()) and the
  noop sink (guide 1.4 - computes every column, no driver collection)
- labels jobs via setJobDescription

Usage:
    python tools/opt_profile.py <tag> [query,query,...]

``tag`` is ``before`` / ``after`` (the plan-file suffix).
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from oeem_etl_spark import plans  # noqa: E402
from oeem_etl_spark.plans import registry  # noqa: E402
from oeem_etl_spark.session import get_session  # noqa: E402

import bench  # noqa: E402

DEFAULT = bench.HEADLINE + [
    "l2_minhash_lsh_dedup", "l3e_topk_arrow", "l29_semantic_dedup",
    "k23_calendarize", "t21_waiting_supplier", "h17_fuzzy_join",
    "k34_nearest_station", "k37_meter_pipeline", "l50_neardup_canonical",
    "k40_tiered_billing", "d24b_weighted_median_bucketed",
    "m10_touch_attribution", "l62b_substring_dedup_text",
    "l63b_pq_refined_topk", "l64_bpe_train", "t02_min_cost_supplier",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans.load_all()
    qs = registry.queries()

    spark = get_session("oeem-etl-opt-profile")
    from oeem_etl_spark.catalog import ensure_session_confs

    ensure_session_confs(spark)
    # exact bench regime (bench.py)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    out_dir = REPO / "plans" / "r10"
    out_dir.mkdir(parents=True, exist_ok=True)
    results: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        df = fn(spark, sf_dir)
        plan_file = out_dir / f"{name}_{tag}.txt"
        with open(plan_file, "w") as fh, redirect_stdout(fh):
            df.explain("formatted")

        sc = spark.sparkContext
        sc.setJobDescription(f"{name}: warm")
        for _ in range(2):
            fn(spark, sf_dir).count()
        counts, noops = [], []
        for i in range(5):
            sc.setJobDescription(f"{name}: count {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            counts.append(time.perf_counter() - t0)
        for i in range(3):
            sc.setJobDescription(f"{name}: noop {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
        sc.setJobDescription(None)
        results[name] = {
            "count_min": round(min(counts), 4),
            "count_med": round(sorted(counts)[len(counts) // 2], 4),
            "noop_min": round(min(noops), 4),
        }
        print(f"{name}: count_min={results[name]['count_min']}"
              f" noop_min={results[name]['noop_min']}", flush=True)

    art = REPO / "artifacts" / f"OPT_PROFILE_{tag}.json"
    art.write_text(json.dumps({"sf_dir": sf_dir, "results": results}, indent=1))
    print(json.dumps({"total_count_min": round(sum(r["count_min"] for r in results.values()), 4)}))


if __name__ == "__main__":
    main()
