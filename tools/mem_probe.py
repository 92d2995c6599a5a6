"""Shuffle-bytes / spill probe for the row-scale-shuffle shapes
(VERDICT r6 task #6): dense_ids (100×: 7.4×) and substring_spans
(100×: 7.58×) are sub-linear in TIME, but both materialize shuffles
proportional to row count — this probe records what those shuffles
actually COST in bytes (shuffle write/read, memory/disk spill) at 1×
and 100×, via Spark's own stage metrics (REST API of the local UI), so
the 100 TB claim for these two shapes rests on measured exchange
volume, not wall-clock alone.

What the numbers mean at 100 TB: shuffle bytes scaling ~linearly with
rows at a per-row cost of a few dozen bytes is the designed behavior —
both shapes shuffle fixed-width keys/ids (never text); the claim being
checked is that per-row shuffle cost does NOT grow with scale and that
local-mode execution doesn't spill (executors sized like ours wouldn't
spill at the same per-task volume either).

Usage: python tools/mem_probe.py --artifact MEM_r07.json
(expects /tmp/oeem_scale100 — run scale_probe.py at
SPARK_SCALE_COPIES=100 first).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DIR100 = "/tmp/oeem_scale100"


def stage_metrics(ui: str) -> dict[int, dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    return {
        s["stageId"]: {
            "shuffle_write": s.get("shuffleWriteBytes", 0),
            "shuffle_read": s.get("shuffleReadBytes", 0),
            "mem_spill": s.get("memoryBytesSpilled", 0),
            "disk_spill": s.get("diskBytesSpilled", 0),
        }
        for s in stages
        if s["status"] in ("COMPLETE", "FAILED")
    }


_METRIC_KEYS = ("shuffle_write", "shuffle_read", "mem_spill", "disk_spill")


def _settled_metrics(ui: str, timeout_s: float = 15.0) -> dict[int, dict]:
    """Poll the REST store until two consecutive snapshots agree (stage
    COUNT and metric VALUES) — the async store can lag the job end, and a
    fixed 1 s sleep silently undercounted late-settling stages."""
    prev = stage_metrics(ui)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        time.sleep(0.5)
        cur = stage_metrics(ui)
        if cur == prev:
            return cur
        prev = cur
    return prev


def run_probe(spark, ui: str, fn) -> dict:
    before = _settled_metrics(ui)
    t0 = time.perf_counter()
    rows = fn().count()
    sec = time.perf_counter() - t0
    after = _settled_metrics(ui)
    # Diff per-stage metric VALUES, not new-stage-ids-only (ADVICE r7 #4):
    # resubmitted/reused stage ids (same stageId re-attempted, or a
    # skipped-then-materialized exchange) carry metric DELTAS under an id
    # present in 'before' and were previously dropped. max(after-before, 0)
    # guards the store evicting/resetting an old stage between snapshots.
    delta = {
        k: sum(
            max(v[k] - before.get(sid, {}).get(k, 0), 0)
            for sid, v in after.items()
        )
        for k in _METRIC_KEYS
    }
    return {"rows": rows, "sec": round(sec, 2), **delta}


def main() -> None:
    artifact = None
    if "--artifact" in sys.argv:
        artifact = sys.argv[sys.argv.index("--artifact") + 1]

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "32g")
        .appName("oeem-mem-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from oeem_etl_spark.catalog import ensure_session_confs

    ensure_session_confs(spark)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024)
    )
    ui = spark.sparkContext.uiWebUrl

    from oeem_etl_spark.operators.dedup import duplicate_window_spans
    from oeem_etl_spark.operators.ids import dense_ids

    def dense_ids_shape(sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            F.concat_ws("|", "l_orderkey", "l_linenumber").alias("k")
        )
        return dense_ids(li, "k", buckets=64)

    def _copy_renamed_docs(sf_dir):
        # scale_probe's convention: per-copy token renaming keeps
        # duplication copy-local, so span volume scales with rows, not
        # copies² (the production analogue: a 100× corpus has 100× the
        # duplicated regions, not cross-shard collisions of one region).
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        copy = F.floor(F.col("doc_id") / F.lit(5000)).cast("string")
        return docs.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(F.lit("c"), copy, F.lit("_"), t),
                ),
                " ",
            ).alias("text"),
        )

    def substring_spans_shape(sf_dir):
        return duplicate_window_spans(
            _copy_renamed_docs(sf_dir), "doc_id", "text", window=20
        )

    shapes = {
        "dense_ids": dense_ids_shape,
        "substring_spans": substring_spans_shape,
    }
    results = []
    for scale, sf_dir in (("1x", SF_DIR), ("100x", DIR100)):
        for name, fn in shapes.items():
            spark.catalog.clearCache()
            rec = run_probe(spark, ui, lambda: fn(sf_dir))
            rec.update({"shape": name, "scale": scale})
            rec["shuffle_write_per_row"] = (
                round(rec["shuffle_write"] / rec["rows"], 1) if rec["rows"] else None
            )
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if artifact:
        summary = {}
        for name in shapes:
            r1 = next(r for r in results if r["shape"] == name and r["scale"] == "1x")
            r100 = next(
                r for r in results if r["shape"] == name and r["scale"] == "100x"
            )
            summary[name] = {
                "bytes_ratio_100x": (
                    round(r100["shuffle_write"] / r1["shuffle_write"], 1)
                    if r1["shuffle_write"]
                    else None
                ),
                "spill_100x": r100["mem_spill"] + r100["disk_spill"],
            }
        Path(artifact).write_text(
            json.dumps({"results": results, "summary": summary}, indent=1) + "\n"
        )
        print(f"wrote {artifact}")


if __name__ == "__main__":
    main()
