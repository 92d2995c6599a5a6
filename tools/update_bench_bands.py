"""Record BENCH_BANDS.json from 2+ quiet-box bench.py runs (VERDICT r7 #3).

Usage:
    python bench.py > /tmp/b1.json   # quiet box, nf <= 1.1
    python bench.py > /tmp/b2.json
    python tools/update_bench_bands.py /tmp/b1.json /tmp/b2.json

Each input is one bench.py JSON line. For every query that appears in the
``medians`` map of every input, the band is the median of the per-run
medians plus the max relative deviation observed across the runs. bench.py
then flags any future run whose per-query median leaves
``band_median × [1/tolerance, tolerance]`` — the mechanical adjudication
that replaces per-round outlier attribution (l64/t02 in r7, l50 in r6,
l63b/l64 in r5 all cost a judge cycle each).

Refuses runs with noise_factor > 1.1: a contended-box band would bake the
contention into every future comparison. Update INTENTIONALLY, like
tools/plan_bounds.json — after a deliberate perf change or a new bench
query, never to paper over an unexplained jump.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
NF_CAP = 1.1
TOLERANCE = 1.5  # absorbs the documented 1.0->1.49 hypervisor swing


def main() -> int:
    runs = []
    for p in sys.argv[1:]:
        text = Path(p).read_text().strip()
        # Accept either a BENCH_DETAIL artifact (pretty-printed JSON —
        # since r9 the medians live THERE, not on the machine line) or a
        # raw bench.py stdout capture (one JSON line after log lines).
        try:
            runs.append(json.loads(text))
        except json.JSONDecodeError:
            line = [ln for ln in text.splitlines() if ln.startswith("{")][-1]
            runs.append(json.loads(line))
    if len(runs) < 2:
        print("need >= 2 bench.py output files", file=sys.stderr)
        return 2
    for r in runs:
        nf = (r.get("duckdb_ref") or {}).get("noise_factor")
        if nf is None or nf > NF_CAP:
            print(
                f"refusing run with noise_factor={nf} (> {NF_CAP}): bands "
                "must be recorded on a quiet box",
                file=sys.stderr,
            )
            return 2
        if not r.get("medians"):
            print("run has no 'medians' map (bench.py too old?)", file=sys.stderr)
            return 2
    names = set(runs[0]["medians"])
    for r in runs[1:]:
        names &= set(r["medians"])
    queries = {}
    for n in sorted(names):
        meds = sorted(r["medians"][n] for r in runs)
        mid = meds[len(meds) // 2]
        dev = max(abs(m - mid) / mid for m in meds) if mid else 0.0
        queries[n] = {"median": mid, "max_dev": round(dev, 4)}
    out = {
        "round": max(
            (int(p.stem.split("_r")[-1]) for p in REPO.glob("CORRECTNESS_r*.json")),
            default=0,
        )
        + 1,
        "n_runs": len(runs),
        "noise_factors": [r["duckdb_ref"]["noise_factor"] for r in runs],
        "tolerance": TOLERANCE,
        "queries": queries,
    }
    (REPO / "BENCH_BANDS.json").write_text(json.dumps(out, indent=1) + "\n")
    print(f"BENCH_BANDS.json: {len(queries)} queries from {len(runs)} runs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
