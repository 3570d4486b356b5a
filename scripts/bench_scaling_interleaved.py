"""Noise-robust N-vs-4N scaling measurement: INTERLEAVED spark-submit
runs at local[2] and local[8] within one measurement window.

Motivation (round-3 verdict): this box is multi-tenant and the 4N
point drifts ~25% across the day, so two efficiency numbers measured
hours apart (0.857 early, 0.693 late, same code at the control point)
disagree by more than the contract margin. Alternating the two levels
run-by-run makes every local[2] sample temporally adjacent to a
local[8] sample, so slow-tenancy epochs hit both levels instead of
one, and the PAIRED medians give an efficiency estimate that does not
depend on which hour the script started.

Protocol: `iters` interleaved iterations of [local[2] submit,
local[8] submit]; each submit runs the pipeline `--repeat 2 --no-write`
and reports its in-submit best (steady state: the first in-JVM run
carries one-time codegen/python-worker spinup). Report per-level
median + min/max over the iterations and efficiency =
(median_N / median_4N) / 4, plus the per-iteration paired ratios.

Usage: python scripts/bench_scaling_interleaved.py [iters] [copies] [out]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 12000
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/scaling_interleaved.json"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def submit(cores: int, it: int, inp: str) -> dict:
    outdir = f"/tmp/scale_il_{cores}_{it}"
    cmd = [
        "spark-submit", "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--py-files", os.path.join(REPO, "dist/veealign_spark.zip"),
        os.path.join(REPO, "scripts/run_pipeline_submit.py"),
        "--input", inp, "--output", outdir,
        "--repeat", "2", "--no-write",
    ]
    t0 = time.time()
    subprocess.run(cmd, check=True, capture_output=True)
    with open(os.path.join(outdir, "run_summary.json")) as f:
        s = json.load(f)
    s["wall"] = round(time.time() - t0, 1)
    return s


def main() -> None:
    import bench

    spark = bench.fresh_spark(8)
    inp = bench.stage_kg_input(spark, COPIES)
    n_triples = None
    spark.stop()
    if not os.path.exists(os.path.join(REPO, "dist/veealign_spark.zip")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/make_pyfiles.py")],
            check=True,
        )

    rows = []
    for it in range(ITERS):
        r2 = submit(2, it, inp)
        r8 = submit(8, it, inp)
        pair = {
            "iter": it,
            "local2_best": r2["sec"], "local2_runs": r2["runs"],
            "local8_best": r8["sec"], "local8_runs": r8["runs"],
            "paired_eff": round(r2["sec"] / r8["sec"] / 4, 3),
        }
        rows.append(pair)
        print(json.dumps(pair), flush=True)

    m2 = statistics.median(r["local2_best"] for r in rows)
    m8 = statistics.median(r["local8_best"] for r in rows)
    out = {
        "iters": ITERS,
        "copies": COPIES,
        "rows": rows,
        "local2_median": m2,
        "local2_min": min(r["local2_best"] for r in rows),
        "local2_max": max(r["local2_best"] for r in rows),
        "local8_median": m8,
        "local8_min": min(r["local8_best"] for r in rows),
        "local8_max": max(r["local8_best"] for r in rows),
        "speedup_median": round(m2 / m8, 2),
        "efficiency_median": round(m2 / m8 / 4, 3),
        "paired_eff_median": statistics.median(r["paired_eff"] for r in rows),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "rows"}))


if __name__ == "__main__":
    main()
