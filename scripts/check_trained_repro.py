"""Bit-for-bit reproduction check for the conference trained numbers
after the r5 trainer refactor (pool-bounded feature collects): same
seeds must yield the exact r4 element-protocol record —
tp=204 fp=42 fn=101 (F1 0.740), tuned threshold 0.8372.

Usage: python scripts/check_trained_repro.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from veealign_spark.plans import train_oaei  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("trained_repro", cores=16)
    ds = "/root/reference/datasets/conference"
    t0 = time.time()
    trained = train_oaei.train_track(spark, ds)
    thr, _ = train_oaei.tune_threshold(trained["prep"], trained["params"])
    trained["params"].threshold = thr
    res = train_oaei.evaluate_with_params(
        spark, ds, trained["params"], trained["report"]["max_types"],
        tune_on_gold=False,
    )
    wall = round(time.time() - t0, 1)
    m = res["micro"]
    out = {"micro": m, "threshold": thr, "wall_sec": wall}
    print("REPRO " + json.dumps(out, default=float))
    ok = (m["tp"], m["fp"], m["fn"]) == (204, 42, 101) and abs(thr - 0.8372) < 5e-4
    print("MATCH_R4" if ok else "MISMATCH_R4")


if __name__ == "__main__":
    main()
