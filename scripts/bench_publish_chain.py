"""Per-feed publish cost across a feed history: full rewrite vs
format-2 delta commit.

Scenario: standing build (src1+src2), then K chained source
increments. After EVERY increment the state is published twice, into
two separate roots — once with incremental=True (delta commit) and
once full — and the wall time + bytes written of each publish is
recorded. The claim under test: full-publish cost grows linearly with
the number of standing sources (so a feed history pays a quadratic
total), while the delta commit stays flat (one source's per-source
rows + the KG-sized tables).

Usage: python scripts/bench_publish_chain.py [copies] [k_feeds] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 100
K_FEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_publish_chain.json"


def _clone(tdf, new_src: str):
    return tdf.filter(F.col("conv_id").startswith("src2_")).withColumn(
        "conv_id", F.regexp_replace("conv_id", "^src2_", f"{new_src}_")
    )


def _du(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith("part-") and n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, n))
    return total


def main() -> None:
    from veealign_spark.plans.incremental import incremental_update
    from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
    from veealign_spark.plans.standing import list_versions, publish_standing

    spark = bench.fresh_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    path = bench.stage_kg_input(spark, COPIES)
    base_tdf = spark.read.parquet(path)

    cfg = PipelineConfig(blocking="blocked")
    state = run_pipeline(spark, base_tdf, cfg)

    root_inc = f"/tmp/pubchain_inc_{COPIES}_{K_FEEDS}"
    root_full = f"/tmp/pubchain_full_{COPIES}_{K_FEEDS}"
    shutil.rmtree(root_inc, ignore_errors=True)
    shutil.rmtree(root_full, ignore_errors=True)
    publish_standing(spark, state, root_inc)  # v1 full base for the chain
    publish_standing(spark, state, root_full)

    inc_sec, full_sec, inc_mb, full_mb = [], [], [], []
    for k in range(K_FEEDS):
        state = incremental_update(
            spark, state, new_transcripts=_clone(base_tdf, f"src{3 + k}"),
            config=cfg,
        )
        v = list_versions(root_inc)[-1] + 1
        t0 = time.time()
        publish_standing(spark, state, root_inc, incremental=True)
        inc_sec.append(round(time.time() - t0, 2))
        inc_mb.append(round(_du(os.path.join(root_inc, f"v{v:05d}")) / 1e6, 3))
        v = list_versions(root_full)[-1] + 1
        t0 = time.time()
        publish_standing(spark, state, root_full)
        full_sec.append(round(time.time() - t0, 2))
        full_mb.append(round(_du(os.path.join(root_full, f"v{v:05d}")) / 1e6, 3))
        _flush(inc_sec, full_sec, inc_mb, full_mb)

    _flush(inc_sec, full_sec, inc_mb, full_mb, final=True)


def _ratio(xs):
        head = sum(xs[:3]) / 3
        tail = sum(xs[-3:]) / 3
        return round(tail / head, 2) if head else None

def _flush(inc_sec, full_sec, inc_mb, full_mb, final=False):
    out = {
        "copies": COPIES,
        "k_feeds": len(inc_sec),
        "incremental_sec": inc_sec,
        "full_sec": full_sec,
        "incremental_mb": inc_mb,
        "full_mb": full_mb,
        # growth of per-feed cost from the first 3 feeds to the last 3:
        # ~1.0 = flat, >1 = cost rises with standing-source count
        "incremental_growth": _ratio(inc_sec),
        "full_growth": _ratio(full_sec),
        "incremental_mb_growth": _ratio(inc_mb),
        "full_mb_growth": _ratio(full_mb),
        "total_incremental_sec": round(sum(inc_sec), 1),
        "total_full_sec": round(sum(full_sec), 1),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    if final:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
