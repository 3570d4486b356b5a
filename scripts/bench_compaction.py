"""Standing-snapshot compaction benchmark: the maintenance cost a
standing KG pays to stay healthy across feeds.

Scenario: a checkpointed standing build (src1+src2 at `copies`
re-verbalizations) followed by `n_incs` chained source increments,
each with the SAME shared checkpoint_dir — the realistic fragmented
state: every increment leaves its own inc_<fp>_* stage directories.
Then:

- census the fragmented durable state (part files, bytes),
- `compact_standing` -> one versioned snapshot (timed),
- `load_standing(verify=True)` cold-open (timed),
- `validate_kg` over the reloaded tables (timed; must be all zeros),
- one MORE increment applied to the reloaded snapshot, equality-
  checked against the same increment applied to the live dict
  (accepted counts must match — the cold-start equivalence the
  pytest pins at fixture scale, re-proven at bench scale).

Usage: python scripts/bench_compaction.py [copies] [n_incs] [out_json]
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

COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 500
N_INCS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/bench_compaction.json"


def _clone(tdf, new_src: str):
    return tdf.filter(F.col("conv_id").startswith("src2_")).withColumn(
        "conv_id", F.regexp_replace("conv_id", "^src2_", f"{new_src}_")
    )


def _du(path: str) -> tuple[int, int]:
    files = bytes_ = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith("part-") and n.endswith(".parquet"):
                files += 1
                bytes_ += os.path.getsize(os.path.join(root, n))
    return files, bytes_


def main() -> None:
    from veealign_spark.operators import canonicalize
    from veealign_spark.plans.incremental import incremental_update
    from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline
    from veealign_spark.plans.standing import (
        compact_standing,
        diff_versions,
        load_standing,
        publish_standing,
    )

    spark = bench.fresh_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    path = bench.stage_kg_input(spark, COPIES)
    base_tdf = spark.read.parquet(path)

    ckpt = f"/tmp/compaction_ckpt_{COPIES}_{N_INCS}"
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg = PipelineConfig(blocking="blocked", checkpoint_dir=ckpt)

    t0 = time.time()
    state = run_pipeline(spark, base_tdf, cfg)
    t_standing = time.time() - t0

    t0 = time.time()
    for i in range(N_INCS):
        state = incremental_update(
            spark, state, new_transcripts=_clone(base_tdf, f"src{3 + i}"),
            config=cfg,
        )
    t_incs = time.time() - t0

    frag_files, frag_bytes = _du(ckpt)

    snap = f"/tmp/compaction_snap_{COPIES}_{N_INCS}"
    shutil.rmtree(snap, ignore_errors=True)
    t0 = time.time()
    manifest = compact_standing(spark, state, snap)
    t_compact = time.time() - t0
    snap_files, snap_bytes = _du(snap)

    t0 = time.time()
    loaded = load_standing(spark, snap, verify=True)
    t_load = time.time() - t0

    t0 = time.time()
    audit = {
        r["invariant"]: r["violations"]
        for r in canonicalize.validate_kg(
            loaded["clusters"], loaded["accepted"], loaded["kg_triples"],
            loaded["kg_entities"],
        ).collect()
    }
    t_audit = time.time() - t0

    # cold-start equivalence at bench scale: the next increment off
    # the reloaded snapshot == off the live dict
    nxt = _clone(base_tdf, "srcnext")
    cfg_live = PipelineConfig(blocking="blocked")
    state_next = incremental_update(
        spark, state, new_transcripts=nxt, config=cfg_live
    )
    acc_live = state_next["accepted"].count()
    acc_cold = incremental_update(
        spark, loaded, new_transcripts=nxt, config=cfg_live
    )["accepted"].count()

    # the continuous-deployment loop: publish pre- and post-increment
    # versions (atomic CURRENT flip each), then run the version-diff
    # audit between them -- the per-feed ops cost on top of ingest
    root = f"/tmp/compaction_pub_{COPIES}_{N_INCS}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.time()
    publish_standing(spark, state, root, lineage={"feed": "standing"})
    t_pub1 = time.time() - t0
    # the corpus-flat per-feed commit: the post-increment state as a
    # format-2 DELTA off v1 (per-source tables ship only srcnext's
    # rows; KG-sized tables rewritten) -- what a long-running
    # deployment pays per feed
    t0 = time.time()
    publish_standing(
        spark, state_next, root, lineage={"feed": "srcnext-delta"},
        incremental=True,
    )
    t_pub_inc = time.time() - t0
    inc_files, inc_bytes = _du(os.path.join(root, "v00002"))
    # the same state as a FULL rewrite (the O(corpus)-per-feed
    # alternative the delta commit replaces)
    t0 = time.time()
    publish_standing(spark, state_next, root, lineage={"feed": "srcnext"})
    t_pub2 = time.time() - t0
    t0 = time.time()
    dv = diff_versions(spark, root, 1, 2, table="clusters")
    diff_added = dv.filter(F.col("change") == "added").count()
    diff_removed = dv.filter(F.col("change") == "removed").count()
    t_diff = time.time() - t0
    out = {
        "copies": COPIES,
        "n_increments": N_INCS,
        "standing_build_sec": round(t_standing, 2),
        "increments_sec": round(t_incs, 2),
        "fragmented_files": frag_files,
        "fragmented_mb": round(frag_bytes / 1e6, 1),
        "snapshot_files": snap_files,
        "snapshot_mb": round(snap_bytes / 1e6, 1),
        "compact_sec": round(t_compact, 2),
        "load_verify_sec": round(t_load, 2),
        "audit_sec": round(t_audit, 2),
        "invariant_audit": audit,
        "table_rows": manifest["tables"],
        "accepted_next_live": acc_live,
        "accepted_next_cold": acc_cold,
        "cold_start_match": acc_live == acc_cold,
        "publish_full_base_sec": round(t_pub1, 2),
        "publish_full_next_sec": round(t_pub2, 2),
        "publish_incremental_sec": round(t_pub_inc, 2),
        "incremental_version_files": inc_files,
        "incremental_version_mb": round(inc_bytes / 1e6, 2),
        "diff_clusters_sec": round(t_diff, 2),
        "diff_added": diff_added,
        "diff_removed": diff_removed,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
