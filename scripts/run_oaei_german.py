"""Evaluate the German single-pair tracks (lebensmittel / freizeit)
and append the results to BENCH/OAEI.md.

Each track runs twice: untrained (seeded kernel, the track's own
reference config column - README.md:63-78) and with conference-trained
kernel weights (train_track on the conference track, same seeds as
scripts/run_oaei_trained.py). Thresholds tune on the track's gold in
both variants (the element-protocol convention used everywhere else in
BENCH/OAEI.md), so the delta isolates what the trained head transfers
across tracks over the hash-stub embeddings.

Usage: python scripts/run_oaei_german.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from veealign_spark.plans import oaei_eval, train_oaei  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402

TRACKS = {
    "lebensmittel": dict(max_paths=2, max_pathlen=1),
    "freizeit": dict(max_paths=16, max_pathlen=1),
}


def main() -> None:
    spark = get_spark("oaei_german", cores=16)
    ref_root = "/root/reference/datasets"

    t0 = time.time()
    trained = train_oaei.train_track(spark, f"{ref_root}/conference")
    t_train = time.time() - t0

    rows = {}
    for ds, kw in TRACKS.items():
        cfg_u = oaei_eval.reference_config(
            bag_of_neighbours=False, weighted_sum=False, **kw
        )
        trip = oaei_eval.track_pairs(f"{ref_root}/{ds}")
        t0 = time.time()
        res_u = oaei_eval.evaluate_track(
            spark, f"{ref_root}/{ds}", config=cfg_u, triplets=trip
        )
        t_u = time.time() - t0
        # trained weights are tied to the feature geometry they were
        # trained with (conference reference config: max_paths=21,
        # max_pathlen=8) — the track's own structural knobs cannot be
        # applied to a frozen kernel, so the default config rides along
        t0 = time.time()
        res_t = train_oaei.evaluate_with_params(
            spark, f"{ref_root}/{ds}", trained["params"],
            trained["report"]["max_types"], triplets=trip,
            tune_on_gold=True,
        )
        t_t = time.time() - t0
        rows[ds] = {
            "untrained": {"micro": res_u["micro"], "threshold": res_u["threshold"],
                          "ceiling": res_u["per_pair"][0].get("f1_ceiling"),
                          "sec": round(t_u, 1)},
            "trained": {"micro": res_t["micro"], "threshold": res_t["threshold"],
                        "ceiling": res_t["per_pair"][0].get("f1_ceiling"),
                        "sec": round(t_t, 1)},
        }
        print("RESULT", ds, json.dumps(rows[ds], default=float), flush=True)

    out_path = os.environ.get("GERMAN_RESULT_JSON", "/tmp/r4/german_result.json")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump({"train_sec": round(t_train, 1), "tracks": rows}, f,
                  indent=1, default=float)

    def fmt(v):
        m = v["micro"]
        return (f"P={m['precision']:.3f} R={m['recall']:.3f} "
                f"**F1={m['f1']:.3f}** (tp={m['tp']} fp={m['fp']} "
                f"fn={m['fn']}, thr {v['threshold']:.4f}, "
                f"no-1:1 ceiling {v['ceiling']})")

    section = f"""

# German single-pair tracks (lebensmittel / freizeit)

The reference ships these two tracks with both ontologies AND gold
(README.md:63-78 config columns: lebensmittel max_paths=2
max_pathlen=1; freizeit max_paths=16 max_pathlen=1; both without
bag_of_neighbours / weighted_sum). Parse parity on all 4 German
ontologies is pinned in test_owl.py; the lebensmittel confusion counts
are pinned e2e in test_german.py. Thresholds tuned on the track's
gold (element-protocol convention); 1:1 resolution on.

| track | variant | result |
|---|---|---|
| lebensmittel | untrained stub | {fmt(rows['lebensmittel']['untrained'])} |
| lebensmittel | conference-trained | {fmt(rows['lebensmittel']['trained'])} |
| freizeit | untrained stub | {fmt(rows['freizeit']['untrained'])} |
| freizeit | conference-trained | {fmt(rows['freizeit']['trained'])} |

Reading: freizeit's category names overlap almost token-for-token
(dmoz vs Google directory slices), so the untrained engine already
resolves it near-perfectly - and the symmetric-best 1:1 filter lifts
final F1 ABOVE the no-1:1 single-threshold ceiling. lebensmittel's
misses are synonym-level German label pairs (e.g. Backwaren vs
Back-Suesswaren) - the tuned threshold already sits at the pair's own
ceiling, the same hash-stub-embedding recall limit measured on
conference; a real encoder plugged in through the external-vectors
seam is the lever, not engine structure.
"""
    with open(Path(__file__).resolve().parent.parent / "BENCH" / "OAEI.md", "a") as f:
        f.write(section)
    print("DONE")


if __name__ == "__main__":
    main()
