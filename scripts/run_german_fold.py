"""Evaluate the German tracks with the per-track label fold
(oaei_eval.german_label_fold — 'und' stopword + token-bag order) vs
the round-4 baseline rows, and append the result to BENCH/OAEI.md
(r4 verdict item #8: does the lebensmittel 0.667 ceiling move?).

Usage: python scripts/run_german_fold.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from veealign_spark.plans import oaei_eval  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402
from veealign_spark.sources import owl  # noqa: E402

TRACKS = {
    "lebensmittel": dict(max_paths=2, max_pathlen=1),
    "freizeit": dict(max_paths=16, max_pathlen=1),
}


def main() -> None:
    spark = get_spark("german_fold", cores=16)
    ref_root = "/root/reference/datasets"
    rows = {}
    for ds, kw in TRACKS.items():
        cfg = oaei_eval.reference_config(
            bag_of_neighbours=False, weighted_sum=False, **kw
        )
        trip = oaei_eval.track_pairs(f"{ref_root}/{ds}")
        onto_paths = sorted({p for a, b, _ in trip for p in (a, b)})
        tables = owl.ontology_tables(spark, onto_paths)
        folded = oaei_eval.german_label_fold(tables["labels"])
        t0 = time.time()
        res = oaei_eval.evaluate_track(
            spark, f"{ref_root}/{ds}", config=cfg, triplets=trip,
            label_map=folded,
        )
        rows[ds] = {
            "micro": res["micro"], "threshold": res["threshold"],
            "ceiling": res["per_pair"][0].get("f1_ceiling"),
            "sec": round(time.time() - t0, 1),
        }
        print("RESULT", ds, json.dumps(rows[ds], default=float), flush=True)
    Path("/tmp/german_fold.json").write_text(json.dumps(rows, indent=1, default=float))


if __name__ == "__main__":
    main()
