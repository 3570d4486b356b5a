"""Train the kernel on the OAEI conference track and record both
protocols' results in BENCH/OAEI.md (see plans/train_oaei.py banner).

Usage: python scripts/run_oaei_trained.py [dataset_dir]
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
    ds = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/datasets/conference"
    spark = get_spark("oaei_trained", cores=16)

    t0 = time.time()
    trained = train_oaei.train_track(spark, ds)
    t_train = time.time() - t0
    t0 = time.time()
    element = train_oaei.evaluate_with_params(
        spark, ds, trained["params"], trained["report"]["max_types"],
        tune_on_gold=True,
    )
    t_elem = time.time() - t0
    t0 = time.time()
    kfold = train_oaei.kfold_ontology_split(spark, ds, k=5)
    t_kfold = time.time() - t0

    em, km = element["micro"], kfold["micro"]
    out = {
        "train_report": {k: v for k, v in trained["report"].items() if k != "history"},
        "element": {"micro": em, "threshold": element["threshold"], "wall": round(t_train + t_elem, 1)},
        "kfold": {"micro": km, "per_fold": kfold["per_fold"], "wall": round(t_kfold, 1)},
    }
    with open("/tmp/oaei_trained_result.json", "w") as f:
        json.dump(out, f, indent=1, default=float)

    fold_rows = "\n".join(
        f"| {r['fold']} | {', '.join(r['eval_pairs'])} | {r['threshold']:.4f} "
        f"| {r['micro']['tp']} | {r['micro']['fp']} | {r['micro']['fn']} "
        f"| {r['micro']['f1']:.3f} |"
        for r in kfold["per_fold"]
    )
    section = f"""

# OAEI conference track with TRAINED kernel weights

Trainer: `operators/training.py` (analytic-gradient MSE + Adam,
reference train.py:520-640 semantics; gradients verified vs numerical
differentiation) over Spark-prepared batches (J3 labeling, T2 negative
cap, T3 1:1 oversampling, element split). Embeddings remain the
deterministic hash stub — these numbers measure what TRAINING the
kernel head adds on top of it. Deterministic seeds throughout.

- element protocol (reference default, config.ini ontology_split=False;
  threshold = distributed A9 sweep over the track's candidate pool):
  **micro P={em['precision']:.3f} R={em['recall']:.3f} F1={em['f1']:.3f}**
  (tp={em['tp']} fp={em['fp']} fn={em['fn']}, threshold
  {element['threshold']:.4f}, wall {out['element']['wall']}s incl. training).
  Untrained stub weights: F1=0.627; the trained reference reports ~0.73.
- ontology-split 5-fold (leak-free: each fold scored with weights AND
  threshold trained only on the other folds' ontology pairs), pooled:
  **micro P={km['precision']:.3f} R={km['recall']:.3f} F1={km['f1']:.3f}**
  (tp={km['tp']} fp={km['fp']} fn={km['fn']}, wall {out['kfold']['wall']}s).

| fold | held-out pairs | trained thr | tp | fp | fn | F1 |
|---|---|---|---|---|---|---|
{fold_rows}
"""
    with open(Path(__file__).resolve().parent.parent / "BENCH" / "OAEI.md", "a") as f:
        f.write(section)
    print("DONE", json.dumps({"element": em, "kfold": km}, default=float))


if __name__ == "__main__":
    main()
