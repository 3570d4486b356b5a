"""Measure G1 root-path BFS at reference-config depth (max_pathlen=26)
on a deep+wide synthetic ontology and record path-explosion row counts
+ partition-skew figures for BENCH/PLANS.md (r4 verdict item #4).

Shape: N_CHAIN chains of depth 20-30 (past the 26 cap), N_DIA diamond
towers of height 8 (256 true ancestor chains each, capped at 64),
one planted cycle per 300 chains, and a Zipf-ish hub layer (a few
parents own most leaves — the head-entity skew shape).

Usage: python scripts/stress_deep_contexts.py [entities] (default 60000)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from veealign_spark.operators import contexts  # noqa: E402
from veealign_spark.session import get_spark  # noqa: E402

TRIPLES_SCHEMA = "src string, subj string, pred string, obj string, kind string"


def build_fixture(n_target: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    rows = []
    n = 0
    chain_i = dia_i = cyc_i = 0
    # ~40% chain nodes, ~30% diamond nodes, ~30% hub leaves
    while n < n_target * 0.4:
        depth = int(rng.integers(20, 31))
        for i in range(depth - 1):
            rows.append(("srcS", f"ch{chain_i}_{i + 1}", "subclass_of",
                         f"ch{chain_i}_{i}", "Subclass"))
        n += depth
        chain_i += 1
        if chain_i % 300 == 0:  # planted cycle per 300 chains
            a, b, c = (f"cyc{cyc_i}_{k}" for k in "abc")
            rows += [("srcS", a, "subclass_of", b, "Subclass"),
                     ("srcS", b, "subclass_of", c, "Subclass"),
                     ("srcS", c, "subclass_of", a, "Subclass")]
            cyc_i += 1
            n += 3
    while n < n_target * 0.7:
        base = f"d{dia_i}"
        rows.append(("srcS", f"{base}_bot", "subclass_of", f"{base}_1a", "Subclass"))
        rows.append(("srcS", f"{base}_bot", "subclass_of", f"{base}_1b", "Subclass"))
        for i in range(1, 8):
            for side in ("a", "b"):
                rows.append(("srcS", f"{base}_{i}{side}", "subclass_of",
                             f"{base}_{i + 1}a", "Subclass"))
                rows.append(("srcS", f"{base}_{i}{side}", "subclass_of",
                             f"{base}_{i + 1}b", "Subclass"))
        n += 17
        dia_i += 1
    # Zipf hub layer: hub h owns ~ N/h^1.1 leaves
    hubs = 20
    weights = 1.0 / np.arange(1, hubs + 1) ** 1.1
    weights /= weights.sum()
    leaves = int(n_target * 0.3)
    counts = (weights * leaves).astype(int)
    li = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(("srcS", f"leaf{li}", "subclass_of", f"hub{h}", "Subclass"))
            li += 1
    n += leaves
    return rows, {"chains": chain_i, "diamonds": dia_i, "cycles": cyc_i,
                  "hub_leaves": li, "approx_entities": n}


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    spark = get_spark("stress_deep", cores=32)
    rows, shape = build_fixture(n_target)
    sdf = spark.createDataFrame(rows, TRIPLES_SCHEMA).repartition(32)
    sdf.localCheckpoint(eager=True)
    n_edges = sdf.count()

    t0 = time.time()
    paths = contexts.build_root_paths(sdf, max_pathlen=26, max_paths_per_entity=64)
    paths = paths.localCheckpoint(eager=True)
    n_paths = paths.count()
    t_bfs = time.time() - t0

    stats = paths.select(
        F.size("path").alias("plen")
    ).agg(
        F.max("plen").alias("max_len"), F.avg("plen").alias("avg_len"),
    ).collect()[0]
    per_ent = paths.groupBy("entity").count()
    fan = per_ent.agg(F.max("count").alias("mx"), F.avg("count").alias("av")).collect()[0]
    part = (
        paths.groupBy(F.spark_partition_id().alias("p")).count()
        .agg(F.max("count").alias("mx"),
             F.expr("percentile_approx(count, 0.5)").alias("med")).collect()[0]
    )

    out = {
        "shape": shape, "n_edges": n_edges, "n_paths": n_paths,
        "bfs_sec": round(t_bfs, 2),
        "max_path_len": stats["max_len"], "avg_path_len": round(stats["avg_len"], 2),
        "max_paths_per_entity": fan["mx"], "avg_paths_per_entity": round(fan["av"], 2),
        "partition_rows_max": part["mx"], "partition_rows_median": part["med"],
        "skew_ratio": round(part["mx"] / max(part["med"], 1), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
