"""G1 root-path BFS at reference-config depth (max_pathlen=26,
/root/reference/src/config.ini conference column): deep chains past
the cap, a multi-parent diamond tower (exponential path fan-out), a
planted cycle, and a wide hub — the shapes every repo fixture was too
shallow to exercise (r4 verdict item #4).

Pinned: truncation at exactly max_pathlen nodes; cycle paths finite
and emitted at the revisit point; per-entity fan-out capped at
max_paths_per_entity (64 < the diamond's 256 true paths); BFS
iteration count == max_pathlen-2 eager frontier checkpoints when a
chain survives the full depth (lineage is cut EVERY hop — the plan
never compounds across iterations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from veealign_spark.operators import contexts

TRIPLES_SCHEMA = "src string, subj string, pred string, obj string, kind string"


def _sub(child, parent):
    return ("srcD", child, "subclass_of", parent, "Subclass")


@pytest.fixture(scope="module")
def deep_wide_sdf(spark):
    rows = []
    # deep chain: chain29 -> chain28 -> ... -> chain0 (30 nodes, 29
    # edges) — deeper than the 26-node cap
    for i in range(29):
        rows.append(_sub(f"chain{i + 1}", f"chain{i}"))
    # diamond tower: D0 has parents L1a/L1b; each L{i}x has parents
    # L{i+1}a and L{i+1}b, 8 levels -> 2^8 = 256 ancestor chains from D0
    rows.append(_sub("D0", "L1a"))
    rows.append(_sub("D0", "L1b"))
    for i in range(1, 8):
        for side in ("a", "b"):
            rows.append(_sub(f"L{i}{side}", f"L{i + 1}a"))
            rows.append(_sub(f"L{i}{side}", f"L{i + 1}b"))
    # planted cycle (Quirk Q5: the reference recursion would never
    # terminate here; the BFS emits the path at the revisit point)
    rows.append(_sub("cycX", "cycY"))
    rows.append(_sub("cycY", "cycZ"))
    rows.append(_sub("cycZ", "cycX"))
    # wide hub: 500 leaves under one parent (head-entity skew shape)
    for j in range(500):
        rows.append(_sub(f"leaf{j}", "hub"))
    return spark.createDataFrame(rows, TRIPLES_SCHEMA)


def test_deep_chain_truncates_at_max_pathlen(spark, deep_wide_sdf):
    paths = contexts.build_root_paths(
        deep_wide_sdf, max_pathlen=26, max_paths_per_entity=64
    )
    p29 = paths.filter(F.col("entity") == "chain29").collect()
    assert len(p29) == 1
    path = p29[0]["path"]
    assert len(path) == 26  # truncated: 30-node chain, 26-node cap
    assert path[0] == "chain29" and path[-1] == "chain4"
    # a shallow entity in the same table is NOT truncated
    p3 = paths.filter(F.col("entity") == "chain3").collect()
    assert len(p3) == 1 and p3[0]["path"] == ["chain3", "chain2", "chain1", "chain0"]


def test_cycle_paths_are_finite_and_emitted_at_revisit(spark, deep_wide_sdf):
    paths = contexts.build_root_paths(
        deep_wide_sdf, max_pathlen=26, max_paths_per_entity=64
    )
    got = {
        r["entity"]: r["path"]
        for r in paths.filter(F.col("entity").startswith("cyc")).collect()
    }
    # each cycle member walks the full ring once and stops when the
    # next parent is already on the path — no node repeats, no blow-up
    assert got == {
        "cycX": ["cycX", "cycY", "cycZ"],
        "cycY": ["cycY", "cycZ", "cycX"],
        "cycZ": ["cycZ", "cycX", "cycY"],
    }


def test_diamond_fanout_capped_per_entity(spark, deep_wide_sdf):
    paths = contexts.build_root_paths(
        deep_wide_sdf, max_pathlen=26, max_paths_per_entity=64
    )
    d0 = paths.filter(F.col("entity") == "D0")
    assert d0.count() == 64  # 256 true chains, capped at 64
    # deterministic cap: lexicographically smallest 64 survive (the
    # documented canonical-order divergence from dict-order)
    joined = sorted(r["path"] for r in d0.collect())
    uncapped = contexts.build_root_paths(
        deep_wide_sdf, max_pathlen=26, max_paths_per_entity=None
    )
    assert uncapped.filter(F.col("entity") == "D0").count() == 256
    all_sorted = sorted(
        r["path"] for r in uncapped.filter(F.col("entity") == "D0").collect()
    )
    assert joined == all_sorted[:64]


def test_wide_hub_single_hop(spark, deep_wide_sdf):
    paths = contexts.build_root_paths(deep_wide_sdf, max_pathlen=26)
    leaves = paths.filter(F.col("entity").startswith("leaf"))
    assert leaves.count() == 500
    assert leaves.filter(F.size("path") != 2).count() == 0


def test_bfs_iteration_count_and_per_hop_lineage_cut(
    spark, deep_wide_sdf, monkeypatch
):
    """The loop runs exactly max_pathlen-2 frontier extensions while a
    chain survives (the iteration bound IS the cycle/pathlen guard),
    and EVERY frontier is eagerly localCheckpointed — lineage depth is
    per-hop constant, never compounding across the 24 joins."""
    cls = type(deep_wide_sdf)
    calls = []
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        calls.append(eager)
        return orig(self, eager=eager)

    monkeypatch.setattr(cls, "localCheckpoint", spy)
    contexts.build_root_paths(
        deep_wide_sdf, max_pathlen=26, max_paths_per_entity=64
    ).count()
    monkeypatch.undo()
    # 1 edges checkpoint + 24 frontier checkpoints (hops 2..25; the
    # 30-node chain keeps the frontier non-empty through every hop)
    assert calls.count(True) == 25, calls
