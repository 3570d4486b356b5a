"""A1-A5 / G1-G2 context machinery vs the single-node oracle."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from veealign_spark.operators import contexts, oracle_np


@pytest.fixture(scope="module")
def micro_triples(spark):
    rows = [
        # taxonomy: D -> B -> A, D -> C -> A (multi-parent branching)
        ("s", "B", "subclass_of", "A", "Subclass"),
        ("s", "C", "subclass_of", "A", "Subclass"),
        ("s", "D", "subclass_of", "B", "Subclass"),
        ("s", "D", "subclass_of", "C", "Subclass"),
        ("s", "E", "subclass_of", "D", "Subclass"),
        # cycle X <-> Y (Quirk Q5: must terminate, bounded paths)
        ("s", "X", "subclass_of", "Y", "Subclass"),
        ("s", "Y", "subclass_of", "X", "Subclass"),
        # object / datatype props
        ("s", "B", "rel_r", "C", "Object Property"),
        ("s", "D", "attr_a", "str", "Datatype Property"),
        # self-loop (P4: skipped in neighbourhoods)
        ("s", "B", "rel_s", "B", "Object Property"),
    ]
    return spark.createDataFrame(rows, "src string, subj string, pred string, obj string, kind string")


def _paths_dict(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["entity"], []).append(list(r["path"]))
    return {k: sorted(v) for k, v in out.items()}


def test_root_paths_match_oracle(spark, micro_triples):
    got = _paths_dict(contexts.build_root_paths(micro_triples, max_pathlen=6))
    pdf = micro_triples.toPandas()
    want = oracle_np.root_paths(pdf, "s", 6)
    want = {k: sorted(v) for k, v in want.items()}
    assert got == want
    # branching: D has two root paths
    assert got["D"] == [["D", "B", "A"], ["D", "C", "A"]]
    # cycle bounded: X path stops before revisiting X
    assert got["X"] == [["X", "Y"]]


def test_neighbour_slots(spark, micro_triples):
    ctx = contexts.build_contexts(micro_triples, bag_of_neighbours=False, max_pathlen=6)
    rows = ctx.collect()
    by = {}
    for r in rows:
        by.setdefault((r["entity"], r["nbr_type"]), []).append(list(r["path"]))
    # children slot: A's children are B and C
    assert sorted(by[("A", 1)]) == [["B"], ["C"]]
    # object prop both directions
    assert by[("C", 2)] == [["B"]]
    assert by[("B", 2)] == [["C"]]
    # self-loop excluded
    assert ("B", 2) in by and [["B"]] != by[("B", 2)]
    # datatype both directions
    assert by[("D", 3)] == [["str"]]
    assert by[("str", 3)] == [["D"]]


def test_bag_of_neighbours(spark, micro_triples):
    ctx = contexts.build_neighbour_contexts(micro_triples, bag_of_neighbours=True)
    rows = {(r["entity"], r["nbr_type"]): list(r["path"]) for r in ctx.collect()}
    assert rows[("A", 1)] == ["B", "C"]  # one bag-path


def test_max_types(spark, micro_triples):
    ctx = contexts.build_contexts(micro_triples, max_pathlen=6)
    pdf = micro_triples.toPandas()
    oc = oracle_np.build_contexts(pdf, "s", False, 6)
    want = max(sum(1 for s in slots if s) for slots in oc.values())
    assert contexts.derive_max_types(ctx) == want


def test_fixture_contexts_match_oracle(spark, triples_sdf, fixture_pair):
    """Full fixture: Spark assembled features == oracle contexts after
    identical truncation, for every entity of both sources."""
    max_paths, max_pathlen = 2, 4
    ctx = contexts.build_contexts(triples_sdf, max_pathlen=max_pathlen)
    feats = contexts.assemble_features(ctx, 4, max_paths, max_pathlen)
    got = {
        (r["src"], r["entity"]): [
            [list(p) for p in slot] for slot in r["features"]
        ]
        for r in feats.collect()
    }
    pdf = fixture_pair["triples"]
    for src in ("src1", "src2"):
        oc = oracle_np.build_contexts(pdf, src, False, max_pathlen)
        for ent, slots in oc.items():
            want = [
                sorted(p[:max_pathlen] for p in slot)[:max_paths] for slot in slots
            ]
            assert got[(src, ent)] == want, (src, ent)
