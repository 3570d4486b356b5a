"""German single-pair tracks (lebensmittel / freizeit): the last real
reference fixtures with both ontologies and gold present
(README.md:63-78 gives each its own config column). They exercise
normalization and scoring on real German category labels outside
multifarm's coded-ID regime. Full-track numbers live in BENCH/OAEI.md
(scripts/run_oaei_german.py); this pins one track end-to-end."""

from __future__ import annotations

import os

import pytest

from veealign_spark.plans import oaei_eval

REF = "/root/reference/datasets"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lebensmittel")),
    reason="reference checkout not present",
)


@needs_reference
def test_track_pairs_resolves_nonconference_filenames():
    """The gold files name ontologies differently from the .owl files;
    track_pairs pairs them through the gold's own Ontology IRIs."""
    for ds, names in (
        ("lebensmittel", ("Google.Lebensmittel.v2.owl", "web.Lebensmittel.v2.owl")),
        ("freizeit", ("dmoz.Freizeit.v2.owl", "Google.Freizeit.v2.owl")),
    ):
        trip = oaei_eval.track_pairs(os.path.join(REF, ds))
        assert len(trip) == 1, trip
        p1, p2, apath = trip[0]
        assert (os.path.basename(p1), os.path.basename(p2)) == names
        assert os.path.exists(apath)


@needs_reference
def test_lebensmittel_track_e2e_pinned(spark):
    """Full engine on the lebensmittel pair with the reference's track
    config (README.md: max_paths=2, max_pathlen=1, no bag, no weighted
    sum), untrained stub embeddings. Deterministic, so the exact
    confusion counts are pinned; misses are synonym-level German
    category names (recall == the pair's own tuned no-1:1 ceiling)."""
    ds = os.path.join(REF, "lebensmittel")
    cfg = oaei_eval.reference_config(
        max_paths=2, max_pathlen=1, bag_of_neighbours=False, weighted_sum=False
    )
    res = oaei_eval.evaluate_track(
        spark, ds, config=cfg, triplets=oaei_eval.track_pairs(ds)
    )
    m = res["micro"]
    assert (m["tp"], m["fp"], m["fn"]) == (17, 2, 15), m
    assert m["f1"] == pytest.approx(0.6667, abs=1e-3)
    # tuned global threshold reaches the pair's own F1 ceiling
    assert res["per_pair"][0]["f1_ceiling"] == pytest.approx(0.667, abs=1e-3)


@needs_reference
def test_freizeit_track_e2e_pinned(spark):
    """freizeit with its reference config column (max_paths=16,
    max_pathlen=1): near-token-identical dmoz/Google category slices.
    The symmetric-best 1:1 filter lifts final F1 above the no-1:1
    single-threshold ceiling — pinned exactly."""
    ds = os.path.join(REF, "freizeit")
    cfg = oaei_eval.reference_config(
        max_paths=16, max_pathlen=1, bag_of_neighbours=False, weighted_sum=False
    )
    res = oaei_eval.evaluate_track(
        spark, ds, config=cfg, triplets=oaei_eval.track_pairs(ds)
    )
    m = res["micro"]
    assert (m["tp"], m["fp"], m["fn"]) == (60, 0, 7), m
    assert m["f1"] == pytest.approx(0.9449, abs=1e-3)
