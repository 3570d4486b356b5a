"""Per-pair threshold mode (OAEI local-optimum convention): each
evaluated source pair is scored against its OWN argmax-F1 threshold
instead of one global sweep. On a single-pair track the two modes are
the same sweep, so they must agree exactly — the equivalence pin.
(The whole-track gain — conference untrained 0.627 global -> 0.644
per-pair — is recorded in BENCH/OAEI.md, not pinned: it depends on
fixture-scale score noise.)"""

from __future__ import annotations

import pytest


def _one_pair(spark):
    from veealign_spark.plans import oaei_eval

    ds = "/root/reference/datasets/conference"
    trip = [
        t for t in oaei_eval.conference_pairs(ds)
        if t[2].endswith("cmt-conference.rdf")
    ]
    assert trip
    return ds, trip


def test_per_pair_equals_global_on_single_pair_track(spark):
    from veealign_spark.plans import oaei_eval

    ds, trip = _one_pair(spark)
    res_g = oaei_eval.evaluate_track(spark, ds, triplets=trip)
    res_p = oaei_eval.evaluate_track(
        spark, ds, triplets=trip, per_pair_threshold=True
    )
    assert res_p["micro"] == res_g["micro"]
    assert len(res_p["per_pair_thresholds"]) == 1
    (thr, _f1), = res_p["per_pair_thresholds"].values()
    assert thr == pytest.approx(res_g["threshold"], abs=1e-12)
    # global mode reports its scalar threshold; per-pair mode reports
    # the map instead
    assert res_p["threshold"] is None
    assert res_g["per_pair_thresholds"] is None
