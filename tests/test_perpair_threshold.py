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


def test_best_threshold_by_group_matches_global_sweep(spark):
    """The library form (metrics.best_threshold_by_group): within one
    group it must pick exactly the global sweep's threshold/F1, and a
    second group with a different label geometry must get its own."""
    import pyspark.sql.functions as F

    from veealign_spark.operators import metrics

    rows = [
        # grp a: positives at high scores -> thr at 0.9 (tp=2, n=2)
        ("a", 0.9, 1), ("a", 0.95, 1), ("a", 0.5, 0), ("a", 0.3, 0),
        # grp b: one positive buried low -> sweep must descend to it
        ("b", 0.8, 0), ("b", 0.6, 1), ("b", 0.2, 0),
    ]
    labeled = spark.createDataFrame(rows, "grp string, score double, y int")
    got = {
        r["grp"]: r.asDict()
        for r in metrics.best_threshold_by_group(labeled, "grp").collect()
    }
    assert set(got) == {"a", "b"}
    for grp in ("a", "b"):
        scores = labeled.filter(F.col("grp") == grp).select(
            F.col("grp").alias("ent1"),
            F.col("score").cast("string").alias("ent2"),
            "score",
        )
        gold = scores.join(
            labeled.filter((F.col("grp") == grp) & (F.col("y") == 1))
            .select("grp", F.col("score").cast("string").alias("ent2")),
            ["ent2"],
        ).select(F.col("grp").alias("ent1"), "ent2")
        thr, f1 = metrics.best_threshold(scores, gold)
        assert got[grp]["thr"] == pytest.approx(thr, abs=1e-12)
        assert got[grp]["f1"] == pytest.approx(f1, abs=1e-12)
    assert got["a"]["thr"] == pytest.approx(0.9)
    assert got["b"]["thr"] == pytest.approx(0.6)
