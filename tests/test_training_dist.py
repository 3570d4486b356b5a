"""Distributed (mapInPandas partial-sum tree-aggregate) gradient path
vs the driver-numpy trainer.

Three contracts:
1. distributed_grads == training.mse_and_grads over the same rows
   (row-separable loss -> partition partials sum exactly; only float
   association order differs, <= 1e-9).
2. train_kernel_distributed (one full-pool gradient per Adam step) ==
   training.train_kernel with batch_size >= pool size, on a real OAEI
   pair end to end through the engine's own prep.
3. prepare_training's driver collects are bounded by the T2 cap, not
   the entity universe (the one allowed universe-sized collect is the
   broadcast vocabulary, the documented EmbBroadcast layout bound).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

from veealign_spark.operators import training
from veealign_spark.operators import training_dist as td
from veealign_spark.operators.kernel_np import default_params
from veealign_spark.operators.training import TrainableParams


def _fake_emb_bc(spark, mat: np.ndarray):
    return SimpleNamespace(bc=spark.sparkContext.broadcast({"matrix": mat}))


def _synthetic(spark, B=40, Bp=17, T=2, P=2, L=3, d=8, seed=11):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(30, d))
    mat[0] = 0.0
    n = rng.integers(1, 30, size=(B, 2))
    f = rng.integers(0, 30, size=(B, 2, T * P * L))
    y = rng.integers(0, 2, size=B).astype(np.float64)
    cos = rng.uniform(-1, 1, size=(Bp, 3))
    py = rng.integers(0, 2, size=Bp).astype(np.float64)
    base = default_params(emb_dim=d, n_types=T, max_paths=P, max_pathlen=L, seed=3)
    cpool = spark.createDataFrame(
        [(int(n[i, 0]), f[i, 0].tolist(), int(n[i, 1]), f[i, 1].tolist(),
          float(y[i])) for i in range(B)],
        "n1 long, f1 array<long>, n2 long, f2 array<long>, y double",
    ).repartition(5)
    ppool = spark.createDataFrame(
        [(float(cos[i, 0]), float(cos[i, 1]), float(cos[i, 2]), float(py[i]))
         for i in range(Bp)],
        "c0 double, c1 double, c2 double, y double",
    ).repartition(3)
    # numpy twin arrays
    node2 = np.stack([mat[n[:, 0]], mat[n[:, 1]]], axis=1)
    feats = mat[f.reshape(B, 2, T, P, L)]
    A2 = np.stack(
        [training.attended_tensor(node2[:, s], feats[:, s], base)
         for s in (0, 1)], axis=1,
    )
    data = training.TrainData(node2, A2, y, cos, py)
    return mat, base, cpool, ppool, data, T


def test_distributed_grads_match_numpy(spark):
    mat, base, cpool, ppool, data, T = _synthetic(spark)
    emb_bc = _fake_emb_bc(spark, mat)
    tp = TrainableParams.from_kernel(base)
    loss_np, g_np = training.mse_and_grads(data, tp)
    loss_d, g_d = td.distributed_grads(cpool, ppool, emb_bc, tp, base, T)
    assert loss_d == pytest.approx(loss_np, abs=1e-9)
    for a, b in zip(g_d, g_np):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_distributed_loop_equals_large_batch_numpy_synthetic(spark):
    """Full loop on synthetic pools: one distributed full-pool gradient
    per Adam step == train_kernel with batch_size >= pool size."""
    mat, base, cpool, ppool, data, T = _synthetic(spark)
    emb_bc = _fake_emb_bc(spark, mat)
    val = data.slice(np.arange(10), np.arange(5))
    p_np, rep_np = training.train_kernel(
        data, val, base, batch_size=10 ** 9, num_epochs=6,
        validation_interval=1,
    )
    p_d, rep_d = td.train_kernel_distributed(
        cpool, ppool, val, base, emb_bc, T, num_epochs=6,
        validation_interval=1,
    )
    assert rep_d["steps"] == rep_np["steps"]
    np.testing.assert_allclose(p_d.out_w, p_np.out_w, atol=1e-8)
    np.testing.assert_allclose(p_d.v, p_np.v, atol=1e-8)
    np.testing.assert_allclose(p_d.type_weights, p_np.type_weights, atol=1e-8)
    assert p_d.prop_weight == pytest.approx(p_np.prop_weight, abs=1e-8)
    assert p_d.threshold == pytest.approx(p_np.threshold, abs=1e-7)


def _track(spark, n_pairs=3):
    from pyspark.sql import functions as F

    from veealign_spark.plans import oaei_eval
    from veealign_spark.sources import owl
    from veealign_spark.sources.oaei import load_alignment_rdf

    ds = "/root/reference/datasets/conference"
    triplets = oaei_eval.conference_pairs(ds)[:n_pairs]
    onto_paths = sorted({p for a, b, _ in triplets for p in (a, b)})
    tables = owl.ontology_tables(spark, onto_paths)
    gold_all = None
    pairs = []
    for p1, p2, apath in triplets:
        g = oaei_eval.gold_keys(load_alignment_rdf(spark, apath)).filter(
            F.col("relation") == "="
        )
        gold_all = g if gold_all is None else gold_all.unionByName(g)
        pairs.append(tuple(sorted((owl.ontology_name(p1), owl.ontology_name(p2)))))
    pair_df = spark.createDataFrame(
        sorted(set(pairs)), "src1 string, src2 string"
    )
    return tables, gold_all, pair_df


def test_distributed_loop_equals_numpy_on_real_track(spark):
    """End-to-end through the engine's own prep on real conference
    ontologies: the scale-branch trainer reproduces the numpy trainer
    at large-batch settings (same pools, same seeds)."""
    from veealign_spark.plans import oaei_eval, train_oaei

    tables, gold_all, pair_df = _track(spark, n_pairs=1)
    cfg = oaei_eval.reference_config()
    prep = train_oaei.prepare_training(
        spark, tables, cfg, gold_all, pair_df, max_false=200
    )
    data = training.TrainData(
        prep["node2"], prep["A2"], prep["y"], prep["prop_cos"], prep["prop_y"]
    )
    val = data.slice(
        np.arange(min(40, len(data.y))), np.arange(min(10, len(data.prop_y)))
    )
    p_np, rep_np = training.train_kernel(
        data, val, prep["base_params"], batch_size=10 ** 9, num_epochs=4,
        validation_interval=1,
    )
    cpool, ppool = train_oaei.distributed_pools(prep)
    # identical multiset of rows reaches both trainers
    assert cpool.count() == len(data.y)
    assert ppool.count() == len(data.prop_y)
    p_d, rep_d = td.train_kernel_distributed(
        cpool, ppool, val, prep["base_params"], prep["emb_bc"],
        prep["max_types"], num_epochs=4, validation_interval=1,
    )
    assert rep_d["steps"] == rep_np["steps"]
    np.testing.assert_allclose(p_d.out_w, p_np.out_w, atol=1e-7)
    np.testing.assert_allclose(p_d.v, p_np.v, atol=1e-7)
    assert p_d.threshold == pytest.approx(p_np.threshold, abs=1e-6)


def test_prepare_training_collects_bounded_by_cap_not_universe(
    spark, monkeypatch
):
    """After the round-5 fix: every driver collect in prepare_training
    is bounded by the T2-capped pool (<= 2*capped rows + epsilon per
    table), EXCEPT the single broadcast-vocabulary collect (the
    documented EmbBroadcast layout bound, guarded by max_rows /
    vocab_broadcast_threshold elsewhere). With 3 source pairs the
    entity universe is well above the pool-key bound, so a universe
    -sized feature collect would fail this test."""
    from veealign_spark.operators import sampling, scoring
    from veealign_spark.plans import oaei_eval, train_oaei

    from pyspark.sql import functions as F

    tables, gold_all, pair_df = _track(spark, n_pairs=3)
    cfg = oaei_eval.reference_config()
    max_false = 20

    sizes = []
    cls = type(tables["triples"])
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    prep = train_oaei.prepare_training(
        spark, tables, cfg, gold_all, pair_df, max_false=max_false
    )
    monkeypatch.undo()

    def pool_keys(lab_full, seed):
        lab = sampling.limit_negatives(
            lab_full, max_false, label_col="y", seed=seed
        )
        return lab.select(
            F.explode(F.array("ent1", "ent2")).alias("k")
        ).distinct().count()

    n_universe = prep["enc_df"].count()
    n_ckeys = pool_keys(prep["lab_c_full"], 7)
    n_pkeys = pool_keys(prep["lab_p_full"], 8)
    n_vocab = scoring.term_universe(
        tables["triples"], tables["concepts"], tables["labels"]
    ).count()
    # every driver collect is pool-key bounded (+ capped pool rows +
    # scalable_rank's per-partition count rows)
    bound = n_ckeys + n_pkeys + 64
    assert n_universe > bound, (n_universe, bound)  # test has teeth
    vocab_like = [s for s in sizes if s > bound]
    # the ONLY over-bound collect is the broadcast vocabulary
    assert vocab_like == [n_vocab], (vocab_like, n_vocab, bound)


def test_train_kernel_auto_dispatch(spark, monkeypatch):
    """The dispatcher routes small pools to the numpy loop (identical
    result to train_kernel) and large-threshold-0 pools to the
    distributed loop (runs, returns trained params + report)."""
    from veealign_spark.plans import oaei_eval, train_oaei

    tables, gold_all, pair_df = _track(spark, n_pairs=1)
    cfg = oaei_eval.reference_config()
    prep = train_oaei.prepare_training(
        spark, tables, cfg, gold_all, pair_df, max_false=150
    )
    kw = dict(num_epochs=3, validation_interval=1)
    # small branch == train_kernel verbatim
    p_auto, rep_auto = train_oaei.train_kernel_auto(
        prep, small_rows=10 ** 9, **kw
    )
    tr, va = train_oaei.element_split(prep)
    p_np, rep_np = training.train_kernel(tr, va, prep["base_params"], **kw)
    np.testing.assert_array_equal(p_auto.out_w, p_np.out_w)
    assert p_auto.threshold == p_np.threshold
    assert rep_auto["steps"] == rep_np["steps"]
    # scale branch engages below the pool size and completes
    p_d, rep_d = train_oaei.train_kernel_auto(prep, small_rows=0, **kw)
    assert rep_d["steps"] == 3  # one full-pool step per epoch
    assert np.isfinite(p_d.threshold)
