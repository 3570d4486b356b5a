"""M7: stage-checkpoint resumability + lineage/metrics ledger."""

from __future__ import annotations

import json
import os
import shutil

from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline


def _fingerprint(res):
    pdf = res["accepted"].select("ent1", "ent2", "score").toPandas()
    pdf = pdf.sort_values(["ent1", "ent2"]).reset_index(drop=True)
    return list(zip(pdf.ent1, pdf.ent2, pdf.score.round(9)))


def test_resume_skips_and_matches(spark, transcripts_sdf, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig(checkpoint_dir=ckpt)
    res1 = run_pipeline(spark, transcripts_sdf, cfg)
    fp1 = _fingerprint(res1)

    # full resume: every stage skipped, identical output
    res2 = run_pipeline(spark, transcripts_sdf, cfg)
    assert all(m.get("resumed") for m in res2["metrics"])
    assert _fingerprint(res2) == fp1

    # partial resume (simulated kill after 'scores'): drop the later
    # stage snapshots, re-run — early stages resume, late recompute
    for stage in ("alignments", "clusters", "kg_triples", "kg_entities", "kg_edges"):
        shutil.rmtree(os.path.join(ckpt, f"stage={stage}"), ignore_errors=True)
    res3 = run_pipeline(spark, transcripts_sdf, cfg)
    by_stage = {m["stage"]: m for m in res3["metrics"]}
    assert by_stage["triples"].get("resumed") and by_stage["scores"].get("resumed")
    assert not by_stage["alignments"].get("resumed")
    assert _fingerprint(res3) == fp1

    # lineage + metrics ledger written
    assert os.path.exists(os.path.join(ckpt, "metrics.json"))
    with open(os.path.join(ckpt, "metrics.json")) as f:
        metrics = json.load(f)
    assert any(m["stage"] == "triples" for m in metrics)
    lineage = spark.read.parquet(os.path.join(ckpt, "lineage/stage=triples"))
    total = sum(r["rows"] for r in lineage.collect())
    assert total == res1["triples"].count()


def test_resume_triples_input_path(spark, triples_sdf, tmp_path):
    """Stage checkpoint/resume also holds when the pipeline starts from
    a pre-parsed triple table (the S1 OWL path): second run resumes
    every stage and reproduces the identical accepted set."""
    from veealign_spark.plans.pipeline import PipelineConfig, run_pipeline

    ckpt = str(tmp_path / "ckpt_owl")
    cfg = PipelineConfig(checkpoint_dir=ckpt)
    r1 = run_pipeline(spark, triples=triples_sdf, config=cfg)
    a1 = {(r["ent1"], r["ent2"]) for r in r1["accepted"].select("ent1", "ent2").collect()}

    r2 = run_pipeline(spark, triples=triples_sdf, config=PipelineConfig(checkpoint_dir=ckpt))
    resumed = [m for m in r2["metrics"] if m.get("resumed")]
    assert len(resumed) >= 8  # every staged boundary skipped
    a2 = {(r["ent1"], r["ent2"]) for r in r2["accepted"].select("ent1", "ent2").collect()}
    assert a1 == a2 and a1
