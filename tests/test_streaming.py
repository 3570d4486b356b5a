"""Structured Streaming smoke tests: stream == batch for stateless
extraction; windowed counts; foreachBatch triple upsert is
idempotent-incremental."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from veealign_spark.sources.transcripts import extract_mentions, mentions_to_triples
from veealign_spark.streaming import stream_mentions as sm


@pytest.fixture(scope="module")
def staged_transcripts(spark, transcripts_sdf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    transcripts_sdf.write.mode("overwrite").parquet(path)
    return path


def test_windowed_counts_match_batch(spark, staged_transcripts, transcripts_sdf):
    got = sm.run_mention_counts_once(spark, staged_transcripts, "t_counts")
    batch = (
        extract_mentions(transcripts_sdf, keep_cols=("ts",))
        .groupBy(F.window("ts", "1 hour").alias("w"), "src", "pred")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )
    a = {
        (r["w"]["start"], r["src"], r["pred"]): r["n_mentions"]
        for r in got.collect()
    }
    b = {
        (r["w"]["start"], r["src"], r["pred"]): r["n_mentions"]
        for r in batch.collect()
    }
    assert a == b and len(a) > 0


def test_foreach_batch_upsert(spark, staged_transcripts, transcripts_sdf, tmp_path):
    out = str(tmp_path / "triples_out")
    ckpt = str(tmp_path / "ckpt")
    got = sm.stream_triples_upsert(spark, staged_transcripts, out, ckpt)
    want = mentions_to_triples(extract_mentions(transcripts_sdf))
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in want.collect()}
    assert a == b
    # re-run over the same input with a fresh checkpoint: no duplicates
    got2 = sm.stream_triples_upsert(
        spark, staged_transcripts, out, str(tmp_path / "ckpt2")
    )
    assert got2.count() == len(b)
    assert got2.dropDuplicates().count() == len(b)


def test_stateful_sessions(spark, transcripts_sdf, tmp_path):
    """applyInPandasWithState sessionization: conversations emit when
    the watermark passes their quiet period (driven by a later batch)."""
    import datetime

    path = str(tmp_path / "sess_in")
    transcripts_sdf.write.mode("overwrite").parquet(path)

    sessions = __import__(
        "veealign_spark.streaming.stream_mentions", fromlist=["x"]
    ).stream_conversation_sessions(spark, path, gap_minutes=30)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    q.processAllAvailable()
    # push the watermark far past every conversation + timeout
    late = spark.createDataFrame(
        [("srcX_c9", 0, "user", "noop .", None,
          datetime.datetime(2026, 3, 1))],
        schema=transcripts_sdf.schema,
    )
    late.write.mode("append").parquet(path)
    q.processAllAvailable()
    q.stop()
    got = {r["conv_id"]: r["n_turns"] for r in spark.sql("SELECT * FROM t_sessions").collect()}
    got.pop("srcX_c9", None)  # the watermark-pusher conv itself
    want = {
        r["conv_id"]: r["n"]
        for r in transcripts_sdf.groupBy("conv_id").agg(
            __import__("pyspark.sql.functions", fromlist=["x"]).count("*").alias("n")
        ).collect()
    }
    assert got == want, (len(got), len(want))


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate turn arrivals inside the watermark horizon are
    dropped; the streamed distinct set equals the batch dropDuplicates
    result."""
    import pandas as pd

    from veealign_spark import schemas
    from veealign_spark.streaming.stream_mentions import run_stream_dedup_once

    rows = []
    base = pd.Timestamp("2026-01-01 00:00:00")
    for i in range(40):
        rows.append((f"c{i % 10}", i // 10, "user", f"text {i % 10}:{i // 10}", None, base + pd.Timedelta(minutes=i)))
    dup_rows = rows + rows[:15]  # replay 15 duplicates
    pdf = pd.DataFrame(dup_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    src = str(tmp_path / "turns")
    spark.createDataFrame(pdf, schema=schemas.TRANSCRIPTS).repartition(4).write.parquet(src)

    out = run_stream_dedup_once(spark, src, "dedup_turns_t")
    got = {(r["conv_id"], r["turn_idx"], r["text"]) for r in out.collect()}
    batch = {
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in spark.read.parquet(src).dropDuplicates(["conv_id", "turn_idx", "text"]).collect()
    }
    assert got == batch and len(got) == 40


def test_stream_incremental_ingest_equals_batch(
    spark, fixture_pair, transcripts_sdf, tmp_path
):
    """Streaming -> incremental-plan bridge (r5): micro-batched new
    sources driven through foreachBatch + incremental_update produce a
    KG bit-identical to the one-shot batch run over the whole corpus.
    Fixture: standing = src1+src2 (run_pipeline over the fixture
    transcripts); the stream lands src3 (clone of src2) and src4
    (clone of src1) as one parquet file per source -> with
    maxFilesPerTrigger=1 each micro-batch is exactly one complete new
    source, the incremental plan's source-grain contract."""
    from veealign_spark import datagen
    from veealign_spark.plans.pipeline import run_pipeline

    tri = fixture_pair["triples"]
    in_dir = str(tmp_path / "landing")
    clone_sdfs = []
    for new_src, base_src, seed in (("src3", "src2", 5), ("src4", "src1", 6)):
        t = tri[tri["src"] == base_src].copy()
        t["src"] = new_src
        rows, _ = datagen.make_transcripts(t, seed=seed)
        sdf = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        clone_sdfs.append(sdf)
        # exactly one file per source: the micro-batch grain
        sdf.coalesce(1).write.mode("append").parquet(in_dir)

    standing = run_pipeline(spark, transcripts_sdf)
    pub_root = str(tmp_path / "pubroot")
    state = sm.stream_incremental_ingest(
        spark, in_dir, standing, checkpoint=str(tmp_path / "ckpt"),
        publish_root=pub_root, publish_keep=1, publish_incremental=True,
    )
    assert state["batches"] == 2
    # every accepted micro-batch published a snapshot version. With
    # publish_incremental=True the FIRST publish is automatically full
    # (no base yet) and the second is a format-2 delta commit off it;
    # keep=1 retention then cannot reclaim v1 — the live v2 references
    # its directories (reference-aware expire)
    from veealign_spark.plans.standing import (
        current_version,
        list_versions,
        load_standing,
        read_manifest,
    )

    assert state["published_versions"] == [1, 2]
    assert list_versions(pub_root) == [1, 2] and current_version(pub_root) == 2
    m2 = read_manifest(pub_root)
    assert m2["format_version"] == 2
    assert m2["lineage"]["batch"] == 2
    assert m2["tables"]["triples"]["paths"][0] == "v00001/table=triples"

    # baseline: one batch run over the SAME transcript corpus (standing
    # + both landed sources), so both sides share the extraction path
    full_ts = transcripts_sdf.select(*clone_sdfs[0].columns)
    for c in clone_sdfs:
        full_ts = full_ts.unionByName(c)
    full = run_pipeline(spark, full_ts)

    def acc(res):
        return {
            (r["ent1"], r["ent2"])
            for r in res["accepted"].select("ent1", "ent2").collect()
        }

    def clu(res):
        return {r["entity"]: r["canon_id"] for r in res["clusters"].collect()}

    def kg(res):
        return {
            (r["subj"], r["pred"], r["obj"], r["kind"])
            for r in res["kg_triples"].collect()
        }

    final = state["standing"]
    assert final["new_sources"] == ["src4"] or final.get("new_sources")
    assert acc(final) == acc(full)
    assert clu(final) == clu(full)
    assert kg(final) == kg(full)

    # the restart story end to end: a COLD load of the published root
    # (what a fresh driver opens after a crash) equals the batch run
    cold = load_standing(spark, pub_root, verify=True)
    assert acc(cold) == acc(full)
    assert clu(cold) == clu(full)
    assert kg(cold) == kg(full)
