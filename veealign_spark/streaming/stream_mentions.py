"""Structured Streaming front-end for the KG pipeline.

The reference is pure batch; streaming is the incremental-ingest path
a 10^12-turn corpus actually needs: transcripts land continuously,
mention extraction is stateless (same JVM regex as batch — one code
path, two execution modes), and per-window mention counts / triple
novelty feed the batch stages via the staging tables.

Patterns used (all public Structured Streaming API):
- stateless extraction: identical DataFrame transform as batch
  (extract_mentions works on a streaming DF unchanged).
- watermarked tumbling-window aggregation for late data.
- foreachBatch triple upsert: per micro-batch dedup against the
  staging table (the exactly-once sink pattern for engines without
  MERGE in the sandbox).
- applyInPandasWithState sessionization over conversation turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veealign_spark.sources.transcripts import extract_mentions, mentions_to_triples


def stream_transcripts(spark, path: str, schema=None) -> DataFrame:
    from veealign_spark import schemas

    return (
        spark.readStream.schema(schema or schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def stream_mention_counts(transcripts_stream: DataFrame, window: str = "1 hour"):
    """Watermarked windowed mention counts per source + predicate."""
    mentions_ts = extract_mentions(
        transcripts_stream.withWatermark("ts", "10 minutes"), keep_cols=("ts",)
    )
    return mentions_ts.groupBy(
        F.window("ts", window).alias("w"), "src", "pred"
    ).agg(F.count(F.lit(1)).alias("n_mentions"))


def run_mention_counts_once(spark, path: str, query_name: str = "mention_counts"):
    """Drive the windowed-count stream to completion over the files
    currently at `path` (memory sink; the local smoke pattern)."""
    agg = stream_mention_counts(stream_transcripts(spark, path))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_triples_upsert(spark, in_path: str, out_path: str, checkpoint: str):
    """foreachBatch incremental triple staging: each micro-batch is
    deduplicated against what's already staged (left_anti) and
    appended — the MERGE-free exactly-once upsert."""
    import os

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        new_triples = mentions_to_triples(extract_mentions(batch_df))
        if os.path.exists(out_path):
            existing = spark.read.parquet(out_path)
            new_triples = new_triples.join(
                existing, ["src", "subj", "pred", "obj", "kind"], "left_anti"
            )
        new_triples.write.mode("append").parquet(out_path)

    stream = stream_transcripts(spark, in_path)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_incremental_ingest(
    spark,
    in_path: str,
    standing: dict,
    checkpoint: str,
    config=None,
    max_files_per_trigger: int = 1,
    publish_root: str | None = None,
    publish_keep: int | None = None,
    publish_incremental: bool = False,
) -> dict:
    """Streaming bridge into the source-grain incremental plan: each
    micro-batch of landed transcript files is aligned against the
    evolving standing KG via plans.incremental.incremental_update, and
    the result dict becomes the standing state for the next batch.

    Contract (the incremental plan's source-grain rule carried to the
    stream): each micro-batch must contain COMPLETE new sources — stage
    one file per source and keep max_files_per_trigger at 1 (a source
    split across micro-batches would be in-place source growth, which
    incremental_update rejects). Because chained increments compose
    (CC(CC(A) u B) == CC(A u B), per-source contexts), the streamed
    end state is bit-identical to one batch run over standing u all
    increments — pinned by tests/test_streaming.py.

    With `publish_root` set, each ingested micro-batch is additionally
    published as a versioned standing snapshot (plans.standing.
    publish_standing: atomic CURRENT flip, so a concurrent reader of
    the root always sees a complete KG), and `publish_keep` bounds the
    retained history via expire_snapshots — the continuous-deployment
    loop: feeds stream in, every accepted batch becomes a restartable
    cold-load point. A crash between batches loses only in-flight work;
    the stream checkpoint + the published CURRENT version together are
    the resume state. `publish_incremental=True` makes each publish a
    format-2 delta commit (per-source tables ship only the batch's new
    sources; see plans.standing.publish_standing) — the corpus-flat
    setting for a long-running feed; retention then holds referenced
    base versions until a full publish re-flattens the chain.

    Returns {"standing": <final result dict>, "batches": n,
    "published_versions": [...]}."""
    from veealign_spark import schemas
    from veealign_spark.plans.incremental import incremental_update

    state = {"standing": standing, "batches": 0, "published_versions": []}

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state["standing"] = incremental_update(
            spark, state["standing"], new_transcripts=batch_df, config=config
        )
        state["batches"] += 1
        if publish_root is not None:
            from veealign_spark.plans.standing import (
                expire_snapshots,
                publish_standing,
            )

            m = publish_standing(
                spark,
                state["standing"],
                publish_root,
                lineage={"stream_epoch": epoch_id, "batch": state["batches"]},
                incremental=publish_incremental,
            )
            state["published_versions"].append(m["version"])
            if publish_keep is not None:
                expire_snapshots(publish_root, keep=publish_keep)

    q = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(in_path)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state


def stream_conversation_sessions(spark, path: str, gap_minutes: int = 30):
    """Stateful per-conversation sessionization via
    applyInPandasWithState: emits (conv_id, n_turns, first_ts, last_ts)
    when a conversation goes quiet for `gap_minutes` (event-time
    timeout via watermark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n, first, last) = state.get
            state.remove()
            yield pd.DataFrame(
                {"conv_id": [key[0]], "n_turns": [n], "first_ts": [first], "last_ts": [last]}
            )
            return
        n, first, last = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            ts = pdf["ts"]
            first = min(first, ts.min()) if first is not None else ts.min()
            last = max(last, ts.max()) if last is not None else ts.max()
        state.update((int(n), first, last))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_minutes * 60000)
        return
        yield  # pragma: no cover

    stream = stream_transcripts(spark, path).withWatermark("ts", "1 minute")
    return stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        "conv_id string, n_turns long, first_ts timestamp, last_ts timestamp",
        "n long, first timestamp, last timestamp",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def stream_dedup_turns(spark, path: str, within: str = "30 minutes"):
    """Streaming exact dedup of transcript turns via
    dropDuplicatesWithinWatermark: duplicate (conv_id, turn_idx, text)
    arrivals inside the watermark horizon are dropped with BOUNDED
    state (keys expire once the watermark passes them — the streaming
    twin of the batch A7 dedup, state never grows corpus-sized)."""
    stream = stream_transcripts(spark, path).withWatermark("ts", within)
    return stream.dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "text"])


def run_stream_dedup_once(spark, path: str, query_name: str = "dedup_turns"):
    q = (
        stream_dedup_turns(spark, path)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
