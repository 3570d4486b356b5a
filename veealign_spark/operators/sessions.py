"""Sessionization + windowed aggregation over the events stream table
(batch form here; streaming form in veealign_spark.streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Classic lag+cumsum sessionization: a session breaks when the gap
    to the previous event of the same user exceeds gap_minutes.
    Returns per-session rows (user_id, session_id, n_events, start, end)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may arrive as TIMESTAMP_NTZ (parquet) — hop through timestamp
    # (session TZ is pinned UTC) before the epoch cast
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    brk = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = events.withColumn(
        "session_id", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary (the oracle-friendly rollup)."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").alias("n_events_total"),
    )


def windowed_counts(events: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling-window counts per event type (batch equivalent of the
    streaming query; window start emitted as a string for portability)."""
    win = F.window("ts", f"{hours} hour")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def asof_join_last_event(
    events: DataFrame,
    left_type: str,
    right_type: str,
    tolerance_minutes: int | None = None,
) -> DataFrame:
    """As-of join: for each `left_type` event, the most recent
    `right_type` event of the same user at-or-before its timestamp.

    Spark has no native ASOF; the scalable formulation is the tagged
    union + carry-forward window (one shuffle on user_id, no range
    explosion): order (ts, tag) within user, last(right, ignorenulls)
    over the preceding frame. Right events are first collapsed to one
    per (user, ts) (max event_id) so tie behavior is deterministic and
    engine-portable.
    """
    right = (
        events.filter(F.col("event_type") == right_type)
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("r_event_id"))
        .select("user_id", "ts", "r_event_id", F.lit(0).alias("tag"))
    )
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts",
        F.col("event_id").alias("l_event_id"),
        F.lit(1).alias("tag"),
    )
    unioned = right.unionByName(
        left.withColumn("r_event_id", F.lit(None).cast("long")),
        allowMissingColumns=True,
    ).unionByName(right.limit(0).withColumn("l_event_id", F.lit(None).cast("long")), allowMissingColumns=True)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "last_r", F.last("r_event_id", ignorenulls=True).over(w)
    ).withColumn("last_r_ts", F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w))
    matched = F.col("last_r")
    if tolerance_minutes is not None:
        matched = F.when(
            F.col("ts").cast("timestamp").cast("long")
            - F.col("last_r_ts").cast("timestamp").cast("long")
            <= tolerance_minutes * 60,
            F.col("last_r"),
        )
    return carried.filter(F.col("tag") == 1).select(
        F.col("l_event_id").alias("event_id"),
        "user_id",
        matched.alias("matched_event_id"),
    )
