"""Event-stream operators.

The reference has no stream processing — its time axis is supersteps
(SURVEY.md §2.8).  These operators extend the engine to the streaming
side of a training-data pipeline: windowed aggregation with
watermarks, and gap-based sessionization (batch via window functions;
streaming via session_window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window event counts per type (batch form).

    (window_start, event_type, n, total_value) — expressed with
    timestamp truncation so a SQL oracle reproduces it exactly; the
    streaming form is :func:`windowed_counts_stream`.
    """
    bucket = F.date_trunc("hour", F.col("ts")) if minutes == 60 else F.from_unixtime(
        (F.unix_timestamp("ts") / (minutes * 60)).cast("long") * (minutes * 60)
    ).cast("timestamp")
    return (
        events.groupBy(
            bucket.alias("window_start"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def windowed_counts_stream(events_stream: DataFrame, minutes: int = 60) -> DataFrame:
    """Streaming form: watermark + window() — late rows beyond 2h drop."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", f"{minutes} minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    events_stream: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Streaming gap-based sessionization — a CUSTOM STATEFUL operator
    via ``applyInPandasWithState``: per-user state carries (last event
    ts, running session id); sessions close when the gap exceeds
    ``gap_minutes`` or the group times out.

    Emits one row per (user, session) per trigger with running counts
    (output mode "update").  The batch-equivalence contract is tested
    against :func:`sessionize` in tests/test_streaming.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, session_id, n_events, session_start = state.get
        else:
            last_ts, session_id, n_events, session_start = None, 0, 0, None
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                epoch = ts.timestamp()
                if last_ts is None or epoch - last_ts > gap:
                    if session_id > 0:
                        out.append(
                            (user_id, session_id, session_start, n_events)
                        )
                    session_id += 1
                    n_events = 0
                    session_start = epoch
                n_events += 1
                last_ts = epoch
        if session_id > 0:
            out.append((user_id, session_id, session_start, n_events))
        state.update((last_ts, session_id, n_events, session_start))
        yield pd.DataFrame(
            out, columns=["user_id", "session_id", "session_start", "n_events"]
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, session_id long, "
        "session_start double, n_events long",
        stateStructType="last_ts double, session_id long, "
        "n_events long, session_start double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user (batch): lag + cumulative session id.

    (user_id, session_id, session_start, n_events) — session breaks
    when the gap to the previous event exceeds ``gap_minutes``.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    sess = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count("*").alias("n_events"),
    )


def dedup_events(events: DataFrame, granularity: str = "hour") -> DataFrame:
    """Batch retry-collapse dedup: keep the EARLIEST event per
    (user_id, event_type, time bucket) — the at-least-once-delivery
    repair step of an event-ingest pipeline.  Deterministic winner:
    min (ts, event_id) per key, expressed as a window rank so a SQL
    oracle reproduces it exactly."""
    bucket = F.date_trunc(granularity, F.col("ts"))
    w = Window.partitionBy("user_id", "event_type", bucket).orderBy(
        "ts", "event_id"
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_events_stream(
    events_stream: DataFrame,
    granularity: str = "hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming form: ``dropDuplicatesWithinWatermark`` on the same
    key — state for a key is dropped once the watermark passes it, so
    state size is bounded by (keys per watermark window), not by
    stream length.  Keeps the FIRST ARRIVAL per key (streaming cannot
    know the globally-earliest event); the batch form is the
    deterministic replay repair."""
    return (
        events_stream.withWatermark("ts", watermark)
        .withColumn("bucket", F.date_trunc(granularity, F.col("ts")))
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "bucket"])
        .drop("bucket")
    )
