"""Streaming sessionization: the unbounded twin of
``operators/temporal.sessionize`` via Spark's native session windows.

``F.session_window(ts, gap)`` + watermark is the idiomatic Structured
Streaming form: state per (key, open session), merged as events arrive,
emitted in APPEND mode once the watermark passes the session's close (start
of the last event + gap). No custom state handler needed — the engine's
session-window state store already implements exactly the gap semantics,
with merging across micro-batches and state eviction at the watermark.

Boundary convention vs the batch operator: ``session_window`` closes a
session when the next event is >= gap after the previous one (half-open
window [start, last+gap)), while the batch ``sessionize`` keeps an event
exactly gap away in the same session (diff > gap starts a new one). At
microsecond event-time resolution a diff of exactly the gap is measure-zero;
parity tests use gaps strictly between event spacings.

Scale: state size is O(open sessions), bounded by the watermark — a key
that goes quiet is flushed one gap+watermark after its last event. The
shuffle key is the session key, same as batch; skewed hot keys shard across
state-store partitions by key hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "8 hours",
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup over an unbounded event stream.

    Returns (key, session_start, session_end, n_events, start_us, end_us,
    duration_ms[, sum_value]) in APPEND mode — rows materialize when the
    watermark closes the session, so every emitted row is final (exactly
    the lambda-reconciliation property the batch re-resolve relies on).
    ``start_us``/``end_us`` are the observed event bounds (the window's
    start/end include the trailing gap on the end side)."""
    from pyspark.sql.types import TimestampNTZType

    from ..operators.temporal import epoch_us

    # Watermarks require TIMESTAMP event time; the batch tables store
    # TIMESTAMP_NTZ. Cast preserves the wall clock (session tz both ways),
    # so gap semantics and epoch_us (which re-casts to NTZ) are unchanged —
    # start_us/end_us match the batch operator bit-for-bit.
    if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))

    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(epoch_us(ts_col)).alias("start_us"),
        F.max(epoch_us(ts_col)).alias("end_us"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value")
        )
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(*aggs)
    )
    return out.select(
        key_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
        "start_us",
        "end_us",
        F.expr("(end_us - start_us) div 1000").alias("duration_ms"),
        *([F.col("sum_value")] if value_col is not None else []),
    )


def run_session_stats(
    events_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "8 hours",
    watermark: str = "1 hour",
    value_col: str | None = "value",
):
    """availableNow drain of :func:`streaming_session_stats` to parquet —
    the test/scheduled-load harness shape shared with ingest_to_staging."""
    stats = streaming_session_stats(
        events_stream, key_col=key_col, ts_col=ts_col, gap=gap,
        watermark=watermark, value_col=value_col,
    )
    q = (
        stats.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
