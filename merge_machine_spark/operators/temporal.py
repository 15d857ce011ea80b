"""Temporal operators for event streams: gap-based sessionization and
as-of (most-recent-prior) joins.

Training-data pipelines over event/interaction logs need both constantly:
sessionization turns a raw clickstream into training examples ("all events
a user produced in one sitting"), and the as-of join attaches the latest
preceding context row (impression, feature snapshot, model version) to
each outcome row without an O(n^2) range join.

Scale design (100 TB):
  * Both operators are a SINGLE shuffle on the partition key (user/entity
    id) followed by a sequential per-key window scan — the minimum possible
    data movement for semantics that are inherently per-key ordered.
  * No per-row Python anywhere; everything is window expressions inside
    WholeStageCodegen.
  * The as-of join is the union+window formulation (tag both sides, sort by
    (ts, tag, tie), carry the last non-null right payload forward) rather
    than a range join: a range join explodes on long histories, while the
    union+window scan is O(n log n) per key and never materializes
    candidate pairs.
  * Skew: a single pathological key serializes its own scan but nothing
    else (window partitions are independent). For known hot keys, pre-split
    upstream by a coarse time bucket and re-stitch sessions across bucket
    boundaries; not needed at the driver scales.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_IDX = "session_idx"


def epoch_us(col: str | F.Column) -> F.Column:
    """Epoch microseconds of a timestamp column, independent of the session
    timezone and of TIMESTAMP vs TIMESTAMP_NTZ storage: the column is cast
    to NTZ wall-clock time and diffed against the NTZ epoch. Matches
    DuckDB's ``epoch_us`` over naive parquet timestamps bit-for-bit (the
    driver's oracle session need not be UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_us: int = 8 * 3600 * 1_000_000,
    tie_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Assign a gap-based session index to every event.

    A new session starts at the first event of a key and whenever the time
    since the previous event of the same key exceeds ``gap_us``
    microseconds. Returns the input plus ``session_idx`` (1-based, dense
    per key). Ordering inside a key is (ts, *tie_cols) — total, so the
    assignment is deterministic even with duplicate timestamps.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in tie_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    ts_us = epoch_us(ts_col)
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(SESSION_IDX, F.sum(new_session).over(run))


def session_stats(
    sessions: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session rollup of a ``sessionize`` output: event count, start/end
    in exact epoch-microseconds, duration in ms, and an exact decimal value
    sum (float-free aggregation, hash-stable vs any ANSI engine)."""
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(epoch_us(ts_col)).alias("start_us"),
        F.max(epoch_us(ts_col)).alias("end_us"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value")
        )
    # grouping on (key, session_idx) reuses the window's hash partitioning
    # on key (a subset of the grouping keys satisfies the clustered
    # distribution), so the rollup adds no second shuffle.
    out = sessions.groupBy(key_col, SESSION_IDX).agg(*aggs)
    return out.withColumn("duration_ms", F.expr("(end_us - start_us) div 1000"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    left_tie_cols: Sequence[str] = (),
    right_tie_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: each left row picks the right row of
    the same key with the greatest ``right_ts`` <= ``left_ts`` (ties among
    right rows broken by ``right_tie_cols``, last wins). Left rows with no
    prior right row keep NULLs — a left outer as-of.

    Single shuffle: both sides are unioned with a side tag, sorted per key
    by (ts, tag=right-first, tie), and the latest right payload is carried
    forward with ``last(..., ignorenulls=True)``. At equal timestamps the
    right row sorts before the left row (tag 0 < 1), giving the inclusive
    (<=) semantics of a standard ASOF JOIN.

    Returns all left columns plus ``{prefix}<col>`` for each of
    ``right_cols`` and ``{prefix}ts_us`` (the matched right timestamp in
    epoch-microseconds, NULL when unmatched).
    """
    on = list(on)
    payload = F.struct(
        *([epoch_us(right_ts).alias("__ts_us")] + [F.col(c).alias(c) for c in right_cols])
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        payload.alias("__p"),
        *[F.col(c).alias(f"__rt_{i}") for i, c in enumerate(right_tie_cols)],
    )
    # left rows carry a NULL payload and their full row as a struct
    n_rt = len(right_tie_cols)
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.lit(None).cast(r.schema[f"__rt_{i}"].dataType).alias(f"__rt_{i}") for i in range(n_rt)],
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    u = r.unionByName(l)
    order = (
        [F.col("__ts"), F.col("__tag")]
        + [F.col(f"__rt_{i}") for i in range(n_rt)]
        + [F.col(f"__l.{c}") for c in left_tie_cols]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__p", ignorenulls=True).over(w)
    out = (
        u.withColumn("__carried", carried)
        .filter(F.col("__tag") == 1)
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in left.columns],
            F.col("__carried.__ts_us").alias(f"{prefix}ts_us"),
            *[F.col(f"__carried.{c}").alias(f"{prefix}{c}") for c in right_cols],
        )
    )
    return out
