"""Streaming sessionization (session_window + watermark) and the
split-contamination decontamination operator."""

import datetime as dt

from pyspark.sql import functions as F

from merge_machine_spark.functions.fingerprint import split_contamination, winnowing_fingerprints
from merge_machine_spark.operators.temporal import session_stats, sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _event_rows():
    return [
        (1, _ts("2024-01-01T00:00:00"), 10, 1.5),
        (1, _ts("2024-01-01T00:30:00"), 11, 2.0),
        (1, _ts("2024-01-01T03:00:00"), 12, 0.5),  # > 1h gap -> new session
        (2, _ts("2024-01-01T05:00:00"), 20, 4.0),
    ]


SCHEMA = "user_id int, ts timestamp_ntz, event_id int, value double"


def test_streaming_sessions_match_batch(spark, tmp_path):
    """availableNow drain of the streaming sessionizer produces the same
    per-session rollups as the batch operator on the same events (gap
    chosen strictly between event spacings, so the half-open/closed
    boundary convention difference cannot bite)."""
    from merge_machine_spark.streaming.sessions import run_session_stats

    src = str(tmp_path / "ev")
    events = spark.createDataFrame(_event_rows(), SCHEMA)
    # append mode only emits a session once the watermark passes its close;
    # a far-future sentinel event flushes every real session out of state
    # (in production the stream simply keeps flowing — no sentinel needed)
    sentinel = spark.createDataFrame([(999, _ts("2024-01-02T00:00:00"), 99, 0.0)], SCHEMA)
    events.unionByName(sentinel).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    run_session_stats(
        stream, str(tmp_path / "out"), str(tmp_path / "ck"),
        gap="1 hour", watermark="0 seconds",
    )
    got = spark.read.parquet(str(tmp_path / "out")).filter(F.col("user_id") != 999)
    want = session_stats(sessionize(events, gap_us=3600 * 1_000_000))

    key = lambda r: (r["user_id"], r["start_us"])
    got_rows = {key(r): r for r in got.collect()}
    want_rows = {key(r): r for r in want.collect()}
    assert set(got_rows) == set(want_rows)
    for k, w in want_rows.items():
        g = got_rows[k]
        assert g["n_events"] == w["n_events"]
        assert g["end_us"] == w["end_us"]
        assert g["duration_ms"] == w["duration_ms"]
        assert g["sum_value"] == w["sum_value"]
    # append mode: every emitted session is closed (watermark passed), and
    # the session_window end carries the trailing gap
    assert all(r["session_end"] > r["session_start"] for r in got.collect())


def test_streaming_sessions_merge_across_batches(spark, tmp_path):
    """Two file drops that belong to ONE session merge in the state store:
    drain 1 sees the first event, drain 2 (same checkpoint) adds an event
    30min later plus a much later event that closes the session."""
    from merge_machine_spark.streaming.sessions import run_session_stats

    src = str(tmp_path / "ev")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    b1 = spark.createDataFrame([_event_rows()[0]], SCHEMA)
    b1.write.mode("overwrite").parquet(src)
    stream = lambda: spark.readStream.schema(b1.schema).parquet(src)
    run_session_stats(stream(), out, ck, gap="1 hour", watermark="0 seconds")

    b2 = spark.createDataFrame([_event_rows()[1], _event_rows()[2]], SCHEMA)
    b2.write.mode("append").parquet(src)
    run_session_stats(stream(), out, ck, gap="1 hour", watermark="0 seconds")

    got = sorted(
        spark.read.parquet(out).filter(F.col("user_id") == 1).collect(),
        key=lambda r: r["start_us"],
    )
    # first session spans both drains' events (00:00 + 00:30), second opens at 03:00
    assert [r["n_events"] for r in got][0] == 2


def test_split_contamination_basics(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, text),                      # train
            (2, text),                      # test: exact dup of train -> contaminated
            (3, "one two three four five six seven eight nine ten"),  # test: clean
            (4, "xx yy"),                   # test: too short for any fingerprint
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=3, w=4)
    split = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "test"), (4, "test")], "doc_id long, split string"
    )
    got = {r["doc_id"]: r for r in split_contamination(fps, split, min_shared=2).collect()}
    assert set(got) == {2, 3, 4}  # one row per TEST doc only
    assert got[2]["contaminated"] and got[2]["n_shared_fps"] > 0
    assert not got[3]["contaminated"] and got[3]["n_shared_fps"] == 0
    assert not got[4]["contaminated"] and got[4]["n_shared_fps"] == 0


def test_split_contamination_threshold(spark):
    fps = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 100), (2, 999)], "doc_id long, fp long"
    )
    split = spark.createDataFrame([(1, "train"), (2, "test")], "doc_id long, split string")
    one = split_contamination(fps, split, min_shared=1).collect()[0]
    two = split_contamination(fps, split, min_shared=2).collect()[0]
    assert one["n_shared_fps"] == 1 and one["contaminated"]
    assert two["n_shared_fps"] == 1 and not two["contaminated"]
