"""Unit tests for temporal operators (sessionize / as-of join) and
deterministic hash sampling. Hand-built frames with known answers; the
driver-contract queries over the real tables are oracled separately in
__spark_entry__ (sessionize_events, asof_click_view, train_test_split,
stratified_sample, dedup_keep_best)."""

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F

from merge_machine_spark.functions.sampling import (
    hash_bucket,
    stratified_sample,
    train_test_split,
)
from merge_machine_spark.operators.clustering import canonical_per_cluster
from merge_machine_spark.operators.temporal import asof_join, epoch_us, session_stats, sessionize


def _ts(s):
    return dt.datetime.fromisoformat(s)


# -- epoch_us ---------------------------------------------------------------


def test_epoch_us_known_value(spark):
    df = spark.createDataFrame([(_ts("2024-01-01T00:00:01.500000"),)], "ts timestamp_ntz")
    got = df.select(epoch_us("ts").alias("us")).collect()[0]["us"]
    assert got == 1704067201500000


# -- sessionize -------------------------------------------------------------


def _events(spark):
    rows = [
        # user 1: 3 events tight, gap, 2 events
        (1, _ts("2024-01-01T00:00:00"), 10),
        (1, _ts("2024-01-01T00:30:00"), 11),
        (1, _ts("2024-01-01T00:59:00"), 12),
        (1, _ts("2024-01-01T03:00:00"), 13),  # 2h01 gap -> new session (gap=1h)
        (1, _ts("2024-01-01T03:30:00"), 14),
        # user 2: single event
        (2, _ts("2024-01-01T05:00:00"), 20),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp_ntz, event_id int")


def test_sessionize_gap_splits(spark):
    s = sessionize(_events(spark), gap_us=3600 * 1_000_000)
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    assert got == {10: 1, 11: 1, 12: 1, 13: 2, 14: 2, 20: 1}


def test_sessionize_equal_ts_deterministic(spark):
    t = _ts("2024-01-01T00:00:00")
    rows = [(1, t, 2), (1, t, 1), (1, _ts("2024-01-01T09:00:00"), 3)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp_ntz, event_id int")
    s = sessionize(df, gap_us=3600 * 1_000_000)
    got = {r["event_id"]: r["session_idx"] for r in s.collect()}
    # equal-ts rows share the first session regardless of input order
    assert got == {1: 1, 2: 1, 3: 2}


def test_session_stats_rollup(spark):
    ev = _events(spark).withColumn("value", F.lit(1.25))
    s = session_stats(sessionize(ev, gap_us=3600 * 1_000_000))
    row = {(r["user_id"], r["session_idx"]): r for r in s.collect()}
    a = row[(1, 1)]
    assert a["n_events"] == 3
    assert a["duration_ms"] == 59 * 60 * 1000
    assert a["sum_value"] == pytest.approx(3.75)
    assert row[(2, 1)]["n_events"] == 1
    assert row[(2, 1)]["duration_ms"] == 0


# -- asof_join ----------------------------------------------------------------


def _sides(spark):
    clicks = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T01:00:00"), 100),
            (1, _ts("2024-01-01T02:00:00"), 101),
            (2, _ts("2024-01-01T01:00:00"), 200),  # user 2 has no views
        ],
        "user_id int, ts timestamp_ntz, event_id int",
    )
    views = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:30:00"), 50),
            (1, _ts("2024-01-01T00:45:00"), 51),
            (1, _ts("2024-01-01T01:30:00"), 52),
        ],
        "user_id int, ts timestamp_ntz, event_id int",
    )
    return clicks, views


def test_asof_picks_latest_prior(spark):
    clicks, views = _sides(spark)
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], left_tie_cols=("event_id",),
        right_tie_cols=("event_id",), prefix="v_",
    )
    got = {r["event_id"]: r["v_event_id"] for r in out.collect()}
    assert got == {100: 51, 101: 52, 200: None}


def test_asof_inclusive_at_equal_ts_and_right_ties(spark):
    t = _ts("2024-01-01T01:00:00")
    clicks = spark.createDataFrame([(1, t, 100)], "user_id int, ts timestamp_ntz, event_id int")
    views = spark.createDataFrame(
        [(1, t, 50), (1, t, 51)], "user_id int, ts timestamp_ntz, event_id int"
    )
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], right_tie_cols=("event_id",), prefix="v_",
    ).collect()
    # equal-ts view counts (inclusive), highest tie-break event_id wins
    assert out[0]["v_event_id"] == 51
    assert out[0]["v_ts_us"] == 1704070800000000


def test_asof_keeps_all_left_columns(spark):
    clicks, views = _sides(spark)
    clicks = clicks.withColumn("extra", F.col("event_id") * 2)
    out = asof_join(
        clicks, views, on=["user_id"], left_ts="ts", right_ts="ts",
        right_cols=["event_id"], prefix="v_",
    )
    assert set(out.columns) == {"user_id", "ts", "event_id", "extra", "v_ts_us", "v_event_id"}
    assert out.count() == 3


# -- canonical_per_cluster ----------------------------------------------------


def test_canonical_long_ids(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5)], "doc_id long, n_chars int"
    )
    assigns = spark.createDataFrame(
        [(1, "c1"), (2, "c1"), (3, "c1"), (4, "c2")], "doc_id long, cluster_id string"
    )
    got = {r["cluster_id"]: r for r in canonical_per_cluster(docs, assigns, "n_chars").collect()}
    # max n_chars 30 shared by docs 2,3 -> lowest id 2 wins
    assert got["c1"]["canonical_id"] == 2
    assert got["c1"]["n_members"] == 3
    assert got["c1"]["best_n_chars"] == 30
    assert got["c2"]["canonical_id"] == 4


def test_canonical_string_ids(spark):
    docs = spark.createDataFrame(
        [("10", 7), ("2", 7), ("9", 1)], "doc_id string, n_chars int"
    )
    assigns = spark.createDataFrame(
        [("10", "c"), ("2", "c"), ("9", "c")], "doc_id string, cluster_id string"
    )
    got = canonical_per_cluster(docs, assigns, "n_chars").collect()[0]
    # lexicographic min among tied winners: "10" < "2"
    assert got["canonical_id"] == "10"
    assert got["n_members"] == 3


# -- sampling -----------------------------------------------------------------


def test_hash_bucket_matches_python_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {r["doc_id"]: r["b"] for r in df.select("doc_id", hash_bucket("doc_id", "split").alias("b")).collect()}
    for i in range(50):
        want = int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16) % 100
        assert got[i] == want


def test_hash_bucket_xxhash64_fast_path(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    b = df.select(hash_bucket("doc_id", "s", algo="xxhash64").alias("b"))
    rows = [r["b"] for r in b.collect()]
    assert all(0 <= x < 100 for x in rows)
    # roughly uniform and deterministic across evaluations
    assert len(set(rows)) > 80
    assert rows == [r["b"] for r in b.collect()]
    with pytest.raises(ValueError):
        hash_bucket("doc_id", "s", algo="sha1")


def test_train_test_split_disjoint_and_monotone(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    s80 = train_test_split(df, "doc_id", train_pct=80)
    n_train_80 = s80.filter(F.col("split") == "train").count()
    assert 0.75 * 2000 < n_train_80 < 0.85 * 2000
    # monotone: every train row at 60% is still train at 80%
    t60 = {r["doc_id"] for r in train_test_split(df, "doc_id", 60).filter(F.col("split") == "train").collect()}
    t80 = {r["doc_id"] for r in s80.filter(F.col("split") == "train").collect()}
    assert t60 <= t80
    # same row never in both splits
    assert s80.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = stratified_sample(df, "doc_id", "lang", {"en": 25, "fr": 100})
    by_lang = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert by_lang["fr"] == 1000  # 100% kept
    assert 0.18 * 1000 < by_lang["en"] < 0.32 * 1000
    # unknown stratum dropped entirely under default_pct=0
    df2 = df.withColumn("lang", F.lit("zz"))
    assert stratified_sample(df2, "doc_id", "lang", {"en": 25}).count() == 0
