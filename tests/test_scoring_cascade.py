"""Scoring + cascade semantics tests: TF-IDF cosine sanity, must/should
composition (J3/J4), `_best_match` truth table (es_match.py:41-57),
confidence scaling (A3), source dedup/re-attach (A1/J9), overrides (P5/P6)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from merge_machine_spark.functions.similarity import jaro_winkler_py
from merge_machine_spark.operators.blocking import explode_tokens
from merge_machine_spark.operators.cascade import (
    apply_overrides,
    cascade_pick,
    deduplicate_source,
    re_duplicate,
    top1_per_source,
)
from merge_machine_spark.operators.scoring import Clause, compose_matcher, tfidf_cosine_pairs


def test_tfidf_identical_docs_score_1(spark):
    df = spark.createDataFrame(
        [("a", ["x", "y", "z"]), ("b", ["x", "y", "z"]), ("c", ["q", "r"])], ["doc_id", "toks"]
    )
    tok = explode_tokens(df, "doc_id", F.col("toks"), with_tf=True)
    rows = tfidf_cosine_pairs(tok, max_df=None, n_docs=3).collect()
    scores = {(r["id_a"], r["id_b"]): r["tfidf_cosine"] for r in rows}
    assert scores[("a", "b")] == pytest.approx(1.0, abs=1e-9)
    assert ("a", "c") not in scores  # no shared token


def test_compose_matcher_must_should(spark):
    m1 = spark.createDataFrame([("a", "b", 1.0), ("a", "c", 0.5)], ["id_a", "id_b", "clause_score"])
    m2 = spark.createDataFrame([("a", "b", 2.0)], ["id_a", "id_b", "clause_score"])
    s1 = spark.createDataFrame([("a", "b", 10.0), ("x", "y", 99.0)], ["id_a", "id_b", "clause_score"])
    out = compose_matcher(
        [
            (Clause("must", "t", "t", "ch1", 1.0), m1),
            (Clause("must", "t", "t", "ch2", 1.0), m2),
            (Clause("should", "t", "t", "ch3", 0.5), s1),
        ]
    ).collect()
    d = {(r["id_a"], r["id_b"]): r["score"] for r in out}
    # must ∩ must: only (a,b); should adds 0.5*10
    assert d == {("a", "b"): pytest.approx(1.0 + 2.0 + 5.0)}


def test_compose_matcher_requires_must():
    with pytest.raises(ValueError):
        compose_matcher([(Clause("should", "t", "t", "c", 1.0), None)])


def test_cascade_best_match_truth_table(spark):
    """Port of the es_match `_best_match` cases: first tier above threshold
    wins; else first tier with any hit; else no match."""
    t0 = spark.createDataFrame([("r1", "x1", 5.0), ("r2", "x2", 1.0)], ["id_a", "id_b", "score"])
    t1 = spark.createDataFrame([("r2", "y2", 9.0), ("r3", "y3", 2.0)], ["id_a", "id_b", "score"])
    picked = {r["id_a"]: r for r in cascade_pick([t0, t1], thresholds=[4.0, 8.0]).collect()}
    # r1: tier0 above thresh -> match tier0
    assert picked["r1"]["id_b"] == "x1" and picked["r1"]["is_match"] and picked["r1"]["query_id"] == 0
    # r2: tier0 below, tier1 above -> match tier1
    assert picked["r2"]["id_b"] == "y2" and picked["r2"]["is_match"] and picked["r2"]["query_id"] == 1
    # r3: only tier1, below thresh -> not a match but best hit reported
    assert picked["r3"]["id_b"] == "y3" and not picked["r3"]["is_match"] and picked["r3"]["query_id"] == 1


def test_cascade_confidence_scaling(spark):
    t0 = spark.createDataFrame([("r1", "x1", 6.0)], ["id_a", "id_b", "score"])
    picked = cascade_pick([t0], thresholds=[4.0], tier_means=[2.0]).collect()[0]
    # confidence = 1 + (score - thresh)/mean  (es_match.py:349-350)
    assert picked["confidence"] == pytest.approx(1 + (6.0 - 4.0) / 2.0)


def test_overrides_exact_and_negative(spark):
    picked = spark.createDataFrame(
        [("r1", "x1", 5.0, 0, 4.0, True, 1.5), ("r2", "x2", 5.0, 0, 4.0, True, 1.5)],
        ["id_a", "id_b", "sim_score", "query_id", "thresh", "is_match", "confidence"],
    )
    exact = spark.createDataFrame([("r1", "zz")], ["id_a", "id_b"])
    nonm = spark.createDataFrame([("r2", "x2")], ["id_a", "id_b"])
    out = {r["id_a"]: r for r in apply_overrides(picked, exact, nonm).collect()}
    assert out["r1"]["id_b"] == "zz" and out["r1"]["sim_score"] == 999.0 and out["r1"]["is_match"]
    assert not out["r2"]["is_match"] and out["r2"]["sim_score"] == 0.0


def test_dedup_and_reattach(spark):
    src = spark.createDataFrame(
        [("s1", "A", "X"), ("s2", "A", "X"), ("s3", "B", "Y"), ("s4", "A ", "X")],
        ["doc_id", "c1", "c2"],
    )
    deduped, gmap, did = deduplicate_source(src, ["c1", "c2"], min_diff_prop=0.1)
    assert did and deduped.count() == 3  # s1/s2 collapse ('A ' differs from 'A')
    res = spark.createDataFrame([("s1", 0.9)], ["id_a", "score"])
    back = re_duplicate(res, gmap)
    got = {r["id_a"]: r["score"] for r in back.collect()}
    assert got["s1"] == 0.9 and got["s2"] == 0.9 and got["s3"] is None


def test_top1_window_deterministic(spark):
    scores = spark.createDataFrame(
        [("r1", "b", 1.0), ("r1", "a", 1.0), ("r1", "c", 0.5)], ["id_a", "id_b", "score"]
    )
    top = top1_per_source(scores).collect()
    assert len(top) == 1 and top[0]["id_b"] == "a"  # tie broken by id_b asc


def test_jaro_winkler_matches_duckdb():
    con = duckdb.connect()
    cases = [("martha", "marhta"), ("dwayne", "duane"), ("", ""), ("abc", ""), ("lycee agricole", "lyc agricole")]
    for a, b in cases:
        d = con.execute("SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler_py(a, b) == pytest.approx(d, abs=1e-12)


def test_majority_vote(spark):
    """A7: most frequent vote per key, deterministic tie-break."""
    from merge_machine_spark.operators.cascade import majority_vote

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "x"), ("g2", "y")],
        "grp string, match string",
    )
    got = {r["grp"]: (r["vote"], r["n_votes"]) for r in majority_vote(df, ["grp"], "match").collect()}
    assert got["g1"] == ("a", 2)
    assert got["g2"] == ("x", 1)  # tie -> lexicographically first
