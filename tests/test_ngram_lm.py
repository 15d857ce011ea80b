"""Bigram-LM quality scoring (functions/ngram_lm.py): hand-computed
add-one probabilities, held-out smoothing floor, short-doc exclusion."""
import math

from merge_machine_spark.functions.ngram_lm import (
    bigram_lm_scores,
    score_documents,
    train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_train_counts(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a b x")])
    bc, cc, v = train_bigram_lm(df)
    assert v == 3
    assert {(r["w1"], r["w2"]): r["c12"] for r in bc.collect()} == {
        ("a", "b"): 3, ("b", "a"): 1, ("b", "x"): 1}
    assert {r["w1"]: r["c1"] for r in cc.collect()} == {"a": 3, "b": 2}


def test_scores_hand_computed(spark):
    df = _docs(spark, [(1, "a b a b"), (2, "a b x")])
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    # V=3; p_e6(a,b) = 4_000_000 div 6 = 666_666; p_e6(b,a) = 2_000_000
    # div 5 = 400_000; p_e6(b,x) = 400_000
    d1, d2 = got[1], got[2]
    assert (d1["n_bigrams"], d1["sum_p_e6"]) == (3, 666_666 * 2 + 400_000)
    assert (d2["n_bigrams"], d2["sum_p_e6"]) == (2, 666_666 + 400_000)
    assert d1["avg_p_e6"] == d1["sum_p_e6"] / 3
    # float log column agrees with the exact fractions
    want_logp_d2 = (math.log(4 / 6) + math.log(2 / 5)) / 2
    assert abs(d2["avg_logp"] - want_logp_d2) < 1e-12


def test_heldout_unseen_bigram_gets_smoothing_floor(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "a b x")])
    bc, cc, v = train_bigram_lm(train)
    held = _docs(spark, [(9, "z z")])  # w1 'z' unseen as context
    got = score_documents(held, bc, cc, v).collect()[0]
    assert got["n_bigrams"] == 1
    assert got["sum_p_e6"] == 1_000_000 // 3  # (0+1)*1e6 div (0+V)


def test_short_docs_excluded(spark):
    df = _docs(spark, [(1, "solo"), (2, ""), (3, None), (4, "a b")])
    got = {r["doc_id"] for r in bigram_lm_scores(df).collect()}
    assert got == {4}


def test_rankings_flag_outlier_doc(spark):
    # five fluent docs share transitions; the outlier has unique ones
    rows = [(i, "the cat sat on the mat") for i in range(1, 6)]
    rows.append((99, "zq wv kj qpx mzl"))
    df = _docs(spark, rows)
    got = sorted(bigram_lm_scores(df).collect(), key=lambda r: r["avg_p_e6"])
    assert got[0]["doc_id"] == 99  # lowest LM score = the junk doc
