"""Exact substring dedup (functions/substring_dedup.py): planted
duplicate runs, within-doc repetition, canonical-keep policy, interval
merge, and the text rewrite."""
import pytest

from merge_machine_spark.functions.substring_dedup import (
    apply_span_cuts,
    duplicated_spans,
    shingle_positions,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_shingle_positions_basic(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "x y")])
    got = sorted((r["doc_id"], r["pos"], r["shingle"])
                 for r in shingle_positions(df, 3).collect())
    assert got == [(1, 1, "a b c"), (1, 2, "b c d")]  # doc 2 too short


def test_shingle_positions_rejects_l1(spark):
    with pytest.raises(ValueError):
        shingle_positions(_docs(spark, [(1, "a b")]), 1)


def test_cross_doc_duplicate_run_cut_in_later_doc_only(spark):
    df = _docs(spark, [
        (1, "a b c d e f g"),
        (2, "x y c d e f z"),
    ])
    spans = {(r["doc_id"], r["span_start"], r["span_end"], r["n_tokens_cut"])
             for r in duplicated_spans(df, L=3).collect()}
    # shared run 'c d e f': shingles (c d e)@3 and (d e f)@4 in both docs;
    # doc 1 is canonical; doc 2's overlapping windows [3,5],[4,6] merge
    assert spans == {(2, 3, 6, 4)}


def test_within_doc_repetition(spark):
    df = _docs(spark, [(1, "p q r s p q r s")])
    spans = {(r["doc_id"], r["span_start"], r["span_end"])
             for r in duplicated_spans(df, L=4).collect()}
    assert spans == {(1, 5, 8)}  # second 'p q r s' cut, first kept


def test_disjoint_cuts_stay_separate_intervals(spark):
    # doc 3 repeats two DIFFERENT runs from docs 1 and 2, separated by
    # unique tokens -> two merged intervals, not one
    df = _docs(spark, [
        (1, "a b c d"),
        (2, "w x y z"),
        (3, "a b c d k1 k2 w x y z"),
    ])
    spans = sorted((r["span_start"], r["span_end"])
                   for r in duplicated_spans(df, L=4).filter("doc_id = 3").collect())
    assert spans == [(1, 4), (7, 10)]


def test_no_duplicates_empty(spark):
    df = _docs(spark, [(1, "a b c"), (2, "d e f")])
    assert duplicated_spans(df, L=3).count() == 0


def test_hashed_variant_same_spans(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, "x y c d e f z")])
    plain = sorted(map(tuple, duplicated_spans(df, L=3).collect()))
    hashed = sorted(map(tuple, duplicated_spans(df, L=3, hashed=True).collect()))
    assert plain == hashed


def test_apply_span_cuts_rewrites_text(spark):
    df = _docs(spark, [
        (1, "a b c d e f g"),
        (2, "x y c d e f z"),
        (3, "untouched doc"),
    ])
    spans = duplicated_spans(df, L=3)
    got = {r["doc_id"]: r["text_dedup"] for r in apply_span_cuts(df, spans).collect()}
    assert got[1] == "a b c d e f g"  # canonical copy intact
    assert got[2] == "x y z"
    assert got[3] == "untouched doc"


def test_apply_span_cuts_whole_doc_duplicate(spark):
    df = _docs(spark, [(1, "m n o p"), (2, "m n o p")])
    spans = duplicated_spans(df, L=4)
    got = {r["doc_id"]: r["text_dedup"] for r in apply_span_cuts(df, spans).collect()}
    assert got == {1: "m n o p", 2: ""}
