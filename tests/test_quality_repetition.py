"""Unit tests for the Gopher-style repetition stats and context-window
chunking (functions/quality.py). Hand-built docs with known answers; the
contract queries over the real documents table are oracled in
__spark_entry__ (repetition_stats, doc_chunks)."""

import pytest

from merge_machine_spark.functions.quality import chunk_documents, repetition_stats


def _stats(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in repetition_stats(docs, **kw).collect()}


def test_repetition_known_values(spark):
    got = _stats(
        spark,
        [
            (1, "a b a b a b"),
            (2, "one two three four"),
            (5, "w w w w w w"),
        ],
    )
    # doc 1: 6 tokens, 2 uniq; bigrams [ab,ba,ab,ba,ab] -> top 3/5; all 4 trigrams duplicated
    assert got[1]["n_tokens"] == 6
    assert got[1]["uniq_token_frac_e6"] == 333333
    assert got[1]["top_2gram_count"] == 3
    assert got[1]["top_2gram_frac_e6"] == 600000
    assert got[1]["dup_3gram_frac_e6"] == 1000000
    # doc 2: no repetition at all
    assert got[2]["uniq_token_frac_e6"] == 1000000
    assert got[2]["top_2gram_frac_e6"] == 333333  # each of 3 bigrams once
    assert got[2]["dup_3gram_frac_e6"] == 0
    # doc 5: maximal repetition
    assert got[5]["top_2gram_frac_e6"] == 1000000
    assert got[5]["dup_3gram_frac_e6"] == 1000000


def test_repetition_degenerate_docs(spark):
    """Docs too short for an n-gram family report 0 for it; null/empty text
    is a 0-token doc, never an error or a dropped row."""
    got = _stats(spark, [(1, "x"), (2, None), (3, ""), (4, "a b")])
    assert set(got) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert got[d]["top_2gram_count"] == 0
        assert got[d]["top_2gram_frac_e6"] == 0
        assert got[d]["dup_3gram_frac_e6"] == 0
    assert got[2]["n_tokens"] == 0 and got[2]["uniq_token_frac_e6"] == 0
    # 2 tokens: one bigram (frac 1.0), still no trigrams
    assert got[4]["top_2gram_frac_e6"] == 1000000
    assert got[4]["dup_3gram_frac_e6"] == 0


def test_chunk_exact_boundaries(spark):
    docs = spark.createDataFrame([(1, "t1 t2 t3 t4 t5 t6")], "doc_id long, text string")
    got = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 3: [t1..t4], [t4..t6]
    assert [r["chunk_text"] for r in got] == ["t1 t2 t3 t4", "t4 t5 t6"]
    assert [r["chunk_n_tokens"] for r in got] == [4, 3]


def test_chunk_no_overlap_covers_all_tokens_once(spark):
    docs = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string")
    got = chunk_documents(docs, chunk_tokens=4, overlap=0).collect()
    toks = [t for r in sorted(got, key=lambda r: r["chunk_idx"]) for t in r["chunk_text"].split()]
    assert toks == [f"t{i}" for i in range(10)]  # partition, no dup, no loss


def test_chunk_short_and_empty_docs(spark):
    docs = spark.createDataFrame([(1, "only two"), (2, ""), (3, None)], "doc_id long, text string")
    got = chunk_documents(docs, chunk_tokens=16, overlap=4).collect()
    assert len(got) == 1  # empty/null docs dropped, short doc = one short chunk
    assert got[0]["doc_id"] == 1 and got[0]["chunk_n_tokens"] == 2


def test_chunk_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_documents_fill_and_boundaries(spark):
    """Within one bucket, docs fill sequences greedily in id order: the
    running start offset determines the sequence, a long doc overflows its
    sequence (never splits), and the next doc opens the next one."""
    from merge_machine_spark.functions.quality import pack_documents

    rows = [(i, " ".join(["w"] * n)) for i, n in [(1, 10), (2, 10), (3, 30), (4, 5), (5, 10)]]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pack_documents(docs, budget_tokens=25, n_buckets=1).collect()}
    # starts: 0, 10, 20, 50, 55 -> seqs 0, 0, 0 (overflows to 50), 2, 2
    assert [got[i]["seq_idx"] for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 2, 2]
    assert [got[i]["offset_in_seq"] for i in (1, 2, 3, 4, 5)] == [0, 10, 20, 0, 5]
    assert all(got[i]["bucket"] == got[1]["bucket"] for i in (2, 3, 4, 5))


def test_pack_documents_drops_empty_and_buckets_disjoint(spark):
    from merge_machine_spark.functions.quality import pack_documents

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(50)] + [(99, ""), (100, None)], "doc_id long, text string"
    )
    got = pack_documents(docs, budget_tokens=6, n_buckets=8).collect()
    assert len(got) == 50  # empty/null dropped
    assert {r["bucket"] for r in got} <= set(range(8))
    # offsets restart per (bucket, seq): every offset < budget
    assert all(0 <= r["offset_in_seq"] < 6 for r in got)
