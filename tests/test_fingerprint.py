"""Winnowing fingerprint tests: the SIGMOD'03 guarantee and edge semantics."""

from pyspark.sql import functions as F

from merge_machine_spark.functions.fingerprint import winnowing_fingerprints

K, W = 3, 4


def _fps(spark, rows):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = winnowing_fingerprints(df, k=K, w=W).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert r["doc_fp_count"] > 0
    return by_doc, out


def test_shared_run_guarantees_shared_fingerprint(spark):
    # winnowing guarantee: any shared token run of length >= w + k - 1 (= 6)
    # forces at least one common selected hash, whatever surrounds it
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        ("a", f"intro words here {shared} and a very different tail entirely"),
        ("b", f"completely other opening {shared} closing with unrelated content"),
        ("c", "nothing in common with either document at all whatsoever today"),
    ]
    by_doc, _ = _fps(spark, rows)
    assert by_doc["a"] & by_doc["b"], "shared 6-token run must share a fingerprint"
    assert not (by_doc["a"] & by_doc["c"])


def test_identical_docs_identical_sets(spark):
    txt = "the quick brown fox jumps over the lazy dog again and again"
    by_doc, _ = _fps(spark, [("x", txt), ("y", txt)])
    assert by_doc["x"] == by_doc["y"]


def test_short_docs_have_no_full_window(spark):
    # < k + w - 1 = 6 tokens -> no full winnowing window -> absent
    by_doc, out = _fps(spark, [("tiny", "only five tokens right here"), ("ok", "one two three four five six seven")])
    assert "tiny" not in by_doc and "ok" in by_doc


def test_fp_rows_distinct_and_counts_consistent(spark):
    txt = "repeat repeat repeat repeat repeat repeat repeat repeat repeat"
    by_doc, out = _fps(spark, [("r", txt)])
    # all-equal shingle hashes collapse to a single distinct fingerprint
    assert len(by_doc["r"]) == 1
    rows = [r for r in out if r["doc_id"] == "r"]
    assert len(rows) == 1 and rows[0]["doc_fp_count"] == 1


def test_fp_near_dup_pairs_finds_near_dup_and_caps_hot_fps(spark):
    from merge_machine_spark.functions.fingerprint import fp_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("a", base),
        ("b", base + " with a small tail edit"),       # near-dup of a
        ("c", "entirely different words nothing shared here at all today friends"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {(r["doc_a"], r["doc_b"]): r for r in fp_near_dup_pairs(docs, min_shared=2).collect()}
    assert ("a", "b") in out
    r = out[("a", "b")]
    assert r["n_shared"] >= 2 and 0 < r["jaccard_e3"] <= 1000
    assert all("c" not in k for k in out)
    # hot-fp cap: a fingerprint present in every doc gets dropped, reported
    many = [(f"d{i}", base) for i in range(6)]
    docs2 = spark.createDataFrame(many, "doc_id string, text string")
    report = {}
    capped = fp_near_dup_pairs(docs2, min_shared=1, max_fp_df=5, report=report)
    assert capped.count() == 0  # every fp hits all 6 docs -> all dropped
    assert report["fps_dropped"] > 0 and report["dropped_mass"] >= 6


def test_fp_near_dup_jaccard_exact_for_identical_docs(spark):
    from merge_machine_spark.functions.fingerprint import fp_near_dup_pairs

    txt = "one two three four five six seven eight nine ten eleven twelve"
    docs = spark.createDataFrame([("x", txt), ("y", txt)], "doc_id string, text string")
    rows = fp_near_dup_pairs(docs, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    # identical docs: shared = union -> jaccard exactly 1000
    assert r["n_shared"] == r["fp_count_a"] == r["fp_count_b"] and r["jaccard_e3"] == 1000
