"""End-to-end pipeline tests (SURVEY.md §5.2 items 3/4/6):
labeled-pair F1 >= 0.99 on the synthetic entity fixture, span-sequence
invariant through the pipeline, checkpoint/resume determinism, linkage-mode
output contract."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from merge_machine_spark.functions.textproj import full_text, span_fingerprint
from merge_machine_spark.plans.pipeline import ResolveConfig, link, resolve
from merge_machine_spark.sources.synth import generate_documents, generate_labels


@pytest.fixture(scope="module")
def resolved(spark, docs300):
    res = resolve(spark, docs300.select("doc_id", "spans"), ResolveConfig(threshold=0.45))
    res["cluster_assignments"] = res["cluster_assignments"].cache()
    res["cluster_assignments"].count()
    return res


def test_labeled_pair_f1_above_99(spark, docs300, resolved):
    """The BASELINE.json gate: pairwise F1 >= 0.99 on labelled pairs at
    shared blocking keys (pair predicted positive iff same cluster)."""
    labels = generate_labels(docs300, n_pos=400, n_neg=400)
    assign = resolved["cluster_assignments"]
    ca = assign.select(F.col("doc_id").alias("doc_id_a"), F.col("cluster_id").alias("ca"))
    cb = assign.select(F.col("doc_id").alias("doc_id_b"), F.col("cluster_id").alias("cb"))
    j = (
        labels.join(ca, "doc_id_a").join(cb, "doc_id_b")
        .withColumn("pred", F.col("ca") == F.col("cb"))
        .withColumn("gold", F.col("label") == "y")
    )
    agg = j.agg(
        F.sum(F.when(F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("gold"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    prec = agg["tp"] / max(agg["tp"] + agg["fp"], 1)
    rec = agg["tp"] / max(agg["tp"] + agg["fn"], 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    assert f1 >= 0.99, f"labeled-pair F1 {f1:.4f} (p={prec:.4f}, r={rec:.4f})"


def test_span_invariant_preserved(spark, docs300, resolved):
    """input_hint per-row invariant: span sequence (kind, text, media_ref,
    order) is unchanged for every doc after the full pipeline — spans
    re-join by doc_id and fingerprints match 1:1."""
    before = docs300.select("doc_id", span_fingerprint("spans").alias("fp_before"))
    # pipeline output joined back to the (untouched) spans by doc_id
    after = resolved["cluster_assignments"].join(docs300.select("doc_id", "spans"), "doc_id")
    after_fp = after.select("doc_id", span_fingerprint("spans").alias("fp_after"))
    cmp = before.join(after_fp, "doc_id")
    n_total = cmp.count()
    n_equal = cmp.filter(F.col("fp_before") == F.col("fp_after")).count()
    assert n_total == docs300.count() and n_equal == n_total


def test_resume_byte_identical(spark):
    """SURVEY §5.2 item 6: kill after stage k (simulated by deleting the
    final stage manifest), relaunch, identical final cluster table."""
    docs = generate_documents(spark, 60, seed=9).select("doc_id", "spans")
    ckdir = tempfile.mkdtemp(prefix="ck_test_")
    try:
        r1 = resolve(spark, docs, ResolveConfig(), checkpoint_dir=ckdir, run_id="t")
        c1 = sorted(map(tuple, r1["cluster_assignments"].collect()))
        import os

        os.remove(f"{ckdir}/t/cluster_assignments/_STAGE_MANIFEST.json")
        r2 = resolve(spark, docs, ResolveConfig(), checkpoint_dir=ckdir, run_id="t")
        c2 = sorted(map(tuple, r2["cluster_assignments"].collect()))
        assert c1 == c2
        # manifests carry per-partition metrics
        from merge_machine_spark.sources.checkpoints import StageStore

        man = StageStore(ckdir, "t").manifest("pair_scores")
        assert man["rows"] > 0 and len(man["partitions"]) > 0
        assert any("score_avg" in p for p in man["partitions"])
        # the checkpointed run publishes entity-cluster-grain metrics too
        stats = {r["cluster_id"]: r for r in r2["cluster_metrics"].collect()}
        assert len(stats) > 0
        multi = [s for s in stats.values() if s["n_members"] > 1]
        assert multi and all(s["n_intra_pairs"] > 0 for s in multi)
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)


def test_lsh_only_pair_survives_prefilter(spark):
    """VERDICT r1 #1: a near-dup pair sharing NO block-channel token (so the
    TF-IDF channel never proposes it and its tfidf_cosine is 0 < prefilter)
    but with high 3-gram similarity must still be clustered when
    ``use_lsh=True`` — i.e. LSH-sourced pairs are exempt from the TF-IDF
    prefilter instead of being silently dropped."""
    rows = [
        ("a1", "grenoblexyz"),       # single token; no token shared with a2
        ("a2", "grenoblexyzq"),      # high 3-gram Jaccard with a1
        ("b1", "completelyother"),
        ("b2", "unrelatedwording"),
        ("b3", "thirdneutraldoc"),
    ]
    docs = spark.createDataFrame(
        [(i, [("text", t, None, 0)]) for i, t in rows],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    cfg = ResolveConfig(
        block_channel="standard",
        use_lsh=True,
        lsh_bands=16,
        lsh_rows=2,
        weights={"jaro_winkler": 0.6, "token_jaccard": 0.4},
        threshold=0.5,
        prefilter_tfidf=0.10,
    )

    def cluster_of(res, doc):
        return {r["doc_id"]: r["cluster_id"] for r in res["cluster_assignments"].collect()}[doc]

    with_lsh = resolve(spark, docs, cfg)
    assert cluster_of(with_lsh, "a1") == cluster_of(with_lsh, "a2")
    # and the TF-IDF channel alone genuinely cannot find it
    cfg_no = ResolveConfig(
        block_channel="standard", use_lsh=False,
        weights={"jaro_winkler": 0.6, "token_jaccard": 0.4}, threshold=0.5, prefilter_tfidf=0.10,
    )
    without = resolve(spark, docs, cfg_no)
    assert cluster_of(without, "a1") != cluster_of(without, "a2")


def test_link_output_contract(spark, docs300):
    """Linkage mode (es_match parity): row conservation + contract columns
    (FIXTURES.md §4) + high accuracy against ground truth."""
    flat = docs300.select("doc_id", full_text("spans").alias("full_text"), "entity_id")
    ref = flat.filter(F.col("doc_id").endswith("_00")).drop("entity_id").cache()
    src = flat.filter(~F.col("doc_id").endswith("_00")).drop("entity_id").cache()
    out = link(
        spark,
        src,
        ref,
        tiers=[{
            "proj_a": "full_text", "proj_b": "full_text", "channel": "french_estab",
            "weights": {"tfidf_cosine": 0.5, "jaro_winkler": 0.25, "token_jaccard": 0.25},
            "threshold": 0.45, "max_df": 64,
        }],
    ).cache()
    assert out.count() == src.count()  # es_match.py:397 row conservation
    for col in ["__IS_MATCH", "__ID_REF", "__ID_QUERY", "__SIM_SCORE", "__THRESH", "__CONFIDENCE", "__SOURCE_GROUP"]:
        assert col in out.columns, col
    assert any(c.endswith("__REF") for c in out.columns)
    # accuracy: matched rows point at the right entity's clean doc
    tr = docs300.select("doc_id", "entity_id")
    j = (
        out.filter(F.col("__IS_MATCH"))
        .join(tr.select(F.col("doc_id"), F.col("entity_id").alias("se")), "doc_id")
        .join(tr.select(F.col("doc_id").alias("__ID_REF"), F.col("entity_id").alias("re")), "__ID_REF")
    )
    acc = j.agg(F.avg((F.col("se") == F.col("re")).cast("double"))).collect()[0][0]
    assert acc >= 0.98
