"""Closed-loop calibration test: learn the resolve threshold from labelled
pairs (L5 semantics over OUR features), run the pipeline with it, and hit
the F1 >= 0.99 gate — no hand-tuned threshold anywhere."""

from pyspark.sql import functions as F

from merge_machine_spark.plans.calibration import learn_resolve_threshold
from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
from merge_machine_spark.sources.synth import generate_labels


def test_learned_threshold_hits_f1_gate(spark, docs300):
    labels = generate_labels(docs300, n_pos=400, n_neg=400).cache()
    cfg = ResolveConfig()
    thresh, metrics = learn_resolve_threshold(spark, docs300.select("doc_id", "spans"), labels, cfg)
    # learned threshold lands in the separating band and reports high P/R
    assert 0.2 < thresh < 0.7, (thresh, metrics)
    assert metrics["precision"] >= 0.95 and metrics["recall_of_positives"] >= 0.95

    cfg.threshold = float(thresh)
    res = resolve(spark, docs300.select("doc_id", "spans"), cfg)
    assign = res["cluster_assignments"].cache()
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
    assert f1 >= 0.99, f"calibrated F1 {f1:.4f} at learned threshold {thresh:.3f}"
