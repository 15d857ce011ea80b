"""Evaluate pipeline F1 on the labeled-pair criterion (BASELINE.json metric):
a labeled pair is predicted positive iff both docs land in the same cluster."""
import sys
import time

from pyspark.sql import functions as F

from merge_machine_spark.operators.clustering import (
    assignments_with_singletons, connected_components, pairwise_f1)
from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents, generate_labels

n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 300
spark = get_spark(cores=8)
docs = generate_documents(spark, n_entities, seed=42).cache()
labels = generate_labels(docs, n_pos=400, n_neg=400).cache()
print("docs:", docs.count(), "labels:", labels.count(), flush=True)

res = resolve(spark, docs.select("doc_id", "spans"), ResolveConfig())
scores = res["pair_scores"].cache()
proj = res["projected"]

for th in [0.40, 0.45, 0.50, 0.55]:
    t0 = time.time()
    edges = scores.filter(F.col("score") >= th).select("id_a", "id_b")
    assign = assignments_with_singletons(proj, connected_components(edges)).cache()
    # labeled-pair F1: predicted positive iff same cluster
    ca = assign.select(F.col("doc_id").alias("doc_id_a"), F.col("cluster_id").alias("ca"))
    cb = assign.select(F.col("doc_id").alias("doc_id_b"), F.col("cluster_id").alias("cb"))
    j = labels.join(ca, "doc_id_a").join(cb, "doc_id_b") \
        .withColumn("pred", F.col("ca") == F.col("cb")) \
        .withColumn("gold", F.col("label") == "y")
    agg = j.agg(
        F.sum(F.when(F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("gold"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("gold"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
    prec = tp / max(tp + fp, 1); rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    # full-corpus cluster F1 vs ground truth
    full = pairwise_f1(assign, docs.select("doc_id", "entity_id"))
    print(f"th={th} labeledF1={f1:.4f} (p={prec:.4f} r={rec:.4f}) "
          f"clusterF1={full['f1']:.4f} (p={full['precision']:.4f} r={full['recall']:.4f}) "
          f"{time.time()-t0:.0f}s", flush=True)
spark.stop()
print("DONE", flush=True)
