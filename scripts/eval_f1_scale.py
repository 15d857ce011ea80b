#!/usr/bin/env python3
"""Reproduce the F1-at-scale measurements in BENCH/BASELINE.md.

Learns thresholds from a fixed 800-pair label budget, resolves, and
reports end-to-end labeled-pair F1 (same-cluster prediction) at a chosen
entity count, for three configurations:

    plain      single learned threshold + plain CC  (the historical path)
    two-tier   learn_resolve_thresholds + core_attach_clusters
    two-tier+lsh  two-tier with the MinHash-LSH candidate channel

Usage:
    PYTHONPATH=. python scripts/eval_f1_scale.py 2000 two-tier
    PYTHONPATH=. python scripts/eval_f1_scale.py 5000 two-tier+lsh

Documented results (seed 42, deterministic):
    2000 entities (~10k docs):  plain 0.9815 | two-tier 0.9950
    5000 entities (~25k docs):  two-tier+lsh 1.0000
"""
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from merge_machine_spark.plans.calibration import (
    learn_resolve_threshold, learn_resolve_thresholds)
from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents, generate_labels

n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
mode = sys.argv[2] if len(sys.argv) > 2 else "two-tier"
assert mode in ("plain", "two-tier", "two-tier+lsh"), mode

spark = get_spark(cores=8)
docs = generate_documents(spark, n_entities, seed=42).cache()
labels = generate_labels(docs, n_pos=400, n_neg=400).cache()
d = docs.select("doc_id", "spans")

cfg = ResolveConfig()
if mode == "plain":
    th, metrics = learn_resolve_threshold(spark, d, labels)
    cfg.threshold = float(th)
else:
    attach, core, metrics = learn_resolve_thresholds(spark, d, labels)
    cfg.threshold = float(attach)
    cfg.core_threshold = float(core)
    cfg.use_lsh = mode.endswith("+lsh")
print(json.dumps({"mode": mode, "n_entities": n_entities, "thresholds": {
    "attach": cfg.threshold, "core": cfg.core_threshold}, **metrics}), flush=True)

t0 = time.time()
res = resolve(spark, d, cfg)
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
print(json.dumps({
    "labeled_pair_f1": round(f1, 4), "precision": round(prec, 4), "recall": round(rec, 4),
    "tp": agg["tp"], "fp": agg["fp"], "fn": agg["fn"],
    "wall_sec": round(time.time() - t0, 1),
}), flush=True)
