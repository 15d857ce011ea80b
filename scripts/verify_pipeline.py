"""Verify probes for pipeline resume + linkage mode + calibration."""
import shutil
import tempfile
import time

import numpy as np
from pyspark.sql import functions as F

from merge_machine_spark.plans.calibration import (
    Template, auto_label, calibrate_cascade, compute_metrics, enumerate_templates, export_params, prune_dominated)
from merge_machine_spark.operators.scoring import Clause
from merge_machine_spark.plans.pipeline import ResolveConfig, link, resolve
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

spark = get_spark(cores=8)
docs = generate_documents(spark, 80, seed=7).cache()
ckdir = tempfile.mkdtemp(prefix="ck_")

# P1: resume — run resolve twice with the same checkpoint dir; second run must
# reuse stages (fast) and produce identical cluster table.
t0 = time.time()
r1 = resolve(spark, docs.select("doc_id", "spans"), ResolveConfig(), checkpoint_dir=ckdir, run_id="r")
c1 = sorted((row["doc_id"], row["cluster_id"]) for row in r1["cluster_assignments"].collect())
t1 = time.time() - t0
t0 = time.time()
r2 = resolve(spark, docs.select("doc_id", "spans"), ResolveConfig(), checkpoint_dir=ckdir, run_id="r")
c2 = sorted((row["doc_id"], row["cluster_id"]) for row in r2["cluster_assignments"].collect())
t2 = time.time() - t0
print(f"P1 resume: identical={c1 == c2} first={t1:.0f}s second={t2:.0f}s", flush=True)

# P2: partial resume — delete the last stage manifest, rerun, still identical.
import os
os.remove(f"{ckdir}/r/cluster_assignments/_STAGE_MANIFEST.json")
r3 = resolve(spark, docs.select("doc_id", "spans"), ResolveConfig(), checkpoint_dir=ckdir, run_id="r")
c3 = sorted((row["doc_id"], row["cluster_id"]) for row in r3["cluster_assignments"].collect())
print("P2 partial resume identical:", c1 == c3, flush=True)
shutil.rmtree(ckdir)

# P3: linkage mode — source = dirty variants, ref = clean variant 0 per entity
from merge_machine_spark.functions.textproj import full_text
flat = docs.select("doc_id", full_text("spans").alias("full_text"), "entity_id")
ref = flat.filter(F.col("doc_id").endswith("_00")).cache()
src = flat.filter(~F.col("doc_id").endswith("_00")).cache()
out = link(
    spark, src.drop("entity_id"), ref.drop("entity_id"),
    tiers=[{"proj_a": "full_text", "proj_b": "full_text", "channel": "french_estab",
            "weights": {"tfidf_cosine": 0.5, "jaro_winkler": 0.25, "token_jaccard": 0.25},
            "threshold": 0.45, "max_df": 64}],
).cache()
n_src = src.count()
n_out = out.count()
truth_pairs = src.select(F.col("doc_id"), F.col("entity_id").alias("se")).join(
    ref.select(F.col("doc_id").alias("__ID_REF"), F.col("entity_id").alias("re")), "__ID_REF", "left") \
    if False else None
j = out.join(src.select("doc_id", F.col("entity_id").alias("se")), "doc_id") \
       .join(ref.select(F.col("doc_id").alias("rid"), F.col("entity_id").alias("re")),
             F.col("__ID_REF") == F.col("rid"), "left")
acc = j.filter(F.col("__IS_MATCH")).withColumn("ok", F.col("se") == F.col("re")) \
       .agg(F.avg(F.col("ok").cast("double")).alias("acc"), F.count(F.lit(1)).alias("n")).collect()[0]
print(f"P3 link: rows {n_out}=={n_src}: {n_out == n_src}; matched={acc['n']} link_acc={acc['acc']:.4f}", flush=True)
print("P3 cols:", [c for c in out.columns if c.startswith("__")][:8], flush=True)

# P4: compute_metrics on a hand vector — threshold must maximize custom score
sc = np.array([0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2])
fim = np.array([True, True, True, True, False, True, False, False])
th, p, r, s = compute_metrics(sc, fim)
print(f"P4 metrics: thresh={th} p={p:.3f} r={r:.3f} s={s:.3f}", flush=True)
th2, p2, r2, s2 = compute_metrics(sc, np.zeros(8, dtype=bool))
print(f"P4 no-matches: thresh={th2} (expect 1000.0) p={p2}", flush=True)

# P5: template enumeration + pruning shape
ts = enumerate_templates([("a", "x"), ("b", "y")], ["french_estab", "n_grams", "integers"], max_levels=2)
pr = prune_dominated(ts)
print(f"P5 templates: {len(ts)} -> pruned {len(pr)}", flush=True)

# P6: auto_label cardinality check fires on dup keys
dup_ref = spark.createDataFrame([("r1", "K1"), ("r2", "K1")], "doc_id string, k string")
src2 = spark.createDataFrame([("s1", "K1")], "doc_id string, k string")
try:
    auto_label(src2, dup_ref, "k", "k").count()
    print("P6 auto_label dup: NO ERROR (bad)", flush=True)
except ValueError as e:
    print("P6 auto_label dup raises:", str(e)[:60], flush=True)

spark.stop()
print("DONE", flush=True)
