"""Config grid for the tfidf blocking-join stage at a fixed core count."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.textproj import project_documents
from merge_machine_spark.operators.blocking import explode_tokens
from merge_machine_spark.operators.scoring import tfidf_cosine_pairs
from merge_machine_spark.plans.pipeline import ResolveConfig
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

cores = int(os.environ["CORES"])
variant = os.environ["VARIANT"]
extra = {}
if variant == "aqe_off":
    extra["spark.sql.adaptive.enabled"] = "false"
if variant == "shuffle128":
    pass  # handled below
sp = 128 if variant == "shuffle128" else None
spark = get_spark(f"grid_{variant}", cores=cores, shuffle_partitions=sp, extra_conf=extra)
cfg = ResolveConfig()
docs = generate_documents(spark, 20000, seed=42).select("doc_id", "spans")
proj = project_documents(docs, cfg.projections).persist()
n = proj.count()
tok = explode_tokens(proj, "doc_id", A.analyze(cfg.block_proj, cfg.block_channel), with_tf=True)
if variant != "no_persist":
    tok = tok.persist(); tok.count()
t0 = time.time()
pairs = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n)
npairs = pairs.count()
dt = time.time() - t0
print(f"RESULT {variant} cores={cores} pairs={npairs} t={dt:.2f}")
spark.stop()
"""
for variant in ["base", "aqe_off", "shuffle128", "no_persist"]:
    for cores in [32, 8]:
        env = dict(os.environ, REPO=REPO, CORES=str(cores), VARIANT=variant, PYTHONPATH=REPO)
        out = subprocess.run([sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=900)
        ok = False
        for line in out.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                ok = True
                break
        if not ok:
            print("NO RESULT", variant, cores, out.stderr[-500:], flush=True)
