"""Per-stage scaling profile: which stage fails to scale N -> 4N cores?

Usage: python scripts/profile_stages.py [n_entities] [N] — runs N and 4N
interleaved twice with the same honest-emulation env as run_scaling.py."""
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
from merge_machine_spark.plans.pipeline import ResolveConfig, _pair_scores
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

cores = int(os.environ["CORES"]); n_entities = int(os.environ["N_ENTITIES"])
spark = get_spark(f"prof_{cores}", cores=cores)
cfg = ResolveConfig(threshold=0.45)
docs = generate_documents(spark, n_entities, seed=42).select("doc_id", "spans")
proj = project_documents(docs, cfg.projections).persist()
n = proj.count()

t = {}
t0 = time.time()
tok = explode_tokens(proj, "doc_id", A.analyze(cfg.block_proj, cfg.block_channel), with_tf=True).persist()
ntok = tok.count()
t["tokenize"] = round(time.time() - t0, 2)

t0 = time.time()
pairs = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n).persist()
npairs = pairs.count()
t["tfidf_block_join"] = round(time.time() - t0, 2)

t0 = time.time()
pre = pairs.filter(F.col("tfidf_cosine") >= cfg.prefilter_tfidf).persist()
npre = pre.count()
t["prefilter"] = round(time.time() - t0, 2)

# feature scoring only (reuse _pair_scores internals via full call minus blocking):
t0 = time.time()
from merge_machine_spark.functions import similarity as S
txt = F.col(cfg.block_proj)
side = proj.select(F.col("doc_id"),
                   F.substring(txt, 1, cfg.jw_prefix).alias("_txt"),
                   F.array_distinct(A.analyze(txt, cfg.block_channel)).alias("_tok"),
                   F.array_distinct(A.analyze(txt, "integers")).alias("_toki"))
a = side.select([F.col(c).alias(f"{c}_a" if c != "doc_id" else "id_a") for c in side.columns])
b = side.select([F.col(c).alias(f"{c}_b" if c != "doc_id" else "id_b") for c in side.columns])
scored = pre.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
scored = scored.withColumn("jaro_winkler", S.jaro_winkler(F.col("_txt_a"), F.col("_txt_b")))
scored = scored.withColumn("token_jaccard", S.token_jaccard(F.col("_tok_a"), F.col("_tok_b")))
scored = scored.withColumn("int_jaccard", S.token_jaccard(F.col("_toki_a"), F.col("_toki_b")))
scored = scored.select("id_a", "id_b",
    (0.4*F.col("tfidf_cosine")+0.2*F.col("jaro_winkler")+0.2*F.col("token_jaccard")+0.2*F.col("int_jaccard")).alias("score"))
nsc = scored.write.mode("overwrite").format("noop").save()
t["feature_scoring"] = round(time.time() - t0, 2)

print("RESULT " + json.dumps({"cores": cores, "n_docs": n, "n_tok": ntok, "n_pairs": npairs, "n_pre": npre, "stages": t}))
spark.stop()
"""

N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
for cores in (N, N * 4, N, N * 4):
    env = dict(os.environ, REPO=REPO, CORES=str(cores), N_ENTITIES=sys.argv[1] if len(sys.argv) > 1 else "20000", PYTHONPATH=REPO,
               JAVA_TOOL_OPTIONS=f"-XX:ActiveProcessorCount={cores} -XX:+UseG1GC",
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1")
    out = subprocess.run([sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=3000)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            break
    else:
        print("NO RESULT", out.stdout[-500:], out.stderr[-1500:])
