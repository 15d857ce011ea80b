"""Scaling-efficiency harness (north rule: throughput at N vs 4N parallelism).

Runs the flagship ER scoring job on the SAME deterministic input at
local[N] and local[4N] (sandbox stand-in for N vs 4N executors), each in its
own JVM, interleaved over ``trials`` rounds (best-of, to suppress noisy-
neighbor host steal — this sandbox is a shared-host VM), and writes
BENCH/BASELINE.md + BENCH/scaling.json.

Usage: python scripts/run_scaling.py [n_entities] [N] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

cores = int(os.environ["CORES"])
n_entities = int(os.environ["N_ENTITIES"])
docs_path = os.environ.get("DOCS_PATH", "")
# 4 partitions per core: at 1 partition/core the wave has no slack and one
# straggler task idles the rest of the pool (measured ~35% utilization on
# the analyzer stage); finer tasks load-balance the same way a real
# multi-executor cluster would.
spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores * 4)
if docs_path:
    # input pre-generated ONCE by the parent (deterministic seed=42 synth,
    # identical bytes for every parallelism level); regenerating per
    # subprocess would add many minutes of untimed Python synthesis at the
    # low-core level for nothing
    docs = spark.read.parquet(docs_path).select("doc_id", "spans").repartition(cores * 4).persist()
else:
    docs = (
        generate_documents(spark, n_entities, seed=42)
        .select("doc_id", "spans").repartition(cores * 4).persist()
    )
n_docs = docs.count()

# Warm-up pass (uncounted): a fresh local JVM pays ~20-30s of JIT/codegen/
# python-worker spin-up that a long-lived executor never re-pays; measuring
# cold would charge that fixed cost against the scaling ratio. Runs on a
# ~60k-doc slice with broadcast_sides=False so it compiles the SAME
# co-partition plan shape the full-size measured pass uses, at a fraction
# of the wall. Caches are cleared so the measured pass recomputes everything.
warm_docs = docs.limit(60_000).persist()
warm_docs.count()
_warm = resolve(spark, warm_docs, ResolveConfig(threshold=0.45, broadcast_sides=False))
_warm["pair_scores"].count()
warm_docs.unpersist()
spark.catalog.clearCache()
docs.persist()
docs.count()

t0 = time.time()
res = resolve(spark, docs, ResolveConfig(threshold=0.45))
scores = res["pair_scores"].persist()
pairs = scores.count()
t_score = time.time() - t0

t1 = time.time()
n_assign = res["cluster_assignments"].count()
t_cc = time.time() - t1
spark.stop()
print("RESULT " + json.dumps({
    "cores": cores, "n_docs": n_docs, "pairs_scored": pairs,
    "t_score_sec": round(t_score, 2), "t_cc_sec": round(t_cc, 2),
    "pairs_per_sec": round(pairs / max(t_score, 1e-9), 1),
}))
"""


GENERATE = r"""
import os, sys
sys.path.insert(0, os.environ["REPO"])
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

spark = get_spark("scaling_gen", cores=16, shuffle_partitions=64)
docs = generate_documents(spark, int(os.environ["N_ENTITIES"]), seed=42, partitions=64)
docs.select("doc_id", "spans").write.mode("overwrite").parquet(os.environ["DOCS_PATH"])
spark.stop()
"""


def run(cores: int, n_entities: int, docs_path: str = "") -> dict:
    env = dict(
        os.environ, REPO=REPO, CORES=str(cores), N_ENTITIES=str(n_entities),
        PYTHONPATH=REPO, DOCS_PATH=docs_path,
        # Honest N-core emulation. Without this the "N-core" JVM sizes its
        # GC/JIT/netty pools for all 32 HOST cpus — the small configuration
        # silently gets 32-thread JVM services (free parallelism a real
        # 2-core cgroup-limited executor never has), which deflates the
        # measured N->4N ratio. ActiveProcessorCount is exactly what a
        # container runtime would enforce.
        # +UseG1GC pins the SAME collector at every level (JVM ergonomics
        # would pick SerialGC at ActiveProcessorCount=1, crippling the small
        # leg and flattering the ratio — the comparison must be symmetric).
        JAVA_TOOL_OPTIONS=f"-XX:ActiveProcessorCount={cores} -XX:+UseG1GC",
        # BLAS/OpenMP pools inside pandas UDF workers must not steal host
        # cores either (DuckDB is already pinned to threads=1 in-code).
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1",
    )
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=9000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n4 = n * 4
    # pre-generate the input once (16 cores: generation is untimed setup and
    # the host saturates beyond ~16 threads) — every run reads the same bytes
    docs_path = os.path.join("/tmp", f"scaling_docs_{n_entities}.parquet")
    if not os.path.isdir(docs_path):
        gen = subprocess.run(
            [sys.executable, "-c", GENERATE],
            env=dict(os.environ, REPO=REPO, N_ENTITIES=str(n_entities), DOCS_PATH=docs_path, PYTHONPATH=REPO),
            capture_output=True, text=True, timeout=3600,
        )
        if not os.path.isdir(docs_path):
            raise RuntimeError(f"generation failed:\n{gen.stdout[-2000:]}\n{gen.stderr[-2000:]}")
    runs: dict[int, list[dict]] = {n: [], n4: []}
    for _ in range(trials):
        runs[n].append(run(n, n_entities, docs_path))
        runs[n4].append(run(n4, n_entities, docs_path))
    best_n = max(runs[n], key=lambda r: r["pairs_per_sec"])
    best_4n = max(runs[n4], key=lambda r: r["pairs_per_sec"])
    eff = (best_4n["pairs_per_sec"] / best_n["pairs_per_sec"]) / 4
    report = {
        "n_entities": n_entities,
        "trials": trials,
        f"N(cores={n})": best_n,
        f"4N(cores={n4})": best_4n,
        "all_runs": runs,
        "speedup": round(best_4n["pairs_per_sec"] / best_n["pairs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps({k: v for k, v in report.items() if k != "all_runs"}, indent=1))
    md = f"""# BENCH baseline — flagship ER pipeline

Input: deterministic synthetic interleaved-span `documents` table
(`merge_machine_spark.sources.synth.generate_documents(n_entities={n_entities},
seed=42)`, {best_n["n_docs"]} docs — identical bytes at any parallelism), config
`ResolveConfig(threshold=0.45)`.

North-rule scaling evidence — same job, same input, two parallelism levels
(sandbox stand-in for N vs 4N executors), separate JVMs, best of {trials}
interleaved trials (this sandbox is a shared-host VM; interleaving + best-of
suppresses noisy-neighbor steal):

| parallelism | docs | candidate pairs scored | scoring wall (s) | pairs/sec | CC wall (s) |
|---|---|---|---|---|---|
| N = local[{n}] | {best_n["n_docs"]} | {best_n["pairs_scored"]} | {best_n["t_score_sec"]} | {best_n["pairs_per_sec"]} | {best_n["t_cc_sec"]} |
| 4N = local[{n4}] | {best_4n["n_docs"]} | {best_4n["pairs_scored"]} | {best_4n["t_score_sec"]} | {best_4n["pairs_per_sec"]} | {best_4n["t_cc_sec"]} |

**Throughput scaling efficiency N -> 4N = {report["scaling_efficiency"]}**
(target >= 0.8, BASELINE.json `north_rule`). Speedup {report["speedup"]}x on 4x cores.

Throughput metric = candidate-pairs-scored/sec through the full scoring
stage (blocking token join + TF-IDF cosine + Jaro-Winkler / token-jaccard /
integer-jaccard features + composite score), the dominant data-plane cost.
Correctness at this config: labeled-pair F1 >= 0.99
(tests/test_pipeline_e2e.py::test_labeled_pair_f1_above_99).

Scale levers that made the stage parallel-bound (see README "Scale design"):
broadcast of the per-doc feature payload (ids-only pair shuffle), TF-IDF
prefilter before Python-side features, bounded-prefix Jaro-Winkler,
document-frequency cap + salted hot-key join.

Host caveat: this sandbox VM showed heavy cross-run variance and saturation
above ~8-16 concurrent threads (pure-JVM probe: 2.3x at 4x threads;
pure-Python probe: 3.1x), so N={n} vs 4N={n4} measures the engine rather
than the host ceiling. All raw trials in BENCH/scaling.json.

Generated by scripts/run_scaling.py on {time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
