"""Scaling-efficiency harness v2: N vs 4N EXECUTORS via Spark local-cluster.

``local[K]`` emulates cluster scaling with threads in ONE JVM — a shared
heap, one GC, one JIT, one shuffle service. The north rule speaks of N vs 4N
*executors*; ``local-cluster[n, cores, mem]`` launches n REAL executor JVM
processes (each with its own heap/GC sized to its cores) against an
in-process master — the closest sandbox stand-in for spark-submit on a
multi-executor cluster. We hold cores-per-executor fixed (2) and scale the
executor COUNT 1 -> 4, exactly the N -> 4N shape of the rule.

Same deterministic input + interleaved best-of protocol as run_scaling.py.

``ratio`` (4th arg, default 4) picks the level pair: 4 gives the north
rule's N -> 4N; 2 gives N -> 2N — the r4 verdict's next-round #5 asked for
1 vs 2 executors at the amortized 2.16M-doc size, because the 1 -> 4 point
(0.658) is bus-saturated at 8 concurrent Arrow-heavy cores on this host and
1 -> 2 sits in the unsaturated regime.

Usage: python scripts/run_scaling_cluster.py [n_entities] [n_exec] [trials] [ratio]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORES_PER_EXEC = 2
# 12 GiB/executor: the amortized-size input (2.16M docs, ~25M scored pairs)
# needs headroom for the persisted pair_scores at the 1-executor level; the
# 4-executor level then gets the identical per-executor budget (4x12=48 GiB
# on a 128 GiB host). Overridable for smaller probes.
EXEC_MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "12288"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from merge_machine_spark.plans.pipeline import ResolveConfig, resolve
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

REPO = os.environ["REPO"]
n_exec = int(os.environ["N_EXEC"])
cores_per = int(os.environ["CORES_PER_EXEC"])
mem_mb = int(os.environ["EXEC_MEM_MB"])
docs_path = os.environ["DOCS_PATH"]
total_cores = n_exec * cores_per

master = f"local-cluster[{n_exec},{cores_per},{mem_mb}]"
spark = get_spark(
    f"scaling_cluster_{n_exec}x{cores_per}",
    cores=master,
    shuffle_partitions=total_cores * 4,
    extra_conf={
        "spark.executor.memory": f"{mem_mb - 1024}m",
        "spark.executor.cores": str(cores_per),
        # executor JVMs spawn their own python workers: the package must be
        # importable there
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    },
)
docs = spark.read.parquet(docs_path).select("doc_id", "spans").repartition(total_cores * 4).persist()
n_docs = docs.count()

# uncounted warm-up (JIT/codegen/python-worker spin-up) on a slice, same
# co-partition plan shape as the measured pass
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
    "executors": n_exec, "cores_per_executor": cores_per, "total_cores": total_cores,
    "n_docs": n_docs, "pairs_scored": pairs,
    "t_score_sec": round(t_score, 2), "t_cc_sec": round(t_cc, 2),
    "pairs_per_sec": round(pairs / max(t_score, 1e-9), 1),
}))
"""


def run(n_exec: int, docs_path: str) -> dict:
    env = dict(
        os.environ, REPO=REPO, N_EXEC=str(n_exec), CORES_PER_EXEC=str(CORES_PER_EXEC),
        EXEC_MEM_MB=str(EXEC_MEM_MB), DOCS_PATH=docs_path, PYTHONPATH=REPO,
        OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1", MKL_NUM_THREADS="1",
        SPARK_HOME=__import__("pyspark").__path__[0],
    )
    started = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=9000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            # trial start timestamp: steal-probe correlation (scripts/
            # steal_summary.py) needs per-trial windows
            rec["started_utc"] = started
            return rec
    raise RuntimeError(f"no RESULT (n_exec={n_exec}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def ensure_input(n_entities: int) -> str:
    # reuse run_scaling's versioned cache (generator-hash path + rc/_SUCCESS
    # check — ADVICE r3): both harnesses must benchmark the identical bytes
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_scaling import ensure_input as _ensure

    return _ensure(n_entities)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    ratio = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    n_hi = n * ratio
    docs_path = ensure_input(n_entities)
    runs: dict[int, list[dict]] = {n: [], n_hi: []}
    for _ in range(trials):
        runs[n].append(run(n, docs_path))
        runs[n_hi].append(run(n_hi, docs_path))
        print(json.dumps({"partial": {k: v for k, v in runs.items()}}), flush=True)
    best_n = max(runs[n], key=lambda r: r["pairs_per_sec"])
    best_hi = max(runs[n_hi], key=lambda r: r["pairs_per_sec"])
    eff = (best_hi["pairs_per_sec"] / best_n["pairs_per_sec"]) / ratio
    generated = time.strftime("%Y-%m-%d %H:%M", time.gmtime())

    # carry forward prior configurations instead of clobbering them; the
    # tag embeds the prior run's generation stamp so re-running the SAME
    # configuration appends a new history entry rather than silently
    # dropping the old raw trials (ADVICE r4 on run_scaling.py's keying)
    history = {}
    out_path = os.path.join(REPO, "BENCH", "scaling_cluster.json")
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            history = prev.pop("history", {})
            stamp = prev.get("generated_utc", "?").replace(" ", "T")
            tag = f"prev_{prev.get('n_entities', '?')}ent_{prev.get('levels', '1v4')}_{stamp}"
            history[tag] = prev
        except Exception:
            pass

    report = {
        "mode": f"local-cluster[N,{CORES_PER_EXEC},{EXEC_MEM_MB}]",
        "n_entities": n_entities,
        "trials": trials,
        "levels": f"{n}v{n_hi}",
        f"N({n} executors)": best_n,
        f"{ratio}N({n_hi} executors)": best_hi,
        "all_runs": runs,
        "speedup": round(best_hi["pairs_per_sec"] / best_n["pairs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "generated_utc": generated,
        "history": history,
    }
    print(json.dumps({k: v for k, v in report.items() if k not in ("all_runs", "history")}, indent=1))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
