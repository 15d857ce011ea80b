"""Scaling-efficiency harness (north rule: throughput at N vs 4N parallelism).

Runs the flagship ER scoring job on the SAME deterministic input at
local[N] and local[4N] (sandbox stand-in for N vs 4N executors), each in its
own JVM, interleaved over ``trials`` rounds (N, 4N, N, 4N, ... — equal trial
counts per level), and writes BENCH/BASELINE.md + BENCH/scaling.json.

Estimators (r3 verdict asked for both, so the gate doesn't rest on best-of
alone): per level the report carries best-of (max pairs/sec — the
established estimator of the undisturbed wall on this noisy shared host),
trimmed-mean (drop the single slowest trial, mean of the rest — robust to
one stolen window), and the plain mean; the efficiency is reported under all
three. Trials whose wall exceeds 1.5x the level's min are flagged
``steal_suspect`` (one-sided noise: steal only ever ADDS time).

Usage: python scripts/run_scaling.py [n_entities] [N] [trials]
"""

from __future__ import annotations

import hashlib
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
    started = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out = subprocess.run(
        [sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=9000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            rec = json.loads(line[len("RESULT "):])
            # trial start timestamp: lets steal windows be correlated across
            # the interleaved sequence post-hoc
            rec["started_utc"] = started
            return rec
    raise RuntimeError(f"no RESULT line (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def input_cache_path(n_entities: int) -> str:
    """Versioned input cache: the path is keyed by a hash of the generator
    source + seed, so ANY change to synth.py invalidates the cache instead
    of silently benchmarking stale bytes (ADVICE r3)."""
    with open(os.path.join(REPO, "merge_machine_spark", "sources", "synth.py"), "rb") as f:
        gen_hash = hashlib.sha256(f.read() + b"|seed=42").hexdigest()[:12]
    return os.path.join("/tmp", f"scaling_docs_{n_entities}_{gen_hash}.parquet")


def ensure_input(n_entities: int) -> str:
    docs_path = input_cache_path(n_entities)
    success = os.path.join(docs_path, "_SUCCESS")
    if os.path.exists(success):
        return docs_path
    gen = subprocess.run(
        [sys.executable, "-c", GENERATE],
        env=dict(os.environ, REPO=REPO, N_ENTITIES=str(n_entities), DOCS_PATH=docs_path, PYTHONPATH=REPO),
        capture_output=True, text=True, timeout=3600,
    )
    # returncode AND the Spark _SUCCESS marker: isdir alone passes on a
    # partially written dataset (ADVICE r3)
    if gen.returncode != 0 or not os.path.exists(success):
        raise RuntimeError(f"generation failed (rc={gen.returncode}):\n{gen.stdout[-2000:]}\n{gen.stderr[-2000:]}")
    return docs_path


def estimators(trials: list[dict]) -> dict:
    """Per-level summary: best-of, trimmed-mean (drop single slowest),
    plain mean, and steal-suspect flags (wall > 1.5x level min)."""
    walls = [t["t_score_sec"] for t in trials]
    pairs = trials[0]["pairs_scored"]
    lo = min(walls)
    kept = sorted(walls)[:-1] if len(walls) >= 3 else walls
    tmean = sum(kept) / len(kept)
    mean = sum(walls) / len(walls)
    return {
        "walls_sec": walls,
        "best_wall_sec": lo,
        "trimmed_mean_wall_sec": round(tmean, 2),
        "mean_wall_sec": round(mean, 2),
        "best_pairs_per_sec": round(pairs / lo, 1),
        "trimmed_mean_pairs_per_sec": round(pairs / tmean, 1),
        "mean_pairs_per_sec": round(pairs / mean, 1),
        "steal_suspect": [w > 1.5 * lo for w in walls],
    }


def main() -> None:
    n_entities = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n4 = n * 4
    docs_path = ensure_input(n_entities)
    runs: dict[int, list[dict]] = {n: [], n4: []}
    for i in range(trials):
        # interleaved N, 4N, N, 4N ... — equal counts per level, and both
        # levels sample every steal regime the run lives through
        runs[n].append(run(n, n_entities, docs_path))
        _progress(n_entities, n, n4, runs)
        runs[n4].append(run(n4, n_entities, docs_path))
        _progress(n_entities, n, n4, runs)
    write_report(n_entities, n, n4, runs, trials)


def _progress(n_entities: int, n: int, n4: int, runs: dict) -> None:
    """Persist partial results after every trial so a killed run loses
    nothing and progress is observable from outside."""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_partial.json"), "w") as f:
        json.dump({"n_entities": n_entities, "runs": {str(k): v for k, v in runs.items()}}, f, indent=1)


def write_report(n_entities: int, n: int, n4: int, runs: dict, trials: int) -> None:
    est_n, est_4n = estimators(runs[n]), estimators(runs[n4])
    best_n = max(runs[n], key=lambda r: r["pairs_per_sec"])
    best_4n = max(runs[n4], key=lambda r: r["pairs_per_sec"])
    eff_best = (est_4n["best_pairs_per_sec"] / est_n["best_pairs_per_sec"]) / 4
    eff_tmean = (est_4n["trimmed_mean_pairs_per_sec"] / est_n["trimmed_mean_pairs_per_sec"]) / 4
    eff_mean = (est_4n["mean_pairs_per_sec"] / est_n["mean_pairs_per_sec"]) / 4

    # carry forward prior rounds' results (scaling.json "history")
    history = {}
    prev_path = os.path.join(REPO, "BENCH", "scaling.json")
    if os.path.exists(prev_path):
        try:
            with open(prev_path) as f:
                prev = json.load(f)
            history = prev.pop("history", {})
            # tag embeds the prior run's generation stamp: re-running the
            # SAME configuration appends a distinct history entry instead of
            # clobbering the earlier round's raw trials (ADVICE r4)
            stamp = str(prev.get("generated_utc", "?")).replace(" ", "T")
            # the archived entry must carry the PRIOR run's level pair, not
            # the current one (a 2v8 report archived during a 1v4 run was
            # being tagged 1v4 — code-review r5); legacy reports without a
            # levels field fall back to "?"
            prev_levels = prev.get("levels", "?")
            tag = f"prev_{prev.get('n_entities', '?')}ent_{prev_levels}_{stamp}"
            history[tag] = {k: v for k, v in prev.items() if k != "all_runs"}
            history[tag + "_all_runs"] = prev.get("all_runs", {})
        except Exception:
            pass

    report = {
        "n_entities": n_entities,
        "levels": f"{n}v{n4}",
        "trials_per_level": trials,
        f"N(cores={n})": best_n,
        f"4N(cores={n4})": best_4n,
        f"estimators_N(cores={n})": est_n,
        f"estimators_4N(cores={n4})": est_4n,
        "all_runs": runs,
        "speedup_best": round(est_4n["best_pairs_per_sec"] / est_n["best_pairs_per_sec"], 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "scaling_efficiency_trimmed_mean": round(eff_tmean, 3),
        "scaling_efficiency_mean": round(eff_mean, 3),
        # the headline number: best-of, the protocol estimator since r1
        "scaling_efficiency": round(eff_best, 3),
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "history": history,
    }
    print(json.dumps({k: v for k, v in report.items() if k not in ("all_runs", "history")}, indent=1))
    md = f"""# BENCH baseline — flagship ER pipeline

Input: deterministic synthetic interleaved-span `documents` table
(`merge_machine_spark.sources.synth.generate_documents(n_entities={n_entities},
seed=42)`, {best_n["n_docs"]} docs — identical bytes at any parallelism), config
`ResolveConfig(threshold=0.45)`.

North-rule scaling evidence — same job, same input, two parallelism levels
(sandbox stand-in for N vs 4N executors), separate JVMs, {trials} trials per
level, strictly interleaved N,4N,N,4N (this sandbox is a shared-host VM;
interleaving means both levels sample every steal regime the run lives
through). Three estimators per level so the gate does not rest on a single
statistic (r3 verdict):

| parallelism | docs | pairs scored | walls (s, all trials) | best (s) | trimmed mean (s) | mean (s) | best pairs/s |
|---|---|---|---|---|---|---|---|
| N = local[{n}] | {best_n["n_docs"]} | {best_n["pairs_scored"]} | {est_n["walls_sec"]} | {est_n["best_wall_sec"]} | {est_n["trimmed_mean_wall_sec"]} | {est_n["mean_wall_sec"]} | {est_n["best_pairs_per_sec"]} |
| 4N = local[{n4}] | {best_4n["n_docs"]} | {best_4n["pairs_scored"]} | {est_4n["walls_sec"]} | {est_4n["best_wall_sec"]} | {est_4n["trimmed_mean_wall_sec"]} | {est_4n["mean_wall_sec"]} | {est_4n["best_pairs_per_sec"]} |

**Throughput scaling efficiency N -> 4N (target >= 0.8, BASELINE.json
`north_rule`): best-of = {report["scaling_efficiency_best"]}, trimmed-mean
(drop single slowest trial per level) = {report["scaling_efficiency_trimmed_mean"]},
plain mean = {report["scaling_efficiency_mean"]}.** Speedup (best-of)
{report["speedup_best"]}x on 4x cores. Steal-suspect trials (wall > 1.5x level
min): N {est_n["steal_suspect"]}, 4N {est_4n["steal_suspect"]}.

Throughput metric = candidate-pairs-scored/sec through the full scoring
stage (blocking token join + TF-IDF cosine + Jaro-Winkler / token-jaccard /
integer-jaccard features + composite score), the dominant data-plane cost.
Correctness at this config: labeled-pair F1 >= 0.99
(tests/test_pipeline_e2e.py::test_labeled_pair_f1_above_99).

Scale levers that made the stage parallel-bound (see README "Scale design"):
broadcast of the per-doc feature payload (ids-only pair shuffle), TF-IDF
prefilter before Python-side features, bounded-prefix Jaro-Winkler,
document-frequency cap + salted hot-key join.

Host caveat: this sandbox VM showed heavy cross-run variance (same-code
walls swing up to 2.4x — r3 verdict adjudication) and saturation above
~8-16 concurrent threads (pure-JVM probe: 2.3x at 2->8 threads), so
N={n} vs 4N={n4} measures the engine rather than the host ceiling. All raw
trials + per-trial start timestamps in BENCH/scaling.json.

Generated by scripts/run_scaling.py on {time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())}.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # Regenerate only the headline section; everything at and below the
    # protocol-notes marker (measurement protocol, scaling matrix, per-stage
    # decomposition, steal-probe correlation — hand-maintained) is preserved.
    baseline_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "<!-- protocol-notes -->"
    tail = ""
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            prev_md = f.read()
        if marker in prev_md:
            tail = prev_md[prev_md.index(marker):]
    with open(baseline_path, "w") as f:
        f.write(md + ("\n" + tail if tail else ""))
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
