"""Correlate the steal-probe timeline with benchmark trial windows.

Reads the JSONL written by scripts/steal_probe.py and the per-trial
``started_utc`` stamps in BENCH/scaling.json, assigns every probe sample to
the trial window it fell in (trial windows tile the run: a trial's window
ends where the next trial begins, because run_scaling.py executes trials
strictly sequentially), and reports per-trial probe statistics:

- ``probe_median`` / ``probe_max`` (s) over the window,
- ``inflation`` = probe_median / quiet_floor, where quiet_floor is the 5th
  percentile of ALL probe samples in the file (the undisturbed host speed).

A trial whose inflation is ~1.0 ran on a quiet host; a trial whose
benchmark wall is high AND whose probe inflation is high was stolen from —
independent, Spark-free corroboration of the ``steal_suspect`` heuristic.

Usage: python scripts/steal_summary.py /tmp/steal_probe_r4.jsonl BENCH/scaling.json
Writes BENCH/steal_correlation.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from datetime import datetime, timezone


def parse_utc(s: str) -> float:
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ").replace(tzinfo=timezone.utc).timestamp()


def pctile(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(q * (len(xs) - 1))))
    return xs[i]


def main() -> None:
    probe_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steal_probe_r4.jsonl"
    scaling_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/scaling.json"

    samples = []
    with open(probe_path) as f:
        for line in f:
            rec = json.loads(line)
            samples.append((parse_utc(rec["utc"]), rec["wall_sec"]))
    samples.sort()
    if not samples:
        sys.exit(f"steal_summary: no probe samples in {probe_path} — was the probe running?")
    walls = [w for _, w in samples]
    quiet_floor = pctile(walls, 0.05)

    with open(scaling_path) as f:
        scaling = json.load(f)
    trials = []
    for level, runs in scaling.get("all_runs", {}).items():
        for i, r in enumerate(runs):
            if "started_utc" in r:
                trials.append({
                    "level_cores": int(level), "trial": i,
                    "start": parse_utc(r["started_utc"]),
                    "t_score_sec": r["t_score_sec"],
                    "pairs_per_sec": r["pairs_per_sec"],
                })
    trials.sort(key=lambda t: t["start"])

    out = []
    for j, t in enumerate(trials):
        end = trials[j + 1]["start"] if j + 1 < len(trials) else samples[-1][0] + 1
        win = [w for ts, w in samples if t["start"] <= ts < end]
        med = pctile(win, 0.5) if win else None
        out.append({
            "level_cores": t["level_cores"], "trial": t["trial"],
            "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(t["start"])),
            "t_score_sec": t["t_score_sec"], "pairs_per_sec": t["pairs_per_sec"],
            "probe_samples": len(win),
            # "is not None", not truthiness: a (theoretical) 0.0 median must
            # not be reported as missing (ADVICE r4)
            "probe_median_sec": round(med, 3) if med is not None else None,
            "probe_max_sec": round(max(win), 3) if win else None,
            "probe_inflation": round(med / quiet_floor, 2) if med is not None else None,
        })

    report = {
        "probe_file": os.path.basename(probe_path),
        "n_probe_samples": len(samples),
        "quiet_floor_sec_p05": round(quiet_floor, 3),
        "probe_p50_sec": round(pctile(walls, 0.5), 3),
        "probe_p95_sec": round(pctile(walls, 0.95), 3),
        "probe_max_sec": round(max(walls), 3),
        "trials": out,
    }
    print(json.dumps(report, indent=1))
    os.makedirs("BENCH", exist_ok=True)
    with open(os.path.join("BENCH", "steal_correlation.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
