"""Independent host-noise probe for benchmark adjudication.

This sandbox is a shared-host VM whose same-code wall clocks swing up to
2.4x (r3 verdict adjudication: noisy-neighbor steal). The scaling gate's
margin therefore needs evidence that is INDEPENDENT of Spark: this probe
runs a fixed, deterministic, single-thread CPU workload (sha256 over a
fixed buffer, constant iteration count) every ``interval`` seconds and logs
``{utc, wall_sec}`` lines to a JSONL timeline.

On a quiet host the probe wall is flat; during a steal window it inflates
by the same factor the benchmark trials do. Correlating the timeline with
the per-trial ``started_utc`` stamps in BENCH/scaling.json lets a reviewer
see which trials ran through disturbed windows — turning the
``steal_suspect`` flag from a heuristic (wall > 1.5x level min) into a
measurement.

The probe costs ~1 thread at a ~7% duty cycle on a 32-cpu host —
negligible load, run alongside the benchmark:

    python scripts/steal_probe.py /tmp/steal_probe.jsonl 30 &
    python scripts/run_scaling.py 720000 1 4
    python scripts/steal_summary.py /tmp/steal_probe.jsonl BENCH/scaling.json
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

BUF = b"\xa5" * 65536
ITERS = 12_000  # ~1.5-2s on a quiet core of this host


def one_probe() -> float:
    t0 = time.perf_counter()
    h = b"seed"
    for _ in range(ITERS):
        h = hashlib.sha256(BUF + h).digest()
    return time.perf_counter() - t0


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steal_probe.jsonl"
    interval = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    with open(out_path, "a") as f:
        while True:
            wall = one_probe()
            f.write(json.dumps({
                "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "wall_sec": round(wall, 3),
            }) + "\n")
            f.flush()
            time.sleep(interval)


if __name__ == "__main__":
    main()
