"""Pure-JVM Spark scaling probe: does a CPU-bound JVM-only job scale 8->32?"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import functions as F
from merge_machine_spark.sources.session import get_spark
cores = int(os.environ["CORES"])
spark = get_spark(f"jvmprobe_{cores}", cores=cores)
# warm up
spark.range(0, 1000, 1, int(cores)).select(F.sum("id")).collect()
t0 = time.time()
n = 2_000_000_000
df = spark.range(0, n, 1, int(cores) * 4)
out = df.select(F.sum(F.xxhash64(F.concat(F.col("id").cast("string"), F.lit("x")), F.pmod(F.col("id"), F.lit(7))).cast("decimal(38,0)")).alias("h")).collect()
dt = time.time() - t0
print(f"RESULT {cores} {dt:.2f}")
spark.stop()
"""
for cores in (8, 32, 8, 32):
    env = dict(os.environ, REPO=REPO, CORES=str(cores), PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", WORKER], env=env, capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            print(line)
            break
    else:
        print("NO RESULT", out.stderr[-800:])
