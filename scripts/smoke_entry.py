import sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
from merge_machine_spark.sources.session import get_spark

spark = get_spark(cores=8)
t0 = time.time()
df = m.entry(spark)
rows = df.collect()
print("entry rows:", len(rows), "in", round(time.time() - t0, 1), "s", flush=True)
print("schema:", df.schema.simpleString(), flush=True)
print(rows[:3], flush=True)
spark.stop()
print("DONE", flush=True)
