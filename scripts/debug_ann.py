import math
import random

from pyspark.sql import functions as F

from merge_machine_spark.operators.ann import hyperplane_bucket, lsh_topk, brute_force_topk, recall_at_k
from merge_machine_spark.sources.session import get_spark

spark = get_spark(cores=4)
rng = random.Random(5)
dim = 16
base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(20)]
rows = []
vid = 0
for ci, b in enumerate(base):
    for _ in range(5):
        v = [x + rng.gauss(0, 0.05) for x in b]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((vid, ci, [x / n for x in v]))
        vid += 1
df = spark.createDataFrame(rows, "vec_id bigint, center int, embedding array<double>").cache()
bk = df.select("vec_id", "center", hyperplane_bucket(F.col("embedding"), 6, dim).alias("bucket"))
bk.orderBy("vec_id").show(15)
# how many distinct buckets per center?
bk.groupBy("center").agg(F.countDistinct("bucket").alias("nb"), F.collect_set("bucket").alias("bs")).orderBy("center").show(20, truncate=60)
spark.stop()
