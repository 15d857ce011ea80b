import time

from pyspark.sql import functions as F

from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.textproj import full_text
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

spark = get_spark(cores=8)
docs = generate_documents(spark, 300, seed=42)
proj = docs.select("doc_id", full_text("spans").alias("t")).cache()
proj.count()
for ch in ["special_keyword", "standard", "n_grams", "integers", "phonetic", "french", "french_estab"]:
    t = time.time()
    c = proj.select(F.explode(A.analyze("t", ch)).alias("tok")).count()
    print(ch, c, round(time.time() - t, 1), flush=True)
spark.stop()
print("DONE", flush=True)
