from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents, generate_labels
from merge_machine_spark.functions.textproj import full_text, span_fingerprint
from pyspark.sql import functions as F

spark = get_spark(cores=8)
docs = generate_documents(spark, 50, seed=42)
docs.cache()
print("docs:", docs.count())
docs.select("doc_id", "entity_id", full_text("spans").alias("t")).show(8, truncate=80)
d2 = generate_documents(spark, 50, seed=42, partitions=3)
h1 = docs.select(F.sum(span_fingerprint("spans").cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
h2 = d2.select(F.sum(span_fingerprint("spans").cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
print("fingerprint equal:", h1 == h2, h1)
labels = generate_labels(docs)
labels.groupBy("label").count().show()
spark.stop()
