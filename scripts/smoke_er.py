"""End-to-end mini ER run: synth docs -> tokens -> tfidf pairs -> threshold
-> connected components -> pairwise F1 vs ground truth."""
from pyspark.sql import functions as F

from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.textproj import full_text
from merge_machine_spark.operators.blocking import explode_tokens, candidate_pairs
from merge_machine_spark.operators.scoring import tfidf_cosine_pairs, score_pairs
from merge_machine_spark.operators.clustering import (
    connected_components, assignments_with_singletons, pairwise_f1)
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

spark = get_spark(cores=8)
docs = generate_documents(spark, 300, seed=42).cache()
proj = docs.select("doc_id", full_text("spans").alias("full_text")).cache()
n = proj.count()
print("docs:", n)

tok = explode_tokens(proj, "doc_id", A.analyze("full_text", "french_estab"), with_tf=True).cache()
pairs = tfidf_cosine_pairs(tok, max_df=64, n_docs=n).cache()
print("candidate pairs:", pairs.count())
pairs.select(F.min("tfidf_cosine"), F.max("tfidf_cosine"), F.avg("tfidf_cosine")).show()

scored = score_pairs(pairs, proj, proj, "full_text", "full_text",
                     channel="french_estab",
                     features=("jaro_winkler", "token_jaccard"))
scored = scored.withColumn(
    "score", 0.5 * F.col("tfidf_cosine") + 0.25 * F.col("jaro_winkler") + 0.25 * F.col("token_jaccard"))
edges = scored.filter(F.col("score") >= 0.62).select("id_a", "id_b").cache()
print("match edges:", edges.count())

assign = connected_components(edges)
assign = assignments_with_singletons(proj, assign)
truth = docs.select("doc_id", "entity_id")
print(pairwise_f1(assign, truth))
spark.stop()
