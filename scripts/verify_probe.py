"""Probe run for /verify: off-happy-path inputs through the public package API."""
from pyspark.sql import functions as F

from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.textproj import full_text
from merge_machine_spark.operators.blocking import explode_tokens, candidate_pairs
from merge_machine_spark.operators.clustering import connected_components, assignments_with_singletons, pairwise_f1
from merge_machine_spark.operators.scoring import tfidf_cosine_pairs
from merge_machine_spark.sources.session import get_spark

spark = get_spark(cores=4)

# probe 1: empty edge set -> connected_components converges, empty result
empty_edges = spark.createDataFrame([], "id_a string, id_b string")
cc = connected_components(empty_edges)
print("P1 empty edges -> assignments:", cc.count(), flush=True)

# probe 2: docs with only media spans / empty spans -> full_text '' and no tokens
docs = spark.createDataFrame(
    [("d1", [{"kind": "media", "text": None, "media_ref": "m://x", "offset": 0}]),
     ("d2", [])],
    "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
proj = docs.select("doc_id", full_text("spans").alias("t"))
proj.show()
tok = explode_tokens(proj, "doc_id", A.analyze("t", "french_estab"), with_tf=True)
print("P2 media-only docs -> tokens:", tok.count(), flush=True)

# probe 3: tfidf pairs on token table with zero rows
pairs = tfidf_cosine_pairs(tok, max_df=16, n_docs=2)
print("P3 empty token table -> pairs:", pairs.count(), flush=True)

# probe 4: self-loop / duplicate / reversed edges in CC
edges = spark.createDataFrame(
    [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("x", "y")], "id_a string, id_b string")
cc2 = connected_components(edges)
cc2.orderBy("doc_id").show()

# probe 5: pairwise_f1 with perfect assignment
truth = spark.createDataFrame([("a", "e1"), ("b", "e1"), ("c", "e1"), ("x", "e2"), ("y", "e2")],
                              "doc_id string, entity_id string")
full = assignments_with_singletons(truth, cc2)
print("P5 f1:", pairwise_f1(full, truth), flush=True)
spark.stop()
print("PROBES DONE", flush=True)
