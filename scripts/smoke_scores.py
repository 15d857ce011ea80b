"""Score-distribution check: how separable are true vs false candidate pairs?"""
from pyspark.sql import functions as F

from merge_machine_spark.functions import analyzers as A
from merge_machine_spark.functions.textproj import full_text
from merge_machine_spark.operators.blocking import explode_tokens
from merge_machine_spark.operators.scoring import tfidf_cosine_pairs, score_pairs
from merge_machine_spark.sources.session import get_spark
from merge_machine_spark.sources.synth import generate_documents

spark = get_spark(cores=8)
docs = generate_documents(spark, 300, seed=42).cache()
proj = docs.select("doc_id", full_text("spans").alias("full_text")).cache()
n = proj.count()

truth = docs.select("doc_id", "entity_id")
tok = explode_tokens(proj, "doc_id", A.analyze("full_text", "french_estab"), with_tf=True)
pairs = tfidf_cosine_pairs(tok, max_df=64, n_docs=n)
scored = score_pairs(pairs, proj, proj, "full_text", "full_text",
                     channel="french_estab", features=("jaro_winkler", "token_jaccard")).cache()

ta = truth.select(F.col("doc_id").alias("id_a"), F.col("entity_id").alias("ea"))
tb = truth.select(F.col("doc_id").alias("id_b"), F.col("entity_id").alias("eb"))
lab = scored.join(ta, "id_a").join(tb, "id_b").withColumn("is_true", F.col("ea") == F.col("eb"))
for feat in ["tfidf_cosine", "jaro_winkler", "token_jaccard"]:
    lab.groupBy("is_true").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr(f"percentile({feat}, 0.05)"), 3).alias("p05"),
        F.round(F.expr(f"percentile({feat}, 0.5)"), 3).alias("p50"),
        F.round(F.expr(f"percentile({feat}, 0.95)"), 3).alias("p95"),
    ).orderBy("is_true").show()
# combined score sweep
comb = lab.withColumn("score", 0.45*F.col("tfidf_cosine") + 0.3*F.col("jaro_winkler") + 0.25*F.col("token_jaccard"))
total_true_pairs = 1305
for th in [0.3, 0.35, 0.4, 0.45, 0.5, 0.55, 0.6]:
    r = comb.filter(F.col("score") >= th).groupBy("is_true").count().collect()
    d = {row["is_true"]: row["count"] for row in r}
    tp, fp = d.get(True, 0), d.get(False, 0)
    prec = tp / max(tp + fp, 1)
    rec = tp / total_true_pairs
    print(f"th={th} tp={tp} fp={fp} precision={prec:.3f} block_recall={rec:.3f}", flush=True)
spark.stop()
