"""Unit tests for the survivorship merge (clustering.merge_clusters) and
the SimHash near-dup pair generation (banding guarantee + cap)."""

from pyspark.sql import functions as F

from merge_machine_spark.operators.clustering import merge_clusters


def test_merge_clusters_majority_and_ties(spark):
    docs = spark.createDataFrame(
        [
            ("1", 10, "en", "api"),
            ("2", 30, "fr", "web"),   # longest -> canonical
            ("3", 20, "fr", "api"),   # lang fr wins 2:1; source api wins 2:1
            ("9", 5, "de", "api"),    # singleton cluster
        ],
        "doc_id string, n_chars int, lang string, source string",
    )
    assigns = spark.createDataFrame(
        [("1", "1"), ("2", "1"), ("3", "1"), ("9", "9")], "doc_id string, cluster_id string"
    )
    got = {r["cluster_id"]: r for r in merge_clusters(
        docs, assigns, vote_cols=["lang", "source"], prefer_col="n_chars"
    ).collect()}
    c = got["1"]
    assert c["canonical_id"] == "2" and c["best_n_chars"] == 30 and c["n_members"] == 3
    assert c["lang_mode"] == "fr"
    assert c["source_mode"] == "api"  # api 2 vs web 1
    s = got["9"]
    assert s["canonical_id"] == "9" and s["n_members"] == 1
    assert s["lang_mode"] == "de" and s["source_mode"] == "api"


def test_merge_clusters_vote_tie_smallest_value(spark):
    """Equal counts -> lexicographically smallest value, deterministically."""
    docs = spark.createDataFrame(
        [("1", 1, "zz"), ("2", 2, "aa")], "doc_id string, n_chars int, lang string"
    )
    assigns = spark.createDataFrame([("1", "1"), ("2", "1")], "doc_id string, cluster_id string")
    got = merge_clusters(docs, assigns, vote_cols=["lang"], prefer_col="n_chars").collect()[0]
    assert got["lang_mode"] == "aa"


def test_simhash_banding_guarantee(spark, tmp_path, monkeypatch):
    """LSH guarantee: any doc pair with hamming <= 3 over 16 bits shares at
    least one of the 4 x 4-bit bands, so the banded candidate join finds
    EVERY qualifying pair that the all-pairs scan would (no cap hit here)."""
    import __spark_entry__ as E

    sf = str(tmp_path)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # identical -> hamming 0
            (3, "alpha beta gamma delta epsilon eta"),    # near
            (4, "totally different words entirely here"),
        ],
        "doc_id long, text string",
    )
    docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    banded = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in E.q_simhash_near_dup(spark, sf).collect()}
    # brute-force truth over the same signatures
    sig = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", E._simhash16_expr().alias("s")
    )
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    truth = {
        (r["doc_a"], r["doc_b"]): r["h"]
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert banded == truth
    assert banded[(1, 2)] == 0  # identical docs found at hamming 0
