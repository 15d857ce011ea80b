"""Incremental (Structured Streaming) document ingest.

The reference is strictly batch (SURVEY.md §2.9: no streaming operators
exist — the console labeller loop is interactive, not streaming). Our engine
stays batch for resolution, but at 10^12-doc scale the *ingest* side is
naturally incremental: new documents arrive continuously and must be
normalized + key-derived before the next batch resolve picks them up.

This module provides that front door as a Structured Streaming job:

    readStream(documents) -> dedupe by doc_id (watermarked)
                          -> derive text projection + blocking tokens
                          -> append to the staging table

plus ``incremental_resolve`` (foreachBatch): per micro-batch, block+score
new docs against the existing cluster index — the standard incremental-ER
pattern (new doc joins an existing cluster or starts its own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import analyzers as A
from ..functions.textproj import full_text


def prepare_stream(stream: DataFrame, channel: str = "french_estab", watermark: str = "10 minutes") -> DataFrame:
    """Streaming transform: documents(doc_id, spans[, event_time]) ->
    (doc_id, full_text, tokens). Exactly the batch key-derivation select —
    the DataFrame expressions are identical; only the source is unbounded.
    Late/duplicate handling: watermark + dropDuplicates on doc_id."""
    out = stream
    if "event_time" in stream.columns:
        out = out.withWatermark("event_time", watermark).dropDuplicates(["doc_id"])
    else:
        out = out.dropDuplicates(["doc_id"])
    return out.select(
        "doc_id",
        full_text("spans").alias("full_text"),
        A.analyze(full_text("spans"), channel).alias("tokens"),
    )


def ingest_to_staging(
    stream: DataFrame,
    staging_path: str,
    checkpoint_path: str,
    channel: str = "french_estab",
    trigger_available_now: bool = True,
):
    """writeStream append to the parquet staging table (Iceberg `.toTable`
    on a real catalog). ``availableNow`` drains the backlog and stops —
    the mode used for tests and scheduled incremental loads."""
    prepared = prepare_stream(stream, channel=channel)
    writer = (
        prepared.writeStream.format("parquet")
        .option("path", staging_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_resolve_batch(new_docs: DataFrame, cluster_index: DataFrame, threshold: float = 0.45) -> DataFrame:
    """One micro-batch of incremental resolution (used via foreachBatch):
    score new docs against the existing cluster representatives' token
    table; assign to the best cluster above threshold, else self-cluster.

    ``cluster_index``: (doc_id, cluster_id, tokens) for current members.
    Returns (doc_id, cluster_id) for the new docs. Correctness note: unlike
    the batch resolve, incremental assignment cannot merge two existing
    clusters — a periodic batch re-resolve reconciles (lambda architecture).
    """
    from ..operators.blocking import explode_tokens
    from ..operators.scoring import tfidf_cosine_pairs

    new_tok = explode_tokens(new_docs, "doc_id", F.col("tokens"), with_tf=True)
    idx_tok = explode_tokens(cluster_index, "doc_id", F.col("tokens"), with_tf=True)
    n_docs = cluster_index.count() + new_docs.count()
    scores = tfidf_cosine_pairs(new_tok, idx_tok, max_df=256, n_docs=max(n_docs, 1))
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("tfidf_cosine"), F.asc("id_b"))
    best = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    assign = best.filter(F.col("tfidf_cosine") >= threshold).join(
        cluster_index.select(F.col("doc_id").alias("id_b"), "cluster_id"), "id_b"
    ).select(F.col("id_a").alias("doc_id"), "cluster_id")
    selfc = new_docs.select("doc_id").join(assign.select("doc_id"), "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return assign.unionByName(selfc)
