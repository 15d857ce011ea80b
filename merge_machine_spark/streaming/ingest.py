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


def near_dup_gate_batch(
    new_docs: DataFrame,
    fp_index: DataFrame,
    min_shared: int = 2,
    k: int = 3,
    w: int = 4,
    max_fp_df: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of the streaming near-dup gate (used via
    foreachBatch): drop incoming docs that near-duplicate the
    already-accepted corpus or an earlier (smaller-id) doc of the same
    batch, using winnowing fingerprints (`functions/fingerprint`).

    ``new_docs``: (doc_id, text). ``fp_index``: (doc_id, fp) of every
    accepted doc so far (empty frame for the first batch). Returns
    ``(kept_ids, kept_fps)`` — the caller appends ``kept_fps`` to the index
    and routes kept docs downstream.

    Policy (conservative, deterministic):
    1. a batch doc sharing >= ``min_shared`` fingerprints with ANY accepted
       doc is dropped;
    2. survivors near-duplicating each other within the batch resolve via
       connected components over the fp-overlap pairs, keeping exactly the
       minimum-id representative per component.
    Like ``incremental_resolve_batch``, the gate never revisits accepted
    docs — a periodic batch re-dedup reconciles (lambda architecture). The
    index side carries fps of accepted docs only, so it grows with the
    UNIQUE corpus, not the stream."""
    from ..functions.fingerprint import fp_near_dup_pairs, winnowing_fingerprints
    from ..operators.clustering import connected_components

    # batch-sized: pin once, feed the three consumers below
    fps_new = winnowing_fingerprints(new_docs, k=k, w=w).localCheckpoint(eager=True)

    vs_idx = (
        fps_new.join(fp_index.select(F.col("doc_id").alias("old_id"), "fp"), "fp")
        .groupBy("doc_id", "old_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_id")
        .distinct()
    )
    survivors = fps_new.join(vs_idx, "doc_id", "left_anti")

    pairs = fp_near_dup_pairs(
        new_docs, min_shared=min_shared, max_fp_df=max_fp_df, fps=survivors
    )
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    )
    dropped_in_batch = comps.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept_fps = survivors.join(dropped_in_batch, "doc_id", "left_anti").select("doc_id", "fp")
    # docs too short to fingerprint have no fps row — they pass the gate
    # (no near-dup evidence either way; exact dedup upstream covers them)
    kept_ids = new_docs.select("doc_id").join(
        vs_idx.unionByName(dropped_in_batch), "doc_id", "left_anti"
    )
    return kept_ids, kept_fps


def run_near_dup_gate(
    stream: DataFrame,
    kept_path: str,
    index_path: str,
    checkpoint_path: str,
    min_shared: int = 2,
    trigger_available_now: bool = True,
):
    """writeStream.foreachBatch wrapper: per micro-batch, gate
    (doc_id, text) docs through ``near_dup_gate_batch`` against the
    parquet fp index at ``index_path``, append kept docs to ``kept_path``
    and their fingerprints to the index. availableNow drains and stops —
    the test/scheduled-load mode, same as ``ingest_to_staging``."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            fp_index = spark.read.parquet(index_path)
        except Exception:
            fp_index = spark.createDataFrame([], "doc_id string, fp long")
        kept_ids, kept_fps = near_dup_gate_batch(batch_df, fp_index, min_shared=min_shared)
        batch_df.join(kept_ids, "doc_id", "left_semi").write.mode("append").parquet(kept_path)
        kept_fps.write.mode("append").parquet(index_path)

    writer = stream.writeStream.foreachBatch(_batch).option("checkpointLocation", checkpoint_path)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
