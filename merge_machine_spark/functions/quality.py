"""Document-quality signals beyond simple length/stopword ratios:
within-document repetition statistics (the Gopher/MassiveText-style
repetitious-text filter) and fixed-token-budget chunking for context
windows.

Repetition filtering is a standard step in large-scale training-data
curation (Rae et al., "Scaling Language Models: ... Gopher", arXiv
2112.11446 §A1.1): documents dominated by a single repeated n-gram or by
duplicated n-grams are low-quality (boilerplate, scraping artifacts, spam)
and get dropped before training. Chunking turns variable-length documents
into model-context-sized training rows.

Scale shape:
  * ``repetition_stats``: tokenization and n-gram construction are pure
    array projections in codegen; the counts are two hash aggregates keyed
    (doc_id, ngram) then doc_id — both map-side combinable, partitioned by
    doc_id so AQE coalesces; no doc's state ever exceeds its own n-gram
    multiset. Integer-exact ratios (e6 fixed point) so any ANSI engine
    reproduces them bit-for-bit.
  * ``chunk_documents``: a pure posexplode projection — zero shuffles; a
    100 TB corpus chunks at scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"[^a-z0-9]+"


def _tok_array(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TOKEN_SPLIT),
        lambda t: t != F.lit(""),
    )


def _ngram_array(toks: F.Column, n: int) -> F.Column:
    """Space-joined n-grams of a token array (empty when < n tokens)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document repetition signals, integer-exact:

    - ``n_tokens``, ``uniq_token_frac_e6``: distinct/total tokens.
    - ``top_{top_n}gram_count``, ``top_{top_n}gram_frac_e6``: occurrences of
      the single most frequent ``top_n``-gram over all ``top_n``-gram
      positions (Gopher: "fraction of characters in the most common n-gram";
      token-position form since our corpus is whitespace-tokenized).
    - ``dup_{dup_n}gram_frac_e6``: fraction of ``dup_n``-gram positions whose
      n-gram occurs more than once in the document (Gopher: "fraction of
      characters in duplicated n-grams").

    Docs with fewer than ``n`` tokens report 0 for that n-gram family's
    fractions (no positions). All fractions are ``(x * 1_000_000) div y``
    — reproducible on any ANSI engine, hash-stable for the oracle gate.
    """
    base = docs.select(
        F.col(id_col),
        _tok_array(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).alias("__n_uniq"),
        _ngram_array(F.col("__toks"), top_n).alias("__top_grams"),
        _ngram_array(F.col("__toks"), dup_n).alias("__dup_grams"),
    )

    def gram_agg(col: str, out_count: str, out_total: str, dup_out: str | None = None):
        g = (
            base.select(id_col, F.explode(col).alias("__g"))
            .groupBy(id_col, "__g")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        aggs = [
            F.max("__c").alias(out_count),
            F.sum("__c").alias(out_total),
        ]
        if dup_out is not None:
            aggs.append(
                F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0))).alias(dup_out)
            )
        return g.groupBy(id_col).agg(*aggs)

    top = gram_agg("__top_grams", "__top_count", "__top_total")
    dup = gram_agg("__dup_grams", "__dup_max", "__dup_total", dup_out="__dup_hits")

    e6 = F.lit(1_000_000)
    out = (
        base.select(id_col, "n_tokens", "__n_uniq")
        .join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.expr("(cast(__n_uniq AS bigint) * 1000000) div greatest(n_tokens, 1)").alias(
                "uniq_token_frac_e6"
            ),
            F.coalesce("__top_count", F.lit(0)).alias(f"top_{top_n}gram_count"),
            (F.coalesce("__top_count", F.lit(0)) * e6).cast("long")
            .alias("__tc"),
            F.coalesce("__top_total", F.lit(0)).alias("__tt"),
            (F.coalesce("__dup_hits", F.lit(0)) * e6).cast("long").alias("__dh"),
            F.coalesce("__dup_total", F.lit(0)).alias("__dt"),
        )
        .select(
            id_col,
            "n_tokens",
            "uniq_token_frac_e6",
            f"top_{top_n}gram_count",
            F.expr("__tc div greatest(__tt, 1)").alias(f"top_{top_n}gram_frac_e6"),
            F.expr("__dh div greatest(__dt, 1)").alias(f"dup_{dup_n}gram_frac_e6"),
        )
    )
    return out


def pack_documents(
    docs: DataFrame,
    budget_tokens: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """Concat-then-split example packing: assign every document to a
    training sequence of ~``budget_tokens`` tokens — the standard
    pre-training batching step (short documents share a sequence instead of
    wasting pad tokens).

    Deterministic concat-then-split at document boundaries: docs hash into
    ``n_buckets`` salted-md5 buckets (``sampling.hash_bucket`` — stable
    under re-partitioning and engine migration), are ordered by id within
    their bucket, and sequence ``k`` of a bucket holds the docs whose
    cumulative START offset falls in ``[k*budget, (k+1)*budget)`` — greedy
    fill; a sequence may overflow by the tail of its last doc (downstream
    :func:`chunk_documents` splits oversized members), and the next doc
    opens the next sequence. Empty docs are dropped.

    Returns (id, bucket, seq_idx, offset_in_seq, n_tokens). Scale shape:
    ONE shuffle on bucket; the per-bucket running sum is a window scan, and
    buckets — not documents — are the parallelism unit, so skew is bounded
    by corpus/n_buckets regardless of document sizes; raise ``n_buckets``
    with the corpus (it only changes which docs share a sequence, never
    correctness).
    """
    from .sampling import hash_bucket

    toks = _tok_array(text_col)
    base = docs.select(
        F.col(id_col),
        hash_bucket(id_col, salt, n_buckets=n_buckets).alias("bucket"),
        F.size(toks).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = Window.partitionBy("bucket").orderBy(id_col)
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("__start"),
    ).select(
        id_col,
        "bucket",
        F.expr(f"__start div {int(budget_tokens)}").cast("int").alias("seq_idx"),
        F.expr(f"__start % {int(budget_tokens)}").alias("offset_in_seq"),
        "n_tokens",
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_empty: bool = True,
) -> DataFrame:
    """Split each document into fixed-token-budget training chunks.

    Chunk ``i`` covers token positions ``[i*stride, i*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the last chunk may be short.
    Returns (id, chunk_idx, chunk_n_tokens, chunk_text) — a pure
    posexplode projection, zero shuffles, so chunking runs at scan speed
    on any corpus size. Deterministic: chunk boundaries depend only on the
    row itself.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tok_array(text_col)
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.floor((n - F.lit(overlap) - 1) / F.lit(stride)) + 1
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.slice(toks, (i * stride + 1).cast("int"), chunk_tokens),
    )
    out = (
        docs.select(F.col(id_col), n.alias("__n"), chunks.alias("__chunks"))
        .filter(F.col("__n") > 0 if drop_empty else F.lit(True))
        .select(id_col, F.posexplode("__chunks").alias("chunk_idx", "__c"))
        .select(
            id_col,
            "chunk_idx",
            F.size("__c").alias("chunk_n_tokens"),
            F.concat_ws(" ", F.col("__c")).alias("chunk_text"),
        )
    )
    return out
