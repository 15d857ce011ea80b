"""Corpus-trained n-gram language-model quality scoring.

The canonical web-pipeline quality filter (CCNet, Wenzek et al. 2020;
reused by LLaMA/RedPajama data work) scores every document with a small
n-gram LM and drops the worst tail. This module trains a bigram LM ON THE
CORPUS ITSELF (two map-side-combinable aggregate passes) and scores each
document with add-one-smoothed bigram probabilities.

Exactness: the contract-oracled score is integer-e6 — per bigram,
``p_e6 = (c12 + 1) * 1_000_000 div (c1 + V)`` — so any ANSI engine
reproduces it bit-for-bit (no cross-engine libm-log drift). The float
``avg_logp`` column (natural-log mean, what a production filter would
threshold) is also emitted for library users; rankings agree.

Definitions:
  * bigrams are within-document adjacent token pairs;
  * ``c12`` = corpus count of bigram (w1, w2);
  * ``c1`` = corpus count of w1 AS A CONTEXT (i.e. as a bigram LHS);
  * ``V``  = corpus distinct-token count (the add-one denominator).

Scale shape: training is two hash aggregates over the corpus (bigram
counts, context counts — both map-side combinable) plus a 1-row distinct
count; scoring re-joins positions to the two stat tables by key (AQE
broadcasts them when the vocab is small, hash join otherwise) and
reduces per doc. Nothing is driver-side; the stat tables are
vocabulary-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"[^a-z0-9]+"
_E6 = 1_000_000


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent in-doc token pair."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TOKEN_SPLIT),
        lambda t: t != F.lit(""),
    )
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__toks") - 1),
        lambda i: F.struct(
            F.element_at("__toks", i.cast("int")).alias("w1"),
            F.element_at("__toks", (i + 1).cast("int")).alias("w2"),
        ),
    )
    return (
        base.filter(F.size("__toks") >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_lm(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Returns (bigram_counts(w1, w2, c12), context_counts(w1, c1),
    vocab_size). Two map-side-combinable aggregates + one scalar distinct
    count over the token vocabulary."""
    bg = _doc_bigrams(docs, id_col, text_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    context_counts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TOKEN_SPLIT),
            lambda t: t != F.lit(""),
        )
    )
    vocab_size = docs.select(toks.alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).collect()[0]["v"]
    return bigram_counts, context_counts, int(vocab_size)


def score_documents(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM score under the add-one bigram model:
    (doc_id, n_bigrams, sum_p_e6, avg_p_e6, avg_logp). Unseen bigrams get
    the smoothed floor 1/(c1 + V) (and 1/V when w1 itself is unseen —
    cannot happen when scoring the training corpus itself, but keeps the
    scorer total for held-out text). Docs with < 2 tokens score null."""
    bg = _doc_bigrams(docs, id_col, text_col)
    v = int(vocab_size)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .select(
            id_col,
            # integer division (`div`), never float: exact on any engine
            F.expr(
                f"((coalesce(c12, 0L) + 1L) * {_E6}L) div (coalesce(c1, 0L) + {v}L)"
            ).alias("p_e6"),
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(v)).cast("double")
            ).alias("logp"),
        )
    )
    out = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_e6").alias("sum_p_e6"),
        F.avg("logp").alias("avg_logp"),
    )
    # one IEEE division of two exact integers — deterministic cross-engine
    # (avoids engine-specific AVG accumulation order on the e6 ints)
    return out.withColumn(
        "avg_p_e6", (F.col("sum_p_e6") / F.col("n_bigrams")).cast("double")
    )


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train on the corpus and score the corpus (the CCNet pattern trains
    on a clean reference corpus; self-scoring flags the outlier tail).
    One call: two training aggregates + the scoring join-reduce."""
    bigram_counts, context_counts, v = train_bigram_lm(docs, id_col, text_col)
    return score_documents(docs, bigram_counts, context_counts, v, id_col, text_col)
