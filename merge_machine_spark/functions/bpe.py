"""Distributed BPE tokenizer-training primitives.

Training a BPE tokenizer over a web-scale corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
GPT-2/tiktoken lineage) has exactly one corpus-scale step: counting words.
Everything after — adjacent-symbol pair counts, picking the best merge,
applying it — operates on the WORD-FREQUENCY TABLE, whose size is the
vocabulary (10^6-10^7 rows) regardless of whether the corpus is 1 GB or
100 TB. This module keeps that separation explicit:

  * ``corpus_word_counts``: the only pass over the corpus — tokenize
    (array projection) + explode + ONE map-side-combinable hash aggregate.
  * ``char_pair_counts``: weighted adjacent-character-pair counts over the
    word table — a pure substring projection + explode + hash aggregate,
    all vocab-sized. This is BPE iteration 0 and the contract-oracled
    query (2-char substrings replay on any ANSI engine).
  * ``symbol_pair_counts`` / ``merge_pair`` / ``learn_bpe``: the general
    iteration over symbol ARRAYS (post-merge symbols are multi-char).
    ``merge_pair`` is a greedy left-to-right fold (``F.aggregate``) — a
    pure projection on the cached vocab table; ``learn_bpe`` drives
    n_merges iterations from the driver, each one a vocab-sized job, and
    collects only the single best pair per round (a 1-row argmax), so the
    driver loop is legitimate: nothing corpus-sized ever reaches it.

Determinism: best-pair selection orders by (count DESC, left ASC,
right ASC) — ties can't flip merges between runs or engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"[^a-z0-9]+"


def corpus_word_counts(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wcount) over the corpus — the single corpus-scale pass."""
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _TOKEN_SPLIT),
            lambda t: t != F.lit(""),
        )
    )
    return (
        docs.select(toks.alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def char_pair_counts(word_counts: DataFrame) -> DataFrame:
    """Weighted adjacent CHARACTER pair counts (BPE iteration 0): pair is
    the 2-char substring at every position, weighted by word frequency.
    Vocab-sized; replayable as plain substr() on any engine."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.substring(F.col("word"), i, F.lit(2)),
    )
    return (
        word_counts.filter(F.length("word") >= 2)
        .select(F.explode(pairs).alias("pair"), "wcount")
        .groupBy("pair")
        .agg(F.sum("wcount").alias("pair_count"))
    )


def top_pairs(pair_counts: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k merge candidates: count DESC, pair ASC."""
    return pair_counts.orderBy(F.desc("pair_count"), F.asc("pair")).limit(k)


def to_symbols(word_counts: DataFrame) -> DataFrame:
    """(symbols: array<string>, wcount) — each word split into characters,
    the working representation the merge loop rewrites."""
    return word_counts.select(
        F.filter(F.split("word", ""), lambda c: c != F.lit("")).alias("symbols"),
        "wcount",
    )


def symbol_pair_counts(symbols_df: DataFrame) -> DataFrame:
    """Weighted adjacent SYMBOL pair counts over array-of-symbols words.
    (left, right, pair_count); vocab-sized."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("symbols") - 1),
        lambda i: F.struct(
            F.element_at("symbols", i.cast("int")).alias("left"),
            F.element_at("symbols", (i + 1).cast("int")).alias("right"),
        ),
    )
    return (
        symbols_df.filter(F.size("symbols") >= 2)
        .select(F.explode(pairs).alias("p"), "wcount")
        .select(F.col("p.left").alias("left"), F.col("p.right").alias("right"), "wcount")
        .groupBy("left", "right")
        .agg(F.sum("wcount").alias("pair_count"))
    )


def merge_pair(symbols_df: DataFrame, left: str, right: str) -> DataFrame:
    """Apply ONE merge greedily left-to-right: every non-overlapping
    adjacent (left, right) becomes the fused symbol. Pure fold projection
    (F.aggregate), no shuffle. Greedy semantics match the reference BPE:
    in 'aaa' with merge (a,a), the first pair fuses, yielding [aa, a]."""
    fused = left + right
    merged = F.aggregate(
        "symbols",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return symbols_df.select(merged.alias("symbols"), "wcount")


def learn_bpe(word_counts: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Driver-looped BPE training: n_merges rounds of (vocab-sized pair
    count -> 1-row deterministic argmax -> vocab-sized merge projection).
    Collects ONE row per round; the vocab table stays distributed and is
    re-cached every round so each iteration reads the previous rewrite,
    not the whole lineage. Returns the ordered merge list."""
    syms = to_symbols(word_counts).cache()
    syms.count()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (
            symbol_pair_counts(syms)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r = best[0]["left"], best[0]["right"]
        merges.append((l, r))
        nxt = merge_pair(syms, l, r).cache()
        nxt.count()
        syms.unpersist()
        syms = nxt
    syms.unpersist()
    return merges
