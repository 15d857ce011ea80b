"""Distributed BPE primitives (functions/bpe.py) pinned against a
pure-Python reference implementation of Sennrich-style greedy BPE."""
import collections

from pyspark.sql import functions as F

from merge_machine_spark.functions.bpe import (
    char_pair_counts,
    corpus_word_counts,
    learn_bpe,
    merge_pair,
    symbol_pair_counts,
    to_symbols,
    top_pairs,
)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: deterministic argmax (count desc, pair asc), greedy
    left-to-right merge application."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for w, c in word_counts.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best_n = max(counts.values())
        pair = min(p for p, c in counts.items() if c == best_n)
        merges.append(pair)
        l, r = pair
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _wc_df(spark, wc: dict[str, int]):
    return spark.createDataFrame(list(wc.items()), "word string, wcount bigint")


def test_corpus_word_counts(spark):
    docs = spark.createDataFrame(
        [("the cat the hat",), ("THE Cat!",), (None,)], "text string"
    )
    got = {r["word"]: r["wcount"] for r in corpus_word_counts(docs).collect()}
    assert got == {"the": 3, "cat": 2, "hat": 1}


def test_char_pair_counts_weighted(spark):
    wc = _wc_df(spark, {"abab": 2, "ab": 3, "x": 5})
    got = {r["pair"]: r["pair_count"] for r in char_pair_counts(wc).collect()}
    # 'abab' contributes ab,ba,ab each x2; 'ab' contributes ab x3; 'x' nothing
    assert got == {"ab": 7, "ba": 2}


def test_top_pairs_deterministic_ties(spark):
    wc = _wc_df(spark, {"ab": 2, "cd": 2, "ef": 2})
    rows = top_pairs(char_pair_counts(wc), 2).collect()
    assert [(r["pair"], r["pair_count"]) for r in rows] == [("ab", 2), ("cd", 2)]


def test_merge_pair_greedy_left_to_right(spark):
    syms = to_symbols(_wc_df(spark, {"aaa": 1, "aab": 1, "baa": 1}))
    got = {tuple(r["symbols"]): r["wcount"]
           for r in merge_pair(syms, "a", "a").collect()}
    assert got == {("aa", "a"): 1, ("aa", "b"): 1, ("b", "aa"): 1}


def test_symbol_pair_counts_after_merge(spark):
    syms = merge_pair(to_symbols(_wc_df(spark, {"aaa": 2})), "a", "a")
    got = {(r["left"], r["right"]): r["pair_count"]
           for r in symbol_pair_counts(syms).collect()}
    assert got == {("aa", "a"): 2}


def test_learn_bpe_matches_reference(spark):
    wc = {"lower": 5, "low": 7, "lowest": 2, "newer": 6, "new": 3, "wider": 1}
    ref_merges, ref_syms = _ref_bpe(wc, 6)
    merges = learn_bpe(_wc_df(spark, wc), 6)
    assert merges == ref_merges
    # final symbol tables agree too: re-apply the learned merges in Spark
    # (to_symbols drops the word column; rebuild with word kept for the check)
    df = _wc_df(spark, wc).select(
        "word",
        F.filter(F.split("word", ""), lambda c: c != F.lit("")).alias("symbols"),
        "wcount",
    )
    for l, r in merges:
        fused = l + r
        df = df.select(
            "word",
            F.aggregate(
                "symbols",
                F.array().cast("array<string>"),
                lambda acc, x: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.lit(l))
                    & (x == F.lit(r)),
                    F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused))),
                ).otherwise(F.concat(acc, F.array(x))),
            ).alias("symbols"),
            "wcount",
        )
    got = {r["word"]: list(r["symbols"]) for r in df.collect()}
    assert got == ref_syms


def test_learn_bpe_stops_when_no_pairs(spark):
    merges = learn_bpe(_wc_df(spark, {"a": 4, "b": 2}), 5)
    assert merges == []
