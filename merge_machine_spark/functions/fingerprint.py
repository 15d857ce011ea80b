"""Winnowing document fingerprints (rolling hash + sliding-window minima).

Training-data-pipeline addition (task mandate names "document fingerprinting
(rolling hash)"): the MOSS winnowing scheme of Schleimer, Wilkerson &
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
(SIGMOD'03) — hash every k-token shingle with a polynomial rolling hash,
then keep the minimum hash of every w-long window of consecutive shingle
hashes. Any shared substring of length >= w + k - 1 tokens between two
documents is GUARANTEED to share a fingerprint, which makes the selected
set a principled near-dup / containment signal where plain md5-of-document
(`doc_fingerprint`) only catches exact duplicates.

Design notes for the Spark/DuckDB oracle pair:

- All hashing is exact 64-bit INTEGER arithmetic (mod 1e9+7), not xxhash64 /
  md5, so DuckDB replicates it bit-for-bit and the contract query gets a
  full rows+schema+hash oracle — this is the same "quantize before compare"
  discipline as the cosine near-dup path.
- Token hashes are computed once per token (char fold), then shingle hashes
  combine k token hashes — O(chars + k * shingles) per doc instead of
  re-folding every shingle's characters (the rolling-hash idea expressed
  over the token stream).
- Only FULL windows emit (pos <= n_shingles - w): truncated trailing
  windows would add suffix-minima the published scheme does not select.
- The fingerprint is the DISTINCT SET of window minima per document. Not
  carrying the selected position sidesteps the rightmost-tie rule entirely
  (equal values collapse in the set) while keeping the winnowing guarantee,
  which is about values shared between documents.
- Everything is JVM-side higher-order functions + one window — no UDF, no
  shuffle beyond the final distinct; at 10^12 docs the per-doc work is
  embarrassingly parallel and the distinct aggregates locally first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MOD = 1_000_000_007  # < 2^30, so acc * base + x stays far inside a long
CHAR_BASE = 31
TOKEN_BASE = 1_000_003


def _token_hash(tok: Column) -> Column:
    """Polynomial char fold: acc = (acc * 31 + ascii(char)) mod 1e9+7."""
    chars = F.filter(F.split(tok, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(CHAR_BASE) + F.ascii(c)) % F.lit(MOD),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, fp, doc_fp_count): distinct winnowed fingerprints per doc.

    ``k``: tokens per shingle; ``w``: shingle-hashes per winnowing window.
    Docs with fewer than k + w - 1 tokens produce no full window and are
    absent from the output (they have no robust fingerprint at this k/w —
    exact dedup via `doc_fingerprint` still covers them)."""
    txt = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(F.split(txt, "[^a-z0-9]+"), lambda t: t != F.lit(""))
    thash = F.transform(toks, _token_hash)
    n = F.size(thash)
    # shingle hash at i (1-based): fold k consecutive token hashes
    def shingle_at(i: Column) -> Column:
        acc = F.element_at(thash, i)
        for j in range(1, k):
            acc = (acc * F.lit(TOKEN_BASE) + F.element_at(thash, i + F.lit(j))) % F.lit(MOD)
        return acc

    shingles = F.when(n >= F.lit(k), F.transform(F.sequence(F.lit(1), n - F.lit(k - 1)), shingle_at)).otherwise(
        F.array().cast("array<bigint>")
    )
    sh = docs.select(F.col(id_col).alias("doc_id"), F.posexplode(shingles).alias("pos", "h"))
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    n_win = Window.partitionBy("doc_id")
    fps = (
        sh.withColumn("wmin", F.min("h").over(win))
        .withColumn("n_sh", F.count(F.lit(1)).over(n_win))
        # full windows only: pos is 0-based from posexplode
        .filter(F.col("pos") <= F.col("n_sh") - w)
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )
    return fps.withColumn("doc_fp_count", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))


def split_contamination(
    fps: DataFrame,
    split: DataFrame,
    min_shared: int = 2,
    train_label: str = "train",
    test_label: str = "test",
) -> DataFrame:
    """Train/test decontamination report: for every TEST document, how many
    of its winnowed fingerprints also occur anywhere in the TRAIN split,
    and a ``contaminated`` verdict at ``min_shared`` — the standard
    eval-leakage check before training on a deduped corpus.

    Inputs: ``fps`` (doc_id, fp) from :func:`winnowing_fingerprints` (or a
    StageStore checkpoint of it — compute once, reuse for dedup AND
    decontamination); ``split`` (doc_id, split) from
    ``sampling.train_test_split``. Output: one row per test doc
    (doc_id, n_shared_fps, contaminated) — docs with no fingerprints (too
    short for a full window) report 0 / false.

    Scale shape: the train side collapses to a DISTINCT fp set before the
    join, so a boilerplate fingerprint shared by 10^6 train docs is ONE row
    on the build side — the semi join can't explode, and per-test-doc
    counting is a plain hash aggregate. One shuffle on fp, one on doc_id."""
    s = split.select("doc_id", "split")
    f = fps.select("doc_id", "fp")
    train_fp = (
        f.join(s.filter(F.col("split") == train_label), "doc_id").select("fp").distinct()
    )
    test_fp = f.join(s.filter(F.col("split") == test_label), "doc_id")
    shared = (
        test_fp.join(train_fp, "fp", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    return (
        s.filter(F.col("split") == test_label)
        .select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_fps", F.lit(0)).alias("n_shared_fps"),
            (F.coalesce("n_shared_fps", F.lit(0)) >= F.lit(int(min_shared))).alias("contaminated"),
        )
    )


def fp_near_dup_pairs(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int = 1000,
    report: dict | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    fps: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from shared winnowed fingerprints — the MOSS
    use of the scheme: (doc_a, doc_b, n_shared, fp_count_a, fp_count_b,
    jaccard_e3), doc_a < doc_b, n_shared >= min_shared.

    Scale shape is the LSH-band pattern: the join key is the fingerprint
    (selective by construction — window minima of a near-uniform hash), and
    fingerprints hotter than ``max_fp_df`` docs (boilerplate runs: headers,
    licence blocks) are dropped via a broadcast anti-join with the dropped
    mass counted into ``report``, never silent — so no fp group can
    quadratically explode. jaccard_e3 = (1000 * |A∩B|) div (|A∪B|) is exact
    integer arithmetic (SQL DIV), oracle-safe like every other boundary in
    this engine.

    The fps subtree feeds three consumers (the df sizes, both self-join
    sides). Pass a precomputed/staged ``fps`` frame (same ivf_topk-centroids
    pattern) to evaluate winnowing once at scale — e.g. a StageStore
    checkpoint of :func:`winnowing_fingerprints`; the inline default is fine
    for one-shot contract-sized calls."""
    if fps is None:
        fps = winnowing_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    # pin the tiny df-count table so the report aggregate and the broadcast
    # anti-join side don't each re-evaluate the winnowing subtree (the
    # ADVICE-r2 pattern shared with lsh_topk/ivf_topk/near_dup_pairs)
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("fp_df")).localCheckpoint(eager=True)
    too_big = sizes.filter(F.col("fp_df") > max_fp_df)
    if report is not None:
        dropped = too_big.agg(
            F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("fp_df"), F.lit(0)).alias("mass")
        ).collect()[0]
        report["fps_dropped"] = int(dropped["n"])
        report["dropped_mass"] = int(dropped["mass"])
    ok = fps.join(F.broadcast(too_big.select("fp")), "fp", "left_anti")
    a = ok.select("fp", F.col("doc_id").alias("doc_a"), F.col("doc_fp_count").alias("fp_count_a"))
    b = ok.select("fp", F.col("doc_id").alias("doc_b"), F.col("doc_fp_count").alias("fp_count_b"))
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "fp_count_a", "fp_count_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(int(min_shared)))
    )
    # NB: n_shared counts shared SURVIVING fps (post max_fp_df cap), while
    # fp_count_a/b are the full per-doc set sizes — so jaccard_e3 is a lower
    # bound under the cap, the conservative direction for near-dup claims.
    return pairs.select(
        "doc_a", "doc_b", "n_shared", "fp_count_a", "fp_count_b",
        F.expr("(1000 * n_shared) div (fp_count_a + fp_count_b - n_shared)").alias("jaccard_e3"),
    )
