"""Linkage cascade — DataFrame re-expression of the reference's
``es_linker`` (/root/reference/merge_machine/es_match.py:241-417).

Reference semantics (SURVEY.md §2.3 J5/J6, §2.4 A1/A3, §2.2 P5/P6):

1. dedupe source rows on the match columns (>=10% gain required), keep a
   group map to re-attach at the end (A1/J9);
2. for matcher tiers 1..k (priority order): each still-unmatched source row
   takes its best-scoring ref row; a row is *done* when best score >= the
   tier's threshold (J6 priority cascade);
3. ``_best_match`` (es_match.py:41-57): pick the first tier above threshold,
   else the first tier with any hit at all;
4. confidence = 1 + (score - thresh)/mean(all scores of that tier) (A3);
5. user-labelled positives bypass search with score 999 (P6), labelled
   negatives are zeroed out (P5).

The cascade is computed as *compute-all-tiers + ordered pick* instead of the
reference's sequential anti-join loop: on Spark one pass over the pair table
beats k dependent jobs, and the semantics are identical (es_match's loop is
an artifact of per-row HTTP search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EXACT_SCORE = 999.0  # reference sentinel for labelled positives (es_match.py:386)


def top1_per_source(scores: DataFrame, src_col: str = "id_a", score_col: str = "score") -> DataFrame:
    """Best ref row per source row (J5/W1): row_number over a per-source
    window ordered by score desc, ties broken on id_b for determinism."""
    w = Window.partitionBy(src_col).orderBy(F.desc(score_col), F.asc("id_b"))
    return scores.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def topk_per_source(scores: DataFrame, k: int, src_col: str = "id_a", score_col: str = "score") -> DataFrame:
    w = Window.partitionBy(src_col).orderBy(F.desc(score_col), F.asc("id_b"))
    return scores.withColumn("_rank", F.row_number().over(w)).filter(F.col("_rank") <= k)


def confidence_means(tier_scores: list[DataFrame], score_col: str = "score") -> list[float]:
    """A3 `_confidence_estimator` (es_match.py:59-76): mean of ALL candidate
    scores per tier, used to scale confidences onto a common range."""
    out = []
    for df in tier_scores:
        row = df.agg(F.avg(score_col).alias("m")).collect()[0]
        out.append(float(row["m"]) if row["m"] is not None else 1.0)
    return out


def cascade_pick(
    tier_best: list[DataFrame],
    thresholds: list[float],
    tier_means: list[float] | None = None,
    src_col: str = "id_a",
    score_col: str = "score",
) -> DataFrame:
    """J6 + `_best_match`: given the per-tier best-hit tables
    (id_a, id_b, score), emit one row per source id with
    (id_b, score, query_id, thresh, is_match, confidence).

    Pick order: lowest tier whose best score >= its threshold; if none
    qualifies, the lowest tier that returned any hit (is_match=false) —
    the exact truth table of es_match.py:41-57."""
    if len(tier_best) != len(thresholds):
        raise ValueError("one threshold per tier")
    if tier_means is None:
        tier_means = [1.0] * len(tier_best)
    acc: DataFrame | None = None
    for i, df in enumerate(tier_best):
        d = df.select(
            F.col(src_col),
            F.col("id_b").alias(f"_id_{i}"),
            F.col(score_col).cast("double").alias(f"_sc_{i}"),
        )
        acc = d if acc is None else acc.join(d, src_col, "full_outer")
    assert acc is not None

    hit_i = [F.col(f"_sc_{i}").isNotNull() & (F.col(f"_sc_{i}") >= F.lit(thresholds[i])) for i in range(len(tier_best))]
    any_i = [F.col(f"_sc_{i}").isNotNull() for i in range(len(tier_best))]

    def ordered_pick(conds):
        qid = F.lit(None).cast("int")
        for i in reversed(range(len(tier_best))):
            qid = F.when(conds[i], F.lit(i)).otherwise(qid)
        return qid

    qid_match = ordered_pick(hit_i)
    qid_any = ordered_pick(any_i)
    qid = F.coalesce(qid_match, qid_any)

    id_b = F.lit(None).cast("string")
    sc = F.lit(None).cast("double")
    th = F.lit(None).cast("double")
    mean_ = F.lit(None).cast("double")
    for i in reversed(range(len(tier_best))):
        id_b = F.when(qid == i, F.col(f"_id_{i}")).otherwise(id_b)
        sc = F.when(qid == i, F.col(f"_sc_{i}")).otherwise(sc)
        th = F.when(qid == i, F.lit(float(thresholds[i]))).otherwise(th)
        mean_ = F.when(qid == i, F.lit(float(tier_means[i]))).otherwise(mean_)

    is_match = qid_match.isNotNull()
    confidence = F.when(is_match, F.lit(1.0) + (sc - th) / mean_).otherwise(F.lit(0.0))
    return acc.select(
        F.col(src_col),
        id_b.alias("id_b"),
        sc.alias("sim_score"),
        qid.cast("int").alias("query_id"),
        th.alias("thresh"),
        is_match.alias("is_match"),
        confidence.alias("confidence"),
    )


def apply_overrides(
    picked: DataFrame,
    exact_pairs: DataFrame | None = None,
    non_matching_pairs: DataFrame | None = None,
    src_col: str = "id_a",
) -> DataFrame:
    """P5/P6: labelled positives (exact_pairs: id_a, id_b) replace the picked
    row with score EXACT_SCORE / confidence 1; labelled negatives
    (non_matching_pairs) zero out score+match for that exact pair."""
    out = picked
    if exact_pairs is not None:
        ex = exact_pairs.select(F.col(src_col), F.col("id_b").alias("_ex_id_b")).dropDuplicates([src_col])
        out = (
            out.join(ex, src_col, "full_outer")
            .select(
                F.col(src_col),
                F.coalesce("_ex_id_b", "id_b").alias("id_b"),
                F.when(F.col("_ex_id_b").isNotNull(), F.lit(EXACT_SCORE)).otherwise(F.col("sim_score")).alias("sim_score"),
                F.when(F.col("_ex_id_b").isNotNull(), F.lit(None).cast("int")).otherwise(F.col("query_id")).alias("query_id"),
                F.when(F.col("_ex_id_b").isNotNull(), F.lit(None).cast("double")).otherwise(F.col("thresh")).alias("thresh"),
                F.when(F.col("_ex_id_b").isNotNull(), F.lit(True)).otherwise(F.col("is_match")).alias("is_match"),
                # reference contract: labelled positives carry __CONFIDENCE=999
                # (es_match.py sentinel), ranking above every computed match
                F.when(F.col("_ex_id_b").isNotNull(), F.lit(EXACT_SCORE)).otherwise(F.col("confidence")).alias("confidence"),
            )
        )
    if non_matching_pairs is not None:
        nm = non_matching_pairs.select(
            F.col(src_col), F.col("id_b").alias("_nm_id_b"), F.lit(True).alias("_nm")
        ).dropDuplicates()
        out = (
            out.join(nm, (out[src_col] == nm[src_col]) & (out["id_b"] == nm["_nm_id_b"]), "left")
            .drop(nm[src_col])
            .select(
                out[src_col],
                out["id_b"],
                F.when(F.col("_nm"), F.lit(0.0)).otherwise(out["sim_score"]).alias("sim_score"),
                out["query_id"],
                out["thresh"],
                F.when(F.col("_nm"), F.lit(False)).otherwise(out["is_match"]).alias("is_match"),
                F.when(F.col("_nm"), F.lit(0.0)).otherwise(out["confidence"]).alias("confidence"),
            )
        )
    return out


def majority_vote(df: DataFrame, key_cols: list[str], vote_col: str, out_col: str = "vote") -> DataFrame:
    """A7 majority vote: the most frequent ``vote_col`` value per key, ties
    broken on the vote value for determinism — the reference's agreement
    pattern across a duplicate group's individual matches (labelled
    duplicates vote on the group's answer)."""
    counts = df.groupBy(*key_cols, vote_col).agg(F.count(F.lit(1)).alias("n_votes"))
    w = Window.partitionBy(*key_cols).orderBy(F.desc("n_votes"), F.asc(vote_col))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*key_cols, F.col(vote_col).alias(out_col), "n_votes")
    )


def deduplicate_source(source: DataFrame, match_cols: list[str], min_diff_prop: float = 0.1):
    """A1 (es_match.py:110-149): collapse source rows identical on the match
    columns before the expensive search, keeping a representative per group
    and a (doc_id -> group representative) map; skipped when the reduction
    is below ``min_diff_prop`` (10%)."""
    filled = source.select(
        "*", F.concat_ws("\x1f", *[F.coalesce(F.col(c), F.lit("")) for c in match_cols]).alias("_grp_key")
    )
    w = Window.partitionBy("_grp_key").orderBy("doc_id")
    with_rep = filled.withColumn("_rep", F.first("doc_id").over(w))
    group_map = with_rep.select(F.col("doc_id"), F.col("_rep").alias("source_group"))
    n_total = source.count()
    n_groups = with_rep.filter(F.col("doc_id") == F.col("_rep")).count()
    if n_total == 0 or (n_total - n_groups) / max(n_total, 1) < min_diff_prop:
        ident = source.select("doc_id", F.col("doc_id").alias("source_group"))
        return source, ident, False
    deduped = with_rep.filter(F.col("doc_id") == F.col("_rep")).drop("_grp_key", "_rep")
    return deduped, group_map, True


def re_duplicate(results: DataFrame, group_map: DataFrame, src_col: str = "id_a") -> DataFrame:
    """J9 (es_match.py:151-164): propagate the representative's result to
    every row of its duplicate group."""
    return (
        group_map.join(results, group_map["source_group"] == results[src_col], "left")
        .drop(src_col)
        .withColumnRenamed("doc_id", src_col)
    )


def link_output(
    source: DataFrame,
    ref: DataFrame,
    picked: DataFrame,
    group_map: DataFrame | None = None,
    src_id: str = "doc_id",
    ref_id: str = "doc_id",
    ref_suffix: str = "__REF",
) -> DataFrame:
    """Assemble the reference's output contract (es_match.py:352-358,402-409;
    FIXTURES.md §4): all source columns + __IS_MATCH __ID_REF __ID_QUERY
    __SIM_SCORE __THRESH __CONFIDENCE __SOURCE_GROUP + ref columns suffixed.
    Row count == source row count (es_match.py:397 invariant)."""
    res = picked
    if group_map is not None:
        res = re_duplicate(picked, group_map)
    meta = res.select(
        F.col("id_a").alias("_src_id"),
        F.coalesce("is_match", F.lit(False)).alias("__IS_MATCH"),
        F.col("id_b").alias("__ID_REF"),
        F.col("query_id").alias("__ID_QUERY"),
        F.col("sim_score").alias("__SIM_SCORE"),
        F.col("thresh").alias("__THRESH"),
        F.coalesce("confidence", F.lit(0.0)).alias("__CONFIDENCE"),
        F.col("source_group").alias("__SOURCE_GROUP") if group_map is not None else F.col("id_a").alias("__SOURCE_GROUP"),
    )
    ref_renamed = ref.select(
        F.col(ref_id).alias("_ref_id"), *[F.col(c).alias(c + ref_suffix) for c in ref.columns if c != ref_id]
    )
    return (
        source.join(meta, source[src_id] == meta["_src_id"], "left")
        .drop("_src_id")
        .join(ref_renamed, F.col("__ID_REF") == F.col("_ref_id"), "left")
        .drop("_ref_id")
    )
