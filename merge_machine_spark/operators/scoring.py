"""Pair scoring and matcher composition.

The reference's per-pair relevance score is Lucene BM25 × boost, summed over
the clauses of a compound bool query (must adds AND-semantics + score,
should adds optional score — /root/reference/merge_machine/helpers.py:112-143,
query_templates.py:106-116; scoring itself happens inside Elasticsearch).
Here each clause is a (channel, projection-pair, weight) and its score is an
explicit similarity feature; compound templates compose exactly like the
ES bool query:

  must clauses   -> inner-join intersection of clause candidate sets (J3)
  should clauses -> left-join, score added when present (J4)
  total score    = Σ weight_i · clause_score_i

TF-IDF cosine is computed DataFrame-natively (materialized IDF — the one
thing Lucene gave the reference for free, SURVEY.md §2.4) so candidate
generation and scoring share one token join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..caching import track
from ..functions import analyzers as A
from ..functions import similarity as S


# ---------------------------------------------------------------------------
# TF-IDF scored token join (candidate generation + cosine in one pass)
# ---------------------------------------------------------------------------
# Per-doc norm rows are ~30 B; up to this many docs the norms tables are
# explicitly broadcast so the pair plane never shuffles just to attach two
# doubles (~60 MB at the ceiling — the guide's "few hundred MB is fine"
# broadcast range). Data-size bound, not a core-count tunable.
NORMS_BROADCAST_MAX_DOCS = 2_000_000
def tfidf_weighted_tokens(tokens_tf: DataFrame, dfreq: DataFrame, n_docs: int) -> DataFrame:
    """(id, token, tf) -> (id, token, w) with w L2-normalized per doc.

    idf = ln((N+1)/(df+1)) + 1 (smooth; any monotone variant works — the
    calibration layer learns thresholds over *our* scores, SURVEY.md §7.3).
    """
    w = tokens_tf.join(dfreq, "token").select(
        "id",
        "token",
        (F.col("tf").cast("double") * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0)).alias("w"),
    )
    norms = w.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    return w.join(norms, "id").select("id", "token", (F.col("w") / F.col("norm")).alias("w"))


def tfidf_cosine_pairs(
    tokens_tf_a: DataFrame,
    tokens_tf_b: DataFrame | None = None,
    max_df: int | None = 256,
    n_docs: int | None = None,
) -> DataFrame:
    """Scored blocking: (id_a, id_b, tfidf_cosine) for every pair sharing a
    surviving token. Self-join mode when ``tokens_tf_b`` is None (id_a<id_b).

    One token-join shuffle produces BOTH the candidate set and its TF-IDF
    cosine score — cheaper than block-then-rescore at 100 TB because the
    explode join dominates cost.
    """
    self_join = tokens_tf_b is None
    corpus = tokens_tf_a if self_join else tokens_tf_a.unionByName(tokens_tf_b)
    if n_docs is None:
        n_docs = corpus.select("id").distinct().count()
    # Precondition (every in-repo caller satisfies it — the shape
    # ``explode_tokens(with_tf=True)`` produces): tokens_tf has ONE row per
    # (id, token). In self-join mode count(*) therefore equals
    # countDistinct(id) and skips Spark's distinct-expand (a full extra
    # aggregate pass + exchange over the token table — r6, guide §2.3).
    # Linkage mode keeps countDistinct: the a/b id spaces may overlap.
    if self_join:
        dfreq = corpus.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        # dfreq is referenced three times (the idf weighting, the two df-cap
        # semi-joins) and Spark 4.1 does NOT reuse identical broadcast/
        # exchange subtrees across cache-reading branches — measured at 600k
        # docs: the token explode+aggregate ran 3x (~330s executor time per
        # evaluation at 32 cores) without this persist (r6, guide §2.4).
        # Vocab-sized; tracked so the caller releases it.
        dfreq = track(dfreq.persist())
    else:
        dfreq = corpus.groupBy("token").agg(F.countDistinct("id").alias("df"))
    # (r6 note: a dense row_number token id for a bigint join key was tried
    # here and REVERTED — the vocab-wide single-partition window serialized
    # the dfreq subtree on every re-evaluation and tripled the 60k-doc
    # trial; string join keys with the broadcast/AQE strategy are fine.)

    def weighted(t: DataFrame) -> DataFrame:
        # UNNORMALIZED tf-idf weight; the L2 norm divides at pair level
        # (dot/(norm_a*norm_b) == dot of normalized vectors), which turns a
        # token-level normalize join (~|tokens| rows) into two doc-level
        # joins against a |docs|-row norms table that AQE broadcasts.
        return t.join(dfreq, "token").select(
            "id", "token",
            (F.col("tf").cast("double") * (F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)) + 1.0)).alias("w"),
        )

    wa = weighted(tokens_tf_a)
    if self_join:
        # the self-join's two sides AND the norm aggregate share this table;
        # without the persist Spark computes the explode+join subtree thrice.
        # Tracked so the plan-level caller unpersists it after materialization.
        # EAGER count (r6): the three consumers launch as CONCURRENT stages,
        # and a lazily-persisted table is evaluated independently by every
        # stage that starts before its cache is filled — the stage table
        # showed the wa subtree computed 3x (~110s combined executor time at
        # 600k docs). One up-front materialization job makes every consumer
        # a cache scan.
        wa = track(wa.persist())
        wa.count()
    wb = wa if self_join else weighted(tokens_tf_b)
    # norms over the FULL vocabulary (pre-cap), like the reference's vector
    norms_a = wa.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    if self_join:
        # referenced twice (id_a and id_b sides, two concurrent broadcast
        # builds) — same cache-fill-race story as wa above; doc-sized (r6).
        norms_a = track(norms_a.persist())
        norms_a.count()
    norms_b = norms_a if self_join else wb.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    if max_df is not None:
        keep = dfreq.filter(F.col("df") <= max_df).select("token")
        wa = wa.join(keep, "token", "left_semi")
        wb = wa if self_join else wb.join(keep, "token", "left_semi")
    # After the df-cap, per-token fan-out is bounded by max_df² pairs, so a
    # plain shuffle join + AQE skew-split is enough here; explicit salting
    # (salted_token_join) is reserved for uncapped joins.
    #
    # In self-join mode BOTH sides are the IDENTICAL DataFrame; the per-side
    # renames happen AFTER the join via the aliases (r6). Renaming before
    # the join gave the two sides structurally different subtrees, which
    # blocks Spark's exchange reuse whenever the join does shuffle (guide
    # §2.4); identical sides keep that option open at zero cost.
    a = wa.alias("a")
    b = (wa if self_join else wb.select("id", "token", "w")).alias("b")
    # join strategy is left to the planner + AQE (session config r6:
    # preferSortMergeJoin=false + maxShuffledHashJoinLocalMapThreshold):
    # small corpora broadcast this join outright, large ones get
    # shuffled-hash instead of sort-merge from MEASURED partition sizes.
    # (An explicit shuffle_hash hint here regressed small corpora 3x by
    # overriding the broadcast choice — measured r6.)
    pairs = a.join(b, "token")
    if self_join:
        pairs = pairs.filter(F.col("a.id") < F.col("b.id"))
    dots = (
        pairs.groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("_dot"))
    )
    na = norms_a.select(F.col("id").alias("id_a"), F.col("norm").alias("_na"))
    nb = norms_b.select(F.col("id").alias("id_b"), F.col("norm").alias("_nb"))
    # The norms tables are doc-scale (~30 B/doc) but sit above an aggregate,
    # so the planner's size ESTIMATE blocks auto-broadcast and the PAIR
    # plane got exchanged by id_a and again by id_b just to divide by two
    # doubles (measured r6 at 600k docs: 118 MB + 128 MB pair exchanges for
    # a 9.6 MB build side). Broadcast them explicitly while they fit
    # (NORMS_BROADCAST_MAX_DOCS); beyond that the co-partition join is the
    # only shape that scales and the planner's choice stands.
    if n_docs is not None and n_docs <= NORMS_BROADCAST_MAX_DOCS:
        na, nb = F.broadcast(na), F.broadcast(nb)
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .select("id_a", "id_b", (F.col("_dot") / (F.col("_na") * F.col("_nb"))).alias("tfidf_cosine"))
    )


# ---------------------------------------------------------------------------
# feature scoring over candidate pairs
# ---------------------------------------------------------------------------
FEATURES = ("lev_norm", "jaro_winkler", "token_jaccard", "token_overlap")


def score_pairs(
    pairs: DataFrame,
    side_a: DataFrame,
    side_b: DataFrame,
    col_a: str,
    col_b: str,
    channel: str = "standard",
    features: tuple[str, ...] = ("lev_norm", "jaro_winkler", "token_jaccard"),
    prefix: str = "",
    jw_prefix: int | None = None,
) -> DataFrame:
    """Attach per-pair similarity features for one (proj_a, proj_b, channel)
    clause. ``pairs`` has (id_a, id_b[, ...]); ``side_a``/``side_b`` carry
    (doc_id, <text cols>). Joins are plain equi-joins on ids — Catalyst
    broadcasts a side when it is small (labelled-pair scoring) and
    shuffle-hash-joins otherwise."""
    a = side_a.select(F.col("doc_id").alias("id_a"), F.col(col_a).alias("_txt_a"))
    b = side_b.select(F.col("doc_id").alias("id_b"), F.col(col_b).alias("_txt_b"))
    out = pairs.join(a, "id_a").join(b, "id_b")
    tok_a = A.analyze(F.col("_txt_a"), channel)
    tok_b = A.analyze(F.col("_txt_b"), channel)
    jw_a = F.substring("_txt_a", 1, jw_prefix) if jw_prefix else F.col("_txt_a")
    jw_b = F.substring("_txt_b", 1, jw_prefix) if jw_prefix else F.col("_txt_b")
    fmap: dict[str, Column] = {
        "lev_norm": S.levenshtein_norm("_txt_a", "_txt_b"),
        "jaro_winkler": S.jaro_winkler(jw_a, jw_b),
        "token_jaccard": S.token_jaccard(tok_a, tok_b),
        "token_overlap": S.token_overlap(tok_a, tok_b).cast("double"),
    }
    for f in features:
        out = out.withColumn(prefix + f, fmap[f])
    return out.drop("_txt_a", "_txt_b")


def payload_pair_features(
    pairs: DataFrame,
    payload_a: DataFrame,
    payload_b: DataFrame,
    weights: dict[str, float],
    broadcast_sides: bool = True,
    score_col: str = "score",
) -> DataFrame:
    """Feature-score candidate pairs from prebuilt per-doc payloads
    (doc_id + the subset of _txt / _tok / _toki the weights need). Payloads
    broadcast when requested so the pair shuffle carries only ids; features
    are JVM array ops except the Arrow-batched Jaro-Winkler."""
    from ..functions import similarity as S

    a = payload_a.select([F.col(c).alias(f"{c}_a" if c != "doc_id" else "id_a") for c in payload_a.columns])
    b = payload_b.select([F.col(c).alias(f"{c}_b" if c != "doc_id" else "id_b") for c in payload_b.columns])
    if broadcast_sides:
        a, b = F.broadcast(a), F.broadcast(b)
    # else: co-partition fallback — the planner + AQE (session r6 config)
    # build the hash side from the doc-level payload at runtime instead of
    # sort-merge, which sorted the PAIR plane twice with the a-side payload
    # riding the second sort.
    scored = pairs.join(a, "id_a").join(b, "id_b")

    fmap: dict[str, Column] = {}
    if "jaro_winkler" in weights:
        fmap["jaro_winkler"] = S.jaro_winkler(F.col("_txt_a"), F.col("_txt_b"))
    if "lev_norm" in weights:
        fmap["lev_norm"] = S.levenshtein_norm("_txt_a", "_txt_b")
    if "token_jaccard" in weights:
        fmap["token_jaccard"] = S.token_jaccard(F.col("_tok_a"), F.col("_tok_b"))
    if "int_jaccard" in weights:
        fmap["int_jaccard"] = S.token_jaccard(F.col("_toki_a"), F.col("_toki_b"))
    for name, expr in fmap.items():
        scored = scored.withColumn(name, expr)
    scored = scored.drop("_txt_a", "_txt_b", "_tok_a", "_tok_b", "_toki_a", "_toki_b")

    total = None
    for name, w in weights.items():
        piece = F.coalesce(F.col(name), F.lit(0.0)) * F.lit(float(w))
        total = piece if total is None else total + piece
    return scored.withColumn(score_col, total)


def feature_payload(df: DataFrame, col: str, channel: str, weights: dict[str, float], jw_prefix: int | None):
    """(doc_id, <text col>) -> the per-doc payload the weighted features
    need: bounded text prefix, distinct channel tokens, integer tokens."""
    from ..functions import analyzers as A

    txt = F.col(col)
    cols = [F.col("doc_id")]
    if "jaro_winkler" in weights or "lev_norm" in weights:
        cols.append((F.substring(txt, 1, jw_prefix) if jw_prefix else txt).alias("_txt"))
    if "token_jaccard" in weights:
        cols.append(F.array_distinct(A.analyze(txt, channel)).alias("_tok"))
    if "int_jaccard" in weights:
        cols.append(F.array_distinct(A.analyze(txt, "integers")).alias("_toki"))
    return df.select(*cols)


def fused_pair_features(
    pairs: DataFrame,
    side_a: DataFrame,
    side_b: DataFrame,
    col_a: str,
    col_b: str,
    channel: str,
    weights: dict[str, float],
    jw_prefix: int | None = 96,
    broadcast_sides: bool = True,
    score_col: str = "score",
) -> DataFrame:
    """Scale path for pair feature scoring: analyze each doc ONCE per side
    (n_docs analyzer calls, not n_pairs), ship the per-doc payload (bounded
    text prefix + distinct token arrays) to the pair table — broadcast when
    requested so the pair shuffle carries only ids — and compute features as
    JVM array ops; only Jaro-Winkler (bounded prefix) stays Python/Arrow.
    Adds each feature column named by ``weights`` plus the weighted-sum
    ``score_col`` (a pre-existing 'tfidf_cosine' column on ``pairs`` is used
    as-is when weighted)."""
    a = feature_payload(side_a, col_a, channel, weights, jw_prefix)
    b = feature_payload(side_b, col_b, channel, weights, jw_prefix)
    return payload_pair_features(pairs, a, b, weights, broadcast_sides=broadcast_sides, score_col=score_col)


def fused_pair_features_best_field(
    pairs: DataFrame,
    side_a: DataFrame,
    side_b: DataFrame,
    col_a: str,
    cols_b: list[str] | tuple[str, ...],
    channel: str,
    weights: dict[str, float],
    jw_prefix: int | None = 96,
    broadcast_sides: bool = True,
    score_col: str = "score",
) -> DataFrame:
    """J2 ``multi_match`` best-field scoring (reference helpers.py:129-141,
    HOW_TO.md:52-57): one source projection scored against a LIST of ref
    columns; the clause score is ``greatest()`` over the per-column composite
    scores (ES best_fields takes the max per-field relevance).

    Same scale shape as :func:`fused_pair_features`: per-doc payload
    (n_docs analyzer calls), ONE b-side row carrying all per-column arrays,
    broadcast payload, ids-only pair shuffle. A pre-existing
    ``tfidf_cosine`` on ``pairs`` is already best-field by construction
    (candidate generation union-maxes per-field cosines), so it is weighted
    once outside the greatest(). Adds ``best_field`` (the winning ref
    column) next to ``score_col``."""
    from ..functions import analyzers as A
    from ..functions import similarity as S

    cols_b = list(cols_b)
    if len(cols_b) == 1:
        out = fused_pair_features(
            pairs, side_a, side_b, col_a, cols_b[0], channel=channel, weights=weights,
            jw_prefix=jw_prefix, broadcast_sides=broadcast_sides, score_col=score_col,
        )
        return out.withColumn("best_field", F.lit(cols_b[0]))

    need_txt = "jaro_winkler" in weights or "lev_norm" in weights
    need_tok = "token_jaccard" in weights
    need_int = "int_jaccard" in weights

    def payload(txt: Column, tag: str) -> list[Column]:
        cols = []
        if need_txt:
            cols.append((F.substring(txt, 1, jw_prefix) if jw_prefix else txt).alias(f"_txt{tag}"))
        if need_tok:
            cols.append(F.array_distinct(A.analyze(txt, channel)).alias(f"_tok{tag}"))
        if need_int:
            cols.append(F.array_distinct(A.analyze(txt, "integers")).alias(f"_toki{tag}"))
        return cols

    a = side_a.select(F.col("doc_id").alias("id_a"), *payload(F.col(col_a), "_a"))
    b = side_b.select(
        F.col("doc_id").alias("id_b"),
        *[c for i, cb in enumerate(cols_b) for c in payload(F.col(cb), f"_b{i}")],
    )
    if broadcast_sides:
        a, b = F.broadcast(a), F.broadcast(b)
    scored = pairs.join(a, "id_a").join(b, "id_b")

    field_scores: list[Column] = []
    for i in range(len(cols_b)):
        total = None
        for name, w in weights.items():
            if name == "tfidf_cosine":
                continue
            if name == "jaro_winkler":
                feat = S.jaro_winkler(F.col("_txt_a"), F.col(f"_txt_b{i}"))
            elif name == "lev_norm":
                feat = S.levenshtein_norm(f"_txt_a", f"_txt_b{i}")
            elif name == "token_jaccard":
                feat = S.token_jaccard(F.col("_tok_a"), F.col(f"_tok_b{i}"))
            elif name == "int_jaccard":
                feat = S.token_jaccard(F.col("_toki_a"), F.col(f"_toki_b{i}"))
            else:
                raise KeyError(f"unknown feature {name!r}")
            piece = F.coalesce(feat, F.lit(0.0)) * F.lit(float(w))
            total = piece if total is None else total + piece
        field_scores.append(total if total is not None else F.lit(0.0))

    best = F.greatest(*field_scores) if len(field_scores) > 1 else field_scores[0]
    # winning column name: first field achieving the max (deterministic order)
    best_field = F.lit(cols_b[0])
    for i in reversed(range(len(cols_b))):
        best_field = F.when(field_scores[i] >= best, F.lit(cols_b[i])).otherwise(best_field)
    total = best
    if "tfidf_cosine" in weights:
        total = total + F.coalesce(F.col("tfidf_cosine"), F.lit(0.0)) * F.lit(float(weights["tfidf_cosine"]))
    drop = [c for c in scored.columns if c.startswith(("_txt", "_tok", "_toki"))]
    return scored.withColumn(score_col, total).withColumn("best_field", best_field).drop(*drop)


# ---------------------------------------------------------------------------
# compound-matcher composition (bool must/should semantics)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class Clause:
    """One single-query template: (bool_lvl, source proj, ref proj, channel,
    weight) — the 5-tuple of the reference (HOW_TO.md:124-133)."""

    bool_lvl: str  # 'must' | 'should'
    proj_a: str
    proj_b: str | tuple[str, ...]  # tuple = J2 multi_match over a ref column list
    channel: str
    weight: float = 1.0


def compose_matcher(clause_scores: list[tuple[Clause, DataFrame]], score_col: str = "score") -> DataFrame:
    """Combine per-clause score tables into one matcher score.

    Each input df: (id_a, id_b, clause_score). Musts intersect (inner join);
    shoulds left-join onto the must core and contribute when present.
    Total = Σ weight·score, exactly the additive bool-query scoring of the
    reference (must >=1 enforced, query_templates.py:113-116)."""
    musts = [(c, df) for c, df in clause_scores if c.bool_lvl == "must"]
    shoulds = [(c, df) for c, df in clause_scores if c.bool_lvl != "must"]
    if not musts:
        raise ValueError("a compound matcher needs >=1 must clause")
    acc: DataFrame | None = None
    terms: list[str] = []
    for i, (c, df) in enumerate(musts + shoulds):
        col = f"_cl{i}"
        d = df.select("id_a", "id_b", (F.col("clause_score") * F.lit(c.weight)).alias(col))
        acc = d if acc is None else acc.join(d, ["id_a", "id_b"], "inner" if c.bool_lvl == "must" else "left")
        terms.append(col)
    total = None
    for t in terms:
        piece = F.coalesce(F.col(t), F.lit(0.0))
        total = piece if total is None else total + piece
    return acc.select("id_a", "id_b", total.alias(score_col))
