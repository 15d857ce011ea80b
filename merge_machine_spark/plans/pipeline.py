"""End-to-end entity-resolution pipeline.

The flagship flow (SURVEY.md §3.3 step 11):

    documents -> text projections -> per-channel tokens
             -> fused blocking + TF-IDF scoring (one token join)
             -> pair similarity features (Arrow UDFs)
             -> composite matcher score -> match edges (threshold)
             -> connected components -> cluster assignments

Every stage checkpoints through :class:`~..sources.checkpoints.StageStore`
(candidate_pairs / pair_scores / match_edges / cluster_assignments) so a
killed run resumes at the last completed stage. Spans are never carried
through the pair plane — only ``doc_id`` travels; span sequences re-join at
the end by id, preserving the per-row span invariant by construction.

Linkage mode (dirty source -> clean ref, the reference's es_linker) lives in
:func:`link`; symmetric dedup/clustering (north rule) in :func:`resolve`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import release_tracked, track
from ..functions import analyzers as A
from ..functions.textproj import project_documents
from ..operators import cascade as C
from ..operators.blocking import BlockingReport, explode_tokens, lsh_candidate_pairs
from ..operators.clustering import (
    assignments_with_singletons, connected_components, core_attach_clusters)
from ..operators.scoring import fused_pair_features_best_field, payload_pair_features, tfidf_cosine_pairs
from ..sources.checkpoints import StageStore


@dataclass
class ResolveConfig:
    """Declarative matcher config — the analog of the reference's
    ``match_cols`` + ``columns_to_index`` + learned params."""

    # text projections over spans: name -> text-span index (None = full text)
    projections: dict = field(default_factory=lambda: {"full_text": None})
    # blocking/scoring channel for the TF-IDF join
    block_channel: str = "french_estab"
    block_proj: str = "full_text"
    max_df: int | None = 256
    # extra LSH candidate channel over 3-gram shingles
    use_lsh: bool = False
    lsh_bands: int = 16
    lsh_rows: int = 4
    # pair feature weights (composite score = Σ w_f · f)
    weights: dict = field(
        default_factory=lambda: {
            "tfidf_cosine": 0.40,
            "jaro_winkler": 0.20,
            "token_jaccard": 0.20,
            "int_jaccard": 0.20,
        }
    )
    threshold: float = 0.5
    # chain-safe clustering (core_attach_clusters): edges >= core_threshold
    # may MERGE clusters; edges in [threshold, core_threshold) only ATTACH a
    # doc to its best core neighbor's cluster. None = plain single-threshold
    # connected components (the historical behavior).
    core_threshold: float | None = None
    # cascade scoring: pairs below this cheap TF-IDF floor never reach the
    # expensive (Python-side) features — at 100 TB the JW/feature UDFs are
    # the cost center, and a pair whose TF-IDF is near zero cannot clear the
    # final threshold anyway (max non-tfidf contribution < threshold).
    prefilter_tfidf: float = 0.10
    # Jaro-Winkler operates on a bounded prefix: O(len^2) per pair, and the
    # discriminating signal saturates well before 96 chars.
    jw_prefix: int = 96
    # Broadcast the per-doc feature payload (None = auto when n_docs small
    # enough); keeps token arrays/texts out of the pair shuffle. The payload
    # runs ~250 B/doc (96-char text prefix + distinct token arrays).
    # r6 re-measured the trade at 600k docs with the payload built from the
    # persisted analyzed cache: broadcast-both 8.3s vs co-partition 13.1s —
    # the co-partition path ships the a-side payload THROUGH the id_b pair
    # exchange (1.28 GB at 4.78M pairs, 10x the next-largest shuffle, guide
    # §8), while the broadcast build off the cache is seconds, not the ~60s
    # r4 measured when the build re-ran the un-persisted analyzer. 1M docs
    # ~= 250 MiB per side — the guide's "few hundred MB is fine" broadcast
    # range; beyond it the payload co-partitions through the pair shuffle
    # instead (the only shape that scales to 10^9+ docs).
    broadcast_sides: bool | None = None
    broadcast_max_docs: int = 1_000_000
    n_docs_hint: int | None = None


def _pair_scores(proj: DataFrame, cfg: ResolveConfig, n_docs: int) -> DataFrame:
    """Candidate generation fused with TF-IDF + similarity features.

    The block-channel analyzer (a pandas UDF for the French channels — the
    single most expensive per-doc op) runs ONCE per doc: the analyzed token
    array is cached and feeds BOTH the TF-IDF token table and the
    token_jaccard payload."""
    analyzed_cols = [F.col("doc_id"), A.analyze(cfg.block_proj, cfg.block_channel).alias("_rawtok")]
    if "jaro_winkler" in cfg.weights or "lev_norm" in cfg.weights:
        txt = F.col(cfg.block_proj)
        analyzed_cols.append((F.substring(txt, 1, cfg.jw_prefix) if cfg.jw_prefix else txt).alias("_txt"))
    if "int_jaccard" in cfg.weights:
        analyzed_cols.append(F.array_distinct(A.analyze(cfg.block_proj, "integers")).alias("_toki"))
    analyzed = track(proj.select(*analyzed_cols).persist())

    # Per-doc term frequencies with ZERO exchange (r6, guide §2.4): the
    # generic explode_tokens(with_tf=True) pays a full (id, token) groupBy
    # shuffle over the exploded table (~7M rows at 600k docs) whose partial
    # aggregation barely reduces anything (tokens are mostly unique within a
    # doc+partition). tf is a per-document quantity — compute it per row
    # over the cached _rawtok attribute and explode the result. Identical
    # (id, token, tf) rows. (Only valid over a concrete column: HOF lambdas
    # cannot wrap Python-UDF expressions, so generic explode_tokens keeps
    # the groupBy shape for analyzer-expression callers.)
    tf_pairs = F.transform(
        F.array_distinct(F.col("_rawtok")),
        lambda t: F.struct(
            t.alias("token"),
            F.size(F.filter(F.col("_rawtok"), lambda x: x == t)).cast("bigint").alias("tf"),
        ),
    )
    tok = analyzed.select(
        F.col("doc_id").alias("id"), F.explode(tf_pairs).alias("_p")
    ).select("id", F.col("_p.token").alias("token"), F.col("_p.tf").alias("tf"))
    pairs = tfidf_cosine_pairs(tok, max_df=cfg.max_df, n_docs=n_docs)
    if cfg.use_lsh:
        # LSH-sourced pairs carry provenance: the whole point of the channel
        # is near-dups that share NO surviving block-channel token (their
        # tfidf_cosine is 0), so they must be exempt from the TF-IDF
        # prefilter below — otherwise the channel is silently dead.
        # n_grams_fast: token-stream-identical Arrow expansion (analyzers.py
        # r6) — the shingles are exploded inside lsh_candidate_pairs, the
        # exact context the fast variant is for.
        lsh = lsh_candidate_pairs(
            proj, "doc_id", A.n_grams_fast(F.col(cfg.block_proj)), bands=cfg.lsh_bands, rows=cfg.lsh_rows
        )
        pairs = (
            pairs.select("id_a", "id_b", "tfidf_cosine", F.lit(False).alias("_from_lsh"))
            .unionByName(
                lsh.select("id_a", "id_b", F.lit(0.0).alias("tfidf_cosine"), F.lit(True).alias("_from_lsh"))
            )
            .groupBy("id_a", "id_b")
            .agg(F.max("tfidf_cosine").alias("tfidf_cosine"), F.max("_from_lsh").alias("_from_lsh"))
        )
    if cfg.prefilter_tfidf:
        keep = F.col("tfidf_cosine") >= F.lit(cfg.prefilter_tfidf)
        if cfg.use_lsh:
            keep = keep | F.col("_from_lsh")
        pairs = pairs.filter(keep)
    if cfg.use_lsh:
        pairs = pairs.drop("_from_lsh")

    # Payload-through-the-pair-plane is the shuffle that kills scaling:
    # analyze per doc, broadcast the payload (when it fits), shuffle ids only.
    # Beyond broadcastable size, bucket/co-partition both sides by doc_id.
    broadcast = cfg.broadcast_sides is True or (cfg.broadcast_sides is None and n_docs <= cfg.broadcast_max_docs)
    payload_cols = [F.col("doc_id")]
    if "jaro_winkler" in cfg.weights or "lev_norm" in cfg.weights:
        payload_cols.append(F.col("_txt"))
    if "token_jaccard" in cfg.weights:
        payload_cols.append(F.array_distinct(F.col("_rawtok")).alias("_tok"))
    if "int_jaccard" in cfg.weights:
        payload_cols.append(F.col("_toki"))
    payload = analyzed.select(*payload_cols)
    return payload_pair_features(pairs, payload, payload, cfg.weights, broadcast_sides=broadcast)


def resolve(
    spark: SparkSession,
    documents: DataFrame,
    cfg: ResolveConfig | None = None,
    checkpoint_dir: str | None = None,
    run_id: str = "run",
    resume: bool = True,
) -> dict[str, DataFrame]:
    """Symmetric dedup/clustering over one documents table.

    Returns {'projected', 'pair_scores', 'match_edges', 'cluster_assignments'}
    DataFrames; when ``checkpoint_dir`` is set each is a durable checkpointed
    table and the run resumes after the last completed stage."""
    cfg = cfg or ResolveConfig()
    store = StageStore(checkpoint_dir, run_id) if checkpoint_dir else None
    try:
        return _resolve_body(spark, documents, cfg, store, checkpoint_dir, run_id, resume)
    finally:
        # Success AND error path: both branches have materialized the scores
        # subtree by the return (store: parquet write; no-store:
        # connected_components' eager iteration pulls edges -> scores through
        # the cache) — drop the persisted intermediates (analyzed payload,
        # tf-idf self-join subtree) so repeated resolve() calls in one
        # session don't accumulate executor storage (VERDICT r2 #4), and an
        # exception mid-run can't leave entries for a later call to drain
        # (ADVICE r3).
        release_tracked()


def _resolve_body(spark, documents, cfg, store, checkpoint_dir, run_id, resume):
    proj = project_documents(documents, cfg.projections)
    if store:
        proj = store.get_or_compute(spark, "projected", lambda: proj, resume=resume)
    else:
        proj = proj.cache()
    n_docs = cfg.n_docs_hint or proj.count()

    def compute_scores() -> DataFrame:
        return _pair_scores(proj, cfg, n_docs)

    if store:
        scores = store.get_or_compute(spark, "pair_scores", compute_scores, score_col="score", resume=resume)
    else:
        scores = compute_scores().cache()

    edges = scores.filter(F.col("score") >= F.lit(cfg.threshold)).select("id_a", "id_b")
    if store:
        edges = store.get_or_compute(spark, "match_edges", lambda: edges, resume=resume)

    def compute_clusters() -> DataFrame:
        cc_dir = f"{checkpoint_dir}/{run_id}/_cc_iters" if checkpoint_dir else None
        if cfg.core_threshold is not None:
            assign = core_attach_clusters(
                scores, cfg.core_threshold, cfg.threshold, checkpoint_dir=cc_dir
            )
        else:
            # candidate pairs come out of a groupBy with id_a < id_b, so
            # the edge set is already distinct canonical — skip CC's dedup
            # exchange (r6)
            assign = connected_components(edges, checkpoint_dir=cc_dir, assume_canonical=True)
        return assignments_with_singletons(proj, assign)

    if store:
        clusters = store.get_or_compute(spark, "cluster_assignments", compute_clusters, resume=resume)
    else:
        clusters = compute_clusters()
    out = {"projected": proj, "pair_scores": scores, "match_edges": edges, "cluster_assignments": clusters}
    if store:
        # north rule: the checkpointed run also publishes match-count /
        # score-distribution metrics at entity-cluster grain (partition
        # grain is already in every stage manifest). One pair-scale shuffle
        # keyed by cluster_id; resumes like any other stage.
        from ..operators.clustering import cluster_score_stats

        out["cluster_metrics"] = store.get_or_compute(
            spark, "cluster_metrics", lambda: cluster_score_stats(scores, clusters), resume=resume
        )
    return out


# ---------------------------------------------------------------------------
# global must / must_not filters (P3/P4)
# ---------------------------------------------------------------------------
# The reference applies every global filter at these three analyzers
# (DEFAULT_FILTER_FIELDS = ['.standard', '.french_estab', '.english'],
# /root/reference/merge_machine/helpers.py:106): must_not excludes a row when
# ANY channel's tokens overlap (one must_not clause per analyzer in the ES
# bool query = OR), must keeps a row only when the phrase matches at EVERY
# channel (one filter clause per analyzer = AND).
DEFAULT_FILTER_CHANNELS: tuple[str, ...] = ("standard", "french_estab", "english")


def _analyze_literal(spark: SparkSession, text: str, channel: str) -> list[str]:
    """Analyzed tokens of a literal string (one-row job — filters are set up
    once per link, never per data row)."""
    row = spark.range(1).select(A.analyze(F.lit(text), channel).alias("t")).collect()[0]
    return list(row["t"] or [])


def apply_global_filters(
    spark: SparkSession,
    ref: DataFrame,
    must: dict[str, list[str]] | None = None,
    must_not: dict[str, list[str]] | None = None,
    channels: tuple[str, ...] = DEFAULT_FILTER_CHANNELS,
) -> DataFrame:
    """P3/P4 global filters as an engine API (reference HOW_TO.md:138-141;
    applied to every search body in helpers.py:145-148).

    ``must_not``: {ref column: [words...]} — a ref row is EXCLUDED when its
    analyzed tokens share any token with the analyzed values (ES ``match``
    with operator=or at any of the filter analyzers).
    ``must``: {ref column: [phrases...]} — a ref row is KEPT only when every
    phrase's analyzed token sequence appears contiguously in the row's token
    stream (ES ``match_phrase`` in the bool filter, AND semantics).

    Default ``channels`` mirrors the reference's DEFAULT_FILTER_FIELDS
    (standard + french_estab + english — helpers.py:106), including its
    cross-analyzer combination semantics (must_not ORs across channels,
    must ANDs)."""
    out = ref
    for col, values in (must_not or {}).items():
        if not values:
            continue
        for ch in channels:
            bad = _analyze_literal(spark, " ".join(values), ch)
            if not bad:
                continue
            out = out.filter(
                ~F.arrays_overlap(A.analyze(col, ch), F.array(*[F.lit(t) for t in bad]))
            )
    for col, values in (must or {}).items():
        for v in values:
            for ch in channels:
                ptoks = _analyze_literal(spark, v, ch)
                if not ptoks:
                    continue
                stream = F.concat(F.lit(" "), F.array_join(A.analyze(col, ch), " "), F.lit(" "))
                out = out.filter(stream.contains(" " + " ".join(ptoks) + " "))
    return out


def _tier_candidate_pairs(small_source, ref, proj_a, proj_b, channel, max_df, n_ref):
    """Candidate generation for one tier. ``proj_b`` may be a LIST of ref
    columns (J2 multi_match): per-field TF-IDF cosines are union-maxed —
    best-field retrieval, one token join per field."""
    cols_b = list(proj_b) if isinstance(proj_b, (list, tuple)) else [proj_b]
    tok_a = explode_tokens(small_source, "doc_id", A.analyze(proj_a, channel), with_tf=True)
    per_field = []
    for cb in cols_b:
        tok_b = explode_tokens(ref, "doc_id", A.analyze(cb, channel), with_tf=True)
        per_field.append(tfidf_cosine_pairs(tok_a, tok_b, max_df=max_df, n_docs=n_ref))
    pairs = per_field[0]
    for p in per_field[1:]:
        pairs = pairs.unionByName(p)
    if len(per_field) > 1:
        pairs = pairs.groupBy("id_a", "id_b").agg(F.max("tfidf_cosine").alias("tfidf_cosine"))
    return pairs, cols_b


def link(
    spark: SparkSession,
    source: DataFrame,
    ref: DataFrame,
    tiers: list[dict],
    exact_pairs: DataFrame | None = None,
    non_matching_pairs: DataFrame | None = None,
    match_cols: list[str] | None = None,
    must: dict[str, list[str]] | None = None,
    must_not: dict[str, list[str]] | None = None,
    filter_channels: tuple[str, ...] = DEFAULT_FILTER_CHANNELS,
) -> DataFrame:
    """Asymmetric linkage (the reference's production query, es_match.py:241-417).

    ``source``/``ref``: flat string-column DataFrames with a ``doc_id``.
    ``tiers``: priority-ordered matcher configs, each
      {proj_a, proj_b, channel, weights: {feature: w}, threshold, max_df};
      ``proj_b`` may be a list of ref columns (J2 multi_match best-field).
    ``must``/``must_not``: global ref-side filters (P3/P4) applied before any
    tier search — excluded ref rows can never match.
    Returns the reference output contract (FIXTURES.md §4): source columns +
    __IS_MATCH __ID_REF __ID_QUERY __SIM_SCORE __THRESH __CONFIDENCE
    __SOURCE_GROUP + ref columns suffixed __REF."""
    match_cols = match_cols or [t["proj_a"] for t in tiers]
    small_source, group_map, did_dedup = C.deduplicate_source(source, match_cols)
    ref_f = apply_global_filters(spark, ref, must, must_not, channels=filter_channels)

    n_ref = ref_f.count()
    try:
        tier_best, tier_means, thresholds = [], [], []
        for t in tiers:
            pairs, cols_b = _tier_candidate_pairs(
                small_source, ref_f, t["proj_a"], t["proj_b"], t["channel"], t.get("max_df", 256), n_ref
            )
            scored = track(fused_pair_features_best_field(
                pairs, small_source, ref_f, t["proj_a"], cols_b,
                channel=t["channel"], weights=t["weights"], jw_prefix=t.get("jw_prefix", 96),
                broadcast_sides=t.get("broadcast_sides", True),
            ).cache())
            tier_best.append(C.top1_per_source(scored.select("id_a", "id_b", "score")))
            tier_means.append(float(scored.agg(F.avg("score")).collect()[0][0] or 1.0))
            thresholds.append(float(t["threshold"]))

        picked = C.cascade_pick(tier_best, thresholds, tier_means)
        picked = C.apply_overrides(picked, exact_pairs, non_matching_pairs)
        # picked is one small row per deduped source doc: pin it (cuts
        # lineage, materializes off the per-tier caches) before the finally
        # drops those caches (error path included — ADVICE r3).
        picked = picked.localCheckpoint(eager=True)
    finally:
        release_tracked()
    return C.link_output(source, ref, picked, group_map)


def link_with_params(
    spark: SparkSession,
    source: DataFrame,
    ref: DataFrame,
    params: dict | str,
    max_df: int | None = 256,
    filter_channels: tuple[str, ...] = DEFAULT_FILTER_CHANNELS,
) -> DataFrame:
    """Run a learned-params blob (L14 export_params / load_params shape,
    FIXTURES.md §3) end-to-end: compound templates become the cascade tiers
    (clause score = per-channel TF-IDF cosine composed with bool must/should
    semantics via compose_matcher), global must/must_not filters are honored,
    and labelled exact / non-matching pairs override (P5/P6)."""
    from ..operators.scoring import compose_matcher
    from .calibration import load_params

    cascade, cfg = load_params(params)
    if not cascade:
        raise ValueError("params blob has no learned queries")
    match_cols = sorted({c.proj_a for t in cascade for c in t.clauses})
    small_source, group_map, _ = C.deduplicate_source(source, match_cols)
    ref_f = apply_global_filters(
        spark, ref, cfg.get("must") or None, cfg.get("must_not") or None, channels=filter_channels
    )
    n_ref = ref_f.count()

    try:
        tier_best, tier_means, thresholds = [], [], []
        for t in cascade:
            clause_tables = []
            for c in t.clauses:
                pairs, _ = _tier_candidate_pairs(
                    small_source, ref_f, c.proj_a, c.proj_b, c.channel, max_df, n_ref
                )
                clause_tables.append((c, pairs.select("id_a", "id_b", F.col("tfidf_cosine").alias("clause_score"))))
            scored = track(compose_matcher(clause_tables).cache())
            tier_best.append(C.top1_per_source(scored))
            tier_means.append(float(scored.agg(F.avg("score")).collect()[0][0] or 1.0))
            thresholds.append(float(t.thresh))

        picked = C.cascade_pick(tier_best, thresholds, tier_means)
        ex = cfg.get("exact_pairs") or None
        nm = cfg.get("non_matching_pairs") or None
        # reference-style params blobs carry int source ids
        # (learned_settings.json exact_pairs like [[956, "123"]]) — coerce
        # both sides to str
        mk_pairs = lambda rows: spark.createDataFrame(
            [(str(a), str(b)) for a, b in rows], "id_a string, id_b string"
        )
        picked = C.apply_overrides(
            picked, mk_pairs(ex) if ex else None, mk_pairs(nm) if nm else None
        )
        picked = picked.localCheckpoint(eager=True)
    finally:
        release_tracked()
    return C.link_output(source, ref, picked, group_map)
