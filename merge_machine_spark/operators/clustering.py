"""Transitive clustering: connected components over the match graph.

North-rule addition (the reference stops at 1:≤1 linkage; our engine resolves
symmetric matches into entity clusters). Algorithm: alternating
large-star / small-star iterations (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14) expressed as DataFrame self-joins — converges
in O(log² n) rounds on any graph, is skew-tolerant (no single reducer sees a
whole component), and needs no GraphFrames dependency.

Node ids are strings; the component label is the minimum id (lexicographic,
stable for fixed-width ids). Iteration state is localCheckpoint()ed each
round to cut lineage (or written to ``checkpoint_dir`` when provided —
the durable path used by the resumable pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon_edges(edges: DataFrame, a: str, b: str) -> DataFrame:
    """undirected edge set, canonical (u < v), no self-loops, distinct."""
    u = F.least(F.col(a), F.col(b))
    v = F.greatest(F.col(a), F.col(b))
    return edges.select(u.alias("u"), v.alias("v")).filter(F.col("u") != F.col("v")).distinct()


# Above this many edges the per-iteration star joins hint("shuffle_hash"):
# the mins aggregate is then ~|nodes| rows, and the planner's broadcast of
# it costs a SERIAL driver-side collect+build per star (2 per iteration)
# that anchors the loop — measured at 735k edges: 1.50s/iteration
# shuffle-hash vs 1.89s broadcast (and broadcast build cost grows with the
# graph while the shuffle parallelizes). Small graphs keep the planner's
# broadcast choice, which wins there. The threshold is a data-size bound
# (driver build cost), not a core-count tunable.
BIG_STAR_EDGES = 150_000


def _large_star(edges: DataFrame, big: bool = False) -> DataFrame:
    """For each node n and its neighborhood Γ(n): connect every strictly
    larger neighbor to m = min(Γ(n) ∪ {n}).

    Hub-safe formulation: m is a scalar ``groupBy(n).min(nbr)`` (map-side
    partial agg, no arrays), joined back to the per-edge rows and emitted
    row-wise. A 10^8-degree hub is 10^8 small rows spread across
    partitions, never one multi-GB ``collect_set`` row.

    ``big`` (r6): hint the node-scale mins aggregate shuffle-hash instead
    of letting the planner broadcast it (see BIG_STAR_EDGES). Output is NOT
    distinct'd (r6): the iteration boundary (_small_star's trailing
    distinct) canonicalizes, and duplicate intermediate rows only ride the
    next exchange instead of paying a dedup exchange here."""
    both = edges.select(F.col("u").alias("n"), F.col("v").alias("nbr")).unionAll(
        edges.select(F.col("v").alias("n"), F.col("u").alias("nbr"))
    )
    mins = both.groupBy("n").agg(F.min("nbr").alias("mn")).select(
        "n", F.least(F.col("mn"), F.col("n")).alias("m")
    )
    out = (
        both.join(mins.hint("shuffle_hash") if big else mins, "n")
        .filter(F.col("nbr") > F.col("n"))
        .select(F.col("nbr").alias("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v"))


def _small_star(edges: DataFrame, big: bool = False) -> DataFrame:
    """Orient edges big->small; for each node n connect all smaller
    neighbors (and n) to the minimum of them.

    Hub-safe: same min+join-back shape as ``_large_star`` — the per-group
    minimum is a scalar aggregate, emission is per-edge row-wise, plus one
    (n, m) row per group taken from the aggregate itself. Same ``big``
    join-strategy rule; the trailing distinct is the iteration's canonical
    dedup."""
    oriented = edges.select(F.greatest("u", "v").alias("n"), F.least("u", "v").alias("nbr"))
    mins = oriented.groupBy("n").agg(F.min("nbr").alias("m"))
    per_edge = oriented.join(mins.hint("shuffle_hash") if big else mins, "n").select(
        F.col("nbr").alias("x"), "m"
    )
    self_rows = mins.select(F.col("n").alias("x"), "m")
    out = per_edge.unionAll(self_rows)
    return (
        out.filter(F.col("x") != F.col("m"))
        .select(F.least("x", "m").alias("u"), F.greatest("x", "m").alias("v"))
        .distinct()
    )


def _star_stats(edges: DataFrame) -> tuple[int, bool]:
    """(edge count, is-star-forest) in one aggregate pass.

    The alternating-star fixpoint is exactly a star forest stored
    canonically (u=center=component min < v=leaf): every leaf appears in
    ONE edge (countDistinct(v) == count) and no node is both a center and
    a leaf (u-set and v-set disjoint, tested via |u|+|v| == |u ∪ v|).
    Testing the shape directly replaces the r5 signature-equality check,
    which could only observe convergence by running one full EXTRA
    iteration to see "no change" (r6 — saves a whole star round)."""
    both = edges.select(F.col("u").alias("x"), F.lit(0).alias("s")).unionAll(
        edges.select(F.col("v").alias("x"), F.lit(1).alias("s"))
    )
    row = both.agg(
        F.count(F.when(F.col("s") == 1, 1)).alias("n"),
        F.countDistinct(F.when(F.col("s") == 1, F.col("x"))).alias("dv"),
        F.countDistinct(F.when(F.col("s") == 0, F.col("x"))).alias("du"),
        F.countDistinct("x").alias("duv"),
    ).collect()[0]
    n, dv, du, duv = int(row["n"]), int(row["dv"]), int(row["du"]), int(row["duv"])
    return n, (dv == n) and (du + dv == duv)


def connected_components(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 3,
    assume_canonical: bool = False,
) -> DataFrame:
    """(id_a, id_b) match edges -> (doc_id, cluster_id) assignments.

    cluster_id = min doc_id of the component. Singletons (docs with no edge)
    are NOT emitted — callers union them back with cluster_id = own id
    (cheaper than dragging every isolated doc through the iteration; at
    10^12 docs singletons dominate and must never enter the shuffle).

    ``assume_canonical`` (r6): skip the initial dedup exchange when the
    caller guarantees edges are already distinct canonical pairs (a < b,
    no self-loops) — true for the resolve() pipeline, whose pairs come out
    of a groupBy. The iteration is dup-tolerant either way (the per-star
    min aggregates ignore multiplicity and each iteration's trailing
    distinct canonicalizes), so a wrong promise costs performance, not
    correctness."""
    spark = edges.sparkSession
    if assume_canonical:
        cur = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    else:
        cur = _canon_edges(edges, a, b)
    cur = cur.localCheckpoint(eager=True)
    n, done = _star_stats(cur)
    it = 0
    while not done:
        if it >= max_iter:
            raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
        # edge count from the stats pass picks the per-iteration join
        # strategy (BIG_STAR_EDGES)
        big = n >= BIG_STAR_EDGES
        nxt = _small_star(_large_star(cur, big=big), big=big)
        if checkpoint_dir is not None and (it + 1) % checkpoint_every == 0:
            path = f"{checkpoint_dir}/cc_iter_{it:03d}"
            nxt.write.mode("overwrite").parquet(path)
            nxt = spark.read.parquet(path)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        cur = nxt
        n, done = _star_stats(cur)
        it += 1
    # The loop exits only when _star_stats PROVED the edge set is a star
    # forest stored canonically (u=center=component min < v=leaf): every
    # leaf appears exactly once and no node is both center and leaf. Each
    # doc therefore appears exactly once in leaves ∪ distinct(centers) —
    # the defensive groupBy(doc_id).min() the r5 extraction paid (one more
    # exchange + aggregate over every clustered doc) is redundant (r6).
    roots = cur.select(F.col("u").alias("doc_id"), F.col("u").alias("cluster_id")).distinct()
    leaves = cur.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id"))
    return leaves.unionByName(roots)


def assignments_with_singletons(docs: DataFrame, assignments: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Union singleton docs back in with cluster_id = own doc_id."""
    singles = docs.select(F.col(id_col).alias("doc_id")).join(
        assignments.select("doc_id"), "doc_id", "left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
    return assignments.unionByName(singles)


def core_attach_clusters(
    scores: DataFrame,
    core_threshold: float,
    attach_threshold: float,
    a: str = "id_a",
    b: str = "id_b",
    score_col: str = "score",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Chain-safe two-tier clustering (robust transitive closure).

    Plain CC over every edge >= threshold lets ONE borderline pair between
    two entities merge both entire clusters — and the supply of borderline
    cross-entity pairs grows with corpus size, so single-threshold
    transitive closure loses precision as the data scales (measured: 13
    false cluster merges at 10k docs at the calibrated threshold, zero at
    1.5k docs). Two tiers fix the failure mode structurally:

      * CORE edges (score >= core_threshold) may MERGE clusters — they feed
        the alternating-star connected components.
      * WEAK edges (attach_threshold <= score < core_threshold) may only
        ATTACH a doc that has no core cluster to the cluster of its
        best-scoring core neighbor. Attachment never transfers
        connectivity: a weak edge can widen a cluster by one leaf but can
        never chain two entities together.
      * Docs left over after attachment pair up only when they are MUTUAL
        best weak neighbors (size-2 clusters, chain-free) — covers
        entities none of whose variants is clean enough for a core edge.

    Every pick is a min-of-struct scalar aggregate keyed by doc
    (map-side combinable, hub-safe, deterministic: highest score wins,
    ties to the smallest neighbor id) — no windows, no driver state. The
    extra cost over plain CC is three hash aggregates and two joins on the
    weak-edge subset, all on ids+score only.

    Returns (doc_id, cluster_id); singletons are NOT emitted (same contract
    as :func:`connected_components`)."""
    if attach_threshold > core_threshold:
        # an inverted config would silently CC-merge below the match
        # threshold (the weak band would be empty) — strictly worse
        # precision than plain CC, so fail loudly instead
        raise ValueError(
            f"attach_threshold ({attach_threshold}) must be <= core_threshold ({core_threshold})"
        )
    s = scores.select(
        F.least(F.col(a), F.col(b)).alias("u"),
        F.greatest(F.col(a), F.col(b)).alias("v"),
        F.col(score_col).alias("s"),
    ).filter(F.col("u") != F.col("v"))
    core = connected_components(
        s.filter(F.col("s") >= F.lit(core_threshold)), a="u", b="v",
        checkpoint_dir=checkpoint_dir,
        # scores are unique per (id_a < id_b) pair by construction
        # (groupBy'd candidate generation), so the canonicalized projection
        # is already distinct — skip the dedup exchange (r6)
        assume_canonical=True,
    )
    # Each tier below is referenced by several downstream branches; eager
    # localCheckpoints (the same state-cutting device connected_components
    # uses per iteration) materialize each ONCE so the assembled output plan
    # is scans + cheap joins, not a re-derivation of the scored-pair subtree
    # per branch. weak is the only pair-scale table (the [attach, core)
    # band); everything after it is doc-scale.
    weak = s.filter(
        (F.col("s") >= F.lit(attach_threshold)) & (F.col("s") < F.lit(core_threshold))
    ).localCheckpoint(eager=True)
    # directed view: every weak edge from each endpoint's perspective
    directed = weak.select(F.col("u").alias("src"), F.col("v").alias("dst"), "s").unionAll(
        weak.select(F.col("v").alias("src"), F.col("u").alias("dst"), "s")
    )
    uncored = directed.join(
        core.select(F.col("doc_id").alias("src")), "src", "left_anti"
    ).localCheckpoint(eager=True)
    # attach: best core-clustered neighbor per uncored doc
    to_core = uncored.join(
        core.select(F.col("doc_id").alias("dst"), "cluster_id"), "dst"
    )
    attached = (
        to_core.groupBy("src")
        .agg(F.min(F.struct((-F.col("s")).alias("ns"), F.col("dst"), F.col("cluster_id"))).alias("__b"))
        .select(F.col("src").alias("doc_id"), F.col("__b.cluster_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    # leftovers: weak edges between docs that are neither core nor attached.
    # (No dst-vs-core anti-join needed: a surviving src is unattached, so it
    # had NO uncored edge to a core dst — dst not in core follows.)
    floating = (
        uncored.join(attached.select(F.col("doc_id").alias("src")), "src", "left_anti")
        .join(attached.select(F.col("doc_id").alias("dst")), "dst", "left_anti")
    )
    best = (
        floating.groupBy("src")
        .agg(F.min(F.struct((-F.col("s")).alias("ns"), F.col("dst"))).alias("__b"))
        .select("src", F.col("__b.dst").alias("bdst"))
        .localCheckpoint(eager=True)
    )
    mutual = best.alias("x").join(
        best.alias("y"),
        (F.col("x.bdst") == F.col("y.src")) & (F.col("y.bdst") == F.col("x.src")),
    ).filter(F.col("x.src") < F.col("x.bdst"))
    pairs = mutual.select(
        F.col("x.src").alias("doc_id"), F.col("x.src").alias("cluster_id")
    ).unionAll(mutual.select(F.col("x.bdst").alias("doc_id"), F.col("x.src").alias("cluster_id")))
    return core.unionByName(attached).unionByName(pairs)


def cluster_score_stats(
    scores: DataFrame,
    assignments: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    score_col: str = "score",
) -> DataFrame:
    """Per-cluster match-count / score-distribution metrics — the
    observability table the resumable pipeline publishes next to its
    cluster assignments (north rule: "match-count/score-distribution
    metrics"; complements StageStore.partition_metrics, which covers the
    same per stage PARTITION rather than per entity cluster).

    Joins each scored pair to its endpoints' clusters, keeps intra-cluster
    pairs, and aggregates count/min/max/sum per cluster alongside the
    member count. Shapes: two doc-scale hash joins to label the pair ends,
    then ONE pair-scale shuffle keyed by cluster_id with scalar map-side
    combinable aggregates — hub-safe (a 10^8-member cluster is a running
    scalar agg, never an array). Clusters with members but no surviving
    intra-cluster scored pair (e.g. a pair attached through a since-pruned
    edge) report n_intra_pairs = 0 with NULL min/max/sum.

    Returns (cluster_id, n_members, n_intra_pairs, min_score, max_score,
    sum_score)."""
    ca = assignments.select(F.col("doc_id").alias(a), F.col("cluster_id").alias("_ca"))
    cb = assignments.select(F.col("doc_id").alias(b), F.col("cluster_id").alias("_cb"))
    intra = (
        scores.join(ca, a).join(cb, b)
        .filter(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_intra_pairs"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
            F.sum(score_col).alias("sum_score"),
        )
    )
    members = assignments.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return members.join(intra, "cluster_id", "left").select(
        "cluster_id",
        "n_members",
        F.coalesce("n_intra_pairs", F.lit(0)).alias("n_intra_pairs"),
        "min_score",
        "max_score",
        "sum_score",
    )


def canonical_per_cluster(
    docs: DataFrame,
    assignments: DataFrame,
    prefer_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick one canonical document per cluster: the member with the highest
    ``prefer_col`` (ties: lowest id). The keep-best half of near-dup dedup —
    after clustering, drop everything but the canonical representative.

    Returns (cluster_id, canonical_id, n_members, best_<prefer_col>). One
    shuffle on cluster_id; the pick is a plain max-struct aggregate (map-side
    partial, hub-safe — a 10^8-member cluster is a scalar agg, not an array).
    Negating the id inside the max-struct turns "lowest id" into the struct
    max's natural order, so no window/sort is needed."""
    from pyspark.sql.types import LongType

    j = assignments.select(F.col("doc_id").alias("__id"), "cluster_id").join(
        docs.select(F.col(id_col).alias("__id"), F.col(prefer_col).alias("__pref")), "__id"
    )
    neg_id = (
        -F.col("__id") if isinstance(j.schema["__id"].dataType, LongType) else F.col("__id")
    )
    # string ids: lowest id = lexicographic min; max-of-struct can't negate a
    # string, so fall back to (pref, reversed-rank-by-window-free trick) —
    # use min over a struct with inverted preference instead.
    if isinstance(j.schema["__id"].dataType, LongType):
        best = j.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max(F.struct(F.col("__pref"), neg_id.alias("__nid"))).alias("__b"),
        )
        return best.select(
            "cluster_id",
            (-F.col("__b.__nid")).alias("canonical_id"),
            "n_members",
            F.col("__b.__pref").alias(f"best_{prefer_col}"),
        )
    # generic path (string ids): min over (negated numeric preference is not
    # available either if pref is non-numeric) — use a two-pass max-then-min.
    mx = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"), F.max("__pref").alias(f"best_{prefer_col}")
    )
    winners = j.join(
        mx.select("cluster_id", F.col(f"best_{prefer_col}").alias("__pref")),
        ["cluster_id", "__pref"],
    )
    return (
        winners.groupBy("cluster_id")
        .agg(F.min("__id").alias("canonical_id"))
        .join(mx, "cluster_id")
        .select("cluster_id", "canonical_id", "n_members", f"best_{prefer_col}")
    )


def merge_clusters(
    docs: DataFrame,
    assignments: DataFrame,
    vote_cols: list[str],
    prefer_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Survivorship / golden-record merge: collapse each entity cluster to
    ONE clean output row — the dirty-to-clean endgame of record linkage
    (the reference's linkage produces matches; a consumer then merges them;
    cf. es_linker's 1:<=1 link output, merge_machine/es_linker.py).

    Field policy:
      * ``vote_cols``: per-cluster MAJORITY value (ties: smallest value) —
        e.g. lang, source, country. Computed as a (cluster, value) count
        then a min-of-struct((-count, value)) pick: one scalar aggregate,
        hub-safe (a 10^8-member cluster is never an array), map-side
        combinable, and deterministic.
      * ``prefer_col``: the canonical representative's pick via
        :func:`canonical_per_cluster` (highest value wins, ties lowest id)
        — e.g. keep the longest member's text.

    Returns (cluster_id, canonical_id, n_members, best_<prefer_col>,
    <c>_mode for each vote col). Shuffles: one per vote col keyed
    (cluster_id, value) + one on cluster_id each — all partial-agg
    combinable; no windows, no collects.
    """
    best = canonical_per_cluster(docs, assignments, prefer_col=prefer_col, id_col=id_col)
    a = assignments.select(F.col("doc_id").alias("__id"), "cluster_id")
    out = best
    for c in vote_cols:
        votes = (
            a.join(docs.select(F.col(id_col).alias("__id"), c), "__id")
            .groupBy("cluster_id", c)
            .agg(F.count(F.lit(1)).alias("__c"))
            .groupBy("cluster_id")
            .agg(F.min(F.struct((-F.col("__c")).alias("__neg"), F.col(c))).alias("__m"))
            .select("cluster_id", F.col(f"__m.{c}").alias(f"{c}_mode"))
        )
        out = out.join(votes, "cluster_id")
    return out


def pairwise_f1(assignments: DataFrame, truth: DataFrame) -> dict:
    """Pairwise precision/recall/F1 of predicted clusters vs ground truth.

    Both inputs: (doc_id, cluster_id) / (doc_id, entity_id). Computed
    set-theoretically on co-clustered pairs via self-joins (no collect)."""
    pred = assignments.select("doc_id", F.col("cluster_id").alias("c"))
    gold = truth.select("doc_id", F.col(truth.columns[1]).alias("e"))

    def n_pairs(df, key):
        sizes = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
        row = sizes.agg(F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("p")).collect()[0]
        return float(row["p"])

    joined = pred.join(gold, "doc_id").select("doc_id", "c", "e")
    both = joined.groupBy("c", "e").agg(F.count(F.lit(1)).alias("n"))
    row = both.agg(F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("p")).collect()[0]
    tp = float(row["p"])
    p_pred = n_pairs(joined.select("doc_id", "c"), "c")
    p_gold = n_pairs(joined.select("doc_id", "e"), "e")
    precision = tp / p_pred if p_pred else 1.0
    recall = tp / p_gold if p_gold else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"precision": precision, "recall": recall, "f1": f1, "tp_pairs": tp, "pred_pairs": p_pred, "gold_pairs": p_gold}
