"""Calibration — driver-side port of the reference's learning machinery.

The reference learns which weighted combination of (column-pairing, analyzer,
boost) clauses discriminates matches, by labelling pairs and computing
per-template precision/recall/threshold curves (SURVEY.md §2.10, L1-L14;
/root/reference/merge_machine/es_labeller.py). All of it operates on <=~100
labelled source rows x a template list — calibration, not data-plane work —
so it runs in pandas on the driver, while the searches it needs (candidate
scores for labelled pairs) come from one DataFrame job collected via Arrow.

Ported semantics:
  L1  template enumeration            -> :func:`enumerate_templates`
  L2  dominated-analyzer pruning      -> :func:`prune_dominated`
  L5  threshold + P/R + custom score  -> :func:`compute_metrics` (verbatim
      port of es_labeller.py:307-417 incl. the f_p/f_r shapes,
      MIN_OBSERVATIONS=4 and the idx/thresh selection rule)
  L6  precision filter                -> :func:`filter_by_precision`
  T1/T3 sort + truncate to cascade    -> :func:`calibrate_cascade`
  L14 export params                   -> :func:`export_params` /
      :func:`load_params` (JSON shape of FIXTURES.md §3, mirroring
      examples/data_1/learned_settings.json)
  J7  unique-key auto-label           -> :func:`auto_label`

  L6  core filter                     -> :func:`filter_by_core` (+ the
      precision floor in :func:`filter_by_precision`)
  L7  expansion schedules             -> :func:`expand_by_core` /
      :func:`expand_by_boost` / :func:`calibrate_cascade_adaptive`
      (es_labeller.py:2114-2267, 420-499 re-expressed for batch: with all
      labels known up front, every schedule step whose positive-label
      trigger is reached applies once, in the reference's order)

Interactive-only machinery (L9 proposal policy, L12 undo, L13 custom search)
belongs to the reference's console labeller and is out of scope for the
batch engine (SURVEY.md §7.3: the unique-key oracle replaces the human).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.scoring import Clause

MIN_OBSERVATIONS = 4  # es_labeller.py:389


def compute_metrics(
    scores: np.ndarray,
    first_is_match: np.ndarray,
    has_results: np.ndarray | None = None,
    t_p: float = 0.95,
    t_r: float = 0.3,
) -> tuple[float, float, float, float]:
    """Optimal threshold + precision/recall/custom-score for one matcher.

    Inputs are per-*source-row* summaries (best-hit score, whether that best
    hit is a true match, whether any hit came back). Returns
    (thresh, precision, recall, score). Sort desc by score; rolling
    precision = cumsum(first_is_match)/min(rank, #has_results); rolling
    recall = cumsum/n; custom score f_p(p)·f_r(r) with
    f_p(x) = (2·max(x−t_p,0) + min(t_p·(x/t_p)^4, t_p))^1.5 / 2 and
    f_r(x) = max(x−t_r,0) + min(t_r·(x/t_r)^4, t_r); threshold = score at the
    argmax index (last argmax wins), floored at MIN_OBSERVATIONS, with the
    ~0 threshold when the best index is the full set.

    ``t_p`` defaults to 0.95 — the reference's *effective* TARGET_PRECISION
    (es_labeller.py:743, 1321-1327 pass 0.95 at every call site; the unused
    compute_metrics signature default there is 0.965)."""
    scores = np.asarray(scores, dtype="float64")
    first_is_match = np.asarray(first_is_match, dtype="bool")
    if has_results is None:
        has_results = np.ones(len(scores), dtype="bool")
    has_results = np.asarray(has_results, dtype="bool")
    n = len(scores)
    if n == 0 or first_is_match.sum() == 0:
        return 1000.0, 0.0, 0.0, 0.0
    order = np.argsort(-scores, kind="stable")
    s, m, h = scores[order], first_is_match[order], has_results[order]
    num_has_results = int(h.sum())
    assert m[~h].sum() == 0, "a no-result row cannot have a matching first hit"
    rolling_precision = m.cumsum() / np.minimum(np.arange(n) + 1, max(num_has_results, 1))
    rolling_recall = m.cumsum() / n

    def f_p(x: float) -> float:
        return (2 * max(x - t_p, 0) + min(t_p * (x / t_p) ** 4, t_p)) ** 1.5 / 2

    def f_r(x: float) -> float:
        return max(x - t_r, 0) + min(t_r * (x / t_r) ** 4, t_r)

    rolling_score = np.array([f_p(p) for p in rolling_precision]) * np.array([f_r(r) for r in rolling_recall])
    idx = max(n - int(rolling_score[::-1].argmax()) - 1, min(MIN_OBSERVATIONS, n - 1))
    thresh = 0.0001 if idx == n - 1 else float(s[idx])
    return thresh, float(rolling_precision[idx]), float(rolling_recall[idx]), float(rolling_score[idx])


# ---------------------------------------------------------------------------
# template enumeration (L1) + pruning (L2)
# ---------------------------------------------------------------------------
# Analyzer dominance order within one column pairing (query_templates.py:130-196
# semantics: when a template holds two clauses on the same pairing, the more
# specific analyzer wins and the generic one is dropped).
ANALYZER_PRIORITY = ["french_estab", "french", "special_keyword", "phonetic", "n_grams", "standard"]
# channels that may also appear as optional 'should' clauses
SHOULD_CHANNELS = {"integers", "city"}  # es_labeller.py:738-739


@dataclass
class Template:
    """A compound matcher: >=1 must clause (+ optional shoulds) plus learned
    threshold/metrics (the reference's CompoundQueryTemplate + best_thresh)."""

    clauses: list[Clause]
    thresh: float = 1000.0
    precision: float = 0.0
    recall: float = 0.0
    score: float = 0.0
    # A5 inclusion ratio (es_labeller.py:408): share of labelled source rows
    # where ANY of the template's candidates is the true match (not just the
    # best-scoring one) — how often the template *retrieves* the answer.
    inclusion_ratio: float = 0.0

    def key(self) -> tuple:
        # str(proj_b): multi_match clauses carry a tuple of ref columns,
        # which must sort stably against plain-string pairings
        return tuple(sorted((c.bool_lvl, c.proj_a, str(c.proj_b), c.channel, c.weight) for c in self.clauses))


def enumerate_templates(
    pairings: list[tuple[str, str]],
    channels: list[str],
    max_levels: int = 3,
    weights: tuple[float, ...] = (1.0,),
) -> list[Template]:
    """L1 (es_labeller.py:67-153): singles = pairing x channel x bool level
    (should only for SHOULD_CHANNELS) x weight; compounds = all combinations
    of 2..max_levels singles with >=1 must and, when >1 pairing exists,
    >=2 distinct pairings."""
    singles: list[Clause] = []
    for pa, pb in pairings:
        for ch in channels:
            for w in weights:
                singles.append(Clause("must", pa, pb, ch, w))
                if ch in SHOULD_CHANNELS:
                    singles.append(Clause("should", pa, pb, ch, w))
    out: list[Template] = [Template([c]) for c in singles if c.bool_lvl == "must"]
    for k in range(2, max_levels + 1):
        for combo in combinations(singles, k):
            musts = [c for c in combo if c.bool_lvl == "must"]
            if not musts:
                continue
            pairs_used = {(c.proj_a, c.proj_b) for c in combo}
            if len(pairings) > 1 and len(pairs_used) < 2:
                continue
            if len({(c.proj_a, c.proj_b, c.channel) for c in combo}) < len(combo):
                continue  # same clause twice at different bool level
            out.append(Template(list(combo)))
    # dedupe by canonical key
    seen: set[tuple] = set()
    uniq = []
    for t in out:
        if t.key() not in seen:
            seen.add(t.key())
            uniq.append(t)
    return uniq


def prune_dominated(templates: list[Template]) -> list[Template]:
    """L2: within a template, if two clauses cover the same pairing, keep the
    highest-priority analyzer only; drop templates that collapse to dupes."""
    pri = {ch: i for i, ch in enumerate(ANALYZER_PRIORITY)}
    out, seen = [], set()
    for t in templates:
        best: dict[tuple, Clause] = {}
        for c in t.clauses:
            k = (c.bool_lvl, c.proj_a, c.proj_b)
            cur = best.get(k)
            if cur is None or pri.get(c.channel, 99) < pri.get(cur.channel, 99):
                best[k] = c
        nt = Template(sorted(best.values(), key=lambda c: (c.bool_lvl, c.proj_a, str(c.proj_b), c.channel)))
        if not any(c.bool_lvl == "must" for c in nt.clauses):
            continue
        if nt.key() not in seen:
            seen.add(nt.key())
            out.append(nt)
    return out


# ---------------------------------------------------------------------------
# calibration over a labelled pair-feature table
# ---------------------------------------------------------------------------
def template_pair_scores(pdf: pd.DataFrame, template: Template, clause_col) -> pd.Series:
    """Score every labelled candidate pair under ``template``.

    ``pdf`` columns: id_a, id_b, label + one feature column per
    (proj_a, proj_b, channel) named by ``clause_col(clause)``. A pair is in
    the template's candidate set iff every must clause has a non-null,
    positive feature (the analog of 'retrieved by the must query'); shoulds
    add score when present."""
    total = pd.Series(0.0, index=pdf.index)
    in_cand = pd.Series(True, index=pdf.index)
    for c in template.clauses:
        col = clause_col(c)
        v = pdf[col].astype("float64")
        if c.bool_lvl == "must":
            in_cand &= v.notna() & (v > 0)
            total += v.fillna(0.0) * c.weight
        else:
            total += v.fillna(0.0) * c.weight
    return total.where(in_cand, np.nan)


def calibrate_template(
    pdf: pd.DataFrame, template: Template, clause_col, t_p: float = 0.95, t_r: float = 0.3
) -> Template:
    """L5 applied to one template: per source row take the best-scoring
    candidate pair, derive (score, first_is_match, has_results), learn the
    threshold. Label semantics: 'y' -> match, 'n' -> not, 'f' (forget) rows
    are excluded (es_labeller sentinel handling, L4)."""
    d = pdf[pdf["label"].isin(["y", "n"])].copy()
    d["_score"] = template_pair_scores(d, template, clause_col)
    summaries = []
    any_is_match = []
    for _, grp in d.groupby("id_a", sort=False):
        cand = grp[grp["_score"].notna()]
        if len(cand):
            best = cand.loc[cand["_score"].idxmax()]
            summaries.append((float(best["_score"]), best["label"] == "y", True))
            any_is_match.append(bool((cand["label"] == "y").any()))
        else:
            # no candidate for this row under this template
            summaries.append((0.0, False, False))
            any_is_match.append(False)
    if not summaries:
        return template
    thresh, precision, recall, score = compute_metrics(
        np.array([x[0] for x in summaries]),
        np.array([x[1] for x in summaries]),
        np.array([x[2] for x in summaries]),
        t_p=t_p,
        t_r=t_r,
    )
    inclusion = float(np.mean(any_is_match))  # A5, es_labeller.py:408
    return Template(template.clauses, thresh, precision, recall, score, inclusion)


def filter_by_precision(templates: list[Template], num_positives: int, min_keep: int = 3) -> list[Template]:
    """L6 precision floor schedule (es_labeller.py:2093-2130): >=0.5 after 20
    positive labels, 0.4 after 10, 0.3 after 5; always keep >= min_keep."""
    if num_positives >= 20:
        floor = 0.5
    elif num_positives >= 10:
        floor = 0.4
    elif num_positives >= 5:
        floor = 0.3
    else:
        floor = 0.0
    kept = [t for t in templates if t.precision >= floor]
    if len(kept) < min_keep:
        kept = sorted(templates, key=lambda t: -t.score)[:min_keep]
    return kept


def calibrate_cascade(
    pdf: pd.DataFrame,
    templates: list[Template],
    clause_col,
    max_queries: int = 3,
    t_p: float = 0.95,
    t_r: float = 0.3,
) -> list[Template]:
    """Calibrate every template, apply the precision filter, sort by custom
    score desc (T1) and truncate to the link-time cascade of
    ``max_queries`` (T3; es_match.py:297 uses 3)."""
    scored = [calibrate_template(pdf, t, clause_col, t_p=t_p, t_r=t_r) for t in templates]
    n_pos = int((pdf["label"] == "y").sum())
    scored = filter_by_precision(scored, n_pos)
    scored.sort(key=lambda t: -t.score)
    return scored[:max_queries]


def calibrate_cascade_greedy(
    pdf: pd.DataFrame,
    templates: list[Template],
    clause_col,
    max_queries: int = 3,
    t_p: float = 0.95,
    t_r: float = 0.3,
) -> list[Template]:
    """L10 greedy set-cover ordering — the reference's
    ``_iterative_metrics_and_sort`` (es_labeller.py:1351-1430): pick the
    best-scoring template over the STILL-UNCOVERED source rows, mark the
    rows its learned threshold covers as matched, re-score the remaining
    templates on the residual, repeat. Stops when the residual is <=3 rows
    (after the first pick), a pick stops improving on its predecessor, or
    ``min(max((positives-4)//2, 1), max_queries)`` picks are made; unpicked
    templates append after, sorted by full-set score. This beats plain
    sort-by-score (L10's default METHOD) when the best templates cover
    overlapping subsets."""
    d = pdf[pdf["label"].isin(["y", "n"])]
    n_pos = int((d["label"] == "y").sum())
    scored_full = [calibrate_template(d, t, clause_col, t_p=t_p, t_r=t_r) for t in templates]
    scored_full.sort(key=lambda t: -t.score)
    max_iterations = min(max((n_pos - 4) // 2, 1), max_queries)

    unmatched = set(dict.fromkeys(d["id_a"]))
    ordered: list[Template] = []
    remaining = list(scored_full)
    for i in range(min(max_iterations, len(remaining))):
        if not unmatched or (len(unmatched) <= 3 and i > 0):
            break
        residual = d[d["id_a"].isin(unmatched)]
        rescored = [calibrate_template(residual, t, clause_col, t_p=t_p, t_r=t_r) for t in remaining]
        best_i = max(range(len(rescored)), key=lambda j: rescored[j].score)
        best = rescored[best_i]
        if ordered and best.score < ordered[-1].score:
            break
        remaining.pop(best_i)
        ordered.append(best)
        # rows the pick covers: best-hit score clears the learned threshold
        res = residual.copy()
        res["_score"] = template_pair_scores(res, best, clause_col)
        for src, grp in res.groupby("id_a", sort=False):
            cand = grp[grp["_score"].notna()]
            if len(cand) and float(cand["_score"].max()) >= best.thresh:
                unmatched.discard(src)
    picked_keys = {t.key() for t in ordered}
    ordered += [t for t in scored_full if t.key() not in picked_keys]
    return ordered[:max_queries]


# ---------------------------------------------------------------------------
# core scoring (CoreScorer), L6 core filter, L7 expansion schedules
# ---------------------------------------------------------------------------
CORE_WEAK_SCORE = 0.1    # filter_by_core MIN_SCORE, es_labeller.py:2170
CORE_STRONG_SCORE = 0.7  # expand_by_core MIN_SCORE, es_labeller.py:2242
FILTER_BY_CORE_POSITIVES = 10  # FILTER_BY_CORE_IDXS = [10, 20], es_labeller.py:2095
EXPAND_BY_CORE_POSITIVES = 11  # EXPAND_BY_CORE_IDXS = {11, 17}, es_labeller.py:2119
EXPAND_BY_BOOST_POSITIVES = 14  # EXPAND_BY_BOOST_IDXS = {14, ...}, es_labeller.py:2120


def clause_core(c: Clause) -> tuple:
    """A clause's *core* = its column pairing, analyzer-agnostic
    (the reference's SingleQueryTemplate.core carries the cols)."""
    return (c.proj_a, str(c.proj_b))


def core_scores(pdf: pd.DataFrame, singles: list[Clause], clause_col) -> dict[tuple, tuple[Clause, float]]:
    """CoreScorer semantics (es_labeller.py:615-637): a core's score is the
    proportion of labelled TRUE matches with a positive signal on that
    pairing (>=1 shared analyzed token <=> clause feature > 0). Per core we
    keep the best channel's (clause, score) — a pairing is weak only when NO
    analyzer carries signal."""
    pos = pdf[pdf["label"] == "y"]
    out: dict[tuple, tuple[Clause, float]] = {}
    for c in singles:
        col = clause_col(c)
        if col not in pdf.columns:
            continue
        score = float((pos[col].astype("float64").fillna(0.0) > 0).mean()) if len(pos) else 0.0
        k = clause_core(c)
        if k not in out or score > out[k][1]:
            out[k] = (c, score)
    return out


def filter_by_core(templates: list[Template], weak_cores: set[tuple]) -> list[Template]:
    """L6 filter_by_core (es_labeller.py:2163-2178 + new_template_restricted,
    502-543): strip every clause whose core scored <= CORE_WEAK_SCORE; drop
    templates left without a must clause; dedupe restrictions."""
    out, seen = [], set()
    for t in templates:
        clauses = [c for c in t.clauses if clause_core(c) not in weak_cores]
        if not any(c.bool_lvl == "must" for c in clauses):
            continue
        nt = Template(clauses)
        if nt.key() not in seen:
            seen.add(nt.key())
            out.append(nt)
    return out


def expand_by_core(templates: list[Template], strong_cores: list[Clause]) -> list[Template]:
    """L7 expand_by_core (es_labeller.py:2237-2252 + multiply_by_core,
    461-499): multiply each template by every strong core not already among
    its musts, as an additional must clause; originals kept; analyzer
    dominance pruning applied; dedupe by canonical key."""
    out = {t.key(): t for t in templates}
    for t in templates:
        t_cores = {clause_core(c) for c in t.clauses if c.bool_lvl == "must"}
        for cq in strong_cores:
            if clause_core(cq) in t_cores:
                continue
            nt = Template(list(t.clauses) + [Clause("must", cq.proj_a, cq.proj_b, cq.channel, cq.weight)])
            for p in prune_dominated([nt]):
                out.setdefault(p.key(), p)
    return list(out.values())


def expand_by_boost(templates: list[Template], multiplier: float = 2.0) -> list[Template]:
    """L7 expand_by_boost (es_labeller.py:2256-2267 + multiply_by_boost,
    420-459): for each clause, a variant with that clause's weight
    multiplied, then every weight scaled back so the total stays at the
    original sum; originals kept; dedupe by canonical key."""
    out = {t.key(): t for t in templates}
    for t in templates:
        og_total = sum(c.weight for c in t.clauses)
        if og_total <= 0:
            continue
        for i in range(len(t.clauses)):
            scale = og_total / (og_total + t.clauses[i].weight * (multiplier - 1.0))
            clauses = [
                Clause(c.bool_lvl, c.proj_a, c.proj_b, c.channel,
                       c.weight * (multiplier if j == i else 1.0) * scale)
                for j, c in enumerate(t.clauses)
            ]
            nt = Template(clauses)
            out.setdefault(nt.key(), nt)
    return list(out.values())


def filter_by_extended_core(templates: list[Template]) -> list[Template]:
    """Keep the best-scoring variant per extended core — the template's
    clause set ignoring weights (es_labeller.py:2079-2090): dedupes the
    boost-perturbed population back to one winner per shape."""
    groups: dict[tuple, Template] = {}
    for t in templates:
        k = tuple(sorted((c.bool_lvl, c.proj_a, str(c.proj_b), c.channel) for c in t.clauses))
        cur = groups.get(k)
        if cur is None or t.score > cur.score:
            groups[k] = t
    return list(groups.values())


def calibrate_cascade_adaptive(
    pdf: pd.DataFrame,
    pairings: list[tuple[str, str]],
    channels: list[str],
    clause_col,
    max_queries: int = 3,
    max_levels: int = 2,
    t_p: float = 0.95,
    t_r: float = 0.3,
    weights: tuple[float, ...] = (1.0,),
) -> list[Template]:
    """The full labeller schedule as one batch pass (filter_ + expand_,
    es_labeller.py:2093-2141): enumerate + prune -> calibrate -> precision
    floor -> core filter (>=10 positives) -> expand by strong cores (>=11)
    -> expand boosts (>=14) -> recalibrate the expanded pool -> best per
    extended core -> precision floor -> sort by score desc, truncate.

    The reference fires these at exact label counts mid-stream; with every
    label available up front the batch engine applies each step once when
    its trigger count is reached — same operators, same order, same
    constants."""
    n_pos = int((pdf["label"] == "y").sum())
    pool = prune_dominated(enumerate_templates(pairings, channels, max_levels=max_levels, weights=weights))
    pool = [t for t in pool if all(clause_col(c) in pdf.columns for c in t.clauses)]
    scored = [calibrate_template(pdf, t, clause_col, t_p=t_p, t_r=t_r) for t in pool]
    scored = filter_by_precision(scored, n_pos)
    singles = [Clause("must", pa, pb, ch, 1.0) for pa, pb in pairings for ch in channels]
    cores = core_scores(pdf, singles, clause_col)
    if n_pos >= FILTER_BY_CORE_POSITIVES:
        weak = {k for k, (_, s) in cores.items() if s <= CORE_WEAK_SCORE}
        restricted = filter_by_core(scored, weak)
        if restricted:
            scored = restricted
    if n_pos >= EXPAND_BY_CORE_POSITIVES:
        strong = [c for _, (c, s) in cores.items() if s >= CORE_STRONG_SCORE]
        scored = expand_by_core(scored, strong)
    if n_pos >= EXPAND_BY_BOOST_POSITIVES:
        scored = expand_by_boost(scored)
    scored = [calibrate_template(pdf, t, clause_col, t_p=t_p, t_r=t_r) for t in scored]
    scored = filter_by_extended_core(scored)
    scored = filter_by_precision(scored, n_pos)
    scored.sort(key=lambda t: (-t.score, t.key()))
    return scored[:max_queries]


# ---------------------------------------------------------------------------
# unique-key auto-label (J7) and export (L14)
# ---------------------------------------------------------------------------
def auto_label(
    side_a: DataFrame,
    side_b: DataFrame,
    key_a: str,
    key_b: str,
    id_a: str = "doc_id",
    id_b: str = "doc_id",
    max_labels: int | None = None,
) -> DataFrame:
    """Fully automatic labelling from a designated unique key
    (es_labeller.py:1572-1661 semantics; keyword/exact analyzer): equal
    non-empty keys -> 'y'. The reference errors when a key hits >1 ref row;
    we enforce the same cardinality check."""
    a = side_a.select(F.col(id_a).alias("doc_id_a"), F.trim(F.col(key_a)).alias("_k")).filter(
        F.col("_k").isNotNull() & (F.col("_k") != "")
    )
    b = side_b.select(F.col(id_b).alias("doc_id_b"), F.trim(F.col(key_b)).alias("_k")).filter(
        F.col("_k").isNotNull() & (F.col("_k") != "")
    )
    dup = b.groupBy("_k").count().filter(F.col("count") > 1).count()
    if dup:
        raise ValueError(f"certain-match key is not unique on ref side ({dup} duplicated keys)")
    out = a.join(b, "_k").select("doc_id_a", "doc_id_b", F.lit("y").alias("label"))
    if max_labels is not None:
        out = out.limit(max_labels)
    return out


def _score_labelled_resolve_pairs(spark, documents: DataFrame, labels: DataFrame, cfg=None):
    """Score the labelled pairs with the SAME fused feature set the resolve
    pipeline serves, returning a pandas frame (id_a, id_b, label, score).

    Only the labelled docs' tokens enter the TF-IDF pair computation (semi-
    join restriction), so calibration cost is O(|labels|), independent of
    corpus size — the searches the reference's labeller triggers are
    similarly restricted to the sampled rows (SURVEY.md §2.10)."""
    from pyspark.sql import functions as F

    from ..functions import analyzers as A
    from ..functions.textproj import project_documents
    from ..operators.blocking import explode_tokens
    from ..operators.scoring import fused_pair_features, tfidf_weighted_tokens
    from .pipeline import ResolveConfig

    cfg = cfg or ResolveConfig()
    proj = project_documents(documents, cfg.projections).cache()
    n_docs = proj.count()
    pair_ids = labels.select(
        F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b"), "label"
    ).filter(F.col("label").isin("y", "n"))
    lab_ids = pair_ids.select(F.col("id_a").alias("doc_id")).unionByName(
        pair_ids.select(F.col("id_b").alias("doc_id"))
    ).distinct()

    # TF-IDF weights use corpus-level document frequencies (unchanged), but
    # only labelled docs' weighted tokens join.
    tok = explode_tokens(proj, "doc_id", A.analyze(cfg.block_proj, cfg.block_channel), with_tf=True)
    dfreq = tok.groupBy("token").agg(F.countDistinct("id").alias("df"))
    w = tfidf_weighted_tokens(tok, dfreq, n_docs)
    # Mirror the SERVING score exactly (tfidf_cosine_pairs): the pair dot
    # runs over df<=max_df tokens only while norms stay full-vocab. Without
    # this cap the calibration-time tfidf_cosine is an upper bound on the
    # serving one, and the learned threshold is biased HIGH by an amount
    # that grows with corpus size (measured: recall 0.995 at learn time vs
    # 0.925 served, 10k docs) — a train/serve skew, not a tuning issue.
    # labelled-docs restriction FIRST (shrinks the cap join's probe side
    # from corpus-token scale to O(|labels|) tokens), then the cap — the
    # two left-semi filters are independent, so order is free.
    w = w.join(lab_ids.withColumnRenamed("doc_id", "id"), "id", "left_semi")
    if getattr(cfg, "max_df", None) is not None:
        w = w.join(dfreq.filter(F.col("df") <= cfg.max_df).select("token"), "token", "left_semi")
    wa = w.select(F.col("id").alias("id_a"), "token", F.col("w").alias("wa"))
    wb = w.select(F.col("id").alias("id_b"), "token", F.col("w").alias("wb"))
    tfidf = (
        pair_ids.join(wa, ["id_a"]).join(wb, ["id_b", "token"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("tfidf_cosine"))
    )
    pairs = pair_ids.join(tfidf, ["id_a", "id_b"], "left").fillna({"tfidf_cosine": 0.0})
    scored = fused_pair_features(
        pairs, proj, proj, cfg.block_proj, cfg.block_proj,
        channel=cfg.block_channel, weights=cfg.weights, jw_prefix=cfg.jw_prefix,
    ).select("id_a", "id_b", "label", "score")
    return scored.toPandas()


def learn_resolve_threshold(
    spark,
    documents: DataFrame,
    labels: DataFrame,
    cfg=None,
    t_p: float = 0.95,
    t_r: float = 0.3,
) -> tuple[float, dict]:
    """Close the L5 loop for the symmetric resolve pipeline: score the
    labelled pairs (serving-identical features, see
    :func:`_score_labelled_resolve_pairs`), then learn the composite-score
    threshold with :func:`compute_metrics`. Returns (threshold, metrics).

    Single-tier view of :func:`learn_resolve_thresholds` (one scoring pass,
    identical attach pick; the core-tier keys are dropped)."""
    attach, _core, metrics = learn_resolve_thresholds(
        spark, documents, labels, cfg, t_p=t_p, t_r=t_r
    )
    metrics = {k: v for k, v in metrics.items() if k != "core_recall_of_positives"}
    return attach, metrics


def learn_resolve_thresholds(
    spark,
    documents: DataFrame,
    labels: DataFrame,
    cfg=None,
    t_p: float = 0.95,
    t_r: float = 0.3,
    core_recall: float = 0.9,
) -> tuple[float, float, dict]:
    """Two-tier calibration for chain-safe clustering
    (:func:`~..operators.clustering.core_attach_clusters`).

    The ATTACH threshold is the precision-targeted :func:`compute_metrics`
    pick, exactly as :func:`learn_resolve_threshold`. The CORE (merge)
    threshold is recall-anchored on the positive score distribution: the
    largest score that still keeps ``core_recall`` of true pairs at or
    above it. Labelled-pair precision carries no signal for the core tier —
    calibration negatives are typically all below the attach threshold
    already — but transitive chain merges happen through borderline pairs
    among UNLABELLED docs; demanding a merge score typical of true matches
    (not merely above the attach floor) is what blocks them.

    Returns (attach_threshold, core_threshold, metrics); core >= attach by
    construction."""
    import numpy as np

    pdf = _score_labelled_resolve_pairs(spark, documents, labels, cfg)
    is_match = (pdf["label"] == "y").to_numpy()
    scores_np = pdf["score"].to_numpy(dtype="float64")
    attach, precision, recall, score = compute_metrics(scores_np, is_match, t_p=t_p, t_r=t_r)
    n_pos = int(is_match.sum())
    pos_sorted = np.sort(scores_np[is_match])
    if n_pos:
        # index of the score with core_recall of positives at-or-above it
        k = min(int((1.0 - core_recall) * n_pos), n_pos - 1)
        core = float(max(pos_sorted[k], attach))
    else:
        core = float(attach)
    # The reference's rolling recall divides by ALL rows (its source rows
    # each have a true match, HOW_TO.md:8); with labelled negatives present
    # we also report recall over positives, the symmetric-ER reading.
    pos_recall = float((scores_np[is_match] >= attach).sum() / max(n_pos, 1))
    core_pos_recall = float((scores_np[is_match] >= core).sum() / max(n_pos, 1))
    return attach, core, {
        "precision": precision,
        "recall": recall,
        "recall_of_positives": pos_recall,
        "core_recall_of_positives": core_pos_recall,
        "score": score,
        "n_pairs": len(pdf),
        "n_positives": n_pos,
    }


def calibrate_link_tiers(
    spark,
    source: DataFrame,
    ref: DataFrame,
    tiers: list[dict],
    labels: DataFrame,
    t_p: float = 0.95,
    t_r: float = 0.3,
) -> list[dict]:
    """Learn each cascade tier's threshold from labelled (source, ref) pairs
    — the batch analog of the reference's per-template learning: for every
    labelled source row take the tier's best-scoring ref row, mark whether
    that best hit IS the labelled match (first_is_match), and feed the
    (score, first_is_match, has_results) summaries to L5
    :func:`compute_metrics` (es_labeller.py:307-417 semantics).

    ``labels``: (doc_id_a = source id, doc_id_b = ref id, label) — e.g. from
    :func:`auto_label` on a certain key. Only labelled source rows are
    searched (left-semi restriction), so calibration cost is O(|labels|).
    Returns the tier configs with learned ``threshold`` plus expected P/R."""
    import numpy as np
    from pyspark.sql import functions as F

    from ..functions import analyzers as A
    from ..operators.blocking import explode_tokens
    from ..operators.cascade import top1_per_source
    from ..operators.scoring import fused_pair_features, tfidf_cosine_pairs

    pos = labels.filter(F.col("label") == "y").select(
        F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("truth_b")
    ).dropDuplicates(["id_a"])
    lab_src = source.join(pos.select(F.col("id_a").alias("doc_id")), "doc_id", "left_semi")
    n_ref = ref.count()
    out = []
    for t in tiers:
        tok_a = explode_tokens(lab_src, "doc_id", A.analyze(t["proj_a"], t["channel"]), with_tf=True)
        tok_b = explode_tokens(ref, "doc_id", A.analyze(t["proj_b"], t["channel"]), with_tf=True)
        pairs = tfidf_cosine_pairs(tok_a, tok_b, max_df=t.get("max_df", 256), n_docs=n_ref)
        scored = fused_pair_features(
            pairs, lab_src, ref, t["proj_a"], t["proj_b"],
            channel=t["channel"], weights=t["weights"], jw_prefix=t.get("jw_prefix", 96),
        )
        best = top1_per_source(scored.select("id_a", "id_b", "score"))
        summ = pos.join(best, "id_a", "left").select(
            F.coalesce("score", F.lit(0.0)).alias("score"),
            (F.col("id_b") == F.col("truth_b")).alias("first_is_match"),
            F.col("id_b").isNotNull().alias("has_results"),
        ).toPandas()
        thresh, precision, recall, score = compute_metrics(
            summ["score"].to_numpy(dtype="float64"),
            summ["first_is_match"].eq(True).to_numpy(dtype=bool),
            summ["has_results"].to_numpy(dtype=bool),
            t_p=t_p,
            t_r=t_r,
        )
        out.append({**t, "threshold": float(thresh), "expected_precision": precision,
                    "expected_recall": recall, "calib_score": score})
    return out


def export_params(
    cascade: list[Template],
    exact_pairs: list[tuple[str, str]] | None = None,
    non_matching_pairs: list[tuple[str, str]] | None = None,
    must: dict | None = None,
    must_not: dict | None = None,
) -> dict:
    """L14 JSON shape (FIXTURES.md §3 / learned_settings.json)."""
    return {
        "queries": [
            {
                "template": [[c.bool_lvl, c.proj_a, c.proj_b, c.channel, c.weight] for c in t.clauses],
                "best_thresh": t.thresh,
                "expected_precision": t.precision,
                "expected_recall": t.recall,
                "score": t.score,
            }
            for t in cascade
        ],
        "must": must or {},
        "must_not": must_not or {},
        "exact_pairs": [list(p) for p in (exact_pairs or [])],
        "non_matching_pairs": [list(p) for p in (non_matching_pairs or [])],
    }


def load_params(blob: str | dict) -> tuple[list[Template], dict]:
    cfg = json.loads(blob) if isinstance(blob, str) else blob
    cascade = [
        Template(
            [
                Clause(c[0], c[1], tuple(c[2]) if isinstance(c[2], list) else c[2], c[3], float(c[4]))
                for c in q["template"]
            ],
            q.get("best_thresh", 1000.0),
            q.get("expected_precision", 0.0),
            q.get("expected_recall", 0.0),
            q.get("score", 0.0),
        )
        for q in cfg.get("queries", [])
    ]
    return cascade, cfg
