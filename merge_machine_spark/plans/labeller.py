"""Interactive labeller session (T2 / L9 / L12 / L13) over the Spark backend.

The reference's console labeller (es_labeller.py BasicLabeller /
SearchLabeller) walks a human through (source, ref) pair proposals, firing
one Elasticsearch search per source row. Here the "search results" are ONE
Spark job: per-template candidate scores for the sampled source rows are
collected to a pandas feature table (the same shape
:func:`~.calibration.calibrate_template` consumes), and the session itself
is pure driver-side state — propose -> label -> re-score -> re-sort, with
undo and ad-hoc custom search. That matches the reference's own topology
(its labeller is a driver-side console loop; the data plane only answers
searches).

Ported semantics (reference citations):

  L9  proposal policy — ``_init_ref_gen`` (es_labeller.py:1179-1217): per
      source row, walk ``current_queries`` in order; at most
      MAX_NUM_PROPOSALS_PER_QUERY=4 candidates per query; skip pairs already
      labelled and sources already matched; when a template has a learned
      threshold, propose only pairs with
      score >= thresh / MIN_ES_SCORE_TO_THRESH (=2).
  T2  sorta-sort — ``_sorta_sort_queries`` (es_labeller.py:1474-1500):
      shuffle the query list (seeded here for determinism), sort the first
      half by the current source row's score, interleave the halves —
      explore/exploit while metrics are still noise; the subsequent stable
      sort by template score preserves this order among untied templates.
  L12 undo — ``previous`` (es_labeller.py:1503-1558): pop the last label
      and restore the proposal pointer; like the reference, metric
      recomputation and template-set changes (expansion/filtering) are NOT
      undone.
  L13 custom search — ``SearchLabeller.custom_search``
      (es_labeller.py:2397-2626): an ad-hoc {ref_col: [values]} search whose
      results jump the proposal queue (the current_query_ranking = -1
      analog), so the user can hand-find the match the templates missed.

``update()`` is the truth table of ``update_pair`` (es_labeller.py:1739-1850):
'y' closes the source row as matched; 'n' advances within the row and an
exhausted row closes as __NO_RESULT; 'f' forgets the row (its pairs are
excluded from metrics — the reference's __FORGET path skips the re-score);
'p' undoes.
"""

from __future__ import annotations

import random

import pandas as pd

from .calibration import Template, calibrate_template, template_pair_scores

MIN_ES_SCORE_TO_THRESH = 2       # es_labeller.py:1186
MAX_NUM_PROPOSALS_PER_QUERY = 4  # es_labeller.py:1187
NO_QUERY_THRESH = 1000.0         # uncalibrated-template sentinel
STATS_GC_IDLE_STEPS = 5          # StatsLabeller._cleanup(5), es_labeller.py:2663


class BatchLabeller:
    """One labelling session.

    ``pdf``: candidate pair-feature table (id_a, id_b, one column per
    clause as named by ``clause_col``) covering the sampled source rows.
    ``templates``: the current template pool (will be re-calibrated and
    re-sorted as labels arrive).
    """

    def __init__(
        self,
        pdf: pd.DataFrame,
        templates: list[Template],
        clause_col,
        t_p: float = 0.95,
        t_r: float = 0.3,
        seed: int = 0,
    ) -> None:
        self.pdf = pdf.reset_index(drop=True)
        self.templates = list(templates)
        self.clause_col = clause_col
        self.t_p, self.t_r = t_p, t_r
        self._rng = random.Random(seed)

        self.labels: dict[tuple, str] = {}
        self._label_order: list[tuple] = []          # for undo
        self._closed: dict[str, str] = {}            # source -> 'match'|'no_result'|'forget'
        self._close_order: list[str] = []            # for undo
        self.source_order = list(dict.fromkeys(self.pdf["id_a"]))
        self._front_queue: list[tuple[str, str, float]] = []  # custom-search proposals
        self._current: tuple[str, str, float] | None = None
        self.status = "RUNNING"

        # A9 per-step stats history (StatsLabeller, es_labeller.py:2629-2707):
        # one snapshot of every live template's P/R/score/position per
        # metrics step, GC'd after STATS_GC_IDLE_STEPS idle steps
        self.query_stats: dict[tuple, dict[str, dict]] = {}  # key -> {str(step): summary}
        self.query_order: list[list[tuple]] = []              # per step: keys in rank order
        self.current_step = 0

    # -- state ---------------------------------------------------------------
    def current_source(self) -> str | None:
        for s in self.source_order:
            if s not in self._closed:
                return s
        return None

    def n_positives(self) -> int:
        return sum(1 for v in self._closed.values() if v == "match")

    def _labelled_pdf(self) -> pd.DataFrame:
        d = self.pdf.copy()
        d["label"] = [self.labels.get((a, b), None) for a, b in zip(d["id_a"], d["id_b"])]
        return d[d["label"].notna()]

    # -- T2 sorta-sort + re-score (L8) ----------------------------------------
    def _sorta_sort(self, source: str) -> None:
        qs = self.templates
        if not qs:
            return
        sub = self.pdf[self.pdf["id_a"] == source]
        if not len(sub):
            return
        qs = self._rng.sample(qs, len(qs))
        half = len(qs) // 2

        def best(t: Template) -> float:
            m = template_pair_scores(sub, t, self.clause_col).max()
            return float(m) if pd.notna(m) else 0.0

        a = sorted(qs[:half], key=lambda t: -best(t))
        b = qs[half : half * 2]
        c = qs[half * 2 :]
        self.templates = [x for pair in zip(a, b) for x in pair] + c

    def _metrics_and_sort(self) -> None:
        src = self.current_source()
        if src is not None:
            self._sorta_sort(src)
        lab = self._labelled_pdf()
        if (lab["label"] == "y").any():
            self.templates = [
                calibrate_template(lab, t, self.clause_col, t_p=self.t_p, t_r=self.t_r)
                for t in self.templates
            ]
        # stable: templates untied on score keep the sorta-sort interleave
        self.templates.sort(key=lambda t: -t.score)
        if not self.templates:
            self.status = "NO_QUERIES"
        self._update_stats()

    # -- A9 per-step stats history (StatsLabeller port) -------------------------
    def _update_stats(self) -> None:
        """Record (step, template key) -> {precision, recall, score, position}
        for every live template, then GC templates absent from the last
        STATS_GC_IDLE_STEPS steps (update_stats + _cleanup,
        es_labeller.py:2650-2675)."""
        for pos, t in enumerate(self.templates):
            # str() key: the reference StatsLabeller serializes str(self.current_step)
            # (es_labeller.py:2650) and its to_dict/from_dict round-trips string
            # keys — matching the export format exactly (ADVICE r3)
            self.query_stats.setdefault(t.key(), {})[str(self.current_step)] = {
                "precision": t.precision,
                "recall": t.recall,
                "score": t.score,
                "position": pos,
            }
        self.query_order.append([t.key() for t in self.templates])
        self.current_step += 1
        self._stats_cleanup(STATS_GC_IDLE_STEPS)

    def _stats_cleanup(self, num_empty: int) -> None:
        if self.current_step >= num_empty:
            recent = self.query_order[-num_empty:]
            for qid in list(self.query_stats):
                if all(qid not in step for step in recent):
                    del self.query_stats[qid]
        self.query_order = [[q for q in step if q in self.query_stats] for step in self.query_order]

    # -- L9 proposal policy ----------------------------------------------------
    def _proposals(self, source: str):
        sub = self.pdf[self.pdf["id_a"] == source]
        for ranking, t in enumerate(self.templates):
            scores = template_pair_scores(sub, t, self.clause_col)
            cand = sub.assign(_s=scores).dropna(subset=["_s"]).sort_values("_s", ascending=False)
            n = 0
            for _, row in cand.iterrows():
                if n >= MAX_NUM_PROPOSALS_PER_QUERY:
                    break
                pair = (row["id_a"], row["id_b"])
                if pair in self.labels:
                    continue
                if t.thresh != NO_QUERY_THRESH and row["_s"] < t.thresh / MIN_ES_SCORE_TO_THRESH:
                    continue
                n += 1
                yield (pair[0], pair[1], float(row["_s"]), ranking)

    def propose(self) -> tuple[str, str, float] | None:
        """Next (id_a, id_b, score) to label, custom-search results first
        (ranking -1), else the L9 walk; None when the session is done."""
        while self._front_queue:
            a, b, s = self._front_queue[0]
            if (a, b) in self.labels or a in self._closed:
                self._front_queue.pop(0)
                continue
            self._current = (a, b, s)
            return self._current
        src = self.current_source()
        while src is not None:
            for a, b, s, _ in self._proposals(src):
                self._current = (a, b, s)
                return self._current
            # no proposal at all for this row -> closes as no_result
            self._close(src, "no_result")
            src = self.current_source()
        self.status = "DONE"
        self._current = None
        return None

    # -- labelling truth table (update_pair) ------------------------------------
    def _close(self, source: str, how: str) -> None:
        self._closed[source] = how
        self._close_order.append(source)

    def update(self, user_input: str) -> None:
        """'y' / 'n' / 'f' for the current proposal, 'p' = undo."""
        if user_input == "p":
            self.previous()
            return
        if self._current is None:
            raise RuntimeError("nothing proposed")
        a, b, _ = self._current
        assert (a, b) not in self.labels
        self.labels[(a, b)] = user_input
        self._label_order.append((a, b))
        if user_input == "y":
            self._close(a, "match")
            self._metrics_and_sort()
        elif user_input == "f":
            self._close(a, "forget")  # __FORGET: no metric recompute
        elif user_input == "n":
            nxt = self.propose()
            if nxt is None or nxt[0] != a:
                # row exhausted -> __NO_RESULT (relevant for metrics)
                if a not in self._closed:
                    self._close(a, "no_result")
                self._metrics_and_sort()
        else:
            raise ValueError(f"invalid answer {user_input!r} (y/n/f/p)")
        self._current = None

    # -- L12 undo -----------------------------------------------------------------
    def previous(self) -> None:
        """Remove the last label; the proposal pointer returns to that pair.
        Metrics and template-set changes are NOT recomputed (reference
        ``previous`` docstring, es_labeller.py:1503-1515)."""
        if not self._label_order:
            raise RuntimeError("nothing to undo")
        pair = self._label_order.pop()
        del self.labels[pair]
        if self._close_order and self._close_order[-1] == pair[0] and pair[0] in self._closed:
            self._close_order.pop()
            del self._closed[pair[0]]
        self.status = "RUNNING"
        self._current = None

    # -- L13 custom search -----------------------------------------------------------
    def custom_search(self, ref, search_params: dict, channel: str = "standard", max_num_results: int = 10) -> int:
        """Ad-hoc search over the ref table: token-overlap of the analyzed
        search values against each named ref column (the reference fires a
        bool query over every analyzer except n_grams); top hits are pushed
        in FRONT of the proposal queue for the current source row. Returns
        the number of proposals added."""
        from pyspark.sql import functions as F

        from ..functions import analyzers as A

        src = self.current_source()
        if src is None:
            return 0
        spark = ref.sparkSession
        total = None
        for col, values in search_params.items():
            if isinstance(values, str):
                values = [values]
            toks_row = spark.range(1).select(A.analyze(F.lit(" ".join(values)), channel).alias("t")).collect()[0]
            toks = list(dict.fromkeys(toks_row["t"] or []))
            if not toks:
                continue
            piece = F.size(F.array_intersect(A.analyze(col, channel), F.array(*[F.lit(t) for t in toks])))
            total = piece if total is None else total + piece
        if total is None:
            return 0
        hits = (
            ref.select(F.col("doc_id"), total.cast("double").alias("_s"))
            .filter(F.col("_s") > 0)
            .orderBy(F.desc("_s"), F.asc("doc_id"))
            .limit(max_num_results)
            .collect()
        )
        added = 0
        for r in hits:
            pair = (src, r["doc_id"])
            if pair in self.labels:
                continue
            self._front_queue.append((src, r["doc_id"], float(r["_s"])))
            added += 1
        return added
