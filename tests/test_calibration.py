"""Calibration tests (SURVEY.md §5.2 item 2, L-series semantics):
compute_metrics fixed-vector cases + properties, enumeration/pruning,
precision-filter schedule, params round-trip, auto-label."""

import numpy as np
import pandas as pd
import pytest

from merge_machine_spark.operators.scoring import Clause
from merge_machine_spark.plans.calibration import (
    MIN_OBSERVATIONS,
    Template,
    auto_label,
    calibrate_cascade,
    calibrate_template,
    compute_metrics,
    enumerate_templates,
    export_params,
    filter_by_precision,
    load_params,
    prune_dominated,
)


def test_compute_metrics_no_matches_sentinel():
    th, p, r, s = compute_metrics(np.array([1.0, 0.5]), np.array([False, False]))
    assert th == 1000.0 and p == 0 and r == 0 and s == 0


def test_compute_metrics_threshold_maximizes_score():
    """Property (es_labeller.py:392-397): the returned threshold's index
    maximizes the custom rolling score (subject to MIN_OBSERVATIONS)."""
    rng = np.random.RandomState(3)
    for _ in range(10):
        n = 30
        scores = np.sort(rng.rand(n))[::-1]
        labels = rng.rand(n) < np.linspace(0.9, 0.1, n)  # high scores more likely matches
        if labels.sum() == 0:
            continue
        th, p, r, s = compute_metrics(scores, labels)
        # recompute rolling score and check s is its max over allowed indices
        order = np.argsort(-scores, kind="stable")
        m = labels[order]
        prec = m.cumsum() / np.minimum(np.arange(n) + 1, n)
        rec = m.cumsum() / n
        f_p = lambda x: (2 * max(x - 0.95, 0) + min(0.95 * (x / 0.95) ** 4, 0.95)) ** 1.5 / 2
        f_r = lambda x: max(x - 0.3, 0) + min(0.3 * (x / 0.3) ** 4, 0.3)
        rolling = np.array([f_p(a) * f_r(b) for a, b in zip(prec, rec)])
        assert s == pytest.approx(rolling[MIN_OBSERVATIONS:].max() if rolling.argmax() < MIN_OBSERVATIONS else rolling.max())


def test_compute_metrics_full_set_low_threshold():
    # all matches -> best index is the whole set -> epsilon threshold
    th, p, r, s = compute_metrics(np.array([0.9, 0.8, 0.7, 0.6, 0.5]), np.ones(5, dtype=bool))
    assert th == 0.0001 and p == 1.0 and r == 1.0


def test_enumerate_and_prune():
    ts = enumerate_templates([("a", "x"), ("b", "y")], ["french_estab", "n_grams", "integers"], max_levels=3)
    assert all(any(c.bool_lvl == "must" for c in t.clauses) for t in ts)
    # multi-pairing rule: compounds must span >=2 distinct pairings
    for t in ts:
        if len(t.clauses) >= 2:
            assert len({(c.proj_a, c.proj_b) for c in t.clauses}) >= 2
    pruned = prune_dominated(ts)
    for t in pruned:
        seen = {}
        for c in t.clauses:
            k = (c.bool_lvl, c.proj_a, c.proj_b)
            assert k not in seen
            seen[k] = c


def test_filter_by_precision_schedule():
    mk = lambda p: Template([Clause("must", "a", "x", "standard", 1.0)], precision=p, score=p)
    ts = [mk(0.2), mk(0.45), mk(0.6), mk(0.9)]
    # floor 0.5 keeps {0.6, 0.9} but min_keep=3 backfills to the top-3
    # (reference keeps >= MIN_NUM_QUERIES=3, es_labeller.py:2108-2110)
    assert len(filter_by_precision(ts, num_positives=20)) == 3
    assert len(filter_by_precision(ts, num_positives=0)) == 4


def test_calibrate_template_and_cascade():
    # synthetic labelled pairs: feature 'f1' separates perfectly at 0.5
    rows = []
    for i in range(20):
        # matching sources: best hit is a true match at 0.6+
        rows.append({"id_a": f"s{i}", "id_b": f"r{i}", "label": "y", "f1": 0.6 + 0.01 * i})
        # non-matching sources: best hit is a labelled negative at <=0.4
        rows.append({"id_a": f"t{i}", "id_b": f"rx{i}", "label": "n", "f1": 0.4 - 0.01 * i})
    pdf = pd.DataFrame(rows)
    tpl = Template([Clause("must", "t", "t", "ch", 1.0)])
    cal = calibrate_template(pdf, tpl, clause_col=lambda c: "f1")
    assert cal.precision == 1.0
    assert 0.4 < cal.thresh <= 0.62
    cascade = calibrate_cascade(pdf, [tpl], clause_col=lambda c: "f1")
    assert len(cascade) == 1 and cascade[0].score > 0


def test_expand_by_boost_preserves_weight_total():
    from merge_machine_spark.plans.calibration import expand_by_boost

    t = Template([Clause("must", "a", "x", "standard", 1.0), Clause("should", "b", "y", "french", 2.0)])
    out = expand_by_boost([t], multiplier=2.0)
    assert len(out) == 3  # original + one variant per clause
    for v in out:
        assert sum(c.weight for c in v.clauses) == pytest.approx(3.0)
    # each variant shifts mass toward one clause
    ratios = sorted(round(v.clauses[0].weight / v.clauses[1].weight, 4) for v in out)
    assert len(set(ratios)) == 3


def test_filter_by_core_strips_weak_clauses():
    from merge_machine_spark.plans.calibration import clause_core, filter_by_core

    t1 = Template([Clause("must", "a", "x", "standard", 1.0), Clause("must", "b", "y", "standard", 1.0)])
    t2 = Template([Clause("must", "b", "y", "standard", 1.0)])
    weak = {clause_core(Clause("must", "b", "y", "standard", 1.0))}
    out = filter_by_core([t1, t2], weak)
    # t1 restricts to its a|x clause; t2 loses its only must and is dropped
    assert len(out) == 1 and [clause_core(c) for c in out[0].clauses] == [("a", "x")]


def test_adaptive_cascade_expansion_strictly_improves():
    """L7 done-check (VERDICT r1 #6): on a fixture where each single-clause
    template is polluted by one-sided high-scoring negatives, the expanded
    (core-multiplied) compound separates perfectly and beats every initial
    template's score."""
    from merge_machine_spark.plans.calibration import calibrate_cascade_adaptive, core_scores

    rows = []
    for i in range(15):  # positives fire on both pairings
        rows.append({"id_a": f"p{i}", "id_b": f"r{i}", "label": "y", "fax": 0.9, "fby": 0.9})
    for i in range(7):  # negatives type A: only a|x fires, above the matches
        rows.append({"id_a": f"na{i}", "id_b": f"x{i}", "label": "n", "fax": 0.95, "fby": None})
    for i in range(8):  # negatives type B: only b|y fires, above the matches
        rows.append({"id_a": f"nb{i}", "id_b": f"x{i}", "label": "n", "fax": None, "fby": 0.95})
    pdf = pd.DataFrame(rows)
    pairings = [("a", "x"), ("b", "y")]
    col = lambda c: {"a": "fax", "b": "fby"}[c.proj_a]

    # initial pool: singles only (max_levels=1) — its best is insufficient
    singles = prune_dominated(enumerate_templates(pairings, ["standard"], max_levels=1))
    initial = [calibrate_template(pdf, t, col) for t in singles]
    best_single = max(t.score for t in initial)
    assert max(t.precision for t in initial) < 0.7  # genuinely polluted

    cores = core_scores(pdf, [Clause("must", pa, pb, "standard", 1.0) for pa, pb in pairings], col)
    assert all(s == 1.0 for _, s in cores.values())  # both cores are strong

    cascade = calibrate_cascade_adaptive(pdf, pairings, ["standard"], col, max_levels=1)
    assert len(cascade[0].clauses) == 2  # expansion built the compound
    assert cascade[0].precision == 1.0
    assert cascade[0].score > best_single  # strictly improves


def test_params_roundtrip():
    t = Template([Clause("must", "full_text", "full_text", "french_estab", 1.0)], 0.45, 0.99, 0.9, 0.5)
    blob = export_params([t], exact_pairs=[("a", "b")])
    cascade, cfg = load_params(blob)
    assert cascade[0].clauses == t.clauses and cascade[0].thresh == 0.45
    assert cfg["exact_pairs"] == [["a", "b"]]


def test_auto_label(spark):
    src = spark.createDataFrame([("s1", "K1"), ("s2", "K2"), ("s3", None)], ["doc_id", "k"])
    ref = spark.createDataFrame([("r1", "K1"), ("r2", "K3")], ["doc_id", "k"])
    got = {(r["doc_id_a"], r["doc_id_b"]): r["label"] for r in auto_label(src, ref, "k", "k").collect()}
    assert got == {("s1", "r1"): "y"}


def test_filter_by_precision_10_positives():
    mk = lambda p: Template([Clause("must", "a", "x", "standard", 1.0)], precision=p, score=p)
    ts = [mk(0.2), mk(0.45), mk(0.6), mk(0.9)]
    assert len(filter_by_precision(ts, num_positives=10)) == 3


def test_inclusion_ratio_counts_any_match():
    """A5 (es_labeller.py:408): the template retrieves the true match for a
    row even when a decoy outscores it — inclusion_ratio sees it, precision
    does not."""
    rows = [
        # row s0: decoy r_bad outscores the true match r_good (both candidates)
        {"id_a": "s0", "id_b": "r_bad", "label": "n", "f1": 0.9},
        {"id_a": "s0", "id_b": "r_good", "label": "y", "f1": 0.8},
        # row s1: true match is the best
        {"id_a": "s1", "id_b": "r_5", "label": "y", "f1": 0.9},
        # row s2: template retrieves nothing (feature null)
        {"id_a": "s2", "id_b": "r_9", "label": "n", "f1": None},
    ]
    pdf = pd.DataFrame(rows)
    t = calibrate_template(pdf, Template([Clause("must", "a", "x", "standard", 1.0)]), lambda c: "f1")
    assert t.inclusion_ratio == pytest.approx(2 / 3)


def test_greedy_set_cover_beats_plain_sort():
    """L10 (_iterative_metrics_and_sort): with two near-duplicate strong
    templates covering the SAME rows and a weaker one covering the rest,
    greedy picks the complementary template second; plain sort picks the
    duplicate."""
    from merge_machine_spark.plans.calibration import calibrate_cascade_greedy

    rows = []
    for i in range(10):  # half A: covered by f1 and its near-dup f3
        rows.append({"id_a": f"a{i}", "id_b": f"r{i}", "label": "y",
                     "f1": 0.9, "f3": 0.89, "f2": None})
    for i in range(10):  # half B: covered by f2; f3 reaches only 2 rows
        rows.append({"id_a": f"b{i}", "id_b": f"s{i}", "label": "y",
                     "f1": None, "f3": 0.89 if i < 2 else None, "f2": 0.7})
    # negatives so thresholds are meaningful
    for i in range(6):
        rows.append({"id_a": f"n{i}", "id_b": f"x{i}", "label": "n",
                     "f1": 0.1, "f3": 0.1, "f2": 0.1})
    pdf = pd.DataFrame(rows)
    mk = lambda name: Template([Clause("must", name, name, "standard", 1.0)])
    col = lambda c: c.proj_a
    templates = [mk("f1"), mk("f2"), mk("f3")]

    plain = calibrate_cascade(pdf, templates, col, max_queries=3)
    greedy = calibrate_cascade_greedy(pdf, templates, col, max_queries=3)
    first = lambda t: t.clauses[0].proj_a
    assert first(plain[0]) in ("f1", "f3") and first(plain[1]) in ("f1", "f3")
    assert first(greedy[0]) == "f3"  # best full-set coverage (12 rows)
    assert first(greedy[1]) == "f2"  # complementary residual coverage wins slot 2
