"""Interactive labeller session tests (T2 sorta-sort, L9 proposal policy,
L12 undo, L13 custom search) — the reference's console-labeller semantics
(es_labeller.py:1179-1217, 1474-1558, 1739-1850, 2397-2626) over the batch
backend."""

import pandas as pd
import pytest

from merge_machine_spark.operators.scoring import Clause
from merge_machine_spark.plans.calibration import Template
from merge_machine_spark.plans.labeller import BatchLabeller

COL = lambda c: {"a": "fax", "b": "fby"}[c.proj_a]


def _pdf():
    rows = []
    # source s0: r0 is the true match (strong on both), r1/r2 decoys
    rows.append({"id_a": "s0", "id_b": "r0", "fax": 0.9, "fby": 0.9})
    rows.append({"id_a": "s0", "id_b": "r1", "fax": 0.6, "fby": None})
    rows.append({"id_a": "s0", "id_b": "r2", "fax": 0.3, "fby": None})
    # source s1: r5 true match
    rows.append({"id_a": "s1", "id_b": "r5", "fax": 0.8, "fby": 0.8})
    rows.append({"id_a": "s1", "id_b": "r6", "fax": 0.5, "fby": None})
    # source s2: nothing good
    rows.append({"id_a": "s2", "id_b": "r9", "fax": 0.1, "fby": None})
    return pd.DataFrame(rows)


def _templates():
    return [
        Template([Clause("must", "a", "x", "standard", 1.0)]),
        Template([Clause("must", "b", "y", "standard", 1.0)]),
    ]


def test_proposal_policy_order_and_caps():
    """L9: proposals walk templates in order, best score first, at most 4
    per template, never re-proposing a labelled pair."""
    lab = BatchLabeller(_pdf(), _templates(), COL)
    a, b, s = lab.propose()
    assert (a, b) == ("s0", "r0") and s == pytest.approx(0.9)  # best of first template
    lab.update("n")
    a2, b2, _ = lab.propose()
    assert (a2, b2) == ("s0", "r1")  # same row, next-best, labelled pair skipped


def test_update_truth_table_and_done():
    """y closes the row as matched; exhausted n-row closes as no_result;
    f-rows' pairs are excluded from metric labels."""
    lab = BatchLabeller(_pdf(), _templates(), COL)
    lab.propose(); lab.update("y")            # s0 matched via r0
    assert lab._closed["s0"] == "match" and lab.n_positives() == 1
    lab.propose(); lab.update("f")            # s1 forgotten
    assert lab._closed["s1"] == "forget"
    # s2: exhaust its only proposal
    p = lab.propose()
    assert p[0] == "s2"
    lab.update("n")
    assert lab._closed.get("s2") == "no_result"
    assert lab.propose() is None and lab.status == "DONE"
    d = lab._labelled_pdf()
    # 'f' rows present in labels dict but carry label 'f' (excluded by
    # calibrate_template's y/n filter)
    assert set(d["label"]) <= {"y", "n", "f"}


def test_undo_restores_proposal():
    """L12: previous() removes the last label and the same pair is
    re-proposed; template metrics are not reverted (reference caveat)."""
    lab = BatchLabeller(_pdf(), _templates(), COL)
    first = lab.propose()
    lab.update("y")
    assert lab.n_positives() == 1
    lab.update("p")
    assert lab.n_positives() == 0 and "s0" not in lab._closed
    again = lab.propose()
    assert (again[0], again[1]) == (first[0], first[1])


def test_sorta_sort_interleaves_when_unscored():
    """T2: with no calibrated scores, the query order is the seeded
    explore/exploit interleave, not the enumeration order."""
    tmpl = [Template([Clause("must", "a", "x", ch, 1.0)]) for ch in ("standard", "french", "n_grams", "keyword")]
    pdf = pd.DataFrame([{"id_a": "s0", "id_b": "r0", "fax": 0.9, "fby": 0.9}])
    col = lambda c: "fax"
    lab = BatchLabeller(pdf, tmpl, col, seed=3)
    before = [t.key() for t in lab.templates]
    lab._metrics_and_sort()  # no positives yet -> scores all 0 -> stable
    after = [t.key() for t in lab.templates]
    assert sorted(before) == sorted(after)
    assert before != after  # the interleave moved something


def test_custom_search_jumps_queue(spark):
    """L13: an ad-hoc search pushes its hits in front of the template
    proposals for the current source row."""
    ref = spark.createDataFrame(
        [("rX", "lycee jean moulin"), ("rY", "college pasteur"), ("r0", "unrelated")],
        "doc_id string, full_name string",
    )
    lab = BatchLabeller(_pdf(), _templates(), COL)
    n = lab.custom_search(ref, {"full_name": ["jean moulin"]})
    assert n == 1
    a, b, s = lab.propose()
    assert (a, b) == ("s0", "rX") and s > 0  # jumped ahead of template proposals
    lab.update("y")
    assert lab._closed["s0"] == "match"


def test_stats_history_per_step_and_gc():
    """A9 (StatsLabeller, es_labeller.py:2629-2707): every metrics step
    snapshots P/R/score/position for each live template; a template absent
    from the last 5 steps is GC'd from the stats AND stripped from the
    per-step order lists. Scripted 15-label session."""
    rows = []
    for i in range(15):
        rows.append({"id_a": f"s{i:02d}", "id_b": f"r{i:02d}", "fax": 0.9, "fby": 0.9})
    lab = BatchLabeller(pd.DataFrame(rows), _templates(), COL)
    akey = lab.templates[0].key()
    bkey = lab.templates[1].key()

    for step in range(15):
        assert lab.propose() is not None
        lab.update("y")
        if step == 5:
            # expansion/filtering analog: the 'b' template leaves the pool
            lab.templates = [t for t in lab.templates if t.key() != bkey]

    assert lab.current_step == 15
    assert len(lab.query_order) == 15
    # surviving template: one summary per step, with the full stat shape
    assert sorted(lab.query_stats[akey], key=int) == [str(i) for i in range(15)]
    assert set(lab.query_stats[akey]["14"]) == {"precision", "recall", "score", "position"}
    assert lab.query_stats[akey]["14"]["position"] == 0
    # dropped template: present for >5 steps then GC'd after 5 idle steps
    assert bkey not in lab.query_stats
    assert all(bkey not in step for step in lab.query_order)
    # history rows for the dropped template were removed everywhere, but the
    # step count and order-list length are untouched (reference semantics)
    assert lab.query_stats[akey]["0"]["precision"] >= 0.0
