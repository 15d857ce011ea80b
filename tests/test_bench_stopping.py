"""Pure-Python regression tests for bench.py's ER trial stopping rule
(r4 verdict what's-wrong #1): the corroboration-only early-stop that let a
uniformly-stolen window become the official headline must stay dead. No
Spark — the rule is extracted as ``bench.er_trial_decision``.

The r4 incident, replayed verbatim: the driver's trial vector was
[104.5, 78.7, 81.1] — 81.1 within 10% of 78.7 corroborated the min, the
old rule stopped at 3 trials and reported 78.7s while the same code ran
14.8s (builder quiet window) and 22.4s (judge probe) the same day.
"""

import bench


R4_FLOOR = 14.8  # BENCH/quiet_floor.json sf0.1_pairs1286983, the anchor


def test_r4_stolen_window_no_longer_early_stops():
    """The exact r4 trial vector with the persisted floor: corroborated, but
    min=78.7 > 1.3 x 14.8 — the loop must keep trialing, not lock in."""
    stop, reason = bench.er_trial_decision([104.5, 78.7, 81.1], R4_FLOOR, elapsed_sec=60.0)
    assert not stop
    assert reason == "continue"


def test_all_stolen_trials_exhaust_with_explicit_reason():
    """Seven uniformly-stolen trials exhaust the cap above the floor; the
    reported reason makes the stolen window visible (window_stolen is then
    computed from min > 1.3 x floor by the caller)."""
    trials = [104.5, 78.7, 81.1, 90.0, 85.2, 79.9, 88.3]
    stop, reason = bench.er_trial_decision(trials, R4_FLOOR, elapsed_sec=200.0)
    assert stop
    assert reason == "max_trials_exhausted"
    assert min(trials) > 1.3 * R4_FLOOR  # caller will set window_stolen


def test_quiet_trial_at_floor_stops_immediately():
    """One trial within 10% of the floor ends the loop at once — nothing
    quieter is expected, corroboration only adds wall-clock."""
    stop, reason = bench.er_trial_decision([15.5], R4_FLOOR, elapsed_sec=20.0)
    assert stop
    assert reason == "at_floor"


def test_corroboration_near_floor_stops():
    """Two trials within 10% of each other AND min <= 1.3 x floor: a mildly
    noisy but floor-consistent window is accepted."""
    stop, reason = bench.er_trial_decision([19.0, 18.2], R4_FLOOR, elapsed_sec=40.0)
    assert stop
    assert reason == "corroborated_near_floor"


def test_single_near_floor_but_uncorroborated_keeps_going():
    """min in (1.1, 1.3] x floor without corroboration: keep trialing — one
    ambiguous trial neither matches the floor nor proves a plateau."""
    stop, reason = bench.er_trial_decision([18.2], R4_FLOOR, elapsed_sec=20.0)
    assert not stop


def test_no_floor_seeds_after_three_corroborated_trials():
    """First run on a fresh (sf, pairs) key: corroboration plus a 3-trial
    minimum seeds the floor (the pre-r5 behavior, valid only floorless)."""
    assert bench.er_trial_decision([20.0, 21.0], None, elapsed_sec=30.0) == (False, "continue")
    stop, reason = bench.er_trial_decision([20.0, 21.0, 25.0], None, elapsed_sec=45.0)
    assert stop
    assert reason == "seeded_floor"


def test_wall_budget_caps_a_bad_host_day():
    """Two stolen trials past the ~5-min ER-loop budget stop with the budget
    reason — the driver bench cannot run away; one trial never suffices."""
    stop, reason = bench.er_trial_decision([120.0, 130.0], R4_FLOOR, elapsed_sec=301.0)
    assert stop
    assert reason == "wall_budget_exhausted"
    assert bench.er_trial_decision([120.0], R4_FLOOR, elapsed_sec=301.0)[0] is False


def test_floor_anchor_overrides_corroboration_at_any_plateau():
    """Property: for ANY corroborated plateau strictly above 1.3 x floor the
    rule refuses to early-stop (sweep of plateau levels)."""
    for plateau in (19.3, 25.0, 40.0, 78.7, 300.0):
        if plateau <= 1.3 * R4_FLOOR:
            continue
        stop, _ = bench.er_trial_decision([plateau, plateau * 1.05], R4_FLOOR, elapsed_sec=10.0)
        assert not stop, f"early-stopped on corroborated stolen plateau {plateau}"


# --- headline_retry_decision (r5: per-query floor anchoring for the cheap
# headline queries, which ran single-shot until r5 and so could be silently
# inflated by a stolen window — r4's round-over-round table showed every
# headline query uniformly 1.5-2.3x with identical row counts) ------------


def test_headline_quiet_run_stops_immediately():
    """Best run within 1.3x the per-query floor: accept the single shot."""
    assert bench.headline_retry_decision([1.1], 1.0, elapsed_sec=5.0) == (True, "quiet")


def test_headline_no_floor_accepts_first_run():
    """Fresh query key (no floor yet): the first run seeds the floor, no
    retry — retries only buy anything relative to a known quiet anchor."""
    assert bench.headline_retry_decision([3.7], None, elapsed_sec=5.0) == (True, "quiet")


def test_headline_stolen_run_retries():
    """Best run >1.3x floor with retries and budget left: go again."""
    stop, reason = bench.headline_retry_decision([2.6], 1.0, elapsed_sec=5.0)
    assert not stop
    assert reason == "retry"


def test_headline_retry_recovers_quiet_window():
    """A stolen first run followed by a quiet second: the quiet branch wins
    (best-of semantics — min(runs) is what the caller reports)."""
    assert bench.headline_retry_decision([2.6, 1.05], 1.0, elapsed_sec=8.0) == (True, "quiet")


def test_headline_max_runs_caps_retries():
    """Three stolen runs exhaust the per-query cap; caller flags the query
    in headline_stolen rather than retrying forever."""
    stop, reason = bench.headline_retry_decision([2.6, 2.8, 2.5], 1.0, elapsed_sec=20.0)
    assert stop
    assert reason == "max_runs"


def test_headline_shared_budget_caps_a_bad_host_day():
    """Past the shared block budget, even an eligible retry is refused —
    twelve queries x 3 retries on a stolen host must not run the bench
    away."""
    stop, reason = bench.headline_retry_decision([2.6], 1.0, elapsed_sec=121.0)
    assert stop
    assert reason == "budget"


# --- er_floor_update (r5 code-review: a fresh key must not be seeded from
# dispersed cap-exhausted trials, and an existing floor only ratchets down) -


def test_floor_ratchets_down_on_quieter_observation():
    assert bench.er_floor_update(14.8, 12.595, "at_floor") == 12.595


def test_floor_never_moves_up():
    assert bench.er_floor_update(12.595, 31.1, "max_trials_exhausted") == 12.595


def test_fresh_key_seeded_only_by_corroborated_arm():
    assert bench.er_floor_update(None, 20.0, "seeded_floor") == 20.0


def test_fresh_key_not_seeded_from_dispersed_stolen_trials():
    """First run on a new sf on a stolen host: 7 dispersed trials exhaust
    the cap without corroborating — persisting min=50s would anchor the
    benchmark to a stolen number forever (every later quiet run would stop
    'at_floor' against noise)."""
    assert bench.er_floor_update(None, 50.0, "max_trials_exhausted") is None
    assert bench.er_floor_update(None, 50.0, "wall_budget_exhausted") is None
