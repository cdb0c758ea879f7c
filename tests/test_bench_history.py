"""Bench regression gate: the latest bench runs must not be >1.5x slower
than the best prior run on any headline query at the same scale factor
(round-1 verdict item 9), AFTER dividing out the host factor — rounds
run on different hosts/boots whose speed varies uniformly 1.5-2x, so
the median now/best ratio estimates machine speed and only
plan-specific regressions beyond it fail. Sub-0.2 s queries are exempt
— at that scale the measurement is mostly fixed overhead noise.

The gate compares the ELEMENT-WISE BEST of the last two same-sf runs
against the best prior (round-8 verdict item 1): the host factor is a
single median, so NON-uniform co-tenant load — one query's window hit
by a spike while the rest of the run was quiet — can redden HEAD on a
run whose plan did not change (measured: keyword_index_build 3.33 s
under a 1.56x-load window vs 1.07 s one run earlier, same commit). A
genuine plan regression reproduces across consecutive runs; a one-run
noise spike does not survive the min."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    BASELINE_RESETS,
    CALIBRATION_SLOTS,
    HOST_FACTOR_RECORD_MAX,
    POISONED_RUNS,
    _admissible,
    _normalized_regressions,
)

HISTORY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_history.jsonl")


def _entries():
    if not os.path.exists(HISTORY):
        return []
    out = []
    with open(HISTORY) as fh:
        for line in fh:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            # retro-adjudicated loaded-box entries are not gate
            # evidence (bench.POISONED_RUNS documents each)
            if rec.get("ts") in POISONED_RUNS:
                continue
            out.append(rec)
    return out


def test_latest_bench_within_regression_budget():
    entries = _entries()
    if len(entries) < 2:
        pytest.skip("fewer than two bench runs recorded")
    latest = entries[-1]
    same_sf = [e for e in entries if e.get("sf") == latest.get("sf")]
    recent, prior = same_sf[-2:], same_sf[:-2]
    if not prior and len(same_sf) == 2:
        # young history: with exactly two runs there is no "last two vs
        # prior" split — fall back to latest-vs-first so short histories
        # still get a (noisier) gate instead of none
        recent, prior = same_sf[-1:], same_sf[:-1]
    if not prior:
        pytest.skip("no prior run at this sf")
    best = {}
    for e in prior:
        for name, t in e.get("queries", {}).items():
            # deliberate plan changes re-baseline (see bench.py's
            # BASELINE_RESETS rationale)
            if e.get("ts", 0.0) < BASELINE_RESETS.get(name, 0.0):
                continue
            if isinstance(t, (int, float)):
                best[name] = min(best.get(name, float("inf")), float(t))
    # element-wise best of the last two runs: a regression must
    # REPRODUCE to fail the gate (see module docstring)
    current: dict = {}
    for e in recent:
        for name, t in e.get("queries", {}).items():
            if isinstance(t, (int, float)):
                current[name] = min(current.get(name, float("inf")), float(t))
    bad, host_factor = _normalized_regressions(current, best)
    assert not bad, (
        f">1.5x host-normalized slowdowns vs best prior "
        f"(host_factor={host_factor}): {bad}"
    )


def test_normalized_regressions_math():
    """A uniform 2x host slowdown is absorbed; a plan-specific 4x on top
    of it is flagged."""
    best = {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}
    uniform = {"a": 2.0, "b": 2.0, "c": 2.1, "d": 1.9}
    bad, hf = _normalized_regressions(uniform, best)
    assert not bad and 1.9 <= hf <= 2.1
    spiked = {"a": 2.0, "b": 2.0, "c": 2.0, "d": 8.0}
    bad, hf = _normalized_regressions(spiked, best)
    assert set(bad) == {"d"} and bad["d"]["normalized_ratio"] > 1.5
    # no priors -> no flags, neutral factor
    bad, hf = _normalized_regressions({"x": 5.0}, {})
    assert not bad and hf == 1.0


def test_host_factor_from_pinned_calibration_set():
    """Round-12 verdict item 2: the host factor comes from the pinned
    never-changed CALIBRATION_SLOTS when >=4 have priors — a batch of
    NEW slot families running slow (plan problems, not machine speed)
    must no longer drag the median up and mask themselves."""
    cal = list(CALIBRATION_SLOTS[:4])
    best = {n: 1.0 for n in cal} | {"new_a": 1.0, "new_b": 1.0,
                                    "new_c": 1.0, "new_d": 1.0,
                                    "new_e": 1.0}
    # machine unchanged (calibration ~1x) but five new-family slots 2x:
    # the old all-slot median would report hf~2 and absorb them all
    timings = {n: 1.02 for n in cal} | {k: 2.0 for k in
                                        ("new_a", "new_b", "new_c",
                                         "new_d", "new_e")}
    bad, hf = _normalized_regressions(timings, best)
    assert hf < 1.1, f"calibration median ignored: hf={hf}"
    assert set(bad) == {"new_a", "new_b", "new_c", "new_d", "new_e"}
    # conversely a genuinely slow machine (calibration 2x) absorbs a
    # uniform 2x everywhere
    timings_slow = {n: 2.0 for n in best}
    bad, hf = _normalized_regressions(timings_slow, best)
    assert not bad and 1.9 <= hf <= 2.1
    # <4 calibration slots with priors: falls back to all-slot median
    few = {cal[0]: 1.0, "x": 1.0, "y": 1.0, "z": 1.0}
    bad, hf = _normalized_regressions({cal[0]: 2.0, "x": 2.0, "y": 2.0,
                                       "z": 2.0}, few)
    assert not bad and 1.9 <= hf <= 2.1


def test_loaded_box_runs_are_inadmissible():
    """Runs measured at host_factor > HOST_FACTOR_RECORD_MAX are not
    recorded into bench_history.jsonl (they poison the best-prior table
    and the two-consecutive-runs gate — both r12 red-gate entries were
    loaded-box runs)."""
    assert _admissible(1.0)
    assert _admissible(HOST_FACTOR_RECORD_MAX)
    assert not _admissible(HOST_FACTOR_RECORD_MAX + 0.01)
    assert not _admissible(1.49)


def test_recorded_history_is_admissible():
    """Every ALREADY-RECORDED sf0.1 entry after the guard's landing must
    satisfy the admissibility bound — the guard is enforced at append
    time, so this pins the invariant going forward (pre-guard entries
    are grandfathered: they are the measured record of rounds 1-12)."""
    GUARD_LANDED_TS = 1786865300.0  # r13: entries after this obey it
    for e in _entries():
        if e.get("ts", 0.0) >= GUARD_LANDED_TS and "host_factor" in e:
            assert _admissible(e["host_factor"]), e["ts"]
