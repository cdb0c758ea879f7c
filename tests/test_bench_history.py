"""Bench regression gate: the latest bench run must not be >1.5x slower
than the best prior run on any headline query at the same scale factor
(round-1 verdict item 9), AFTER dividing out the host factor — rounds
run on different hosts/boots whose speed varies uniformly 1.5-2x, so
the median now/best ratio estimates machine speed and only
plan-specific regressions beyond it fail. Sub-0.2 s queries are exempt
— at that scale the measurement is mostly fixed overhead noise."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _normalized_regressions  # noqa: E402

HISTORY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_history.jsonl")


def _entries():
    if not os.path.exists(HISTORY):
        return []
    out = []
    with open(HISTORY) as fh:
        for line in fh:
            try:
                out.append(json.loads(line))
            except ValueError:
                continue
    return out


def test_latest_bench_within_regression_budget():
    entries = _entries()
    if len(entries) < 2:
        pytest.skip("fewer than two bench runs recorded")
    latest = entries[-1]
    prior = [e for e in entries[:-1] if e.get("sf") == latest.get("sf")]
    if not prior:
        pytest.skip("no prior run at this sf")
    best = {}
    for e in prior:
        for name, t in e.get("queries", {}).items():
            if isinstance(t, (int, float)):
                best[name] = min(best.get(name, float("inf")), float(t))
    bad, host_factor = _normalized_regressions(latest.get("queries", {}), best)
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
