"""Bench regression gate: the latest bench run must not be >1.5x slower
than the best prior run on any headline query at the same scale factor
(round-1 verdict item 9). Sub-0.2 s queries are exempt — at that scale
the measurement is mostly fixed overhead noise."""

from __future__ import annotations

import json
import os

import pytest

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
    bad = {
        name: (t, best[name])
        for name, t in latest.get("queries", {}).items()
        if name in best and t > 1.5 * best[name] and t > 0.2
    }
    assert not bad, f">1.5x slowdowns vs best prior: {bad}"
