"""Source-level scale-hygiene gate: pins the anti-pattern audit the
round-7 verdict performed by hand (no row-at-a-time Python UDFs outside
the mechanism witness, every driver-side collect on a bounded frame,
every cartesian join on a driver-scale frame) as a REGRESSION TEST — a
new operator that quietly adds a corpus-scale collect or a hot-path
@udf fails CI instead of surviving until the next manual audit.

The allowlists are intentionally explicit: adding a file here is a
reviewed decision with a justification, not an accident."""

from __future__ import annotations

import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "aws_seismic_data_pipeline_spark",
)


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _rel(p: str) -> str:
    return os.path.relpath(p, PKG).replace(os.sep, "/")


#: files allowed to contain driver-side .collect() — every site audited
#: bounded (query-vector sets of 10-50 rows, k x d k-means partials,
#: 1-row coverage aggs and the 1-row count-min sketch blob, dim tables,
#: metadata-scale manifest/path frames, per-token bucket lookups, the
#: 2-value star-contraction round fingerprint in llm/dedup.py, and
#: distributed_ntile's <= |shuffle partitions| per-partition count
#: scalars in operators/window_ops.py)
COLLECT_ALLOWED = {
    "operators/window_ops.py",
    "llm/dedup.py",
    "llm/ivf.py",
    "llm/pq.py",
    "operators/aggregates.py",
    "llm/search.py",
    "llm/similarity.py",
    "plans/validate.py",
    "sources/readers.py",
    "sources/footers.py",  # r11 split: footer-stats listing frames
    "sources/table/commit.py",  # snapshot max() 1-row agg
    "sources/table/constraints.py",  # |constraints|-row pyarrow-fallback read + 1-row gate agg
    "sources/table/cdf.py",  # commit inventory + candidate path frames
    "sources/table/sqlface.py",  # fixture delete keys + 1-row commit clock
    "sources/table/manifest.py",  # metadata-scale path/stats frames
    "sources/table/evolution.py",
    "sources/table/deletes.py",
    "sources/table/maintenance.py",
    "sources/table/sketches.py",
    "sources/table/facade.py",
    "streaming/jobs.py",
    "streaming/scheduled.py",
    # r15: tip 1-row agg + group-cardinality-scale window deltas (the
    # 100 TB shape MERGEs the delta instead — module docstring)
    "streaming/cdf_consumer.py",
}

#: files allowed to register row-at-a-time Python UDFs: exactly the
#: UDF-mechanism witness module
PYTHON_UDF_ALLOWED = {"functions/udfs.py"}

#: files allowed to call crossJoin — each site joins a 1-row aggregate
#: or driver-scale grid, never two data-scale frames
CROSSJOIN_ALLOWED = {
    "plans/ingest.py",
    "plans/validate.py",
    "operators/joins.py",
    "operators/aggregates.py",  # 1-row global-exact frame (KMV merge)
    "operators/analytics.py",
    "operators/graph.py",  # 1-row node-count frame (broadcast, per sweep)
    "llm/curation.py",  # 1-row corpus-sizes frame (DSIR normalizers)
    "llm/dedup.py",
    "llm/text.py",
    "llm/similarity.py",
    "llm/vector.py",  # 1-row aggregate-recall anchor (property surface)
    "operators/window_ops.py",  # 1-row global-total anchor (rank_global)
    "sources/table/sketches.py",  # 1-row exact/estimate anchors (sketch NDV)
    "plans/migrate.py",  # 1-row destination-checksum anchor
    "sources/http_fetch.py",
}


def test_collect_sites_are_allowlisted():
    found = {
        _rel(p)
        for p in _py_files()
        if re.search(r"\.collect\(\)", open(p).read())
    }
    assert found <= COLLECT_ALLOWED, (
        "new .collect() site(s) — audit that the collected frame is "
        f"bounded, then extend the allowlist: {sorted(found - COLLECT_ALLOWED)}"
    )


def test_row_at_a_time_udfs_only_in_witness():
    found = {
        _rel(p)
        for p in _py_files()
        if re.search(r"(^|\W)@udf\b|\bF\.udf\(", open(p).read())
    }
    assert found <= PYTHON_UDF_ALLOWED, (
        "row-at-a-time Python UDF outside the mechanism witness — "
        "hot paths must use built-ins or Arrow-batched forms: "
        f"{sorted(found - PYTHON_UDF_ALLOWED)}"
    )


def test_crossjoin_sites_are_allowlisted():
    found = {
        _rel(p)
        for p in _py_files()
        if "crossJoin" in open(p).read()
    }
    assert found <= CROSSJOIN_ALLOWED, (
        "new crossJoin site(s) — verify one side is 1-row/driver-scale, "
        f"then extend the allowlist: {sorted(found - CROSSJOIN_ALLOWED)}"
    )


#: files allowed to touch the RDD API — catalog.py reads
#: df.rdd.getNumPartitions() for split-count introspection only (no
#: RDD computation ever runs)
RDD_ALLOWED = {"catalog.py"}


def test_no_rdd_api_in_operators():
    """The DataFrame-first mandate: no .rdd / sparkContext.parallelize
    escapes in operator code (mapInPandas/mapInArrow are the sanctioned
    below-DataFrame paths)."""
    offenders = []
    for p in _py_files():
        src = open(p).read()
        if re.search(r"\.rdd\b|\bparallelize\(", src):
            offenders.append(_rel(p))
    assert set(offenders) <= RDD_ALLOWED, offenders


def test_no_collect_into_loop_over_data():
    """Heuristic tripwire for the worst anti-pattern — iterating a
    collected corpus-scale frame: a `for ... in <x>.collect()` is only
    tolerated in files already on the bounded-collect allowlist."""
    for p in _py_files():
        rel = _rel(p)
        src = open(p).read()
        if re.search(r"for\s+\w+\s+in\s+[\w.]+\.collect\(\)", src):
            assert rel in COLLECT_ALLOWED, rel
