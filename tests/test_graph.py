"""Iterative graph operators: hand-verified fixpoint semantics on tiny
graphs (the oracle pins engine parity; these pin the MATH)."""

from __future__ import annotations

import pytest


def test_pagerank_uniform_on_regular_graph(spark, monkeypatch):
    """On a regular graph (4-cycle: every node degree 2) PageRank's
    uniform distribution is an exact fixpoint — after any number of
    sweeps every node must hold rank 1/N exactly, and ranks must sum
    to 1 (no dangling leakage by construction)."""
    import aws_seismic_data_pipeline_spark.operators.graph as G

    # suppliers {0,1} and parts {0,1} wired into a 4-cycle:
    # s0-p0, p0-s1, s1-p1, p1-s0  (each node touches exactly 2 edges)
    pairs = spark.createDataFrame(
        [(0, 0), (1, 0), (1, 1), (0, 1)],
        "l_suppkey long, l_partkey long",
    )
    monkeypatch.setattr(G, "load_table", lambda s, d, t: pairs)
    out = G.graph_pagerank(spark, "unused").collect()
    assert len(out) == 4
    for r in out:
        assert r.rank == pytest.approx(0.25, abs=1e-9), r
    assert sum(r.rank for r in out) == pytest.approx(1.0, abs=1e-8)
    types = {r.node: r.node_type for r in out}
    assert types[0] == "supplier" and types[1] == "part"


def test_pagerank_star_center_dominates(spark, monkeypatch):
    """On a star (one part linked to 3 suppliers) the hub must
    out-rank every leaf, and the hand-iterated 3-sweep values must
    match exactly — pinning the (1-d)/N + d*sum(r/deg) recurrence."""
    import aws_seismic_data_pipeline_spark.operators.graph as G

    pairs = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0)], "l_suppkey long, l_partkey long"
    )
    monkeypatch.setattr(G, "load_table", lambda s, d, t: pairs)
    out = {r.node: r.rank for r in G.graph_pagerank(spark, "unused").collect()}

    # hand iteration: nodes = hub(part 0 -> id 1) + 3 leaves, N=4
    n, d = 4, 0.85
    hub, leaf = 1 / n, 1 / n
    for _ in range(G.PAGERANK_ITERS):
        new_hub = (1 - d) / n + d * 3 * (leaf / 1.0)  # leaves have deg 1
        new_leaf = (1 - d) / n + d * (hub / 3.0)      # hub has deg 3
        hub, leaf = new_hub, new_leaf
    assert out[1] == pytest.approx(round(hub, 9), abs=1e-12)
    for leaf_node in (0, 2, 4):
        assert out[leaf_node] == pytest.approx(round(leaf, 9), abs=1e-12)
    assert out[1] > out[0]


def test_personalized_pagerank_localizes_to_seeds(spark, monkeypatch):
    """Personalization semantics on a two-component graph: with seeds
    confined to one component, the other component must receive ZERO
    rank (the frontier never reaches it), total rank stays bounded by
    1, and the ranks equal the hand-run recurrence (note the bipartite
    parity artifact: after an ODD sweep count most mass sits on the
    part side — the test pins the exact values, not a parity-fragile
    dominance claim)."""
    import aws_seismic_data_pipeline_spark.operators.graph as G

    # component A: supplier 0 - parts {0,1}; component B: supplier 5 - part 9
    pairs = spark.createDataFrame(
        [(0, 0), (0, 1), (5, 9)], "l_suppkey long, l_partkey long"
    )
    suppliers = spark.createDataFrame(
        [(0, "SUP0", G.PPR_SEED_NATION), (5, "SUP5", 1)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    monkeypatch.setattr(
        G,
        "load_table",
        lambda s, d, t: pairs if t == "lineitem" else suppliers,
    )
    out = {r.node: r for r in
           G.graph_pagerank_personalized(spark, "unused").collect()}
    # component B nodes (ids 10 and 19) must not appear (zero rank)
    assert 10 not in out and 19 not in out
    # hand recurrence: r0 = {seed: 1}; teleport 0.15 to the seed only
    seed, parts = 1.0, {1: 0.0, 3: 0.0}
    for _ in range(G.PAGERANK_ITERS):
        new_seed = 0.15 + 0.85 * sum(parts.values())  # parts have deg 1
        give = 0.85 * seed / 2.0                      # seed has deg 2
        parts = {k: give for k in parts}
        seed = new_seed
    assert out[0].rank == round(seed, 9)
    for k, v in parts.items():
        assert out[k].rank == round(v, 9)
    assert out[1].rank == out[3].rank  # symmetry
    assert sum(r.rank for r in out.values()) <= 1.0 + 1e-9
