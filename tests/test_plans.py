"""Physical-plan assertions: the scale posture is a property of the
plan, not just the results. These lock in pushdown/broadcast/top-k
strategies so a refactor can't silently regress them (SURVEY.md §4).
"""

from __future__ import annotations

import pytest

from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, name: str) -> str:
    df = REGISTRY[name].builder(spark, SF_DIR)
    return df._jdf.queryExecution().toString()


def test_scan_pushdown_and_pruning(spark):
    plan = _optimized(spark, "scan_parquet")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # projection pruned to 5 of 11 columns (4 selected + filter column)
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_tax" not in read_schema


def test_broadcast_join_stays_broadcast(spark):
    plan = _plan(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_range_join_is_broadcast_nested_loop(spark):
    plan = _plan(spark, "join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_global_sort_limit_uses_topk(spark):
    plan = _plan(spark, "sort_multi_key")
    # per-partition top-k + merge, not a full global sort
    assert "TakeOrderedAndProject" in plan


def test_groupby_does_partial_aggregation(spark):
    plan = _plan(spark, "agg_groupby_hash")
    # map-side partial + final: two HashAggregate levels around the
    # exchange means combiner semantics at 100 TB
    assert plan.count("HashAggregate") >= 2


def test_anti_join_no_cartesian(spark):
    plan = _plan(spark, "join_left_anti")
    assert "CartesianProduct" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Both sides bucketed on the join key ⇒ join + same-key agg run
    without any shuffle (the pay-once-at-write-time contract)."""
    plan = _plan(spark, "join_bucketed_colocated")
    assert "Exchange" not in plan, plan


def test_partition_pruned_scan_prunes_directories(spark):
    plan = _plan(spark, "scan_partition_pruned")
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_day" in pf


def test_analytics_topk_avoids_global_sort(spark):
    plan = _plan(spark, "analytics_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_forecast_revenue_pushes_all_predicates(spark):
    plan = _optimized(spark, "analytics_forecast_revenue")
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"


def test_correlated_scalar_subquery_single_shuffle(spark):
    # the hand-decorrelated Q17: per-part avg via window over the SAME
    # partitioning as the join output — exactly one Exchange after scans
    df = REGISTRY["subquery_scalar_correlated"].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected <=2 shuffles, plan has {n_exchanges}"


def test_dynamic_partition_pruning_in_plan(spark):
    """The DPP query's fact scan must carry a runtime pruning subquery —
    the property that keeps a 100 TB partitioned fact from full-scanning
    when the partition set comes from a joined dimension."""
    plan = _plan(spark, "join_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower()


def test_tfidf_single_corpus_scan(spark):
    """tf feeds both the score and document-frequency branches; the
    eager localCheckpoint must keep the corpus at ONE parquet scan +
    one tokenize (a second scan means the lineage cut regressed)."""
    plan = _plan(spark, "text_tfidf_topk")
    assert plan.count("Scan parquet") == 1


def test_stratified_sample_never_shuffles_corpus(spark):
    """The sampling decision is a scan-level hash filter plus a
    broadcast-joined rate table — zero corpus shuffle. A rewrite that
    shuffles 100 TB to pick a 40% sample has lost the point."""
    plan = _plan(spark, "sample_stratified_seeded")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_pack_token_budget_single_shuffle(spark):
    """The per-language window and the (lang, pack_id) aggregation must
    share ONE exchange: the groupBy rides the window's partitioning."""
    plan = _plan(spark, "pack_token_budget")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("HashAggregate") >= 2  # map-side partial


def test_shard_assign_partial_aggregation(spark):
    plan = _plan(spark, "shard_assign_hash")
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_segment_dedup_two_linear_shuffles(spark):
    """Cross-doc segment dedup: count-by-segment-hash + per-doc rollup,
    joined back on the one-row-per-distinct-segment side — never a
    candidate cross join and never more than the two linear shuffles."""
    plan = _plan(spark, "dedup_segment_crossdoc")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_doc_repetition_two_linear_shuffles(spark):
    plan = _plan(spark, "text_doc_repetition")
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_merge_upsert_single_shuffle_join(spark):
    """MERGE is ONE join on the merge key (full outer): at most one
    exchange per side feeding a single SortMergeJoin, no cartesian."""
    plan = _plan(spark, "plan_merge_upsert")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_ivf_search_never_shuffles_corpus(spark):
    """IVF probe: centroids + queries ride the task closure into
    mapInPandas kernels; the corpus is read from the one checkpointed
    materialization (no parquet re-scan — training already paid the
    decode). The only allowed exchange is the tiny partial-top-k
    merge. Targets the raw search plan (``build_and_search``); the
    registered ``sim_topk_ivf`` wraps it in the verified-property
    surface, whose exact-twin scan is out of scope here."""
    from aws_seismic_data_pipeline_spark.llm.ivf import build_and_search

    df = build_and_search(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") >= 1
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert plan.count("Scan parquet") == 0, plan
    assert "ExistingRDD" in plan, plan


def test_scd2_single_shuffle(spark):
    """All four SCD2 steps (lag, version sum, run collapse, lead) must
    ride ONE user_id exchange — an extra exchange means a window stopped
    sharing the partitioning."""
    plan = _plan(spark, "plan_scd2_dimension")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bloom_filter_reaches_fact_scan(spark):
    """The runtime bloom filter must be injected: might_contain on the
    fact side, built from the filtered dimension's join keys."""
    plan = _plan(spark, "join_bloom_filtered")
    assert "bloomfilter" in plan.lower().replace("_", ""), plan


def test_topn_per_stratum_uses_window_group_limit(spark):
    """rank<=N must push into the window sort (WindowGroupLimit) so only
    N rows per stratum survive — not a full-stratum materialized sort."""
    plan = _plan(spark, "sample_topn_per_stratum")
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_lm_perplexity_single_tokenize(spark):
    """The exploded token table feeds both the count and score branches
    via one eager localCheckpoint: no parquet re-scan, and the 1-row
    total joins as a broadcast, never a shuffled cartesian."""
    plan = _plan(spark, "text_lm_perplexity")
    assert plan.count("Scan parquet") == 0, plan
    assert "CartesianProduct" not in plan


def test_union_by_name_no_shuffle(spark):
    """Schema-evolving union is pure map-side concatenation."""
    plan = _plan(spark, "set_union_by_name")
    assert "Union" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_bitmap_distinct_partial_aggregates(spark):
    """Both bitmap levels must combine map-side (partial bitmap
    construct, partial sum of popcounts) — the property that makes the
    bitmaps re-aggregatable partials instead of raw key shuffles."""
    plan = _plan(spark, "agg_bitmap_distinct")
    assert "partial_bitmap_construct_agg" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_exists_flag_dedups_before_join(spark):
    """The mark join must aggregate the subquery side to distinct keys
    BEFORE joining (no fan-out), visible as an aggregate under the
    join's build side."""
    plan = _plan(spark, "subquery_exists_flag")
    assert plan.count("HashAggregate") >= 2, plan
    assert "CartesianProduct" not in plan


def test_broadcast_hints_only_on_bounded_sides(spark):
    """Q8 must not force-broadcast customer/part/supplier (driver OOM
    at 100 TB); AQE may still choose broadcast by size at fixture
    scale, but no explicit ResolvedHint may pin fact-scaled tables."""
    df = REGISTRY["analytics_market_share"].builder(spark, SF_DIR)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # broadcast hints survive optimization as 'JoinHint' annotations on
    # the join nodes they pin; none may reference the big tables
    for line in optimized.splitlines():
        if "leftHint" in line or "rightHint" in line or "broadcast" in line.lower():
            assert "c_custkey" not in line and "p_partkey" not in line and (
                "s_suppkey" not in line or "sn_key" in line
            ), f"fact-scaled broadcast hint survived: {line}"


@pytest.mark.parametrize(
    "name,max_shuffles",
    [
        # the as-of family's whole point: ONE shuffle (union + window),
        # never a range join or per-row lookup
        ("join_asof_nearest", 1),
        ("join_asof_tolerance", 1),
        # hash agg families: single exchange on the group key
        ("dedup_exact", 1),
        ("agg_groupby_hash", 1),
        # pure scan->filter->global agg: partial/final, no hash exchange
        ("analytics_forecast_revenue", 0),
        ("agg_approx_sample_estimate", 1),
    ],
)
def test_shuffle_count_pinned(spark, name, max_shuffles):
    """Scale-shape regression pin: these plans' defining property is
    their shuffle count — a refactor that adds an Exchange (a second
    aggregation pass, a join where a window sufficed) is a 100 TB
    regression even when results stay correct."""
    from aws_seismic_data_pipeline_spark.registry import load_all

    from .conftest import SF_DIR

    df = load_all()[name].builder(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n <= max_shuffles, f"{name}: {n} shuffles (max {max_shuffles})\n{plan}"
