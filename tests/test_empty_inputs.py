"""Empty-input robustness: a 100 TB pipeline regularly sees empty
partitions, empty snapshots, and freshly-created tables. Core operators
must plan and execute against 0-row (schema-correct) inputs without
crashing — returning an empty (or correctly-seeded) result, never a
div-by-zero, a failed array index, or an .head()[0] on nothing.

Excluded by design: iterative trainers that need seed rows (IVF),
filesystem-staging streaming jobs, and golden-sf0.01 oracles (their
semantics are tied to the real fixture)."""

from __future__ import annotations

import os

import pytest

from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()

# A representative slice of every family whose plan should degrade to
# empty output on empty input.
EMPTY_SAFE = [
    "scan_parquet", "project_expr", "filter_predicate", "filter_in_set",
    "join_inner_equi", "join_broadcast", "join_left_outer", "join_left_anti",
    "join_asof_nearest", "join_asof_tolerance", "join_salted_skew",
    "agg_groupby_hash", "agg_rollup", "agg_percentile", "agg_collect",
    "agg_weighted_avg", "agg_corr_regression",
    "window_rank", "window_frame_agg", "window_sessionize",
    "limit_topk_global", "limit_topk_per_group", "sort_multi_key",
    "set_union_all", "set_except", "set_intersect",
    "fn_string", "fn_math", "fn_array", "fn_json",
    "pivot_status_counts", "unpivot_part_measures",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_banded",
    "dedup_simhash", "dedup_incremental_snapshot", "dedup_keep_best_quality",
    "dedup_lsh_verified", "sim_range_search", "window_cumulative_distinct",
    "text_tokenize_stats", "text_quality_score", "text_lang_id",
    "text_decontaminate", "curate_quality_gate", "curate_pretrain_manifest",
    "sample_stratified_seeded", "pack_token_budget", "shard_assign_hash",
    "analytics_shipping_priority", "analytics_cohort_retention",
    "analytics_basket_affinity", "curate_mix_epochs", "fn_variant",
    "analytics_event_funnel", "layout_zorder_cluster",
    "subquery_not_in_anti", "plan_merge_upsert",
    # round-7 additions (mm_decode_real* and join_salted_skew_hot run
    # per-row generators/joins that degrade to empty naturally;
    # scan_rowgroup_pruned stages files and is excluded like the other
    # filesystem-staging ops)
    "join_salted_skew_hot", "analytics_shipmode_priority",
    "mm_decode_real", "mm_decode_real_image", "ts_outlier_mad",
    # round-8 additions (the per-row generator/pair plans degrade to
    # empty naturally; the manifest/vacuum family stages files and is
    # excluded like the other filesystem-staging ops)
    "dedup_ngram_containment", "mm_audio_features", "mm_image_stats",
    # late-round-8 additions: bounded-frame window ops, the PSI monitor
    # (no populated buckets -> no rows -> no division), the hardened
    # index probes (an empty-corpus build writes no readable parquet;
    # both probes return schema-correct empty frames), the strategy
    # hint, and the grouped-Arrow witness
    "ts_ewma", "ts_rolling_median", "profile_snapshot_drift",
    "text_keyword_search", "text_decontaminate_indexed",
    "join_shuffle_hash_hint", "udaf_arrow_grouped",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Write a 0-row, schema-identical copy of every fixture table."""
    base = tmp_path_factory.mktemp("empty_sf")
    from aws_seismic_data_pipeline_spark.catalog import TABLES

    for t in TABLES:
        df = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            str(base / f"{t}.parquet")
        )
    return str(base)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = REGISTRY[name].builder(spark, empty_sf_dir)
    rows = df.collect()
    # analytics_event_funnel emits its 3 step rows with zero counts;
    # everything else must be empty. Either way: no crash, sane schema.
    assert df.columns
    if name == "analytics_event_funnel":
        assert all(r.n_users == 0 for r in rows)
    else:
        assert rows == []


def test_global_order_primitives_on_empty_frames(spark):
    """The r10 distributed global-order primitives must survive n=0:
    empty counts, zero offsets, no rows out, no division-by-zero in the
    (unreachable) tile branch."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.operators.window_ops import (
        distributed_ntile,
        distributed_rank,
        distributed_running_sum,
    )

    empty = spark.range(0).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert (
        distributed_ntile(empty, [F.col("v"), F.col("k")], 4, "q").collect()
        == []
    )
    assert (
        distributed_rank(empty, [F.col("v"), F.col("k")], "r").collect() == []
    )
    assert (
        distributed_running_sum(
            empty, [F.col("v"), F.col("k")], "v", "rs"
        ).collect()
        == []
    )
