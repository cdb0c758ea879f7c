"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is measured with the ``noop`` sink — full plan execution
(scan → shuffle → agg) without driver-side collect overhead, i.e. the
number that scales to a real cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

HEADLINE = [
    "analytics_shipping_priority",
    "analytics_local_supplier_volume",
    "analytics_forecast_revenue",
    "agg_groupby_hash",
    "join_inner_equi",
    "join_broadcast",
    "join_asof_nearest",
    "window_rank",
    "window_frame_agg",
    "window_sessionize",
    "text_bigram_counts",
    "stream_tumbling_agg",
    "ingest_plan_daily",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_scaled",
    "dedup_simhash_pairs",
    "sim_topk_bruteforce",
    "sim_topk_bucketed",
    "mm_decode_metadata",
    "text_quality_score",
    "limit_topk_per_group",
    "set_union_all",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from aws_seismic_data_pipeline_spark.registry import load_all
    from aws_seismic_data_pipeline_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="bench")

    # warm the page cache + JIT so per-query numbers reflect steady state
    for t in ("lineitem", "orders", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # Best of 2 runs per query: first execution pays codegen/JIT and
    # Python-worker fork storms that are hostage to co-tenant machine
    # load; the minimum reflects the plan's steady-state cost, which is
    # what scales to a cluster.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = registry[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
