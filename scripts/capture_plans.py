"""Capture .explain('formatted') for declared queries into
plans/r15/<query>_<tag>.txt — the optimization round's before/after
plan evidence. Usage:

    python scripts/capture_plans.py <before|after> [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r16",
)

#: the queries this optimization round touches (governed-table /
#: manifest family + any added later)
DEFAULT = [
    "scan_manifest_pruned",
    "scan_manifest_pruned_multi",
    "scan_manifest_pruned_rowgroup",
    "scan_manifest_partitioned",
    "scan_manifest_partition_evolution",
    "scan_manifest_count_only",
    "scan_manifest_asof",
    "scan_manifest_incremental",
    "scan_manifest_stats",
    "plan_equality_delete",
    "plan_delete_compaction",
    "plan_retention_delete",
    "plan_merge_partitioned",
    "plan_merge_schema_evolution",
    "plan_merge_three_clause",
    "plan_merge_upsert",
    "plan_change_data_feed",
    "plan_schema_evolve",
    "plan_schema_rename_drop",
    "plan_optimize_zorder",
    "plan_optimize_zorder_incremental",
    "plan_optimize_hilbert",
    "plan_expire_snapshots",
    "plan_vacuum_orphans",
    "plan_shallow_clone",
    "plan_describe_history",
    "plan_time_travel_timestamp",
    "plan_constraint_enforce",
    "plan_manifest_merge",
    "plan_manifest_rollback",
    "plan_manifest_compact_commit",
    "sql_governed_time_travel",
    "sql_write_face",
    "stream_cdf_consumer",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from aws_seismic_data_pipeline_spark.registry import load_all
    from aws_seismic_data_pipeline_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name=f"capture_plans_{tag}")
    for name in names:
        try:
            df = registry[name].builder(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok   {name}")
        except Exception as e:  # noqa: BLE001 - capture everything
            print(f"FAIL {name}: {e}")


if __name__ == "__main__":
    main()
