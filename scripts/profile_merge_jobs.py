"""Per-Spark-job trace of one merge_through_manifest call (r16 item 1:
fuse the residual delta aggregates). Lists every job the MERGE submits
with its callsite name and duration, so the fusion targets are named
by measurement, not guessed.

Usage: python scripts/profile_merge_jobs.py [--sql]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.jobsList(None).iterator()
    out = []
    while it.hasNext():
        j = it.next()
        dur = None
        try:
            if j.completionTime().isDefined() and j.submissionTime().isDefined():
                dur = (
                    j.completionTime().get().getTime()
                    - j.submissionTime().get().getTime()
                ) / 1000.0
        except Exception:
            pass
        out.append((j.jobId(), j.name(), dur))
    return out


def main() -> None:
    import glob as _glob

    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import (
        load_table,
        prepare,
        scratch_cleanup,
        scratch_path,
    )
    from aws_seismic_data_pipeline_spark.session import get_spark
    from aws_seismic_data_pipeline_spark.sources.table.maintenance import (
        merge_through_manifest,
    )
    from aws_seismic_data_pipeline_spark.sources.table.manifest import (
        write_stats_manifest,
    )

    spark = get_spark(app_name="profile_merge_jobs")
    prepare(spark, SF_DIR)
    data_dir = scratch_path(spark, SF_DIR, "mprof_data")
    mpath = scratch_path(spark, SF_DIR, "mprof_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.repartition(4, "doc_id").write.mode("overwrite").parquet(data_dir)
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("doc_id",))
        updates = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "n_chars", F.col("n_chars") + F.lit(100)
        )
        inserts = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000000)
        )
        delta = updates.unionByName(inserts)
        # warm the fixture lineage so first-touch JIT doesn't pollute
        delta.write.format("noop").mode("overwrite").save()
        before = {j[0] for j in _jobs(spark)}
        t0 = time.perf_counter()
        stats: dict = {}
        merge_through_manifest(
            spark,
            mpath,
            delta,
            "doc_id",
            ["lang", "n_chars"],
            delete_where="n_chars > 600",
            stats_out=stats,
        )
        wall = time.perf_counter() - t0
        after = _jobs(spark)
        new = [j for j in after if j[0] not in before]
        print(f"\nmerge_through_manifest: {wall:.3f}s, {len(new)} jobs")
        print(f"stats_out: {stats}")
        for jid, name, dur in sorted(new):
            d = f"{dur:.3f}s" if dur is not None else "?"
            print(f"  job {jid:4d}  {d:>8}  {name}")
    spark.stop()


if __name__ == "__main__":
    main()
