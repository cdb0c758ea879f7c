"""Per-Spark-job trace of one registered query's noop-sink execution:
every job with its callsite name and duration, after one untraced
warm-up run (JIT/page-cache), so slow slots are decomposed by
measurement before touching anything (guide §1).

Usage: python scripts/profile_query_jobs.py <query> [<query> ...]
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
    from aws_seismic_data_pipeline_spark.registry import load_all
    from aws_seismic_data_pipeline_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="profile_query_jobs")
    for name in sys.argv[1:]:
        spec = registry[name]
        # warm-up (untraced)
        spec.builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        before = {j[0] for j in _jobs(spark)}
        t0 = time.perf_counter()
        spec.builder(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        new = [j for j in _jobs(spark) if j[0] not in before]
        print(f"\n=== {name}: {wall:.3f}s, {len(new)} jobs ===")
        for jid, jname, dur in sorted(new):
            d = f"{dur:.3f}s" if dur is not None else "?"
            print(f"  job {jid:4d}  {d:>8}  {jname}")
    spark.stop()


if __name__ == "__main__":
    main()
