"""Object-store I/O configuration and the staged-upload plan.

The reference's core business is moving chunks into S3
(``/root/reference/upload_to_rfs.py:16-35``, ``app.py:449-488``:
boto3 ``upload_file`` per chunk, ``YYYYMMDD/station/`` key layout,
delete-after-verify). Spark reaches the same stores through Hadoop
filesystem connectors, where correctness and throughput live in a
handful of well-known confs — this module is the single place that
assembles them, plus the staged-write plan that replaces the
reference's upload-then-delete with atomic task commits.

Everything here is scheme-driven: ``file://`` paths (tests, local dev)
get the same code path as ``s3a://`` URIs minus the cloud-only confs,
so the plan is exercised end-to-end in CI with no network. All conf
names are public hadoop-aws / Spark cloud-integration documentation.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table, prepare
from aws_seismic_data_pipeline_spark.registry import register

#: Confs for correct, fast parquet writes to S3-compatible stores.
#: Rename-based commit is O(data) and non-atomic on object stores; the
#: S3A committers (here: magic) commit via multipart-upload completion —
#: O(1) per file and atomic per task. Reads: random IO for parquet's
#: footer+column seeks, vectored ranges to coalesce them.
S3A_CONFS: dict[str, str] = {
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
    "spark.hadoop.fs.s3a.vectored.read.max.merged.size": "2M",
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    "spark.hadoop.fs.s3a.fast.upload": "true",
    "spark.hadoop.fs.s3a.multipart.size": "64M",
    # credential chain: env -> instance profile; never inline secrets
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,"
        "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
        "com.amazonaws.auth.InstanceProfileCredentialsProvider"
    ),
}


def object_store_confs(uri: str) -> dict[str, str]:
    """Confs a session needs to read/write ``uri``, keyed by scheme.

    ``s3a://`` gets the committer + tuning set above; ``file://`` and
    bare paths need nothing (rename is atomic on POSIX). Unknown remote
    schemes raise rather than silently writing with a rename committer
    that corrupts on speculative retries."""
    scheme = urlparse(uri).scheme or "file"
    if scheme == "s3a":
        return dict(S3A_CONFS)
    if scheme in ("file", ""):
        return {}
    raise ValueError(
        f"no committer profile for scheme {scheme!r}; "
        "add one to cloud.object_store_confs before writing there"
    )


def stage_dataset(
    df: DataFrame,
    uri: str,
    partition_by: list[str],
) -> None:
    """Write ``df`` to ``uri`` partitioned for prefix-parallel reads —
    the engine form of the reference's ``YYYYMMDD/station/`` key layout.
    Scheme-appropriate committer confs must already be on the session
    (``object_store_confs``); the write itself is one atomic-per-task
    ``mode=overwrite`` with no post-write delete pass."""
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(uri)


@register(
    "sink_object_store_stage",
    oracle="""
        SELECT CAST(strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') AS VARCHAR)
                   AS day_prefix,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    tags=("sink", "cloud"),
)
def sink_object_store_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged object-store upload of the event log, laid out exactly like
    the reference's S3 keys (``YYYYMMDD/<type>/...``, app.py:449-463):
    scheme-aware committer confs, day+type partitioned write, manifest
    read-back counting objects per prefix. Runs against ``file://`` here
    (no network in CI); pointing ``SPARK_GRAFT_STAGE_URI`` at an
    ``s3a://`` bucket engages the magic-committer profile with no code
    change — which is the point: layout and commit semantics are
    engine-level, the store is a conf."""
    prepare(spark)
    base = os.environ.get(
        "SPARK_GRAFT_STAGE_URI",
        "file:///root/repo/_tmp/stage_events",
    )
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    uri = f"{base}_{sf_tag}"
    for key, val in object_store_confs(uri).items():
        spark.conf.set(key, val)
    events = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyyMMdd").alias("day_prefix"),
        "event_type",
        "event_id",
        "user_id",
        "value",
    )
    stage_dataset(events, uri, ["day_prefix", "event_type"])
    back = spark.read.parquet(uri)
    return back.groupBy(
        F.col("day_prefix").cast("string").alias("day_prefix"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
