"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the target posture for a real cluster:
AQE on (runtime re-planning, skew handling), shuffle partitions sized
to cores (not the 200 default), Arrow enabled for any Pandas-UDF path,
UTC session time zone (the reference pins everything to UTC —
``/root/reference/app.py:560-565`` derives its daily window from
``datetime.utcnow()``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "aws-seismic-data-pipeline-spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Reused Python workers intermittently stall ~10-30 s on their
        # first task of a new mapInPandas stage (measured: 4-query mix
        # 92 s with reuse, 19 s without). Fresh-worker fork cost is
        # ~100 ms/task — strictly better at this stage granularity.
        .config("spark.python.worker.reuse", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
