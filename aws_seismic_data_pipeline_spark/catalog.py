"""Fixture catalog: schema-aware loaders for the driver's parquet tables.

The reference loads its "catalog" (dimension lists + endpoint map) from a
JSON config file (``/root/reference/app.py:28-33``, ``config.json:1-24``).
Here the catalog is the driver's TPC-H-ish parquet star schema
(TESTDATA.md); this module is the single place that knows about its
physical quirks so every operator builder sees clean, typed DataFrames.

Physical quirk handled here: ``events.parquet`` stores ``ts`` as parquet
``TIMESTAMP(NANOS)``, which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). We read it via the supported
``spark.sql.legacy.parquet.nanosAsLong`` path and convert to
``timestamp_ntz`` at microsecond precision — exactly what DuckDB's
``CAST(ts AS TIMESTAMP)`` yields, so oracle comparisons line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Runtime SQL confs every builder needs regardless of who constructed the
# SparkSession (the driver passes its own session into queries()).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Fixture files are single 1-11 MB parquet files: at the default
    # 128 MB maxPartitionBytes every scan is ONE task and the whole
    # read+decode serializes onto one core. 1 MB splits let the scan
    # fan out across cores (row-group granularity bounds it); AQE
    # coalesces any resulting small shuffle partitions. At production
    # scale (multi-GB files) the 128 MB default is correct — this
    # constant sizes the small-file case only, measured 1.3-1.8× on
    # scan-bound queries at sf0.1.
    "spark.sql.files.maxPartitionBytes": str(1024 * 1024),
}


def prepare(spark: SparkSession) -> SparkSession:
    """Pin runtime confs that correctness/performance depend on."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - immutable conf on some builds
            pass
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical types."""
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos → micros, truncating exactly like DuckDB's TIMESTAMP cast.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}
