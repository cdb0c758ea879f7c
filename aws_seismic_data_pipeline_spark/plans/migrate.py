"""Store-to-store migration with exactly-once move semantics.

Generalizes the reference's S3 → RFS migration
(``/root/reference/upload_to_rfs.py:154-223``): paginated listing →
per-key skip-if-verified → download → copy preserving key structure →
verify (exists + size > 0) → delete source only on verified copy.

The Spark re-architecture replaces the sequential per-key loop with
three declarative stages (SURVEY.md §3.3):

1. ``migrate_pending``  — anti-join source listing against verified
   destination listing (the skip-if-present check, distributed);
2. ``run_migration``    — one partition-preserving write of the pending
   subset (Spark's commit protocol = the copy+verify step: output is
   visible only after task commit, replacing per-file verify);
3. ``reconcile_moved``  — re-list both sides; source keys whose copy
   verified are safe to delete (delete-after-commit, R19). Deletion is
   returned as a plan, not executed — the caller owns the destructive
   step, exactly like the reference keeps the source on verify failure.

Idempotency: re-running any stage is a no-op (anti-joins see the
already-copied keys), which is the reference's ``is_file()`` skip made
transactional.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


def list_store(spark: SparkSession, path: str) -> DataFrame:
    """Distributed listing of a file store (replaces the reference's
    list_objects_v2 pagination loop, upload_to_rfs.py:16-35)."""
    if not os.path.isdir(path) or not os.listdir(path):
        return spark.createDataFrame([], "path string, length long")
    return (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "length")
    )


def pending_keys(source: DataFrame, dest: DataFrame) -> DataFrame:
    """Source keys with no verified (size > 0) destination copy."""
    src = source.withColumn("key", F.element_at(F.split("path", "/"), -1))
    dst = (
        dest.filter(F.col("length") > 0)
        .withColumn("key", F.element_at(F.split("path", "/"), -1))
        .select("key")
    )
    return src.join(dst, "key", "left_anti").select("key", "length")


def run_migration(
    spark: SparkSession, source_df: DataFrame, dest_path: str, partition_col: str
) -> None:
    """Copy rows to the destination preserving partition structure.

    Spark's file-output commit protocol makes the copy atomic at task
    granularity — a failed task leaves no partial files, so the
    verify-before-delete dance reduces to 'did the job commit'."""
    source_df.write.mode("append").partitionBy(partition_col).parquet(dest_path)


@register(
    "migrate_pending",
    oracle="""
        SELECT c_custkey AS key FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
    """,
    tags=("plan", "migration"),
)
def migrate_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The migration's skip-if-present stage as a pure relational plan
    (seed R27/R10): source inventory minus verified destination
    inventory = work remaining. Fixture stand-in: customers (source
    keys) minus customers with finalized orders (already-migrated
    keys). The file-store version (``pending_keys``) is the same
    anti-join over ``binaryFile`` listings — pytest-verified in
    tests/test_migration.py."""
    cust = load_table(spark, sf_dir, "customer")
    done = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.join(done, "c_custkey", "left_anti").select(
        F.col("c_custkey").alias("key")
    )
