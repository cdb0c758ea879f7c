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


#: Mersenne prime 2^61-1: the checksum's modulus — sums stay exact in
#: DECIMAL(38,0) on both engines before the reduction, and the final
#: residue fits a BIGINT
_CKSUM_P = (1 << 61) - 1


def table_checksum(cols: list[str]) -> F.Column:
    """Order-independent CONTENT checksum of a frame: per row, the
    portable 60-bit md5 hash of the '|'-joined column values (NULL
    spelled out so it can't collide with the string 'None'); summed
    exactly in DECIMAL(38,0) — Spark 4's ANSI mode would raise on a
    BIGINT overflow, and decimal keeps both engines exact — then
    reduced mod 2^61-1. Commutative and associative, so the digest is
    independent of row order, partitioning, and file layout: equal
    bytes ⇒ equal digest on any engine that can md5. Returns a pure
    aggregate Column — it binds to whichever frame's ``agg`` it is
    placed in (which is why it takes no frame parameter)."""
    row = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in cols]
    )
    h = (
        F.conv(F.substring(F.md5(row), 1, 15), 16, 10)
        .cast("decimal(38,0)")
    )
    return (
        F.sum(h) % F.lit(_CKSUM_P).cast("decimal(38,0)")
    ).cast("long")


@register(
    "migrate_checksum_verify",
    oracle=f"""
        WITH rows_src AS (
            SELECT CAST(('0x' || substring(md5(
                       concat_ws('|',
                           COALESCE(CAST(o_orderkey AS VARCHAR), '\\N'),
                           COALESCE(CAST(o_orderstatus AS VARCHAR), '\\N'),
                           COALESCE(CAST(o_orderpriority AS VARCHAR), '\\N'))
                   ), 1, 15)) AS BIGINT) AS h
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT)
                    % {_CKSUM_P} AS BIGINT) AS src_checksum,
               CAST(CAST(SUM(CAST(h AS HUGEINT)) AS HUGEINT)
                    % {_CKSUM_P} AS BIGINT) AS dst_checksum,
               TRUE AS checksums_match
        FROM rows_src
    """,
    tags=("plan", "migration"),
)
def migrate_checksum_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY-VERIFY by CONTENT, not size — the integrity upgrade to the
    reference's migration check (``/root/reference/upload_to_rfs.py:
    65-77`` verifies only ``exists() and st_size > 0``; a truncated-
    then-padded or bit-flipped copy passes it): compute an
    order-independent table checksum (portable md5 row hash, exact
    decimal sum, mod 2^61-1) on the SOURCE, run the copy (a real
    repartitioned write+read round trip, so file layout and row order
    genuinely change), recompute on the DESTINATION, and emit both
    digests plus the match verdict. Row-order independence is the
    load-bearing property — a distributed copy never preserves order —
    and the oracle recomputes the digest from the raw table, so the
    driver hash pins the checksum algebra itself. At 100 TB this is
    one map-side hash + one 1-row aggregate per side."""
    import shutil as _shutil

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    src = load_table(spark, sf_dir, "orders").select(*cols)
    dst_path = scratch_path(spark, sf_dir, "migrate_cksum_dst")
    with scratch_cleanup(dst_path):
        # the copy: different partitioning => different file layout and
        # row order than the source
        src.repartition(7).write.mode("overwrite").parquet(dst_path)
        dst = spark.read.parquet(dst_path)
        s = src.agg(
            F.count(F.lit(1)).alias("n_rows"),
            table_checksum(cols).alias("src_checksum"),
        )
        d = dst.agg(table_checksum(cols).alias("dst_checksum"))
        return (
            s.crossJoin(F.broadcast(d))
            .select(
                "n_rows",
                "src_checksum",
                "dst_checksum",
                (F.col("src_checksum") == F.col("dst_checksum")).alias(
                    "checksums_match"
                ),
            )
            .localCheckpoint(eager=True)
        )
