"""Move-semantics tests for the store-to-store migration plan
(plans/migrate.py): skip-if-present, copy-verify, idempotent re-run —
the reference behaviors at upload_to_rfs.py:154-223 with no SQL oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.plans.migrate import (
    list_store,
    pending_keys,
    run_migration,
)

from .conftest import SF_DIR


def _mkstore(files: dict[str, bytes]) -> str:
    d = tempfile.mkdtemp(prefix="store_")
    for name, content in files.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(content)
    return d


def test_pending_keys_skips_verified_copies(spark):
    src = _mkstore({"a.mseed": b"aa", "b.mseed": b"bb", "c.mseed": b"cc"})
    # b verified at dest; c present but EMPTY (size 0 → not verified,
    # mirrors verify_file_in_rfs's st_size > 0 check)
    dst = _mkstore({"b.mseed": b"bb", "c.mseed": b""})
    try:
        pending = pending_keys(list_store(spark, src), list_store(spark, dst))
        keys = {r["key"] for r in pending.collect()}
        assert keys == {"a.mseed", "c.mseed"}
    finally:
        shutil.rmtree(src)
        shutil.rmtree(dst)


def test_migration_roundtrip_idempotent(spark):
    """Two runs land exactly one copy per partition (commit-protocol
    replacement for upload-then-delete)."""
    dest = tempfile.mkdtemp(prefix="dest_")
    shutil.rmtree(dest)  # writer creates it (ensure-exists semantics)
    try:
        nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
        first = nation.filter(F.col("n_regionkey") < 2)
        run_migration(spark, first, dest, "n_regionkey")
        n1 = spark.read.parquet(dest).count()
        assert n1 == first.count()

        # second run migrates only what's still pending
        landed = spark.read.parquet(dest).select("n_nationkey").distinct()
        still = nation.join(landed, "n_nationkey", "left_anti")
        assert still.count() == nation.count() - n1
        run_migration(spark, still, dest, "n_regionkey")
        assert spark.read.parquet(dest).count() == nation.count()

        # a third reconcile pass finds nothing pending
        landed = spark.read.parquet(dest).select("n_nationkey").distinct()
        assert nation.join(landed, "n_nationkey", "left_anti").count() == 0
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def test_empty_source_is_noop(spark):
    src = tempfile.mkdtemp(prefix="empty_")
    dst = _mkstore({"x.mseed": b"xx"})
    try:
        pending = pending_keys(list_store(spark, src), list_store(spark, dst))
        assert pending.count() == 0
    finally:
        shutil.rmtree(src)
        shutil.rmtree(dst)
