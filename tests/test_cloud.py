"""Object-store conf assembly + staged-upload layout (sources/cloud.py)."""

from __future__ import annotations

import glob

import pytest

from aws_seismic_data_pipeline_spark.registry import load_all
from aws_seismic_data_pipeline_spark.sources.cloud import (
    S3A_CONFS,
    object_store_confs,
)

from .conftest import SF_DIR

REGISTRY = load_all()


def test_s3a_profile_selects_magic_committer():
    confs = object_store_confs("s3a://bucket/prefix/table")
    assert confs["spark.hadoop.fs.s3a.committer.name"] == "magic"
    # cloud-integration commit protocol bound for parquet specifically
    assert "PathOutputCommitProtocol" in confs["spark.sql.sources.commitProtocolClass"]
    assert confs is not S3A_CONFS  # caller gets a copy, not the module dict


def test_local_schemes_need_no_confs():
    assert object_store_confs("file:///tmp/x") == {}
    assert object_store_confs("/tmp/x") == {}


def test_unknown_remote_scheme_refuses_rename_commit():
    with pytest.raises(ValueError, match="gs"):
        object_store_confs("gs://bucket/x")


def test_stage_layout_is_reference_key_shape(spark):
    """The staged dataset must land as day/type prefixes — the
    reference's YYYYMMDD/<station>/ S3 key layout (app.py:449-463)."""
    REGISTRY["sink_object_store_stage"].builder(spark, SF_DIR).count()
    sf_tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    dirs = glob.glob(
        f"/root/repo/_tmp/stage_events_{sf_tag}/day_prefix=*/event_type=*"
    )
    assert dirs, "no partition directories written"
    sample = dirs[0]
    assert "day_prefix=202" in sample and "event_type=" in sample


def test_staged_writer_two_phase_commit(spark, tmp_path):
    """The custom DataSource writer's commit protocol: a successful
    write publishes every staged file atomically with a _SUCCESS
    manifest whose row counts sum to the input, leaves no _staging
    residue, and round-trips losslessly; a mid-task failure leaves the
    target with NO published files (abort) — never torn output."""
    import json
    import os

    import pytest as _pytest

    from aws_seismic_data_pipeline_spark.sources.datasource import (
        StagedJsonlDataSource,
    )

    spark.dataSource.register(StagedJsonlDataSource)
    df = spark.createDataFrame(
        [(i, f"row{i}") for i in range(100)], "id long, name string"
    ).repartition(4)
    out = str(tmp_path / "ok")
    df.write.format("staged_jsonl").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 100
    assert not os.path.exists(os.path.join(out, "_staging"))
    published = [f for f in os.listdir(out) if f.startswith("part-")]
    assert sorted(f["file"] for f in manifest["files"]) == sorted(published)
    back = spark.read.schema("id long, name string").json(f"{out}/part-*.jsonl")
    assert sorted(r.id for r in back.collect()) == list(range(100))

    # failure path: one task raises mid-write -> abort, nothing published
    from pyspark.sql import functions as F

    bad = df.withColumn(
        "name",
        F.when(F.col("id") == 57, F.raise_error("boom")).otherwise(
            F.col("name")
        ),
    )
    out2 = str(tmp_path / "fail")
    with _pytest.raises(Exception):
        bad.write.format("staged_jsonl").option("path", out2).mode(
            "append"
        ).save()
    leftover = (
        [f for f in os.listdir(out2) if not f.startswith("_staging")]
        if os.path.exists(out2)
        else []
    )
    assert not [f for f in leftover if f.startswith("part-") or f == "_SUCCESS"], leftover
