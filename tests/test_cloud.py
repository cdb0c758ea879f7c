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
