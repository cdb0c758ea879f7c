"""Equivalence pins for the driver-side manifest fast path
(``sources/table/localman``): every pandas twin must return exactly
what the Spark computation it replaces returns, and pyarrow-written
manifest files must interoperate with Spark-written ones in one
directory (both engines, both write orders)."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.sources.table import localman
from aws_seismic_data_pipeline_spark.sources.table.logstore import (
    manifest_data_dir as _mdd,
)
from aws_seismic_data_pipeline_spark.sources.table.manifest import (
    _visible_stats,
    append_stats_manifest,
    manifest_row_count,
    snapshot_for_timestamp,
    write_stats_manifest,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def staged(spark, tmp_path_factory):
    """A governed fixture with real history: build (snapshot 0), an
    append (1), a remove tombstone (2), an equality delete (3) — the op
    mix every localman read twin must agree with Spark on."""
    root = tmp_path_factory.mktemp("localman")
    data_dir = str(root / "data")
    mpath = str(root / "manifest")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    docs.repartition(4, "doc_id").write.mode("overwrite").parquet(data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    write_stats_manifest(spark, files, mpath, ("doc_id",))
    extra = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    stage = os.path.join(data_dir, ".stage")
    extra.coalesce(1).write.mode("overwrite").parquet(stage)
    part = sorted(glob.glob(os.path.join(stage, "part-*.parquet")))[0]
    new_path = os.path.join(data_dir, "appended-00000.parquet")
    os.replace(part, new_path)
    append_stats_manifest(spark, [new_path], mpath, ("doc_id",))
    from aws_seismic_data_pipeline_spark.sources.table.manifest import (
        remove_from_manifest,
    )

    remove_from_manifest(spark, mpath, [files[0]])
    from aws_seismic_data_pipeline_spark.sources.table.deletes import (
        equality_delete,
    )

    equality_delete(spark, mpath, "doc_id", [11, 22, 33])
    return data_dir, mpath


def test_load_matches_spark_collect(spark, staged):
    _data, mpath = staged
    man = localman.load(mpath)
    assert man is not None
    srows = spark.read.parquet(_mdd(mpath)).collect()
    assert len(man) == len(srows)
    want = sorted(
        (r.path, r.op, int(r.snapshot_id), r.column_name) for r in srows
    )
    got = sorted(
        zip(
            man["path"],
            man["op"],
            (int(s) for s in man["snapshot_id"]),
            man["column_name"],
        )
    )
    assert got == want


def test_load_gate_routes_to_spark(spark, staged, monkeypatch):
    """r15 verdict item 1: ``load()`` must refuse manifests larger
    than SPARK_GRAFT_LOCAL_MAN_MAX rows (driver-heap guard) so callers
    fall back to the distributed Spark path — with identical results."""
    _data, mpath = staged
    want = manifest_row_count(spark, mpath)  # fast path (gate open)
    monkeypatch.setattr(localman, "_LOCAL_MAN_MAX", 0)
    assert localman.load(mpath) is None  # gate closed: fallback signal
    # the verb still answers, via its original Spark computation
    assert manifest_row_count(spark, mpath) == want
    monkeypatch.setattr(localman, "_LOCAL_MAN_MAX", 10**12)
    assert localman.load(mpath) is not None  # gate open again


@pytest.mark.parametrize("as_of", [None, 0, 1, 2])
def test_visible_matches(spark, staged, as_of):
    _data, mpath = staged
    man = localman.load(mpath)
    vis_pd = localman.visible(man, as_of)
    vis_spark = _visible_stats(spark.read.parquet(_mdd(mpath)), as_of)
    want = sorted(
        (r.path, int(r.row_group), r.column_name)
        for r in vis_spark.select("path", "row_group", "column_name")
        .collect()
    )
    got = sorted(
        zip(
            vis_pd["path"],
            (int(v) for v in vis_pd["row_group"]),
            vis_pd["column_name"],
        )
    )
    assert got == want


@pytest.mark.parametrize(
    "lo,hi", [(-float("inf"), float("inf")), (0, 100), (1e9, 2e9)]
)
def test_matching_paths(spark, staged, lo, hi):
    _data, mpath = staged
    man = localman.load(mpath)
    vis = localman.visible(man, None)
    got = localman.matching_paths(vis, "doc_id", lo, hi)
    manifest = _visible_stats(spark.read.parquet(_mdd(mpath)), None)
    per_file = (
        manifest.filter(F.col("column_name") == "doc_id")
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            F.sum(
                F.when(F.col("min_val").isNull(), 1).otherwise(0)
            ).alias("n_statless"),
        )
    )
    want = sorted(
        r.path
        for r in per_file.filter(
            (F.col("n_statless") > 0)
            | ((F.col("fmax") >= lo) & (F.col("fmin") <= hi))
        ).collect()
    )
    assert got == want


def test_row_count_matches(spark, staged):
    _data, mpath = staged
    man = localman.load(mpath)
    for as_of in (None, 0, 1):
        assert localman.row_count(man, as_of) == manifest_row_count(
            spark, mpath, as_of
        )


def test_snapshot_for_timestamp_matches(spark, staged):
    _data, mpath = staged
    man = localman.load(mpath)
    marks = sorted(
        man.loc[man["op"] == "commit_ts", "min_val"].tolist()
    )
    for ts in [marks[0], marks[-1], marks[-1] + 100]:
        assert localman.snapshot_for_timestamp(
            man, mpath, ts
        ) == snapshot_for_timestamp(spark, mpath, ts)
    with pytest.raises(ValueError):
        localman.snapshot_for_timestamp(man, mpath, marks[0] - 1)


def test_live_delete_keys(spark, staged):
    _data, mpath = staged
    from aws_seismic_data_pipeline_spark.sources.table.deletes import (
        _live_delete_records,
    )

    man = localman.load(mpath)
    got = localman.live_delete_keys(man, "doc_id", None)
    want = sorted(
        set(
            r.min_val
            for r in _live_delete_records(
                spark.read.parquet(_mdd(mpath)), "doc_id", None
            )
            .select("min_val")
            .collect()
        )
    )
    assert got == want == [11.0, 22.0, 33.0]
    # below the delete snapshot: no keys in force
    assert localman.live_delete_keys(man, "doc_id", 1) == []


def test_write_rows_interop(spark, staged):
    """A pyarrow-written commit file must read back identically through
    Spark and pyarrow, in a directory already holding Spark-written
    files — and the manifest schema must not fork."""
    _data, mpath = staged
    before = spark.read.parquet(_mdd(mpath))
    n_before = before.count()
    pdf = pd.DataFrame(
        [
            {
                "path": "/x/y.parquet",
                "file_name": "y.parquet",
                "row_group": None,
                "column_name": "__remove__",
                "n_rows": None,
                "min_val": 42.0,
                "max_val": 42.0,
                "snapshot_id": 99,
                "op": "remove",
                "partition_values": None,
            },
            {
                "path": "",
                "file_name": "",
                "column_name": "__commit_ts__",
                "min_val": 777.0,
                "max_val": 777.0,
                "snapshot_id": 99,
                "op": "commit_ts",
                "partition_values": {"a": "b"},
            },
        ]
    )
    assert localman.write_rows(mpath, pdf)
    after = spark.read.parquet(_mdd(mpath))
    assert after.schema == before.schema
    assert after.count() == n_before + 2
    got = {
        (
            r.path,
            r.op,
            float(r.min_val),
            tuple(sorted((r.partition_values or {}).items())),
        )
        for r in after.filter(F.col("snapshot_id") == 99).collect()
    }
    assert got == {
        ("/x/y.parquet", "remove", 42.0, ()),
        ("", "commit_ts", 777.0, (("a", "b"),)),
    }
    man = localman.load(mpath)
    assert len(man) == n_before + 2


def test_footer_stats_rows_match_distributed(spark, staged):
    data_dir, _m = staged
    from aws_seismic_data_pipeline_spark.sources.footers import (
        read_footer_stats_multi,
    )

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    want = sorted(
        tuple(r)
        for r in read_footer_stats_multi(
            spark, files, ("doc_id", "n_chars")
        ).collect()
    )
    got_pdf = localman.footer_stats_rows(
        files, ("doc_id", "n_chars"), 7
    )
    assert got_pdf is not None
    got = sorted(
        (p, fn, int(rg), c, int(n), mn, mx)
        for p, fn, rg, c, n, mn, mx in zip(
            got_pdf["path"],
            got_pdf["file_name"],
            got_pdf["row_group"],
            got_pdf["column_name"],
            got_pdf["n_rows"],
            got_pdf["min_val"],
            got_pdf["max_val"],
        )
    )
    assert got == want
    assert set(got_pdf["snapshot_id"]) == {7}
    assert set(got_pdf["op"]) == {"add"}


def test_partition_values_py_matches_spark(spark, tmp_path):
    """The python partition_values twin must equal the Spark column
    expression on Hive layouts, including percent-encoded values."""
    from aws_seismic_data_pipeline_spark.sources.table.manifest import (
        _partition_values_col,
    )

    paths = [
        "/t/lang=en/part-0.parquet",
        "/t/lang=fr/sub/part-1.parquet",  # no trailing-slash match on sub
        "/t/other=1/part-2.parquet",
        "/t/lang=a%3Db/part-3.parquet",
        "/t/lang=sp+ace/part-4.parquet",
        "/t/lang=bad%zz/part-5.parquet",
        "/t/part-6.parquet",
    ]
    sdf = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).withColumn("pv", _partition_values_col(("lang",)))
    want = {r.path: dict(r.pv or {}) for r in sdf.collect()}
    got = {
        p: (localman.partition_values_py(p, ("lang",)) or {}) for p in paths
    }
    assert got == want


def test_multi_and_rowgroup_survivors(spark, staged):
    _data, mpath = staged
    from aws_seismic_data_pipeline_spark.sources.table.manifest import (
        _rowgroup_eliminated_paths,
    )

    man = localman.load(mpath)
    vis = localman.visible(man, None)
    preds = {"doc_id": (0.0, 50.0)}
    got = localman.surviving_paths_multi_rowgroup(vis, preds)
    manifest = _visible_stats(spark.read.parquet(_mdd(mpath)), None)
    eliminated = _rowgroup_eliminated_paths(manifest, preds)
    survivors = (
        manifest.select("path")
        .distinct()
        .join(eliminated, "path", "left_anti")
    )
    want = sorted(r.path for r in survivors.collect())
    assert got == want
