"""Schema evolution as manifest commits: ADD COLUMN declarations and
NULL-backfilled evolved reads. Split out of ``sources/readers.py`` in
round 11. Seed: the reference's filename-embedded schema
(``/root/reference/app.py:328-330,451-456``) — schema as commits, not
filenames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table, prepare
from aws_seismic_data_pipeline_spark.registry import register
from aws_seismic_data_pipeline_spark.sources.table.commit import (
    _claimed_next_snapshot,
)
from aws_seismic_data_pipeline_spark.sources.table.manifest import (
    append_stats_manifest,
    manifest_pruned_scan,
    write_stats_manifest,
)


def evolve_schema_add(
    spark: SparkSession, manifest_dir: str, column: str, sql_type: str
) -> int:
    """ADD COLUMN as a METADATA commit — Iceberg/Delta schema evolution
    through the snapshot axis: one 'schema_add' manifest row declares
    the column (name + SQL type, the type riding in the generic
    ``partition_values`` string map), no data file is touched.
    Pre-commit files are NULL-backfilled at scan time
    (:func:`read_evolved` — the ``scan_merge_schema`` semantics, but
    COMMITTED: an as-of read below this snapshot sees the old schema,
    at/above sees the new, exactly like any other table mutation).
    Returns the snapshot id written."""
    from aws_seismic_data_pipeline_spark.sources.table.commit import (
        release_claim,
    )

    snap = _claimed_next_snapshot(spark, manifest_dir)
    try:
        rows = schema_add_rows(spark, manifest_dir, {column: sql_type}, snap)
    except BaseException:
        # nothing committed at the id: release the lease so the raise
        # (re-declaration) doesn't block the NEXT writer for stale_after
        release_claim(manifest_dir, snap)
        raise
    rows.write.mode("append").parquet(manifest_dir)
    return snap


def schema_add_rows(
    spark: SparkSession,
    manifest_dir: str,
    columns: dict[str, str],
    snapshot_id: int,
) -> DataFrame:
    """UNCOMMITTED 'schema_add' declaration rows — compound verbs
    (``merge_evolve_through_manifest``) union these with their data
    adds/tombstones and commit everything in ONE append, so the column
    declaration and the files that first carry it become visible at the
    SAME snapshot (Delta's mergeSchema-on-MERGE atomicity). Raises on a
    re-declaration, same as :func:`evolve_schema_add`."""
    man = spark.read.parquet(manifest_dir)
    declared = {
        r.column_name
        for r in man.filter(F.col("op") == "schema_add")
        .select("column_name")
        .distinct()
        .collect()
    }
    dupes = sorted(set(columns) & declared)
    if dupes:
        raise ValueError(
            f"column(s) {dupes} are already declared at {manifest_dir}"
        )
    schema = man.schema
    rows = []
    for column, sql_type in sorted(columns.items()):
        fixed = {
            "path": "",
            "file_name": "",
            "column_name": column,
            "snapshot_id": int(snapshot_id),
            "op": "schema_add",
            "partition_values": {"type": str(sql_type)},
        }
        rows.append(tuple(fixed.get(f.name) for f in schema))
    return spark.createDataFrame(rows, schema)


def read_evolved(
    spark: SparkSession,
    manifest_dir: str,
    key: str,
    as_of: int | None = None,
) -> DataFrame:
    """Full scan under the EVOLVED schema visible at ``as_of``: the
    physical read unions mixed file schemas (``mergeSchema`` — files
    landed after an ADD COLUMN carry it, earlier files don't), then
    every declared-but-physically-absent column is NULL-backfilled with
    its committed type. An as-of below the ADD COLUMN commit sees
    neither the declaration nor any post-commit file, so the OLD schema
    emerges exactly — schema history is as time-travelable as data
    history. Metadata-only cost on top of the pruned scan."""
    man = spark.read.parquet(manifest_dir)
    if as_of is not None:
        man = man.filter(F.col("snapshot_id") <= as_of)
    adds = (
        man.filter(F.col("op") == "schema_add")
        .select(
            "column_name",
            F.col("partition_values").getItem("type").alias("sql_type"),
        )
        .collect()
    )
    df = manifest_pruned_scan(
        spark,
        manifest_dir,
        key,
        float("-inf"),
        float("inf"),
        as_of=as_of,
        merge_schema=True,
    )
    for r in adds:
        if r.column_name not in df.columns:
            df = df.withColumn(
                r.column_name, F.lit(None).cast(r.sql_type or "string")
            )
    return df


@register(
    "plan_schema_evolve",
    oracle="""
        WITH evolved AS (
            SELECT doc_id, lang, n_chars, CAST(NULL AS DOUBLE) AS quality
            FROM documents
            UNION ALL
            SELECT doc_id, lang, n_chars, n_chars / 1000.0 AS quality
            FROM documents WHERE doc_id % 7 = 0
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(quality) AS BIGINT) AS n_with_quality,
               CAST(SUM(CAST(ROUND(quality * 1000) AS BIGINT)) AS BIGINT)
                   AS quality_milli,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM evolved
        GROUP BY lang
    """,
    tags=("plan", "layout", "schema"),
)
def plan_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION through the manifest end to end: documents land
    governed WITHOUT a quality column, ADD COLUMN quality DOUBLE commits
    as pure metadata (snapshot k), then a post-commit batch lands
    CARRYING the column. The current evolved read must union both
    physical shapes — pre-commit rows NULL-backfilled, post-commit rows
    with their written values — and the oracle recomputes exactly that
    union from the raw table, so the driver hash pins the backfill
    semantics (COUNT(quality) counts only post-commit rows; the
    cents-style integer sum pins the values). Reads pinned below k see
    the OLD schema — asserted in tests/test_catalog_scale.py. Seed: the
    reference re-parses filename fields as its schema
    (``/root/reference/app.py:449-463``); a governed table declares
    schema changes as commits instead."""
    import glob as _glob
    import shutil as _shutil

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "schema_evolve_data")
    mpath = scratch_path(spark, sf_dir, "schema_evolve_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        docs.repartition(4, "doc_id").write.mode("overwrite").parquet(
            data_dir
        )
        files = sorted(_glob.glob(os.path.join(data_dir, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("doc_id",))
        evolve_schema_add(spark, mpath, "quality", "double")
        late = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "quality", F.col("n_chars") / F.lit(1000.0)
        )
        stage = os.path.join(data_dir, ".late_stage")
        late.coalesce(1).write.mode("overwrite").parquet(stage)
        part = sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))[0]
        late_path = os.path.join(data_dir, "evolved-late-00000.parquet")
        _shutil.move(part, late_path)
        _shutil.rmtree(stage, ignore_errors=True)
        append_stats_manifest(spark, [late_path], mpath, ("doc_id",))
        return (
            read_evolved(spark, mpath, "doc_id")
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.count("quality").alias("n_with_quality"),
                F.sum(F.round(F.col("quality") * 1000, 0).cast("long"))
                .cast("long")
                .alias("quality_milli"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )
