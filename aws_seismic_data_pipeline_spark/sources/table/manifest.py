"""The footer-stats MANIFEST: build/append/tombstone rows, snapshot
visibility, pruned + partitioned + as-of + incremental + count-only
scans. The production form of ``rowgroup_pruned_scan``'s docstring —
stats live in a parquet table next to the data (Iceberg/Delta
manifests), pruning is an agg+filter on that table, and only the
MATCHING path list ever reaches the driver. Split out of
``sources/readers.py`` in round 11.

Seed: date-partitioned S3 key layout as the catalog
(``/root/reference/app.py:449-463``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import (
    GOLDEN_SF_DIR,
    load_table,
    prepare,
)
from aws_seismic_data_pipeline_spark.registry import register
from aws_seismic_data_pipeline_spark.sources.table.logstore import (
    manifest_data_dir as _mdd,
)
from aws_seismic_data_pipeline_spark.sources.footers import (
    _RG_PRUNE_RANGE,
    _decode_input_file,
    rangekey_write,
    read_footer_stats_multi,
)
from aws_seismic_data_pipeline_spark.sources.table.commit import (
    _claimed_next_snapshot,
    verify_claim,
)
from aws_seismic_data_pipeline_spark.sources.table import localman


#: leaf columns the demo manifests carry stats for
_MANIFEST_COLS = ("o_orderkey", "o_custkey")


#: commit-scale ceiling for the driver-side footer-stats path: a commit
#: touching at most this many files reads their footers on the driver
#: (KBs each, ~1 ms/file) instead of fanning a Spark stage out over
#: them; bulk builds/backfills above it stay distributed. Overridable
#: for deployments whose driver is far from storage.
_LOCAL_COMMIT_MAX = int(os.environ.get("SPARK_GRAFT_LOCAL_COMMIT_MAX", "64"))


#: price band for the float-stats pruning demo (~central slice of
#: o_totalprice at any SF)
_MANIFEST_PRICE_RANGE = (150000.0, 250000.0)


#: doc_id band for the partition+stats combined-pruning demo (spans a
#: minority of range clusters at every fixture SF)
_PART_PRUNE_RANGE = (50, 199)



def _partition_values_col(partition_by: tuple[str, ...]) -> F.Column:
    """The manifest's ``partition_values`` map for a stats row: each
    requested partition column's value parsed from the row's Hive-style
    path segment (``lang=en/``) — the reference's ``YYYYMMDD/`` prefix
    layout (``/root/reference/app.py:449-456``) generalized to named
    key=value dirs. Entries exist ONLY where the segment is present, so
    a file not laid out by a requested column carries no entry and every
    partition filter treats it conservatively (scanned, never silently
    dropped). NULL map when the table is unpartitioned.

    Spark percent-escapes reserved characters ('%', '=', ':', ...) in
    Hive partition dir names, so the captured segment is DECODED before
    it is stored — a partition filter compares LOGICAL values, and
    ``{'col': 'a=b'}`` must match the on-disk ``col=a%3Db`` segment.
    Decode mirrors ``_decode_input_file`` ('+' pre-escaped so
    ``url_decode`` never turns it into a space); a segment that is not
    valid percent-encoding (hand-made dir with a bare '%') falls back
    to its raw form instead of failing the scan. The column name is
    regex-escaped so a name containing metacharacters cannot corrupt
    the pattern."""
    import re as _re

    if not partition_by:
        return F.lit(None).cast("map<string,string>")
    pairs = []
    for pcol in partition_by:
        seg = F.regexp_extract(
            F.col("path"), f"(?:^|/){_re.escape(pcol)}=([^/]+)/", 1
        )
        decoded = F.coalesce(
            F.try_url_decode(F.regexp_replace(seg, r"\+", "%2B")), seg
        )
        pairs.append(F.lit(pcol))
        pairs.append(decoded)
    return F.map_filter(F.create_map(*pairs), lambda _k, v: v != "")


def write_stats_manifest(
    spark: SparkSession,
    paths: list[str],
    manifest_dir: str,
    columns: tuple[str, ...] = _MANIFEST_COLS,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Materialize the footer-stats manifest as a parquet TABLE beside
    the data — the artifact a table format keeps so planning never
    re-lists or re-opens data-file footers. Built distributed
    (``read_footer_stats_multi``); |manifest| = |files| × row groups ×
    columns rows of fixed-width metadata, ~KBs per thousand files. The
    write inherits the footer-read fan-out, capped at 32 tasks, so a
    build adds at most 32 manifest files regardless of table size
    (a trailing ``coalesce(1)`` would serialize the footer read into
    one task — measured 7× slower — for a single-file nicety
    ``catalog.compact_parquet_dir`` can restore offline if thousands
    of appends ever accumulate). Every row carries ``snapshot_id`` = 0;
    appends stamp successive ids, giving the manifest a version axis
    (``manifest_pruned_scan(as_of=...)`` time-travels on it).
    ``partition_by`` records Hive-style partition values per row (see
    ``_partition_values_col``) for combined partition+stats pruning.

    SIZE-ADAPTIVE: a build over at most ``_LOCAL_COMMIT_MAX`` files
    runs DRIVER-SIDE (one pyarrow footer read per file, one parquet
    write — :mod:`.localman`; identical rows, pytest-pinned) because
    fanning a handful of footer KBs over a Spark stage costs ~2 s of
    scheduler+worker overhead; a bulk build keeps the distributed
    fan-out — at 100 TB the file list is the thing that scales."""
    if len(paths) <= _LOCAL_COMMIT_MAX:
        pdf = localman.footer_stats_rows(
            paths, columns, 0, partition_by=partition_by
        )
        if pdf is not None:
            import pandas as _pd

            ts = _commit_ts_fixed(0)
            pdf = localman.concat_rows(
                [pdf, _pd.DataFrame([{k: ts.get(k) for k in pdf.columns}])]
            )
            if localman.write_rows(manifest_dir, pdf, overwrite=True):
                return
    rows = (
        read_footer_stats_multi(spark, paths, columns)
        .withColumn("snapshot_id", F.lit(0).cast("int"))
        .withColumn("op", F.lit("add"))
        .withColumn("partition_values", _partition_values_col(partition_by))
    )
    # snapshot 0's wall-clock marker rides in the same write (see
    # _commit_ts_fixed) — the schema comes from the build itself, the
    # manifest does not exist yet
    rows.unionByName(
        _commit_ts_rows(spark, rows.schema, 0), allowMissingColumns=True
    ).write.mode("overwrite").parquet(_mdd(manifest_dir))


def append_stats_manifest(
    spark: SparkSession,
    new_paths: list[str],
    manifest_dir: str,
    columns: tuple[str, ...] = _MANIFEST_COLS,
    snapshot_id: int | None = None,
    partition_by: tuple[str, ...] = (),
    pre_commit=None,
) -> int:
    """Incremental manifest maintenance: when new data files land
    (ingest batch, compaction output), footer-read ONLY them and append
    their stats rows — cost is new-batch-sized, mirroring
    ``llm/ivf.py: append_to_index`` / ``llm/dedup.py:
    promote_to_corpus``. Appended == rebuilt is pytest-pinned in
    tests/test_catalog_scale.py. Each append is stamped with the next
    ``snapshot_id`` — CAS-RESERVED via ``_claimed_next_snapshot``
    unless the caller passes one, so concurrent writers can never
    stamp the same id — and the manifest keeps its whole version
    history — an as-of read (``manifest_pruned_scan(as_of=N)``) sees
    exactly the files visible at snapshot N, the table-format
    time-travel contract. ``pre_commit(snapshot_id)``, when given, runs
    INSIDE the claim, immediately before the manifest write — the seam
    the facade's constraint gate uses to re-validate against
    declarations that landed between its pre-claim read and this
    commit (Delta enforces inside the transaction); a raise aborts the
    commit and releases a claim taken in this call. Returns the id
    written."""
    from aws_seismic_data_pipeline_spark.sources.table.commit import (
        release_claim,
    )

    claimed_here = snapshot_id is None
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, manifest_dir)
    verify_claim(manifest_dir, int(snapshot_id))
    if pre_commit is not None:
        try:
            pre_commit(int(snapshot_id))
        except BaseException:
            if claimed_here:  # nothing committed at the id
                release_claim(manifest_dir, int(snapshot_id))
            raise
    if len(new_paths) <= _LOCAL_COMMIT_MAX:
        # commit-scale append: driver-side footer stats + one local
        # parquet write (see write_stats_manifest) — Spark fallback below
        pdf = localman.footer_stats_rows(
            new_paths, columns, int(snapshot_id), partition_by=partition_by
        )
        if pdf is not None:
            import pandas as _pd

            ts = _commit_ts_fixed(int(snapshot_id))
            pdf = localman.concat_rows(
                [pdf, _pd.DataFrame([{k: ts.get(k) for k in pdf.columns}])]
            )
            if localman.write_rows(manifest_dir, pdf):
                return int(snapshot_id)
    rows = _stats_add_rows(
        spark, new_paths, columns, int(snapshot_id), partition_by
    )
    rows.unionByName(
        _commit_ts_rows(spark, rows.schema, int(snapshot_id)),
        allowMissingColumns=True,
    ).write.mode("append").parquet(_mdd(manifest_dir))
    return int(snapshot_id)


def append_stats_manifest_retry(
    spark: SparkSession,
    new_paths: list[str],
    manifest_dir: str,
    columns: tuple[str, ...] = _MANIFEST_COLS,
    partition_by: tuple[str, ...] = (),
    max_retries: int = 5,
    pre_commit=None,
) -> tuple[int, int]:
    """APPEND under optimistic concurrency: claim, commit, and on a
    lost CAS race back off and re-claim the NEXT id. Unlike MERGE
    (``merge_with_conflict_retry``), an append needs no re-planning —
    the new files' stats don't depend on table state — so the retry is
    just a fresh claim; the outcome is the serial order of commits.
    This is the loop a continuously-ingesting stream runs when another
    writer (a second stream, a compaction) shares the table — the
    reference's two-manual-triggers race (``/root/reference/
    app.py:641-653``, SURVEY §3.2: no concurrency guard) closed.
    Returns (snapshot_id, n_retries); bounded retries fail loudly."""
    import time as _time

    from aws_seismic_data_pipeline_spark.sources.table.commit import (
        ConcurrentCommitError,
    )

    for attempt in range(int(max_retries) + 1):
        try:
            snap = append_stats_manifest(
                spark,
                new_paths,
                manifest_dir,
                columns,
                partition_by=partition_by,
                pre_commit=pre_commit,
            )
            return snap, attempt
        except ConcurrentCommitError:
            if attempt == max_retries:
                raise
            _time.sleep(min(0.05 * (2**attempt), 1.0))
    raise AssertionError("unreachable")  # pragma: no cover


def _stats_add_rows(
    spark: SparkSession,
    new_paths: list[str],
    columns: tuple[str, ...],
    snapshot_id: int,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """The 'add' stats rows for new data files as an UNCOMMITTED frame —
    compound verbs (merge, compaction) union these with their tombstones
    and commit everything in ONE append, so a concurrent re-planner can
    never observe adds without the matching removes (half a commit)."""
    return (
        read_footer_stats_multi(spark, new_paths, columns)
        .withColumn("snapshot_id", F.lit(int(snapshot_id)).cast("int"))
        .withColumn("op", F.lit("add"))
        .withColumn("partition_values", _partition_values_col(partition_by))
    )


def _commit_ts_fixed(snapshot_id: int, ts: float | None = None) -> dict:
    """The field values of a 'commit_ts' marker row: the commit's
    WALL-CLOCK (epoch seconds, riding in the otherwise-unused
    min_val/max_val slots exactly like tombstone retention clocks)
    stamped at snapshot ``snapshot_id``. One marker rides inside every
    commit's single write job, giving the snapshot axis a time axis —
    ``snapshot_for_timestamp`` resolves ``AS OF TIMESTAMP`` reads
    (the form users actually type) through these rows. Delta resolves
    timestamps from log-file mtimes; an explicit row survives manifest
    rewrites (expire) that mtimes do not."""
    import time as _time

    t = _time.time() if ts is None else float(ts)
    return {
        "path": "",
        "file_name": "",
        "column_name": "__commit_ts__",
        "min_val": t,
        "max_val": t,
        "snapshot_id": int(snapshot_id),
        "op": "commit_ts",
        # empty, not None: partitioned manifests declare the map
        # non-nullable
        "partition_values": {},
    }


def _commit_ts_rows(
    spark: SparkSession, schema, snapshot_id: int
) -> DataFrame:
    """A 1-row commit_ts marker frame shaped by the target manifest's
    own schema (never forks it)."""
    fixed = _commit_ts_fixed(snapshot_id)
    return spark.createDataFrame(
        [tuple(fixed.get(f.name) for f in schema)], schema
    )


def snapshot_for_timestamp(
    spark: SparkSession, manifest_dir: str, ts: float
) -> int:
    """Resolve ``AS OF TIMESTAMP`` to a snapshot id: the NEWEST
    snapshot whose commit wall-clock is <= ``ts`` (Delta/Iceberg
    semantics — the table state a reader at that instant saw). Raises
    when ``ts`` precedes every recorded commit — including when the
    matching history was EXPIRED (commit_ts markers below the floor
    are dropped with it, so a pre-floor timestamp fails loudly exactly
    like a pre-floor snapshot pin). KB-scale manifest read — resolved
    DRIVER-SIDE through :mod:`.localman` (Spark fallback), the
    ``commit._next_snapshot`` rationale."""
    lman = localman.load(manifest_dir)
    if lman is not None:
        return localman.snapshot_for_timestamp(lman, manifest_dir, ts)
    man = spark.read.parquet(_mdd(manifest_dir))
    rows = (
        man.filter(F.col("op") == "commit_ts")
        .select("snapshot_id", "min_val")
        .collect()
    )
    if not rows:
        raise ValueError(
            f"no commit timestamps recorded at {manifest_dir} — the table "
            "predates timestamp stamping; pin by snapshot id instead"
        )
    eligible = [int(r.snapshot_id) for r in rows if r.min_val <= float(ts)]
    if not eligible:
        raise ValueError(
            f"timestamp {ts} precedes the earliest recorded commit at "
            f"{manifest_dir} (earliest surviving commit_ts: "
            f"{min(r.min_val for r in rows)}) — the history may have been "
            "expired"
        )
    return max(eligible)


def commit_manifest_rows(
    spark: SparkSession,
    manifest_dir: str,
    frames: list[DataFrame],
    snapshot_id: int | None = None,
) -> None:
    """Commit several metadata row groups (adds + tombstones + markers)
    as ONE Spark write job — the atomicity half of the optimistic-
    concurrency contract. Two separate appends leave a window where a
    concurrent ``merge_with_conflict_retry`` loser re-plans against the
    adds WITHOUT the removes (or vice versa), double-counting the
    rewritten rows and baking the duplication into its own rewrite;
    one job commits all files in a single FileOutputCommitter commit.
    Frames are aligned by name (missing columns NULL-filled) and cast
    to the target manifest's schema so the append never forks it.
    ``snapshot_id`` (when the caller passes its claimed id) rides a
    commit_ts wall-clock marker inside the SAME write.

    Frames may be PANDAS frames (driver-resident metadata — footer
    stats, tombstones, declarations): when every frame is pandas the
    whole commit lands as ONE driver-side parquet write
    (:func:`localman.write_rows` — still a single atomic file, the
    same one-append contract), skipping the Spark job entirely; any
    Spark frame in the list, or a failed local write, falls back to
    the original single Spark write with pandas frames converted."""
    import pandas as _pd

    if frames and all(isinstance(f, _pd.DataFrame) for f in frames):
        out = localman.concat_rows(frames)
        if snapshot_id is not None:
            out = localman.concat_rows(
                [out, _pd.DataFrame([_commit_ts_fixed(int(snapshot_id))])]
            )
        if localman.write_rows(manifest_dir, out):
            return
    frames = [
        _pd_frame_to_spark(spark, f) if isinstance(f, _pd.DataFrame) else f
        for f in frames
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf, allowMissingColumns=True)
    if snapshot_id is not None:
        out = out.unionByName(
            _commit_ts_rows(
                spark,
                spark.read.parquet(_mdd(manifest_dir)).schema,
                int(snapshot_id),
            ),
            allowMissingColumns=True,
        )
    out.write.mode("append").parquet(_mdd(manifest_dir))


_MANIFEST_SCHEMA = (
    "path string, file_name string, row_group long, column_name string,"
    " n_rows long, min_val double, max_val double, snapshot_id int,"
    " op string, partition_values map<string,string>"
)


def _pd_frame_to_spark(spark: SparkSession, pdf) -> DataFrame:
    """A pandas metadata frame as a Spark frame for the fallback write
    path: canonical manifest columns get the canonical schema (NaN →
    NULL); anything else lets Spark infer."""
    clean = pdf.astype(object).where(pdf.notna(), None)
    canonical = [
        "path", "file_name", "row_group", "column_name", "n_rows",
        "min_val", "max_val", "snapshot_id", "op", "partition_values",
    ]
    if set(clean.columns) <= set(canonical):
        for c in canonical:
            if c not in clean.columns:
                clean[c] = None
        return spark.createDataFrame(clean[canonical], _MANIFEST_SCHEMA)
    return spark.createDataFrame(clean)


def remove_from_manifest(
    spark: SparkSession,
    manifest_dir: str,
    paths: list[str],
    snapshot_id: int | None = None,
) -> int:
    """Append REMOVE tombstones for data files the table no longer
    contains (compaction inputs, retention deletes): one metadata row
    per path, stamped with the next snapshot id. From that snapshot on
    the paths are invisible to ``manifest_pruned_scan`` and count as
    reclaimable for ``vacuum_orphans_report``; as-of reads BELOW the
    tombstone snapshot still see them — history is never rewritten,
    which is what makes pinned training runs reproducible across later
    maintenance. (Re-adding a previously removed path is not supported;
    compaction always writes fresh file names, so the case cannot
    arise from this engine's own maintenance.)

    The tombstone row is SHAPED BY THE TARGET MANIFEST'S OWN SCHEMA —
    path/file_name/snapshot_id/op filled, every other field NULL — so
    the same delete works against the stats manifest AND the bloom
    manifest (whose rows carry m_bits/bloom instead of min/max stats)
    without the appended file forking the directory's schema. On stats
    manifests the otherwise-unused min_val/max_val slots carry the
    TOMBSTONE WALL-CLOCK (epoch seconds) — the retention axis Delta
    keeps in its log timestamps: ``vacuum_orphans`` measures the
    retention window from when the file became unreferenced, not from
    when it was created."""
    if not paths:
        raise ValueError("remove_from_manifest: empty path list")
    if snapshot_id is None:
        snapshot_id = _claimed_next_snapshot(spark, manifest_dir)
    verify_claim(manifest_dir, int(snapshot_id))
    pdf = _tombstone_rows_pd(manifest_dir, paths, int(snapshot_id))
    if pdf is not None:
        import pandas as _pd

        ts = _commit_ts_fixed(int(snapshot_id))
        pdf = localman.concat_rows(
            [pdf, _pd.DataFrame([{k: ts.get(k) for k in pdf.columns}])]
        )
        if localman.write_rows(manifest_dir, pdf):
            return int(snapshot_id)
    rows = _tombstone_rows(spark, manifest_dir, paths, int(snapshot_id))
    rows.unionByName(
        _commit_ts_rows(spark, rows.schema, int(snapshot_id)),
        allowMissingColumns=True,
    ).write.mode("append").parquet(_mdd(manifest_dir))
    return int(snapshot_id)


def _tombstone_rows(
    spark: SparkSession,
    manifest_dir: str,
    paths: list[str],
    snapshot_id: int,
) -> DataFrame:
    """REMOVE tombstone rows (see :func:`remove_from_manifest`) as an
    UNCOMMITTED frame, for single-append compound commits."""
    import os as _os
    import time as _time

    schema = spark.read.parquet(_mdd(manifest_dir)).schema
    now = float(_time.time())
    has_stats_slots = {"min_val", "max_val"} <= {f.name for f in schema}
    fixed = {
        "path": lambda p: p,
        "file_name": lambda p: _os.path.basename(p),
        "column_name": lambda p: "__remove__",
        "snapshot_id": lambda p: int(snapshot_id),
        "op": lambda p: "remove",
    }
    if has_stats_slots:
        fixed["min_val"] = lambda p: now
        fixed["max_val"] = lambda p: now
    rows = [
        tuple(
            fixed[f.name](p) if f.name in fixed else None for f in schema
        )
        for p in sorted(paths)
    ]
    return spark.createDataFrame(rows, schema)


def _tombstone_rows_pd(
    manifest_dir: str, paths: list[str], snapshot_id: int
):
    """Driver-side twin of :func:`_tombstone_rows` — rows shaped by the
    TARGET manifest's on-disk schema (read from a footer, no Spark
    job), returned as pandas for a :func:`localman.write_rows` commit.
    None when the schema cannot be read (caller falls back)."""
    import os as _os
    import time as _time

    schema = localman._existing_schema(manifest_dir)
    if schema is None:
        return None
    import pandas as _pd

    names = list(schema.names)
    now = float(_time.time())
    has_stats_slots = {"min_val", "max_val"} <= set(names)
    rows = []
    for p in sorted(paths):
        d = {
            "path": p,
            "file_name": _os.path.basename(p),
            "column_name": "__remove__",
            "snapshot_id": int(snapshot_id),
            "op": "remove",
        }
        if has_stats_slots:
            d["min_val"] = now
            d["max_val"] = now
        rows.append({n: d.get(n) for n in names})
    return _pd.DataFrame(rows, columns=names)


def _visible_stats(manifest: DataFrame, as_of: int | None) -> DataFrame:
    """The stats rows of files VISIBLE at ``as_of`` (latest snapshot if
    None): 'add' rows whose path has no 'remove' tombstone at or below
    the pin. Both sides are metadata-scale; the anti-join's removed set
    is |tombstones| rows."""
    if as_of is not None:
        manifest = manifest.filter(F.col("snapshot_id") <= as_of)
    removed = (
        manifest.filter(F.col("op") == "remove").select("path").distinct()
    )
    return manifest.filter(F.col("op") == "add").join(
        removed, "path", "left_anti"
    )


def manifest_row_count(
    spark: SparkSession, manifest_dir: str, as_of: int | None = None
) -> int:
    """The governed table's visible row count answered ENTIRELY from
    the stats manifest — zero data pages: each (path, row_group)'s
    ``n_rows`` (repeated across its per-column stats rows, so reduced
    with max) summed over the files visible at ``as_of``. This is the
    metadata feed for the distributed global-order primitives'
    partition sizing (``operators/window_ops._auto_partitions``):
    a ranked/NTILE'd governed scan sizes its range exchange without a
    second pass over the fact table. Seed: the reference treats its
    paginated listing as the statistic itself
    (``/root/reference/upload_to_rfs.py:16-35``); the manifest keeps
    the same answer one metadata agg away — computed DRIVER-SIDE via
    :mod:`.localman` (Spark fallback)."""
    lman = localman.load(manifest_dir)
    if lman is not None:
        return localman.row_count(lman, as_of)
    visible = _visible_stats(spark.read.parquet(_mdd(manifest_dir)), as_of)
    n = (
        visible.groupBy("path", "row_group")
        .agg(F.max("n_rows").alias("n"))
        .agg(F.sum("n").alias("total"))
        .collect()[0]
        .total
    )
    return int(n) if n is not None else 0


def manifest_pruned_scan(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    lo: float,
    hi: float,
    as_of: int | None = None,
    partition_filter: dict[str, str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Answer a key-range query through the PERSISTED manifest: an
    agg+filter over the stats table computes which files can overlap
    [lo, hi], only that MATCHING path list is collected (never the
    full |files| frame — the r7 driver-side step this replaces), and
    the scan opens just those paths with the residual predicate pushed
    down so Spark's reader prunes row groups within them from the same
    footer stats. Files with any stats-less row group for ``column``
    are included conservatively. The manifest is the catalog: files
    absent from it are invisible, exactly like a table-format snapshot
    — and ``as_of=N`` TIME-TRAVELS the catalog, restricting visibility
    to files whose stats landed at snapshot ≤ N (a metadata filter;
    the late files' data pages are simply never listed). An as-of
    below an ``expire_manifest_history`` floor RAISES — expired
    history must fail loudly, never reconstruct partially.

    ``partition_filter`` ({col: value}) COMBINES partition pruning with
    stats pruning in the same metadata pass — a file survives only if
    every requested partition value matches its recorded
    ``partition_values`` entry AND its key stats overlap [lo, hi].
    Files with no recorded entry for a filtered column are kept
    conservatively (scanned, never silently dropped), so the filter is
    always sound over mixed/legacy manifests.

    The metadata decision (floor check, visibility, partition filter,
    per-file stats aggregate, matching list) runs DRIVER-SIDE via
    :mod:`.localman` — the pruning question is over kilobytes of local
    metadata and a Spark job chain per scan was the dominant cost of
    every governed verb (r15 profiling); the Spark path remains as the
    fallback and only the surviving files' DATA scan is distributed."""
    lman = localman.load(manifest_dir)
    if lman is not None:
        localman.check_floor(lman, as_of, manifest_dir)
        vis = localman.visible(lman, as_of)
        vis = localman.apply_partition_filter(
            vis, partition_filter, manifest_dir
        )
        matching = localman.matching_paths(vis, column, lo, hi)
        if not matching:
            any_paths = vis["path"].unique()
            if len(any_paths) == 0:
                raise ValueError(f"empty stats manifest at {manifest_dir}")
            return spark.read.parquet(
                sorted(any_paths)[0]
            ).filter(F.lit(False))
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*matching).filter(
            F.col(column).between(lo, hi)
        )
    raw = spark.read.parquet(_mdd(manifest_dir))
    if as_of is not None:
        floor = _history_floor(raw)
        if floor is not None and as_of < floor:
            raise ValueError(
                f"as_of={as_of} is below the expire floor {floor} — "
                f"history at {manifest_dir} was expired; pinned reads "
                "below the floor cannot be reconstructed"
            )
    manifest = _visible_stats(raw, as_of)
    if partition_filter:
        if "partition_values" not in manifest.columns:
            raise ValueError(
                f"manifest at {manifest_dir} records no partition values "
                "— rebuild it with write_stats_manifest(partition_by=...)"
            )
        for k, v in partition_filter.items():
            entry = F.col("partition_values").getItem(k)
            manifest = manifest.filter(entry.isNull() | (entry == str(v)))
    per_file = (
        manifest.filter(F.col("column_name") == column)
        .groupBy("path")
        .agg(
            F.min("min_val").alias("fmin"),
            F.max("max_val").alias("fmax"),
            F.sum(
                F.when(F.col("min_val").isNull(), 1).otherwise(0)
            ).alias("n_statless"),
        )
    )
    matching = [
        r.path
        for r in per_file.filter(
            (F.col("n_statless") > 0)
            | ((F.col("fmax") >= lo) & (F.col("fmin") <= hi))
        )
        .select("path")
        .collect()
    ]
    if not matching:
        # preserve the data schema on an empty result: open one manifest
        # file lazily (schema-only footer read, no data pages)
        any_path = manifest.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty stats manifest at {manifest_dir}")
        return spark.read.parquet(any_path[0].path).filter(F.lit(False))
    reader = spark.read
    if merge_schema:
        # post-evolution tables mix physical schemas (pre-ADD files
        # lack the new column); union them instead of sampling one
        # file's footer for the schema
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*matching).filter(F.col(column).between(lo, hi))


def manifest_pruned_scan_multi(
    spark: SparkSession,
    manifest_dir: str,
    predicates: dict[str, tuple[float, float]],
    as_of: int | None = None,
    partition_filter: dict[str, str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """MULTI-predicate manifest pruning (VERDICT r10 item 4): a file
    survives only if EVERY predicate column's stats can overlap its
    [lo, hi] — the conjunction runs entirely in the metadata pass, so a
    two-column rectangle opens the INTERSECTION of each axis's
    candidate files, strictly fewer than either axis alone on a
    Z-ordered layout (pytest-pinned). Composes with ``partition_filter``
    (a third axis) and ``as_of`` exactly like the single-column scan.

    Conservative by construction: elimination, not selection — a file
    is dropped for column c only if it HAS stats rows for c and every
    row-group range misses [lo, hi]; a file that never tracked c (mixed
    /legacy manifests, schema evolution) survives c's predicate and is
    filtered row-level by the residual predicate, which is pushed into
    the scan for every predicate column. Real tables prune on several
    axes — the reference's own key layout has two
    (``/root/reference/app.py:449-456``: date prefix + station)."""
    if not predicates:
        raise ValueError("manifest_pruned_scan_multi: empty predicate map")
    lman = localman.load(manifest_dir)
    if lman is not None:  # driver-side metadata pass (see pruned_scan)
        localman.check_floor(lman, as_of, manifest_dir)
        vis = localman.visible(lman, as_of)
        vis = localman.apply_partition_filter(
            vis, partition_filter, manifest_dir
        )
        matching = localman.surviving_paths_multi(vis, predicates)
        if not matching:
            any_paths = vis["path"].unique()
            if len(any_paths) == 0:
                raise ValueError(f"empty stats manifest at {manifest_dir}")
            return spark.read.parquet(
                sorted(any_paths)[0]
            ).filter(F.lit(False))
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        out = reader.parquet(*matching)
        for column, (lo, hi) in predicates.items():
            out = out.filter(F.col(column).between(lo, hi))
        return out
    raw = spark.read.parquet(_mdd(manifest_dir))
    if as_of is not None:
        floor = _history_floor(raw)
        if floor is not None and as_of < floor:
            raise ValueError(
                f"as_of={as_of} is below the expire floor {floor} — "
                f"history at {manifest_dir} was expired; pinned reads "
                "below the floor cannot be reconstructed"
            )
    manifest = _visible_stats(raw, as_of)
    if partition_filter:
        if "partition_values" not in manifest.columns:
            raise ValueError(
                f"manifest at {manifest_dir} records no partition values "
                "— rebuild it with write_stats_manifest(partition_by=...)"
            )
        for k, v in partition_filter.items():
            entry = F.col("partition_values").getItem(k)
            manifest = manifest.filter(entry.isNull() | (entry == str(v)))
    survivors = manifest.select("path").distinct()
    for column, (lo, hi) in predicates.items():
        eliminated = (
            manifest.filter(F.col("column_name") == column)
            .groupBy("path")
            .agg(
                F.min("min_val").alias("fmin"),
                F.max("max_val").alias("fmax"),
                F.sum(
                    F.when(F.col("min_val").isNull(), 1).otherwise(0)
                ).alias("n_statless"),
            )
            .filter(
                (F.col("n_statless") == 0)
                & ((F.col("fmax") < lo) | (F.col("fmin") > hi))
            )
            .select("path")
        )
        survivors = survivors.join(eliminated, "path", "left_anti")
    matching = [r.path for r in survivors.collect()]
    if not matching:
        any_path = manifest.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty stats manifest at {manifest_dir}")
        return spark.read.parquet(any_path[0].path).filter(F.lit(False))
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    out = reader.parquet(*matching)
    for column, (lo, hi) in predicates.items():
        out = out.filter(F.col(column).between(lo, hi))
    return out


def manifest_pruned_scan_multi_rowgroup(
    spark: SparkSession,
    manifest_dir: str,
    predicates: dict[str, tuple[float, float]],
    as_of: int | None = None,
    partition_filter: dict[str, str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Multi-predicate pruning at ROW-GROUP granularity: the conjunction
    is evaluated per (file, row group) instead of per file, so a file
    survives only if SOME single row group can satisfy EVERY predicate
    at once. File-level conjunction (:func:`manifest_pruned_scan_multi`)
    keeps a file whose per-column ranges overlap the box in *different*
    row groups — common exactly on the layouts this engine optimizes
    into: a Z-ordered file is a run of narrow (x, y) tiles whose UNION
    (the file bounding box) is wide, so a rectangle query intersects
    many file boxes while intersecting none of their tiles. The manifest
    already stores per-row-group stats (``row_group`` column, collected
    by ``read_footer_stats_multi``); this consults them in the same
    metadata pass — zero extra footer I/O.

    Conservative by construction, mirroring the file-level scan: a row
    group missing stats for a predicate column passes that column; a
    file with no stats rows at all survives outright. Surviving files
    are scanned with every residual predicate pushed down, and Spark's
    parquet reader re-prunes row groups inside them from the same
    footer stats — the manifest decision and the reader decision agree
    because they read the same min/max. Fewer files opened than the
    file-level scan is pytest-pinned; result equality is driver-hashed
    (``scan_manifest_pruned_rowgroup``)."""
    if not predicates:
        raise ValueError(
            "manifest_pruned_scan_multi_rowgroup: empty predicate map"
        )
    lman = localman.load(manifest_dir)
    if lman is not None:  # driver-side metadata pass (see pruned_scan)
        localman.check_floor(lman, as_of, manifest_dir)
        vis = localman.visible(lman, as_of)
        vis = localman.apply_partition_filter(
            vis, partition_filter, manifest_dir
        )
        matching = localman.surviving_paths_multi_rowgroup(vis, predicates)
        if not matching:
            any_paths = vis["path"].unique()
            if len(any_paths) == 0:
                raise ValueError(f"empty stats manifest at {manifest_dir}")
            return spark.read.parquet(
                sorted(any_paths)[0]
            ).filter(F.lit(False))
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        out = reader.parquet(*matching)
        for column, (lo, hi) in predicates.items():
            out = out.filter(F.col(column).between(lo, hi))
        return out
    raw = spark.read.parquet(_mdd(manifest_dir))
    if as_of is not None:
        floor = _history_floor(raw)
        if floor is not None and as_of < floor:
            raise ValueError(
                f"as_of={as_of} is below the expire floor {floor} — "
                f"history at {manifest_dir} was expired; pinned reads "
                "below the floor cannot be reconstructed"
            )
    manifest = _visible_stats(raw, as_of)
    if partition_filter:
        if "partition_values" not in manifest.columns:
            raise ValueError(
                f"manifest at {manifest_dir} records no partition values "
                "— rebuild it with write_stats_manifest(partition_by=...)"
            )
        for k, v in partition_filter.items():
            entry = F.col("partition_values").getItem(k)
            manifest = manifest.filter(entry.isNull() | (entry == str(v)))
    eliminated = _rowgroup_eliminated_paths(manifest, predicates)
    survivors = (
        manifest.select("path").distinct().join(eliminated, "path", "left_anti")
    )
    matching = sorted(r.path for r in survivors.collect())
    if not matching:
        any_path = manifest.select("path").limit(1).collect()
        if not any_path:
            raise ValueError(f"empty stats manifest at {manifest_dir}")
        return spark.read.parquet(any_path[0].path).filter(F.lit(False))
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    out = reader.parquet(*matching)
    for column, (lo, hi) in predicates.items():
        out = out.filter(F.col(column).between(lo, hi))
    return out


def _rowgroup_eliminated_paths(
    manifest: DataFrame, predicates: dict[str, tuple[float, float]]
) -> DataFrame:
    """Paths where NO row group can satisfy every predicate at once —
    the row-group-granular elimination set. One groupBy over the
    (metadata-scale) stats rows; NULL ranges (stats-less row group, or
    a column the row group never tracked) conservatively pass."""
    rg_ok = None
    aggs = []
    for i, (column, (lo, hi)) in enumerate(sorted(predicates.items())):
        aggs.append(
            F.max(
                F.when(F.col("column_name") == column, F.col("min_val"))
            ).alias(f"_min{i}")
        )
        aggs.append(
            F.max(
                F.when(F.col("column_name") == column, F.col("max_val"))
            ).alias(f"_max{i}")
        )
    per_rg = (
        manifest.filter(F.col("column_name").isin(list(predicates)))
        .groupBy("path", "row_group")
        .agg(*aggs)
    )
    for i, (_column, (lo, hi)) in enumerate(sorted(predicates.items())):
        ok_i = F.coalesce(
            (F.col(f"_max{i}") >= lo) & (F.col(f"_min{i}") <= hi),
            F.lit(True),
        )
        rg_ok = ok_i if rg_ok is None else (rg_ok & ok_i)
    return (
        per_rg.withColumn("_rg_ok", rg_ok)
        .groupBy("path")
        .agg(F.max(F.col("_rg_ok").cast("int")).alias("_any_ok"))
        .filter(F.col("_any_ok") == 0)
        .select("path")
    )


def rowgroup_prune_report(
    spark: SparkSession,
    manifest_dir: str,
    predicates: dict[str, tuple[float, float]],
) -> dict[str, int]:
    """Planning metrics comparing file-level vs row-group-level
    conjunction for the same predicate box — zero data pages, one pass
    over the stats table. Keys: files_total, rowgroups_total,
    files_file_level (survivors of the per-file conjunction),
    files_rowgroup_level (survivors of the per-row-group conjunction;
    always <=), rowgroups_matching (row groups satisfying every
    predicate at once)."""
    manifest = _visible_stats(spark.read.parquet(_mdd(manifest_dir)), None)
    files_total = manifest.select("path").distinct().count()
    rowgroups_total = (
        manifest.select("path", "row_group").distinct().count()
    )
    # file-level: replicate manifest_pruned_scan_multi's elimination
    survivors = manifest.select("path").distinct()
    for column, (lo, hi) in predicates.items():
        eliminated = (
            manifest.filter(F.col("column_name") == column)
            .groupBy("path")
            .agg(
                F.min("min_val").alias("fmin"),
                F.max("max_val").alias("fmax"),
                F.sum(
                    F.when(F.col("min_val").isNull(), 1).otherwise(0)
                ).alias("n_statless"),
            )
            .filter(
                (F.col("n_statless") == 0)
                & ((F.col("fmax") < lo) | (F.col("fmin") > hi))
            )
            .select("path")
        )
        survivors = survivors.join(eliminated, "path", "left_anti")
    files_file_level = survivors.count()
    rg_eliminated = _rowgroup_eliminated_paths(manifest, predicates)
    files_rowgroup_level = (
        manifest.select("path")
        .distinct()
        .join(rg_eliminated, "path", "left_anti")
        .count()
    )
    # matching row groups: the per-rg conjunction holds
    aggs, rg_ok = [], None
    for i, (column, (lo, hi)) in enumerate(sorted(predicates.items())):
        aggs.append(
            F.max(
                F.when(F.col("column_name") == column, F.col("min_val"))
            ).alias(f"_min{i}")
        )
        aggs.append(
            F.max(
                F.when(F.col("column_name") == column, F.col("max_val"))
            ).alias(f"_max{i}")
        )
    per_rg = (
        manifest.filter(F.col("column_name").isin(list(predicates)))
        .groupBy("path", "row_group")
        .agg(*aggs)
    )
    for i, (_column, (lo, hi)) in enumerate(sorted(predicates.items())):
        ok_i = F.coalesce(
            (F.col(f"_max{i}") >= lo) & (F.col(f"_min{i}") <= hi),
            F.lit(True),
        )
        rg_ok = ok_i if rg_ok is None else (rg_ok & ok_i)
    rowgroups_matching = per_rg.filter(rg_ok).count()
    return {
        "files_total": files_total,
        "rowgroups_total": rowgroups_total,
        "files_file_level": files_file_level,
        "files_rowgroup_level": files_rowgroup_level,
        "rowgroups_matching": rowgroups_matching,
    }


#: the multi-predicate demo rectangle over (o_orderkey % 256,
#: o_custkey % 128) — dense 0-based keys, so both buckets are uniformly
#: populated at EVERY fixture SF (orders >= 1500 rows, customers >= 150)
_MULTI_X = (32, 95)
_MULTI_Y = (16, 47)


@register(
    "scan_manifest_pruned_multi",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey % 256 AS key_bucket,
                   o_custkey % 128 AS cust_bucket,
                   o_totalprice
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT key_bucket) AS BIGINT) AS n_key_buckets,
               CAST(COUNT(DISTINCT cust_bucket) AS BIGINT) AS n_cust_buckets,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM o
        WHERE key_bucket BETWEEN {_MULTI_X[0]} AND {_MULTI_X[1]}
          AND cust_bucket BETWEEN {_MULTI_Y[0]} AND {_MULTI_Y[1]}
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout + MULTI-COLUMN manifest skipping, composed — the
    Delta ``OPTIMIZE ZORDER BY`` + data-skipping pair: events land
    range-clustered on the 16-bit Morton interleave of (user bucket,
    hour bucket), so every file is a narrow rectangle in BOTH
    dimensions; the stats manifest tracks both columns from one footer
    pass; and a 2-D rectangle query prunes through
    :func:`manifest_pruned_scan_multi` — the two-column conjunction
    opens strictly fewer files than either band alone (pytest-pinned
    numFiles in tests/test_catalog_scale.py). The oracle recomputes the
    rectangle from the raw table, so the driver hash proves metadata
    elimination lost no rows. At 100 TB this is the difference between
    reading O(box-intersecting tiles) and reading one full dimension's
    candidates."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )
    from aws_seismic_data_pipeline_spark.operators.window_ops import (
        _morton16_sql,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "zmanifest_data")
    mpath = scratch_path(spark, sf_dir, "zmanifest_stats")
    with scratch_cleanup(path, mpath):
        keyed = load_table(spark, sf_dir, "orders").select(
            (F.col("o_orderkey") % 256).alias("key_bucket"),
            (F.col("o_custkey") % 128).alias("cust_bucket"),
            "o_totalprice",
        ).withColumn(
            "zkey", F.expr(_morton16_sql("key_bucket", "cust_bucket"))
        )
        keyed.repartitionByRange(16, "zkey").drop("zkey").write.mode(
            "overwrite"
        ).parquet(path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(
            spark, files, mpath, ("key_bucket", "cust_bucket")
        )
        box = manifest_pruned_scan_multi(
            spark,
            mpath,
            {"key_bucket": _MULTI_X, "cust_bucket": _MULTI_Y},
        )
        return box.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("key_bucket").cast("long").alias("n_key_buckets"),
            F.count_distinct("cust_bucket").cast("long").alias("n_cust_buckets"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("total_cents"),
        ).localCheckpoint(eager=True)


def write_fragment_concat_layout(
    spark: SparkSession, sf_dir: str, path: str, n_files: int = 8
) -> None:
    """The post-compaction layout row-group pruning exists for: orders
    lands as ``2 * n_files`` range-clustered RUNS on ``o_orderkey``
    (Spark range write), then a ROW-GROUP-PRESERVING binpack compaction
    concatenates two NON-ADJACENT runs (run i and run i + n_files) into
    each output file — pyarrow ``ParquetWriter.write_table`` per source
    run, the no-re-encode rewrite shape Iceberg's binpack
    ``rewriteDataFiles`` produces. Every output file's [min, max] spans
    ~half the key space (the union of its two runs) while every ROW
    GROUP remains one narrow run: file-level stats are defeated, per-
    row-group stats are intact. Fixture-scale concat runs on the
    driver; a production compactor does the same rowgroup copy inside
    ``mapPartitions`` over its bins."""
    import glob as _glob
    import shutil as _shutil

    import pyarrow.parquet as _pq

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    runs_dir = path + ".runs"
    (
        orders.repartitionByRange(2 * n_files, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(runs_dir)
    )
    # part-0000i is range partition i: sorted filenames ARE run order
    runs = sorted(_glob.glob(os.path.join(runs_dir, "part-*.parquet")))
    assert len(runs) == 2 * n_files, runs
    os.makedirs(path, exist_ok=True)
    for fid in range(n_files):
        out = os.path.join(path, f"compacted-{fid:05d}.parquet")
        with _pq.ParquetWriter(
            out, _pq.read_schema(runs[fid])
        ) as writer:
            for src in (runs[fid], runs[fid + n_files]):
                writer.write_table(_pq.read_table(src))
    _shutil.rmtree(runs_dir, ignore_errors=True)


def _run_width(spark: SparkSession, sf_dir: str) -> int:
    """Key width of one of the 16 range runs (SF-independent)."""
    max_k = (
        load_table(spark, sf_dir, "orders")
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    return int(max_k) // 16 + 1


@register(
    "scan_manifest_pruned_rowgroup",
    oracle="""
        WITH w AS (
            SELECT MAX(o_orderkey) // 16 + 1 AS run_w FROM orders
        ),
        band AS (
            SELECT 8 * run_w + run_w // 4 AS lo,
                   8 * run_w + run_w // 2 AS hi
            FROM w
        )
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders, band
        WHERE o_orderkey BETWEEN band.lo AND band.hi
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned_rowgroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW-GROUP-granular manifest pruning (r11 verdict item 4) on the
    layout that defeats file-level stats: bin-pack compaction merges
    NON-ADJACENT range-clustered fragments (``write_fragment_concat_
    layout`` — each file concatenates two disjoint sorted key runs), so
    every file's bounding range spans ~half the key space and a narrow
    key band intersects MOST file ranges — yet each file's row groups
    stay narrow slices of one run, and
    :func:`manifest_pruned_scan_multi_rowgroup` opens only the file(s)
    owning a row group that can actually hold the band. The manifest
    already stores per-row-group stats; the finer decision costs zero
    extra footer I/O. The oracle recomputes the band from the raw
    table (elimination must lose no rows); files_rowgroup_level <
    files_file_level on this layout is pytest-pinned via
    :func:`rowgroup_prune_report` in tests/test_catalog_scale.py. At
    100 TB this is the inside-the-candidate-set half of data skipping:
    file pruning bounds the candidates, row-group pruning bounds the
    bytes each candidate contributes."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "rgconcat_data")
    mpath = scratch_path(spark, sf_dir, "rgconcat_stats")
    with scratch_cleanup(path, mpath):
        write_fragment_concat_layout(spark, sf_dir, path)
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        write_stats_manifest(spark, files, mpath, ("o_orderkey",))
        run_w = _run_width(spark, sf_dir)
        # a band inside run 8 — the FIRST run of file 0's second half:
        # every file's [min, max] covers it (all survive file-level),
        # only file 0 owns a row group that can hold it
        lo, hi = 8 * run_w + run_w // 4, 8 * run_w + run_w // 2
        band = manifest_pruned_scan_multi_rowgroup(
            spark, mpath, {"o_orderkey": (lo, hi)}
        )
        return (
            band.groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("o_orderkey").cast("long").alias("sum_key"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_stats",
    oracle=f"""
        SELECT regexp_extract(file_name, '[^/]+$') AS file_name,
               CAST(row_group_id AS BIGINT) AS row_group,
               path_in_schema AS column_name,
               CAST(num_values AS BIGINT) AS n_rows,
               CAST(stats_min_value AS DOUBLE) AS min_val,
               CAST(stats_max_value AS DOUBLE) AS max_val
        FROM parquet_metadata('{GOLDEN_SF_DIR}/orders.parquet')
        WHERE path_in_schema IN ('o_orderkey', 'o_custkey')
    """,
    tags=("source", "layout", "golden-sf0.01"),
)
def scan_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted stats manifest as a queryable table, keyed
    (file, row_group, column): build it for the orders file over BOTH
    demo predicate columns in one footer pass
    (``write_stats_manifest``), read it back from disk, and expose the
    stats rows. Cross-engine check: DuckDB's ``parquet_metadata()``
    must report identical footers for both columns — extending
    ``scan_rowgroup_stats``'s single-column check to the multi-column
    manifest shape a 100 TB table needs (prune on ANY predicate column
    without re-reading footers). Seed: the reference's date-prefix
    layout (``/root/reference/app.py:449-463``) whose listing IS its
    (implicit, single-column) manifest."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    mpath = scratch_path(spark, sf_dir, "stats_manifest_intro")
    with scratch_cleanup(mpath):
        write_stats_manifest(
            spark, [os.path.join(sf_dir, "orders.parquet")], mpath
        )
        return (
            spark.read.parquet(mpath)
            # stats rows only — every commit also lands its commit_ts
            # wall-clock marker (timestamp time travel, r13)
            .filter(F.col("op") == "add")
            .select(
                "file_name",
                "row_group",
                "column_name",
                "n_rows",
                "min_val",
                "max_val",
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_pruned",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]} AND {_RG_PRUNE_RANGE[1]}
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer-stats skipping through the PERSISTED manifest — the
    production lifecycle end to end: range-cluster the table
    (``rangekey_write``), build the manifest for most of its files,
    APPEND the stats of the late-landing rest
    (``append_stats_manifest`` — the ingest-batch path), then answer
    the range aggregate with ``manifest_pruned_scan``, where pruning is
    an agg+filter ON THE MANIFEST TABLE and only matching paths reach
    the driver. Same oracle as ``scan_rowgroup_pruned``, so the driver
    hash-checks that manifest-driven skipping loses no rows even
    across the append; manifest==direct-footer-read equality and the
    numFiles drop are pinned in tests/test_catalog_scale.py."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "rangekey_m")
    mpath = scratch_path(spark, sf_dir, "stats_manifest")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        rangekey_write(spark, sf_dir, path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(spark, files[:12], mpath)
        if files[12:]:
            append_stats_manifest(spark, files[12:], mpath)
        return (
            manifest_pruned_scan(spark, mpath, "o_orderkey", lo, hi)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_pruned_double",
    oracle=f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_totalprice BETWEEN {_MANIFEST_PRICE_RANGE[0]}
                                AND {_MANIFEST_PRICE_RANGE[1]}
        GROUP BY o_orderstatus
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_pruned_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven skipping on a FLOAT measure column: cluster
    orders by ``o_totalprice``, manifest carries (o_orderkey,
    o_totalprice) stats from the same single footer pass, and a price-
    band aggregate prunes through the manifest — proving the stats
    table's double min/max columns serve numeric predicates of any
    type, not just integer keys (parquet double footer stats are exact,
    so conservative overlap on them loses no rows; the driver hash
    checks exactly that). The residual BETWEEN still reaches the scan
    for row-group pruning inside matching files."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "pricekey")
    mpath = scratch_path(spark, sf_dir, "stats_manifest_price")
    lo, hi = _MANIFEST_PRICE_RANGE
    with scratch_cleanup(path, mpath):
        load_table(spark, sf_dir, "orders").repartitionByRange(
            16, "o_totalprice"
        ).write.mode("overwrite").parquet(path)
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(
            spark, files, mpath, ("o_orderkey", "o_totalprice")
        )
        return (
            manifest_pruned_scan(spark, mpath, "o_totalprice", lo, hi)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
                .cast("long")
                .alias("total_cents"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_partitioned",
    oracle=f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang = 'en'
          AND doc_id BETWEEN {_PART_PRUNE_RANGE[0]} AND {_PART_PRUNE_RANGE[1]}
        GROUP BY source
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-AWARE manifest pruning — Iceberg's partition-tuple +
    column-stats skipping in one metadata pass: documents land
    Hive-partitioned by lang AND range-clustered by doc_id inside each
    partition, the manifest records each file's partition values
    (parsed from its path — the reference's ``YYYYMMDD/`` prefix layout,
    ``/root/reference/app.py:449-456``, generalized to named key=value
    dirs) beside its footer stats, and a lang+key-band aggregate prunes
    on BOTH axes: non-en partitions vanish on the partition filter, and
    en files outside the doc_id band vanish on stats — each axis alone
    would scan strictly more files (pytest-pinned numFiles drops,
    tests/test_catalog_scale.py). At 100 TB this is the difference
    between touching one partition's boundary files and touching every
    partition's boundary files. The leaf files drop the partition
    column (Hive layout), which the combined filter makes irrelevant:
    every surviving row is lang='en' by construction."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "part_manifest_data")
    mpath = scratch_path(spark, sf_dir, "part_manifest")
    lo, hi = _PART_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        (
            load_table(spark, sf_dir, "documents")
            .repartitionByRange(6, "doc_id")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(path)
        )
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        write_stats_manifest(
            spark, files, mpath, ("doc_id",), partition_by=("lang",)
        )
        return (
            manifest_pruned_scan(
                spark,
                mpath,
                "doc_id",
                lo,
                hi,
                partition_filter={"lang": "en"},
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_partition_evolution",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang = 'en'
        GROUP BY source
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_partition_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-SPEC EVOLUTION without rewriting a byte — Iceberg's
    signature trick, which falls out of the manifest design rather than
    being bolted on: the table's FIRST generation lands flat (no
    partition dirs, manifest rows carry no partition entries), the
    spec then changes, and the SECOND generation lands Hive-partitioned
    by lang with recorded values. A lang-filtered scan prunes the NEW
    generation to exactly its matching partition dirs while including
    every OLD-generation file conservatively (no recorded entry →
    cannot be skipped) — correct by construction, and strictly better
    than either rewriting history to the new spec or losing pruning on
    new data. The driver hash pins exactness across the mixed
    generations; the numFiles split (old all-in, new pruned) is
    pytest-pinned. Seed: the reference changed its S3 key scheme
    mid-life exactly this way (``/root/reference/app.py:449-463``'s
    date-prefix layout vs the fallback bare-name branch at
    ``app.py:457-459``)."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    old_dir = scratch_path(spark, sf_dir, "pspec_old")
    new_dir = scratch_path(spark, sf_dir, "pspec_new")
    mpath = scratch_path(spark, sf_dir, "pspec_manifest")
    with scratch_cleanup(old_dir, new_dir, mpath):
        docs = load_table(spark, sf_dir, "documents")
        # generation 1: the old flat spec (doc_id % 2 == 0 cohort);
        # lang kept IN-FILE because the layout does not encode it
        docs.filter(F.col("doc_id") % 2 == 0).repartition(
            3, "doc_id"
        ).write.mode("overwrite").parquet(old_dir)
        old_files = sorted(_glob.glob(os.path.join(old_dir, "*.parquet")))
        write_stats_manifest(spark, old_files, mpath, ("doc_id",))
        # spec change: generation 2 lands lang-partitioned
        (
            docs.filter(F.col("doc_id") % 2 == 1)
            .repartition(2, "doc_id")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(new_dir)
        )
        new_files = sorted(
            _glob.glob(
                os.path.join(new_dir, "**", "*.parquet"), recursive=True
            )
        )
        append_stats_manifest(
            spark, new_files, mpath, ("doc_id",), partition_by=("lang",)
        )
        scanned = manifest_pruned_scan(
            spark,
            mpath,
            "doc_id",
            -1,
            2**62,
            partition_filter={"lang": "en"},
            merge_schema=True,
        )
        # old-generation leaf files carry lang in-file; new-generation
        # files dropped it into the dir name and are already en-only —
        # recover it from either source and apply the residual filter
        lang = F.coalesce(
            F.col("lang"),
            F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1),
        )
        return (
            scanned.withColumn("_lang", lang)
            .filter(F.col("_lang") == "en")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "scan_manifest_asof",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang <> 'zh'
        GROUP BY lang
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL through the manifest's snapshot axis: documents land
    partitioned by lang, the manifest is built at snapshot 0 (de/en/es),
    then fr lands at snapshot 1 and zh at snapshot 2 — and a query
    pinned ``as_of=1`` must see exactly the world as of snapshot 1:
    fr included, zh invisible, even though zh's files sit on disk AND
    in the (current) manifest. Visibility is a pure metadata filter
    (``snapshot_id <= as_of`` on the stats table) — the table-format
    snapshot-isolation contract, with the reproducibility payoff for
    training pipelines: a run pinned to a snapshot reads the same
    corpus forever, regardless of what later ingests append. The
    oracle recomputes the as-of world from the raw table (everything
    but zh), so the driver hash-checks the visibility boundary in both
    directions."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "asof_docs")
    mpath = scratch_path(spark, sf_dir, "asof_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)

        def lang_files(*langs: str) -> list[str]:
            return sorted(
                p
                for lang in langs
                for p in _glob.glob(
                    os.path.join(data_dir, f"lang={lang}", "*.parquet")
                )
            )

        write_stats_manifest(spark, lang_files("de", "en", "es"), mpath, ("doc_id",))
        v1 = append_stats_manifest(spark, lang_files("fr"), mpath, ("doc_id",))
        append_stats_manifest(spark, lang_files("zh"), mpath, ("doc_id",))
        visible = manifest_pruned_scan(
            spark, mpath, "doc_id", 0, 2**62, as_of=v1
        )
        # leaf-file reads drop partition dir values; recover lang from
        # the path the row was read from (pure metadata, no join)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            visible.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def manifest_incremental_scan(
    spark: SparkSession, manifest_dir: str, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """INCREMENTAL read between snapshots — the CDC direction of the
    manifest's time axis (``scan_manifest_asof`` answers "the world AS
    OF N"; this answers "what ARRIVED in (from, to]"): list the files
    whose ``add`` landed in the half-open snapshot interval and read
    only them — the consumption contract an incremental downstream job
    (index append, dedup promotion, aggregate maintenance) runs on,
    Iceberg's incremental-append scan — and exactly like Iceberg's, it
    consumes APPEND snapshots only: a snapshot that carries any
    ``remove`` is a maintenance commit (compaction rewrite), whose
    added file mixes moved rows with rows delivered by earlier
    snapshots — delivering it would double-count the past, so its adds
    are skipped wholesale (the moved rows were or will be consumed
    under their original append snapshots; tests pin this with a
    compaction inside the window). Pure metadata: the path list is
    interval-sized."""
    if to_snapshot < from_snapshot:
        raise ValueError(
            f"incremental scan: to={to_snapshot} < from={from_snapshot}"
        )
    lman = localman.load(manifest_dir)
    if lman is not None:  # driver-side interval listing (see pruned_scan)
        w = lman[
            (lman["snapshot_id"] > from_snapshot)
            & (lman["snapshot_id"] <= to_snapshot)
        ]
        maintenance = set(w.loc[w["op"] == "remove", "snapshot_id"])
        adds = w[w["op"] == "add"]
        paths = sorted(
            adds.loc[~adds["snapshot_id"].isin(maintenance), "path"].unique()
        )
    else:
        m = spark.read.parquet(_mdd(manifest_dir))
        window_rows = m.filter(
            (F.col("snapshot_id") > from_snapshot)
            & (F.col("snapshot_id") <= to_snapshot)
        )
        maintenance = (
            window_rows.filter(F.col("op") == "remove")
            .select("snapshot_id")
            .distinct()
        )
        added = (
            window_rows.filter(F.col("op") == "add")
            .join(maintenance, "snapshot_id", "left_anti")
            .select("path")
            .distinct()
        )
        paths = [r.path for r in added.collect()]
    if not paths:
        return spark.createDataFrame([], "doc_id long")
    return spark.read.parquet(*paths)


@register(
    "scan_manifest_incremental",
    oracle="""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        WHERE lang IN ('fr', 'zh')
        GROUP BY lang
    """,
    tags=("scan", "manifest", "incremental"),
)
def scan_manifest_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest's CDC read: with the same 3-snapshot staging as
    ``scan_manifest_asof`` (base de/en/es at snapshot 0, fr at 1, zh
    at 2), an incremental scan of (0, 2] must deliver EXACTLY the fr+zh
    arrivals — none of the base corpus, all of both increments. The
    oracle recomputes that delta from the raw table, so the driver
    hash-checks both interval edges. This is the consumption side of
    every incremental artifact in the repo (index appends, corpus
    promotion): downstream maintenance reads arrivals-since-N, never
    the table."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "incr_docs")
    mpath = scratch_path(spark, sf_dir, "incr_manifest")
    with scratch_cleanup(data_dir, mpath):
        load_table(spark, sf_dir, "documents").repartition(
            "lang"
        ).write.partitionBy("lang").mode("overwrite").parquet(data_dir)

        def lang_files(*langs: str) -> list[str]:
            return sorted(
                p
                for lang in langs
                for p in _glob.glob(
                    os.path.join(data_dir, f"lang={lang}", "*.parquet")
                )
            )

        write_stats_manifest(
            spark, lang_files("de", "en", "es"), mpath, ("doc_id",)
        )
        append_stats_manifest(spark, lang_files("fr"), mpath, ("doc_id",))
        append_stats_manifest(spark, lang_files("zh"), mpath, ("doc_id",))
        delta = manifest_incremental_scan(spark, mpath, 0, 2)
        lang = F.regexp_extract(F.input_file_name(), "lang=([^/]+)/", 1)
        return (
            delta.groupBy(lang.alias("lang"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


def _history_floor(manifest: DataFrame) -> int | None:
    """The expire floor recorded in the manifest (None if history has
    never been expired)."""
    v = (
        manifest.filter(F.col("op") == "expire")
        .agg(F.max("min_val"))
        .collect()[0][0]
    )
    return None if v is None else int(v)


def manifest_count_range(
    spark: SparkSession,
    manifest_dir: str,
    column: str,
    lo: float,
    hi: float,
    as_of: int | None = None,
) -> tuple[int, int, int]:
    """COUNT(key BETWEEN lo AND hi) answered mostly from METADATA —
    the Iceberg/parquet metadata-only count: row groups whose stats
    range sits WHOLLY inside [lo, hi] contribute their footer row
    counts without touching a data page; only files owning a
    PARTIALLY-overlapping row group are opened (the parquet reader
    then re-prunes non-overlapping row groups inside them from the
    same footer stats). On a 100 TB range-clustered table a count
    query reads two boundary files instead of the table. Stats-less
    row groups are conservatively counted by scan. Returns
    (n_total, n_from_metadata, n_files_scanned).

    The row-group CLASSIFICATION (inside / partial / statless) is a
    question about the KB-scale stats table and runs DRIVER-SIDE via
    :mod:`.localman` (Spark fallback); only the boundary files'
    residual count is a Spark scan."""
    lman = localman.load(manifest_dir)
    if lman is not None:
        vis = localman.visible(lman, as_of)
        sub = vis[vis["column_name"] == column]
        statless = sub["min_val"].isna()
        inside = (
            ~statless & (sub["min_val"] >= lo) & (sub["max_val"] <= hi)
        )
        partial = (
            ~statless
            & ~inside
            & (sub["max_val"] >= lo)
            & (sub["min_val"] <= hi)
        )
        n_meta = int(sub.loc[inside, "n_rows"].sum())
        scan_paths = sorted(sub.loc[partial | statless, "path"].unique())
        n_scanned = 0
        if scan_paths:
            per_file_inside = (
                sub.loc[inside & sub["path"].isin(scan_paths)]
                .groupby("path")["n_rows"]
                .sum()
                .to_dict()
            )
            in_range = (
                spark.read.parquet(*scan_paths)
                .filter(F.col(column).between(lo, hi))
                .groupBy(_decode_input_file().alias("path"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            known = set(scan_paths)
            for r in in_range:
                if r.path not in known:
                    raise ValueError(
                        f"manifest_count_range: scanned file {r.path!r} "
                        "did not resolve to a manifest path — count "
                        "would be wrong"
                    )
                n_scanned += int(r.n) - int(per_file_inside.get(r.path, 0))
        return n_meta + n_scanned, n_meta, len(scan_paths)
    manifest = _visible_stats(spark.read.parquet(_mdd(manifest_dir)), as_of).filter(
        F.col("column_name") == column
    )
    rg = manifest.select(
        "path",
        "row_group",
        "n_rows",
        "min_val",
        "max_val",
        F.when(
            F.col("min_val").isNull(), F.lit("statless")
        )
        .when(
            (F.col("min_val") >= lo) & (F.col("max_val") <= hi),
            F.lit("inside"),
        )
        .when(
            (F.col("max_val") >= lo) & (F.col("min_val") <= hi),
            F.lit("partial"),
        )
        .otherwise(F.lit("outside"))
        .alias("cls"),
    )
    agg = rg.groupBy().pivot(
        "cls", ["inside", "partial", "statless", "outside"]
    ).sum("n_rows").collect()[0]
    n_meta = int(agg["inside"] or 0)
    scan_paths = sorted(
        r.path
        for r in rg.filter(F.col("cls").isin("partial", "statless"))
        .select("path")
        .distinct()
        .collect()
    )
    n_scanned = 0
    if scan_paths:
        # exclude the wholly-inside row groups of scanned files: count
        # only rows in the range but NOT in an inside-rowgroup... a row
        # group is the unit, so instead count the file's in-range rows
        # and subtract its inside-rowgroup metadata counts (already in
        # n_meta) — equivalent and expressible without rowgroup access
        per_file_inside = {
            r.path: r.m
            for r in rg.filter(
                (F.col("cls") == "inside") & F.col("path").isin(scan_paths)
            )
            .groupBy("path")
            .agg(F.sum("n_rows").alias("m"))
            .collect()
        }
        in_range = (
            spark.read.parquet(*scan_paths)
            .filter(F.col(column).between(lo, hi))
            .groupBy(_decode_input_file().alias("path"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # input_file_name() returns a percent-encoded URI; a data dir
        # containing spaces/%-chars would miss the manifest path map and
        # double-count inside-rowgroups — decode, and refuse to return a
        # silently-wrong count if any scanned path still fails to resolve
        known = set(scan_paths)
        for r in in_range:
            if r.path not in known:
                raise ValueError(
                    f"manifest_count_range: scanned file {r.path!r} did "
                    "not resolve to a manifest path — count would be wrong"
                )
            n_scanned += int(r.n) - int(per_file_inside.get(r.path, 0))
    return n_meta + n_scanned, n_meta, len(scan_paths)


@register(
    "scan_manifest_count_only",
    oracle=f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN o_orderkey BETWEEN {_RG_PRUNE_RANGE[0]}
                                  AND {_RG_PRUNE_RANGE[1]}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
        FROM orders
    """,
    tags=("source", "layout", "scan"),
)
def scan_manifest_count_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only counting through the manifest: land orders
    range-clustered, then answer both COUNT(*) (every row group wholly
    inside an unbounded range — zero data pages) and a band count
    (interior row groups from metadata, the two boundary files scanned
    with the residual predicate). The oracle recomputes both counts
    from the raw table; metadata-dominance (n_from_metadata > 0,
    files-scanned < files-total) is pytest-pinned in
    tests/test_catalog_scale.py. This is why a governed 100 TB table
    answers its row count without an exabyte of I/O."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    prepare(spark)
    path = scratch_path(spark, sf_dir, "countonly_orders")
    mpath = scratch_path(spark, sf_dir, "countonly_manifest")
    lo, hi = _RG_PRUNE_RANGE
    with scratch_cleanup(path, mpath):
        rangekey_write(spark, sf_dir, path)
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        write_stats_manifest(spark, files, mpath, ("o_orderkey",))
        total, _, _ = manifest_count_range(
            spark, mpath, "o_orderkey", float("-inf"), float("inf")
        )
        band, _, _ = manifest_count_range(spark, mpath, "o_orderkey", lo, hi)
        return spark.createDataFrame(
            [(int(total), int(band))], "n_orders long, n_in_band long"
        )


@register(
    "plan_time_travel_timestamp",
    oracle="""
        WITH snap0 AS (
            SELECT CAST(0 AS BIGINT) AS pin,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
        ),
        cur AS (
            SELECT CAST(1 AS BIGINT) AS pin,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM (
                SELECT doc_id, n_chars FROM documents
                UNION ALL
                SELECT doc_id + 3000000, n_chars
                FROM documents WHERE doc_id % 9 = 0
            )
        )
        SELECT * FROM snap0 UNION ALL SELECT * FROM cur
    """,
    tags=("plan", "maintenance", "scan"),
)
def plan_time_travel_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF TIMESTAMP time travel end to end (round-12 verdict item
    6): every commit stamps its wall-clock as a commit_ts marker row
    inside the SAME write job; ``snapshot_for_timestamp`` resolves a
    timestamp to the newest snapshot committed at or before it. The
    scenario creates the table (snapshot 0), appends a batch
    (snapshot 1), reads the two recorded commit clocks BACK OFF THE
    MANIFEST, and pins: a read at snapshot 0's exact clock sees only
    the original files; a read at snapshot 1's clock sees both. The
    oracle recomputes both states raw — resolution off by one commit
    flips a whole output row. Boundary raises (pre-first-commit,
    post-expiry) are pytest-pinned. Delta resolves timestamps from
    log-file mtimes, which a manifest rewrite destroys; explicit
    marker rows survive expiry for all surviving snapshots."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        load_table,
        prepare,
        scratch_cleanup,
        scratch_path,
    )
    from aws_seismic_data_pipeline_spark.sources.table.facade import (
        GovernedTable,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "ts_travel_data")
    mpath = scratch_path(spark, sf_dir, "ts_travel_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "n_chars"
        )
        table = GovernedTable.create(
            spark, docs, data_dir, mpath, "doc_id", n_files=4
        )
        late = docs.filter(F.col("doc_id") % 9 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(3000000)
        )
        stage = os.path.join(data_dir, ".late")
        late.coalesce(1).write.parquet(stage)
        part = sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))[0]
        late_path = os.path.join(data_dir, "late-00000.parquet")
        os.replace(part, late_path)
        table.append([late_path])
        # the recorded commit clocks, read back off the manifest
        # (driver-side; Spark fallback)
        lman = localman.load(mpath)
        if lman is not None:
            marks = lman[lman["op"] == "commit_ts"]
            clocks = {
                int(s): float(v)
                for s, v in zip(marks["snapshot_id"], marks["min_val"])
            }
        else:
            clocks = {
                int(r.snapshot_id): r.min_val
                for r in spark.read.parquet(_mdd(mpath))
                .filter(F.col("op") == "commit_ts")
                .select("snapshot_id", "min_val")
                .collect()
            }
        out = []
        for pin, snap in ((0, 0), (1, 1)):
            agg = (
                table.scan_with_deletes(
                    as_of=table.snapshot_at(clocks[snap])
                )
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_chars").cast("long").alias("sum_chars"),
                )
                .select(
                    F.lit(pin).cast("long").alias("pin"),
                    "n_docs",
                    "sum_chars",
                )
            )
            out.append(agg)
        return out[0].unionByName(out[1]).localCheckpoint(eager=True)


def describe_history(spark: SparkSession, manifest_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for the governed table (Delta's verb): one row
    per snapshot with the operation kinds committed there, files
    added/removed, rows added, and the commit wall-clock (from the
    commit_ts marker; NULL for commits that predate timestamp
    stamping). Entirely metadata-scale: a handful of KB-manifest
    aggregates, zero data pages — the audit surface an operator reads
    before rolling back or pinning a training run. Computed
    DRIVER-SIDE via :mod:`.localman` (the result is |snapshots| rows
    of local metadata; the Spark 4-way join below re-executed on every
    action that touched the history view — r15 profiling); identical
    values, pinned by the registered query's oracle."""
    lman = localman.load(manifest_dir)
    if lman is not None:
        import pandas as _pd

        rows = []
        for snap in sorted(int(s) for s in lman["snapshot_id"].unique()):
            sub = lman[lman["snapshot_id"] == snap]
            non_ts = sub[sub["op"] != "commit_ts"]
            ops = ",".join(sorted(non_ts["op"].unique()))
            add = sub[sub["op"] == "add"]
            addu = add[["path", "row_group", "n_rows"]].drop_duplicates()
            n_files_added = int(addu["path"].nunique())
            n_rows_added = int(addu["n_rows"].sum()) if len(addu) else 0
            n_files_removed = int(
                sub.loc[sub["op"] == "remove", "path"].nunique()
            )
            n_del = int((non_ts["op"] == "delete_eq").sum())
            tsv = sub.loc[sub["op"] == "commit_ts", "min_val"]
            commit_ts = (
                float(tsv.max())
                if len(tsv) and not tsv.isna().all()
                else None
            )
            rows.append(
                (snap, ops, n_files_added, n_files_removed,
                 n_rows_added, n_del, commit_ts)
            )
        return spark.createDataFrame(
            rows,
            "snapshot_id long, ops string, n_files_added long,"
            " n_files_removed long, n_rows_added long,"
            " n_delete_records long, commit_ts double",
        )
    man = spark.read.parquet(_mdd(manifest_dir))
    adds = (
        man.filter(F.col("op") == "add")
        # per-column stats rows repeat (path, row_group, n_rows):
        # dedupe before summing or every file counts |columns| times
        .select("snapshot_id", "path", "row_group", "n_rows")
        .distinct()
        .groupBy("snapshot_id")
        .agg(
            F.countDistinct("path").cast("long").alias("n_files_added"),
            F.sum("n_rows").cast("long").alias("n_rows_added"),
        )
    )
    removes = (
        man.filter(F.col("op") == "remove")
        .groupBy("snapshot_id")
        .agg(F.countDistinct("path").cast("long").alias("n_files_removed"))
    )
    ts = (
        man.filter(F.col("op") == "commit_ts")
        .groupBy("snapshot_id")
        .agg(F.max("min_val").alias("commit_ts"))
    )
    ops = (
        man.filter(F.col("op") != "commit_ts")
        .groupBy("snapshot_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("op")), ",").alias("ops"),
            F.sum(
                F.when(F.col("op") == "delete_eq", 1).otherwise(0)
            ).cast("long").alias("n_delete_records"),
        )
    )
    return (
        man.select("snapshot_id")
        .distinct()
        .join(ops, "snapshot_id", "left")
        .join(adds, "snapshot_id", "left")
        .join(removes, "snapshot_id", "left")
        .join(ts, "snapshot_id", "left")
        .select(
            F.col("snapshot_id").cast("long").alias("snapshot_id"),
            F.coalesce("ops", F.lit("")).alias("ops"),
            F.coalesce("n_files_added", F.lit(0)).cast("long").alias(
                "n_files_added"
            ),
            F.coalesce("n_files_removed", F.lit(0)).cast("long").alias(
                "n_files_removed"
            ),
            F.coalesce("n_rows_added", F.lit(0)).cast("long").alias(
                "n_rows_added"
            ),
            F.coalesce("n_delete_records", F.lit(0)).cast("long").alias(
                "n_delete_records"
            ),
            "commit_ts",
        )
        .orderBy("snapshot_id")
    )


@register(
    "plan_describe_history",
    oracle="""
        SELECT CAST(0 AS BIGINT) AS snapshot_id, 'add' AS ops,
               CAST(4 AS BIGINT) AS n_files_added,
               CAST(0 AS BIGINT) AS n_files_removed,
               CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
                   AS n_rows_added,
               CAST(0 AS BIGINT) AS n_delete_records,
               TRUE AS has_ts
        UNION ALL
        SELECT 1, 'add', 1, 0,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
                WHERE doc_id % 7 = 0),
               0, TRUE
        UNION ALL
        SELECT 2, 'delete_eq', 0, 0, 0, CAST(3 AS BIGINT), TRUE
        UNION ALL
        SELECT 3, 'schema_rename', 0, 0, 0, 0, TRUE
    """,
    tags=("plan", "maintenance", "scan"),
)
def plan_describe_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY end to end: create (4 files), append (1 file),
    row-level equality delete (pure metadata), RENAME COLUMN (pure
    metadata) — then read the table's commit log back as the audit
    table: per snapshot the op kinds, files added/removed, rows added,
    and that every commit carries its wall-clock marker. The oracle
    recomputes the expected ledger from the raw fixture (row counts
    from documents; file counts are the scenario's deterministic
    write shapes) — a commit that lost its marker, double-counted
    per-column stats rows, or mislabeled its op flips a row."""
    import glob as _glob

    from aws_seismic_data_pipeline_spark.catalog import (
        load_table,
        prepare,
        scratch_cleanup,
        scratch_path,
    )
    from aws_seismic_data_pipeline_spark.sources.table.deletes import (
        equality_delete,
    )
    from aws_seismic_data_pipeline_spark.sources.table.evolution import (
        evolve_schema_rename,
    )
    from aws_seismic_data_pipeline_spark.sources.table.facade import (
        GovernedTable,
    )

    prepare(spark)
    data_dir = scratch_path(spark, sf_dir, "history_data")
    mpath = scratch_path(spark, sf_dir, "history_manifest")
    with scratch_cleanup(data_dir, mpath):
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        table = GovernedTable.create(
            spark, docs, data_dir, mpath, "doc_id", n_files=4
        )
        late = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(5000000)
        )
        stage = os.path.join(data_dir, ".late")
        late.coalesce(1).write.parquet(stage)
        part = sorted(_glob.glob(os.path.join(stage, "part-*.parquet")))[0]
        late_path = os.path.join(data_dir, "late-00000.parquet")
        os.replace(part, late_path)
        table.append([late_path])
        equality_delete(spark, mpath, "doc_id", [1, 2, 3])
        evolve_schema_rename(spark, mpath, "n_chars", "char_count")
        return (
            describe_history(spark, mpath)
            .select(
                "snapshot_id",
                "ops",
                "n_files_added",
                "n_files_removed",
                "n_rows_added",
                "n_delete_records",
                F.col("commit_ts").isNotNull().alias("has_ts"),
            )
            .localCheckpoint(eager=True)
        )
