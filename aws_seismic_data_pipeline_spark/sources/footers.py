"""Parquet footer-statistics readers — the low-level feed shared by
the row-group-pruning scans (``sources/readers.py``) and the
table-format manifest engine (``sources/table/``). Split out of
readers.py in round 11 (the file held the whole table-format engine).

Seed: the reference treats its paginated object listing as the
statistic itself (``/root/reference/upload_to_rfs.py:16-35``); these
helpers read the same answers from parquet footers, distributed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table


#: commit-scale ceiling for driver-side footer reads (see the gated
#: branches in read_footer_stats/_multi); bulk builds stay distributed
_FOOTER_LOCAL_MAX = int(os.environ.get("SPARK_GRAFT_LOCAL_COMMIT_MAX", "64"))


def _footer_stats_rows_local(paths: list[str], column: str):
    """Driver-side twin of :func:`read_footer_stats`'s task body —
    identical tuples (long min/max), or None on any failure."""
    try:
        import pyarrow.parquet as pq

        rows = []
        for p in paths:
            md = pq.ParquetFile(p).metadata
            col_idx = md.schema.names.index(column)
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(col_idx)
                st = col.statistics
                has = st is not None and st.has_min_max
                rows.append(
                    (
                        p,
                        os.path.basename(p),
                        rg,
                        col.num_values,
                        int(st.min) if has else None,
                        int(st.max) if has else None,
                    )
                )
        return rows
    except Exception:
        return None


def _footer_stats_rows_local_multi(paths: list[str], columns):
    """Driver-side twin of :func:`read_footer_stats_multi`'s task body
    — identical tuples (double min/max, non-numeric stats NULL), or
    None on any failure."""
    try:
        import pyarrow.parquet as pq

        def _num(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return None

        rows = []
        for p in paths:
            md = pq.ParquetFile(p).metadata
            names = md.schema.names
            idx = {c: names.index(c) for c in columns}
            for rg in range(md.num_row_groups):
                for c in columns:
                    col = md.row_group(rg).column(idx[c])
                    st = col.statistics
                    has = st is not None and st.has_min_max
                    rows.append(
                        (
                            p,
                            os.path.basename(p),
                            rg,
                            c,
                            col.num_values,
                            _num(st.min) if has else None,
                            _num(st.max) if has else None,
                        )
                    )
        return rows
    except Exception:
        return None


def _decode_input_file() -> F.Column:
    """``input_file_name()`` as a canonical local path: strip the
    ``file:`` scheme and decode the URI's %-escapes JVM-side, so paths
    containing spaces or other reserved characters compare equal to the
    plain filesystem paths a manifest records. ``url_decode`` follows
    ``URLDecoder`` in turning '+' into a space — file URIs never encode
    space that way — so a literal '+' is pre-escaped to '%2B' first,
    making the result exactly ``urllib.parse.unquote`` of the URI path."""
    uri = F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    return F.url_decode(F.regexp_replace(uri, r"\+", "%2B"))



def read_footer_stats(
    spark: SparkSession, paths: list[str], column: str
) -> DataFrame:
    """Distributed parquet-footer stats collector: fan the file list
    out over ``mapInPandas`` (each task reads only its files' footer
    KBs with pyarrow) and return one row per (file, row group) with
    the integer ``column``'s min/max/num_values. Row groups written
    without statistics yield NULL min/max (consumers must treat them
    conservatively — an unknown range can match anything). The data
    pages are never read — at 100 TB with millions of files this is
    manifest-building, not a scan. Shared by ``scan_rowgroup_stats``
    (introspection) and ``rowgroup_pruned_scan`` (the data-skipping
    decision itself)."""
    import os as _os

    import pandas as _pd

    if not paths:
        raise ValueError("read_footer_stats: empty path list")
    out_schema = (
        "path string, file_name string, row_group long, n_rows long,"
        " min_val long, max_val long"
    )
    if len(paths) <= _FOOTER_LOCAL_MAX:
        # commit-scale file list: read the footer KBs on the driver
        # (~1 ms/file) instead of fanning a mapInPandas stage over
        # them (~100 ms Python-worker fork per task at local[32]) —
        # identical rows as a local relation; any failure falls back
        # to the distributed read below
        local = _footer_stats_rows_local(sorted(paths), column)
        if local is not None:
            return spark.createDataFrame(local, out_schema)
    # pandas input -> one Arrow batch; the tuple-list form pickles
    # through a Python-RDD pipeline (~5 s of overhead per call)
    files = spark.createDataFrame(
        _pd.DataFrame({"path": sorted(paths)}), "path string"
    ).repartition(min(len(paths), 32))

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                col_idx = names.index(column)
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(col_idx)
                    st = col.statistics
                    has = st is not None and st.has_min_max
                    rows.append(
                        (
                            p,
                            _os.path.basename(p),
                            rg,
                            col.num_values,
                            int(st.min) if has else None,
                            int(st.max) if has else None,
                        )
                    )
            if rows:
                yield _pd.DataFrame(
                    rows,
                    columns=[
                        "path",
                        "file_name",
                        "row_group",
                        "n_rows",
                        "min_val",
                        "max_val",
                    ],
                ).astype({"min_val": "Int64", "max_val": "Int64"})

    return files.mapInPandas(read_footers, out_schema)


def rangekey_write(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Land the orders table as a MULTI-FILE parquet directory with
    narrow per-file o_orderkey ranges: ``repartitionByRange`` gives
    each task a contiguous key segment, so every file's footer min/max
    covers ~1/16 of the key space — the layout that makes footer-stats
    pruning effective. This is the 1-D sibling of ``zorder_write``
    (operators/window_ops.py); the reference's date-prefix layout
    (``/root/reference/app.py:449-463``) is the same idea with the
    calendar as the range key."""
    load_table(spark, sf_dir, "orders").repartitionByRange(
        16, "o_orderkey"
    ).write.mode("overwrite").parquet(path)


#: the demo range: ~5 of the 16 range-partitioned files at any SF
_RG_PRUNE_RANGE = (1000, 5000)


def read_footer_stats_multi(
    spark: SparkSession, paths: list[str], columns: tuple[str, ...]
) -> DataFrame:
    """Multi-column footer-stats collector: ONE pyarrow footer read per
    file yields min/max/num_values for EVERY requested leaf column —
    the same metadata object carries them all, so a manifest over N
    predicate columns costs exactly the same footer I/O as one column
    (the r7 ``read_footer_stats`` re-listed per column). Output is the
    manifest's physical schema, keyed (path, row_group, column_name);
    min/max are stored as double (exact for integers below 2^53 —
    every fixture and TPC-H key range — and natively right for float
    measure columns). Stats-less row groups yield NULL min/max and
    must be treated conservatively by consumers."""
    import os as _os

    import pandas as _pd

    if not paths:
        raise ValueError("read_footer_stats_multi: empty path list")
    if not columns:
        raise ValueError("read_footer_stats_multi: no columns requested")
    cols = tuple(columns)
    out_schema = (
        "path string, file_name string, row_group long, column_name string,"
        " n_rows long, min_val double, max_val double"
    )
    if len(paths) <= _FOOTER_LOCAL_MAX:
        # commit-scale list: driver-side footer read (see
        # read_footer_stats); distributed fan-out below is the bulk path
        local = _footer_stats_rows_local_multi(sorted(paths), cols)
        if local is not None:
            return spark.createDataFrame(local, out_schema)
    # pandas input -> one Arrow batch (see read_footer_stats)
    files = spark.createDataFrame(
        _pd.DataFrame({"path": sorted(paths)}), "path string"
    ).repartition(min(len(paths), 32))

    def read_footers(batches):
        import pyarrow.parquet as pq

        def _num(v):
            # non-numeric stats (string/binary columns) become NULL —
            # consumers already treat NULL min/max conservatively, and
            # row-count users (bloom sizing) only need n_rows
            try:
                return float(v)
            except (TypeError, ValueError):
                return None

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = md.schema.names
                idx = {c: names.index(c) for c in cols}
                for rg in range(md.num_row_groups):
                    for c in cols:
                        col = md.row_group(rg).column(idx[c])
                        st = col.statistics
                        has = st is not None and st.has_min_max
                        rows.append(
                            (
                                p,
                                _os.path.basename(p),
                                rg,
                                c,
                                col.num_values,
                                _num(st.min) if has else None,
                                _num(st.max) if has else None,
                            )
                        )
            if rows:
                yield _pd.DataFrame(
                    rows,
                    columns=[
                        "path",
                        "file_name",
                        "row_group",
                        "column_name",
                        "n_rows",
                        "min_val",
                        "max_val",
                    ],
                )

    return files.mapInPandas(read_footers, out_schema)
