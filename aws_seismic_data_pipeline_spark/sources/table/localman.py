"""Driver-side pyarrow fast path over the KB-scale stats manifest.

Every governed-table verb answers planning questions (visible files,
pruned path lists, delete keys, commit timestamps) from the manifest —
kilobytes of local metadata. Routing each of those questions through a
Spark job costs a full job-submission round trip (~100 ms of scheduler
latency at local[32], and 30+ tiny tasks per job over the manifest's
many small files); a governed MERGE chained ~30 such jobs, a SQL MERGE
~43 (measured, r15 profiling). This module mirrors the exact Spark
semantics of each metadata computation in pandas on the driver —
``commit._next_snapshot`` and ``constraints.active_constraints``
established the pattern and the rationale — so the Spark jobs that
remain on a verb are only the ones that touch DATA.

Contract: every helper returns ``None`` on ANY failure and the caller
falls back to the original Spark path, so layouts pyarrow cannot
address (exotic stores, foreign schemas) keep working. Nothing is
cached: each call re-reads the manifest directory, exactly like the
``spark.read.parquet`` call it replaces (concurrent-writer semantics
are read-point-for-read-point identical).

The write half lands METADATA-ONLY commit rows (tombstones, equality
deletes, constraint/schema declarations, commit_ts markers, and
small-batch footer-stats adds) as ONE pyarrow parquet file appended to
the manifest directory — bit-compatible with Spark-written files
(schema equality and mixed-directory reads in both engines are
pytest-pinned in tests/test_localman.py) — instead of a Spark
createDataFrame + write job per commit.
"""

from __future__ import annotations

import os
import re
import urllib.parse
import uuid

from aws_seismic_data_pipeline_spark.sources.table.logstore import (
    manifest_data_dir as _mdd,
)

#: the manifest's canonical arrow schema — equals what Spark writes for
#: manifest._MANIFEST_SCHEMA (pinned by tests/test_localman.py)
def _arrow_manifest_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("path", pa.string()),
            pa.field("file_name", pa.string()),
            pa.field("row_group", pa.int64()),
            pa.field("column_name", pa.string()),
            pa.field("n_rows", pa.int64()),
            pa.field("min_val", pa.float64()),
            pa.field("max_val", pa.float64()),
            pa.field("snapshot_id", pa.int32()),
            pa.field("op", pa.string()),
            pa.field("partition_values", pa.map_(pa.string(), pa.string())),
        ]
    )


#: column order of the canonical manifest schema
_COLS = (
    "path",
    "file_name",
    "row_group",
    "column_name",
    "n_rows",
    "min_val",
    "max_val",
    "snapshot_id",
    "op",
    "partition_values",
)


# --------------------------------------------------------------------
# read side
# --------------------------------------------------------------------

#: driver-side manifest row bound (r15 verdict item 1): ``load()``
#: materializes the WHOLE manifest on the driver, and the manifest is
#: rows = files × row-groups × stat-columns — fine at the ~10^5 rows a
#: 100 TB table's metadata occupies, catastrophic at 10^7-file
#: pathologies. Above the bound every caller falls back to its
#: original distributed Spark path. The count comes from parquet
#: FOOTER metadata (``pyarrow.dataset.count_rows`` with no filter reads
#: row-group counts only, never data pages), so the gate itself costs
#: one footer read per manifest file.
_LOCAL_MAN_MAX = int(os.environ.get("SPARK_GRAFT_LOCAL_MAN_MAX", "2000000"))


def load(manifest_dir: str):
    """The manifest as a pandas DataFrame (``partition_values`` as
    dicts, exactly the values Spark's collect() returns), or None when
    pyarrow cannot read it (caller falls back to Spark) OR when the
    manifest exceeds ``SPARK_GRAFT_LOCAL_MAN_MAX`` rows (driver-heap
    guard: the Spark fallback is the correct engine for a manifest
    that large). Hidden ``_``/``.`` entries (the ``_commits`` token
    tree) are excluded by pyarrow's default ignore_prefixes, matching
    Spark's listing."""
    try:
        import pyarrow.dataset as pads

        ds = pads.dataset(_mdd(manifest_dir), format="parquet")
        if ds.count_rows() > _LOCAL_MAN_MAX:
            return None
        tbl = ds.to_table()
        pdf = tbl.to_pandas()
        if "partition_values" in pdf.columns:
            pdf["partition_values"] = pdf["partition_values"].map(
                lambda v: dict(v) if v is not None else None
            )
        return pdf
    except Exception:
        return None


def visible(man, as_of: int | None):
    """Pandas twin of ``manifest._visible_stats``: 'add' rows whose
    path has no 'remove' tombstone at or below the pin."""
    if as_of is not None:
        man = man[man["snapshot_id"] <= as_of]
    removed = set(man.loc[man["op"] == "remove", "path"])
    out = man[man["op"] == "add"]
    if removed:
        out = out[~out["path"].isin(removed)]
    return out


def history_floor(man) -> int | None:
    """Pandas twin of ``manifest._history_floor``."""
    v = man.loc[man["op"] == "expire", "min_val"]
    if len(v) == 0 or v.isna().all():
        return None
    return int(v.max())


def check_floor(man, as_of: int | None, manifest_dir: str) -> None:
    """Raise exactly like the Spark scan paths when ``as_of`` is below
    the expire floor."""
    if as_of is None:
        return
    floor = history_floor(man)
    if floor is not None and as_of < floor:
        raise ValueError(
            f"as_of={as_of} is below the expire floor {floor} — "
            f"history at {manifest_dir} was expired; pinned reads "
            "below the floor cannot be reconstructed"
        )


def apply_partition_filter(man, partition_filter, manifest_dir: str):
    """Pandas twin of the scans' partition_values filter: a row
    survives when its recorded entry for each filtered column is
    missing/NULL (conservative) or equals the requested value."""
    if not partition_filter:
        return man
    if "partition_values" not in man.columns:
        raise ValueError(
            f"manifest at {manifest_dir} records no partition values "
            "— rebuild it with write_stats_manifest(partition_by=...)"
        )
    for k, v in partition_filter.items():
        sv = str(v)

        def _keep(pv, _k=k, _sv=sv):
            if pv is None:
                return True
            entry = pv.get(_k)
            return entry is None or entry == _sv

        man = man[man["partition_values"].map(_keep)]
    return man


def per_file_stats(vis, column: str):
    """Per-file (fmin, fmax, n_statless) over the visible stats rows of
    ``column`` — the candidacy aggregate every pruned scan and CoW
    merge runs. Returns a pandas frame indexed by path."""
    sub = vis[vis["column_name"] == column]
    g = sub.groupby("path", sort=False).agg(
        fmin=("min_val", "min"),
        fmax=("max_val", "max"),
        n_statless=("min_val", lambda s: int(s.isna().sum())),
    )
    return g


def matching_paths(
    vis, column: str, lo: float, hi: float
) -> list[str]:
    """Pandas twin of ``manifest_pruned_scan``'s matching-path list: a
    file matches when it has any stats-less row group for ``column`` or
    its [fmin, fmax] overlaps [lo, hi]. (NaN comparisons are False,
    exactly like SQL NULL semantics here — an all-NULL file is caught
    by n_statless.)"""
    g = per_file_stats(vis, column)
    m = g[(g["n_statless"] > 0) | ((g["fmax"] >= lo) & (g["fmin"] <= hi))]
    return sorted(m.index)


def surviving_paths_multi(vis, predicates) -> list[str]:
    """Pandas twin of ``manifest_pruned_scan_multi``: elimination, not
    selection — a file is dropped for column c only if it HAS stats for
    c and every row-group range misses [lo, hi]."""
    survivors = set(vis["path"].unique())
    for column, (lo, hi) in predicates.items():
        g = per_file_stats(vis, column)
        eliminated = g[
            (g["n_statless"] == 0)
            & ((g["fmax"] < lo) | (g["fmin"] > hi))
        ]
        survivors -= set(eliminated.index)
    return sorted(survivors)


def surviving_paths_multi_rowgroup(vis, predicates) -> list[str]:
    """Pandas twin of ``manifest_pruned_scan_multi_rowgroup``: the
    conjunction evaluated per (file, row group) — a file survives only
    if SOME single row group can satisfy EVERY predicate at once; row
    groups missing stats for a column pass that column; files with no
    stats rows at all survive outright."""
    import pandas as pd

    survivors = set(vis["path"].unique())
    cols = list(predicates)
    sub = vis[vis["column_name"].isin(cols)]
    if sub.empty:
        return sorted(survivors)
    ok = pd.Series(True, index=sub.index)
    for column, (lo, hi) in predicates.items():
        is_col = sub["column_name"] == column
        # SQL 3VL twin of coalesce((max>=lo)&(min<=hi), TRUE): the row
        # group fails this predicate iff either comparison is
        # definitively False — a NULL side conservatively passes
        miss = is_col & (
            (sub["max_val"].notna() & (sub["max_val"] < lo))
            | (sub["min_val"].notna() & (sub["min_val"] > hi))
        )
        ok &= ~miss
    # per (path, row_group): the group satisfies every predicate when
    # none of its per-column rows missed
    rg_ok = ok.groupby(
        [sub["path"], sub["row_group"]], sort=False
    ).all()
    per_path_any = rg_ok.groupby(level=0, sort=False).any()
    eliminated = set(per_path_any[~per_path_any].index)
    # a file absent from sub entirely has no stats rows for any
    # predicate column and survives (it is in survivors already)
    return sorted(survivors - eliminated)


def row_count(man, as_of: int | None) -> int:
    """Pandas twin of ``manifest_row_count``."""
    vis = visible(man, as_of)
    if vis.empty:
        return 0
    n = (
        vis.groupby(["path", "row_group"], sort=False)["n_rows"]
        .max()
        .sum()
    )
    import pandas as pd

    return int(n) if pd.notna(n) else 0


def snapshot_for_timestamp(man, manifest_dir: str, ts: float) -> int:
    """Pandas twin of ``manifest.snapshot_for_timestamp`` — identical
    values and identical error text."""
    rows = man[man["op"] == "commit_ts"][["snapshot_id", "min_val"]]
    if rows.empty:
        raise ValueError(
            f"no commit timestamps recorded at {manifest_dir} — the table "
            "predates timestamp stamping; pin by snapshot id instead"
        )
    eligible = rows.loc[rows["min_val"] <= float(ts), "snapshot_id"]
    if eligible.empty:
        raise ValueError(
            f"timestamp {ts} precedes the earliest recorded commit at "
            f"{manifest_dir} (earliest surviving commit_ts: "
            f"{rows['min_val'].min()}) — the history may have been "
            "expired"
        )
    return int(eligible.max())


def live_delete_records(man, column: str, as_of: int | None):
    """Pandas twin of ``deletes._live_delete_records``: the delete_eq
    ROWS still in force at ``as_of`` (above the last delete_retire
    ceiling), as a frame — consumers take counts / key sets off it."""
    if as_of is not None:
        man = man[man["snapshot_id"] <= as_of]
    scoped = man[man["column_name"] == column]
    retire = scoped.loc[scoped["op"] == "delete_retire", "min_val"]
    ceiling = None if retire.empty or retire.isna().all() else retire.max()
    dels = scoped[scoped["op"] == "delete_eq"]
    if ceiling is not None:
        dels = dels[dels["snapshot_id"] > int(ceiling)]
    return dels


def live_delete_keys(man, column: str, as_of: int | None) -> list[float]:
    """The DISTINCT delete-key doubles still in force at ``as_of``."""
    keys = live_delete_records(man, column, as_of)["min_val"].dropna().unique()
    return sorted(float(k) for k in keys)


def candidate_paths_for_keys(vis, column: str, keys) -> list[str]:
    """Files whose ``column`` stats range can contain ANY of ``keys``
    (stats-less files conservatively included) — the pure-Python twin
    of the delete/merge candidacy broadcast join, valid when the key
    set is already driver-resident (delete records are metadata-scale
    by contract)."""
    import bisect

    ks = sorted(float(k) for k in keys)
    out = []
    for path, row in per_file_stats(vis, column).iterrows():
        if row["n_statless"] > 0:
            out.append(path)
            continue
        i = bisect.bisect_left(ks, float(row["fmin"]))
        if i < len(ks) and ks[i] <= float(row["fmax"]):
            out.append(path)
    return sorted(out)


def concat_rows(frames):
    """Union metadata frames by column name (missing columns NULL) —
    the pandas twin of ``unionByName(allowMissingColumns=True)``.
    Frames go through object dtype so all-NA columns never trigger
    pandas' concat dtype inference (the arrow cast in
    :func:`write_rows` restores the real types)."""
    import pandas as pd

    return pd.concat(
        [f.astype(object) for f in frames], ignore_index=True, sort=False
    )


# --------------------------------------------------------------------
# write side
# --------------------------------------------------------------------

def _existing_schema(manifest_dir: str):
    """The arrow schema of one live manifest file (None when the
    manifest is empty/absent) — new rows are cast to EXACTLY the schema
    already on disk so an append can never fork it."""
    import pyarrow.parquet as pq

    d = _mdd(manifest_dir)
    try:
        names = sorted(
            n
            for n in os.listdir(d)
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
    except OSError:
        return None
    for n in names:
        try:
            return pq.read_schema(os.path.join(d, n)).remove_metadata()
        except Exception:
            continue
    return None


def write_rows(manifest_dir: str, pdf, overwrite: bool = False) -> bool:
    """Land metadata rows as ONE parquet file in the manifest dir —
    the driver-side twin of ``frame.write.mode("append").parquet``.
    ``pdf`` is a pandas frame whose columns are a subset of the
    manifest schema (missing columns NULL-filled, exactly like
    ``unionByName(allowMissingColumns=True)``). Returns False on any
    failure; the caller must then run the Spark path."""
    try:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = None if overwrite else _existing_schema(manifest_dir)
        if schema is None:
            schema = _arrow_manifest_schema()
        cols = {}
        for field in schema:
            name = field.name
            if name in pdf.columns:
                cols[name] = pdf[name]
            else:
                cols[name] = pd.Series([None] * len(pdf), dtype="object")
        aligned = pd.DataFrame(cols)
        tbl = pa.Table.from_pandas(
            aligned, schema=schema, preserve_index=False
        )
        d = _mdd(manifest_dir)
        if overwrite:
            import shutil

            # mirror Spark's overwrite: replace the directory contents
            shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        name = f"local-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(d, f".{name}.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(d, name))
        return True
    except Exception:
        return False


def clone_manifest_local(src_manifest: str, dst_manifest: str) -> bool:
    """Driver-side twin of ``clone_manifest``'s metadata copy: read the
    source manifest (through the generation resolver) with pyarrow and
    land it as one parquet file at the clone root. False → Spark
    fallback."""
    try:
        import shutil

        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        tbl = pads.dataset(_mdd(src_manifest), format="parquet").to_table()
        shutil.rmtree(dst_manifest, ignore_errors=True)
        os.makedirs(dst_manifest, exist_ok=True)
        name = f"local-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(dst_manifest, f".{name}.tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(dst_manifest, name))
        return True
    except Exception:
        return False


def partition_values_py(path: str, partition_by) -> dict | None:
    """Python twin of ``manifest._partition_values_col`` for ONE path:
    each requested partition column's value parsed from the row's
    Hive-style ``col=value/`` path segment, percent-DECODED with the
    same '+'-preserving, invalid-escape-falls-back-raw semantics as
    the Spark expression. None when the table is unpartitioned; empty
    entries (no segment) are omitted."""
    if not partition_by:
        return None
    out = {}
    for pcol in partition_by:
        m = re.search(rf"(?:^|/){re.escape(pcol)}=([^/]+)/", path)
        seg = m.group(1) if m else ""
        if seg == "":
            continue
        pre = seg.replace("+", "%2B")
        if re.search(r"%(?![0-9A-Fa-f]{2})", pre):
            decoded = seg  # invalid escape: keep the raw form
        else:
            decoded = urllib.parse.unquote(pre)
        if decoded != "":
            out[pcol] = decoded
    return out


def footer_stats_rows(
    paths,
    columns,
    snapshot_id: int,
    partition_by=(),
):
    """Driver-side twin of ``footers.read_footer_stats_multi`` plus the
    snapshot/op/partition_values stamping of ``_stats_add_rows`` — one
    pyarrow footer read per file, identical row values (min/max as
    float, non-numeric stats as NULL). Returns a pandas frame, or None
    on any failure. Callers size-gate: this is for commit-scale file
    lists (a daily delta's handful), never a bulk build."""
    try:
        import pandas as pd
        import pyarrow.parquet as pq

        def _num(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return None

        cols = tuple(columns)
        rows = []
        for p in sorted(paths):
            md = pq.ParquetFile(p).metadata
            names = md.schema.names
            idx = {c: names.index(c) for c in cols}
            pv = partition_values_py(p, tuple(partition_by))
            for rg in range(md.num_row_groups):
                for c in cols:
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
                            int(snapshot_id),
                            "add",
                            pv,
                        )
                    )
        return pd.DataFrame(rows, columns=list(_COLS))
    except Exception:
        return None


def parquet_num_rows(path: str) -> int | None:
    """Footer-only row count of one parquet file (None on failure)."""
    try:
        import pyarrow.parquet as pq

        return int(pq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None
