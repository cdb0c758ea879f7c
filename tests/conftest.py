from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_seismic_data_pipeline_spark.catalog import TABLES
from aws_seismic_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _sort_key(row):
    out = []
    for v in row:
        if v is None:
            out.append((0, ""))
        elif isinstance(v, bool):
            out.append((1, str(v)))
        elif isinstance(v, float):
            out.append((2, f"{round(v, 6):.6f}"))
        elif isinstance(v, (int,)):
            out.append((2, f"{v:.6f}" if abs(v) < 10**15 else str(v)))
        elif isinstance(v, tuple):
            out.append((3, str(v)))
        else:
            out.append((4, str(v)))
    return tuple(out)


def _cells_equal(a, b) -> bool:
    """EXACT equality — the driver hashes exact values, so a float that
    differs in its last bit between Spark and DuckDB is a driver FAIL and
    must fail here too (r3 shipped two latent hash failures behind the
    old 1e-9 tolerance)."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return fa == fb
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def assert_frames_match(spark_df, duck_rel, name: str):
    """Order-insensitive comparison mirroring the driver's check:
    row count + column names + value equality (float tol 1e-9)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(_norm_cell(v) for v in row) for row in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = [tuple(_norm_cell(v) for v in row) for row in duck_rel.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    # align column order by sorted name (driver sorts columns by name)
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    d_idx = [d_cols.index(c) for c in sorted(d_cols)]
    s_rows = sorted((tuple(r[i] for i in s_idx) for r in s_rows), key=_sort_key)
    d_rows = sorted((tuple(r[i] for i in d_idx) for r in d_rows), key=_sort_key)
    bad = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not _cells_equal(sr, dr):
            bad.append((i, sr, dr))
            if len(bad) >= 5:
                break
    assert not bad, f"{name}: value mismatches (first 5): {bad}"
