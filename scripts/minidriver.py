"""Mini-driver: replicate the driver's correctness check locally.

Runs every registered query's Spark plan and DuckDB oracle at sf0.01,
compares row counts, schemas, and EXACT canonical values — the driver
hashes exact values (int64 ``1`` != float64 ``1.0``; floats compared
bit-for-bit), so this harness must too. Round 3 shipped two driver hash
failures that the old ``to_numeric``+``allclose`` comparator called
"pass" locally; tests/test_minidriver_exact.py regression-pins both.

Usage:

    python scripts/minidriver.py [name ...]   # default: all queries
"""

from __future__ import annotations

import datetime
import decimal
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as mod

from aws_seismic_data_pipeline_spark.catalog import GOLDEN_SF_DIR

SF = GOLDEN_SF_DIR  # golden-sf0.01 oracles embed paths/values from this dir
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

NULL = "\x00null"


def _fmt_scalar(v: object) -> str:
    """One value → its exact canonical string. Dtype distinctions the
    driver's hasher sees must survive: ints never gain '.0', floats are
    repr()'d (shortest round-trip — bit-exact), timestamps at fixed
    precision, Decimals normalized so 1.10 == 1.1."""
    if v is None:
        return NULL
    if isinstance(v, (float, np.floating)):
        return NULL if np.isnan(v) else repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return NULL if pd.isna(v) else v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if v is pd.NaT:
        return NULL
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-columns, sorted-rows frame of exact canonical strings."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            vals = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            out[c] = vals.where(s.notna(), NULL)
        elif pd.api.types.is_bool_dtype(s) and not pd.api.types.is_object_dtype(s):
            out[c] = s.map(lambda v: str(bool(v)))
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.map(lambda v: str(int(v)))
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: NULL if np.isnan(v) else repr(float(v)))
        else:
            out[c] = s.map(_fmt_scalar)
    res = pd.DataFrame(out, index=df.index)
    if len(res):
        res = res.sort_values(list(res.columns), kind="mergesort").reset_index(
            drop=True
        )
    return res


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    """Exact equality of canonical frames (the driver hashes; we diff)."""
    return list(a.columns) == list(b.columns) and len(a) == len(b) and a.equals(b)


def first_diff(a: pd.DataFrame, b: pd.DataFrame, n: int = 3) -> str:
    """Human-readable sample of the first differing cells."""
    diffs = []
    for c in a.columns:
        neq = a[c].to_numpy() != b[c].to_numpy()
        if neq.any():
            idx = np.flatnonzero(neq)[:n]
            for i in idx:
                diffs.append(f"{c}[{i}]: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
            if len(diffs) >= n:
                break
    return "; ".join(diffs[:n])


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, osql = mod.queries(), mod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
            oracle = osql.get(name)
            if oracle is None:
                status = f"rows-only ({len(sdf)} rows)"
                n_rows_only += 1
            else:
                odf = con.execute(oracle).fetchdf()
                a, b = canon(sdf), canon(odf)
                if len(a) != len(b):
                    status = f"ROWS MISMATCH spark={len(a)} oracle={len(b)}"
                    n_fail += 1
                    failures.append(name)
                elif list(a.columns) != list(b.columns):
                    status = f"SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}"
                    n_fail += 1
                    failures.append(name)
                elif not values_equal(a, b):
                    status = f"VALUE MISMATCH  {first_diff(a, b)}"
                    n_fail += 1
                    failures.append(name)
                else:
                    status = f"pass ({len(a)} rows)"
                    n_pass += 1
            # Driver-hasher hazard: array/map/struct outputs crash it.
            bad = [
                f.name
                for f in qs[name](spark, SF).schema.fields
                if f.dataType.typeName() in ("array", "map", "struct")
            ]
            if bad:
                status += f"  !! NESTED OUTPUT COLS {bad}"
                if name not in failures:
                    failures.append(name)
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {str(exc)[:200]}"
            n_fail += 1
            failures.append(name)
        print(f"{name:40s} {status}  [{time.time() - t0:.1f}s]", flush=True)

    print(
        f"\n=== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail "
        f"of {len(names)} ===",
        flush=True,
    )
    if failures:
        print("FAILURES:", " ".join(failures))
        sys.exit(1)


if __name__ == "__main__":
    main()
