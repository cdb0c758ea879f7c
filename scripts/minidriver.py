"""Mini-driver: replicate the driver's correctness check locally.

Runs every registered query's Spark plan and DuckDB oracle at sf0.01,
compares row counts, sorted-column value frames, and reports per-query
status. Usage:

    python scripts/minidriver.py [name ...]   # default: all queries
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as mod

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
            else:
                df[c] = df[c].map(lambda v: "\x00null" if v is None else str(v))
        if df[c].dtype == object:
            df[c] = df[c].fillna("\x00null")
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        try:
            xv = pd.to_numeric(x, errors="raise")
            yv = pd.to_numeric(y, errors="raise")
            if not np.allclose(
                xv.astype(float), yv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ):
                return False
        except (ValueError, TypeError):
            if not (x.astype(str) == y.astype(str)).all():
                return False
    return True


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
                    status = "VALUE MISMATCH"
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
