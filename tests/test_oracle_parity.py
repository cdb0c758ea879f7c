"""Local replica of the driver's correctness gate: every registry query
runs on Spark and (when an oracle exists) is compared against DuckDB on
the same parquet fixtures — row count + columns + order-insensitive
values. Rows-only queries are smoke-checked: they run, return a stable
schema, and ≥0 rows.
"""

from __future__ import annotations

import pytest

from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR, assert_frames_match

REGISTRY = load_all()
# "golden-sf0.01" oracles pin values computed at the driver's sf0.01
# (HLL estimates, a literal file path) — at any other test SF they can
# only be smoke-run, not value-compared.
_SF_IS_001 = SF_DIR.rstrip("/").endswith("sf0.01")
ORACLE_CHECKED = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle and ("golden-sf0.01" not in s.tags or _SF_IS_001)
)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if n not in ORACLE_CHECKED)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.builder(spark, SF_DIR)
    rel = duck.sql(spec.oracle)
    assert_frames_match(sdf, rel, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    names = set(entry_mod.queries())
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= names
