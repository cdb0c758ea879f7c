"""Regression pins for the local correctness harness's comparator.

Round 3 shipped two driver hash failures that the old
``to_numeric``+``allclose`` comparator in scripts/minidriver.py called
"pass" locally:

1. ``plan_scd2_dimension`` — DuckDB SUM(int) → HUGEINT → fetchdf
   float64 ``1.0`` vs Spark bigint ``1``. allclose(1, 1.0) == True, so
   the dtype mismatch was invisible; the driver hashes exact values and
   failed all 8,016 rows.
2. ``udaf_pandas_agg_window`` — ROUND(mean, 4) where the two engines'
   means differ by ~1e-10 before rounding: 176/15,000 rows flipped the
   4th decimal (diff exactly 1e-4). At o_totalprice magnitudes (~1e5),
   rtol=1e-9 gives tolerance ~1e-4, so allclose passed.

These tests assert the rewritten exact comparator catches BOTH classes,
plus the canonicalizations that must NOT be flagged (Decimal/float,
date/datetime-midnight, NaN/None).
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import os

import numpy as np
import pandas as pd
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "minidriver",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "minidriver.py"),
)
md = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(md)


def test_int64_vs_float64_mismatch_detected():
    """The r3 scd2 class: hugeint-rendered-as-float oracle column vs
    Spark bigint. Numerically equal, hash-distinct — must fail."""
    spark_side = pd.DataFrame({"version": pd.array([1, 2, 3], dtype="int64")})
    oracle_side = pd.DataFrame({"version": pd.array([1.0, 2.0, 3.0], dtype="float64")})
    a, b = md.canon(spark_side), md.canon(oracle_side)
    assert not md.values_equal(a, b)
    # and the old comparator's blindness is documented: allclose passes
    assert np.allclose([1, 2, 3], [1.0, 2.0, 3.0])


def test_small_float_diff_at_large_magnitude_detected():
    """The r3 udaf class: 1e-4 diff at ~1e5 magnitude passes
    rtol=1e-9 allclose but fails an exact hash."""
    x = [112946.2625, 473274.17]
    y = [112946.2626, 473274.17]
    a = md.canon(pd.DataFrame({"p": x}))
    b = md.canon(pd.DataFrame({"p": y}))
    assert not md.values_equal(a, b)
    assert np.allclose(x, y, rtol=1e-9, atol=1e-9)  # old comparator was blind


def test_identical_frames_pass_regardless_of_row_order():
    a = pd.DataFrame({"k": [2, 1, 3], "v": [0.5, np.nan, 1.25]})
    b = pd.DataFrame({"k": [1, 3, 2], "v": [np.nan, 1.25, 0.5]})
    assert md.values_equal(md.canon(a), md.canon(b))


def test_bitexact_floats_pass():
    vals = [0.1 + 0.2, 1e300, -0.0, 5.551115123125783e-17]
    a = md.canon(pd.DataFrame({"v": vals}))
    b = md.canon(pd.DataFrame({"v": list(vals)}))
    assert md.values_equal(a, b)


def test_decimal_vs_float_same_value_passes():
    """DuckDB DECIMAL cells arrive as decimal.Decimal objects; Spark
    doubles as float64. Same value must canonicalize identically."""
    a = md.canon(pd.DataFrame({"v": [decimal.Decimal("1.10"), decimal.Decimal("2.5")]}))
    b = md.canon(pd.DataFrame({"v": [1.1, 2.5]}))
    assert md.values_equal(a, b)


def test_date_vs_datetime_midnight_passes():
    """Spark DateType → datetime.date; DuckDB DATE via fetchdf →
    datetime64[ns] at midnight. Same day must match."""
    a = md.canon(pd.DataFrame({"d": [datetime.date(2024, 3, 1)]}))
    b = md.canon(pd.DataFrame({"d": pd.to_datetime(["2024-03-01"])}))
    assert md.values_equal(a, b)


def test_null_handling_object_and_float():
    a = md.canon(pd.DataFrame({"s": ["x", None], "v": [1.0, np.nan]}))
    b = md.canon(pd.DataFrame({"s": ["x", None], "v": [1.0, np.nan]}))
    assert md.values_equal(a, b)
    c = md.canon(pd.DataFrame({"s": ["x", "None"], "v": [1.0, np.nan]}))
    assert not md.values_equal(a, c)


def test_conftest_cells_equal_is_exact():
    """The pytest parity comparator shares the exactness requirement."""
    from .conftest import _cells_equal

    assert not _cells_equal(112946.2625, 112946.2626)
    assert _cells_equal(0.1 + 0.2, 0.1 + 0.2)
    assert _cells_equal(float("nan"), float("nan"))
    assert not _cells_equal(1.0, None)


@pytest.mark.parametrize(
    "spark_val,oracle_val",
    [
        (np.int64(7), np.float64(7.0)),
        (np.float64(1.00005), np.float64(1.0001)),
    ],
)
def test_fmt_scalar_distinguishes(spark_val, oracle_val):
    assert md._fmt_scalar(spark_val) != md._fmt_scalar(oracle_val)
