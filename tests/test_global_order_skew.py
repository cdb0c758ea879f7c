"""Adversarial-scale property tests for the distributed global-order
primitives (operators/window_ops.py: distributed_rank /
distributed_ntile / distributed_ntile_multi / distributed_running_sum).

VERDICT r10 item 3: RFM, Pareto, median, and the rank/NTILE witnesses
all stand on ``_pinned_layout``; its behavior under (a) heavy order-key
skew (one value = 50% of rows — the range partitioner collapses ties
into few partitions), (b) empty partitions at high ``num_partitions``,
and (c) n < k tiles was the remaining untested cliff. Seed: the
reference's group-by-IP fan-out (``/root/reference/app.py:391-397``),
where one hot station dominates a group.

Reference semantics are computed in pandas under the IDENTICAL total
order, which is exactly the cross-engine NTILE/rank contract the
registered queries rely on (unique tiebreak column => bit-identical
assignment in any engine).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.operators.window_ops import (
    _check_mid_capacity,
    distributed_ntile,
    distributed_ntile_multi,
    distributed_rank,
    distributed_running_sum,
)


def _sql_ntile(n: int, k: int, rank: np.ndarray) -> np.ndarray:
    """The exact SQL NTILE sizing rule: first n % k tiles get
    ceil(n/k) rows, the rest floor(n/k)."""
    q, rem = divmod(n, k)
    threshold = rem * (q + 1)
    big = (rank - 1) // (q + 1) + 1
    small = rem + (rank - threshold - 1) // max(q, 1) + 1
    return np.where(rank <= threshold, big, small)


def _skewed_frame(spark, n: int = 10_000, hot_frac: float = 0.5):
    """n rows where one order-key value owns hot_frac of them, plus a
    unique tiebreak id — the shape that collapses a naive range
    partitioner onto the hot value."""
    rng = np.random.default_rng(7)
    n_hot = int(n * hot_frac)
    v = np.concatenate(
        [np.zeros(n_hot, dtype=np.int64), rng.integers(1, 1000, n - n_hot)]
    )
    rng.shuffle(v)
    pdf = pd.DataFrame({"v": v, "uid": np.arange(n, dtype=np.int64)})
    return spark.createDataFrame(pdf), pdf


def test_rank_exact_under_heavy_skew(spark):
    df, pdf = _skewed_frame(spark, 10_000, 0.5)
    got = (
        distributed_rank(
            df, [F.col("v"), F.col("uid")], "r", num_partitions=16
        )
        .toPandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["v", "uid"]).reset_index(drop=True)
    ref["r"] = np.arange(1, len(ref) + 1)
    ref = ref.sort_values("uid").reset_index(drop=True)
    assert (got["r"].values == ref["r"].values).all()
    # ranks are a permutation of 1..n even though one key owns half
    assert sorted(got["r"]) == list(range(1, 10_001))


def test_ntile_multi_exact_under_skew_matches_sql_rule(spark):
    df, pdf = _skewed_frame(spark, 8_000, 0.5)
    k = 7
    got = (
        distributed_ntile_multi(
            df,
            [
                ([F.col("v"), F.col("uid")], k, "t_asc"),
                ([F.col("v").desc(), F.col("uid")], k, "t_desc"),
            ],
            num_partitions=16,
        )
        .toPandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    n = len(pdf)
    for order, col in ((["v", "uid"], "t_asc"),):
        ref = pdf.sort_values(order).reset_index(drop=True)
        ref["rank"] = np.arange(1, n + 1)
        ref[col] = _sql_ntile(n, k, ref["rank"].values)
        ref = ref.sort_values("uid").reset_index(drop=True)
        assert (got[col].values == ref[col].values).all()
    # desc spec: rank under (v DESC, uid ASC)
    ref = pdf.sort_values(["v", "uid"], ascending=[False, True]).reset_index(
        drop=True
    )
    ref["rank"] = np.arange(1, n + 1)
    ref["t_desc"] = _sql_ntile(n, k, ref["rank"].values)
    ref = ref.sort_values("uid").reset_index(drop=True)
    assert (got["t_desc"].values == ref["t_desc"].values).all()


def test_ntile_without_tiebreak_still_sizes_and_orders(spark):
    """No unique tiebreak: assignment within a tie group is engine-
    arbitrary, but the SQL contract still fixes (a) exact tile SIZES
    and (b) monotonicity of tile w.r.t. the order key. The hot value
    straddles tile boundaries here — the exact case where a collapsed
    tie partition could overflow or mis-size."""
    df, pdf = _skewed_frame(spark, 6_000, 0.5)
    k = 4
    got = distributed_ntile(
        df, [F.col("v")], k, "t", num_partitions=16
    ).toPandas()
    n = len(pdf)
    sizes = got.groupby("t").size().sort_index()
    q, rem = divmod(n, k)
    assert list(sizes.index) == list(range(1, k + 1))
    assert list(sizes.values) == [q + 1] * rem + [q] * (k - rem)
    per_v = got.groupby("v")["t"].agg(["min", "max"]).sort_index()
    # v1 < v2 => max tile(v1) <= min tile(v2): no inversion across keys
    assert (per_v["max"].values[:-1] <= per_v["min"].values[1:]).all()


def test_rank_with_mostly_empty_partitions(spark):
    """num_partitions far above the row count: most range partitions
    hold zero rows; offsets must still prefix-sum correctly."""
    pdf = pd.DataFrame({"v": [5, 3, 9, 1, 7, 3, 5, 2, 8, 0]})
    pdf["uid"] = np.arange(10)
    df = spark.createDataFrame(pdf)
    got = (
        distributed_rank(
            df, [F.col("v"), F.col("uid")], "r", num_partitions=64
        )
        .toPandas()
        .sort_values("r")
    )
    assert list(got["r"]) == list(range(1, 11))
    assert list(got["v"]) == sorted(pdf["v"])


def test_ntile_n_smaller_than_k(spark):
    """n < k: SQL NTILE gives tiles 1..n one row each, tiles n+1..k
    empty."""
    pdf = pd.DataFrame({"v": [30, 10, 20], "uid": [0, 1, 2]})
    df = spark.createDataFrame(pdf)
    got = (
        distributed_ntile(
            df, [F.col("v"), F.col("uid")], 7, "t", num_partitions=8
        )
        .toPandas()
        .sort_values("v")
    )
    assert list(got["t"]) == [1, 2, 3]


def test_running_sum_exact_under_skew(spark):
    df, pdf = _skewed_frame(spark, 5_000, 0.5)
    got = (
        distributed_running_sum(
            df,
            [F.col("v").desc(), F.col("uid")],
            "v",
            "run",
            num_partitions=16,
        )
        .toPandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["v", "uid"], ascending=[False, True]).reset_index(
        drop=True
    )
    ref["run"] = ref["v"].cumsum()
    ref = ref.sort_values("uid").reset_index(drop=True)
    assert (got["run"].values == ref["run"].values).all()


def test_mid_capacity_guard_trips_on_2_33_partition(spark):
    """A partition holding >= 2^33 rows would bleed into the partition
    bits of monotonically_increasing_id; the guard must fail loudly
    (raise with remediation) rather than corrupt ranks."""
    with pytest.raises(ValueError, match="2\\^33|per-partition offset"):
        _check_mid_capacity({0: 1 << 33, 1: 10})
    _check_mid_capacity({0: (1 << 33) - 1})  # just under: fine


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ntile_randomized_property_vs_pandas(spark, seed):
    """Randomized duplicates/sizes: distributed NTILE == pandas exact
    NTILE under the identical (v, uid) total order."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 2000))
    k = int(rng.integers(1, 12))
    p = int(rng.integers(2, 24))
    v = rng.integers(0, max(2, n // 10), n)
    pdf = pd.DataFrame({"v": v, "uid": np.arange(n)})
    df = spark.createDataFrame(pdf)
    got = (
        distributed_ntile(
            df, [F.col("v"), F.col("uid")], k, "t", num_partitions=p
        )
        .toPandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    ref = pdf.sort_values(["v", "uid"]).reset_index(drop=True)
    ref["rank"] = np.arange(1, n + 1)
    ref["t"] = _sql_ntile(n, k, ref["rank"].values)
    ref = ref.sort_values("uid").reset_index(drop=True)
    assert (got["t"].values == ref["t"].values).all(), (n, k, p)
