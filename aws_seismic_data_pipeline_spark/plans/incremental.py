"""Incremental materialized-view maintenance.

The reference recomputes nothing — every day's cron run re-fetches and
re-uploads whole chunks (``/root/reference/app.py:674-679``). The
engine answer for aggregates a dashboard reads constantly: keep the
aggregate STATE, and on each batch fold in only the delta. Sums and
counts are commutative monoids, so ``state ⊕ agg(delta)`` equals a full
recompute — which is exactly what the registered query's oracle checks
(the oracle aggregates the whole table directly; the Spark side takes
the incremental path).

Scale shape: the delta aggregate is map-side combinable over only the
new partition's rows; the fold is a full-outer join on the (small)
group-key space — state size is |groups|, independent of history
length. AVG-like measures must be maintained as (sum, count) pairs and
derived at read time; MIN/MAX are monoid too, but DELETES would need
retraction trees — out of scope, as in every incremental-view engine's
v1."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register

#: the view's group-by measures, maintained as monoid state
_CUTOFF = "1996-01-01"


def fold_delta(state: DataFrame, delta_agg: DataFrame, key: str) -> DataFrame:
    """``state ⊕ delta`` for count/sum monoid measures: full-outer join
    on the group key, null-safe addition per measure. Columns other than
    ``key`` must be identically named numeric measures on both sides."""
    measures = [c for c in state.columns if c != key]
    s = state.alias("s")
    d = delta_agg.alias("d")
    sk, dk = F.col(f"s.{key}"), F.col(f"d.{key}")
    return s.join(d, sk == dk, "full_outer").select(
        F.coalesce(sk, dk).alias(key),
        *[
            (
                F.coalesce(F.col(f"s.{m}"), F.lit(0))
                + F.coalesce(F.col(f"d.{m}"), F.lit(0))
            ).alias(m)
            for m in measures
        ],
    )


def _agg(orders: DataFrame) -> DataFrame:
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_price"),
    )


@register(
    "plan_incremental_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price,
               ROUND(SUM(o_totalprice), 2) / COUNT(*) AS avg_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("plan", "agg"),
)
def plan_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a per-priority revenue view incrementally: state is the
    aggregate over history (< {_CUTOFF}), the delta batch is everything
    after, and the result is ``state ⊕ agg(delta)``. The ORACLE
    aggregates the full table directly — passing means the incremental
    fold is indistinguishable from a recompute, the defining property
    of correct view maintenance. AVG is derived sum/count at read time
    (averages don't merge; their parts do)."""
    orders = load_table(spark, sf_dir, "orders")
    state = _agg(orders.filter(F.col("o_orderdate") < _CUTOFF))
    delta = _agg(orders.filter(F.col("o_orderdate") >= _CUTOFF))
    merged = fold_delta(state, delta, "o_orderpriority")
    # ROUND at the data's 2dp scale on BOTH sides: the incremental fold
    # sums doubles in a different order than the oracle's single pass,
    # so the raw sums differ in the last ulp; a 2dp total is a decimal
    # multiple of 0.01, so the rounding is halfway-hazard-free (repo
    # round-parity policy). avg divides the ROUNDED total by an exact
    # count -> bit-identical quotients.
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.round("total_price", 2).alias("total_price"),
        (F.round("total_price", 2) / F.col("n_orders")).alias("avg_price"),
    )
