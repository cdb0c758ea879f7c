"""agg_approx_sketches is rows-only by design (t-digest merges are
partition-order-dependent, so no cross-engine hash can pin them), but
its estimates are still bound by published error guarantees. Pin those
bands against the exact twins so the sketch path can't silently return
garbage while "executing fine":

- HLL++ distinct counts: requested rsd=0.02; assert within 5x of it
  (generous — the guarantee is probabilistic) of exact COUNT(DISTINCT).
- t-digest percentiles: percentile_approx with accuracy=10000 on
  groups of this size is near-exact; assert the estimate lands inside
  the group's [min, max] and within 5% relative of the exact
  percentile.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def test_sketch_estimates_within_error_bands(spark):
    approx = {
        r.o_orderpriority: r
        for r in REGISTRY["agg_approx_sketches"].builder(spark, SF_DIR).collect()
    }
    orders = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for prio, a in approx.items():
        e = exact[prio]
        assert a.n_orders == e.n_orders  # the exact column stays exact
        rel = abs(a.approx_customers - e.n_customers) / e.n_customers
        assert rel <= 5 * 0.02, (prio, a.approx_customers, e.n_customers)
        for est, true in ((a.approx_price_p50, e.p50), (a.approx_price_p95, e.p95)):
            assert e.lo <= est <= e.hi, (prio, est)
            assert abs(est - true) <= 0.05 * abs(true), (prio, est, true)
