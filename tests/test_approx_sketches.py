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


def test_golden_percentile_literals_are_group_members(spark):
    """The driver oracle pins percentile_approx outputs as exact golden
    literals at sf0.01 — valid because GK at accuracy=10000 returns an
    actual sample value and the merge is partition-layout-independent
    at that size, but a Spark version bump could still legally flip
    WHICH sample value comes back. This is the tolerance fallback: the
    literals must be MEMBERS of the group's o_totalprice value set and
    within the error band of the exact percentile. If the exact-literal
    parity check ever goes red while THIS test stays green, the fix is
    to re-pin the oracle literals in operators/aggregates.py from the
    current build's output — not to debug the operator."""
    import duckdb

    from aws_seismic_data_pipeline_spark.catalog import GOLDEN_SF_DIR

    spec = REGISTRY["agg_approx_sketches"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{GOLDEN_SF_DIR}/orders.parquet')"
    )
    golden = con.execute(spec.oracle).fetchall()
    assert len(golden) == 5
    for prio, _cust, p50, p95, n_orders in golden:
        members, lo_p, hi_p, n = con.execute(
            "SELECT COUNT(*) FILTER (WHERE o_totalprice IN (?, ?)),"
            "       quantile_cont(o_totalprice, 0.45),"
            "       quantile_cont(o_totalprice, 0.55), COUNT(*)"
            " FROM orders WHERE o_orderpriority = ?",
            [round(p50, 2), round(p95, 2), prio],
        ).fetchone()
        assert n == n_orders, (prio, n, n_orders)
        # both pinned percentiles are real sample values of the group
        assert members >= 2, (prio, p50, p95)
        # and the p50 literal sits inside a generous quantile band
        assert lo_p <= p50 <= hi_p, (prio, p50, lo_p, hi_p)
    con.close()


def test_sample_estimate_tracks_exact_totals(spark):
    """The 5% deterministic sample's scaled estimates must land within
    a loose relative band of the exact per-flag totals (md5 buckets are
    uniform, so 5% of a few thousand rows estimates within ~25%), and
    n_estimated must be exactly 20x the sampled count."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.registry import load_all

    from .conftest import SF_DIR

    est = {
        r.l_returnflag: r
        for r in load_all()["agg_approx_sample_estimate"]
        .builder(spark, SF_DIR)
        .collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev"
            ),
        )
        .collect()
    }
    assert est
    for flag, r in est.items():
        assert r.n_estimated == r.n_sampled * 20
        rel = abs(r.n_estimated - exact[flag].n) / exact[flag].n
        assert rel < 0.35, (flag, r.n_estimated, exact[flag].n)
        rel_rev = abs(r.revenue_estimated - exact[flag].rev) / exact[flag].rev
        assert rel_rev < 0.35, (flag, r.revenue_estimated, exact[flag].rev)


def test_countmin_layout_invariant_and_never_undercounts(spark):
    """The two sketch contracts: identical bytes under any partitioning
    (merges commute), and estimates bounded below by truth and above
    by truth + eps*N."""
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import load_table
    from aws_seismic_data_pipeline_spark.operators.aggregates import (
        _CMS_CONF,
        _CMS_EPS,
        _CMS_SEED,
    )

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    agg = F.count_min_sketch(
        "user_id", F.lit(_CMS_EPS), F.lit(_CMS_CONF), F.lit(_CMS_SEED)
    ).alias("cms")
    blobs = [
        bytes(ev.repartition(n).agg(agg).collect()[0].cms) for n in (2, 7, 32)
    ]
    assert blobs[0] == blobs[1] == blobs[2]

    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(blobs[0])
    )
    n_total = ev.count()
    true = {
        r.user_id: r.c
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for k, t in sorted(true.items())[:50]:
        est = cms.estimateCount(int(k))
        assert t <= est <= t + _CMS_EPS * n_total + 1, (k, t, est)


def test_kmv_estimate_error_band(spark):
    """KMV's (K-1)/u_K estimator must land within the ~1/sqrt(K)
    relative-error band on every priority group (generous 4-sigma cap),
    and groups smaller than K must report their EXACT count."""
    from aws_seismic_data_pipeline_spark.operators.aggregates import KMV_K
    from aws_seismic_data_pipeline_spark.registry import REGISTRY

    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = REGISTRY["agg_kmv_distinct"].builder(spark, sf).collect()
    assert rows
    band = 4.0 / (KMV_K ** 0.5)
    for r in rows:
        if r.n_exact < KMV_K:
            assert r.kmv_estimate == float(r.n_exact), r
        else:
            rel = abs(r.kmv_estimate - r.n_exact) / r.n_exact
            assert rel < band, (r, rel, band)


def test_kmv_merge_equals_direct_global_sketch(spark):
    """Mergeability, the property that makes KMV a sketch: the union of
    per-group sketches re-trimmed to K must be IDENTICAL (same hash
    set, so same estimate bit-for-bit) to the sketch built directly on
    the global distinct key set."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import load_table
    from aws_seismic_data_pipeline_spark.operators.aggregates import KMV_K
    from aws_seismic_data_pipeline_spark.registry import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    merged = REGISTRY["agg_kmv_merge"].builder(spark, sf).collect()[0]

    orders = load_table(spark, sf, "orders")
    direct = (
        orders.select("o_custkey")
        .distinct()
        .withColumn(
            "u",
            F.expr(
                "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15),"
                " 16, 10) as bigint)"
            )
            / F.lit(1152921504606846976.0),
        )
        .withColumn("rn", F.row_number().over(Window.orderBy("u", "o_custkey")))
        .filter(F.col("rn") <= KMV_K)
        .agg((F.lit(KMV_K - 1.0) / F.max("u")).alias("est"))
        .collect()[0]
    )
    assert merged.kmv_estimate_merged == direct.est
    assert merged.sketch_size == min(KMV_K, merged.n_exact_global)


def test_kmv_jaccard_estimate_tracks_exact(spark):
    """The merged-sketch Jaccard must land within the sketch's
    resolution of the exact value: |J_est - J_exact| <= 4/sqrt(K)
    (generous), and the intersection estimate within the induced band
    of the exact intersection."""
    import os

    from aws_seismic_data_pipeline_spark.operators.aggregates import KMV_K
    from aws_seismic_data_pipeline_spark.registry import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    r = REGISTRY["agg_kmv_jaccard"].builder(spark, sf).collect()[0]
    j_exact = r.n_intersection_exact / r.n_union_exact
    band = 4.0 / (KMV_K ** 0.5)
    assert abs(r.jaccard_est - j_exact) <= band, (r.jaccard_est, j_exact)
    if r.n_intersection_exact:
        rel = abs(r.intersection_est - r.n_intersection_exact) / r.n_intersection_exact
        # jaccard and union errors compound: allow the doubled band
        assert rel <= 2 * band + 4.0 / (KMV_K ** 0.5), (r, rel)
