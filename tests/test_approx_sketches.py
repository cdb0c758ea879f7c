"""agg_approx_sketches' registered surface emits band VERDICTS (the
raw sketch estimates are Spark-version-dependent, so the cross-engine
oracle checks booleans + exact twins instead of golden literals — r9).
The raw estimates still carry published error guarantees; pin those
bands directly on the internal estimate frame so the sketch path can't
silently return garbage while "executing fine":

- HLL++ distinct counts: requested rsd=0.02; assert within 5x of it
  (generous — the guarantee is probabilistic) of exact COUNT(DISTINCT).
- GK percentiles: percentile_approx with accuracy=10000 on groups of
  this size is near-exact; assert the estimate lands inside the
  group's [min, max] and within 5% relative of the exact percentile.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def test_sketch_estimates_within_error_bands(spark):
    from aws_seismic_data_pipeline_spark.operators.aggregates import (
        approx_sketch_estimates,
    )

    approx = {
        r.o_orderpriority: r
        for r in approx_sketch_estimates(spark, SF_DIR).collect()
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
        )
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for prio, a in approx.items():
        e = exact[prio]
        assert a.exact_customers == e.n_customers  # exact twin stays exact
        rel = abs(a.approx_customers - e.n_customers) / e.n_customers
        assert rel <= 5 * 0.02, (prio, a.approx_customers, e.n_customers)
        for est, true in ((a.p50, e.p50), (a.p95, e.p95)):
            assert e.lo <= est <= e.hi, (prio, est)
            assert abs(est - true) <= 0.05 * abs(true), (prio, est, true)


def test_sketch_verdict_surface_is_all_green_and_exact(spark):
    """The registered surface (the one the driver hashes) must report
    every band verdict TRUE and its exact columns equal to their exact
    twins — at ANY SF, which is the point of replacing the golden
    VALUES literals: the oracle is now version- and SF-robust. If a
    verdict boolean ever goes false here (or in the driver hash), a
    sketch broke its published error contract — debug the operator,
    don't re-pin literals."""
    rows = REGISTRY["agg_approx_sketches"].builder(spark, SF_DIR).collect()
    assert len(rows) == 5
    orders = load_table(spark, SF_DIR, "orders")
    exact = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    for r in rows:
        e = exact[r.o_orderpriority]
        assert r.exact_customers == e.n_customers
        assert r.n_orders == e.n_orders
        assert r.hll_in_band and r.p50_in_band and r.p95_in_band, r
        assert r.p50_is_member and r.p95_is_member, r


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
