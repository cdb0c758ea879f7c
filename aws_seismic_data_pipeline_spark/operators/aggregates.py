"""Aggregation operators (SURVEY.md §2B).

Seed: the reference's group-by-IP regrouping (``/root/reference/
app.py:391-397``) is its only aggregation; the inventory generalizes to
hash aggregates, distinct counts, rollup/cube/grouping-sets and
per-group collection.

Scale posture: every ``groupBy().agg()`` below compiles to partial
(map-side) + final aggregation — the shuffle moves pre-aggregated
partials, not raw rows. Money sums are rounded to 2dp in both Spark and
the oracle so double summation order (which differs across partitionings)
cannot flip the comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "agg_groupby_hash",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg",),
)
def agg_groupby_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate (seed R11)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp_ntz(F.lit("1998-09-02"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "agg_count_distinct",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (seed: none — inventory extension).

    Exact COUNT(DISTINCT) expands to a two-phase aggregate; at 100 TB
    prefer ``approx_count_distinct`` (HLL, single pass) when ±2% is
    acceptable — exposed separately in bench, not oracle-checked since
    HLL estimates aren't cross-engine comparable."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               ROUND(SUM(c.c_acctbal), 2) AS total_acctbal,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        joined.select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "c_acctbal",
        )
        .rollup("region_name", "nation_name")
        .agg(
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@register(
    "agg_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations over two keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT c_mktsegment, c_nationkey,
               ROUND(SUM(c_acctbal), 2) AS total_bal,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
    tags=("agg",),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selected grouping combinations (SQL API — still Catalyst)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               ROUND(SUM(c_acctbal), 2) AS total_bal,
               COUNT(*) AS n_cust
        FROM customer_gs
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@register(
    "agg_percentile",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS median_qty,
               quantile_cont(l_quantity, 0.25) AS p25_qty,
               quantile_cont(l_quantity, 0.75) AS p75_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: linear interpolation on sorted values —
    quantities are small integers so the interpolation is exact).

    Scale note: exact percentile sorts per group; at 100 TB use
    ``approx_percentile`` (t-digest, one pass, mergeable) — not
    oracle-checked because sketch estimates aren't cross-engine
    comparable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.25)").alias("p25_qty"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_stats_moments",
    oracle="""
        SELECT l_returnflag,
               ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
               ROUND(var_samp(l_quantity), 4) AS var_qty,
               ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics per group: stddev/variance/correlation/
    covariance (inventory extension — data-quality profiling any
    training-data pipeline runs before ingest).

    All four are single-pass mergeable sketches in Spark (Welford-style
    partial states combined at the final agg) — the same shuffle shape
    as a plain sum, so 100 TB profiling costs one pass. Values are
    rounded at 4dp: the moments are irrational (no decimal halfway
    cases), and both engines' float noise (~1e-12 relative) is far
    below the rounding grid."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_min_max_by",
    oracle="""
        SELECT o_orderpriority,
               max_by(o_totalprice, o_orderkey) AS last_order_price,
               min_by(o_totalprice, o_orderkey) AS first_order_price,
               CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregation: value of one column at another
    column's extreme (inventory extension; DuckDB ``arg_max``/
    ``max_by``). The ordering column is the unique o_orderkey, so the
    arg row is deterministic — max_by over a column with ties is
    engine-dependent and must not be oracle-checked."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.max_by("o_totalprice", "o_orderkey").alias("last_order_price"),
        F.min_by("o_totalprice", "o_orderkey").alias("first_order_price"),
        F.max("o_orderkey").alias("last_orderkey"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_collect",
    oracle="""
        SELECT c_mktsegment,
               array_to_string(list_sort(list(DISTINCT c_nationkey)), ',')
                   AS nation_keys_csv,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer
        GROUP BY c_mktsegment
    """,
    tags=("agg",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collection (seed R11: ``dict[ip → list[...]]``).

    The collected set is sorted, then serialized to a CSV string: the
    driver's pandas value hasher cannot hash list cells (r1 ERROR), so
    the registered surface emits only scalar columns. The in-engine
    collection semantics (collect_set) are unchanged."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_nationkey"))).alias(
            "nation_keys_csv"
        ),
        F.count(F.lit(1)).alias("n_cust"),
    )


def approx_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw sketch estimates per priority group — HLL++ distinct
    count (rsd=0.02) and GK percentiles (accuracy=10000) beside the
    exact distinct count. Internal surface: the registered query
    validates these against ground truth and emits the verdicts (raw
    estimates are Spark-version-dependent, so they never reach a
    cross-engine hash); tests/test_approx_sketches.py pins their error
    bands directly."""
    orders = load_table(spark, sf_dir, "orders")
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.95], 10000)
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias(
            "approx_customers"
        ),
        pcts.getItem(0).alias("p50"),
        pcts.getItem(1).alias("p95"),
        F.count_distinct(F.col("o_custkey")).alias("exact_customers"),
    )


@register(
    "agg_approx_sketches",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
               TRUE AS hll_in_band,
               TRUE AS p50_in_band,
               TRUE AS p50_is_member,
               TRUE AS p95_in_band,
               TRUE AS p95_is_member,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates: HLL++ distinct count and Greenwald-
    Khanna approximate percentiles per priority — the single-pass
    mergeable sketches that replace their exact counterparts
    (``agg_count_distinct``, ``agg_percentile``) at 100 TB.

    Oracle (re-derived in r9 — was golden VALUES literals since r7):
    the registered surface emits the sketch's VERIFIED PROPERTIES, not
    its raw estimates, because the estimates are implementation
    details a Spark patch bump can legally change (HLL++ register
    layout, GK compression schedule) while the literals in a golden
    oracle cannot. Per group the plan computes the sketches AND their
    ground truth, then emits: the exact distinct count; a boolean that
    the HLL estimate landed within 3×rsd (6%); booleans that each GK
    percentile's value-rank interval [n_lt+1, n_le] covers the target
    rank within a 0.5%-of-n slack (GK's own ε is 1e-4 — 50× tighter)
    and that the returned value is an actual member of the group's
    o_totalprice values (GK returns real samples, never interpolates).
    DuckDB computes the exact side and literal TRUEs — hash-green on
    any Spark version whose sketches meet their published error
    contracts, FAIL on one that breaks them.
    tests/test_approx_sketches.py additionally pins the raw-estimate
    error bands at any SF."""
    orders = load_table(spark, sf_dir, "orders")
    est = approx_sketch_estimates(spark, sf_dir)
    j = orders.join(F.broadcast(est), "o_orderpriority")
    stats = j.groupBy("o_orderpriority").agg(
        F.first("exact_customers").alias("exact_customers"),
        F.first("approx_customers").alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        *[
            agg
            for q in ("p50", "p95")
            for agg in (
                F.sum(
                    F.when(F.col("o_totalprice") < F.col(q), 1).otherwise(0)
                ).alias(f"n_lt_{q}"),
                F.sum(
                    F.when(F.col("o_totalprice") <= F.col(q), 1).otherwise(0)
                ).alias(f"n_le_{q}"),
                F.max(
                    F.when(F.col("o_totalprice") == F.col(q), 1).otherwise(0)
                ).alias(f"member_{q}"),
            )
        ],
    )
    slack = F.ceil(F.col("n_orders") * 0.005) + F.lit(1)

    def in_band(q: str, frac: float):
        target = F.col("n_orders") * F.lit(frac)
        return (F.col(f"n_lt_{q}") + 1 <= target + slack) & (
            F.col(f"n_le_{q}") >= target - slack
        )

    return stats.select(
        "o_orderpriority",
        "exact_customers",
        (
            F.abs(F.col("approx_customers") - F.col("exact_customers"))
            <= F.col("exact_customers") * F.lit(0.06)
        ).alias("hll_in_band"),
        in_band("p50", 0.5).alias("p50_in_band"),
        (F.col("member_p50") == 1).alias("p50_is_member"),
        in_band("p95", 0.95).alias("p95_in_band"),
        (F.col("member_p95") == 1).alias("p95_is_member"),
        "n_orders",
    )


@register(
    "agg_listagg",
    oracle="""
        SELECT r.r_name,
               string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations_csv,
               CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    tags=("agg", "string"),
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): nations per
    region as a deterministic CSV. WITHIN GROUP (ORDER BY) is mandatory
    for oracle parity — unordered listagg concatenates in partition
    arrival order, which differs run to run, let alone engine to
    engine."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).createOrReplaceTempView("nation_region_la")
    return spark.sql(
        """
        SELECT r_name,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations_csv,
               COUNT(*) AS n_nations
        FROM nation_region_la
        GROUP BY r_name
        """
    )


@register(
    "agg_bool",
    oracle="""
        SELECT o_orderpriority,
               bool_and(o_totalprice > 1000.0) AS all_over_1k,
               bool_or(o_orderstatus = 'P') AS any_partial,
               CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
                   AS n_partial
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "bool"),
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: universal/existential predicates per group
    (every/any — the data-quality assertions a pipeline runs per
    partition before publishing it), plus a FILTERed count."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000.0).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_partial"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


@register(
    "agg_histogram",
    oracle="""
        SELECT CAST(LEAST(FLOOR((o_totalprice - 0.0) / 30000.0), 19) AS INTEGER)
                   AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(MIN(o_totalprice), 2) AS bucket_min,
               ROUND(MAX(o_totalprice), 2) AS bucket_max
        FROM orders
        GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: 20 buckets of 30k over order value, with
    per-bucket extrema (the distribution profile behind every dashboard
    and every skew diagnosis). Bucket arithmetic is FLOOR((x-lo)/w)
    clamped to the last bucket — plain codegen'd math, one hash
    aggregate; at 100 TB this beats exact percentiles by a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor((F.col("o_totalprice") - 0.0) / 30000.0), F.lit(19)
    ).cast("int")
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@register(
    "agg_rollup_grouping_id",
    oracle="""
        SELECT c_mktsegment, c_nationkey,
               CAST(GROUPING(c_mktsegment) AS INTEGER) AS is_seg_total,
               CAST(GROUPING(c_nationkey) AS INTEGER) AS is_nation_total,
               ROUND(SUM(c_acctbal), 2) AS total_bal,
               CAST(COUNT(*) AS BIGINT) AS n_cust
        FROM customer
        GROUP BY ROLLUP (c_mktsegment, c_nationkey)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with GROUPING() disambiguation: a NULL grouping column is
    ambiguous between "subtotal row" and "NULL data value" — the
    grouping flag says which. Required for correct downstream
    consumption of any rollup/cube feed whose keys are nullable."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.rollup("c_mktsegment", "c_nationkey").agg(
        F.grouping("c_mktsegment").cast("int").alias("is_seg_total"),
        F.grouping("c_nationkey").cast("int").alias("is_nation_total"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )


@register(
    "agg_partial_reaggregate",
    oracle="""
        WITH minute AS (
            SELECT CAST(date_trunc('minute', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS minute_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ROUND(SUM(value), 2) AS s,
                   MIN(value) AS mn,
                   MAX(value) AS mx
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(date_trunc('hour', minute_start) AS TIMESTAMP) AS hour_start,
               event_type,
               CAST(SUM(n) AS BIGINT) AS n_events,
               ROUND(SUM(s), 2) AS total_value,
               MIN(mn) AS min_value,
               MAX(mx) AS max_value,
               ROUND(SUM(s), 2) / SUM(n) AS avg_value
        FROM minute
        GROUP BY 1, 2
    """,
    tags=("agg", "stream"),
)
def agg_partial_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup from PARTIAL aggregates: minute-level
    (count,sum,min,max) re-aggregated to hour-level by merging the
    partials (sum-of-counts, sum-of-sums, min-of-mins, max-of-maxes,
    avg from the merged pair) — the mergeable-aggregate pattern behind
    every hypertable/materialized-rollup design: at 100 TB you never
    recompute hours from raw events, you fold 60 minute-partials.

    The oracle runs the SAME two-level shape so both engines round
    minute sums on the data's 2dp grid before merging. avg is a
    quotient of two already-identical values (bit-identical across
    engines, left unrounded). Spark executes this as two hash
    aggregates; the second one's input is |minutes·types| rows —
    shuffle-trivial. Seed: R4 (chunk hierarchy), R11."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", F.col("ts")).alias("minute_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("s"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    total = F.round(F.sum("s"), 2)
    return minute.groupBy(
        F.date_trunc("hour", F.col("minute_start")).alias("hour_start"),
        "event_type",
    ).agg(
        F.sum("n").alias("n_events"),
        total.alias("total_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
        (total / F.sum("n")).alias("avg_value"),
    )


@register(
    "agg_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               ROUND(SUM(l_extendedprice * l_discount), 4) AS weighted_sum,
               ROUND(SUM(l_extendedprice), 2) AS weight_total,
               ROUND(SUM(l_extendedprice * l_discount), 4)
                 / ROUND(SUM(l_extendedprice), 2) AS weighted_avg_discount
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average as ratio-of-sums (price-weighted mean discount
    per return flag) — the aggregate that does NOT decompose as
    avg-of-avgs and therefore must ship both partial sums through the
    shuffle; the canonical example of a mergeable custom aggregate
    state (sum_wx, sum_w). Numerator rounds on the 4dp product grid,
    denominator on the 2dp data grid; the quotient of the two rounded
    doubles is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    num = F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
    den = F.round(F.sum("l_extendedprice"), 2)
    return li.groupBy("l_returnflag").agg(
        num.alias("weighted_sum"),
        den.alias("weight_total"),
        (num / den).alias("weighted_avg_discount"),
    )


@register(
    "agg_decimal_exact",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_exact,
               CAST(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DECIMAL(26,6)) AS DOUBLE) AS avg_exact,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS max_exact,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "decimal"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation — the money path. Casting the 2dp
    price to DECIMAL(18,2) before aggregating makes SUM/MAX exact
    integers-of-cents: NO float summation-order noise, NO rounding
    discipline, both engines agree to the last digit by construction.
    This is the engine's answer to every float-parity caveat in this
    package: where values are genuinely fixed-point (prices), use the
    decimal lattice and the problem disappears.

    Scale note: Spark aggregates DECIMAL(18,2) as an unscaled LONG
    with overflow promotion (Tungsten fast path) — same hash-agg shape
    and shuffle as the double version, slightly wider rows. AVG result
    types differ per engine (Spark DECIMAL(22,6) vs DuckDB's chosen
    scale), so AVG is normalized to DECIMAL(26,6) in both.

    Driver-surface note: the ARITHMETIC stays decimal (exact by
    construction); only the FINAL columns are cast to DOUBLE, because
    the driver hashes Spark ``Decimal`` objects differently from
    DuckDB's float64 ``fetchdf()`` output (r1 hash-FAIL). The cast is
    lossless at 2dp/6dp for these magnitudes (< 2^53)."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.groupBy("o_orderpriority").agg(
        F.sum(price).cast("double").alias("total_exact"),
        F.avg(price).cast("decimal(26,6)").cast("double").alias("avg_exact"),
        F.max(price).cast("double").alias("max_exact"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_mode",
    oracle="""
        SELECT event_type, mode_user, n_mode FROM (
            SELECT event_type,
                   user_id AS mode_user,
                   CAST(COUNT(*) AS BIGINT) AS n_mode,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY COUNT(*) DESC, user_id) AS rn
            FROM events
            GROUP BY event_type, user_id
        ) ranked
        WHERE rn = 1
    """,
    tags=("agg",),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE (most frequent value) per group, as count + rank with an
    explicit tiebreak. The native ``mode()`` in both engines returns an
    ARBITRARY value on frequency ties — nondeterministic across
    engines, partitionings, and reruns — so the engine spells it as
    count → row_number ordered by (count DESC, value): deterministic by
    construction and the same two-shuffle shape MODE costs anyway
    (value-pair partial agg absorbs hot values map-side; the rank runs
    per group over |distinct values| rows)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", F.col("user_id").alias("mode_user")).agg(
        F.count(F.lit(1)).alias("n_mode")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(
        F.col("n_mode").desc(), F.col("mode_user")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "mode_user", "n_mode")
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps — the incremental
    alternative to COUNT(DISTINCT): values bucket into fixed 32k-bit
    ranges (``bitmap_bucket_number``/``bitmap_bit_position``), each
    (group, bucket) folds to one bitmap, and distinct = sum of per-bucket
    popcounts. Unlike a plain count-distinct, the per-bucket bitmaps are
    re-aggregatable partials: persist them per day/partition and any
    rollup (week, month, all-time) is a cheap bitmap-OR away — no
    re-scan of raw data, the same pattern as agg_partial_reaggregate
    but for distinct counts, where plain counters can't merge.

    Scale: two map-side-combinable aggregations; intermediate state is
    one ≤4 KB bitmap per (group, 32k-value bucket) instead of the raw
    key set. The bitmaps stay internal (binary columns would trip the
    driver hasher) — the surfaced columns are scalar counts."""
    orders = load_table(spark, sf_dir, "orders")
    per_bucket = (
        orders.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_customers")
    )


@register(
    "agg_hll_partial_reaggregate",
    oracle="""
        SELECT o_orderpriority,
               CAST(approx_customers AS BIGINT) AS approx_customers,
               CAST(n_partials_merged AS BIGINT) AS n_partials_merged
        FROM (VALUES
            ('1-URGENT', 1286, 7),
            ('2-HIGH', 1277, 7),
            ('3-MEDIUM', 1278, 7),
            ('4-NOT SPECIFIED', 1279, 7),
            ('5-LOW', 1275, 7)
        ) t(o_orderpriority, approx_customers, n_partials_merged)
    """,
    tags=("agg", "sketch", "golden-sf0.01"),
)
def agg_hll_partial_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting with RE-AGGREGATABLE HLL sketches
    (Apache DataSketches): per-(priority, year) sketches roll up to
    per-priority counts via hll_union_agg — merging SKETCHES, never
    re-scanning raw data. This is the 100 TB daily-rollup pattern:
    persist a 1 KB sketch per partition, answer any coarser distinct
    query from sketch unions; ``agg_bitmap_distinct`` is its exact
    sibling (bigger state, exact answers).

    Oracle (new in r4 — was rows-only): a GOLDEN expectation. DuckDB's
    HLL can't reproduce DataSketches estimates, but the estimates ARE
    deterministic — register merges are commutative, so the values are
    partition-order-independent constants of the sf0.01 fixture. A
    sketch-construction or rollup change breaks the hash.
    tests/test_incremental.py additionally asserts <2% relative error
    vs exact distinct and sketch-merge == direct-sketch. The binary
    sketches stay internal (driver-hasher contract) — only long
    estimates surface."""
    orders = load_table(spark, sf_dir, "orders")
    per_year = (
        orders.select(
            "o_orderpriority",
            F.year("o_orderdate").alias("order_year"),
            "o_custkey",
        )
        .groupBy("o_orderpriority", "order_year")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    )
    return (
        per_year.groupBy("o_orderpriority")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_customers"
            ),
            F.count(F.lit(1)).alias("n_partials_merged"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_corr_regression",
    oracle="""
        WITH r AS (
            SELECT l_returnflag,
                   CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx,
                   CAST(SUM(y * y) AS DOUBLE) AS syy,
                   CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM r GROUP BY l_returnflag
        )
        SELECT l_returnflag, n_rows,
               ((n * sxy) - (sx * sy))
                   / (sqrt((n * sxx) - (sx * sx)) * sqrt((n * syy) - (sy * sy)))
                   AS corr_qty_price,
               ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)) AS slope_cents,
               (sy - (((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx) / n
                   AS intercept_cents
        FROM m
    """,
    tags=("agg", "stats"),
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + least-squares slope/intercept of quantity
    vs price per return flag — computed from EXACT integer moments
    (quantity is int-valued; price sums integer cents), not the built-in
    ``corr``/``regr_slope``: their streaming accumulations are
    summation-order-dependent in the low bits, so no cross-engine hash
    could pin them. Here every sum is exact (Spark decimal(38) /
    DuckDB HUGEINT), converted to double ONCE, and both engines then
    evaluate an identical fixed-parenthesization expression tree —
    bit-identical statistics, no rounding.

    Scale shape: one map-side-combinable aggregation (6 moments per
    group, fixed width) — the same single-pass mergeable-moments trick
    as ``agg_stats_moments``; the statistics are pure projection over
    the |groups|-row result."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    dec = "decimal(38,0)"
    m = (
        li.select(
            "l_returnflag",
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
            F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = (n * sxy) - (sx * sy)
    var_x_n = (n * sxx) - (sx * sx)
    var_y_n = (n * syy) - (sy * sy)
    slope = cov_n / var_x_n
    return m.select(
        "l_returnflag",
        "n_rows",
        (cov_n / (F.sqrt(var_x_n) * F.sqrt(var_y_n))).alias("corr_qty_price"),
        slope.alias("slope_cents"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
    )


#: AQP sample: md5 buckets < _AQP_PCT of 100 (deterministic, so the
#: estimate itself is oracle-checkable)
_AQP_PCT = 5


@register(
    "agg_approx_sample_estimate",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag, l_extendedprice, l_discount
            FROM lineitem
            WHERE CAST(('0x' || substring(md5(
                      CAST(l_orderkey AS VARCHAR) || '-' ||
                      CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 100 < {_AQP_PCT}
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(COUNT(*) * (100 / {_AQP_PCT}) AS BIGINT) AS n_estimated,
               ROUND(SUM(l_extendedprice * (1 - l_discount))
                         * (100 / {_AQP_PCT}), 4) AS revenue_estimated
        FROM s
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing by DETERMINISTIC sampling: estimate
    per-flag row counts and revenue from a fixed 5% md5-bucket
    sample of the fact table with inverse-probability scale-up — the
    dashboard/exploration path that answers "roughly how much" from
    1/20th of the bytes. The sample predicate is content-hashed (not
    TABLESAMPLE), so reruns and the oracle see the SAME rows: the
    estimate is reproducible and hash-checkable, and at 100 TB the
    sample can be materialized once and shared by every dashboard
    query.

    Scale shape: the bucket predicate evaluates inside the scan
    (row-group column stats can't prune an md5, but no join or second
    pass exists); one map-side-combinable agg over the 5% slice —
    the full-table query's plan at a twentieth of the input."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "-",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    scale = 100 // _AQP_PCT
    return (
        li.filter(bucket < _AQP_PCT)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (F.count(F.lit(1)) * scale).alias("n_estimated"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                * scale,
                4,
            ).alias("revenue_estimated"),
        )
    )


#: count-min parameters: eps 0.001 (width 2000 counters), confidence
#: 0.99 (7 hash rows), fixed seed — the sketch is a pure function of
#: the multiset, so merges commute and the bytes are identical under
#: any partitioning (pytest-pinned)
_CMS_EPS = 0.001
_CMS_CONF = 0.99
_CMS_SEED = 42
_CMS_PROBE_KEYS = (3, 17, 42, 77, 96)
#: golden estimates at the driver's sf0.01 fixture — at this eps and
#: N=10k the sketch happens to be collision-free (est == exact), which
#: the oracle exposes by recomputing true counts; at sf0.1 collisions
#: appear (over_by > 0 for some keys), which is why the oracle is
#: golden-pinned rather than claiming est == true in general
_CMS_GOLDEN = {3: 59, 17: 83, 42: 73, 77: 62, 96: 63}


@register(
    "agg_countmin_sketch",
    oracle=f"""
        WITH t AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
            FROM events
            WHERE user_id IN {_CMS_PROBE_KEYS}
            GROUP BY user_id
        )
        SELECT v.user_id, v.est_count, t.true_count,
               CAST(v.est_count - t.true_count AS BIGINT) AS over_by
        FROM (VALUES {", ".join(
            f"(CAST({k} AS BIGINT), CAST({v} AS BIGINT))"
            for k, v in sorted(_CMS_GOLDEN.items())
        )}) v(user_id, est_count)
        JOIN t USING (user_id)
    """,
    tags=("agg", "sketch", "golden-sf0.01"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation — the heavy-hitter /
    point-frequency sketch completing the mergeable-sketch family
    (HLL distinct: ``agg_hll_partial_reaggregate``; quantiles:
    ``agg_approx_sketches``): one pass builds a fixed 2000x7 counter
    grid whose merges COMMUTE, so the bytes are identical under any
    partitioning (pytest-pinned across repartition counts) and
    estimates never undercount (est >= true always; over_by bounds the
    collision error at eps x N). Five probe keys are estimated by
    deserializing the one-row sketch driver-side next to their exact
    recounts. At 100 TB: the sketch is KBs per partition merged up a
    tree — 'how often does this token/user/key occur' without a
    groupBy over the corpus. Golden-pinned at sf0.01 (collision-free
    there; sf0.1 shows real over_by — the honest sketch contract).
    Seed: R12's per-station fetch counters (``app.py:243-268``),
    sketched."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    cms_bytes = bytes(
        ev.agg(
            F.count_min_sketch(
                "user_id",
                F.lit(_CMS_EPS),
                F.lit(_CMS_CONF),
                F.lit(_CMS_SEED),
            ).alias("cms")
        ).collect()[0].cms
    )
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(cms_bytes)
    )
    est = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": list(_CMS_PROBE_KEYS),
                "est_count": [
                    cms.estimateCount(int(k)) for k in _CMS_PROBE_KEYS
                ],
            }
        ),
        "user_id long, est_count long",
    )
    true = (
        ev.filter(F.col("user_id").isin(list(_CMS_PROBE_KEYS)))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return est.join(true, "user_id").select(
        "user_id",
        "est_count",
        "true_count",
        (F.col("est_count") - F.col("true_count"))
        .cast("long")
        .alias("over_by"),
    )


#: sketch size for agg_kmv_distinct — (k-1)/u_k estimation kicks in
#: only for groups with more than K distinct values
KMV_K = 64


@register(
    "agg_kmv_distinct",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority,
                   o_custkey,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                        AS BIGINT) / 1152921504606846976.0 AS u
            FROM orders
        ),
        ranked AS (
            SELECT o_orderpriority, u,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY u, o_custkey) AS rn
            FROM hashed
        ),
        sketch AS (
            SELECT o_orderpriority,
                   MAX(u) AS u_k,
                   CAST(COUNT(*) AS BIGINT) AS n_in_sketch
            FROM ranked WHERE rn <= {KMV_K}
            GROUP BY o_orderpriority
        ),
        exact AS (
            SELECT o_orderpriority,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
            FROM orders GROUP BY o_orderpriority
        )
        SELECT s.o_orderpriority,
               e.n_exact,
               CASE WHEN s.n_in_sketch < {KMV_K}
                    THEN CAST(s.n_in_sketch AS DOUBLE)
                    ELSE ({KMV_K} - 1.0) / s.u_k END AS kmv_estimate
        FROM sketch s JOIN exact e USING (o_orderpriority)
    """,
    tags=("agg", "sketch"),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the
    theta-sketch family's simplest member): per group, keep the K
    smallest values of a uniform hash of the key; if the group holds
    ≥ K distinct keys, estimate distinct count as (K-1)/u_K where u_K
    is the K-th smallest hash. Unlike HLL (``agg_hll_partial_
    reaggregate``) the KMV sketch supports SET OPERATIONS — union =
    merge-and-trim of hash sets, intersection via the Jaccard of the
    merged sketch — which is why warehouse engines keep both. The
    engine-portable md5→60-bit→(0,1) hash makes every estimate a
    DETERMINISTIC function of the data, so this oracle is exact — no
    golden literals, no tolerance (contrast the library-internal HLL
    seeds, which need the golden-sf0.01 mechanism).

    Value parity: u = int/2^60 and (K-1)/u_K are single divisions of
    identical integer-derived doubles — bit-exact on both engines; ties
    in the rank break on the key. No rounding anywhere.

    Scale shape: the window form shown here sorts each group's distinct
    keys; at 100 TB the same sketch builds as a map-side partial
    (k-smallest per partition, merge-and-trim on combine — the
    agg_partial_reaggregate pattern) with k·|groups| state. Estimation
    error ~1/sqrt(K) is pinned in tests/test_approx_sketches.py."""
    orders = load_table(spark, sf_dir, "orders")
    hashed = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .withColumn(
            "h",
            F.expr(
                "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15),"
                " 16, 10) as bigint)"
            ),
        )
        # divide via a DataFrame double literal: in Spark SQL TEXT the
        # constant 1152921504606846976.0 parses as a DECIMAL literal and
        # the division rounds decimally — the last-ulp estimate drift
        # the sf0.1 parity run caught on first landing
        .withColumn("u", F.col("h") / F.lit(1152921504606846976.0))
        .drop("h")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("u", "o_custkey")
    sketch = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("o_orderpriority")
        .agg(
            F.max("u").alias("u_k"),
            F.count(F.lit(1)).cast("long").alias("n_in_sketch"),
        )
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact")
    )
    return sketch.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        F.when(
            F.col("n_in_sketch") < KMV_K, F.col("n_in_sketch").cast("double")
        )
        .otherwise(F.lit(KMV_K - 1.0) / F.col("u_k"))
        .alias("kmv_estimate"),
    )


@register(
    "agg_kmv_merge",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority,
                   o_custkey,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                        AS BIGINT) / 1152921504606846976.0 AS u
            FROM orders
        ),
        group_sketch AS (
            SELECT o_orderpriority, o_custkey, u FROM (
                SELECT o_orderpriority, o_custkey, u,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY u, o_custkey) AS rn
                FROM hashed
            ) WHERE rn <= {KMV_K}
        ),
        merged AS (
            SELECT u FROM (
                SELECT u, ROW_NUMBER() OVER (ORDER BY u, o_custkey) AS rn
                FROM (SELECT DISTINCT o_custkey, u FROM group_sketch)
            ) WHERE rn <= {KMV_K}
        ),
        est AS (
            SELECT ({KMV_K} - 1.0) / MAX(u) AS kmv_estimate_merged,
                   CAST(COUNT(*) AS BIGINT) AS sketch_size
            FROM merged
        )
        SELECT CAST(5 AS BIGINT) AS n_partials,
               (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
                   AS n_exact_global,
               sketch_size,
               kmv_estimate_merged
        FROM est
    """,
    tags=("agg", "sketch"),
)
def agg_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reason KMV earns its place next to HLL: sketches MERGE. The
    per-priority sketches built exactly as in ``agg_kmv_distinct`` are
    unioned and re-trimmed to the K smallest hashes, and the merged
    sketch estimates the GLOBAL distinct-customer count without ever
    rescanning the raw data — correct because any hash among the
    global K smallest is necessarily among its own group's K smallest
    (the merge loses nothing). tests/test_approx_sketches.py pins the
    stronger property: the merged sketch is IDENTICAL to the sketch
    built directly on the global key set. At 100 TB this is the
    two-level rollup every partial-aggregate runs — partials the size
    of K per group, merge traffic K·|groups|, raw data scanned once.

    Value parity: same bit-exact hash/division discipline as
    agg_kmv_distinct; the duplicate a customer spanning two priorities
    would inject is removed by key before the re-rank on both
    engines."""
    orders = load_table(spark, sf_dir, "orders")
    hashed = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .withColumn(
            "h",
            F.expr(
                "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15),"
                " 16, 10) as bigint)"
            ),
        )
        .withColumn("u", F.col("h") / F.lit(1152921504606846976.0))
        .drop("h")
    )
    wg = Window.partitionBy("o_orderpriority").orderBy("u", "o_custkey")
    group_sketch = (
        hashed.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= KMV_K)
        .select("o_custkey", "u")
    )
    wm = Window.orderBy("u", "o_custkey")
    merged = (
        group_sketch.distinct()
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
    )
    est = merged.agg(
        (F.lit(KMV_K - 1.0) / F.max("u")).alias("kmv_estimate_merged"),
        F.count(F.lit(1)).cast("long").alias("sketch_size"),
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").cast("long").alias("n_exact_global")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.lit(5).cast("long").alias("n_partials"),
        "n_exact_global",
        "sketch_size",
        "kmv_estimate_merged",
    )


@register(
    "agg_kmv_jaccard",
    oracle=f"""
        WITH hashed AS (
            SELECT DISTINCT o_orderpriority, o_custkey,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                        AS BIGINT) / 1152921504606846976.0 AS u
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        ),
        sk AS (
            SELECT o_orderpriority, o_custkey, u FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                             ORDER BY u, o_custkey) AS rn
                FROM hashed
            ) WHERE rn <= {KMV_K}
        ),
        merged AS (
            SELECT o_custkey, u FROM (
                SELECT o_custkey, u,
                       ROW_NUMBER() OVER (ORDER BY u, o_custkey) AS rn
                FROM (SELECT DISTINCT o_custkey, u FROM sk)
            ) WHERE rn <= {KMV_K}
        ),
        flags AS (
            SELECT m.o_custkey, m.u,
                   m.o_custkey IN (SELECT o_custkey FROM sk
                                   WHERE o_orderpriority = '1-URGENT')
                   AND
                   m.o_custkey IN (SELECT o_custkey FROM sk
                                   WHERE o_orderpriority = '2-HIGH')
                       AS in_both
            FROM merged m
        ),
        est AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                   CAST(COUNT(*) FILTER (WHERE in_both) AS BIGINT) AS k_both,
                   ({KMV_K} - 1.0) / MAX(u) AS union_est
            FROM flags
        ),
        exact AS (
            SELECT CAST(COUNT(DISTINCT CASE WHEN n_p = 2 THEN o_custkey END)
                        AS BIGINT) AS n_intersection_exact,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_union_exact
            FROM (
                SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_p
                FROM hashed GROUP BY o_custkey
            ) t
        )
        SELECT e.k_used, e.k_both,
               CAST(e.k_both AS DOUBLE) / e.k_used AS jaccard_est,
               (CAST(e.k_both AS DOUBLE) / e.k_used) * e.union_est
                   AS intersection_est,
               x.n_intersection_exact, x.n_union_exact
        FROM est e CROSS JOIN exact x
    """,
    tags=("agg", "sketch"),
)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV trilogy's third member — SET INTERSECTION from sketches
    alone (Beyer et al. 2007): merge the two groups' K-minimum sketches
    (``agg_kmv_merge``'s union), and within the merged K smallest
    hashes the fraction present in BOTH input sketches estimates the
    Jaccard similarity; × the union estimate gives the intersection
    cardinality. HLL cannot do this (its registers union but never
    intersect without inclusion-exclusion error blowup) — the reason
    warehouses ship theta sketches next to HLL. Estimates are again
    DETERMINISTIC functions of the portable hash, so the oracle is
    exact, and the exact intersection/union ride along so the driver
    hash also pins the error the estimate carries at this fixture.

    Value parity: k_both/k_used is one division of identical
    integer-derived doubles; the intersection estimate is one further
    product of bit-identical doubles. Nothing rounds.

    Scale shape: identical to agg_kmv_merge — group sketches are
    K-sized partials, the merge touches only sketch rows, exact
    baselines are one distinct-agg pass (dropped in production where
    the whole point is not scanning for exactness)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    hashed = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .withColumn(
            "h",
            F.expr(
                "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15),"
                " 16, 10) as bigint)"
            ),
        )
        .withColumn("u", F.col("h") / F.lit(1152921504606846976.0))
        .drop("h")
        .localCheckpoint(eager=True)
    )
    wg = Window.partitionBy("o_orderpriority").orderBy("u", "o_custkey")
    sk = (
        hashed.withColumn("rn", F.row_number().over(wg))
        .filter(F.col("rn") <= KMV_K)
        .select("o_orderpriority", "o_custkey", "u")
        .localCheckpoint(eager=True)
    )
    wm = Window.orderBy("u", "o_custkey")
    merged = (
        sk.select("o_custkey", "u")
        .distinct()
        .withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= KMV_K)
    )
    a_keys = sk.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b_keys = sk.filter(F.col("o_orderpriority") == "2-HIGH").select(
        F.col("o_custkey").alias("bk")
    )
    flags = (
        merged.join(
            a_keys.withColumn("in_a", F.lit(True)), "o_custkey", "left"
        )
        .join(
            b_keys.withColumn("in_b", F.lit(True)),
            merged.o_custkey == b_keys.bk,
            "left",
        )
        .select(
            "u",
            (
                F.coalesce(F.col("in_a"), F.lit(False))
                & F.coalesce(F.col("in_b"), F.lit(False))
            ).alias("in_both"),
        )
    )
    est = flags.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.count(F.when(F.col("in_both"), 1)).cast("long").alias("k_both"),
        (F.lit(KMV_K - 1.0) / F.max("u")).alias("union_est"),
    )
    exact = (
        hashed.groupBy("o_custkey")
        .agg(F.countDistinct("o_orderpriority").alias("n_p"))
        .agg(
            F.count(F.when(F.col("n_p") == 2, 1))
            .cast("long")
            .alias("n_intersection_exact"),
            F.count(F.lit(1)).cast("long").alias("n_union_exact"),
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "k_used",
        "k_both",
        (F.col("k_both").cast("double") / F.col("k_used")).alias("jaccard_est"),
        (
            (F.col("k_both").cast("double") / F.col("k_used"))
            * F.col("union_est")
        ).alias("intersection_est"),
        "n_intersection_exact",
        "n_union_exact",
    )
