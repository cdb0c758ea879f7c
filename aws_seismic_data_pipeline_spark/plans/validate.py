"""Data-quality constraint audit (dbt-test / expectations analog).

A pipeline that ingests continuously (reference seed R14/R15: malformed
responses become dead-letter placeholders, ``/root/reference/
app.py:306-334``) needs the complementary batch-side audit: assert the
warehouse's row-level contracts — referential integrity, key
uniqueness, domain ranges — and report violation counts per constraint
instead of failing opaquely. Each check is a single map-side aggregate
or an anti-join count; the audit of a 100 TB warehouse is one pass per
table with fixed-width shuffle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register

#: warn-level price ceiling — intentionally BELOW the fixture's true
#: maximum (~105k) so the audit demonstrably reports nonzero violations
PRICE_WARN_CEILING = 100000


@register(
    "validate_constraints",
    oracle=f"""
        WITH checks AS (
            SELECT 'orders_customer_fk' AS check_name, 'error' AS severity,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
                    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_custkey IS NULL) AS n_violations,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_checked
            UNION ALL
            SELECT 'events_user_fk', 'error',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM events e
                    LEFT JOIN customer c ON e.user_id = c.c_custkey
                    WHERE c.c_custkey IS NULL),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM events)
            UNION ALL
            SELECT 'orderkey_unique', 'error',
                   (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                    FROM orders),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
            UNION ALL
            SELECT 'quantity_in_1_50', 'error',
                   (SELECT CAST(COUNT(*) FILTER (
                        WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
                    FROM lineitem),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
            UNION ALL
            SELECT 'price_under_{PRICE_WARN_CEILING}', 'warn',
                   (SELECT CAST(COUNT(*) FILTER (
                        WHERE l_extendedprice > {PRICE_WARN_CEILING}) AS BIGINT)
                    FROM lineitem),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
            UNION ALL
            SELECT 'doc_nchars_consistent', 'error',
                   -- length() = characters (matches Spark F.length);
                   -- strlen() = BYTES, which only coincides on pure-
                   -- ASCII fixtures (r6 ADVICE)
                   (SELECT CAST(COUNT(*) FILTER (
                        WHERE n_chars <> length(text)) AS BIGINT)
                    FROM documents),
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
        )
        SELECT check_name, severity, n_violations, n_checked,
               n_violations = 0 AS passed
        FROM checks
    """,
    tags=("plan", "quality"),
)
def validate_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level contract audit over the warehouse: referential
    integrity (orders→customer, events→customer), key uniqueness,
    domain ranges, and derived-column consistency — one row per
    constraint with violation/checked counts and a pass flag. The
    warn-level price ceiling is set below the data's true maximum so
    the nonzero-violation path is exercised, not just all-green.

    Scale shape: each FK check is a left-anti count (shuffle on the key,
    or broadcast when the dimension fits); every other check is a
    single-scan map-side conditional count. The result is |constraints|
    rows — the audit never materializes violating rows (a debugging
    variant would TABLESAMPLE them)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")

    cust_keys = customer.select("c_custkey").distinct()

    def row(name: str, severity: str, viol: DataFrame, total: DataFrame) -> DataFrame:
        v = viol.agg(F.count(F.lit(1)).alias("n_violations"))
        t = total.agg(F.count(F.lit(1)).alias("n_checked"))
        return v.crossJoin(t).select(
            F.lit(name).alias("check_name"),
            F.lit(severity).alias("severity"),
            "n_violations",
            "n_checked",
        )

    checks = [
        row(
            "orders_customer_fk",
            "error",
            orders.join(
                cust_keys, orders.o_custkey == cust_keys.c_custkey, "left_anti"
            ),
            orders,
        ),
        row(
            "events_user_fk",
            "error",
            events.join(
                cust_keys, events.user_id == cust_keys.c_custkey, "left_anti"
            ),
            events,
        ),
        # uniqueness as a difference of two aggregates over one scan
        orders.agg(
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
                "n_violations"
            ),
            F.count(F.lit(1)).alias("n_checked"),
        ).select(
            F.lit("orderkey_unique").alias("check_name"),
            F.lit("error").alias("severity"),
            "n_violations",
            "n_checked",
        ),
        row(
            "quantity_in_1_50",
            "error",
            lineitem.filter(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
            ),
            lineitem,
        ),
        row(
            f"price_under_{PRICE_WARN_CEILING}",
            "warn",
            lineitem.filter(F.col("l_extendedprice") > PRICE_WARN_CEILING),
            lineitem,
        ),
        row(
            "doc_nchars_consistent",
            "error",
            documents.filter(F.col("n_chars") != F.length("text")),
            documents,
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("n_violations") == 0)


@register(
    "profile_column_stats",
    oracle="""
        WITH cols(check_order, column_name, dtype, n_nulls, n_distinct) AS (
            SELECT 1, 'o_orderkey', 'bigint',
                   (SELECT CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) FROM orders),
                   (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
            UNION ALL
            SELECT 2, 'o_custkey', 'bigint',
                   (SELECT CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders),
                   (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders)
            UNION ALL
            SELECT 3, 'o_orderstatus', 'string',
                   (SELECT CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) FROM orders),
                   (SELECT CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders)
            UNION ALL
            SELECT 4, 'o_orderpriority', 'string',
                   (SELECT CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT) FROM orders),
                   (SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders)
            UNION ALL
            SELECT 5, 'o_totalprice_cents', 'bigint',
                   (SELECT CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT) FROM orders),
                   (SELECT CAST(COUNT(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) FROM orders)
        )
        SELECT column_name, dtype, n_nulls, n_distinct,
               CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_rows
        FROM cols
    """,
    tags=("plan", "quality"),
)
def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the orders table: per-column
    null and exact distinct counts plus table cardinality — the stats a
    cost-based optimizer (or a data-quality dashboard) consumes.
    Doubles are profiled as exact cents so the distinct count is
    well-defined cross-engine.

    Scale shape: ONE scan computes every column's aggregates together
    (Spark fuses the count-distincts via expand; each is map-side
    partial) — profiling never does per-column rescans. At 100 TB use
    `approx_count_distinct` for the same plan at sketch cost; the exact
    form here is what the oracle can pin."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
            for c in [
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_orderpriority",
                "o_totalprice",
            ]
        ],
        F.count_distinct("o_orderkey").alias("nd_o_orderkey"),
        F.count_distinct("o_custkey").alias("nd_o_custkey"),
        F.count_distinct("o_orderstatus").alias("nd_o_orderstatus"),
        F.count_distinct("o_orderpriority").alias("nd_o_orderpriority"),
        F.count_distinct(cents).alias("nd_o_totalprice_cents"),
    )
    spec = [
        ("o_orderkey", "bigint", "nulls_o_orderkey", "nd_o_orderkey"),
        ("o_custkey", "bigint", "nulls_o_custkey", "nd_o_custkey"),
        ("o_orderstatus", "string", "nulls_o_orderstatus", "nd_o_orderstatus"),
        ("o_orderpriority", "string", "nulls_o_orderpriority", "nd_o_orderpriority"),
        ("o_totalprice_cents", "bigint", "nulls_o_totalprice", "nd_o_totalprice_cents"),
    ]
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.lit(dtype).alias("dtype"),
                F.col(nulls).alias("n_nulls"),
                F.col(nd).alias("n_distinct"),
                F.col("n_rows").alias("n_rows"),
            )
            for name, dtype, nulls, nd in spec
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "profile_observed_metrics",
    oracle="""
        SELECT 'lineitem_scan' AS probe,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(CASE WHEN l_discount > 0.08 THEN 1 END) AS BIGINT)
                   AS n_high_discount
        FROM lineitem
    """,
    tags=("plan", "observability"),
)
def profile_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIGGYBACKED data-quality metrics (``Observation`` API): row
    count, quantity sum, and a high-discount counter are collected ON
    the execution of a pass the job was running anyway — zero extra
    scans, the production observability pattern for a 100 TB pipeline
    where a separate metrics query would re-read the table
    (the reference counts fetches/failures in in-process dicts,
    ``app.py:391-397``; this is that ledger riding the engine's own
    execution). The observed values surface as a 1-row frame so the
    driver hash-checks them against recomputing the same aggregates —
    proving the piggybacked numbers equal the ground truth."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_scan")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.when(F.col("l_discount") > 0.08, 1)).alias(
            "n_high_discount"
        ),
    )
    # the pass the metrics ride on (any real downstream action works;
    # noop keeps it measurable) — obs.get blocks until it completes
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "probe": ["lineitem_scan"],
                "n_rows": [int(m["n_rows"])],
                "sum_qty": [int(m["sum_qty"])],
                "n_high_discount": [int(m["n_high_discount"])],
            }
        ),
        "probe string, n_rows long, sum_qty long, n_high_discount long",
    )


@register(
    "plan_analyze_cbo_stats",
    oracle="""
        SELECT 'nation_cbo' AS table_name,
               CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS row_count,
               CAST((SELECT COUNT(DISTINCT n_regionkey) FROM nation)
                    AS BIGINT) AS n_regions
        FROM (VALUES (1)) t(x)
    """,
    tags=("plan", "catalog", "cbo"),
)
def plan_analyze_cbo_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog statistics for the COST-BASED optimizer (``ANALYZE TABLE
    ... COMPUTE STATISTICS``): persist the table to the session
    catalog, ANALYZE it, and read the recorded rowCount back from the
    catalog metadata — the numbers Catalyst's CBO consults for join
    reordering and broadcast decisions when frames come from tables
    instead of in-session lineage (at 100 TB, stale-or-missing stats
    are why a 5-way join picks the wrong build side). The returned
    row pairs the CATALOG-recorded rowCount with a recomputed distinct
    count; the oracle recomputes both from raw data, so the driver
    hash-checks that ANALYZE recorded truth, not an estimate."""
    # app-keyed physical name: the in-memory catalog is per-session but
    # the warehouse DIRECTORY is shared — concurrent harness runs with a
    # fixed name would clobber each other's files mid-read
    tbl = f"nation_cbo_{spark.sparkContext.applicationId.replace('-', '_')}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    load_table(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        tbl
    )
    try:
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS")
        described = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        stats_line = next(
            r.data_type for r in described if r.col_name == "Statistics"
        )
        # "NNN bytes, M rows" — the catalog's recorded stats
        row_count = int(stats_line.split(",")[1].strip().split(" ")[0])
        n_regions = (
            spark.table(tbl)
            .agg(F.count_distinct("n_regionkey"))
            .collect()[0][0]
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "table_name": ["nation_cbo"],
                "row_count": [row_count],
                "n_regions": [int(n_regions)],
            }
        ),
        "table_name string, row_count long, n_regions long",
    )


#: drift-profile constants: snapshot cutoff, price-bucket width, and
#: the FIXED bucket count the Laplace smoothing denominator uses (so
#: smoothing never depends on which buckets happen to be populated)
_DRIFT_CUTOFF = "1998-01-01"
_DRIFT_BUCKET_W = 50_000.0
_DRIFT_K = 10


@register(
    "profile_snapshot_drift",
    oracle=f"""
        WITH b AS (
            SELECT LEAST({_DRIFT_K - 1},
                         CAST(FLOOR(o_totalprice / {_DRIFT_BUCKET_W})
                              AS BIGINT)) AS bucket_id,
                   CASE WHEN o_orderdate < TIMESTAMP '{_DRIFT_CUTOFF}'
                        THEN 1 ELSE 0 END AS is_base
            FROM orders
        ), g AS (
            SELECT bucket_id,
                   CAST(SUM(is_base) AS BIGINT) AS n_base,
                   CAST(SUM(1 - is_base) AS BIGINT) AS n_cur
            FROM b GROUP BY bucket_id
        ), t AS (
            SELECT bucket_id, n_base, n_cur,
                   (n_base + 0.5)
                       / (SUM(n_base) OVER () + {0.5 * _DRIFT_K}) AS p,
                   (n_cur + 0.5)
                       / (SUM(n_cur) OVER () + {0.5 * _DRIFT_K}) AS q
            FROM g
        )
        SELECT bucket_id, n_base, n_cur,
               ROUND((q - p) * LN(q / p), 8) AS psi_term
        FROM t
    """,
    tags=("plan", "quality"),
)
def profile_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTION DRIFT between two corpus snapshots — the
    Population Stability Index per histogram bucket, the monitor a
    continuous-ingest pipeline runs so a crawl whose content shifts
    (new source mix, collapsed field, seasonal skew) trips an alert
    BEFORE a model trains on it. Baseline = orders before the cutoff
    date, current = after; both halves histogram o_totalprice into
    fixed-width buckets in ONE scan (conditional aggregation — the
    table is read once, not once per snapshot), then
    psi_i = (q_i - p_i) * ln(q_i / p_i) with Laplace-smoothed shares
    over a FIXED bucket count, so empty buckets can never divide by
    zero. psi_term >= 0 by construction ((q-p) and ln(q/p) share
    sign); sum(psi_term) > 0.2 is the classic retrain/alert threshold.

    Scale shape: groupBy over <= K bucket rows after a single
    map-side-combined pass; the window totals run over the K-row
    aggregate, never the fact table. Both engines evaluate the
    identical expression tree ((n+0.5)/total, one division each) so
    the driver hash-checks the rounded PSI exactly.

    Seed: R12's fetch-ledger health checks
    (``/root/reference/app.py:243-268``) — existence monitoring
    generalized to distribution monitoring."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.lit(_DRIFT_K - 1),
        F.floor(F.col("o_totalprice") / _DRIFT_BUCKET_W),
    ).cast("long")
    is_base = (
        F.col("o_orderdate") < F.lit(_DRIFT_CUTOFF).cast("timestamp")
    ).cast("int")
    g = orders.groupBy(bucket.alias("bucket_id")).agg(
        F.sum(is_base).cast("long").alias("n_base"),
        F.sum(1 - is_base).cast("long").alias("n_cur"),
    )
    w = W.partitionBy(F.lit(1))
    p = (F.col("n_base") + 0.5) / (
        F.sum("n_base").over(w) + F.lit(0.5 * _DRIFT_K)
    )
    q = (F.col("n_cur") + 0.5) / (
        F.sum("n_cur").over(w) + F.lit(0.5 * _DRIFT_K)
    )
    return g.select(
        "bucket_id",
        "n_base",
        "n_cur",
        F.round((q - p) * F.log(q / p), 8).alias("psi_term"),
    )
