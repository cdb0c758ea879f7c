"""Scans, projections, filters (SURVEY.md §2B).

Generalizes the reference's per-file scan loops and string-built
projections (``/root/reference/app.py:174-211`` ``form_request``,
``app.py:257-268`` output-name projection, ``app.py:296-299``
empty-payload filter) into declarative DataFrame plans. Filters and
column selections here are written so Catalyst pushes them into the
parquet scan (verify with ``.explain``: ``PushedFilters`` non-empty,
``ReadSchema`` pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "scan_parquet",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1995-06-01'
    """,
    tags=("scan", "pushdown"),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with predicate pushdown + column pruning (seed R25).

    At 100 TB this is the operator that matters most: the plan must show
    a pruned ReadSchema (4 of 11 columns) and a pushed l_shipdate filter
    so row groups outside the range are skipped via parquet min/max.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1995-06-01"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "project_expr",
    oracle="""
        SELECT
            l_orderkey,
            l_linenumber,
            l_extendedprice * (1 - l_discount) AS net_price,
            l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
            UPPER(l_returnflag) AS rflag
        FROM lineitem
    """,
    tags=("project",),
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (seed R7/R9: URL + filename builders).

    Note: no ROUND() on the computed doubles — ROUND(double, n) halfway
    cases differ between Spark (BigDecimal HALF_UP on the exact binary
    value) and DuckDB, which breaks exact value-hash parity. Plain IEEE
    double arithmetic is bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("charged"),
        F.upper("l_returnflag").alias("rflag"),
    )


@register(
    "filter_predicate",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE (l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0)
           OR (l_returnflag = 'R' AND l_quantity >= 45.0)
    """,
    tags=("filter",),
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicate filter (seed R14/R26)."""
    li = load_table(spark, sf_dir, "lineitem")
    p1 = F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24.0)
    p2 = (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45.0)
    return li.filter(p1 | p2).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_in_set",
    oracle="""
        SELECT p_partkey, p_brand, p_size
        FROM part
        WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
          AND p_size IN (1, 5, 9, 14, 19, 23)
    """,
    tags=("filter",),
)
def filter_in_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-membership filter (seed R8: endpoint-map membership)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23)
    ).select("p_partkey", "p_brand", "p_size")


@register(
    "sql_text_interface",
    oracle="""
        SELECT n.n_name,
               CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS total_balance
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0.0
        GROUP BY n.n_name
    """,
    tags=("sql",),
)
def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL face: the same ANSI SQL text the oracle runs,
    executed verbatim by ``spark.sql()`` over registered temp views —
    proving users can bring raw SQL, not just the DataFrame DSL, and
    Catalyst parses/plans it identically (DataFrame and SQL share one
    logical-plan IR; this query and the DSL version compile to the same
    physical plan). Views registered per-call are session-scoped and
    idempotent. Seed: the reference has no query language at all —
    this is the capability gap §3 calls out."""
    for t in ("customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(DISTINCT c.c_custkey) AS n_customers,
               ROUND(SUM(c.c_acctbal), 2) AS total_balance
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > 0.0
        GROUP BY n.n_name
        """
    )


@register(
    "plan_cache_reuse",
    oracle="""
        WITH filtered AS (
            SELECT l_suppkey, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
        ),
        by_supp AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice), 2) AS supp_revenue
            FROM filtered GROUP BY l_suppkey
        ),
        overall AS (
            SELECT ROUND(AVG(l_quantity), 4) AS global_avg_qty,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM filtered
        )
        SELECT b.l_suppkey, b.supp_revenue, o.global_avg_qty, o.n_lines
        FROM by_supp b CROSS JOIN overall o
    """,
    tags=("plan", "cache"),
)
def plan_cache_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized intermediate reuse: one filtered scan feeds TWO
    aggregates (per-supplier revenue + a global profile broadcast back
    onto every row). ``persist()`` pins the filtered projection in
    executor memory so the second aggregate reads the in-memory
    columnar cache instead of re-scanning parquet — the interactive /
    iterative-workload pattern (PAPERS.md: RDD lineage & caching is
    Spark's founding idea). At 100 TB you cache the FILTERED slice
    (fits memory budget), never the raw table; MEMORY_AND_DISK spills
    gracefully if it doesn't. The unpersist is deliberate: caches are
    plan-scoped, not session leaks."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem")
    filtered = (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp_ntz(F.lit("1997-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp_ntz(F.lit("1998-01-01")))
        )
        .select("l_suppkey", "l_quantity", "l_extendedprice")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        by_supp = filtered.groupBy("l_suppkey").agg(
            F.round(F.sum("l_extendedprice"), 2).alias("supp_revenue")
        )
        overall = filtered.agg(
            F.round(F.avg("l_quantity"), 4).alias("global_avg_qty"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        out = by_supp.join(F.broadcast(overall))
        # force materialization while the cache is alive; the returned
        # plan then reads the cached levels
        out = out.localCheckpoint(eager=True)
    finally:
        filtered.unpersist()
    return out


#: ONE ANSI SQL text both engines execute verbatim (Spark 4 supports
#: WITH RECURSIVE): a 24-month recursive calendar spine left-joined to
#: monthly order rollups — months with no orders still appear.
_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE mi(n) AS (
        SELECT 0
        UNION ALL
        SELECT n + 1 FROM mi WHERE n < 23
    ),
    cal AS (
        SELECT make_date(1996 + CAST(FLOOR(n / 12.0) AS INTEGER),
                         1 + n % 12, 1) AS month_start
        FROM mi
    ),
    monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT c.month_start,
           CAST(COALESCE(mo.n_orders, 0) AS BIGINT) AS n_orders,
           ROUND(COALESCE(mo.revenue, 0.0), 2) AS revenue
    FROM cal c
    LEFT JOIN monthly mo ON mo.m = c.month_start
"""


@register("sql_recursive_cte", oracle=_RECURSIVE_CTE_SQL, tags=("sql",))
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive common table expressions — the SQL-surface capability
    Spark lacked until 4.x (``WITH RECURSIVE``, the standard form for
    hierarchies, transitive closures, and spines): a 24-month calendar
    generated by recursion, left-joined to monthly order rollups so
    empty months still report. The SAME SQL text is the oracle —
    Spark's recursion semantics (UNION ALL iteration to fixpoint)
    must match DuckDB's exactly.

    Scale shape: the recursion materializes |months| rows (driver
    scale); the order rollup is one map-side-combinable agg; the spine
    join broadcasts the calendar. Recursion depth is bounded by the
    anchor predicate, never data-dependent here."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_CTE_SQL)


@register(
    "sql_parameterized",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    tags=("sql",),
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (``spark.sql(text, args={...})``): the query
    text carries named ``:placeholders`` and the values bind
    server-side as literals in the parsed plan — the injection-safe
    interface a query service puts in front of this engine (the
    reference interpolates user-supplied station/date strings into
    URLs and object keys, ``app.py:206-208``; this is that interface
    done safely). Binding happens BEFORE optimization, so bound
    predicates still push down to the scan and prune partitions like
    hand-written literals. Same aggregate as the oracle's literal SQL,
    proving bound == inlined."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_param"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders_param
        WHERE o_orderdate >= :start
          AND o_orderdate < :end
          AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={
            "start": "1995-01-01 00:00:00",
            "end": "1996-01-01 00:00:00",
            "status": "F",
        },
    )


@register(
    "pandas_api_groupby",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal_cents
        FROM customer
        WHERE c_acctbal > 0.0
        GROUP BY c_mktsegment
    """,
    tags=("sql", "pandas-api"),
)
def pandas_api_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pandas-on-Spark API surface (``pyspark.pandas``): a user
    who thinks in pandas — boolean-mask filter, column arithmetic,
    ``groupby().agg()`` — gets the SAME distributed Catalyst plan as
    the DataFrame DSL (`to_spark()` exposes it; the oracle proves the
    semantics line up, integer-cents to dodge float summation order).
    This is the third query face of the engine after the DataFrame DSL
    and raw SQL (``sql_text_interface``) — migration-path coverage for
    pandas codebases, not a recommendation: the native DSL states
    intent more directly."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import pyspark.pandas as ps

        psdf = ps.DataFrame(
            load_table(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment", "c_acctbal"
            )
        )
        psdf = psdf[psdf["c_acctbal"] > 0.0]
        psdf["bal_cents"] = (psdf["c_acctbal"] * 100).round(0).astype("long")
        out = (
            psdf.groupby("c_mktsegment")
            .agg(n_cust=("c_custkey", "count"), bal_cents=("bal_cents", "sum"))
            .reset_index()
        )
        return out.to_spark().select(
            "c_mktsegment",
            F.col("n_cust").cast("long").alias("n_cust"),
            F.col("bal_cents").cast("long").alias("bal_cents"),
        )


@register(
    "sql_scripting",
    oracle="""
        WITH base AS (
            SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        // COUNT(*) AS BIGINT) AS avg_cents
            FROM orders
        ),
        cut AS (
            SELECT ((((avg_cents * 11) // 10) * 11 // 10) * 11 // 10)
                       AS cutoff_cents
            FROM base
        )
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               c.cutoff_cents
        FROM orders o, cut c
        WHERE CAST(ROUND(o.o_totalprice * 100) AS BIGINT) > c.cutoff_cents
        GROUP BY o.o_orderstatus, c.cutoff_cents
    """,
    tags=("sql", "scripting"),
)
def sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4's procedural BEGIN..END blocks): DECLARE,
    scalar-subquery SET, and a WHILE loop run server-side as one script
    — the stored-procedure-style migration/maintenance logic
    (escalating a threshold, retrying a step) that previously needed a
    Python driver loop with a round trip per statement. The loop's
    arithmetic is INTEGER cents (DIV), so the escalated cutoff is
    bit-exact in both engines and the driver hash-checks the scripted
    result against a purely declarative oracle that algebraically
    unrolls the three iterations. Seed: R21/R26's migrate-and-verify
    scripts (``/root/reference/upload_to_rfs.py``) — procedural control
    flow the engine now executes natively."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE i INT DEFAULT 0;
              DECLARE cutoff_cents BIGINT;
              SET cutoff_cents = (
                  SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         DIV COUNT(*)
                  FROM orders_v);
              WHILE i < 3 DO
                SET cutoff_cents = cutoff_cents * 11 DIV 10;
                SET i = i + 1;
              END WHILE;
              SELECT o_orderstatus,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     cutoff_cents
              FROM orders_v
              WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > cutoff_cents
              GROUP BY o_orderstatus, cutoff_cents;
            END
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.scripting.enabled", old)


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_totalprice > 100000.0
        GROUP BY o_orderpriority
    """,
    tags=("sql",),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL PIPE syntax (`|>`) — the linear query form the SQL
    standard committee is converging on (and the shape dbt/Malloy users
    expect): each stage reads top-to-bottom instead of inside-out, and
    Catalyst compiles it to the SAME logical plan as the nested
    equivalent — the oracle runs the classic form, this runs the piped
    form, and the driver hash proves they agree bit-for-bit. Another
    face of the one-IR property ``sql_text_interface`` pins for
    classic SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_pipe_v"
    )
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_totalprice > 100000.0
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS total_cents
           GROUP BY o_orderpriority
        """
    )
