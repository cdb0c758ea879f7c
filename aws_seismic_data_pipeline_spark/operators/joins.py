"""Join operators (SURVEY.md §2B).

Seeds in the reference: the endpoint lookup join with missing-key drop
(``/root/reference/app.py:235-244`` → inner + left-anti), the
exists-check dedup (``app.py:271-273``, ``app.py:419-421`` → left-semi/
left-anti against a sink listing), and the 4-level nested-loop cartesian
fan-out (``app.py:569-575`` → crossJoin).

Scale notes per operator in docstrings; dimension sides are explicitly
``broadcast()`` so a 1000-executor plan avoids shuffling the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "join_inner_equi",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'O'
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join (seed R8). Catalyst picks broadcast vs sort-merge;
    at 100 TB customer is the smaller side and AQE converts to
    broadcast-hash if it fits, else both sides shuffle on custkey."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load_table(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_broadcast",
    oracle="""
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 10
        GROUP BY p.p_brand
    """,
    tags=("join", "broadcast"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim side (seed R8): fact table never
    shuffles for the join; only the final small agg shuffles. This
    operator IS the broadcast-hint demo, so the pin is its semantics;
    note part scales with SF (TPC-H SF×200k rows) — production users
    of this pattern hint only dims they KNOW stay under the budget,
    size-filtered here (p_size <= 10 keeps ~20%), and otherwise leave
    the choice to AQE (see the discipline note in analytics.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               ROUND(COALESCE(SUM(o.o_totalprice), 0.0), 2) AS total_spent
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preserve-left join; customers with zero orders survive (seed R8
    variant — reference logs-and-drops, outer join keeps + marks)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "join_left_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
        )
    """,
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join (seed R10: 'is this file already fetched')."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return cust.join(big, big.o_custkey == cust.c_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_left_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    """,
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-existence join (seed R10/R26: skip-already-present dedup;
    reference does per-file ``outfile.is_file()`` at app.py:271-273 —
    here one distributed anti-join against the sink listing)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, orders.o_custkey == cust.c_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_full_outer",
    oracle="""
        WITH od AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        ),
        ed AS (
            SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        )
        SELECT COALESCE(od.day, ed.day) AS day, od.n_orders, ed.n_events
        FROM od FULL OUTER JOIN ed ON od.day = ed.day
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: reconcile two daily activity ledgers, keeping
    days present in either (seed R27 — migration reconciliation needs
    src-only, dest-only AND matched rows in one pass). The fixture date
    ranges are disjoint, so both null-extension sides are exercised."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    od = (
        orders.select(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        events.select(F.date_trunc("day", F.col("ts")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    joined = od.join(ed, od.day == ed.day, "full_outer")
    return joined.select(
        F.coalesce(od.day, ed.day).alias("day"), "n_orders", "n_events"
    )


@register(
    "join_cross",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian fan-out (seed R2: nets × stations × locs × chans at
    app.py:569-575). Only ever sane when both sides are dimensions —
    Spark broadcasts the smaller side (BroadcastNestedLoopJoin)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).select("r_name", "n_name")


@register(
    "join_theta_range",
    oracle="""
        WITH tiers(tier, lo, hi) AS (
            VALUES ('small', 0.0, 50000.0),
                   ('medium', 50000.0, 150000.0),
                   ('large', 150000.0, 300000.0),
                   ('jumbo', 300000.0, 1000000.0)
        )
        SELECT t.tier,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS tier_value
        FROM orders o
        JOIN tiers t ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
        GROUP BY t.tier
    """,
    tags=("join", "range"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding (theta/range) join (seed R4/R5 interval containment).

    The band table is tiny → broadcast nested-loop join, which is the
    *correct* 100 TB plan: each fact row tests 4 ranges locally, no
    shuffle of the fact table at all."""
    orders = load_table(spark, sf_dir, "orders")
    tiers = spark.createDataFrame(
        [
            ("small", 0.0, 50000.0),
            ("medium", 50000.0, 150000.0),
            ("large", 150000.0, 300000.0),
            ("jumbo", 300000.0, 1000000.0),
        ],
        "tier string, lo double, hi double",
    )
    cond = (orders.o_totalprice >= tiers.lo) & (orders.o_totalprice < tiers.hi)
    return (
        orders.join(F.broadcast(tiers), cond, "inner")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("tier_value"),
        )
    )


@register(
    "join_salted_skew",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               ROUND(SUM(l.l_extendedprice), 2) AS total_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: the skew-mitigation pattern, oracle-proven
    result-identical to the plain join.

    Mechanics: the probe side gets a random-free deterministic salt
    (key mod SALT) appended to its join key; the build side is exploded
    SALT ways so every salted key finds its match. A single hot key's
    rows now spread over SALT reducers instead of one. At 100 TB this
    (or AQE's skewJoin, enabled in session.py) is what keeps the
    longest task from dominating the stage. SALT=8 here; pick
    ~(hot-key rows / target-partition rows) in production."""
    SALT = 8
    # salt varies WITHIN a join key (hash includes linenumber, not just
    # orderkey) — that's what spreads one hot key over SALT reducers;
    # hash-pmod rather than (l_linenumber % SALT) because l_linenumber
    # is 1..7 in the fixture and a modulo would leave salt 0 unused
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT)).cast("int")
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
    )
    joined = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey) & (li.salt == orders.salt),
        "inner",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


#: salt fan-out for the hot-key demo (and its balance test/bench slot)
_HOT_SALT = 8


def salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join over a DELIBERATELY skewed key: every even
    lineitem is remapped onto the single hot key 0 (~half the fact
    table landing on one join key — the pathological distribution
    salting exists for; the fixture's 0-based orderkeys make 0 a real
    order, asserted in tests/test_catalog_scale.py so a re-keyed
    fixture can't silently turn the demo vacuous), probe-side salt =
    ``pmod(hash(l_orderkey, l_linenumber), SALT)`` — a hash, not a
    modulo of l_linenumber, whose 1..7 fixture range would leave salt
    buckets dead (see inline comment) — build side exploded SALT ways.
    Returns the pre-aggregation join output so callers (the balance
    test) can inspect the row distribution the shuffle actually
    produced."""
    # salt via hash, not (l_linenumber % SALT): l_linenumber is 1..7 in
    # the fixture, so a modulo salt would never emit 0 — only SALT-1
    # buckets used and 1/SALT of the exploded build side dead weight
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .cast("long"),
    ).withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(_HOT_SALT)).cast("int")
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_HOT_SALT - 1)))
    )
    return li.join(
        orders,
        (li.skew_key == orders.o_orderkey) & (li.salt == orders.salt),
        "inner",
    )


@register(
    "join_salted_skew_hot",
    oracle="""
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               ROUND(SUM(l.l_extendedprice), 2) AS total_price
        FROM lineitem l
        JOIN orders o
          ON (CASE WHEN l.l_orderkey % 2 = 0 THEN 0
                   ELSE l.l_orderkey END) = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew"),
)
def join_salted_skew_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join_salted_skew`` under REAL skew: the plain registered query
    joins on the uniform l_orderkey, so the salting there is insurance
    the fixture never stresses. Here ~half the fact rows collapse onto
    ONE hot key before the join — without salting, every row of the
    hot key lands in a single reducer (a 50%-of-the-table straggler
    task at any scale); with the salt the hot key spreads over SALT
    reducers, pinned by the partition-balance assertion in
    tests/test_catalog_scale.py and timed as a bench slot. The oracle
    proves the salted plan is result-identical to the plain skewed
    join."""
    return salted_hot_join(spark, sf_dir).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               ROUND(SUM(l.l_quantity), 2) AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice
    """,
    tags=("join", "bucketed"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides written ``bucketBy`` the
    join key, so the join AND the following same-key aggregation run
    with ZERO exchanges (verify: no Exchange above the scans in
    ``.explain``; tests/test_plans.py asserts it).

    This is the 100 TB answer for a fact-fact join repeated across
    runs: pay the bucketing shuffle once at write time, then every
    downstream join/agg on that key is shuffle-free. Bucket count 8
    here; size so each bucket ≈ one task's worth at target scale."""
    import os
    import tempfile

    prepare_dir = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if not prepare_dir:
        prepare_dir = os.path.join(tempfile.gettempdir(), "spark_graft_warehouse")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    t_orders, t_li = f"orders_b_{sf_tag}", f"lineitem_b_{sf_tag}"
    for name, df, key in ((t_orders, orders, "o_orderkey"), (t_li, li, "l_orderkey")):
        if not spark.catalog.tableExists(name):
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(prepare_dir, name))
                .saveAsTable(name)
            )
    # merge hint: at fixture scale Catalyst would broadcast the small
    # side (hiding the point); the hint forces the sort-merge path that
    # a fact-fact join takes at 100 TB, where bucketing removes both
    # the exchange and the sort
    o = spark.table(t_orders).hint("merge")
    l = spark.table(t_li)
    return (
        o.join(l, l.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "join_asof_nearest",
    oracle="""
        SELECT c.event_id,
               c.user_id,
               CAST(c.ts AS TIMESTAMP) AS click_ts,
               (
                   SELECT MAX(CAST(p.ts AS TIMESTAMP)) FROM events p
                   WHERE p.user_id = c.user_id
                     AND p.event_type = 'purchase'
                     AND p.ts <= c.ts
               ) AS last_purchase_ts
        FROM events c
        WHERE c.event_type = 'click'
    """,
    tags=("join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: enrich each click with the latest purchase at-or-before
    it for the same user (SURVEY §2B join_asof_nearest; no reference
    seed — north-star capability).

    Implementation is the scale-correct union+window plan, NOT a range
    join: union both event streams, partition by user, order by time, and
    carry the last purchase timestamp forward with ``last(..., ignore
    nulls)``. One shuffle on user_id, linear scan per partition — this
    survives 100 TB where a per-row correlated lookup cannot."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_purchase")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
    )
    unioned = clicks.unionByName(purchases)
    # purchases sort before clicks at identical ts so "at-or-before" holds
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = unioned.withColumn(
        "last_purchase_ts",
        F.last(F.when(F.col("is_purchase") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return enriched.filter(F.col("is_purchase") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "last_purchase_ts",
    )


@register(
    "join_asof_tolerance",
    oracle="""
        -- staleness via exact integer microseconds (floor-divided to
        -- seconds): epoch() doubles would round vs Spark's floor
        SELECT event_id, user_id, click_ts,
               CASE WHEN last_purchase_ts IS NOT NULL
                         AND date_diff('microsecond', last_purchase_ts,
                                       click_ts) <= CAST(7200000000 AS BIGINT)
                    THEN last_purchase_ts END AS last_purchase_ts,
               CASE WHEN last_purchase_ts IS NOT NULL
                         AND date_diff('microsecond', last_purchase_ts,
                                       click_ts) <= CAST(7200000000 AS BIGINT)
                    THEN CAST(date_diff('microsecond', last_purchase_ts,
                                        click_ts) // 1000000 AS BIGINT)
               END AS staleness_s
        FROM (
            SELECT c.event_id,
                   c.user_id,
                   CAST(c.ts AS TIMESTAMP) AS click_ts,
                   (
                       SELECT MAX(CAST(p.ts AS TIMESTAMP)) FROM events p
                       WHERE p.user_id = c.user_id
                         AND p.event_type = 'purchase'
                         AND p.ts <= c.ts
                   ) AS last_purchase_ts
            FROM events c
            WHERE c.event_type = 'click'
        )
    """,
    tags=("join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a MAX-STALENESS tolerance (pandas merge_asof's
    ``tolerance=``, the feature-engineering default): each click gets
    the latest at-or-before purchase only if it happened within 2
    hours; staler matches are nulled rather than joined, and the
    staleness itself is emitted for downstream feature use.

    Same scale-correct union+window plan as ``join_asof_nearest`` (one
    user_id shuffle, linear per-partition sweep — never a range join);
    the tolerance is a pure post-window projection, so the cutoff adds
    ZERO plan cost. At 100 TB this is the as-of variant that bounds
    state: features never reference arbitrarily old context."""
    tol_s = 7200
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_purchase")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
    )
    unioned = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_purchase").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = unioned.withColumn(
        "raw_asof_ts",
        F.last(
            F.when(F.col("is_purchase") == 1, F.col("ts")), ignorenulls=True
        ).over(w),
    )
    micros = F.expr("timestampdiff(MICROSECOND, raw_asof_ts, ts)")
    in_tol = F.col("raw_asof_ts").isNotNull() & (micros <= tol_s * 1_000_000)
    return enriched.filter(F.col("is_purchase") == 0).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.when(in_tol, F.col("raw_asof_ts")).alias("last_purchase_ts"),
        F.when(in_tol, (micros / 1_000_000).cast("long")).alias("staleness_s"),
    )


@register(
    "join_right_outer",
    oracle="""
        SELECT s.s_suppkey, s.s_name, l.l_orderkey, l.l_linenumber, l.l_quantity
        FROM lineitem l
        RIGHT JOIN supplier s ON l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.0
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preserve-right join with a pre-join filter folded into the join
    condition: suppliers keep a row even when no high-quantity lineitem
    matches (null-extended left side). Catalyst normalizes right joins
    to left joins with swapped sides, so this costs the same plan as
    ``join_left_outer``."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return li.join(
        supp,
        (li.l_suppkey == supp.s_suppkey) & (li.l_quantity >= 49.0),
        "right",
    ).select("s_suppkey", "s_name", "l_orderkey", "l_linenumber", "l_quantity")


@register(
    "join_null_safe_eq",
    oracle="""
        WITH flagged AS (
            SELECT NULLIF(l_returnflag, 'N') AS flag_key,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   ROUND(SUM(l_quantity), 2) AS total_qty
            FROM lineitem
            GROUP BY 1
        ),
        order_side AS (
            SELECT NULLIF(l_returnflag, 'N') AS flag_key,
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
            FROM lineitem
            GROUP BY 1
        )
        SELECT f.flag_key, f.n_lines, f.total_qty, o.n_orders
        FROM flagged f
        JOIN order_side o ON f.flag_key IS NOT DISTINCT FROM o.flag_key
    """,
    tags=("join",),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of silently dropping — the semantics
    dimension a standard equi-join gets wrong when the join key is
    derived and legitimately null (here NULLIF turns the 'N' flag into
    NULL on both sides; a plain `=` join would lose that group).

    Catalyst plans `<=>` as a hash join with null-aware key wrapping —
    still an equi-join physically, NOT a nested-loop — so the 100 TB
    posture is unchanged from join_inner_equi. The reference's analog
    is its None-endpoint handling (app.py:239-244), which silently
    drops unmapped stations; null-safe join is how the engine keeps
    them addressable. Both sides here are tiny aggregates (≤3 rows) —
    the point is semantics, not scale."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_key")
    flagged = li.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )
    order_side = li.groupBy(key).agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    return flagged.join(
        order_side,
        flagged.flag_key.eqNullSafe(order_side.flag_key),
    ).select(flagged.flag_key, "n_lines", "total_qty", "n_orders")


@register(
    "join_range_bucketed",
    oracle="""
        SELECT e.event_id AS err_id,
               CAST(COUNT(*) AS BIGINT) AS n_clicks
        FROM events e
        JOIN events c
          ON c.event_type = 'click'
         AND CAST(c.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
         AND CAST(c.ts AS TIMESTAMP) < CAST(e.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
    tags=("join", "range"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big×big range join via time bucketing: clicks landing inside
    each error's 5-minute window. A naive theta join is a cartesian
    product Spark plans as BroadcastNestedLoopJoin — O(|errors|·|clicks|)
    comparisons and a broadcast of a FACT side; at 100 TB that's the
    canonical engine-killer. The scale plan: quantize both sides to
    5-min buckets, explode each error window onto the (≤2) buckets it
    overlaps, EQUI-join on bucket (hash shuffle, both sides pruned to
    candidates that can possibly match), then re-check the exact
    interval as a cheap residual filter. Cost drops to
    O(n·avg_bucket_occupancy); bucket width tunes the trade
    (SNIPPETS.md: the interval-join binning used by Flink and the
    DuckDB IEJoin paper's motivation). Oracle states the same
    semantics as the plain theta join — DuckDB's IEJoin handles it at
    sf0.01. Seed: R4/R5 (chunk-overlap containment, done scalably)."""
    ev = load_table(spark, sf_dir, "events")
    width = 300  # seconds; window spans at most 2 buckets
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("click_ts")
    )
    err_b = errors.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("err_ts").cast("timestamp").cast("double") / width),
                F.floor((F.col("err_ts").cast("timestamp").cast("double") + width) / width),
            )
        ),
    )
    click_b = clicks.withColumn(
        "bucket", F.floor(F.col("click_ts").cast("timestamp").cast("double") / width)
    )
    joined = err_b.join(click_b, "bucket").filter(
        (F.col("click_ts") >= F.col("err_ts"))
        & (
            F.col("click_ts")
            < F.col("err_ts") + F.expr("INTERVAL 5 MINUTES")
        )
    )
    return joined.groupBy("err_id").agg(F.count(F.lit(1)).alias("n_clicks"))


@register(
    "join_bloom_filtered",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "runtime-filter"),
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle join with a RUNTIME row-level bloom filter: the selective
    dimension predicate (c_mktsegment) builds a bloom filter over the
    surviving join keys, and Catalyst injects ``might_contain`` into the
    fact scan — so fact rows that cannot join are dropped BEFORE the
    shuffle. This is the 100 TB shape when the dimension is too big to
    broadcast (broadcast is disabled here to force it): without the
    bloom filter every fact row pays the exchange; with it the shuffle
    carries only the ~1/N segment that can match.

    Session isolation: runtime-filter thresholds are tuned for injection
    at fixture scale on a ``newSession()`` clone (shared SparkContext,
    private SQLConf), so sibling queries' plans — including the plan
    tests that pin broadcast strategies — never see these confs."""
    s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    # fixture fact scans are ~MBs; production default (10GB) is the same
    # trigger logic at real scale
    s2.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0",
    )
    cust = load_table(s2, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(s2, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
        SELECT c.c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    tags=("join", "plan"),
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-STRATEGY control via hint: ``SHUFFLE_HASH`` forces a
    shuffled hash join where the planner's default (for two large
    unsorted sides above the broadcast threshold) is sort-merge. The
    point at 100 TB: when one side comfortably builds an in-memory hash
    table per partition, hash join skips BOTH sort passes sort-merge
    pays — the classic win for a fact-to-mid-size-dim join that is too
    big to broadcast; the hint is the escape hatch when statistics
    mislead the optimizer. Results are strategy-invariant (the driver
    hash-checks against plain SQL); the physical-operator selection
    itself — ShuffledHashJoin chosen, and only for the hinted plan —
    is pinned on the executed plan in tests/test_catalog_scale.py.
    Seed: R8's station-metadata enrichment joins
    (``/root/reference/app.py:328-368``)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = orders.join(
        customer.hint("shuffle_hash"),
        orders.o_custkey == customer.c_custkey,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("total_cents"),
    )


#: sorted-neighborhood window (rank distance) and edit-distance gate
_FUZZY_WINDOW = 3
_FUZZY_MAX_DIST = 1
#: blocking prefix: rows only compare within a block, so the rank
#: window never spans the whole corpus (the fixture's synthetic names
#: share one block; real name corpora spread across many)
_FUZZY_BLOCK_LEN = 9


@register(
    "join_fuzzy_neighborhood",
    oracle=f"""
        WITH clean AS (
            SELECT s_name AS name, 'clean' AS side FROM supplier
        ),
        dirty AS (
            SELECT substring(s_name, 1, len(s_name) - 1) AS name,
                   'dirty' AS side
            FROM supplier WHERE s_suppkey % 7 = 3
        ),
        u AS (
            SELECT name, side,
                   ROW_NUMBER() OVER (
                       PARTITION BY substring(name, 1, {_FUZZY_BLOCK_LEN})
                       ORDER BY name, side) AS rn,
                   substring(name, 1, {_FUZZY_BLOCK_LEN}) AS blk
            FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)
        )
        SELECT DISTINCT d.name AS dirty_name, c.name AS clean_name,
               CAST(levenshtein(d.name, c.name) AS BIGINT) AS dist
        FROM u d JOIN u c
          ON d.blk = c.blk AND d.side = 'dirty' AND c.side = 'clean'
         AND abs(d.rn - c.rn) <= {_FUZZY_WINDOW}
        WHERE levenshtein(d.name, c.name) <= {_FUZZY_MAX_DIST}
    """,
    tags=("join", "llm", "text"),
)
def join_fuzzy_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY entity-resolution join by SORTED-NEIGHBORHOOD blocking:
    union both sides, rank within a blocking prefix, compare only rows
    within a +-3 rank window, verify survivors with exact edit
    distance — candidate pairs are O(n x window) per block instead of
    the n^2 a naive edit-distance join costs (a truncated supplier
    name finds its originals without comparing against every name in
    the corpus). Single-pass sorted neighborhood misses mid-string
    typos that shift sort position (measured: a char dropped mid-name
    found only 2 of 14 originals — the known limitation); production
    runs MULTI-PASS with different sort keys (reversed name, phonetic
    key) and unions the candidate pairs — the demo uses suffix typos,
    which a lexicographic pass always places adjacent. Both engines
    evaluate the identical block/rank/window construction, so the
    driver hash-checks the full match set. Seed: R8's code-based
    matching (``app.py:328-368``) hardened against dirty keys."""
    from pyspark.sql import Window as W

    supplier = load_table(spark, sf_dir, "supplier")
    clean = supplier.select(
        F.col("s_name").alias("name"), F.lit("clean").alias("side")
    )
    dirty = supplier.filter(F.col("s_suppkey") % 7 == 3).select(
        F.expr("substring(s_name, 1, length(s_name) - 1)").alias("name"),
        F.lit("dirty").alias("side"),
    )
    u = (
        clean.unionByName(dirty)
        .withColumn("blk", F.substring("name", 1, _FUZZY_BLOCK_LEN))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("blk").orderBy("name", "side")
            ),
        )
    )
    d = u.filter(F.col("side") == "dirty").select(
        F.col("name").alias("dirty_name"),
        F.col("blk").alias("d_blk"),
        F.col("rn").alias("d_rn"),
    )
    c = u.filter(F.col("side") == "clean").select(
        F.col("name").alias("clean_name"),
        F.col("blk").alias("c_blk"),
        F.col("rn").alias("c_rn"),
    )
    return (
        d.join(
            c,
            (F.col("d_blk") == F.col("c_blk"))
            & (
                F.abs(F.col("d_rn") - F.col("c_rn")) <= _FUZZY_WINDOW
            ),
        )
        .filter(
            F.levenshtein("dirty_name", "clean_name") <= _FUZZY_MAX_DIST
        )
        .select(
            "dirty_name",
            "clean_name",
            F.levenshtein("dirty_name", "clean_name")
            .cast("long")
            .alias("dist"),
        )
        .distinct()
    )


def _fuzzy_pass(u: DataFrame, order_col) -> DataFrame:
    """One sorted-neighborhood candidate pass over the unioned frame:
    rank by ``order_col`` within the block, pair dirty rows with clean
    rows at rank distance <= window. Returns candidate pairs
    (unverified)."""
    from pyspark.sql import Window as W

    ranked = u.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("blk").orderBy(order_col, "side")),
    )
    d = ranked.filter(F.col("side") == "dirty").select(
        F.col("name").alias("dirty_name"),
        F.col("blk").alias("d_blk"),
        F.col("rn").alias("d_rn"),
    )
    c = ranked.filter(F.col("side") == "clean").select(
        F.col("name").alias("clean_name"),
        F.col("blk").alias("c_blk"),
        F.col("rn").alias("c_rn"),
    )
    return d.join(
        c,
        (F.col("d_blk") == F.col("c_blk"))
        & (F.abs(F.col("d_rn") - F.col("c_rn")) <= _FUZZY_WINDOW),
    ).select("dirty_name", "clean_name")


@register(
    "join_fuzzy_multipass",
    oracle=f"""
        WITH clean AS (
            SELECT s_name AS name, 'clean' AS side FROM supplier
        ),
        dirty AS (
            SELECT concat(substring(s_name, 1, 11), substring(s_name, 13))
                       AS name,
                   'dirty' AS side
            FROM supplier WHERE s_suppkey % 7 = 3
        ),
        u AS (
            SELECT name, side,
                   substring(name, 1, {_FUZZY_BLOCK_LEN}) AS blk
            FROM (SELECT * FROM clean UNION ALL SELECT * FROM dirty)
        ),
        fwd AS (
            SELECT name, side, blk,
                   ROW_NUMBER() OVER (PARTITION BY blk
                                      ORDER BY name, side) AS rn
            FROM u
        ),
        rev AS (
            SELECT name, side, blk,
                   ROW_NUMBER() OVER (PARTITION BY blk
                                      ORDER BY reverse(name), side) AS rn
            FROM u
        ),
        cand AS (
            SELECT d.name AS dirty_name, c.name AS clean_name
            FROM fwd d JOIN fwd c
              ON d.blk = c.blk AND d.side = 'dirty' AND c.side = 'clean'
             AND abs(d.rn - c.rn) <= {_FUZZY_WINDOW}
            UNION
            SELECT d.name, c.name
            FROM rev d JOIN rev c
              ON d.blk = c.blk AND d.side = 'dirty' AND c.side = 'clean'
             AND abs(d.rn - c.rn) <= {_FUZZY_WINDOW}
        )
        SELECT dirty_name, clean_name,
               CAST(levenshtein(dirty_name, clean_name) AS BIGINT) AS dist
        FROM cand
        WHERE levenshtein(dirty_name, clean_name) <= {_FUZZY_MAX_DIST}
    """,
    tags=("join", "llm", "text"),
)
def join_fuzzy_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-PASS sorted-neighborhood matching — the production remedy
    for single-pass blindness: a char dropped MID-NAME shifts the
    lexicographic sort position so far that the forward pass finds only
    2 of 14 originals (measured), but the same typo barely moves the
    REVERSED-name order, and the union of both passes' candidate
    windows recovers all 14 (pinned in tests). Each pass is the same
    block/rank/window construction over a different sort key (phonetic
    keys are the classic third pass); candidates stay O(n x window x
    passes) per block and the exact edit-distance verify is shared. The
    driver hash-checks the full union against the identical two-pass
    SQL."""
    supplier = load_table(spark, sf_dir, "supplier")
    clean = supplier.select(
        F.col("s_name").alias("name"), F.lit("clean").alias("side")
    )
    dirty = supplier.filter(F.col("s_suppkey") % 7 == 3).select(
        F.expr(
            "concat(substring(s_name, 1, 11), substring(s_name, 13))"
        ).alias("name"),
        F.lit("dirty").alias("side"),
    )
    u = clean.unionByName(dirty).withColumn(
        "blk", F.substring("name", 1, _FUZZY_BLOCK_LEN)
    )
    cand = _fuzzy_pass(u, F.col("name")).unionByName(
        _fuzzy_pass(u, F.reverse(F.col("name")))
    ).distinct()
    return cand.filter(
        F.levenshtein("dirty_name", "clean_name") <= _FUZZY_MAX_DIST
    ).select(
        "dirty_name",
        "clean_name",
        F.levenshtein("dirty_name", "clean_name").cast("long").alias("dist"),
    )


@register(
    "join_interval_overlap",
    oracle="""
        SELECT e.event_id AS err_id,
               CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_overlaps
        FROM events e
        JOIN events p
          ON p.event_type = 'purchase'
         AND CAST(e.ts AS TIMESTAMP)
             <= CAST(p.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
         AND CAST(p.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
             <= CAST(e.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
    tags=("join", "range"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL×INTERVAL overlap join — the two-sided sibling of
    ``join_range_bucketed``'s point-in-window: error incidents span
    [ts, ts+10min], purchase attribution windows span [ts-5min,
    ts+5min], and the question is which pairs OVERLAP (a.start <=
    b.end AND b.start <= a.end — the standard interval predicate).
    Naive planning is again a BroadcastNestedLoopJoin cartesian; the
    scale plan decomposes BOTH sides onto the fixed-width buckets each
    interval covers (explode over a sequence — an interval touching k
    buckets emits k rows), equi-joins on bucket, DISTINCTs the
    (a, b) id pairs (an overlapping pair shares up to
    min(ka, kb) buckets and must count once), and re-checks the exact
    predicate as a residual. Cost O(n · avg intervals per bucket);
    width tunes duplication vs candidate density exactly as in
    Flink's interval join. Seed: R4/R5 — the reference's chunk-overlap
    test IS this predicate, one pair at a time in Python."""
    ev = load_table(spark, sf_dir, "events")
    width = 300  # seconds
    sec = lambda c: F.col(c).cast("timestamp").cast("double")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        sec("ts").alias("a_start"),
        (sec("ts") + 600).alias("a_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        (sec("ts") - 300).alias("b_start"),
        (sec("ts") + 300).alias("b_end"),
    )

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / width),
                    F.floor(F.col(end) / width),
                )
            ),
        )

    pairs = (
        bucketed(errors, "a_start", "a_end")
        .join(bucketed(purchases, "b_start", "b_end"), "bucket")
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select("err_id", "p_id")
        .distinct()
    )
    return pairs.groupBy("err_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlaps")
    )
