"""Window (analytic) functions + sort/limit/top-k (SURVEY.md §2B).

Seeds: gap detection between hourly chunks (``/root/reference/
app.py:336-353`` chunk iteration → lag/lead), the ±120 s buffered
window (``app.py:373-380`` → frame aggregates).

Every ordering includes a unique key as the final sort term so top-k /
limit results are deterministic (the driver hash compares exact row
sets — ties must break identically in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "window_rank",
    oracle="""
        SELECT * FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rn,
                   CAST(RANK() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS BIGINT) AS rnk
            FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per priority with row_number + rank.

    Scale: one shuffle on the partition key; row_number needs no global
    sort — each partition sorts locally. For very hot keys pre-filter
    with an approximate per-group threshold before ranking."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               CAST(ts AS TIMESTAMP) AS ts,
               CAST(date_diff('microsecond',
                    LAG(CAST(ts AS TIMESTAMP)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id),
                    CAST(ts AS TIMESTAMP)) AS BIGINT) AS micros_since_prev,
               LEAD(event_id) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_event_id
        FROM events
        WHERE event_type = 'click'
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gaps per user (seed R4: detecting missing hourly
    chunks between consecutive fetches). Microsecond diffs are exact
    integers — immune to float/trunc mismatches across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.withColumn("prev_ts", F.lag("ts").over(w)).select(
        "event_id",
        "user_id",
        "ts",
        F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").cast("long").alias(
            "micros_since_prev"
        ),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@register(
    "window_frame_agg",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               ROUND(AVG(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS moving_avg_3,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_total
        FROM orders
    """,
    tags=("window",),
)
def window_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average + running total per customer (seed R5: the ±buffer
    frame around each chunk).

    moving_avg_3 rounds at 4dp, not 2: short frames average 2dp prices
    over 2 rows, landing exactly on 2dp halfway points (.xx5) where
    Spark's and DuckDB's double-round implementations disagree; at 4dp
    the true values (3dp or repeating /3) are never near halfway."""
    orders = load_table(spark, sf_dir, "orders")
    order_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.avg("o_totalprice").over(order_w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
        F.round(
            F.sum("o_totalprice").over(order_w.rowsBetween(W.unboundedPreceding, 0)), 2
        ).alias("running_total"),
    )


@register(
    "window_ntile_dist",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile,
               PERCENT_RANK() OVER w AS bal_pct_rank,
               CUME_DIST() OVER w AS bal_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per segment: quartile bucketing and rank
    ratios (percent_rank/cume_dist are exact rational values — int
    counts divided identically in both engines, so no rounding).

    This is the API witness for the BUILTIN window functions,
    partitioned by market segment — each task still sees
    |customers|/|segments| rows, so at production scale a low-
    cardinality partition key makes this the same funnel in milder
    form. The scale path for global/coarse-key NTILE is
    :func:`distributed_ntile` (witnessed by ``window_ntile_global``);
    keep this form only where the partition key's cardinality is a
    real fan-out."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list,
    n_tiles: int,
    out_name: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """NTILE(k) over a GLOBAL total order WITHOUT the single-partition
    collapse: Spark plans an unpartitioned ``ntile().over(orderBy(...))``
    as ``Exchange SinglePartition`` + one WindowExec task — all rows
    through one core, the round-9 verdict's scale-killer. This computes
    the identical assignment distributed:

    1. ``repartitionByRange`` on the order key (a total order — callers
       must include a unique tiebreak column, same as any cross-engine
       window), sort within partitions, stamp
       ``monotonically_increasing_id``, and MATERIALIZE
       (localCheckpoint) — Spark resamples range boundaries with a
       fresh seed per execution, so the counts pass and the rank
       expressions must read one pinned layout, never two executions
       of the same exchange;
    2. collect the PER-PARTITION ROW COUNTS — ≤ ``num_partitions``
       scalars, never data — and prefix-sum them into rank offsets;
    3. global rank = offset + local position, both decoded from the
       id's 64-bit layout (partition index << 33 | row offset) as pure
       expressions, the offsets riding in as a literal array — no
       window, no join;
    4. assign the tile from (rank, n) by the exact SQL NTILE sizing
       rule — the first ``n % k`` tiles get ``ceil(n/k)`` rows, the
       rest ``floor(n/k)`` — bit-identical to NTILE(k) in any engine.

    Cost: ONE data-frame shuffle (the range exchange), one
    materialization of the frame, and a ``num_partitions``-row collect.
    No task ever sees more than ~n/P rows, so the shape survives a
    10^9-row frame where the builtin global NTILE would funnel it
    through one task (at that scale swap the localCheckpoint for
    persist(DISK_ONLY) and unpersist after the action)."""
    return distributed_ntile_multi(
        df, [(order_cols, n_tiles, out_name)], num_partitions, n_rows=n_rows
    )


def distributed_ntile_multi(
    df: DataFrame,
    specs: list[tuple[list, int, str]],
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Several global NTILEs over one frame (RFM's shape: 3 metrics)
    with ONE driver round trip: every spec's per-partition counts come
    from a single tagged-union job over the base frame — range
    boundaries are sampled from the ORDER KEYS only, so counts computed
    on the base are valid for the chained passes that carry earlier
    specs' score columns. The tile passes then chain lazily (each is a
    pinned-layout pass — range exchange + within-partition sort + id
    stamp + localCheckpoint (``_pinned_layout``) — whose per-partition
    counts feed the exact NTILE sizing expression; one driver collect
    of ≤ ``num_partitions`` count scalars per spec. See
    :func:`distributed_ntile` for the rank/sizing mechanics.

    Partitioning is sized from the OBSERVED row count (the catalog
    ``spread()`` convention — conditional on input size, never baked
    in): ~256k rows per task, clamped to the session's shuffle
    parallelism. A fixture-scale frame gets a handful of tasks instead
    of paying 32 empty task launches per pass; a 10^9-row frame gets
    the full parallelism (thousands of tasks on a real cluster's
    shuffle.partitions). ``n_rows`` supplies the count from metadata
    (manifest/catalog stats) so sizing never re-scans the lineage —
    see :func:`_auto_partitions`."""
    num_partitions = _auto_partitions(df, num_partitions, n_rows)
    out = df
    for order_cols, n_tiles, out_name in specs:
        ranged, counts = _pinned_layout(out, order_cols, num_partitions)
        n = int(sum(counts.values()))
        rank = (
            _offset_expr(counts, num_partitions)
            + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
            + 1
        )
        q, rem = divmod(n, max(int(n_tiles), 1))
        threshold = rem * (q + 1)
        tile = F.when(
            rank <= F.lit(threshold),
            ((rank - 1) / F.lit(q + 1)).cast("long") + 1,
        ).otherwise(
            # unreachable when q == 0 (threshold == n covers all rows);
            # max(q,1) only keeps the expression well-typed under ANSI
            F.lit(rem)
            + ((rank - F.lit(threshold) - 1) / F.lit(max(q, 1))).cast("long")
            + 1
        )
        out = ranged.withColumn(out_name, tile.cast("long")).drop("_mid")
    return out


def _auto_partitions(
    df: DataFrame, num_partitions: int | None, n_rows: int | None = None
) -> int:
    """Partition count for the pinned-layout primitives, sized from the
    OBSERVED row count (the catalog ``spread()`` convention): ~256k rows
    per task, clamped to the session's shuffle parallelism, floor 2 (a
    1-partition range exchange plans as Exchange SinglePartition — the
    exact shape these primitives exist to avoid).

    ``n_rows`` lets the caller supply the count from METADATA — a
    governed scan answers it from the stats manifest
    (``GovernedTable.row_count()``, summed from footer stats with zero
    data pages), a catalog table from ANALYZE stats — so the sizing
    pass never re-scans the frame's lineage. Only when neither hint is
    given does this fall back to ``df.count()``; the count only changes
    the answer at SMALL scale (above ~256k x shuffle.partitions rows
    the clamp binds and the answer is the session parallelism), so an
    approximate hint is safe."""
    if num_partitions is not None:
        return int(num_partitions)
    spark = df.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_total = int(n_rows) if n_rows is not None else df.count()
    return max(2, min(shuffle_p, -(-n_total // 262_144)))


def _pinned_layout(
    df: DataFrame, order_cols: list, num_partitions: int
) -> tuple[DataFrame, dict[int, int]]:
    """The shared machinery of the distributed global-order family:
    range-exchange on the (unique-tiebreak) order key, sort within
    partitions, stamp ``monotonically_increasing_id``, and MATERIALIZE
    via localCheckpoint — Spark resamples range boundaries with a fresh
    seed per execution, so the per-partition counts and every rank
    expression must read ONE pinned layout, never two executions of the
    same exchange (measured 760/740 vs 783/717 splits on identical
    input). Returns (the materialized frame with ``_mid``, the
    per-partition row counts — ≤ ``num_partitions`` scalars), after the
    2^33 per-partition offset-capacity guard."""
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r.p: int(r.n)
        for r in ranged.groupBy(
            F.shiftright(F.col("_mid"), 33).alias("p")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    _check_mid_capacity(counts)
    return ranged, counts


def _offset_expr(counts: dict[int, int], num_partitions: int) -> F.Column:
    """Prefix-sum rank offsets as a literal array indexed by the
    partition id decoded from ``_mid``."""
    offsets, acc = [], 0
    for p in range(num_partitions):
        offsets.append(acc)
        acc += counts.get(p, 0)
    return F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offsets]),
        (F.shiftright(F.col("_mid"), 33) + 1).cast("int"),
    )


def _check_mid_capacity(counts: dict[int, int]) -> None:
    """The pinned-layout primitives decode (partition, local offset)
    from monotonically_increasing_id's 64-bit layout, which reserves 33
    bits for the within-partition offset. A partition holding >= 2^33
    rows (~8.6e9 — only reachable when the partition-count clamp binds
    on an enormous frame) would silently bleed into the partition bits
    and corrupt ranks; fail loudly and tell the caller to raise the
    parallelism instead."""
    if counts and max(counts.values()) >= (1 << 33):
        raise ValueError(
            "distributed global-order primitive: a range partition holds "
            ">= 2^33 rows, beyond monotonically_increasing_id's "
            "per-partition offset capacity - raise num_partitions / "
            "spark.sql.shuffle.partitions"
        )


def distributed_rank(
    df: DataFrame,
    order_cols: list,
    out_name: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global 1-based rank (row_number) under a total order without a
    single-partition window — the base primitive of the distributed
    global-order family (:func:`distributed_ntile`,
    :func:`distributed_running_sum` build on the same pinned-layout
    machinery): range exchange + within-partition sort + id stamp +
    localCheckpoint, per-partition COUNT scalars prefix-summed into
    rank offsets, rank decoded as a pure expression. Callers get exact
    global rank / percent_rank / cume_dist / top-rank selection (the
    distributed k-th-element problem) from the returned column.
    ``n_rows``: metadata row-count hint, see :func:`_auto_partitions`."""
    num_partitions = _auto_partitions(df, num_partitions, n_rows)
    ranged, counts = _pinned_layout(df, order_cols, num_partitions)
    rank = (
        _offset_expr(counts, num_partitions)
        + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
        + 1
    )
    return ranged.withColumn(out_name, rank.cast("long")).drop("_mid")


def distributed_running_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_name: str,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global running SUM under a total order WITHOUT the
    single-partition window Spark plans for an unpartitioned
    ``sum().over(orderBy(...))`` — the same pinned-layout machinery as
    :func:`distributed_ntile` (range exchange + within-partition sort +
    id stamp + localCheckpoint so the offsets pass and the value pass
    read one layout), with per-partition SUM scalars collected instead
    of counts and prefix-summed into value offsets. The
    within-partition running sum is a window partitioned by the range
    partition id (one hash exchange; every task still sees ~n/P rows),
    plus the partition's broadcast literal offset. Exactness contract:
    ``value_col`` must be integer-typed (cents-style) — long offsets
    and long window sums make the result bit-identical to any engine's
    ``SUM OVER ORDER BY`` under the same (unique) total order.
    ``n_rows``: metadata row-count hint, see :func:`_auto_partitions`."""
    num_partitions = _auto_partitions(df, num_partitions, n_rows)
    ranged, _counts = _pinned_layout(df, order_cols, num_partitions)
    pid = F.shiftright(F.col("_mid"), 33)
    sums = {
        r.p: int(r.s)
        for r in ranged.groupBy(pid.alias("p"))
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
        if r.s is not None
    }
    offset = _offset_expr(sums, num_partitions)
    w = W.partitionBy(pid).orderBy(*order_cols)
    running = offset + F.sum(F.col(value_col).cast("long")).over(w)
    return ranged.withColumn(out_name, running.cast("long")).drop("_mid")


@register(
    "window_ntile_global",
    oracle="""
        SELECT c_custkey, c_acctbal,
               CAST(NTILE(7) OVER (ORDER BY c_acctbal, c_custkey)
                    AS BIGINT) AS bal_septile
        FROM customer
    """,
    tags=("window",),
)
def window_ntile_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL NTILE, distributed — the witness query for
    ``distributed_ntile``: septiles of every customer's balance under a
    total order, hash-checked against the engines' builtin NTILE(7). 7
    does not divide the fixture's customer count, so the driver hash
    pins the exact uneven-bucket sizing rule (first n%k buckets one row
    larger), the part a cutpoint approximation would get wrong. The
    builtin unpartitioned ``F.ntile`` would plan Exchange
    SinglePartition (tests/test_plan_shapes.py pins its absence
    here)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    return distributed_ntile(
        cust, [F.col("c_acctbal"), F.col("c_custkey")], 7, "bal_septile"
    )


@register(
    "window_first_last",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               first_value(l_quantity) OVER w AS first_qty,
               last_value(l_quantity) OVER w AS last_qty,
               nth_value(l_quantity, 2) OVER w AS second_qty
        FROM lineitem
        WINDOW w AS (
            PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional value functions over a full-partition frame: first/
    last/nth line quantity per order. The frame must be UNBOUNDED on
    both sides — the SQL default frame stops at CURRENT ROW, which
    silently turns last_value into "current value" in both engines.
    The fixture's l_linenumber is NOT unique within an order, so the
    ordering adds l_quantity: rows still tied then agree on the only
    value the window functions read, keeping output deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_quantity").over(w).alias("first_qty"),
        F.last("l_quantity").over(w).alias("last_qty"),
        F.nth_value("l_quantity", 2).over(w).alias("second_qty"),
    )


@register(
    "window_range_interval",
    oracle="""
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_last_10m,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
                   RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
               ), 4) AS value_last_10m
        FROM events
    """,
    tags=("window", "range"),
)
def window_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per-user activity in the trailing 10
    minutes of each event (seed R5 — the reference's ±120 s buffer is a
    range frame over time, not rows).

    RANGE frames are value-based, so rows with identical ts share one
    frame — tie order cannot change the aggregate, unlike a ROWS frame.
    Expressed in SQL because the DataFrame ``rangeBetween`` API takes
    long offsets only; interval bounds need the SQL window syntax."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rw")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
               ) AS n_last_10m,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW
               ), 4) AS value_last_10m
        FROM events_rw
        """
    )


@register(
    "sort_multi_key",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort + limit. Spark executes TakeOrderedAndProject
    (per-partition top-100 then merge) — no full global sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@register(
    "limit_topk_global",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 50
    """,
    tags=("sort",),
)
def limit_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by value, fully tie-broken."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
        )
        .limit(50)
    )


@register(
    "limit_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY c_acctbal DESC, c_custkey
                   ) AS BIGINT) AS rn
            FROM customer
        ) WHERE rn <= 5
    """,
    tags=("sort", "window"),
)
def limit_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "window_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN date_diff('microsecond',
                            LAG(CAST(ts AS TIMESTAMP)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id),
                            CAST(ts AS TIMESTAMP)) >= 1800000000
                         OR LAG(CAST(ts AS TIMESTAMP)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, event_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_seq
            FROM flagged
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    tags=("window", "session"),
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a ≥30-minute silence; session id = running count of
    session-start flags. The batch dual of ``stream_session_window``
    (streaming/batch_windows.py) — same semantics, pure window
    functions, one shuffle on user_id shared by both window steps and
    the final group-by. The gap compares exact MICROSECOND differences
    (1 800 000 000 µs = 30 min): coarser units are boundary-crossing
    counts in DuckDB but elapsed-floor in Spark and silently diverge."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") >= 1800000000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "ts_resample_linear",
    oracle="""
        WITH grid AS (
            SELECT t.event_type, g.grid_ts
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-05 00:00:00',
                    TIMESTAMP '2024-01-05 23:59:00',
                    INTERVAL 1 MINUTE)) AS grid_ts
            ) g
        ),
        obs AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05'
              AND ts < TIMESTAMP '2024-01-06'
        ),
        u AS (
            SELECT event_type, ts, value, 1 AS is_obs FROM obs
            UNION ALL
            SELECT event_type, grid_ts AS ts, NULL AS value, 0 AS is_obs
            FROM grid
        ),
        marked AS (
            SELECT event_type, ts, is_obs,
                   last_value(CASE WHEN is_obs = 1 THEN ts END IGNORE NULLS)
                       OVER w_prev AS t_prev,
                   last_value(CASE WHEN is_obs = 1 THEN value END IGNORE NULLS)
                       OVER w_prev AS v_prev,
                   first_value(CASE WHEN is_obs = 1 THEN ts END IGNORE NULLS)
                       OVER w_next AS t_next,
                   first_value(CASE WHEN is_obs = 1 THEN value END IGNORE NULLS)
                       OVER w_next AS v_next
            FROM u
            WINDOW
                w_prev AS (PARTITION BY event_type
                           ORDER BY ts, is_obs DESC, value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                w_next AS (PARTITION BY event_type
                           ORDER BY ts, is_obs DESC, value
                           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, ts AS grid_ts, t_prev, t_next,
               CASE WHEN t_prev = t_next THEN v_prev
                    -- parenthesized to divide-then-multiply, matching the
                    -- Spark expression's association: a*(b/c) and (a*b)/c
                    -- differ in the last bit and the driver hashes exact
                    ELSE v_prev + (v_next - v_prev)
                         * ((EXTRACT(epoch FROM ts) - EXTRACT(epoch FROM t_prev))
                            / (EXTRACT(epoch FROM t_next) - EXTRACT(epoch FROM t_prev)))
               END AS v_interp
        FROM marked
        WHERE is_obs = 0 AND t_prev IS NOT NULL AND t_next IS NOT NULL
    """,
    tags=("window", "timeseries"),
)
def ts_resample_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with linear interpolation onto a 1-minute
    grid — THE operation the reference's decoded waveform table needs
    (SURVEY §1.1: miniSEED decodes to (channel, ts, value); gaps and
    irregular sampling are the norm, app.py's ±120 s buffers exist
    precisely because boundaries are ragged).

    The scale-correct plan is the union+window sweep (same family as
    join_asof_nearest): union observations with grid points, ONE
    shuffle on channel, one ordered pass carrying the previous/next
    observation via last/first(ignorenulls) over mirrored frames, then
    the interpolation formula on bracketed grid rows only. No per-grid-
    point lookup join, no range join — at 100 TB this is linear in
    (obs + grid points) per channel. Observations sort before their
    exactly-coincident grid point so on-grid samples interpolate to
    themselves (t_prev = t, factor 0). Floats: both engines compute
    the identical (v_prev, v_next, epoch) doubles, and products/
    quotients of identical doubles are bit-identical — output left
    unrounded (see memory: round-parity)."""
    ev = load_table(spark, sf_dir, "events")
    day, nxt = "2024-01-05 00:00:00", "2024-01-06 00:00:00"
    obs = ev.filter(
        (F.col("ts") >= F.to_timestamp_ntz(F.lit(day)))
        & (F.col("ts") < F.to_timestamp_ntz(F.lit(nxt)))
    ).select("event_type", "ts", "value", F.lit(1).alias("is_obs"))
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp_ntz(F.lit(day)),
                    F.to_timestamp_ntz(F.lit("2024-01-05 23:59:00")),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_obs"),
        )
    )
    u = obs.unionByName(grid.select("event_type", "ts", "value", "is_obs"))
    order = [F.col("ts"), F.col("is_obs").desc(), F.col("value")]
    w_prev = (
        W.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_ts = F.when(F.col("is_obs") == 1, F.col("ts"))
    obs_val = F.when(F.col("is_obs") == 1, F.col("value"))
    marked = u.select(
        "event_type",
        "ts",
        "is_obs",
        F.last(obs_ts, ignorenulls=True).over(w_prev).alias("t_prev"),
        F.last(obs_val, ignorenulls=True).over(w_prev).alias("v_prev"),
        F.first(obs_ts, ignorenulls=True).over(w_next).alias("t_next"),
        F.first(obs_val, ignorenulls=True).over(w_next).alias("v_next"),
    )
    ep = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    factor = (ep("ts") - ep("t_prev")) / (ep("t_next") - ep("t_prev"))
    return (
        marked.filter(
            (F.col("is_obs") == 0)
            & F.col("t_prev").isNotNull()
            & F.col("t_next").isNotNull()
        )
        .select(
            "event_type",
            F.col("ts").alias("grid_ts"),
            "t_prev",
            "t_next",
            F.when(F.col("t_prev") == F.col("t_next"), F.col("v_prev"))
            .otherwise(F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * factor)
            .alias("v_interp"),
        )
    )


def _morton16_sql(x: str, y: str) -> str:
    """16-bit Morton (Z-order) interleave of two 8-bit ints, as pure
    integer bit arithmetic — identical text works in Spark SQL and
    DuckDB (& | << >> are common operators)."""
    terms = []
    for i in range(8):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def _morton_n_sql(cols: list[str], bits: int = 8) -> str:
    """k-dimensional Morton interleave of ``len(cols)`` b-bit ints
    (column j owns bit positions k·i + j) — the n-column generalization
    of :func:`_morton16_sql` (which is the k=2 case with the same bit
    assignment). Pure integer bit arithmetic, portable to DuckDB.

    Every emitted bit position must stay in the non-negative bigint
    range: position 63 is the sign bit and shifts >= 64 wrap mod 64 on
    the JVM, silently scrambling the clustering order. When k·bits > 63
    the interleave keeps only each column's TOP ``63 // k`` bits
    (``c >> (bits - use)`` — the MOST significant bits, so the total
    order still follows the curve at reduced per-dimension resolution;
    dropping LOW bits instead would sort bucket 128 next to bucket 0).
    k <= 7 at the default 8 bits is bit-identical to the historical
    output."""
    k = len(cols)
    if k < 1:
        raise ValueError("_morton_n_sql: need at least one column")
    use = min(int(bits), 63 // k)
    if use < 1:
        raise ValueError(
            f"_morton_n_sql: {k} columns cannot share 63 curve-key bits"
        )
    drop = int(bits) - use  # low bits sacrificed per column (0 for k<=7)
    terms = []
    for i in range(use):
        for j, c in enumerate(cols):
            # CAST the extracted bit to BIGINT BEFORE shifting: both
            # Spark and DuckDB type `<<` from the left operand, and an
            # INT-typed bucket wraps at shift >= 32 (k >= 5 puts bits
            # there) — the same silent-wrap family as the k=8 sign bit
            terms.append(
                f"((CAST((({c} >> {drop + i}) & 1) AS BIGINT))"
                f" << {k * i + j})"
            )
    return " | ".join(terms)


def _hilbert16_sql(x: str, y: str) -> str:
    """Hilbert cluster key over two 8-bit ints: the order-4 HILBERT
    index of the 16x16 TILE (one JVM array lookup against the 256-entry
    LUT — no iterative bit gymnastics in the hot path), refined
    within-tile by (x, y) so the total order is curve-major then
    coordinate. Same pruning power as the Morton key (a rectangle
    intersects the same tiles under any space-filling curve) with the
    measured contiguity advantage (628 vs 1000 runs across all
    4x4-tile squares — ``hilbert_write``); the refinement keeps
    same-tile rows range-partitionable at any file count."""
    lut = "array(" + ", ".join(str(v) for v in _HILBERT_LUT) + ")"
    return (
        f"(element_at({lut}, CAST((({x}) DIV 16) * 16 + (({y}) DIV 16)"
        f" AS INT) + 1) * 65536 + ({x}) * 256 + ({y}))"
    )


_ZORDER_X = "(user_id % 256)"
_ZORDER_Y = "((CAST(hour_idx AS BIGINT)) % 256)"
#: rows per Z-order "file" bucket exponent: morton >> 6 → 1024 buckets
_ZORDER_FILE_SHIFT = 6


@register(
    "layout_zorder_cluster",
    oracle=f"""
        WITH e AS (
            SELECT user_id,
                   datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            CAST(ts AS TIMESTAMP)) AS hour_idx
            FROM events
        ),
        keyed AS (
            SELECT user_id, hour_idx,
                   ({_morton16_sql(_ZORDER_X, _ZORDER_Y)}) AS zkey
            FROM e
        )
        SELECT CAST(zkey >> {_ZORDER_FILE_SHIFT} AS BIGINT) AS file_id,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(user_id % 256) AS BIGINT) AS min_user_bucket,
               CAST(MAX(user_id % 256) AS BIGINT) AS max_user_bucket,
               CAST(MIN(hour_idx % 256) AS BIGINT) AS min_hour_bucket,
               CAST(MAX(hour_idx % 256) AS BIGINT) AS max_hour_bucket
        FROM keyed
        GROUP BY 1
    """,
    tags=("layout", "scan"),
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout clustering — the multi-dimensional
    file-skipping lever (Delta ``OPTIMIZE ZORDER BY`` / Iceberg sort
    orders): interleaving the bits of two scan dimensions (user bucket,
    hour bucket) makes file ranges narrow in BOTH dimensions at once,
    so min/max column stats prune scans filtered on EITHER key — a
    linear sort can only serve one. Emits the per-file stats ranges
    that pruning would consult: each 16-bit Z-key bucket spans ≤¼ of
    each dimension (vs the full range on the non-sort dimension of a
    linear layout), which is the pytest-pinned clustering guarantee.

    Scale shape: the Z-key is a pure per-row integer expression (no
    shuffle); the production write is ``repartitionByRange(zkey)`` +
    file-level min/max stats — here the grouped stats themselves are
    the (deterministic, oracle-checked) output. At 100 TB this layout
    turns point/range lookups on either dimension into reads of
    O(matching files), not full scans."""
    ev = load_table(spark, sf_dir, "events")
    # timestampdiff(HOUR) counts FULL hours; DuckDB datediff('hour')
    # counts hour-boundary crossings — identical when the epoch is
    # hour-aligned and every event follows it, both true here.
    hour_idx = F.expr(
        "timestampdiff(HOUR, timestamp_ntz'2024-01-01 00:00:00', ts)"
    ).cast("bigint")
    keyed = ev.select(
        "user_id", hour_idx.alias("hour_idx")
    ).withColumn("zkey", F.expr(_morton16_sql(_ZORDER_X, _ZORDER_Y)))
    return (
        keyed.groupBy(
            (F.col("zkey") / (1 << _ZORDER_FILE_SHIFT))
            .cast("bigint")
            .alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("user_id") % 256).alias("min_user_bucket"),
            F.max(F.col("user_id") % 256).alias("max_user_bucket"),
            F.min(F.col("hour_idx") % 256).alias("min_hour_bucket"),
            F.max(F.col("hour_idx") % 256).alias("max_hour_bucket"),
        )
    )


#: production-write tile shift: zkey >> 8 keeps Morton bits 8..15 =
#: interleave of (user_bucket >> 4, hour_bucket >> 4) — 256 tiles,
#: each covering a 16x16 cell square in (user, hour) space
_ZORDER_WRITE_SHIFT = 8


def _morton_interleave_py(x: int, y: int, bits: int = 4) -> int:
    """Driver-side Morton interleave (x in even bits, y in odd) for
    enumerating the candidate tiles of a rectangular predicate —
    bounded by the tile grid (<= 256 values), never data-sized."""
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def zorder_write(spark: SparkSession, sf_dir: str, path: str) -> None:
    """The PRODUCTION Z-order write that ``layout_zorder_cluster`` only
    computes stats for: key every event row by the 16-bit Morton
    interleave of (user bucket, hour bucket), ``repartitionByRange`` on
    the Z-key so each task holds a contiguous curve segment, and land
    the table partitioned by the Z-tile (``zfile`` = zkey >> 8). The
    resulting layout is narrow in BOTH dimensions per tile, so a
    rectangular predicate on either (or both) keys prunes to
    O(matching tiles) at the file listing — asserted on inputFiles in
    tests/test_window_ops.py. Seed: R17 date-partitioned layout
    (``/root/reference/app.py:449-463``) generalized to 2-D.

    Scale shape: the Z-key is a per-row integer expression; the single
    range shuffle replaces the sort a linear layout needs anyway; the
    partitioned write produces one contiguous file run per tile (256
    bounded dirs, not n_tasks x tiles small files)."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = F.expr(
        "timestampdiff(HOUR, timestamp_ntz'2024-01-01 00:00:00', ts)"
    ).cast("bigint")
    keyed = (
        ev.select(
            (F.col("user_id") % 256).alias("user_bucket"),
            (hour_idx % 256).alias("hour_bucket"),
            "value",
        )
        .withColumn(
            "zkey", F.expr(_morton16_sql("user_bucket", "hour_bucket"))
        )
        .withColumn(
            "zfile", (F.col("zkey") / (1 << _ZORDER_WRITE_SHIFT)).cast("bigint")
        )
    )
    keyed.repartitionByRange(32, "zkey").write.partitionBy("zfile").mode(
        "overwrite"
    ).parquet(path)


def zorder_pruned_scan(
    spark: SparkSession,
    path: str,
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
) -> DataFrame:
    """Read a Z-ordered table back for a rectangle in (user, hour)
    space: enumerate the Morton tiles intersecting the box driver-side
    (bounded by the 16x16 tile grid), prune the scan to those
    partitions with a ``zfile IN (...)`` partition filter, then apply
    the exact row-level range predicates. Unmatched tiles are never
    listed or read."""
    (ulo, uhi), (hlo, hhi) = user_range, hour_range
    tiles = sorted(
        {
            _morton_interleave_py(xt, yt)
            for xt in range(ulo >> 4, (uhi >> 4) + 1)
            for yt in range(hlo >> 4, (hhi >> 4) + 1)
        }
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("zfile").isin(tiles))
        .filter(
            F.col("user_bucket").between(ulo, uhi)
            & F.col("hour_bucket").between(hlo, hhi)
        )
    )


#: the query's demo rectangle: 2x2 tiles out of the 16x16 grid
_ZQ_USER = (16, 47)
_ZQ_HOUR = (32, 63)


@register(
    "layout_zorder_scan",
    oracle=f"""
        WITH e AS (
            SELECT user_id % 256 AS user_bucket,
                   datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            CAST(ts AS TIMESTAMP)) % 256 AS hour_bucket,
                   value
            FROM events
        )
        SELECT CAST(user_bucket >> 4 AS BIGINT) AS tile_x,
               CAST(hour_bucket >> 4 AS BIGINT) AS tile_y,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(value), 2) AS total_value
        FROM e
        WHERE user_bucket BETWEEN {_ZQ_USER[0]} AND {_ZQ_USER[1]}
          AND hour_bucket BETWEEN {_ZQ_HOUR[0]} AND {_ZQ_HOUR[1]}
        GROUP BY 1, 2
    """,
    tags=("layout", "scan"),
)
def layout_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Z-order layout round trip: write the event table in
    Morton-tile layout (``zorder_write``), then answer a 2-D rectangle
    query through the pruned scan (``zorder_pruned_scan``) — reading
    only the 4 of 256 tiles the box intersects — and aggregate per
    tile. The oracle recomputes the same rectangle from the raw table,
    so the driver hash-checks that pruning loses no rows; the file-
    count reduction itself is pytest-pinned on inputFiles."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    path = scratch_path(spark, sf_dir, "zorder")
    with scratch_cleanup(path):
        zorder_write(spark, sf_dir, path)
        return (
            zorder_pruned_scan(spark, path, _ZQ_USER, _ZQ_HOUR)
            .groupBy(
                F.shiftright("user_bucket", 4).cast("bigint").alias("tile_x"),
                F.shiftright("hour_bucket", 4).cast("bigint").alias("tile_y"),
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
            .localCheckpoint(eager=True)
        )


@register(
    "window_cumulative_distinct",
    oracle="""
        WITH e AS (
            SELECT event_type, user_id,
                   CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
            FROM events
        ),
        firsts AS (
            SELECT event_type, user_id, MIN(day) AS first_day
            FROM e GROUP BY 1, 2
        ),
        new_per_day AS (
            SELECT event_type, first_day AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_new
            FROM firsts GROUP BY 1, 2
        ),
        active_days AS (
            SELECT DISTINCT event_type, day FROM e
        )
        SELECT d.event_type, d.day,
               CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
               ) AS BIGINT) AS cum_distinct_users
        FROM active_days d
        LEFT JOIN new_per_day n
          ON d.event_type = n.event_type AND d.day = n.day
    """,
    tags=("window", "agg"),
)
def window_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count — cumulative unique users per event type
    by day, the classic operator naive SQL can't express (COUNT(DISTINCT)
    OVER a running frame is unsupported in both engines, and a
    per-day re-count over growing prefixes is O(days x events)).

    The scale-correct decomposition: each user's FIRST day per type
    (one groupBy on fixed-width keys), daily new-user counts, then a
    running SUM window over |type x day| rows — the expensive distinct
    collapses once, the window runs over driver-scale cardinality.
    Days with activity but no new users still appear (zero-filled via
    the active-day left join). At 100 TB the event scan shuffles only
    (type, user) pairs once; everything after is bounded by the
    calendar."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
    )
    firsts = e.groupBy("event_type", "user_id").agg(F.min("day").alias("day"))
    new_per_day = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    active_days = e.select("event_type", "day").distinct()
    w = W.partitionBy("event_type").orderBy("day")
    return (
        active_days.join(new_per_day, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
        .withColumn(
            "cum_distinct_users", F.sum("n_new").over(w).cast("long")
        )
    )


@register(
    "ts_fill_forward",
    oracle="""
        WITH obs AS (
            SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value, 1 AS is_obs
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
              AND ts <  TIMESTAMP '2024-01-06 00:00:00'
        ),
        grid AS (
            SELECT t.event_type, g.ts,
                   CAST(NULL AS DOUBLE) AS value, 0 AS is_obs
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-05 00:00:00',
                    TIMESTAMP '2024-01-05 23:59:00',
                    INTERVAL 1 MINUTE)) AS ts
            ) g
        ),
        u AS (
            SELECT * FROM obs UNION ALL BY NAME SELECT * FROM grid
        ),
        marked AS (
            SELECT event_type, ts, is_obs,
                   LAST_VALUE(CASE WHEN is_obs = 1 THEN value END IGNORE NULLS)
                       OVER (PARTITION BY event_type
                             ORDER BY ts, is_obs DESC, value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS v_ffill,
                   LAST_VALUE(CASE WHEN is_obs = 1 THEN ts END IGNORE NULLS)
                       OVER (PARTITION BY event_type
                             ORDER BY ts, is_obs DESC, value
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS t_src
            FROM u
        )
        SELECT event_type, ts AS grid_ts, v_ffill, t_src,
               CAST(date_diff('microsecond', t_src, ts) // 1000000 AS BIGINT)
                   AS staleness_s
        FROM marked
        WHERE is_obs = 0 AND v_ffill IS NOT NULL
    """,
    tags=("window", "timeseries"),
)
def ts_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling by LAST-OBSERVATION-CARRIED-FORWARD onto a 1-minute
    grid (the telemetry default — sensors hold their last reading;
    contrast ``ts_resample_linear``, which interpolates): per channel,
    each grid point takes the most recent at-or-before observation,
    with the source timestamp and integer staleness emitted so
    downstream can cap how stale a held value may be.

    Same scale-correct union+window sweep as the as-of family: union
    observations with grid points, ONE shuffle on the channel key, one
    ordered pass carrying the last observed (value, ts) forward —
    linear in (obs + grid) per channel, no per-grid-point lookup join.
    Observations sort before their exactly-coincident grid point, so
    on-grid samples fill with themselves at staleness 0."""
    ev = load_table(spark, sf_dir, "events")
    day, nxt = "2024-01-05 00:00:00", "2024-01-06 00:00:00"
    obs = ev.filter(
        (F.col("ts") >= F.to_timestamp_ntz(F.lit(day)))
        & (F.col("ts") < F.to_timestamp_ntz(F.lit(nxt)))
    ).select("event_type", "ts", "value", F.lit(1).alias("is_obs"))
    grid = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.to_timestamp_ntz(F.lit(day)),
                    F.to_timestamp_ntz(F.lit("2024-01-05 23:59:00")),
                    F.expr("INTERVAL 1 MINUTE"),
                )
            ).alias("ts"),
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_obs"),
        )
    )
    u = obs.unionByName(grid)
    w = (
        W.partitionBy("event_type")
        .orderBy(F.col("ts"), F.col("is_obs").desc(), F.col("value"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    obs_val = F.when(F.col("is_obs") == 1, F.col("value"))
    obs_ts = F.when(F.col("is_obs") == 1, F.col("ts"))
    marked = u.select(
        "event_type",
        "ts",
        "is_obs",
        F.last(obs_val, ignorenulls=True).over(w).alias("v_ffill"),
        F.last(obs_ts, ignorenulls=True).over(w).alias("t_src"),
    )
    micros = F.expr("timestampdiff(MICROSECOND, t_src, ts)")
    return (
        marked.filter((F.col("is_obs") == 0) & F.col("v_ffill").isNotNull())
        .select(
            "event_type",
            F.col("ts").alias("grid_ts"),
            "v_ffill",
            "t_src",
            (micros / 1_000_000).cast("long").alias("staleness_s"),
        )
    )


@register(
    "ts_outlier_mad",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS med
            FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_type, median(abs(e.value - m.med)) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type
        )
        SELECT m.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(m.med, 6) AS med,
               ROUND(d.mad, 6) AS mad,
               CAST(SUM(CASE WHEN abs(e.value - m.med) > 3 * d.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e
        JOIN med m USING (event_type)
        JOIN dev d USING (event_type)
        GROUP BY m.event_type, m.med, d.mad
    """,
    tags=("ts", "agg"),
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series outlier detection (median / median-absolute-
    deviation): flag events whose value deviates from its series median
    by more than 3 MADs — the standard robust alternative to z-scores
    (one wild sensor reading shifts a mean/stddev gate but not the
    median pair), i.e. the reference's per-channel data-quality check
    the dashboard eyeballs (seed: trace plots, ``app.py:569-575``),
    made algorithmic.

    Scale shape: two grouped medians (each a single shuffle on the
    bounded event_type key; Spark computes exact percentile with a
    per-group sort that AQE splits on skew) + the |types|-row
    median/MAD frames broadcast back for one linear flagging pass —
    the corpus is scanned twice, shuffled only on fixed-cardinality
    keys, never self-joined. Both engines interpolate even-count
    medians from identical doubles, so med/mad/flags are bit-exact
    cross-engine (rounded for display only)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    flagged = ev.join(F.broadcast(med), "event_type").join(
        F.broadcast(dev), "event_type"
    )
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outliers"),
    ).select(
        "event_type",
        "n_events",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
    )


#: EWMA smoothing factor and frame cap: alpha = 1/8, 64-row window.
#: The truncated tail carries weight (1-alpha)^64 ~ 2e-4 — numerically
#: negligible, and the BOUNDED frame is what makes the operator
#: scale-safe: the unbounded recursive form needs (1/(1-a))^n partial
#: products that overflow double past ~5k rows per key, while a 64-row
#: frame is O(1) state per row at any corpus size.
_EWMA_ALPHA = 0.125
_EWMA_FRAME = 64

#: the 64 decay weights (1-alpha)^j as EXACT double literals embedded in
#: BOTH engines' expressions — element weights become array lookups
#: instead of per-element power() calls (measured ~2x on the sf0.1
#: slot), and identical literals guarantee identical products
_EWMA_WEIGHTS = [(1 - _EWMA_ALPHA) ** j for j in range(_EWMA_FRAME)]
_EWMA_W_SQL = "[" + ", ".join(repr(w) for w in _EWMA_WEIGHTS) + "]"
_EWMA_W_SPARK = "array(" + ", ".join(
    repr(w) + "D" for w in _EWMA_WEIGHTS
) + ")"


@register(
    "ts_ewma",
    oracle=f"""
        WITH f AS (
            SELECT event_id, event_type, ts, value,
                   list(value) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN {_EWMA_FRAME - 1} PRECEDING
                            AND CURRENT ROW) AS arr
            FROM events
        )
        SELECT event_id, event_type, ts, value,
               ROUND(
                   list_sum(list_transform(arr,
                       (x, i) -> x * ({_EWMA_W_SQL})[len(arr) - i + 1]))
                   / ((1 - power({1 - _EWMA_ALPHA}, len(arr)))
                      / {_EWMA_ALPHA}),
                   8) AS ewma
        FROM f
    """,
    tags=("window", "timeseries"),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per channel — the
    trend-following smoother telemetry dashboards and anomaly baselines
    run (pandas ``ewm(alpha).mean()`` semantics, adjust=True): each
    row's smoothed value is the weight-normalized sum of the trailing
    observations, newest weighted 1, each step older decaying by
    (1 - alpha). Declared as ONE window collect over a BOUNDED 64-row
    frame plus higher-order array arithmetic — no Python, no recursion,
    no join: a single shuffle on the channel key then a linear ordered
    pass, identical cost to any bounded frame aggregate at 100 TB.
    DuckDB evaluates the same indexed-lambda expression tree (its list
    lambdas index 1-based, Spark's 0-based — the weight-array lookups
    align as ``len - i_1based + 1 == size - i_0based``), so the driver
    hash-checks the 8-dp-rounded EWMA exactly. Two measured cost cuts
    keep the floats engine-identical: the 64 decay weights are EXACT
    double literals shared by both expressions (array lookup, not a
    power() per element), and the weight-sum denominator is the closed
    geometric form (1 - (1-a)^n) / a — one power() per row, same
    formula both sides.

    Seed: R5's waveform chunks (``/root/reference/app.py:378-447``) —
    the smoothing a seismic trigger (STA/LTA) runs over exactly such
    per-channel streams."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_FRAME - 1), W.currentRow)
    )
    decay = 1 - _EWMA_ALPHA
    num = (
        f"aggregate(transform(arr, (x, i) -> x * element_at({_EWMA_W_SPARK},"
        " size(arr) - i)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    den = f"(1 - power({decay}, size(arr))) / {_EWMA_ALPHA}"
    return (
        ev.select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.collect_list("value").over(w).alias("arr"),
        )
        .select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.round(F.expr(num) / F.expr(den), 8).alias("ewma"),
        )
    )


#: rolling-median frame: 31 samples (15 each side would be centered;
#: trailing keeps it streaming-compatible — no future peeking)
_RMED_FRAME = 31


@register(
    "ts_rolling_median",
    oracle=f"""
        WITH f AS (
            SELECT event_id, event_type, ts, value,
                   list_sort(list(value) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN {_RMED_FRAME - 1} PRECEDING
                            AND CURRENT ROW)) AS s
            FROM events
        )
        SELECT event_id, event_type, ts, value,
               (s[(len(s) - 1) // 2 + 1] + s[len(s) // 2 + 1]) / 2.0
                   AS rolling_med
        FROM f
    """,
    tags=("window", "timeseries"),
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing ROLLING MEDIAN per channel — the despiking filter
    telemetry pipelines run ahead of any mean-based statistic (a
    median absorbs a single corrupted sample that would drag an EWMA;
    ``ts_outlier_mad`` is its global sibling, this is the windowed
    form). One bounded 31-row window collect, then array_sort + exact
    middle selection ((s[(n-1) div 2] + s[n div 2]) / 2 handles odd
    and even frames alike) — pure doubles arithmetic with NO rounding:
    both engines sort the identical frame and average the identical
    two middles, so the driver hash-checks bit-exact values. Same
    scale shape as every bounded-frame aggregate: one shuffle on the
    channel key, O(frame log frame) per row, no Python.

    Seed: R5 waveform chunks (``/root/reference/app.py:378-447``) —
    median despiking is the standard seismic pre-filter."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_RMED_FRAME - 1), W.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        F.array_sort(F.collect_list("value").over(w)).alias("s"),
    ).select(
        "event_id",
        "event_type",
        "ts",
        "value",
        (
            (
                F.expr("element_at(s, CAST((size(s) - 1) DIV 2 AS INT) + 1)")
                + F.expr("element_at(s, CAST(size(s) DIV 2 AS INT) + 1)")
            )
            / 2.0
        ).alias("rolling_med"),
    )


def _hilbert_xy2d_py(order: int, x: int, y: int) -> int:
    """Driver-side Hilbert curve index (the standard iterative xy->d
    mapping from the public literature): used to build the 256-entry
    tile lookup the per-row expression consults and to enumerate a
    rectangle's candidate tiles — both bounded by the 16x16 tile grid,
    never data-sized."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s >>= 1
    return d


#: tile-level Hilbert lookup as a 256-int literal array, indexed by
#: (x_tile * 16 + y_tile): the per-row "compute the curve index" step
#: becomes one JVM array lookup — no bit gymnastics in the hot path,
#: and the same table drives the driver-side rectangle enumeration
_HILBERT_LUT = [
    _hilbert_xy2d_py(4, x, y) for x in range(16) for y in range(16)
]


def _hilbert_tile_expr(user_bucket: str, hour_bucket: str):
    lut = "array(" + ", ".join(str(v) for v in _HILBERT_LUT) + ")"
    return F.expr(
        f"element_at({lut},"
        f" CAST(({user_bucket} DIV 16) * 16 + ({hour_bucket} DIV 16)"
        " AS INT) + 1)"
    )


def hilbert_write(spark: SparkSession, sf_dir: str, path: str) -> None:
    """The Hilbert-curve sibling of ``zorder_write``: same 16x16 tile
    grid over (user bucket, hour bucket), but tiles ordered along the
    HILBERT curve instead of the Morton curve. Identical pruning power
    (a rectangle intersects the same tiles under any space-filling
    curve); the difference is CONTIGUITY — the tiles of a rectangular
    query form fewer runs of consecutive curve indices (measured 628
    vs 1000 runs across every 4x4-tile square, 0.63x — pinned in
    tests/test_window_ops.py), which at 100 TB means fewer discrete
    byte ranges per query: longer sequential reads, fewer object-store
    GETs, better listing locality. Cost is identical to Z-order: one
    per-row array lookup and the same single range shuffle."""
    ev = load_table(spark, sf_dir, "events")
    hour_idx = F.expr(
        "timestampdiff(HOUR, timestamp_ntz'2024-01-01 00:00:00', ts)"
    ).cast("bigint")
    keyed = (
        ev.select(
            (F.col("user_id") % 256).alias("user_bucket"),
            (hour_idx % 256).alias("hour_bucket"),
            "value",
        )
        .withColumn(
            "hfile", _hilbert_tile_expr("user_bucket", "hour_bucket")
        )
    )
    keyed.repartitionByRange(
        32, "hfile", "user_bucket", "hour_bucket"
    ).write.partitionBy("hfile").mode("overwrite").parquet(path)


def hilbert_pruned_scan(
    spark: SparkSession,
    path: str,
    user_range: tuple[int, int],
    hour_range: tuple[int, int],
) -> DataFrame:
    """Rectangle scan over a Hilbert-clustered table: enumerate the
    intersecting tiles driver-side (bounded by the grid), prune to
    those partitions, apply the exact residual ranges."""
    (ulo, uhi), (hlo, hhi) = user_range, hour_range
    tiles = sorted(
        {
            _hilbert_xy2d_py(4, xt, yt)
            for xt in range(ulo >> 4, (uhi >> 4) + 1)
            for yt in range(hlo >> 4, (hhi >> 4) + 1)
        }
    )
    return (
        spark.read.parquet(path)
        .filter(F.col("hfile").isin(tiles))
        .filter(
            F.col("user_bucket").between(ulo, uhi)
            & F.col("hour_bucket").between(hlo, hhi)
        )
    )


#: the Hilbert demo rectangle: a 4x4-tile square (0..63 x 96..159) —
#: anchored at the user-axis origin so it is populated at EVERY fixture
#: SF (sf0.001's user ids span only 0..14)
_HQ_USER = (0, 63)
_HQ_HOUR = (96, 159)


@register(
    "layout_hilbert_scan",
    oracle=f"""
        WITH e AS (
            SELECT user_id % 256 AS user_bucket,
                   datediff('hour', TIMESTAMP '2024-01-01 00:00:00',
                            CAST(ts AS TIMESTAMP)) % 256 AS hour_bucket,
                   value
            FROM events
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents,
               CAST(MIN(user_bucket) AS BIGINT) AS min_user,
               CAST(MAX(user_bucket) AS BIGINT) AS max_user
        FROM e
        WHERE user_bucket BETWEEN {_HQ_USER[0]} AND {_HQ_USER[1]}
          AND hour_bucket BETWEEN {_HQ_HOUR[0]} AND {_HQ_HOUR[1]}
    """,
    tags=("layout", "scan"),
)
def layout_hilbert_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILBERT-curve layout write + pruned rectangle scan end to end —
    the locality-optimal space-filling curve next to the Morton
    baseline (``layout_zorder_scan``): land events Hilbert-tiled,
    answer a 2-D rectangle aggregate reading only intersecting tiles.
    The oracle recomputes the rectangle from the raw table, so the
    driver hash-checks that curve-order clustering loses no rows; the
    partition-pruning drop and the fewer-contiguous-runs advantage
    over Morton (628 vs 1000 across all 4x4 squares) are pinned in
    tests/test_window_ops.py. Seed: R17's date-prefix layout
    (``/root/reference/app.py:449-463``) generalized to the 2-D curve
    with the best run locality."""
    from aws_seismic_data_pipeline_spark.catalog import (
        scratch_cleanup,
        scratch_path,
    )

    path = scratch_path(spark, sf_dir, "hilbert_tiles")
    with scratch_cleanup(path):
        hilbert_write(spark, sf_dir, path)
        return (
            hilbert_pruned_scan(spark, path, _HQ_USER, _HQ_HOUR)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                .cast("long")
                .alias("value_cents"),
                F.min("user_bucket").cast("long").alias("min_user"),
                F.max("user_bucket").cast("long").alias("max_user"),
            )
            .localCheckpoint(eager=True)
        )


#: CUSUM parameters (ts_cusum_alarm): in-control target level, slack
#: (half the shift worth detecting), and the alarm threshold h
CUSUM_TARGET = 50.0
CUSUM_SLACK = 5.0
CUSUM_H = 20.5


@register(
    "ts_cusum_alarm",
    oracle=f"""
        SELECT event_type, event_id, ts,
               ROUND(p - LEAST(CAST(0.0 AS DOUBLE), run_min), 6) AS cusum,
               ROUND(p - LEAST(CAST(0.0 AS DOUBLE), run_min), 6)
                   > CAST({CUSUM_H} AS DOUBLE) AS alarm
        FROM (
            SELECT event_type, event_id, ts, p,
                   MIN(p) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS run_min
            FROM (
                SELECT event_type, event_id, ts,
                       SUM(value - CAST({CUSUM_TARGET + CUSUM_SLACK} AS DOUBLE))
                           OVER (PARTITION BY event_type ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS p
                FROM events
            )
        )
    """,
    tags=("timeseries", "window"),
)
def ts_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection (Page 1954) per event
    type: the classic recurrence ``S_i = max(0, S_{{i-1}} + (x_i −
    target − slack))`` looks inherently sequential, but it has the
    closed form ``S_i = P_i − min(0, min_{{j≤i}} P_j)`` over the prefix
    sums P — two plain cumulative windows, no recursion, no
    applyInPandas. Rows where S crosses h raise the alarm: a sustained
    upward mean shift accumulates where the MAD gate
    (``ts_outlier_mad``) only sees pointwise spikes and the EWMA
    (``ts_ewma``) smooths — this is the drift detector of the ts
    family.

    Value parity: cumulative-window sums associate differently across
    engines (Spark runs left-to-right, DuckDB segment-trees), so the
    emitted statistic rounds at 6dp and the ALARM compares the ROUNDED
    value against h = 20.5 — both engines round their ±1e-12
    disagreement to the same 6dp value, so the boolean cannot split.

    Scale shape: one scan, one shuffle on event_type, two frame
    passes over each partition — linear; partitions are per-series, the
    same contract as every ts_* op (a single giant series would range-
    partition on time with boundary carry, the standard parallel-scan
    decomposition)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    d = F.col("value") - F.lit(CUSUM_TARGET + CUSUM_SLACK)
    p = F.sum(d).over(w)
    with_p = ev.select("event_type", "event_id", "ts", p.alias("p"))
    run_min = F.min("p").over(w)
    s = F.round(F.col("p") - F.least(F.lit(0.0), run_min), 6)
    return with_p.select(
        "event_type",
        "event_id",
        "ts",
        s.alias("cusum"),
        (s > F.lit(CUSUM_H)).alias("alarm"),
    )


@register(
    "ts_seasonal_adjust",
    oracle="""
        SELECT event_id, event_type, ts, hod, baseline,
               ROUND(value - baseline, 6) AS residual
        FROM (
            SELECT event_id, event_type, ts, value,
                   CAST(hour(ts) AS BIGINT) AS hod,
                   ROUND(AVG(value) OVER (PARTITION BY event_type, hour(ts)), 6)
                       AS baseline
            FROM events
        )
    """,
    tags=("timeseries", "window"),
)
def ts_seasonal_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, the classical-additive first step: the
    per-(series, hour-of-day) mean is the diurnal baseline, and the
    residual ``value − baseline`` is the deseasonalized signal the
    anomaly detectors downstream (``ts_outlier_mad``,
    ``ts_cusum_alarm``) should consume — a level shift at 3am is
    invisible against a whole-day mean but obvious against the 3am
    baseline.

    Value parity: AVG accumulates in engine order, so the baseline is
    ROUNDED at 6dp and the residual is computed FROM the rounded
    baseline on both sides — two exact operations on identical doubles
    thereafter.

    Scale shape: one scan, one shuffle on (event_type, hour) — the
    window-avg form keeps the row identity without a join-back; 24·
    |series| groups, no skew (hours are uniform by construction of
    time). At 100 TB the same plan holds; only the partition count
    scales."""
    ev = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").cast("long")
    baseline = F.round(
        F.avg("value").over(W.partitionBy("event_type", hod)), 6
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        hod.alias("hod"),
        baseline.alias("baseline"),
        F.round(F.col("value") - baseline, 6).alias("residual"),
    )


@register(
    "window_rank_global",
    oracle="""
        WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM customer)
        SELECT c_custkey, c_acctbal,
               CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
                    AS BIGINT) AS bal_rank,
               (ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) - 1.0)
                   / (n.n - 1.0) AS bal_pct_rank,
               ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) / n.n
                   AS bal_cume_dist
        FROM customer, n
    """,
    tags=("window",),
)
def window_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL rank / percent_rank / cume_dist, distributed — the
    ``distributed_rank`` witness: every customer's exact position under
    a total order plus the two normalized forms, hash-equal to the
    builtin unpartitioned window functions (which would plan Exchange
    SinglePartition — banned by tests/test_plan_shapes.py). Under a
    UNIQUE total order row_number == rank and cume_dist == rank/n, so
    the quotients (rank-1)/(n-1) and rank/n are single divisions of
    identical integer-derived doubles on both engines — no rounding."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    ranked = distributed_rank(
        cust, [F.col("c_acctbal"), F.col("c_custkey")], "bal_rank"
    )
    total = cust.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "c_custkey",
        "c_acctbal",
        "bal_rank",
        ((F.col("bal_rank") - F.lit(1.0)) / (F.col("n") - F.lit(1.0))).alias(
            "bal_pct_rank"
        ),
        (F.col("bal_rank") / F.col("n")).alias("bal_cume_dist"),
    )


@register(
    "agg_median_distributed",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               MEDIAN(o_totalprice) AS median_price
        FROM orders
    """,
    tags=("agg", "window"),
)
def agg_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median by DISTRIBUTED SELECTION — the k-th-element
    problem solved with ``distributed_rank``: rank every order's price
    under a (price, orderkey) total order, select the middle rank(s)
    with a metadata-cheap filter on the rank expression, and average
    them (one row when n is odd, the two middle rows when even — the
    SQL MEDIAN interpolation). Contrast ``agg_percentile``'s builtin
    exact ``percentile``, which buffers the whole group per aggregation
    state: at 10^9 rows a single-group exact percentile OOMs one task,
    while this shape never puts more than ~n/P rows in any task and
    moves exactly two rows to the final 1-row aggregate. (The
    production default at scale remains approx_percentile — this is
    the exact path when the answer must be exact.)"""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey"
    )
    n = orders.count()
    k1, k2 = (n + 1) // 2, (n + 2) // 2
    # n is already known for k — feed it to the sizing so the rank pass
    # never re-counts the frame
    ranked = distributed_rank(
        orders, [F.col("o_totalprice"), F.col("o_orderkey")], "r", n_rows=n
    )
    mid = ranked.filter(F.col("r").isin(int(k1), int(k2)))
    return mid.agg(
        F.lit(int(n)).cast("long").alias("n_orders"),
        F.avg("o_totalprice").alias("median_price"),
    )
