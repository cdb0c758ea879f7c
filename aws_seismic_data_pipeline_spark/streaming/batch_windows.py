"""Time-window aggregations (SURVEY.md §2B stream_*, batch-checkable).

Seeds: hourly chunk iteration (``/root/reference/app.py:336-353`` →
tumbling windows), the ±120 s overlap buffer (``app.py:373-380`` →
sliding windows), daily cron with 5-minute close-delay
(``app.py:674-679`` → watermark semantics, exercised for real in
``jobs.py``).

These use the exact same ``window()``/``session_window()`` operators a
``readStream`` plan would — Structured Streaming reuses the batch
expressions — so checking them against a SQL oracle in batch mode also
validates the streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


@register(
    "stream_tumbling_agg",
    oracle="""
        SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS window_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    tags=("stream",),
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window count/sum per channel (seed R4/R22)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_sliding_agg",
    oracle="""
        SELECT window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM (
            SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                       AS window_start, event_type, value
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                       - INTERVAL 30 MINUTE, event_type, value
            FROM events
        )
        GROUP BY 1, 2
    """,
    tags=("stream",),
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (seed R5: overlapping buffered
    chunks). Each event lands in exactly 2 windows; the oracle expands
    the two candidate window starts explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "stream_session_window",
    oracle="""
        WITH marked AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
                          OR CAST(ts AS TIMESTAMP)
                             - LAG(CAST(ts AS TIMESTAMP)) OVER w
                             >= INTERVAL 10 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 10 MINUTE AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
    """,
    tags=("stream",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, 10-minute inactivity gap. The oracle is
    the classic gaps-and-islands rewrite; Spark's ``session_window``
    merges adjacent events whose spacing is < gap, session end = last
    event + gap — the CASE uses >= to match half-open semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "stream_session_dynamic",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                   CASE WHEN event_type = 'purchase'
                        THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 10 MINUTE END AS gap
            FROM events
        ),
        m AS (
            SELECT user_id, ts, ts + gap AS iend,
                   MAX(ts + gap) OVER (
                       PARTITION BY user_id ORDER BY ts, ts + gap
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_end
            FROM e
        ),
        g AS (
            SELECT user_id, ts, iend,
                   SUM(CASE WHEN prev_end IS NULL OR ts >= prev_end
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, iend
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS sid
            FROM m
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(iend) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id, sid
    """,
    tags=("stream", "window"),
)
def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a DYNAMIC, per-event inactivity gap
    (``session_window`` with a Column gap — Spark 4 API surface the
    fixed-gap query cannot reach): a purchase keeps its session alive
    for 30 minutes, anything else for 10 — the checkout-flow semantics
    real funnels use (a buying user pausing to fetch a card must not
    split the session). Sessions merge while each event's [ts,
    ts + its_gap) interval overlaps the running maximum end, so session
    end = max(ts + gap) of the merged chain; the oracle is the
    gaps-and-islands rewrite with a running-max window, which both
    engines evaluate identically (the break rule is order-tie-proof:
    equal timestamps always co-session). Same one-shuffle cost as
    fixed-gap sessionization at any scale."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
