"""The reference's daily-ingest pipeline as one lazy DataFrame plan.

Reference lifecycle (``/root/reference/app.py:498-619``): derive the
previous-UTC-day window (app.py:560-565) → cartesian fan-out of the
channel catalog (app.py:569-575) → hourly chunking with ±120 s buffer
clamped to window bounds (app.py:336-380) → skip already-fetched files
(app.py:271-273) → fetch → date-partitioned sink with dead-letter
placeholders (app.py:315-334, 449-480).

Here the whole logical pipeline is ONE declarative plan: crossJoin →
sequence/explode → greatest/least clamp → broadcast/anti joins →
aggregate. Catalyst handles ordering; the only shuffle is the final
aggregate. Wall-clock dependence is removed: ``as_of`` is an explicit
parameter (SURVEY.md §7 hard-part (b)) so results are deterministic.

The driver fixtures have no seismic channels, so the ``events`` table
stands in: ``event_type`` plays the channel catalog, event timestamps
play fetched-file timestamps.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register

AS_OF_DAY = "2024-01-15"  # fixed so fixtures stay reproducible (seed 42)


def chunked_requests(
    catalog: DataFrame,
    window_start: dt.datetime,
    window_end: dt.datetime,
    chunk_hours: int = 1,
    buffer_seconds: int = 120,
) -> DataFrame:
    """Expand a channel catalog × time window into buffered chunk requests.

    Mirrors ``iterate_chunks`` + ``get_data`` chunk/clamp semantics
    (app.py:336-380): half-open hourly chunks, per-chunk query bounds
    widened by ±buffer but clamped to the original window
    (app.py:375-376). Pure built-ins: sequence/explode stay JVM-side and
    parallelize as width × catalog-size rows."""
    ws = F.lit(window_start.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
    we = F.lit(window_end.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
    chunk = F.expr(f"INTERVAL {chunk_hours} HOUR")
    buf = F.expr(f"INTERVAL {buffer_seconds} SECOND")
    return (
        catalog.withColumn(
            "chunk_start",
            F.explode(F.sequence(ws, we - F.expr("INTERVAL 1 SECOND"), chunk)),
        )
        .withColumn("chunk_end", F.col("chunk_start") + chunk)
        .withColumn("query_start", F.greatest(ws, F.col("chunk_start") - buf))
        .withColumn("query_end", F.least(we, F.col("chunk_end") + buf))
    )


@register(
    "ingest_plan_daily",
    oracle=f"""
        WITH chans AS (SELECT DISTINCT event_type FROM events),
        chunks AS (
            SELECT unnest(generate_series(
                TIMESTAMP '{AS_OF_DAY} 00:00:00',
                TIMESTAMP '{AS_OF_DAY} 23:00:00',
                INTERVAL 1 HOUR)) AS chunk_start
        ),
        requests AS (
            SELECT c.event_type, k.chunk_start,
                   GREATEST(TIMESTAMP '{AS_OF_DAY} 00:00:00',
                            k.chunk_start - INTERVAL 120 SECOND) AS query_start,
                   LEAST(TIMESTAMP '{AS_OF_DAY} 00:00:00' + INTERVAL 1 DAY,
                         k.chunk_start + INTERVAL 1 HOUR + INTERVAL 120 SECOND)
                       AS query_end
            FROM chans c CROSS JOIN chunks k
        ),
        got AS (
            SELECT event_type,
                   CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS chunk_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            WHERE ts >= TIMESTAMP '{AS_OF_DAY} 00:00:00'
              AND ts < TIMESTAMP '{AS_OF_DAY} 00:00:00' + INTERVAL 1 DAY
            GROUP BY 1, 2
        )
        SELECT r.event_type, r.chunk_start, r.query_start, r.query_end,
               COALESCE(g.n_events, 0) AS n_events,
               (COALESCE(g.n_events, 0) > 0) AS has_data
        FROM requests r
        LEFT JOIN got g
          ON g.event_type = r.event_type AND g.chunk_start = r.chunk_start
    """,
    tags=("plan", "flagship"),
)
def ingest_plan_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's full daily-ingest plan as one query.

    catalog crossJoin chunks (R2×R4) → buffer clamp (R5) → left join
    against what already landed (R10 coverage check) → per-chunk counts
    (R11). Returns a coverage report: one row per (channel, hour chunk)
    with the buffered query bounds and how many events actually landed."""
    day = dt.datetime.strptime(AS_OF_DAY, "%Y-%m-%d")
    nxt = day + dt.timedelta(days=1)
    ev = load_table(spark, sf_dir, "events")
    catalog = ev.select("event_type").distinct()
    requests = chunked_requests(catalog, day, nxt)
    got = (
        ev.filter(
            (F.col("ts") >= F.lit(day.isoformat(sep=" ")).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(nxt.isoformat(sep=" ")).cast("timestamp_ntz"))
        )
        .groupBy(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("chunk_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        requests.join(F.broadcast(got), ["event_type", "chunk_start"], "left")
        .withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
        .select(
            "event_type",
            "chunk_start",
            "query_start",
            "query_end",
            "n_events",
            (F.col("n_events") > 0).alias("has_data"),
        )
    )


@register(
    "ingest_dedup_pending",
    oracle=f"""
        WITH chans AS (SELECT DISTINCT event_type FROM events),
        chunks AS (
            SELECT unnest(generate_series(
                TIMESTAMP '{AS_OF_DAY} 00:00:00',
                TIMESTAMP '{AS_OF_DAY} 23:00:00',
                INTERVAL 1 HOUR)) AS chunk_start
        ),
        requests AS (
            SELECT c.event_type, k.chunk_start FROM chans c CROSS JOIN chunks k
        )
        SELECT r.event_type, r.chunk_start
        FROM requests r
        WHERE NOT EXISTS (
            SELECT 1 FROM events e
            WHERE e.event_type = r.event_type
              AND e.ts >= r.chunk_start
              AND e.ts < r.chunk_start + INTERVAL 1 HOUR
        )
    """,
    tags=("plan",),
)
def ingest_dedup_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-existing dedup (R10): which (channel, chunk) requests have NO
    landed data and still need fetching. Reference does a per-file
    ``is_file()`` check (app.py:271-273); the distributed form is a
    single left-anti join against the aggregated sink listing."""
    day = dt.datetime.strptime(AS_OF_DAY, "%Y-%m-%d")
    nxt = day + dt.timedelta(days=1)
    ev = load_table(spark, sf_dir, "events")
    catalog = ev.select("event_type").distinct()
    requests = chunked_requests(catalog, day, nxt).select("event_type", "chunk_start")
    landed = (
        ev.filter(
            (F.col("ts") >= F.lit(day.isoformat(sep=" ")).cast("timestamp_ntz"))
            & (F.col("ts") < F.lit(nxt.isoformat(sep=" ")).cast("timestamp_ntz"))
        )
        .select(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("chunk_start"),
        )
        .distinct()
    )
    return requests.join(F.broadcast(landed), ["event_type", "chunk_start"], "left_anti")


@register(
    "ingest_object_keys",
    oracle="""
        SELECT event_id, object_key,
               SUBSTRING(object_key, 1, 8) AS date_part,
               string_split(string_split(object_key, '/')[2], '.')[1] AS parsed_channel,
               string_split(string_split(object_key, '/')[2], '.')[2] AS parsed_station
        FROM (
            SELECT event_id,
                   strftime(CAST(ts AS TIMESTAMP), '%Y%m%d') || '/' || event_type
                   || '.' || CAST(user_id AS VARCHAR)
                   || '.' || strftime(CAST(ts AS TIMESTAMP), '%Y%m%dT%H%M%S')
                   || '.mseed' AS object_key
            FROM events WHERE event_type = 'purchase'
        )
    """,
    tags=("plan",),
)
def ingest_object_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-key naming round-trip (R9 build → R16 parse → R17 layout).

    Builds the reference's date-partitioned key
    ``YYYYMMDD/NAME.ID.YYYYMMDDTHHMMSS.mseed`` (app.py:257-268,
    app.py:449-456) then re-extracts fields exactly the way the
    placeholder writer does (app.py:328-330) — filename-as-schema made
    explicit and testable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    key = F.concat_ws(
        "/",
        F.date_format("ts", "yyyyMMdd"),
        F.concat_ws(
            ".",
            F.col("event_type"),
            F.col("user_id").cast("string"),
            F.date_format("ts", "yyyyMMdd'T'HHmmss"),
            F.lit("mseed"),
        ),
    )
    df = ev.select("event_id", key.alias("object_key"))
    fname = F.element_at(F.split(F.col("object_key"), "/"), 2)
    return df.select(
        "event_id",
        "object_key",
        F.substring("object_key", 1, 8).alias("date_part"),
        F.element_at(F.split(fname, r"\."), 1).alias("parsed_channel"),
        F.element_at(F.split(fname, r"\."), 2).alias("parsed_station"),
    )


@register(
    "ingest_dead_letter_union",
    oracle="""
        SELECT event_id, event_type, ROUND(value, 4) AS value,
               FALSE AS is_placeholder,
               CAST(NULL AS VARCHAR) AS error_type
        FROM events
        WHERE event_type <> 'error'
        UNION ALL
        SELECT event_id, event_type, ROUND(value, 4) AS value,
               TRUE AS is_placeholder,
               'FETCH_ERROR' AS error_type
        FROM events
        WHERE event_type = 'error'
    """,
    tags=("plan",),
)
def ingest_dead_letter_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter channel (R15/R18): route failures into a
    union-compatible placeholder channel instead of dropping them
    (app.py:306-334 writes placeholder files; app.py:466-480 tags them
    ``is_placeholder``). One DataFrame, one boolean column — no
    out-of-band object tags needed."""
    ev = load_table(spark, sf_dir, "events")
    ok = ev.filter(F.col("event_type") != "error").select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.lit(False).alias("is_placeholder"),
        F.lit(None).cast("string").alias("error_type"),
    )
    bad = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        "event_type",
        F.round("value", 4).alias("value"),
        F.lit(True).alias("is_placeholder"),
        F.lit("FETCH_ERROR").alias("error_type"),
    )
    return ok.unionByName(bad)


@register(
    "ingest_gap_backfill",
    oracle="""
        WITH expected AS (
            SELECT t.event_type, h.hour_start
            FROM (SELECT DISTINCT event_type FROM events) t
            CROSS JOIN (
                SELECT unnest(generate_series(
                    TIMESTAMP '2024-01-01 00:00:00',
                    TIMESTAMP '2024-01-30 23:00:00',
                    INTERVAL 1 HOUR)) AS hour_start
            ) h
        ),
        actual AS (
            SELECT DISTINCT event_type,
                   CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                       AS hour_start
            FROM events
        )
        SELECT e.event_type, e.hour_start
        FROM expected e
        LEFT JOIN actual a
          ON e.event_type = a.event_type AND e.hour_start = a.hour_start
        WHERE a.event_type IS NULL
    """,
    tags=("ingest", "backfill"),
)
def ingest_gap_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-backfill work list: expected (channel × hour) grid MINUS
    hours that actually have data — the reference's reason to exist
    (daily re-runs + exists-skip, app.py:271-273, guarantee no hour is
    silently missing; this query finds the holes to refetch).

    The expected grid is sequence+explode (no driver loop); the holes
    are a left-anti join against the observed hours. At 100 TB the
    observed side pre-aggregates to DISTINCT (channel, hour) — tiny —
    so the anti-join broadcasts, and the fan-out grid never
    materializes more than (channels × hours) rows."""
    ev = load_table(spark, sf_dir, "events")
    channels = ev.select("event_type").distinct()
    hours = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp_ntz(F.lit("2024-01-01 00:00:00")),
                F.to_timestamp_ntz(F.lit("2024-01-30 23:00:00")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_start")
    )
    expected = channels.crossJoin(hours)
    actual = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).distinct()
    return expected.join(
        actual, ["event_type", "hour_start"], "left_anti"
    ).select("event_type", "hour_start")
