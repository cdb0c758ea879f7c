"""Type-2 slowly-changing-dimension build from an event stream.

The reference tracks only current state — its placeholder flag is
overwritten in place on refresh (``/root/reference/app.py:271-273,
466-480``), so history is lost. The warehouse-standard answer is SCD2:
every attribute change closes the previous version row and opens a new
one with ``valid_from``/``valid_to``/``is_current``. This module builds
that dimension declaratively from the raw event log.

Scale shape: every step — change detection (lag), version numbering
(running sum of change flags), run collapse (groupBy user+version), and
interval stitching (lead) — partitions by the SAME key (``user_id``), so
Catalyst plans ONE exchange and every window/aggregate rides it. At
100 TB the event log shuffles once, and a per-user partition is bounded
by that user's history, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import register


def scd2_from_events(
    events: DataFrame,
    key: str,
    attr: str,
    order: list[str],
) -> DataFrame:
    """Collapse an event log into SCD2 version rows.

    Consecutive events with the same ``attr`` value merge into one
    version (run-length collapse via the lag≠current change flag and a
    running sum); each version's ``valid_to`` is the next version's
    ``valid_from`` (NULL on the current row). Deterministic given a
    deterministic ``order`` within each key."""
    w_seq = Window.partitionBy(key).orderBy(*order)
    changed = (
        F.lag(attr).over(w_seq).isNull()
        | (F.lag(attr).over(w_seq) != F.col(attr))
    ).cast("int")
    versioned = events.withColumn(
        "version",
        F.sum(changed).over(
            w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = versioned.groupBy(key, "version").agg(
        F.min(attr).alias(attr),
        F.min(order[0]).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_ver = Window.partitionBy(key).orderBy("version")
    valid_to = F.lead("valid_from").over(w_ver)
    return runs.select(
        key,
        "version",
        attr,
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        "n_events",
    )


@register(
    "plan_scd2_dimension",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type,
                   CAST(ts AS TIMESTAMP) AS ts,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        versioned AS (
            SELECT user_id, event_type, ts,
                   -- CAST: DuckDB SUM(int) yields HUGEINT, which fetchdf
                   -- renders as float64 (1.0) while Spark emits bigint (1)
                   -- — the r3 driver hash mismatch. Same trap as n_events.
                   CAST(SUM(CASE WHEN prev_type IS NULL
                             OR prev_type <> event_type
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS version
            FROM ordered
        ),
        runs AS (
            SELECT user_id, version,
                   MIN(event_type) AS event_type,
                   MIN(ts) AS valid_from,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM versioned
            GROUP BY user_id, version
        )
        SELECT user_id, version, event_type, valid_from,
               LEAD(valid_from) OVER (
                   PARTITION BY user_id ORDER BY version
               ) AS valid_to,
               LEAD(valid_from) OVER (
                   PARTITION BY user_id ORDER BY version
               ) IS NULL AS is_current,
               n_events
        FROM runs
    """,
    tags=("plan", "window"),
)
def plan_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the event log: each user's ``event_type`` is the tracked
    attribute; consecutive same-type events collapse into one version row
    with [valid_from, valid_to) validity and an is_current flag.

    All four steps share the user_id partitioning — the plan carries
    exactly one hash exchange (locked in tests/test_plans.py). ``attr``
    within a run is constant, so first() == MIN() keeps the Spark and
    oracle forms identical without relying on first-row semantics."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    )
    return scd2_from_events(
        events, key="user_id", attr="event_type", order=["ts", "event_id"]
    )
