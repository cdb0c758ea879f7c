"""Scheduled-ingest lifecycle (seed R22–R24): cron semantics as data.

The reference schedules its daily ingest with a crontab line and a
wall-clock "yesterday" computed at runtime (``/root/reference/
app.py:674-679`` cron → ``app.py:560-565`` previous-UTC-day window).
That lifecycle — *a trigger fires, the job ingests whatever new data its
window covers, records what it did, and a re-fire is a no-op unless new
data arrived* — is modeled here as a Structured Streaming
``availableNow`` job plus a run ledger:

- the **trigger** is :meth:`ScheduledIngest.trigger_once` — each call is
  one cron tick; ``availableNow`` drains exactly the files that appeared
  since the last tick (the file source's checkpoint is the "already
  fetched" state the reference keeps as ``is_file()`` probes,
  app.py:271-273);
- the **window** is the explicit ``as_of`` day parameter (no wall-clock
  dependence — SURVEY.md §7 hard-part (b)), applied as a filter before
  the sink so out-of-window rows never land;
- the **ledger** records per-run input rows, landed coverage (hours with
  data), and the event-time high-water mark — the observable the
  reference never writes down (its only record is S3 object existence).

Idempotency is structural, not best-effort: re-triggering with no new
files reads zero rows from the checkpointed source, so the sink is
byte-identical and the ledger shows ``n_input_rows = 0`` for the re-run.
At 100 TB the same shape holds — the checkpoint scales with file count,
not bytes, and each tick's work is proportional to NEW data only.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.registry import register
from aws_seismic_data_pipeline_spark.streaming.jobs import _events_stream_from_dir

AS_OF_DAY = "2024-01-15"  # matches plans/ingest.py; fixtures are seeded


@dataclass(frozen=True)
class IngestRunReport:
    """What one cron tick did — the ledger row."""

    run_seq: int
    as_of: str
    n_input_rows: int
    n_rows_landed: int
    n_hours_covered: int
    max_event_ts: str | None


class ScheduledIngest:
    """One scheduled ingest job: staging dir + sink + checkpoint + ledger.

    ``trigger_once()`` is the cron tick. New source files are staged into
    ``self.staging`` (symlinks — the test/fixture analog of objects
    landing in a bucket); each tick drains only what the checkpoint has
    not seen.
    """

    def __init__(
        self,
        spark: SparkSession,
        as_of: str = AS_OF_DAY,
        base_dir: str | None = None,
    ):
        self.spark = spark
        self.as_of = as_of
        self.base = base_dir or tempfile.mkdtemp(prefix="sched_ingest_")
        self.staging = os.path.join(self.base, "incoming")
        self.sink = os.path.join(self.base, "landed")
        self.ckpt = os.path.join(self.base, "_checkpoint")
        os.makedirs(self.staging, exist_ok=True)
        self.runs: list[IngestRunReport] = []

    def add_file(self, path: str) -> None:
        """A new source file "arrives" (symlink: no data copy)."""
        link = os.path.join(self.staging, os.path.basename(path))
        if not os.path.exists(link):
            os.symlink(os.path.abspath(path), link)

    def trigger_once(self) -> IngestRunReport:
        """One cron tick: drain new files → filter to the as_of window →
        append to the date-partitioned sink → ledger the run."""
        stream = _events_stream_from_dir(self.spark, self.staging)
        day = F.to_timestamp_ntz(F.lit(f"{self.as_of} 00:00:00"))
        windowed = stream.filter(
            (F.col("ts") >= day) & (F.col("ts") < day + F.expr("INTERVAL 1 DAY"))
        ).withColumn("event_day", F.to_date("ts"))
        q = (
            windowed.writeStream.format("parquet")
            .option("path", self.sink)
            .option("checkpointLocation", self.ckpt)
            .outputMode("append")
            .partitionBy("event_day")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_input = 0
        for p in q.recentProgress:
            # recentProgress rows are dicts in PySpark
            n_input += int(p["numInputRows"] if isinstance(p, dict) else p.numInputRows)

        landed_files = any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.sink)
            for f in fs
        ) if os.path.isdir(self.sink) else False
        if landed_files:
            landed = self.spark.read.parquet(self.sink)
            cov = landed.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(F.date_trunc("hour", "ts")).alias("h"),
                F.max("ts").cast("string").alias("m"),
            ).collect()[0]
            n_rows, n_hours, max_ts = int(cov["n"]), int(cov["h"]), cov["m"]
        else:  # nothing ever landed (e.g. first tick saw no files)
            n_rows, n_hours, max_ts = 0, 0, None
        report = IngestRunReport(
            run_seq=len(self.runs) + 1,
            as_of=self.as_of,
            n_input_rows=n_input,
            n_rows_landed=n_rows,
            n_hours_covered=n_hours,
            max_event_ts=max_ts,
        )
        self.runs.append(report)
        return report

    def ledger(self) -> DataFrame:
        """The run ledger as a DataFrame (one row per cron tick)."""
        return self.spark.createDataFrame(
            [
                (r.run_seq, r.as_of, r.n_input_rows, r.n_rows_landed,
                 r.n_hours_covered, r.max_event_ts)
                for r in self.runs
            ],
            "run_seq int, as_of string, n_input_rows bigint, "
            "n_rows_landed bigint, n_hours_covered bigint, max_event_ts string",
        )

    def cleanup(self) -> None:
        shutil.rmtree(self.base, ignore_errors=True)


@register(
    "stream_scheduled_ingest",
    oracle="""
        WITH landed AS (
            SELECT CAST(ts AS TIMESTAMP) AS ts FROM events
            WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
              AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-16 00:00:00'
        ),
        cov AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(DISTINCT date_trunc('hour', ts)) AS BIGINT)
                       AS n_hours,
                   CAST(MAX(ts) AS VARCHAR) AS max_ts
            FROM landed
        )
        SELECT CAST(1 AS INTEGER) AS run_seq,
               '2024-01-15' AS as_of,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_input_rows,
               n_rows AS n_rows_landed,
               n_hours AS n_hours_covered,
               max_ts AS max_event_ts
        FROM cov
        UNION ALL
        SELECT CAST(2 AS INTEGER), '2024-01-15', CAST(0 AS BIGINT),
               n_rows, n_hours, max_ts
        FROM cov
    """,
    tags=("stream", "plan"),
)
def stream_scheduled_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cron lifecycle end-to-end (R22): two ticks over the events
    fixture. Tick 1 ingests the as_of day's rows; tick 2 re-fires with
    no new files and must be a structural no-op (0 input rows, sink
    coverage unchanged). Returns the 2-row run ledger; per-run values
    are also pytest-asserted in tests/test_scheduled.py.

    Oracle (new in r4 — was rows-only): the ledger is deterministic
    given the fixture — tick 1 reads every source row (numInputRows is
    pre-filter) and lands exactly the as_of day's rows; tick 2 reads 0
    and leaves coverage unchanged. The checkpoint/trigger machinery
    itself isn't SQL, but its OBSERVABLE ledger is."""
    base = os.path.join(
        tempfile.gettempdir(), f"sched_ingest_q_{uuid.uuid4().hex[:8]}"
    )
    job = ScheduledIngest(spark, base_dir=base)
    try:
        job.add_file(f"{sf_dir}/events.parquet")
        job.trigger_once()
        job.trigger_once()  # cron re-fire: must be a no-op
        out = job.ledger().localCheckpoint(eager=True)
    finally:
        job.cleanup()
    return out
