"""Scheduled-ingest lifecycle (R22): cron ticks as availableNow runs.

The contract under test (reference app.py:674-679 cron + app.py:271-273
exists-skip): a re-fired trigger with no new data is a structural no-op,
and a trigger after new data arrives ingests ONLY the new data.
"""

from __future__ import annotations

import os

import pytest

from aws_seismic_data_pipeline_spark.streaming.scheduled import ScheduledIngest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture
def job(spark, tmp_path):
    j = ScheduledIngest(spark, base_dir=str(tmp_path / "sched"))
    yield j
    j.cleanup()


def test_trigger_twice_is_idempotent(job):
    job.add_file(f"{SF_DIR}/events.parquet")
    first = job.trigger_once()
    assert first.n_input_rows > 0
    assert first.n_rows_landed > 0
    assert first.n_hours_covered > 0
    assert first.max_event_ts is not None

    second = job.trigger_once()
    # cron re-fire, nothing new: zero input, sink coverage unchanged
    assert second.n_input_rows == 0
    assert second.n_rows_landed == first.n_rows_landed
    assert second.n_hours_covered == first.n_hours_covered
    assert second.max_event_ts == first.max_event_ts


def test_as_of_window_filters_sink(job, spark):
    """Only the as_of day's rows land (the reference's previous-UTC-day
    window, app.py:560-565, as an explicit filter)."""
    job.add_file(f"{SF_DIR}/events.parquet")
    report = job.trigger_once()
    landed = spark.read.parquet(job.sink)
    days = [r.event_day.isoformat() for r in landed.select("event_day").distinct().collect()]
    assert days == [job.as_of]
    assert report.n_rows_landed == landed.count()
    # the staged file spans the whole month: the window must be a strict cut
    assert report.n_input_rows > report.n_rows_landed


def test_new_file_triggers_incremental_ingest(job, spark, tmp_path):
    """A file that arrives between ticks is drained by the next tick —
    and ONLY that file (the checkpoint remembers the first)."""
    job.add_file(f"{SF_DIR}/events.parquet")
    first = job.trigger_once()

    # "new data lands in the bucket": a second file with in-window rows
    extra = str(tmp_path / "late_events.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.limit(500).write.parquet(extra)
    # single parquet file path for the symlink
    part = [
        os.path.join(extra, f) for f in os.listdir(extra) if f.endswith(".parquet")
    ][0]
    os.rename(part, str(tmp_path / "late_events_file.parquet"))
    job.add_file(str(tmp_path / "late_events_file.parquet"))

    second = job.trigger_once()
    assert second.n_input_rows == 500
    assert second.n_rows_landed >= first.n_rows_landed

    third = job.trigger_once()
    assert third.n_input_rows == 0
    assert third.n_rows_landed == second.n_rows_landed


def test_ledger_dataframe_shape(job):
    job.add_file(f"{SF_DIR}/events.parquet")
    job.trigger_once()
    job.trigger_once()
    rows = job.ledger().orderBy("run_seq").collect()
    assert [r.run_seq for r in rows] == [1, 2]
    assert rows[0].n_input_rows > 0 and rows[1].n_input_rows == 0
    assert rows[0].as_of == rows[1].as_of == job.as_of
