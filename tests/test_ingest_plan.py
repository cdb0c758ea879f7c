"""Pipeline-semantics unit tests with no SQL oracle (SURVEY.md §5):
chunk counts, buffer clamping at window edges, half-open bounds —
the behaviors of /root/reference/app.py:336-380 the engine must keep.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.plans.ingest import chunked_requests


def _catalog(spark, names=("HHZ",)):
    return spark.createDataFrame([(n,) for n in names], "channel string")


def test_chunk_count_matches_ceil(spark):
    """24 h window / 1 h chunks → exactly 24 chunks per catalog row
    (app.py:382: 72 fetches = 3 channels × 24)."""
    day = dt.datetime(2024, 1, 15)
    out = chunked_requests(_catalog(spark, ("HHZ", "HHN", "HHE")), day, day + dt.timedelta(days=1))
    assert out.count() == 72
    assert out.select("channel").distinct().count() == 3


def test_buffer_clamped_at_window_edges(spark):
    """First chunk's query_start and last chunk's query_end clamp to the
    window (app.py:375-376); interior chunks get the full ±120 s."""
    day = dt.datetime(2024, 1, 15)
    rows = (
        chunked_requests(_catalog(spark), day, day + dt.timedelta(days=1))
        .orderBy("chunk_start")
        .collect()
    )
    first, mid, last = rows[0], rows[5], rows[-1]
    assert first.query_start == day  # clamped, not day-120s
    assert first.query_end == day + dt.timedelta(hours=1, seconds=120)
    assert mid.query_start == mid.chunk_start - dt.timedelta(seconds=120)
    assert mid.query_end == mid.chunk_end + dt.timedelta(seconds=120)
    assert last.query_end == day + dt.timedelta(days=1)  # clamped


def test_half_open_chunks_no_overlap_no_gap(spark):
    """chunk_end[i] == chunk_start[i+1]: half-open [start, end) tiling."""
    day = dt.datetime(2024, 1, 15)
    rows = (
        chunked_requests(_catalog(spark), day, day + dt.timedelta(hours=6))
        .orderBy("chunk_start")
        .collect()
    )
    assert len(rows) == 6
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_end == b.chunk_start


def test_partial_trailing_chunk(spark):
    """A 90-minute window with 1 h chunks yields 2 chunks, the second
    clamped to the window end (reference: iterate_chunks stops past end,
    clamp keeps query_end <= end)."""
    start = dt.datetime(2024, 1, 15, 0, 0)
    end = dt.datetime(2024, 1, 15, 1, 30)
    rows = chunked_requests(_catalog(spark), start, end).orderBy("chunk_start").collect()
    assert len(rows) == 2
    assert rows[1].query_end == end
