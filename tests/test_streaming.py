"""Structured Streaming jobs: the streamed result must equal the batch
window aggregate on the same fixture (single availableNow pass ⇒ no
late-drop divergence), and stateful dedup must match batch distinct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table
from aws_seismic_data_pipeline_spark.registry import load_all

from .conftest import SF_DIR

REGISTRY = load_all()


def test_stream_tumbling_equals_batch(spark):
    streamed = REGISTRY["stream_watermark_late"].builder(spark, SF_DIR)
    batch = REGISTRY["stream_tumbling_agg"].builder(spark, SF_DIR)
    s = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in streamed.collect()
    }
    b = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    assert s == b


def test_stream_dedup_matches_batch_distinct(spark):
    streamed = {r.event_type: r.n_unique for r in
                REGISTRY["stream_dedup_state"].builder(spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    batch = {
        r.event_type: r.n_unique
        for r in ev.withColumn("minute_bucket", F.date_trunc("minute", "ts"))
        .select("event_type", "user_id", "minute_bucket")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
        .collect()
    }
    assert streamed == batch
