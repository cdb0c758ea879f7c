"""Real Structured Streaming jobs (SURVEY.md §2B stream_watermark_late,
stream_dedup_state).

Generalizes the reference's scheduled-batch ingest (``/root/reference/
app.py:674-679`` cron + ``app.py:498-619`` job body) into
``readStream`` → watermark → stateful op → ``writeStream`` with
``availableNow`` — the Spark-native replacement for "cron kicks a batch
over yesterday's window". The 120 s fetch buffer (``app.py:356``,
``app.py:595``) becomes the watermark delay: late events within the
buffer are folded in, older ones dropped.

No SQL oracle (stateful streaming semantics aren't batch-SQL
expressible); the driver records rows-only checks, and
``tests/test_streaming.py`` asserts equivalence against the batch
window queries where it must hold.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.catalog import load_table, prepare
from aws_seismic_data_pipeline_spark.registry import register


def _stream_dir(path: str) -> str:
    """FileStreamSource requires a *directory*; the fixtures are single
    parquet files. Stage a symlink inside a temp dir (no data copy)."""
    if os.path.isdir(path):
        return path
    d = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture.

    Schema is taken from the batch reader (nanos ts arrives as bigint —
    see catalog.py); event-time is cast to TimestampType for watermarks.
    """
    prepare(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(
        _stream_dir(f"{sf_dir}/events.parquet")
    )
    if "bigint" == dict(stream.dtypes).get("ts"):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_available_now(result: DataFrame, name: str) -> DataFrame:
    """Execute a streaming DataFrame to completion into a memory sink."""
    sink = f"sink_{name}_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete" if result.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(sink)


@register("stream_watermark_late", tags=("stream", "stateful"))
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregate under a 2-minute watermark (seed R5's
    120 s buffer + R22's delayed window close). Events later than the
    watermark are dropped from closed windows; within it, folded in."""
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_available_now(agg, "watermark_late")


@register("stream_dedup_state", tags=("stream", "stateful"))
def stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on the natural key (seed R10: the
    reference's exists-check skip, app.py:271-273/419-421, as streaming
    state). Key = (event_type, user_id, minute bucket); watermark bounds
    the dedup state so it cannot grow unboundedly at 100 TB."""
    stream = _events_stream(spark, sf_dir)
    keyed = stream.withColumn("minute_bucket", F.date_trunc("minute", "ts"))
    deduped = (
        keyed.withWatermark("ts", "2 minutes")
        .dropDuplicates(["event_type", "user_id", "minute_bucket"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return _run_available_now(deduped, "dedup_state")
