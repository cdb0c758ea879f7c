"""Custom Python DataSource (Spark 4 API): rate-limited HTTP fetch.

The reference's fetch loop (``/root/reference/app.py:285-313`` +
per-IP semaphore ``app.py:399-432``) as a first-class *source*:
``spark.read.format("stub_http").option(...)`` — the engine-native way
to expose "a remote service is the table". One input partition per
host (seed R11: ``requests_by_ip``), so Spark schedules hosts in
parallel while the in-partition semaphore caps per-host concurrency at
the reference's 3 — the two levels compose exactly like SURVEY.md §4's
key-grouped-execution note.

The transport is the same deterministic stub as sources/http_fetch.py
(no live network in tests/driver); swap ``stub_transport`` for an
aiohttp call in production.
"""

from __future__ import annotations

import asyncio
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from aws_seismic_data_pipeline_spark.registry import register
from aws_seismic_data_pipeline_spark.sources.http_fetch import (
    FETCH_RESULT_FIELDS,
    _fetch_one,
    stub_transport,
)

FETCH_SCHEMA = T.StructType(
    [T.StructField("host", T.StringType(), False)] + FETCH_RESULT_FIELDS
)


class HostPartition(InputPartition):
    def __init__(self, host: str, urls: list[str]):
        self.host = host
        self.urls = urls


class StubHttpReader(DataSourceReader):
    def __init__(self, options):
        self.urls: list[str] = json.loads(options.get("urls", "[]"))
        self.max_concurrency = int(options.get("max_concurrency", "3"))

    def partitions(self):
        by_host: dict[str, list[str]] = {}
        for u in self.urls:
            # host = authority component, the reference's url.split('/')[2]
            host = u.split("/")[2] if "//" in u else "unknown"
            by_host.setdefault(host, []).append(u)
        return [HostPartition(h, us) for h, us in sorted(by_host.items())]

    def read(self, partition: HostPartition) -> Iterator[tuple]:
        async def drain() -> list[dict]:
            sem = asyncio.Semaphore(self.max_concurrency)
            return list(
                await asyncio.gather(
                    *[_fetch_one(sem, stub_transport, u) for u in partition.urls]
                )
            )

        for r in asyncio.run(drain()):
            yield (
                partition.host,
                r["url"],
                r["status"],
                r["content"],
                r["content_len"],
                r["is_placeholder"],
                r["error_type"],
                r["error_message"],
            )


class StubHttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stub_http"

    def schema(self):
        return FETCH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return StubHttpReader(self.options)


@register(
    "source_http_datasource",
    oracle="""
        SELECT host,
               CAST(is_placeholder AS BOOLEAN) AS is_placeholder,
               error_type,
               CAST(n_requests AS BIGINT) AS n_requests,
               CAST(total_bytes AS BIGINT) AS total_bytes
        FROM (VALUES
            ('10.144.0.10:8080', false, CAST(NULL AS VARCHAR), 4, 224),
            ('10.144.0.11:8080', false, CAST(NULL AS VARCHAR), 4, 288),
            ('10.144.0.12:8080', true, 'CONNECTION_ERROR', 4, 0)
        ) t(host, is_placeholder, error_type, n_requests, total_bytes)
    """,
    tags=("source",),
)
def source_http_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the sensor fleet through the custom DataSource: 3 hosts ×
    4 hourly chunks, one Spark partition per host. Per-row semantics are
    the same error-channel contract as ``source_http_fetch`` and are
    pytest-verified.

    Oracle (new in r4 — was rows-only): a GOLDEN expectation — the stub
    payloads are md5-derived constants of the URL list, so the per-host
    byte totals and the dead-host dead-letter rows are fixed. Breaks if
    partitioning-by-host, the semaphore drain, or error routing
    changes."""
    spark.dataSource.register(StubHttpDataSource)
    hosts = ["10.144.0.10:8080", "10.144.0.11:8080", "10.144.0.12:8080"]
    urls = [
        f"http://{h}/data?channel=OX.ST{i}.00.HHZ&from=2024-01-15T{hh:02d}"
        + ("&timeout=1" if i == 2 else "")
        for i, h in enumerate(hosts)
        for hh in range(4)
    ]
    df = (
        spark.read.format("stub_http")
        .option("urls", json.dumps(urls))
        .option("max_concurrency", "3")
        .load()
    )
    return (
        df.groupBy("host", "is_placeholder", "error_type")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("content_len"), F.lit(0))).alias("total_bytes"),
        )
        .orderBy("host", "is_placeholder", "error_type")
    )


class StubHttpStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: each ``read`` drains every
    hourly chunk that has become available since the last offset — the
    reference's scheduled polling loop (``app.py:571-619``) as a
    checkpointable streaming source. Offsets are just the count of
    chunks already emitted, so recovery replays deterministically
    (``readBetweenOffsets`` re-fetches the exact slice — pytest-pinned
    replay == original); the per-host semaphore caps concurrency inside
    the drain exactly like the batch reader."""

    def __init__(self, options):
        self.urls: list[str] = json.loads(options.get("urls", "[]"))
        self.max_concurrency = int(options.get("max_concurrency", "3"))

    def initialOffset(self):
        return {"emitted": 0}

    def _fetch_slice(self, lo: int, hi: int) -> list[tuple]:
        urls = self.urls[lo:hi]

        async def drain() -> list[dict]:
            sem = asyncio.Semaphore(self.max_concurrency)
            return list(
                await asyncio.gather(
                    *[_fetch_one(sem, stub_transport, u) for u in urls]
                )
            )

        rows = []
        for r in asyncio.run(drain()):
            host = r["url"].split("/")[2] if "//" in r["url"] else "unknown"
            rows.append(
                (
                    host,
                    r["url"],
                    r["status"],
                    r["content"],
                    r["content_len"],
                    r["is_placeholder"],
                    r["error_type"],
                    r["error_message"],
                )
            )
        return rows

    def read(self, start):
        lo = start["emitted"]
        hi = len(self.urls)  # everything available now
        if lo >= hi:
            return iter([]), start
        return iter(self._fetch_slice(lo, hi)), {"emitted": hi}

    def readBetweenOffsets(self, start, end):
        return iter(self._fetch_slice(start["emitted"], end["emitted"]))


class StubHttpStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "stub_http_stream"

    def schema(self):
        return FETCH_SCHEMA

    def simpleStreamReader(self, schema) -> StubHttpStreamReader:
        return StubHttpStreamReader(self.options)


@register(
    "stream_http_datasource",
    oracle="""
        SELECT host,
               CAST(is_placeholder AS BOOLEAN) AS is_placeholder,
               error_type,
               CAST(n_requests AS BIGINT) AS n_requests,
               CAST(total_bytes AS BIGINT) AS total_bytes
        FROM (VALUES
            ('10.144.0.10:8080', false, CAST(NULL AS VARCHAR), 4, 224),
            ('10.144.0.11:8080', false, CAST(NULL AS VARCHAR), 4, 288),
            ('10.144.0.12:8080', true, 'CONNECTION_ERROR', 4, 0)
        ) t(host, is_placeholder, error_type, n_requests, total_bytes)
    """,
    tags=("stream", "source"),
)
def stream_http_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sensor fleet as a STREAMING Python DataSource (Spark 4
    ``SimpleDataSourceStreamReader``): checkpointed offsets over the
    chunk sequence, each micro-batch draining what the poll finds
    pending — the API-complete streaming twin of
    ``source_http_datasource`` (same 12 chunks, same error-channel
    contract), closing the reference's scheduler loop
    (``app.py:571-619``) through the engine's own source API rather
    than foreachBatch plumbing. Single availableNow drain of the fixed
    fleet => deterministic => the identical GOLDEN oracle applies; the
    offset-replay contract (``readBetweenOffsets`` == original slice)
    is pinned in tests/test_streaming.py."""
    import tempfile

    spark.dataSource.register(StubHttpStreamDataSource)
    hosts = ["10.144.0.10:8080", "10.144.0.11:8080", "10.144.0.12:8080"]
    urls = [
        f"http://{h}/data?channel=OX.ST{i}.00.HHZ&from=2024-01-15T{hh:02d}"
        + ("&timeout=1" if i == 2 else "")
        for i, h in enumerate(hosts)
        for hh in range(4)
    ]
    ckpt = tempfile.mkdtemp(prefix="stream_http_ds_")
    name = "stream_http_ds_sink"
    df = (
        spark.readStream.format("stub_http_stream")
        .option("urls", json.dumps(urls))
        .option("max_concurrency", "3")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return (
        spark.table(name)
        .groupBy("host", "is_placeholder", "error_type")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("content_len"), F.lit(0))).alias(
                "total_bytes"
            ),
        )
        .orderBy("host", "is_placeholder", "error_type")
        .localCheckpoint(eager=True)
    )


class StagedCommitMessage(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count."""

    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class StagedJsonlWriter(DataSourceWriter):
    """Two-phase-commit batch writer: each task streams its rows to a
    STAGING file and returns a commit message; only the driver's
    ``commit`` — which runs iff every task succeeded — publishes the
    staged files into the final directory and stamps a ``_SUCCESS``
    manifest listing them with row counts. ``abort`` removes the
    staging area, so a failed/repeated job never leaves torn output —
    the exactly-once publish contract the reference approximates with
    upload-then-delete (``app.py:296-327``), expressed through the
    engine's own writer protocol instead of application code."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("staged_jsonl: 'path' option is required")

    def write(self, iterator) -> StagedCommitMessage:
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return StagedCommitMessage(staged, n)

    def commit(self, messages) -> None:
        import json as _json
        import os

        manifest = []
        for m in messages:
            final = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, final)  # atomic within the volume
            manifest.append(
                {"file": os.path.basename(final), "n_rows": m.n_rows}
            )
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            _json.dump({"files": manifest}, fh)
        os.rmdir(os.path.join(self.path, "_staging"))

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class StagedJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "staged_jsonl"

    def writer(self, schema, overwrite: bool) -> StagedJsonlWriter:
        return StagedJsonlWriter(self.options)


@register(
    "sink_python_datasource",
    oracle="""
        SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
    tags=("sink", "source"),
)
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round trip through the CUSTOM Python DataSource WRITER
    (completing the connector matrix: batch read
    ``source_http_datasource``, streaming read
    ``stream_http_datasource``, and now batch WRITE): the nation dim
    is written through ``staged_jsonl``'s two-phase commit — stage per
    task, publish-all-or-nothing on driver commit with a ``_SUCCESS``
    manifest — then read back from the published files and returned.
    The oracle is the source table itself: the round trip must be
    lossless. tests/test_cloud.py additionally pins the protocol:
    manifest row counts match, no ``_staging`` residue survives
    commit, and a mid-write task failure leaves the target EMPTY
    (abort), never torn."""
    import tempfile

    from aws_seismic_data_pipeline_spark.catalog import load_table, scratch_cleanup

    spark.dataSource.register(StagedJsonlDataSource)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out_dir = tempfile.mkdtemp(prefix="staged_jsonl_sink_")
    with scratch_cleanup(out_dir):
        nation.write.format("staged_jsonl").option("path", out_dir).mode(
            "append"
        ).save()
        readback = spark.read.schema(
            "n_nationkey long, n_name string, n_regionkey long"
        ).json(f"{out_dir}/part-*.jsonl")
        # materialize before scratch_cleanup removes the published files
        return readback.localCheckpoint(eager=True)
