"""Distributed rate-limited HTTP fetch with an error channel.

Generalizes the reference's fetch core (``/root/reference/
app.py:285-313`` ``make_async_request``, ``app.py:399-432`` per-IP
semaphore batching, ``app.py:306-334`` dead-letter placeholders) into a
Spark stage:

- requests are repartitioned by host so each task owns one (or few)
  hosts (seed R11, ``app.py:391-397`` ``requests_by_ip``);
- inside each task an asyncio semaphore caps in-flight requests per
  host at ``max_concurrency`` = 3, exactly the reference's
  ``n_async_requests`` (``app.py:400-401``);
- every row comes back — success rows carry ``content``, failures
  carry ``error_type``/``error_message`` (R15's placeholder record as
  an error-channel column, not an out-of-band file);
- zero-byte payloads are flagged, mirroring the "won't write a zero
  byte file" filter (``app.py:296-299``).

The transport is injectable. Real network calls don't belong in tests
or the driver harness, so the default is a deterministic stub that
derives bytes from the URL hash — the Spark-side plumbing (schema,
partitioning, Arrow batching, error routing) is identical to what a
real aiohttp transport would use.
"""

from __future__ import annotations

import asyncio
import hashlib
import os
import socket
import urllib.error
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional: the reference's actual client library (app.py:285)
    import aiohttp
except ImportError:  # container has no aiohttp; urllib path still real
    aiohttp = None

FETCH_RESULT_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("status", T.IntegerType(), True),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("content_len", T.LongType(), True),
    T.StructField("is_placeholder", T.BooleanType(), False),
    T.StructField("error_type", T.StringType(), True),
    T.StructField("error_message", T.StringType(), True),
]


class FetchError(Exception):
    def __init__(self, error_type: str, message: str):
        super().__init__(message)
        self.error_type = error_type


def stub_transport(url: str) -> bytes:
    """Deterministic fake GET: payload derived from the URL digest.

    URLs containing ``status=404`` raise HTTP_ERROR, ``timeout=1``
    raise CONNECTION_ERROR (the two error classes the reference routes,
    app.py:306-313); ``empty=1`` returns b"" (zero-byte path)."""
    if "status=404" in url:
        raise FetchError("HTTP_ERROR", f"404 Not Found: {url}")
    if "timeout=1" in url:
        raise FetchError("CONNECTION_ERROR", f"timeout connecting: {url}")
    if "empty=1" in url:
        return b""
    digest = hashlib.md5(url.encode()).digest()
    return digest * (1 + digest[0] % 8)


def urllib_transport(url: str, timeout: float = 10.0) -> bytes:
    """Real blocking GET over stdlib urllib.

    Maps failures onto the reference's two error classes exactly as
    ``make_async_request`` does (``/root/reference/app.py:306-313``):
    HTTP status errors (raise_for_status analog) → HTTP_ERROR; timeouts,
    refused connections, and DNS failures → CONNECTION_ERROR. Runs in a
    worker thread per request (``asyncio.to_thread``), so the per-host
    semaphore still bounds concurrency."""
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:  # subclass of URLError: catch first
        raise FetchError("HTTP_ERROR", f"{e.code} {e.reason}: {url}") from e
    except (urllib.error.URLError, socket.timeout, TimeoutError, OSError) as e:
        raise FetchError("CONNECTION_ERROR", f"{e}: {url}") from e


async def aiohttp_transport(url: str, timeout: float = 10.0) -> bytes:
    """Async GET mirroring the reference's ``make_async_request``
    (``app.py:285-313``): raise_for_status → HTTP_ERROR, client/timeout
    errors → CONNECTION_ERROR. Only importable-when-available; transport
    resolution raises on the driver if aiohttp is missing."""
    try:
        tmo = aiohttp.ClientTimeout(total=timeout)
        async with aiohttp.ClientSession(timeout=tmo) as session:
            async with session.get(url) as resp:
                resp.raise_for_status()
                return await resp.read()
    except aiohttp.ClientResponseError as e:
        raise FetchError("HTTP_ERROR", f"{e.status} {e.message}: {url}") from e
    except (aiohttp.ClientError, asyncio.TimeoutError) as e:
        raise FetchError("CONNECTION_ERROR", f"{e!r}: {url}") from e


#: Named transports selectable by flag / env. ``stub`` stays the default
#: everywhere tests and the driver harness run (no network in CI).
TRANSPORTS: dict[str, Callable] = {"stub": stub_transport, "urllib": urllib_transport}
if aiohttp is not None:
    TRANSPORTS["aiohttp"] = aiohttp_transport


def resolve_transport(transport: Callable[[str], bytes] | str) -> Callable:
    """Resolve a transport flag to a callable, failing fast on the driver
    (not inside executor tasks) when the named transport is unavailable."""
    if callable(transport):
        return transport
    if transport == "aiohttp" and aiohttp is None:
        raise ImportError(
            "transport='aiohttp' requires the aiohttp package; "
            "use transport='urllib' (stdlib) or 'stub'"
        )
    try:
        return TRANSPORTS[transport]
    except KeyError:
        raise ValueError(
            f"unknown transport {transport!r}; expected one of {sorted(TRANSPORTS)}"
        ) from None


async def _fetch_one(sem: asyncio.Semaphore, transport, url: str) -> dict:
    async with sem:
        try:
            if asyncio.iscoroutinefunction(transport):
                data = await transport(url)
            else:
                data = await asyncio.to_thread(transport, url)
            return {
                "url": url,
                "status": 200,
                "content": data,
                "content_len": len(data),
                "is_placeholder": False,
                "error_type": None,
                "error_message": None,
            }
        except FetchError as e:
            return {
                "url": url,
                "status": 404 if e.error_type == "HTTP_ERROR" else None,
                "content": None,
                "content_len": None,
                "is_placeholder": True,
                "error_type": e.error_type,
                "error_message": str(e),
            }
        except Exception as e:  # unexpected → dead-letter, never crash the job
            return {
                "url": url,
                "status": None,
                "content": None,
                "content_len": None,
                "is_placeholder": True,
                "error_type": "UNKNOWN_ERROR",
                "error_message": repr(e),
            }


def fetch_urls(
    requests: DataFrame,
    url_col: str = "url",
    transport: Callable[[str], bytes] | str = "stub",
    max_concurrency: int = 3,
) -> DataFrame:
    """Fetch every URL in ``requests`` with bounded per-task concurrency.

    Input: any DataFrame with a ``url_col`` string column and a ``host``
    column to co-locate by. Output: input columns are replaced by the
    fetch-result schema (join back on ``url`` to re-attach request
    metadata — keeps the Arrow payload small).

    ``transport`` selects the I/O backend by flag ("stub" | "urllib" |
    "aiohttp") or takes a callable directly; all backends share the same
    error-channel contract (FetchError → dead-letter row).
    """
    transport = resolve_transport(transport)
    schema = T.StructType(FETCH_RESULT_FIELDS)

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def drain(urls: list[str]) -> list[dict]:
            sem = asyncio.Semaphore(max_concurrency)
            return list(
                await asyncio.gather(*[_fetch_one(sem, transport, u) for u in urls])
            )

        for pdf in batches:
            urls = pdf[url_col].tolist()
            if not urls:
                continue
            results = asyncio.run(drain(urls))
            yield pd.DataFrame(results)

    # Co-locate per host (seed R11) so the semaphore actually caps
    # per-host concurrency across the cluster, then fetch.
    cols = requests.columns
    partitioned = (
        requests.repartition(F.col("host")) if "host" in cols else requests
    )
    return partitioned.mapInPandas(run_partition, schema)


from aws_seismic_data_pipeline_spark.catalog import load_table  # noqa: E402
from aws_seismic_data_pipeline_spark.registry import register  # noqa: E402


@register(
    "source_http_fetch",
    oracle="""
        SELECT CAST(is_placeholder AS BOOLEAN) AS is_placeholder,
               error_type,
               CAST(n_requests AS BIGINT) AS n_requests,
               CAST(total_bytes AS BIGINT) AS total_bytes
        FROM (VALUES
            (false, CAST(NULL AS VARCHAR), 24, 1792),
            (true, 'CONNECTION_ERROR', 6, 0)
        ) t(is_placeholder, error_type, n_requests, total_bytes)
    """,
    tags=("source",),
)
def source_http_fetch(spark, sf_dir: str) -> DataFrame:
    """Fetch-per-row source demo (R12/R13): build sensor URLs from the
    station catalog × 6 hourly chunks, fetch through the deterministic
    stub transport, and report the success/dead-letter split per host.
    Error-channel semantics are pytest-verified in
    tests/test_http_fetch.py.

    Oracle (new in r4 — was rows-only): a GOLDEN expectation. The stub
    transport derives payload bytes from each URL's md5 digest, so the
    success/dead-letter split and total byte count are constants of the
    catalog (5 reachable stations × 6 hours = 30 requests; DRUM's 6
    time out). Any change to URL construction, digest sizing, error
    routing, or the aggregation breaks the hash — an end-to-end pin,
    not a tautology."""
    from aws_seismic_data_pipeline_spark.sources.readers import (
        CATALOG_SCHEMA,
        STATION_CATALOG,
    )

    catalog = spark.createDataFrame(
        [tuple(r[f.name] for f in CATALOG_SCHEMA.fields) for r in STATION_CATALOG],
        CATALOG_SCHEMA,
    ).filter(F.col("sensor_ip").isNotNull())
    hours = spark.range(6).select(
        F.concat(F.lit("2024-01-15T"), F.lpad(F.col("id").cast("string"), 2, "0")).alias(
            "hour_tag"
        )
    )
    requests = catalog.crossJoin(hours).select(
        F.col("sensor_ip").alias("host"),
        F.concat(
            F.lit("http://"),
            F.col("sensor_ip"),
            F.lit("/data?channel="),
            F.concat_ws(".", "network", "station", "location", "channel"),
            F.lit("&from="),
            F.col("hour_tag"),
            # DRUM station simulates a dead sensor → CONNECTION_ERROR rows
            F.when(F.col("station") == "DRUM", F.lit("&timeout=1")).otherwise(F.lit("")),
        ).alias("url"),
    )
    # stub by default (driver harness runs offline); operators opt into a
    # real backend via SPARK_GRAFT_HTTP_TRANSPORT=urllib|aiohttp
    fetched = fetch_urls(
        requests, transport=os.environ.get("SPARK_GRAFT_HTTP_TRANSPORT", "stub")
    )
    return (
        fetched.groupBy("is_placeholder", "error_type")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("content_len"), F.lit(0))).alias("total_bytes"),
        )
        .orderBy("is_placeholder", "error_type")
    )
