"""Error-channel fetch semantics (reference app.py:285-334):
success rows carry bytes, failures become dead-letter rows (never
exceptions), zero-byte payloads are flagged, all requests come back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import functools
import http.server
import threading
import time

import pytest

from aws_seismic_data_pipeline_spark.sources.http_fetch import (
    TRANSPORTS,
    FetchError,
    fetch_urls,
    resolve_transport,
    stub_transport,
    urllib_transport,
)


def _requests(spark, urls):
    return spark.createDataFrame(
        [(u.split("/")[2], u) for u in urls], "host string, url string"
    )


def test_all_requests_return_exactly_once(spark):
    urls = [f"http://h{i % 3}/data?chunk={i}" for i in range(20)]
    out = fetch_urls(_requests(spark, urls)).collect()
    assert sorted(r.url for r in out) == sorted(urls)


def test_error_routing_to_dead_letter(spark):
    urls = [
        "http://h0/data?ok=1",
        "http://h0/data?status=404",
        "http://h1/data?timeout=1",
    ]
    out = {r.url: r for r in fetch_urls(_requests(spark, urls)).collect()}
    ok = out["http://h0/data?ok=1"]
    assert not ok.is_placeholder and ok.status == 200 and ok.content_len > 0
    http_err = out["http://h0/data?status=404"]
    assert http_err.is_placeholder and http_err.error_type == "HTTP_ERROR"
    assert http_err.content is None
    conn_err = out["http://h1/data?timeout=1"]
    assert conn_err.is_placeholder and conn_err.error_type == "CONNECTION_ERROR"


def test_zero_byte_payload_filterable(spark):
    """app.py:296-299: empty payloads must be detectable (the reference
    refuses to write zero-byte files — here a filter drops them)."""
    urls = ["http://h0/data?empty=1", "http://h0/data?ok=1"]
    fetched = fetch_urls(_requests(spark, urls))
    writable = fetched.filter(
        (~F.col("is_placeholder")) & (F.col("content_len") > 0)
    ).collect()
    assert [r.url for r in writable] == ["http://h0/data?ok=1"]


class _Handler(http.server.BaseHTTPRequestHandler):
    """Hermetic test endpoints: /ok, /missing (404), /empty, /slow."""

    def do_GET(self):
        if self.path == "/missing":
            self.send_error(404, "Not Found")
            return
        if self.path == "/slow":
            time.sleep(3)
        body = b"" if self.path == "/empty" else b"payload:" + self.path.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def http_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_urllib_transport_real_get(http_server):
    data = urllib_transport(f"http://{http_server}/ok")
    assert data == b"payload:/ok"
    assert urllib_transport(f"http://{http_server}/empty") == b""


def test_urllib_transport_http_error(http_server):
    with pytest.raises(FetchError) as e:
        urllib_transport(f"http://{http_server}/missing")
    assert e.value.error_type == "HTTP_ERROR"
    assert "404" in str(e.value)


def test_urllib_transport_timeout_is_connection_error(http_server):
    with pytest.raises(FetchError) as e:
        urllib_transport(f"http://{http_server}/slow", timeout=0.5)
    assert e.value.error_type == "CONNECTION_ERROR"


def test_urllib_transport_refused_is_connection_error():
    # a port nothing listens on: refused immediately, no 3 s waits
    with pytest.raises(FetchError) as e:
        urllib_transport("http://127.0.0.1:9/never", timeout=1.0)
    assert e.value.error_type == "CONNECTION_ERROR"


def test_fetch_urls_with_real_transport(spark, http_server):
    """The full Spark stage against a live server: same dead-letter
    contract as the stub, real sockets underneath."""
    urls = [
        f"http://{http_server}/ok",
        f"http://{http_server}/missing",
        f"http://{http_server}/empty",
    ]
    transport = functools.partial(urllib_transport, timeout=5.0)
    out = {r.url: r for r in fetch_urls(_requests(spark, urls), transport=transport).collect()}
    assert len(out) == 3
    ok = out[f"http://{http_server}/ok"]
    assert not ok.is_placeholder and ok.status == 200 and ok.content == b"payload:/ok"
    missing = out[f"http://{http_server}/missing"]
    assert missing.is_placeholder and missing.error_type == "HTTP_ERROR"
    empty = out[f"http://{http_server}/empty"]
    assert not empty.is_placeholder and empty.content_len == 0


def test_fetch_urls_real_timeout_parity_with_stub(spark, http_server):
    """Error-channel parity, stub vs real socket: the same three request
    fates (success / HTTP 404 / timeout) must land in the same
    (is_placeholder, error_type) cells regardless of transport — the
    dead-letter contract is transport-independent (app.py:306-313)."""
    real_urls = [
        f"http://{http_server}/ok",
        f"http://{http_server}/missing",
        f"http://{http_server}/slow",
    ]
    stub_urls = [
        "http://h0/data?ok=1",
        "http://h0/data?status=404",
        "http://h0/data?timeout=1",
    ]
    transport = functools.partial(urllib_transport, timeout=0.5)

    def fates(urls, transport):
        rows = fetch_urls(_requests(spark, urls), transport=transport).collect()
        return sorted((r.is_placeholder, r.error_type) for r in rows)

    assert fates(real_urls, transport) == fates(stub_urls, "stub") == [
        (False, None),
        (True, "CONNECTION_ERROR"),
        (True, "HTTP_ERROR"),
    ]


@pytest.mark.skipif(
    "aiohttp" not in TRANSPORTS, reason="aiohttp not installed in this container"
)
def test_fetch_urls_aiohttp_real_socket(spark, http_server):
    """Same live-server contract through the async aiohttp transport."""
    urls = [f"http://{http_server}/ok", f"http://{http_server}/missing"]
    out = {
        r.url: r
        for r in fetch_urls(_requests(spark, urls), transport="aiohttp").collect()
    }
    assert not out[f"http://{http_server}/ok"].is_placeholder
    assert out[f"http://{http_server}/missing"].error_type == "HTTP_ERROR"


def test_resolve_transport_flags():
    assert resolve_transport("stub") is stub_transport
    assert resolve_transport("urllib") is urllib_transport
    assert resolve_transport(stub_transport) is stub_transport
    with pytest.raises(ValueError):
        resolve_transport("carrier-pigeon")
    try:
        import aiohttp  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            resolve_transport("aiohttp")


def test_stub_transport_deterministic():
    a = stub_transport("http://h0/data?x=1")
    b = stub_transport("http://h0/data?x=1")
    assert a == b and len(a) > 0
    try:
        stub_transport("http://h0/data?status=404")
        raise AssertionError("expected FetchError")
    except FetchError as e:
        assert e.error_type == "HTTP_ERROR"
