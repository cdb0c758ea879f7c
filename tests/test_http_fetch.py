"""Error-channel fetch semantics (reference app.py:285-334):
success rows carry bytes, failures become dead-letter rows (never
exceptions), zero-byte payloads are flagged, all requests come back.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.sources.http_fetch import (
    FetchError,
    fetch_urls,
    stub_transport,
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


def test_stub_transport_deterministic():
    a = stub_transport("http://h0/data?x=1")
    b = stub_transport("http://h0/data?x=1")
    assert a == b and len(a) > 0
    try:
        stub_transport("http://h0/data?status=404")
        raise AssertionError("expected FetchError")
    except FetchError as e:
        assert e.error_type == "HTTP_ERROR"
