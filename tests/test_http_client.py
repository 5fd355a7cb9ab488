"""HTTP fetch/retry + JSON pointer + fan-out + row coercion unit tests
(reference behaviors from ``HttpInputFormatProvider.scala:83-172`` and the
hermetic integration suite)."""

import datetime

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_http_full_cache_connector_spark.http_client import (
    HttpFetchError,
    fetch_with_retry,
    parse_payload,
    resolve_json_pointer,
)
from flink_http_full_cache_connector_spark.rows import coerce_object, deserialize_nodes


# --- retry (pinned behavior 3/5 from FIXTURES.md) ---------------------------

def test_fetch_retries_then_succeeds(http_server):
    http_server.set_status_sequence([500, 500])
    sleeps = []
    body = fetch_with_retry(
        http_server.url, max_retries=3, retry_delay_ms=10, sleep=sleeps.append
    )
    assert '"Mock User 1"' in body
    assert http_server.request_count == 3  # 500, 500, 200 → exactly 3 calls
    assert sleeps == [0.01, 0.01]


def test_fetch_fail_fast_after_exhausted_retries(http_server):
    http_server.set_status_sequence([500] * 10)
    with pytest.raises(HttpFetchError) as exc:
        fetch_with_retry(http_server.url, max_retries=1, retry_delay_ms=1, sleep=lambda s: None)
    assert f"Failed to fetch data from {http_server.url} after 1 retries" in str(exc.value)
    # exception chain contains the HTTP status (pinned behavior 5)
    assert "HTTP request failed with status 500" in str(exc.value.__cause__)
    assert http_server.request_count == 2  # max_retries=1 → 2 attempts total


def test_fetch_zero_retries_single_attempt(http_server):
    http_server.set_status_sequence([500])
    with pytest.raises(HttpFetchError, match="after 0 retries"):
        fetch_with_retry(http_server.url, max_retries=0, retry_delay_ms=1, sleep=lambda s: None)
    assert http_server.request_count == 1


def test_metrics_count_http_error_failures():
    """The urllib ``HTTPError`` (4xx/5xx) branch must feed RequestMetrics —
    it is the most common failure class, and the reference README's
    'failure counts / response times' metrics would be hollow without it."""
    import io
    import urllib.error

    from flink_http_full_cache_connector_spark.http_client import RequestMetrics

    def opener(req, timeout=None):
        raise urllib.error.HTTPError(
            req.full_url, 503, "Service Unavailable", None, io.BytesIO(b"down")
        )

    metrics = RequestMetrics()
    with pytest.raises(HttpFetchError, match="after 1 retries"):
        fetch_with_retry(
            "http://example.invalid/x",
            max_retries=1,
            retry_delay_ms=1,
            sleep=lambda s: None,
            opener=opener,
            metrics=metrics,
        )
    assert metrics.attempts == 2
    assert metrics.failures == 2
    assert metrics.retries == 1
    assert metrics.total_duration_s > 0.0


# --- JSON pointer (RFC 6901; HttpInputFormatProvider.scala:137-146) ---------

DOC = {"data": {"items": [1, 2], "a/b": {"c~d": "deep"}}, "": "empty-key"}


@pytest.mark.parametrize(
    ("pointer", "expected"),
    [
        ("", DOC),
        ("/data", DOC["data"]),
        ("/data/items", [1, 2]),
        ("/data/items/0", 1),
        ("/data/items/1", 2),
        ("/data/a~1b", {"c~d": "deep"}),
        ("/data/a~1b/c~0d", "deep"),
        ("/", "empty-key"),
    ],
)
def test_json_pointer_resolution(pointer, expected):
    assert resolve_json_pointer(DOC, pointer) == expected


@pytest.mark.parametrize("pointer", ["/missing", "/data/items/9", "/data/items/x", "no-slash"])
def test_json_pointer_miss_is_hard_error(pointer):
    with pytest.raises(RuntimeError, match="did not match any node"):
        resolve_json_pointer(DOC, pointer)


# --- payload parse + fan-out (array→N rows, object→1 row) -------------------

def test_parse_array_fans_out():
    assert parse_payload('[{"a":1},{"a":2}]') == [{"a": 1}, {"a": 2}]


def test_parse_single_object_one_row():
    assert parse_payload('{"a":1}') == [{"a": 1}]


def test_parse_with_pointer():
    assert parse_payload('{"wrap":{"rows":[{"a":1}]}}', "/wrap/rows") == [{"a": 1}]


def test_parse_malformed_json_fails():
    with pytest.raises(RuntimeError, match="Failed to parse JSON response"):
        parse_payload("not json {{{")


# --- row coercion (flink-json semantics) ------------------------------------

SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
        StructField("ts", TimestampType()),
    ]
)


def test_coerce_full_row():
    row = coerce_object(
        {"id": 7, "name": "x", "amount": 1.5, "ts": "2024-01-02 03:04:05.678"}, SCHEMA
    )
    assert row == (7, "x", 1.5, datetime.datetime(2024, 1, 2, 3, 4, 5, 678000))


def test_missing_field_is_null_and_extra_ignored():
    # failOnMissingField=false: absent → NULL; extra JSON fields ignored
    row = coerce_object({"id": 1, "extra": "ignored"}, SCHEMA)
    assert row == (1, None, None, None)


def test_json_null_is_null():
    assert coerce_object({"id": None, "name": None}, SCHEMA)[:2] == (None, None)


def test_malformed_value_fails_job():
    # ignoreParseErrors=false: bad value → error naming the node
    with pytest.raises(RuntimeError, match="Failed to deserialize JSON node"):
        deserialize_nodes([{"id": "not-an-int"}], SCHEMA)


def test_numeric_widening_and_string_numbers():
    row = coerce_object({"id": "42", "amount": 7}, SCHEMA)
    assert row[0] == 42 and row[2] == 7.0


def test_timestamp_sql_format_no_fraction():
    row = coerce_object({"ts": "2024-01-02 03:04:05"}, SCHEMA)
    assert row[3] == datetime.datetime(2024, 1, 2, 3, 4, 5)


def test_nested_row():
    nested = StructType(
        [
            StructField("id", IntegerType()),
            StructField(
                "address",
                StructType(
                    [StructField("city", StringType()), StructField("zip", StringType())]
                ),
            ),
        ]
    )
    row = coerce_object({"id": 1, "address": {"city": "Oslo", "zip": "0150"}}, nested)
    assert row == (1, ("Oslo", "0150"))
