"""HTTP fetch + JSON extraction runtime (pure Python, Spark-free).

Re-expresses the reference runtime's fetch path
(``HttpInputFormatProvider.scala:83-161``):

- ``fetch_with_retry``  — GET with connect/read timeouts, redirects followed,
  non-200 → retry, up to ``max_retries`` retries with a fixed
  ``retry_delay_ms`` sleep; exhaustion raises ``RuntimeError`` with the
  reference's message text (fail-fast, no stale-cache fallback).
- ``resolve_json_pointer`` — RFC 6901 resolution incl. ``~0``/``~1``
  unescaping; ``""`` means root; a non-matching pointer is a hard error.
- ``fan_out`` — JSON array → N rows, single object → 1 row
  (``HttpInputFormatProvider.scala:149-158``).

Kept free of PySpark imports so both the driver-side cache builder and the
Python Data Source reader (executor-side) can use it.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from typing import Any, Callable

_MISSING = object()


class HttpFetchError(RuntimeError):
    """Raised when all fetch attempts are exhausted (job must fail)."""


class RequestMetrics:
    """HTTP request observability — the reference README documents
    "HTTP Request Metrics: Success/failure rates, response times" and
    "Error Rates: Retry attempts and failure counts" without ever
    registering them (``README.md:199-208``); this delivers them.
    Mutable plain counters: attempts (every GET issued), retries
    (attempts after the first per fetch), failures (attempts that
    errored), and wall durations."""

    __slots__ = (
        "attempts", "retries", "failures",
        "last_duration_s", "total_duration_s",
    )

    def __init__(self) -> None:
        self.attempts = 0
        self.retries = 0
        self.failures = 0
        self.last_duration_s = 0.0
        self.total_duration_s = 0.0

    def as_dict(self) -> dict[str, float]:
        return {
            "http_attempts": self.attempts,
            "http_retries": self.retries,
            "http_failures": self.failures,
            "http_last_duration_s": self.last_duration_s,
            "http_total_duration_s": self.total_duration_s,
        }


def fetch_with_retry(
    url: str,
    *,
    connect_timeout_seconds: int = 10,
    read_timeout_seconds: int = 30,
    max_retries: int = 3,
    retry_delay_ms: int = 1000,
    sleep: Callable[[float], None] = time.sleep,
    opener: Callable[..., Any] | None = None,
    metrics: RequestMetrics | None = None,
) -> str:
    """GET ``url`` returning the response body as text.

    Semantics pinned by ``HttpInputFormatProvider.scala:83-124``: the loop
    runs ``max_retries + 1`` attempts total; any exception (including a
    non-200 status) triggers a retry after ``retry_delay_ms``; exhaustion
    raises ``HttpFetchError("Failed to fetch data from {url} after
    {max_retries} retries")`` chaining the last error.  Redirects are
    followed (urllib default ≙ HttpClient.Redirect.NORMAL).

    ``sleep``/``opener`` are injection points for tests.
    """
    # urllib exposes one timeout covering connect+read; use the larger bound
    # so neither reference timeout is violated early.
    timeout = max(connect_timeout_seconds, read_timeout_seconds)
    open_fn = opener or urllib.request.urlopen

    last_exception: Exception | None = None
    attempt = 0
    while attempt <= max_retries:
        t0 = time.monotonic()
        if metrics is not None:
            metrics.attempts += 1
            if attempt > 0:
                metrics.retries += 1
        try:
            req = urllib.request.Request(url, method="GET")
            with open_fn(req, timeout=timeout) as resp:
                status = getattr(resp, "status", 200)
                body = resp.read()
                if status != 200:
                    raise RuntimeError(
                        f"HTTP request failed with status {status}. "
                        f"Response body: {body.decode('utf-8', 'replace')}"
                    )
                charset = "utf-8"
                headers = getattr(resp, "headers", None)
                if headers is not None:
                    charset = headers.get_content_charset() or "utf-8"
                if metrics is not None:
                    metrics.last_duration_s = time.monotonic() - t0
                    metrics.total_duration_s += metrics.last_duration_s
                return body.decode(charset)
        except urllib.error.HTTPError as e:
            # urllib raises on 4xx/5xx; normalize to the reference's message.
            body = e.read().decode("utf-8", "replace") if e.fp else ""
            last_exception = RuntimeError(
                f"HTTP request failed with status {e.code}. Response body: {body}"
            )
        except Exception as e:  # noqa: BLE001 — any failure triggers retry
            last_exception = e
        if metrics is not None:
            metrics.failures += 1
            metrics.last_duration_s = time.monotonic() - t0
            metrics.total_duration_s += metrics.last_duration_s
        attempt += 1
        if attempt <= max_retries:
            sleep(retry_delay_ms / 1000.0)

    raise HttpFetchError(
        f"Failed to fetch data from {url} after {max_retries} retries"
    ) from last_exception


def resolve_json_pointer(document: Any, pointer: str) -> Any:
    """RFC 6901 JSON Pointer resolution (≙ Jackson ``JsonNode.at``).

    ``""`` → the document itself.  A pointer that does not match raises
    ``RuntimeError`` with the reference's message
    (``HttpInputFormatProvider.scala:142-146``).  ``~1``→``/``, ``~0``→``~``.
    """
    if pointer == "":
        return document
    node = document
    if not pointer.startswith("/"):
        # Jackson's at() throws on pointers not starting with '/'; surface
        # the same non-matching error shape.
        raise RuntimeError(
            f"JSON Pointer '{pointer}' did not match any node in the response"
        )
    for raw_token in pointer.split("/")[1:]:
        token = raw_token.replace("~1", "/").replace("~0", "~")
        nxt: Any = _MISSING
        if isinstance(node, dict):
            nxt = node.get(token, _MISSING)
        elif isinstance(node, list):
            if token.isdigit() and int(token) < len(node):
                nxt = node[int(token)]
        if nxt is _MISSING:
            raise RuntimeError(
                f"JSON Pointer '{pointer}' did not match any node in the response"
            )
        node = nxt
    return node


def parse_payload(body: str, pointer: str = "") -> list[Any]:
    """Parse the HTTP body and fan out to a list of row-nodes.

    ``HttpInputFormatProvider.scala:126-158``: malformed JSON →
    ``RuntimeError("Failed to parse JSON response")``; pointer-extract; then
    array → one node per element, anything else → single node.
    """
    try:
        document = json.loads(body)
    except Exception as e:
        raise RuntimeError("Failed to parse JSON response") from e
    node = resolve_json_pointer(document, pointer)
    if isinstance(node, list):
        return list(node)
    return [node]
