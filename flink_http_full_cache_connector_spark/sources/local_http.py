"""Transient local HTTP server utilities.

Used by the driver-contract queries and tests to stand in for the
reference's HTTP endpoint: serves a JSON payload (often derived from the
same parquet tables the DuckDB oracle reads, so correctness is exactly
checkable) on 127.0.0.1, then shuts down.
"""

from __future__ import annotations

import contextlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Iterator


@contextlib.contextmanager
def serve_json(payload: Any) -> Iterator[str]:
    """Serve ``payload`` as JSON on an ephemeral port; yields the URL."""
    body = json.dumps(payload, default=str).encode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = httpd.server_address
        yield f"http://{host}:{port}/data"
    finally:
        httpd.shutdown()
        httpd.server_close()


def parquet_as_records(path: str, columns: list[str] | None = None) -> list[dict]:
    """Read a (small, dimension-sized) parquet file into JSON-able records.

    Driver-side by design — this models the reference's HTTP payload, which
    is always a single in-memory JSON document (lookup-table contract).
    """
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=columns)
    return table.to_pylist()
