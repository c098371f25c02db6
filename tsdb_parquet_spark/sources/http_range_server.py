"""Loopback HTTP object server with RFC 7233 Range support.

A minimal in-process stand-in for the GET/Range surface of a GCS/S3
endpoint, so :class:`~tsdb_parquet_spark.sources.bucket.HTTPBucket` — and
through it the whole ranged-read stack (BucketReader, ChunkedBucketReader,
parquet-over-bucket, `read_parquet_distributed`) — can be exercised over a
REAL socket + HTTP wire protocol in an offline sandbox.  The reference
gets the same kind of coverage from thanos objstore's in-memory bucket;
here the bytes actually travel through the OS loopback, so executor-side
Python workers (separate processes) fetch their row-group ranges exactly
as they would from an object store.

Stdlib only.  Objects are held in a dict; PUT/DELETE mutate it so
upload/delete round-trips are testable too.
"""

from __future__ import annotations

import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_RANGE_RE = re.compile(r"bytes=(\d+)-(\d*)")


def _make_handler(store: dict[str, bytes], lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args) -> None:  # quiet
            pass

        def _name(self) -> str:
            from urllib.parse import unquote

            # HTTPBucket percent-encodes names; decode so store keys are
            # the caller's raw object names
            return unquote(self.path.lstrip("/"))

        def _lookup(self) -> bytes | None:
            with lock:
                return store.get(self._name())

        def do_HEAD(self) -> None:
            data = self._lookup()
            if data is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()

        def do_GET(self) -> None:
            data = self._lookup()
            if data is None:
                self.send_error(404)
                return
            rng = self.headers.get("Range")
            m = _RANGE_RE.match(rng) if rng else None
            if m:
                start = int(m.group(1))
                end = int(m.group(2)) if m.group(2) else len(data) - 1
                end = min(end, len(data) - 1)
                if start > end:
                    self.send_error(416)
                    return
                body = data[start : end + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}"
                )
            else:
                body = data
                self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Accept-Ranges", "bytes")
            self.end_headers()
            self.wfile.write(body)

        def do_PUT(self) -> None:
            n = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(n)
            with lock:
                store[self._name()] = body
            self.send_response(201)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_DELETE(self) -> None:
            with lock:
                existed = store.pop(self._name(), None) is not None
            if not existed:
                self.send_error(404)
                return
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

    return Handler


class RangeHTTPServer:
    """Threaded loopback server over a dict of objects.

    >>> srv = RangeHTTPServer({"a.parquet": data}).start()
    >>> bucket = HTTPBucket(srv.base_url)
    ...
    >>> srv.stop()
    """

    def __init__(self, objects: dict[str, bytes] | None = None) -> None:
        self.objects: dict[str, bytes] = dict(objects or {})
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def base_url(self) -> str:
        assert self._httpd is not None, "server not started"
        host, port = self._httpd.server_address[:2]
        return f"http://127.0.0.1:{port}"

    def start(self) -> "RangeHTTPServer":
        handler = _make_handler(self.objects, self._lock)
        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
