"""Loopback remote-write RECEIVER: HTTP POST /api/v1/write -> spool dir.

The minimal in-process stand-in for a remote-write endpoint, so the full
push path — a sender POSTing snappy-framed protobuf over a REAL socket,
the receiver spooling bodies, Structured Streaming draining the spool
into the store (`streaming/receiver.py`) — can be exercised offline,
exactly as `http_range_server.py` does for the ranged-GET pull path.

Protocol surface (public remote-write spec):

* ``POST /api/v1/write`` with ``Content-Encoding: snappy`` and a
  protobuf body (1.0 ``prometheus.WriteRequest`` or 2.0
  ``io.prometheus.write.v2.Request``; the
  ``X-Prometheus-Remote-Write-Version`` header names it — recorded in
  the spool filename for observability, while decode sniffs per payload
  like a tolerant receiver).
* success is ``204 No Content`` (2.0) / ``200`` (1.0-style) — 204 here.
* a body that does not decompress is ``400``, not a spooled poison pill.

``POST /v1/metrics`` (OTLP/HTTP, the OTel SDK default path; Prometheus
3.x serves the same body under ``/api/v1/otlp/v1/metrics``) is also
accepted: protobuf with optional gzip ``Content-Encoding``, success
``200`` with an empty ``ExportMetricsServiceResponse``; bodies spool as
``otlp-<seq>.bin`` and drain via
`streaming.receiver.otlp_spool_ingestor` (gzip sniffed per payload).

Bodies land as ``req-<seq>-v<version>.bin`` via write-to-temp + rename,
so a concurrently running spool drain never reads a half-written file
(the file stream source lists only published names).

Stdlib only; test/dev scale (a production receiver is any HTTP server
that writes the same spool).
"""

from __future__ import annotations

import itertools
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tsdb_parquet_spark.tsdb_wal import snappy_decompress

__all__ = ["RemoteWriteServer"]


def _make_handler(spool_dir: str, counter, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *args) -> None:  # quiet
            pass

        def do_POST(self) -> None:
            path = self.path.rstrip("/")
            if path == "/v1/metrics":
                # OTLP/HTTP (the path OTel SDKs default to, and
                # Prometheus 3.x serves under /api/v1/otlp): protobuf
                # body, optional gzip Content-Encoding; success is 200
                # with an (empty) ExportMetricsServiceResponse
                length = int(self.headers.get("Content-Length", "0"))
                body = self.rfile.read(length)
                proto = body
                if self.headers.get("Content-Encoding") == "gzip":
                    import gzip

                    try:
                        proto = gzip.decompress(body)  # spool compressed
                    except (OSError, EOFError):
                        # BadGzipFile is OSError; a truncated stream is
                        # EOFError — both are a client error, not spool
                        self.send_error(400, "undecodable gzip body")
                        return
                # validate the PROTOBUF too (OTLP/JSON or garbage gets
                # 400, like the module contract: a body that does not
                # decode is never a spooled poison pill that wedges the
                # streaming drain's checkpoint)
                from tsdb_parquet_spark.otlp import decode_export_samples

                try:
                    decode_export_samples(proto)
                except Exception:
                    self.send_error(400, "undecodable OTLP body")
                    return
                with lock:
                    seq = next(counter)
                final = os.path.join(spool_dir, f"otlp-{seq:08d}.bin")
                tmp = f"{final}.tmp"
                with open(tmp, "wb") as fh:
                    fh.write(body)
                os.replace(tmp, final)
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if path != "/api/v1/write":
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            if self.headers.get("Content-Encoding", "snappy") == "snappy":
                try:
                    snappy_decompress(body)  # validate, spool compressed
                except ValueError:
                    self.send_error(400, "undecodable snappy body")
                    return
            version = self.headers.get(
                "X-Prometheus-Remote-Write-Version", "0.1.0"
            ).split(".")[0]
            with lock:
                seq = next(counter)
            final = os.path.join(spool_dir, f"req-{seq:08d}-v{version}.bin")
            tmp = f"{final}.tmp"
            with open(tmp, "wb") as fh:
                fh.write(body)
            os.replace(tmp, final)
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

    return Handler


class RemoteWriteServer:
    """``with RemoteWriteServer(spool_dir) as url:`` — POST remote-write
    bodies at ``{url}/api/v1/write``; they land in ``spool_dir``."""

    def __init__(self, spool_dir: str):
        os.makedirs(spool_dir, exist_ok=True)
        self._server = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            _make_handler(spool_dir, itertools.count(), threading.Lock()),
        )
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def __enter__(self) -> str:
        self._thread.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
        self._thread.join(timeout=5)
