"""HTTP serving surface: /metrics /json /varz /graphite
(reference internal/mtail/mtail.go:120 route wiring), over TCP or a
unix-domain socket (reference cmd/mtail/main.go `--unix_socket`).

The server reads from a store *provider* (a callable returning the
current store rows) so it composes with both batch results and the
streaming store, which foreachBatch keeps updating.
"""

from __future__ import annotations

import os
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _UnixHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer bound to an AF_UNIX path.  A pre-existing
    file at the path is removed before bind ONLY if it is actually a
    socket — a typo'd path to a regular file raises instead of
    deleting it.  (This is deliberately more forgiving than the
    reference daemon, whose net.Listen("unix") fails on ANY existing
    path: stale socket files from a crashed previous run are the
    common operational case.  It still hijacks a LIVE server's socket
    if pointed at one — AF_UNIX has no portable liveness probe short
    of connecting, and a daemon restart wants exactly that takeover.)
    Request handlers see a synthetic client address since unix peers
    have none."""

    address_family = socket.AF_UNIX

    def server_bind(self):
        import stat as _stat

        try:
            mode = os.stat(self.server_address).st_mode
        except (FileNotFoundError, TypeError):
            mode = None
        if mode is not None:
            if not _stat.S_ISSOCK(mode):
                raise OSError(
                    f"refusing to replace non-socket file at "
                    f"{self.server_address!r}"
                )
            os.unlink(self.server_address)
        # skip ThreadingHTTPServer's TCP-specific bind steps
        socket.socket.bind(self.socket, self.server_address)

    def get_request(self):
        request, _ = self.socket.accept()
        return request, ("unix-socket", 0)

from mtail_spark.exporters.formats import (
    to_graphite,
    to_json,
    to_prometheus,
    to_varz,
)


class MetricsServer:
    def __init__(self, rows_provider, host: str = "127.0.0.1", port: int = 0,
                 emit_prog_label: bool = True,
                 emit_metric_timestamp: bool = False,
                 unix_socket: str | None = None):
        provider = rows_provider
        omit = not emit_prog_label

        def _prom(rows):
            return to_prometheus(
                rows, omit_prog_label=omit,
                emit_timestamps=emit_metric_timestamp,
            )

        def _varz(rows):
            return to_varz(rows, omit_prog_label=omit)

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                routes = {
                    "/metrics": ("text/plain; version=0.0.4", _prom),
                    "/json": ("application/json", to_json),
                    "/varz": ("text/plain", _varz),
                    "/graphite": ("text/plain", to_graphite),
                }
                hit = routes.get(self.path.split("?")[0])
                if hit is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                ctype, fmt = hit
                body = fmt(provider()).encode()
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        if unix_socket:
            self._httpd = _UnixHTTPServer(unix_socket, Handler)
            self.port = None
            self.unix_socket = unix_socket
        else:
            self._httpd = ThreadingHTTPServer((host, port), Handler)
            self.port = self._httpd.server_address[1]
            self.unix_socket = None
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()
        if self.unix_socket:
            try:
                os.unlink(self.unix_socket)
            except FileNotFoundError:
                pass
