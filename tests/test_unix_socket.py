"""MetricsServer over a unix-domain socket (reference
cmd/mtail/main.go `--unix_socket` — the one serving surface COVERAGE
had listed as not carried over)."""

import http.client
import os
import socket
import tempfile

from mtail_spark.exporters.http import MetricsServer

ROWS = [
    {
        "prog": "test.mtail", "name": "lines_total", "kind": "counter",
        "vtype": "Int", "labels": {}, "value_i": 42,
        "value_f": None, "value_s": None, "buckets": None,
        "bucket_count": None, "bucket_sum": None, "ts_us": 0,
    }
]


class _UnixConn(http.client.HTTPConnection):
    def __init__(self, path):
        super().__init__("localhost")
        self._path = path

    def connect(self):
        self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self.sock.connect(self._path)


def _get(path, route):
    conn = _UnixConn(path)
    try:
        conn.request("GET", route)
        r = conn.getresponse()
        return r.status, r.read().decode()
    finally:
        conn.close()


def test_unix_socket_serves_all_routes():
    sock = os.path.join(tempfile.gettempdir(), f"mtail_test_{os.getpid()}.sock")
    srv = MetricsServer(lambda: ROWS, unix_socket=sock).start()
    try:
        assert srv.port is None and srv.unix_socket == sock
        status, body = _get(sock, "/metrics")
        assert status == 200 and 'lines_total{prog="test.mtail"} 42' in body
        status, body = _get(sock, "/json")
        assert status == 200 and '"lines_total"' in body
        status, _ = _get(sock, "/varz")
        assert status == 200
        status, _ = _get(sock, "/nope")
        assert status == 404
    finally:
        srv.stop()
    assert not os.path.exists(sock)  # stop() unlinks the socket file


def test_unix_socket_replaces_stale_file():
    sock = os.path.join(
        tempfile.gettempdir(), f"mtail_stale_{os.getpid()}.sock"
    )
    # leave a stale socket file behind, as a crashed daemon would
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.bind(sock)
    s.close()
    srv = MetricsServer(lambda: ROWS, unix_socket=sock).start()
    try:
        status, _ = _get(sock, "/metrics")
        assert status == 200
    finally:
        srv.stop()
