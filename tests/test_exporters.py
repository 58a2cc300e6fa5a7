"""Exporter format tests over a hand-built store."""

import json
import urllib.request

from mtail_spark.exporters import (
    MetricsServer,
    to_graphite,
    to_json,
    to_prometheus,
    to_statsd,
    to_varz,
)

ROWS = [
    {
        "prog": "p.mtail", "name": "hits_total", "kind": "counter",
        "vtype": "Int", "labels": {"op": "get"}, "value_i": 7,
        "value_f": None, "value_s": None, "buckets": None,
        "bucket_count": None, "bucket_sum": None,
        "ts_us": 1_300_000_000 * 1_000_000,
    },
    {
        "prog": "p.mtail", "name": "load", "kind": "gauge", "vtype": "Float",
        "labels": None, "value_i": None, "value_f": 2.5, "value_s": None,
        "buckets": None, "bucket_count": None, "bucket_sum": None,
        "ts_us": 1_300_000_001 * 1_000_000,
    },
    {
        "prog": "p.mtail", "name": "lat", "kind": "histogram",
        "vtype": "Buckets", "labels": {"svc": "a"}, "value_i": None,
        "value_f": None, "value_s": None,
        "buckets": [
            {"le": 1.0, "count": 2},
            {"le": 4.0, "count": 1},
            {"le": float("inf"), "count": 1},
        ],
        "bucket_count": 4, "bucket_sum": 7.5,
        "ts_us": 1_300_000_002 * 1_000_000,
    },
    {
        "prog": "p.mtail", "name": "note", "kind": "text", "vtype": "String",
        "labels": None, "value_i": None, "value_f": None, "value_s": "hi",
        "buckets": None, "bucket_count": None, "bucket_sum": None,
        "ts_us": None,
    },
]


def test_prometheus():
    text = to_prometheus(ROWS)
    assert '# TYPE hits_total counter' in text
    assert 'hits_total{op="get",prog="p.mtail"} 7' in text
    # cumulative buckets (reference datum/datum.go:240-259)
    assert 'lat_bucket{le="1",prog="p.mtail",svc="a"} 2' in text
    assert 'lat_bucket{le="4",prog="p.mtail",svc="a"} 3' in text
    assert 'lat_bucket{le="+Inf",prog="p.mtail",svc="a"} 4' in text
    assert 'lat_sum{prog="p.mtail",svc="a"} 7.5' in text
    assert 'lat_count{prog="p.mtail",svc="a"} 4' in text
    assert "note" not in text  # text metrics are not exported


def test_varz():
    text = to_varz(ROWS, hostname="h1")
    assert "hits_total{op=get,prog=p.mtail,instance=h1} 7" in text
    assert "load{prog=p.mtail,instance=h1} 2.5" in text


def test_graphite():
    text = to_graphite(ROWS, prefix="mtail.")
    assert "mtail.p.mtail.hits_total.op.get 7 1300000000" in text
    assert "mtail.p.mtail.lat.svc.a.bin_1 2 1300000002" in text
    assert "mtail.p.mtail.lat.svc.a.bin_inf 1 1300000002" in text
    assert "mtail.p.mtail.lat.svc.a.count 4 1300000002" in text


def test_statsd():
    text = to_statsd(ROWS, prefix="x.")
    assert "x.p.mtail.hits_total.op.get:7|c" in text
    assert "x.p.mtail.load:2.5|g" in text


def test_json_roundtrip():
    data = json.loads(to_json(ROWS))
    byname = {m["Name"]: m for m in data}
    assert byname["hits_total"]["LabelValues"][0]["Value"] == 7
    assert byname["lat"]["LabelValues"][0]["Value"]["Count"] == 4


def test_http_server():
    srv = MetricsServer(lambda: ROWS).start()
    try:
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/metrics"
        ).read().decode()
        assert "hits_total" in body
        body2 = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/json"
        ).read().decode()
        assert json.loads(body2)
        code = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/varz"
        ).status
        assert code == 200
    finally:
        srv.stop()


def test_push_scheduler(tmp_path):
    """PushScheduler pushes correct graphite (TCP), statsd (UDP) and
    collectd (unixsock) payloads on interval (reference
    export.go:211-262 StartMetricPush)."""
    import socket
    import threading
    import time

    from mtail_spark.exporters.push import PushScheduler

    # graphite: TCP listener collecting every connection's payload
    g_payloads = []
    g_srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    g_srv.bind(("127.0.0.1", 0))
    g_srv.listen(8)
    g_srv.settimeout(5)

    def g_accept():
        while True:
            try:
                conn, _ = g_srv.accept()
            except OSError:
                return
            with conn:
                buf = b""
                while chunk := conn.recv(65536):
                    buf += chunk
                g_payloads.append(buf.decode())

    threading.Thread(target=g_accept, daemon=True).start()

    # statsd: UDP socket
    s_srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s_srv.bind(("127.0.0.1", 0))
    s_srv.settimeout(5)

    # collectd: unix stream socket
    c_path = str(tmp_path / "collectd.sock")
    c_srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c_srv.bind(c_path)
    c_srv.listen(8)
    c_srv.settimeout(5)
    c_payloads = []

    def c_accept():
        while True:
            try:
                conn, _ = c_srv.accept()
            except OSError:
                return
            with conn:
                buf = b""
                while chunk := conn.recv(65536):
                    buf += chunk
                c_payloads.append(buf.decode())

    threading.Thread(target=c_accept, daemon=True).start()

    push = PushScheduler(
        lambda: ROWS,
        interval_secs=0.2,
        graphite_hostport=f"127.0.0.1:{g_srv.getsockname()[1]}",
        statsd_hostport=f"127.0.0.1:{s_srv.getsockname()[1]}",
        collectd_socketpath=c_path,
        hostname="h1",
        prefix="mtail.",
    ).start()
    assert push.configured
    deadline = time.time() + 5
    while time.time() < deadline and len(g_payloads) < 2:
        time.sleep(0.05)
    push.stop()
    g_srv.close()
    c_srv.close()

    # >= 2 pushes arrived on interval
    assert len(g_payloads) >= 2
    assert "mtail.p.mtail.hits_total.op.get 7 1300000000" in g_payloads[0]

    datagrams = []
    try:
        s_srv.settimeout(1)
        for _ in range(3):
            datagrams.append(s_srv.recvfrom(65536)[0].decode())
    except socket.timeout:
        pass
    s_srv.close()
    assert "mtail.p.mtail.hits_total.op.get:7|c" in datagrams
    assert any("PUTVAL" in p and "h1" in p for p in c_payloads)
