"""Interval push of metrics to graphite / statsd / collectd.

Reference: internal/exporter/export.go:211-262 — StartMetricPush runs
a ticker every --metric_push_interval; each tick dials the configured
sinks and writes the formatted store (graphite over TCP, statsd over
UDP, collectd's unixsock plugin over a unix stream socket).  Failures
are logged and retried next tick; the daemon never dies on a sink
error.

The scheduler reads from the same store *provider* callable as
MetricsServer, so it composes with batch stores and the live streaming
store alike.
"""

from __future__ import annotations

import logging
import socket
import threading

from mtail_spark.exporters.formats import (
    to_collectd,
    to_graphite,
    to_statsd,
)

log = logging.getLogger("mtail_spark.push")


def _split_hostport(hp: str) -> tuple[str, int]:
    host, port = hp.rsplit(":", 1)
    return host or "127.0.0.1", int(port)


class PushScheduler:
    """Pushes the current store to each configured sink every
    `interval_secs`.  Sinks are dialed per push (the reference dials
    per push too — export.go), so a restarted receiver just starts
    getting data again on the next tick."""

    def __init__(
        self,
        rows_provider,
        interval_secs: float = 60.0,
        graphite_hostport: str | None = None,
        statsd_hostport: str | None = None,
        collectd_socketpath: str | None = None,
        hostname: str = "localhost",
        prefix: str = "",
        write_deadline_secs: float = 10.0,
    ):
        self._provider = rows_provider
        self.interval = interval_secs
        self.graphite = (
            _split_hostport(graphite_hostport) if graphite_hostport else None
        )
        self.statsd = (
            _split_hostport(statsd_hostport) if statsd_hostport else None
        )
        self.collectd = collectd_socketpath
        self.hostname = hostname
        self.prefix = prefix
        self.deadline = write_deadline_secs
        self._halt = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)

    @property
    def configured(self) -> bool:
        return bool(self.graphite or self.statsd or self.collectd)

    def start(self) -> "PushScheduler":
        if self.configured:
            self._thread.start()
        return self

    def stop(self, final_push: bool = False) -> None:
        self._halt.set()
        if self._thread.is_alive():
            self._thread.join(timeout=self.deadline + 1)
        if final_push and self.configured:
            self.push_once()

    def _loop(self) -> None:
        while not self._halt.wait(self.interval):
            self.push_once()

    def push_once(self) -> None:
        """One push to every configured sink; per-sink errors are
        logged, never raised (reference logs and keeps ticking)."""
        rows = list(self._provider())
        if self.graphite:
            self._try("graphite", self._push_graphite, rows)
        if self.statsd:
            self._try("statsd", self._push_statsd, rows)
        if self.collectd:
            self._try("collectd", self._push_collectd, rows)

    def _try(self, name: str, fn, rows) -> None:
        try:
            fn(rows)
        except Exception as e:
            log.warning("push to %s failed: %s", name, e)

    def _push_graphite(self, rows) -> None:
        # graphite's plaintext protocol rides TCP (export.go dials tcp)
        body = to_graphite(rows, prefix=self.prefix)
        if not body:
            return
        with socket.create_connection(
            self.graphite, timeout=self.deadline
        ) as s:
            s.sendall(body.encode())

    def _push_statsd(self, rows) -> None:
        # statsd is datagram-oriented; one metric per datagram keeps
        # every line under any sane MTU (the text format is one
        # metric per line already)
        body = to_statsd(rows, prefix=self.prefix)
        if not body:
            return
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            s.settimeout(self.deadline)
            for line in body.splitlines():
                if line:
                    s.sendto(line.encode(), self.statsd)
        finally:
            s.close()

    def _push_collectd(self, rows) -> None:
        # collectd's unixsock plugin takes PUTVAL commands on a unix
        # stream socket
        body = to_collectd(
            rows, hostname=self.hostname, interval=int(self.interval) or 60
        )
        if not body:
            return
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        try:
            s.settimeout(self.deadline)
            s.connect(self.collectd)
            s.sendall(body.encode())
        finally:
            s.close()
