"""Stateful streaming for cross-line programs (SURVEY.md §7 hard part
#1 in streaming form).

Programs whose hidden metrics carry state BETWEEN lines (mysql
slow-query record stitching, rsyncd connection tracking) cannot be
restarted per micro-batch: a record may straddle the batch boundary.

Design note: applyInPandasWithState cannot be used here — its groupBy
introduces an exchange that does NOT preserve row order, and these
programs are order-sensitive by definition.  Instead, each micro-batch
is collected in arrival order (no shuffle between source and
foreachBatch, so per-partition source order survives) and folded
through per-stream persistent interpreters on the driver.  The
throughput ceiling is the interpreter's (~10^5 lines/s/stream), which
matches the reference's own single-goroutine-per-program model
(reference internal/runtime/runtime.go:193-203); the vectorized
backend covers the high-volume stateless case.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtail_spark.compiler.api import CompiledProgram
from mtail_spark.compiler.interp import Interp, LineError, Runtime, StopLine, Store


class DriverStatefulRunner:
    """Per-stream persistent interpreter fold with a serving view.

    State = one interpreter Store per stream key (filename / socket
    endpoint), hidden metrics included — the reference's per-program
    RAM footprint.
    """

    def __init__(self, prog: CompiledProgram, now_us: int = 0):
        self.prog = prog
        self.interp = Interp(prog.checked, prog.syslog_use_current_year)
        self.now_us = now_us
        self.syslog_year = None
        if prog.syslog_use_current_year:
            from mtail_spark.compiler.gotime import epoch_us_year

            self.syslog_year = epoch_us_year(now_us)
        self.lock = threading.Lock()
        self.streams: dict[str, Runtime] = {}
        self.n_lines = 0

    def _runtime(self, key: str) -> Runtime:
        rt = self.streams.get(key)
        if rt is None:
            rt = Runtime(
                Store(self.prog.checked),
                now_us=self.now_us,
                syslog_year=self.syslog_year,
            )
            rt.filename = key
            rt.line_no = 0
            self.streams[key] = rt
        return rt

    def gc(self, now_us: int | None = None) -> int:
        """TTL (`del ... after`) + `limit` sweep over every stream's
        store — the reference runs this hourly per program store
        (store.go:156-203).  Operates on declared names, hidden
        metrics included, so cross-line state cannot grow unboundedly
        in serve mode."""
        import time as _time

        now_us = now_us if now_us is not None else int(_time.time() * 1_000_000)
        with self.lock:
            return sum(
                rt.store.gc(now_us) for rt in self.streams.values()
            )

    def process(self, pairs) -> None:
        """pairs: iterable of (stream_key, line) in arrival order."""
        # stream stores are exactly Store (built in _runtime), so the
        # store-inlined generated variant applies; it never appends to
        # rt.fired (chunkfold-only scratch), so no per-line clear.
        program = self.interp.fast_program
        fast = program is not None
        if not fast:
            program = self.interp.program
        with self.lock:
            for key, line in pairs:
                rt = self._runtime(key)
                rt.line = line
                rt.matches = {}
                rt.ts_us = None
                if not fast:
                    # clear per line or a serve-mode daemon accumulates
                    # one entry per register write forever
                    rt.fired.clear()
                try:
                    program(rt)
                except (StopLine, LineError):
                    pass
                rt.line_no += 1
                self.n_lines += 1

    def rows(self) -> list[dict]:
        """Merged serving view across streams: counters/histograms sum,
        gauges/text take the latest-stamped datum."""
        with self.lock:
            merged: dict = {}
            for key, rt in self.streams.items():
                for r in rt.store.export_rows(self.prog.name):
                    k = (r.name, r.labels)
                    d = {
                        "prog": r.prog, "name": r.name, "kind": r.kind,
                        "vtype": r.vtype, "labels": dict(r.labels) or None,
                        "value_i": r.value if r.vtype == "Int" else None,
                        "value_f": r.value if r.vtype == "Float" else None,
                        "value_s": r.value if r.vtype == "String" else None,
                        "buckets": (
                            [{"le": le, "count": c} for le, c in r.value[0]]
                            if r.vtype == "Buckets" else None
                        ),
                        "bucket_count": r.value[1] if r.vtype == "Buckets" else None,
                        "bucket_sum": r.value[2] if r.vtype == "Buckets" else None,
                        "ts_us": r.ts,
                    }
                    cur = merged.get(k)
                    if cur is None:
                        merged[k] = d
                    elif r.kind == "counter":
                        for f in ("value_i", "value_f"):
                            if d[f] is not None:
                                cur[f] = (cur[f] or 0) + d[f]
                        cur["ts_us"] = max(cur["ts_us"] or 0, d["ts_us"] or 0) or None
                    elif r.kind == "histogram":
                        cur["buckets"] = [
                            {"le": a["le"], "count": a["count"] + b["count"]}
                            for a, b in zip(cur["buckets"], d["buckets"])
                        ]
                        cur["bucket_count"] += d["bucket_count"]
                        cur["bucket_sum"] += d["bucket_sum"]
                    else:
                        if (d["ts_us"] or 0) >= (cur["ts_us"] or 0):
                            merged[k] = d
            out = list(merged.values())
            from mtail_spark.streaming.pipeline import _internal_rows

            out.extend(
                _internal_rows(self.prog.name, self.n_lines, 0)[:1]
            )
            return out


def run_stateful_stream(
    prog: CompiledProgram,
    spark: SparkSession,
    lines_stream: DataFrame,
    runner: DriverStatefulRunner | None = None,
    trigger: dict | None = None,
    checkpoint: str | None = None,
    order: str = "concat",
    gc_every_batches: int = 10,
):
    """Run a cross-line-state program over a streaming (filename, line)
    relation.  Returns (DriverStatefulRunner, StreamingQuery).

    order: how the source laid arrival order across partitions —
    "concat" for the file source (a file's splits are contiguous, in
    partition order) and "round_robin" for the socket source, which
    stripes buffered rows as idx % numPartitions
    (TextSocketMicroBatchStream.planInputPartitions).
    """
    runner = runner or DriverStatefulRunner(prog)
    n_batches = [0]

    def on_batch(batch_df: DataFrame, batch_id: int):
        n_batches[0] += 1
        if gc_every_batches and n_batches[0] % gc_every_batches == 0:
            runner.gc()
        spooled = "spool_seq" in batch_df.columns
        cols = [
            F.spark_partition_id().alias("pid"),
            F.monotonically_increasing_id().alias("mid"),
            "filename",
            "line",
        ]
        if spooled:
            cols.insert(2, F.col("spool_seq"))
        rows = batch_df.select(*cols).collect()
        if spooled:
            # Spool-backed source: arrival order is the spool segment
            # sequence, not partition id — Spark bin-packs segment
            # files into partitions by size, so partition-major order
            # can replay a later segment before an earlier one.  Sort
            # per (filename, segment, within-partition row); state is
            # per-filename, so cross-file interleaving is free, and a
            # segment never splits across partitions (SpoolDir.
            # roll_bytes ≪ maxPartitionBytes), so the partition-local
            # low bits of mid are the segment's line order.
            mask = (1 << 33) - 1
            flat = sorted(
                rows,
                key=lambda r: (
                    r["filename"], r["spool_seq"], r["mid"] & mask
                ),
            )
            runner.process((r["filename"], r["line"]) for r in flat)
            return
        by_pid: dict[int, list] = {}
        for r in rows:
            by_pid.setdefault(r["pid"], []).append(r)
        for chunk in by_pid.values():
            chunk.sort(key=lambda r: r["mid"])
        if order == "round_robin":
            npart = (max(by_pid) + 1) if by_pid else 1
            flat = []
            pos = 0
            while True:
                layer = [
                    by_pid[p][pos]
                    for p in range(npart)
                    if p in by_pid and pos < len(by_pid[p])
                ]
                if not layer:
                    break
                flat.extend(layer)
                pos += 1
        else:  # concat: partition-major
            flat = [r for p in sorted(by_pid) for r in by_pid[p]]
        runner.process((r["filename"], r["line"]) for r in flat)

    writer = lines_stream.writeStream.foreachBatch(on_batch)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    return runner, query
