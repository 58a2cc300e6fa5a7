"""Structured Streaming execution of compiled mtail programs.

Shape: readStream (text file source — new-file discovery covers the
reference's glob-polling and rotation-as-new-file model, reference
internal/tailer/logstream/filestream.go) -> per-micro-batch run of the
compiled program (vectorized plan or per-file fold) -> foreachBatch
merge into a serving StreamingMetricStore.

The serving store implements the reference's state management:
- counters/histograms merge additively across batches
- gauges/timers/text keep last-write-wins by batch order
- `del ... after` TTL expiry + `limit N` cardinality eviction run as
  the per-batch GC sweep (reference store.go:156-203: expire stale
  datums; evict oldest-stamped datums above the limit)

At scale: each micro-batch is a normal vectorized batch plan (one scan
+ one store-sized shuffle); the serving store is metric-cardinality
sized and lives on the driver, exactly like the reference's in-RAM
store, and is what /metrics etc. serve from.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtail_spark.compiler.api import CompiledProgram

US = 1_000_000


def _internal_rows(prog_name: str, n_lines: int, n_batches: int) -> list[dict]:
    """Engine self-metrics, served alongside program metrics the way
    the reference exports its own counters (lines_total, log_count)."""
    def row(name, value):
        return {
            "prog": prog_name, "name": name, "kind": "counter",
            "vtype": "Int", "labels": None, "value_i": value,
            "value_f": None, "value_s": None, "buckets": None,
            "bucket_count": None, "bucket_sum": None, "ts_us": None,
        }

    return [
        row("mtail_lines_total", n_lines),
        row("mtail_batches_total", n_batches),
    ]


class StreamingMetricStore:
    """Serving store for the streaming daemon.

    Driver-RAM by design, exactly like the reference's in-process
    store (reference internal/metrics/store.go): the store holds the
    AGGREGATED output, whose cardinality is the number of live metric
    label tuples — not stream length — and every exporter needs a
    consistent point-in-time view of all of it anyway.  What bounds it
    under high-cardinality label spaces is the program's own `limit N`
    eviction and `del ... after` TTLs (gc below, tested at 1M tuples
    in tests/test_streaming.py).  A label space that needs more than
    driver RAM even after `limit` is not a serving store workload —
    route it through the batch path, where the same program's store is
    a distributed DataFrame aggregation end to end."""

    def __init__(self, prog: CompiledProgram):
        self.prog = prog
        self.lock = threading.Lock()
        # (name, labels_tuple) -> dict(row fields)
        self.data: dict = {}
        self.n_batches = 0
        self.n_lines = 0  # engine-internal counter (reference exports
        # its own lines_total / log_count the same way)
        # exactly-once: checkpoint recovery re-delivers the last
        # uncommitted micro-batch with the SAME batch_id; merging it
        # twice would double-count counters
        self.last_batch_id: int = -1

    def merge_batch(self, rows, batch_id: int | None = None) -> None:
        with self.lock:
            if batch_id is not None:
                if batch_id <= self.last_batch_id:
                    return  # replayed batch already merged
                self.last_batch_id = batch_id
            self.n_batches += 1
            for r in rows:
                key = (r["name"], tuple(sorted((r["labels"] or {}).items())))
                cur = self.data.get(key)
                if cur is None:
                    self.data[key] = dict(r.asDict() if hasattr(r, "asDict") else r)
                    continue
                kind = r["kind"]
                if kind == "counter":
                    for f in ("value_i", "value_f"):
                        if r[f] is not None:
                            cur[f] = (cur[f] or 0) + r[f]
                    cur["ts_us"] = max(
                        cur["ts_us"] or 0, r["ts_us"] or 0
                    ) or None
                elif kind == "histogram":
                    merged = []
                    for old, new in zip(cur["buckets"] or [], r["buckets"] or []):
                        merged.append(
                            {"le": old["le"], "count": old["count"] + new["count"]}
                        )
                    cur["buckets"] = merged
                    cur["bucket_count"] = (cur["bucket_count"] or 0) + (
                        r["bucket_count"] or 0
                    )
                    cur["bucket_sum"] = (cur["bucket_sum"] or 0.0) + (
                        r["bucket_sum"] or 0.0
                    )
                    if r["ts_us"] is not None:
                        cur["ts_us"] = max(cur["ts_us"] or 0, r["ts_us"])
                else:  # gauge / timer / text: batches arrive in order
                    for f in ("value_i", "value_f", "value_s", "ts_us"):
                        cur[f] = r[f]

    def gc(self, now_us: int | None = None) -> int:
        """TTL expiry + limit eviction (reference store.go:156-203)."""
        now_us = now_us if now_us is not None else int(time.time() * US)
        removed = 0
        with self.lock:
            # expiry: datums idle longer than their metric's TTL.
            # expiries are keyed by DECLARED name; serving rows use the
            # exported name (`as "..."`), so translate before matching.
            for name, ttl_s in self.prog.checked.expiries.items():
                mi = self.prog.checked.metrics.get(name)
                nm = (mi.decl.exported_name or name) if mi else name
                cutoff = now_us - int(ttl_s * US)
                for key in [
                    k for k, v in self.data.items()
                    if k[0] == nm and (v["ts_us"] or 0) < cutoff and k[1]
                ]:
                    del self.data[key]
                    removed += 1
            # limit: evict oldest-stamped datums beyond the cap
            for mname, mi in self.prog.checked.metrics.items():
                limit = mi.decl.limit
                if not limit:
                    continue
                nm = mi.decl.exported_name or mname
                keys = [k for k in self.data if k[0] == nm and k[1]]
                if len(keys) > limit:
                    keys.sort(key=lambda k: self.data[k]["ts_us"] or 0)
                    for k in keys[: len(keys) - limit]:
                        del self.data[k]
                        removed += 1
        return removed

    def rows(self, include_internal: bool = True) -> list[dict]:
        with self.lock:
            out = [dict(v) for v in self.data.values()]
            if include_internal:
                out.extend(_internal_rows(self.prog.name, self.n_lines,
                                          self.n_batches))
            return out

    # ------------------------------------------------- snapshot (restart)

    def save(self, path: str) -> None:
        """Atomically snapshot the store (written after each committed
        batch; together with batch_id dedupe this gives exactly-once
        across process restarts — the streaming checkpoint replays the
        last uncommitted batch, merge_batch drops it if the snapshot
        already includes it)."""
        import json
        import os

        with self.lock:
            payload = {
                "last_batch_id": self.last_batch_id,
                "n_batches": self.n_batches,
                "n_lines": self.n_lines,
                "rows": [
                    {"key_labels": list(k[1]), **v}
                    for k, v in self.data.items()
                ],
            }
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)

    def load(self, path: str) -> bool:
        """Restore a snapshot; returns False if none exists."""
        import json
        import os

        if not os.path.exists(path):
            return False
        with open(path) as f:
            payload = json.load(f)
        with self.lock:
            self.last_batch_id = payload["last_batch_id"]
            self.n_batches = payload["n_batches"]
            self.n_lines = payload["n_lines"]
            self.data = {}
            for row in payload["rows"]:
                labels_kv = tuple(
                    (k, v) for k, v in row.pop("key_labels")
                )
                r = dict(row)
                self.data[(r["name"], labels_kv)] = r
        return True


def streaming_log_lines(batch_df: DataFrame) -> DataFrame:
    """A micro-batch of the text file source -> log_lines relation.
    Arrival order within the batch is the line order (matching the
    reference's read-order semantics)."""
    return batch_df.select(
        F.input_file_name().alias("filename"),
        F.monotonically_increasing_id().alias("line_no"),
        F.regexp_replace(F.col("value"), "\r$", "").alias("line"),
    )


def run_program_stream(
    prog: CompiledProgram,
    spark: SparkSession,
    path: str,
    store: StreamingMetricStore | None = None,
    trigger: dict | None = None,
    checkpoint: str | None = None,
    gc_every_batches: int = 10,
    store_path: str | None = None,
    ignore_basename_regex: str | None = None,
    source: DataFrame | None = None,
):
    """Start a streaming query running `prog` over text files appearing
    under `path`.  Returns (store, StreamingQuery).

    source, when given, is a pre-built STREAMING (filename, line)
    relation replacing the direct text-file source — used by serve
    mode's in-place file tailer (sources/filetail.py), whose spool
    indirection sees appends and copytruncate rotations the plain
    file source never re-reads.

    ignore_basename_regex drops lines from files whose basename
    matches (reference --ignore_filename_regex_pattern, applied by the
    tailer in every mode — tail.go:237); the filter runs JVM-side
    inside the micro-batch scan.

    With `checkpoint` + `store_path` set, a restarted query resumes
    exactly-once: the snapshot is loaded on start, the checkpoint
    resumes from committed offsets, and the replayed uncommitted batch
    is deduplicated by batch_id.
    """
    store = store or StreamingMetricStore(prog)
    if store_path:
        store.load(store_path)

    def on_batch(batch_df: DataFrame, batch_id: int):
        from pyspark import StorageLevel

        # persist the batch's lines once: the program plan and the
        # line count both read the cache, so the source is scanned a
        # single time per micro-batch (no second action recompute)
        if "value" in batch_df.columns:
            lines = streaming_log_lines(batch_df)
        elif "spool_seq" in batch_df.columns:
            # Spool-backed source: per-file arrival order is the spool
            # SEGMENT sequence, not partition order — Spark bin-packs
            # a batch's segment files into partitions by size, so a
            # later spool-N can be scanned in an earlier partition and
            # a bare monotonically_increasing_id would hand gauge/
            # timer/text last-write-wins a stale write.  Segment seq
            # forms the high bits; the low 33 bits are the partition-
            # local row counter, which is the scan order within a
            # segment (segments are ≤ roll_bytes = 4 MB, far below
            # maxPartitionBytes, so a segment never splits).
            mid_low = F.monotonically_increasing_id().bitwiseAND(
                F.lit((1 << 33) - 1)
            )
            lines = batch_df.select(
                "filename",
                (F.col("spool_seq") * F.lit(1 << 33) + mid_low).alias(
                    "line_no"
                ),
                "line",
            )
        else:  # pre-shaped (filename, line) source
            lines = batch_df.select(
                "filename",
                F.monotonically_increasing_id().alias("line_no"),
                "line",
            )
        if ignore_basename_regex:
            lines = lines.filter(
                ~F.element_at(
                    F.split(F.col("filename"), "/"), -1
                ).rlike(ignore_basename_regex)
            )
        lines = lines.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if batch_id > store.last_batch_id:
                input_bytes = n = None
                if prog.checked.cross_line_state and prog.chunkfoldable:
                    # micro-batch relations report no inputFiles, so
                    # the chunkfold auto-route needs a measured size
                    # hint; the agg also materializes the persist the
                    # batch plan reuses and carries the line count the
                    # store needs anyway.  Only register programs pay
                    # this extra store-sized job.
                    n, total_len = lines.agg(
                        F.count(F.lit(1)), F.sum(F.length("line"))
                    ).first()
                    input_bytes = int(total_len or 0)
                result = prog.run_batch(
                    spark, lines, cache_plan=False,
                    input_bytes=input_bytes,
                )
                if n is None:
                    n = lines.count()
                store.n_lines += n
                if hasattr(store, "merge_batch_df"):
                    # table-backed store: the batch store merges into
                    # the serving table as a Spark job — the 100x-
                    # cardinality path never collects to the driver
                    store.merge_batch_df(result, batch_id=batch_id)
                else:
                    store.merge_batch(result.collect(), batch_id=batch_id)
        finally:
            lines.unpersist()
        if gc_every_batches and store.n_batches % gc_every_batches == 0:
            store.gc()
        if store_path:
            store.save(store_path)

    stream = (
        source
        if source is not None
        else spark.readStream.format("text").load(path)
    )
    writer = stream.writeStream.foreachBatch(on_batch)
    if trigger:
        writer = writer.trigger(**trigger)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    query = writer.start()
    return store, query
