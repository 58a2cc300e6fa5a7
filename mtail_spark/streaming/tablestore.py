"""Parquet-backed serving store: the 100x-cardinality escape hatch.

The default serving store (streaming/pipeline.StreamingMetricStore)
is driver-RAM, mirroring the reference's in-process store
(internal/metrics/store.go) — correct for metric-cardinality-sized
state bounded by `limit N` / `del ... after`.  When a label space
outgrows driver RAM even after eviction, this store keeps the whole
serving state DISTRIBUTED: each micro-batch's store DataFrame merges
into a versioned parquet table with a Spark job (never a driver
collect), and exporters read the current version driver-side through
pyarrow (no Spark job per scrape).

Layout:  root/v=<n>/*.parquet  +  root/_CURRENT (json pointer:
version, last_batch_id, n_batches, n_lines).  The pointer is written
with an atomic rename AFTER the new version's parquet commits, so a
crash between the two leaves the previous version current and the
streaming checkpoint's replayed batch re-merges cleanly — the same
exactly-once contract as the RAM store's snapshot (batch_id dedupe).

Merge semantics are identical to StreamingMetricStore.merge_batch:
counters/histograms additive (bucket arrays share compile-time
bounds, so a zip_with adds per-le counts), gauge/timer/text
last-write-wins by batch order, datum ts advances monotonically for
additive kinds.  TTL expiry and `limit N` eviction run inside the
same merge job (rank over a per-metric window), so the table is
GC'd at every commit exactly like the reference's hourly sweep —
reference store.go:156-203.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mtail_spark.compiler.api import CompiledProgram
from mtail_spark.store import STORE_SCHEMA

US = 1_000_000


class TableMetricStore:
    """Drop-in serving store for run_program_stream(store=...): same
    rows()/gc()/save()/load()/last_batch_id surface as
    StreamingMetricStore, plus merge_batch_df which the streaming
    pipeline prefers so the store never round-trips the driver."""

    def __init__(
        self,
        prog: CompiledProgram,
        spark: SparkSession,
        root: str,
        keep_versions: int = 2,
    ):
        self.prog = prog
        self.spark = spark
        self.root = root
        self.keep_versions = keep_versions
        self.lock = threading.Lock()
        os.makedirs(root, exist_ok=True)
        self.version = -1
        self.last_batch_id = -1
        self.n_batches = 0
        self.n_lines = 0
        self._load_pointer()

    # ---------------------------------------------------------- pointer

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def _load_pointer(self) -> None:
        try:
            with open(self._pointer_path) as fh:
                meta = json.load(fh)
            self.version = int(meta["version"])
            self.last_batch_id = int(meta["last_batch_id"])
            self.n_batches = int(meta["n_batches"])
            self.n_lines = int(meta["n_lines"])
        except (OSError, ValueError, KeyError):
            pass

    def _commit_pointer(self, version: int) -> None:
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "last_batch_id": self.last_batch_id,
                    "n_batches": self.n_batches,
                    "n_lines": self.n_lines,
                },
                fh,
            )
        os.replace(tmp, self._pointer_path)
        self.version = version
        # prune old versions (best-effort; readers of the pruned
        # version have already materialized their arrow table)
        for d in os.listdir(self.root):
            if d.startswith("v=") and int(d[2:]) <= version - self.keep_versions:
                shutil.rmtree(os.path.join(self.root, d),
                              ignore_errors=True)

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def _current_df(self) -> DataFrame | None:
        if self.version < 0:
            return None
        return self.spark.read.schema(STORE_SCHEMA).parquet(
            self._version_dir(self.version)
        )

    # ------------------------------------------------------------ merge

    @staticmethod
    def _label_key(col):
        """Canonical join key for a labels map (map_entries order is
        insertion order, so sort before serializing)."""
        return F.to_json(
            F.sort_array(
                F.map_entries(
                    F.coalesce(
                        col, F.create_map().cast("map<string,string>")
                    )
                )
            )
        )

    def merge_batch_df(
        self, batch_store: DataFrame, batch_id: int | None = None
    ) -> None:
        """Merge one micro-batch's STORE_SCHEMA DataFrame into the
        table with a distributed full-outer merge + GC, then commit
        the version pointer."""
        with self.lock:
            if batch_id is not None:
                if batch_id <= self.last_batch_id:
                    return  # replayed batch already committed
            cur = self._current_df()
            new = batch_store
            if cur is None:
                merged = new
            else:
                o = cur.withColumn("__k", self._label_key(F.col("labels")))
                n = new.withColumn("__k", self._label_key(F.col("labels")))
                j = o.alias("o").join(
                    n.alias("n"), on=["name", "__k"], how="full_outer"
                )
                kind = F.coalesce(F.col("n.kind"), F.col("o.kind"))
                n_exists = F.col("n.kind").isNotNull()
                additive = kind.isin("counter", "histogram")

                def nullsafe_add(f):
                    a, b = F.col(f"o.{f}"), F.col(f"n.{f}")
                    return F.when(
                        a.isNull() & b.isNull(), F.lit(None)
                    ).otherwise(
                        F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
                    )

                def pick(f):
                    return F.when(
                        additive, nullsafe_add(f)
                    ).otherwise(
                        F.when(n_exists, F.col(f"n.{f}")).otherwise(
                            F.col(f"o.{f}")
                        )
                    )

                buckets = F.when(
                    F.col("o.buckets").isNotNull()
                    & F.col("n.buckets").isNotNull(),
                    F.zip_with(
                        F.col("o.buckets"), F.col("n.buckets"),
                        lambda x, y: F.struct(
                            x["le"].alias("le"),
                            (x["count"] + y["count"]).alias("count"),
                        ),
                    ),
                ).otherwise(F.coalesce(F.col("n.buckets"), F.col("o.buckets")))
                ts = F.when(
                    additive,
                    F.greatest(F.col("o.ts_us"), F.col("n.ts_us")),
                ).otherwise(
                    F.when(n_exists, F.col("n.ts_us")).otherwise(
                        F.col("o.ts_us")
                    )
                )
                merged = j.select(
                    F.coalesce(F.col("n.prog"), F.col("o.prog")).alias("prog"),
                    F.col("name"),
                    kind.alias("kind"),
                    F.coalesce(F.col("n.vtype"), F.col("o.vtype")).alias("vtype"),
                    F.coalesce(F.col("n.labels"), F.col("o.labels")).alias("labels"),
                    pick("value_i").cast("long").alias("value_i"),
                    pick("value_f").cast("double").alias("value_f"),
                    F.when(n_exists, F.col("n.value_s"))
                    .otherwise(F.col("o.value_s")).alias("value_s"),
                    buckets.alias("buckets"),
                    nullsafe_add("bucket_count").cast("long").alias("bucket_count"),
                    nullsafe_add("bucket_sum").cast("double").alias("bucket_sum"),
                    ts.alias("ts_us"),
                )
            merged = self._apply_gc(merged)
            nxt = self.version + 1
            merged.write.mode("overwrite").parquet(self._version_dir(nxt))
            if batch_id is not None:
                self.last_batch_id = batch_id
            self.n_batches += 1
            self._commit_pointer(nxt)

    # RAM-store-compatible entry: accept collected rows too (used if a
    # caller hands this store to code written for the driver dict).
    # merge_batch_df's full-outer join requires ONE row per datum —
    # true for run_batch output (an aggregated store) but not for an
    # arbitrary row list, where the RAM store folds duplicates
    # sequentially (counters accumulate, later gauge rows win).
    # Pre-collapse through that exact fold so both entries agree.
    def merge_batch(self, rows, batch_id: int | None = None) -> None:
        from mtail_spark.streaming.pipeline import StreamingMetricStore

        tmp = StreamingMetricStore(self.prog)
        tmp.merge_batch(rows)
        df = self.spark.createDataFrame(
            tmp.rows(include_internal=False), schema=STORE_SCHEMA
        )
        self.merge_batch_df(df, batch_id=batch_id)

    def _apply_gc(self, df: DataFrame) -> DataFrame:
        """TTL expiry + limit eviction inside the merge job
        (reference store.go:156-203), expressed relationally: TTL is
        a filter; `limit N` keeps the N newest-stamped datums per
        metric via a rank window over the (store-sized) relation."""
        from pyspark.sql import Window

        checked = self.prog.checked
        now_us = int(time.time() * US)
        no_labels = F.col("labels").isNull() | (F.size(F.map_entries(
            F.col("labels"))) == 0)
        for name, ttl_s in checked.expiries.items():
            mi = checked.metrics.get(name)
            nm = (mi.decl.exported_name or name) if mi else name
            cutoff = now_us - int(ttl_s * US)
            df = df.filter(
                (F.col("name") != F.lit(nm))
                | no_labels
                | (F.coalesce(F.col("ts_us"), F.lit(0)) >= F.lit(cutoff))
            )
        limited = {
            (mi.decl.exported_name or mname): mi.decl.limit
            for mname, mi in checked.metrics.items()
            if mi.decl.limit
        }
        if limited:
            w = Window.partitionBy("name").orderBy(
                F.desc_nulls_last("ts_us")
            )
            cap = F.lit(None).cast("long")
            for nm, n in limited.items():
                cap = F.when(F.col("name") == F.lit(nm), F.lit(n)).otherwise(cap)
            df = (
                df.withColumn("__cap", cap)
                .withColumn(
                    "__rk",
                    F.when(
                        F.col("__cap").isNull() | no_labels, F.lit(1)
                    ).otherwise(F.row_number().over(w)),
                )
                .filter(
                    F.col("__cap").isNull() | (F.col("__rk") <= F.col("__cap"))
                )
                .drop("__cap", "__rk")
            )
        return df

    def gc(self, now_us: int | None = None) -> int:
        """GC runs inside every merge commit (_apply_gc); the per-N-
        batches sweep the pipeline calls is therefore a no-op here."""
        return 0

    # ---------------------------------------------------------- serving

    def rows(self, include_internal: bool = True) -> list[dict]:
        """Point-in-time view for the exporters, read driver-side via
        pyarrow from the current version — no Spark job per scrape."""
        from mtail_spark.streaming.pipeline import _internal_rows

        out: list[dict] = []
        with self.lock:
            version = self.version
            n_lines, n_batches = self.n_lines, self.n_batches
        if version >= 0:
            import pyarrow.dataset as ds

            tbl = ds.dataset(
                self._version_dir(version), format="parquet"
            ).to_table()
            for r in tbl.to_pylist():
                if r.get("labels") is not None:
                    r["labels"] = dict(r["labels"])
                out.append(r)
        if include_internal:
            out.extend(
                _internal_rows(self.prog.name, n_lines, n_batches)
            )
        return out

    # ------------------------------------------- snapshot compatibility

    def save(self, path: str) -> None:
        """No-op: the table IS the persistent state (pointer + parquet
        committed atomically per batch)."""

    def load(self, path: str) -> bool:
        return self.version >= 0
