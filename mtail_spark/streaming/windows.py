"""Event-time windowed aggregation over streaming relations.

Engine extensions absent in the reference (SURVEY.md §2.6): the
reference's store is a running total; these provide the time-bucketed
analytics Spark's Structured Streaming is built for — tumbling /
sliding / gap-merge session windows with watermark-bounded state, so
late data is folded in up to the watermark and state is dropped after
it (the 100 TB property: state size is bounded by watermark horizon x
key cardinality, not stream length).

Batch DataFrames are accepted too — the same expressions run in both
modes, which is how the oracle-checked batch analogs
(`tumbling_window_counts`, `session_window_native`) relate to these.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: str | None):
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (slide=None) or sliding event-time windows.

    Returns (window_start, window_end, *keys, *aggs); default agg is
    a row count `n`."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    keys = keys or []
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    out = (
        _with_watermark(df, ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )


def stream_table(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Replay a parquet table as a file STREAM (the schema comes from
    a static footer read; nanosecond timestamps are normalized exactly
    like session.load_table so stream and batch plans see identical
    columns).

    ``max_files_per_trigger`` bounds each micro-batch to that many
    input files — Trigger.AvailableNow respects it as a rate limit, so
    a finite replay over N files becomes ceil(N / k) micro-batches
    instead of one.  tests/test_stream_crash_recovery.py uses k=1 to
    prove the state-store merge composes across MANY micro-batches,
    not just the two a single-file-per-leg replay produces."""
    from mtail_spark.session import _nanos_ts_columns

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    import os

    ns_cols = _nanos_ts_columns(path)
    schema = spark.read.parquet(path).schema
    stream_path = path
    if os.path.isfile(path):
        # the file streaming source requires a directory or glob; turn
        # a plain file path into the glob that matches exactly it
        stream_path = path[:-1] + "[" + path[-1] + "]"
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option(
            "maxFilesPerTrigger", int(max_files_per_trigger)
        )
    df = reader.parquet(stream_path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def run_replay_to_table(
    stream_df: DataFrame, name: str, checkpoint: str | None = None
) -> DataFrame:
    """Run a streaming aggregation to completion over a finite replay
    (Trigger.AvailableNow) in COMPLETE output mode against the memory
    sink, and return the final result as a batch DataFrame.

    Complete mode keeps every session/window in the state store, which
    is exactly right for a finite replay whose FINAL table is the
    answer (and what the oracle can check).  A production unbounded
    stream would instead use append mode + a watermark writing to
    parquet/Kafka — windowed_agg/session_windowed_agg support that via
    their `watermark` argument; state is then bounded by the watermark
    horizon, not stream length.

    Pass `checkpoint` to make the replay RESUMABLE: a second call
    with the same checkpoint (from a fresh plan object — a process
    restart) recovers the aggregation state store and continues over
    whatever input appeared since; complete mode then re-emits the
    full recovered-plus-new state.  tests/test_stream_crash_recovery
    proves the stream ≡ batch pairs hold ACROSS such a kill/restart,
    not just over one uninterrupted replay."""
    return _run_replay(stream_df, name, "complete", checkpoint)


def run_replay_append(stream_df: DataFrame, name: str) -> DataFrame:
    """Append-mode counterpart of run_replay_to_table for STATELESS
    streaming pipelines (map-side work + stream-static joins): every
    emitted row lands in the memory sink once; the final table is the
    concatenation of all micro-batch outputs.  The production form
    writes to parquet/Kafka with the same semantics."""
    return _run_replay(stream_df, name, "append")


def _run_replay(
    stream_df: DataFrame,
    name: str,
    mode: str,
    checkpoint: str | None = None,
) -> DataFrame:
    import uuid

    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    w = (
        stream_df.writeStream.format("memory")
        .queryName(qname)
        .outputMode(mode)
        .trigger(availableNow=True)
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination()
    return stream_df.sparkSession.table(qname)


def session_windowed_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-merge session windows (a new session starts when the gap
    since the previous event is >= `gap`; end = last event + gap)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    keys = keys or []
    out = (
        _with_watermark(df, ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *[c for c in out.columns if c not in ("w", *keys)],
    )
