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
