"""Time-series analytics over event streams: tumbling-window rates
and trailing-statistics anomaly flags — the alerting-side query a
monitoring pipeline runs downstream of the metric extraction the
compiler family covers.

Determinism policy: window counts are exact integers; the trailing
mean/variance/z-score are IEEE doubles computed by the SAME literal
formula in Spark and the DuckDB oracle (one evaluation order, no
re-association), and sqrt is correctly rounded by IEEE-754 — unlike
ln/exp, it is bit-portable across engines — so even the float columns
hash-match.  The z-score is reported in rounded micro-units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US = 1_000_000


def window_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 3600,
) -> DataFrame:
    """Tumbling-window event counts per key: (key, widx,
    window_start_us, n_events).  One exchange on (key, widx) with
    map-side partial counts — the standard streaming-rate shape."""
    # exact integer microseconds (unix_micros) — a double round-trip
    # could misplace a boundary event by one window.  FLOOR division,
    # not DIV: bare DIV truncates toward zero, but the streaming dual
    # counts with F.window(), whose window starts floor-align, so a
    # pre-1970 (negative-epoch) event would land in different windows
    # batch vs stream.  pmod keeps it pure-integer: us - pmod(us, w)
    # is exactly divisible, so the DIV after it is floor for any sign.
    # The testdata ts is TIMESTAMP_NTZ; session tz is pinned UTC, so
    # the cast is deterministic (same convention as q_sessionize_events).
    w_us = window_s * US
    widx = F.expr(
        f"CAST((unix_micros(CAST({ts_col} AS TIMESTAMP)) "
        f" - pmod(unix_micros(CAST({ts_col} AS TIMESTAMP)), {w_us})) "
        f"DIV {w_us} AS BIGINT)"
    )
    return (
        events.select(F.col(key_col).alias("key"), widx.alias("widx"))
        .groupBy("key", "widx")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn(
            "window_start_us", F.col("widx") * F.lit(window_s * US)
        )
    )


def rate_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 3600,
    trail: int = 24,
    min_windows: int = 3,
    z_thresh_micro: int = 2_000_000,
) -> DataFrame:
    """Flag windows whose event rate deviates from the key's trailing
    behavior: z = (count - trailing_mean) / trailing_stddev over the
    previous `trail` OBSERVED windows (ROWS frame — an empty window
    produces no row, so gaps don't dilute the statistics; the same
    frame semantics in both engines).

    Output per (key, window): n_events, n_prev, z_micro (NULL until
    min_windows of history exist or when the trailing variance is 0),
    is_anomaly.

    Shape: the count merge exchanges on (key, widx) with map-side
    partials, then ONE window-sized exchange on key feeds all three
    trailing windows through a single Window node.  Both exchanges
    carry count rows (keys x windows), never raw events — shuffling
    events by key to share one exchange would move the full volume
    onto the skew key.  Per-key frame state is `trail`-bounded."""
    counts = window_counts(events, ts_col, key_col, window_s)
    return trailing_z(counts, trail, min_windows, z_thresh_micro)


def trailing_z(
    counts: DataFrame,
    trail: int = 24,
    min_windows: int = 3,
    z_thresh_micro: int = 2_000_000,
) -> DataFrame:
    """The alerting layer of rate_anomalies, applicable to ANY counts
    relation with (key, widx, window_start_us, n_events) — in
    particular the table a Structured Streaming tumbling aggregation
    maintains (q_rate_anomalies_stream): the counts accumulate in the
    stream's state store, this trailing-statistics pass runs over the
    current table."""
    w = (
        Window.partitionBy("key")
        .orderBy("widx")
        .rowsBetween(-trail, -1)
    )
    c = F.col("n_events").cast("double")
    n = F.count(F.lit(1)).over(w).cast("long")
    s1 = F.sum("n_events").over(w).cast("long")
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("long")
    stats = counts.select(
        "key", "widx", "window_start_us", "n_events",
        F.coalesce(n, F.lit(0)).alias("n_prev"),
        F.coalesce(s1, F.lit(0)).alias("s1"),
        F.coalesce(s2, F.lit(0)).alias("s2"),
    )
    nn = F.col("n_prev").cast("double")
    mu = F.col("s1").cast("double") / nn
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / nn
    ) / nn
    z = F.round((c - mu) * F.lit(float(US)) / F.sqrt(var)).cast("long")
    z_micro = F.when(
        (F.col("n_prev") >= min_windows) & (var > 0.0), z
    )
    return stats.select(
        "key",
        "widx",
        "window_start_us",
        "n_events",
        "n_prev",
        z_micro.alias("z_micro"),
        (
            z_micro.isNotNull() & (F.abs(z_micro) >= z_thresh_micro)
        ).alias("is_anomaly"),
    )
