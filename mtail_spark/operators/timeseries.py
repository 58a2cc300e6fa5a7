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


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    build_id: str = "event_id",
    build_value: str = "value",
) -> DataFrame:
    """As-of join (last-touch attribution): each probe row gets the
    most recent build row with build.ts <= probe.ts for the same key;
    probes with no prior build row keep NULLs (left semantics).
    Equal-timestamp build rows count as "prior" (<=); among duplicate
    (key, ts) build rows the one with the LARGEST build id wins — a
    fully deterministic tie-break both engines reproduce.

    Spark has no native ASOF JOIN; the classic sort-merge-as-of is
    expressed as a UNION + running LAST_VALUE: tag both inputs, union
    them, and carry the last non-null build payload forward over a
    (key)-partitioned, (ts, side, id)-ordered running window.  That is
    ONE shuffle on the key and ONE sort — exactly what a dedicated
    as-of implementation would do, and Catalyst keeps the whole thing
    in two stages.  Build rows order BEFORE probe rows at equal ts, so
    <= semantics fall out of the sort order.  At 100 TB: partition by
    key; a pathologically hot key is range-split by time and the
    window seeded per split (the standard fix for any running-window
    op — same note as sessionize).

    Returns (probe_id, key, ts, b_id, b_value, lag_us) with lag_us =
    exact integer microseconds since the matched build row.
    """
    # the (key, ts) duplicate tie-break orders by build_id cast to
    # long: a non-numeric id would cast to NULL and silently degrade
    # the documented deterministic tie-break into arbitrary last()
    # selection — fail loudly instead (r8 ADVICE)
    _id_type = dict(build.dtypes)[build_id]
    assert _id_type in ("tinyint", "smallint", "int", "bigint"), (
        f"asof_join build_id column {build_id!r} must be integral for "
        f"the deterministic (key, ts) tie-break, got {_id_type}"
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    p = probe.select(
        F.col(probe_id).alias("p_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        us(ts_col).alias("us"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("ord_id"),
        F.lit(None)
        .cast("struct<b_us:bigint,b_id:bigint,b_value:double>")
        .alias("_b"),
    )
    b = build.select(
        F.lit(None).cast("long").alias("p_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        us(ts_col).alias("us"),
        F.lit(0).alias("side"),
        F.col(build_id).cast("long").alias("ord_id"),
        F.struct(
            us(ts_col).alias("b_us"),
            F.col(build_id).cast("long").alias("b_id"),
            F.col(build_value).cast("double").alias("b_value"),
        ).alias("_b"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("us", "side", "ord_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        p.unionByName(b)
        .withColumn("_last", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    return joined.select(
        F.col("p_id").alias("probe_id"),
        F.col("key"),
        F.col("ts"),
        F.col("_last.b_id").alias("b_id"),
        F.col("_last.b_value").alias("b_value"),
        (F.col("us") - F.col("_last.b_us")).cast("long").alias("lag_us"),
    )


def _eq_literal(cond) -> tuple[str, str] | None:
    """(column_name, literal_repr) when `cond` is a plain
    `col == literal` comparison, else None (disjointness not
    statically checkable).  Works from the Column's stable repr —
    Spark 4's python Column no longer exposes the expression tree.
    Spark 4.1 prints `Column<'=(event_type, 'click')'>`; the right
    side is accepted only when it is a QUOTED string or a bare number
    (an unquoted identifier could be another column, and anything
    with nested parens/quotes is not parseable) — conservative:
    None, never a wrong answer."""
    import re

    try:
        m = re.fullmatch(
            r"Column<'=\(([A-Za-z_][A-Za-z0-9_.]*), "
            r"('[^'()]*'|-?[0-9]+(?:\.[0-9]+)?)\)'>",
            str(cond),
        )
    except Exception:
        return None
    return (m.group(1), m.group(2)) if m else None


def asof_join_fused(
    df: DataFrame,
    probe_cond,
    build_cond,
    key_col: str = "user_id",
    ts_col: str = "ts",
    probe_id: str = "event_id",
    build_id: str = "event_id",
    build_value: str = "value",
) -> DataFrame:
    """Single-scan form of asof_join for the common case where probe
    and build are DISJOINT filters of the SAME relation (last-touch
    attribution: purchases vs clicks of one events table).

    asof_join(df.filter(p), df.filter(b)) scans the source twice and
    unions; with disjoint predicates the union is just a partition of
    one filtered scan, so the probe/build tagging can be a conditional
    projection over df.filter(p | b) — ONE pass instead of two, same
    rows into the identical (key)-window, bit-identical output
    (optimization r12, guide §1.2: the theoretically-minimal plan is
    one read of the input).

    Precondition: no row satisfies BOTH conditions — a row matching
    both would enter the union form twice (once per side) but this
    projection once.  Statically ASSERTED below for the common shape
    (both predicates are `col == literal` comparisons on the same
    column: distinct literals prove disjointness, equal literals are
    rejected); any other predicate shape cannot be checked cheaply
    and the CALLER must guarantee disjointness.  The entry queries
    filter one event_type column to two different literals.
    """
    pe, be = _eq_literal(probe_cond), _eq_literal(build_cond)
    if pe is not None and be is not None and pe[0] == be[0]:
        assert pe[1] != be[1], (
            "asof_join_fused: probe and build predicates compare "
            f"column {pe[0]!r} to the SAME literal {pe[1]!r} — they "
            "overlap, which the fused single-scan form cannot "
            "represent; use asof_join on two filtered scans instead"
        )
    _id_type = dict(df.dtypes)[build_id]
    assert _id_type in ("tinyint", "smallint", "int", "bigint"), (
        f"asof_join build_id column {build_id!r} must be integral for "
        f"the deterministic (key, ts) tie-break, got {_id_type}"
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    b_struct = F.struct(
        us.alias("b_us"),
        F.col(build_id).cast("long").alias("b_id"),
        F.col(build_value).cast("double").alias("b_value"),
    )
    u = df.filter(probe_cond | build_cond).select(
        F.when(probe_cond, F.col(probe_id)).alias("p_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        us.alias("us"),
        F.when(probe_cond, F.lit(1)).otherwise(F.lit(0)).alias("side"),
        F.when(
            probe_cond, F.lit(None).cast("long")
        ).otherwise(F.col(build_id).cast("long")).alias("ord_id"),
        F.when(
            probe_cond,
            F.lit(None).cast(
                "struct<b_us:bigint,b_id:bigint,b_value:double>"
            ),
        ).otherwise(b_struct).alias("_b"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("us", "side", "ord_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    joined = (
        u.withColumn("_last", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    return joined.select(
        F.col("p_id").alias("probe_id"),
        F.col("key"),
        F.col("ts"),
        F.col("_last.b_id").alias("b_id"),
        F.col("_last.b_value").alias("b_value"),
        (F.col("us") - F.col("_last.b_us")).cast("long").alias("lag_us"),
    )


def sliding_stats(
    events: DataFrame,
    trail_rows: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key trailing-N-rows moving statistics: for every event, the
    sum/count/max over the last `trail_rows` events (inclusive) of the
    same key in (ts, id) order — the smoothing pass behind rate
    displays and rolling health scores.

    Values are integer cents, so the frame sum is exact in both
    engines regardless of accumulation order (the reason this is NOT
    a float mean: a ROWS frame sum of doubles is order-sensitive).
    One shuffle on the key, one sort, one Window node computing all
    three frames; per-row state is the `trail_rows`-bounded frame.
    Ordering ties on identical (key, ts) resolve by the row id.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(trail_rows - 1), 0)
    )
    cents = F.round(F.col(value_col) * 100).cast("long")
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.sum(cents).over(w).cast("long").alias("trail_sum_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_n"),
        F.max(cents).over(w).cast("long").alias("trail_max_cents"),
    )


def band_join_counts(
    events: DataFrame,
    radius_s: int = 120,
    id_col: str = "event_id",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Time-band co-occurrence: for every event, how many events from
    OTHER keys happened within +-radius_s seconds (inclusive) — the
    correlation primitive behind "what else fired when this alerted".

    A naive formulation is an inequality self-join — a cartesian
    product at any scale.  The classic Spark shape BUCKETS time into
    radius-sized cells and equi-joins on the cell, but the joined
    PAIR count still grows quadratically with in-window density
    (measured: the 10x-denser sf10 bench corpus costs ~40x sf1 —
    pair enumeration, ~4G pairs).  This operator therefore counts by
    RANK, not by pair (optimization r12, guide §1.2 "the distributed
    algorithm"): replicate each event into its cell and both
    neighbors (3x rows, map-side), then per cell one RANGE window
    [-r, +r] counts ALL events in reach and a second (cell, key)
    window counts SAME-key events in reach; n_neighbors is their
    difference, evaluated at each event's home-cell replica.  Any
    neighbor within +-r lives within +-1 cell, so the home-cell
    partition sees every candidate exactly once.  Work is
    O(rows * log cell-size) — rows, not pairs (sf10 measured 57.7 s
    pair-form → ~2 s window-form).  Sliding RANGE frames advance two
    pointers per partition; counts are exact integers, so the result
    is bit-identical to the inequality-join oracle.  Events with a
    null timestamp or null key pair with nothing under the join's
    null semantics and are emitted directly with count 0.
    All arithmetic is exact integer microseconds.
    """
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the replicate explode runs
    # map-side at the scan's split count — a multi-row-group input
    # gets a free parallel scan from the maxPartitionBytes retune,
    # a tiny single-group file keeps its plan
    events = ensure_parallelism(events, events.sparkSession,
                                tune_only=True)
    r_us = radius_s * US
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("key"),
        us.alias("us"),
    )
    invalid = base.filter(
        F.col("us").isNull() | F.col("key").isNull()
    ).select(
        "event_id", "key", F.lit(0).cast("long").alias("n_neighbors")
    )
    valid = base.filter(F.col("us").isNotNull() & F.col("key").isNotNull())
    # floor-aligned bucket (pmod: sign-safe for pre-1970 timestamps)
    bkt = F.expr(f"CAST((us - pmod(us, {r_us})) DIV {r_us} AS BIGINT)")
    rep = valid.withColumn("bucket0", bkt).select(
        "event_id",
        "key",
        "us",
        "bucket0",
        F.explode(
            F.array(
                F.col("bucket0") - 1, F.col("bucket0"), F.col("bucket0") + 1
            )
        ).alias("cell"),
    )
    w_all = (
        Window.partitionBy("cell").orderBy("us").rangeBetween(-r_us, r_us)
    )
    w_same = (
        Window.partitionBy("cell", "key")
        .orderBy("us")
        .rangeBetween(-r_us, r_us)
    )
    counted = rep.withColumn(
        "c_all", F.count(F.lit(1)).over(w_all)
    ).withColumn("c_same", F.count(F.lit(1)).over(w_same))
    return (
        counted.filter(F.col("cell") == F.col("bucket0"))
        .select(
            "event_id",
            "key",
            (F.col("c_all") - F.col("c_same")).cast("long")
            .alias("n_neighbors"),
        )
        .unionByName(invalid)
    )


def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 3600,
    slack_num: int = 1,
    slack_den: int = 4,
    h_mult: int = 4,
) -> DataFrame:
    """CUSUM level-shift detection over tumbling-window counts — the
    classic sequential changepoint statistic a monitoring pipeline
    runs where the trailing-z of rate_anomalies misses slow drifts:

        S_0 = 0;  S_i = max(0, S_{i-1} + x_i - k)     (per key)
        alarm when S_i >= h

    with k = ceilmean + max(1, floor(ceilmean * slack_num /
    slack_den)) and h = h_mult * (ceilmean + 1), ceilmean the key's
    overall mean count rounded UP ((sum + n - 1) DIV n): a floor mean
    would leave up to +1 expected drift per in-control window and S
    would ramp to an alarm on perfectly steady traffic; the ceil plus
    a minimum slack of 1 makes the in-control drift nonpositive.
    Everything is exact BIGINT arithmetic, so the DuckDB
    recursive-CTE oracle reproduces S bit-for-bit.

    Shape: counts aggregate on (key, widx) with map-side partials
    (input-sized exchange of count rows, never raw events); the
    per-key mean is a second count-row-sized aggregation broadcast
    back; the recurrence itself is inherently sequential PER KEY, so
    it runs as ONE applyInPandas over key groups ordered by window —
    the fold model pack_sequences documents: parallel across keys,
    sequential within, state O(1) per key.  A 100 TB deployment runs
    it over the (tiny) count table a streaming aggregation maintains,
    not over raw events.

    Returns (key, widx, n_events, s, is_alarm).
    """
    from pyspark.sql import types as T

    counts = window_counts(events, ts_col, key_col, window_s).select(
        "key", "widx", "n_events"
    )
    # integer DIV on (sum + n - 1) = ceil, not a float mean: float
    # rounding could differ from the oracle at large sums, and a
    # FLOOR mean would leave positive in-control drift (see docstring)
    means = counts.groupBy("key").agg(
        F.expr(
            "CAST((sum(n_events) + count(1) - 1) DIV count(1) AS BIGINT)"
        ).alias("keymean")
    )
    withm = counts.join(F.broadcast(means), "key")
    schema = T.StructType(
        [
            T.StructField("key", withm.schema["key"].dataType, True),
            T.StructField("widx", T.LongType(), True),
            T.StructField("n_events", T.LongType(), True),
            T.StructField("s", T.LongType(), False),
            T.StructField("is_alarm", T.BooleanType(), False),
        ]
    )

    def scan(pdf):
        import pandas as pd

        pdf = pdf.sort_values("widx", kind="mergesort")
        keymean = int(pdf["keymean"].iloc[0])
        k = keymean + max(1, (keymean * slack_num) // slack_den)
        h = h_mult * (keymean + 1)
        s = 0
        ss, alarms = [], []
        for x in pdf["n_events"].tolist():
            s = max(0, s + int(x) - k)
            ss.append(s)
            alarms.append(s >= h)
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "widx": pdf["widx"].astype("int64"),
                "n_events": pdf["n_events"].astype("int64"),
                "s": pd.Series(ss, index=pdf.index, dtype="int64"),
                "is_alarm": pd.Series(alarms, index=pdf.index),
            }
        )

    return withm.groupBy("key").applyInPandas(scan, schema)


def seasonal_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 3600,
    min_peers: int = 3,
    z_thresh_micro: int = 3_000_000,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: each (key, hour window)
    compares against the history of the SAME day-of-week x hour-of-day
    slot (Monday-9am vs all other Monday-9ams) — the detector for
    traffic with daily/weekly shape, where trailing_z would flag every
    morning ramp.  z excludes the window itself from its baseline
    (leave-one-out mean/variance), so a single spiked window cannot
    dilute its own score.

    Determinism: counts are exact integers; mu/var/z use ONE literal
    evaluation order shared with the DuckDB oracle and IEEE-exact
    sqrt, so z_micro hash-matches (same policy as rate_anomalies).

    Shape: the count merge exchanges on (key, widx) with map-side
    partials; ONE count-row-sized exchange on (key, dow, hour) feeds
    a single Window node computing all three seasonal aggregates.
    Raw events never shuffle on the seasonal key.
    """
    counts = window_counts(events, ts_col, key_col, window_s)
    wts = F.timestamp_micros(F.col("window_start_us"))
    seasonal = counts.select(
        "key",
        "widx",
        "window_start_us",
        "n_events",
        (F.dayofweek(wts) - 1).cast("long").alias("dow"),
        F.hour(wts).cast("long").alias("hod"),
    )
    w = Window.partitionBy("key", "dow", "hod")
    x = F.col("n_events").cast("double")
    n_all = F.count(F.lit(1)).over(w).cast("long")
    s1 = F.sum("n_events").over(w).cast("long")
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("long")
    stats = seasonal.select(
        "key", "widx", "window_start_us", "n_events", "dow", "hod",
        (n_all - 1).alias("n_peers"),
        s1.alias("s1"),
        s2.alias("s2"),
    )
    np_ = F.col("n_peers").cast("double")
    mu = (F.col("s1").cast("double") - x) / np_
    var = (
        (F.col("s2").cast("double") - x * x)
        - (F.col("s1").cast("double") - x)
        * (F.col("s1").cast("double") - x)
        / np_
    ) / np_
    z = F.round((x - mu) * F.lit(float(US)) / F.sqrt(var)).cast("long")
    z_micro = F.when(
        (F.col("n_peers") >= min_peers) & (var > 0.0), z
    )
    return stats.select(
        "key",
        "widx",
        "n_events",
        "dow",
        "hod",
        "n_peers",
        z_micro.alias("z_micro"),
        (
            z_micro.isNotNull() & (F.abs(z_micro) >= z_thresh_micro)
        ).alias("is_anomaly"),
    )
