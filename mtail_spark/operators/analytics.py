"""Product/behavioral analytics over event streams: funnels, retention
cohorts, rollup reports, wide pivots, and skew-aware two-phase
aggregation.

These are the OLAP report shapes a monitoring/analytics deployment
runs downstream of metric extraction (the mtail-compiler family
covers the extraction side; google/mtail itself exports to systems
that run exactly these queries — see README parity notes).

Determinism policy (matches the repo convention): every checked value
is an exact integer (counts, integer cents via round(x*100), permille
ratios via integer floor division), dates are calendar DATEs, and
every ordering that feeds a window or top-k has a full deterministic
tie-break.  No transcendental functions anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cents(col):
    return F.round(col * 100).cast("long")


def funnel(
    events: DataFrame,
    stages: list,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: stage i counts users whose FIRST
    qualifying stage-i event is at-or-after their first qualifying
    stage-(i-1) event (the classic product funnel, >= so same-timestamp
    progressions count).  With `within_s`, stage i must ALSO occur no
    more than within_s seconds after the first stage-(i-1) time — the
    time-bounded funnel (conversion windows); comparisons in exact
    integer microseconds.

    Output: (stage_idx, stage, n_users, conv_permille) — one row per
    stage, conv_permille = floor(1000 * n_i / n_0), NULL when the
    funnel head is empty (no division by zero in either engine).

    Scale shape: ONE linear plan.  The user frame accumulates a t_i
    column per stage — stage i is the stage-i event subset (filter
    pushed to the scan) joined per user against t_{i-1} and
    re-aggregated to one min — and every per-stage count comes from a
    SINGLE final aggregate over that frame (count(t_i)).  Earlier
    shape (one .agg() per stage, unioned) embedded chain 0..i in
    counts[i], so stage-j subplans re-executed O(stages^2) times per
    action since Spark does not dedupe common subtrees (r8 ADVICE);
    now each stage subplan executes exactly once.  Every shuffle
    carries per-user 1-row frames or a single stage's events, never
    the full log; the output is stages-sized.  Skewed users don't
    hurt: the per-user state is one min timestamp per stage.
    """
    assert len(stages) >= 2
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    u = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(us).alias("t0"))
    )
    for i, s in enumerate(stages[1:], start=1):
        stage_ev = events.filter(F.col(type_col) == s).select(
            F.col(user_col).alias("_su"), us.alias("_us")
        )
        prev = F.col(f"t{i - 1}")
        cond = (F.col(user_col) == F.col("_su")) & (F.col("_us") >= prev)
        if within_s is not None:
            cond = cond & (
                F.col("_us") <= prev + F.lit(within_s * 1_000_000)
            )
        carried = [user_col] + [f"t{j}" for j in range(i)]
        u = (
            u.join(stage_ev, cond, "left")
            .groupBy(*carried)
            .agg(F.min("_us").alias(f"t{i}"))
        )
    totals = u.agg(
        *[
            F.count(f"t{i}").cast("long").alias(f"n{i}")
            for i in range(len(stages))
        ]
    )
    per_stage = totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("stage_idx"),
                        F.lit(s).alias("stage"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i, s in enumerate(stages)
                ]
            )
        ).alias("r"),
        F.col("n0"),
    )
    return per_stage.select(
        F.col("r.stage_idx").alias("stage_idx"),
        F.col("r.stage").alias("stage"),
        F.col("r.n_users").alias("n_users"),
        F.when(
            F.col("n0") > 0,
            F.expr("r.n_users * 1000 DIV n0").cast("long"),
        ).alias("conv_permille"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-granularity retention triangle: cohort = each user's first
    active calendar day; one output row per (cohort_day, offset_days)
    with the number of cohort users active that day.

    Scale shape: events collapse to distinct (user, day) first — the
    only corpus-sized shuffle, map-side-combine friendly; the cohort
    day is then a per-user window MIN over that already-small frame
    (instead of a separate first-day aggregate joined back, which
    costs an extra shuffle AND a join); the final rollup is
    cohort-sized (days x offsets), tiny.  This is the shape that
    survives 100 TB: nothing ever groups on the (huge) user dimension
    without first collapsing to per-user per-day 1-row state.
    """
    d = F.to_date(F.col(ts_col))
    active = events.select(F.col(user_col), d.alias("day")).distinct()
    w = Window.partitionBy(user_col)
    return (
        active.withColumn("cohort_day", F.min("day").over(w))
        .groupBy(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def rollup_report(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hierarchical subtotal report: GROUP BY ROLLUP(event_type,
    day-of-week) — per-(type, dow) cells, per-type subtotals, and a
    grand total in ONE pass (Catalyst expands the rollup into a single
    Expand + aggregation; no per-level rescan).

    dow is 0=Sunday..6=Saturday (dayofweek()-1, matching DuckDB's
    date_part('dow')).  lvl = grouping(type)*2 + grouping(dow)
    disambiguates subtotal rows from genuine NULL group values.
    Values: exact counts + integer cents.
    """
    dow = (F.dayofweek(F.col(ts_col)) - 1).cast("long")
    return (
        events.select(
            F.col(type_col).alias("event_type"),
            dow.alias("dow"),
            F.col(value_col).alias("value"),
        )
        .rollup("event_type", "dow")
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("dow"))
            .cast("long")
            .alias("lvl"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(_cents(F.col("value"))).cast("long").alias("sum_cents"),
        )
        .select("event_type", "dow", "lvl", "n_events", "sum_cents")
    )


def pivot_wide(
    events: DataFrame,
    pivot_values: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Long-to-wide: one row per user, one count column per event
    type — the feature-vector/report shape.  The pivot value list is
    EXPLICIT: Spark then skips the extra distinct-values job and the
    output schema is stable regardless of which types a data slice
    happens to contain (absent combinations are 0, not a missing
    column).  One user-keyed aggregation; Catalyst compiles the pivot
    into a single aggregation with one conditional-count state per
    declared value, so this never shuffles more than (users x 1 row).
    """
    wide = (
        events.groupBy(user_col)
        .pivot(type_col, pivot_values)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        F.col(user_col),
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0))
            .cast("long")
            .alias(f"n_{v}")
            for v in pivot_values
        ],
    )


def salted_agg(
    events: DataFrame,
    shards: int = 16,
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Two-phase (salted) aggregation: rows first aggregate under
    (key, salt) with salt = pmod(row id, shards), then the per-shard
    partials merge under the bare key.  Semantically identical to a
    direct groupBy — the oracle IS the direct GROUP BY.

    Why it exists: for algebraic aggregates (sum/count) map-side
    combine already defuses key skew, but for HOLISTIC or
    high-cardinality-state aggregates (exact distinct sets, large
    collect-style states, UDAF sketches) a single reducer per hot key
    is the 100 TB bottleneck — the salt fans one hot key's state
    across `shards` reducers and the second phase merges `shards`
    partials per key (bounded).  This operator is the oracle-checked
    reference of that shape on mergeable aggregates, so the plan
    (two exchanges, Expand-free) can be asserted and reused where the
    state is NOT algebraic.  Salt from the row id, not rand(): the
    result must be deterministic.
    """
    partial = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.pmod(F.col(id_col), F.lit(shards)).alias("_salt"),
            F.col(value_col).alias("value"),
        )
        .groupBy("event_type", "_salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(_cents(F.col("value"))).alias("pc"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("pc").cast("long").alias("sum_cents"),
        F.count(F.lit(1)).cast("long").alias("n_shards_seen"),
    )


def state_intervals(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
) -> DataFrame:
    """Gaps-and-islands / SCD-2 interval build: collapse each key's
    CONSECUTIVE runs of equal values into validity intervals — the
    standard way an event log becomes a slowly-changing-dimension
    table (state = value, valid from first to last event of the run).

    Classic two-window shape: a lag() change flag, a running SUM of
    flags as the island id, then one aggregate per (key, island).
    All three windows and the aggregate share ONE exchange on the key
    (identical partitioning; the windows sort once).  Ordering ties
    on duplicate (key, ts) resolve by the row id, so islands are
    fully deterministic.  Timestamps as exact integer microseconds.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(user_col).alias("key"),
        F.col(value_col).alias("state"),
        us.alias("us"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("us").asc(), F.col("_id").asc()
    )
    prev = F.lag("state").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("state")), 1).otherwise(0)
    base = base.withColumn(
        "island",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        base.groupBy("key", "island", "state")
        .agg(
            F.min("us").cast("long").alias("from_us"),
            F.max("us").cast("long").alias("to_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            "key",
            F.col("island").cast("long").alias("island"),
            "state",
            "from_us",
            "to_us",
            "n_events",
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts: for each key's event
    stream in (ts, id) order, count (prev_type -> next_type) pairs and
    report the outgoing transition probability in exact ppm
    (n * 1e6 DIV outgoing-total of prev_type) — the behavioral-model /
    anomalous-flow primitive.

    One exchange on the key for the lag window; the pair aggregation
    and the per-prev totals both operate on pair rows (type-pair
    cardinality, tiny); the totals join is broadcast by construction.
    Ties on duplicate (key, ts) resolve by the row id.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    outgoing = pairs.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("out_total")
    )
    return pairs.join(F.broadcast(outgoing), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.expr("n * 1000000 DIV out_total").cast("long").alias("ppm"),
    )


def multi_touch_attribution(
    events: DataFrame,
    window_s: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    touch_type: str = "click",
    conv_type: str = "purchase",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's revenue
    splits equally across the SAME user's touch events in the
    trailing `window_s` (inclusive); per touch, report how many
    conversions credited it and the attributed integer-cent revenue
    (cents DIV n_touches per conversion — exact, deterministic,
    conservative by at most n_touches-1 cents per conversion).

    The touch-conversion match is a user-keyed equi-join with the
    time band filtered inside the matched key (per-user event counts
    bound the pair fan-out; nothing is all-pairs).  Touches with no
    conversion survive with zero credit via the final left join —
    the same zero-fill shape as band_join_counts.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    touches = events.filter(F.col(type_col) == touch_type).select(
        F.col(id_col).alias("touch_id"),
        F.col(user_col).alias("key"),
        us.alias("t_us"),
    )
    convs = events.filter(F.col(type_col) == conv_type).select(
        F.col(user_col).alias("key"),
        us.alias("c_us"),
        F.col(id_col).alias("conv_id"),
        _cents(F.col(value_col)).alias("cents"),
    )
    matched = touches.join(convs, "key").filter(
        (F.col("t_us") <= F.col("c_us"))
        & (F.col("t_us") >= F.col("c_us") - F.lit(window_s * 1_000_000))
    )
    w = Window.partitionBy("conv_id")
    credited = (
        matched.withColumn(
            "n_touches", F.count(F.lit(1)).over(w).cast("long")
        )
        .groupBy("touch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.expr("cents DIV n_touches"))
            .cast("long")
            .alias("attributed_cents"),
        )
    )
    return (
        touches.select("touch_id", "key")
        .join(credited, "touch_id", "left")
        .select(
            "touch_id",
            "key",
            F.coalesce(F.col("n_conversions"), F.lit(0))
            .cast("long")
            .alias("n_conversions"),
            F.coalesce(F.col("attributed_cents"), F.lit(0))
            .cast("long")
            .alias("attributed_cents"),
        )
    )
