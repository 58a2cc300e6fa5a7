"""Randomized invariant tests for the round-8 analytics family:
properties that must hold for ANY input, checked on seeded random
event tables (the oracle gate proves value equality on fixed
snapshots; these prove structural invariants on data the oracles
never saw)."""

import random

from pyspark.sql import functions as F

import mtail_spark.operators.analytics as AN
import mtail_spark.operators.timeseries as TS

TYPES = ["view", "click", "purchase", "signup", "error"]


def _rand_events(spark, seed, n=400, users=12, span_s=3 * 86400):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        ts = rnd.randrange(0, span_s)
        rows.append(
            (
                i,
                rnd.randrange(users),
                f"2024-01-0{1 + ts // 86400} "
                f"{(ts % 86400) // 3600:02d}:{(ts % 3600) // 60:02d}:"
                f"{ts % 60:02d}",
                rnd.choice(TYPES),
                round(rnd.uniform(0.0, 50.0), 2),
            )
        )
    # plant duplicate (user, ts) ties
    for i in range(0, 20, 2):
        rows[i + 1] = (rows[i + 1][0], rows[i][1], rows[i][2],
                       rows[i + 1][3], rows[i + 1][4])
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type", "value"]
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_asof_lag_nonnegative_and_same_key(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        probe = ev.filter(F.col("event_type") == "purchase")
        build = ev.filter(F.col("event_type") == "click")
        out = TS.asof_join(probe, build).collect()
        assert len(out) == probe.count()  # left semantics: every probe row
        builds = {
            r.event_id: (r.user_id, r.ts) for r in build.collect()
        }
        for r in out:
            if r.b_id is not None:
                assert r.lag_us >= 0
                assert builds[r.b_id][0] == r.key  # matched same key
                assert builds[r.b_id][1] <= r.ts


def test_band_join_pair_symmetry(spark):
    for seed in (1, 3):
        ev = _rand_events(spark, seed, n=200)
        out = TS.band_join_counts(ev, radius_s=300).collect()
        assert len(out) == 200
        total = sum(r.n_neighbors for r in out)
        assert total % 2 == 0  # neighborhood is symmetric -> even sum


def test_band_join_single_user_all_zero(spark):
    ev = _rand_events(spark, 5, n=50, users=1)
    out = TS.band_join_counts(ev, radius_s=300).collect()
    assert all(r.n_neighbors == 0 for r in out)


def test_funnel_counts_non_increasing(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        rows = sorted(
            (r.stage_idx, r.n_users)
            for r in AN.funnel(ev, ["signup", "view", "purchase"]).collect()
        )
        ns = [n for _, n in rows]
        assert ns == sorted(ns, reverse=True)


def test_state_intervals_partition_events_exactly(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        out = AN.state_intervals(ev).collect()
        assert sum(r.n_events for r in out) == ev.count()
        by_key = {}
        for r in out:
            by_key.setdefault(r.key, []).append(r)
        for key, rs in by_key.items():
            rs.sort(key=lambda r: r.island)
            # islands numbered 1..n contiguously
            assert [r.island for r in rs] == list(range(1, len(rs) + 1))
            # consecutive islands must change state and not overlap
            for a, b in zip(rs, rs[1:]):
                assert a.state != b.state
                assert a.to_us <= b.from_us
            for r in rs:
                assert r.from_us <= r.to_us


def test_cusum_invariants(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        out = TS.cusum_changepoints(ev).collect()
        for r in out:
            assert r.s >= 0
        # recompute h per key from the data to check the alarm predicate
        import collections

        counts = collections.Counter()
        totals = collections.Counter()
        for r in out:
            counts[r.key] += 1
            totals[r.key] += r.n_events
        for r in out:
            ceilmean = -(-totals[r.key] // counts[r.key])
            h = 4 * (ceilmean + 1)
            assert r.is_alarm == (r.s >= h)


def test_retention_offset_zero_equals_cohort_size(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        rows = AN.retention_cohorts(ev).collect()
        # every user is active on their own cohort day by definition,
        # so offset-0 rows partition the user set exactly
        n_users = ev.select("user_id").distinct().count()
        assert sum(r.n_users for r in rows if r.offset_days == 0) == n_users
        assert all(r.offset_days >= 0 for r in rows)


def test_pivot_row_sums_equal_event_counts(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        out = AN.pivot_wide(ev, TYPES).collect()
        per_user = {
            r.user_id: r.n
            for r in ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        for r in out:
            total = sum(getattr(r, f"n_{t}") for t in TYPES)
            assert total == per_user[r.user_id]


def test_rollup_subtotals_add_up(spark):
    for seed in (1, 2):
        ev = _rand_events(spark, seed)
        rows = AN.rollup_report(ev).collect()
        cells = [r for r in rows if r.lvl == 0]
        subs = {r.event_type: r for r in rows if r.lvl == 1}
        (grand,) = [r for r in rows if r.lvl == 3]
        assert grand.n_events == sum(r.n_events for r in cells)
        assert grand.sum_cents == sum(r.sum_cents for r in cells)
        for t, srow in subs.items():
            tc = [r for r in cells if r.event_type == t]
            assert srow.n_events == sum(r.n_events for r in tc)
            assert srow.sum_cents == sum(r.sum_cents for r in tc)
