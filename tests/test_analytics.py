"""Hand-computed unit tests for the round-8 analytics/timeseries
operators (asof join, funnel, retention, rollup, pivot, salted agg,
sliding stats, band join)."""

from datetime import datetime

from pyspark.sql import functions as F

import mtail_spark.operators.analytics as AN
import mtail_spark.operators.timeseries as TS


def _ev(spark, rows):
    """rows: (event_id, user_id, ts_str, event_type, value)"""
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts_s", "event_type", "value"]
    ).select(
        "event_id",
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_asof_join_hand_case(spark):
    ev = _ev(
        spark,
        [
            (100, 1, "2024-01-01 00:00:10", "click", 1.0),
            (101, 1, "2024-01-01 00:00:20", "click", 2.0),
            (102, 1, "2024-01-01 00:00:20", "click", 3.0),  # dup ts, bigger id
            (200, 1, "2024-01-01 00:00:05", "purchase", 9.0),
            (201, 1, "2024-01-01 00:00:20", "purchase", 9.0),
            (202, 1, "2024-01-01 00:00:25", "purchase", 9.0),
            (300, 2, "2024-01-01 00:00:30", "purchase", 9.0),  # no clicks
        ],
    )
    out = {
        r.probe_id: (r.b_id, r.b_value, r.lag_us)
        for r in TS.asof_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        ).collect()
    }
    assert out[200] == (None, None, None)  # purchase before any click
    # equal-ts click counts (<=); among the two ts=20 clicks the larger
    # event_id (102) wins
    assert out[201] == (102, 3.0, 0)
    assert out[202] == (102, 3.0, 5_000_000)
    assert out[300] == (None, None, None)  # other user's clicks invisible


def test_asof_join_fused_equals_unfused(spark):
    """The r12 single-scan fusion must be row-identical to the
    two-filter union form on the same disjoint-predicate input,
    including the dup-ts tie-break, the no-prior-build NULL row, and
    a user with clicks only (build rows that never surface)."""
    ev = _ev(
        spark,
        [
            (100, 1, "2024-01-01 00:00:10", "click", 1.0),
            (101, 1, "2024-01-01 00:00:20", "click", 2.0),
            (102, 1, "2024-01-01 00:00:20", "click", 3.0),
            (200, 1, "2024-01-01 00:00:05", "purchase", 9.0),
            (201, 1, "2024-01-01 00:00:20", "purchase", 9.0),
            (202, 1, "2024-01-01 00:00:25", "purchase", 9.0),
            (300, 2, "2024-01-01 00:00:30", "purchase", 9.0),
            (301, 3, "2024-01-01 00:00:01", "click", 5.0),  # clicks only
            (400, 4, "2024-01-01 00:00:02", "view", 0.0),  # neither side
        ],
    )
    pc = F.col("event_type") == "purchase"
    bc = F.col("event_type") == "click"
    unfused = sorted(
        map(tuple, TS.asof_join(ev.filter(pc), ev.filter(bc)).collect())
    )
    fused = sorted(map(tuple, TS.asof_join_fused(ev, pc, bc).collect()))
    assert fused == unfused
    # one scan vs two (ADVICE r12: assert the specific marker — a
    # single source scan — rather than substring-matching node names)
    plan = (
        TS.asof_join_fused(ev, pc, bc)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_scans = plan.count("Scan ExistingRDD") + plan.count("Scan parquet")
    assert n_scans == 1, plan


def test_asof_join_fused_rejects_overlapping_literals(spark):
    """The disjointness precondition is statically asserted when both
    predicates are col == literal on one column (VERDICT r12 item 8):
    the SAME literal means every matching row satisfies both sides,
    which the fused form cannot represent."""
    import pytest

    ev = _ev(spark, [(1, 1, "2024-01-01 00:00:01", "click", 1.0)])
    same = F.col("event_type") == "click"
    with pytest.raises(AssertionError, match="SAME literal"):
        TS.asof_join_fused(ev, same, F.col("event_type") == "click")
    # different literals on one column: provably disjoint, accepted
    TS.asof_join_fused(
        ev, F.col("event_type") == "purchase", same
    ).collect()
    # predicates the static check can't see (different columns /
    # non-equality) pass through — caller-guaranteed, documented
    TS.asof_join_fused(
        ev, F.col("value") > 100, same
    ).collect()


def test_funnel_hand_case(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, 1, "2024-01-01 00:00:01", "signup", 0.0),
            (2, 1, "2024-01-01 00:00:02", "view", 0.0),
            (3, 1, "2024-01-01 00:00:03", "purchase", 0.0),
            # u2: view BEFORE signup -> stops at stage 0
            (4, 2, "2024-01-01 00:00:04", "view", 0.0),
            (5, 2, "2024-01-01 00:00:05", "signup", 0.0),
            # u3: never signed up -> not even stage 0
            (6, 3, "2024-01-01 00:00:06", "view", 0.0),
        ],
    )
    rows = {
        r.stage: (r.n_users, r.conv_permille)
        for r in AN.funnel(ev, ["signup", "view", "purchase"]).collect()
    }
    assert rows["signup"] == (2, 1000)
    assert rows["view"] == (1, 500)
    assert rows["purchase"] == (1, 500)


def test_funnel_empty_head_no_division_error(spark):
    ev = _ev(spark, [(1, 1, "2024-01-01 00:00:01", "view", 0.0)])
    rows = {r.stage: r for r in AN.funnel(ev, ["signup", "view"]).collect()}
    assert rows["signup"].n_users == 0
    assert rows["signup"].conv_permille is None  # NULL, not a crash


def test_retention_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 10:00:00", "view", 0.0),
            (2, 1, "2024-01-03 09:00:00", "view", 0.0),
            (3, 1, "2024-01-03 23:00:00", "click", 0.0),  # same day, once
            (4, 2, "2024-01-03 00:00:00", "view", 0.0),
        ],
    )
    out = {
        (r.cohort_day.isoformat(), r.offset_days): r.n_users
        for r in AN.retention_cohorts(ev).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_rollup_levels_consistent(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:01", "view", 1.0),   # Monday
            (2, 1, "2024-01-02 00:00:02", "view", 2.0),   # Tuesday
            (3, 2, "2024-01-01 00:00:03", "click", 4.0),  # Monday
        ],
    )
    rows = AN.rollup_report(ev).collect()
    by_lvl = {}
    for r in rows:
        by_lvl.setdefault(r.lvl, []).append(r)
    # grand total: lvl 3, everything NULL, all rows
    (gt,) = by_lvl[3]
    assert (gt.event_type, gt.dow, gt.n_events, gt.sum_cents) == (
        None, None, 3, 700,
    )
    # per-type subtotals: lvl 1
    sub = {r.event_type: (r.n_events, r.sum_cents) for r in by_lvl[1]}
    assert sub == {"view": (2, 300), "click": (1, 400)}
    # cells: lvl 0, dow 1=Monday (2024-01-01 was a Monday)
    cells = {(r.event_type, r.dow): r.n_events for r in by_lvl[0]}
    assert cells == {("view", 1): 1, ("view", 2): 1, ("click", 1): 1}


def test_pivot_wide_zero_fill(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:01", "view", 0.0),
            (2, 1, "2024-01-01 00:00:02", "view", 0.0),
            (3, 2, "2024-01-01 00:00:03", "click", 0.0),
        ],
    )
    out = {
        r.user_id: (r.n_view, r.n_click, r.n_purchase)
        for r in AN.pivot_wide(ev, ["view", "click", "purchase"]).collect()
    }
    assert out == {1: (2, 0, 0), 2: (0, 1, 0)}


def test_salted_agg_equals_direct_groupby(spark):
    ev = _ev(
        spark,
        [(i, i % 7, "2024-01-01 00:00:01", "view" if i % 3 else "click",
          float(i) + 0.25) for i in range(60)],
    )
    salted = {
        r.event_type: (r.n_events, r.sum_cents)
        for r in AN.salted_agg(ev, shards=4).collect()
    }
    direct = {
        r.event_type: (r.n_events, r.sum_cents)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .collect()
    }
    assert salted == direct
    shards = {
        r.event_type: r.n_shards_seen for r in AN.salted_agg(ev, 4).collect()
    }
    assert all(1 <= v <= 4 for v in shards.values())


def test_sliding_stats_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:01", "view", 1.00),
            (2, 1, "2024-01-01 00:00:02", "view", 2.00),
            (3, 1, "2024-01-01 00:00:02", "view", 4.00),  # ts tie -> id order
            (4, 1, "2024-01-01 00:00:03", "view", 8.00),
        ],
    )
    out = {
        r.event_id: (r.trail_sum_cents, r.trail_n, r.trail_max_cents)
        for r in TS.sliding_stats(ev, trail_rows=2).collect()
    }
    assert out == {
        1: (100, 1, 100),
        2: (300, 2, 200),
        3: (600, 2, 400),
        4: (1200, 2, 800),
    }


def test_band_join_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 10, "2024-01-01 00:00:00", "view", 0.0),
            (2, 20, "2024-01-01 00:01:40", "view", 0.0),  # +100 s
            (3, 10, "2024-01-01 00:02:01", "view", 0.0),  # +121 s
            (4, 20, "2024-01-01 00:05:00", "view", 0.0),  # +300 s
        ],
    )
    out = {
        r.event_id: r.n_neighbors
        for r in TS.band_join_counts(ev, radius_s=120).collect()
    }
    # e1-e2: 100 s apart, different users -> neighbors
    # e1-e3: same user -> excluded; e2-e3: 21 s -> neighbors
    # e4: nothing within 120 s from another user
    assert out == {1: 1, 2: 2, 3: 1, 4: 0}


def test_band_join_boundary_inclusive(spark):
    ev = _ev(
        spark,
        [
            (1, 10, "2024-01-01 00:00:00", "view", 0.0),
            (2, 20, "2024-01-01 00:02:00", "view", 0.0),  # exactly 120 s
        ],
    )
    out = {
        r.event_id: r.n_neighbors
        for r in TS.band_join_counts(ev, radius_s=120).collect()
    }
    assert out == {1: 1, 2: 1}


def test_band_join_null_ts_preserved(spark):
    # r12 optimization regression guard: the LEFT bucket-join +
    # conditional-count rewrite must keep a null-ts event in the
    # output with 0 neighbors (the oracle's LEFT JOIN semantics —
    # a null us matches nothing but the row itself survives), and
    # null-ts rows must never count as anyone's neighbor.
    ev = _ev(
        spark,
        [
            (1, 10, "2024-01-01 00:00:00", "view", 0.0),
            (2, 20, "2024-01-01 00:01:00", "view", 0.0),  # +60 s
            (3, 30, None, "view", 0.0),                   # null ts
            (4, None, "2024-01-01 00:00:30", "view", 0.0),  # null key
        ],
    )
    out = {
        r.event_id: r.n_neighbors
        for r in TS.band_join_counts(ev, radius_s=120).collect()
    }
    # null-ts and null-key events survive with 0 (every join-side
    # comparison involving them is null) and never count as anyone's
    # neighbor — events 1/2 still see only each other
    assert out == {1: 1, 2: 1, 3: 0, 4: 0}


def test_cusum_hand_case(spark):
    # one key, hourly counts 2,2,2,8,8 -> ceilmean = ceil(22/5) = 5,
    # k = 5 + max(1, 5//4) = 6, h = 4*(5+1) = 24
    # S: max(0,0+2-6)=0, 0, 0, max(0,0+8-6)=2, max(0,2+8-6)=4
    rows = []
    eid = 0
    for hour, n in enumerate([2, 2, 2, 8, 8]):
        for _ in range(n):
            rows.append(
                (eid, 1, f"2024-01-01 {hour:02d}:30:00", "view", 0.0)
            )
            eid += 1
    ev = _ev(spark, rows)
    out = {
        r.widx: (r.n_events, r.s, r.is_alarm)
        for r in TS.cusum_changepoints(ev).collect()
    }
    widx0 = min(out)
    got = [out[widx0 + i] for i in range(5)]
    assert got == [
        (2, 0, False),
        (2, 0, False),
        (2, 0, False),
        (8, 2, False),
        (8, 4, False),
    ]


def test_cusum_alarm_fires_on_level_shift(spark):
    # counts 1x20 then 9x10: ceilmean = ceil(110/30) = 4,
    # k = 4 + max(1, 4//4) = 5, h = 4*(4+1) = 20; S ramps by 4 per
    # shifted window -> alarm from the 5th shifted window on
    rows = []
    eid = 0
    for hour in range(30):
        n = 1 if hour < 20 else 9
        for _ in range(n):
            rows.append(
                (eid, 1, f"2024-01-{1 + hour // 24:02d} "
                         f"{hour % 24:02d}:15:00", "view", 0.0)
            )
            eid += 1
    ev = _ev(spark, rows)
    out = sorted(
        (r.widx, r.s, r.is_alarm)
        for r in TS.cusum_changepoints(ev).collect()
    )
    # pre-shift: S stays 0 (1 - 5 < 0)
    assert all(s == 0 and not a for _, s, a in out[:20])
    shifted = [(s, a) for _, s, a in out[20:]]
    assert shifted == [
        (4, False), (8, False), (12, False), (16, False), (20, True),
        (24, True), (28, True), (32, True), (36, True), (40, True),
    ]


def test_state_intervals_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:01", "view", 0.0),
            (2, 1, "2024-01-01 00:00:02", "view", 0.0),
            (3, 1, "2024-01-01 00:00:03", "click", 0.0),
            (4, 1, "2024-01-01 00:00:04", "view", 0.0),   # view AGAIN
            (5, 2, "2024-01-01 00:00:05", "view", 0.0),
        ],
    )
    out = {
        (r.key, r.island): (r.state, r.n_events,
                            (r.to_us - r.from_us) // 1_000_000)
        for r in AN.state_intervals(ev).collect()
    }
    # user 1: view-run (2 events, 1 s span), click, then a NEW view
    # island (consecutive runs only — not grouped with island 1)
    assert out == {
        (1, 1): ("view", 2, 1),
        (1, 2): ("click", 1, 0),
        (1, 3): ("view", 1, 0),
        (2, 1): ("view", 1, 0),
    }


def test_state_intervals_tie_break_on_id(spark):
    # duplicate (user, ts): island boundaries must follow event_id order
    ev = _ev(
        spark,
        [
            (10, 1, "2024-01-01 00:00:01", "a", 0.0),
            (11, 1, "2024-01-01 00:00:01", "b", 0.0),
            (12, 1, "2024-01-01 00:00:01", "b", 0.0),
        ],
    )
    out = sorted(
        (r.island, r.state, r.n_events)
        for r in AN.state_intervals(ev).collect()
    )
    assert out == [(1, "a", 1), (2, "b", 2)]


def test_log_template_masks():
    from pyspark.sql import Row
    import mtail_spark.operators.textstats as TXS

    # pure-expression check via a literal row
    line = ("Jan  1 00:00:07 dhcp1 dhcpd[1234]: "
            "DHCPACK on 10.0.3.77 to 02:ab:cd:0e:ef:34 via eth0")
    import __spark_entry__  # noqa: F401  (session conventions)
    from mtail_spark.session import get_spark

    spark = get_spark("tmpl-test", cpus=2)
    out = spark.createDataFrame([Row(line=line)]).select(
        TXS.log_template(F.col("line")).alias("t")
    ).collect()[0].t
    assert out == ("Jan  <n> <n>:<n>:<n> dhcp<n> dhcpd[<n>]: "
                   "DHCPACK on <ip> to <mac> via eth<n>")


def test_seasonal_anomalies_flags_slot_spike(spark):
    # same Monday-9am slot across 4 weeks: 4,5,6 then a 50-burst; other
    # hours quiet so the slot is isolated
    rows, eid = [], 0
    for week, n in enumerate([4, 5, 6, 50]):
        day = 1 + 7 * week  # 2024-01-01 is a Monday
        for _ in range(n):
            rows.append((eid, 1, f"2024-01-{day:02d} 09:10:00", "view", 0.0))
            eid += 1
    ev = _ev(spark, rows)
    out = {r.widx: r for r in TS.seasonal_anomalies(ev).collect()}
    assert len(out) == 4
    spike = max(out.values(), key=lambda r: r.n_events)
    assert spike.n_events == 50 and spike.n_peers == 3
    assert spike.dow == 1 and spike.hod == 9  # Monday, 09:xx
    assert spike.is_anomaly and spike.z_micro > 3_000_000
    # the quiet weeks: peers include the 50-burst, variance is huge,
    # z is small -> not anomalous
    for r in out.values():
        if r.n_events != 50:
            assert not r.is_anomaly


def test_seasonal_anomalies_null_without_history(spark):
    ev = _ev(spark, [(1, 1, "2024-01-01 09:00:00", "view", 0.0)])
    (r,) = TS.seasonal_anomalies(ev).collect()
    assert r.n_peers == 0 and r.z_micro is None and not r.is_anomaly


def test_event_transitions_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:01", "view", 0.0),
            (2, 1, "2024-01-01 00:00:02", "click", 0.0),
            (3, 1, "2024-01-01 00:00:03", "view", 0.0),
            (4, 1, "2024-01-01 00:00:04", "click", 0.0),
            (5, 2, "2024-01-01 00:00:05", "view", 0.0),
            (6, 2, "2024-01-01 00:00:06", "purchase", 0.0),
        ],
    )
    out = {
        (r.prev_type, r.next_type): (r.n, r.ppm)
        for r in AN.event_transitions(ev).collect()
    }
    # view -> click twice, view -> purchase once, click -> view once
    assert out[("view", "click")] == (2, 666666)
    assert out[("view", "purchase")] == (1, 333333)
    assert out[("click", "view")] == (1, 1000000)
    # user boundary: click(4) -> view(5) must NOT count (different users)
    assert ("click", "purchase") not in out


def test_multi_touch_attribution_hand_case(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 10:00:00", "click", 0.0),
            (2, 1, "2024-01-01 11:00:00", "click", 0.0),
            (3, 1, "2024-01-01 12:00:00", "purchase", 10.01),  # 1001 cents
            (4, 1, "2024-01-03 12:00:00", "purchase", 2.00),  # outside 1d
            (5, 2, "2024-01-01 09:00:00", "click", 0.0),      # other user
        ],
    )
    out = {
        r.touch_id: (r.n_conversions, r.attributed_cents)
        for r in AN.multi_touch_attribution(ev).collect()
    }
    # purchase 3 splits 1001 cents across clicks 1 and 2: 500 each
    # (floor; 1 cent deliberately unassigned); purchase 4 is outside
    # the window for every click; user-2's click gets nothing
    assert out == {1: (1, 500), 2: (1, 500), 5: (0, 0)}


def test_funnel_within_bound_excludes_late_stage(spark):
    ev = _ev(
        spark,
        [
            (1, 1, "2024-01-01 00:00:00", "signup", 0.0),
            (2, 1, "2024-01-09 00:00:00", "view", 0.0),   # day 8: too late
            (3, 2, "2024-01-01 00:00:00", "signup", 0.0),
            (4, 2, "2024-01-05 00:00:00", "view", 0.0),   # day 4: in window
        ],
    )
    rows = {
        r.stage: r.n_users
        for r in AN.funnel(
            ev, ["signup", "view"], within_s=7 * 86400
        ).collect()
    }
    assert rows == {"signup": 2, "view": 1}
    # unbounded form still counts both
    rows2 = {
        r.stage: r.n_users
        for r in AN.funnel(ev, ["signup", "view"]).collect()
    }
    assert rows2 == {"signup": 2, "view": 2}
