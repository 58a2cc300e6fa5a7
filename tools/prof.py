"""Consolidated profiling harness (prof.py: the stdlib shadows a tools/profile.py).

    python tools/prof.py dhcpd-stages [sf_dir]
        stage-by-stage cost of the dhcpd vectorized plan (render ->
        shared regex projection -> event array -> explode -> agg ->
        full query), best-of-3 with forced GC between runs.

    python tools/prof.py dhcpd-driver [sf_dir]
        driver-side run_batch cost split (plan build vs collect) plus
        a cProfile of one cold run.

    python tools/prof.py ab QUERY [--sf DIR] [--n N]
        N-iteration variance study of one queries() entry: per-run
        wall time, JVM GC time delta, and shuffle-partition count, to
        attribute pathological repeats (GC pause vs plan change vs
        host noise).  Prints one JSON line with all samples.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from mtail_spark.session import get_spark  # noqa: E402


def _gc_ms(spark) -> int:
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    return sum(b.getCollectionTime() for b in beans)


def _timed(spark, label, fn, n=3):
    best = None
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} {best:7.3f} s")
    return best


# ------------------------------------------------------- dhcpd stages


def dhcpd_stages(sf: str) -> None:
    spark = get_spark("profile-dhcpd")
    from mtail_spark.compiler.api import compile_program
    from mtail_spark.compiler.codegen import Vectorizer, _event_sql
    from mtail_spark.plans.demo_programs import (
        DHCPD_PATH,
        q_mtail_prog_dhcpd,
        render_dhcpd_lines,
    )
    from mtail_spark.session import ensure_parallelism

    prog = compile_program(open(DHCPD_PATH).read(), "dhcpd.mtail")
    lines = render_dhcpd_lines(spark, sf)
    print(f"lines: {lines.count()}")
    _timed(spark, "render+count lines", lambda: lines.count())

    vz = Vectorizer(prog.checked, now_us=0)
    vz.compile()
    print(f"sites: {len(vz.sites)}  shared cols: {len(vz.shared)}")
    lines_p = ensure_parallelism(lines, spark)
    lines_p.createOrReplaceTempView("__prof_lines")
    src = vz.shared_layers_sql("__prof_lines")

    proj_cols = ", ".join(name for name, _, _ in vz.shared)
    shared_df = spark.sql(
        f"SELECT filename, line_no, {proj_cols} FROM {src}"
    )
    _timed(
        spark, "shared projection (all cols)",
        lambda: shared_df.select(
            [F.count(c) for c in shared_df.columns[2:]]
        ).collect(),
    )
    mcols = [name for name, _, _ in vz.shared if "_m" in name]
    _timed(
        spark, "match columns only",
        lambda: spark.sql(
            f"SELECT {', '.join('count(' + c + ')' for c in mcols)} "
            f"FROM {src}"
        ).collect(),
    )
    ev_sqls = [_event_sql(s, s.metric.vtype) for s in vz.sites]
    evs = f"array({', '.join(ev_sqls)})"
    flat = spark.sql(
        f"SELECT filename, line_no, {evs} AS evs FROM {src}"
    )
    _timed(
        spark, "event array build (size only)",
        lambda: flat.select(F.sum(F.size("evs"))).collect(),
    )
    events = (
        flat.select(
            "filename", "line_no", F.explode_outer("evs").alias("e")
        ).filter(F.col("e").isNotNull())
    )
    _timed(spark, "+ explode_outer+filter (count)", lambda: events.count())
    ev2 = events.select(
        "filename", "line_no",
        F.col("e.site").alias("site"), F.col("e.labels").alias("labels"),
        F.col("e.vi").alias("vi"), F.col("e.vf").alias("vf"),
        F.col("e.le").alias("le"), F.col("e.ts_us").alias("ts_us"),
    )
    agg = ev2.groupBy("site", "labels", "le", "filename").agg(
        F.sum("vi"), F.count(F.lit(1)), F.max("ts_us")
    )
    _timed(spark, "+ groupBy agg (collect)", lambda: agg.collect())
    _timed(
        spark, "FULL q_mtail_prog_dhcpd",
        lambda: q_mtail_prog_dhcpd(spark, sf).collect(),
    )


# ------------------------------------------------------- dhcpd driver


def dhcpd_driver(sf: str) -> None:
    import cProfile
    import pstats

    spark = get_spark("profile-dhcpd2")
    from mtail_spark.compiler.api import compile_program
    from mtail_spark.plans.demo_programs import (
        DHCPD_PATH,
        render_dhcpd_lines,
    )

    prog = compile_program(open(DHCPD_PATH).read(), "dhcpd.mtail")
    lines = render_dhcpd_lines(spark, sf)
    lines.count()  # warm
    for i in range(3):
        t0 = time.perf_counter()
        df = prog.run_batch(spark, lines)
        t1 = time.perf_counter()
        rows = df.collect()
        t2 = time.perf_counter()
        print(
            f"run {i}: run_batch={t1 - t0:6.3f}s "
            f"collect={t2 - t1:6.3f}s rows={len(rows)}"
        )
    pr = cProfile.Profile()
    pr.enable()
    prog.run_batch(spark, lines).collect()
    pr.disable()
    pstats.Stats(pr).sort_stats("cumulative").print_stats(28)


# ------------------------------------------------------ A/B variance


def ab(query: str, sf: str, n: int) -> None:
    """Per-iteration wall + GC attribution for one queries() entry.
    The bench harness's forced-GC discipline is replicated so the
    samples match BENCH_r{N} methodology; a run whose (wall - its
    own GC delta) is near the minimum was a GC/cleaner stall, not a
    plan regression."""
    import __spark_entry__ as entrymod
    from mtail_spark.session import reset_scan_tuning

    spark = get_spark("profile-ab")
    qs = entrymod.queries()
    fn = qs[query]
    # warm (cold run excluded from the A/B)
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    samples = []
    for i in range(n):
        reset_scan_tuning(spark)
        # match bench.py's two-layer cache discipline (r12 fix): every
        # timed iteration computes from the inputs — no CacheManager
        # reuse of operator persists, no run_batch plan-memo hits
        spark.catalog.clearCache()
        from mtail_spark.compiler.api import clear_plan_caches

        clear_plan_caches()
        spark._jvm.System.gc()
        spark._jvm.System.gc()
        time.sleep(0.6)
        gc0 = _gc_ms(spark)
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        gc1 = _gc_ms(spark)
        samples.append(
            {"wall_s": round(wall, 3), "gc_ms": gc1 - gc0}
        )
        print(f"iter {i:2d}: wall={wall:6.3f}s gc={gc1 - gc0:5d}ms",
              file=sys.stderr)
    walls = sorted(s["wall_s"] for s in samples)
    # host-state calibration alongside the samples (same legs as
    # bench.py): st = single-core turbo, mt = 8-process wall.  A
    # cross-round wall delta under ~the canary ratios is host state,
    # not code — see BENCH.md round-10 "canary" sections.
    import bench

    out = {
        "query": query,
        "sf": sf,
        "n": n,
        "min": walls[0],
        "median": walls[n // 2],
        "max": walls[-1],
        "max_over_min": round(walls[-1] / walls[0], 2),
        "host_canary_sec": bench.host_canary(),
        "host_canary_mt_sec": bench.host_canary_mt(),
        "samples": samples,
    }
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    cmd = sys.argv[1]
    args = sys.argv[2:]
    if cmd == "dhcpd-stages":
        dhcpd_stages(args[0] if args else "/root/testdata/sf0.1")
    elif cmd == "dhcpd-driver":
        dhcpd_driver(args[0] if args else "/root/testdata/sf0.1")
    elif cmd == "ab":
        query = args[0]
        sf = "/root/testdata/sf0.1"
        n = 12
        if "--sf" in args:
            sf = args[args.index("--sf") + 1]
        if "--n" in args:
            n = int(args[args.index("--n") + 1])
        ab(query, sf, n)
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
