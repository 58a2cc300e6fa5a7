"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Results are forced with the noop sink (full computation, no driver
collect) so timings reflect executor work, not result transfer.

The final stdout line is kept under COMPACT_LIMIT bytes: the driver
that records BENCH_r{N}.json keeps only the LAST 2000 characters of
output, and rounds 1-7 overflowed that buffer — the line's head was
cut off and the driver recorded ``parsed: null`` every round.  The
full result (cold runs, the sf1 marginal-scaling suite) is written to
BENCH_DETAIL.json beside this file and echoed to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from mtail_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # mtail-parity (regex-heavy == the dhcpd-class workload)
    "mtail_linecount",
    "mtail_counter_by",
    "mtail_bytes_sum",
    "mtail_gauge_lww",
    "mtail_histogram",
    # real mtail programs through the compiler's vectorized backend
    "mtail_prog_counters",
    "mtail_prog_gauge",
    "mtail_prog_histogram",
    # the reference's heaviest example (27 sites; its slowest
    # benchmark row at ~6 klines/s single-process)
    "mtail_prog_dhcpd",
    # register-RMW class (mysql_slowqueries pattern): scalar
    # cross-line registers; auto-routes to the chunkfold backend on
    # large inputs (sf1), the stratified window plan below 8 MB
    "mtail_prog_txn",
    "mtail_prog_stateful",
    # relational
    "tpch_pricing_summary",
    "join_revenue_by_nation",
    "window_topk_orders",
    "sessionize_events",
    # extensions
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_bruteforce",
    "sim_topk_gemm",
    "sim_topk_pq",
    "text_token_counts",
    # round-8 analytics family
    "asof_join_last_touch",
    "band_join_counts",
    "tpch_q3_shipping",
    # round-9 TPC-H spine (HAVING filter, semi-join, outer-join
    # distribution, anti-join)
    "tpch_q18_big_orders",
    "tpch_q4_priority",
    "tpch_q13_custdist",
    "tpch_q22_idle_balances",
    # late round-9 TPC-H spine (two-role dimension join; self-join
    # collapsed into one corpus-wide orderkey window) + the zorder
    # layout-key computation (envelope broadcast + pure codegen)
    "tpch_q7_nation_volume",
    "tpch_q21_waiting_suppliers",
    "zorder_layout",
    # round-10: the mergeable quantile sketch (rank leg of the triad)
    "quantile_sketch_prices",
    # round-11: cross-shard quantile algebra (two shard scans into
    # bucket-bounded merges) + multi-table LSH (one corpus scan, L
    # signature fan-out, candidate-bounded rerank)
    "quantile_sketch_merge",
    "sim_lsh_multitable",
    # round-12: the broadcast-dim enrichment pair's batch form, the
    # salted SMJ rewrite, and the windowed quantile sketch
    "segment_enrichment",
    "salted_skew_join",
    "quantile_sketch_windowed",
]


# Marginal-scaling subset re-run at sf1 (10x fact rows, fixed dims —
# built by tools/make_bench_sf.py).  Fixed overhead (JVM, plan/codegen)
# is amortized at this scale, so these times ARE the 100 TB projection.
SF1_QUERIES = [
    "mtail_counter_by",
    "mtail_histogram",
    "mtail_prog_counters",
    "mtail_prog_histogram",
    "mtail_prog_dhcpd",
    "mtail_prog_txn",
    "tpch_pricing_summary",
    "join_revenue_by_nation",
    "window_topk_orders",
    "sessionize_events",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_gemm",
    "text_token_counts",
    # round-7 additions (new keys extend the record; existing keys'
    # cross-round min-basis series are unaffected)
    "sim_topk_pq",
    "quality_classifier",
    # round-8 additions
    "asof_join_last_touch",
    "band_join_counts",
    "tpch_q3_shipping",
    # round-9 additions (6M-lineitem HAVING scan; anti-join)
    "tpch_q18_big_orders",
    "tpch_q4_priority",
    # late round-9 (the corpus-window self-join collapse — the
    # heaviest new shape: 6M lineitem rows through ONE orderkey
    # window at sf1)
    "tpch_q21_waiting_suppliers",
    # round-10 (1.5M orders fold into <= ~1950 bucket counts before
    # the one exchange — the marginal cost should be scan-dominated)
    "quantile_sketch_prices",
    # round-11 (two shard scans of the 10x orders table into bucket-
    # bounded merges; marginal cost = two scans, like the global form)
    "quantile_sketch_merge",
    # round-12 (broadcast enrichment: the join stage must stay
    # shuffle-free at any left size; salted SMJ: the two-phase join
    # shape; windowed sketch: cells scale with hours x types, not rows)
    "segment_enrichment",
    "salted_skew_join",
    "quantile_sketch_windowed",
    # round-13 (VERDICT r12 item 10): the pass-2 tune_only operator
    # wins (4-6x builder A/Bs) enter the driver-run sf1 basis
    "boilerplate_ngrams",
    "span_dedup",
    "dsir_weights",
    "decontamination",
]


# Scaling-basis rows (VERDICT r12 item 7): the driver re-runs this
# bench at a lower core count and takes its 8-vs-32 scaling probe
# from the "queries" dict — whose sf0.1 rows are sub-second and
# fixed-overhead-dominated on this single-row-group corpus, so their
# ratios sit near 1 regardless of real scalability.  The sf1 min rows
# of the parallel-heavy queries are therefore copied into "queries"
# under sf1_* names: those rows have enough work to parallelize
# (r12: dhcpd 8.43 s @8cpu vs 3.45 s @32cpu) and make the probe
# meaningful.  Additive only — no existing entry is removed/renamed.
SCALING_BASIS = (
    "mtail_prog_dhcpd",
    "mtail_prog_txn",
    "dedup_simhash",
    "band_join_counts",
    "tpch_q3_shipping",
    "quality_classifier",
)


# round-12 (VERDICT r11 item 1): the sf1 -> sf10 MARGINAL-SCALING leg.
# sf0.1 -> sf1 was the only measured scale step; the 100 TB claims
# otherwise rest on plan-shape audits.  sf10 (100x the driver's sf0.1:
# 10M events / 60M lineitem, built once into .bench/sf10) gives a
# second decade, so a superlinear constant the first step hides shows
# up as a per-query sf10/sf1 ratio materially above 10.  Subset chosen
# to cover every plan class in SF1_QUERIES (regex scan-agg, compiled
# program, chunkfold stateful, hash/SMJ join, corpus window, LSH
# dedup, GEMM, sketch fold) while keeping the leg's wall time bounded;
# repeats=2 — the ratio uses min-of-N at BOTH scales from the same
# process, so host state cancels to first order.
SF10_QUERIES = [
    "mtail_counter_by",
    "mtail_prog_counters",
    "mtail_prog_dhcpd",
    "mtail_prog_txn",
    "tpch_pricing_summary",
    "join_revenue_by_nation",
    "window_topk_orders",
    "sessionize_events",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_gemm",
    "text_token_counts",
    "tpch_q3_shipping",
    "tpch_q18_big_orders",
    "band_join_counts",
    "quantile_sketch_prices",
    # round-12: the salted SMJ (plan class not otherwise in this
    # subset) and the windowed sketch (state ~ hours x types x
    # buckets — the ratio must track the scan, not the cell count)
    "salted_skew_join",
    "quantile_sketch_windowed",
]


def _time_queries(spark, qs, names, sf_dir, repeats=3):
    """median-of-N warm (primary), best-of-N, and first-run cold per
    query.  The median is the per-round comparison number — single
    best-of runs swung ~2x between rounds on sub-second queries
    (GC/codegen jitter); the min is the capability number."""
    import statistics

    from mtail_spark.session import reset_scan_tuning

    med, best, cold = {}, {}, {}
    for name in names:
        ts = []
        for r in range(repeats):
            # each query tunes scan split sizing for its own data;
            # start every measurement from the session default so one
            # query's tuning can't poison the next
            reset_scan_tuning(spark)
            # drop session-cached relations between timed runs
            # (optimization r12 measurement fix): an operator-internal
            # persist (minhash_lsh_pairs' band-bucket relation) stays
            # registered in the CacheManager after the action, so
            # repeat N+1's equivalent plan silently reused repeat N's
            # cached rows instead of recomputing from parquet —
            # measured 0.94 s vs 1.5 s honest recompute at sf0.1.
            # Every timed invocation must compute from the inputs;
            # pre-fix records (r11 and earlier, and the r12 baseline)
            # carry the reuse on dedup_minhash_lsh repeats.
            spark.catalog.clearCache()
            # Second reuse layer (same fix, found on the sf1 leg):
            # run_batch memoizes the built store plan per compiled
            # program, and chunkfold plans embed executed phase-A
            # state — a repeat that hits the memo either reads the
            # previous repeat's persisted fold (pre-fix: mtail_prog_
            # txn sf1 0.75 s vs 4.9 s honest) or, with the cache
            # cleared but the memo intact, recomputes phase A TWICE
            # because the persist inside the stale plan was already
            # neutered (measured 6.6 s median vs 4.9 s honest).
            # Dropping the plan memo makes every repeat rebuild and
            # re-execute like a first invocation.
            from mtail_spark.compiler.api import clear_plan_caches

            clear_plan_caches()
            if r:
                # JMH-style forced GC between repeats: the 24g local
                # heap collects so rarely that Spark's GC-driven
                # ContextCleaner backlog (shuffle files, broadcasts)
                # eventually drains DURING a measured run, inflating
                # random repeats 3-8x.  TWO collections (weak refs
                # need a finalize+enqueue cycle) plus a pause for the
                # cleaner thread to drain its queue; measured: spikes
                # vanish entirely (10x1.9-2.2 s vs 2-18 s without).
                spark._jvm.System.gc()
                spark._jvm.System.gc()
                time.sleep(0.6)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        med[name] = round(statistics.median(ts), 3)
        best[name] = round(min(ts), 3)
        cold[name] = round(ts[0], 3)
    return med, best, cold


COMPACT_LIMIT = 1900  # driver tail buffer is 2000; leave margin

# Must-keep subset of the sf0.1 "queries" dict in the compact line
# (VERDICT r10 'what's wrong' item 2): the last-resort trim used to
# drop longest-keys-first, which let BYTE LENGTH choose which queries
# future readers can trend across rounds.  This pins the set the
# BENCH_r10 record kept, so every cross-round sf0.1 series continues
# unbroken; only queries OUTSIDE this list are trim candidates (their
# full timings always survive in BENCH_DETAIL.json).  Append-only,
# budget permitting — never remove a name (that breaks its series).
SF01_MUST_KEEP = frozenset({
    "mtail_linecount", "mtail_counter_by", "mtail_bytes_sum",
    "mtail_gauge_lww", "mtail_histogram", "mtail_prog_gauge",
    "mtail_prog_dhcpd", "mtail_prog_txn",
    "window_topk_orders", "sessionize_events",
    "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk_bruteforce", "sim_topk_gemm", "sim_topk_pq",
    "text_token_counts", "band_join_counts",
    "tpch_q3_shipping", "tpch_q18_big_orders", "tpch_q4_priority",
    "tpch_q13_custdist", "zorder_layout",
})

# Pinned subset of sf1_queries_min (same role as SF01_MUST_KEEP for
# the sf1 leg): the judge's round-over-round sf1 series.  Trim
# candidates are only the entries OUTSIDE this set; everything always
# survives in BENCH_DETAIL.json.  Append-only, budget permitting.
SF1_MUST_KEEP = frozenset({
    "mtail_prog_dhcpd", "mtail_prog_txn", "mtail_prog_counters",
    "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk_gemm", "sim_topk_pq", "text_token_counts",
    "quality_classifier", "asof_join_last_touch", "band_join_counts",
    "tpch_q3_shipping", "tpch_q18_big_orders", "tpch_q4_priority",
    "tpch_q21_waiting_suppliers", "tpch_pricing_summary",
    "quantile_sketch_merge", "sessionize_events",
    # round-13 (VERDICT r12 item 10): the pass-2 tune_only wins enter
    # the driver-ground-truth basis
    "boilerplate_ngrams", "span_dedup", "dsir_weights",
    "decontamination",
})

# Keys dropped from the stdout line (in order) until it fits the
# driver's tail buffer.  Everything always survives in
# BENCH_DETAIL.json; "queries" itself is required by the spec and is
# never dropped.
_COMPACT_DROP_ORDER = (
    "sf10_queries_cold",
    "sf1_queries_cold",
    "queries_cold",
    "sf10_queries",
    "sf1_queries",
    "queries_min",
    # the sf10 per-query series are the LAST detail dropped: the
    # summary scalars (sf10_ratio_median/max) always survive, and
    # sf10_queries_min is recoverable as ratio x sf1_queries_min, so
    # the min dict goes before the ratio dict
    "sf10_queries_min",
    "sf10_over_sf1",
)

# Secondary scalars dropped (in order) after the detail dicts but
# BEFORE any per-query entry: each is the warm-median twin of a
# cross_round_basis="min" capability scalar that always survives
# (or, for the sf10 leg, recoverable from the ratio scalars x the sf1
# rows).  ~200 bytes that buy seven pinned per-query series.
_SCALAR_DROP_ORDER = (
    "sf10_compiled_program_klines_per_sec_best",
    "sf1_compiled_program_klines_per_sec",
    "compiled_program_klines_per_sec",
    "mtail_parity_klines_per_sec",
    "dhcpd_klines_per_sec",
    "sf1_wall_sec",
    "sf10_wall_min_sec",
)


def compact_line(result: dict, limit: int = COMPACT_LIMIT) -> str:
    """One JSON line guaranteed <= limit bytes.

    Byte-budget priority (VERDICT r12 item 1 — the r12 line trimmed
    14 of the 22 pinned sf0.1 entries to preserve sf1_queries_min at
    full size/precision, starving the driver's PERF comparison, whose
    ONLY round-over-round basis is the "queries" dict).  Order when
    over budget:
      1. detail dicts in _COMPACT_DROP_ORDER
      2. secondary scalars in _SCALAR_DROP_ORDER
      3. sf1_queries_min entries whose value is already in the line
         as a queries["sf1_<name>"] scaling row (exact duplicates —
         zero information loss)
      4. sf10_worst (its summary scalars remain)
      5. non-pinned sf1_queries_min entries (longest key first;
         count in "sf1_truncated")
      6. non-pinned "queries" entries ("queries_truncated")
      7. pinned sf1 entries
      8. pinned "queries" entries — the <= limit guarantee wins over
         every pin: an unparseable line loses EVERY series.
    The full record always survives in BENCH_DETAIL.json."""
    out = dict(result)
    # Per-query dicts are ALWAYS emitted at 2 decimals (10 ms
    # granularity — plenty for trending; full 3-decimal values always
    # in BENCH_DETAIL.json).  Unconditional on purpose (ADVICE r11):
    # when rounding only kicked in on overflow, the compact line's
    # precision varied by round with suite size, so a 10 ms
    # cross-round step could be a formatting artifact.  From r13 this
    # covers sf1_queries_min too (3-decimal series live in the detail
    # file); the basis itself (min) is unchanged.
    for k in ("queries", "sf1_queries_min"):
        if isinstance(out.get(k), dict):
            out[k] = {n: round(v, 2) for n, v in out[k].items()}
    line = json.dumps(out)
    for key in _COMPACT_DROP_ORDER + _SCALAR_DROP_ORDER:
        if len(line) <= limit:
            break
        out.pop(key, None)
        line = json.dumps(out)

    def trim(dict_key, names, count_key=None):
        nonlocal line
        d = dict(out.get(dict_key) or {})
        for name in names:
            if len(line) <= limit:
                break
            d.pop(name)
            out[dict_key] = d
            if count_key:
                out[count_key] = out.get(count_key, 0) + 1
            line = json.dumps(out)

    sf1d = out.get("sf1_queries_min")
    qd = out.get("queries")
    if len(line) > limit and isinstance(sf1d, dict):
        # scaling-row duplicates first: queries["sf1_<q>"] carries the
        # SAME min value, so removing the sf1_queries_min twin loses
        # nothing (not counted as truncation)
        dupes = [n for n in sf1d
                 if isinstance(qd, dict) and f"sf1_{n}" in qd]
        trim("sf1_queries_min", sorted(dupes, key=len, reverse=True))
    if len(line) > limit and "sf10_worst" in out:
        out.pop("sf10_worst")
        line = json.dumps(out)
    if len(line) > limit and isinstance(out.get("sf1_queries_min"), dict):
        trim("sf1_queries_min", sorted(
            (n for n in out["sf1_queries_min"] if n not in SF1_MUST_KEEP),
            key=len, reverse=True,
        ), "sf1_truncated")
    if len(line) > limit and isinstance(out.get("queries"), dict):
        # scaling rows (sf1_<q>) count as pinned here: after step 3
        # they are the line's only copy of those sf1 series
        trim("queries", sorted(
            (n for n in out["queries"]
             if n not in SF01_MUST_KEEP
             and not (n.startswith("sf1_") and n[4:] in SCALING_BASIS)),
            key=len, reverse=True,
        ), "queries_truncated")
    if len(line) > limit and isinstance(out.get("sf1_queries_min"), dict):
        trim("sf1_queries_min", sorted(
            out["sf1_queries_min"], key=len, reverse=True,
        ), "sf1_truncated")
    if len(line) > limit and isinstance(out.get("queries"), dict):
        trim("queries", sorted(
            out["queries"], key=len, reverse=True,
        ), "queries_truncated")
    n_trim = out.get("queries_truncated", 0) + out.get("sf1_truncated", 0)
    if n_trim:
        print(
            f"bench: trimmed {n_trim} entries (full set in "
            "BENCH_DETAIL.json)",
            file=sys.stderr,
        )
    return line


CANARY_ITERS = 600_000


def _canary_spin(iters: int) -> float:
    """One fixed md5 spin; module-level so the multi-core leg can
    pickle it into worker processes."""
    import hashlib

    h = b"canary"
    t0 = time.perf_counter()
    for _ in range(iters):
        h = hashlib.md5(h).digest()
    return time.perf_counter() - t0


def host_canary(repeats: int = 3) -> float:
    """Fixed pure-CPU spin timed at bench start (r9 VERDICT item 2):
    CANARY_ITERS chained md5 digests, best of `repeats`.  The shared
    VM this bench runs on swings identical-code runs up to ~3x
    (BENCH.md 'variance'), and the r9 driver record was captured ~2x
    degraded with only prose to explain it — a canary in the record
    itself lets any cross-round reader normalize: compare
    host_canary_sec across rounds before comparing query times.
    Single-threaded on purpose (the swing is per-core contention);
    min-of-N matches the suite's cross_round_basis."""
    return round(min(_canary_spin(CANARY_ITERS) for _ in range(repeats)), 3)


def host_canary_mt(workers: int = 8) -> float:
    """Multi-core canary leg: the SAME spin on `workers` processes at
    once (processes, not threads — the 16-byte md5 loop holds the
    GIL); reports the wall time for all to finish.  Catches the host
    state the single-core canary cannot: a VM can deliver full
    single-core turbo while its core COUNT is throttled, which slows
    the parallel-stage-heavy queries (32-thread scans/shuffles) but
    leaves host_canary_sec looking idle.  Ratio mt/st ~ 1 means full
    parallel capacity; >> 1 means core-count throttling — read the
    parallel-heavy rows accordingly."""
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=workers) as ex:
        # warm the pool so process spawn cost stays out of the timing
        list(ex.map(_canary_spin, [1000] * workers))
        t0 = time.perf_counter()
        list(ex.map(_canary_spin, [CANARY_ITERS] * workers))
        return round(time.perf_counter() - t0, 3)


def _scaled_dir(name: str, factor: int) -> str | None:
    """Locate (or lazily build) replicated bench data at `factor` x
    the driver's sf0.1 (name='sf1' factor=10, name='sf10' factor=100;
    built once, cached on disk across rounds)."""
    d = os.environ.get(
        f"SPARK_GRAFT_{name.upper()}_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench", name),
    )
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    if all(os.path.exists(os.path.join(d, f"{t}.parquet"))
           for t in tables):
        return d
    try:
        from tools.make_bench_sf import build

        build("/root/testdata/sf0.1", d, factor)
        return d
    except Exception as e:  # never let scale prep break the primary bench
        print(f"{name} bench data unavailable: {e}", file=sys.stderr)
        return None


def _sf1_dir() -> str | None:
    return _scaled_dir("sf1", 10)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    canary = host_canary()
    canary_mt = host_canary_mt()
    spark = get_spark("mtail-spark-bench")
    qs = entrymod.queries()

    # Warm the JVM + parquet footers with a trivial action.
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    # The timer covers query CONSTRUCTION + execution: the mtail
    # program queries do their Spark work eagerly inside construction
    # (run_batch collects the store), so timing only the noop write of
    # the returned store-sized frame — as r1 did — misses nearly all
    # their cost.  Best of 2 reports steady state (run 1 pays one-time
    # plan/codegen costs); cold (first-run) numbers alongside.
    timings, timings_min, timings_cold = _time_queries(
        spark, qs, BENCH_QUERIES, sf_dir
    )
    total = round(sum(timings.values()), 3)

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    result = {
        "metric": "headline_suite_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        # host-state calibration: NOT in _COMPACT_DROP_ORDER, so both
        # legs always survive into the driver's recorded line.
        # BENCH.md maps canary values to the expected timing band;
        # mt/st >> 1 flags core-count throttling that the single-core
        # leg cannot see.
        "host_canary_sec": canary,
        "host_canary_mt_sec": canary_mt,
        "queries": timings,
        "queries_min": timings_min,
        "queries_cold": timings_cold,
        "sf": sf,
        "events_rows": n_events,
        "mtail_parity_klines_per_sec": round(
            n_events
            / 1000.0
            / max(
                sum(
                    timings[q]
                    for q in (
                        "mtail_linecount",
                        "mtail_counter_by",
                        "mtail_bytes_sum",
                        "mtail_gauge_lww",
                        "mtail_histogram",
                    )
                )
                / 5.0,
                1e-9,
            ),
            1,
        ),
        # the dhcpd-class comparison: a real compiled mtail program
        # (regex + strptime + dimensioned counters) over rendered lines
        "compiled_program_klines_per_sec": round(
            n_events / 1000.0 / max(timings["mtail_prog_counters"], 1e-9), 1
        ),
        # vs the reference's slowest row (dhcpd-class, ~6 klines/s)
        "dhcpd_klines_per_sec": round(
            n_events / 1000.0 / max(timings["mtail_prog_dhcpd"], 1e-9), 1
        ),
        # Min-basis (best-of-N) is the PRIMARY cross-round comparison
        # basis for every query at both scales (queries_min /
        # sf1_queries_min): on this shared VM the median folds in
        # whatever contention that day brings, while the min is the
        # reproducible engine cost — see BENCH.md "variance".  The
        # warm-median fields above remain for continuity with earlier
        # rounds' records.
        "cross_round_basis": "min",
        "dhcpd_klines_per_sec_best": round(
            n_events / 1000.0
            / max(timings_min["mtail_prog_dhcpd"], 1e-9),
            1,
        ),
        "compiled_program_klines_per_sec_best": round(
            n_events / 1000.0
            / max(timings_min["mtail_prog_counters"], 1e-9),
            1,
        ),
        "mtail_parity_klines_per_sec_best": round(
            n_events
            / 1000.0
            / max(
                sum(
                    timings_min[q]
                    for q in (
                        "mtail_linecount",
                        "mtail_counter_by",
                        "mtail_bytes_sum",
                        "mtail_gauge_lww",
                        "mtail_histogram",
                    )
                )
                / 5.0,
                1e-9,
            ),
            1,
        ),
    }

    sf1 = _sf1_dir()
    min1 = None
    if sf1:
        warm1, min1, cold1 = _time_queries(
            spark, qs, SF1_QUERIES, sf1, repeats=3
        )
        n1 = spark.read.parquet(f"{sf1}/events.parquet").count()
        result["sf1_queries"] = warm1
        result["sf1_queries_min"] = min1
        result["sf1_queries_cold"] = cold1
        result["sf1_events_rows"] = n1
        result["sf1_wall_sec"] = round(sum(warm1.values()), 3)
        result["sf1_compiled_program_klines_per_sec"] = round(
            n1 / 1000.0 / max(warm1["mtail_prog_counters"], 1e-9), 1
        )
        # capability number: best-of-N.  Host CPU contention (this is
        # a shared VM) swings identical back-to-back runs 1.7-3.5 s;
        # the min is the reproducible engine cost, the median the
        # expected cost under that day's noise.  BENCH.md discusses.
        result["sf1_compiled_program_klines_per_sec_best"] = round(
            n1 / 1000.0 / max(min1["mtail_prog_counters"], 1e-9), 1
        )
        # scaling-basis rows: sf1 min rows of the parallel-heavy
        # queries, re-published into "queries" so the driver's
        # lower-core-count probe compares rows with real parallel
        # work (see SCALING_BASIS)
        for q in SCALING_BASIS:
            if q in min1:
                result["queries"][f"sf1_{q}"] = min1[q]

    # sf10 marginal-scaling leg (VERDICT r11 item 1).  Ratio basis:
    # min-of-N at both scales from THIS process — same JVM, same host
    # window — so a ratio near 10 is linear scaling and anything
    # materially above it is a real superlinear constant, not host
    # drift.  SPARK_GRAFT_SF10=0 skips the leg (the primary suites are
    # never hostage to it).
    if sf1 and min1 and os.environ.get("SPARK_GRAFT_SF10", "1") != "0":
        sf10 = _scaled_dir("sf10", 100)
        if sf10:
            warm10, min10, cold10 = _time_queries(
                spark, qs, SF10_QUERIES, sf10, repeats=2
            )
            n10 = spark.read.parquet(f"{sf10}/events.parquet").count()
            ratios = {
                q: round(min10[q] / max(min1[q], 1e-9), 2)
                for q in SF10_QUERIES
                if q in min1
            }
            import statistics

            rvals = sorted(ratios.values())
            rmax_q = max(ratios, key=ratios.get)
            result["sf10_queries"] = warm10
            result["sf10_queries_min"] = min10
            result["sf10_queries_cold"] = cold10
            result["sf10_events_rows"] = n10
            result["sf10_wall_min_sec"] = round(sum(min10.values()), 3)
            result["sf10_over_sf1"] = ratios
            # summary scalars survive every compact-line trim
            result["sf10_ratio_median"] = round(
                statistics.median(rvals), 2
            )
            result["sf10_ratio_max"] = ratios[rmax_q]
            result["sf10_ratio_max_q"] = rmax_q
            # the actionable slice of the per-query series — the 8
            # largest ratios; dropped by compact_line only as a LAST
            # resort before pinned-entry trims (the three ratio
            # scalars above always survive; full dicts live in
            # BENCH_DETAIL.json and the round's BENCH.md table)
            result["sf10_worst"] = dict(
                sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
            )
            result["sf10_compiled_program_klines_per_sec_best"] = round(
                n10 / 1000.0 / max(min10["mtail_prog_counters"], 1e-9), 1
            )

    # post-suite canary pair (VERDICT r11 'what's wrong' item 2): the
    # start-of-run sample can't see MID-suite throttling (round-11 run
    # C throttled after the canary was taken).  Pre/post disagreement
    # beyond the documented idle band brackets which rows to distrust.
    result["host_canary_sec_post"] = host_canary()
    result["host_canary_mt_sec_post"] = host_canary_mt()

    # Full record to a side file (and stderr) for humans/the judge;
    # ONE compact JSON line to stdout for the driver's 2000-char tail.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), file=sys.stderr)
    result["detail"] = "BENCH_DETAIL.json"
    print(compact_line(result))


if __name__ == "__main__":
    main()
