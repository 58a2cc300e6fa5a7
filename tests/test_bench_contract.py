"""Pin the bench.py stdout contract.

The driver that records BENCH_r{N}.json keeps only the LAST 2000
characters of bench output and json-parses the final line; rounds 1-7
printed a single ~4 kB line, so its head was truncated and every
recorded round has ``parsed: null``.  compact_line() is the guard:
the stdout line must stay under the tail buffer while the full record
goes to BENCH_DETAIL.json.
"""

import json

import bench


def _fake_result(n_queries=25, with_sf1=True):
    qs = {f"query_name_{i:02d}": round(0.123 + i, 3) for i in range(n_queries)}
    r = {
        "metric": "headline_suite_wall_sec",
        "value": 14.71,
        "unit": "sec",
        "queries": qs,
        "queries_min": qs,
        "queries_cold": qs,
        "sf": 0.1,
        "events_rows": 100000,
        "mtail_parity_klines_per_sec": 241.2,
        "compiled_program_klines_per_sec": 71.7,
        "dhcpd_klines_per_sec": 51.4,
        "cross_round_basis": "min",
        "host_canary_sec": 0.31,
        "host_canary_mt_sec": 0.52,
        "dhcpd_klines_per_sec_best": 57.4,
        "compiled_program_klines_per_sec_best": 108.0,
        "mtail_parity_klines_per_sec_best": 289.2,
        "detail": "BENCH_DETAIL.json",
    }
    if with_sf1:
        r["sf1_queries"] = qs
        r["sf1_queries_min"] = qs
        r["sf1_queries_cold"] = qs
        r["sf1_events_rows"] = 1000000
        r["sf1_wall_sec"] = 20.0
        r["sf1_compiled_program_klines_per_sec"] = 909.9
        r["sf1_compiled_program_klines_per_sec_best"] = 923.4
    return r


def test_compact_line_fits_tail_buffer():
    line = bench.compact_line(_fake_result())
    assert len(line) <= bench.COMPACT_LIMIT
    parsed = json.loads(line)
    # required spec fields survive compaction
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed
    # headline capability numbers survive too
    assert parsed["dhcpd_klines_per_sec_best"] == 57.4
    assert parsed["cross_round_basis"] == "min"
    # the host-state calibration must always survive compaction — it
    # is what makes cross-round comparison of the record possible
    assert parsed["host_canary_sec"] == 0.31
    assert parsed["host_canary_mt_sec"] == 0.52


def test_compact_line_drops_detail_first():
    r = _fake_result()
    line = bench.compact_line(r, limit=1900)
    parsed = json.loads(line)
    # cold runs and sf1 per-query tables are detail; they go first
    assert "queries_cold" not in parsed
    # queries itself is never dropped
    assert len(parsed["queries"]) == len(r["queries"])


def test_compact_line_no_drop_when_small():
    r = _fake_result(n_queries=3, with_sf1=False)
    line = bench.compact_line(r)
    parsed = json.loads(line)
    assert "queries_min" in parsed and "queries_cold" in parsed


def test_compact_line_preserves_queries_over_sf1_detail():
    # VERDICT r12 item 1: the "queries" dict is the driver's ONLY
    # round-over-round PERF basis, so when the suite outgrows the
    # limit, non-pinned sf1_queries_min entries are trimmed BEFORE
    # any "queries" entry (r12: the old priority starved PERF down
    # to an 8-query comparison).  Both fake sets here are non-pinned.
    r = _fake_result(n_queries=40, with_sf1=True)
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 40
    assert "queries_truncated" not in parsed
    assert parsed.get("sf1_truncated", 0) > 0


def test_bench_queries_are_registered():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in bench.BENCH_QUERIES + bench.SF1_QUERIES:
        assert name in qs, name


def test_compact_line_last_resort_trims_queries():
    # pathological future: so many bench queries that the core alone
    # exceeds the limit — the line must STILL fit (trimming entries and
    # recording the count) rather than regress to an unparseable line
    r = _fake_result(n_queries=120, with_sf1=False)
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["queries_truncated"] > 0
    assert len(parsed["queries"]) + parsed["queries_truncated"] == 120
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed


def test_compact_line_trim_keeps_pinned_sf01_set():
    # VERDICT r10 item 4: the last-resort trim must never drop a
    # query in SF01_MUST_KEEP — byte length no longer chooses which
    # sf0.1 series future readers can trend
    r = _fake_result(n_queries=100, with_sf1=False)
    r["queries"].update(
        {name: 1.234 for name in sorted(bench.SF01_MUST_KEEP)}
    )
    r["queries_min"] = dict(r["queries"])
    r["queries_cold"] = dict(r["queries"])
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["queries_truncated"] > 0
    kept = set(parsed["queries"])
    assert bench.SF01_MUST_KEEP <= kept


def test_compact_line_limit_beats_pin_when_core_outgrows():
    # The <= limit guarantee must win over every pin — rather than
    # emit a line the driver's tail buffer could truncate.  With the
    # r13 priority, non-pinned sf1 entries absorb the overflow first
    # and the pinned sf0.1 queries dict survives whole.
    r = _fake_result(n_queries=0, with_sf1=False)
    r["queries"] = {name: 1.234 for name in sorted(bench.SF01_MUST_KEEP)}
    r["sf1_queries_min"] = {
        f"sf1_series_query_{i:03d}": 1.234 for i in range(35)
    }
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed.get("sf1_truncated", 0) > 0
    assert set(parsed["queries"]) == bench.SF01_MUST_KEEP
    # a limit small enough that even the pinned core cannot fit still
    # yields a parseable line (pins lose to the guarantee)
    tiny = bench.compact_line(dict(r), limit=700)
    assert len(tiny) <= 700
    json.loads(tiny)


def test_compact_line_keeps_pins_at_current_suite_size():
    # VERDICT r12 item 1 "done" criterion: at the REAL suite shape
    # (every BENCH query + scaling rows + full sf1/sf10 legs + every
    # scalar the record carries) all 22 pinned sf0.1 entries, all 6
    # scaling rows, and every SF1_MUST_KEEP series (directly or via
    # its scaling row) survive the trim.
    r = _fake_result(n_queries=0, with_sf1=False)
    qs = {q: 10.93 for q in bench.BENCH_QUERIES}
    for q in bench.SCALING_BASIS:
        qs[f"sf1_{q}"] = 13.449
    r["queries"] = qs
    r["queries_min"] = dict(qs)
    r["queries_cold"] = dict(qs)
    r["sf1_queries_min"] = {q: 11.312 for q in bench.SF1_QUERIES}
    r["sf1_queries"] = dict(r["sf1_queries_min"])
    r["sf1_queries_cold"] = dict(r["sf1_queries_min"])
    r["sf1_events_rows"] = 1000000
    r["sf1_wall_sec"] = 20.0
    r["sf1_compiled_program_klines_per_sec"] = 909.9
    r["sf1_compiled_program_klines_per_sec_best"] = 923.4
    r = _with_sf10(r)
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert bench.SF01_MUST_KEEP <= set(parsed["queries"])
    for q in bench.SCALING_BASIS:
        assert f"sf1_{q}" in parsed["queries"], q
    covered = set(parsed.get("sf1_queries_min", {})) | {
        k[4:] for k in parsed["queries"] if k.startswith("sf1_")
    }
    assert bench.SF1_MUST_KEEP <= covered, bench.SF1_MUST_KEEP - covered


def test_sf01_must_keep_queries_exist():
    # the pinned names must be real headline queries, or the pin rots
    assert bench.SF01_MUST_KEEP <= set(bench.BENCH_QUERIES)


def test_sf1_must_keep_queries_exist():
    assert bench.SF1_MUST_KEEP <= set(bench.SF1_QUERIES)
    assert set(bench.SCALING_BASIS) <= set(bench.SF1_QUERIES)


def _with_sf10(r):
    qs10 = {q: 9.87 for q in bench.SF10_QUERIES}
    r["sf10_queries"] = qs10
    r["sf10_queries_min"] = qs10
    r["sf10_queries_cold"] = qs10
    r["sf10_events_rows"] = 10000000
    r["sf10_wall_min_sec"] = 160.0
    r["sf10_over_sf1"] = {q: 9.9 for q in bench.SF10_QUERIES}
    r["sf10_ratio_median"] = 9.9
    r["sf10_ratio_max"] = 11.2
    r["sf10_ratio_max_q"] = "band_join_counts"
    r["sf10_worst"] = {q: 9.9 for q in bench.SF10_QUERIES[:8]}
    r["host_canary_sec_post"] = 0.33
    r["host_canary_mt_sec_post"] = 0.55
    return r


def test_sf10_queries_subset_of_sf1():
    # the sf10/sf1 ratio needs a same-run sf1 min denominator for
    # every sf10 query
    assert set(bench.SF10_QUERIES) <= set(bench.SF1_QUERIES)


def test_compact_line_keeps_sf10_summary_and_post_canary():
    # the scaling-leg summary scalars and the post-run canary pair
    # (VERDICT r11 items 1 and 4) must survive every trim — they are
    # the cross-round evidence, like the pre-run canary pair
    r = _with_sf10(_fake_result(n_queries=40, with_sf1=True))
    line = bench.compact_line(r, limit=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    for k in (
        "sf10_ratio_median",
        "sf10_ratio_max",
        "sf10_ratio_max_q",
        "host_canary_sec_post",
        "host_canary_mt_sec_post",
        "host_canary_sec",
        "host_canary_mt_sec",
    ):
        assert k in parsed, k
    # when the record is small enough, the worst-ratio slice survives
    # (it only drops under pressure, before any per-query trim)
    r2 = _with_sf10(_fake_result(n_queries=8, with_sf1=False))
    parsed2 = json.loads(bench.compact_line(r2, limit=1900))
    assert parsed2["sf10_worst"] == r2["sf10_worst"]


def test_compact_line_prefers_ratio_dict_over_sf10_min():
    # when detail must go, sf10_queries_min leaves before sf10_over_sf1
    # (the min dict is recoverable as ratio x sf1_queries_min)
    order = bench._COMPACT_DROP_ORDER
    assert order.index("sf10_queries_min") < order.index("sf10_over_sf1")
    assert order.index("sf10_queries_cold") < order.index("sf10_queries")


def test_compact_line_rounds_sf01_queries_unconditionally():
    # ADVICE r11: compact-line precision must not vary by round with
    # suite size — the sf0.1 medians are always 2-decimal
    r = _fake_result(n_queries=3, with_sf1=False)
    r["queries"] = {"q_a": 1.23456, "q_b": 0.999}
    parsed = json.loads(bench.compact_line(r))
    assert parsed["queries"] == {"q_a": 1.23, "q_b": 1.0}


def test_log_template_uppercase_mac():
    # review finding: real syslog emits uppercase-hex MACs too
    from pyspark.sql import functions as F
    import mtail_spark.operators.textstats as TXS
    from mtail_spark.session import get_spark

    spark = get_spark("tmpl-upper", cpus=2)
    out = spark.createDataFrame(
        [("x to 02:AB:CD:0E:EF:34 via eth0",)], ["line"]
    ).select(TXS.log_template(F.col("line")).alias("t")).collect()[0].t
    assert out == "x to <mac> via eth<n>"


def test_scaled_corpus_dup_groups_stay_bounded(tmp_path):
    """The scaling-leg corpus invariant (found by review, r12): exact
    dup GROUP SIZES must not grow with the replication factor, or the
    sf10/sf1 dedup ratios measure a corpus artifact instead of the
    operator.  Per decade of replicas the mix is one exact-dup pair +
    one near-dup + distinct rest, with decade-LOCAL dup targets — so
    at factor 30 every text value occurs at most twice, and the
    number of exactly-twice values is 3 pairs per base doc."""
    import pyarrow.parquet as pq
    from collections import Counter

    from tools.make_bench_sf import build

    build("/root/testdata/sf0.001", str(tmp_path), 30)
    texts = pq.read_table(
        str(tmp_path / "documents.parquet"), columns=["text"]
    ).column("text").to_pylist()
    n_base = len(texts) // 30
    counts = Counter(Counter(texts).values())
    assert counts.get(2, 0) == 3 * n_base, counts
    assert max(Counter(texts).values()) == 2


def test_scaled_corpus_factor10_rule_unchanged(tmp_path):
    """Factor 10 (.bench/sf1) must keep the ORIGINAL i==2/i==4 rule
    byte-for-byte — cross-round sf1 series depend on it: replica 2 is
    an exact dup of the base, replica 4 is base + ' replica4'."""
    import pyarrow.parquet as pq

    from tools.make_bench_sf import build

    build("/root/testdata/sf0.001", str(tmp_path), 10)
    tbl = pq.read_table(str(tmp_path / "documents.parquet"))
    texts = tbl.column("text").to_pylist()
    n = len(texts) // 10
    assert texts[2 * n: 3 * n] == texts[:n]
    assert texts[4 * n: 5 * n] == [t + " replica4" for t in texts[:n]]


def test_time_queries_clears_cache_between_repeats(spark):
    """Optimization-r12 measurement fix: an operator-internal persist
    (minhash_lsh_pairs' bucket relation) survives its action in the
    CacheManager, so without a clear, repeat N+1's equivalent plan
    reuses repeat N's cached rows — the min basis then measures a
    partially-cached run, not a compute-from-parquet run.  The harness
    must present an EMPTY cache to every timed invocation."""
    saw_empty = []

    def fake_query(sp, sf_dir):
        cm = sp._jsparkSession.sharedState().cacheManager()
        saw_empty.append(cm.isEmpty())
        df = sp.range(5).persist()
        df.count()
        return sp.range(1)

    med, best, cold = bench._time_queries(
        spark, {"fake": fake_query}, ["fake"], "/root/testdata/sf0.001",
        repeats=3,
    )
    assert saw_empty == [True, True, True]
    spark.catalog.clearCache()


def test_time_queries_clears_program_plan_memo_between_repeats(spark):
    """Second reuse layer of the same r12 fix: run_batch memoizes the
    built store plan per compiled program, and chunkfold plans embed
    executed phase-A state — a repeat that hits the memo does not
    recompute from the inputs (or, cache-cleared, double-computes
    through the stale persist).  The harness must drop the plan memo
    so every repeat rebuilds like a first invocation."""
    from mtail_spark.compiler import api

    class FakeProg:
        def __init__(self):
            self._plan_cache = {"k": (spark.range(1), None, None)}

    fake = FakeProg()
    api._COMPILE_CACHE["__bench_contract_test__"] = fake
    try:
        def fake_query(sp, sf_dir):
            # memo must be empty at every timed invocation
            assert not fake._plan_cache
            fake._plan_cache["k"] = (sp.range(1), None, None)
            return sp.range(1)

        bench._time_queries(
            spark, {"fake": fake_query}, ["fake"],
            "/root/testdata/sf0.001", repeats=3,
        )
    finally:
        api._COMPILE_CACHE.pop("__bench_contract_test__", None)
