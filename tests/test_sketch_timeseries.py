"""Count-min sketch (operators/sketch.py) and tumbling-window rate
anomaly detection (operators/timeseries.py)."""

import datetime as dt

from pyspark.sql import functions as F

import mtail_spark.operators.sketch as SK
import mtail_spark.operators.timeseries as TS


# ---------------------------------------------------------------- sketch


def test_cms_estimates_exact_without_collisions(spark):
    rows = [(1, "alpha alpha beta"), (2, "alpha gamma")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    est = {
        r.term: r.est_count
        for r in SK.cms_token_counts(
            df, ["alpha", "beta", "missing"]
        ).collect()
    }
    # 3 distinct tokens into 4x1024 cells: collision-free, so the
    # upper-bound estimate IS the exact count; absent key -> 0
    assert est == {"alpha": 3, "beta": 1, "missing": 0}


def test_cms_never_underestimates_and_state_is_bounded(spark):
    from mtail_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    sketch = SK.cms_build(toks)
    assert sketch.count() <= SK.DEPTH * SK.WIDTH
    terms = ["spark", "merge", "window", "zz_absent_term"]
    truth = {
        r.term: r.n
        for r in toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("term").isin(terms)).collect()
    }
    est = {
        r.term: r.est_count
        for r in SK.cms_estimate(sketch, terms).collect()
    }
    for t in terms:
        assert est[t] >= truth.get(t, 0)
    assert est["zz_absent_term"] >= 0


def test_cms_python_bucket_matches_spark(spark):
    df = spark.createDataFrame([("hello",)], ["term"])
    for i in range(SK.DEPTH):
        got = df.select(
            SK._bucket_col(F.col("term"), i, SK.WIDTH).alias("b")
        ).collect()[0].b
        assert got == SK.bucket_py("hello", i, SK.WIDTH)


def test_hll_estimate_within_expected_error(spark):
    # 5000 distinct keys; m=256 registers -> ~6.5% standard error.
    # The whole pipeline is deterministic, so this is a fixed number,
    # not a flaky statistical assertion.
    df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(5000)], ["term"]
    )
    r = SK.hll_estimate(SK.hll_registers(df)).collect()[0]
    assert r.n_regs <= SK.HLL_BUCKETS
    assert abs(r.est_distinct - 5000) / 5000 < 0.2
    # duplicates must not move the registers at all
    dup = spark.createDataFrame(
        [(f"key-{i % 5000}",) for i in range(15000)], ["term"]
    )
    r2 = SK.hll_estimate(SK.hll_registers(dup)).collect()[0]
    assert (r2.n_regs, r2.sum_scaled, r2.est_distinct) == (
        r.n_regs, r.sum_scaled, r.est_distinct
    )


def test_hll_registers_bounded_and_capped(spark):
    df = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["term"])
    regs = SK.hll_registers(df).collect()
    assert len(regs) <= SK.HLL_BUCKETS
    assert all(1 <= r.reg <= SK.HLL_CAP for r in regs)


def test_substring_search_matches_like_scan(spark):
    import mtail_spark.operators.search as SR
    from mtail_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    needle = "merge batch"
    got = {
        r.doc_id: (r.n_hits, r.first_pos)
        for r in SR.substring_search(docs, needle).collect()
    }
    want = {
        r.doc_id: (r.n, r.p)
        for r in docs.filter(
            F.col("text").contains(needle)
        ).select(
            "doc_id",
            F.size(
                F.regexp_extract_all("text", F.lit(needle), 0)
            ).cast("long").alias("n"),
            F.locate(needle, F.col("text")).cast("long").alias("p"),
        ).collect()
    }
    assert got == want and len(got) > 0


def test_hybrid_search_reranks_keyword_candidates(spark):
    import __spark_entry__ as E

    out = E.q_hybrid_search(spark, "/root/testdata/sf0.01").collect()
    assert 0 < len(out) <= 10
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    # ranks follow the hybrid score, ties by id
    hm = [(r.hybrid_micro, -r.doc_id) for r in out]
    assert hm == sorted(hm, reverse=True)
    # every hit is a genuine keyword candidate (bm25 > 0 for >= 1 term)
    assert all(r.score >= 0 for r in out)


# ----------------------------------------------------------- rate anomaly


def _events(spark, counts_per_hour):
    """counts_per_hour: list of event counts for consecutive hours."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, n in enumerate(counts_per_hour):
        for j in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=j), "x")
            )
            eid += 1
    return spark.createDataFrame(rows, ["event_id", "ts", "event_type"])


def test_rate_anomalies_flags_spike_only(spark):
    # 10 steady hours at ~100 (tiny jitter so variance > 0), then 200
    steady = [100, 101, 99, 100, 101, 99, 100, 101, 99, 100]
    ev = _events(spark, steady + [200])
    out = {
        r.widx: r
        for r in TS.rate_anomalies(
            ev, "ts", "event_type", 3600, 24, 3
        ).collect()
    }
    ws = sorted(out)
    spike = out[ws[-1]]
    assert spike.n_events == 200 and spike.is_anomaly
    assert all(not out[w].is_anomaly for w in ws[:-1])
    # first min_windows hours have too little history: z is NULL
    assert out[ws[0]].z_micro is None and out[ws[1]].z_micro is None
    assert out[ws[-1]].n_prev == 10


def test_rate_anomalies_zero_variance_never_flags(spark):
    ev = _events(spark, [50] * 6 + [80])
    rows = TS.rate_anomalies(ev, "ts", "event_type", 3600, 24, 3).collect()
    # constant history -> variance 0 -> z undefined -> never anomalous,
    # even for the 80 spike (documented conservative choice)
    assert all(r.z_micro is None for r in rows)
    assert all(not r.is_anomaly for r in rows)


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    import mtail_spark.operators.sketch as SK

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(200)], ["key"]
    )
    bits = SK.bloom_build(keys, "key", m=1024, k=3)
    n_bits = bits.count()
    assert n_bits <= 1024  # state bounded by m, not cardinality
    # every inserted key MUST probe positive (no false negatives)
    flags = SK.bloom_probe(bits, keys, "key", m=1024, k=3).collect()
    assert len(flags) == 200 and all(r.bloom_hit for r in flags)
    # a disjoint probe set is mostly negative (m is sized so the FP
    # rate is a few percent; assert well under half positive)
    others = spark.createDataFrame(
        [(f"other-{i}",) for i in range(200)], ["key"]
    )
    fps = sum(
        r.bloom_hit
        for r in SK.bloom_probe(bits, others, "key", m=1024, k=3).collect()
    )
    assert fps < 100


def test_bloom_build_merge_is_distinct_union(spark):
    import mtail_spark.operators.sketch as SK

    a = spark.createDataFrame([("x",), ("y",)], ["key"])
    b = spark.createDataFrame([("y",), ("z",)], ["key"])
    both = spark.createDataFrame([("x",), ("y",), ("z",)], ["key"])
    merged = sorted(
        r.bit
        for r in SK.bloom_build(a, "key")
        .unionByName(SK.bloom_build(b, "key"))
        .distinct()
        .collect()
    )
    direct = sorted(r.bit for r in SK.bloom_build(both, "key").collect())
    assert merged == direct  # OR-merge == build-on-union


def test_bloom_no_false_negatives_property(spark):
    """Hypothesis-style property (deterministic seeds): for random key
    sets and filter sizings, every inserted key probes positive."""
    import random

    import mtail_spark.operators.sketch as SK

    rnd = random.Random(77)
    for m, k in [(256, 2), (512, 3), (2048, 5)]:
        keys = list(
            {f"k{rnd.randrange(10**9)}" for _ in range(rnd.randrange(5, 60))}
        )
        df = spark.createDataFrame([(x,) for x in keys], ["key"])
        bits = SK.bloom_build(df, "key", m=m, k=k)
        flags = SK.bloom_probe(bits, df, "key", m=m, k=k).collect()
        assert len(flags) == len(keys)
        assert all(r.bloom_hit for r in flags), (m, k)


def test_bloom_probe_tolerates_duplicate_probe_rows(spark):
    import mtail_spark.operators.sketch as SK

    keys = spark.createDataFrame([("a",), ("b",)], ["key"])
    bits = SK.bloom_build(keys, "key", m=256, k=3)
    # the same (id, key) row twice: a true member must still hit
    probes = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "zz")], ["doc_id", "key"]
    )
    out = {r.doc_id: r.bloom_hit
           for r in SK.bloom_probe(bits, probes, "key", m=256, k=3).collect()}
    assert out[1] is True


def test_hll_grouped_matches_global_per_subset(spark):
    """hll_registers_by/estimate_by must equal the PROVEN global
    kernel run independently on each group's key subset."""
    import mtail_spark.operators.sketch as SK

    rows = [("g1", f"k{i % 37}") for i in range(300)] + [
        ("g2", f"k{i % 211}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["grp", "term"])
    grouped = {
        r["grp"]: (r["n_regs"], r["sum_scaled"], r["est_distinct"])
        for r in SK.hll_estimate_by(
            SK.hll_registers_by(df, "grp"), "grp"
        ).collect()
    }
    for g in ("g1", "g2"):
        sub = df.filter(df.grp == g).select("term")
        glob = SK.hll_estimate(SK.hll_registers(sub)).collect()[0]
        assert grouped[g] == (
            glob["n_regs"], glob["sum_scaled"], glob["est_distinct"]
        ), g


def test_cms_grouped_matches_global_per_subset(spark):
    """cms_build_by/estimate_by must equal the PROVEN global kernel
    run independently on each group's key subset."""
    import mtail_spark.operators.sketch as SK

    rows = [("g1", f"k{i % 7}") for i in range(100)] + [
        ("g2", f"k{i % 13}") for i in range(160)
    ]
    df = spark.createDataFrame(rows, ["grp", "term"])
    terms = ["k0", "k5", "k12", "zz_absent"]
    grouped = {
        (r["grp"], r["term"]): r["est_count"]
        for r in SK.cms_estimate_by(
            SK.cms_build_by(df, "grp"), "grp", terms
        ).collect()
    }
    for g in ("g1", "g2"):
        sub = df.filter(df.grp == g).select("term")
        glob = {
            r["term"]: r["est_count"]
            for r in SK.cms_estimate(SK.cms_build(sub), terms).collect()
        }
        for t in terms:
            assert grouped[(g, t)] == glob[t], (g, t)


# --------------------------------------------------- quantile sketch (HDR)


def test_hdr_bucket_sql_matches_python_mirror(spark):
    """The portable SQL bucket/value formulas must equal the
    driver-side mirrors over exact-region, octave-boundary, and
    wide values — including the negative clamp."""
    vals = (
        list(range(0, 130))
        + [2**k + d for k in range(5, 62) for d in (-1, 0, 1)]
        + [-5, -1, 10**12, (1 << 62) - 1]
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = df.selectExpr(
        "v",
        SK.hdr_bucket_sql("v") + " AS idx",
        SK.hdr_value_sql(SK.hdr_bucket_sql("v")) + " AS lo",
    ).collect()
    for r in got:
        assert r["idx"] == SK.hdr_bucket_py(r["v"]), r["v"]
        assert r["lo"] == SK.hdr_value_py(r["idx"]), r["v"]
        if r["v"] >= 0:
            # lower bound <= v, and relative error <= 2^-SUB_BITS
            assert r["lo"] <= r["v"]
            assert r["v"] - r["lo"] <= max(r["lo"] >> SK.HDR_SUB_BITS, 0)
        else:
            assert r["idx"] == 0  # clamp


def test_hdr_bucket_exact_and_monotone():
    s = SK.HDR_SUB_BITS
    # exact region: idx == v below 2^(s+1)
    for v in range(1 << (s + 1)):
        assert SK.hdr_bucket_py(v) == v
    # monotone over a dense range spanning several octaves
    prev = -1
    for v in range(0, 1 << (s + 4)):
        idx = SK.hdr_bucket_py(v)
        assert idx >= prev
        prev = idx


def test_hdr_merge_order_independence(spark):
    """Cells are ADD-mergeable: sketching the union equals cellwise
    addition of per-shard sketches (the property that makes the
    streaming dual batch-boundary-proof)."""
    a = spark.createDataFrame([(v % 97,) for v in range(500)], "v long")
    b = spark.createDataFrame([(v * 13 % 401,) for v in range(400)], "v long")
    whole = {
        (r["idx"]): r["c"] for r in SK.hdr_cells(a.union(b)).collect()
    }
    merged: dict = {}
    for shard in (a, b):
        for r in SK.hdr_cells(shard).collect():
            merged[r["idx"]] = merged.get(r["idx"], 0) + r["c"]
    assert whole == merged


def test_hdr_union_quantiles_from_merged_cells(spark):
    """quantile_sketch_merge's claim end-to-end: estimating over the
    ADD-merged per-shard cell tables equals estimating over cells of
    the whole input — union percentiles from stored shard sketches,
    no rescan.  (Per-shard estimates alone could never reconstruct
    the union's; only mergeable CELL state can.)"""
    import pyspark.sql.functions as F

    a = spark.createDataFrame([(v * 11 % 997,) for v in range(600)],
                              "v long")
    b = spark.createDataFrame([(v * v % 4093,) for v in range(350)],
                              "v long")
    merged = (
        SK.hdr_cells(a).unionByName(SK.hdr_cells(b))
        .groupBy("idx")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    got = SK.hdr_quantiles(merged, [50, 90, 99]).orderBy("q").collect()
    want = (
        SK.hdr_quantiles(SK.hdr_cells(a.union(b)), [50, 90, 99])
        .orderBy("q")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hdr_grouped_equals_global_per_subset(spark):
    """hdr_cells/hdr_quantiles with a group column must equal the
    global kernel run on each subset (the HLL/CMS discipline)."""
    rows = [("a", v * 7 % 1009) for v in range(300)] + [
        ("b", v * v % 5003) for v in range(200)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    grouped = {
        (r["grp"], r["q"]): (r["est_value"], r["n_rows"])
        for r in SK.hdr_quantiles(
            SK.hdr_cells(df, ["grp"]), [50, 90, 99], ["grp"]
        ).collect()
    }
    for g in ("a", "b"):
        sub = df.filter(F.col("grp") == g)
        for r in SK.hdr_quantiles(SK.hdr_cells(sub), [50, 90, 99]).collect():
            assert grouped[(g, r["q"])] == (r["est_value"], r["n_rows"]), g


def test_hdr_quantiles_known_values(spark):
    """Type-1 selection over 1..100: p50 sits in the exact region
    (== 50); p90/p99 land on their bucket lower bounds, computed
    independently with the python mirror."""
    df = spark.createDataFrame([(v,) for v in range(1, 101)], "v long")
    got = {
        r["q"]: (r["est_value"], r["n_rows"])
        for r in SK.hdr_quantiles(SK.hdr_cells(df), [50, 90, 99]).collect()
    }
    vals = sorted(range(1, 101))
    for q in (50, 90, 99):
        rank = (len(vals) * q + 99) // 100
        expect = SK.hdr_value_py(SK.hdr_bucket_py(vals[rank - 1]))
        assert got[q] == (expect, 100), q
    assert got[50][0] == 50  # exact region


def test_hdr_state_is_bounded(spark):
    # 50k distinct values over the full int64 range -> bucket count
    # stays under the documented ~1950 ceiling
    df = spark.range(50000).selectExpr("id * 184467440737095 AS v")
    n = SK.hdr_cells(df).count()
    assert n <= (64 - SK.HDR_SUB_BITS) * (1 << SK.HDR_SUB_BITS) + (
        1 << (SK.HDR_SUB_BITS + 1)
    )


def test_hll_register_union_is_max_merge(spark):
    """Sketch algebra: max-merging two shards' register tables must
    equal the registers of the concatenated input — the property
    q_hll_set_algebra builds on (and why stored per-shard registers
    can answer union cardinalities without rescanning)."""
    a = spark.createDataFrame(
        [(f"k{i}",) for i in range(400)], "key string"
    )
    b = spark.createDataFrame(
        [(f"k{i}",) for i in range(200, 700)], "key string"
    )
    ra = SK.hll_registers(a, "key")
    rb = SK.hll_registers(b, "key")
    merged = {
        r["bucket"]: r["reg"]
        for r in ra.unionByName(rb)
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .collect()
    }
    whole = {
        r["bucket"]: r["reg"]
        for r in SK.hll_registers(a.union(b), "key").collect()
    }
    assert merged == whole
    # and the union estimate sits in the HLL error band around the
    # true union cardinality (700 distinct keys, ~6.5% std error)
    est = SK.hll_estimate(
        ra.unionByName(rb).groupBy("bucket").agg(
            F.max("reg").cast("long").alias("reg")
        )
    ).collect()[0]["est_distinct"]
    assert abs(est - 700) < 700 * 0.25


def test_cms_inner_product_never_underestimates_join_size(spark):
    """Join-size estimation: est = min-row dot product never
    under-counts the true equi-join cardinality and stays within the
    collision-mass band at this scale."""
    a = spark.createDataFrame(
        [(str(k),) for k in range(1, 101)], "term string"
    )
    b = spark.createDataFrame(
        [(str(k),) for k in range(50, 151) for _ in (0, 1)], "term string"
    )
    true = 51 * 2  # keys 50..100 from A, each twice in B
    est = SK.cms_inner_product(SK.cms_build(a), SK.cms_build(b)).collect()[
        0
    ]["est_join_size"]
    assert est >= true
    assert est <= true + 200  # ~100x202/1024 expected collision mass/row


def test_cms_inner_product_counts_absent_rows_as_zero(spark):
    """A hash row with NO colliding cells must contribute dot 0 (the
    row-domain left join); an inner-join-only min would skip it and
    overestimate.  Construct cell tables that collide in row 0 only."""
    sa = spark.createDataFrame(
        [(0, 7, 5), (1, 3, 4)], "row int, bucket long, c long"
    )
    sb = spark.createDataFrame(
        [(0, 7, 2), (1, 9, 6)], "row int, bucket long, c long"
    )
    est = SK.cms_inner_product(sa, sb, depth=4).collect()[0][
        "est_join_size"
    ]
    # rows 1 (disjoint buckets), 2 and 3 (no cells at all) all dot 0
    assert est == 0


def test_two_term_permille_scaling_is_exact():
    """skew_key_profile's overflow-safe x1000 scaling identity:
    (f2 DIV n)*1000 + (f2 % n)*1000 DIV n == floor(f2*1000/n),
    exactly, for any magnitudes (python ints are unbounded, so the
    right side is the ground truth the int64 engines cannot compute
    directly past f2 ~ 9e15)."""
    cases = [
        (7, 3),
        (1, 1),
        (999, 1000),
        (10**18, 10**9),
        (2**62, 3),
        (10**18 + 7, 999_999_937),
    ]
    for f2, n in cases:
        two_term = (f2 // n) * 1000 + (f2 % n) * 1000 // n
        assert two_term == f2 * 1000 // n, (f2, n)


def test_hll_grouped_multi_column_matches_global_per_subset(spark):
    """hll_registers_by/estimate_by with a LIST of group columns (the
    windowed form) must equal the proven global kernel on each
    (col1, col2) subset — the same discipline as the single-column
    grouped pin."""
    rows = [
        (d, t, f"u{(i % 37) * (1 + d)}-{t}")
        for d in (0, 1)
        for t in ("a", "b")
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "day int, typ string, uid string")
    grouped = {
        (r["day"], r["typ"]): (r["est_distinct"], r["n_regs"])
        for r in SK.hll_estimate_by(
            SK.hll_registers_by(df, ["day", "typ"], key_col="uid"),
            ["day", "typ"],
        ).collect()
    }
    assert len(grouped) == 4
    for d in (0, 1):
        for t in ("a", "b"):
            sub = df.filter((F.col("day") == d) & (F.col("typ") == t))
            g = SK.hll_estimate(SK.hll_registers(sub, "uid")).collect()[0]
            assert grouped[(d, t)] == (g["est_distinct"], g["n_regs"]), (d, t)
