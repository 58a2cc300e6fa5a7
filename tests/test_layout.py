"""Z-order layout keys (mtail_spark/operators/layout.py)."""

import pytest
from pyspark.sql import functions as F

from mtail_spark.operators.layout import interleave_bits, interleave_sql, zorder_key


def test_interleave_hand_computed(spark):
    # x=5 (101), y=3 (011), 3 bits: x owns even positions, y odd ->
    # z bits 0..5 = x0,y0,x1,y1,x2,y2 = 1,1,0,1,1,0 -> 0b011011 = 27
    df = spark.range(1).select(
        F.lit(5).cast("long").alias("x"), F.lit(3).cast("long").alias("y")
    )
    z = df.select(
        interleave_bits([F.col("x"), F.col("y")], 3).alias("z")
    ).collect()[0]["z"]
    assert z == 27


def test_interleave_sql_matches_column_form(spark):
    # the SQL string the oracle uses must compute the same key Spark's
    # Column form does, over a grid of small values
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x",
        "y",
        interleave_bits([F.col("x"), F.col("y")], 3).alias("z_col"),
        F.expr(interleave_sql(["x", "y"], 3)).alias("z_sql"),
    ).collect()
    for r in got:
        assert r["z_col"] == r["z_sql"], (r["x"], r["y"])


def test_zorder_key_basic(spark):
    rows = [(i, i % 10, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    out = zorder_key(df, ["a", "b"], bits=8, n_buckets=16).collect()
    assert len(out) == 200
    for r in out:
        assert 0 <= r["zkey"] < (1 << 16)
        assert 0 <= r["zbucket"] < 16
    # locality: equal (a, b) pairs always share a key
    seen = {}
    for r in out:
        k = (r["a"], r["b"])
        assert seen.setdefault(k, r["zkey"]) == r["zkey"]


def test_zorder_wide_envelope_no_overflow(spark):
    # epoch-micros-scale spans: multiply-first normalization would
    # overflow int64 under ANSI mode; divide-first must not
    rows = [(0, -100_000_000_000_000), (1, 1_700_000_000_000_000)]
    df = spark.createDataFrame(rows, "id long, t long")
    out = (
        zorder_key(
            df.withColumn("u", F.col("id")), ["u", "t"], bits=16, n_buckets=64
        )
        .orderBy("id")
        .collect()
    )
    assert out[0]["zkey"] >= 0 and out[1]["zkey"] >= 0
    # min maps to rank 0; max lands strictly above (ceiling divisor)
    assert out[0]["zkey"] < out[1]["zkey"]


def test_zorder_constant_column(spark):
    # span 0 -> every rank 0 on that dimension; no divide-by-zero
    df = spark.createDataFrame([(i, 7, i) for i in range(10)], "id long, a long, b long")
    out = zorder_key(df, ["a", "b"], bits=4, n_buckets=4).collect()
    assert len(out) == 10
    # dimension 0 (constant) ranks 0 everywhere, so it contributes no
    # bits: every even position (0b01010101 for D=2, bits=4) stays 0
    assert all(r["zkey"] & 0x55 == 0 for r in out)


def test_zorder_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, f double")
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="overflows"):
        zorder_key(df, ["a", "a"], bits=32)
    with pytest.raises(ValueError, match="must be integral"):
        zorder_key(df, ["a", "f"])


def test_zorder_plan_is_shuffle_free(spark):
    # one 1-row envelope aggregate broadcast back; the per-row key is
    # pure codegen — the corpus itself must never hit an exchange
    import io
    import contextlib

    df = spark.createDataFrame([(i, i, i * 3) for i in range(50)], "id long, a long, b long")
    out = zorder_key(df, ["a", "b"], bits=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the only join is the broadcast of the 1-row envelope
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rank_sql_bounds_and_monotonicity_property(spark):
    """Property: for ANY envelope (including negative mins and
    epoch-micros-wide spans) the rank stays in [0, top], maps min->0,
    is monotone in v, and never overflows under ANSI mode."""
    from hypothesis import given, settings, strategies as st

    from mtail_spark.operators.layout import rank_sql

    # bounds chosen so hi = lo + span stays inside int64 even at the
    # extremes hypothesis probes first: |lo| <= 2^61, span <= 2^61
    LONG = 2**61

    @settings(max_examples=40, deadline=None)
    @given(
        lo=st.integers(min_value=-LONG, max_value=LONG),
        span=st.integers(min_value=0, max_value=LONG),
        bits=st.sampled_from([4, 8, 16]),
        data=st.data(),
    )
    def check(lo, span, bits, data):
        hi = lo + span
        v1 = data.draw(st.integers(min_value=lo, max_value=hi))
        v2 = data.draw(st.integers(min_value=lo, max_value=hi))
        top = (1 << bits) - 1
        df = spark.createDataFrame(
            [(v1, v2, lo, hi)], "v1 long, v2 long, vmin long, vmax long"
        )
        r = df.selectExpr(
            rank_sql("v1", "vmin", "vmax", bits, "DIV") + " AS r1",
            rank_sql("v2", "vmin", "vmax", bits, "DIV") + " AS r2",
            rank_sql("vmin", "vmin", "vmax", bits, "DIV") + " AS rmin",
        ).collect()[0]
        assert 0 <= r["r1"] <= top and 0 <= r["r2"] <= top
        assert r["rmin"] == 0
        if v1 <= v2:
            assert r["r1"] <= r["r2"]
        else:
            assert r["r2"] <= r["r1"]

    check()


def test_rank_sql_near_multiple_span_quantizes_uniformly(spark):
    """Regression (r9 ADVICE): with span just under a multiple of top
    (span ~ 1.9x top), the old LEAST-clamped divide collapsed almost
    half the domain onto the max rank.  The ceiling divisor must keep
    every rank's preimage within 1 of the ideal bucket width."""
    from collections import Counter

    from mtail_spark.operators.layout import rank_sql

    bits = 4
    top = (1 << bits) - 1  # 15
    span = 2 * top - 2  # 28 ~ 1.9x top, the worst case for the clamp
    df = spark.createDataFrame(
        [(v, 0, span) for v in range(span + 1)], "v long, vmin long, vmax long"
    )
    ranks = [
        r["r"]
        for r in df.selectExpr(
            rank_sql("v", "vmin", "vmax", bits, "DIV") + " AS r"
        ).collect()
    ]
    widths = Counter(ranks)
    assert min(ranks) == 0 and max(ranks) <= top
    # divisor = (28 DIV 15) + 1 = 2 -> every rank covers exactly 2
    # values except the last partial bucket; the clamped form put 14
    # of the 29 values on rank 15
    assert max(widths.values()) <= 2


def test_zorder_full_width_keys_no_bucket_overflow(spark):
    """Regression: bits*ndim = 62 with power-of-two n_buckets used to
    overflow in the bucket multiply (zkey * 64 > 2^63); the divide
    form must handle full-width keys."""
    df = spark.createDataFrame(
        [(0, 0), (2**61, 2**61)], "a long, b long"
    )
    out = (
        zorder_key(df, ["a", "b"], bits=31, n_buckets=64)
        .orderBy("a")
        .collect()
    )
    assert out[0]["zbucket"] == 0
    assert 0 <= out[1]["zbucket"] < 64


def test_zorder_rejects_overflowing_non_pow2_buckets(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    # 31*2 = 62 key bits + 6 more for *63 would pass 63 only via the
    # divide form; 63 is not a divisor of 2^62, so this must raise
    with _pytest.raises(ValueError, match="overflows a long"):
        zorder_key(df, ["a", "b"], bits=31, n_buckets=63)
    # but a small non-pow2 bucket count within headroom is fine
    out = zorder_key(df, ["a", "b"], bits=8, n_buckets=10).collect()
    assert len(out) == 1


def test_zorder_write_prune_end_to_end(spark, sf_smoke, tmp_path):
    """Close the loop between zorder_skipping_stats' SIMULATED
    envelopes and a real layout write (r9 VERDICT item 3): write the
    z-ordered frame to parquet with one file per zbucket, read the
    ACTUAL per-file min/max from the parquet FOOTERS (pyarrow
    row-group statistics — the exact metadata a scan pruner consults),
    assert they equal the per-bucket envelopes the query predicts,
    then prune on the footers alone and reproduce the query's skip
    accounting against the on-disk files.

    Drives layout.write_zordered — the user-facing OPTIMIZE ZORDER BY
    write path (hash-repartition on zbucket + partitionBy so
    bucket <-> file is exactly 1:1; its docstring explains why not
    repartitionByRange) — and also asserts the within-file zkey sort
    survived the writer."""
    import glob
    import os

    import pyarrow.parquet as pq

    import __spark_entry__ as entry
    from mtail_spark.operators.layout import write_zordered

    ev = entry._t(spark, sf_smoke, "events").select(
        "event_id",
        F.col("user_id").cast("long").alias("uid"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    z = zorder_key(
        ev,
        ["uid", "ts_us"],
        bits=entry.ZORDER_BITS,
        n_buckets=entry.ZORDER_BUCKETS,
    )
    out = str(tmp_path / "zlayout")
    write_zordered(
        ev,
        out,
        ["uid", "ts_us"],
        bits=entry.ZORDER_BITS,
        n_buckets=entry.ZORDER_BUCKETS,
        keep_key_cols=True,
    )

    # ---- real footer statistics, one file per bucket --------------------
    disk = {}
    for path in glob.glob(os.path.join(out, "zbucket=*", "*.parquet")):
        bucket = int(path.split("zbucket=")[1].split(os.sep)[0])
        assert bucket not in disk, "bucket split across files"
        pf = pq.ParquetFile(path)
        md = pf.metadata
        uid_i = md.schema.names.index("uid")
        mins, maxs, n = [], [], 0
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(uid_i).statistics
            mins.append(st.min)
            maxs.append(st.max)
            n += md.row_group(rg).num_rows
        disk[bucket] = (min(mins), max(maxs), n)
        # the within-file zkey sort survived the writer
        zkeys = pf.read(columns=["zkey"]).column("zkey").to_pylist()
        assert zkeys == sorted(zkeys), f"zkey order lost in {path}"

    # ---- the simulated envelopes (what the query predicts) --------------
    pred = {
        r["zbucket"]: (r["uid_min"], r["uid_max"], r["n_rows"])
        for r in z.groupBy("zbucket")
        .agg(
            F.min("uid").alias("uid_min"),
            F.max("uid").alias("uid_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert disk == pred

    # ---- prune on footers alone, scan survivors, reproduce the query ----
    lo, hi = entry._ZSKIP_LO, entry._ZSKIP_HI
    scanned = {b for b, (mn, mx, _) in disk.items() if mn <= hi and mx >= lo}
    rows_scanned = sum(disk[b][2] for b in scanned)
    survivors = spark.read.parquet(out).filter(F.col("zbucket").isin(scanned))
    rows_matching = survivors.filter(
        (F.col("uid") >= lo) & (F.col("uid") <= hi)
    ).count()

    stats = entry.queries()["zorder_skipping_stats"](spark, sf_smoke).collect()[0]
    assert stats["n_buckets"] == len(disk)
    assert stats["n_scanned"] == len(scanned)
    assert stats["rows_scanned"] == rows_scanned
    assert stats["rows_total"] == sum(v[2] for v in disk.values())
    # envelopes are TRUE min/max, so pruning loses no matches: the
    # survivor-only scan finds every matching row the query counted
    assert stats["rows_matching"] == rows_matching


def test_zorder_pinned_envelope_incremental(spark):
    """Pinned envelopes (the incremental-layout API): keys equal the
    data-derived ones when the envelope matches the data exactly,
    stay CONSISTENT across increments (the whole point — a re-derived
    envelope re-ranks), clamp out-of-range values into the edge
    buckets, and drop even the 1-row aggregate from the plan."""
    import io
    import contextlib

    rows = [(i, i % 50, i * 7 % 1000) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    env = {"a": (0, 49), "b": (0, 999)}  # == the data envelope

    derived = {
        r["id"]: (r["zkey"], r["zbucket"])
        for r in zorder_key(df, ["a", "b"], bits=8, n_buckets=16).collect()
    }
    pinned = {
        r["id"]: (r["zkey"], r["zbucket"])
        for r in zorder_key(
            df, ["a", "b"], bits=8, n_buckets=16, envelope=env
        ).collect()
    }
    assert pinned == derived

    # incremental consistency: a NARROW second batch ranks its rows
    # identically under the pinned envelope (a data-derived envelope
    # would re-stretch and disagree)
    half = spark.createDataFrame(rows[:60], "id long, a long, b long")
    inc = {
        r["id"]: (r["zkey"], r["zbucket"])
        for r in zorder_key(
            half, ["a", "b"], bits=8, n_buckets=16, envelope=env
        ).collect()
    }
    assert all(inc[i] == pinned[i] for i in inc)

    # out-of-range values clamp to the edge ranks, never error
    oob = spark.createDataFrame([(0, -5, 2000)], "id long, a long, b long")
    r = zorder_key(
        oob, ["a", "b"], bits=8, n_buckets=16, envelope=env
    ).collect()[0]
    lo = zorder_key(
        spark.createDataFrame([(0, 0, 999)], "id long, a long, b long"),
        ["a", "b"], bits=8, n_buckets=16, envelope=env,
    ).collect()[0]
    assert (r["zkey"], r["zbucket"]) == (lo["zkey"], lo["zbucket"])

    # plan: no join, no aggregate — pure codegen over the scan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        zorder_key(df, ["a", "b"], bits=8, envelope=env).explain("formatted")
    plan = buf.getvalue()
    for node in ("Join", "Exchange", "HashAggregate"):
        assert node not in plan, node

    # bad envelopes fail loudly
    with pytest.raises(ValueError, match="envelope missing"):
        zorder_key(df, ["a", "b"], envelope={"a": (0, 49)})
    with pytest.raises(ValueError, match="bad envelope"):
        zorder_key(df, ["a", "b"], envelope={"a": (49, 0), "b": (0, 999)})
