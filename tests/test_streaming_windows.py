"""Native Structured Streaming extensions (absent in the reference,
SURVEY.md §2.6): event-time tumbling windows with watermarks over a
log-line stream feeding a compiled-program-style extraction."""

from pyspark.sql import functions as F


def test_tumbling_window_with_watermark(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text(
        "2024-01-01T00:01:00 GET /a\n"
        "2024-01-01T00:02:30 GET /b\n"
        "2024-01-01T00:07:10 POST /c\n"
        "2024-01-01T00:08:20 GET /d\n"
    )
    stream = spark.readStream.format("text").load(str(logs))
    parsed = stream.select(
        F.to_timestamp(
            F.regexp_extract("value", r"^(\S+) ", 1),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("ts"),
        F.regexp_extract("value", r"^\S+ (\w+)", 1).alias("verb"),
    )
    agg = (
        parsed.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "verb")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    results = []
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: results.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window"]["start"].minute, r["verb"]): r["n"] for r in results
    }
    assert got[(0, "GET")] == 2
    assert got[(5, "POST")] == 1
    assert got[(5, "GET")] == 1


def test_windows_module_sliding_stream(spark, tmp_path):
    from mtail_spark.streaming.windows import windowed_agg

    logs = tmp_path / "logs2"
    logs.mkdir()
    (logs / "a.log").write_text(
        "2024-01-01T00:01:00 GET /a\n"
        "2024-01-01T00:04:00 GET /b\n"
        "2024-01-01T00:09:00 POST /c\n"
    )
    stream = spark.readStream.format("text").load(str(logs))
    parsed = stream.select(
        F.to_timestamp(
            F.regexp_extract("value", r"^(\S+) ", 1),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("ts"),
        F.regexp_extract("value", r"^\S+ (\w+)", 1).alias("verb"),
    )
    agg = windowed_agg(
        parsed, "ts", "10 minutes", slide="5 minutes",
        keys=["verb"], watermark="15 minutes",
    )
    results = []
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: results.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute, r["verb"]): r["n"] for r in results
    }
    # sliding 10m/5m: GETs at :01 and :04 land in windows [55,05) and
    # [00,10); the POST at :09 in [00,10) and [05,15)
    assert got[(0, "GET")] == 2
    assert got[(55, "GET")] == 2
    assert got[(0, "POST")] == 1
    assert got[(5, "POST")] == 1


def test_windows_module_session_stream(spark, tmp_path):
    from mtail_spark.streaming.windows import session_windowed_agg

    logs = tmp_path / "logs3"
    logs.mkdir()
    (logs / "a.log").write_text(
        "2024-01-01T00:01:00 u1\n"
        "2024-01-01T00:02:00 u1\n"
        "2024-01-01T01:00:00 u1\n"
    )
    stream = spark.readStream.format("text").load(str(logs))
    parsed = stream.select(
        F.to_timestamp(
            F.regexp_extract("value", r"^(\S+) ", 1),
            "yyyy-MM-dd'T'HH:mm:ss",
        ).alias("ts"),
        F.regexp_extract("value", r"^\S+ (\w+)", 1).alias("user"),
    )
    agg = session_windowed_agg(
        parsed, "ts", "30 minutes", keys=["user"],
        watermark="1 second",
    )
    results = []
    # session windows require APPEND mode: only sessions the watermark
    # has sealed are emitted.  Watermark reaches 00:59:59, so the
    # merged [00:01, 00:32) session is final; the 01:00 session's
    # state is still open and correctly withheld.
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: results.extend(df.collect()))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    q.awaitTermination(120)
    sess = sorted(
        (r["session_start"].minute, r["n"]) for r in results
    )
    assert sess == [(1, 2)]


def test_parquet_replay_equals_batch(spark):
    """stream_table + run_replay_to_table: a finite parquet replay
    through the native session operator must equal the batch plan
    row-for-row (the same guarantee the parity gate checks via the
    DuckDB oracle for session_window_stream)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = sorted(
        map(tuple, entry.q_session_window_stream(spark, sf).collect())
    )
    want = sorted(
        map(tuple, entry.q_session_window_native(spark, sf).collect())
    )
    assert got == want and len(got) > 0


def test_incremental_dedup_stream_equals_batch(spark, tmp_path):
    """The streaming delta dedup must produce exactly the batch
    operator's pairs (the per-row HOF signatures are bit-identical to
    the explode+groupBy form, and the band/verify joins are the same
    construction)."""
    import mtail_spark.operators.dedup as D
    from mtail_spark.streaming.windows import run_replay_append

    rows = []
    for i in range(30):
        base_text = f"shared text block number {i % 7} with filler words"
        rows.append((i, base_text if i % 4 else base_text + " extra"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    path = str(tmp_path / "docs.parquet")
    df.write.parquet(path)

    static = spark.read.parquet(path)
    new_b = static.filter(F.col("doc_id") % 3 == 0)
    base = static.filter(F.col("doc_id") % 3 != 0)
    batch = {
        (r.new_id, r.base_id, r.jaccard)
        for r in D.incremental_minhash_dups(
            new_b, base, "doc_id", "text"
        ).collect()
    }

    stream = (
        spark.readStream.schema(static.schema)
        .parquet(path[:-1] + "[" + path[-1] + "]")
        .filter(F.col("doc_id") % 3 == 0)
    )
    out = D.incremental_minhash_dups_stream(stream, base, "doc_id", "text")
    tbl = run_replay_append(out, "incdedup_test").dropDuplicates(
        ["new_id", "base_id"]
    )
    streamed = {(r.new_id, r.base_id, r.jaccard) for r in tbl.collect()}
    assert streamed == batch and len(batch) > 0


def test_session_window_exact_gap_boundary_merges(spark):
    """Spark's native session_window MERGES an event arriving exactly
    `gap` after the previous one (touching ranges merge) — pinned
    because the oracle must use a strict > for new sessions (found by
    fuzz_parity seed 8; the lag-based sessionize family deliberately
    keeps >= and its own oracle)."""
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:30:00"),   # exactly 30 min later -> merges
        (1, "2024-01-01 11:00:01"),   # 30 min + 1 s -> new session
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
        "user_id", F.col("ts_str").cast("timestamp").alias("ts")
    )
    out = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("w.start")
        .collect()
    )
    assert [r.n for r in out] == [2, 1]
