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
