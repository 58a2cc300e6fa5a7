"""Socket log sources (reference internal/tailer/logstream/
socketstream.go:27-156 — TCP/unix stream listeners feeding the line
channel).

Spark's socket source connects as a client and frames lines the same
way the text source does.  The streaming frame carries (filename,
line); the per-batch ordering key is assigned inside foreachBatch
(monotonically_increasing_id is not allowed at streaming plan time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_socket_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Streaming (filename, line) relation from a TCP text socket.
    The filename column carries the endpoint (feeds getfilename())."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(
        F.lit(f"socket://{host}:{port}").alias("filename"),
        F.regexp_replace(F.col("value"), "\r$", "").alias("line"),
    )


def run_program_socket_stream(
    prog,
    spark: SparkSession,
    host: str,
    port: int,
    store=None,
    trigger: dict | None = None,
):
    """Run a compiled program over a socket line stream, merging each
    micro-batch into a serving StreamingMetricStore."""
    from mtail_spark.streaming.pipeline import StreamingMetricStore

    store = store or StreamingMetricStore(prog)

    def on_batch(batch_df: DataFrame, batch_id: int):
        lines = batch_df.withColumn(
            "line_no", F.monotonically_increasing_id()
        ).select("filename", "line_no", "line")
        store.merge_batch(prog.run_batch(spark, lines).collect())

    writer = read_socket_lines(spark, host, port).writeStream.foreachBatch(
        on_batch
    )
    if trigger:
        writer = writer.trigger(**trigger)
    query = writer.start()
    return store, query
