"""Regression tests for the round-7 ADVICE findings."""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

import mtail_spark.operators.multimodal as M
import mtail_spark.operators.timeseries as TS


def test_sample_frames_skips_empty_payload(spark):
    # ADVICE r7 low: a row with duration set but payload == b'' used to
    # hit `payload[... % ln]` with ln == 0 -> ZeroDivisionError inside
    # the mapInPandas worker, failing the whole task.
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )
    media = spark.createDataFrame(
        [
            (1, b"", 900),          # empty payload, has duration
            (2, None, 900),         # NULL payload, has duration
            (3, b"\x10\x20\x30", 500),  # normal video row
        ],
        schema,
    )
    rows = M.sample_frames(media, every_ms=250, feat_dim=2).collect()
    assert sorted({r.media_id for r in rows}) == [3]
    assert [(r.frame_idx, r.t_ms) for r in rows] == [(0, 0), (1, 250), (2, 500)]


def test_window_counts_floor_aligns_negative_epochs(spark):
    # ADVICE r7 low: batch widx used truncating DIV while the streaming
    # dual uses F.window() (floor-aligned window starts); a pre-1970
    # event must land in the same window both ways.
    ev = spark.createDataFrame(
        [("a", "1969-12-31 23:30:00"), ("a", "1970-01-01 00:30:00")],
        ["event_type", "ts_str"],
    ).select("event_type", F.col("ts_str").cast("timestamp").alias("ts"))

    batch = {
        (r.key, r.widx): r.window_start_us
        for r in TS.window_counts(ev, "ts", "event_type", 3600).collect()
    }
    # F.window floor-aligns: -1800s -> window starting at -3600s
    stream_like = {
        (r.key, r.widx): r.window_start_us
        for r in ev.groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"),
            F.col("event_type").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "key",
            F.expr(
                "CAST(unix_micros(w.start) DIV 3600000000 AS BIGINT)"
            ).alias("widx"),
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
        )
        .collect()
    }
    assert batch == stream_like
    assert ("a", -1) in batch and batch[("a", -1)] == -3600 * 1_000_000


def test_srcgen_variants_have_isolated_namespaces():
    # ADVICE r7 low: all four generated functions used to exec into one
    # shared namespace; per-generator C1..Cn constants could collide if
    # fast/non-fast generation ever emit const() in different order.
    from mtail_spark.compiler.checker import check
    from mtail_spark.compiler.interp import Interp

    prog = check(
        r"""
counter lines by kind
/(?P<k>\w+) (?P<v>\d+)/ {
  lines[subst("x", "y", $k)]++
}
""",
        "iso.mtail",
    )
    it = Interp(prog, False)
    fns = [
        f
        for f in (it.program, it.chunk_program, it.fast_program,
                  it.fast_chunk_program)
        if f is not None and hasattr(f, "__mtail_src__")
    ]
    assert len(fns) >= 2
    namespaces = [id(f.__globals__) for f in fns]
    assert len(set(namespaces)) == len(namespaces), (
        "srcgen variants share a globals dict; per-generator constants "
        "can collide"
    )
