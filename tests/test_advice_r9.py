"""Regression tests for the round-8 ADVICE findings fixed in round 9."""

import os
import socket
import tempfile

import pytest
from pyspark.sql import functions as F

import mtail_spark.operators.analytics as AN
import mtail_spark.operators.timeseries as TS
from mtail_spark.exporters.http import MetricsServer


# ---- http.py: unix-socket bind must not delete non-socket files ----


def test_unix_socket_refuses_regular_file():
    path = os.path.join(
        tempfile.gettempdir(), f"mtail_notasock_{os.getpid()}"
    )
    with open(path, "w") as fh:
        fh.write("precious data")
    try:
        with pytest.raises(OSError, match="non-socket"):
            MetricsServer(lambda: [], unix_socket=path).start()
        # the file survived the refused bind
        with open(path) as fh:
            assert fh.read() == "precious data"
    finally:
        os.unlink(path)


def test_unix_socket_still_replaces_stale_socket():
    path = os.path.join(
        tempfile.gettempdir(), f"mtail_stale9_{os.getpid()}.sock"
    )
    s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    s.bind(path)
    s.close()
    srv = MetricsServer(lambda: [], unix_socket=path).start()
    try:
        assert os.path.exists(path)
    finally:
        srv.stop()


# ---- analytics.funnel: stage subplans must execute once, not O(n^2)


def test_funnel_plan_scans_events_once_per_stage(spark):
    rows = [(i, "u%d" % (i % 3), "signup", i * 1000) for i in range(9)]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "v"]
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1_000_000))
    stages = ["signup", "view", "purchase", "refer"]
    out = AN.funnel(ev, stages)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the old shape unioned one .agg() per stage, embedding chain 0..i
    # in counts[i]: the stage-0 subtree appeared ~2*stages times.  The
    # linear chain references each stage's event subset exactly once.
    n_scans = plan.count("LogicalRDD")
    assert n_scans == len(stages), plan


def test_funnel_results_unchanged_by_restructure(spark):
    # hand case exercising conversion, drop-off, and same-ts progress
    rows = [
        (1, 1, "signup", 100),
        (2, 1, "view", 100),     # same-ts progression counts (>=)
        (3, 1, "purchase", 150),
        (4, 2, "signup", 200),
        (5, 2, "view", 190),     # view BEFORE signup: no progress
        (6, 3, "view", 50),      # no signup: never enters funnel
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "sec"]
    ).withColumn("ts", F.timestamp_micros(F.col("sec") * 1_000_000))
    got = {
        r.stage_idx: (r.n_users, r.conv_permille)
        for r in AN.funnel(ev, ["signup", "view", "purchase"]).collect()
    }
    assert got == {0: (2, 1000), 1: (1, 500), 2: (1, 500)}


# ---- timeseries.asof_join: non-integral build id fails loudly -----


def test_asof_join_rejects_non_integral_build_id(spark):
    probe = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:01")], ["event_id", "user_id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    build = spark.createDataFrame(
        [("a", 1, "2024-01-01 00:00:00", 1.0)],
        ["event_id", "user_id", "ts", "value"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(AssertionError, match="must be integral"):
        TS.asof_join(probe, build)


# ---- fuzz generator: planted pair stays inside the 1..119 range ---


def test_fuzz_planted_pair_in_documented_user_range(tmp_path):
    import sys

    import pandas as pd

    sys.path.insert(0, "/root/repo/tools")
    import fuzz_parity as FZ

    for seed in range(1, 12):
        out = tmp_path / f"s{seed}"
        FZ.gen_tables(seed, str(out))
        users = pd.read_parquet(out / "events.parquet")["user_id"].tolist()
        assert all(1 <= u <= 119 for u in users)
        assert users[1] != users[0]
