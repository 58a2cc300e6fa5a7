"""Regression tests for the round-6 ADVICE findings.

1. rt.fired (the chunkfold salvage scratch list) must not accumulate
   across lines in the fold backend or the serve-mode stateful folder
   — a daemon on any register program would otherwise grow one entry
   per register write until OOM.
2. Spool-backed streaming sources must order lines by spool SEGMENT
   sequence, not Spark partition id: micro-batch file bin-packing is
   size-descending, so a later (larger) segment can land in an
   earlier partition and stale gauge writes would win last-write-wins.
3. ppm thresholds round rate*1e6 instead of flooring float error.
"""

import time
import types

import pytest

from mtail_spark.compiler.api import compile_program

REG_PROG = (
    "hidden gauge tmp\n"
    "counter hits\n"
    "/x (\\d+)/ {\n  tmp = $1\n  hits++\n}\n"
)


def test_fold_fired_bounded():
    from mtail_spark.compiler.interp import Interp

    prog = compile_program(REG_PROG, "leak.mtail")
    it = Interp(prog.checked, prog.syslog_use_current_year)
    rt = it.new_runtime(now_us=0)
    it.feed(rt, [(i, f"x {i}") for i in range(5000)])
    # one register write per line; fired holds at most the last line's
    assert len(rt.fired) <= 1
    assert rt.store.get("hits", ()) == 5000


def test_stateful_folder_fired_bounded():
    from mtail_spark.streaming.stateful import DriverStatefulRunner

    prog = compile_program(REG_PROG, "leak2.mtail")
    runner = DriverStatefulRunner(prog)
    runner.process(("s.log", f"x {i}") for i in range(5000))
    rt = next(iter(runner.streams.values()))
    assert len(rt.fired) <= 1


def _gauge_prog():
    return compile_program(
        "gauge g\n/val (\\d+)/ {\n  g = $1\n}\n", "lww.mtail"
    )


def _mk_segments(spool_path):
    """spool-00000000 tiny (old write), spool-00000001 large (new
    write): size-descending bin-packing scans the LATER segment in the
    EARLIER partition, so any partition-ordered numbering resurrects
    the stale value."""
    from mtail_spark.sources.spool import SpoolDir

    sd = SpoolDir(str(spool_path))
    sd.add_lines(["val 1"])
    sd.flush()
    sd.add_lines([f"pad {i}" for i in range(20000)] + ["val 2"])
    sd.flush()
    return sd


def _gauge_value(rows):
    for r in rows:
        if r.get("name") == "g":
            return r.get("value_i")
    return None


def _wait(fn, want, timeout=30.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if fn() == want:
            return True
        time.sleep(0.2)
    return False


def test_spool_segment_order_vectorized(spark, tmp_path):
    from mtail_spark.sources.spool import spool_lines_stream
    from mtail_spark.streaming import run_program_stream

    sd = _mk_segments(tmp_path / "sp")
    fake = types.SimpleNamespace(spool=sd, sourcename="fifo://t")
    store, query = run_program_stream(
        _gauge_prog(), spark, None,
        trigger={"processingTime": "200 milliseconds"},
        source=spool_lines_stream(spark, fake),
    )
    try:
        assert _wait(lambda: _gauge_value(store.rows()), 2), (
            f"stale segment won LWW: g={_gauge_value(store.rows())}"
        )
    finally:
        query.stop()


def test_spool_segment_order_stateful(spark, tmp_path):
    from mtail_spark.sources.spool import spool_lines_stream
    from mtail_spark.streaming.stateful import run_stateful_stream

    sd = _mk_segments(tmp_path / "sp2")
    fake = types.SimpleNamespace(spool=sd, sourcename="fifo://t2")
    runner, query = run_stateful_stream(
        _gauge_prog(), spark, spool_lines_stream(spark, fake),
        trigger={"processingTime": "200 milliseconds"},
    )
    try:
        assert _wait(lambda: _gauge_value(runner.rows()), 2), (
            f"stale segment won fold order: g={_gauge_value(runner.rows())}"
        )
    finally:
        query.stop()


def test_ppm_thresholds_round():
    from mtail_spark.operators import sampling

    # 0.7 * 1e6 floats to 699999.9999...; int() would drop a ppm
    import pyspark.sql.functions as F  # noqa: F401

    assert int(round(0.7 * sampling.BUCKETS)) == 700000
    # hash_sample embeds the threshold as a literal in the plan
    class _Probe:
        def __init__(self):
            self.col = None

        def filter(self, c):
            self.col = c
            return self

    p = _Probe()
    sampling.hash_sample(p, 0.7, "doc_id")
    assert "700000" in str(p.col)


def test_serve_shutdown_stops_tailer():
    """__main__ serve finally-block must call tailer.stop() so the
    final unterminated line is flushed (reference reader.go Finish)."""
    import inspect

    import mtail_spark.__main__ as m

    src = inspect.getsource(m.main)
    assert "tailer.stop()" in src
