"""Hot program reload (reference internal/runtime/runtime.go:310-332):
editing a *.mtail file while serving swaps in the recompiled program
without restarting the process; compile errors keep the old program."""

import time

from mtail_spark.compiler.api import compile_program
from mtail_spark.streaming import run_program_stream
from mtail_spark.streaming.reload import ProgramSet

PROG_V1 = """
counter lines_total
/./ { lines_total++ }
"""

PROG_V2 = """
counter lines_total
counter chars_total
/(?P<l>.+)/ {
  lines_total++
  chars_total += len($l)
}
"""

PROG_BROKEN = """
counter lines_total
/(/ { lines_total++ }
"""


def _wait(pred, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.5)
    return False


def _metric_names(pset):
    return {r["name"] for r in pset.rows()}


def test_reload_swaps_program_and_keeps_old_on_error(spark, tmp_path):
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("hello\nworld\n")
    progs = tmp_path / "progs"
    progs.mkdir()
    pfile = progs / "p.mtail"
    pfile.write_text(PROG_V1)

    def start(prog):
        return run_program_stream(
            prog, spark, str(logs),
            trigger={"processingTime": "1 seconds"},
        )

    pset = ProgramSet(compile_program, start)
    try:
        assert pset.scan(str(progs)) == 1
        assert _wait(
            lambda: any(
                r["name"] == "lines_total" and r["value_i"] == 2
                for r in pset.rows()
            )
        ), pset.rows()
        assert "chars_total" not in _metric_names(pset)

        # edit the program mid-stream: next scan swaps the query and
        # the new metric appears, recomputed over the same log glob
        pfile.write_text(PROG_V2)
        assert pset.scan(str(progs)) == 1
        gen = pset.generation
        assert _wait(
            lambda: any(
                r["name"] == "chars_total" and r["value_i"] == 10
                for r in pset.rows()
            )
        ), pset.rows()

        # a broken edit is rejected; the v2 program keeps serving
        pfile.write_text(PROG_BROKEN)
        assert pset.scan(str(progs)) == 0
        assert pset.generation == gen
        assert "chars_total" in _metric_names(pset)
        assert pset.any_active()

        # unchanged content is a no-op scan
        pfile.write_text(PROG_V2)
        assert pset.scan(str(progs)) == 0

        # watcher thread picks up an edit without an explicit scan
        pset.watch(str(progs), interval=0.5)
        pfile.write_text(PROG_V1)
        assert _wait(lambda: "chars_total" not in _metric_names(pset)), (
            _metric_names(pset)
        )
    finally:
        pset.stop()
    assert not pset.any_active()
