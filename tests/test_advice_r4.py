"""Round-4 advisor + verdict fixes (ADVICE.md r3, VERDICT.md r3):

- remote-FS-safe reader auto-routing (VERDICT "what's wrong" 1):
  a non-local URI must never take the wholetext path unless the
  Hadoop FS API proves every file is small.
- compile_program cache keyed on override_timezone (ADVICE r3 #5).
- serve-mode flag threading (ADVICE r3 #1): the reload compile
  callback used by `python -m mtail_spark --logs` serve mode must
  carry override_timezone and the limit flags.
- --ignore_filename_regex_pattern applied in streaming mode
  (ADVICE r3 #2).
- fmt float rendering is shortest-roundtrip (ADVICE r3 #4).
"""

import os
import time

import pytest

from mtail_spark.compiler.api import compile_program


# ---------------------------------------------------------- reader routing


def test_remote_uri_routes_splittable(spark, tmp_path):
    """An s3a:// glob (no connector jars in this env -> sizes
    unknowable) must route to the splittable reader, never wholetext
    (sources/logs.py; reference: a 100 GB remote log must not
    materialize as one row)."""
    from mtail_spark.sources.logs import _auto_exact_order

    assert _auto_exact_order(spark, "s3a://bucket/logs/*.log") is False
    # mixed local+remote list also goes through the Hadoop path
    assert (
        _auto_exact_order(
            spark, ["s3a://bucket/a.log", "s3a://bucket/b.log"]
        )
        is False
    )


def test_local_small_file_still_wholetext(spark, tmp_path):
    from mtail_spark.sources.logs import _auto_exact_order

    p = tmp_path / "small.log"
    p.write_text("a\nb\n")
    assert _auto_exact_order(spark, str(p)) is True
    # file:// scheme counts as local and stats correctly
    assert _auto_exact_order(spark, "file://" + str(p)) is True


def test_local_huge_file_routes_splittable(spark, tmp_path):
    from mtail_spark.sources.logs import _auto_exact_order

    p = tmp_path / "huge.log"
    p.write_text("x\n")
    assert _auto_exact_order(spark, str(p), threshold=1) is False


def test_hadoop_sizing_on_local_fs(spark, tmp_path):
    """The Hadoop FS path itself works (exercised here via the local
    fs, which ships with Spark): sizes are knowable, so a small file
    is allowed the wholetext route even through the remote code
    path."""
    from mtail_spark.sources.logs import _hadoop_any_huge

    p = tmp_path / "sized.log"
    p.write_text("line\n" * 10)
    assert _hadoop_any_huge(spark, "file://" + str(p), 1 << 20) is False
    assert _hadoop_any_huge(spark, "file://" + str(p), 1) is True


# ---------------------------------------------------------- compile cache


def test_compile_cache_keyed_on_override_timezone():
    src = "counter c\n/a/ { c++ }\n"
    a = compile_program(src, "tzkey.mtail")
    b = compile_program(src, "tzkey.mtail",
                        override_timezone="America/New_York")
    c = compile_program(src, "tzkey.mtail")
    assert a is not b
    assert a.override_timezone is None
    assert b.override_timezone == "America/New_York"
    assert c is a  # default-tz compile is untouched by b


# ---------------------------------------------------------- serve threading


def test_serve_compile_callback_threads_flags(tmp_path, monkeypatch):
    """ADVICE r3 #1: serve mode's ProgramSet compile callback must
    carry override_timezone + limit flags.  Drive main() far enough
    to build the callback by stubbing the streaming starters."""
    import mtail_spark.__main__ as cli

    progs = tmp_path / "progs"
    progs.mkdir()
    (progs / "p.mtail").write_text("counter c\n/a/ { c++ }\n")
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "x.log").write_text("a\n")

    captured = {}

    class FakePset:
        def __init__(self, compile_fn, start_fn):
            captured["compile"] = compile_fn
            captured["start"] = start_fn

        def scan(self, d):
            return 0

        def watch(self, d, interval=1.0):
            return self

        def rows(self):
            return []

        def any_active(self):
            return False  # main loop exits immediately

        def stop(self):
            pass

    class FakeSrv:
        port = 0

        def start(self):
            return self

        def stop(self):
            pass

    class FakePush:
        def __init__(self, *a, **k):
            pass

        def start(self):
            return self

        def stop(self, final_push=False):
            pass

    import mtail_spark.exporters as exporters
    import mtail_spark.exporters.push as push
    import mtail_spark.streaming.reload as reload_mod

    monkeypatch.setattr(reload_mod, "ProgramSet", FakePset)
    monkeypatch.setattr(exporters, "MetricsServer",
                        lambda *a, **k: FakeSrv())
    monkeypatch.setattr(push, "PushScheduler", FakePush)

    rc = cli.main([
        "--progs", str(progs), "--logs", str(logs / "*.log"),
        "--override_timezone", "America/New_York",
        "--max_regexp_length", "2048",
        "--progs_poll_interval", "0",
    ])
    assert rc == 0
    prog = captured["compile"]("counter z\n/b/ { z++ }\n", "z.mtail")
    assert prog.override_timezone == "America/New_York"
    # limit flags actually enforced through the same callback
    import pytest as _pytest

    with _pytest.raises(Exception):
        captured["compile"](
            "counter y\n/" + "a" * 3000 + "/ { y++ }\n", "y.mtail"
        )


# --------------------------------------------------- streaming ignore filter


def test_stream_ignore_filename_regex(spark, tmp_path):
    from mtail_spark.streaming import run_program_stream

    logdir = tmp_path / "logs"
    logdir.mkdir()
    (logdir / "app.log").write_text("hit\nhit\n")
    (logdir / "app.log.gz2").write_text("hit\n")  # basename matches ignore

    prog = compile_program("counter hits\n/hit/ { hits++ }\n", "ig.mtail")
    store, q = run_program_stream(
        prog, spark, str(logdir),
        trigger={"availableNow": True},
        ignore_basename_regex=r"\.gz2$",
    )
    q.awaitTermination(60)
    vals = {(r["name"]): r["value_i"] for r in store.rows()}
    assert vals["hits"] == 2  # only app.log counted


# ----------------------------------------------------------- fmt roundtrip


def test_fmt_preserves_long_floats():
    from mtail_spark.compiler.unparse import format_source

    src = (
        "histogram h buckets 0.123456789, 1.5e-07, 2.0\n"
        "counter c\n"
        "/x/ {\n  c += 9\n}\n"
    )
    out = format_source(src)
    assert "0.123456789" in out
    assert format_source(out) == out  # idempotent
    # value-level roundtrip: reparse and compare bucket floats exactly
    from mtail_spark.compiler import ast as A
    from mtail_spark.compiler.parser import parse

    def buckets(s):
        for st in parse(s).stmts:
            if isinstance(st, A.VarDecl) and st.buckets:
                return st.buckets

    assert buckets(out) == buckets(src) == [0.123456789, 1.5e-07, 2.0]
