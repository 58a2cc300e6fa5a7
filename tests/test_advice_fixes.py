"""Round-2 semantics fixes (ADVICE.md r1): runtime-error-kills-line
for div/mod-by-zero and failed numeric coercions, polymorphic
numeric-string compares, deterministic multi-file last-write-wins,
--syslog_use_current_year, TTL GC in the stateful runner, and
Prometheus label escaping.

Reference semantics: vm.go:686-694 (integer div/mod by zero ->
errorf), vm.go:131-150 (PopInt strict ParseInt), vm.go:639-663 (float
ops are IEEE, never error), vm.go:309-332 (yearless syslog patch),
store.go:156-203 (expiry/limit GC).
"""

import pytest

from mtail_spark.compiler.api import compile_program
from mtail_spark.compiler.gotime import epoch_us_year
from mtail_spark.store import diff_stores, rows_from_df

US = 1_000_000


def _lines_df(spark, rows):
    """rows: list of (filename, line_no, line)."""
    return spark.createDataFrame(
        rows, "filename string, line_no long, line string"
    )


def _both(spark, src, name, rows, now_us=0, use_year=False):
    prog = compile_program(src, name, syslog_use_current_year=use_year)
    assert prog.vectorizable
    df = _lines_df(spark, rows)
    vec = rows_from_df(prog.run_batch(spark, df, backend="vector", now_us=now_us))
    fold = rows_from_df(prog.run_batch(spark, df, backend="fold", now_us=now_us))
    d = diff_stores(fold, vec)
    assert d.ok, f"{name}: backends disagree\n" + d.render()
    return {(r.name, r.labels): r for r in vec}


def test_int_div_by_zero_kills_rest_of_line(spark):
    src = """
counter hits
counter post
/seen (?P<n>\\d+)/ {
  hits++
  $n / 0 >= 0 {
    post++
  }
  post++
}
"""
    rows = [("a.log", 0, "seen 3"), ("a.log", 1, "seen 4")]
    vals = _both(spark, src, "divzero.mtail", rows)
    assert vals[("hits", ())].value == 2
    # the divide-by-zero kills everything after it on the line
    assert vals[("post", ())].value == 0


def test_int_mod_by_zero_kills_rest_of_line(spark):
    src = """
counter hits
counter post
/seen (?P<n>\\d+)/ {
  hits++
  $n % 0 == 0 {
    post++
  }
}
"""
    rows = [("a.log", 0, "seen 8")]
    vals = _both(spark, src, "modzero.mtail", rows)
    assert vals[("hits", ())].value == 1
    assert vals[("post", ())].value == 0


def test_float_div_by_zero_is_inf_not_error(spark):
    src = """
gauge ratio
counter post
/val (?P<n>\\d+\\.\\d+)/ {
  ratio = $n / 0.0
  post++
}
"""
    rows = [("a.log", 0, "val 3.5")]
    vals = _both(spark, src, "fdivzero.mtail", rows)
    assert vals[("ratio", ())].value == float("inf")
    # float division by zero is NOT a runtime error (Go IEEE semantics)
    assert vals[("post", ())].value == 1


def test_unparseable_numeric_coercion_kills_line(spark):
    src = """
counter ok
counter bad
/n (?P<s>[0-9.]+)/ {
  ok++
  int($s) >= 0 {
    bad++
  }
}
"""
    rows = [("a.log", 0, "n 3.5"), ("a.log", 1, "n ..")]
    vals = _both(spark, src, "coerce.mtail", rows)
    assert vals[("ok", ())].value == 2
    # "3.5" converts (3 >= 0 fires); ".." is a runtime error
    assert vals[("bad", ())].value == 1


def test_numeric_string_compare_is_numeric(spark):
    src = """
counter lt
/pair (?P<a>\\w+) (?P<b>\\w+)/ {
  $a < $b {
    lt++
  }
}
"""
    rows = [
        ("a.log", 0, "pair 9 10"),   # numeric: 9 < 10 true (string false)
        ("a.log", 1, "pair 10 9"),   # numeric: false
        ("a.log", 2, "pair b a"),    # string compare: false
        ("a.log", 3, "pair a b"),    # string compare: true
    ]
    vals = _both(spark, src, "polycmp.mtail", rows)
    assert vals[("lt", ())].value == 2


def test_multifile_lww_matches_fold_merge(spark):
    src = """
gauge last_code
/(?P<d>\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}) code (?P<c>\\d+)/ {
  strptime($d, "2006-01-02T15:04:05")
  last_code = $c
}
"""
    rows = [
        ("f1.log", 0, "2024-01-01T10:00:00 code 1"),
        ("f1.log", 1, "2024-01-01T12:00:00 code 2"),
        ("f2.log", 0, "2024-01-01T13:00:00 code 3"),
        # last write in f2 has an EARLIER stamp than f1's last write:
        # per-file winner is chosen by processing order, cross-file by
        # (ts, filename) — so code 2 must win deterministically.
        ("f2.log", 1, "2024-01-01T11:00:00 code 4"),
    ]
    vals = _both(spark, src, "lww.mtail", rows)
    assert vals[("last_code", ())].value == 2


def test_syslog_use_current_year(spark):
    src = """
gauge last_seen
/^(?P<date>\\w+\\s+\\d+\\s+\\d+:\\d+:\\d+)/ {
  strptime($date, "Jan _2 15:04:05")
  last_seen = timestamp()
}
"""
    now_us = 1_767_225_600 * US  # 2026-01-01T00:00:00Z
    rows = [("a.log", 0, "Apr  7 13:43:00 host proc: hello")]
    vals = _both(spark, src, "sylyear.mtail", rows, now_us=now_us,
                 use_year=True)
    ts = vals[("last_seen", ())].value
    assert epoch_us_year(ts * US) == 2026
    # and without the flag the year defaults to 0
    vals0 = _both(spark, src, "syl0.mtail", rows, now_us=now_us)
    assert vals0[("last_seen", ())].value < 0


def test_stateful_runner_ttl_gc():
    from mtail_spark.streaming.stateful import DriverStatefulRunner

    src = """
hidden gauge seen by ip
counter total by ip
/ip (?P<ip>\\S+)/ {
  settime(100)
  seen[$ip] = 1
  total[$ip]++
  del seen[$ip] after 1s
}
"""
    prog = compile_program(src, "ttl.mtail")
    runner = DriverStatefulRunner(prog)
    runner.process([("s1", "ip 10.0.0.1"), ("s1", "ip 10.0.0.2")])
    store = runner.streams["s1"].store
    assert len(store.data["seen"]) == 2
    removed = runner.gc(now_us=(100 + 5) * US)
    assert removed == 2
    assert len(store.data["seen"]) == 0
    # non-TTL'd metrics survive
    assert len(store.data["total"]) == 2


def test_streaming_store_gc_uses_exported_names():
    from mtail_spark.streaming.pipeline import StreamingMetricStore

    src = """
counter conns as "exported_conns" by ip
/ip (?P<ip>\\S+)/ {
  conns[$ip]++
  del conns[$ip] after 1s
}
"""
    prog = compile_program(src, "exp.mtail")
    store = StreamingMetricStore(prog)
    store.merge_batch([
        {"prog": "exp.mtail", "name": "exported_conns", "kind": "counter",
         "vtype": "Int", "labels": {"ip": "10.0.0.1"}, "value_i": 3,
         "value_f": None, "value_s": None, "buckets": None,
         "bucket_count": None, "bucket_sum": None, "ts_us": 100 * US},
    ])
    removed = store.gc(now_us=(100 + 5) * US)
    assert removed == 1


def test_prometheus_label_escaping():
    from mtail_spark.exporters.formats import to_prometheus

    rows = [{
        "prog": "p.mtail", "name": "m", "kind": "counter", "vtype": "Int",
        "labels": {"path": 'a"b\\c\nd'}, "value_i": 1, "value_f": None,
        "value_s": None, "buckets": None, "bucket_count": None,
        "bucket_sum": None, "ts_us": None,
    }]
    out = to_prometheus(rows, omit_prog_label=True)
    assert 'path="a\\"b\\\\c\\nd"' in out
    assert "\nd" not in out.replace("\\nd", "")  # no raw newline leaked


def test_float_mod_matches_go(spark):
    # Go math.Mod keeps the dividend's sign: 5.5 % -2.0 == 1.5
    src = """
gauge m
/val (?P<n>\\d+\\.\\d+)/ {
  m = $n % -2.0
}
"""
    rows = [("a.log", 0, "val 5.5")]
    vals = _both(spark, src, "fmod.mtail", rows)
    assert vals[("m", ())].value == 1.5


def test_chunked_fold_state_across_arrow_batches(spark):
    """The fold backend must carry interpreter state across Arrow
    chunk boundaries of the same file (executor-side chunked fold),
    and stay correct with multiple files in one partition."""
    from mtail_spark.store import diff_stores, rows_from_df

    src = """
hidden gauge last_v by k
gauge delta by k
counter n by k
/^v k=(?P<k>\\w+) n=(?P<n>\\d+)$/ {
  delta[$k] = $n - last_v[$k]
  last_v[$k] = $n
  n[$k]++
}
"""
    prog = compile_program(src, "chunk.mtail")
    # (this register program vectorizes too — the explicit
    # backend="fold" below is what exercises the chunked fold)
    rows = []
    for f in ("a.log", "b.log"):
        for i in range(2500):
            rows.append((f, i, f"v k=u{i % 3} n={i}"))
    df = spark.createDataFrame(
        rows, "filename string, line_no long, line string"
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "200")
    try:
        got = rows_from_df(prog.run_batch(spark, df, backend="fold"))
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    # reference: pure-python fold per file, merged like the engine does
    want = {}
    for f in ("a.log", "b.log"):
        lines = [ln for (fn, _, ln) in rows if fn == f]
        for r in prog.run_local(lines, filename=f):
            # merge: counters add; gauges LWW by (ts, filename) — ts is
            # None here so the later filename wins
            key = (r.name, r.labels)
            if r.kind == "counter" and key in want:
                import dataclasses

                prev = want[key]
                want[key] = dataclasses.replace(
                    prev, value=prev.value + r.value
                )
            else:
                want[key] = r
    got_m = {(r.name, r.labels): r for r in got}
    assert set(got_m) == set(want)
    for k in want:
        assert got_m[k].value == want[k].value, (k, got_m[k], want[k])


def test_register_window_vectorization(spark):
    """Cross-line hidden-register programs (rsyncd shape) vectorize:
    set/read/del carried by a window, backends agree on interleaved
    set -> read -> del -> read-after-del -> re-set sequences."""
    src = """
hidden gauge start by pid
counter total_time
counter sessions_seen
/start (?P<pid>\\d+) at (?P<t>\\d+)/ {
  start[$pid] = $t
}
/end (?P<pid>\\d+) at (?P<t>\\d+)/ {
  total_time += $t - start[$pid]
  sessions_seen++
  del start[$pid]
}
"""
    rows = [
        ("a.log", 0, "start 1 at 100"),
        ("a.log", 1, "start 2 at 110"),
        ("a.log", 2, "end 1 at 130"),     # 30
        ("a.log", 3, "end 2 at 150"),     # 40
        ("a.log", 4, "end 1 at 160"),     # deleted -> reads 0 -> +160
        ("a.log", 5, "start 1 at 200"),
        ("a.log", 6, "end 1 at 230"),     # 30
    ]
    vals = _both(spark, src, "regwin.mtail", rows)
    assert vals[("total_time", ())].value == 30 + 40 + 160 + 30
    assert vals[("sessions_seen", ())].value == 4


def test_scalar_text_register(spark):
    """vsftpd-shape scalar text register: value persists across lines
    until overwritten; used as a counter label."""
    src = """
hidden text mode
counter transfers by mode
/mode (?P<m>\\w+)/ {
  mode = $m
}
/xfer/ {
  transfers[mode]++
}
"""
    rows = [
        ("a.log", 0, "xfer"),          # mode == "" (zero-init)
        ("a.log", 1, "mode up"),
        ("a.log", 2, "xfer"),
        ("a.log", 3, "xfer"),
        ("a.log", 4, "mode down"),
        ("a.log", 5, "xfer"),
    ]
    prog = compile_program(src, "scalarreg.mtail")
    assert prog.vectorizable
    vals = _both(spark, src, "scalarreg.mtail", rows)
    assert vals[("transfers", (("mode", "up"),))].value == 2
    assert vals[("transfers", (("mode", "down"),))].value == 1
    assert vals[("transfers", (("mode", ""),))].value == 1
