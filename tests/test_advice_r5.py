"""Round-5 advisor fixes (ADVICE.md r4):

- run_batch plan cache keyed on the input FILE LISTING, not just the
  scan's root-path semantic hash: appended/added files must invalidate.
- cache keys use a GC-safe session token, not id(spark).
- the plan cache's maxPartitionBytes re-application follows the
  documented single-tuner invariant: each program re-applies ITS OWN
  tuned value on every run_batch (build or hit), so interleaved
  programs never inherit each other's split sizing when the action
  follows its run_batch.
- file:// URIs with a non-empty authority are not treated as local
  paths (the authority used to be silently dropped, stat-ing a
  relative path).
"""

import os

from mtail_spark.compiler.api import compile_program

PROG = """
counter lines_total
// {
  lines_total++
}
"""


def _store_count(spark, prog, df):
    out = prog.run_batch(spark, df)
    row = [r for r in out.collect() if r.name == "lines_total"][0]
    return row.value_i


# ------------------------------------------------------- plan cache identity


def test_plan_cache_invalidated_by_new_file(spark, tmp_path):
    """ADVICE r4 #1: a directory scan re-run after a new file lands
    must see the new data, not the cached listing."""
    from mtail_spark.sources.logs import read_log_lines

    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text("one\ntwo\n")
    prog = compile_program(PROG, "cachetest.mtail")
    assert _store_count(spark, prog, read_log_lines(spark, str(d))) == 2

    (d / "b.log").write_text("three\n")
    assert _store_count(spark, prog, read_log_lines(spark, str(d))) == 3


def test_plan_cache_invalidated_by_append(spark, tmp_path):
    """Appending to an existing file changes the (size, mtime)
    fingerprint even though the listing's paths are unchanged."""
    from mtail_spark.sources.logs import read_log_lines

    p = tmp_path / "grow.log"
    p.write_text("one\n")
    prog = compile_program(PROG, "cachetest2.mtail")
    assert _store_count(spark, prog, read_log_lines(spark, str(p))) == 1

    with open(p, "a") as f:
        f.write("two\nthree\n")
    assert _store_count(spark, prog, read_log_lines(spark, str(p))) == 3


def test_plan_cache_still_hits_on_same_relation(spark, tmp_path):
    """Unchanged inputs must still return the memoized DataFrame
    object (the r4 speedup this cache exists for)."""
    from mtail_spark.sources.logs import read_log_lines

    p = tmp_path / "stable.log"
    p.write_text("x\ny\n")
    prog = compile_program(PROG, "cachetest3.mtail")
    df = read_log_lines(spark, str(p))
    out1 = prog.run_batch(spark, df)
    out2 = prog.run_batch(spark, df)
    assert out1 is out2


def test_session_token_stable_and_unique(spark):
    from mtail_spark.session import session_token

    t1 = session_token(spark)
    assert session_token(spark) == t1
    other = spark.newSession()
    try:
        assert session_token(other) != t1
    finally:
        pass  # shares the SparkContext; nothing to stop


# -------------------------------------------------- split-sizing re-application


def test_interleaved_programs_keep_their_own_split_sizing(spark, tmp_path):
    """VERDICT r4 'what's wrong' 2: two programs tuned to different
    maxPartitionBytes must each re-apply THEIR value on every
    run_batch call (build or cache hit), so the documented
    run-then-act pattern never executes a plan under the other
    program's split sizing."""
    from mtail_spark.sources.logs import read_log_lines

    _MPB = "spark.sql.files.maxPartitionBytes"
    orig = spark.conf.get(_MPB)
    pa = tmp_path / "a.log"
    pb = tmp_path / "b.log"
    pa.write_text("a\n" * 10)
    pb.write_text("b\n" * 10)
    prog_a = compile_program(PROG, "mpb_a.mtail")
    prog_b = compile_program(PROG, "mpb_b.mtail")
    try:
        spark.conf.set(_MPB, str(1 << 20))
        dfa = read_log_lines(spark, str(pa))
        out_a = prog_a.run_batch(spark, dfa)
        spark.conf.set(_MPB, str(4 << 20))
        dfb = read_log_lines(spark, str(pb))
        out_b = prog_b.run_batch(spark, dfb)
        assert spark.conf.get(_MPB) == str(4 << 20)

        # cache hits re-apply each program's own captured value
        hit_a = prog_a.run_batch(spark, dfa)
        assert hit_a is out_a
        assert spark.conf.get(_MPB) == str(1 << 20)
        hit_b = prog_b.run_batch(spark, dfb)
        assert hit_b is out_b
        assert spark.conf.get(_MPB) == str(4 << 20)
        # and the plans still execute correctly under their sizing
        assert len(hit_a.collect()) == 1
    finally:
        spark.conf.set(_MPB, orig)


# ------------------------------------------------------- file:// authority


def test_file_uri_authority_not_local():
    from mtail_spark.sources.logs import _is_local, _strip_file_scheme

    assert _is_local("/tmp/x.log")
    assert _is_local("file:///tmp/x.log")
    assert not _is_local("file://somehost/tmp/x.log")
    assert not _is_local("hdfs://nn/logs/x.log")
    # empty-authority form strips; authority form passes through intact
    assert _strip_file_scheme("file:///tmp/x.log") == "/tmp/x.log"
    assert (
        _strip_file_scheme("file://somehost/tmp/x.log")
        == "file://somehost/tmp/x.log"
    )


def test_file_uri_authority_routes_via_hadoop(spark, tmp_path, monkeypatch):
    """A file:// URI with an authority must be sized via the Hadoop FS
    API (like hdfs://), never by stat-ing the stripped relative path
    (which silently 'succeeds' as not-found -> wholetext)."""
    from mtail_spark.sources import logs

    p = tmp_path / "big.log"
    p.write_text("x" * 4096)
    monkeypatch.setattr(logs, "WHOLETEXT_MAX_BYTES", 1024)
    # Hadoop's LocalFileSystem resolves file://localhost/<path>; a
    # verifiably-huge file must route splittable (False)
    assert (
        logs._auto_exact_order(spark, "file://localhost" + str(p)) is False
    )
    # and the empty-authority form still stats locally
    assert logs._auto_exact_order(spark, "file://" + str(p)) is False
    small = tmp_path / "small.log"
    small.write_text("ok\n")
    assert logs._auto_exact_order(spark, str(small)) is True
