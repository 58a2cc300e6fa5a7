"""Property-based cross-backend fuzz (the reference fuzzes its
compiler, internal/runtime/fuzz.go; we fuzz INPUTS and require the
vectorized plan and the ordered fold to agree on every store)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from mtail_spark.compiler.api import compile_program
from mtail_spark.store import diff_stores, rows_from_df

# exercises optional groups (error-kill), alternation, nested blocks,
# otherwise, histogram routing, numeric compares, labels
FUZZ_PROG = """
counter seen
counter big by tag
counter small by tag
gauge last by tag
histogram h by tag buckets 1, 10, 100
counter oops

/^(?P<tag>[a-z]+) ((?P<n>\\d+)|nan)/ {
  seen++
  $n > 50 {
    big[$tag]++
  }
  $n <= 50 {
    small[$tag]++
  }
  otherwise {
    oops++
  }
  last[$tag] = $n
  h[$tag] = $n
}
"""

line_st = st.one_of(
    st.from_regex(r"[a-z]{1,3} [0-9]{1,4}", fullmatch=True),
    st.from_regex(r"[a-z]{1,3} nan", fullmatch=True),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    ),
)

_prog = compile_program(FUZZ_PROG, "fuzz.mtail")


@settings(max_examples=12, deadline=None)
@given(st.lists(line_st, min_size=0, max_size=25))
def test_backends_agree_on_random_lines(spark, lines):
    fold = _prog.run_local(lines, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    vec = rows_from_df(_prog.run_batch(spark, df, backend="vector"))
    d = diff_stores(fold, vec)
    assert d.ok, d.render() + f"\nlines={lines!r}"


# Scalar cross-line registers (the stratified carry-window machinery,
# codegen._plan_registers): a text register carried across lines, a
# constant-domain self-cycle (armed==1 relaxation), a gauge register
# read-modify chain into dimensioned counters, plus stop gating.
REG_FUZZ_PROG = """
hidden text who
hidden gauge armed
hidden gauge acc

counter total by who
counter fired
counter disarmed

/^u (?P<u>[a-z]+)/ {
  who = $u
  armed = 1
  acc = 0
}

who == "" {
  stop
}

/^n (?P<n>\\d+)/ {
  acc = $n
}

/^go/ {
  armed == 1 {
    armed = 0
    total[who] += acc
    fired++
  } else {
    disarmed++
  }
}
"""

reg_line_st = st.one_of(
    st.from_regex(r"u [a-z]{1,2}", fullmatch=True),
    st.from_regex(r"n [0-9]{1,3}", fullmatch=True),
    st.just("go"),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=20,
    ),
)

_reg_prog = compile_program(REG_FUZZ_PROG, "regfuzz.mtail")
assert _reg_prog.vectorizable, _reg_prog.vector_error


@settings(max_examples=10, deadline=None)
@given(st.lists(reg_line_st, min_size=0, max_size=30))
def test_backends_agree_on_register_programs(spark, lines):
    fold = _reg_prog.run_local(lines, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    vec = rows_from_df(_reg_prog.run_batch(spark, df, backend="vector"))
    d = diff_stores(fold, vec)
    assert d.ok, d.render() + f"\nlines={lines!r}"


@settings(
    max_examples=4,
    deadline=None,
    # the monkeypatches are idempotent across examples, so per-test
    # (rather than per-example) reset is fine
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(reg_line_st, min_size=5, max_size=30))
def test_chunked_register_path_agrees(spark, monkeypatch, lines):
    """Same program through the chunk-parallel prefix scan (forced by
    a tiny CHUNK_LINES + a fake big-input estimate)."""
    from mtail_spark import session as _session
    from mtail_spark.compiler.codegen import Vectorizer

    monkeypatch.setattr(Vectorizer, "CHUNK_LINES", 4)
    monkeypatch.setattr(
        _session, "estimated_local_input_bytes", lambda df: 1 << 30
    )
    fold = _reg_prog.run_local(lines, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    vec = rows_from_df(_reg_prog.run_batch(spark, df, backend="vector"))
    d = diff_stores(fold, vec)
    assert d.ok, d.render() + f"\nlines={lines!r}"


# Dimensioned registers through the chunkfold backend: per-key session
# state (the rsyncd/vsftpd pattern — open/update/close with del),
# scalar registers, and stop gating, folded speculatively with a tiny
# chunk size so deferral/salvage/replay fire on nearly every chunk.
DIM_FUZZ_PROG = """
hidden gauge open_at by sid
hidden text who

counter bytes_by_user by user
counter sessions_closed
gauge last_dur by user

/^u (?P<u>[a-z]+)/ {
  who = $u
}

who == "" {
  stop
}

/^open (?P<sid>\\d+) at (?P<t>\\d+)/ {
  open_at[$sid] = $t
}

/^close (?P<sid>\\d+) at (?P<t>\\d+) bytes (?P<b>\\d+)/ {
  bytes_by_user[who] += $b
  last_dur[who] = $t - open_at[$sid]
  sessions_closed++
  del open_at[$sid]
}
"""

dim_line_st = st.one_of(
    st.from_regex(r"u [a-z]{1,2}", fullmatch=True),
    st.from_regex(r"open [0-9]{1,2} at [0-9]{1,3}", fullmatch=True),
    st.from_regex(
        r"close [0-9]{1,2} at [0-9]{1,3} bytes [0-9]{1,3}",
        fullmatch=True,
    ),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=20,
    ),
)

_dim_prog = compile_program(DIM_FUZZ_PROG, "dimfuzz.mtail")
assert _dim_prog.chunkfoldable, _dim_prog._chunkfold_reason


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(dim_line_st, min_size=0, max_size=40))
def test_chunkfold_agrees_on_dim_register_programs(
    spark, monkeypatch, lines
):
    from mtail_spark.compiler import chunkfold as CF
    from mtail_spark.store import rows_from_df as _rfd

    monkeypatch.setattr(CF, "CHUNK_LINES", 5)
    fold = _dim_prog.run_local(lines, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    out = _dim_prog.run_batch(
        spark, df, backend="chunkfold", cache_plan=False
    )
    ck = _rfd(out)
    cache = getattr(out, "_chunkfold_cache", None)
    if cache is not None:
        cache.unpersist()
    d = diff_stores(fold, ck)
    assert d.ok, d.render() + f"\nlines={lines!r}"
