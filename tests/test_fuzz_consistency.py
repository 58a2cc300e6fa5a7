"""Property-based cross-backend fuzz (the reference fuzzes its
compiler, internal/runtime/fuzz.go; we fuzz INPUTS and require the
vectorized plan and the ordered fold to agree on every store)."""

from hypothesis import given, settings, strategies as st

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
