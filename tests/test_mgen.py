"""Program-level fuzz via the mgen generator (reference cmd/mgen):

- wild mode: the compiler front-end must fail CLEANLY (its own error
  types) or succeed on grammar soup — never raise an unrelated
  exception;
- valid mode: every composed program compiles; vectorizable ones must
  produce fold-identical stores on sample lines.
"""

import random
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from mgen import valid, wild  # noqa: E402

from mtail_spark.compiler.api import compile_program  # noqa: E402
from mtail_spark.compiler.checker import CheckError  # noqa: E402
from mtail_spark.compiler.parser import ParseError  # noqa: E402
from mtail_spark.store import diff_stores, rows_from_df  # noqa: E402

LINES = ["ab 5", "cd 42", "ab 100", "zz 0", "not matching"]


def test_wild_mode_never_crashes():
    rng = random.Random(7)
    compiled = failed = 0
    for _ in range(300):
        src = wild(rng)
        try:
            compile_program(src, "wild.mtail")
            compiled += 1
        except (ParseError, CheckError):
            failed += 1
        # anything else (TypeError, AttributeError, ...) propagates
        # and fails the test
    assert compiled + failed == 300


def test_valid_mode_all_compile():
    rng = random.Random(11)
    n_vec = 0
    for _ in range(50):
        src = valid(rng)
        prog = compile_program(src, "valid.mtail")
        if prog.vectorizable:
            n_vec += 1
    assert n_vec >= 40  # nearly all compose into vectorizable plans


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_valid_mode_backends_agree(spark, seed):
    rng = random.Random(seed)
    src = valid(rng)
    prog = compile_program(src, f"valid{seed}.mtail")
    fold = prog.run_local(LINES, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(LINES)],
        "filename string, line_no long, line string",
    )
    vec = rows_from_df(prog.run_batch(spark, df))
    d = diff_stores(fold, vec)
    assert d.ok, d.render() + "\n" + src


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_valid_mode_chunkfold_agrees(spark, monkeypatch, seed):
    """Random valid programs through the chunk-parallel speculative
    fold (tiny chunks over a longer line sample), when in-class."""
    from mtail_spark.compiler import chunkfold as CF

    rng = random.Random(seed)
    src = valid(rng)
    prog = compile_program(src, f"validck{seed}.mtail")
    if not prog.chunkfoldable:
        pytest.skip(prog._chunkfold_reason)
    monkeypatch.setattr(CF, "CHUNK_LINES", 7)
    lines = LINES * 20
    fold = prog.run_local(lines, filename="f")
    df = spark.createDataFrame(
        [("f", i, ln) for i, ln in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    out = prog.run_batch(spark, df, backend="chunkfold", cache_plan=False)
    ck = rows_from_df(out)
    cache = getattr(out, "_chunkfold_cache", None)
    if cache is not None:
        cache.unpersist()
    d = diff_stores(fold, ck)
    assert d.ok, d.render() + "\n" + src
