"""Operator/opcode-level semantics tests (mirrors the reference's
TestInstrs family, internal/runtime/vm/vm_test.go:596+), run through
the interpreter fold, with a vectorized cross-check on a
representative subset.
"""

import pytest

from mtail_spark.compiler.api import compile_program
from mtail_spark.compiler.gotime import civil_to_epoch_us

US = 1_000_000


def run(src, lines, **kw):
    prog = compile_program(src, "t.mtail", **kw)
    rows = prog.run_local(lines, filename="test.log")
    return {(r.name, r.labels): r for r in rows}


def val(store, name, labels=()):
    return store[(name, labels)].value


def test_arithmetic_ops():
    src = (
        "gauge a\ngauge b\ngauge c\ngauge d\ngauge e\ngauge f\n"
        "/(\\d+) (\\d+)/ {\n"
        "  a = $1 + $2\n  b = $1 - $2\n  c = $1 * $2\n  d = $1 / $2\n"
        "  e = $1 % $2\n  f = $1 ** 2\n}\n"
    )
    s = run(src, ["17 5"])
    assert val(s, "a") == 22 and val(s, "b") == 12 and val(s, "c") == 85
    assert val(s, "d") == 3  # Go int division truncates
    assert val(s, "e") == 2 and val(s, "f") == 289


def test_bitwise_and_shift():
    src = (
        "gauge a\ngauge b\ngauge c\ngauge d\ngauge e\n"
        "/(?P<h>[0-9a-f]+)/ {\n"
        "  a = strtol($h, 16) & 15\n  b = strtol($h, 16) | 256\n"
        "  c = strtol($h, 16) ^ 1\n  d = strtol($h, 16) >> 4\n"
        "  e = strtol($h, 16) << 2\n}\n"
    )
    s = run(src, ["ff"])
    assert val(s, "a") == 15 and val(s, "b") == 511
    assert val(s, "c") == 254 and val(s, "d") == 15 and val(s, "e") == 1020


def test_string_number_compare_fallback():
    # reference vm.go:227-307: strings compared against numbers convert
    src = (
        "counter big\ncounter small\n"
        "/(?P<v>\\S+)/ {\n  $v > 10 {\n    big++\n  } else {\n    small++\n  }\n}\n"
    )
    s = run(src, ["50", "3"])
    assert val(s, "big") == 1 and val(s, "small") == 1


def test_string_builtins():
    src = (
        "text t1\ntext t2\ntext t3\ngauge l\n"
        '/(?P<w>\\S+)/ {\n'
        "  t1 = tolower($w)\n"
        '  t2 = subst("l", "r", $w)\n'
        '  t3 = subst(/[A-Z]+/, "_", $w)\n'
        "  l = len($w)\n}\n"
    )
    s = run(src, ["HeLLo"])
    assert val(s, "t1") == "hello"
    assert val(s, "t2") == "HeLLo".replace("l", "r")
    assert val(s, "t3") == "_e_o"
    assert val(s, "l") == 5


def test_strptime_and_timestamp():
    src = (
        "gauge ts\n"
        "/^(?P<d>\\d+\\/\\d+\\/\\d+ \\d+:\\d+:\\d+)/ {\n"
        '  strptime($d, "2006/01/02 15:04:05")\n'
        "  ts = timestamp()\n}\n"
    )
    s = run(src, ["2011/02/23 05:54:10 hello"])
    assert val(s, "ts") == civil_to_epoch_us(2011, 2, 23, 5, 54, 10) // US


def test_settime():
    src = (
        "gauge ts\n/(\\d+)/ {\n  settime($1)\n  ts = timestamp()\n}\n"
    )
    s = run(src, ["1500000000"])
    assert val(s, "ts") == 1500000000
    assert s[("ts", ())].ts == 1500000000 * US


def test_runtime_error_kills_rest_of_line():
    # second statement's capref fails to convert -> third never runs
    src = (
        "counter pre\ncounter post\ngauge g\n"
        "/x((?P<n>\\d+)|y)/ {\n  pre++\n  g = $n\n  post++\n}\n"
    )
    s = run(src, ["xy"])
    assert val(s, "pre") == 1
    assert val(s, "post") == 0


def test_stop():
    src = (
        "counter a\ncounter b\n"
        "/skip/ {\n  stop\n}\n/./ {\n  a++\n}\n/skip/ {\n  b++\n}\n"
    )
    s = run(src, ["skip this", "count this"])
    assert val(s, "a") == 1 and val(s, "b") == 0


def test_otherwise_chain():
    src = (
        "counter x\ncounter y\ncounter z\n"
        "/./ {\n"
        "  /aaa/ {\n    x++\n  }\n"
        "  /bbb/ {\n    y++\n  }\n"
        "  otherwise {\n    z++\n  }\n"
        "}\n"
    )
    # "aaabbb" fires BOTH /aaa/ and /bbb/ (conditions are not
    # exclusive); otherwise fires only for "ccc"
    s = run(src, ["aaa", "bbb", "ccc", "aaabbb"])
    assert val(s, "x") == 2 and val(s, "y") == 2 and val(s, "z") == 1


def test_del():
    src = (
        "gauge g by k\n"
        "/set (?P<k>\\w+)/ {\n  g[$k] = 1\n}\n"
        "/del (?P<k>\\w+)/ {\n  del g[$k]\n}\n"
    )
    s = run(src, ["set a", "set b", "del a"])
    assert ("g", (("k", "b"),)) in s
    assert ("g", (("k", "a"),)) not in s


def test_getfilename():
    src = (
        "counter n\n"
        "getfilename() =~ /test/ {\n  n++\n}\n"
    )
    s = run(src, ["x"])
    assert val(s, "n") == 1


def test_histogram_bucket_routing():
    src = (
        "histogram h buckets 1, 2, 4\n"
        "/(?P<v>\\d+\\.?\\d*)/ {\n  h = $v\n}\n"
    )
    s = run(src, ["0.5", "1", "3", "100"])
    buckets, count, total = val(s, "h")
    assert count == 4 and total == 104.5
    assert [c for _le, c in buckets] == [2, 0, 1, 1]  # (0,1],(1,2],(2,4],+Inf


def test_float_label_go_format():
    src = (
        "counter c by v\n/(?P<v>\\d+\\.\\d+)/ {\n  c[$v]++\n}\n"
    )
    s = run(src, ["19.0", "2.5"])
    labels = {lab for (_n, lab) in s if lab}
    assert (("v", "19"),) in labels  # Go %g drops trailing .0
    assert (("v", "2.5"),) in labels


@pytest.mark.parametrize("src,lines,expect", [
    (
        "counter a by t\n/(?P<t>\\w+) (?P<v>\\d+)/ {\n  a[$t] += $v\n}\n",
        ["x 5", "y 7", "x 2"],
        {("a", (("t", "x"),)): 7, ("a", (("t", "y"),)): 7},
    ),
    (
        "gauge g\n/(?P<v>\\d+)/ {\n  g = $v\n}\n",
        ["5", "9", "3"],
        {("g", ()): 3},
    ),
])
def test_vectorized_matches_fold(spark, src, lines, expect):
    """The two backends agree (and match the expected values)."""
    from mtail_spark.store import rows_from_df

    prog = compile_program(src, "x.mtail")
    local = {(r.name, r.labels): r.value for r in prog.run_local(lines)}
    df = spark.createDataFrame(
        [("f", i, l) for i, l in enumerate(lines)],
        "filename string, line_no long, line string",
    )
    vec = {
        (r.name, r.labels): r.value
        for r in rows_from_df(prog.run_batch(spark, df, backend="vector"))
    }
    for k, v in expect.items():
        assert local[k] == v
        assert vec[k] == v
