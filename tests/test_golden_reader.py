"""Golden-file reader unit tests (format of reference
internal/mtail/golden/reader.go:20-156).  Timestamps are epoch
microseconds (year 0 representable, matching Go's time model)."""

from mtail_spark.compiler.gotime import civil_to_epoch_us
from mtail_spark.golden import read_golden
from mtail_spark.store import EPOCH, DatumRow, diff_stores


def test_read_golden(tmp_path):
    p = tmp_path / "g.golden"
    p.write_text(
        "counter bytes_total {operation=sent} 62793673 2011-02-23T05:54:10Z\n"
        "counter connections_total 52 2011-02-22T21:54:13Z\n"
        "counter lock_time_total 0 1207033681000000000\n"
        'gauge foo {label=""} 3.14 2011-02-23T05:54:10Z\n'
        "counter yearless 7 0000-11-16T07:46:06Z\n"
    )
    rows = {(r.name, r.labels): r for r in read_golden(str(p), "prog.mtail")}
    r1 = rows[("bytes_total", (("operation", "sent"),))]
    assert r1.kind == "counter" and r1.vtype == "Int" and r1.value == 62793673
    assert r1.ts == civil_to_epoch_us(2011, 2, 23, 5, 54, 10)
    r2 = rows[("connections_total", ())]
    assert r2.value == 52
    r3 = rows[("lock_time_total", ())]
    assert r3.ts == 1207033681000000000 // 1000
    r4 = rows[("foo", (("label", ""),))]
    assert r4.vtype == "Float" and r4.value == 3.14
    r5 = rows[("yearless", ())]
    assert r5.ts == civil_to_epoch_us(0, 11, 16, 7, 46, 6)


def test_diff_stores():
    a = DatumRow("p", "m", "counter", "Int", (), 5, EPOCH)
    b = DatumRow("p", "m", "counter", "Int", (), 6, EPOCH)
    c = DatumRow("p", "n", "counter", "Int", (), 1, EPOCH)
    assert diff_stores([a], [a]).ok
    d = diff_stores([a], [b])
    assert not d.ok and len(d.mismatched) == 1
    d2 = diff_stores([a, c], [a])
    assert len(d2.missing) == 1
