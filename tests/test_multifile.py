"""Multi-file batch semantics: the fold backend runs per file and the
partial stores merge deterministically (counters add across files —
the reference's single store accumulates across all tailed logs)."""

from pyspark.sql import functions as F

from mtail_spark.compiler.api import compile_program
from mtail_spark.sources.logs import read_log_lines
from mtail_spark.store import rows_from_df

TD = "/root/reference/internal/mtail/testdata"
EX = "/root/reference/examples"


def test_vsftpd_two_logs_merge(spark, tmp_path):
    src = open(f"{EX}/vsftpd.mtail").read()
    prog = compile_program(src, "vsftpd.mtail")
    # vsftpd now vectorizes (register windows); run_batch below
    # exercises the default vector path, and a second run pins the
    # fold + merge path — both must match the per-file run_local sums

    singles = {}
    for logf in ("vsftpd_log", "vsftpd_xferlog"):
        lines = open(f"{TD}/{logf}", errors="replace").read().split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        singles[logf] = {
            (r.name, r.labels): r
            for r in prog.run_local(lines, filename=f"{TD}/{logf}")
        }

    # both files in one glob -> one merged store
    import shutil

    d = tmp_path / "logs"
    d.mkdir()
    shutil.copy(f"{TD}/vsftpd_log", d / "vsftpd_log")
    shutil.copy(f"{TD}/vsftpd_xferlog", d / "vsftpd_xferlog")
    for backend in ("vector", "fold"):
        merged_df = prog.run_batch(
            spark, read_log_lines(spark, str(d)), backend=backend
        )
        merged = {(r.name, r.labels): r for r in rows_from_df(merged_df)}

        checked = 0
        for key in set(singles["vsftpd_log"]) | set(singles["vsftpd_xferlog"]):
            a = singles["vsftpd_log"].get(key)
            b = singles["vsftpd_xferlog"].get(key)
            if (a and a.kind == "counter") or (b and b.kind == "counter"):
                want = (a.value if a else 0) + (b.value if b else 0)
                assert merged[key].value == want, (
                    backend, key, want, merged[key],
                )
                checked += 1
        assert checked >= 10


def test_vectorized_multifile(spark, tmp_path):
    """The vectorized backend is file-agnostic: counters aggregate over
    the union of lines regardless of file layout."""
    (tmp_path / "a.log").write_text("x 1\nx 2\n")
    (tmp_path / "b.log").write_text("x 3\n")
    prog = compile_program(
        "counter n\ncounter total\n/x (?P<v>\\d+)/ {\n  n++\n  total += $v\n}\n",
        "t.mtail",
    )
    df = prog.run_batch(spark, read_log_lines(spark, str(tmp_path)))
    vals = {r["name"]: r["value_i"] for r in df.collect()}
    assert vals["n"] == 3 and vals["total"] == 6
