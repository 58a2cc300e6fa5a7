"""CLI one-shot mode: the reference binary's interface end-to-end."""

import subprocess
import sys


def test_cli_one_shot(tmp_path):
    progs = tmp_path / "progs"
    progs.mkdir()
    (progs / "count.mtail").write_text(
        "counter lines_total\ncounter words by w\n"
        "/(?P<w>\\w+)/ {\n  lines_total++\n  words[$w]++\n}\n"
    )
    logs = tmp_path / "app.log"
    logs.write_text("foo\nbar\nfoo\n")
    out = subprocess.run(
        [sys.executable, "-m", "mtail_spark", "--progs", str(progs),
         "--logs", str(logs), "--one_shot"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    assert "counter lines_total 3" in lines
    assert "counter words {w=foo} 2" in lines
    assert "counter words {w=bar} 1" in lines
