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


def test_fmt_and_dot_subcommands(tmp_path, capsys):
    """Dev-tool parity: `fmt` prints canonical source (idempotent,
    reference cmd/mfmt), `dot` prints a graphviz digraph (cmd/mdot)."""
    from mtail_spark.__main__ import main

    p = tmp_path / "t.mtail"
    p.write_text("counter   c\n\n/x/ { c++ }\n")
    assert main(["fmt", str(p)]) == 0
    out = capsys.readouterr().out
    assert out == "counter c\n/x/ {\n  c++\n}\n"
    assert main(["dot", str(p)]) == 0
    dot = capsys.readouterr().out
    assert dot.startswith('digraph "t.mtail"') and "VarDecl" in dot
    # --write formats in place
    assert main(["fmt", "--write", str(p)]) == 0
    assert p.read_text() == out
