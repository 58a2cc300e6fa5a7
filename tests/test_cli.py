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


def test_compile_only_and_dump_ast(tmp_path, capsys):
    from mtail_spark.__main__ import main

    d = tmp_path / "progs"
    d.mkdir()
    (d / "good.mtail").write_text("counter c\n/x/ { c++ }\n")
    assert main(["--progs", str(d), "--compile_only"]) == 0
    assert "good.mtail: OK" in capsys.readouterr().out
    (d / "bad.mtail").write_text("counter c\n/x/ { undeclared++ }\n")
    assert main(["--progs", str(d), "--compile_only"]) == 1
    assert main(["--progs", str(d), "--dump_ast"]) == 0
    assert 'digraph "good.mtail"' in capsys.readouterr().out


def test_one_shot_prometheus_and_ignore_pattern(tmp_path, spark, capsys):
    """--one_shot_format prometheus with --no-emit_prog_label and
    --ignore_filename_regex_pattern (reference cmd/mtail flags)."""
    from mtail_spark.__main__ import main

    d = tmp_path / "progs"
    d.mkdir()
    (d / "p.mtail").write_text("counter lines_total\n// { lines_total++ }\n")
    logs = tmp_path / "logs"
    logs.mkdir()
    (logs / "a.log").write_text("one\ntwo\n")
    (logs / "skip.gz.log").write_text("three\nfour\nfive\n")
    rc = main([
        "--progs", str(d), "--logs", str(logs / "*.log"), "--one_shot",
        "--one_shot_format", "prometheus", "--no-emit_prog_label",
        "--ignore_filename_regex_pattern", r"\.gz",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "lines_total 2" in out       # skip.gz.log filtered out
    assert 'prog="' not in out          # prog label suppressed


def test_cli_serve_tails_appends_and_truncation(tmp_path):
    """End-to-end daemon: `--progs --logs --port 0` through a real
    subprocess — pre-existing content is ignored (EOF seek, reference
    filestream.go:69-74), appends and a copytruncate rotation are
    served on /metrics."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time
    import urllib.request

    d = tmp_path / "progs"
    d.mkdir()
    (d / "lc.mtail").write_text(
        "counter lines_total\n// { lines_total++ }\n"
    )
    log = tmp_path / "app.log"
    log.write_text("past1\npast2\n")  # must NOT be counted

    proc = subprocess.Popen(
        [sys.executable, "-m", "mtail_spark",
         "--progs", str(d), "--logs", str(log),
         "--port", "0", "--poll_interval", "0.1"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stderr=subprocess.PIPE, stdout=subprocess.DEVNULL, text=True,
    )
    try:
        port = None
        t0 = time.monotonic()
        for line in proc.stderr:
            m = re.search(r"serving on :(\d+)", line)
            if m:
                port = int(m.group(1))
                break
            if time.monotonic() - t0 > 120:
                break
        assert port, "server did not come up"

        def count():
            try:
                txt = urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/metrics", timeout=5
                ).read().decode()
            except OSError:
                return None
            m = re.search(
                r'^lines_total\{[^}]*\} (\d+)', txt, re.M
            )
            return int(m.group(1)) if m else None

        def wait_for(n, timeout=90):
            t0 = time.monotonic()
            while time.monotonic() - t0 < timeout:
                if count() == n:
                    return True
                time.sleep(0.5)
            return False

        with open(log, "a") as fh:
            fh.write("new1\nnew2\n")
        assert wait_for(2), f"appends not served: {count()}"
        # copytruncate: replace contents in place
        with open(log, "w") as fh:
            fh.write("r1\nr2\nr3\n")
        assert wait_for(5), f"truncation not re-read: {count()}"
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
