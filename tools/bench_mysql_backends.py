"""Throughput comparison for the register-RMW program class:
mysql_slowqueries.mtail (reference examples/mysql_slowqueries.mtail)
over a ~1M-line synthetic slow-query log, vectorized (stratified
scalar-register window columns, codegen.py:_plan_registers) vs the
per-line Python fold.

Usage: python tools/bench_mysql_backends.py [n_records] [--fold]
Prints one JSON line with lines/sec for each backend.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EX = "/root/reference/examples/mysql_slowqueries.mtail"

USERS = ["dbuser", "webuser", "batchuser", "adminuser"]
HOSTS = ["dbhost", "host%d" % 1, "host2", "host3", "host4", "web9"]
VERBS = ["UPDATE", "INSERT", "SELECT", "DELETE"]
SERVICES = ["servicename", "outbox", "billing", "search"]


def render_log(path: str, n_records: int) -> int:
    """Deterministic synthetic slow-query log exercising every branch:
    full/uninstrumented/partial+end query shapes, Time headers, the
    no-user prefix.  Returns line count."""
    n = 0
    with open(path, "w") as f:
        def w(s):
            nonlocal n
            f.write(s + "\n")
            n += 1

        # lines before any User@Host: the `user == ""` stop path
        w("# Time: 080401  0:08:01")
        w("# administrator command: Quit;")
        for i in range(n_records):
            u = USERS[i % len(USERS)]
            h = HOSTS[i % len(HOSTS)]
            v = VERBS[(i // 3) % len(VERBS)]
            svc = SERVICES[i % len(SERVICES)]
            qt = (i * 7) % 40
            lt = (i * 3) % 5
            if i % 97 == 0:
                w("# Time: 080401  %d:%02d:%02d"
                  % (i // 3600 % 10, i // 60 % 60, i % 60))
            w(f"# User@Host: {u}[{u}] @ {h} [192.0.2.{i % 250}]")
            w(f"# Query_time: {qt}  Lock_time: {lt}  Rows_sent: 1  "
              f"Rows_examined: {i % 1000}")
            w(f"SET timestamp={1207033681 + i};")
            m = i % 5
            if m in (0, 1):
                w(f"{v} t{i % 13} SET x = {i} # {svc};")
            elif m == 2:
                w(f"{v} t{i % 13} SET x = {i} WHERE y = {i % 7};")
            else:
                # split query: partial line(s) then an end line
                w(f"{v} t{i % 13} SET x = {i},")
                w(f"    y = {i % 7} WHERE z = 1"
                  + (f" # {svc};" if m == 3 else ";"))
    return n


def main():
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    run_fold = "--fold" in sys.argv

    from mtail_spark.compiler.api import compile_program
    from mtail_spark.session import get_spark
    from mtail_spark.sources.logs import read_log_lines
    from mtail_spark.store import rows_from_df

    prog = compile_program(open(EX).read(), "mysql_slowqueries.mtail")
    assert prog.vectorizable, prog.vector_error

    spark = get_spark()
    out = {}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "mysql_slow.log")
        nlines = render_log(path, n_records)
        out["lines"] = nlines

        def run(backend):
            df = read_log_lines(spark, path)
            t0 = time.monotonic()
            store = prog.run_batch(spark, df, backend=backend)
            rows = rows_from_df(store)
            dt = time.monotonic() - t0
            return dt, rows

        # warm the JVM/session on a small prefix first
        run("vector")
        t_vec, rows_vec = run("vector")
        out["vector_sec"] = round(t_vec, 2)
        out["vector_klines_per_sec"] = round(nlines / t_vec / 1e3, 1)
        if run_fold:
            t_fold, rows_fold = run("fold")
            out["fold_sec"] = round(t_fold, 2)
            out["fold_klines_per_sec"] = round(nlines / t_fold / 1e3, 1)
            out["speedup"] = round(t_fold / t_vec, 1)
            a = {(r.name, r.labels): (r.value, r.ts) for r in rows_vec}
            b = {(r.name, r.labels): (r.value, r.ts) for r in rows_fold}
            out["stores_match"] = a == b
            if a != b:
                diff = {k for k in a.keys() | b.keys()
                        if a.get(k) != b.get(k)}
                for k in sorted(diff)[:5]:
                    print("DIFF", k, a.get(k), b.get(k), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
