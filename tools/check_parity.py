"""Local mirror of the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from mtail_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def run(sf_dir: str = SF_DIR, only=None, spark=None, label: str = ""):
    """Run the gate against `sf_dir`; returns (n_pass, n_fail, n_weak).
    Reused by tools/fuzz_parity.py with generated table directories."""
    only = set(only or ())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    if spark is None:
        spark = get_spark("parity-check", cpus=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {label}{name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {label}{name}: rows-only ({len(srows)} rows)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {label}{name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {label}{name}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {label}{name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {label}{name}: values differ; first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {label}{name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    return n_pass, n_fail, n_weak


def main():
    _, n_fail, _ = run(SF_DIR, only=sys.argv[1:])
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
