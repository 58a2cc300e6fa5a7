"""Chunkfold phase-B scaling bench: is replay cost flat in chunk count?

Generates a multi-file register-RMW corpus (mysql_slowqueries.mtail
over N files, >=20M lines by default), runs chunkfold at the default
split sizing and at a forced ~10x chunk count, and reports each run's
two jobs separately:

  job1 = phase A + slim audit collect (driver sees O(chunks) tuples)
  job2 = merge action, which now carries the executor-side per-file
         replay (applyInPandas over the persisted control rows)

The r5 review's concern was the DRIVER replay pass growing with chunk
count; after the executor-side restructure the expectation is job2
stays near-flat under 10x chunks while job1 only pays more task
overhead.  Store equality is asserted between both sizings and the
sequential fold (add --vector for the window-plan backend too; it is
minutes at this scale).

Usage: python tools/bench_replay_scale.py [records_per_file]
           [--files N] [--fold] [--vector]
Defaults: 8 files x 860k records (~6.9M records -> ~20.7M lines).
Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from tools.bench_mysql_backends import EX, render_log  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    recs = int(args[0]) if args else 860_000
    nfiles = (
        int(sys.argv[sys.argv.index("--files") + 1])
        if "--files" in sys.argv
        else 8
    )
    run_vector = "--vector" in sys.argv

    from pyspark.sql import functions as F

    from mtail_spark.compiler.api import compile_program
    from mtail_spark.session import get_spark, reset_scan_tuning
    from mtail_spark.sources.logs import read_log_lines
    from mtail_spark.store import rows_from_df

    prog = compile_program(open(EX).read(), "mysql_slowqueries.mtail")
    assert prog.chunkfoldable
    spark = get_spark()
    out = {"files": nfiles}

    with tempfile.TemporaryDirectory() as td:
        total = 0
        for i in range(nfiles):
            total += render_log(os.path.join(td, f"slow{i}.log"), recs)
        out["lines"] = total
        glob = os.path.join(td, "*.log")

        def run(backend, mpb=None):
            reset_scan_tuning(spark)
            if mpb is not None:
                spark.conf.set(
                    "spark.sql.files.maxPartitionBytes", str(mpb)
                )
            df = read_log_lines(spark, glob, exact_order=False)
            t0 = time.monotonic()
            store = prog.run_batch(
                spark, df, backend=backend, cache_plan=False
            )
            t1 = time.monotonic()
            rows = sorted(rows_from_df(store), key=str)
            t2 = time.monotonic()
            cache = getattr(store, "_chunkfold_cache", None)
            stats = {}
            if cache is not None:
                stats["chunks"] = cache.filter(
                    F.col("row_type") == 1
                ).count()
                stats["deferred_lines"] = cache.filter(
                    F.col("row_type") == 2
                ).count()
                cache.unpersist()
            stats["job1_phase_a_s"] = round(t1 - t0, 2)
            stats["job2_merge_replay_s"] = round(t2 - t1, 2)
            stats["total_s"] = round(t2 - t0, 2)
            stats["klines_per_sec"] = round(total / (t2 - t0) / 1e3, 1)
            return stats, rows

        # warm JVM/session once
        run("chunkfold")

        base, rows_base = run("chunkfold")
        out["chunkfold_default"] = base
        # ~10x the chunk count: shrink scan splits 10x under the
        # default sizing chunkfold would pick (est/(2*par))
        from mtail_spark.session import estimated_local_input_bytes

        est = estimated_local_input_bytes(
            read_log_lines(spark, glob, exact_order=False)
        )
        par = spark.sparkContext.defaultParallelism
        tenx = max(131072, est // (par * 2) // 10)
        dense, rows_dense = run("chunkfold", mpb=tenx)
        out["chunkfold_10x_chunks"] = dense
        assert rows_dense == rows_base, "store differs across sizings"
        out["chunk_growth"] = round(
            dense["chunks"] / max(base["chunks"], 1), 1
        )
        out["job2_growth"] = round(
            dense["job2_merge_replay_s"]
            / max(base["job2_merge_replay_s"], 1e-9),
            2,
        )

        # fold equality is the gate
        f, rows_fold = run("fold")
        out["fold"] = {
            "total_s": f["total_s"],
            "klines_per_sec": f["klines_per_sec"],
        }
        assert rows_fold == rows_base, "fold store differs"
        out["stores_equal_fold"] = True
        if run_vector:
            v, rows_vec = run("vector")
            out["vector"] = {
                "total_s": v["total_s"],
                "klines_per_sec": v["klines_per_sec"],
            }
            assert rows_vec == rows_base, "vector store differs"
            out["stores_equal_vector"] = True

    reset_scan_tuning(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
