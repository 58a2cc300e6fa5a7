"""Capture `.explain("formatted")` for named queries() entries into
plans/r12/<query>_<tag>.txt — the before/after evidence files for the
optimization rounds.

Usage: python tools/capture_plan.py TAG QUERY [QUERY ...]
       (TAG is e.g. 'before' or 'after'; SF via SPARK_GRAFT_SF_DIR,
       default sf0.01 — plan SHAPE, not timing, so the small SF is
       fine and fast.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from mtail_spark.session import get_spark, reset_scan_tuning  # noqa: E402


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture-plan")
    qs = entrymod.queries()
    for name in names:
        reset_scan_tuning(spark)
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
