"""Stage-by-stage profile of the dhcpd vectorized plan at sf0.1.

Times successively larger prefixes of the pipeline to localize the
per-line constant: render -> shared regex projection -> event array ->
explode -> aggregate -> full query.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mtail_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("profile-dhcpd")


def timed(label, fn, n=3):
    best = None
    for _ in range(n):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} {best:7.3f} s")
    return best


from mtail_spark.compiler.api import compile_program
from mtail_spark.compiler.codegen import Vectorizer, _event_sql
from mtail_spark.plans.demo_programs import DHCPD_PATH, render_dhcpd_lines

prog = compile_program(open(DHCPD_PATH).read(), "dhcpd.mtail")
lines = render_dhcpd_lines(spark, SF)
n = lines.count()
print(f"lines: {n}")

# warm the input cache path (parquet page cache)
timed("render+count lines", lambda: lines.count())

vz = Vectorizer(prog.checked, now_us=0)
vz.compile()
print(f"sites: {len(vz.sites)}  shared cols: {len(vz.shared)}")

from mtail_spark.session import ensure_parallelism

lines_p = ensure_parallelism(lines, spark)
lines_p.createOrReplaceTempView("__prof_lines")
src = vz.shared_layers_sql("__prof_lines")

# 1. shared projection only (force every shared col)
proj_cols = ", ".join(name for name, _, _ in vz.shared)
shared_df = spark.sql(
    f"SELECT filename, line_no, {proj_cols} FROM {src}"
)
timed("shared projection (all cols)",
      lambda: shared_df.select(
          [F.count(c) for c in shared_df.columns[2:]]).collect())

# 1b. match cols only (regex gates)
mcols = [name for name, _, _ in vz.shared if "_m" in name]
timed("match columns only",
      lambda: spark.sql(
          f"SELECT {', '.join('count(' + c + ')' for c in mcols)} "
          f"FROM {src}").collect())

# 2. event array build (no explode)
ev_sqls = [_event_sql(s, s.metric.vtype) for s in vz.sites]
evs = f"array({', '.join(ev_sqls)})"
flat = spark.sql(f"SELECT filename, line_no, {evs} AS evs FROM {src}")
timed("event array build (size only)",
      lambda: flat.select(F.sum(F.size("evs"))).collect())

# 3. + explode
events = (
    flat.select("filename", "line_no", F.explode_outer("evs").alias("e"))
    .filter(F.col("e").isNotNull())
)
timed("+ explode_outer+filter (count)", lambda: events.count())

# 4. + narrow select + agg shape
ev2 = events.select(
    "filename", "line_no",
    F.col("e.site").alias("site"), F.col("e.labels").alias("labels"),
    F.col("e.vi").alias("vi"), F.col("e.vf").alias("vf"),
    F.col("e.le").alias("le"), F.col("e.ts_us").alias("ts_us"),
)
agg = ev2.groupBy("site", "labels", "le", "filename").agg(
    F.sum("vi"), F.count(F.lit(1)), F.max("ts_us"))
timed("+ groupBy agg (collect)", lambda: agg.collect())

# 5. full query
from mtail_spark.plans.demo_programs import q_mtail_prog_dhcpd

timed("FULL q_mtail_prog_dhcpd", lambda: q_mtail_prog_dhcpd(spark, SF).collect())
