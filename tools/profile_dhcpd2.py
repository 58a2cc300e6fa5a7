"""Driver-side cost breakdown of q_mtail_prog_dhcpd at sf0.1."""

import sys
import time

sys.path.insert(0, "/root/repo")

from mtail_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark("profile-dhcpd2")

from mtail_spark.compiler.api import compile_program
from mtail_spark.plans.demo_programs import DHCPD_PATH, render_dhcpd_lines

prog = compile_program(open(DHCPD_PATH).read(), "dhcpd.mtail")
lines = render_dhcpd_lines(spark, SF)
lines.count()  # warm

import cProfile
import pstats

for i in range(3):
    t0 = time.perf_counter()
    df = prog.run_batch(spark, lines)
    t1 = time.perf_counter()
    rows = df.collect()
    t2 = time.perf_counter()
    print(f"run {i}: run_batch(plan+collect inside)={t1-t0:6.3f}s "
          f"final collect={t2-t1:6.3f}s rows={len(rows)}")

pr = cProfile.Profile()
pr.enable()
df = prog.run_batch(spark, lines)
df.collect()
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(28)
