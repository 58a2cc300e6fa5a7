"""load_table's per-session plan memo (mtail_spark/session.py):
plan objects are reused within a session, and a REWRITTEN file is a
guaranteed cache miss via the (path, mtime_ns, size) key."""

import os

import pandas as pd

from mtail_spark.session import load_table


def test_load_table_hit_is_same_plan_object(spark):
    a = load_table(spark, "/root/testdata/sf0.001", "region")
    b = load_table(spark, "/root/testdata/sf0.001", "region")
    assert a is b  # memoized plan, no schema re-inference


def test_load_table_rewrite_is_a_miss(spark, tmp_path):
    p = tmp_path / "t.parquet"
    pd.DataFrame({"x": [1, 2]}).to_parquet(p, index=False)
    a = load_table(spark, str(tmp_path), "t")
    assert a.count() == 2
    # rewrite with different contents; bump mtime in case the fs
    # granularity is coarse
    pd.DataFrame({"x": [1, 2, 3]}).to_parquet(p, index=False)
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    b = load_table(spark, str(tmp_path), "t")
    assert b is not a
    assert b.count() == 3
