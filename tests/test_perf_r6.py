"""Round-6 performance work: single-file store collapse and the
store-shuffle tuner.  Correctness first — the collapsed single-level
aggregation must be value-identical to the two-level cross-file plan,
and the marker must never fire on composite (union) relations."""

from pyspark.sql import functions as F

from mtail_spark.compiler.api import compile_program
from mtail_spark.sources.logs import (
    is_single_file_relation,
    log_lines_from_df,
    read_log_lines,
)

PROG = (
    "counter hits by kind\n"
    "gauge last_size\n"
    "histogram sizes buckets 10, 100, 1000\n"
    '/(?P<kind>\\w+) size (?P<size>\\d+)/ {\n'
    "  hits[$kind]++\n"
    "  last_size = $size\n"
    "  sizes = $size\n"
    "}\n"
)

LINES = [
    "get size 5", "put size 50", "get size 500", "del size 5000",
    "get size 7", "put size 70",
]


def _store(spark, prog, lines_df):
    rows = prog.run_batch(spark, lines_df, backend="vector").collect()
    return sorted(
        (r["name"], tuple(sorted((r["labels"] or {}).items())),
         r["value_i"], r["value_f"], r["value_s"],
         tuple((b["le"], b["count"]) for b in (r["buckets"] or [])),
         r["bucket_count"], r["bucket_sum"], r["ts_us"])
        for r in rows
    )


def test_single_file_collapse_matches_two_level(spark, tmp_path):
    prog = compile_program(PROG, "sf6.mtail")
    p = tmp_path / "one.log"
    p.write_text("\n".join(LINES) + "\n")
    single = read_log_lines(spark, str(p))
    assert is_single_file_relation(single)
    # same lines forced through the multi-file plan: strip the marker
    unmarked = single.select(
        F.col("filename").alias("filename", metadata={}),
        "line_no", "line",
    )
    assert not is_single_file_relation(unmarked)
    assert _store(spark, prog, single) == _store(spark, prog, unmarked)


def test_single_file_plan_drops_an_exchange(spark, tmp_path):
    prog = compile_program(PROG, "sf6b.mtail")
    p = tmp_path / "one.log"
    p.write_text("\n".join(LINES) + "\n")
    single = read_log_lines(spark, str(p))
    unmarked = single.select(
        F.col("filename").alias("filename", metadata={}),
        "line_no", "line",
    )

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")
    df_s = prog.run_batch(spark, single, backend="vector",
                          cache_plan=False)
    df_m = prog.run_batch(spark, unmarked, backend="vector",
                          cache_plan=False)
    assert n_exchanges(df_s) == n_exchanges(df_m) - 1


def test_union_of_marked_relations_routes_multifile(spark):
    a = log_lines_from_df(
        spark.createDataFrame([("x size 1",)], "line string"), "line",
        filename="a.log",
    )
    b = log_lines_from_df(
        spark.createDataFrame([("x size 2",)], "line string"), "line",
        filename="b.log",
    )
    assert is_single_file_relation(a)
    assert not is_single_file_relation(a.unionByName(b))


def test_multifile_glob_not_marked(spark, tmp_path):
    (tmp_path / "a.log").write_text("x size 1\n")
    (tmp_path / "b.log").write_text("x size 2\n")
    df = read_log_lines(spark, str(tmp_path / "*.log"))
    assert not is_single_file_relation(df)
    # and gauge LWW across two files still merges by (ts, filename)
    prog = compile_program(PROG, "sf6c.mtail")
    rows = {r["name"]: r for r in
            prog.run_batch(spark, df, backend="vector").collect()}
    assert rows["last_size"]["value_i"] == 2


def test_store_shuffle_tuner_sizes_and_resets(spark):
    from mtail_spark.session import (
        default_shuffle_partitions,
        reset_scan_tuning,
        store_shuffle_partitions,
        tune_store_shuffle,
    )

    dflt = default_shuffle_partitions(spark)
    assert store_shuffle_partitions(spark, 1 << 20) == 8
    assert store_shuffle_partitions(spark, None) == dflt
    # huge input: capped at the session default (cluster setting wins)
    assert store_shuffle_partitions(spark, 100 * 10**12) == dflt
    applied = tune_store_shuffle(spark, 1 << 20)
    try:
        if dflt > 8:
            assert applied == 8
            assert spark.conf.get("spark.sql.shuffle.partitions") == "8"
        else:  # session default already at the floor: tuner is a no-op
            assert applied is None
    finally:
        reset_scan_tuning(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(dflt)
