"""Smoke tests: driver contract + core operator sanity."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"event_type", "hits", "last_ts"}


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # EVERY query has an oracle: bounded iteration (k-means) unrolls
    # into chained CTEs, so nothing is rows-only anymore
    assert set(oracles) == set(qs)


def test_all_queries_execute_smoke(spark, sf_smoke):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
        df.limit(5).collect()


def test_parse_byte_size():
    from mtail_spark.session import _parse_byte_size

    assert _parse_byte_size("128MB") == 128 * 1024 * 1024
    assert _parse_byte_size("134217728b") == 134217728
    assert _parse_byte_size("1g") == 1024 ** 3
    assert _parse_byte_size("512k") == 512 * 1024
    assert _parse_byte_size("4096") == 4096


def test_ensure_parallelism(spark, tmp_path):
    from mtail_spark.session import ensure_parallelism

    # small single-file scan -> repartitioned up to cluster parallelism
    p = str(tmp_path / "t.parquet")
    spark.range(1000).write.parquet(p)
    df = spark.read.parquet(p)
    out = ensure_parallelism(df, spark)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # in-memory relation (no input files) -> untouched
    mem = spark.range(10)
    assert ensure_parallelism(mem, spark) is mem
