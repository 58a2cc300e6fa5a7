"""Cluster-scale mechanics demonstrated and pinned on local[32].

local mode cannot prove 1000-executor behavior, but the MECHANISMS the
100 TB story relies on are all checkable locally, and these tests pin
them so a config or plan regression can't silently disable one:

- bucketed tables co-locate aggregations/joins (exchange elimination)
  — the deployment shape the dedup/search index docstrings reference;
- AQE splits skewed join partitions (the documented answer to hot
  keys, e.g. source_cap's giant-domain caveat);
- AQE coalesces over-provisioned shuffle partitions (why a fixed
  spark.sql.shuffle.partitions survives varying data volume).
"""

import pyspark.sql.functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_table_eliminates_aggregation_exchange(spark, tmp_path):
    name = "t_bucket_demo"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    df = spark.range(10000).select(
        (F.col("id") % 64).alias("key"), F.col("id").alias("v")
    )
    (
        df.write.bucketBy(8, "key").sortBy("key")
        .mode("overwrite").format("parquet").saveAsTable(name)
    )
    try:
        agg = spark.table(name).groupBy("key").agg(F.sum("v").alias("s"))
        agg.collect()
        plan = _executed(agg)
        # the scan is pre-partitioned on the bucket key: the aggregate
        # runs in place, no shuffle anywhere in the plan
        assert "Exchange" not in plan, plan
        # same key, same bucketing: the join side needs no exchange either
        j = spark.table(name).join(
            spark.table(name).groupBy("key").agg(F.count("*").alias("n")),
            "key",
        )
        j.collect()
        assert "Exchange" not in _executed(j).replace(
            "BroadcastExchange", ""
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # one pathological key carrying ~99% of the left side
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 1000).alias("key"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("key"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "key")
        # collect() executes THIS DataFrame's own query execution
        # (count()/write() build separate ones, leaving j's AQE plan
        # non-final and unmarked)
        assert len(j.collect()) > 0
        plan = _executed(j)
        # AQE marks the skewed SMJ side: the hot key was split across
        # tasks instead of landing on one straggler
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark):
    # 8 configured shuffle partitions, but the shuffled data is tiny:
    # AQE folds it into fewer post-shuffle partitions
    df = spark.range(100).groupBy((F.col("id") % 10).alias("k")).count()
    df.collect()
    plan = _executed(df)
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan


def test_bucketed_trigram_index_prunes_buckets(spark):
    """The deployment shape search.build_trigram_index documents: the
    index stored as a table bucketed on gram, so a grep's candidate
    lookup scans only the buckets holding its query grams."""
    import mtail_spark.operators.search as SR

    name = "t_trigram_demo"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} spark merge batch") for i in range(50)],
        ["doc_id", "text"],
    )
    (
        SR.build_trigram_index(corpus)
        .write.bucketBy(16, "gram").mode("overwrite")
        .format("parquet").saveAsTable(name)
    )
    try:
        out = SR.substring_search(
            corpus, "merge batch", index=spark.table(name)
        )
        assert out.count() == 50
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the literal gram IN-filter reaches the bucketed scan: only
        # the buckets containing query grams are read
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert int(m.group(1)) < int(m.group(2))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_postings_serve_keyword_search(spark):
    """search_topk(post=stored) over a term-bucketed postings table:
    prebuilt-index serving with bucket pruning, scores identical to
    the inline build."""
    import mtail_spark.operators.search as SR

    name = "t_postings_demo"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    corpus = spark.createDataFrame(
        [(1, "spark spark merge"), (2, "spark window"), (3, "the the")],
        ["doc_id", "text"],
    )
    inline = sorted(
        (r.doc_id, r.score)
        for r in SR.search_topk(corpus, ["spark", "merge"], k=5).collect()
    )
    (
        SR.postings(corpus)
        .write.bucketBy(8, "term").mode("overwrite")
        .format("parquet").saveAsTable(name)
    )
    try:
        served = SR.search_topk(
            corpus, ["spark", "merge"], k=5, post=spark.table(name)
        )
        assert sorted((r.doc_id, r.score) for r in served.collect()) \
            == inline
        plan = served._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and int(m.group(1)) < int(m.group(2)), plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
