"""Greedy sequence packing (operators/packing.py)."""

from pyspark.sql import functions as F

import mtail_spark.operators.packing as PK


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "shard string, ord long, toks long"
    )


def test_greedy_packing_semantics(spark):
    df = _df(spark, [
        ("a", 1, 100), ("a", 2, 100), ("a", 3, 60),   # 260 > 256
        ("a", 4, 300),                                # oversized
        ("a", 5, 10),
        ("b", 1, 256), ("b", 2, 1),
    ])
    out = {
        (r.shard, r.ord): (r.seq_id, r.seq_pos)
        for r in PK.pack_sequences(df, "toks", 256, "shard", "ord")
        .collect()
    }
    assert out[("a", 1)] == (0, 0)
    assert out[("a", 2)] == (0, 1)   # 200 <= 256
    assert out[("a", 3)] == (1, 0)   # 260 overflows -> new seq
    assert out[("a", 4)] == (2, 0)   # oversized doc owns a sequence
    assert out[("a", 5)] == (3, 0)   # seq 2 is already over budget
    assert out[("b", 1)] == (0, 0)   # exactly at budget fits
    assert out[("b", 2)] == (1, 0)   # shards pack independently


def test_sequences_respect_budget_and_order(spark):
    from mtail_spark.operators.textstats import token_count_ws
    from mtail_spark.session import load_table

    docs = load_table(
        spark, "/root/testdata/sf0.01", "documents"
    ).withColumn("toks", token_count_ws(F.col("text")))
    packed = PK.pack_sequences(docs, "toks", 256, "source", "doc_id")
    stats = PK.sequence_stats(packed, "source", "toks").collect()
    # a multi-document sequence never exceeds the budget; only
    # single oversized documents may
    for r in stats:
        assert r.seq_tokens <= 256 or r.n_docs == 1, r
    # every document keeps all its columns through the join
    assert packed.count() == docs.count()
    # seq_pos is contiguous from 0 within each (shard, seq)
    bad = (
        packed.groupBy("source", "seq_id")
        .agg(F.max("seq_pos").alias("mx"), F.count("*").alias("n"))
        .filter(F.col("mx") != F.col("n") - 1)
        .count()
    )
    assert bad == 0
