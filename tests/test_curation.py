"""Curation operators (operators/curation.py, packing.chunk_fixed_windows):
boilerplate n-grams, keep-best canonical dedup, deterministic epoch
shuffle, mixture-weighted sampling, fixed-context-window chunking."""

from pyspark.sql import functions as F

import mtail_spark.operators.curation as CU
import mtail_spark.operators.packing as PK


def _docs(spark):
    from mtail_spark.session import load_table

    return load_table(spark, "/root/testdata/sf0.01", "documents")


# ------------------------------------------------------------- boilerplate


def test_boilerplate_detects_shared_ngrams(spark):
    rows = [
        (1, "copyright two thousand all rights reserved alpha beta"),
        (2, "copyright two thousand all rights reserved gamma delta"),
        (3, "copyright two thousand all rights reserved epsilon zeta"),
        (4, "a completely unrelated document with fresh unique words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    freq = {
        r.ng: r.n_docs
        for r in CU.frequent_shingles(df, n=5, min_docs=3).collect()
    }
    # the two 5-gram shifts fully inside the shared 6-word prefix
    # appear in docs 1-3; shingles touching the unique tail words (and
    # everything from doc 4) don't qualify
    assert freq == {
        "copyright two thousand all rights": 3,
        "two thousand all rights reserved": 3,
    }

    rep = {
        r.doc_id: (r.n_shingles, r.n_boiler, r.boiler_permille)
        for r in CU.boilerplate_report(df, n=5, min_docs=3).collect()
    }
    assert rep[4] == (4, 0, 0)  # 8 words -> 4 distinct 5-grams, clean
    assert rep[1] == (4, 2, 500)  # 2/4 shingles are boilerplate


def test_boilerplate_report_covers_every_doc(spark):
    docs = _docs(spark)
    rep = CU.boilerplate_report(docs, n=5, min_docs=3)
    assert rep.count() == docs.count()
    bad = rep.filter(
        (F.col("n_boiler") > F.col("n_shingles"))
        | (F.col("boiler_permille") > 1000)
    )
    assert bad.count() == 0


# --------------------------------------------------------------- keep-best


def test_keep_best_picks_longest_then_smallest_id(spark):
    rows = [
        (10, "g1", 500),
        (11, "g1", 900),   # longest in g1 -> canonical
        (12, "g1", 900),   # same length, larger id -> loses tie
        (20, "g2", 100),   # singleton group keeps itself
    ]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "n_chars"])
    out = {r.doc_id: (r.keep_id, r.is_kept)
           for r in CU.keep_best(df, "grp", "n_chars").collect()}
    assert out[10] == (11, False)
    assert out[11] == (11, True)
    assert out[12] == (11, False)
    assert out[20] == (20, True)


def test_keep_best_on_normalized_key_is_exhaustive(spark):
    docs = _docs(spark)
    keyed = docs.withColumn(
        "grp", CU.normalized_content_key(F.col("text"), 80)
    )
    out = CU.keep_best(keyed, "grp", "n_chars")
    # exactly one canonical per group, every keep_id is a member
    per_grp = out.groupBy("grp").agg(
        F.sum(F.col("is_kept").cast("int")).alias("n_kept"),
        F.count(F.lit(1)).alias("n"),
    )
    assert per_grp.filter(F.col("n_kept") != 1).count() == 0
    members = out.select("grp", "doc_id")
    canon = out.select("grp", F.col("keep_id").alias("doc_id")).distinct()
    assert canon.join(members, ["grp", "doc_id"], "left_anti").count() == 0


# ------------------------------------------------------------ epoch shuffle


def test_epoch_shuffle_is_dense_permutation(spark):
    docs = _docs(spark)
    n = docs.count()
    out = CU.epoch_shuffle(docs, "doc_id", epoch=1)
    pos = sorted(r.pos for r in out.select("pos").collect())
    assert pos == list(range(1, n + 1))


def test_epoch_shuffle_matches_global_sort_any_bucket_count(spark):
    docs = _docs(spark).limit(200)
    from mtail_spark.operators.dedup import md5_long

    h = md5_long(
        F.concat(F.lit("shuffle-2-"), F.col("doc_id").cast("string"))
    )
    want = [
        r.doc_id
        for r in docs.select("doc_id", h.alias("h"))
        .orderBy("h", "doc_id")
        .collect()
    ]
    for nb in (1, 4, 1024):
        got = {
            r.doc_id: r.pos
            for r in CU.epoch_shuffle(
                docs, "doc_id", epoch=2, n_buckets=nb
            ).collect()
        }
        assert [d for d, _ in sorted(got.items(), key=lambda kv: kv[1])] \
            == want
    # a different epoch is a different permutation
    other = {
        r.doc_id: r.pos
        for r in CU.epoch_shuffle(docs, "doc_id", epoch=3).collect()
    }
    assert [d for d, _ in sorted(other.items(), key=lambda kv: kv[1])] \
        != want


# ---------------------------------------------------------------- mixture


def test_mixture_rates_hit_budget_and_cap(spark):
    docs = _docs(spark).withColumn(
        "toks", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    rates = {
        r.source: (r.total_toks, r.rate_ppm)
        for r in CU.mixture_rates(
            docs, "source", "toks",
            {"src1": 0.5}, token_budget=10 ** 9,
        ).collect()
    }
    # absurd budget -> capped at 100%
    assert rates["src1"][1] == 1_000_000
    # zero default weight -> everything else rate 0
    assert all(v[1] == 0 for k, v in rates.items() if k != "src1")

    small = CU.mixture_rates(
        docs, "source", "toks", {"src1": 0.5}, token_budget=1000
    )
    row = small.filter(F.col("source") == "src1").collect()[0]
    import math

    assert row.rate_ppm == min(
        10 ** 6, math.floor(10 ** 6 * (0.5 * 1000.0) / row.total_toks)
    )


def test_mixture_sample_deterministic_and_rate_bounded(spark):
    docs = _docs(spark).withColumn(
        "toks", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    kw = dict(weights={"src1": 0.9}, token_budget=1000,
              default_weight=0.2)
    a = {r.doc_id for r in
         CU.mixture_sample(docs, "source", "toks", **kw).collect()}
    b = {r.doc_id for r in
         CU.mixture_sample(docs, "source", "toks", **kw).collect()}
    assert a == b and len(a) > 0


# ------------------------------------------------------------ chunk windows


def test_chunk_fixed_windows_hand_example(spark):
    rows = [("A", 1, 100), ("A", 2, 300), ("A", 3, 250), ("B", 9, 10)]
    df = spark.createDataFrame(rows, ["src", "doc_id", "toks"])
    chunks = PK.chunk_fixed_windows(df, "toks", 256, "src", "doc_id")
    got = {
        (r.src, r.doc_id, r.chunk_id): r.toks_in_chunk
        for r in chunks.collect()
    }
    assert got == {
        ("A", 1, 0): 100,          # [0,100)
        ("A", 2, 0): 156,          # [100,400) -> 156 in chunk 0
        ("A", 2, 1): 144,          # ...144 in chunk 1
        ("A", 3, 1): 112,          # [400,650) -> 112 in chunk 1
        ("A", 3, 2): 138,          # ...138 in chunk 2
        ("B", 9, 0): 10,           # shard B restarts at offset 0
    }


def test_chunk_fixed_windows_conservation(spark):
    docs = _docs(spark).withColumn(
        "toks", F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    )
    chunks = PK.chunk_fixed_windows(docs, "toks", 128, "source", "doc_id")
    # every token lands in exactly one chunk
    per_doc = chunks.groupBy("source", "doc_id").agg(
        F.sum("toks_in_chunk").alias("s"), F.min("toks").alias("t")
    )
    assert per_doc.filter(F.col("s") != F.col("t")).count() == 0
    # chunks are full except each shard's last one
    per_chunk = chunks.groupBy("source", "chunk_id").agg(
        F.sum("toks_in_chunk").alias("fill")
    )
    last = per_chunk.groupBy("source").agg(
        F.max("chunk_id").alias("chunk_id")
    )
    full = per_chunk.join(last, ["source", "chunk_id"], "left_anti")
    assert full.filter(F.col("fill") != 128).count() == 0
