"""Corpus-profiling operators added in round 6: per-document TF-IDF
top terms (operators/search.py), per-source caps and exact order-stat
quantiles (operators/curation.py), and the k-means cluster profile
(operators/similarity.py)."""

from pyspark.sql import functions as F

import mtail_spark.operators.curation as CU
import mtail_spark.operators.search as SR
import mtail_spark.operators.similarity as S


def _docs(spark):
    from mtail_spark.session import load_table

    return load_table(spark, "/root/testdata/sf0.01", "documents")


def _emb(spark):
    from mtail_spark.session import load_table

    return load_table(spark, "/root/testdata/sf0.01", "embeddings")


# ------------------------------------------------------------------ tf-idf


def test_tfidf_prefers_rare_terms(spark):
    rows = [
        (1, "common common rare"),
        (2, "common other"),
        (3, "common thing"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df, r.score)
        for r in SR.tfidf_top_terms(df, k=2).collect()
    }
    # idf_ppm: df=1 -> floor(2e6/4)=500000; df=3 -> 0
    assert out[(1, 1)] == ("rare", 1, 1, 500_000)
    # "common" has df=3 = N -> idf 0; tf=2 keeps score 0 but still ranks
    # behind rare, ties break alphabetically
    assert out[(1, 2)][0] == "common"
    assert out[(2, 1)] == ("other", 1, 1, 500_000)


def test_tfidf_rank_bounded_and_exhaustive(spark):
    docs = _docs(spark)
    out = SR.tfidf_top_terms(docs, k=3)
    assert out.filter(F.col("rank") > 3).count() == 0
    # every document with at least one token gets a rank-1 term
    n_docs = docs.filter(F.trim("text") != "").count()
    assert out.filter(F.col("rank") == 1).count() == n_docs


# -------------------------------------------------------------- source cap


def test_source_cap_keeps_top_quality(spark):
    rows = [
        (1, "s1", 90),
        (2, "s1", 80),
        (3, "s1", 80),  # tie with 2 -> larger id ranks lower
        (4, "s2", 10),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
    out = {
        r.doc_id: (r.src_rank, r.is_kept)
        for r in CU.source_cap(df, cap=2).collect()
    }
    assert out[1] == (1, True)
    assert out[2] == (2, True)
    assert out[3] == (3, False)
    assert out[4] == (1, True)  # small source entirely kept


def test_source_cap_never_exceeds_cap(spark):
    docs = _docs(spark).withColumn("quality", F.col("n_chars"))
    kept = CU.source_cap(docs, cap=5).filter("is_kept")
    per_src = kept.groupBy("source").count()
    assert per_src.filter(F.col("count") > 5).count() == 0


# ---------------------------------------------------------- order-stat pXX


def test_order_stat_quantiles_hand_example(spark):
    rows = [("g", v, v) for v in range(1, 11)]  # values 1..10
    df = spark.createDataFrame(rows, ["source", "n_chars", "doc_id"])
    r = CU.order_stat_quantiles(df, "n_chars", "source").collect()[0]
    # type-1 quantiles: index ceil(p*n) -> p50=5, p90=9, p99=10
    assert (r.n_docs, r.p50, r.p90, r.p99) == (10, 5, 9, 10)


def test_order_stat_quantiles_monotone_and_member(spark):
    docs = _docs(spark)
    rows = CU.order_stat_quantiles(docs, "n_chars", "source").collect()
    vals = {
        s: set(
            r.n_chars
            for r in docs.filter(F.col("source") == s)
            .select("n_chars")
            .collect()
        )
        for s in {r.source for r in rows}
    }
    for r in rows:
        assert r.p50 <= r.p90 <= r.p99
        # order statistics are actual member values, not interpolations
        assert {r.p50, r.p90, r.p99} <= vals[r.source]


# ------------------------------------------------- global two-phase pXX


def _ranked_reference(vals, num, den):
    # the single-sort formulation the two-phase operator must match:
    # value at 1-based rank ceil(num*n/den) in ascending order
    n = len(vals)
    if n == 0:
        return None
    return sorted(vals)[(num * n + den - 1) // den - 1]


def test_global_order_stats_hand_example(spark):
    df = spark.createDataFrame([(v,) for v in range(1, 11)], ["v"])
    r = CU.global_order_stats(
        df, "v", {"p50": (1, 2), "p90": (9, 10)}, n_buckets=4
    ).collect()[0]
    assert (r.n, r.p50, r.p90) == (10, 5, 9)


def test_global_order_stats_matches_ranked_form(spark):
    import random

    rnd = random.Random(42)
    # heavy duplication + negative values + a huge outlier so target
    # ranks land on ties and buckets are skewed
    vals = (
        [rnd.randrange(-50, 50) for _ in range(400)]
        + [7] * 137
        + [10**12]
    )
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    r = CU.global_order_stats(
        df, "v", {"p50": (1, 2), "p90": (9, 10), "p99": (99, 100)}
    ).collect()[0]
    assert r.n == len(vals)
    assert r.p50 == _ranked_reference(vals, 1, 2)
    assert r.p90 == _ranked_reference(vals, 9, 10)
    assert r.p99 == _ranked_reference(vals, 99, 100)


def test_global_order_stats_empty_and_degenerate(spark):
    empty = spark.createDataFrame([], "v BIGINT")
    r = CU.global_order_stats(empty, "v", {"p50": (1, 2)}).collect()[0]
    assert (r.n, r.p50) == (0, None)
    # all-equal values: span collapses to ONE bucket
    same = spark.createDataFrame([(5,)] * 9, ["v"])
    r = CU.global_order_stats(same, "v", {"p50": (1, 2), "p90": (9, 10)})
    r = r.collect()[0]
    assert (r.n, r.p50, r.p90) == (9, 5, 5)
    # nulls are excluded like the ranked form excludes them
    withnull = spark.createDataFrame([(1,), (None,), (3,)], "v BIGINT")
    r = CU.global_order_stats(withnull, "v", {"p50": (1, 2)}).collect()[0]
    assert (r.n, r.p50) == (2, 1)


def test_global_order_stats_plan_has_no_global_window(spark):
    # the whole point: no Window node with an empty partition spec
    df = spark.createDataFrame([(v,) for v in range(100)], ["v"])
    out = CU.global_order_stats(df, "v", {"p50": (1, 2)})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_tag" in line, line


# ---------------------------------------------------------- cluster profile


def test_cluster_profile_partitions_corpus(spark):
    emb = _emb(spark)
    prof = S.cluster_profile(emb, k=8, iters=3).collect()
    assert sum(r.n_members for r in prof) == emb.count()
    assert all(0 <= r.cluster < 8 for r in prof)
    assert all(r.sum_sqd_micro >= 0 for r in prof)
    # representatives are real members of their cluster: recompute the
    # assignment with the shared deterministic kernel
    cents = S.kmeans_centroids(emb, k=8, iters=3)
    assigned = emb.select(
        F.col("vec_id"),
        S.nearest_centroid_udf(cents)(
            S.as_double(F.col("embedding"))
        ).alias("cluster"),
    )
    mins = {
        r.cluster: r.m
        for r in assigned.groupBy("cluster")
        .agg(F.min("vec_id").alias("m"))
        .collect()
    }
    for r in prof:
        assert mins[r.cluster] == r.min_member


def test_hist_quantiles_brackets_exact(spark):
    import mtail_spark.operators.curation as CU

    rows = [(i, "g", i) for i in range(1, 101)]  # values 1..100
    df = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    out = CU.hist_quantiles(df, "n_chars", "lang", bin_width=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 100
    # exact type-1 quantiles are 50 / 90 / 99; the bin LOWER bound
    # must bracket them from below within one bin width
    exact = CU.order_stat_quantiles(df, "n_chars", "lang").collect()[0]
    for est, true in ((r.p50_lo, exact.p50), (r.p90_lo, exact.p90),
                      (r.p99_lo, exact.p99)):
        assert est <= true < est + 10, (est, true)


def test_hist_quantiles_state_is_bin_bounded(spark):
    import mtail_spark.operators.curation as CU

    # a million-row group with values in [0, 640) produces <= 10 bins
    df = (
        spark.range(100000)
        .selectExpr("id AS doc_id", "'g' AS lang",
                    "CAST(id % 640 AS BIGINT) AS n_chars")
    )
    b = (
        df.selectExpr("CAST(n_chars AS BIGINT) DIV 64 AS b")
        .distinct()
        .count()
    )
    assert b == 10
    out = CU.hist_quantiles(df, "n_chars", "lang", bin_width=64).collect()
    assert out[0].n_docs == 100000


def test_hist_quantiles_negative_values_floor_binned(spark):
    import mtail_spark.operators.curation as CU

    # all values -1: the bin lower bound must be <= -1 (floor
    # division), not 0 (truncating DIV would report p50_lo = 0 > -1)
    df = spark.createDataFrame(
        [(i, "g", -1) for i in range(4)], ["doc_id", "lang", "n_chars"]
    )
    r = CU.hist_quantiles(df, "n_chars", "lang", bin_width=64).collect()[0]
    assert r.p50_lo == -64 and r.p50_lo <= -1 < r.p50_lo + 64
