"""Round-2 pipeline operators: duplicate-group connected components,
repetition-ratio quality, PII scrub, embedding-cosine near-dup."""

import pyspark.sql.functions as F

from mtail_spark.operators import dedup as D
from mtail_spark.operators import similarity as S
from mtail_spark.operators import textstats as TX


def test_connected_components_chains_and_islands(spark):
    # components: {1,2,3,4} (a chain), {10,11}, pair graph only
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    rows = {
        r["doc_id"]: (r["group_id"], r["group_size"])
        for r in D.connected_components(pairs).collect()
    }
    assert rows == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 2), 11: (10, 2),
    }


def test_connected_components_long_chain_converges(spark):
    # a 20-node path needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], ["id_a", "id_b"]
    )
    out = D.connected_components(pairs).collect()
    assert len(out) == 21
    assert {r["group_id"] for r in out} == {0}
    assert all(r["group_size"] == 21 for r in out)


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # bigrams: ab ba ab ba ab -> 2 distinct/5
            (2, "all words differ entirely"),
            (3, "one"),             # shorter than the ngram
        ],
        ["id", "t"],
    )
    got = {
        r["id"]: r["rep"]
        for r in df.select(
            "id", TX.repetition_ratio(F.col("t"), 2).alias("rep")
        ).collect()
    }
    assert abs(got[1] - (1 - 2 / 5)) < 1e-12
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.org from 192.168.0.1 call +44 20 7946 0958 ok")],
        ["id", "t"],
    )
    r = df.select(
        TX.pii_counts(F.col("t"), "email").alias("e"),
        TX.pii_counts(F.col("t"), "ipv4").alias("i"),
        TX.pii_counts(F.col("t"), "phone").alias("p"),
        TX.pii_scrub(F.col("t")).alias("s"),
    ).collect()[0]
    assert (r["e"], r["i"], r["p"]) == (1, 1, 1)
    assert r["s"] == "mail <EMAIL> from <IP> call <PHONE> ok"


def test_cosine_dup_pairs_symmetric_identical_vectors(spark):
    # identical vectors share every bucket and have cosine 1.0
    rows = [(1, [1.0, 0.0, 2.0, 3.0]), (2, [1.0, 0.0, 2.0, 3.0]),
            (3, [-5.0, 1.0, 0.0, 0.25])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = S.cosine_dup_pairs(df, threshold=0.99, n_planes=3, dim=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert abs(out[0]["cos_sim"] - 1.0) < 1e-12


def test_connected_components_matches_union_find(spark):
    """Property check vs a reference union-find on a pseudo-random
    pair graph (deterministic seed)."""
    import random

    rng = random.Random(20260813)
    nodes = list(range(1, 61))
    pairs = []
    for _ in range(45):
        a, b = rng.sample(nodes, 2)
        pairs.append((min(a, b), max(a, b)))
    pairs = sorted(set(pairs))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {}
    for a, b in pairs:
        expected[a] = find(a)
        expected[b] = find(b)
    sizes = {}
    for n, g in expected.items():
        sizes[g] = sizes.get(g, 0) + 1

    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r["doc_id"]: (r["group_id"], r["group_size"])
        for r in D.connected_components(df).collect()
    }
    assert got == {
        n: (g, sizes[g]) for n, g in expected.items()
    }


def test_lm_xent_hand_computed(spark):
    # corpus: "a b a b" and "a c"; unigrams a:3 b:2 c:1;
    # bigrams "a b":2 "b a":1 "a c":1
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo"), (4, "")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r for r in TX.lm_xent(docs, "doc_id", "text").collect()
    }
    m = lambda num, den: round((math.log(den) - math.log(num)) * 1e6)
    # doc 1: a b (c=2/ctx a=3), b a (1/2), a b (2/3)
    d1 = m(2, 3) + m(1, 2) + m(2, 3)
    assert (rows[1]["n_bigrams"], rows[1]["xent_micronats"]) == (3, d1)
    assert rows[1]["xent_avg_micronats"] == d1 // 3
    # doc 2: a c (1/3)
    assert (rows[2]["n_bigrams"], rows[2]["xent_micronats"]) == (1, m(1, 3))
    # <2 tokens -> zero score, rows preserved
    assert (rows[3]["n_bigrams"], rows[3]["xent_micronats"]) == (0, 0)
    assert (rows[4]["n_bigrams"], rows[4]["xent_avg_micronats"]) == (0, 0)


def test_lm_xent_case_folded(spark):
    docs = spark.createDataFrame(
        [(1, "The cat"), (2, "the cat")], ["doc_id", "text"]
    )
    rows = TX.lm_xent(docs).collect()
    # both docs are the same bigram after lowercasing: p = 2/2 -> 0
    assert all(r["xent_micronats"] == 0 for r in rows)


def test_semantic_dedup_keep_rule(spark):
    # cluster A near (1,0,...): ids 0,1 near-identical (drop 1), id 2
    # orthogonal-ish within same half-space; cluster B near (-1,...)
    dim = 4
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # ~cos 1 with id 0 -> dropped
        (2, [-1.0, 0.0, 0.0, 0.0]),
        (3, [-0.999, -0.02, 0.0, 0.0]),  # ~cos 1 with id 2 -> dropped
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r["keep"]
        for r in S.semantic_dedup(
            df, k=2, iters=2, threshold=0.9, dim=dim
        ).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: False}


def test_duplicate_spans_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # spans(k=3): abc bcd cde
            (2, "a b c x y"),   # abc bcx cxy -> abc duplicated
            (3, "z z z z"),     # zzz zzz -> intra-doc repeat counts
            (4, "u v"),         # <k tokens -> 0 spans
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in D.duplicate_spans(docs, "doc_id", "text", k=3).collect()
    }
    assert (rows[1]["n_spans"], rows[1]["n_dup_spans"]) == (3, 1)
    assert (rows[2]["n_spans"], rows[2]["n_dup_spans"]) == (3, 1)
    assert (rows[3]["n_spans"], rows[3]["n_dup_spans"]) == (2, 2)
    assert rows[3]["dup_permille"] == 1000
    assert (rows[4]["n_spans"], rows[4]["dup_permille"]) == (0, 0)
    assert rows[1]["dup_permille"] == 333


def test_perplexity_buckets_terciles_and_rates(spark):
    # 9 docs in one language with strictly increasing xent (unique
    # word pairs score higher than the repeated common pair)
    rows = [(i, "en", ("common pair " * (10 - i)) + f"rare{i} tok{i}")
            for i in range(1, 10)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r.doc_id: r for r in TX.perplexity_buckets(docs).collect()}
    assert len(out) == 9
    buckets = [out[i].bucket for i in sorted(out)]
    # terciles of 9 = 3/3/3, ordered by score which rises with doc_id
    assert buckets.count("head") == 3
    assert buckets.count("middle") == 3
    assert buckets.count("tail") == 3
    # score is monotone in doc_id here, so bucket order is clean
    assert buckets == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # head rate is 100%: every head doc is kept
    assert all(out[i].kept for i in sorted(out)[:3])


def test_perplexity_buckets_language_isolation(spark):
    # thresholds are PER LANGUAGE: one language's outliers must not
    # shift another's buckets
    # distinct scores within each language (ties share a bucket by
    # design, so each doc needs its own xent value)
    en = [(i, "en", ("common pair " * (5 - i)) + f"rare{i} tok{i}")
          for i in range(1, 4)]
    de = [(10 + i, "de", ("der hund " * (5 - i)) + f"wort{i} nr{i}")
          for i in range(1, 4)]
    docs = spark.createDataFrame(en + de, ["doc_id", "lang", "text"])
    out = TX.perplexity_buckets(docs).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.bucket)
    # each 3-doc language fills its own head/middle/tail
    for lang, bs in by_lang.items():
        assert sorted(bs) == ["head", "middle", "tail"], (lang, bs)


def test_bpe_merge_pairs_hand_counted(spark):
    docs = spark.createDataFrame(
        [(1, "aab aab"), (2, "aab ab")], ["doc_id", "text"]
    )
    out = {r.pair: (r.n_occurrences, r.rank)
           for r in TX.bpe_merge_pairs(docs, k=10).collect()}
    # vocab: aab x3, ab x1. pairs per word: aab -> aa, ab; ab -> ab
    # counts: aa = 3, ab = 3 + 1 = 4
    assert out == {"ab": (4, 1), "aa": (3, 2)}


def test_bpe_merge_pairs_counts_multiplicity(spark):
    # overlapping pairs in one word count every occurrence ("aaa" has
    # TWO "aa" pairs) — array_distinct would undercount
    docs = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    out = {r.pair: r.n_occurrences
           for r in TX.bpe_merge_pairs(docs, k=5).collect()}
    assert out == {"aa": 2}


def test_linear_quality_score_hand_computed(spark):
    import hashlib

    def w(bg):
        h = int(hashlib.md5(f"qcw-{bg}".encode()).hexdigest()[:15], 16)
        return h % 1001 - 500

    docs = spark.createDataFrame(
        [(1, "Alpha beta gamma"), (2, "x"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TX.linear_quality_score(docs).collect()}
    # bigrams of doc 1 (lowercased): "alpha beta", "beta gamma"
    exp = w("alpha beta") + w("beta gamma")
    assert out[1].n_feats == 2 and out[1].score == exp
    assert out[1].keep == (exp >= 0)
    # <2 tokens and empty docs: zero features, score 0, kept
    assert (out[2].n_feats, out[2].score, out[2].keep) == (0, 0, True)
    assert (out[3].n_feats, out[3].score, out[3].keep) == (0, 0, True)


def test_curation_pipeline_v2_stage_properties(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    out = E.q_curation_pipeline_v2(spark, sf).collect()
    assert all(r.bucket in ("head", "middle", "tail") for r in out)
    assert all(r.n_docs > 0 and r.sum_tokens >= 0 for r in out)
    # survivors are a subset of the classifier-gated new shard: the
    # pipeline's doc universe can never exceed it
    docs = E._t(spark, sf, "documents")
    new = docs.filter(F.col("doc_id") % 3 != 0)
    gated = TX.linear_quality_score(new).filter(F.col("keep")).count()
    assert sum(r.n_docs for r in out) <= gated
