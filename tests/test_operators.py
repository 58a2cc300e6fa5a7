"""Unit tests for extension operators on tiny in-memory data."""

import pyspark.sql.functions as F
import pytest

from mtail_spark.operators import dedup as D
from mtail_spark.operators import similarity as S
from mtail_spark.operators import textstats as TX
from mtail_spark.operators import multimodal as M


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique text")],
        ["id", "text"],
    )
    out = D.exact_dup_groups(df, "text", "id").collect()
    assert len(out) == 1
    assert out[0]["n_copies"] == 2
    assert out[0]["keep_id"] == 1


def test_minhash_identical_docs_pair(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different words entirely here")],
        ["id", "text"],
    )
    pairs = D.minhash_lsh_pairs(df, "id", "text", 16, 8, 3, 0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] == 1.0


def test_incremental_minhash_flags_only_cross_set_dups(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words entirely here in this one text"
    new = spark.createDataFrame(
        [(10, text), (11, other), (12, other)], ["id", "text"]
    )
    base = spark.createDataFrame(
        [(1, text), (2, "nothing shared with anything at all truly")],
        ["id", "text"],
    )
    out = D.incremental_minhash_dups(new, base, "id", "text", 16, 8, 3, 0.9)
    rows = out.collect()
    # 10 duplicates base doc 1; 11/12 duplicate each other but that is
    # WITHIN the new shard — deliberately not reported
    assert [(r["new_id"], r["base_id"], r["jaccard"]) for r in rows] == [
        (10, 1, 1.0)
    ]


def test_incremental_minhash_matches_self_join_cross_subset(spark):
    from mtail_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    is_new = (F.col("doc_id") % 3) == 0
    inc = {
        (r["new_id"], r["base_id"])
        for r in D.incremental_minhash_dups(
            docs.filter(is_new), docs.filter(~is_new), "doc_id", "text"
        ).collect()
    }
    full = D.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    want = set()
    for r in full:
        a_new, b_new = r["id_a"] % 3 == 0, r["id_b"] % 3 == 0
        if a_new != b_new:
            want.add(
                (r["id_a"], r["id_b"]) if a_new else (r["id_b"], r["id_a"])
            )
    assert inc == want and len(want) > 0


def test_sample_frames_explodes_videos_only(spark):
    docs = spark.createDataFrame(
        [(1, "some video text"), (2, "an image only")], ["doc_id", "text"]
    )
    media = M.synthesize_media(docs, "doc_id", "text").withColumn(
        "duration_ms",
        F.when(F.col("media_id") == 1, F.lit(900)).cast("long"),
    )
    rows = M.sample_frames(media, every_ms=250, feat_dim=4).collect()
    # 900 ms at 250 ms steps -> t = 0, 250, 500, 750 (4 frames);
    # the NULL-duration image contributes nothing
    assert [(r.media_id, r.frame_idx, r.t_ms) for r in rows] == [
        (1, 0, 0), (1, 1, 250), (1, 2, 500), (1, 3, 750)
    ]
    assert all(len(r.frame_feature) == 4 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.frame_feature)
    # the honest codec stub is still the real-decoder path
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        M.sample_frames(media, every_ms=250, real_codec=True)


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        ["id", "text"],
    )
    rows = {
        r["id"]: r["sh"]
        for r in df.select("id", D.simhash(F.col("text")).alias("sh")).collect()
    }
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 < d13


def test_knn_bruteforce_self_is_nearest(spark):
    vecs = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = S.knn_bruteforce(df, df, k=1).collect()
    for r in out:
        assert r["query_id"] == r["corpus_id"]
        assert r["cos_sim"] == pytest.approx(1.0)


def test_hyperplane_sig_deterministic(spark):
    planes = S.make_planes(4, 4)
    df = spark.createDataFrame([(1, [0.5, -0.25, 0.1, 0.9])], ["id", "v"])
    a = df.select(S.hyperplane_signature("v", planes).alias("s")).collect()[0]["s"]
    b = df.select(S.hyperplane_signature("v", planes).alias("s")).collect()[0]["s"]
    assert a == b
    assert 0 <= a < 16


def test_textstats(spark):
    df = spark.createDataFrame(
        [(1, "The cat sat on the mat, and it was happy!")], ["id", "text"]
    )
    row = df.select(
        TX.token_count_ws(F.col("text")).alias("ws"),
        TX.token_count_bpe(F.col("text")).alias("bpe"),
        TX.lang_id(F.col("text")).alias("lang"),
        TX.quality_score(F.col("text")).alias("q"),
    ).collect()[0]
    assert row["ws"] == 10
    assert row["bpe"] == 12  # 10 words + comma + bang
    assert row["lang"] == "en"
    assert 0 <= row["q"] <= 100


def test_multimodal_feature_extraction(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "defg")], ["doc_id", "text"])
    media = M.synthesize_media(df, "doc_id", "text")
    feats = M.extract_features(media, out_dim=4).collect()
    assert len(feats) == 2
    for r in feats:
        assert r["n_bytes"] == 32  # md5 hex utf-8
        assert len(r["feature"]) == 4


def test_multimodal_codec_surfaces(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    media = M.synthesize_media(df, "doc_id", "text")
    # resize_images is REAL as of r9 for stdlib-decodable formats
    # (PPM/BMP, tests/test_codecs.py); the synthetic md5-hex payload
    # matches no magic, so it comes back as an explicit NULL row
    rows = M.resize_images(media, 10, 10).collect()
    assert len(rows) == 1 and rows[0].payload is None
    # video decode stays an honest env-blocked stub
    with pytest.raises(NotImplementedError):
        M.sample_frames(media, 1000, real_codec=True)


def test_knn_gemm_matches_bruteforce(spark):
    import random

    rnd = random.Random(7)
    vecs = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter("vec_id < 3")
    c = df.filter("vec_id >= 3")
    bf = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in S.knn_bruteforce(c, q, k=4, dim=8).collect()
    }
    gm = {
        (r["query_id"], r["rank"]): r["corpus_id"]
        for r in S.knn_gemm(c, q, k=4, dim=8).collect()
    }
    assert bf == gm


def test_knn_pq_compresses_and_ranks(spark):
    import random

    rnd = random.Random(11)
    dim = 16
    # two tight clusters far apart: PQ must rank same-cluster vectors
    # above cross-cluster ones even through 4 subspace codes
    def vec(center):
        return [center + rnd.uniform(-0.05, 0.05) for _ in range(dim)]

    rows = [(i, vec(0.8)) for i in range(10)] + [
        (100 + i, vec(-0.8)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id").isin(0, 100))
    corpus = df.filter(~F.col("vec_id").isin(0, 100))
    out = S.knn_pq(corpus, queries, k=5, m_sub=4, ksub=8, dim=dim).collect()
    assert len(out) == 10  # 2 queries x k
    for r in out:
        same_cluster = (r.query_id < 50) == (r.corpus_id < 50)
        assert same_cluster, (r.query_id, r.corpus_id, r.adc_dist)
    # ranks are 1..k per query, distances nondecreasing in rank
    for qid in (0, 100):
        rs = sorted(
            (r for r in out if r.query_id == qid), key=lambda r: r.rank
        )
        assert [r.rank for r in rs] == [1, 2, 3, 4, 5]
        ds = [r.adc_dist for r in rs]
        assert ds == sorted(ds)


def test_pq_codes_bounded_and_deterministic(spark):
    rows = [(i, [float((i * 7 + j) % 5) / 5 for j in range(16)])
            for i in range(20)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    books = S.make_pq_codebooks(4, 8, 16)
    codes = (
        df.select(
            "vec_id",
            S.pq_encode_udf(books)(
                S.as_double(F.col("embedding"))
            ).alias("codes"),
        )
        .collect()
    )
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)
    # codebooks are pure md5 literals: a second build is identical
    assert books == S.make_pq_codebooks(4, 8, 16)


def test_knn_pq_rerank_recovers_exact_top1(spark):
    import random

    rnd = random.Random(23)
    dim = 16
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 2)
    corpus = df.filter(F.col("vec_id") >= 2)
    exact = {
        r.query_id: r.corpus_id
        for r in S.knn_bruteforce(corpus, queries, k=1).collect()
    }
    # a generous shortlist makes the exact rerank recover the true
    # top-1 even through the lossy 4x8 quantizer
    two_stage = {
        r.query_id: r.corpus_id
        for r in S.knn_pq_rerank(
            corpus, queries, k=1, shortlist=20, m_sub=4, ksub=8, dim=dim
        ).collect()
    }
    assert two_stage == exact


def test_hard_negatives_excludes_same_label(spark):
    rows = [
        # label 0 cluster near +1, label 1 cluster near -1, and one
        # label-1 vector sitting INSIDE the label-0 cluster (the hard
        # negative a contrastive objective wants surfaced)
        (0, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.98, 0.02], 0),
        (4, [0.97, 0.05], 1),   # hard negative for query 0
        (5, [-1.0, 0.0], 1),
        (6, [-0.99, 0.01], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    queries = df.filter(F.col("vec_id") == 0)
    corpus = df.filter(F.col("vec_id") > 0)
    out = sorted(
        S.hard_negatives(corpus, queries, k=2).collect(),
        key=lambda r: r.rank,
    )
    assert all(r.neg_label != r.query_label for r in out)
    # the in-cluster wrong-label vector must rank first
    assert out[0].corpus_id == 4 and out[0].rank == 1


def test_knn_gemm_boundary_tie_keeps_lowest_id(spark):
    """Exact-duplicate vectors tied AT the local-top-k cutoff must
    resolve to the LOWEST corpus id (found by fuzz_parity seed 5:
    argpartition picked arbitrarily among equal values before the
    id tie-break ran, silently dropping the lower id)."""
    dim = 8
    q = [(100, [1.0] * dim)]
    # ids 1..5 all EXACTLY tied (same vector); k=2 cuts inside the tie
    corpus = [(i, [0.5] * dim) for i in range(1, 6)]
    df = spark.createDataFrame(q + corpus, ["vec_id", "embedding"])
    out = sorted(
        S.knn_gemm(
            df.filter(F.col("vec_id") < 100),
            df.filter(F.col("vec_id") == 100),
            k=2, dim=dim,
        ).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.corpus_id, r.rank) for r in out] == [(1, 1), (2, 2)]


def test_simhash_pairs_pigeonhole_complete(spark):
    """The block join must find EVERY pair within max_hamming (the
    pigeonhole guarantee) — verified against the brute-force pairs of
    the fingerprint table — and nothing above the threshold."""
    rows = [
        (1, "alpha beta gamma delta common words here"),
        (2, "alpha beta gamma delta common words here"),   # identical
        (3, "alpha beta gamma delta common words there"),  # near
        (4, "completely different content entirely other"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_pairs(
            docs, "doc_id", "text", 32, n_blocks=4, max_hamming=3
        ).collect()
    }
    fp = {r["doc_id"]: r["simhash"]
          for r in D.simhash_table(docs, "doc_id", "text", 32).collect()}
    want = {}
    ids = sorted(fp)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(fp[a] ^ fp[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0  # identical docs


def test_hyperplane_sigs_udf_matches_expression(spark):
    """The Arrow signature kernel must be BIT-identical to the
    literal-expression form — same sequential dim fold, so the same
    sign decisions even at near-zero dots.  This is what licenses
    knn_lsh_multi / cosine_dup_pairs to use the kernel while their
    DuckDB oracles mirror the expression arithmetic."""
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(200)
    ]
    # plant near-zero-dot stress: a vector orthogonal-ish to plane 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fams = [S.make_planes(4, 64, salt=f"lsh{t}:") for t in range(4)]
    via_udf = df.select(
        "vec_id", S.hyperplane_sigs_udf(fams)(F.col("embedding")).alias("s")
    ).collect()
    via_expr = df.select(
        "vec_id",
        F.array(
            *[S.hyperplane_signature("embedding", fam) for fam in fams]
        ).alias("s"),
    ).collect()
    a = {r["vec_id"]: list(r["s"]) for r in via_udf}
    b = {r["vec_id"]: list(r["s"]) for r in via_expr}
    assert a == b
