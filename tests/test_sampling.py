"""Deterministic sampling / split operators (operators/sampling.py)."""

from pyspark.sql import functions as F

import mtail_spark.operators.sampling as SP


def _docs(spark):
    from mtail_spark.session import load_table

    return load_table(spark, "/root/testdata/sf0.01", "documents")


def test_hash_sample_deterministic_and_near_rate(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in SP.hash_sample(docs, 0.3, "doc_id").collect()}
    b = {r.doc_id for r in SP.hash_sample(docs, 0.3, "doc_id").collect()}
    assert a == b  # reproducible: same rows every run
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # near the target rate
    # different salt -> a different (still deterministic) subset
    c = {
        r.doc_id
        for r in SP.hash_sample(docs, 0.3, "doc_id", salt="x").collect()
    }
    assert c != a
    # a smaller rate with the same salt is a SUBSET (nested samples:
    # the bucket threshold only moves)
    d = {r.doc_id for r in SP.hash_sample(docs, 0.1, "doc_id").collect()}
    assert d <= a


def test_stratified_rates_apply_per_stratum(spark):
    docs = _docs(spark)
    kept = SP.stratified_sample(
        docs, "lang", {"en": 0.0}, "doc_id", default_rate=1.0
    )
    by_lang = dict(
        (r.lang, r.n)
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert "en" not in by_lang  # rate 0 drops the stratum entirely
    total_other = docs.filter(F.col("lang") != "en").count()
    assert sum(by_lang.values()) == total_other  # default 1.0 keeps all


def test_split_assign_disjoint_total_stable(spark):
    docs = _docs(spark)
    s = SP.split_assign(
        docs, "doc_id",
        splits=[("train", 0.8), ("val", 0.1), ("test", 0.1)],
    )
    rows = s.select("doc_id", "split").collect()
    assert len(rows) == docs.count()  # every row assigned exactly once
    names = {r.split for r in rows}
    assert names <= {"train", "val", "test"}
    # stability under growth: assignment of a row is independent of
    # which other rows are present
    half = SP.split_assign(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id",
        splits=[("train", 0.8), ("val", 0.1), ("test", 0.1)],
    ).collect()
    full = {r.doc_id: r.split for r in rows}
    assert all(full[r.doc_id] == r.split for r in half)


def test_sample_plan_is_shuffle_free(spark):
    """The 100 TB property: sampling is a scan-side filter — no
    Exchange anywhere in the plan."""
    import contextlib
    import io

    docs = _docs(spark)
    df = SP.stratified_sample(
        docs, "lang", {"en": 0.2}, "doc_id", default_rate=0.5
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_dsir_logweights_hand_computed(spark):
    """Target-domain docs must outscore off-domain docs, and each
    term must match the Laplace-smoothed hand formula."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en"),
            (2, "the cat ran", "en"),
            (3, "der hund lief", "de"),
            (4, "x", "de"),  # <2 tokens -> no features
        ],
        ["doc_id", "text", "lang"],
    )
    target = docs.filter(F.col("lang") == "en")
    B = 8192
    out = {
        r["doc_id"]: r
        for r in SP.dsir_logweights(docs, target, n_buckets=B).collect()
    }
    # raw has 6 bigram tokens, target 4; bigram "the cat" occurs twice
    # in both raw and target
    n_raw, n_tgt = 6, 4

    def term(c_tgt, c_raw):
        return round(
            (
                math.log(c_tgt + 1)
                - math.log(n_tgt + B)
                - math.log(c_raw + 1)
                + math.log(n_raw + B)
            )
            * 1e6
        )

    assert out[1]["n_feats"] == 2
    assert out[1]["logw_micronats"] == term(2, 2) + term(1, 1)
    assert out[3]["logw_micronats"] == term(0, 1) + term(0, 1)
    assert out[1]["logw_micronats"] > out[3]["logw_micronats"]
    assert (out[4]["n_feats"], out[4]["logw_micronats"]) == (0, 0)


def test_group_holdout_split_never_straddles(spark):
    """Every row of a group lands in the SAME split (the leakage
    guard), and both splits are populated across enough groups."""
    import mtail_spark.operators.sampling as SP

    rows = [(i, f"src{i % 23}") for i in range(230)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = SP.split_assign(
        df, "source", splits=[("train", 0.8), ("val", 0.2)], salt="gsplit"
    ).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, set()).add(r.split)
    assert all(len(s) == 1 for s in by_group.values())
    seen = {next(iter(s)) for s in by_group.values()}
    assert seen == {"train", "val"}
