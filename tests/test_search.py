"""Keyword search (operators/search.py): inverted index, document
frequency, BM25-shaped integer scoring, deterministic top-k."""

from pyspark.sql import functions as F

import mtail_spark.operators.search as SR


def _corpus(spark):
    rows = [
        (1, "spark spark spark merge"),      # heavy on a rare-ish term
        (2, "spark merge window window"),    # broad coverage
        (3, "the the the the the"),          # matches nothing
        (4, "window"),                       # single hit
        (5, "spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_and_df(spark):
    post = {
        (r.term, r.doc_id): r.tf
        for r in SR.postings(_corpus(spark)).collect()
    }
    assert post[("spark", 1)] == 3
    assert post[("window", 2)] == 2
    assert ("spark", 3) not in post
    dfreq = {r.term: r.df for r in SR.doc_freq(SR.postings(_corpus(spark))).collect()}
    assert dfreq["spark"] == 3 and dfreq["window"] == 2 and dfreq["the"] == 1


def test_search_topk_order_and_determinism(spark):
    corpus = _corpus(spark)
    out = SR.search_topk(corpus, ["spark", "window"], k=3)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    # doc 3 (no query term) never appears
    assert all(r.doc_id != 3 for r in rows)
    # doc 2 matches both terms incl. tf=2 window; it must beat the
    # single-hit docs 4 and 5
    assert rows[0].doc_id == 2 and rows[0].n_terms_matched == 2
    # ranks are 1..k and scores non-increasing
    assert [r.rank for r in rows] == [1, 2, 3]
    assert all(
        rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1)
    )
    again = sorted(
        SR.search_topk(corpus, ["spark", "window"], k=3).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.doc_id, r.score) for r in rows] == \
        [(r.doc_id, r.score) for r in again]


def test_search_case_folding_and_k_bound(spark):
    corpus = _corpus(spark)
    upper = SR.search_topk(corpus, ["SPARK"], k=100)
    lower = SR.search_topk(corpus, ["spark"], k=100)
    assert sorted((r.doc_id, r.score) for r in upper.collect()) == \
        sorted((r.doc_id, r.score) for r in lower.collect())
    # k larger than the hit set returns every hit exactly once
    assert upper.count() == 3


def test_search_plan_is_take_ordered(spark):
    """The global top-k must compile to TakeOrderedAndProject, not a
    full single-partition sort of the scored set."""
    import io
    import contextlib

    corpus = _corpus(spark)
    df = SR.search_topk(corpus, ["spark"], k=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_prebuilt_index_matches_inline_and_skips_explode(spark, tmp_path):
    """substring_search(index=stored) must return the same rows as the
    inline build, and its plan must contain NO Generate (explode) node
    — the corpus is exploded once at index-build time only."""
    corpus = _corpus(spark)
    needle = "spark merge"
    inline = sorted(
        map(tuple, SR.substring_search(corpus, needle).collect())
    )
    path = str(tmp_path / "idx.parquet")
    SR.build_trigram_index(corpus).write.parquet(path)
    idx = spark.read.parquet(path)
    via_index = SR.substring_search(corpus, needle, index=idx)
    assert sorted(map(tuple, via_index.collect())) == inline
    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan
