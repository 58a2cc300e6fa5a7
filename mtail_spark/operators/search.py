"""Distributed keyword search: inverted-index construction and
BM25-shaped top-k retrieval.

The canonical text query at corpus scale.  Shape:

- The POSTINGS list (term -> doc, tf) is the corpus exploded once and
  aggregated by (term, doc) — one shuffle, map-side partial counts.
  At 100 TB this is the materialized inverted index; here it stays a
  DataFrame any downstream query composes with.
- DOCUMENT FREQUENCY (term -> df) aggregates the postings once more —
  vocabulary-sized, not corpus-sized.
- A QUERY is a handful of terms: broadcast them, semi-join the
  postings (index lookup, not a corpus scan), score, global top-k via
  the standard per-partition-top-k + final-k pattern (window over an
  already-k-bounded set).

Scoring is BM25-SHAPED but computed in exact integer arithmetic:
ln-idf is replaced by the rational surrogate
floor(SCALE * (N - df) / (N + df))  (monotone-decreasing in df, like
idf) and tf-saturation by floor(SCALE * tf / (tf + K1)) (BM25's
tf/(tf+k) curve with the length term dropped).  Rationale: every
operation is integer or exactly-specified IEEE division+floor, so the
DuckDB oracle reproduces scores bit-for-bit — transcendental ln()
may differ by ULPs across math libraries and would turn a correct
engine red.  A production deployment would swap `_idf`/`_sat` for the
ln form; the distributed shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import words

SCALE = 1_000_000


def postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index as a DataFrame: (term, doc, tf).  Lowercased
    whitespace tokens; one explode + one aggregation."""
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the tokenize + explode run
    # map-side in the scan stage (search_topk sf1 0.98 s → 0.84 s,
    # tfidf_top_terms 2.86 s → 2.54 s from the free retune)
    corpus = ensure_parallelism(corpus, corpus.sparkSession,
                                tune_only=True)
    return (
        corpus.select(
            F.col(id_col),
            # explode_outer: codegen Generate re-splits the text per
            # OUTPUT token for computed arrays (see dedup.simhash)
            F.explode_outer(words(F.lower(F.col(text_col)))).alias("term"),
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_freq(post: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """term -> number of documents containing it (vocabulary-sized)."""
    return post.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )


def _sat(tf, k1: int):
    """Integer tf-saturation: floor(SCALE * tf / (tf + k1))."""
    return F.floor(
        (tf.cast("long") * F.lit(SCALE)) / (tf.cast("long") + F.lit(k1))
    ).cast("long")


def _idf(df_col, n_docs):
    """Integer idf surrogate: floor(SCALE * (N - df) / (N + df)) —
    1-ish for rare terms, ~0 for ubiquitous ones.  n_docs may be a
    Python int or a Column (the 1-row corpus-count aggregate cross-
    joined into the plan, so no separate count action runs)."""
    n = (
        F.lit(int(n_docs))
        if isinstance(n_docs, int)
        else n_docs.cast("long")
    )
    return F.floor(
        (n - df_col.cast("long")) * F.lit(SCALE)
        / (n + df_col.cast("long"))
    ).cast("long")


def _n_docs_rel(corpus: DataFrame) -> DataFrame:
    """1-row relation carrying the corpus document count.  Cross-
    joined (broadcast) into scoring plans instead of an eager
    corpus.count(): keeps the whole query ONE logical plan — the
    count subquery is column-pruned to nothing, and at 100 TB it
    comes straight from parquet row-group metadata."""
    return corpus.agg(F.count(F.lit(1)).cast("long").alias("_n_docs"))


def build_trigram_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Character n-gram inverted index: (gram, doc) pairs, distinct
    per document (char_ngrams array_distincts before the explode, so
    no extra dedup shuffle is needed).

    This is the PREBUILT side of substring_search: at 100 TB it is
    written once as a table bucketed on `gram` (so the per-query
    candidate lookup is a bucket-pruned scan) and amortized across
    every grep that follows.  `substring_search(..., index=...)`
    consumes it without re-exploding the corpus."""
    from mtail_spark.operators.dedup import char_ngrams

    return corpus.select(
        F.col(id_col),
        F.explode_outer(char_ngrams(F.col(text_col), n)).alias("gram"),
    )


def substring_search(
    corpus: DataFrame,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    index: DataFrame | None = None,
) -> DataFrame:
    """Index-accelerated exact substring search (grep at corpus
    scale): a document can contain `needle` only if it contains every
    one of the needle's character n-grams, so candidates come from an
    n-gram inverted index and only THEY are verified by an actual
    substring scan.  Returns (doc_id, n_hits, first_pos) for true
    matches, with exact occurrence counts.

    At 100 TB the (gram, doc) index is a prebuilt bucketed table
    passed via `index=` (see build_trigram_index); the query side is
    len(needle)-gram-sized and broadcast, the candidate intersection
    is one count-filter aggregation, and the full-text verification
    scan touches candidates only — the corpus is never regex-scanned.
    With index=None it builds inline from the same scan.

    SNAPSHOT CONTRACT (ADVICE r7): a prebuilt `index=` must come from
    the SAME corpus snapshot as `corpus` — candidates are intersected
    against the index but VERIFIED against `corpus`, so a stale index
    drops documents added since the build (missed hits) and ghosts
    deleted ones into the verify join (harmless but wasted work).
    Rebuild or incrementally append the index with the corpus."""
    assert len(needle) >= n
    qgrams = sorted({needle[i:i + n] for i in range(len(needle) - n + 1)})
    spark = corpus.sparkSession
    q = spark.createDataFrame([(g,) for g in qgrams], ["gram"])
    if index is None:
        index = build_trigram_index(corpus, id_col, text_col, n)
    # literal IN-filter ahead of the join: semantically redundant with
    # the broadcast join but it reaches the index SCAN — parquet
    # row-group min/max pruning, and bucket pruning when the stored
    # index is bucketed on gram (SelectedBucketsCount in the plan)
    index = index.filter(F.col("gram").isin(qgrams))
    cand = (
        index.join(F.broadcast(q), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .filter(F.col("n_grams") == len(qgrams))
        .select(id_col)
    )
    # escape the needle for the exact-occurrence regex count; the
    # candidate join is AQE-broadcast (match-count-sized) against the
    # text fetch
    import re as _re

    pat = _re.escape(needle)
    return (
        cand.join(corpus.select(id_col, text_col), id_col)
        .withColumn(
            "n_hits",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)
            ).cast("long"),
        )
        .filter(F.col("n_hits") > 0)
        .withColumn(
            "first_pos",
            F.locate(needle, F.col(text_col)).cast("long"),
        )
        .select(id_col, "n_hits", "first_pos")
    )


def tfidf_top_terms(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF term profile: the k highest-scoring terms
    of every document — the standard bag-of-words feature extraction
    (topic labeling, keyword indexing, near-dup blocking keys).

    score = tf * idf_ppm with the same integer idf surrogate as
    search_topk (floor(SCALE*(N-df)/(N+df)), ln-free so the DuckDB
    oracle reproduces scores bit-for-bit); tf is the raw in-document
    count, so the product is an exact BIGINT.  Ties break by
    ascending term, making the top-k fully deterministic.

    At 100 TB: the postings build is the corpus-sized shuffle (one
    explode + map-side-combined count); the df join is keyed on term
    (Zipf-skewed hot terms are AQE-split; never broadcast — the
    vocabulary is unbounded); the ranking window partitions by
    document, bounded by per-document vocabulary.  N is a broadcast
    1-row subquery inside the same plan — no separate count action."""
    post = postings(corpus, id_col, text_col)
    dfreq = doc_freq(post, id_col)
    scored = (
        post.join(dfreq, "term")
        .crossJoin(F.broadcast(_n_docs_rel(corpus)))
        .withColumn(
            "score",
            (
                F.col("tf").cast("long") * _idf(F.col("df"), F.col("_n_docs"))
            ).cast("long"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            "rank",
        )
    )


def search_topk(
    corpus: DataFrame,
    query_terms: list,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: int = 2,
    post: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query.

    score(doc) = sum over matched query terms of
                 idf(term) * sat(tf) / SCALE     (integer floor)

    The query-term list broadcasts (it is tiny by definition); the
    postings build is the only corpus-sized work — pass a prebuilt
    (term, doc, tf) table via `post=` (see postings(); bucketed on
    term in deployment, the same shape test_scale_features proves for
    the trigram index) and this just reads it.

    SNAPSHOT CONTRACT (ADVICE r7): a prebuilt `post=` table must come
    from the SAME corpus snapshot as `corpus` — idf uses the corpus
    document count, so a stale index silently skews scores.  A
    deployment stores n_docs next to the index and passes it via
    `n_docs=` so the pair travels together; with n_docs=None the
    count comes from `corpus` as a broadcast 1-row subquery inside
    the same plan — no separate count action.  Ties broken by
    ascending doc id, so top-k is fully deterministic."""
    spark = corpus.sparkSession
    if post is None:
        post = postings(corpus, id_col, text_col)
    ndocs_rel = (
        spark.range(1).select(F.lit(int(n_docs)).cast("long")
                              .alias("_n_docs"))
        if n_docs is not None
        else _n_docs_rel(corpus)
    )
    # literal IN-filter ahead of everything: it reaches the postings
    # scan (row-group / bucket pruning on a stored index), and df(term)
    # for the query terms is unchanged by dropping other terms' rows
    qlits = sorted({t.lower() for t in query_terms})
    post = post.filter(F.col("term").isin(qlits))
    dfreq = doc_freq(post, id_col)
    q = spark.createDataFrame(
        [(t.lower(),) for t in query_terms], ["term"]
    ).distinct()
    hits = (
        post.join(F.broadcast(q), "term")
        .join(F.broadcast(dfreq.join(F.broadcast(q), "term")), "term")
        .crossJoin(F.broadcast(ndocs_rel))
        .withColumn(
            "contrib",
            F.floor(
                (_idf(F.col("df"), F.col("_n_docs")) * _sat(F.col("tf"), k1))
                / F.lit(SCALE)
            ).cast("long"),
        )
    )
    scored = hits.groupBy(id_col).agg(
        F.sum("contrib").alias("score"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject: every partition
    # keeps its own top-k and only k-row heaps merge — no
    # single-partition sort even when a ubiquitous term matches half
    # the corpus.  The ranking window then runs over k rows only.
    top = scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))
