"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

Pure JVM-side column expressions (regexp_count / split / array ops) —
these run at scan speed and pipeline into any downstream dedup or
filter without extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import md5_long, word_shingles, words

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic.  Order matters: deterministic argmax tiebreak.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por"],
}


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col)).cast("long")


def token_count_bpe(col: Column) -> Column:
    """BPE-ish sub-word unit count: word pieces + punctuation marks,
    the standard pre-tokenization regex family."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), 0)).cast("long")


def stopword_hits(col: Column, lang: str) -> Column:
    toks = words(F.lower(col))
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), stop)).cast("long")


def lang_id(col: Column) -> Column:
    """Stopword-hit argmax language guess with deterministic
    first-wins tiebreak; 'und' (undetermined) when nothing hits."""
    hits = {lang: stopword_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so earlier languages win ties via later when() override
    for lang in reversed(list(STOPWORDS)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 100]:
    + length in a sane band, + healthy mean word length,
    - punctuation-heavy, - ALL-CAPS-heavy.
    Pure integer arithmetic (ratios as cross-multiplications) for
    engine-portable determinism."""
    n_chars = F.length(col).cast("long")
    n_words = token_count_ws(col)
    n_punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0)).cast("long")
    n_upper = F.size(F.regexp_extract_all(col, F.lit(r"[A-Z]"), 0)).cast("long")
    # mean word length in [3.0, 9.0]  <=>  3*words <= chars <= 9*words
    score = (
        F.lit(50)
        + F.when((n_chars >= 100) & (n_chars <= 5000), 20).otherwise(0)
        + F.when(
            (n_chars >= n_words * 3) & (n_chars <= n_words * 9), 20
        ).otherwise(0)
        - F.when(n_punct * 100 > n_chars * 20, 25).otherwise(0)
        - F.when(n_upper * 100 > n_chars * 30, 15).otherwise(0)
    )
    return F.greatest(F.least(score.cast("long"), F.lit(100)), F.lit(0).cast("long"))


def doc_fingerprint(col: Column, shingle_k: int = 4) -> Column:
    """Rolling-hash-style content fingerprint: the minimum md5-derived
    hash over k-word shingles (a 1-permutation minhash) — stable under
    small insertions/deletions elsewhere in the document."""
    return F.array_min(
        F.transform(word_shingles(col, shingle_k), lambda s: md5_long(s))
    )


def word_ngrams(col: Column, n: int) -> Column:
    """ALL word n-grams (duplicates kept — repetition analysis needs
    multiplicity, unlike dedup's distinct shingles).  Zero-width
    lookahead regex, whole-stage codegen (see dedup.word_shingles)."""
    s = F.regexp_replace(F.trim(col), r"\s+", " ")
    kwords = " ".join([r"\S+"] * n)
    return F.regexp_extract_all(s, F.lit(rf"(?<![^\s])(?=({kwords}))"), 1)


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram
    (1 - distinct/total) — the Gopher-style repetition quality signal;
    boilerplate and degenerate generations score high."""
    grams = word_ngrams(col, n)
    total = F.size(grams)
    return F.when(total <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(grams)).cast("double")
        / total.cast("double")
    )


# PII patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB oracle): no backrefs, no lookaround.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,3}[- ]\d{2,4}[- ]\d{3,4}[- ]?\d{0,4}",
}


def pii_counts(col: Column, kind: str) -> Column:
    return F.size(
        F.regexp_extract_all(col, F.lit(PII_PATTERNS[kind]), 0)
    ).cast("long")


def pii_scrub(col: Column) -> Column:
    """Redact emails, IPv4s, and international-format phone numbers
    with typed placeholders — the pre-training privacy scrub.  Order
    fixed (email first: an email never contains an IP-shaped core
    after redaction) so both engines rewrite identically."""
    out = F.regexp_replace(col, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")
    return out


def lm_xent(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000,
):
    """Corpus-trained bigram-LM cross-entropy scoring — the
    perplexity-filtering signal of CCNet (Wenzek et al. 2019) /
    KenLM-style quality pipelines, trained on the corpus itself so no
    external model file is needed: unigram and bigram counts are two
    aggregations, and each document is scored by the total negative
    log-likelihood of its bigrams under the MLE model
    p(w2 | w1) = c(w1 w2) / c(w1).

    Scores are FIXED-POINT micro-nats: every per-bigram term rounds
    to an integer BEFORE the per-document sum, so the result is
    order-independent (a float sum is not: shuffle order varies) and
    reproducible bit-for-bit by a DuckDB oracle.  ln() is evaluated
    on exact integer counts in both engines; a last-ulp libm
    difference would need to land within ~1e-10 of a rounding
    boundary to flip a term.

    Returns (id_col, n_bigrams, xent_micronats, xent_avg_micronats):
    total and per-bigram cross entropy in 1e-6 nats; documents with
    fewer than two tokens score 0.

    At 100 TB: two count aggregations (bigram, unigram) and two
    shuffle joins keyed on the n-gram — the standard distributed
    LM-training shape; partial aggregation absorbs the head of the
    Zipf curve map-side, and nothing driver-sized exists anywhere.
    The hot n-gram skew (the count tables' top keys) is bounded by
    map-side combine; the scoring join's skew on frequent bigrams is
    AQE-split.
    """
    from mtail_spark.session import ensure_parallelism

    # regex bigram extraction + per-bigram scoring run MAP-SIDE and
    # inherit the scan's split count (optimization r12 — see
    # dedup.py: a 50k-doc corpus byte-planned 2 splits on 32 cores).
    # tune_only: lm_xent scans the corpus several times (bigram +
    # unigram counts, scoring), so the repartition fallback would pay
    # one exchange per scan branch on a single-row-group input
    # (measured +11% at sf0.1) while the maxPartitionBytes retune is
    # free and halves sf1 (3.79 s → 1.88 s, 49 row groups)
    docs = ensure_parallelism(docs, docs.sparkSession, tune_only=True)
    t = F.lower(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("did"), word_ngrams(t, 2).alias("bgs")
    )
    # explode_outer: projection collapse would route a plain explode
    # of the computed bigram array to the codegen Generate, which
    # re-runs the regex per OUTPUT bigram (see dedup.simhash); outer
    # evaluates once per row.  Null rows (docs with <2 tokens) are
    # filtered, matching explode semantics.
    ex = base.select(
        "did", F.explode_outer("bgs").alias("bg")
    ).filter(F.col("bg").isNotNull())
    bgc = ex.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    ugc = (
        docs.select(F.explode_outer(words(t)).alias("w1"))
        .filter(F.col("w1").isNotNull())
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    terms = (
        ex.join(bgc, "bg")
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .join(ugc, "w1")
        .select(
            "did",
            F.round((F.log("c_w") - F.log("c_bg")) * scale, 0)
            .cast("long")
            .alias("nll"),
        )
    )
    agg = terms.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("nll").alias("xent"),
    )
    return (
        docs.select(F.col(id_col))
        .join(agg, F.col(id_col) == F.col("did"), "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("xent", F.lit(0)).cast("long").alias("xent_micronats"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr("xent div n_bigrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("xent_avg_micronats"),
        )
    )


PPL_RATES_PPM = {"head": 1_000_000, "middle": 500_000, "tail": 100_000}


def perplexity_buckets(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    rates_ppm: dict | None = None,
    salt: str = "ccnet",
):
    """CCNet-style perplexity bucketing + bucket-balanced resampling
    (Wenzek et al. 2019 §4.3): score every document with the
    corpus-trained bigram-LM cross entropy (lm_xent above), split
    each LANGUAGE into head/middle/tail terciles by per-bigram score
    (lower = more fluent), then keep documents at per-bucket rates —
    the standard "keep the head, thin the tail" curation move.

    Terciles are exact type-1 order statistics (value at rank
    ceil(n/3) / ceil(2n/3) within the language, rank ordered by
    (score, id) for full determinism) — the same ln-free-boundary
    integer index arithmetic as curation.order_stat_quantiles, so
    the oracle agrees bit-for-bit.  Sampling is the engine's salted
    md5 ppm filter: membership is a pure function of (id, salt,
    bucket rate), reproducible anywhere.

    Returns (id_col, lang, xent_avg_micronats, bucket, kept) for
    every document.

    At 100 TB: scoring is the lm_xent shape (two count aggs + n-gram
    joins); the tercile pass is ONE exchange on the language key
    shared by the rank window, the count window, and both threshold
    windows; the keep decision is a pure map-side expression.  CCNet
    buckets per language, so groups are language-sized — for one
    giant language substitute sketched quantile thresholds (this is
    the exact-answer reference, same caveat as
    order_stat_quantiles)."""
    from pyspark.sql import Window

    rates = dict(PPL_RATES_PPM if rates_ppm is None else rates_ppm)
    x = lm_xent(docs, id_col, text_col).select(
        id_col, "xent_avg_micronats"
    )
    base = docs.select(id_col, lang_col).join(x, id_col)
    byl = Window.partitionBy(lang_col)
    w = byl.orderBy(
        F.col("xent_avg_micronats").asc(), F.col(id_col).asc()
    )
    v = F.col("xent_avg_micronats")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(byl)
    )
    t1 = F.max(
        F.when(F.col("rn") == F.expr("(n + 2) DIV 3"), v)
    ).over(byl)
    t2 = F.max(
        F.when(F.col("rn") == F.expr("(2 * n + 2) DIV 3"), v)
    ).over(byl)
    bucket = (
        F.when(v <= F.col("_t1"), F.lit("head"))
        .when(v <= F.col("_t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    from mtail_spark.operators.sampling import sample_bucket

    rate = (
        F.when(F.col("bucket") == "head", F.lit(rates["head"]))
        .when(F.col("bucket") == "middle", F.lit(rates["middle"]))
        .otherwise(F.lit(rates["tail"]))
    )
    return (
        ranked.withColumn("_t1", t1)
        .withColumn("_t2", t2)
        .withColumn("bucket", bucket)
        .withColumn(
            "kept",
            sample_bucket(F.col(id_col), salt) < rate,
        )
        .select(
            id_col,
            F.col(lang_col).alias("lang"),
            "xent_avg_micronats",
            "bucket",
            "kept",
        )
    )


def linear_quality_score(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "qcw",
):
    """Fixed-weight linear classifier over hashed bigram features —
    the fasttext-style quality-filter shape (the GPT-3/LLaMA-class
    pipelines gate documents on exactly this: hash n-gram features,
    sum per-feature weights, threshold).  The weights here are
    md5-derived integer stand-ins for trained parameters (no model
    file ships in this environment); the PLAN is the production one:
    per-feature weight lookup is a pure hash expression (a trained
    model would swap in a broadcast weight-table join, feature-count-
    sized), the per-document sum is one map-side-combined aggregation,
    and the decision is a scan-side filter when used as a gate.

    Integer weights in [-500, 500] make the score an exact BIGINT —
    order-independent and hash-matchable.  Returns
    (id_col, n_feats, score, keep) for every document (empty docs
    score 0).

    Shape (optimization r12, guide §2.4): explode_outer KEEPS a
    null-bigram placeholder row for bigram-less documents, so the
    per-document aggregate already covers every doc_id and the old
    join-back to `docs` (second scan + BroadcastExchange +
    BroadcastHashJoin) is gone — one scan, one Exchange.  count("bg")
    skips the placeholder null (n_feats 0) and sum(w) over an
    all-null group is null → coalesced to 0, exactly the old left
    join's coalesce.  PRECONDITION (contract, not checked — checking
    would cost a full aggregation pass): id_col is UNIQUE and
    NON-NULL.  Duplicate ids would collapse to one output row where
    the old join-back shape returned one per input row, and a NULL id
    would aggregate its bigrams into a real count where the old LEFT
    JOIN's null-never-equals gave n_feats=0.  True of every testdata/
    fuzz documents table, and the SQL oracle joins on doc_id under
    the same assumption — a corpus violating it breaks parity loudly
    (hash mismatch), not silently."""
    from mtail_spark.session import ensure_parallelism

    # the bigram regex + per-bigram md5 run map-side in the scan
    # stage (optimization r12: sf1 measured 2.9 s on a 2-split scan
    # → 0.6-0.8 s parallelized)
    docs = ensure_parallelism(docs, docs.sparkSession)
    t = F.lower(F.col(text_col))
    # explode_outer: repo-wide convention for computed arrays
    ex = docs.select(
        F.col(id_col),
        F.explode_outer(word_ngrams(t, 2)).alias("bg"),
    )
    w = F.when(
        F.col("bg").isNotNull(),
        (
            md5_long(F.concat(F.lit(f"{salt}-"), F.col("bg"))) % 1001
            - 500
        ).cast("long"),
    )
    agg = ex.select(id_col, "bg", w.alias("w")).groupBy(id_col).agg(
        F.count("bg").alias("n_feats"), F.sum("w").alias("score")
    )
    return agg.select(
        id_col,
        F.col("n_feats").cast("long").alias("n_feats"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
        (F.coalesce("score", F.lit(0)) >= 0).alias("keep"),
    )


def bpe_merge_pairs(
    docs,
    k: int = 20,
    text_col: str = "text",
):
    """The first step of BPE tokenizer training (Sennrich et al.
    2016): corpus-wide counts of adjacent symbol pairs, here at the
    character level over whitespace words — the statistic that picks
    each merge.  Returns the top-k (pair, n_occurrences, rank), ties
    broken by ascending pair so the ranking is fully deterministic.

    Shape: ONE pass builds the word-frequency table (the standard BPE
    trick — pair counts are word-pattern counts times word frequency,
    so the explode runs over DISTINCT words, vocabulary-sized, not
    corpus-sized); pair counts aggregate with map-side combine; the
    global top-k is TakeOrderedAndProject (per-partition heaps).  An
    actual BPE trainer iterates: apply the winning merge to the
    vocabulary table and recount — each iteration is this same
    vocabulary-sized job, never a corpus rescan."""
    from mtail_spark.session import ensure_parallelism

    # the word explode + frequency partial-agg run map-side in the
    # scan stage (optimization r12 — same split-count hazard as
    # linear_quality_score).  tune_only: the heavy pair explode runs
    # over the vocabulary AFTER the word-count exchange, so only the
    # scan-side word explode gains — the free retune takes sf1
    # 0.92 s → 0.67 s (49 row groups) while the repartition fallback
    # measurably hurt the single-row-group sf0.1 (0.49 → 0.66 s)
    docs = ensure_parallelism(docs, docs.sparkSession, tune_only=True)
    # all char bigrams WITH multiplicity: zero-width lookahead keeps
    # overlapping pairs; no array_distinct (BPE counts occurrences)
    pairs = F.regexp_extract_all(
        F.col("word"), F.lit(r"(?s)(?=(..))"), 1
    )
    vocab = (
        docs.select(
            F.explode_outer(words(F.lower(F.col(text_col)))).alias("word")
        )
        .filter(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    counts = (
        vocab.select("wc", F.explode_outer(pairs).alias("pair"))
        .filter(F.col("pair").isNotNull())
        .groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("n_occurrences"))
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    ).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


# variable-value masks applied IN ORDER; longest/most-specific first so
# a MAC's hex bytes are not half-eaten by the bare-number mask.  RE2-safe
# (no lookaround/backrefs) so Spark and any RE2-based engine agree.
LOG_TEMPLATE_MASKS = (
    ("[0-9a-fA-F]{2}(:[0-9a-fA-F]{2}){5}", "<mac>"),
    ("\\d+\\.\\d+\\.\\d+\\.\\d+", "<ip>"),
    ("\\d+", "<n>"),
)


def log_template(col):
    """Mask the variable values of a log line (MACs, IPs, numbers) to
    its TEMPLATE — the Drain-style log-pattern-mining key, as a pure
    Catalyst expression chain."""
    out = col
    for pat, repl in LOG_TEMPLATE_MASKS:
        out = F.regexp_replace(out, pat, repl)
    return out


def log_templates(
    lines,
    line_col: str = "line",
    order_col: str = "line_no",
):
    """Log template mining: group lines by their masked template and
    report frequency + the first occurrence — the triage view that
    turns a 100 TB log into its handful of message shapes (the
    simplified deterministic core of Drain-class template miners;
    mtail program authors use exactly this to decide which patterns
    to write).

    One map-side regex projection (three replaces, no Python), one
    map-side-combined aggregation keyed on the template — template
    cardinality is message-shape cardinality, tiny by definition, so
    the exchange carries almost nothing at any input scale.
    """
    return (
        lines.select(
            log_template(F.col(line_col)).alias("template"),
            F.col(order_col).alias("_ord"),
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.min("_ord").cast("long").alias("first_line_no"),
        )
    )
