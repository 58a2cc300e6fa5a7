"""MinHash-LSH pair-recall gate — the dedup analogue of the ANN
recall gates (same round-11 theme: hash-parity proves determinism,
these prove the operator is GOOD).

Ground truth: ALL-PAIRS word-shingle Jaccard over the sf0.01
documents (500 docs — 125k pairs, cheap here; the operator exists
precisely because this is impossible at 100 TB).  Precision is exact
by construction (minhash_lsh_pairs verifies every candidate with the
true Jaccard before emitting); the quality dimension is candidate
RECALL: a true pair is lost only if NO band collides, bounded by
(1 - s^rows_per_band)^bands per pair.

This gate caught a real defect when first written: the previous lane
family hash_j = h1 + j*h2 shares one (h1, h2) draw across all lanes,
so a shingle drawing small h1 AND h2 is the argmin of EVERY lane at
once — docs 26/455 (Jaccard 0.9, theoretical miss ~2e-6) agreed on
zero of 16 lanes and were silently dropped.  The affine-mod family
((A_j*x + B_j) mod 2^31-1, per-lane constants — Spark MLlib's own
MinHashLSH construction) decorrelates the lanes; measured recall on
this corpus went 0.96 -> 1.0.
"""

import pyspark.sql.functions as F
import pytest

import mtail_spark.operators.dedup as D
from mtail_spark.session import load_table

THRESHOLD = 0.5


@pytest.fixture(scope="module")
def docs(spark):
    from tests.conftest import SF_CORRECT

    return load_table(spark, SF_CORRECT, "documents")


@pytest.fixture(scope="module")
def true_pairs(docs):
    base = docs.select(
        F.col("doc_id"), D.word_shingles(F.col("text"), 3).alias("sh")
    )
    l, r = base.alias("l"), base.alias("r")
    rows = (
        l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            D.jaccard(F.col("l.sh"), F.col("r.sh")).alias("j"),
        )
        .filter(F.col("j") >= THRESHOLD)
        .collect()
    )
    out = {(r["id_a"], r["id_b"]): r["j"] for r in rows}
    assert len(out) >= 20  # the corpus plants near-dup groups
    return out


def test_minhash_lsh_recall_and_exact_precision(docs, true_pairs):
    found = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text",
            num_hashes=16, bands=8, shingle_k=3, threshold=THRESHOLD,
        ).collect()
    }
    # precision is exact by construction: every emitted pair really
    # has Jaccard >= threshold
    assert found <= set(true_pairs), found - set(true_pairs)
    recall = len(found) / len(true_pairs)
    # measured 1.0 on this corpus with the affine-mod lanes (0.96
    # with the correlated family this gate retired); floor leaves
    # room for corpus regeneration, not for the old defect class
    assert recall >= 0.95, (
        f"minhash-LSH pair recall {recall} < 0.95; missed: "
        f"{sorted(set(true_pairs) - found)[:5]}"
    )


def test_simhash_pigeonhole_candidates_are_exact(docs):
    """The pigeonhole block join is not approximate AT the fingerprint
    level: with n_blocks > max_hamming, every pair within max_hamming
    bits shares at least one exact block, so simhash_pairs must equal
    the all-pairs hamming filter EXACTLY (measured 21223 == 21223
    pairs on this corpus).  This is the property a block-arithmetic
    bug (mask width, shift direction, off-by-one in the block count)
    would silently break while bit-parity stayed green."""
    fp = D.simhash_table(docs, "doc_id", "text", 32)
    a, b = fp.alias("a"), fp.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            D.hamming_distance64(
                F.col("a.simhash"), F.col("b.simhash")
            ).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    op = {
        (r["id_a"], r["id_b"])
        for r in D.simhash_pairs(
            docs, "doc_id", "text", n_bits=32, n_blocks=4, max_hamming=3
        ).collect()
    }
    assert op == brute, (len(op), len(brute))
    assert len(op) > 0


def test_simhash_recall_vs_jaccard_truth(docs, true_pairs):
    """SimHash's quality dimension is whether hamming-close
    fingerprints FIND the true (Jaccard) near-dups — the approximation
    lives in the fingerprint, not the join.  Measured on this corpus:
    recall 0.92 at max_hamming=3 (23/25 true pairs), 1.0 at
    max_hamming=6 — and recall must be monotone in the radius."""
    def found(mh, nb):
        return {
            (r["id_a"], r["id_b"])
            for r in D.simhash_pairs(
                docs, "doc_id", "text",
                n_bits=32, n_blocks=nb, max_hamming=mh,
            ).collect()
        }
    tp = set(true_pairs)
    r3 = len(found(3, 4) & tp) / len(tp)
    r6 = len(found(6, 7) & tp) / len(tp)
    assert r3 >= 0.85, f"simhash mh=3 recall {r3} < 0.85"
    assert r6 >= 0.95, f"simhash mh=6 recall {r6} < 0.95"
    assert r3 <= r6, (r3, r6)


@pytest.fixture(scope="module")
def ngram_truth(docs):
    """ALL-PAIRS char-3-gram Jaccard >= 0.8 — ground truth for the
    blocked operator (25 pairs on this corpus)."""
    base = docs.select(
        F.col("doc_id"), D.char_ngrams(F.col("text"), 3).alias("g")
    )
    l, r = base.alias("l"), base.alias("r")
    out = {
        (row["id_a"], row["id_b"])
        for row in l.join(r, F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            D.jaccard(F.col("l.g"), F.col("r.g")).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
        .collect()
    }
    assert len(out) >= 20
    return out


def test_ngram_jaccard_exact_modulo_blocking(docs, ngram_truth):
    """ngram_jaccard_pairs' ONLY approximation is the blocking key —
    with a constant block it must reproduce the all-pairs truth
    exactly (recall == 1.0, precision exact by the verified filter)."""
    found = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            docs.withColumn("allblk", F.lit(1)),
            "doc_id", "text", "allblk", n=3, threshold=0.8,
        ).collect()
    }
    assert found == ngram_truth, (
        len(found), len(ngram_truth), found ^ ngram_truth,
    )


def test_ngram_jaccard_blocking_tradeoff(docs, ngram_truth):
    """Recall under REAL blocks, pinned: a dup-invariant block
    (length bucket — near-dups have near-equal length) keeps recall
    high (measured 0.96), while a block the dup process does NOT
    preserve (lang, on this corpus) loses most pairs (measured 0.24).
    The gate pins both the floor and the ordering — the lesson a
    curation pipeline needs is that block choice IS the recall knob."""
    def found(df, blk):
        return {
            (r["id_a"], r["id_b"])
            for r in D.ngram_jaccard_pairs(
                df, "doc_id", "text", blk, n=3, threshold=0.8
            ).collect()
        }
    tp = ngram_truth
    by_len = found(
        docs.withColumn("lb", (F.col("n_chars") / 100).cast("int")), "lb"
    )
    by_lang = found(docs, "lang")
    assert by_len <= tp and by_lang <= tp  # precision exact always
    r_len = len(by_len & tp) / len(tp)
    r_lang = len(by_lang & tp) / len(tp)
    assert r_len >= 0.85, f"length-bucket block recall {r_len} < 0.85"
    assert r_lang < r_len, (r_lang, r_len)


def test_lane_family_is_decorrelated(spark):
    """The regression that motivated the family change, pinned as an
    operator property: for a pair sharing 9 of 10 shingles, the
    number of AGREEING lanes must be near 16 * 0.9 — the correlated
    family produced ZERO."""
    a_words = "w%d" % 0 + " " + " ".join(f"w{i}" for i in range(1, 12))
    b_words = " ".join(f"w{i}" for i in range(11))  # drop the last word
    df = spark.createDataFrame(
        [(1, a_words), (2, b_words)], "doc_id long, text string"
    )
    sh = df.select(
        "doc_id", D.word_shingles(F.col("text"), 3).alias("shingles")
    )
    rows = {r["doc_id"]: r for r in D._minhash_signatures(sh, 16).collect()}
    agree = sum(
        1 for j in range(16)
        if rows[1][f"sig{j}"] == rows[2][f"sig{j}"]
    )
    # shared/union = 8/11 here -> expect ~11.6 agreeing lanes; require
    # a healthy majority (the defect produced 0)
    assert agree >= 8, f"only {agree}/16 lanes agree"
