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
