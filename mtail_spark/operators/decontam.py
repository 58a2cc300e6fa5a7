"""Benchmark decontamination: n-gram overlap against an eval set.

Training corpora must not contain evaluation data.  The standard
check (used by the public GPT-3/PaLM/Llama reports) flags a training
document when it shares long word n-grams with any benchmark item.
Shape at 100 TB: the BENCHMARK side is small by definition (eval sets
are thousands of items), so its distinct shingle set broadcasts and
the corpus is scanned ONCE — shingle-explode, broadcast-hash
semi-join, per-document hit count.  No corpus shuffle: the only
exchange is the store-sized per-document aggregation.

Shingling reuses dedup.word_shingles (distinct k-word shingles via a
codegen-friendly lookahead regex), so the DuckDB oracle mirrors with
the same _sql_shingles construction already hash-matched for MinHash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import word_shingles


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination report: how many distinct benchmark
    n-grams each corpus document contains (rows only for documents at
    or above min_hits — the flag list to drop or audit)."""
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the corpus-side shingle regex
    # runs map-side in the scan stage ahead of the broadcast join
    # (sf1 measured 3.81 s → 0.93 s from the free retune)
    corpus = ensure_parallelism(corpus, corpus.sparkSession,
                                tune_only=True)
    # explode_outer: codegen Generate re-runs the shingle regex per
    # OUTPUT row for computed arrays (see dedup.simhash)
    bench_ngrams = (
        benchmark.select(
            F.explode_outer(
                word_shingles(F.col(bench_text_col), n)
            ).alias("ng")
        )
        .filter(F.col("ng").isNotNull())
        .distinct()
    )
    corpus_ngrams = corpus.select(
        F.col(id_col),
        F.explode_outer(word_shingles(F.col(text_col), n)).alias("ng"),
    ).filter(F.col("ng").isNotNull())
    hits = (
        corpus_ngrams.join(F.broadcast(bench_ngrams), "ng")
        .groupBy(id_col)
        .agg(F.count_distinct("ng").alias("n_contaminated_ngrams"))
        .filter(F.col("n_contaminated_ngrams") >= min_hits)
    )
    return hits


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus minus contaminated documents (left anti-join on the
    flag list — the corpus still moves only through its one scan plus
    the id-sized anti-join)."""
    flags = contamination(
        corpus, benchmark, id_col, text_col, bench_text_col, n, min_hits
    ).select(id_col)
    return corpus.join(flags, id_col, "left_anti")
