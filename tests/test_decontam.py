"""Benchmark decontamination (operators/decontam.py)."""

import contextlib
import io

from pyspark.sql import functions as F

import mtail_spark.operators.decontam as DC


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_flags_and_removal(spark):
    bench = _df(spark, [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
    ])
    corpus = _df(spark, [
        # contains the benchmark 8-gram verbatim inside longer text
        (10, "intro words the quick brown fox jumps over the lazy "
             "dog tonight and more trailing text"),
        # shares words but no 8-gram run
        (11, "the quick brown cat sleeps under the lazy dog tonight"),
        (12, "completely unrelated text about training data pipelines"),
    ])
    flags = {
        r.doc_id: r.n_contaminated_ngrams
        for r in DC.contamination(corpus, bench, n=8).collect()
    }
    assert 10 in flags and flags[10] >= 1
    assert 11 not in flags and 12 not in flags
    clean = DC.decontaminate(corpus, bench, n=8)
    assert {r.doc_id for r in clean.collect()} == {11, 12}


def test_contamination_plan_broadcasts_benchmark(spark):
    """The 100 TB property: the benchmark side broadcasts; the corpus
    is scanned once with no SortMergeJoin (no corpus-wide shuffle on
    the n-gram key)."""
    from mtail_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") < 30)
    corpus = docs.filter(F.col("doc_id") >= 30)
    df = DC.contamination(corpus, bench, n=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
