"""Regression tests for the round-7 ADVICE findings fixed in round 8."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import mtail_spark.operators.search as SR
import mtail_spark.operators.similarity as S


def _emb(spark, rows):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_hard_negatives_compares_raw_labels(spark):
    # ADVICE r7 low: the mismatch filter used to compare labels CAST
    # to long while the oracle compares raw values.  Labels '01' and
    # '1' are raw-distinct but cast-equal: the old filter dropped the
    # pair, the oracle kept it.
    q = _emb(spark, [(0, [1.0, 0.0], "01")])
    c = _emb(spark, [(10, [1.0, 0.0], "1"), (11, [0.0, 1.0], "2")])
    rows = S.hard_negatives(c, q, k=5).collect()
    got = sorted(r.corpus_id for r in rows)
    # both corpus vectors are raw-label negatives of query '01'
    assert got == [10, 11]
    # output labels still cast to long (oracle casts to BIGINT too)
    assert all(isinstance(r.neg_label, int) for r in rows)


def test_json_props_oracle_survives_malformed_json():
    # ADVICE r7 low: the DuckDB oracle used json_extract directly,
    # which raises on malformed JSON while Spark's from_json returns
    # NULL.  The json_valid guard must make the oracle return a NULL-k
    # group instead of erroring.
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["json_props_agg"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "('click', '{\"k\": 7}'), "
        "('click', 'not json at all'), "
        "('view', '{\"k\": 12}')"
        ") t(event_type, props)"
    )
    rows = con.execute(sql).fetchall()
    by_key = {(r[0], r[1]): (r[2], r[3]) for r in rows}
    assert by_key[("click", 0)] == (1, 7)
    assert by_key[("click", None)] == (1, None)  # malformed -> NULL k
    assert by_key[("view", 1)] == (1, 12)


def test_grep_index_tmpdir_registered_for_cleanup(spark):
    # ADVICE r7 low: the per-pid trigram index directory leaked one
    # parquet dir per process.  The creating process must register an
    # atexit rmtree for it.
    import __spark_entry__ as entrymod

    entrymod.q_grep_index_reuse(spark, "/root/testdata/sf0.001").collect()
    assert entrymod._TRIGRAM_TMP_DIRS, "no cleanup registration recorded"
    base = next(iter(entrymod._TRIGRAM_TMP_DIRS))
    assert f"_{os.getpid()}" in base
    assert os.path.isdir(base)


def test_search_topk_accepts_stored_n_docs(spark):
    # ADVICE r7 low: a prebuilt postings table silently took n_docs
    # from the (possibly different) corpus argument.  The stored pair
    # (post, n_docs) must now travel together and reproduce the
    # corpus-derived scores exactly.
    docs = spark.createDataFrame(
        [
            (1, "spark engine shuffle"),
            (2, "spark spark join"),
            (3, "duckdb oracle"),
        ],
        ["doc_id", "text"],
    )
    post = SR.postings(docs)
    base = SR.search_topk(docs, ["spark", "join"], k=3).collect()
    stored = SR.search_topk(
        docs, ["spark", "join"], k=3, post=post, n_docs=3
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, stored))
    # and a deliberately wrong count changes idf -> different scores,
    # proving the parameter is actually used
    skew = SR.search_topk(
        docs, ["spark", "join"], k=3, post=post, n_docs=1000
    ).collect()
    assert sorted(r.score for r in skew) != sorted(r.score for r in base)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
