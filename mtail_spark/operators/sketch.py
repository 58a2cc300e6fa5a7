"""Bounded-state frequency sketching: distributed count-min sketch.

An exact frequency table costs state proportional to key cardinality —
fine for a vocabulary, unaffordable for per-(user, url, window) keys
at 100 TB.  The count-min sketch aggregates into a FIXED depth x width
cell grid regardless of cardinality: the aggregation state is
constant-sized, the merge is cellwise addition (associative, so Spark
map-side combine collapses every partition to <= depth*width cells
before the one exchange), and a key's estimate (min over its depth
cells) over-counts only by collision mass, never under-counts
(Cormode & Muthukrishnan 2005).

The hash family is md5-lane derived (row i hashes "cms{i}-" + key),
the same portable construction as dedup.md5_long, so the DuckDB
oracle reproduces every cell and every estimate bit-for-bit — sketch
"approximation" means a bounded-error ESTIMATE, not nondeterminism.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import words

DEPTH = 4
WIDTH = 1024


def _bucket_col(col, i: int, width: int):
    """Row-i bucket of a string column: md5 of a row-salted key, first
    15 hex chars as a 60-bit int, mod width (all JVM codegen)."""
    h = F.md5(F.concat(F.lit(f"cms{i}-"), col))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % width
    )


def bucket_py(term: str, i: int, width: int) -> int:
    """Driver-side mirror of _bucket_col for query-term lookups (same
    md5, same lanes — consistent by construction)."""
    h = hashlib.md5(f"cms{i}-{term}".encode()).hexdigest()
    return int(h[:15], 16) % width


def cms_build(
    keys: DataFrame,
    key_col: str = "term",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Sketch a key stream (one row per occurrence) into (row, bucket,
    c) cells — at most depth*width rows no matter the cardinality.

    explode_outer on purpose: codegen Generate would re-evaluate the
    computed md5-struct array once per OUTPUT row (depth x the digest
    work); outer routes to the row-at-a-time generator that builds it
    once per input row (repo-wide convention, see dedup)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _bucket_col(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        keys.select(F.explode_outer(cells).alias("cell"))
        .select("cell.row", "cell.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: list,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-query the sketch for a list of keys: est = min over the
    key's depth cells (absent cell = 0).  The lookup set is
    query-sized and broadcast; the sketch itself is depth*width-
    bounded, so nothing here scales with the corpus."""
    spark = sketch.sparkSession
    lookups = spark.createDataFrame(
        [
            (t, i, bucket_py(t, i, width))
            for t in terms
            for i in range(depth)
        ],
        ["term", "row", "bucket"],
    )
    # the SKETCH broadcasts (<= depth*width rows by construction);
    # the preserved lookup side of the left join cannot
    return (
        lookups.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )


def cms_token_counts(
    corpus: DataFrame,
    terms: list,
    text_col: str = "text",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """End-to-end: tokenize the corpus, sketch token occurrences,
    estimate the given terms' frequencies.  One corpus scan, one
    bounded exchange, a broadcast lookup."""
    toks = (
        corpus.select(
            F.explode_outer(words(F.lower(F.col(text_col)))).alias("term")
        )
        .filter(F.col("term").isNotNull() & (F.col("term") != ""))
    )
    return cms_estimate(
        cms_build(toks, "term", depth, width), terms, depth, width
    )
