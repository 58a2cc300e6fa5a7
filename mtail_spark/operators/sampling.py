"""Deterministic sampling and dataset-split assignment.

Training-data curation needs REPRODUCIBLE sampling: re-running the
pipeline (or running it on another cluster, or auditing one shard)
must select exactly the same rows.  `rand()` is none of those things.
These operators derive every decision from a salted md5 of a stable
key, so membership is a pure function of (key, salt, rate):

- hash_sample: keep a row iff bucket(key) < rate — a single
  whole-stage-codegen filter, no shuffle, trivially pushdown-friendly
  at 100 TB (the same expression works as a partition-pruning
  predicate when the key is a partition column).
- stratified_sample: per-stratum rates (e.g. downsample dominant
  languages, keep the tail) as ONE filter with a literal CASE over
  the stratum column — no join, no shuffle.
- split_assign: disjoint train/val/test assignment from contiguous
  bucket ranges of the SAME hash, so splits are stable under corpus
  growth (a new row lands in a split without moving any old row) and
  mutually exclusive by construction.

Hashing matches the rest of the engine's portable scheme
(dedup.md5_long: first 15 md5 hex chars as a 60-bit integer), so the
DuckDB oracles reproduce membership bit-for-bit.  The bucket space is
1e6 wide: rates have ppm resolution, exact in both engines (integer
compare, no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mtail_spark.operators.dedup import md5_long

BUCKETS = 1_000_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6) for a key column: salted
    60-bit md5 reduced mod 1e6.  Cheap (one md5 per row), uniform,
    and identical in DuckDB:
    CAST('0x'||substr(md5(salt||key),1,15) AS BIGINT) % 1000000."""
    return md5_long(F.concat(F.lit(salt), key.cast("string"))) % BUCKETS


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep ~rate of rows, deterministically by key.  rate has ppm
    resolution (round(rate*1e6) buckets survive, so binary float
    representation error never drops a ppm)."""
    thresh = int(round(rate * BUCKETS))
    return df.filter(sample_bucket(F.col(key_col), salt) < thresh)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict,
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (downsample dominant strata,
    keep the tail): one filter, thresholds as a literal CASE chain
    over the stratum column — no join and no shuffle, so the sample
    is a pushdown-friendly scan at any scale."""
    thresh = F.lit(int(round(default_rate * BUCKETS)))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(round(rate * BUCKETS)))
        ).otherwise(thresh)
    return df.filter(sample_bucket(F.col(key_col), salt) < thresh)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: list[tuple] = (("train", 0.98), ("val", 0.01), ("test", 0.01)),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to exactly one named split from contiguous
    bucket ranges (train [0, 980000), val [980000, 990000), ...).
    Stable under growth: assignment depends only on the row's own
    key.  Fractions summing below 1 leave a remainder assigned to
    the LAST split (ranges cover the whole space via the terminal
    otherwise)."""
    b = sample_bucket(F.col(key_col), salt)
    edge = 0
    expr = None
    for name, frac in splits[:-1]:
        edge += int(round(frac * BUCKETS))
        cond = b < F.lit(edge)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def dsir_logweights(
    docs,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    scale: int = 1_000_000,
):
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by the log
    importance weight of its hashed-bigram features under a
    target-domain bag-of-ngrams model vs the raw-corpus model, both
    Laplace-smoothed over `n_buckets` hash buckets:

        log w(doc) = sum_{bigram g in doc}
            ln( (c_target(h(g)) + 1) / (N_target + B) )
          - ln( (c_raw(h(g))    + 1) / (N_raw    + B) )

    High scores mark documents that look like the target domain;
    resampling by these weights shifts the corpus mixture toward it.

    Like lm_xent, every per-feature term is rounded to FIXED-POINT
    micro-nats before the per-document sum, so the score is
    order-independent and reproducible bit-for-bit by a DuckDB
    oracle.  Returns (id_col, n_feats, logw_micronats).

    At 100 TB: two bucket-count aggregations (the hash space is
    n_buckets, so both count tables are broadcast-sized regardless of
    corpus size — that is the point of hashed features), one
    broadcast join from exploded features to the bucket table, one
    per-doc sum.  The raw corpus is scanned twice (once to count,
    once to score); no shuffle ever carries more than the exploded
    feature stream."""
    from pyspark.sql import functions as F

    from mtail_spark.operators.dedup import md5_long
    from mtail_spark.operators.textstats import word_ngrams
    from mtail_spark.session import ensure_parallelism

    # tune_only (optimization r12): the bigram regex + md5 bucketing
    # run map-side over BOTH scans of the raw corpus (sf1 measured
    # 7.65 s → 2.40 s from the free maxPartitionBytes retune)
    docs = ensure_parallelism(docs, docs.sparkSession, tune_only=True)
    t = F.lower(F.col(text_col))
    # explode_outer + filter: the codegen Generate re-runs the bigram
    # regex per OUTPUT row for computed arrays (see dedup.simhash)
    feats = lambda df: (
        df.select(
            F.col(id_col).alias("did"),
            F.explode_outer(word_ngrams(t, 2)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .withColumn("b", md5_long(F.col("g")) % n_buckets)
    )
    raw_f, tgt_f = feats(docs), feats(target)
    raw_c = raw_f.groupBy("b").agg(F.count(F.lit(1)).alias("c_raw"))
    tgt_c = tgt_f.groupBy("b").agg(F.count(F.lit(1)).alias("c_tgt"))
    raw_n = raw_f.agg(F.count(F.lit(1)).alias("n_raw"))
    tgt_n = tgt_f.agg(F.count(F.lit(1)).alias("n_tgt"))
    buckets = (
        raw_c.join(F.broadcast(tgt_c), "b", "left")
        .crossJoin(F.broadcast(raw_n))
        .crossJoin(F.broadcast(tgt_n))
        .select(
            "b",
            F.round(
                (
                    F.log(F.coalesce("c_tgt", F.lit(0)) + F.lit(1))
                    - F.log(F.col("n_tgt") + F.lit(n_buckets))
                    - F.log(F.col("c_raw") + F.lit(1))
                    + F.log(F.col("n_raw") + F.lit(n_buckets))
                )
                * scale,
                0,
            )
            .cast("long")
            .alias("term"),
        )
    )
    agg = (
        raw_f.join(F.broadcast(buckets), "b")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("term").alias("logw"),
        )
    )
    return (
        docs.select(F.col(id_col))
        .join(agg, F.col(id_col) == F.col("did"), "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("logw", F.lit(0)).cast("long").alias("logw_micronats"),
        )
    )
