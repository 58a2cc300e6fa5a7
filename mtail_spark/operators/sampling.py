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
