"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, partition-aware batch iteration,
Arrow-friendly UDF signatures) is real and tested; the actual codec
work is stubbed because media libraries are not available in this
environment — each stub either raises NotImplementedError or produces
a clearly-marked deterministic fake so pipelines remain testable.

Design for 100 TB of media:
- binary payloads stay in parquet binary columns; metadata travels in
  sibling typed columns so filters/pruning never touch the bytes.
- decode/resize/frame-sample run as mapInPandas over Arrow batches —
  one Python worker per partition, no per-row overhead; partition size
  is controlled upstream via spark.sql.files.maxPartitionBytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text corpus: payload =
    utf-8 bytes of the md5 hex (stands in for encoded bytes).  Used by
    tests; real pipelines read parquet with true binary payloads."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.md5(F.col(text_col)), "utf-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_decode(payload: bytes, out_dim: int) -> list:
    # STUB: deterministic fake "decoded feature" — byte histogram
    # folded to out_dim floats.  A real deployment decodes with
    # PIL/ffmpeg here.
    acc = [0.0] * out_dim
    for i, b in enumerate(payload or b""):
        acc[i % out_dim] += b / 255.0
    return acc


def extract_features(media: DataFrame, out_dim: int = 8) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched).

    The batch shape is the real contract: each pandas batch holds the
    partition's rows; payload bytes arrive as Python bytes objects.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_decode(p, out_dim)
                    ),
                }
            )

    from mtail_spark.session import ensure_workers_can_import

    ensure_workers_can_import(media.sparkSession)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stub: the real implementation needs PIL."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this "
        "environment; see extract_features for the mapInPandas shape"
    )


def sample_frames(media: DataFrame, every_ms: int) -> DataFrame:
    """Video frame-sampling stub: the real implementation needs ffmpeg."""
    raise NotImplementedError(
        "video decode requires ffmpeg, not available in this environment"
    )
