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
    # FALLBACK for formats this environment cannot decode
    # (JPEG/PNG/...): deterministic fake "decoded feature" — byte
    # histogram folded to out_dim floats.  A real deployment decodes
    # those with PIL/ffmpeg here; PPM/BMP take the REAL branch in
    # _feature_of (operators/codecs.py needs no media library).
    acc = [0.0] * out_dim
    for i, b in enumerate(payload or b""):
        acc[i % out_dim] += b / 255.0
    return acc


def _feature_of(payload, out_dim: int) -> list:
    """REAL decode for stdlib-decodable formats, documented fake for
    the rest: a PPM/BMP payload yields [mean_r, mean_g, mean_b,
    w/4096, h/4096, 0...] (channel means as exact rationals pushed
    through float32 once); anything else falls back to the byte
    histogram."""
    from mtail_spark.operators import codecs as C

    p = bytes(payload) if payload is not None else b""
    img = C.decode_image(p)
    if img is None:
        return _fake_decode(p, out_dim)
    import numpy as np

    st = C.image_stats(img)
    f = [
        st["sum_r"] / (255.0 * st["n_px"]),
        st["sum_g"] / (255.0 * st["n_px"]),
        st["sum_b"] / (255.0 * st["n_px"]),
        img.shape[1] / 4096.0,
        img.shape[0] / 4096.0,
    ]
    f = [float(np.float32(v)) for v in f[:out_dim]]
    return f + [0.0] * (out_dim - len(f))


def extract_features(media: DataFrame, out_dim: int = 8) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow-batched).

    The batch shape is the real contract: each pandas batch holds the
    partition's rows; payload bytes arrive as Python bytes objects.
    PPM/BMP payloads are REALLY decoded (channel-mean features);
    env-blocked formats keep the documented deterministic fake.
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
                        lambda p: _feature_of(p, out_dim)
                    ),
                }
            )

    from mtail_spark.session import ensure_workers_can_import

    ensure_workers_can_import(media.sparkSession)
    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize for stdlib-decodable formats (PPM/BMP):
    decode -> deterministic nearest-neighbor (pure integer pixel map,
    operators/codecs.py) -> re-encode as P6 PPM.  Payloads this
    environment cannot decode (JPEG/PNG need PIL) come back as an
    explicit NULL row — per-row honesty instead of the pre-r9
    module-level NotImplementedError, so mixed-format tables flow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mtail_spark.operators import codecs as C

        for pdf in batches:
            outs, mimes, ws, hs = [], [], [], []
            for p in pdf["payload"]:
                img = C.decode_image(bytes(p) if p is not None else b"")
                if img is None:
                    outs.append(None)
                    mimes.append(None)
                    ws.append(None)
                    hs.append(None)
                else:
                    outs.append(
                        bytearray(
                            C.encode_ppm(C.resize_nearest(img, width, height))
                        )
                    )
                    mimes.append("image/x-portable-pixmap")
                    ws.append(width)
                    hs.append(height)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pd.Series(outs, dtype="object"),
                    "mime": pd.Series(mimes, dtype="object"),
                    "width": pd.Series(ws, dtype="object"),
                    "height": pd.Series(hs, dtype="object"),
                }
            )

    from mtail_spark.session import ensure_workers_can_import

    ensure_workers_can_import(media.sparkSession)
    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("t_ms", T.LongType(), False),
        T.StructField("frame_feature", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int,
    feat_dim: int = 4,
    real_codec: bool = False,
) -> DataFrame:
    """Video frame sampling via mapInPandas: each media row EXPLODES
    into one output row per sampled timestamp (t = 0, every_ms, ...,
    <= duration_ms) — the Arrow batch-in / variable-rows-out contract
    a real decoder needs is fully exercised.  Rows without a duration
    (images) produce no frames.

    The decode itself is a clearly-marked deterministic fake (frame
    feature[j] = payload byte at (frame_idx*feat_dim + j) mod len,
    scaled to [0,1] and truncated through float32 like a real feature
    tensor); pass real_codec=True for the honest ffmpeg stub."""
    if real_codec:
        raise NotImplementedError(
            "video decode requires ffmpeg, not available in this "
            "environment; the deterministic fake exercises the full "
            "mapInPandas explode plumbing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, ts, feats = [], [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # `not payload` also skips zero-length payloads — an
                # empty bytes would hit `% ln` with ln == 0 below and
                # kill the whole mapInPandas task with ZeroDivisionError
                if dur is None or pd.isna(dur) or not payload:
                    continue
                n = int(dur) // every_ms + 1
                ln = len(payload)
                for k in range(n):
                    ids.append(mid)
                    idxs.append(k)
                    ts.append(k * every_ms)
                    # python floats (Arrow's object converter rejects
                    # np.float32 lists) carrying the float32-rounded
                    # value, so the arrow float cast stays exact
                    feats.append(
                        [
                            float(np.float32(
                                payload[(k * feat_dim + j) % ln] / 255.0
                            ))
                            for j in range(feat_dim)
                        ]
                    )
            # explicit object dtype: an EMPTY plain column infers
            # float64, which Arrow refuses to cast to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "t_ms": pd.Series(ts, dtype="int64"),
                    "frame_feature": pd.Series(feats, dtype="object"),
                }
            )

    from mtail_spark.session import ensure_workers_can_import

    ensure_workers_can_import(media.sparkSession)
    return media.mapInPandas(run, schema=FRAME_SCHEMA)
