"""Real stdlib+numpy codecs (operators/codecs.py): PPM/BMP image
decode + resize, PCM16 WAV decode, and the multimodal integration
(resize_images real path, extract_features real-image branch)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

import mtail_spark.operators.codecs as C
import mtail_spark.operators.multimodal as M


def _img(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _bmp_bytes(img):
    """Reference 24-bit BMP encoder (bottom-up rows, 4-byte padded,
    BGR) built independently of the decoder under test."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel = b"".join(rows)
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(pixel), 0, 0, 14 + 40
    )
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0
    )
    return header + info + pixel


# ------------------------------------------------------------- images


def test_ppm_roundtrip_exact():
    img = _img(5, 7)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _img(2, 3)
    raw = b"P6 # comment\n# another\n 3\t2 \n255\n" + img.tobytes()
    assert np.array_equal(C.decode_ppm(raw), img)


def test_bmp_decode_matches_source_pixels():
    for h, w in [(4, 4), (3, 5), (1, 1)]:  # incl. non-multiple-of-4 strides
        img = _img(h, w, seed=h * 10 + w)
        assert np.array_equal(C.decode_bmp(_bmp_bytes(img)), img)


def test_decode_image_dispatch_and_rejects():
    img = _img(2, 2)
    assert np.array_equal(C.decode_image(C.encode_ppm(img)), img)
    assert np.array_equal(C.decode_image(_bmp_bytes(img)), img)
    assert C.decode_image(b"") is None
    assert C.decode_image(None) is None
    assert C.decode_image(b"\x89PNG\r\n\x1a\n....") is None  # env-blocked
    assert C.decode_image(b"P6\n9999 9999\n255\n") is None  # truncated


def test_resize_nearest_identity_and_downscale():
    img = _img(4, 4)
    assert np.array_equal(C.resize_nearest(img, 4, 4), img)
    small = C.resize_nearest(img, 2, 2)
    # floor pixel map: output (i,j) = input (i*4//2, j*4//2)
    assert np.array_equal(small, img[[0, 2]][:, [0, 2]])
    up = C.resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], img)


# -------------------------------------------------------------- audio


def test_wav_metrics_exact():
    samples = np.array([0, 100, -100, 200, -1, 1, 0, 32767], dtype=np.int16)
    payload = C.encode_wav_pcm16(samples, framerate=8000)
    m = C.audio_metrics(payload)
    assert m["framerate"] == 8000
    assert m["n_samples"] == 8
    assert m["duration_ms"] == 1  # 8 samples at 8 kHz = 1 ms
    assert m["sum_sq"] == int(np.sum(samples.astype(np.int64) ** 2))
    # nonzero sign sequence: + - + - + + -> 4 crossings
    assert m["zero_crossings"] == 4
    assert C.audio_metrics(b"not audio") is None


def test_wav_metrics_stereo_channel_aware():
    # r9 review finding: duration must come from FRAMES, and
    # interleaved L/R sign flips are not zero crossings
    import io as _io
    import wave as _wave

    l = np.array([100, -100, 100, -100], dtype=np.int16)   # 3 crossings
    r = np.array([50, 50, 50, 50], dtype=np.int16)         # 0 crossings
    inter = np.empty(8, dtype=np.int16)
    inter[0::2], inter[1::2] = l, r
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        wf.writeframes(inter.tobytes())
    m = C.audio_metrics(buf.getvalue())
    assert m["n_channels"] == 2
    assert m["n_samples"] == 8
    assert m["duration_ms"] == 1          # 4 frames at 4 kHz
    assert m["zero_crossings"] == 3       # per-channel, summed
    assert m["sum_sq"] == int(np.sum(inter.astype(np.int64) ** 2))


def test_zero_dimension_images_are_undecodable():
    # r9 review finding: a degenerate 0-dim header must not crash
    # pixel math inside a Spark task — it reads as undecodable
    assert C.decode_image(b"P6\n0 4\n255\n") is None
    assert C.decode_image(b"P6\n4 0\n255\n") is None
    import mtail_spark.operators.multimodal as _M

    f = _M._feature_of(b"P6\n0 4\n255\n", 8)
    assert len(f) == 8  # fake-branch fallback, no ZeroDivisionError


# ------------------------------------- multimodal integration (Spark)


def _media_df(spark, payloads):
    rows = [
        (i, "image", bytearray(p) if p is not None else None,
         "image/x-test", None, None, None)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_resize_images_real_path(spark):
    img = _img(4, 6, seed=3)
    media = _media_df(
        spark, [C.encode_ppm(img), _bmp_bytes(img), b"JFIF-ish garbage"]
    )
    out = {
        r.media_id: r
        for r in M.resize_images(media, 3, 2).collect()
    }
    want = C.resize_nearest(img, 3, 2)
    for mid in (0, 1):
        r = out[mid]
        assert (r.width, r.height) == (3, 2)
        assert np.array_equal(C.decode_ppm(bytes(r.payload)), want)
        assert r.mime == "image/x-portable-pixmap"
    # undecodable payload survives as an explicit null row, not a crash
    assert out[2].payload is None and out[2].width is None


def test_extract_features_real_image_branch(spark):
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[..., 0] = 10  # R
    img[..., 1] = 20  # G
    img[..., 2] = 40  # B
    media = _media_df(spark, [C.encode_ppm(img)])
    r = M.extract_features(media, out_dim=8).collect()[0]
    # real branch: [mean_r, mean_g, mean_b, w, h, ...] scaled to [0,1]
    f = r.feature
    assert abs(f[0] - 10 / 255.0) < 1e-6
    assert abs(f[1] - 20 / 255.0) < 1e-6
    assert abs(f[2] - 40 / 255.0) < 1e-6


def test_extract_features_fake_branch_unchanged(spark):
    # synthetic md5-hex payloads don't match any magic: the
    # deterministic byte-histogram fake must keep its exact output
    # (the multimodal_features oracle hash-checks it)
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    media = M.synthesize_media(df, "doc_id", "text")
    r = M.extract_features(media, out_dim=4).collect()[0]
    payload = bytes(
        media.select("payload").collect()[0][0]
    )
    acc = [0.0] * 4
    for i, b in enumerate(payload):
        acc[i % 4] += b / 255.0
    assert r.n_bytes == 32
    assert list(map(float, r.feature)) == pytest.approx(acc, abs=1e-6)
