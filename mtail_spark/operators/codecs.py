"""REAL media codecs implementable with stdlib + numpy only.

multimodal.py's decode surfaces were honest stubs because PIL/ffmpeg
are absent from this environment (r5-r8 "what's missing" item).  This
module closes the gap for the formats that need no media library at
all:

- image: PPM (P6 binary) and uncompressed 24-bit BMP — plain headers
  over raw RGB rows (numpy reshape + stride fixups).
- audio: RIFF/WAVE PCM16 via the stdlib `wave` module — real frames,
  real sample math (RMS / zero-crossings in exact integer units).
- video stays an honest stub (no pure-python codec is realistic).

Everything returns/consumes plain numpy arrays or integer metrics so
the mapInPandas plumbing in multimodal.py can run REAL decode work
where payload magic matches, and fall back to the documented
deterministic fake elsewhere.  Compressed formats (JPEG/PNG/MP3/MP4)
remain env-blocked; the decode entry points report them as
undecodable rather than raising mid-task.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ------------------------------------------------------------- images


def _ppm_tokens(buf: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integer tokens after the P6
    magic, honoring '#' comments; returns (tokens, offset just past
    the single whitespace that terminates the header)."""
    toks: list[int] = []
    i = 2  # past b"P6"
    cur = b""
    while i < len(buf) and len(toks) < n:
        c = buf[i : i + 1]
        if c == b"#":
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
        elif c in b" \t\r\n":
            if cur:
                toks.append(int(cur))
                cur = b""
        else:
            cur += c
        i += 1
    if len(toks) < n:
        raise ValueError("truncated PPM header")
    return toks, i


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 binary PPM -> (H, W, 3) uint8 array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), off = _ppm_tokens(payload, 3)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    if w <= 0 or h <= 0:
        # a zero-dimension header would decode to an empty array and
        # crash downstream pixel math (resize indexing, mean /n_px)
        raise ValueError(f"degenerate PPM dimensions {w}x{h}")
    need = w * h * 3
    raw = payload[off : off + need]
    if len(raw) < need:
        raise ValueError("truncated PPM data")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> P6 binary PPM bytes."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (H, W, 3) uint8
    RGB.  Rows are stored bottom-up and padded to 4 bytes; pixels are
    BGR on disk."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload[data_off : data_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def decode_image(payload: bytes) -> np.ndarray | None:
    """Magic-dispatched decode: (H, W, 3) uint8 RGB for PPM/BMP,
    None for anything this environment cannot decode (JPEG/PNG/...)."""
    if not payload or len(payload) < 2:
        return None
    try:
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
    except ValueError:
        return None
    return None


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — pure integer index math (floor of
    the pixel-center map), deterministic on any platform."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return img[rows][:, cols]


def image_stats(img: np.ndarray) -> dict:
    """Exact integer channel statistics: per-channel byte sums and
    the pixel count — rational-free, so any engine can recompute them
    from the source pixel formula."""
    s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return {
        "n_px": int(img.shape[0] * img.shape[1]),
        "sum_r": int(s[0]),
        "sum_g": int(s[1]),
        "sum_b": int(s[2]),
    }


# -------------------------------------------------------------- audio


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """RIFF/WAVE PCM16 -> (framerate, n_channels, (frames, ch) int16
    samples); None if not a decodable WAV."""
    if not payload or payload[:4] != b"RIFF":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                return None
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
            flat = np.frombuffer(frames, dtype="<i2")
            return (
                wf.getframerate(),
                nch,
                flat.reshape(-1, nch) if nch else flat.reshape(-1, 1),
            )
    except (wave.Error, EOFError, ValueError):
        return None


def audio_metrics(payload: bytes) -> dict | None:
    """Integer audio features from a PCM16 WAV: duration in ms
    (floor, from FRAMES not flattened samples — a stereo file is not
    twice as long), sum of squared samples (exact int64), zero
    crossings summed PER CHANNEL (interleaved L/R sign flips are not
    crossings) — all exact integers, engine-portable."""
    dec = decode_wav(payload)
    if dec is None:
        return None
    rate, nch, samples = dec
    n_frames = int(samples.shape[0])
    sumsq = int(np.sum(samples.astype(np.int64) ** 2))
    crossings = 0
    for ch in range(samples.shape[1]):
        signs = np.sign(samples[:, ch].astype(np.int64))
        nz = signs[signs != 0]
        crossings += int(np.count_nonzero(np.diff(nz) != 0))
    return {
        "framerate": int(rate),
        "n_channels": int(nch),
        "n_samples": n_frames * int(nch),
        "duration_ms": (n_frames * 1000) // rate if rate else 0,
        "sum_sq": sumsq,
        "zero_crossings": crossings,
    }


def encode_wav_pcm16(
    samples: np.ndarray, framerate: int = 8000
) -> bytes:
    """int16 samples -> single-channel PCM16 WAV bytes (test helper
    and the synthesizer for oracle-checkable codec queries)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
