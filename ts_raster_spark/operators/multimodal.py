"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Task-brief contract: image/audio/video are ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched kernels
over ``mapInPandas``.

Decode status (no PIL/ffmpeg ships in this container, so the codecs
here are dependency-free by design):

- **image** — REAL decode: 24-bit uncompressed BMP parsed with pure
  NumPy (:func:`decode_bmp`; :func:`encode_bmp` is the test-data twin).
- **audio** — REAL decode: 16-bit PCM WAV via the stdlib ``wave``
  module (:func:`decode_wav` / :func:`encode_wav`).
- **video** — STUB: mp4 genuinely needs ffmpeg; ``strict=False``
  produces a seeded deterministic fake, ``strict=True`` raises
  ``NotImplementedError`` as the 'plug ffmpeg here' marker.

Everything Spark-side — schema, partitioning, mapInPandas signature,
Arrow batch shape — is real and identical for all three kinds.
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_s double"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "thumb_w int, thumb_h int, mean_intensity double, frame_count int"
)

_BMP_HEADER_SIZE = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def encode_bmp(px: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a 24-bit uncompressed
    BMP (channels replicated). Bottom-up rows, 4-byte row padding."""
    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    pad = (-w * 3) % 4
    img = np.repeat(px[::-1, :, None], 3, axis=2)  # bottom-up, B=G=R
    rows = b"".join(img[i].tobytes() + b"\x00" * pad for i in range(h))
    header = struct.pack("<2sIHHI", b"BM", _BMP_HEADER_SIZE + len(rows), 0, 0, _BMP_HEADER_SIZE)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + dib + rows


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to a (h, w) float64 grayscale
    array (channel mean). Pure NumPy — no codec library."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", data, 14)
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    stride = w * 3 + ((-w * 3) % 4)
    arr = np.frombuffer(data, np.uint8, stride * abs(h), off).reshape(abs(h), stride)
    img = arr[:, : w * 3].reshape(abs(h), w, 3).astype(np.float64).mean(axis=2)
    return img[::-1] if h > 0 else img  # bottom-up unless height < 0


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode int16 mono samples as a PCM WAV (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a 16-bit PCM WAV to (int16 samples, sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        samples = np.frombuffer(wv.readframes(wv.getnframes()), dtype="<i2")
        return samples, wv.getframerate()


def gen_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table with REAL payloads for image (BMP) and
    audio (WAV); video payloads are seeded opaque bytes (mp4 would need
    ffmpeg to produce)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        rng = np.random.RandomState(seed * 100003 + i)
        if kind == "image":
            w, h = 64 + (i % 8) * 32, 48 + (i % 8) * 24
            px = rng.randint(0, 256, (h, w)).astype(np.uint8)
            payload, mime, dur = encode_bmp(px), "image/bmp", None
        elif kind == "audio":
            dur = float(i % 30 + 1)
            t = np.arange(int(8000 * min(dur, 2.0)))
            samples = (
                6000 * np.sin(2 * np.pi * (110 + i) * t / 8000)
                + rng.normal(0, 500, t.shape)
            ).astype(np.int16)
            payload, mime, w, h = encode_wav(samples), "audio/wav", None, None
        else:
            dur = float(i % 30 + 1)
            payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (8 + i % 17)
            mime, w, h = "video/mp4", 64 + (i % 8) * 32, 48 + (i % 8) * 24
        rows.append((i, kind, bytearray(payload), mime, w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _ffmpeg_path() -> str | None:
    """Env-gated ffmpeg probe: honour $TSRS_FFMPEG, else PATH lookup.
    This container ships neither, so the probe returns None here — but a
    production image with ffmpeg gets real video decode with no code
    change."""
    import shutil

    return os.environ.get("TSRS_FFMPEG") or shutil.which("ffmpeg")


def _decode_video_ffmpeg(payload: bytes, ffmpeg: str) -> np.ndarray:
    """First-frame grayscale decode through ffmpeg (rawvideo pipe)."""
    import subprocess

    proc = subprocess.run(
        [ffmpeg, "-i", "pipe:0", "-frames:v", "1", "-f", "rawvideo",
         "-pix_fmt", "gray", "pipe:1"],
        input=payload, capture_output=True, timeout=60,
    )
    if proc.returncode != 0 or not proc.stdout:
        raise ValueError(f"ffmpeg decode failed: {proc.stderr[-500:]!r}")
    raw = np.frombuffer(proc.stdout, dtype=np.uint8)
    side = int(len(raw) ** 0.5)
    return raw[: side * side].reshape(side, side).astype(np.float64)


def _decode(payload: bytes, mime: str, width, height, strict: bool) -> np.ndarray:
    """Dispatch to the real codec by mime; video decodes through ffmpeg
    when present (env-gated probe), else the deterministic stub."""
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "audio/wav":
        samples, _ = decode_wav(payload)
        # waveform as a (1, n) intensity row: |amplitude| scaled to 0..255
        return (np.abs(samples.astype(np.float64)) / 32768.0 * 255.0).reshape(1, -1)
    if mime.startswith("video/"):
        ffmpeg = _ffmpeg_path()
        if ffmpeg:
            return _decode_video_ffmpeg(payload, ffmpeg)
    if strict:
        raise NotImplementedError(
            f"no dependency-free codec for {mime!r} (video needs ffmpeg — "
            "install it or point $TSRS_FFMPEG at a binary)"
        )
    # deterministic fake for the stubbed kinds
    w = int(width) if width is not None and width == width else 8
    h = int(height) if height is not None and height == height else 8
    raw = np.frombuffer(hashlib.sha256(payload).digest() * ((w * h) // 32 + 1), dtype=np.uint8)
    return raw[: w * h].reshape(h, w).astype(np.float64)


def extract_media_features(
    media: DataFrame, thumb: tuple[int, int] = (8, 8), strict_decode: bool = False
) -> DataFrame:
    """mapInPandas kernel: per-batch decode → resize → stats.

    Arrow streams whole batches of (payload, metadata); the kernel is
    vectorized per batch with NumPy. At 100 TB the media table is
    bucketed like every other table and this map is shuffle-free.
    """
    tw, th = thumb

    def batches(it):
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "sha256": pdf["payload"].map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                "thumb_w": tw,
                "thumb_h": th,
            }
            means, frames = [], []
            for payload, mime, w, h, kind, dur in zip(
                pdf["payload"], pdf["mime"], pdf["width"], pdf["height"],
                pdf["kind"], pdf["duration_s"]
            ):
                px = _decode(bytes(payload), mime, w, h, strict_decode)
                # nearest-neighbour resize to the thumb shape
                yi = np.linspace(0, px.shape[0] - 1, th).astype(int)
                xi = np.linspace(0, px.shape[1] - 1, tw).astype(int)
                means.append(float(px[np.ix_(yi, xi)].mean()))
                frames.append(int(dur) if kind == "video" and dur == dur and dur is not None else 1)
            out["mean_intensity"] = pd.Series(means).round(4)
            out["frame_count"] = pd.Series(frames, dtype="int32")
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_s: float = 5.0) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (video only) — pure Catalyst (sequence+explode), the decode of each
    frame being the stubbed kernel above."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_s") / every_s).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_no"),
    ).withColumn("frame_ts_s", F.col("frame_no") * every_s)
