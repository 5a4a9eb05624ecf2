"""Multimodal columns: opaque ``binary`` payloads with typed metadata.

Task-brief contract: image/audio/video are ``binary`` columns; decode /
feature-extract / resize / frame-sample run as Arrow-batched kernels
over ``mapInPandas``. The image/audio codec libraries are NOT in this
container, so the decode step is STUBBED — ``decode=deterministic``
produces a seeded fake (stable bytes→pseudo-pixels), ``decode=strict``
raises ``NotImplementedError`` — while everything Spark-side (schema,
partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib

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


def gen_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (8 + i % 17)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 8) * 32 if kind != "audio" else None,
                48 + (i % 8) * 24 if kind != "audio" else None,
                float(i % 30 + 1) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, width, height, strict: bool) -> np.ndarray:
    """Stand-in for PIL/ffmpeg decode. ``strict`` raises — the marker
    for 'plug a real codec here'."""
    if strict:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this container; "
            "swap _decode_stub for a real decoder in production"
        )
    # width/height arrive as pandas NaN for audio rows
    w = int(width) if width is not None and width == width else 8
    h = int(height) if height is not None and height == height else 8
    raw = np.frombuffer(hashlib.sha256(payload).digest() * ((w * h) // 32 + 1), dtype=np.uint8)
    return raw[: w * h].reshape(h, w)


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
            for payload, w, h, kind, dur in zip(
                pdf["payload"], pdf["width"], pdf["height"], pdf["kind"], pdf["duration_s"]
            ):
                px = _decode_stub(bytes(payload), w, h, strict_decode)
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
