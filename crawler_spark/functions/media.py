"""Multimodal payload columns: audio/video as opaque binary + typed
metadata (training-data-pipeline ops from the build brief; the image
twin lives in functions/images.py and is fully real).

No audio/video codec libraries exist in this container, so REAL codec
decode is stubbed behind :class:`UnsupportedCodecError` — but the
Spark-side plumbing is real and tested: schemas, mapInPandas batch
shapes, deterministic fake formats that exercise the full path:

  * audio ``pcm16``: raw little-endian int16 mono/interleaved samples —
    genuinely decodable with numpy (not a fake), so feature extraction
    (rms, zero-crossing rate, duration) runs on real math;
  * video ``rawrgb``: 16-byte header (w, h, n_frames, fps ×1000 — all
    uint32 LE) + n_frames RGB24 frames — frame sampling, per-frame
    stats and pHash run on real pixels via the images module.

At 100 TB these stages are the heavy path: rows carry multi-MB blobs,
so every operator here repartitions by id first (bytes shuffle at most
once) and processes Arrow batches with numpy only.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawler_spark.functions.images import phash64


class UnsupportedCodecError(NotImplementedError):
    """Raised for real-world codecs (mp3/aac/h264/...) — decode is
    stubbed in this environment; the surrounding plumbing is real."""


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossing_rate", T.DoubleType(), False),
    ]
)


def decode_audio(data: bytes, codec: str) -> np.ndarray:
    """→ float64 samples in [-1, 1]. Only ``pcm16`` decodes here."""
    if codec == "pcm16":
        return np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    raise UnsupportedCodecError(f"audio codec {codec!r} requires a codec library")


def encode_audio_pcm16(samples: np.ndarray) -> bytes:
    return (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """mapInPandas feature extractor over the audio table."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "ok", "n_samples", "duration_ms", "rms", "zero_crossing_rate")}
            for _, r in pdf.iterrows():
                out["audio_id"].append(r["audio_id"])
                try:
                    s = decode_audio(bytes(r["bytes"]), r["codec"])
                    n = len(s)
                    sr = int(r["sample_rate"]) * max(int(r["n_channels"]), 1)
                    out["ok"].append(True)
                    out["n_samples"].append(n)
                    out["duration_ms"].append(1000.0 * n / sr if sr else 0.0)
                    out["rms"].append(float(np.sqrt(np.mean(s**2))) if n else 0.0)
                    out["zero_crossing_rate"].append(
                        float(np.mean(np.abs(np.diff(np.signbit(s))))) if n > 1 else 0.0
                    )
                except UnsupportedCodecError:
                    out["ok"].append(False)
                    out["n_samples"].append(0)
                    out["duration_ms"].append(0.0)
                    out["rms"].append(0.0)
                    out["zero_crossing_rate"].append(0.0)
            yield pd.DataFrame(out)

    return audio.repartition(F.col("audio_id")).mapInPandas(
        _feat, AUDIO_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------------
# video
# ---------------------------------------------------------------------------

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.DoubleType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

_RAWRGB_MAGIC_LEN = 16


def encode_rawrgb(frames: np.ndarray, fps: float = 24.0) -> bytes:
    """frames: (n, h, w, 3) uint8."""
    n, h, w, _ = frames.shape
    return struct.pack("<IIII", w, h, n, int(fps * 1000)) + frames.astype(np.uint8).tobytes()


def decode_video(data: bytes, codec: str) -> tuple[np.ndarray, float]:
    """→ ((n, h, w, 3) uint8 frames, fps). Only ``rawrgb`` decodes."""
    if codec != "rawrgb":
        raise UnsupportedCodecError(f"video codec {codec!r} requires a codec library")
    w, h, n, fps_m = struct.unpack_from("<IIII", data, 0)
    frames = np.frombuffer(
        data, np.uint8, count=n * h * w * 3, offset=_RAWRGB_MAGIC_LEN
    ).reshape(n, h, w, 3)
    return frames, fps_m / 1000.0


def sample_video_frames(video: DataFrame, every_k: int = 5) -> DataFrame:
    """mapInPandas frame sampler: every k-th frame → per-frame stats +
    pHash (the dedup key for near-dup *video* detection: consecutive
    sampled-frame phash agreement)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("video_id", "frame_idx", "ts_ms", "w", "h", "mean_luma", "phash")}
            for _, r in pdf.iterrows():
                try:
                    frames, fps = decode_video(bytes(r["bytes"]), r["codec"])
                except UnsupportedCodecError:
                    continue
                for i in range(0, len(frames), every_k):
                    f = frames[i]
                    rows["video_id"].append(r["video_id"])
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(1000.0 * i / fps if fps else 0.0)
                    rows["h"].append(f.shape[0])
                    rows["w"].append(f.shape[1])
                    rows["mean_luma"].append(
                        float((f.astype(np.float64) @ [0.299, 0.587, 0.114]).mean())
                    )
                    rows["phash"].append(phash64(f))
            yield pd.DataFrame(rows)

    return video.repartition(F.col("video_id")).mapInPandas(_sample, FRAME_SCHEMA)
