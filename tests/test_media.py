"""Multimodal audio/video plumbing: schemas, mapInPandas batch shapes,
deterministic decodable formats, and the stub boundary for real codecs."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions import media as M
from crawler_spark.functions.images import phash64


def test_audio_pcm16_roundtrip_and_stub():
    rng = np.random.default_rng(3)
    s = rng.uniform(-0.5, 0.5, 4800)
    back = M.decode_audio(M.encode_audio_pcm16(s), "pcm16")
    assert np.allclose(s, back, atol=2 / 32768)
    with pytest.raises(M.UnsupportedCodecError):
        M.decode_audio(b"\x00\x01", "mp3")


def test_audio_features_spark(spark):
    rng = np.random.default_rng(7)
    rows = []
    # a 440 Hz tone at 48 kHz: known rms ≈ 0.5/sqrt(2), high zcr
    t = np.arange(48000) / 48000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    rows.append(("tone", M.encode_audio_pcm16(tone), "pcm16", 48000, 1))
    rows.append(("noise", M.encode_audio_pcm16(rng.uniform(-1, 1, 24000)), "pcm16", 24000, 1))
    rows.append(("opaque", b"\x00" * 64, "aac", 44100, 2))  # stub path
    df = spark.createDataFrame(rows, M.AUDIO_SCHEMA)
    got = {r["audio_id"]: r for r in M.extract_audio_features(df).collect()}
    assert got["tone"]["ok"] and got["noise"]["ok"] and not got["opaque"]["ok"]
    assert abs(got["tone"]["duration_ms"] - 1000.0) < 1e-6
    assert abs(got["tone"]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert 0.015 < got["tone"]["zero_crossing_rate"] < 0.022  # ≈ 2·440/48000
    assert got["opaque"]["n_samples"] == 0


def test_video_frame_sampling_spark(spark):
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (12, 32, 48, 3), dtype=np.uint8)
    rows = [
        ("v1", M.encode_rawrgb(frames, fps=24.0), "rawrgb"),
        ("vx", b"\x00" * 32, "h264"),  # stub path → contributes no rows
    ]
    df = spark.createDataFrame(rows, M.VIDEO_SCHEMA)
    got = sorted(
        (r["frame_idx"], r["ts_ms"], r["w"], r["h"], r["phash"], r["mean_luma"])
        for r in M.sample_video_frames(df, every_k=5).collect()
    )
    assert [g[0] for g in got] == [0, 5, 10]
    assert got[1][1] == pytest.approx(5 / 24.0 * 1000)
    assert all(g[2] == 48 and g[3] == 32 for g in got)
    for (idx, _, _, _, ph, luma) in got:
        assert ph == phash64(frames[idx])
        want_luma = float((frames[idx].astype(np.float64) @ [0.299, 0.587, 0.114]).mean())
        assert luma == pytest.approx(want_luma)
