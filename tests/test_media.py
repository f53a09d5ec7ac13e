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


# ---------------------------------------------------------------------------
# real compressed audio codecs (r3): G.711 µ-law + IMA ADPCM
# ---------------------------------------------------------------------------


def _tone(n=8000, sr=8000):
    t = np.arange(n) / sr
    return 0.8 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 97 * t)


def test_ulaw_roundtrip_snr_and_determinism():
    x = _tone()
    data = M.encode_audio_ulaw(x)
    assert len(data) == len(x)  # 8 bits/sample
    assert data == M.encode_audio_ulaw(x)
    y = M.decode_audio(data, "ulaw")
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr >= 35.0  # µ-law's textbook ≈ 38 dB SQNR
    # log-PCM property: small signals keep RELATIVE precision
    small = x * 0.01
    ys = M.decode_audio(M.encode_audio_ulaw(small), "ulaw")
    snr_small = 10 * np.log10(np.mean(small**2) / np.mean((small - ys) ** 2))
    assert snr_small >= 25.0  # linear 8-bit would be ~ -6 dB here


def test_adpcm_roundtrip_snr_and_ratio():
    x = _tone()
    data = M.encode_audio_adpcm(x)
    assert len(data) <= len(x) / 2 + 16  # 4 bits/sample + header
    assert data == M.encode_audio_adpcm(x)
    y = M.decode_audio(data, "adpcm")
    assert len(y) == len(x)
    snr = 10 * np.log10(np.mean(x**2) / np.mean((x - y) ** 2))
    assert snr >= 20.0  # IMA typical 25-30 dB on tones
    # odd-length streams round-trip (nibble padding)
    odd = x[:333]
    assert len(M.decode_audio(M.encode_audio_adpcm(odd), "adpcm")) == 333


def test_compressed_audio_through_feature_extractor(spark):
    x = _tone(2000)
    rows = [
        ("a_pcm", bytearray(M.encode_audio_pcm16(x)), "pcm16", 8000, 1),
        ("a_ulaw", bytearray(M.encode_audio_ulaw(x)), "ulaw", 8000, 1),
        ("a_adpcm", bytearray(M.encode_audio_adpcm(x)), "adpcm", 8000, 1),
        ("a_mp3", bytearray(b"ID3\x04fake"), "mp3", 44100, 2),
    ]
    df = spark.createDataFrame(rows, M.AUDIO_SCHEMA)
    got = {r["audio_id"]: r for r in M.extract_audio_features(df).collect()}
    assert not got["a_mp3"]["ok"]  # perceptual codecs still stub cleanly
    rms = {}
    for aid in ("a_pcm", "a_ulaw", "a_adpcm"):
        r = got[aid]
        assert r["ok"] and r["n_samples"] == 2000
        rms[aid] = r["rms"]
    # all three codecs agree on the signal's RMS within codec error
    assert abs(rms["a_ulaw"] - rms["a_pcm"]) < 0.01
    assert abs(rms["a_adpcm"] - rms["a_pcm"]) < 0.03


def test_audio_fingerprint_separation():
    """Spectral fingerprint: level-invariant (delta-sign bits), robust
    to µ-law re-encode, far apart for unrelated clips."""

    def clip(seed, n=8000):
        r = np.random.default_rng(seed)
        t = np.arange(n) / 8000
        x = sum(
            a * np.sin(2 * np.pi * f * t + p)
            for f, a, p in zip(
                r.uniform(60, 3800, 16),
                r.uniform(0.05, 0.3, 16),
                r.uniform(0, 6.28, 16),
            )
        )
        return np.clip(x + 0.02 * r.standard_normal(n), -1, 1)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    x = clip(3)
    f0 = M.audio_fingerprint(x)
    # µ-law re-encode stays near
    y = M.decode_audio(M.encode_audio_ulaw(x), "ulaw")
    assert ham(f0, M.audio_fingerprint(y)) <= 7
    # level change is (near-)invariant: delta signs survive gain
    assert ham(f0, M.audio_fingerprint(0.5 * x)) <= 4
    # unrelated clip is far
    assert ham(f0, M.audio_fingerprint(clip(4))) >= 9
    # degenerate inputs
    assert M.audio_fingerprint(np.zeros(100)) == 0 or True  # no crash
    assert M.audio_fingerprint(np.array([])) == 0


def test_fingerprint_audio_operator(spark):
    x = np.sin(2 * np.pi * 440 * np.arange(4096) / 8000)
    rows = [
        ("a", bytearray(M.encode_audio_pcm16(x)), "pcm16", 8000, 1),
        ("b", bytearray(b"xxxx"), "mp3", 44100, 2),
    ]
    df = spark.createDataFrame(rows, M.AUDIO_SCHEMA)
    got = {r["audio_id"]: r["fingerprint"] for r in M.fingerprint_audio(df).collect()}
    assert got["b"] is None  # quarantine
    # the operator fingerprints the DECODED samples (int16-quantized)
    expected = M.audio_fingerprint(
        M.decode_audio(M.encode_audio_pcm16(x), "pcm16")
    )
    assert got["a"] == expected


def test_video_fingerprint_and_operator(spark):
    """Majority-vote video fingerprint: identical under lossless
    re-pack, near under full per-frame JPEG re-encode, far for a
    different clip; operator quarantines unknown codecs."""
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    def clip(seed):
        r = np.random.default_rng(seed)
        base = r.integers(0, 256, (24, 32, 3)).astype(np.int16)
        frames = []
        for _ in range(10):
            base = np.clip(base + r.integers(-6, 7, (24, 32, 3)), 0, 255)
            frames.append(base.astype(np.uint8))
        return np.stack(frames)

    v = clip(1)
    f0 = M.video_fingerprint(v)
    rt, _ = M.decode_video(M.encode_rawrgb(v), "rawrgb")
    assert M.video_fingerprint(rt) == f0  # lossless round-trip
    probe = np.stack([decode_jpeg(encode_jpeg(f, quality=90)) for f in v])
    assert ham(f0, M.video_fingerprint(probe)) <= 7
    assert ham(f0, M.video_fingerprint(clip(2))) >= 10
    assert M.video_fingerprint(v[:0]) == 0  # empty clip

    rows = [
        ("v1", bytearray(M.encode_rawrgb(v)), "rawrgb"),
        ("v2", bytearray(b"\x00" * 32), "h264"),
    ]
    df = spark.createDataFrame(rows, M.VIDEO_SCHEMA)
    got = {r["video_id"]: r["fingerprint"] for r in M.fingerprint_video(df).collect()}
    assert got["v2"] is None and got["v1"] == f0
