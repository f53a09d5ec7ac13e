"""Audio containers + G.711 A-law (functions/wav.py): RIFF/WAVE with
PCM/A-law/µ-law/IMA-ADPCM block framing, AIFF with 80-bit extended
sample rates. Encoder/decoder twins; malformed containers raise
ValueError → quarantine."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.wav import (
    _ext80_pack,
    _ext80_unpack,
    decode_aiff,
    decode_audio_alaw,
    decode_wav,
    encode_aiff,
    encode_audio_alaw,
    encode_wav,
)


def _sig(n=8000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000
    return np.clip(np.sin(2 * np.pi * 440 * t) * 0.4 + rng.normal(0, 0.01, n), -1, 1)


def _sqnr(x, y):
    e = x - y
    return 10 * np.log10(np.mean(x**2) / np.mean(e**2))


def test_alaw_sqnr_and_shape():
    """G.711 A-law: ≈ 38 dB SQNR on tonal content (the spec's
    segment-constant relative precision), vectorized 2:1."""
    x = _sig()
    data = encode_audio_alaw(x)
    assert len(data) == len(x)
    back = decode_audio_alaw(data)
    assert _sqnr(x, back) > 35


def test_alaw_extremes_and_idempotence():
    """Full-scale and near-zero samples stay in range; re-encoding a
    decoded signal is a fixed point (decoder output hits quantizer
    reconstruction levels)."""
    x = np.array([-1.0, -0.5, -1e-5, 0.0, 1e-5, 0.5, 1.0])
    back = decode_audio_alaw(encode_audio_alaw(x))
    assert np.all(np.abs(back) <= 1.0)
    twice = decode_audio_alaw(encode_audio_alaw(back))
    assert np.allclose(back, twice, atol=1e-9)


@pytest.mark.parametrize(
    "codec,check",
    [
        ("pcm16", ("tol", 2.5 / 32768)),
        ("pcm8", ("tol", 2.5 / 128)),
        ("ulaw", ("sqnr", 30.0)),
        ("alaw", ("sqnr", 30.0)),
        ("ima", ("sqnr", 20.0)),
    ],
)
def test_wav_codec_roundtrips(codec, check):
    x = _sig()
    back, rate = decode_wav(encode_wav(x, 8000, codec))
    assert rate == 8000 and len(back) == len(x)
    kind, bound = check
    if kind == "tol":
        assert np.abs(back - x).max() <= bound
    else:
        assert _sqnr(x, back) >= bound


def test_wav_stereo_interleave():
    x = _sig()
    st = np.stack([x, -0.5 * x], axis=-1)
    for codec in ("pcm16", "pcm8", "ulaw", "alaw"):
        back, _ = decode_wav(encode_wav(st, 44100, codec))
        assert back.shape == st.shape, codec


def test_ima_wav_block_framing():
    """IMA-in-WAV: per-block predictor/step header, carried step
    index, low-nibble-first data, short final block."""
    x = _sig()
    full, _ = decode_wav(encode_wav(x, 8000, "ima"))
    assert _sqnr(x, full) >= 20
    y = x[:1300]  # 505-sample blocks → short tail block
    tail, _ = decode_wav(encode_wav(y, 8000, "ima"))
    assert len(tail) == 1300 and _sqnr(y, tail) >= 15
    with pytest.raises(ValueError, match="mono"):
        encode_wav(np.stack([x, x], axis=-1), 8000, "ima")


def test_ext80_sample_rates():
    for r in (8000, 11025, 22050, 44100, 48000, 96000):
        assert abs(_ext80_unpack(_ext80_pack(float(r))) - r) < 1e-6


def test_aiff_roundtrips():
    x = _sig()
    for bits, tol in ((16, 2.5 / 32768), (8, 2.5 / 127)):
        back, rate = decode_aiff(encode_aiff(x, 44100, bits))
        assert rate == 44100 and len(back) == len(x)
        assert np.abs(back - x).max() <= tol
    st = np.stack([x, -x * 0.5], axis=-1)
    back, _ = decode_aiff(encode_aiff(st, 8000))
    assert back.shape == st.shape


def test_unsupported_and_malformed_raise():
    x = _sig(500)
    data = bytearray(encode_wav(x, 8000, "pcm16"))
    # patch format tag to MS-ADPCM (2)
    fmt_off = bytes(data).find(b"fmt ") + 8
    data[fmt_off] = 2
    with pytest.raises(ValueError, match="not supported"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        decode_aiff(b"FORMxxxxAIFF")


def test_truncation_and_corruption_contained():
    x = _sig(1200)
    for enc in (
        lambda: encode_wav(x, 8000, "pcm16"),
        lambda: encode_wav(x, 8000, "ima"),
        lambda: encode_aiff(x, 8000),
    ):
        data = enc()
        dec = decode_wav if data[:4] == b"RIFF" else decode_aiff
        for cut in (0, 4, 16, 30, len(data) // 2, len(data) - 1):
            try:
                dec(data[:cut])
            except Exception as e:  # noqa: BLE001
                assert isinstance(e, ValueError)
        ba = bytearray(data)
        for pos in range(0, min(len(ba), 400), 7):
            mut = bytearray(ba)
            mut[pos] ^= 0xFF
            try:
                dec(bytes(mut))
            except Exception as e:  # noqa: BLE001
                assert isinstance(e, (ValueError, OverflowError))


def test_media_integration():
    from crawler_spark.functions import media as M

    x = _sig()
    for codec, enc in (
        ("alaw", encode_audio_alaw(x)),
        ("wav", encode_wav(x, 8000, "ulaw")),
        ("aiff", encode_aiff(x, 8000)),
    ):
        s = M.decode_audio(enc, codec)
        assert len(s) == len(x) and _sqnr(x, s) > 30
