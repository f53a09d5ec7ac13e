"""FLAC codec (functions/flac.py, RFC 9639). Encoder/decoder twins
share only the spec constants (CRC polynomials, fixed-predictor
coefficients, rice/zigzag), so bit-exact round-trips pin both sides;
CRC-8/CRC-16/MD5 verification turns corruption into typed FlacError →
quarantine, never garbage samples."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.flac import FlacError, decode_flac, encode_flac


def _tone(n, f=440.0, rate=8000, amp=0.3):
    t = np.arange(n) / rate
    return (np.sin(2 * np.pi * f * t) * amp * 32767).astype(np.int16)


def test_mono_roundtrip_and_compression():
    x = _tone(16000)
    data = encode_flac(x, 8000, lpc_order=8)
    back, rate = decode_flac(data)
    assert rate == 8000
    assert np.array_equal(back, x)
    assert len(data) < len(x)  # < 0.5× of the 2-byte raw samples


def test_random_noise_roundtrip():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, 3000).astype(np.int16)
    back, _ = decode_flac(encode_flac(x, 44100))
    assert np.array_equal(back, x)


@pytest.mark.parametrize(
    "mode", ["auto", "independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_modes(mode):
    l = _tone(4000, 440)
    r = (_tone(4000, 444) * 0.9).astype(np.int16)
    st = np.stack([l, r], axis=-1)
    back, _ = decode_flac(encode_flac(st, 8000, stereo=mode))
    assert np.array_equal(back, st)


@pytest.mark.parametrize(
    "opts",
    [
        dict(force_subframe="verbatim"),
        dict(force_escape=True),
        dict(rice2=True),
        dict(partition_order=2),
        dict(partition_order=4),
        dict(lpc_order=4),
        dict(lpc_order=12),
        dict(force_subframe="lpc", lpc_order=6),
        dict(block_size=192),
        dict(block_size=577),  # odd block → partition order falls back
        dict(variable_blocksize=True),
    ],
)
def test_forced_decoder_shapes(opts):
    """Each decoder path (verbatim, escape partitions, rice2, deep
    partitions, LPC, odd/coded block sizes, variable-blocksize coded
    numbers) is round-trip-pinned."""
    x = _tone(2000)
    back, _ = decode_flac(encode_flac(x, 8000, **opts))
    assert np.array_equal(back, x)


def test_constant_and_wasted_bits():
    x = np.full(1000, 1024, np.int16)
    assert np.array_equal(decode_flac(encode_flac(x, 8000))[0], x)
    x = (_tone(1000) & ~7).astype(np.int16)  # 3 shared trailing zeros
    data_w = encode_flac(x, 8000, wasted_ok=True)
    data_n = encode_flac(x, 8000, wasted_ok=False)
    assert np.array_equal(decode_flac(data_w)[0], x)
    assert np.array_equal(decode_flac(data_n)[0], x)
    assert len(data_w) < len(data_n)  # wasted-bits tracking saves bits


def test_large_coded_frame_numbers():
    """Many small frames walk multi-byte UTF-8-style frame numbers."""
    x = _tone(192 * 140)
    back, _ = decode_flac(encode_flac(x, 8000, block_size=192))
    assert np.array_equal(back, x)


def test_crc_and_md5_catch_corruption():
    x = _tone(3000)
    data = bytearray(encode_flac(x, 8000))
    # flip one byte in the audio region (past the 4+4+34 byte header)
    for pos in (60, len(data) // 2, len(data) - 3):
        mut = bytearray(data)
        mut[pos] ^= 0xFF
        with pytest.raises(FlacError):
            decode_flac(bytes(mut))


def test_truncation_and_garbage_contained():
    x = _tone(2000)
    data = encode_flac(x, 8000)
    for cut in (0, 3, 20, 44, len(data) // 2, len(data) - 1):
        try:
            decode_flac(data[:cut])
        except Exception as e:  # noqa: BLE001
            assert isinstance(e, ValueError)
    rng = np.random.default_rng(11)
    for seed in range(20):
        junk = b"fLaC" + bytes(
            np.random.default_rng(seed).integers(0, 256, 120, dtype=np.uint8)
        )
        try:
            decode_flac(junk)
        except Exception as e:  # noqa: BLE001
            assert isinstance(e, ValueError)


def test_media_integration():
    """flac joins decode_audio; lossless over the pcm16 quantization,
    so fingerprints downstream see identical samples."""
    from crawler_spark.functions import media as M

    rng = np.random.default_rng(13)
    f = np.sin(np.linspace(0, 80, 5000)) * 0.4 + rng.normal(0, 0.01, 5000)
    pcm = M.encode_audio_pcm16(f)
    flac = M.encode_audio_flac(f, 8000)
    a = M.decode_audio(pcm, "pcm16")
    b = M.decode_audio(flac, "flac")
    assert np.array_equal(a, b)
    assert len(flac) < len(pcm)
