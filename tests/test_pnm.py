"""PNM family decode (functions/images.py decode_ppm): P1-P6, ASCII
and raw, sub-255 and 16-bit maxvals, comments — hand-built fixtures
since only P6/255 has an encoder twin (the registry's lossless
format)."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.images import decode_ppm, encode_ppm


def test_p6_registry_roundtrip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (11, 13, 3)).astype(np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_p5_gray_8_and_16_bit():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    out = decode_ppm(b"P5\n7 5\n255\n" + g.tobytes())
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))
    g16 = rng.integers(0, 65536, (4, 6)).astype(np.uint16)
    out = decode_ppm(b"P5\n# a comment\n6 4\n65535\n" + g16.astype(">u2").tobytes())
    assert np.array_equal(
        out[:, :, 0], (g16.astype(np.uint32) * 255 // 65535).astype(np.uint8)
    )


def test_p4_bitmap_packed_msb_first():
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, (3, 10)).astype(np.uint8)
    data = b"P4\n10 3\n" + np.packbits(bits, axis=1).tobytes()
    assert np.array_equal(decode_ppm(data)[:, :, 0], np.where(bits, 0, 255))


def test_ascii_formats_scale_maxval():
    rng = np.random.default_rng(17)
    a3 = rng.integers(0, 16, (2, 3, 3))
    data = ("P3\n3 2\n15\n" + " ".join(str(v) for v in a3.reshape(-1))).encode()
    assert np.array_equal(decode_ppm(data), (a3 * 255 // 15).astype(np.uint8))
    a2 = rng.integers(0, 4, (2, 2))
    data = ("P2 2 2 3 " + " ".join(str(v) for v in a2.reshape(-1))).encode()
    assert np.array_equal(decode_ppm(data)[:, :, 1], (a2 * 255 // 3).astype(np.uint8))
    a1 = rng.integers(0, 2, (2, 4))
    data = ("P1\n4 2\n" + " ".join(str(v) for v in a1.reshape(-1))).encode()
    assert np.array_equal(decode_ppm(data)[:, :, 2], np.where(a1, 0, 255))


def test_sub255_binary_maxval_scales():
    g = np.array([[0, 7, 14], [3, 10, 14]], np.uint8)
    out = decode_ppm(b"P5\n3 2\n14\n" + g.tobytes())
    assert np.array_equal(out[:, :, 0], (g.astype(np.uint32) * 255 // 14).astype(np.uint8))


def test_malformed_contained():
    for junk in (
        b"",
        b"P",
        b"P6",
        b"P6\n",
        b"P6\n5 5\n255\n",  # truncated pixels
        b"P9\n1 1\n255\n\x00",
        b"P6\n99999 99999\n255\n",
        b"P5\n2 2\n0\n\x00\x00\x00\x00",
    ):
        with pytest.raises(ValueError):
            decode_ppm(junk)
