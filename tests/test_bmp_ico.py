"""BMP real-world envelope + ICO favicons (functions/images.py):
palette depths with RLE8, 16-bit bitfields, 32-bit, top-down rows,
and ICO directories holding DIB or PNG entries. Twin round-trips pin
each path; malformed input raises → quarantine."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark.functions.images import (
    decode_bmp,
    decode_ico,
    encode_bmp,
    encode_bmp_ex,
    encode_ico,
)


def _pal_img(rng, ncol, h=23, w=37):
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


def _img16(rng, widths=(5, 5, 5), h=23, w=37):
    chans = []
    for wd in widths:
        maxv = (1 << wd) - 1
        chans.append((rng.integers(0, maxv + 1, (h, w)) * 255 // maxv).astype(np.uint8))
    return np.stack(chans, axis=-1)


def test_bmp_shape_matrix():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (23, 37, 3)).astype(np.uint8)
    cases = [
        (arr, dict(bpp=24)),
        (arr, dict(bpp=32)),
        (arr, dict(bpp=24, top_down=True)),
        (_pal_img(rng, 200), dict(bpp=8)),
        (_pal_img(rng, 200), dict(bpp=8, rle=True)),
        (_pal_img(rng, 200), dict(bpp=8, rle=True, top_down=True)),
        (_pal_img(rng, 13), dict(bpp=4)),
        (_pal_img(rng, 2), dict(bpp=1)),
        (_img16(rng), dict(bpp=16)),  # default 555
        (_img16(rng, (5, 6, 5)), dict(bpp=16, bitfields=(0xF800, 0x07E0, 0x001F))),
    ]
    for a, opts in cases:
        assert np.array_equal(decode_bmp(encode_bmp_ex(a, **opts)), a), opts


def test_bmp_rle_run_heavy_content():
    """RLE8 with long runs and line breaks; flat regions compress."""
    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    arr = pal[np.repeat(rng.integers(0, 4, (9, 5)), 13, axis=1)[:, :60]]
    data = encode_bmp_ex(arr, bpp=8, rle=True)
    plain = encode_bmp_ex(arr, bpp=8)
    assert np.array_equal(decode_bmp(data), arr)
    assert len(data) < len(plain)


def test_legacy_24bit_still_roundtrips():
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_ico_dib_and_png_entries():
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    for png in (False, True):
        assert np.array_equal(decode_ico(encode_ico(arr, png=png)), arr)


def test_ico_picks_largest_entry():
    rng = np.random.default_rng(19)
    small = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    big = rng.integers(0, 256, (32, 16, 3)).astype(np.uint8)
    p1 = encode_ico(small)[6 + 16 :]
    p2 = encode_ico(big)[6 + 16 :]
    e1 = struct.pack("<BBBBHHII", 16, 16, 0, 0, 1, 24, len(p1), 6 + 32)
    e2 = struct.pack("<BBBBHHII", 16, 32, 0, 0, 1, 24, len(p2), 6 + 32 + len(p1))
    two = b"\x00\x00\x01\x00\x02\x00" + e1 + e2 + p1 + p2
    assert np.array_equal(decode_ico(two), big)


def test_registry_integration():
    from crawler_spark.functions import images as im

    assert "ico" in im.CODECS and "ico" not in im.LOSSY_FMTS
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    assert np.array_equal(im.decode_image(im.encode_image(arr, "ico"), "ico"), arr)


def test_size_bomb_rejected():
    info = struct.pack("<IiiHHIIiiII", 40, 1 << 14, 1 << 14, 1, 24, 0, 0, 0, 0, 0, 0)
    data = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + info
    with pytest.raises(ValueError, match="too large"):
        decode_bmp(data)


def test_truncation_and_corruption_contained():
    rng = np.random.default_rng(29)
    for opts in [dict(bpp=8, rle=True), dict(bpp=4), dict(bpp=16)]:
        if opts["bpp"] == 16:
            a = _img16(rng, h=16, w=16)
        else:
            a = _pal_img(rng, 13, 16, 16)
        data = encode_bmp_ex(a, **opts)
        for cut in (0, 10, 30, len(data) // 2, len(data) - 1):
            try:
                decode_bmp(data[:cut])
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))
        ba = bytearray(data)
        for pos in range(0, len(ba), 7):
            mut = bytearray(ba)
            mut[pos] ^= 0xFF
            try:
                decode_bmp(bytes(mut))
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))
    ico = encode_ico(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    for cut in (0, 4, 8, 20, len(ico) // 2):
        try:
            decode_ico(ico[:cut])
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))
