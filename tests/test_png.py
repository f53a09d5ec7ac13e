"""Full-envelope PNG decode (functions/images.py): all five color
types, bit depths 1-16, all filters, Adam7 interlace, CRC-checked
critical chunks. encode_png_ex emits every spec shape so each decoder
path is round-trip-pinned (no codec libs exist in this env to
cross-check against; same twin-pinning discipline as the JPEG/JPX/
VP8L codecs)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from crawler_spark.functions.images import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
    encode_png,
    encode_png_ex,
)


def _gray_for_depth(rng, h, w, depth):
    maxv = (1 << depth) - 1
    lv = rng.integers(0, maxv + 1, (h, w))
    g = (lv * 255 // maxv).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


@pytest.mark.parametrize(
    "ctype,depths",
    [(0, (1, 2, 4, 8, 16)), (2, (8, 16)), (3, (1, 2, 4, 8)), (4, (8, 16)), (6, (8, 16))],
)
def test_color_type_depth_matrix(ctype, depths):
    """Every legal (color type, depth) combo × interlace × forced
    filter round-trips exactly."""
    rng = np.random.default_rng(ctype + 101)
    for depth in depths:
        if ctype in (0, 4):
            arr = _gray_for_depth(rng, 21, 13, min(depth, 8))
        elif ctype == 3:
            ncol = min(1 << depth, 7)
            pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
            arr = pal[rng.integers(0, ncol, (21, 13))]
        else:
            arr = rng.integers(0, 256, (21, 13, 3)).astype(np.uint8)
        for interlace in (0, 1):
            for ft in (None, 0, 1, 2, 3, 4):
                data = encode_png_ex(
                    arr, color_type=ctype, depth=depth,
                    interlace=interlace, filter_type=ft,
                )
                assert np.array_equal(decode_png(data), arr), (depth, interlace, ft)


def test_adam7_tiny_images_with_empty_passes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (1, 2), (2, 1), (3, 7), (7, 3), (8, 8), (9, 17)]:
        arr = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        data = encode_png_ex(arr, interlace=1)
        assert np.array_equal(decode_png(data), arr), shape


def test_16bit_decodes_to_high_byte():
    """External 16-bit PNGs (hi != lo byte) reduce to the high byte —
    the standard 8-bit reduction."""
    rng = np.random.default_rng(11)
    h, w = 4, 5
    g16 = rng.integers(0, 65536, (h, w), dtype=np.uint16)
    rows = b"".join(b"\x00" + g16[y].astype(">u2").tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data)[:, :, 0], (g16 >> 8).astype(np.uint8))


def test_crc_mismatch_raises():
    rng = np.random.default_rng(13)
    data = bytearray(encode_png(rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)))
    # corrupt one IDAT payload byte: the chunk CRC must catch it
    idat_off = bytes(data).find(b"IDAT")
    data[idat_off + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_palette_index_out_of_range_raises():
    # 1 palette entry but index 1 used
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    rows = b"\x00\x00\x01"
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", b"\x10\x20\x30")
        + _png_chunk(b"IDAT", zlib.compress(rows))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(data)


def test_size_bomb_rejected():
    ihdr = struct.pack(">IIBBBBB", 1 << 14, 1 << 14, 8, 2, 0, 0, 0)
    data = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="too large"):
        decode_png(data)


def test_truncation_and_corruption_contained():
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    for interlace in (0, 1):
        data = encode_png_ex(arr, interlace=interlace)
        for cut in (0, 10, len(data) // 2, len(data) - 1):
            try:
                decode_png(data[:cut])
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))
        ba = bytearray(data)
        for pos in range(0, len(ba), 5):
            mut = bytearray(ba)
            mut[pos] ^= 0xFF
            try:
                decode_png(bytes(mut))
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))


def test_ancillary_chunks_skipped():
    """tEXt/gAMA etc. (even with bogus CRCs) don't affect decode."""
    rng = np.random.default_rng(19)
    arr = rng.integers(0, 256, (6, 6, 3)).astype(np.uint8)
    data = encode_png(arr)
    ihdr_end = 8 + 12 + 13
    bogus = struct.pack(">I", 4) + b"tEXt" + b"abcd" + b"\x00\x00\x00\x00"
    spliced = data[:ihdr_end] + bogus + data[ihdr_end:]
    assert np.array_equal(decode_png(spliced), arr)
