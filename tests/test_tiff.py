"""TIFF 6.0 container codec (functions/tiff.py) over the repo's own
compression kernels (CCITT T.4/T.6, JPEG, Deflate) plus TIFF-LZW and
PackBits. Encoder/decoder twins share only spec constants, so
round-trips pin both sides; features outside the envelope raise the
typed UnsupportedTiffError → quarantine, never garbage pixels."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.images import psnr
from crawler_spark.functions.tiff import (
    UnsupportedTiffError,
    decode_tiff,
    encode_tiff_ex,
    packbits_decode,
    packbits_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)


def _rgb(rng, h=37, w=23):
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_lzw_and_packbits_primitives():
    """TIFF-variant LZW (MSB-first, early change, Clear restarts) and
    PackBits round-trip arbitrary byte strings, incl. low-entropy data
    long enough to walk all code widths and the 4094 Clear restart."""
    for seed in range(12):
        r = np.random.default_rng(seed)
        data = bytes(
            r.integers(0, 8 if seed % 2 else 256, r.integers(0, 20000)).astype(np.uint8)
        )
        assert tiff_lzw_decode(tiff_lzw_encode(data))[: len(data)] == data
        assert packbits_decode(packbits_encode(data), len(data)) == data


@pytest.mark.parametrize(
    "opts",
    [
        dict(),
        dict(compression=5),
        dict(compression=5, predictor=2),
        dict(compression=8),
        dict(compression=8, predictor=2),
        dict(compression=32773),
        dict(rows_per_strip=7),
        dict(compression=5, rows_per_strip=5),
        dict(tile=(16, 16)),
        dict(tile=(16, 32), compression=8),
        dict(big_endian=True),
        dict(planar=2),
        dict(planar=2, compression=5, rows_per_strip=9),
    ],
)
def test_rgb_roundtrip_matrix(opts):
    rng = np.random.default_rng(7)
    arr = _rgb(rng)
    assert np.array_equal(decode_tiff(encode_tiff_ex(arr, **opts)), arr)


def test_gray_and_palette_photometrics():
    rng = np.random.default_rng(11)
    gray = np.repeat(rng.integers(0, 256, (37, 23, 1)), 3, axis=2).astype(np.uint8)
    for ph in (0, 1):
        assert np.array_equal(decode_tiff(encode_tiff_ex(gray, photometric=ph)), gray)
    for bps in (1, 2, 4):  # sub-byte gray, both senses
        maxv = (1 << bps) - 1
        g = (rng.integers(0, maxv + 1, (19, 13)) * 255 // maxv).astype(np.uint8)
        gr = np.repeat(g[:, :, None], 3, axis=2)
        for ph in (0, 1):
            assert np.array_equal(
                decode_tiff(encode_tiff_ex(gr, photometric=ph, bps=bps)), gr
            ), (bps, ph)
    pal = rng.integers(0, 256, (5, 3)).astype(np.uint8)[rng.integers(0, 5, (37, 23))]
    for opts in [dict(photometric=3, bps=4), dict(photometric=3, bps=8, compression=5)]:
        assert np.array_equal(decode_tiff(encode_tiff_ex(pal, **opts)), pal)


def test_ccitt_fax_compressions():
    """Bilevel G4 / MH / G3-2D strips through functions/ccitt.py,
    incl. FillOrder=2 bit reversal."""
    rng = np.random.default_rng(13)
    bil = np.repeat(rng.integers(0, 2, (37, 23, 1)) * 255, 3, axis=2).astype(np.uint8)
    for opts in [
        dict(compression=4),
        dict(compression=2),
        dict(compression=3),
        dict(compression=4, fill_order=2),
        dict(compression=4, rows_per_strip=10),
    ]:
        assert np.array_equal(decode_tiff(encode_tiff_ex(bil, **opts)), bil), opts


def test_jpeg_in_tiff():
    """Compression 7 (new-style JPEG) strips through the repo's JPEG
    codec; ≥ 40 dB per the lossy invariant, single- and multi-strip."""
    rng = np.random.default_rng(17)
    yy, xx = np.mgrid[0:48, 0:32]
    base = (np.sin(xx / 7.0) + np.cos(yy / 9.0)) * 70 + 128
    arr = np.clip(
        np.stack([base + 20 * k + rng.integers(-9, 10, (48, 32)) for k in range(3)], -1),
        0, 255,
    ).astype(np.uint8)
    for opts in [dict(compression=7), dict(compression=7, rows_per_strip=16)]:
        back = decode_tiff(encode_tiff_ex(arr, **opts))
        assert back.shape == arr.shape and psnr(arr, back) >= 40.0


def test_jpeg_tables_tag_merging():
    """A JPEGTables (347) tables stream is spliced after each strip's
    SOI — the libtiff convention for shared DQT/DHT."""
    import struct

    rng = np.random.default_rng(19)
    arr = _rgb(rng, 32, 16)
    data = bytearray(encode_tiff_ex(arr, compression=7))
    full = decode_tiff(bytes(data))
    # extract the single JPEG strip, split its tables out
    from crawler_spark.functions.tiff import _read_ifd

    tags = _read_ifd(bytes(data), "<")
    off, cnt = tags[273][0], tags[279][0]
    jpg = bytes(data[off : off + cnt])
    # walk segments: move DQT(FFDB)/DHT(FFC4) into a tables stream
    tables, body, pos = b"", b"\xff\xd8", 2
    while pos + 4 <= len(jpg):
        marker, ln = jpg[pos : pos + 2], struct.unpack(">H", jpg[pos + 2 : pos + 4])[0]
        seg = jpg[pos : pos + 2 + ln]
        if marker in (b"\xff\xdb", b"\xff\xc4"):
            tables += seg
        else:
            body += seg
        pos += 2 + ln
        if marker == b"\xff\xda":  # SOS: rest is entropy data
            body += jpg[pos:]
            break
    tables_stream = b"\xff\xd8" + tables + b"\xff\xd9"
    from crawler_spark.functions.tiff import _decompress_segment

    px = np.frombuffer(
        _decompress_segment(body, 7, 16, 32, 3, 8, 1, 0, tables_stream),
        np.uint8,
    ).reshape(32, 16, 3)
    assert np.array_equal(px, full)


def test_unsupported_features_raise_typed():
    rng = np.random.default_rng(23)
    arr = _rgb(rng, 8, 8)
    data = bytearray(encode_tiff_ex(arr))
    # patch compression tag (259) to old-style JPEG (6)
    from crawler_spark.functions.tiff import _read_ifd

    import struct

    (count,) = struct.unpack_from("<H", bytes(data), 8)
    for i in range(count):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", bytes(data), off)[0]
        if tag == 259:
            struct.pack_into("<H", data, off + 8, 6)
    with pytest.raises(UnsupportedTiffError):
        decode_tiff(bytes(data))


def test_size_bomb_rejected():
    import struct

    rng = np.random.default_rng(29)
    data = bytearray(encode_tiff_ex(_rgb(rng, 4, 4)))
    (count,) = struct.unpack_from("<H", bytes(data), 8)
    for i in range(count):
        off = 10 + 12 * i
        tag = struct.unpack_from("<H", bytes(data), off)[0]
        if tag in (256, 257):
            struct.pack_into("<I", data, off + 8, 1 << 14)
    with pytest.raises(ValueError, match="too large"):
        decode_tiff(bytes(data))


def test_truncation_and_corruption_contained():
    rng = np.random.default_rng(31)
    arr = _rgb(rng, 16, 16)
    for opts in [dict(compression=5), dict(compression=32773), dict(tile=(16, 16))]:
        data = encode_tiff_ex(arr, **opts)
        for cut in (0, 3, 9, len(data) // 2, len(data) - 1):
            try:
                decode_tiff(data[:cut])
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))
        ba = bytearray(data)
        for pos in range(0, len(ba), 5):
            mut = bytearray(ba)
            mut[pos] ^= 0xFF
            try:
                decode_tiff(bytes(mut))
            except Exception as e:  # noqa: BLE001
                assert not isinstance(e, (MemoryError, RecursionError))


def test_registry_integration():
    from crawler_spark.functions import images as im

    assert "tiff" in im.CODECS and "tiff" not in im.LOSSY_FMTS
    rng = np.random.default_rng(37)
    arr = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    assert np.array_equal(im.decode_image(im.encode_image(arr, "tiff"), "tiff"), arr)
