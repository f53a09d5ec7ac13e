"""Property-based codec hardening (hypothesis): arbitrary pixel
arrays round-trip losslessly (or within the PSNR bound), and
arbitrary/mutated byte strings NEVER hang or corrupt — they decode or
raise ValueError, nothing else. A crawler feeds codecs attacker-shaped
bytes; decode_stats_batch quarantines failures, so 'raises cleanly' is
the contract."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_spark.functions import images as im

_SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def rgb_arrays(draw, max_side: int = 33):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@settings(**_SETTINGS)
@given(arr=rgb_arrays(), fmt=st.sampled_from(["ppm", "bmp", "png", "jp2", "webp", "tiff", "ico"]))
def test_lossless_roundtrip_property(arr, fmt):
    assert np.array_equal(im.decode_image(im.encode_image(arr, fmt), fmt), arr)


@settings(**_SETTINGS)
@given(arr=rgb_arrays(max_side=24), fmt=st.sampled_from(["jpg", "qjpg"]))
def test_lossy_psnr_property(arr, fmt):
    back = im.decode_image(im.encode_image(arr, fmt), fmt)
    assert back.shape == arr.shape
    assert im.psnr(arr, back) >= 40.0


@settings(**_SETTINGS)
@given(
    data=st.binary(min_size=0, max_size=512),
    fmt=st.sampled_from(["ppm", "bmp", "png", "qjpg", "jpg", "gif", "webp", "tiff", "ico"]),
)
def test_garbage_bytes_never_hang(data, fmt):
    try:
        out = im.decode_image(data, fmt)
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001 — the contract: raise, don't hang
        assert not isinstance(e, (MemoryError, RecursionError))


@settings(**_SETTINGS)
@given(
    arr=rgb_arrays(max_side=16),
    fmt=st.sampled_from(["ppm", "bmp", "png", "qjpg", "jpg", "gif", "webp", "tiff", "ico"]),
    pos_frac=st.floats(0.0, 1.0),
    newbyte=st.integers(0, 255),
)
def test_single_byte_corruption_is_contained(arr, fmt, pos_frac, newbyte):
    """Flip one byte anywhere in a valid encoding: decode must either
    succeed (returning an array) or raise — no hangs, no interpreter
    errors. This is the path decode_stats_batch quarantines."""
    if fmt == "gif":
        arr = (arr // 64 * 64).astype(np.uint8)  # ≤256 colors for GIF
    data = bytearray(im.encode_image(arr, fmt))
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    data[pos] = newbyte
    try:
        out = im.decode_image(bytes(data), fmt)
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))


def test_resize_property_bounds():
    rng = np.random.default_rng(5)
    for _ in range(20):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        oh, ow = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = im.resize_rgb(arr, oh, ow)
        assert out.shape == (oh, ow, 3)
        # means are preserved within rounding for pure downscales
        if oh <= h and ow <= w:
            assert abs(float(out.mean()) - float(arr.mean())) < 16.0


@pytest.mark.parametrize("fmt", ["ppm", "bmp", "png", "qjpg", "jpg", "webp", "tiff", "ico"])
def test_truncation_is_contained(fmt):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = im.encode_image(arr, fmt)
    for cut in (0, 1, len(data) // 4, len(data) // 2, len(data) - 1):
        try:
            im.decode_image(data[:cut], fmt)
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))


# --------------------------------------------------------------------------
# JPEG 2000 (functions/jpeg2000.py): same contract — decode or raise
# ValueError, never hang/MemoryError. Header-declared geometry is an
# attacker input, so SIZ caps and box-walk guards are load-bearing.
# --------------------------------------------------------------------------


@settings(**_SETTINGS)
@given(data=st.binary(min_size=0, max_size=256))
def test_jpx_garbage_bytes_never_hang(data):
    from crawler_spark.functions.jpeg2000 import decode_jpx

    for wrapped in (data, b"\xff\x4f\xff\x51" + data):
        try:
            out = decode_jpx(wrapped)
            assert isinstance(out, np.ndarray)
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pos_frac=st.floats(0.0, 1.0), newbyte=st.integers(0, 255),
       seed=st.integers(0, 2**31 - 1))
def test_jpx_single_byte_corruption_is_contained(pos_frac, newbyte, seed):
    from crawler_spark.functions.jpeg2000 import decode_jpx, encode_j2k

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, (12, 14), dtype=np.uint8)
    data = bytearray(encode_j2k(arr, levels=1, cb_exp=(4, 4)))
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    data[pos] = newbyte
    try:
        out = decode_jpx(bytes(data))
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))


def test_jpx_truncation_is_contained():
    from crawler_spark.functions.jpeg2000 import decode_jpx, encode_j2k

    rng = np.random.default_rng(13)
    data = encode_j2k(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    for cut in (0, 2, 4, len(data) // 4, len(data) // 2, len(data) - 1):
        try:
            decode_jpx(data[:cut])
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))


def test_jpx_size_bomb_rejected():
    """A SIZ declaring a huge canvas must raise before allocating."""
    import struct

    from crawler_spark.functions.jpeg2000 import decode_jpx, encode_j2k

    rng = np.random.default_rng(17)
    data = bytearray(encode_j2k(rng.integers(0, 256, (8, 8), dtype=np.uint8)))
    siz_off = bytes(data).find(b"\xff\x51")
    struct.pack_into(">II", data, siz_off + 6, 1 << 20, 1 << 20)
    with pytest.raises(ValueError, match="too large"):
        decode_jpx(bytes(data))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pos_frac=st.floats(0.0, 1.0), newbyte=st.integers(0, 255),
       mode=st.integers(0, 2))
def test_jpx_packed_headers_poc_corruption_contained(pos_frac, newbyte, mode):
    """The new header indirections (PPM groups, POC entry walks) are
    attacker inputs too: corrupt streams decode or raise ValueError,
    never hang or blow memory."""
    from crawler_spark.functions.jpeg2000 import decode_jpx, encode_j2k

    rng = np.random.default_rng(19 + mode)
    arr = rng.integers(0, 256, (14, 18), dtype=np.uint8)
    kw = (
        dict(ppm=True, tile_size=(10, 10)),
        dict(poc=[(0, 0, 1, 1, 256, 0), (0, 0, 1, 2, 256, 1)]),
        dict(ppt=True, poc=[(0, 0, 1, 2, 256, 3)]),
    )[mode]
    data = bytearray(encode_j2k(arr, levels=1, cb_exp=(4, 4), **kw))
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    data[pos] = newbyte
    try:
        out = decode_jpx(bytes(data))
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pos_frac=st.floats(0.0, 1.0), newbyte=st.integers(0, 255),
       mode=st.integers(0, 2))
def test_jbig2_new_structures_corruption_contained(pos_frac, newbyte, mode):
    """Unknown-length terminators, Huffman-refined text regions and
    intermediate-region chains under single-byte corruption: decode
    or ValueError, never hang/MemoryError/IndexError-from-trust."""
    from crawler_spark.functions.jbig2 import (
        decode_jbig2_embedded,
        encode_jbig2_arith,
        encode_jbig2_intermediate_refine,
        encode_jbig2_text_huffman,
    )

    rng = np.random.default_rng(23 + mode)
    img = rng.random((14, 22)) < 0.4
    if mode == 0:
        data = encode_jbig2_arith(img, unknown_length=True)
    elif mode == 1:
        syms = [rng.random((5, 4)) < 0.5]
        ref = (np.pad(syms[0], ((0, 1), (0, 1))), 1, 1, 0, 0)
        data = encode_jbig2_text_huffman(
            syms, [(2, 2, 0), (10, 2, 0)], (20, 12),
            refinements=[ref, None],
        )
    else:
        refined = img.copy()
        refined[3:7, 4:12] ^= True
        data = encode_jbig2_intermediate_refine(img, refined, chain=True)
    data = bytearray(data)
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    data[pos] = newbyte
    try:
        out = decode_jbig2_embedded(bytes(data))
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))


# --------------------------------------------------------------------------
# Progressive / subsampled / grayscale / Adobe-CMYK JPEG (r4): the
# widened T.81 envelope meets the same contract — decode, or raise ValueError; a
# mutated successive-approximation stream must never hang, recurse, or
# blow memory, and a valid one must decode bit-identically to its
# baseline twin.


@st.composite
def _jpeg_variants(draw, max_side: int = 24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    seed = draw(st.integers(0, 2**31 - 1))
    gray = draw(st.booleans())
    rng = np.random.default_rng(seed)
    if gray:
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        sub, cs = "444", "auto"
    else:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        cs = draw(st.sampled_from(["auto", "rgb", "cmyk", "ycck"]))
        sub = (
            draw(st.sampled_from(["444", "422", "440", "420"]))
            if cs == "auto"
            else "444"  # Adobe spaces are stored 4:4:4
        )
    return arr, sub, cs


@settings(**_SETTINGS)
@given(av=_jpeg_variants())
def test_progressive_equals_baseline_property(av):
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    arr, sub, cs = av
    base = decode_jpeg(encode_jpeg(arr, subsampling=sub, colorspace=cs))
    prog = decode_jpeg(
        encode_jpeg(arr, subsampling=sub, colorspace=cs, progressive=True)
    )
    assert np.array_equal(base, prog)


@settings(**_SETTINGS)
@given(
    av=_jpeg_variants(max_side=16),
    pos_frac=st.floats(0.0, 1.0),
    newbyte=st.integers(0, 255),
    prog=st.booleans(),
)
def test_jpeg_variant_corruption_is_contained(av, pos_frac, newbyte, prog):
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    arr, sub, cs = av
    data = bytearray(
        encode_jpeg(arr, subsampling=sub, colorspace=cs, progressive=prog)
    )
    pos = min(len(data) - 1, int(pos_frac * len(data)))
    data[pos] = newbyte
    try:
        out = decode_jpeg(bytes(data))
        assert isinstance(out, np.ndarray)
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))


@settings(**_SETTINGS)
@given(av=_jpeg_variants(max_side=16), cut_frac=st.floats(0.0, 0.99), prog=st.booleans())
def test_jpeg_variant_truncation_is_contained(av, cut_frac, prog):
    from crawler_spark.functions.jpeg import decode_jpeg, encode_jpeg

    arr, sub, cs = av
    data = encode_jpeg(arr, subsampling=sub, colorspace=cs, progressive=prog)
    try:
        decode_jpeg(data[: int(len(data) * cut_frac)])
    except Exception as e:  # noqa: BLE001
        assert not isinstance(e, (MemoryError, RecursionError))
