"""WebP lossless (VP8L, functions/vp8l.py). Encoder and decoder share
only the spec constants (code-length-code order, 2-D distance map,
predictor/color-transform arithmetic), so bit-exact round-trips pin
both sides across the full decoder feature matrix; lossy VP8 payloads
must raise the typed UnsupportedWebPError, never emit garbage pixels.
The reference drops images (src/lib/md/mdUtils.ts:23-44); the graft
keeps them, and WebP is a first-class real-web payload format."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark.functions.vp8l import (
    UnsupportedWebPError,
    _BitReader,
    _prefix_decode,
    _prefix_encode,
    decode_webp,
    encode_vp8l,
    encode_webp,
    wrap_webp,
)


def _photo(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (np.sin(xx / 7.0) + np.cos(yy / 9.0)) * 70 + 128
    out = np.stack(
        [np.clip(base + 20 * k + rng.integers(-9, 10, (h, w)), 0, 255) for k in range(3)],
        axis=-1,
    )
    return out.astype(np.uint8)


def test_prefix_value_coding_inverse():
    """LZ77 length/distance prefix codes: encode is the exact inverse
    of decode across the whole value range (1..4096 and beyond)."""

    class _FixedBR:
        def __init__(self, val, nbits):
            self.val, self.nbits = val, nbits

        def read(self, n):
            assert n == self.nbits
            return self.val

    for v in list(range(1, 5000)) + [1 << 18, 4096]:
        code, eb, ev = _prefix_encode(v)
        assert 0 <= code < 40
        assert _prefix_decode(code, _FixedBR(ev, eb)) == v


def test_roundtrip_random_rgb_shapes():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (16, 16), (37, 23), (64, 64), (1, 64), (64, 1)]:
        arr = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        assert np.array_equal(decode_webp(encode_webp(arr)), arr), shape


def test_roundtrip_all_predictor_modes():
    """All 14 spec predictor modes, incl. Select (11) and the
    ClampAddSubtract pair (12/13) with C-truncation division."""
    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (19, 31, 3)).astype(np.uint8)
    for mode in range(14):
        data = encode_webp(arr, predictor=mode, palette=False)
        assert np.array_equal(decode_webp(data), arr), mode


def test_roundtrip_color_transform():
    """Cross-color transform with int8 multiplier semantics (negative
    multipliers exercise the arithmetic >> 5)."""
    rng = np.random.default_rng(17)
    arr = _photo(rng, 33, 47)
    for mults in [(34, 56, 12), (200, 3, 255), (128, 128, 128), (0, 0, 0)]:
        for sg in (False, True):
            data = encode_webp(arr, color_transform=mults, subtract_green=sg, palette=False)
            assert np.array_equal(decode_webp(data), arr), (mults, sg)


def test_roundtrip_color_cache_sizes():
    rng = np.random.default_rng(19)
    arr = _photo(rng, 24, 40)
    for bits in (1, 4, 6, 11):
        data = encode_webp(arr, cache_bits=bits)
        assert np.array_equal(decode_webp(data), arr), bits


def test_roundtrip_lz77_variants():
    """Distance-1 runs, row-above copies, the 2-D distance map path,
    and the no-LZ77 literal path."""
    rng = np.random.default_rng(23)
    base = _photo(rng, 20, 30)
    runs = base.copy()
    runs[5:9] = runs[5]  # vertical repetition → row-above copies
    runs[12, 4:25] = runs[12, 4]  # horizontal run → distance-1 copies
    for opts in [dict(), dict(use_2d_dist=True), dict(use_lz77=False)]:
        data = encode_webp(runs, palette=False, **opts)
        assert np.array_equal(decode_webp(data), runs), opts


def test_roundtrip_palette_bundling():
    """Color-indexing transform at every bundling width: 1-bit (≤2
    colors), 2-bit (≤4), 4-bit (≤16) and unpacked (≤256)."""
    rng = np.random.default_rng(29)
    for ncol in [1, 2, 3, 4, 9, 16, 17, 200, 256]:
        pal = rng.integers(0, 256, (max(ncol, 1), 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, (23, 37)) if ncol > 1 else np.zeros((23, 37), int)
        arr = pal[idx]
        data = encode_webp(arr, palette=True)
        assert np.array_equal(decode_webp(data), arr), ncol


def test_roundtrip_meta_prefix_groups():
    """Meta prefix codes: two code groups selected by an entropy
    image, with and without a shared color cache."""
    rng = np.random.default_rng(31)
    arr = _photo(rng, 25, 48)
    for opts in [dict(meta_split=True), dict(meta_split=True, cache_bits=5)]:
        data = encode_webp(arr, **opts)
        assert np.array_equal(decode_webp(data), arr), opts


def test_auto_palette_picks_compact_form():
    """≤256-color content auto-selects the color-indexing transform
    and lands far below literal coding."""
    rng = np.random.default_rng(37)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    arr = pal[rng.integers(0, 4, (64, 64))]
    auto = encode_webp(arr)
    literal = encode_webp(arr, palette=False, use_lz77=False)
    assert np.array_equal(decode_webp(auto), arr)
    assert len(auto) < len(literal) / 2


def test_degenerate_constant_image_fast_path():
    """Single-symbol codes consume no bits; the decoder must fill
    vectorized (decode-bomb guard) and still be exact."""
    arr = np.full((100, 100, 3), 77, np.uint8)
    data = encode_webp(arr)
    assert len(data) < 120
    assert np.array_equal(decode_webp(data), arr)


def test_lossy_vp8_raises_typed_error():
    fake = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(UnsupportedWebPError):
        decode_webp(fake)


def test_animation_raises_typed_error():
    fake = b"RIFF" + struct.pack("<I", 16) + b"WEBP" + b"ANIM" + struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(UnsupportedWebPError):
        decode_webp(fake)


def test_vp8x_container_with_vp8l_payload():
    """Extended (VP8X) containers carrying a VP8L chunk decode; the
    walk skips unknown chunks with odd-length padding."""
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 256, (9, 11, 3)).astype(np.uint8)
    payload = encode_vp8l(arr)
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    odd = b"XYZa" + struct.pack("<I", 3) + b"abc\x00"  # odd chunk + pad
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    body = b"WEBP" + vp8x + odd + chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(decode_webp(data), arr)


def test_size_bomb_rejected():
    """A header declaring a huge canvas raises before allocating."""
    rng = np.random.default_rng(43)
    payload = bytearray(encode_vp8l(rng.integers(0, 256, (4, 4, 3)).astype(np.uint8)))
    # signature byte, then 14+14 bits of (w-1, h-1): force 16384×16384
    bits = 0x2F | ((16383) << 8) | ((16383) << 22)
    payload[0:5] = bits.to_bytes(5, "little")
    with pytest.raises(ValueError, match="too large"):
        decode_webp(wrap_webp(bytes(payload)))


def test_truncation_and_garbage_contained():
    rng = np.random.default_rng(47)
    arr = _photo(rng, 16, 16)
    data = encode_webp(arr)
    for cut in (0, 1, 12, len(data) // 2, len(data) - 1):
        try:
            decode_webp(data[:cut])
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))
    for seed in range(30):
        junk = np.random.default_rng(seed).integers(0, 256, 200, dtype=np.uint8).tobytes()
        try:
            decode_webp(b"RIFF\x00\x01\x00\x00WEBPVP8L" + struct.pack("<I", len(junk)) + junk)
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))


def test_registry_integration():
    """webp participates in the images CODECS registry as a lossless
    format (q56 rotation)."""
    from crawler_spark.functions import images as im

    assert "webp" in im.CODECS and "webp" not in im.LOSSY_FMTS
    rng = np.random.default_rng(53)
    arr = rng.integers(0, 256, (24, 16, 3)).astype(np.uint8)
    assert np.array_equal(im.decode_image(im.encode_image(arr, "webp"), "webp"), arr)
