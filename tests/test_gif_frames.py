"""Animated GIF (functions/images.py decode_gif_frames /
encode_gif_frames): full disposal/transparency composition semantics,
delta-frame sub-rectangles, NETSCAPE loop blocks. Round-trips pin the
twins; the still registry entry (decode_gif) stays first-frame."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark.functions.images import (
    decode_gif,
    decode_gif_frames,
    encode_gif_frames,
)


def _anim(rng, n=8, h=24, w=32, ncol=12):
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    base = pal[rng.integers(0, ncol, (h, w))]
    frames = []
    for i in range(n):
        f = base.copy()
        y, x = (i * 3) % (h - 4), (i * 5) % (w - 4)
        f[y : y + 4, x : x + 4] = pal[i % ncol]
        frames.append(f)
    return np.stack(frames)


def test_full_mode_roundtrip_and_fps():
    rng = np.random.default_rng(7)
    fr = _anim(rng)
    data = encode_gif_frames(fr, fps=20)
    back, fps = decode_gif_frames(data)
    assert np.array_equal(back, fr)
    assert abs(fps - 20) < 0.5


def test_delta_mode_subrect_transparency():
    """Delta frames paint only the changed bounding box with a
    transparent index for unchanged pixels — the composition path
    (sub-rectangle offsets + transparency) must reproduce the full
    frames exactly, at a fraction of the bytes."""
    rng = np.random.default_rng(11)
    fr = _anim(rng)
    full = encode_gif_frames(fr, fps=20)
    delta = encode_gif_frames(fr, fps=20, mode="delta")
    back, _ = decode_gif_frames(delta)
    assert np.array_equal(back, fr)
    assert len(delta) < len(full) / 2


def test_identical_consecutive_frames():
    rng = np.random.default_rng(13)
    fr = _anim(rng, n=4)
    fr[2] = fr[1]  # no change → 1×1 fully-transparent delta frame
    back, _ = decode_gif_frames(encode_gif_frames(fr, mode="delta"))
    assert np.array_equal(back, fr)


@pytest.mark.parametrize("disposal", [1, 2, 3])
def test_disposal_methods_with_full_paints(disposal):
    """With full-frame paints every disposal method composes to the
    painted frames; this pins that the decoder executes restore-to-
    background and restore-to-previous without corrupting state."""
    rng = np.random.default_rng(17)
    fr = _anim(rng, n=5)
    back, _ = decode_gif_frames(encode_gif_frames(fr, disposal=disposal))
    assert np.array_equal(back, fr)


def test_disposal_2_visible_with_delta_frames():
    """Restore-to-background after a delta frame: the next frame's
    unchanged (transparent) pixels show BACKGROUND, not the previous
    frame — built by hand since the twin encoder composes exactly."""
    # frame 0: all color 1; frame 1 (delta, disposal 2 on frame 0
    # already applied): transparent outside a 2×2 box of color 2.
    pal = bytes([10, 10, 10, 200, 0, 0, 0, 200, 0, 0, 0, 200])  # bg,c1,c2,pad
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0) + pal
    gce1 = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, (2 << 2), 5, 0, 0)  # disposal 2
    img1 = struct.pack("<BHHHHB", 0x2C, 0, 0, 4, 4, 0)
    from crawler_spark.functions.images import _gif_lzw_encode

    lzw1 = _gif_lzw_encode(bytes([1] * 16), 2)
    img1 += bytes([2, len(lzw1)]) + lzw1 + b"\x00"
    gce2 = struct.pack("<BBBBHBB", 0x21, 0xF9, 4, (1 << 2) | 1, 5, 3, 0)  # transp 3
    img2 = struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    lzw2 = _gif_lzw_encode(bytes([2, 3, 3, 2]), 2)
    img2 += bytes([2, len(lzw2)]) + lzw2 + b"\x00"
    data = hdr + gce1 + img1 + gce2 + img2 + b"\x3b"
    frames, _ = decode_gif_frames(data)
    assert frames.shape == (2, 4, 4, 3)
    assert (frames[0] == [200, 0, 0]).all()  # color 1 everywhere
    # frame 1: background (10,10,10) everywhere except the two opaque
    # color-2 pixels at (1,1) and (2,2)
    assert (frames[1][0, 0] == [10, 10, 10]).all()
    assert (frames[1][1, 1] == [0, 200, 0]).all()
    assert (frames[1][2, 2] == [0, 200, 0]).all()
    assert (frames[1][1, 2] == [10, 10, 10]).all()  # transparent over bg


def test_still_registry_reads_first_frame():
    rng = np.random.default_rng(19)
    fr = _anim(rng)
    assert np.array_equal(decode_gif(encode_gif_frames(fr)), fr[0])


def test_media_integration_and_frame_sampling():
    from crawler_spark.functions import media as M

    rng = np.random.default_rng(23)
    fr = _anim(rng, n=10)
    frames, fps = M.decode_video(encode_gif_frames(fr, fps=12.5), "gif")
    assert np.array_equal(frames, fr) and abs(fps - 12.5) < 0.1


def test_size_bomb_and_containment():
    big = b"GIF89a" + struct.pack("<HHBBB", 16000, 16000, 0, 0, 0)
    with pytest.raises(ValueError, match="too large"):
        decode_gif_frames(big + b"\x3b")
    rng = np.random.default_rng(29)
    fr = _anim(rng, n=3)
    data = encode_gif_frames(fr, mode="delta")
    for cut in (0, 6, 14, len(data) // 2, len(data) - 1):
        try:
            decode_gif_frames(data[:cut])
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))
    ba = bytearray(data)
    for pos in range(0, len(ba), 7):
        mut = bytearray(ba)
        mut[pos] ^= 0xFF
        try:
            decode_gif_frames(bytes(mut))
        except Exception as e:  # noqa: BLE001
            assert not isinstance(e, (MemoryError, RecursionError))
