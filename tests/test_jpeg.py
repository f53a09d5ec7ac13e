"""Real baseline JPEG codec (functions/jpeg.py): structure, round-trip
PSNR (the input_hint's >= 40 dB lossy invariant), table-driven decode,
and byte-stuffing conformance. No Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from crawler_spark.functions import images as im
from crawler_spark.functions.jpeg import (
    _ZZ,
    decode_jpeg,
    encode_jpeg,
)


def _markers(data: bytes) -> list[int]:
    """Ordered marker bytes, skipping each segment by its length field
    (so stuffed 0xFF00 inside entropy data is never misread)."""
    out, i = [], 2
    out.append(0xD8)
    while i < len(data):
        assert data[i] == 0xFF
        m = data[i + 1]
        out.append(m)
        i += 2
        if m == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, i)
        i += ln
        if m == 0xDA:  # entropy data runs to the next real marker
            while i < len(data) - 1:
                if data[i] == 0xFF and data[i + 1] != 0x00 and not (
                    0xD0 <= data[i + 1] <= 0xD7
                ):
                    break
                i += 1
    return out


def test_zigzag_is_standard_prefix():
    # first 10 positions of the T.81 zigzag in raster indices
    assert _ZZ[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert _ZZ[-1] == 63


def test_structure_and_determinism():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    data = encode_jpeg(arr)
    assert data == encode_jpeg(arr)  # deterministic
    ms = _markers(data)
    assert ms[0] == 0xD8 and ms[-1] == 0xD9
    assert ms.count(0xDB) == 2 and ms.count(0xC4) == 4
    assert 0xC0 in ms and 0xDA in ms  # baseline SOF0
    # SOF0 carries the unpadded dims
    i = data.find(b"\xff\xc0")
    _ln, _prec, h, w, nc = struct.unpack_from(">HBHHB", data, i + 2)
    assert (h, w, nc) == (24, 40, 3)


def test_entropy_segment_is_byte_stuffed():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    data = encode_jpeg(arr)
    i = data.find(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    scan = data[i + 2 + ln : -2]  # between SOS header and EOI
    assert b"\xff" in scan  # stuffing actually exercised
    k = 0
    while True:
        k = scan.find(b"\xff", k)
        if k == -1:
            break
        assert scan[k + 1] == 0x00, f"bare 0xFF at scan offset {k}"
        k += 2


@pytest.mark.parametrize(
    "shape", [(8, 8), (17, 23), (1, 1), (16, 128), (64, 64)]
)
def test_noise_roundtrip_psnr_above_40(shape):
    # uniform noise is the worst case for transform coding; the default
    # quality must still clear the input_hint's 40 dB line
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(arr))
    assert back.shape == arr.shape
    assert im.psnr(arr, back) >= 40.0


def test_smooth_content_much_higher_psnr():
    yy, xx = np.mgrid[0:48, 0:80]
    grad = np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256], -1).astype(
        np.uint8
    )
    back = decode_jpeg(encode_jpeg(grad))
    assert im.psnr(grad, back) >= 55.0


def test_quality_knob_monotone():
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    psnrs = [
        im.psnr(arr, decode_jpeg(encode_jpeg(arr, quality=q)))
        for q in (80, 90, 98)
    ]
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (80, 90, 98)]
    assert psnrs == sorted(psnrs)
    assert sizes == sorted(sizes)


def test_decoder_reads_tables_from_stream():
    # a quality-80 stream has different DQT contents than the default;
    # decode must follow the file, not this encoder's default tables
    rng = np.random.default_rng(19)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    lo = encode_jpeg(arr, quality=80)
    hi = encode_jpeg(arr, quality=98)
    assert lo != hi
    p_lo = im.psnr(arr, decode_jpeg(lo))
    p_hi = im.psnr(arr, decode_jpeg(hi))
    assert p_hi > p_lo > 20.0


def test_registry_dispatch_and_lossy_membership():
    assert "jpg" in im.CODECS and "jpg" in im.LOSSY_FMTS
    rng = np.random.default_rng(23)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    back = im.decode_image(im.encode_image(arr, "jpg"), "jpg")
    assert im.psnr(arr, back) >= 40.0
    # decode(encode(.)) is idempotent truth for the fixture goldens:
    # re-decoding the same bytes is bit-identical
    data = im.encode_image(arr, "jpg")
    assert np.array_equal(im.decode_image(data, "jpg"), im.decode_image(data, "jpg"))


def test_restart_interval_roundtrip():
    # DRI + RSTn every 2 MCUs: byte-aligned segments, DC preds reset.
    # A decoder that ignored restarts would keep stale predictors and
    # mis-align the bit reader -> corrupt pixels; this pins correctness.
    rng = np.random.default_rng(31)
    arr = rng.integers(0, 256, (24, 48, 3), dtype=np.uint8)  # 18 MCUs
    data = encode_jpeg(arr, restart_interval=2)
    assert b"\xff\xdd" in data  # DRI present
    # RST0..RST7 cycle appears in the scan
    assert b"\xff\xd0" in data and b"\xff\xd7" in data
    back = decode_jpeg(data)
    assert im.psnr(arr, back) >= 40.0
    # and matches the no-restart decode of the same pixels
    plain = decode_jpeg(encode_jpeg(arr))
    assert im.psnr(plain, back) >= 40.0


def test_restart_markers_without_dri_rejected():
    rng = np.random.default_rng(37)
    arr = rng.integers(0, 256, (16, 32, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr, restart_interval=2))
    i = data.find(b"\xff\xdd")
    del data[i : i + 6]  # strip the DRI segment, keep the RSTs
    with pytest.raises(ValueError, match="RST markers without DRI"):
        decode_jpeg(bytes(data))


def test_out_of_order_rst_rejected():
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 256, (16, 48, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr, restart_interval=1))
    i = data.find(b"\xff\xd0")
    data[i + 1] = 0xD3  # RST0 -> RST3: sequence break
    with pytest.raises(ValueError, match="out-of-order RST"):
        decode_jpeg(bytes(data))


def test_truncated_entropy_stream_raises():
    # chopping entropy bytes must surface as ValueError, never as
    # plausible garbage pixels (ADVICE r3: 1-bit padding masked it)
    rng = np.random.default_rng(43)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg(arr)
    i = data.find(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", data, i + 2)
    scan_start = i + 2 + ln
    scan_len = len(data) - 2 - scan_start
    for frac in (0.25, 0.5, 0.9):
        cut = scan_start + int(scan_len * frac)
        truncated = data[:cut] + b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg(truncated)


def test_rejects_malformed():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))  # 2 channels
    rng = np.random.default_rng(29)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr))
    i = data.index(0xC0, 2)  # SOF0 marker byte (after 0xFF)
    data[i] = 0xC2  # masquerade as progressive
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


# ------------------------------------------------- subsampling / grayscale


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256], -1
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["422", "440", "420"])
def test_subsampled_roundtrip_smooth(sub):
    # chroma subsampling trades color detail; smooth content must still
    # clear the 40 dB line at the default quality (odd dims exercise the
    # padded-MCU vs true-block split)
    grad = _smooth(33, 49)
    data = encode_jpeg(grad, subsampling=sub)
    back = decode_jpeg(data)
    assert back.shape == grad.shape
    assert im.psnr(grad, back) >= 40.0
    # SOF carries the subsampled factors for comp 1
    i = data.find(b"\xff\xc0")
    hv = data[i + 2 + 9]  # first component's (h<<4)|v
    assert hv == {"422": 0x21, "440": 0x12, "420": 0x22}[sub]


def test_420_zero_chroma_noise_holds_40db():
    # gray-content RGB has zero chroma, so 4:2:0 loses nothing there;
    # even uniform noise must clear 40 dB (the worst case for the luma
    # channel alone)
    rng = np.random.default_rng(31)
    g = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    grgb = np.stack([g] * 3, -1)
    back = decode_jpeg(encode_jpeg(grgb, subsampling="420"))
    assert im.psnr(grgb, back) >= 40.0


def test_grayscale_single_component():
    rng = np.random.default_rng(37)
    g = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    data = encode_jpeg(g)
    # one component in SOF, two DHTs, one DQT
    i = data.find(b"\xff\xc0")
    _ln, _prec, h, w, nc = struct.unpack_from(">HBHHB", data, i + 2)
    assert (h, w, nc) == (17, 23, 1)
    ms = _markers(data)
    assert ms.count(0xDB) == 1 and ms.count(0xC4) == 2
    back = decode_jpeg(data)
    assert back.shape == (17, 23, 3)
    assert np.array_equal(back[..., 0], back[..., 1])
    assert np.array_equal(back[..., 0], back[..., 2])
    assert im.psnr(np.stack([g] * 3, -1), back) >= 40.0
    # (h, w, 1) spelling is accepted too and produces identical bytes
    assert encode_jpeg(g.reshape(17, 23, 1)) == data


def test_subsampled_restart_interval_matches_plain():
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    with_rst = encode_jpeg(arr, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in with_rst
    assert np.array_equal(
        decode_jpeg(with_rst), decode_jpeg(encode_jpeg(arr, subsampling="420"))
    )


# ------------------------------------------------------------- progressive


@pytest.mark.parametrize("sub", ["444", "422", "440", "420"])
@pytest.mark.parametrize("shape", [(24, 20), (33, 49), (8, 8), (1, 1)])
def test_progressive_decodes_bit_identical_to_baseline(sub, shape):
    # both scan scripts carry the same quantized coefficients, so the
    # decoded pixels must match EXACTLY — any drift in the successive-
    # approximation or EOB-run logic breaks equality, not a threshold
    rng = np.random.default_rng(43)
    arr = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    d_base = decode_jpeg(encode_jpeg(arr, subsampling=sub))
    d_prog = decode_jpeg(encode_jpeg(arr, subsampling=sub, progressive=True))
    assert np.array_equal(d_base, d_prog)


def test_progressive_grayscale_bit_identical():
    rng = np.random.default_rng(47)
    g = rng.integers(0, 256, (19, 27), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g)), decode_jpeg(encode_jpeg(g, progressive=True))
    )


def test_progressive_structure():
    rng = np.random.default_rng(53)
    arr = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = encode_jpeg(arr, progressive=True)
    ms = _markers(data)
    assert 0xC2 in ms and 0xC0 not in ms
    # DC first + 4 AC first (luma split 1-5/6-63, chroma 1-63 each)
    # + DC refine + 4 AC refine = 10 scans
    assert ms.count(0xDA) == 10
    # a progressive stream is structurally different but decodes the same
    assert data != encode_jpeg(arr)


def test_progressive_truncation_raises():
    rng = np.random.default_rng(59)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = encode_jpeg(arr, progressive=True)
    # cut inside the LAST scan's entropy data so the final refinement
    # pass hits reader exhaustion
    last_sos = data.rfind(b"\xff\xda")
    (ln,) = struct.unpack_from(">H", data, last_sos + 2)
    scan_start = last_sos + 2 + ln
    cut = scan_start + max(1, (len(data) - 2 - scan_start) // 2)
    with pytest.raises(ValueError):
        decode_jpeg(data[:cut] + b"\xff\xd9")


def test_progressive_rejects_bad_scan_shapes():
    rng = np.random.default_rng(61)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr))
    i = data.index(0xC0, 2)
    data[i] = 0xC2  # sequential scan header under a progressive frame
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


# ------------------------------------------------- Adobe APP14 colorspaces


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("cs", ["rgb", "cmyk", "ycck"])
@pytest.mark.parametrize("progressive", [False, True])
def test_adobe_colorspaces_roundtrip_40db(cs, progressive):
    rng = np.random.default_rng(67)
    arr = rng.integers(0, 256, (41, 57, 3), dtype=np.uint8)
    data = encode_jpeg(arr, colorspace=cs, progressive=progressive)
    assert _psnr(arr, decode_jpeg(data)) >= 40.0
    # APP14 Adobe present, JFIF APP0 absent (it mandates YCbCr/gray)
    ms = _markers(data)
    assert 0xEE in ms and 0xE0 not in ms
    i = data.index(b"Adobe")
    assert data[i + 11] == (2 if cs == "ycck" else 0)


@pytest.mark.parametrize("cs", ["rgb", "cmyk", "ycck"])
def test_adobe_progressive_bit_identical_to_sequential(cs):
    rng = np.random.default_rng(71)
    arr = rng.integers(0, 256, (24, 20, 3), dtype=np.uint8)
    d_seq = decode_jpeg(encode_jpeg(arr, colorspace=cs))
    d_prog = decode_jpeg(encode_jpeg(arr, colorspace=cs, progressive=True))
    assert np.array_equal(d_seq, d_prog)


def test_adobe_rgb_beats_ycc_on_smooth_content():
    # transform 0 skips the lossy color transform entirely, so smooth
    # content round-trips strictly better than the JFIF YCbCr path
    ramp = np.linspace(0, 255, 64 * 48, dtype=np.float64).reshape(64, 48)
    arr = np.stack([ramp, ramp[::-1], np.full_like(ramp, 128)], axis=-1).astype(np.uint8)
    p_rgb = _psnr(arr, decode_jpeg(encode_jpeg(arr, colorspace="rgb")))
    p_ycc = _psnr(arr, decode_jpeg(encode_jpeg(arr)))
    assert p_rgb >= 60.0 and p_rgb > p_ycc


def test_cmyk_restart_interval_matches_plain():
    rng = np.random.default_rng(73)
    arr = rng.integers(0, 256, (33, 31, 3), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg(arr, colorspace="cmyk"))
    rst = decode_jpeg(encode_jpeg(arr, colorspace="cmyk", restart_interval=2))
    assert np.array_equal(plain, rst)


def test_four_components_without_app14_default_cmyk():
    # libjpeg convention: 4 components with no Adobe marker = CMYK
    rng = np.random.default_rng(79)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(arr, colorspace="cmyk")
    assert data[2:4] == b"\xff\xee"
    (seglen,) = struct.unpack_from(">H", data, 4)
    stripped = data[:2] + data[4 + seglen :]
    assert np.array_equal(decode_jpeg(data), decode_jpeg(stripped))


def test_ycck_marked_transform_1_rejected():
    # transform 1 (YCbCr) is meaningless for a 4-component frame
    rng = np.random.default_rng(83)
    arr = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr, colorspace="cmyk"))
    i = data.index(b"Adobe")
    data[i + 11] = 1
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_adobe_colorspace_rejects_subsampling():
    arr = np.zeros((16, 16, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg(arr, colorspace="cmyk", subsampling="420")
    with pytest.raises(ValueError):
        encode_jpeg(arr, colorspace="nope")


# --------------------------------------------------- 12-bit precision


def _ref8(arr12: np.ndarray) -> np.ndarray:
    return np.clip(np.round(arr12 * (255.0 / 4095.0)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("progressive", [False, True])
def test_12bit_roundtrip_matches_8bit_quality_curve(progressive):
    rng = np.random.default_rng(89)
    arr12 = rng.integers(0, 4096, (41, 57, 3), dtype=np.uint16)
    data = encode_jpeg(arr12, precision=12, progressive=progressive)
    out = decode_jpeg(data)
    assert _psnr(_ref8(arr12), out) >= 40.0
    # 12-bit baseline is illegal: sequential emits SOF1, not SOF0
    ms = _markers(data)
    assert (0xC2 if progressive else 0xC1) in ms and 0xC0 not in ms


def test_12bit_16bit_dqt_emitted_when_needed():
    rng = np.random.default_rng(97)
    arr12 = rng.integers(0, 4096, (24, 24, 3), dtype=np.uint16)
    data = encode_jpeg(arr12, quality=50, precision=12)
    i = data.index(b"\xff\xdb")
    assert data[i + 4] >> 4 == 1  # Pq=1: 16-bit entries
    # and it round-trips (decoder parses the wide table)
    assert decode_jpeg(data).shape == (24, 24, 3)


def test_12bit_progressive_bit_identical_to_sequential():
    rng = np.random.default_rng(101)
    arr12 = rng.integers(0, 4096, (24, 20, 3), dtype=np.uint16)
    a = decode_jpeg(encode_jpeg(arr12, precision=12))
    b = decode_jpeg(encode_jpeg(arr12, precision=12, progressive=True))
    c = decode_jpeg(encode_jpeg(arr12, precision=12, restart_interval=2))
    assert np.array_equal(a, b) and np.array_equal(a, c)


def test_12bit_grayscale_and_rejections():
    rng = np.random.default_rng(103)
    g12 = rng.integers(0, 4096, (19, 23), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg(g12, precision=12))
    assert _psnr(np.stack([_ref8(g12)] * 3, -1), out) >= 40.0
    arr12 = rng.integers(0, 4096, (8, 8, 3), dtype=np.uint16)
    with pytest.raises(ValueError):
        encode_jpeg(arr12, precision=12, colorspace="cmyk")
    with pytest.raises(ValueError):
        encode_jpeg(arr12.astype(np.int32) + 4096, precision=12)
    with pytest.raises(ValueError):
        encode_jpeg(arr12, precision=10)


def test_12bit_on_sof0_rejected():
    # a stream claiming 12-bit baseline is malformed per B.2.2
    rng = np.random.default_rng(107)
    arr12 = rng.integers(0, 4096, (8, 8, 3), dtype=np.uint16)
    data = bytearray(encode_jpeg(arr12, precision=12))
    i = bytes(data).index(b"\xff\xc1")
    data[i + 1] = 0xC0  # SOF1 -> SOF0 marker byte
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_generated_huffman_tables_are_canonical():
    from crawler_spark.functions.jpeg import (
        _AC12_BITS,
        _AC12_VALS,
        _DC12_BITS,
        _DC12_VALS,
        _build_codes,
    )

    for bits, vals in ((_DC12_BITS, _DC12_VALS), (_AC12_BITS, _AC12_VALS)):
        assert len(bits) == 16 and sum(bits) == len(vals)
        kraft = sum(n << (16 - ln) for ln, n in zip(range(1, 17), bits))
        assert kraft <= 65535  # strict: the all-ones 16-bit code is free
        codes = _build_codes(bits, vals)
        assert not any(ln == 16 and c == 0xFFFF for c, ln in codes.values())
    assert set(_DC12_VALS) == set(range(16))
    need = {0x00, 0xF0}
    need |= {r << 4 for r in range(1, 15)}
    need |= {(r << 4) | s for r in range(16) for s in range(1, 16)}
    assert set(_AC12_VALS) == need
