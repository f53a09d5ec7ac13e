"""JPEG 2000 (ITU-T T.800, functions/jpeg2000.py) and the /JPXDecode
XObject integration. Encoder and decoder share only the spec tables
(the MQ state machine, context models, lifting constants), so
bit-exact round-trips pin both sides; everything outside the subset
must quarantine, never emit garbage pixels."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.jpeg2000 import (
    decode_jpx,
    encode_j2k,
    wrap_jp2,
)


def _photo_like(rng, h, w, chans=0):
    """Smooth gradients + structured noise — compressible, full range."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (np.sin(xx / 7.0) + np.cos(yy / 9.0)) * 70 + 128
    if chans:
        out = np.stack(
            [base + 20 * k + rng.integers(-9, 10, (h, w)) for k in range(chans)],
            axis=-1,
        )
    else:
        out = base + rng.integers(-9, 10, (h, w))
    return np.clip(out, 0, 255).astype(np.uint8)


def test_lossless_roundtrip_shapes_and_levels():
    """5/3 + RCT reversible path: random and photo-like content, odd
    sizes, level counts 0-3, small code-blocks forcing multi-block
    packets — all bit-exact."""
    rng = np.random.default_rng(11)
    cases = [
        ((16, 16), 1, (4, 4)),
        ((37, 23), 2, (4, 4)),
        ((33, 61), 3, (4, 5)),
        ((8, 8), 0, (4, 4)),
        ((1, 17), 1, (4, 4)),
        ((19, 1), 2, (4, 4)),
    ]
    for shape, levels, cb in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        out = decode_jpx(encode_j2k(img, levels=levels, cb_exp=cb))
        assert np.array_equal(out, img), (shape, levels, cb)
    rgb = _photo_like(rng, 48, 64, 3)
    out = decode_jpx(encode_j2k(rgb, levels=2, cb_exp=(5, 5)))
    assert np.array_equal(out, rgb)


def test_lossless_roundtrip_16bit():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 65536, (21, 34)).astype(np.uint16)
    out = decode_jpx(encode_j2k(img, levels=2))
    assert out.dtype == np.uint16 and np.array_equal(out, img)


def test_decoder_structures_from_real_encoders():
    """The structures arbitrary encoders emit must all decode to the
    same pixels: RLCP/RPCL progressions, SOP/EPH marker segments, two
    quality layers (tail passes split + late-joining code-blocks),
    custom precincts, multiple tiles, and their combination."""
    rng = np.random.default_rng(17)
    img = _photo_like(rng, 45, 70)
    for kw in (
        dict(prog=1),
        dict(prog=2),
        dict(prog=3),
        dict(prog=4),
        dict(prog=3, precinct_exp=(4, 4), tile_size=(32, 32)),
        dict(prog=4, precinct_exp=(4, 4), layers=2),
        dict(sop=True, eph=True),
        dict(layers=2),
        dict(precinct_exp=(5, 5)),
        dict(precinct_exp=(4, 4), prog=2),
        dict(tile_size=(32, 32)),
        dict(tile_size=(30, 25), layers=2, precinct_exp=(5, 5), prog=1),
        dict(bypass=True),
        dict(bypass=True, segsym=True),
        dict(bypass=True, prog=2, precinct_exp=(4, 4)),
        dict(bypass=True, tile_size=(32, 32)),
        dict(reset=True),
        dict(termall=True),
        dict(causal=True),
        dict(bypass=True, reset=True, termall=True, causal=True,
             segsym=True),
    ):
        out = decode_jpx(encode_j2k(img, levels=2, cb_exp=(4, 4), **kw))
        assert np.array_equal(out, img), kw
    # bypass really splits the entropy stream: streams differ and the
    # raw passes cost bytes (they forgo arithmetic coding)
    plain = encode_j2k(img, levels=2, cb_exp=(4, 4))
    byp = encode_j2k(img, levels=2, cb_exp=(4, 4), bypass=True)
    assert byp != plain and len(byp) > len(plain)


def test_irreversible_97_psnr():
    """9/7 + ICT with Δb = 1: not bit-exact by design, but the
    float path must stay within a small fraction of a gray level."""
    rng = np.random.default_rng(19)
    for chans in (0, 3):
        img = _photo_like(rng, 40, 56, chans)
        out = decode_jpx(encode_j2k(img, levels=2, reversible=False))
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
        assert psnr > 45, (chans, psnr)


def test_segmentation_symbols():
    """cbstyle bit 5: the 1010 sentinel decodes after every cleanup
    pass; corrupting entropy data must surface as ValueError."""
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    data = encode_j2k(img, levels=1, segsym=True)
    assert np.array_equal(decode_jpx(data), img)
    # flip a byte deep in the entropy payload: the sentinel catches it
    mut = bytearray(data)
    mut[-20] ^= 0x5A
    with pytest.raises(ValueError):
        decode_jpx(bytes(mut))


def test_jp2_container():
    rng = np.random.default_rng(29)
    img = rng.integers(0, 256, (20, 26)).astype(np.uint8)
    code = encode_j2k(img, levels=1)
    assert np.array_equal(decode_jpx(wrap_jp2(code)), img)
    # a container without a jp2c box must raise, not decode garbage
    import struct

    sig = struct.pack(">I", 12) + b"jP  " + b"\x0d\x0a\x87\x0a"
    with pytest.raises(ValueError, match="jp2c"):
        decode_jpx(sig + struct.pack(">I", 8) + b"ftyp")
    with pytest.raises(ValueError):
        decode_jpx(b"\x00" * 16)


def test_unsupported_features_raise():
    """Out-of-subset codestream features surface as ValueError so the
    PDF extractor quarantines: undefined code-block style bits and
    undefined progression orders."""
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    data = bytearray(encode_j2k(img, levels=1))
    # COD segment: SOC(2) SIZ(2+2+38+3) then COD marker(2)+len(2)+body
    cod_off = data.find(b"\xff\x52")
    assert cod_off > 0
    body = cod_off + 4
    for byte_off, val, msg in (
        (body + 8, 0x40, "code-block style"),  # undefined style bit
        (body + 1, 9, "progression"),          # undefined order
    ):
        mut = bytearray(data)
        if byte_off == body + 8:
            mut[byte_off] |= val
        else:
            mut[byte_off] = val
        with pytest.raises(ValueError, match=msg):
            decode_jpx(bytes(mut))
    # truncated stream raises rather than looping or padding
    with pytest.raises(ValueError):
        decode_jpx(bytes(data[: len(data) // 2]))


def test_mq_shared_with_jbig2_different_initial_states():
    """JPEG 2000 seeds the MQ contexts per Table D.7 — verify the
    shared coder honors caller-set initial states both ways."""
    from crawler_spark.functions.jpeg2000 import _init_mq
    from crawler_spark.functions.mq import MQDecoder, MQEncoder

    import random

    rnd = random.Random(5)
    bits = [(rnd.randrange(2), rnd.choice([0, 17, 18])) for _ in range(600)]
    enc = MQEncoder()
    _init_mq(enc)
    for d, cx in bits:
        enc.encode(d, cx)
    dec = MQDecoder(enc.flush())
    _init_mq(dec)
    assert all(dec.decode(cx) == d for d, cx in bits)
    # without the seeding the streams must NOT agree (states matter)
    dec2 = MQDecoder(_enc_bits(bits))
    _init_mq(dec2)
    mismatch = any(dec2.decode(cx) != d for d, cx in bits)
    assert mismatch


def _enc_bits(bits):
    from crawler_spark.functions.mq import MQEncoder

    enc = MQEncoder()  # JBIG2-style all-zero initial states
    for d, cx in bits:
        enc.encode(d, cx)
    return enc.flush()


def test_jpx_xobject_extraction_pinned_phash():
    """/JPXDecode rides the PDF image pipeline end to end — gray and
    RGB, under a filter chain and encryption."""
    from crawler_spark.functions.images import phash64
    from crawler_spark.operators.pdf_decode import (
        extract_pdf_images,
        make_pdf_with_images,
    )

    rng = np.random.default_rng(37)
    gray = _photo_like(rng, 24, 40)
    rgb = _photo_like(rng, 20, 28, 3)
    g_exp = phash64(np.repeat(gray[:, :, None], 3, axis=2))
    c_exp = phash64(rgb)
    specs = [
        {"data": encode_j2k(gray, levels=2), "w": 40, "h": 24,
         "filter": "JPXDecode", "colorspace": "DeviceGray", "bpc": 8},
        {"data": wrap_jp2(encode_j2k(rgb, levels=1)), "w": 28, "h": 20,
         "filter": "JPXDecode", "colorspace": "DeviceRGB", "bpc": 8},
    ]
    rows = extract_pdf_images(make_pdf_with_images(specs))
    assert rows == [
        {"idx": 0, "w": 40, "h": 24, "fmt": "jpx", "phash": g_exp, "ok": True},
        {"idx": 1, "w": 28, "h": 20, "fmt": "jpx", "phash": c_exp, "ok": True},
    ]
    enc = extract_pdf_images(
        make_pdf_with_images(
            [dict(specs[0], prefix=["FlateDecode"])], encrypt="aes-128"
        )
    )
    assert enc[0]["phash"] == g_exp and enc[0]["ok"]
    # corrupt payload quarantines, never garbage pixels
    bad = dict(specs[0], data=specs[0]["data"][:40])
    rows = extract_pdf_images(make_pdf_with_images([bad]))
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_rgn_maxshift_roi():
    """Annex H maxshift ROI: the encoder lifts region coefficients
    above every background magnitude and signals the shift in an RGN
    marker; the decoder recognizes magnitudes ≥ 2^SPrgn and scales
    them back — bit-exact round-trip, and the ROI stream must differ
    from the plain encoding."""
    rng = np.random.default_rng(43)
    img = _photo_like(rng, 36, 44)
    data = encode_j2k(img, levels=2, cb_exp=(4, 4), roi=True)
    plain = encode_j2k(img, levels=2, cb_exp=(4, 4))
    assert data != plain
    assert np.array_equal(decode_jpx(data), img)
    rgb = _photo_like(rng, 24, 30, 3)
    assert np.array_equal(decode_jpx(encode_j2k(rgb, roi=True)), rgb)
    # non-maxshift RGN styles stay out of subset
    import struct

    mut = bytearray(data)
    pos = bytes(mut).find(b"\xff\x5e")
    assert pos > 0
    mut[pos + 5] = 1  # Srgn != 0
    with pytest.raises(ValueError, match="maxshift"):
        decode_jpx(bytes(mut))


def test_ppt_packed_headers():
    """B.10.8 PPT: packet headers live in Zppt-ordered tile-header
    segments while bodies stay in the bitstream — same pixels, and
    combinable with precincts/layers/tiles/bypass."""
    rng = np.random.default_rng(47)
    img = _photo_like(rng, 40, 52)
    base = encode_j2k(img, levels=2, cb_exp=(4, 4))
    for kw in (
        dict(ppt=True),
        dict(ppt=True, precinct_exp=(4, 4), layers=2),
        dict(ppt=True, tile_size=(32, 32), eph=True),
        dict(ppt=True, bypass=True),
    ):
        data = encode_j2k(img, levels=2, cb_exp=(4, 4), **kw)
        assert data != base
        assert np.array_equal(decode_jpx(data), img), kw


def test_ppm_packed_headers():
    """A.7.4 PPM: packet headers move to Zppm-ordered MAIN-header
    segments as Nppm-delimited per-tile-part groups — multi-tile
    codestreams exercise the group walk; PPM+PPT together must
    raise."""
    import struct

    rng = np.random.default_rng(53)
    img = _photo_like(rng, 40, 52)
    base = encode_j2k(img, levels=2, cb_exp=(4, 4))
    for kw in (
        dict(ppm=True),
        dict(ppm=True, tile_size=(32, 32)),  # several Nppm groups
        dict(ppm=True, precinct_exp=(4, 4), layers=2, eph=True),
        dict(ppm=True, bypass=True, tile_size=(16, 16)),
    ):
        data = encode_j2k(img, levels=2, cb_exp=(4, 4), **kw)
        assert data != base
        assert b"\xff\x60" in data  # PPM marker present
        assert np.array_equal(decode_jpx(data), img), kw
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_j2k(img, ppm=True, ppt=True)
    # truncated PPM stream (Nppm claims more than is there) raises
    data = bytearray(encode_j2k(img, levels=1, ppm=True))
    pos = bytes(data).find(b"\xff\x60")
    (nppm,) = struct.unpack_from(">I", data, pos + 5)
    struct.pack_into(">I", data, pos + 5, nppm + 10_000)
    with pytest.raises(ValueError, match="PPM"):
        decode_jpx(bytes(data))


def _move_poc_into_tile_header(data: bytes) -> bytes:
    """Relocate the main-header POC segment into the first tile-part
    header (both placements are legal; tile-header POC overrides)."""
    import struct

    pos = data.find(b"\xff\x5f")
    (ln,) = struct.unpack_from(">H", data, pos + 2)
    seg = data[pos : pos + 2 + ln]
    rest = data[:pos] + data[pos + 2 + ln :]
    sot = rest.find(b"\xff\x90")
    (psot,) = struct.unpack_from(">I", rest, sot + 6)
    out = bytearray(rest[: sot + 12] + seg + rest[sot + 12 :])
    struct.pack_into(">I", out, sot + 6, psot + len(seg))
    return bytes(out)


def test_poc_progression_changes():
    """A.6.6 POC: packets follow the concatenated bounded
    progressions; later entries skip packets an earlier entry already
    emitted; a tile-header POC works too."""
    rng = np.random.default_rng(59)
    img = _photo_like(rng, 40, 52)
    rgb = _photo_like(rng, 30, 36, 3)
    # resolution split LRCP→RLCP, with overlap so the skip rule matters
    cases = [
        (img, dict(levels=2, poc=[(0, 0, 1, 1, 256, 0),
                                  (0, 0, 1, 3, 256, 1)])),
        (img, dict(levels=2, layers=2,
                   poc=[(0, 0, 1, 3, 256, 0),      # layer 0, all res
                        (0, 0, 2, 3, 256, 2)])),   # rest via RPCL
        (rgb, dict(levels=1, poc=[(0, 0, 1, 2, 1, 4),   # comp 0 only
                                  (0, 0, 1, 2, 256, 0)])),
        (img, dict(levels=2, tile_size=(32, 32),
                   poc=[(0, 0, 1, 2, 256, 3),
                        (0, 0, 1, 3, 256, 0)])),
    ]
    for src, kw in cases:
        data = encode_j2k(src, cb_exp=(4, 4), **kw)
        plain = encode_j2k(src, cb_exp=(4, 4),
                           **{k: v for k, v in kw.items() if k != "poc"})
        assert data != plain
        assert np.array_equal(decode_jpx(data), src), kw
    data = encode_j2k(img, levels=2, cb_exp=(4, 4),
                      poc=[(0, 0, 1, 1, 256, 0), (0, 0, 1, 3, 256, 1)])
    moved = _move_poc_into_tile_header(data)
    assert moved != data
    assert np.array_equal(decode_jpx(moved), img)
    # malformed POC bodies raise rather than desync
    with pytest.raises(ValueError, match="POC"):
        decode_jpx(_corrupt_poc_len(data))


def _corrupt_poc_len(data: bytes) -> bytes:
    import struct

    pos = data.find(b"\xff\x5f")
    out = bytearray(data)
    (ln,) = struct.unpack_from(">H", out, pos + 2)
    # drop the final byte of the POC body: length no longer a multiple
    # of the entry size
    struct.pack_into(">H", out, pos + 2, ln - 1)
    del out[pos + 1 + ln]
    return bytes(out)


def test_depth_beyond_16():
    """Components deeper than 16 bits decode to uint32 — 24-bit
    lossless round-trip bit-exact, and the encoder rejects samples
    that overflow the stated depth."""
    rng = np.random.default_rng(61)
    img = rng.integers(0, 1 << 24, (19, 27)).astype(np.uint32)
    out = decode_jpx(encode_j2k(img, levels=2, cb_exp=(4, 4)))
    assert out.dtype == np.uint32 and np.array_equal(out, img)
    # explicit sub-byte-boundary depth on narrow data
    img12 = rng.integers(0, 1 << 12, (16, 16)).astype(np.uint16)
    out12 = decode_jpx(encode_j2k(img12, levels=1, depth=12))
    assert out12.dtype == np.uint16 and np.array_equal(out12, img12)
    with pytest.raises(ValueError, match="depth"):
        encode_j2k(img, depth=33)
    with pytest.raises(ValueError, match="exceed"):
        encode_j2k(img, depth=20)
