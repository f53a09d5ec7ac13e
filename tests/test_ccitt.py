"""CCITT G4/MH codec (ITU-T T.4/T.6, functions/ccitt.py) and its PDF
image-XObject integration — the scanned-document path the reference
reads through pdfjs (`src/lib/processPDf.ts`). VERDICT r3 #4."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.ccitt import (
    _BLACK_DECODE,
    _WHITE_DECODE,
    decode_ccittfax,
    decode_g4,
    decode_mh,
    encode_g4,
    encode_mh,
)
from crawler_spark.functions.images import phash64
from crawler_spark.operators.pdf_decode import (
    extract_pdf_images,
    make_pdf_with_images,
)


def test_run_tables_prefix_free():
    """A single typo'd code would round-trip (tables are shared by
    encoder+decoder) but break prefix-freeness against its neighbors —
    this structural check catches transcription errors the round-trip
    can't."""
    for table in (_WHITE_DECODE, _BLACK_DECODE):
        codes = sorted(table.keys(), key=lambda t: t[1])
        for i, (c1, l1) in enumerate(codes):
            for c2, l2 in codes[i + 1 :]:
                assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1), (
                    f"{c1:0{l1}b} prefixes {c2:0{l2}b}"
                )


def test_spec_vectors():
    """Hand-derived bit patterns from the T.4/T.6 coding rules:
    - all-white G4 row = one V0 bit ('1'); 3 rows pad to 0xE0
    - MH row [4 white][4 black] = 1011 (white-4) + 011 (black-4)
      -> 1011011 + pad = 0xB6
    - G4 single black pixel at col 3 of 8: H(001) W3(1000) B1(010),
      then V0 on the trailing white edge -> 00110000 101 -> 0x30 0xA0
    """
    assert encode_g4(np.zeros((3, 8), bool)) == b"\xe0"
    row = np.zeros((1, 8), bool)
    row[0, 4:] = True
    assert encode_mh(row, byte_align=True) == b"\xb6"
    one = np.zeros((1, 8), bool)
    one[0, 3] = True
    assert encode_g4(one) == b"\x30\xa0"
    # and they decode back
    assert np.array_equal(decode_g4(b"\x30\xa0", 8, 1) == 0, one)
    assert np.array_equal(decode_mh(b"\xb6", 8, 1) == 0, row)


@pytest.mark.parametrize("byte_align", [False, True])
def test_roundtrip_shapes(byte_align):
    rng = np.random.default_rng(11)
    for trial in range(24):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 90))
        style = trial % 4
        if style == 0:
            img = rng.random((h, w)) < 0.5
        elif style == 1:  # blocky scan-like content
            img = rng.random((max(1, h // 4), max(1, w // 8))) < 0.4
            img = np.kron(img, np.ones((4, 8), bool))[:h, :w]
            if img.shape != (h, w):
                img = np.pad(
                    img, ((0, h - img.shape[0]), (0, w - img.shape[1]))
                )
        elif style == 2:
            img = np.zeros((h, w), bool)
        else:
            img = np.ones((h, w), bool)
        back = decode_g4(encode_g4(img, byte_align), w, h, byte_align=byte_align)
        assert np.array_equal(back == 0, img), (trial, "g4")
        back = decode_mh(encode_mh(img, byte_align), w, h, byte_align=byte_align)
        assert np.array_equal(back == 0, img), (trial, "mh")


def test_long_runs_use_extended_makeups():
    img = np.zeros((2, 3000), bool)
    img[:, 2900:] = True
    for enc, dec in ((encode_g4, decode_g4), (encode_mh, decode_mh)):
        assert np.array_equal(dec(enc(img), 3000, 2) == 0, img)


def test_black_is_1_and_k_dispatch():
    img = np.eye(6, dtype=bool)
    flipped = decode_ccittfax(encode_g4(img), k=-1, columns=6, rows=6, black_is_1=True)
    normal = decode_ccittfax(encode_g4(img), k=-1, columns=6, rows=6)
    assert np.array_equal(flipped, 255 - normal)
    # K>0 dispatches to mixed G3 (r4)
    from crawler_spark.functions.ccitt import encode_g3_mixed

    g3 = decode_ccittfax(encode_g3_mixed(img, k=2), k=2, columns=6, rows=6)
    assert np.array_equal(g3, normal)
    with pytest.raises(ValueError):
        decode_ccittfax(b"\x00\x01\x02", k=2, columns=6, rows=6)


def test_g3_mixed_roundtrip_and_framing():
    """Mixed G3 (K>0): EOL + tag-bit framing, 1-D anchor rows every K,
    2-D rows between — round-trips exactly for k=1,2,4 and black-first
    lines (zero-length leading white run)."""
    from crawler_spark.functions.ccitt import decode_g3_mixed, encode_g3_mixed

    rng = np.random.default_rng(19)
    for k in (1, 2, 4):
        for _ in range(6):
            h = int(rng.integers(1, 30))
            w = int(rng.integers(1, 70))
            img = rng.random((h, w)) < 0.5
            img[:, 0] = True  # black-first edge
            back = decode_g3_mixed(encode_g3_mixed(img, k=k), w, h)
            assert np.array_equal(back == 0, img), k
    data = encode_g3_mixed(np.eye(8, dtype=bool), k=4)
    # framing starts with an EOL (000000000001) in the first 2 bytes
    assert data[0] == 0 and (data[1] & 0b11110000) == 0b00010000


def test_truncated_stream_raises():
    img = np.kron(np.eye(4, dtype=bool), np.ones((4, 8), bool))
    data = encode_g4(img)
    with pytest.raises(ValueError):
        decode_g4(data[: max(1, len(data) // 3)], img.shape[1], img.shape[0])


def test_ccitt_xobject_extraction_pinned_phash():
    """q58's done-condition: a CCITT-encoded XObject decodes to the
    independently-computed phash — under a filter chain and AES
    encryption too."""
    rng = np.random.default_rng(5)
    img = np.kron(rng.random((8, 12)) < 0.45, np.ones((3, 4), bool))
    h, w = img.shape
    gray = np.where(img, 0, 255).astype(np.uint8)
    exp = phash64(np.repeat(gray[:, :, None], 3, axis=2))
    parms = b"<< /K -1 /Columns %d /Rows %d >>" % (w, h)
    spec = {
        "data": encode_g4(img), "w": w, "h": h, "filter": "CCITTFaxDecode",
        "colorspace": "DeviceGray", "bpc": 1, "decode_parms": parms,
    }
    rows = extract_pdf_images(make_pdf_with_images([spec]))
    assert rows == [
        {"idx": 0, "w": w, "h": h, "fmt": "ccitt", "phash": exp, "ok": True}
    ]
    enc_rows = extract_pdf_images(
        make_pdf_with_images(
            [dict(spec, prefix=["FlateDecode"])], encrypt="aes-128"
        )
    )
    assert enc_rows[0]["phash"] == exp and enc_rows[0]["ok"]


def test_g3_mixed_xobject_decodes_and_garbage_quarantines():
    """K>0 XObjects decode for real (r4); a corrupt stream still
    surfaces as an ok=False row, never pixels."""
    from crawler_spark.functions.ccitt import encode_g3_mixed

    rng = np.random.default_rng(23)
    img = np.kron(rng.random((4, 6)) < 0.5, np.ones((4, 4), bool))
    h, w = img.shape
    gray = np.where(img, 0, 255).astype(np.uint8)
    exp = phash64(np.repeat(gray[:, :, None], 3, axis=2))
    parms = b"<< /K 4 /Columns %d /Rows %d >>" % (w, h)
    spec = {"data": encode_g3_mixed(img, k=4), "w": w, "h": h,
            "filter": "CCITTFaxDecode", "colorspace": "DeviceGray",
            "bpc": 1, "decode_parms": parms}
    rows = extract_pdf_images(make_pdf_with_images([spec]))
    assert rows == [{"idx": 0, "w": w, "h": h, "fmt": "ccitt",
                     "phash": exp, "ok": True}]
    bad = dict(spec, data=b"\x00\x01\x02")
    rows = extract_pdf_images(make_pdf_with_images([bad]))
    assert len(rows) == 1 and rows[0]["ok"] is False
