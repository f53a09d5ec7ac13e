"""JBIG2 subsets (ITU-T T.88, functions/jbig2.py) and the
/JBIG2Decode XObject integration: MMR + arithmetic generic regions,
symbol dictionaries, text regions (both orientations), /JBIG2Globals
streams. Everything outside the subset must quarantine, never emit
garbage pixels."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.images import phash64
from crawler_spark.functions.jbig2 import (
    decode_jbig2_embedded,
    encode_jbig2_mmr,
)
from crawler_spark.operators.pdf_decode import (
    extract_pdf_images,
    make_pdf_with_images,
)


def _scan_like(rng, h, w):
    img = rng.random((max(1, h // 4), max(1, w // 8))) < 0.4
    img = np.kron(img, np.ones((4, 8), bool))[:h, :w]
    if img.shape != (h, w):
        img = np.pad(img, ((0, h - img.shape[0]), (0, w - img.shape[1])))
    return img


def test_embedded_roundtrip():
    rng = np.random.default_rng(3)
    for trial in range(10):
        h = int(rng.integers(1, 50))
        w = int(rng.integers(1, 100))
        img = _scan_like(rng, h, w)
        back = decode_jbig2_embedded(encode_jbig2_mmr(img))
        assert back.shape == (h, w)
        assert np.array_equal(back == 0, img), trial


def test_unsupported_segment_kinds_raise():
    # reserved segment type (37) — out of subset
    import struct

    seg = struct.pack(">IB", 0, 37) + b"\x00\x01" + struct.pack(">I", 0)
    with pytest.raises(ValueError, match="unsupported"):
        decode_jbig2_embedded(seg)
    # TPGDON with MMR is invalid per spec
    data = bytearray(encode_jbig2_mmr(np.eye(8, dtype=bool)))
    # generic flags byte sits right after the 2nd segment's region info
    # (header 11 bytes + page-info 19 + header 11 + region-info 17)
    data[11 + 19 + 11 + 17] = 0x09  # MMR=1 + TPGDON
    with pytest.raises(ValueError, match="TPGDON"):
        decode_jbig2_embedded(bytes(data))
    # truncated globals stream
    with pytest.raises(ValueError, match="truncated"):
        decode_jbig2_embedded(b"", globals_data=b"x")


def test_jbig2_xobject_extraction_pinned_phash():
    rng = np.random.default_rng(29)
    img = _scan_like(rng, 24, 40)
    h, w = img.shape
    gray = np.where(img, 0, 255).astype(np.uint8)
    exp = phash64(np.repeat(gray[:, :, None], 3, axis=2))
    spec = {
        "data": encode_jbig2_mmr(img), "w": w, "h": h,
        "filter": "JBIG2Decode", "colorspace": "DeviceGray", "bpc": 1,
    }
    rows = extract_pdf_images(make_pdf_with_images([spec]))
    assert rows == [
        {"idx": 0, "w": w, "h": h, "fmt": "jbig2", "phash": exp, "ok": True}
    ]
    # under a filter chain + encryption too
    enc = extract_pdf_images(
        make_pdf_with_images(
            [dict(spec, prefix=["FlateDecode"])], encrypt="rc4-128"
        )
    )
    assert enc[0]["phash"] == exp and enc[0]["ok"]


def test_jbig2_globals_param_quarantines():
    spec = {
        "data": b"\x00\x01", "w": 8, "h": 8, "filter": "JBIG2Decode",
        "colorspace": "DeviceGray", "bpc": 1,
        "decode_parms": b"<< /JBIG2Globals 99 0 R >>",
    }
    rows = extract_pdf_images(make_pdf_with_images([spec]))
    assert len(rows) == 1 and rows[0]["ok"] is False


def test_mq_coder_roundtrip_fuzz():
    """The MQ coder pair (functions/mq.py, T.88 Annex E): encoder and
    decoder share only the Table E.1 state machine, so agreement over
    varied lengths / context counts / biases pins both sides."""
    import random

    from crawler_spark.functions.mq import MQDecoder, MQEncoder

    rnd = random.Random(7)
    for _ in range(25):
        n = rnd.randrange(1, 2000)
        ncx = rnd.choice([1, 3, 16, 256])
        bias = rnd.random()
        bits = [
            (1 if rnd.random() < bias else 0, rnd.randrange(ncx))
            for _ in range(n)
        ]
        enc = MQEncoder()
        for d, cx in bits:
            enc.encode(d, cx)
        dec = MQDecoder(enc.flush())
        assert all(dec.decode(cx) == d for d, cx in bits)


def test_arithmetic_generic_region_roundtrip():
    """All four GB templates, with and without TPGDON."""
    from crawler_spark.functions.jbig2 import encode_jbig2_arith

    rng = np.random.default_rng(31)
    for template in (0, 1, 2, 3):
        for tpgdon in (False, True):
            for _ in range(3):
                h = int(rng.integers(2, 40))
                w = int(rng.integers(2, 80))
                img = _scan_like(rng, h, w)
                back = decode_jbig2_embedded(
                    encode_jbig2_arith(img, template, tpgdon)
                )
                assert np.array_equal(back == 0, img), (template, tpgdon)
    # TPGDON shrinks repeated-row content (per-row copy bit)
    img = np.zeros((64, 64), bool)
    img[10:50, 8:40] = True
    assert len(encode_jbig2_arith(img, 0, True)) < len(
        encode_jbig2_arith(img, 0, False)
    )
    # arithmetic beats MMR on structured scans (adaptive contexts)
    img = _scan_like(rng, 96, 128)
    from crawler_spark.functions.jbig2 import encode_jbig2_mmr as mmr

    assert len(encode_jbig2_arith(img)) < len(mmr(img))


def test_arithmetic_jbig2_xobject():
    from crawler_spark.functions.jbig2 import encode_jbig2_arith

    rng = np.random.default_rng(37)
    img = _scan_like(rng, 24, 32)
    h, w = img.shape
    gray = np.where(img, 0, 255).astype(np.uint8)
    exp = phash64(np.repeat(gray[:, :, None], 3, axis=2))
    rows = extract_pdf_images(
        make_pdf_with_images(
            [{"data": encode_jbig2_arith(img), "w": w, "h": h,
              "filter": "JBIG2Decode", "colorspace": "DeviceGray", "bpc": 1}]
        )
    )
    assert rows == [
        {"idx": 0, "w": w, "h": h, "fmt": "jbig2", "phash": exp, "ok": True}
    ]


def test_int_arith_codecs_roundtrip():
    """IAx (T.88 A.2) and IAID (A.3) over the shared MQ coder — the
    parameter codecs symbol dictionaries / text regions are built
    from. Mixed magnitudes across all six value classes + OOB."""
    import random

    from crawler_spark.functions.mq import (
        OOB,
        IntArithCodec,
        MQDecoder,
        MQEncoder,
        SymbolIDCodec,
    )

    rnd = random.Random(11)
    for _ in range(12):
        n = rnd.randrange(1, 300)
        vals = []
        for _ in range(n):
            r = rnd.random()
            if r < 0.05:
                vals.append(OOB)
            elif r < 0.4:
                vals.append(rnd.randrange(-3, 4))
            elif r < 0.7:
                vals.append(rnd.randrange(-100, 101))
            elif r < 0.9:
                vals.append(rnd.randrange(-5000, 5001))
            else:
                vals.append(rnd.randrange(-(10**8), 10**8))
        code_len = rnd.choice([1, 3, 6])
        ids = [rnd.randrange(1 << code_len) for _ in range(n)]
        enc = MQEncoder()
        ia, iaid = IntArithCodec(1 << 17), SymbolIDCodec(1 << 18, code_len)
        for v, sid in zip(vals, ids):
            ia.encode(enc, v)
            iaid.encode(enc, sid)
        dec = MQDecoder(enc.flush())
        da, did = IntArithCodec(1 << 17), SymbolIDCodec(1 << 18, code_len)
        for v, sid in zip(vals, ids):
            got = da.decode(dec)
            assert (got is OOB) == (v is OOB) and (got is OOB or got == v)
            assert did.decode(dec) == sid


def test_text_page_symbol_dict_roundtrip():
    """The TEXT shape real JBIG2 encoders emit: glyphs decode once
    into a symbol dictionary, the text region places dictionary ids at
    (S, T) — all parameter streams (IADH/IADW/IAEX/IAFS/IADS/IAID)
    multiplex one MQ stream with the glyph bitmaps."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text

    rng = np.random.default_rng(5)
    syms = [
        rng.random((int(rng.integers(3, 9)), int(rng.integers(2, 8)))) < 0.5
        for _ in range(6)
    ]
    placements = [(5, 2, 0), (20, 2, 1), (40, 2, 2),
                  (5, 15, 3), (30, 15, 4), (60, 15, 5),
                  (5, 28, 0), (20, 28, 0), (40, 28, 5)]  # reuse = the point
    W, H = 80, 40
    page = decode_jbig2_embedded(encode_jbig2_text(syms, placements, (W, H)))
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        h, w = syms[si].shape
        want[y : y + h, x : x + w][syms[si]] = 0
    assert np.array_equal(page, want)


def test_text_page_xobject_extraction():
    from crawler_spark.functions.jbig2 import encode_jbig2_text

    rng = np.random.default_rng(41)
    syms = [rng.random((6, 5)) < 0.5 for _ in range(3)]
    placements = [(4, 3, 0), (14, 3, 1), (24, 3, 2), (4, 14, 2)]
    W, H = 40, 24
    data = encode_jbig2_text(syms, placements, (W, H))
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        h, w = syms[si].shape
        want[y : y + h, x : x + w][syms[si]] = 0
    exp = phash64(np.repeat(want[:, :, None], 3, axis=2))
    rows = extract_pdf_images(
        make_pdf_with_images(
            [{"data": data, "w": W, "h": H, "filter": "JBIG2Decode",
              "colorspace": "DeviceGray", "bpc": 1}]
        )
    )
    assert rows == [
        {"idx": 0, "w": W, "h": H, "fmt": "jbig2", "phash": exp, "ok": True}
    ]


def test_corrupt_huffman_flag_raises_not_garbage():
    """Flipping SDHUFF on an arithmetic stream reinterprets the AT
    bytes as Huffman counts — that must surface as ValueError (the
    extractor quarantines), never as silently wrong glyphs."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text

    rng = np.random.default_rng(43)
    data = bytearray(
        encode_jbig2_text([rng.random((4, 4)) < 0.5], [(2, 2, 0)], (12, 12))
    )
    # symbol-dict flags u16 sits after page-info segment (11+19 bytes)
    # + its own header (11 bytes)
    data[11 + 19 + 11 + 1] |= 0x01  # SDHUFF=1
    with pytest.raises(ValueError):
        decode_jbig2_embedded(bytes(data))


def test_huffman_standard_tables_complete():
    """Annex-B gate: every shipped standard table forms a COMPLETE
    prefix code (Kraft sum exactly 1) — the property transcription
    errors break first. B.7/B.10 are deliberately absent (their
    transcriptions failed this gate) and their selections raise."""
    from crawler_spark.functions.jbig2_huffman import STANDARD_TABLES

    assert sorted(STANDARD_TABLES) == [1, 2, 3, 4, 5, 6, 8, 9, 11, 12,
                                       13, 14, 15]
    for k, t in STANDARD_TABLES.items():
        assert t.domain_complete(), k
    # walking every code of every length must reach exactly the
    # declared entries — no gaps, no unreachable prefixes
    for k, t in STANDARD_TABLES.items():
        maxlen = max(pl for pl, _ in t.codes)
        reachable = 0
        for pl, code in t.codes:
            reachable += 1 << (maxlen - pl)
        assert reachable == 1 << maxlen, k


def test_huffman_text_page_roundtrip():
    """SDHUFF=1 / SBHUFF=1: collective-bitmap symbol dict + standard-
    table text region reproduce the arithmetic page exactly, both
    orientations, and ride the XObject path."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text_huffman

    rng = np.random.default_rng(67)
    syms = [
        rng.random((int(rng.integers(3, 9)), int(rng.integers(2, 8)))) < 0.5
        for _ in range(6)
    ]
    placements = [(5, 2, 0), (20, 2, 1), (40, 2, 2), (5, 15, 3),
                  (30, 15, 4), (60, 15, 5), (5, 28, 0), (40, 28, 5)]
    W, H = 80, 40
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        h, w = syms[si].shape
        want[y : y + h, x : x + w][syms[si]] = 0
    for transposed in (False, True):
        data = encode_jbig2_text_huffman(
            syms, placements, (W, H), transposed=transposed
        )
        assert np.array_equal(decode_jbig2_embedded(data), want), transposed
    # custom table segment (§7.4.13): the strip deltas ride a table
    # whose code lengths match no standard table — selection 3 must
    # resolve it through the referred segment, or the page breaks
    data = encode_jbig2_text_huffman(syms, placements, (W, H),
                                     custom_dt=True)
    assert np.array_equal(decode_jbig2_embedded(data), want)
    # dropping the table reference must raise (missing custom table)
    import struct as _s

    mut = bytearray(data)
    hdrpos = bytes(mut).find(_s.pack(">IB", 3, 7))
    assert hdrpos > 0
    mut[hdrpos + 5] = 1 << 5  # refcount 1 (drop the table ref)
    del mut[hdrpos + 7]  # remove the second ref byte
    with pytest.raises(ValueError, match="custom table"):
        decode_jbig2_embedded(bytes(mut))
    data = encode_jbig2_text_huffman(syms, placements, (W, H))
    exp = phash64(np.repeat(want[:, :, None], 3, axis=2))
    rows = extract_pdf_images(
        make_pdf_with_images(
            [{"data": data, "w": W, "h": H, "filter": "JBIG2Decode",
              "colorspace": "DeviceGray", "bpc": 1}]
        )
    )
    assert rows == [
        {"idx": 0, "w": W, "h": H, "fmt": "jbig2", "phash": exp, "ok": True}
    ]


def test_huffman_symbol_dict_uncompressed_bitmap():
    """BMSIZE=0 (§6.5.9): the height-class collective bitmap is stored
    uncompressed with byte-padded rows."""
    from crawler_spark.functions.jbig2 import decode_symbol_dict_huffman
    from crawler_spark.functions.jbig2_huffman import (
        OOB as HOOB,
        BitWriter,
        STANDARD_TABLES,
    )

    rng = np.random.default_rng(71)
    syms = [rng.random((5, 4)) < 0.5, rng.random((5, 9)) < 0.5]
    dh_t, dw_t, bm_t, ex_t = (STANDARD_TABLES[k] for k in (4, 2, 1, 1))
    bw = BitWriter()
    dh_t.encode(bw, 5)
    dw_t.encode(bw, 4)
    dw_t.encode(bw, 5)  # widths 4, 9
    dw_t.encode(bw, HOOB)
    bm_t.encode(bw, 0)  # uncompressed
    coll = np.hstack(syms)  # 5 x 13
    rows_bytes = np.packbits(coll, axis=1)  # byte-padded rows
    bw.put_bytes(rows_bytes.tobytes())
    ex_t.encode(bw, 0)
    ex_t.encode(bw, 2)
    out = decode_symbol_dict_huffman(bw.flush(), 2, 2, 0, 0, 0)
    assert len(out) == 2
    assert np.array_equal(out[0], syms[0]) and np.array_equal(out[1], syms[1])


def test_jbig2_globals_stream_resolves():
    """/JBIG2Globals (ISO 32000-1 §7.4.7): the shared symbol
    dictionary lives in a separate stream object; the page stream's
    text region refers back to it. Decode must match the single-stream
    encoding bit for bit, clear and encrypted."""
    from crawler_spark.functions.jbig2 import (
        encode_jbig2_text,
        encode_jbig2_text_globals,
    )

    rng = np.random.default_rng(47)
    syms = [rng.random((6, 5)) < 0.5 for _ in range(4)]
    placements = [(2, 3, 0), (10, 3, 1), (20, 3, 2), (2, 12, 3), (12, 12, 0)]
    W, H = 30, 20
    ref = decode_jbig2_embedded(encode_jbig2_text(syms, placements, (W, H)))
    g, p = encode_jbig2_text_globals(syms, placements, (W, H))
    assert np.array_equal(decode_jbig2_embedded(p, g), ref)
    # the page stream alone must fail (dict lives in globals), so a
    # dangling /JBIG2Globals can never silently decode
    with pytest.raises(ValueError):
        decode_jbig2_embedded(p)
    exp = phash64(np.repeat(ref[:, :, None], 3, axis=2))
    spec = {"data": p, "w": W, "h": H, "filter": "JBIG2Decode",
            "colorspace": "DeviceGray", "bpc": 1, "jbig2_globals": g}
    for encrypt in (None, "aes-128"):
        rows = extract_pdf_images(make_pdf_with_images([spec], encrypt=encrypt))
        assert rows == [
            {"idx": 0, "w": W, "h": H, "fmt": "jbig2", "phash": exp, "ok": True}
        ], encrypt


def test_text_region_transposed_roundtrip():
    """TRANSPOSED=1 (T.88 §6.4.5 step 3(c)): S runs down rows, strips
    are vertical, CURS advances by symbol height — the same page must
    come back either way."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text

    rng = np.random.default_rng(53)
    syms = [
        rng.random((int(rng.integers(3, 9)), int(rng.integers(2, 8)))) < 0.5
        for _ in range(5)
    ]
    placements = [(2, 3, 0), (2, 14, 1), (2, 25, 3), (14, 3, 2),
                  (14, 16, 4), (26, 3, 0), (26, 20, 2)]
    W, H = 40, 36
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        h, w = syms[si].shape
        want[y : y + h, x : x + w][syms[si]] = 0
    for transposed in (False, True):
        page = decode_jbig2_embedded(
            encode_jbig2_text(syms, placements, (W, H), transposed=transposed)
        )
        assert np.array_equal(page, want), transposed


def test_generic_refinement_roundtrip():
    """T.88 §6.3 generic refinement: both GR templates, reference
    offsets, TPGRON typical prediction, and a non-nominal AT pair for
    template 0 — encoder and decoder share only the context model, so
    round-trip equality pins both sides."""
    from crawler_spark.functions.jbig2 import (
        _refine_decode_with,
        _refine_encode_with,
    )
    from crawler_spark.functions.mq import MQDecoder, MQEncoder

    rng = np.random.default_rng(73)
    cases = []
    for template in (0, 1):
        for tpgron in (False, True):
            for dx, dy in ((0, 0), (2, -1), (-3, 4)):
                cases.append((template, tpgron, dx, dy, None))
    cases.append((0, False, 0, 0, [(1, -2), (-2, 1)]))  # custom GRAT
    for template, tpgron, dx, dy, at in cases:
        h = int(rng.integers(3, 30))
        w = int(rng.integers(3, 60))
        ref = _scan_like(rng, h, w)
        # the refinement target: the reference with sparse flips, the
        # correlated shape the GR contexts are designed for
        img = ref.copy()
        flips = rng.random((h, w)) < 0.06
        img ^= flips
        enc = MQEncoder()
        _refine_encode_with(
            enc, img.astype(np.uint8), ref.astype(np.uint8), dx, dy,
            template, at, tpgron,
        )
        dec = MQDecoder(enc.flush())
        back = _refine_decode_with(dec, w, h, ref, dx, dy, template, at, tpgron)
        assert np.array_equal(back, img), (template, tpgron, dx, dy)
    # a refinement of a well-matched reference must be tiny compared
    # to coding the bitmap generically — the reason §6.3 exists
    from crawler_spark.functions.jbig2 import encode_generic_arith

    ref = _scan_like(rng, 64, 96)
    img = ref.copy()
    img[10, 11] ^= True
    enc = MQEncoder()
    _refine_encode_with(enc, img.astype(np.uint8), ref.astype(np.uint8),
                        0, 0, 0, None, True)
    assert len(enc.flush()) < len(encode_generic_arith(img)) / 3


def test_refagg_symbol_dict_page():
    """SDREFAGG=1 (§6.5.8.2): new dictionary symbols decode as
    refinements of a referenced dictionary's glyphs (REFAGGNINST=1),
    or — REFAGGNINST>1 — as a TEXT REGION of several pool instances
    coded on the dictionary's own coder. The text region places only
    the refined exports."""
    from crawler_spark.functions.jbig2 import (
        compose_placements,
        encode_jbig2_text_refagg,
    )

    rng = np.random.default_rng(79)
    base = [rng.random((6, 5)) < 0.5, rng.random((8, 7)) < 0.5]
    refined_specs = []
    for rid, (dh, dw) in ((0, (0, 0)), (1, (1, -1)), (0, (-1, 2))):
        h = base[rid].shape[0] + dh
        w = base[rid].shape[1] + dw
        bm = np.zeros((h, w), bool)
        ch, cw = min(h, base[rid].shape[0]), min(w, base[rid].shape[1])
        bm[:ch, :cw] = base[rid][:ch, :cw]
        bm ^= rng.random((h, w)) < 0.1
        bm[0, 0] = True  # keep width/height exact under trailing zeros
        bm[-1, -1] = True
        refined_specs.append((bm, rid, 0, 0))
    # REFAGGNINST=2 aggregate: two base glyphs side by side
    refined_specs.append(("agg", 8, 13, [(0, 0, 0), (6, 0, 1)]))
    placements = [(2, 2, 0), (12, 2, 1), (24, 2, 2), (2, 14, 2),
                  (14, 14, 3)]
    W, H = 36, 26
    page = decode_jbig2_embedded(
        encode_jbig2_text_refagg(base, refined_specs, placements, (W, H))
    )
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        s = refined_specs[si]
        if isinstance(s[0], str):
            bm = compose_placements(
                [b.astype(bool) for b in base], s[3], s[1], s[2]
            )
        else:
            bm = s[0]
        h, w = bm.shape
        want[y : y + h, x : x + w][bm] = 0
    assert np.array_equal(page, want)


def test_refined_text_region_page():
    """SBREFINE=1 (§6.4.11): instances may refine their dictionary
    glyph in place — RI=0 instances place the glyph unchanged, RI=1
    instances decode per-instance RDW/RDH/RDX/RDY plus a refinement
    bitmap, including size-changing deltas."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text

    rng = np.random.default_rng(83)
    syms = [rng.random((6, 5)) < 0.5, rng.random((7, 6)) < 0.5]

    def variant(si, rdw, rdh):
        h = syms[si].shape[0] + rdh
        w = syms[si].shape[1] + rdw
        bm = np.zeros((h, w), bool)
        ch, cw = min(h, syms[si].shape[0]), min(w, syms[si].shape[1])
        bm[:ch, :cw] = syms[si][:ch, :cw]
        bm ^= rng.random((h, w)) < 0.12
        bm[0, 0] = bm[-1, -1] = True
        return (bm, rdw, rdh, 0, 0)

    placements = [(2, 2, 0), (12, 2, 1), (24, 2, 0), (2, 14, 1), (14, 14, 0)]
    refinements = [None, variant(1, 1, -1), variant(0, 0, 0), None,
                   variant(0, -1, 2)]
    W, H = 36, 28
    page = decode_jbig2_embedded(
        encode_jbig2_text(syms, placements, (W, H), refinements=refinements)
    )
    want = np.full((H, W), 255, np.uint8)
    for (x, y, si), spec in zip(placements, refinements):
        bm = syms[si] if spec is None else spec[0]
        h, w = bm.shape
        want[y : y + h, x : x + w][bm] = 0
    assert np.array_equal(page, want)


def test_refinement_region_replaces_page():
    """Immediate refinement regions (type 41/42) recode the page
    content under their footprint — the lossy-then-correction two-pass
    shape. REPLACE must land the corrected bitmap exactly; referring
    to intermediate regions stays out of subset and raises."""
    from crawler_spark.functions.jbig2 import encode_jbig2_refine_page

    rng = np.random.default_rng(89)
    for template in (0, 1):
        for tpgron in (False, True):
            base = _scan_like(rng, 22, 34)
            refined = base ^ (rng.random(base.shape) < 0.05)
            page = decode_jbig2_embedded(
                encode_jbig2_refine_page(base, refined, template, tpgron)
            )
            assert np.array_equal(page == 0, refined), (template, tpgron)
    # retyping the segment as an intermediate refinement region (type
    # 40) retains the result instead of compositing: the page shows
    # only the base generic region
    import struct

    data = bytearray(encode_jbig2_refine_page(base, refined))
    # flip the refinement segment's type byte by locating its header
    # (segment number 2, type 42)
    hdr = struct.pack(">IB", 2, 42)
    pos = bytes(data).find(hdr)
    assert pos > 0
    data[pos + 4] = 40
    page = decode_jbig2_embedded(bytes(data))
    assert np.array_equal(page == 0, base)


def test_refined_jbig2_xobject_extraction():
    """The refinement paths ride the /JBIG2Decode XObject pipeline
    end to end with a pinned phash."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text_refagg

    rng = np.random.default_rng(97)
    base = [rng.random((8, 6)) < 0.5]
    bm = base[0] ^ (rng.random(base[0].shape) < 0.15)
    bm[0, 0] = bm[-1, -1] = True
    placements = [(3, 3, 0), (14, 3, 0), (3, 14, 0)]
    W, H = 26, 26
    data = encode_jbig2_text_refagg(base, [(bm, 0, 0, 0)], placements, (W, H))
    want = np.full((H, W), 255, np.uint8)
    for x, y, _ in placements:
        h, w = bm.shape
        want[y : y + h, x : x + w][bm] = 0
    exp = phash64(np.repeat(want[:, :, None], 3, axis=2))
    rows = extract_pdf_images(
        make_pdf_with_images(
            [{"data": data, "w": W, "h": H, "filter": "JBIG2Decode",
              "colorspace": "DeviceGray", "bpc": 1}]
        )
    )
    assert rows == [
        {"idx": 0, "w": W, "h": H, "fmt": "jbig2", "phash": exp, "ok": True}
    ]


def test_halftone_region_page():
    """T.88 §6.6/§6.7: pattern dictionary (collective bitmap, AT1 =
    (-HDPW, 0)) + halftone region (Gray-coded bitplanes, MSB first,
    one shared MQ stream) reproduce the grid of pattern cells exactly
    — templates 0 and 2, including a pattern count that is not a
    power of two."""
    from crawler_spark.functions.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(101)
    for template, mmr in ((0, False), (2, False), (0, True)):
        for n_pats, P in ((4, 4), (6, 3)):
            # graded density patterns — the real halftone shape
            pats = []
            order = rng.permutation(P * P)
            for k in range(n_pats):
                cell = np.zeros(P * P, bool)
                cell[order[: (k * P * P) // max(n_pats - 1, 1)]] = True
                pats.append(cell.reshape(P, P))
            gray = rng.integers(0, n_pats, size=(5, 7))
            page = decode_jbig2_embedded(
                encode_jbig2_halftone(gray, pats, template, mmr=mmr)
            )
            H, W = (gray.shape[0] - 1) * P + P, gray.shape[1] * P
            want = np.full((H, W), 255, np.uint8)
            for mg in range(gray.shape[0]):
                for ng in range(gray.shape[1]):
                    cell = pats[int(gray[mg, ng])]
                    want[mg * P : mg * P + P, ng * P : ng * P + P][cell] = 0
            assert np.array_equal(page, want), (template, n_pats)


def test_halftone_skewed_grid_with_skip():
    """HENABLESKIP (§6.6.5.1): a skewed grid pushes some cells
    outside the region; their gray values are never coded (USESKIP)
    and the stream shrinks accordingly, while in-region cells land on
    the rotated lattice exactly."""
    from crawler_spark.functions.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(113)
    P = 4
    pats = []
    for k in range(4):
        cell = np.zeros((P, P), bool)
        cell.flat[: k * 5] = True
        pats.append(cell)
    gray = rng.integers(0, 4, size=(6, 6))
    # rotated grid: strong skew pushes corner cells fully outside
    grid = (-(6 << 8), 0, P << 8, 512)
    W, H = 20, 26
    data = encode_jbig2_halftone(
        gray, pats, grid=grid, region_wh=(W, H), enableskip=True
    )
    page = decode_jbig2_embedded(data)
    # expected: replicate the placement math, zeroing skipped cells
    hgx, hgy, hrx, hry = grid
    want = np.full((H, W), 255, np.uint8)
    for mg in range(6):
        for ng in range(6):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            skipped = x + P <= 0 or x >= W or y + P <= 0 or y >= H
            cell = pats[0 if skipped else int(gray[mg, ng])]
            sy, sx = max(0, -y), max(0, -x)
            ey, ex = min(P, H - y), min(P, W - x)
            if sy < ey and sx < ex:
                sub = want[y + sy : y + ey, x + sx : x + ex]
                sub[cell[sy:ey, sx:ex]] = 0
    assert np.array_equal(page, want)
    # skip really skips decisions: the same layout without the flag
    # codes every cell and must be strictly longer
    full = encode_jbig2_halftone(
        gray, pats, grid=grid, region_wh=(W, H), enableskip=False
    )
    assert len(data) < len(full)


def test_halftone_out_of_subset_raises():
    """Skip-with-MMR (spec-invalid) must surface as ValueError, never
    garbage; an intermediate halftone region is retained, not
    composited."""
    import struct

    from crawler_spark.functions.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(103)
    pats = [np.zeros((3, 3), bool), np.ones((3, 3), bool)]
    gray = rng.integers(0, 2, size=(3, 3))
    data = encode_jbig2_halftone(gray, pats, mmr=True)
    # the halftone segment's flags byte: header 11 + region info 17
    # header = number(4) + type(1) + refcount(1) + ref(1) + page(1) +
    # length(4) = 12 bytes; halftone flags byte = body[17]
    ht_hdr = bytes(data).find(struct.pack(">IB", 2, 23))
    assert ht_hdr > 0
    flags_off = ht_hdr + 12 + 17
    mut = bytearray(data)
    mut[flags_off] |= 0x08  # HENABLESKIP on an MMR region: invalid
    with pytest.raises(ValueError, match="HENABLESKIP"):
        decode_jbig2_embedded(bytes(mut))
    mut = bytearray(data)
    mut[ht_hdr + 4] = 20  # intermediate halftone region: retained,
    page = decode_jbig2_embedded(bytes(mut))  # never composited
    assert not (page == 0).any()


def test_halftone_xobject_extraction():
    from crawler_spark.functions.jbig2 import encode_jbig2_halftone

    rng = np.random.default_rng(107)
    P = 4
    pats = []
    for k in range(4):
        cell = np.zeros((P, P), bool)
        cell.flat[: k * 5] = True
        pats.append(cell)
    gray = rng.integers(0, 4, size=(6, 8))
    data = encode_jbig2_halftone(gray, pats)
    H, W = 6 * P, 8 * P
    want = np.full((H, W), 255, np.uint8)
    for mg in range(6):
        for ng in range(8):
            want[mg * P : (mg + 1) * P, ng * P : (ng + 1) * P][
                pats[int(gray[mg, ng])]
            ] = 0
    exp = phash64(np.repeat(want[:, :, None], 3, axis=2))
    rows = extract_pdf_images(
        make_pdf_with_images(
            [{"data": data, "w": W, "h": H, "filter": "JBIG2Decode",
              "colorspace": "DeviceGray", "bpc": 1}]
        )
    )
    assert rows == [
        {"idx": 0, "w": W, "h": H, "fmt": "jbig2", "phash": exp, "ok": True}
    ]


def test_striped_unknown_height_page():
    """§7.4.8.2: height 0xFFFFFFFF + striping flag — the page grows as
    stripes arrive; END_OF_STRIPE fixes each stripe's final row (the
    last stripe may be shorter than the maximum). Without the striping
    flag an unknown height must raise."""
    import struct

    from crawler_spark.functions.jbig2 import encode_jbig2_striped

    rng = np.random.default_rng(109)
    stripes = [_scan_like(rng, 16, 40), _scan_like(rng, 16, 40),
               _scan_like(rng, 9, 40)]
    data = encode_jbig2_striped(stripes, max_stripe=16)
    page = decode_jbig2_embedded(data)
    want = np.vstack(stripes)
    assert page.shape == want.shape
    assert np.array_equal(page == 0, want)
    # striping flag cleared → unknown height must raise, not loop
    mut = bytearray(data)
    # page-info body starts after the 11-byte header; striping u16 at 17
    mut[11 + 17] &= 0x7F
    with pytest.raises(ValueError, match="striping"):
        decode_jbig2_embedded(bytes(mut))
    # a region exceeding a FIXED page still raises (growth is gated)
    fixed = bytearray(data)
    struct.pack_into(">I", fixed, 11 + 4, 20)  # height 20 < 41
    with pytest.raises(ValueError, match="exceeds page"):
        decode_jbig2_embedded(bytes(fixed))


def test_text_region_refcorners_both_orientations():
    """All four REFCORNERs keep screen-space meaning in both
    orientations: encoding the corner-adjusted coordinate and decoding
    with that corner must reproduce the TOPLEFT page."""
    from crawler_spark.functions.jbig2 import (
        decode_text_region,
        encode_symbol_dict,
        encode_text_region,
    )

    rng = np.random.default_rng(59)
    syms = [rng.random((5, 4)) < 0.5, rng.random((7, 6)) < 0.5]
    _sd, sym_order = encode_symbol_dict(syms)
    base = [(3, 2, 0), (15, 2, 1), (3, 14, 1), (18, 13, 0)]
    W, H = 30, 24
    want = np.zeros((H, W), bool)
    for x, y, si in base:
        h, w = syms[si].shape
        want[y : y + h, x : x + w] |= syms[si]
    for corner in range(4):  # 0=BL 1=TL 2=BR 3=TR
        for transposed in (False, True):
            adj = []
            for x, y, si in base:
                h, w = syms[si].shape
                cx = x if corner in (0, 1) else x + w - 1
                cy = y if corner in (1, 3) else y + h - 1
                adj.append((cx, cy, si))
            data = encode_text_region(
                adj, syms, sym_order, transposed=transposed
            )
            page = decode_text_region(
                data, W, H, len(adj), 0, corner, 0, syms, transposed
            )
            assert np.array_equal(page, want), (corner, transposed)


def test_unknown_length_segments():
    """§7.2.7: an immediate generic region may declare length
    0xFFFFFFFF; the payload closes with FF AC (MQ) / 00 00 (MMR) plus
    a four-byte row count. Round-trips for both coders, and malformed
    shapes raise."""
    import struct

    from crawler_spark.functions.jbig2 import encode_jbig2_arith

    rng = np.random.default_rng(67)
    img = _scan_like(rng, 33, 57)
    for data in (
        encode_jbig2_mmr(img, unknown_length=True),
        encode_jbig2_arith(img, unknown_length=True),
        encode_jbig2_arith(img, template=2, tpgdon=True,
                           unknown_length=True),
    ):
        assert struct.pack(">I", 0xFFFFFFFF) in data
        back = decode_jbig2_embedded(data)
        assert np.array_equal(back == 0, img)
    # unknown length on a non-generic segment type raises
    seg = struct.pack(">IB", 0, 0) + b"\x00\x01" + struct.pack(
        ">I", 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="non-generic"):
        decode_jbig2_embedded(seg)
    # a stream whose terminator never appears raises, not loops
    data = bytearray(encode_jbig2_arith(img, unknown_length=True))
    trunc = bytes(data[:-7])  # cut into the terminator+rowcount tail
    with pytest.raises(ValueError, match="terminator"):
        decode_jbig2_embedded(trunc)


def test_intermediate_regions_feed_refinement():
    """§8.2 intermediate regions: a type-36 generic region is retained
    (never composited); an immediate refinement region names it as the
    reference and lands the refined bitmap. A chained type-40
    intermediate refinement works too, and dangling/misshapen
    references raise."""
    import struct

    from crawler_spark.functions.jbig2 import (
        encode_jbig2_intermediate_refine,
    )

    rng = np.random.default_rng(71)
    base = _scan_like(rng, 29, 46)
    refined = base.copy()
    refined[4:9, 6:30] ^= True  # a correction pass over the base
    for chain in (False, True):
        data = encode_jbig2_intermediate_refine(base, refined, chain=chain)
        back = decode_jbig2_embedded(data)
        # REPLACE composition: the page is exactly the refined bitmap —
        # the intermediate base never touched it
        assert np.array_equal(back == 0, refined), chain
    # a refinement naming a segment that never existed raises
    data = bytearray(encode_jbig2_intermediate_refine(base, refined))
    # last segment's single ref byte: rewrite 1 -> 9
    hdr_at = data.rfind(struct.pack(">IB", 2, 42))
    assert data[hdr_at + 6] == 1
    data[hdr_at + 6] = 9
    with pytest.raises(ValueError, match="unknown segment"):
        decode_jbig2_embedded(bytes(data))


def test_huffman_refined_text_region_page():
    """SBHUFF=1 + SBREFINE=1 (§6.4.11): the RI bit is a raw bit, the
    RDW/RDH/RDX/RDY deltas ride B.14 or B.15, BMSIZE rides B.1, and
    each refinement is a byte-aligned MQ blob refining the glyph —
    including size-changing deltas."""
    from crawler_spark.functions.jbig2 import encode_jbig2_text_huffman

    rng = np.random.default_rng(107)
    syms = [rng.random((6, 5)) < 0.5, rng.random((7, 6)) < 0.5]

    def variant(si, rdw, rdh):
        h = syms[si].shape[0] + rdh
        w = syms[si].shape[1] + rdw
        bm = np.zeros((h, w), bool)
        ch, cw = min(h, syms[si].shape[0]), min(w, syms[si].shape[1])
        bm[:ch, :cw] = syms[si][:ch, :cw]
        bm ^= rng.random((h, w)) < 0.12
        bm[0, 0] = bm[-1, -1] = True
        return (bm, rdw, rdh, 0, 0)

    placements = [(2, 2, 0), (12, 2, 1), (24, 2, 0), (2, 14, 1), (14, 14, 0)]
    W, H = 36, 28
    for rd_sel, custom_rsize, refinements in (
        (0, False, [None, variant(1, 1, -1), variant(0, 0, 0), None,
                    variant(0, -1, 2)]),
        (1, False, [None, variant(1, 4, -3), None, variant(1, 6, 5), None]),
        # BMSIZE through a CUSTOM table segment (hflags bit 14)
        (0, True, [variant(0, 1, 1), None, None, variant(1, -1, 0), None]),
    ):
        page = decode_jbig2_embedded(
            encode_jbig2_text_huffman(
                syms, placements, (W, H), refinements=refinements,
                rd_sel=rd_sel, custom_rsize=custom_rsize,
            )
        )
        want = np.full((H, W), 255, np.uint8)
        for (x, y, si), spec in zip(placements, refinements):
            bm = syms[si] if spec is None else spec[0]
            h, w = bm.shape
            want[y : y + h, x : x + w][bm] = 0
        assert np.array_equal(page, want), rd_sel


def test_huffman_refagg_symbol_dict_page():
    """SDHUFF=1 + REFAGG=1 (§6.5.8.2.2): every new dictionary symbol
    is an individually-framed Huffman refinement — raw-bit symbol ID,
    RDX/RDY via B.15, BMSIZE via B.1, byte-aligned MQ blob — of a
    glyph exported by a referred-to dictionary."""
    from crawler_spark.functions.jbig2 import (
        encode_jbig2_huffman_refagg_page,
    )

    rng = np.random.default_rng(109)
    base = [rng.random((6, 5)) < 0.5, rng.random((8, 7)) < 0.5]

    def derive(ref_id, rdh, rdw, rdx, rdy):
        h = base[ref_id].shape[0] + rdh
        w = base[ref_id].shape[1] + rdw
        bm = np.zeros((h, w), bool)
        ch, cw = min(h, base[ref_id].shape[0]), min(w, base[ref_id].shape[1])
        bm[:ch, :cw] = base[ref_id][:ch, :cw]
        bm ^= rng.random((h, w)) < 0.1
        bm[0, 0] = bm[-1, -1] = True
        return (bm, ref_id, rdx, rdy)

    # entry 3 is an AGGREGATE (REFAGGNINST > 1, §6.5.8.2.1): an inline
    # SBHUFF text region of two base glyphs composes the new symbol
    agg_placs = [(0, 1, 0), (6, 0, 1)]
    derived = [
        derive(0, 0, 0, 0, 0),
        derive(1, -2, 1, 1, 0),
        derive(0, 3, 2, 0, -1),
        ("agg", 9, 14, agg_placs),
    ]
    placements = [(2, 2, 0), (12, 2, 1), (2, 16, 2), (22, 16, 0),
                  (12, 20, 3)]
    W, H = 38, 32
    page = decode_jbig2_embedded(
        encode_jbig2_huffman_refagg_page(base, derived, placements, (W, H))
    )
    agg_bm = np.zeros((9, 14), bool)
    for x, y, pid in agg_placs:
        bh, bw = base[pid].shape
        agg_bm[y : y + bh, x : x + bw] |= base[pid]
    want = np.full((H, W), 255, np.uint8)
    for x, y, si in placements:
        bm = derived[si][0] if si < 3 else agg_bm
        h, w = bm.shape
        want[y : y + h, x : x + w][bm] = 0
    assert np.array_equal(page, want)
