"""JBIG2 (ITU-T T.88) — the generic-region subset (MMR + MQ-arithmetic).

Scanned-document PDFs carry JBIG2 in the EMBEDDED format (segment
stream, no file header; ISO 32000-1 §7.4.7). This module decodes the
subset where the page is built from immediate generic-region segments
coded with MMR=1 — JBIG2's MMR coding IS ITU-T T.6 (T.88 §6.2.6), so
the region payload decodes through the repo's own G4 codec
(``functions/ccitt.py``). Segment layout per T.88 §7.2: segment
number u32, flags (type in bits 0-5, page-association size in bit 6),
referred-to segment count + retain bits, referred segment numbers,
page association, data length. Region info per §7.4.1 (w, h, x, y
u32s + combination operator byte).

Generic regions decode BOTH ways (T.88 §6.2): MMR=1 payloads through
the G4 codec, and MMR=0 arithmetic payloads through the repo's MQ
coder (``functions/mq.py``) with the GB template 0-3 context models
(pixel template sorted by (y, x), MSB-first — pdf.js's canonical
ordering) honoring the segment's adaptive (AT) pixel positions and
TPGDON typical prediction.

Arithmetic regions support all four GB templates and TPGDON typical
prediction (per-row SLTP bits against the template's pseudo-context).
Symbol dictionaries and text regions decode too (arithmetic,
no-refinement subset): glyph bitmaps decode once into a dictionary and
the text region places dictionary ids at (S, T) coordinates — the
shape JBIG2 encoders emit for TEXT pages, where the format wins big.

/JBIG2Globals streams decode too: the PDF image extractor resolves
the referenced stream and its segments (shared symbol dictionaries)
run first into the same segment state the page stream then reads.

Text regions place in both orientations (TRANSPOSED=0/1, all four
REFCORNERs). Huffman-coded variants decode too (SDHUFF=1 symbol
dictionaries with MMR or uncompressed height-class collective
bitmaps, SBHUFF=1 text regions over the Annex-B standard tables and
the §7.4.3.1.7 runcode symbol-id scheme — see
``functions/jbig2_huffman.py`` for the table provenance gates).

Generic refinement (T.88 §6.3) decodes in all three places it occurs:
standalone immediate refinement region segments (types 41/42)
re-coding the page content under their footprint through the external
combination operator; SDREFAGG=1 symbol dictionaries whose new glyphs
refine pool symbols (the REFAGGNINST=1 single-instance form); and
SBREFINE=1 text regions with per-instance RI/RDW/RDH/RDX/RDY refined
placements — both GR templates, GRAT pixels, and TPGRON typical
prediction.

Halftone regions (T.88 §6.6) and pattern dictionaries (§6.7) decode
too: the pattern dictionary's collective bitmap (arithmetic with
AT1 = (-HDPW, 0), or MMR), Annex-C.5 Gray-coded grayscale bitplanes
— arithmetic sharing one MQ stream, or MMR sharing one
EOFB-delimited T.6 stream — skewed-grid pattern placement honoring
HCOMBOP and the external combination operator, and HENABLESKIP
(§6.6.5.1: cells whose pattern falls outside the region decode as 0
without consuming decisions — USESKIP in the generic procedure).

Striped pages decode too (§7.4.8.2): an unknown-height page (height
0xFFFFFFFF with the striping flag) grows as stripes arrive, each
END_OF_STRIPE segment fixing the stripe's final row.

REFAGGNINST>1 aggregates decode too (§6.5.8.2.1): the new symbol is
a TEXT REGION of refined pool instances run on the dictionary's own
coder — the fresh IAx/IAID procedure instances share adaptation
state through the coder's context dictionaries because their
context-id bases are fixed.

Custom Huffman tables decode too (§7.4.13 table segments → Annex-B
canonical codes; selection 3 — or 1 for BMSIZE — consumes the
referred-to table segments in order of need, per §7.4.3.1.6).

Unknown-length segments decode too (§7.2.7: only immediate generic
regions may declare length 0xFFFFFFFF; the payload closes with FF AC
under MQ coding — a sequence the stuffed bitstream cannot contain
internally — or 00 00 under MMR, then a four-byte row count; the
terminator is located as terminator+height, the same disambiguation
pdfjs applies, so the region height must be known).

Intermediate region segments decode too (§8.2: types 4/20/36/40 are
retained keyed by segment number, never composited; a refinement
region naming one uses its bitmap as the reference — chains of
intermediates work — and an immediate refinement then lands on the
page through the external combination operator).

Refinement under Huffman coding decodes too: SBHUFF=1 text regions
read a raw RI bit per instance, RDW/RDH/RDX/RDY through B.14/B.15,
BMSIZE through B.1 (or a custom RSIZE table, hflags bit 14), then a
byte-aligned MQ-coded refinement blob (§6.4.11); SDHUFF=1 + REFAGG=1
symbol dictionaries decode every new symbol as an individually-framed
refinement (§6.5.8.2.2, REFAGGNINST=1: raw-bit symbol ID, RDX/RDY via
B.15, BMSIZE via B.1) or, for REFAGGNINST>1, as an inline SBHUFF
aggregate text region (§6.5.8.2.1/.3: raw SBSYMCODELEN-bit ids over
the pool, Table-16 fixed tables) read from the dictionary's own
bitstream.

Out of scope — raises ValueError (the PDF image extractor quarantines
the row as ok=False, never garbage pixels): the B.7/B.10 standard
selections (their transcriptions failed the completeness gate — a
complete-but-wrong table would decode garbage silently, so their
selections stay errors). That is the whole documented residue; the
generic + text + refinement + halftone + striped paths cover scanned
pages end to end.

JBIG2 bit sense: 1 = black (T.88 §4), i.e. the same sense as the G4
decoder's output convention here (0=black pixels after mapping).
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_spark.functions.ccitt import decode_g4, encode_g4
from crawler_spark.functions.mq import MQDecoder, MQEncoder

# GB templates 0-3 (T.88 §6.2.5.3): fixed pixels as (dy, dx) + AT
# slots; context bits assemble in (y, x) sorted order, MSB first.
# Template 0 carries 4 AT pixels, templates 1-3 carry 1.
_GB_FIXED = {
    0: [
        (-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -4), (0, -3), (0, -2), (0, -1),
    ],
    1: [
        (-2, -1), (-2, 0), (-2, 1), (-2, 2),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -3), (0, -2), (0, -1),
    ],
    2: [
        (-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -2), (0, -1),
    ],
    3: [
        (-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -4), (0, -3), (0, -2), (0, -1),
    ],
}
_GB_AT_NOMINAL = {  # (x, y) pairs
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
_GB_AT_COUNT = {0: 4, 1: 1, 2: 1, 3: 1}
# TPGDON pseudo-contexts per template (T.88 §6.2.5.7)
_GB_TPGD_CX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

#: containment bound for STREAM-DECLARED bitmap dimensions: a single
#: corrupted header byte must raise ValueError, never drive a giant
#: allocation (the quarantine contract — fuzz-gated in
#: tests/test_codec_fuzz.py). 2^27 px ≈ an A2 sheet at 600 dpi —
#: far above any real embedded bitonal region, worst-case ~128 MB.
_MAX_PIXELS = 1 << 27


def _guard_dims(h: int, w: int, what: str) -> None:
    if h < 0 or w < 0 or h * w > _MAX_PIXELS:
        raise ValueError(f"JBIG2 {what}: implausible dimensions {h}x{w}")


def _gb_offsets(
    template: int, at_pairs: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    pts = list(_GB_FIXED[template]) + [(y, x) for x, y in at_pairs]
    return sorted(pts)


def decode_generic_arith(
    data: bytes,
    w: int,
    h: int,
    at_pairs: list[tuple[int, int]],
    template: int = 0,
    tpgdon: bool = False,
) -> np.ndarray:
    """MQ-coded generic region (GB templates 0-3, optional TPGDON
    typical prediction) → bool bitmap (True = black). Per-pixel Python
    loop — fixture/document scale; the Spark boundary batches whole
    PDFs per task."""
    return _generic_decode_with(MQDecoder(data), w, h, at_pairs, template, tpgdon)


def _generic_decode_with(
    mq: MQDecoder,
    w: int,
    h: int,
    at_pairs: list[tuple[int, int]],
    template: int = 0,
    tpgdon: bool = False,
    cx_base: int = 0,
    skip: np.ndarray | None = None,
) -> np.ndarray:
    """Generic-region decode continuing an EXISTING MQ coder — symbol
    dictionaries decode each glyph bitmap inline in one shared
    arithmetic stream (T.88 §6.5.5). ``cx_base`` offsets the pixel
    context space when the caller multiplexes integer codecs on the
    same coder. ``skip`` (USESKIP, §6.2.5.7) marks pixels that decode
    to 0 WITHOUT consuming a decision — halftone grayscale planes
    skip grid cells that fall outside the region."""
    offs = _gb_offsets(template, at_pairs)
    _guard_dims(h, w, "generic region")
    bm = np.zeros((h, w), dtype=np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(cx_base + _GB_TPGD_CX[template])
            if ltp:  # typical row: copy the previous row
                if y:
                    bm[y] = bm[y - 1]
                continue
        for x in range(w):
            if skip is not None and skip[y, x]:
                continue  # stays 0, no decision coded
            cx = 0
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                bit = (
                    int(bm[yy, xx])
                    if 0 <= yy < h and 0 <= xx < w
                    else 0
                )
                cx = (cx << 1) | bit
            bm[y, x] = mq.decode(cx_base + cx)
    return bm.astype(bool)


def encode_generic_arith(
    img: np.ndarray,
    at_pairs: list[tuple[int, int]] | None = None,
    template: int = 0,
    tpgdon: bool = False,
) -> bytes:
    """Encoder twin of :func:`decode_generic_arith` (fixtures)."""
    mq = MQEncoder()
    _generic_encode_with(mq, img, at_pairs, template, tpgdon)
    return mq.flush()


def _generic_encode_with(
    mq: MQEncoder,
    img: np.ndarray,
    at_pairs: list[tuple[int, int]] | None = None,
    template: int = 0,
    tpgdon: bool = False,
    cx_base: int = 0,
    skip: np.ndarray | None = None,
) -> None:
    at_pairs = at_pairs or _GB_AT_NOMINAL[template]
    offs = _gb_offsets(template, at_pairs)
    img = np.asarray(img).astype(np.uint8)
    h, w = img.shape
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = 1 if y and np.array_equal(img[y], img[y - 1]) else 0
            mq.encode(ltp ^ typical, cx_base + _GB_TPGD_CX[template])
            ltp = typical
            if typical:
                continue
        for x in range(w):
            if skip is not None and skip[y, x]:
                continue
            cx = 0
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                bit = int(img[yy, xx]) if 0 <= yy < h and 0 <= xx < w else 0
                cx = (cx << 1) | bit
            mq.encode(int(img[y, x]), cx_base + cx)

# ---------------------------------------------------------------------------
# Generic refinement region decoding (T.88 §6.3): a bitmap is coded
# relative to a REFERENCE bitmap shifted by (GRREFERENCEDX, DY). GR
# template 0 reads 3 coding + 8 reference fixed pixels + one AT pixel
# per plane (13 contexts bits); template 1 reads 4 + 6 fixed (10
# bits). Context bits assemble coding-plane-first, each plane sorted
# by (y, x) with its AT slot appended before the sort — the same
# canonical ordering the generic templates use here. TPGRON typical
# prediction (§6.3.5.6): rows flagged typical take each pixel from a
# UNIFORM 3x3 reference neighborhood without decoding.
# ---------------------------------------------------------------------------

_GR_CODING = {  # fixed (dy, dx) in the bitmap being decoded
    0: [(-1, 0), (-1, 1), (0, -1)],
    1: [(-1, -1), (-1, 0), (-1, 1), (0, -1)],
}
_GR_REF = {  # fixed (dy, dx) in the reference bitmap
    0: [(-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)],
    1: [(-1, 0), (0, -1), (0, 0), (0, 1), (1, 0), (1, 1)],
}
_GR_AT_NOMINAL = [(-1, -1), (-1, -1)]  # (x, y): A1 coding, A2 reference
# TPGRON pseudo-contexts per template (§6.3.5.6)
_GR_TPGR_CX = {0: 0x0020, 1: 0x0008}
_GR_BASE = 1 << 18  # context-id offset for GR states on a shared coder


def _gr_offsets(template, at_pairs):
    coding = list(_GR_CODING[template])
    ref = list(_GR_REF[template])
    if template == 0:
        ax1, ay1 = at_pairs[0]
        ax2, ay2 = at_pairs[1]
        coding.append((ay1, ax1))
        ref.append((ay2, ax2))
    return sorted(coding), sorted(ref)


def _refine_decode_with(
    mq: MQDecoder,
    w: int,
    h: int,
    ref: np.ndarray,
    dx: int,
    dy: int,
    template: int = 0,
    at_pairs: list[tuple[int, int]] | None = None,
    tpgron: bool = False,
) -> np.ndarray:
    coding, refofs = _gr_offsets(template, at_pairs or _GR_AT_NOMINAL)
    rh, rw = ref.shape
    _guard_dims(h, w, "refinement region")
    bm = np.zeros((h, w), dtype=np.uint8)

    def refpix(yy: int, xx: int) -> int:
        return int(ref[yy, xx]) if 0 <= yy < rh and 0 <= xx < rw else 0

    ltp = 0
    for y in range(h):
        if tpgron:
            ltp ^= mq.decode(_GR_BASE + _GR_TPGR_CX[template])
        for x in range(w):
            if ltp:
                window = [
                    refpix(y - dy + oy, x - dx + ox)
                    for oy in (-1, 0, 1)
                    for ox in (-1, 0, 1)
                ]
                if all(window):
                    bm[y, x] = 1
                    continue
                if not any(window):
                    continue
            cx = 0
            for oy, ox in coding:
                yy, xx = y + oy, x + ox
                bit = int(bm[yy, xx]) if 0 <= yy < h and 0 <= xx < w else 0
                cx = (cx << 1) | bit
            for oy, ox in refofs:
                cx = (cx << 1) | refpix(y - dy + oy, x - dx + ox)
            bm[y, x] = mq.decode(_GR_BASE + cx)
    return bm.astype(bool)


def _refine_encode_with(
    mq: MQEncoder,
    img: np.ndarray,
    ref: np.ndarray,
    dx: int,
    dy: int,
    template: int = 0,
    at_pairs: list[tuple[int, int]] | None = None,
    tpgron: bool = False,
) -> None:
    coding, refofs = _gr_offsets(template, at_pairs or _GR_AT_NOMINAL)
    img = np.asarray(img).astype(np.uint8)
    ref = np.asarray(ref).astype(np.uint8)
    h, w = img.shape
    rh, rw = ref.shape

    def refpix(yy: int, xx: int) -> int:
        return int(ref[yy, xx]) if 0 <= yy < rh and 0 <= xx < rw else 0

    def row_typical(y: int) -> bool:
        # a row may be flagged typical only if every uniform-window
        # pixel already equals its reference value
        for x in range(w):
            window = [
                refpix(y - dy + oy, x - dx + ox)
                for oy in (-1, 0, 1)
                for ox in (-1, 0, 1)
            ]
            if all(window) and not img[y, x]:
                return False
            if not any(window) and img[y, x]:
                return False
        return True

    ltp = 0
    for y in range(h):
        if tpgron:
            typ = 1 if row_typical(y) else 0
            mq.encode(ltp ^ typ, _GR_BASE + _GR_TPGR_CX[template])
            ltp = typ
        for x in range(w):
            if ltp:
                window = [
                    refpix(y - dy + oy, x - dx + ox)
                    for oy in (-1, 0, 1)
                    for ox in (-1, 0, 1)
                ]
                if all(window) or not any(window):
                    continue
            cx = 0
            for oy, ox in coding:
                yy, xx = y + oy, x + ox
                bit = int(img[yy, xx]) if 0 <= yy < h and 0 <= xx < w else 0
                cx = (cx << 1) | bit
            for oy, ox in refofs:
                cx = (cx << 1) | refpix(y - dy + oy, x - dx + ox)
            mq.encode(int(img[y, x]), _GR_BASE + cx)


def encode_symbol_dict_refagg(
    new_specs: list[tuple[np.ndarray, int, int, int]],
    input_syms: list[np.ndarray],
    rtemplate: int = 0,
    rat_pairs: list[tuple[int, int]] | None = None,
) -> bytes:
    """Fixture twin of the SDREFAGG=1 path of
    :func:`decode_symbol_dict`: each spec is ``(bitmap, ref_id, rdx,
    rdy)`` — the new glyph rides a generic refinement of pool symbol
    ``ref_id`` (inputs first, then already-encoded new symbols) — or
    the aggregate form ``("agg", h, w, placements)`` with
    ``placements = [(x, y, pool_id)]``: the glyph is a TEXT REGION of
    those instances coded on the dictionary's own coder
    (REFAGGNINST > 1, §6.5.8.2.1). One height class per symbol; the
    input symbols stay unexported, all new symbols export."""
    from crawler_spark.functions.mq import OOB, SymbolIDCodec

    mq = MQEncoder()
    ia = _ia_blocks()
    n_new = len(new_specs)
    pool = list(input_syms)
    code_len = max(1, (len(pool) + n_new - 1).bit_length())
    iaid = SymbolIDCodec(_IA_BASE + 512 * 16, code_len)
    hcheight = 0
    for spec in new_specs:
        is_agg = isinstance(spec[0], str) and spec[0] == "agg"
        if is_agg:
            _tag, h, w, placements = spec
            bm = compose_placements(pool, placements, h, w)
        else:
            bm, ref_id, rdx, rdy = spec
            h, w = bm.shape
        ia["dh"].encode(mq, h - hcheight)
        hcheight = h
        ia["dw"].encode(mq, w)
        if is_agg:
            ia["ai"].encode(mq, len(placements))
            encode_text_region(
                placements, pool, list(range(len(pool))),
                refinements=[None] * len(placements),
                rtemplate=rtemplate, rat_pairs=rat_pairs,
                mq=mq, code_len=code_len,
            )
        else:
            ia["ai"].encode(mq, 1)
            iaid.encode(mq, ref_id)
            ia["rdx"].encode(mq, rdx)
            ia["rdy"].encode(mq, rdy)
            _refine_encode_with(mq, bm, pool[ref_id], rdx, rdy,
                                rtemplate, rat_pairs)
        pool.append(bm.astype(bool))
        ia["dw"].encode(mq, OOB)
    ia["ex"].encode(mq, len(input_syms))
    ia["ex"].encode(mq, n_new)
    return mq.flush()


def compose_placements(
    pool: list[np.ndarray], placements: list[tuple[int, int, int]],
    h: int, w: int,
) -> np.ndarray:
    """OR-compose pool glyphs at TOPLEFT positions into an (h, w)
    bitmap — the plaintext a REFAGGNINST>1 aggregate decodes to."""
    _guard_dims(h, w, "aggregate bitmap")
    bm = np.zeros((h, w), dtype=bool)
    for x, y, sid in placements:
        g = pool[sid]
        gh, gw = g.shape
        bm[y : y + gh, x : x + gw] |= g
    return bm


# ---------------------------------------------------------------------------
# Symbol dictionary (T.88 §6.5) + text region (§6.4) — the arithmetic
# no-refinement subset (SDHUFF=0, REFAGG=0, SBHUFF=0, REFINE=0,
# TRANSPOSED=0). This is how JBIG2 encoders compress TEXT pages: each
# distinct glyph bitmap is decoded once into a dictionary, then the
# text region places dictionary ids at (S, T) coordinates decoded with
# the IAx integer codecs — all procedures multiplex one MQ stream.
# Context-space layout on the shared coder: pixel contexts at base 0,
# IADH/IADW/IAEX/IAAI/IADT/IAFS/IADS/IAIT each get a 512-entry block
# past 1 << 16, IAID above those.
# ---------------------------------------------------------------------------

_IA_BASE = 1 << 17


def _ia_blocks():
    from crawler_spark.functions.mq import IntArithCodec

    names = ["dh", "dw", "ex", "ai", "dt", "fs", "ds", "it",
             "ri", "rdw", "rdh", "rdx", "rdy"]
    return {n: IntArithCodec(_IA_BASE + 512 * k) for k, n in enumerate(names)}


def decode_symbol_dict(
    data: bytes,
    n_new: int,
    n_ex: int,
    template: int,
    at_pairs: list[tuple[int, int]],
    input_syms: list[np.ndarray] | None = None,
    refagg: bool = False,
    rtemplate: int = 0,
    rat_pairs: list[tuple[int, int]] | None = None,
) -> list[np.ndarray]:
    """§6.5.5 arithmetic symbol dictionary → exported glyph bitmaps.
    With SDREFAGG=1 each new symbol decodes as a refinement of an
    already-known symbol (REFAGGNINST=1 — the single-instance case;
    true text-region aggregates raise)."""
    from crawler_spark.functions.mq import OOB, SymbolIDCodec

    mq = MQDecoder(data)
    ia = _ia_blocks()
    newsyms: list[np.ndarray] = []
    inputs = list(input_syms or [])
    code_len = max(1, (len(inputs) + n_new - 1).bit_length())
    iaid = SymbolIDCodec(_IA_BASE + 512 * 16, code_len)
    hcheight = 0
    while len(newsyms) < n_new:
        dh = ia["dh"].decode(mq)
        if dh is OOB:
            raise ValueError("JBIG2 symbol dict: OOB height delta")
        hcheight += dh
        symwidth = 0
        while True:
            dw = ia["dw"].decode(mq)
            if dw is OOB:
                break
            symwidth += dw
            if symwidth <= 0 or hcheight <= 0 or len(newsyms) >= n_new:
                raise ValueError("JBIG2 symbol dict: bad symbol size/count")
            if refagg:  # §6.5.8.2
                n_inst = ia["ai"].decode(mq)
                pool = inputs + newsyms
                if n_inst == 1:  # §6.5.8.2.2 single-refinement form
                    ref_id = iaid.decode(mq)
                    rdx = ia["rdx"].decode(mq)
                    rdy = ia["rdy"].decode(mq)
                    if not 0 <= ref_id < len(pool):
                        raise ValueError("JBIG2 symbol dict: bad refinement id")
                    newsyms.append(
                        _refine_decode_with(
                            mq, symwidth, hcheight, pool[ref_id], rdx, rdy,
                            rtemplate, rat_pairs,
                        )
                    )
                else:
                    # §6.5.8.2.1: the new symbol decodes as a TEXT
                    # REGION of n_inst refined instances over the
                    # pool, on THIS coder with THIS dict's code_len
                    # (SBSTRIPS=1, TOPLEFT, DSOFFSET 0, REFINE=1)
                    newsyms.append(
                        decode_text_region(
                            b"", symwidth, hcheight, n_inst, 0, 1, 0,
                            pool, refine=True, rtemplate=rtemplate,
                            rat_pairs=rat_pairs, mq=mq, code_len=code_len,
                        )
                    )
            else:
                newsyms.append(
                    _generic_decode_with(
                        mq, symwidth, hcheight, at_pairs, template
                    )
                )
    # §6.5.10 export flags: alternating EXFLAG run lengths over
    # (input symbols ++ new symbols), starting not-exported
    pool = list(input_syms or []) + newsyms
    exported: list[np.ndarray] = []
    exflag = 0
    i = 0
    while i < len(pool):
        run = ia["ex"].decode(mq)
        if run is OOB or run < 0:
            raise ValueError("JBIG2 symbol dict: bad export run")
        if exflag:
            exported.extend(pool[i : i + run])
        i += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise ValueError("JBIG2 symbol dict: export count mismatch")
    return exported


def encode_symbol_dict(
    syms: list[np.ndarray], template: int = 0
) -> bytes:
    """Fixture twin of :func:`decode_symbol_dict`: one height class
    per distinct height (ascending), all symbols exported."""
    from crawler_spark.functions.mq import OOB

    mq = MQEncoder()
    ia = _ia_blocks()
    order = sorted(range(len(syms)), key=lambda k: syms[k].shape[0])
    hcheight = 0
    at = _GB_AT_NOMINAL[template]
    k = 0
    while k < len(order):
        h = syms[order[k]].shape[0]
        ia["dh"].encode(mq, h - hcheight)
        hcheight = h
        symwidth = 0
        while k < len(order) and syms[order[k]].shape[0] == h:
            w = syms[order[k]].shape[1]
            ia["dw"].encode(mq, w - symwidth)
            symwidth = w
            _generic_encode_with(mq, syms[order[k]], at, template)
            k += 1
        ia["dw"].encode(mq, OOB)
    # export all: run of 0 not-exported, then run of n exported
    ia["ex"].encode(mq, 0)
    ia["ex"].encode(mq, len(syms))
    return mq.flush(), [order.index(i) for i in range(len(syms))]


def decode_text_region(
    data: bytes,
    w: int,
    h: int,
    n_instances: int,
    log_strips: int,
    ref_corner: int,
    ds_offset: int,
    syms: list[np.ndarray],
    transposed: bool = False,
    refine: bool = False,
    rtemplate: int = 0,
    rat_pairs: list[tuple[int, int]] | None = None,
    mq: MQDecoder | None = None,
    code_len: int | None = None,
) -> np.ndarray:
    """§6.4.5 arithmetic text region (OR composition) → bool bitmap.
    TRANSPOSED=1 swaps which of (S, T) supplies x vs y — S runs down
    the page and CURS advances by symbol HEIGHT — while REFCORNER
    keeps its screen-space meaning (TOP/BOTTOM = rows, LEFT/RIGHT =
    columns), per §6.4.5 step 3(c)(viii-xi). SBREFINE=1 decodes a
    per-instance RI bit (IARI); a nonzero RI refines the dictionary
    glyph into an instance-specific bitmap sized (w+RDW, h+RDH) with
    reference offsets (RDW>>1)+RDX, (RDH>>1)+RDY per §6.4.11.
    ``mq``/``code_len`` let a symbol dictionary run the procedure on
    its OWN coder for REFAGGNINST>1 aggregates (§6.5.8.2.1) — the
    fresh IAx/IAID instances share state through the coder's context
    dictionaries because their context-id bases are fixed."""
    from crawler_spark.functions.mq import OOB, SymbolIDCodec

    if mq is None:
        mq = MQDecoder(data)
    ia = _ia_blocks()
    if code_len is None:
        code_len = max(1, (len(syms) - 1).bit_length())
    iaid = SymbolIDCodec(_IA_BASE + 512 * 16, code_len)
    strips = 1 << log_strips
    _guard_dims(h, w, "text region")
    page = np.zeros((h, w), dtype=bool)
    stript = -(ia["dt"].decode(mq)) * strips
    firsts = 0
    placed = 0
    while placed < n_instances:
        dt = ia["dt"].decode(mq)
        if dt is OOB:
            raise ValueError("JBIG2 text region: OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                firsts += ia["fs"].decode(mq)
                curs = firsts
                first = False
            else:
                ds = ia["ds"].decode(mq)
                if ds is OOB:
                    break
                curs += ds + ds_offset
            curt = ia["it"].decode(mq) if strips > 1 else 0
            t = stript + curt
            sym = syms[iaid.decode(mq)]
            if refine and ia["ri"].decode(mq):
                rdw = ia["rdw"].decode(mq)
                rdh = ia["rdh"].decode(mq)
                rdx = ia["rdx"].decode(mq)
                rdy = ia["rdy"].decode(mq)
                if sym.shape[1] + rdw <= 0 or sym.shape[0] + rdh <= 0:
                    raise ValueError("JBIG2 text region: bad refinement size")
                sym = _refine_decode_with(
                    mq, sym.shape[1] + rdw, sym.shape[0] + rdh, sym,
                    (rdw >> 1) + rdx, (rdh >> 1) + rdy, rtemplate, rat_pairs,
                )
            hs, ws = sym.shape
            # REFCORNER: 0=BOTTOMLEFT 1=TOPLEFT 2=BOTTOMRIGHT 3=TOPRIGHT
            row_ref, col_ref = (curs, t) if transposed else (t, curs)
            y0 = row_ref if ref_corner in (1, 3) else row_ref - hs + 1
            x0 = col_ref if ref_corner in (0, 1) else col_ref - ws + 1
            if y0 < 0 or x0 < 0 or y0 + hs > h or x0 + ws > w:
                raise ValueError("JBIG2 text region: symbol out of bounds")
            page[y0 : y0 + hs, x0 : x0 + ws] |= sym
            curs += (hs if transposed else ws) - 1
            placed += 1
            if placed > n_instances:
                raise ValueError("JBIG2 text region: instance overflow")
            # the strip's closing OOB is always coded (§6.4.5 step
            # 3(c)(ii)) — consume it even after the last instance, so
            # shared-coder aggregates stay aligned
    return page


def encode_text_region(
    placements: list[tuple[int, int, int]],
    syms: list[np.ndarray],
    sym_order: list[int],
    log_strips: int = 0,
    ds_offset: int = 0,
    transposed: bool = False,
    refinements: list | None = None,
    rtemplate: int = 0,
    rat_pairs: list[tuple[int, int]] | None = None,
    mq: MQEncoder | None = None,
    code_len: int | None = None,
) -> bytes | None:
    """Fixture twin: ``placements`` = (x, y, sym_idx) with TOPLEFT
    corners, sorted by (strip, x). TRANSPOSED=1 strips are vertical
    (T = column) and S runs down rows. ``refinements`` (SBREFINE=1)
    aligns with ``placements``: None places the dictionary glyph
    (RI=0); ``(bitmap, rdw, rdh, rdx, rdy)`` refines it into that
    instance bitmap, whose shape must be the glyph's + (rdh, rdw).
    With a caller-supplied ``mq`` (aggregate symbols), bits join that
    coder's stream and the return value is None."""
    from crawler_spark.functions.mq import OOB, SymbolIDCodec

    shared = mq is not None
    if mq is None:
        mq = MQEncoder()
    ia = _ia_blocks()
    if code_len is None:
        code_len = max(1, (len(syms) - 1).bit_length())
    iaid = SymbolIDCodec(_IA_BASE + 512 * 16, code_len)
    strips = 1 << log_strips
    by_strip: dict[int, list[tuple[int, int, int, int]]] = {}
    for k, (x, y, si) in enumerate(placements):
        if transposed:
            x, y = y, x  # (S, T) = (row, column)
        by_strip.setdefault(y // strips * strips, []).append((x, y, si, k))
    stript = 0
    firsts = 0
    first_strip = True
    for st in sorted(by_strip):
        if first_strip:
            ia["dt"].encode(mq, -(-st // strips) if st < 0 else 0)
            stript = 0 if st >= 0 else st
            # simplest: emit initial STRIPT=0 then delta to st
            ia["dt"].encode(mq, (st - stript) // strips)
            stript = st
            first_strip = False
        else:
            ia["dt"].encode(mq, (st - stript) // strips)
            stript = st
        first = True
        curs = 0
        for x, y, si, k in sorted(by_strip[st]):
            if first:
                ia["fs"].encode(mq, x - firsts)
                firsts = x
                curs = x
                first = False
            else:
                ia["ds"].encode(mq, x - curs - ds_offset)
                curs = x
            if strips > 1:
                ia["it"].encode(mq, y - st)
            iaid.encode(mq, sym_order[si])
            inst = syms[si]
            if refinements is not None:
                spec = refinements[k]
                ia["ri"].encode(mq, 0 if spec is None else 1)
                if spec is not None:
                    inst, rdw, rdh, rdx, rdy = spec
                    if inst.shape != (syms[si].shape[0] + rdh,
                                      syms[si].shape[1] + rdw):
                        raise ValueError("refinement shape mismatch")
                    ia["rdw"].encode(mq, rdw)
                    ia["rdh"].encode(mq, rdh)
                    ia["rdx"].encode(mq, rdx)
                    ia["rdy"].encode(mq, rdy)
                    _refine_encode_with(
                        mq, inst, syms[si], (rdw >> 1) + rdx,
                        (rdh >> 1) + rdy, rtemplate, rat_pairs,
                    )
            curs += inst.shape[0 if transposed else 1] - 1
        ia["ds"].encode(mq, OOB)
    return None if shared else mq.flush()


# ---------------------------------------------------------------------------
# Huffman-coded variants (SDHUFF=1 / SBHUFF=1, T.88 §6.5.9, §7.4.3.1.7)
# over the Annex-B standard tables in functions/jbig2_huffman.py.
# Symbol bitmaps arrive as one height-class COLLECTIVE bitmap (MMR via
# the T.6 codec, or uncompressed byte-aligned rows) sliced by the
# decoded widths; text regions read parameters as MSB-first prefix
# codes and symbol ids through the §7.4.3.1.7 runcode scheme.
# ---------------------------------------------------------------------------


def decode_symbol_dict_huffman(
    data: bytes,
    n_new: int,
    n_ex: int,
    dh_sel: int,
    dw_sel: int,
    bm_sel: int,
    input_syms: list[np.ndarray] | None = None,
    custom: list | None = None,
    refagg: bool = False,
    rtemplate: int = 0,
    rat_pairs: list[tuple[int, int]] | None = None,
) -> list[np.ndarray]:
    """§6.5 with SDHUFF=1 → exported glyph bitmaps. Selection 3
    (DH/DW) or 1 (BMSIZE) consumes the next custom table from
    ``custom`` — the referred-to table segments in order of need, per
    §7.4.3.1.6. With REFAGG=0 each height class arrives as one
    collective bitmap sliced by widths; with REFAGG=1 every new symbol
    is an individual refinement (§6.5.8.2.2, REFAGGNINST=1: raw-bit
    symbol ID, RDX/RDY through B.15, BMSIZE through B.1, byte-aligned
    MQ blob; Huffman aggregate text regions stay out of subset)."""
    from crawler_spark.functions.jbig2_huffman import (
        OOB as HOOB,
        BitReader,
        STANDARD_TABLES,
    )

    customs = list(custom or [])

    def take():
        if not customs:
            raise ValueError(
                "JBIG2 Huffman symbol dict: missing custom table"
            )
        return customs.pop(0)

    if dh_sel == 2 or dw_sel == 2:
        raise ValueError("JBIG2 Huffman symbol dict: reserved selection")
    dh_t = take() if dh_sel == 3 else STANDARD_TABLES[4 if dh_sel == 0 else 5]
    dw_t = take() if dw_sel == 3 else STANDARD_TABLES[2 if dw_sel == 0 else 3]
    bm_t = take() if bm_sel == 1 else STANDARD_TABLES[1]
    ex_t = STANDARD_TABLES[1]
    rd_t = STANDARD_TABLES[15]  # SDHUFFRDX/RDY (§6.5.8.2.2)
    inputs = list(input_syms or [])
    code_len = max(1, (len(inputs) + n_new - 1).bit_length())
    r = BitReader(data)
    newsyms: list[np.ndarray] = []
    hcheight = 0
    while len(newsyms) < n_new:
        dh = dh_t.decode(r)
        if dh is HOOB:
            raise ValueError("JBIG2 Huffman symbol dict: OOB height delta")
        hcheight += dh
        symwidth = 0
        widths: list[int] = []
        while True:
            dw = dw_t.decode(r)
            if dw is HOOB:
                break
            symwidth += dw
            if (
                symwidth <= 0
                or hcheight <= 0
                or len(newsyms) + len(widths) >= n_new
            ):
                raise ValueError("JBIG2 Huffman symbol dict: bad size/count")
            if refagg:  # §6.5.8.2: one refined symbol, decoded in place
                n_inst = ex_t.decode(r)  # REFAGGNINST rides Table B.1
                pool = inputs + newsyms
                if n_inst is HOOB or n_inst < 1:
                    raise ValueError(
                        "JBIG2 Huffman symbol dict: bad REFAGGNINST"
                    )
                if n_inst != 1:
                    # §6.5.8.2.1: the aggregate is a TEXT REGION of
                    # n_inst refined instances over the pool, read
                    # inline from THIS bitstream with raw
                    # SBSYMCODELEN-bit ids and the Table-16 fixed
                    # tables (FS=B.6, DS=B.8, DT=B.11, RD*=B.15,
                    # RSIZE=B.1; SBSTRIPS=1, TOPLEFT, DSOFFSET 0)
                    newsyms.append(decode_text_region_huffman(
                        b"", symwidth, hcheight, n_inst, 0, 1, 0, pool,
                        False, 0, 0, 0, None, True, rtemplate,
                        rat_pairs, (1, 1, 1, 1), False, r, code_len,
                    ))
                    continue
                ref_id = r.read_bits(code_len)
                rdx = rd_t.decode(r)
                rdy = rd_t.decode(r)
                bmsize = ex_t.decode(r)
                if (
                    HOOB in (rdx, rdy, bmsize) or bmsize <= 0
                    or not 0 <= ref_id < len(pool)
                ):
                    raise ValueError(
                        "JBIG2 Huffman symbol dict: bad refinement"
                    )
                blob = r.take_bytes(bmsize)
                newsyms.append(
                    _refine_decode_with(
                        MQDecoder(blob), symwidth, hcheight,
                        pool[ref_id], rdx, rdy, rtemplate, rat_pairs,
                    )
                )
                continue
            widths.append(symwidth)
        if refagg or not widths:
            continue
        bmsize = bm_t.decode(r)
        totwidth = sum(widths)
        if bmsize == 0:  # uncompressed, rows byte-padded (§6.5.9)
            stride = (totwidth + 7) // 8
            raw = r.take_bytes(stride * hcheight)
            bits = (
                np.unpackbits(
                    np.frombuffer(raw, np.uint8).reshape(hcheight, stride),
                    axis=1,
                )[:, :totwidth]
                .astype(bool)
            )
        else:
            _guard_dims(hcheight, totwidth, "symbol collective bitmap")
            bits = decode_g4(r.take_bytes(bmsize), columns=totwidth,
                             rows=hcheight) == 0
        x = 0
        for wd in widths:
            newsyms.append(bits[:, x : x + wd])
            x += wd
    # §6.5.10 export flags, runs via Table B.1 when SDHUFF=1
    pool = list(input_syms or []) + newsyms
    exported: list[np.ndarray] = []
    exflag = 0
    i = 0
    while i < len(pool):
        run = ex_t.decode(r)
        if exflag:
            exported.extend(pool[i : i + run])
        i += run
        exflag ^= 1
    if len(exported) != n_ex:
        raise ValueError("JBIG2 Huffman symbol dict: export count mismatch")
    return exported


def decode_text_region_huffman(
    data: bytes,
    w: int,
    h: int,
    n_instances: int,
    log_strips: int,
    ref_corner: int,
    ds_offset: int,
    syms: list[np.ndarray],
    transposed: bool,
    fs_sel: int,
    ds_sel: int,
    dt_sel: int,
    custom: list | None = None,
    refine: bool = False,
    rtemplate: int = 0,
    rat: list[tuple[int, int]] | None = None,
    rd_sels: tuple[int, int, int, int] = (0, 0, 0, 0),
    rsize_custom: bool = False,
    reader=None,
    raw_id_len: int | None = None,
) -> np.ndarray:
    """§6.4.5 with SBHUFF=1. ``data`` starts at the §7.4.3.1.7
    symbol-ID runcode table. Selection 3 consumes the next custom
    table (referred table segments in FS, DS, DT, RDW, RDH, RDX, RDY,
    RSIZE order of need). With ``refine`` each instance carries an RI
    bit (§6.4.11: one bit under SBHUFF); a nonzero RI reads RDW/RDH/
    RDX/RDY through B.14/B.15 (``rd_sels``), BMSIZE through B.1, then
    a byte-aligned BMSIZE-byte MQ-coded refinement of the glyph.
    ``reader``/``raw_id_len`` let a symbol dictionary run the
    procedure inline on its OWN bitstream for REFAGGNINST>1 aggregates
    (§6.5.8.2.1/.3: symbol IDs are raw SBSYMCODELEN-bit codes, no
    runcode table)."""
    from crawler_spark.functions.jbig2_huffman import (
        OOB as HOOB,
        BitReader,
        STANDARD_TABLES,
        decode_symbol_id_lengths,
        symbol_id_table,
    )

    customs = list(custom or [])

    def take():
        if not customs:
            raise ValueError(
                "JBIG2 Huffman text region: missing custom table"
            )
        return customs.pop(0)

    try:
        fs_t = take() if fs_sel == 3 else STANDARD_TABLES[{0: 6, 1: 7}[fs_sel]]
        ds_t = (
            take() if ds_sel == 3
            else STANDARD_TABLES[{0: 8, 1: 9, 2: 10}[ds_sel]]
        )
        dt_t = (
            take() if dt_sel == 3
            else STANDARD_TABLES[{0: 11, 1: 12, 2: 13}[dt_sel]]
        )
        rd_ts = [
            take() if sel == 3 else STANDARD_TABLES[{0: 14, 1: 15}[sel]]
            for sel in rd_sels
        ] if refine else []
    except KeyError:
        raise ValueError(
            "JBIG2 Huffman text region: unavailable table selection "
            f"(fs={fs_sel} ds={ds_sel} dt={dt_sel} rd={rd_sels})"
        ) from None
    # SBHUFFRSIZE: selection 0 = B.1, 1 = the last custom table
    rs_t = take() if rsize_custom else STANDARD_TABLES[1]
    r = reader if reader is not None else BitReader(data)
    if raw_id_len is not None:
        decode_id = lambda: r.read_bits(raw_id_len)  # noqa: E731
    else:
        sym_t = symbol_id_table(decode_symbol_id_lengths(r, len(syms)))
        r.byte_align()  # §7.4.3.1.7: skip remaining bits of last byte
        decode_id = lambda: sym_t.decode(r)  # noqa: E731
    strips = 1 << log_strips
    _guard_dims(h, w, "text region")
    page = np.zeros((h, w), dtype=bool)
    stript = -dt_t.decode(r) * strips
    firsts = 0
    placed = 0
    while placed < n_instances:
        dt = dt_t.decode(r)
        if dt is HOOB:
            raise ValueError("JBIG2 Huffman text region: OOB strip delta")
        stript += dt * strips
        first = True
        curs = 0
        while True:
            if first:
                firsts += fs_t.decode(r)
                curs = firsts
                first = False
            else:
                ds = ds_t.decode(r)
                if ds is HOOB:
                    break
                curs += ds + ds_offset
            curt = r.read_bits(log_strips) if strips > 1 else 0
            t = stript + curt
            sid = decode_id()
            if not 0 <= sid < len(syms):
                raise ValueError("JBIG2 Huffman text region: bad symbol id")
            sym = syms[sid]
            if refine and r.read_bit():
                rdw, rdh, rdx, rdy = (tt.decode(r) for tt in rd_ts)
                bmsize = rs_t.decode(r)
                if (
                    HOOB in (rdw, rdh, rdx, rdy, bmsize)
                    or sym.shape[1] + rdw <= 0
                    or sym.shape[0] + rdh <= 0
                    or bmsize <= 0
                ):
                    raise ValueError(
                        "JBIG2 Huffman text region: bad refinement"
                    )
                blob = r.take_bytes(bmsize)
                sym = _refine_decode_with(
                    MQDecoder(blob), sym.shape[1] + rdw, sym.shape[0] + rdh,
                    sym, (rdw >> 1) + rdx, (rdh >> 1) + rdy, rtemplate, rat,
                )
            hs, ws = sym.shape
            row_ref, col_ref = (curs, t) if transposed else (t, curs)
            y0 = row_ref if ref_corner in (1, 3) else row_ref - hs + 1
            x0 = col_ref if ref_corner in (0, 1) else col_ref - ws + 1
            if y0 < 0 or x0 < 0 or y0 + hs > h or x0 + ws > w:
                raise ValueError(
                    "JBIG2 Huffman text region: symbol out of bounds"
                )
            page[y0 : y0 + hs, x0 : x0 + ws] |= sym
            curs += (hs if transposed else ws) - 1
            placed += 1
            if placed > n_instances:
                raise ValueError(
                    "JBIG2 Huffman text region: instance overflow"
                )
            # the strip's closing OOB is always coded — consume it
    return page


# segment types (T.88 §7.3)
# ---------------------------------------------------------------------------
# Halftone regions (T.88 §6.6) + pattern dictionaries (§6.7): the
# region is a grid of grayscale values, each value indexing a pattern
# cell. The pattern dictionary decodes as ONE collective bitmap of
# GRAYMAX+1 side-by-side HDPW×HDPH cells with AT1 = (-HDPW, 0) so each
# cell conditions on its neighbor; the grayscale image decodes as
# Gray-coded bitplanes (Annex C.5, MSB first) sharing one MQ stream
# and context set, then patterns land on the skewed grid
# x = (HGX + mg·HRY + ng·HRX) >> 8, y = (HGY + mg·HRX − ng·HRY) >> 8
# (all grid parameters in 1/256-pixel units).
# ---------------------------------------------------------------------------


def decode_pattern_dict(body: bytes) -> list[np.ndarray]:
    """§6.7.5: pattern dictionary segment data → GRAYMAX+1 bitmaps."""
    flags = body[0]
    hdmmr = flags & 1
    template = (flags >> 1) & 3
    hdpw, hdph = body[1], body[2]
    (graymax,) = struct.unpack_from(">I", body, 3)
    if hdpw == 0 or hdph == 0:
        raise ValueError("JBIG2 pattern dict: zero pattern size")
    cw = (graymax + 1) * hdpw
    _guard_dims(hdph, cw, "pattern dict collective")
    if hdmmr:
        coll = decode_g4(body[7:], columns=cw, rows=hdph) == 0
    else:
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)][: _GB_AT_COUNT[template]]
        coll = decode_generic_arith(body[7:], cw, hdph, at, template)
    return [
        coll[:, k * hdpw : (k + 1) * hdpw].astype(bool)
        for k in range(graymax + 1)
    ]


def _gray_to_values(planes: list[np.ndarray]) -> np.ndarray:
    """Annex C.5 Gray decode: planes arrive MSB first; each lower bit
    XORs against the bit above it."""
    value = np.zeros(planes[0].shape, dtype=np.int64)
    prev = np.zeros(planes[0].shape, dtype=np.uint8)
    for j, plane in enumerate(planes):
        bit = plane if j == 0 else plane ^ prev
        value = (value << 1) | bit
        prev = bit
    return value


def decode_gray_planes(
    mq: MQDecoder, w: int, h: int, bits: int, template: int,
    skip: np.ndarray | None = None,
) -> np.ndarray:
    """Annex C.5 arithmetic grayscale image: ``bits`` Gray-coded
    bitplanes, MSB first, one shared MQ stream + context set →
    int array of values. ``skip`` masks cells whose pattern falls
    outside the region (HENABLESKIP)."""
    at = _GB_AT_NOMINAL[template][: _GB_AT_COUNT[template]]
    planes = [
        _generic_decode_with(
            mq, w, h, at, template, skip=skip
        ).astype(np.uint8)
        for _ in range(bits)
    ]
    return _gray_to_values(planes)


def _compose(dst: np.ndarray, src: np.ndarray, op: int) -> np.ndarray:
    if op == 0:
        return dst | src
    if op == 1:
        return dst & src
    if op == 2:
        return dst ^ src
    if op == 3:
        return ~(dst ^ src)
    return src.copy()  # 4 = REPLACE


def _halftone_skip(hgw, hgh, hgx, hgy, hrx, hry, pat_shape, w, h):
    """§6.6.5.1 HSKIP: grid cells whose pattern footprint lies
    entirely outside the region."""
    ph, pw = pat_shape
    mg = np.arange(hgh)[:, None]
    ng = np.arange(hgw)[None, :]
    x = (hgx + mg * hry + ng * hrx) >> 8
    y = (hgy + mg * hrx - ng * hry) >> 8
    return ((x + pw <= 0) | (x >= w) | (y + ph <= 0) | (y >= h)).astype(
        np.uint8
    )


def decode_halftone_region(
    body: bytes, pats: list[np.ndarray]
) -> tuple[np.ndarray, int, int, int]:
    """§6.6.5 halftone region segment data → (bitmap, x, y, comb_op)."""
    w, h, x, y = struct.unpack_from(">IIII", body, 0)
    ext_op = body[16] & 7
    hflags = body[17]
    hmmr = hflags & 1
    template = (hflags >> 1) & 3
    enableskip = bool(hflags & 8)
    comb_op = (hflags >> 4) & 7
    defpixel = (hflags >> 7) & 1
    hgw, hgh, hgx, hgy = struct.unpack_from(">IIii", body, 18)
    hrx, hry = struct.unpack_from(">HH", body, 34)
    _guard_dims(h, w, "halftone region")
    _guard_dims(hgh, hgw, "halftone grid")
    region = np.full((h, w), bool(defpixel))
    bits = max(len(pats) - 1, 0).bit_length()
    skip = None
    if enableskip:
        if hmmr:
            raise ValueError("JBIG2 halftone: HENABLESKIP with MMR")
        skip = _halftone_skip(
            hgw, hgh, hgx, hgy, hrx, hry, pats[0].shape, w, h
        )
    if not bits:
        gray = np.zeros((hgh, hgw), dtype=np.int64)
    elif hmmr:
        # C.5 MMR form: all bitplanes ride ONE T.6 stream, an EOFB
        # terminating each plane; Gray decode matches the MQ path
        from crawler_spark.functions.ccitt import decode_g4_frames

        planes = [
            (f == 0).astype(np.uint8)
            for f in decode_g4_frames(body[38:], hgw, hgh, bits)
        ]
        gray = _gray_to_values(planes)
    else:
        mq = MQDecoder(body[38:])
        gray = decode_gray_planes(mq, hgw, hgh, bits, template, skip)
    if gray.max(initial=0) >= len(pats):
        raise ValueError("JBIG2 halftone: gray value exceeds pattern count")
    ph, pw = pats[0].shape
    for mg in range(hgh):
        for ng in range(hgw):
            px = (hgx + mg * hry + ng * hrx) >> 8
            py = (hgy + mg * hrx - ng * hry) >> 8
            pat = pats[int(gray[mg, ng])]
            # clip the cell to the region window
            sy, sx = max(0, -py), max(0, -px)
            ey = min(ph, h - py)
            ex = min(pw, w - px)
            if sy >= ey or sx >= ex:
                continue
            region[py + sy : py + ey, px + sx : px + ex] = _compose(
                region[py + sy : py + ey, px + sx : px + ex],
                pat[sy:ey, sx:ex],
                comb_op,
            )
    return region, x, y, ext_op


_SYMBOL_DICT = 0
_INTERMEDIATE_TEXT = 4
_IMM_TEXT = 6
_IMM_LOSSLESS_TEXT = 7
_PATTERN_DICT = 16
_INTERMEDIATE_HALFTONE = 20
_IMM_HALFTONE = 22
_IMM_LOSSLESS_HALFTONE = 23
_PAGE_INFO = 48
_INTERMEDIATE_GENERIC = 36
_IMM_GENERIC = 38
_IMM_LOSSLESS_GENERIC = 39
_INTERMEDIATE_REFINE = 40
_IMM_REFINE = 41
_IMM_LOSSLESS_REFINE = 42
_END_OF_PAGE = 49
_END_OF_STRIPE = 50
_END_OF_FILE = 51
_TABLE = 53


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    """One embedded-format segment header → (header dict, data start)."""
    if pos + 5 > len(data):
        raise ValueError("JBIG2 truncated segment header")
    num, flags = struct.unpack_from(">IB", data, pos)
    pos += 5
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    rts = data[pos]
    count = rts >> 5
    if count == 7:  # long form: count in low 29 bits + retain bitmap
        (count,) = struct.unpack_from(">I", data, pos)
        count &= 0x1FFFFFFF
        pos += 4 + (count + 8) // 8
    else:
        pos += 1
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    refs = []
    for _ in range(count):
        refs.append(int.from_bytes(data[pos : pos + ref_size], "big"))
        pos += ref_size
    if page_assoc_4:
        (page,) = struct.unpack_from(">I", data, pos)
        pos += 4
    else:
        page = data[pos]
        pos += 1
    (length,) = struct.unpack_from(">I", data, pos)
    pos += 4
    return (
        {"number": num, "type": seg_type, "refs": refs, "page": page,
         "length": length},
        pos,
    )


def decode_jbig2_embedded(data: bytes, globals_data: bytes | None = None) -> np.ndarray:
    """Embedded-format JBIG2 → (h, w) uint8 grayscale, 0=black.

    Supports page-info + immediate generic regions (MMR or
    MQ-arithmetic template 0) composited onto the page (OR combination
    — black wins). A /JBIG2Globals stream (ISO 32000-1 §7.4.7: shared
    segments, typically symbol dictionaries, referenced by every page's
    image stream) is processed first into the same segment state.
    Raises on any segment kind outside the subset."""
    state: dict = {"page": None, "dicts": {}, "pats": {}, "tabs": {},
                   "aux": {}}
    if globals_data:
        _run_segments(globals_data, state)
    _run_segments(data, state)
    page = state["page"]
    if page is None:
        raise ValueError("JBIG2: no page info segment")
    return np.where(page, 0, 255).astype(np.uint8)


def _grow_page(state: dict, page: np.ndarray, rows: int) -> np.ndarray:
    """Striped pages (§7.4.8.2) declare unknown height: the page
    buffer grows as stripes arrive; a fixed-height page still raises
    on overflow."""
    if rows <= page.shape[0]:
        return page
    if not state.get("striped"):
        raise ValueError("JBIG2 region exceeds page")
    _guard_dims(rows, page.shape[1], "striped page growth")
    return np.vstack(
        [page, np.zeros((rows - page.shape[0], page.shape[1]), dtype=bool)]
    )


def _unknown_length_body(data: bytes, pos: int, hdr: dict) -> tuple[bytes, int]:
    """§7.2.7 unknown segment length: only an immediate generic region
    may declare 0xFFFFFFFF; its payload ends with a two-byte terminator
    (FF AC under MQ coding — a sequence the stuffed bitstream cannot
    contain internally — or 00 00 under MMR) followed by a four-byte
    row count. The region height must be known so the terminator can
    be located as terminator+height, the same disambiguation pdfjs
    applies."""
    if hdr["type"] not in (_IMM_GENERIC, _IMM_LOSSLESS_GENERIC):
        raise ValueError("JBIG2 unknown length on a non-generic segment")
    if pos + 18 > len(data):
        raise ValueError("JBIG2 truncated unknown-length segment")
    _w, h, _x, _y = struct.unpack_from(">IIII", data, pos)
    if h == 0xFFFFFFFF:
        raise ValueError("JBIG2 unknown-length region with unknown height")
    gflags = data[pos + 17]
    n_at = 0 if gflags & 1 else _GB_AT_COUNT[(gflags >> 1) & 3]
    start = pos + 18 + 2 * n_at
    term = b"\x00\x00" if gflags & 1 else b"\xff\xac"
    end = data.find(term + struct.pack(">I", h), start)
    if end < 0:
        raise ValueError("JBIG2 unknown-length segment: no terminator")
    return data[pos : end + 2], end + 6


def _run_segments(data: bytes, state: dict) -> None:
    pos = 0
    page: np.ndarray | None = state["page"]
    dicts: dict[int, list[np.ndarray]] = state["dicts"]  # seg number → syms
    while pos < len(data):
        hdr, pos = _parse_segment_header(data, pos)
        if hdr["length"] == 0xFFFFFFFF:
            body, pos = _unknown_length_body(data, pos, hdr)
        else:
            body = data[pos : pos + hdr["length"]]
            pos += hdr["length"]
        t = hdr["type"]
        if t == _PAGE_INFO:
            page_w, page_h = struct.unpack_from(">II", body, 0)
            if page_h == 0xFFFFFFFF:
                (striping,) = struct.unpack_from(">H", body, 17)
                if not striping & 0x8000:
                    raise ValueError(
                        "JBIG2 unknown page height without striping"
                    )
                state["striped"] = True
                _guard_dims(1, page_w, "page")
                page = np.zeros((0, page_w), dtype=bool)
            else:
                _guard_dims(page_h, page_w, "page")
                page = np.zeros((page_h, page_w), dtype=bool)
        elif t == _END_OF_STRIPE:
            # body = u32 Y of the stripe's final row; the page is at
            # least that tall even if no region touched the stripe
            if page is None:
                raise ValueError("JBIG2 end-of-stripe before page info")
            (y_end,) = struct.unpack_from(">I", body, 0)
            page = _grow_page(state, page, y_end + 1)
        elif t in (_IMM_GENERIC, _IMM_LOSSLESS_GENERIC,
                   _INTERMEDIATE_GENERIC):
            if page is None:
                raise ValueError("JBIG2 region before page info")
            w, h, x, y = struct.unpack_from(">IIII", body, 0)
            _guard_dims(h, w, "immediate generic region")
            # region info = 17 bytes (4 u32 + combination op byte)
            gflags = body[17]
            if gflags & 1:  # MMR payload = T.6
                if gflags & 8:
                    raise ValueError("JBIG2 TPGDON with MMR is invalid")
                region = decode_g4(body[18:], columns=w, rows=h) == 0
            else:
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                n_at = _GB_AT_COUNT[template]
                at = [
                    (
                        int.from_bytes(body[18 + 2 * k : 19 + 2 * k], "big", signed=True),
                        int.from_bytes(body[19 + 2 * k : 20 + 2 * k], "big", signed=True),
                    )
                    for k in range(n_at)
                ]
                region = decode_generic_arith(
                    body[18 + 2 * n_at :], w, h, at, template, tpgdon
                )
            if t == _INTERMEDIATE_GENERIC:
                # §8.2: an intermediate region is retained for later
                # segments (refinement references), never composited
                state["aux"][hdr["number"]] = region
                continue
            page = _grow_page(state, page, y + h)
            if x + w > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page")
            page[y : y + h, x : x + w] |= region
        elif t == _SYMBOL_DICT:
            (sdflags,) = struct.unpack_from(">H", body, 0)
            refagg = bool(sdflags & 2)
            rtemplate = (sdflags >> 12) & 1
            inputs: list[np.ndarray] = []
            for r in hdr["refs"]:
                inputs.extend(dicts.get(r, []))
            if sdflags & 1:  # SDHUFF=1: no AT pixels follow the flags
                off = 2
                rat: list[tuple[int, int]] | None = None
                if refagg and rtemplate == 0:  # SDRAT: 2 AT pairs
                    rat = [
                        (
                            int.from_bytes(
                                body[off + 2 * k : off + 1 + 2 * k],
                                "big", signed=True),
                            int.from_bytes(
                                body[off + 1 + 2 * k : off + 2 + 2 * k],
                                "big", signed=True),
                        )
                        for k in range(2)
                    ]
                    off += 4
                n_ex, n_new = struct.unpack_from(">II", body, off)
                customs = [
                    state["tabs"][r] for r in hdr["refs"]
                    if r in state["tabs"]
                ]
                dicts[hdr["number"]] = decode_symbol_dict_huffman(
                    body[off + 8 :], n_new, n_ex,
                    (sdflags >> 2) & 3, (sdflags >> 4) & 3,
                    (sdflags >> 6) & 1, inputs, customs,
                    refagg, rtemplate, rat,
                )
                continue
            template = (sdflags >> 10) & 3
            n_at = _GB_AT_COUNT[template]
            at = [
                (
                    int.from_bytes(body[2 + 2 * k : 3 + 2 * k], "big", signed=True),
                    int.from_bytes(body[3 + 2 * k : 4 + 2 * k], "big", signed=True),
                )
                for k in range(n_at)
            ]
            off = 2 + 2 * n_at
            rat: list[tuple[int, int]] | None = None
            if refagg and rtemplate == 0:  # 2 refinement AT pairs
                rat = [
                    (
                        int.from_bytes(body[off + 2 * k : off + 1 + 2 * k],
                                       "big", signed=True),
                        int.from_bytes(body[off + 1 + 2 * k : off + 2 + 2 * k],
                                       "big", signed=True),
                    )
                    for k in range(2)
                ]
                off += 4
            n_ex, n_new = struct.unpack_from(">II", body, off)
            dicts[hdr["number"]] = decode_symbol_dict(
                body[off + 8 :], n_new, n_ex, template, at, inputs,
                refagg, rtemplate, rat,
            )
        elif t in (_IMM_TEXT, _IMM_LOSSLESS_TEXT, _INTERMEDIATE_TEXT):
            if page is None:
                raise ValueError("JBIG2 region before page info")
            w, h, x, y = struct.unpack_from(">IIII", body, 0)
            (tflags,) = struct.unpack_from(">H", body, 17)
            refine = bool(tflags & 2)
            rtemplate = (tflags >> 15) & 1
            sbhuff = bool(tflags & 1)
            transposed = bool(tflags & (1 << 6))
            log_strips = (tflags >> 2) & 3
            ref_corner = (tflags >> 4) & 3
            ds_offset = (tflags >> 10) & 0x1F
            if ds_offset > 15:
                ds_offset -= 32  # 5-bit signed
            syms: list[np.ndarray] = []
            for r in hdr["refs"]:
                syms.extend(dicts.get(r, []))
            if not syms:
                raise ValueError("JBIG2 text region with no symbols")
            if sbhuff:  # extra Huffman-flags halfword before n_inst
                (hflags,) = struct.unpack_from(">H", body, 19)
                off = 21
                rat: list[tuple[int, int]] | None = None
                if refine and rtemplate == 0:  # SBRAT: 2 AT pairs
                    rat = [
                        (
                            int.from_bytes(
                                body[off + 2 * k : off + 1 + 2 * k],
                                "big", signed=True),
                            int.from_bytes(
                                body[off + 1 + 2 * k : off + 2 + 2 * k],
                                "big", signed=True),
                        )
                        for k in range(2)
                    ]
                    off += 4
                (n_inst,) = struct.unpack_from(">I", body, off)
                customs = [
                    state["tabs"][r] for r in hdr["refs"]
                    if r in state["tabs"]
                ]
                region = decode_text_region_huffman(
                    body[off + 4 :], w, h, n_inst, log_strips, ref_corner,
                    ds_offset, syms, transposed,
                    hflags & 3, (hflags >> 2) & 3, (hflags >> 4) & 3,
                    customs, refine, rtemplate, rat,
                    ((hflags >> 6) & 3, (hflags >> 8) & 3,
                     (hflags >> 10) & 3, (hflags >> 12) & 3),
                    bool(hflags & (1 << 14)),
                )
            else:
                off = 19
                rat: list[tuple[int, int]] | None = None
                if refine and rtemplate == 0:  # SBRAT: 2 AT pairs
                    rat = [
                        (
                            int.from_bytes(
                                body[off + 2 * k : off + 1 + 2 * k],
                                "big", signed=True),
                            int.from_bytes(
                                body[off + 1 + 2 * k : off + 2 + 2 * k],
                                "big", signed=True),
                        )
                        for k in range(2)
                    ]
                    off += 4
                (n_inst,) = struct.unpack_from(">I", body, off)
                region = decode_text_region(
                    body[off + 4 :], w, h, n_inst, log_strips, ref_corner,
                    ds_offset, syms, transposed, refine, rtemplate, rat,
                )
            if t == _INTERMEDIATE_TEXT:
                state["aux"][hdr["number"]] = region
                continue
            page = _grow_page(state, page, y + h)
            if x + w > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page")
            page[y : y + h, x : x + w] |= region
        elif t == _PATTERN_DICT:
            state["pats"][hdr["number"]] = decode_pattern_dict(body)
        elif t == _TABLE:
            from crawler_spark.functions.jbig2_huffman import (
                parse_table_segment,
            )

            state["tabs"][hdr["number"]] = parse_table_segment(body)
        elif t in (_IMM_HALFTONE, _IMM_LOSSLESS_HALFTONE,
                   _INTERMEDIATE_HALFTONE):
            if page is None:
                raise ValueError("JBIG2 region before page info")
            pats: list[np.ndarray] = []
            for r in hdr["refs"]:
                pats.extend(state["pats"].get(r, []))
            if not pats:
                raise ValueError("JBIG2 halftone region with no patterns")
            region, x, y, ext_op = decode_halftone_region(body, pats)
            h, w = region.shape
            if t == _INTERMEDIATE_HALFTONE:
                state["aux"][hdr["number"]] = region
                continue
            page = _grow_page(state, page, y + h)
            if x + w > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page")
            page[y : y + h, x : x + w] = _compose(
                page[y : y + h, x : x + w], region, ext_op
            )
        elif t in (_IMM_REFINE, _IMM_LOSSLESS_REFINE, _INTERMEDIATE_REFINE):
            # §7.4.7.2: the reference is the referred-to intermediate
            # region's bitmap when one is named, else the page content
            # under the region; the result lands via the external
            # combination operator (or is retained, if itself
            # intermediate).
            if page is None:
                raise ValueError("JBIG2 region before page info")
            w, h, x, y = struct.unpack_from(">IIII", body, 0)
            comb_op = body[16] & 7
            rflags = body[17]
            template = rflags & 1
            tpgron = bool(rflags & 2)
            off = 18
            rat: list[tuple[int, int]] | None = None
            if template == 0:
                rat = [
                    (
                        int.from_bytes(body[off + 2 * k : off + 1 + 2 * k],
                                       "big", signed=True),
                        int.from_bytes(body[off + 1 + 2 * k : off + 2 + 2 * k],
                                       "big", signed=True),
                    )
                    for k in range(2)
                ]
                off += 4
            aux_refs = [r for r in hdr["refs"] if r in state["aux"]]
            if [r for r in hdr["refs"] if r not in state["aux"]]:
                raise ValueError(
                    "JBIG2 refinement references an unknown segment"
                )
            if aux_refs:
                ref = state["aux"][aux_refs[0]]
                if ref.shape != (h, w):
                    raise ValueError(
                        "JBIG2 refinement reference shape mismatch"
                    )
            else:
                if y + h > page.shape[0] or x + w > page.shape[1]:
                    raise ValueError("JBIG2 region exceeds page")
                ref = page[y : y + h, x : x + w]
            mq = MQDecoder(body[off:])
            region = _refine_decode_with(
                mq, w, h, ref, 0, 0, template, rat, tpgron
            )
            if t == _INTERMEDIATE_REFINE:
                state["aux"][hdr["number"]] = region
                continue
            page = _grow_page(state, page, y + h)
            if x + w > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page")
            page[y : y + h, x : x + w] = _compose(
                page[y : y + h, x : x + w], region, comb_op
            )
        elif t in (_END_OF_PAGE, _END_OF_FILE):
            continue
        else:
            raise ValueError(f"JBIG2 segment type {t} unsupported")
    state["page"] = page


def encode_jbig2_mmr(img: np.ndarray, unknown_length: bool = False) -> bytes:
    """Fixture encoder: one page-info segment + one immediate lossless
    MMR generic region covering the page (embedded format)."""
    return _encode_jbig2(img, mmr=True, unknown_length=unknown_length)


def encode_jbig2_arith(
    img: np.ndarray, template: int = 0, tpgdon: bool = False,
    unknown_length: bool = False,
) -> bytes:
    """Fixture encoder: arithmetic (MQ, nominal ATs) immediate
    lossless generic region with the given GB template / TPGDON."""
    return _encode_jbig2(img, mmr=False, template=template, tpgdon=tpgdon,
                         unknown_length=unknown_length)


def _encode_jbig2(
    img: np.ndarray, mmr: bool, template: int = 0, tpgdon: bool = False,
    unknown_length: bool = False,
) -> bytes:
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    out = bytearray()

    def segment(num: int, seg_type: int, page: int, body: bytes,
                length: int | None = None) -> None:
        out.extend(struct.pack(">IB", num, seg_type))  # page_assoc_4=0
        out.append(0)  # zero referred-to segments (short form)
        out.append(page)
        out.extend(struct.pack(">I", len(body) if length is None else length))
        out.extend(body)

    page_info = struct.pack(">IIII", w, h, 0, 0) + b"\x01" + b"\x00\x00"
    segment(0, _PAGE_INFO, 1, page_info)
    region_info = struct.pack(">IIII", w, h, 0, 0) + b"\x00"  # OR composite
    if mmr:
        body = region_info + b"\x01" + encode_g4(img)
    else:
        gflags = (template << 1) | (8 if tpgdon else 0)
        ats = b"".join(
            struct.pack(">bb", x, y) for x, y in _GB_AT_NOMINAL[template]
        )
        body = (
            region_info
            + bytes([gflags])
            + ats
            + encode_generic_arith(img, template=template, tpgdon=tpgdon)
        )
    if unknown_length:
        # §7.2.7: declare 0xFFFFFFFF, close the payload with the
        # terminator sequence and the true row count
        term = b"\x00\x00" if mmr else b"\xff\xac"
        segment(1, _IMM_LOSSLESS_GENERIC, 1,
                body + term + struct.pack(">I", h), length=0xFFFFFFFF)
    else:
        segment(1, _IMM_LOSSLESS_GENERIC, 1, body)
    return bytes(out)


def encode_jbig2_text(
    syms: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
    transposed: bool = False,
    refinements: list | None = None,
) -> bytes:
    """Fixture: page info + arithmetic symbol dictionary + one
    immediate lossless text region placing ``(x, y, sym_idx)`` glyphs
    (TOPLEFT corners) — the embedded-format shape JBIG2 encoders emit
    for text pages. ``refinements`` (one entry per placement, None or
    ``(bitmap, rdw, rdh, rdx, rdy)``) turns on SBREFINE."""
    w, h = page_wh
    out = bytearray()

    def segment(num, seg_type, page, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for r in refs:
            out.append(r)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO, 1, struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    sd_data, sym_order = encode_symbol_dict(syms)
    ats = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GB_AT_NOMINAL[0])
    sd_body = (
        struct.pack(">H", 0)  # SDHUFF=0, REFAGG=0, template 0
        + ats
        + struct.pack(">II", len(syms), len(syms))
        + sd_data
    )
    segment(1, _SYMBOL_DICT, 1, sd_body)
    tr_data = encode_text_region(
        placements, syms, sym_order, log_strips=0, transposed=transposed,
        refinements=refinements,
    )
    tflags = (1 << 4) | (1 << 6 if transposed else 0)
    # TOPLEFT refcorner, strips=1, OR, dsoffset 0
    rat_bytes = b""
    if refinements is not None:
        tflags |= 2  # SBREFINE, SBRTEMPLATE=0 → nominal SBRAT follows
        rat_bytes = b"".join(
            struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL
        )
    tr_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"
        + struct.pack(">H", tflags)
        + rat_bytes
        + struct.pack(">I", len(placements))
        + tr_data
    )
    segment(2, _IMM_LOSSLESS_TEXT, 1, tr_body, refs=(1,))
    return bytes(out)


def encode_jbig2_text_refagg(
    base_syms: list[np.ndarray],
    refined_specs: list[tuple[np.ndarray, int, int, int]],
    placements: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
) -> bytes:
    """Fixture for the SDREFAGG=1 dictionary chain: a generic symbol
    dictionary (segment 1) feeds a refinement-aggregate dictionary
    (segment 2, ``(bitmap, ref_id, rdx, rdy)`` specs over the base
    pool) whose EXPORTED symbols a text region then places — the shape
    encoders emit when glyphs are small corrections of a shared
    prototype. ``placements`` index the refined symbols."""
    w, h = page_wh
    out = bytearray()

    def segment(num, seg_type, page, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for r in refs:
            out.append(r)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO, 1, struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    sd_data, base_order = encode_symbol_dict(base_syms)
    ats = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GB_AT_NOMINAL[0])
    sd_body = (
        struct.pack(">H", 0)
        + ats
        + struct.pack(">II", len(base_syms), len(base_syms))
        + sd_data
    )
    segment(1, _SYMBOL_DICT, 1, sd_body)
    # the refagg dict sees base symbols in DECODE order; remap ref_ids
    pool = [None] * len(base_syms)
    for orig, dec in enumerate(base_order):
        pool[dec] = base_syms[orig].astype(bool)
    specs = []
    for spec in refined_specs:
        if isinstance(spec[0], str) and spec[0] == "agg":
            _tag, ah, aw, aplace = spec
            specs.append(
                ("agg", ah, aw,
                 [(ax, ay, base_order[sid]) for ax, ay, sid in aplace])
            )
        else:
            bm, rid, rdx, rdy = spec
            specs.append((bm, base_order[rid], rdx, rdy))
    ra_data = encode_symbol_dict_refagg(specs, pool)
    rats = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL)
    ra_body = (
        struct.pack(">H", 2)  # SDHUFF=0, SDREFAGG=1, templates 0
        + ats
        + rats
        + struct.pack(">II", len(refined_specs), len(refined_specs))
        + ra_data
    )
    segment(2, _SYMBOL_DICT, 1, ra_body, refs=(1,))
    refined = [
        compose_placements(
            pool, [(x, y, base_order[sid]) for x, y, sid in s[3]], s[1], s[2]
        )
        if isinstance(s[0], str) and s[0] == "agg"
        else s[0].astype(bool)
        for s in refined_specs
    ]
    tr_data = encode_text_region(
        placements, refined, list(range(len(refined))), log_strips=0
    )
    tr_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"
        + struct.pack(">H", 1 << 4)
        + struct.pack(">I", len(placements))
        + tr_data
    )
    segment(3, _IMM_LOSSLESS_TEXT, 1, tr_body, refs=(2,))
    return bytes(out)


def encode_jbig2_halftone(
    gray: np.ndarray,
    patterns: list[np.ndarray],
    template: int = 0,
    mmr: bool = False,
    grid: tuple[int, int, int, int] | None = None,
    region_wh: tuple[int, int] | None = None,
    enableskip: bool = False,
) -> bytes:
    """Fixture: page info + pattern dictionary + one immediate
    lossless halftone region. ``gray`` is the (HGH, HGW) grid of
    pattern indices; ``patterns`` share one (ph, pw) shape. Default
    grid is axis-aligned (HRX = pw<<8, HRY = 0) so cell (mg, ng)
    lands at (ng·pw, mg·pw); pass ``grid`` = (HGX, HGY, HRX, HRY)
    with ``region_wh`` for skewed layouts, and ``enableskip`` to
    zero-and-skip cells that fall outside the region (§6.6.5.1)."""
    gray = np.asarray(gray, dtype=np.int64)
    hgh, hgw = gray.shape
    ph, pw = patterns[0].shape
    if any(p.shape != (ph, pw) for p in patterns):
        raise ValueError("patterns must share one shape")
    if grid is None:
        hgx, hgy, hrx, hry = 0, 0, pw << 8, 0
        w = hgw * pw
        h = (hgh - 1) * pw + ph
    else:
        hgx, hgy, hrx, hry = grid
        if region_wh is None:
            raise ValueError("region_wh required with an explicit grid")
        w, h = region_wh
    skip = None
    if enableskip:
        if mmr:
            raise ValueError("HENABLESKIP requires arithmetic coding")
        skip = _halftone_skip(hgw, hgh, hgx, hgy, hrx, hry, (ph, pw), w, h)
        gray = gray * (1 - skip.astype(np.int64))  # skipped cells are 0
    out = bytearray()

    def segment(num, seg_type, page, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for r in refs:
            out.append(r)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO, 1, struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    # pattern dictionary: collective bitmap, arithmetic AT1 = (-pw, 0)
    # or one MMR stream
    coll = np.hstack([p.astype(bool) for p in patterns])
    if mmr:
        pd_data = encode_g4(coll)
        pd_flags = 1
    else:
        mq = MQEncoder()
        at = [(-pw, 0), (-3, -1), (2, -2), (-2, -2)][: _GB_AT_COUNT[template]]
        _generic_encode_with(mq, coll, at, template)
        pd_data = mq.flush()
        pd_flags = template << 1
    pd_body = (
        bytes([pd_flags])
        + bytes([pw, ph])
        + struct.pack(">I", len(patterns) - 1)
        + pd_data
    )
    segment(1, _PATTERN_DICT, 1, pd_body)
    # halftone region: Gray-coded bitplanes, MSB first — one shared
    # MQ coder, or one EOFB-delimited MMR stream
    bits = max(len(patterns) - 1, 0).bit_length()
    g = gray ^ (gray >> 1)
    planes = [((g >> j) & 1).astype(bool) for j in range(bits - 1, -1, -1)]
    if not bits:
        ht_data = b""
        ht_flags = 0
    elif mmr:
        from crawler_spark.functions.ccitt import encode_g4_frames

        ht_data = encode_g4_frames(planes)
        ht_flags = 1
    else:
        mq = MQEncoder()
        gat = _GB_AT_NOMINAL[template][: _GB_AT_COUNT[template]]
        for plane in planes:
            _generic_encode_with(mq, plane, gat, template, skip=skip)
        ht_data = mq.flush()
        ht_flags = (template << 1) | (8 if enableskip else 0)
    ht_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"  # external combination OR
        + bytes([ht_flags])
        + struct.pack(">IIii", hgw, hgh, hgx, hgy)
        + struct.pack(">HH", hrx, hry)
        + ht_data
    )
    segment(2, _IMM_LOSSLESS_HALFTONE, 1, ht_body, refs=(1,))
    return bytes(out)


def encode_jbig2_striped(
    stripes: list[np.ndarray], max_stripe: int = 64
) -> bytes:
    """Fixture: an UNKNOWN-height striped page (§7.4.8.2 — height
    0xFFFFFFFF, striping flag set) built from vertically stacked
    generic-region stripes, each closed by an END_OF_STRIPE segment
    carrying its final row — the shape streaming scanners emit."""
    w = stripes[0].shape[1]
    out = bytearray()

    def segment(num, seg_type, page, body):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(0)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    page_info = (
        struct.pack(">IIII", w, 0xFFFFFFFF, 0, 0)
        + b"\x01"
        + struct.pack(">H", 0x8000 | max_stripe)
    )
    segment(0, _PAGE_INFO, 1, page_info)
    y = 0
    num = 1
    for img in stripes:
        img = np.asarray(img).astype(bool)
        h = img.shape[0]
        region_info = struct.pack(">IIII", w, h, 0, y) + b"\x00"
        gflags = 0  # arithmetic template 0
        ats = b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GB_AT_NOMINAL[0])
        body = region_info + bytes([gflags]) + ats + encode_generic_arith(img)
        segment(num, _IMM_LOSSLESS_GENERIC, 1, body)
        num += 1
        y += h
        segment(num, _END_OF_STRIPE, 1, struct.pack(">I", y - 1))
        num += 1
    segment(num, _END_OF_PAGE, 1, b"")
    return bytes(out)


def encode_jbig2_refine_page(
    base: np.ndarray,
    refined: np.ndarray,
    template: int = 0,
    tpgron: bool = False,
) -> bytes:
    """Fixture: a generic region lays down ``base``, then an immediate
    refinement region (type 41, REPLACE) recodes the same footprint as
    ``refined`` relative to the page content — lossy-then-correction,
    the two-pass shape T.88 §6.3 exists for."""
    h, w = base.shape
    assert refined.shape == (h, w)
    out = bytearray(encode_jbig2_arith(base.astype(bool), template=0))
    mq = MQEncoder()
    _refine_encode_with(
        mq, refined.astype(np.uint8), base.astype(np.uint8), 0, 0,
        template, None, tpgron,
    )
    data = mq.flush()
    rflags = template | (2 if tpgron else 0)
    rats = (
        b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL)
        if template == 0
        else b""
    )
    body = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([4])  # external combination: REPLACE
        + bytes([rflags])
        + rats
        + data
    )
    out.extend(struct.pack(">IB", 2, _IMM_LOSSLESS_REFINE))
    out.append(0)  # no refs
    out.append(1)  # page 1
    out.extend(struct.pack(">I", len(body)))
    out.extend(body)
    return bytes(out)


def encode_jbig2_intermediate_refine(
    base: np.ndarray,
    refined: np.ndarray,
    chain: bool = False,
) -> bytes:
    """Fixture: page info + an INTERMEDIATE generic region (type 36)
    holding ``base`` — retained, never composited — then an immediate
    refinement region (type 42, REPLACE) naming it as the reference
    and landing ``refined`` on the page. With ``chain`` an
    intermediate refinement region (type 40) sits between the two:
    aux results feeding aux results."""
    base = np.asarray(base).astype(bool)
    refined = np.asarray(refined).astype(bool)
    h, w = base.shape
    assert refined.shape == (h, w)
    out = bytearray()

    def segment(num, seg_type, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for r in refs:
            out.append(r)
        out.append(1)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO,
            struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    ats = b"".join(
        struct.pack(">bb", ax, ay) for ax, ay in _GB_AT_NOMINAL[0]
    )
    segment(1, _INTERMEDIATE_GENERIC,
            struct.pack(">IIII", w, h, 0, 0) + b"\x00" + b"\x00" + ats
            + encode_generic_arith(base, template=0))

    def refine_body(tgt, ref):
        mq = MQEncoder()
        _refine_encode_with(
            mq, tgt.astype(np.uint8), ref.astype(np.uint8), 0, 0, 0,
            None, False,
        )
        rats = b"".join(
            struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL
        )
        return (
            struct.pack(">IIII", w, h, 0, 0)
            + bytes([4])  # external combination: REPLACE
            + bytes([0])  # GR template 0, no TPGRON
            + rats
            + mq.flush()
        )

    if chain:
        mid = base.copy()
        mid[: h // 2] = refined[: h // 2]
        segment(2, _INTERMEDIATE_REFINE, refine_body(mid, base), refs=(1,))
        segment(3, _IMM_LOSSLESS_REFINE, refine_body(refined, mid),
                refs=(2,))
    else:
        segment(2, _IMM_LOSSLESS_REFINE, refine_body(refined, base),
                refs=(1,))
    return bytes(out)


def encode_jbig2_text_huffman(
    syms: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
    transposed: bool = False,
    custom_dt: bool = False,
    refinements: list | None = None,
    rd_sel: int = 0,
    custom_rsize: bool = False,
) -> bytes:
    """Fixture twin of :func:`encode_jbig2_text` for the SDHUFF=1 /
    SBHUFF=1 form: height-class collective bitmaps ride MMR (T.6),
    parameters ride the Annex-B standard tables (selections 0), symbol
    ids ride the §7.4.3.1.7 runcode scheme with equal code lengths.
    ``custom_dt`` routes the strip deltas through a CUSTOM table
    segment (§7.4.13, selection 3) instead of B.11. ``refinements``
    (one entry per placement, None or ``(bitmap, rdw, rdh, rdx,
    rdy)``) turns on SBREFINE — per §6.4.11 each refined instance
    writes an RI bit, RDW/RDH/RDX/RDY through B.14 (``rd_sel`` 0) or
    B.15 (1), BMSIZE through B.1, then the byte-aligned MQ blob."""
    from crawler_spark.functions.jbig2_huffman import (
        OOB as HOOB,
        BitWriter,
        STANDARD_TABLES,
        encode_symbol_id_lengths,
        make_table_segment,
        parse_table_segment,
        symbol_id_table,
    )

    w, h = page_wh
    dh_t, dw_t, bm_t, ex_t = (STANDARD_TABLES[k] for k in (4, 2, 1, 1))
    fs_t, ds_t = (STANDARD_TABLES[k] for k in (6, 8))
    table_seg: bytes | None = None
    if custom_dt:
        # domain [1, 9) + 32-bit upper: a complete prefix code unlike
        # any standard table, so a selection-plumbing bug can't pass
        table_seg = make_table_segment(
            [(2, 0), (2, 1), (2, 2), (3, 0)], 1, 9, 0, 3
        )
        dt_t = parse_table_segment(table_seg)
    else:
        dt_t = STANDARD_TABLES[11]
    # symbol dictionary: classes by height, widths ascending within a
    # class so the B.2 DW deltas stay non-negative
    order = sorted(range(len(syms)), key=lambda k: syms[k].shape)
    sym_order = [order.index(i) for i in range(len(syms))]
    bw = BitWriter()
    hcheight = 0
    k = 0
    while k < len(order):
        ch = syms[order[k]].shape[0]
        dh_t.encode(bw, ch - hcheight)
        hcheight = ch
        symwidth = 0
        cls: list[np.ndarray] = []
        while k < len(order) and syms[order[k]].shape[0] == ch:
            ww = syms[order[k]].shape[1]
            dw_t.encode(bw, ww - symwidth)
            symwidth = ww
            cls.append(syms[order[k]].astype(bool))
            k += 1
        dw_t.encode(bw, HOOB)
        payload = encode_g4(np.hstack(cls))
        bm_t.encode(bw, len(payload))
        bw.put_bytes(payload)
    ex_t.encode(bw, 0)
    ex_t.encode(bw, len(syms))
    sd_body = (
        struct.pack(">H", 1)  # SDHUFF=1, selections 0 (B.4/B.2/B.1)
        + struct.pack(">II", len(syms), len(syms))
        + bw.flush()
    )
    # text region
    code_len = max(1, (len(syms) - 1).bit_length())
    refine = refinements is not None
    rd_t = STANDARD_TABLES[14 if rd_sel == 0 else 15]
    rsize_seg: bytes | None = None
    if custom_rsize:
        # complete code: [0, 64) on a 1-bit prefix + 1-bit upper line
        rsize_seg = make_table_segment([(1, 6)], 0, 64, 0, 1)
        rs_t = parse_table_segment(rsize_seg)
    else:
        rs_t = STANDARD_TABLES[1]
    tw = BitWriter()
    encode_symbol_id_lengths(tw, [code_len] * len(syms))
    tw.byte_align()
    sym_t = symbol_id_table([code_len] * len(syms))
    strips = 1
    by_strip: dict[int, list[tuple[int, int, int, object]]] = {}
    for i, (x, y, si) in enumerate(placements):
        ref = refinements[i] if refine else None
        if transposed:
            x, y = y, x
        by_strip.setdefault(y, []).append((x, y, si, ref))
    dt_t.encode(tw, 1)  # STRIPT starts at -1 strip (B.11 floor is 1)
    stript = -strips
    firsts = 0
    for st in sorted(by_strip):
        dt_t.encode(tw, (st - stript) // strips)
        stript = st
        first = True
        curs = 0
        for x, _y, si, ref in sorted(
            by_strip[st], key=lambda p: (p[0], p[2])
        ):
            if first:
                fs_t.encode(tw, x - firsts)
                firsts = x
                curs = x
                first = False
            else:
                ds_t.encode(tw, x - curs)
                curs = x
            sym_t.encode(tw, sym_order[si])
            inst = syms[si]
            if refine:
                if ref is None:
                    tw.write_bit(0)
                else:
                    bitmap, rdw, rdh, rdx, rdy = ref
                    inst = np.asarray(bitmap).astype(bool)
                    assert inst.shape == (
                        syms[si].shape[0] + rdh, syms[si].shape[1] + rdw
                    )
                    tw.write_bit(1)
                    for v in (rdw, rdh, rdx, rdy):
                        rd_t.encode(tw, v)
                    mq = MQEncoder()
                    _refine_encode_with(
                        mq, inst.astype(np.uint8),
                        syms[si].astype(np.uint8),
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy, 0, None, False,
                    )
                    blob = mq.flush()
                    rs_t.encode(tw, len(blob))
                    tw.put_bytes(blob)
            curs += inst.shape[0 if transposed else 1] - 1
        ds_t.encode(tw, HOOB)
    tflags = (
        1 | (1 << 4) | ((1 << 6) if transposed else 0)
        | ((1 << 1) if refine else 0)
    )
    hflags = (3 << 4) if custom_dt else 0  # DT selection 3 = custom
    if refine:
        hflags |= (rd_sel << 6) | (rd_sel << 8) | (rd_sel << 10) | (rd_sel << 12)
    if custom_rsize:
        hflags |= 1 << 14
    sbrat = (
        b"".join(struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL)
        if refine else b""
    )
    tr_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"
        + struct.pack(">H", tflags)
        + struct.pack(">H", hflags)
        + sbrat
        + struct.pack(">I", len(placements))
        + tw.flush()
    )
    out = bytearray()

    def segment(num, seg_type, page, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for rnum in refs:
            out.append(rnum)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO, 1, struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    segment(1, _SYMBOL_DICT, 1, sd_body)
    # table segments in consumption order: DT before RSIZE (§7.4.3.1.6)
    refs = [1]
    num = 2
    for seg in (table_seg, rsize_seg):
        if seg is not None:
            segment(num, _TABLE, 1, seg)
            refs.append(num)
            num += 1
    segment(num, _IMM_LOSSLESS_TEXT, 1, tr_body, refs=tuple(refs))
    return bytes(out)


def encode_jbig2_huffman_refagg_page(
    base_syms: list[np.ndarray],
    derived: list[tuple[np.ndarray, int, int, int]],
    placements: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
) -> bytes:
    """Fixture: a plain SDHUFF dictionary exports ``base_syms``; a
    second SDHUFF+REFAGG dictionary (§6.5.8.2.2) derives each
    ``(bitmap, ref_id, rdx, rdy)`` entry as an individual Huffman-
    framed refinement of a base glyph (raw-bit symbol ID, RDX/RDY via
    B.15, BMSIZE via B.1, byte-aligned MQ blob) — or, for the
    aggregate form ``("agg", h, w, placements)`` with ``placements =
    [(x, y, base_id)]``, as an inline SBHUFF TEXT REGION of those
    instances (REFAGGNINST > 1, §6.5.8.2.1: raw ids, Table-16 fixed
    tables, RI bits 0); an SBHUFF text region places the derived
    glyphs."""
    from crawler_spark.functions.jbig2_huffman import (
        OOB as HOOB,
        BitWriter,
        STANDARD_TABLES,
        encode_symbol_id_lengths,
        symbol_id_table,
    )

    w, h = page_wh
    dh_t, dw_t, bm_t, ex_t = (STANDARD_TABLES[k] for k in (4, 2, 1, 1))
    fs_t, ds_t, dt_t = (STANDARD_TABLES[k] for k in (6, 8, 11))
    rd_t = STANDARD_TABLES[15]

    def plain_dict(syms):
        order = sorted(range(len(syms)), key=lambda k: syms[k].shape)
        bw = BitWriter()
        hcheight = 0
        k = 0
        while k < len(order):
            ch = syms[order[k]].shape[0]
            dh_t.encode(bw, ch - hcheight)
            hcheight = ch
            symwidth = 0
            cls = []
            while k < len(order) and syms[order[k]].shape[0] == ch:
                ww = syms[order[k]].shape[1]
                dw_t.encode(bw, ww - symwidth)
                symwidth = ww
                cls.append(syms[order[k]].astype(bool))
                k += 1
            dw_t.encode(bw, HOOB)
            payload = encode_g4(np.hstack(cls))
            bm_t.encode(bw, len(payload))
            bw.put_bytes(payload)
        ex_t.encode(bw, 0)
        ex_t.encode(bw, len(syms))
        return (
            struct.pack(">H", 1)
            + struct.pack(">II", len(syms), len(syms))
            + bw.flush()
        ), order

    sd1, base_order = plain_dict(base_syms)
    base_sorted = [base_syms[i] for i in sorted(
        range(len(base_syms)), key=lambda k: base_syms[k].shape
    )]
    # exported pool order of dict 1 is its sorted decode order
    base_pos = {i: base_order.index(i) for i in range(len(base_syms))}

    n_new = len(derived)
    code_len = max(1, (len(base_syms) + n_new - 1).bit_length())
    # normalize: every derived entry's bitmap, plus how to code it
    norm: list[tuple[np.ndarray, tuple]] = []
    for spec in derived:
        if isinstance(spec[0], str) and spec[0] == "agg":
            _tag, hh, ww, placs = spec
            mapped = [(x, y, base_pos[pid]) for x, y, pid in placs]
            bm = compose_placements(base_sorted, mapped, hh, ww)
            norm.append((np.asarray(bm).astype(bool), ("agg", mapped)))
        else:
            bitmap, ref_id, rdx, rdy = spec
            norm.append((
                np.asarray(bitmap).astype(bool), ("ref", ref_id, rdx, rdy)
            ))
    order2 = sorted(range(n_new), key=lambda k: norm[k][0].shape)
    bw = BitWriter()
    hcheight = 0
    k = 0
    while k < len(order2):
        ch = norm[order2[k]][0].shape[0]
        dh_t.encode(bw, ch - hcheight)
        hcheight = ch
        symwidth = 0
        while k < len(order2) and norm[order2[k]][0].shape[0] == ch:
            bitmap, info = norm[order2[k]]
            dw_t.encode(bw, bitmap.shape[1] - symwidth)
            symwidth = bitmap.shape[1]
            if info[0] == "agg":
                mapped = info[1]
                ex_t.encode(bw, len(mapped))  # REFAGGNINST > 1
                by_row: dict[int, list[tuple[int, int]]] = {}
                for x, y, pid in mapped:
                    by_row.setdefault(y, []).append((x, pid))
                dt_t.encode(bw, 1)
                stript = -1
                firsts = 0
                for st in sorted(by_row):
                    dt_t.encode(bw, st - stript)
                    stript = st
                    first = True
                    curs = 0
                    for x, pid in sorted(by_row[st]):
                        if first:
                            fs_t.encode(bw, x - firsts)
                            firsts = x
                            curs = x
                            first = False
                        else:
                            ds_t.encode(bw, x - curs)
                            curs = x
                        bw.write_bits(pid, code_len)
                        bw.write_bit(0)  # RI: instance unrefined
                        curs += base_sorted[pid].shape[1] - 1
                    ds_t.encode(bw, HOOB)
            else:
                _tag, ref_id, rdx, rdy = info
                ex_t.encode(bw, 1)  # REFAGGNINST
                bw.write_bits(base_pos[ref_id], code_len)
                rd_t.encode(bw, rdx)
                rd_t.encode(bw, rdy)
                mq = MQEncoder()
                _refine_encode_with(
                    mq, bitmap.astype(np.uint8),
                    base_sorted[base_pos[ref_id]].astype(np.uint8),
                    rdx, rdy, 0, None, False,
                )
                blob = mq.flush()
                ex_t.encode(bw, len(blob))
                bw.put_bytes(blob)
            k += 1
        dw_t.encode(bw, HOOB)
    ex_t.encode(bw, len(base_syms))  # inputs: not exported
    ex_t.encode(bw, n_new)           # new symbols: exported
    sdrat = b"".join(
        struct.pack(">bb", ax, ay) for ax, ay in _GR_AT_NOMINAL
    )
    sd2 = (
        struct.pack(">H", 3)  # SDHUFF=1, REFAGG=1, SDRTEMPLATE=0
        + sdrat
        + struct.pack(">II", n_new, n_new)
        + bw.flush()
    )

    # text region over dict 2's exports
    tw = BitWriter()
    tcode_len = max(1, (n_new - 1).bit_length())
    encode_symbol_id_lengths(tw, [tcode_len] * n_new)
    tw.byte_align()
    sym_t = symbol_id_table([tcode_len] * n_new)
    by_strip: dict[int, list[tuple[int, int]]] = {}
    for x, y, si in placements:
        by_strip.setdefault(y, []).append((x, si))
    dt_t.encode(tw, 1)
    stript = -1
    firsts = 0
    for st in sorted(by_strip):
        dt_t.encode(tw, st - stript)
        stript = st
        first = True
        curs = 0
        for x, si in sorted(by_strip[st]):
            if first:
                fs_t.encode(tw, x - firsts)
                firsts = x
                curs = x
                first = False
            else:
                ds_t.encode(tw, x - curs)
                curs = x
            sym_t.encode(tw, order2.index(si))
            curs += norm[si][0].shape[1] - 1
        ds_t.encode(tw, HOOB)
    tr_body = (
        struct.pack(">IIII", w, h, 0, 0)
        + b"\x00"
        + struct.pack(">H", 1 | (1 << 4))  # SBHUFF, TOPLEFT
        + struct.pack(">H", 0)
        + struct.pack(">I", len(placements))
        + tw.flush()
    )
    out = bytearray()

    def segment(num, seg_type, page, body, refs=()):
        out.extend(struct.pack(">IB", num, seg_type))
        out.append(len(refs) << 5)
        for rnum in refs:
            out.append(rnum)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
        out.extend(body)

    segment(0, _PAGE_INFO, 1,
            struct.pack(">IIII", w, h, 0, 0) + b"\x01\x00\x00")
    segment(1, _SYMBOL_DICT, 1, sd1)
    segment(2, _SYMBOL_DICT, 1, sd2, refs=(1,))
    segment(3, _IMM_LOSSLESS_TEXT, 1, tr_body, refs=(2,))
    return bytes(out)


def encode_jbig2_text_globals(
    syms: list[np.ndarray],
    placements: list[tuple[int, int, int]],
    page_wh: tuple[int, int],
) -> tuple[bytes, bytes]:
    """Fixture twin of :func:`encode_jbig2_text` in the /JBIG2Globals
    split PDF producers emit for multi-page scans: (globals stream
    holding the shared symbol dictionary, page stream holding page
    info + the text region referring back to it). Globals segments use
    page association 0 per T.88 §7.2.6."""
    full = encode_jbig2_text(syms, placements, page_wh)
    # reuse the single-stream encoder, then split its three segments
    segs = []
    pos = 0
    while pos < len(full):
        hdr, dstart = _parse_segment_header(full, pos)
        segs.append((hdr, full[pos : dstart + hdr["length"]]))
        pos = dstart + hdr["length"]
    dict_seg = next(raw for h, raw in segs if h["type"] == _SYMBOL_DICT)
    # globals segments carry page association 0: patch the page byte
    # (short form: u32 num, flags, 1-byte ref count+retain, refs, page)
    g = bytearray(dict_seg)
    n_refs = g[5] >> 5
    g[6 + n_refs] = 0
    page_stream = b"".join(
        raw for h, raw in segs if h["type"] != _SYMBOL_DICT
    )
    return bytes(g), page_stream
