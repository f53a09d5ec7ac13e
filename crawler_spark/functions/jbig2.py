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

Out of scope — raises ValueError (the PDF image extractor quarantines
the row as ok=False, never garbage pixels): symbol dictionaries /
text regions, refinement, halftone, striped pages, /JBIG2Globals
streams. These are documented residue; the generic-region paths cover
full-page scanned images end to end.

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
    offs = _gb_offsets(template, at_pairs)
    mq = MQDecoder(data)
    bm = np.zeros((h, w), dtype=np.uint8)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(_GB_TPGD_CX[template])
            if ltp:  # typical row: copy the previous row
                if y:
                    bm[y] = bm[y - 1]
                continue
        for x in range(w):
            cx = 0
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                bit = (
                    int(bm[yy, xx])
                    if 0 <= yy < h and 0 <= xx < w
                    else 0
                )
                cx = (cx << 1) | bit
            bm[y, x] = mq.decode(cx)
    return bm.astype(bool)


def encode_generic_arith(
    img: np.ndarray,
    at_pairs: list[tuple[int, int]] | None = None,
    template: int = 0,
    tpgdon: bool = False,
) -> bytes:
    """Encoder twin of :func:`decode_generic_arith` (fixtures)."""
    at_pairs = at_pairs or _GB_AT_NOMINAL[template]
    offs = _gb_offsets(template, at_pairs)
    img = np.asarray(img).astype(np.uint8)
    h, w = img.shape
    mq = MQEncoder()
    ltp = 0
    for y in range(h):
        if tpgdon:
            typical = 1 if y and np.array_equal(img[y], img[y - 1]) else 0
            mq.encode(ltp ^ typical, _GB_TPGD_CX[template])
            ltp = typical
            if typical:
                continue
        for x in range(w):
            cx = 0
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                bit = int(img[yy, xx]) if 0 <= yy < h and 0 <= xx < w else 0
                cx = (cx << 1) | bit
            mq.encode(int(img[y, x]), cx)
    return mq.flush()

# segment types (T.88 §7.3)
_PAGE_INFO = 48
_IMM_GENERIC = 38
_IMM_LOSSLESS_GENERIC = 39
_END_OF_PAGE = 49
_END_OF_FILE = 51


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    """One embedded-format segment header → (header dict, data start)."""
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
    — black wins). Raises on any segment kind outside the subset."""
    if globals_data:
        raise ValueError("JBIG2Globals (symbol dictionaries) unsupported")
    pos = 0
    page_w = page_h = None
    page: np.ndarray | None = None
    while pos < len(data):
        hdr, pos = _parse_segment_header(data, pos)
        body = data[pos : pos + hdr["length"]]
        if hdr["length"] == 0xFFFFFFFF:
            raise ValueError("JBIG2 unknown-length segment unsupported")
        pos += hdr["length"]
        t = hdr["type"]
        if t == _PAGE_INFO:
            page_w, page_h = struct.unpack_from(">II", body, 0)
            if page_h == 0xFFFFFFFF:
                raise ValueError("JBIG2 striped unknown-height page unsupported")
            page = np.zeros((page_h, page_w), dtype=bool)
        elif t in (_IMM_GENERIC, _IMM_LOSSLESS_GENERIC):
            if page is None:
                raise ValueError("JBIG2 region before page info")
            w, h, x, y = struct.unpack_from(">IIII", body, 0)
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
            if y + h > page.shape[0] or x + w > page.shape[1]:
                raise ValueError("JBIG2 region exceeds page")
            page[y : y + h, x : x + w] |= region
        elif t in (_END_OF_PAGE, _END_OF_FILE):
            continue
        else:
            raise ValueError(f"JBIG2 segment type {t} unsupported")
    if page is None:
        raise ValueError("JBIG2: no page info segment")
    return np.where(page, 0, 255).astype(np.uint8)


def encode_jbig2_mmr(img: np.ndarray) -> bytes:
    """Fixture encoder: one page-info segment + one immediate lossless
    MMR generic region covering the page (embedded format)."""
    return _encode_jbig2(img, mmr=True)


def encode_jbig2_arith(
    img: np.ndarray, template: int = 0, tpgdon: bool = False
) -> bytes:
    """Fixture encoder: arithmetic (MQ, nominal ATs) immediate
    lossless generic region with the given GB template / TPGDON."""
    return _encode_jbig2(img, mmr=False, template=template, tpgdon=tpgdon)


def _encode_jbig2(
    img: np.ndarray, mmr: bool, template: int = 0, tpgdon: bool = False
) -> bytes:
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    out = bytearray()

    def segment(num: int, seg_type: int, page: int, body: bytes) -> None:
        out.extend(struct.pack(">IB", num, seg_type))  # page_assoc_4=0
        out.append(0)  # zero referred-to segments (short form)
        out.append(page)
        out.extend(struct.pack(">I", len(body)))
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
    segment(1, _IMM_LOSSLESS_GENERIC, 1, body)
    return bytes(out)
