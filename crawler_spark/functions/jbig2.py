"""JBIG2 (ITU-T T.88) — the MMR generic-region subset.

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

Out of scope — raises ValueError (the PDF image extractor quarantines
the row as ok=False, never garbage pixels): arithmetic-coded generic
regions (MQ coder), symbol dictionaries / text regions, refinement,
halftone, /JBIG2Globals streams. These are documented residue; the
MMR path covers MMR-emitting scanners end to end.

JBIG2 bit sense: 1 = black (T.88 §4), i.e. the same sense as the G4
decoder's output convention here (0=black pixels after mapping).
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_spark.functions.ccitt import decode_g4, encode_g4

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

    Supports page-info + MMR immediate generic regions composited onto
    the page (OR combination — black wins). Raises on any segment kind
    outside the subset."""
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
            if not gflags & 1:
                raise ValueError("JBIG2 arithmetic generic region unsupported")
            if gflags & 8:
                raise ValueError("JBIG2 TPGDON with MMR is invalid")
            region = decode_g4(body[18:], columns=w, rows=h) == 0  # True=black
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
    gflags = b"\x01"  # MMR=1, template 0, no TPGDON
    body = region_info + gflags + encode_g4(img)
    segment(1, _IMM_LOSSLESS_GENERIC, 1, body)
    return bytes(out)
