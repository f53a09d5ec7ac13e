"""JFIF JPEG codec — pure numpy + stdlib, no codec libs.

Implements ITU-T T.81 Huffman DCT coding in the shapes that dominate
the real web corpus this crawler targets:

- baseline sequential (SOF0) with the Annex-K quantization + Huffman
  tables, byte stuffing, restart intervals, and a JFIF APP0 header;
- chroma subsampling 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 (arbitrary
  integer-ratio sampling factors on decode — the MCU interleave of
  A.2.3), with box-filter downsampling on encode and sample
  replication on upsample;
- single-component grayscale;
- progressive (SOF2): DC/AC first scans with spectral selection +
  successive approximation, EOB-run coding, and the G.1.2.3 AC
  refinement scans, on both encode and decode;
- Adobe APP14 color spaces: 4-component CMYK (transform 0) and YCCK
  (transform 2) with the inverted-ink storage convention, and
  3-component RGB (transform 0) — the print-world shapes that show up
  inside PDF DCTDecode streams.

The encoder is a *real* JPEG writer (any external decoder can read the
output); the decoder reads quantization and Huffman tables from the
file rather than assuming this encoder produced it.

Why it exists: the reference crawl drops images entirely
(``src/lib/md/mdUtils.ts:23-44``); the graft's input_hint keeps
image+caption pairs with a per-row "decoded-pixel allclose (PSNR >= 40
dB for lossy formats)" invariant. The env has no PIL/libjpeg, so the
lossy leg of that invariant is exercised here from the public spec.
The reference's pdfjs path decodes arbitrary real-world JPEGs inside
PDFs — progressive and 4:2:0 streams are the two most common shapes —
so ``extract_pdf_images``'s DCTDecode route needs them too.

Scope (documented residue): no arithmetic coding (SOF9/SOF10 —
patent-historic, ~absent from the web; its 113-state QM table can't
be conformance-pinned offline, so a from-memory transcription would
claim interop it can't prove); no hierarchical (SOF5-7/13-15); no
fractional sampling ratios (hmax % h != 0). 12-bit precision decodes
(SOF1/SOF2, Pq=1 16-bit DQT) with an encoder twin whose Huffman
tables are module-generated via the Annex-K.2 optimization (the
spec's own tables have zero Kraft slack for the larger magnitude
categories). Everything outside the envelope quarantines as typed
decode failures, never silent garbage.

Design notes for the Spark path: encode/decode run inside Arrow-batched
pandas UDFs (``functions/images.py``); the per-image work is
numpy-vectorized DCT/IDCT over all 8x8 blocks at once (einsum), with
the entropy coder the only per-symbol Python loop. Decode uses a
16-bit prefix lookup table per Huffman table (one array index per
symbol instead of bit-by-bit tree walks).

Key cross-check (tests/test_jpeg.py): a progressive encode carries the
exact same quantized coefficients as a baseline encode of the same
input, so ``decode(encode(arr, progressive=True))`` must equal
``decode(encode(arr))`` bit-for-bit — any drift in the successive-
approximation logic breaks exact equality, not a PSNR threshold.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- tables
# Annex K.1 quantization tables (raster order).
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Zigzag scan: raster index of the k-th zigzag position (generated, not
# transcribed — diagonal s=r+c, even diagonals walk row-descending).
_ZZ = np.array(
    [
        r * 8 + (s - r)
        for s in range(15)
        for r in (range(min(s, 7), max(s - 8, -1), -1) if s % 2 == 0
                  else range(max(s - 7, 0), min(s, 7) + 1))
    ],
    dtype=np.int64,
)
assert len(_ZZ) == 64 and len(set(_ZZ.tolist())) == 64
_UNZZ = np.argsort(_ZZ)  # zigzag position of each raster index

# Annex K.3 typical Huffman tables: (bits[16], values). The decoder
# never assumes these — it reads DHT from the stream — so they only
# determine the encoder's code lengths.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_LUMA_BITS) == len(_AC_LUMA_VALS) == 162
assert sum(_AC_CHROMA_BITS) == len(_AC_CHROMA_VALS) == 162

# Progressive AC scans emit EOBn symbols (RS = n<<4, 0<n<15) that the
# Annex-K sequential tables don't define (they are complete codes with
# no spare space), so the progressive encoder uses a flat
# near-fixed-length AC table covering all 256 RS byte values: 254
# nine-bit codes + 4 ten-bit codes (Kraft sum exactly 1/2; canonical
# assignment never produces an all-ones code word). The decoder still
# reads whatever DHT the file carries.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = list(range(256))
assert sum(_PROG_AC_BITS) == len(_PROG_AC_VALS)

# Orthonormal 8-point DCT-II matrix: D @ B @ D.T is exactly T.81's FDCT
# (c(0)=1/(2*sqrt(2)), c(u)=1/2 reproduce the 1/4*C(u)*C(v) scaling).
_D8 = np.array(
    [
        [
            (np.sqrt(1 / 8) if i == 0 else np.sqrt(2 / 8))
            * np.cos((2 * j + 1) * i * np.pi / 16)
            for j in range(8)
        ]
        for i in range(8)
    ]
)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _scale_qtab(tab: np.ndarray, quality: int, precision: int = 8) -> np.ndarray:
    """IJG quality scaling: 50 = Annex-K as-is, 100 = all-ones.

    For 12-bit precision the Annex-K base is scaled by 16 (the sample
    range grew 16x) so the relative quantization — and therefore the
    PSNR-vs-quality behavior — matches the 8-bit path; entries above
    255 force a 16-bit (Pq=1) DQT segment.
    """
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    if precision == 12:
        tab = tab * 16
    cap = 255 if precision == 8 else 65535
    return np.clip((tab * scale + 50) // 100, 1, cap).astype(np.int64)


def _make_huff(weights: dict[int, int]) -> tuple[list[int], list[int]]:
    """Generate a JPEG-legal Huffman table from symbol weights.

    The Annex K.2 optimization procedure (Figures K.1-K.4, the same
    shape as IJG's ``jpeg_gen_optimal_table``): pairwise merge of the
    two least-weight chains (ties broken toward the larger symbol),
    a reserved 257th pseudo-symbol that guarantees no real symbol is
    assigned the all-ones code, the Figure-K.3 redistribution that
    limits code lengths to 16 bits, and Figure-K.4 value ordering
    (by code size, then symbol). Needed because the Annex-K AC tables
    have zero Kraft slack — they cannot be extended with the size-11+
    magnitude categories 12-bit precision requires.
    """
    freq = [0] * 257
    for s, wgt in weights.items():
        if wgt > 0:
            freq[s] = int(wgt)
    freq[256] = 1  # reserved pseudo-symbol
    others = [-1] * 257
    codesize = [0] * 257
    while True:
        nz = [(f, i) for i, f in enumerate(freq) if f > 0]
        if len(nz) < 2:
            break
        c1 = min(f for f, _ in nz)
        v1 = max(i for f, i in nz if f == c1)
        c2 = min(f for f, i in nz if i != v1)
        v2 = max(i for f, i in nz if f == c2 and i != v1)
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:  # Figure K.3: push over-long codes up the tree
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    j = 16
    while bits[j] == 0:  # drop the reserved symbol's (longest) code
        j -= 1
    bits[j] -= 1
    vals = [
        i for sz in range(1, 33) for i in range(256) if codesize[i] == sz
    ]
    return bits[1:17], vals


# Static tables for 12-bit precision: magnitude categories reach 15
# (DC diffs to +-32760) / size 15 ACs, which the Annex-K tables cannot
# express. Weights are a geometric prior over (run, size) — lossless
# coding, so only stream size depends on how good the prior is.
_DC12_BITS, _DC12_VALS = _make_huff({s: 1 << (16 - s) for s in range(16)})
_AC12_BITS, _AC12_VALS = _make_huff(
    {0x00: 1 << 18, 0xF0: 1 << 10}
    # EOBn run-length symbols (r<<4, progressive G.1.2.2) included so
    # one table serves both the sequential and progressive scan scripts
    | {r << 4: 1 << max(0, 14 - r) for r in range(1, 15)}
    | {
        (r << 4) | s: 1 << max(0, 18 - 2 * s - r)
        for r in range(16)
        for s in range(1, 16)
    }
)


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 C.2): symbol -> (code, len)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_lut(bits: list[int], values: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit prefix lookup: peek 16 bits -> (symbol, code length).

    One array index replaces a bit-by-bit tree walk; entries not covered
    by any code keep length 0 (invalid prefix -> decode error).
    """
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    for s, (code, length) in _build_codes(bits, values).items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        sym[lo:hi] = s
        ln[lo:hi] = length
    return sym, ln


# ----------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC diff / AC coefficient (F.1.2.1)."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(
    bw: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(zz[0])
    s, extra = _mag_bits(dc - pred)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(extra, s)
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    run = 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s, extra = _mag_bits(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(extra, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _rgb_to_ycc(
    img: np.ndarray, mid: float = 128.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y - mid, cb, cr  # level-shifted; chroma already zero-centred


_SAMPLING = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "440": ((1, 2), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def _rgb_to_stored_cmyk(img: np.ndarray) -> list[np.ndarray]:
    """RGB -> Adobe-stored CMYK planes (float, unshifted 0..255).

    GCR ink split K = 255 - max(r,g,b), C = 255 - r - K (all exact in
    integers), then the Adobe APP14 convention stores INVERTED ink
    (stored = 255 - ink), which collapses to stored_C = r + K_ink and
    stored_K = 255 - K_ink — so decode recovers r = stored_C +
    stored_K - 255 exactly.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    k_ink = 255.0 - np.maximum(np.maximum(r, g), b)
    return [r + k_ink, g + k_ink, b + k_ink, 255.0 - k_ink]


def _emit_eobrun(
    bw: _BitWriter, ac: dict[int, tuple[int, int]], eobrun: int, bits: list[int]
) -> None:
    """Flush a pending EOB run (G.1.2.2) + its buffered correction bits."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        code, ln = ac[nb << 4]
        bw.write(code, ln)
        if nb:
            bw.write(eobrun & ((1 << nb) - 1), nb)
        for b in bits:
            bw.write(b, 1)


def _encode_ac_first(
    bw: _BitWriter,
    ac: dict[int, tuple[int, int]],
    blocks: list[np.ndarray],
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC first scan (G.1.2.2): spectral band, point transform, EOB runs."""
    eobrun = 0
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        # AC point transform truncates toward zero (T.81 §G.1.2.1)
        t = [(v >> al) if v >= 0 else -((-v) >> al) for v in band]
        nz = [i for i, v in enumerate(t) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(bw, ac, eobrun, [])
                eobrun = 0
            continue
        _emit_eobrun(bw, ac, eobrun, [])
        eobrun = 0
        run = 0
        last = nz[-1]
        for i in range(last + 1):
            v = t[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]
                bw.write(code, ln)
                run -= 16
            s, extra = _mag_bits(v)
            code, ln = ac[(run << 4) | s]
            bw.write(code, ln)
            bw.write(extra, s)
            run = 0
        if last < se - ss:
            eobrun += 1
    _emit_eobrun(bw, ac, eobrun, [])


def _encode_ac_refine(
    bw: _BitWriter,
    ac: dict[int, tuple[int, int]],
    blocks: list[np.ndarray],
    ss: int,
    se: int,
    al: int,
) -> None:
    """AC refinement scan (G.1.2.3).

    Correction bits for already-nonzero coefficients are buffered and
    emitted immediately after the Huffman code + sign/EOB bits of the
    run they fall inside — the exact order the decoder's band walk
    consumes them in.
    """
    eobrun = 0
    eob_bits: list[int] = []
    for zz in blocks:
        band = [int(v) for v in zz[ss : se + 1]]
        mag = [abs(v) >> al for v in band]
        newly = [i for i, m in enumerate(mag) if m == 1]
        eob_idx = newly[-1] + 1 if newly else 0
        run = 0
        br: list[int] = []  # correction bits pending inside the current run
        for i, m in enumerate(mag):
            if m == 0:
                run += 1
                continue
            # fold trailing ZRLs into the EOB run when no newly-nonzero
            # coefficient remains ahead (G.1.2.3)
            while run > 15 and i < eob_idx:
                _emit_eobrun(bw, ac, eobrun, eob_bits)
                eobrun, eob_bits = 0, []
                code, ln = ac[0xF0]
                bw.write(code, ln)
                run -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if m > 1:  # previously nonzero: one correction bit
                br.append(m & 1)
                continue
            # newly nonzero at this precision: terminate the run
            _emit_eobrun(bw, ac, eobrun, eob_bits)
            eobrun, eob_bits = 0, []
            code, ln = ac[(run << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if band[i] > 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            eob_bits.extend(br)
            if eobrun == 0x7FFF:
                _emit_eobrun(bw, ac, eobrun, eob_bits)
                eobrun, eob_bits = 0, []
    _emit_eobrun(bw, ac, eobrun, eob_bits)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 98,
    restart_interval: int = 0,
    subsampling: str = "444",
    progressive: bool = False,
    colorspace: str = "auto",
    precision: int = 8,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w[, 1]) grayscale uint8 array.

    ``precision=12`` encodes a 0..4095 integer array as an extended
    sequential (SOF1) or progressive stream with 16-bit (Pq=1) DQT
    segments and module-generated Huffman tables (the Annex-K tables
    cannot express the larger magnitude categories); YCbCr/grayscale
    only — 12-bit Adobe ink spaces don't occur in practice.

    Default quality 98 keeps PSNR >= 40 dB even on uniform-noise images
    (the worst case for transform coding — see tests) at 4:4:4;
    subsampled modes trade chroma detail for size the way every web
    encoder does. ``restart_interval`` > 0 emits a DRI segment and RSTn
    markers every that-many MCUs (byte-aligned, DC predictors reset —
    T.81 §F.1.2.3 / E.1.4). ``progressive=True`` writes SOF2 with a
    spectral-selection + successive-approximation scan script (DC Al=1
    then DC refine; per-component AC first at Al=1 then AC refine) —
    the same quantized coefficients as the sequential path, so decode
    output is bit-identical to the baseline encoding's.

    ``colorspace`` picks the stored representation of an RGB input:
    ``"auto"``/``"ycc"`` = JFIF YCbCr (the web default); ``"rgb"`` =
    Adobe APP14 transform 0, planes stored as-is (color-lossless);
    ``"cmyk"`` / ``"ycck"`` = 4-component Adobe APP14 transform 0 / 2
    with the GCR ink split of :func:`_rgb_to_stored_cmyk`, which makes
    the ink round-trip exact in integers. Non-YCbCr spaces are stored
    4:4:4 (Adobe print files don't subsample ink planes).
    """
    if colorspace not in ("auto", "ycc", "rgb", "cmyk", "ycck"):
        raise ValueError(f"unknown colorspace {colorspace!r}")
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        if colorspace not in ("auto", "ycc"):
            raise ValueError("12-bit precision supports YCbCr/grayscale only")
        if not np.issubdtype(arr.dtype, np.integer) or arr.max(initial=0) > 4095:
            raise ValueError("12-bit input must be an integer array in 0..4095")
    if arr.ndim == 2 or (arr.ndim == 3 and arr.shape[2] == 1):
        arr = arr.reshape(arr.shape[0], arr.shape[1])
        ncomp = 1
        samp: tuple[tuple[int, int], ...] = ((1, 1),)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        if colorspace in ("auto", "ycc"):
            ncomp = 3
            if subsampling not in _SAMPLING:
                raise ValueError(f"unknown subsampling {subsampling!r}")
            samp = _SAMPLING[subsampling]
        else:
            if subsampling != "444":
                raise ValueError("Adobe RGB/CMYK/YCCK streams are stored 4:4:4")
            ncomp = 3 if colorspace == "rgb" else 4
            samp = ((1, 1),) * ncomp
    else:
        raise ValueError("expected (h, w, 3) RGB or (h, w[, 1]) grayscale")
    if progressive and restart_interval:
        raise ValueError("restart intervals unsupported in progressive mode")
    h, w = arr.shape[:2]
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("bad dimensions")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = _ceil_div(w, 8 * hmax), _ceil_div(h, 8 * vmax)
    ph, pw = mcuy * 8 * vmax, mcux * 8 * hmax
    pads = ((0, ph - h), (0, pw - w)) + (((0, 0),) if arr.ndim == 3 else ())
    img = np.pad(arr.astype(np.float64), pads, mode="edge")
    mid = float(1 << (precision - 1))
    qt_y = _scale_qtab(_QT_LUMA, quality, precision)
    qt_c = _scale_qtab(_QT_CHROMA, quality, precision)
    # tsel[c] = quant/Huffman table class per component (0 luma, 1 chroma)
    if ncomp == 1:
        planes = [img - mid]
        tsel = [0]
    elif colorspace in ("auto", "ycc"):
        planes = list(_rgb_to_ycc(img, mid))
        tsel = [0, 1, 1]
    elif colorspace == "rgb":
        planes = [img[..., c] - 128.0 for c in range(3)]
        tsel = [0, 0, 0]
    elif colorspace == "cmyk":
        planes = [p - 128.0 for p in _rgb_to_stored_cmyk(img)]
        tsel = [0, 0, 0, 0]
    else:  # ycck: YCbCr over the stored (inverted-ink) CMY, K separate
        stored = _rgb_to_stored_cmyk(img)
        planes = [*_rgb_to_ycc(np.stack(stored[:3], axis=-1)), stored[3] - 128.0]
        tsel = [0, 1, 1, 0]
    qts = [(qt_y, qt_c)[t] for t in tsel]

    comps = []
    for c in range(ncomp):
        hx, vy = samp[c]
        fy, fx = vmax // vy, hmax // hx
        plane = planes[c]
        if fy > 1 or fx > 1:  # box-filter chroma downsample
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        gy, gx = mcuy * vy, mcux * hx  # MCU-padded block grid
        blocks = plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8)
        q = np.round(coef / qts[c]).astype(np.int32).reshape(-1, 64)[:, _ZZ]
        comps.append(
            {
                "zz": q, "gx": gx, "gy": gy, "hx": hx, "vy": vy,
                # true block dims (unpadded) — non-interleaved scans
                # cover exactly these (A.2.2), not the MCU-padded grid
                "bx": _ceil_div(_ceil_div(w * hx, hmax), 8),
                "by": _ceil_div(_ceil_div(h * vy, vmax), 8),
            }
        )

    out = bytearray(b"\xff\xd8")  # SOI
    if ncomp == 1 or colorspace in ("auto", "ycc"):
        out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    else:
        # APP14 Adobe: transform 0 = RGB/CMYK stored as-is, 2 = YCCK.
        # JFIF APP0 is omitted — it mandates YCbCr/grayscale.
        transform = 2 if colorspace == "ycck" else 0
        out += b"\xff\xee" + struct.pack(">H", 14) + b"Adobe"
        out += struct.pack(">HHHB", 100, 0, 0, transform)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    qt_emit = ((0, qt_y),) + (((1, qt_c),) if 1 in tsel else ())
    for tid, qt in qt_emit:
        zzq = [int(qt.reshape(64)[i]) for i in _ZZ]  # DQT in zigzag
        if max(zzq) > 255:  # Pq=1: 16-bit entries (12-bit precision)
            out += b"\xff\xdb" + struct.pack(">HB", 131, 0x10 | tid)
            out += b"".join(struct.pack(">H", q) for q in zzq)
        else:
            out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
            out += bytes(zzq)
    # 12-bit baseline is illegal (B.2.2) — use extended sequential SOF1
    sof = 0xC2 if progressive else (0xC1 if precision == 12 else 0xC0)
    out += bytes((0xFF, sof)) + struct.pack(
        ">HBHHB", 8 + 3 * ncomp, precision, h, w, ncomp
    )
    for c in range(ncomp):
        hx, vy = samp[c]
        out += struct.pack("BBB", c + 1, (hx << 4) | vy, tsel[c])

    if precision == 12:
        dc_bits_vals = ((_DC12_BITS, _DC12_VALS),) * 2
        ac_bits_vals = ((_AC12_BITS, _AC12_VALS),) * 2
    else:
        dc_bits_vals = (
            (_DC_LUMA_BITS, _DC_LUMA_VALS),
            (_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        )
        ac_bits_vals = (
            ((_PROG_AC_BITS, _PROG_AC_VALS), (_PROG_AC_BITS, _PROG_AC_VALS))
            if progressive
            else ((_AC_LUMA_BITS, _AC_LUMA_VALS), (_AC_CHROMA_BITS, _AC_CHROMA_VALS))
        )
    dht = [
        (0, 0, *dc_bits_vals[0]),
        (1, 0, *ac_bits_vals[0]),
    ]
    if 1 in tsel:
        dht += [
            (0, 1, *dc_bits_vals[1]),
            (1, 1, *ac_bits_vals[1]),
        ]
    for tc, th, bits, vals in dht:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)

    dc_tabs = (
        _build_codes(*dc_bits_vals[0]),
        _build_codes(*dc_bits_vals[1]),
    )
    ac_tabs = (_build_codes(*ac_bits_vals[0]), _build_codes(*ac_bits_vals[1]))
    dc_codes = [dc_tabs[t] for t in tsel]
    ac_codes = [ac_tabs[t] for t in tsel]

    def sos_header(comp_specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        ns = len(comp_specs)
        hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for cid, tsel in comp_specs:
            hdr += struct.pack("BB", cid, tsel)
        return hdr + bytes((ss, se, (ah << 4) | al))

    def mcu_block_indices(ci: int) -> list[list[int]]:
        cp = comps[ci]
        idx = []
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            idx.append(
                [
                    (my * cp["vy"] + dv) * cp["gx"] + mx * cp["hx"] + dh
                    for dv in range(cp["vy"])
                    for dh in range(cp["hx"])
                ]
            )
        return idx

    if not progressive:
        out += sos_header(
            [(c + 1, (tsel[c] << 4) | tsel[c]) for c in range(ncomp)], 0, 63, 0, 0
        )
        bw = _BitWriter()
        preds = [0] * ncomp
        per_comp = [mcu_block_indices(c) for c in range(ncomp)]
        for m in range(mcux * mcuy):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()  # byte-align with 1-fill
                n = (m // restart_interval - 1) % 8
                bw.buf += bytes((0xFF, 0xD0 + n))  # RSTn: raw, never stuffed
                preds = [0] * ncomp
            for c in range(ncomp):
                for bi in per_comp[c][m]:
                    preds[c] = _encode_block(
                        bw, comps[c]["zz"][bi], preds[c], dc_codes[c], ac_codes[c]
                    )
        bw.flush()
        out += bw.buf
    else:
        al = 1  # one successive-approximation level on every band
        # --- DC first (interleaved, Al=1)
        out += sos_header([(c + 1, tsel[c] << 4) for c in range(ncomp)], 0, 0, 0, al)
        bw = _BitWriter()
        preds = [0] * ncomp
        per_comp = [mcu_block_indices(c) for c in range(ncomp)]
        for m in range(mcux * mcuy):
            for c in range(ncomp):
                for bi in per_comp[c][m]:
                    dc = int(comps[c]["zz"][bi][0]) >> al  # arithmetic shift (F.1.5.1)
                    s, extra = _mag_bits(dc - preds[c])
                    code, ln = dc_codes[c][s]
                    bw.write(code, ln)
                    if s:
                        bw.write(extra, s)
                    preds[c] = dc
        bw.flush()
        out += bw.buf
        # --- AC first scans (per component, non-interleaved, Al=1)
        bands = {0: [(1, 5), (6, 63)]} if ncomp >= 3 else {}
        for c in range(ncomp):
            cp = comps[c]
            order = [
                (b // cp["bx"]) * cp["gx"] + b % cp["bx"]
                for b in range(cp["bx"] * cp["by"])
            ]
            blocks = [cp["zz"][bi] for bi in order]
            cp["scan_blocks"] = blocks
            for ss, se in bands.get(c, [(1, 63)]):
                out += sos_header([(c + 1, tsel[c])], ss, se, 0, al)
                bw = _BitWriter()
                _encode_ac_first(bw, ac_codes[c], blocks, ss, se, al)
                bw.flush()
                out += bw.buf
        # --- DC refine (interleaved, Ah=1 -> Al=0)
        out += sos_header([(c + 1, 0) for c in range(ncomp)], 0, 0, al, 0)
        bw = _BitWriter()
        for m in range(mcux * mcuy):
            for c in range(ncomp):
                for bi in per_comp[c][m]:
                    bw.write(int(comps[c]["zz"][bi][0]) & 1, 1)
        bw.flush()
        out += bw.buf
        # --- AC refine scans (per component, Ah=1 -> Al=0)
        for c in range(ncomp):
            for ss, se in bands.get(c, [(1, 63)]):
                out += sos_header([(c + 1, tsel[c])], ss, se, al, 0)
                bw = _BitWriter()
                _encode_ac_refine(bw, ac_codes[c], comps[c]["scan_blocks"], ss, se, 0)
                bw.flush()
                out += bw.buf
            del comps[c]["scan_blocks"]

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes.

    Reads past the end are padded with 1-bits so a peek at the tail is
    well-defined, but *consuming* more than 7 padding bits (one byte of
    legal encoder fill, T.81 §F.1.2.3) raises ValueError — a truncated
    stream must surface as a decode failure, not plausible garbage."""

    __slots__ = ("data", "pos", "acc", "n", "filled", "real_bits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0
        self.filled = 0
        self.real_bits = 8 * len(data)

    def _fill(self, need: int) -> None:
        while self.n < need:
            if self.pos < len(self.data):
                self.acc = (self.acc << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.acc = (self.acc << 8) | 0xFF
            self.n += 8
            self.filled += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1
        if self.filled - self.n - self.real_bits > 7:
            raise ValueError("truncated JPEG entropy stream")

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _read_huff(br: _BitReader, lut: tuple[np.ndarray, np.ndarray], what: str) -> int:
    p = br.peek16()
    sym, ln = int(lut[0][p]), int(lut[1][p])
    if ln == 0:
        raise ValueError(f"invalid {what} Huffman prefix")
    br.skip(ln)
    return sym


def _refine_nonzero(br: _BitReader, blk: np.ndarray, k: int, one: int) -> None:
    """Apply one correction bit to an already-nonzero coefficient."""
    if br.bits(1) and not (int(blk[k]) & one):
        blk[k] += one if blk[k] > 0 else -one


def _decode_scan(
    frame: dict,
    scan_comps: list[tuple[dict, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict,
    segments: list[bytes],
    restart_interval: int,
) -> None:
    """Decode one entropy-coded scan into the frame's coefficient grids.

    Handles sequential full-block scans, progressive DC first/refine
    (interleaved or not) and AC first/refine (single-component by
    A.2.2), with restart segments resetting predictors, the EOB run,
    and byte alignment.
    """
    prog = frame["progressive"]
    if not prog and (ss, se, ah, al) != (0, 63, 0, 0):
        raise ValueError("bad sequential scan header")
    if prog:
        if ss == 0 and se != 0:
            raise ValueError("DC scan must have Se=0")
        if ss > 0 and len(scan_comps) != 1:
            raise ValueError("AC scans must be non-interleaved")
        if not (0 <= ss <= se <= 63):
            raise ValueError("bad spectral band")
    interleaved = len(scan_comps) > 1
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    if interleaved:
        nunits = mcux * mcuy
    else:
        comp0 = scan_comps[0][0]
        nunits = comp0["bx"] * comp0["by"]
    if len(segments) > 1 and not restart_interval:
        raise ValueError("RST markers without DRI")
    if restart_interval and len(segments) != _ceil_div(nunits, restart_interval):
        raise ValueError("restart segment count mismatch")

    luts = []
    for _comp, td, ta in scan_comps:
        need_dc = ss == 0 and not (prog and ah > 0)
        need_ac = se > 0
        dlut = huff.get((0, td))
        alut = huff.get((1, ta))
        if (need_dc and dlut is None) or (need_ac and alut is None):
            raise ValueError("scan references a missing Huffman table")
        luts.append((dlut, alut))

    one = 1 << al
    br = _BitReader(segments[0])
    preds = [0] * len(scan_comps)
    eobrun = 0

    def seq_block(blk: np.ndarray, ci: int) -> None:
        dlut, alut = luts[ci]
        s = _read_huff(br, dlut, "DC")
        diff = _extend(br.bits(s), s) if s else 0
        preds[ci] += diff
        blk[0] = preds[ci]
        k = 1
        while k <= 63:
            sym = _read_huff(br, alut, "AC")
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            size = sym & 15
            if k > 63:
                raise ValueError("AC run past block end")
            blk[k] = _extend(br.bits(size), size)
            k += 1

    def ac_first(blk: np.ndarray, alut) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _read_huff(br, alut, "AC")
            r, s = sym >> 4, sym & 15
            if s:
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                blk[k] = _extend(br.bits(s), s) << al
                k += 1
            elif r == 15:
                k += 16  # ZRL
            else:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                break

    def ac_refine(blk: np.ndarray, alut) -> None:
        nonlocal eobrun
        if eobrun > 0:
            for k in range(ss, se + 1):
                if blk[k]:
                    _refine_nonzero(br, blk, k, one)
            eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _read_huff(br, alut, "AC")
            r, s = sym >> 4, sym & 15
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("bad refinement magnitude category")
                newval = one if br.bits(1) else -one
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                for kk in range(k, se + 1):  # finish this block's band
                    if blk[kk]:
                        _refine_nonzero(br, blk, kk, one)
                eobrun -= 1
                return
            # advance past r zero-history coefficients, refining the
            # nonzero-history ones encountered along the way (G.1.2.3)
            while k <= se:
                if blk[k]:
                    _refine_nonzero(br, blk, k, one)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement position past band end")
                blk[k] = newval
            k += 1

    for u in range(nunits):
        if restart_interval and u and u % restart_interval == 0:
            br = _BitReader(segments[u // restart_interval])
            preds = [0] * len(scan_comps)
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            targets = [
                (ci, (my * comp["vy"] + dv) * comp["gx"] + mx * comp["hx"] + dh)
                for ci, (comp, _td, _ta) in enumerate(scan_comps)
                for dv in range(comp["vy"])
                for dh in range(comp["hx"])
            ]
        else:
            comp = scan_comps[0][0]
            targets = [(0, (u // comp["bx"]) * comp["gx"] + u % comp["bx"])]
        for ci, bi in targets:
            blk = scan_comps[ci][0]["coef"][bi]
            if not prog:
                seq_block(blk, ci)
            elif ss == 0 and ah == 0:  # DC first
                dlut, _ = luts[ci]
                s = _read_huff(br, dlut, "DC")
                diff = _extend(br.bits(s), s) if s else 0
                preds[ci] += diff
                blk[0] = preds[ci] << al
            elif ss == 0:  # DC refine
                blk[0] |= br.bits(1) << al
            elif ah == 0:
                ac_first(blk, luts[ci][1])
            else:
                ac_refine(blk, luts[ci][1])


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a JPEG to an (h, w, 3) uint8 RGB array.

    Accepts baseline/extended sequential (SOF0/SOF1) and progressive
    (SOF2) Huffman streams, 1-, 3- or 4-component, integer-ratio
    sampling factors, restart intervals in any scan type. Grayscale
    decodes to replicated RGB so downstream shape contracts hold.
    Color interpretation follows the Adobe APP14 marker when present:
    3-component transform 0 = stored RGB, 4-component transform 0 =
    CMYK / transform 2 = YCCK (inverted-ink convention, additive GCR
    un-ink — the ghostscript convention, exact against this module's
    own encoder). 4 components without APP14 default to CMYK, the
    libjpeg convention. Tables (DQT/DHT) are taken from the stream.
    Raises ValueError on anything outside that envelope (arithmetic
    coding, 12-bit, lossless, hierarchical) — quarantine, never
    silent garbage.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame: dict | None = None
    restart_interval = 0
    any_scan = False
    adobe_transform: int | None = None
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        m = data[i + 1]
        i += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", data, i)
        seg = data[i + 2 : i + seglen]
        i += seglen
        if m == 0xDB:  # DQT: one or more (Pq|Tq, 64 zigzag entries)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq not in (0, 1):
                    raise ValueError("bad DQT precision")
                tab = np.zeros(64, dtype=np.int64)
                if pq:  # 16-bit entries (12-bit sample precision)
                    tab[_ZZ] = np.frombuffer(seg[j + 1 : j + 129], ">u2")
                    j += 129
                else:
                    tab[_ZZ] = np.frombuffer(seg[j + 1 : j + 65], np.uint8)
                    j += 65
                qtabs[tq] = tab.reshape(8, 8)
        elif m == 0xC4:  # DHT: one or more tables
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _build_lut(bits, vals)
                j += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12) or (prec == 12 and m == 0xC0):
                raise ValueError("only 8-bit (or non-baseline 12-bit) precision")
            if nc not in (1, 3, 4):
                raise ValueError("only 1-, 3- or 4-component JPEGs supported")
            if not (h and w):
                raise ValueError("bad dimensions")
            if h * w > 1 << 28:
                # containment bound (same 2^28-px cap as the JPX SIZ
                # canvas gate): a corrupted SOF of 65535x65535 would
                # otherwise drive ~17 GB of coefficient allocation
                # per component before any entropy decode fails
                raise ValueError("JPEG: image too large for this decoder")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append({"cid": cid, "hx": hv >> 4, "vy": hv & 15, "tq": tq})
            hmax = max(c["hx"] for c in comps)
            vmax = max(c["vy"] for c in comps)
            for c in comps:
                if not (1 <= c["hx"] <= 4 and 1 <= c["vy"] <= 4):
                    raise ValueError("bad sampling factors")
                if hmax % c["hx"] or vmax % c["vy"]:
                    raise ValueError("fractional sampling ratios unsupported")
            mcux, mcuy = _ceil_div(w, 8 * hmax), _ceil_div(h, 8 * vmax)
            for c in comps:
                c["gx"], c["gy"] = mcux * c["hx"], mcuy * c["vy"]
                c["bx"] = _ceil_div(_ceil_div(w * c["hx"], hmax), 8)
                c["by"] = _ceil_div(_ceil_div(h * c["vy"], vmax), 8)
                c["coef"] = np.zeros((c["gy"] * c["gx"], 64), dtype=np.int64)
            frame = {
                "h": h, "w": w, "progressive": m == 0xC2, "comps": comps,
                "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
                "prec": prec,
            }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF 0x{m:02x}")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            adobe_transform = seg[11]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            by_id = {c["cid"]: c for c in frame["comps"]}
            scan_comps = []
            for c in range(ns):
                cs, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                if cs not in by_id:
                    raise ValueError("scan references unknown component")
                scan_comps.append((by_id[cs], tsel >> 4, tsel & 15))
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            # entropy data runs to the next non-stuffed, non-RST marker;
            # RSTn boundaries split it into restart segments (E.1.4)
            j = i
            raw = bytearray()
            segments: list[bytes] = []
            expect_rst = 0
            while j < len(data) - 1:
                b = data[j]
                if b == 0xFF:
                    nxt = data[j + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # RSTn: segment boundary
                        if nxt - 0xD0 != expect_rst:
                            raise ValueError("out-of-order RST marker")
                        expect_rst = (expect_rst + 1) % 8
                        segments.append(bytes(raw))
                        raw = bytearray()
                        j += 2
                        continue
                    break
                raw.append(b)
                j += 1
            segments.append(bytes(raw))
            i = j
            _decode_scan(
                frame, scan_comps, ss, se, ahal >> 4, ahal & 15,
                huff, segments, restart_interval,
            )
            any_scan = True
        # APPn/COM and anything else: skipped via seglen
    if frame is None or not any_scan:
        raise ValueError("missing SOS/SOF")

    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in frame["comps"]:
        if c["tq"] not in qtabs:
            raise ValueError("missing quantization table")
        qt = qtabs[c["tq"]]
        zz = c["coef"]
        raster = np.zeros_like(zz)
        raster[:, _ZZ] = zz  # inverse zigzag
        n = zz.shape[0]
        deq = raster.reshape(n, 8, 8).astype(np.float64) * qt
        blocks = np.einsum("ji,ajk,kl->ail", _D8, deq, _D8)  # D^T F D
        plane = (
            blocks.reshape(c["gy"], c["gx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["gy"] * 8, c["gx"] * 8)
        )
        # crop to the component's true sample dims, then replicate up
        ch = _ceil_div(h * c["vy"], vmax)
        cw = _ceil_div(w * c["hx"], hmax)
        plane = plane[:ch, :cw]
        fy, fx = vmax // c["vy"], hmax // c["hx"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    mid = float(1 << (frame["prec"] - 1))
    mx = float((1 << frame["prec"]) - 1)
    if len(planes) == 1:
        g = planes[0] + mid
        rgb = np.stack([g, g, g], axis=-1)
    elif len(planes) == 3 and adobe_transform == 0:
        rgb = np.stack([p + mid for p in planes], axis=-1)
    elif len(planes) == 3:
        y, cb, cr = planes[0] + mid, planes[1], planes[2]
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
    else:  # 4 components: Adobe CMYK (transform 0/absent) or YCCK (2)
        if adobe_transform == 2:  # YCbCr over the stored CMY planes
            y, cb, cr = planes[0] + mid, planes[1], planes[2]
            stored = [
                y + 1.402 * cr,
                y - 0.344136286 * cb - 0.714136286 * cr,
                y + 1.772 * cb,
                planes[3] + mid,
            ]
        elif adobe_transform in (None, 0):
            stored = [p + mid for p in planes]
        else:
            raise ValueError(
                f"bad Adobe transform {adobe_transform} for 4 components"
            )
        # Inverted-ink convention: stored = max - ink. Additive un-ink
        # r = max - (c_ink + k_ink) = stored_C + stored_K - max — the
        # exact inverse of _rgb_to_stored_cmyk's GCR split.
        k = stored[3]
        rgb = np.stack([stored[0] + k - mx,
                        stored[1] + k - mx,
                        stored[2] + k - mx], axis=-1)
    if mx != 255.0:  # 12-bit: rescale to the uint8 output contract
        rgb = rgb * (255.0 / mx)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
