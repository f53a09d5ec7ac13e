"""Baseline JFIF JPEG codec — pure numpy + stdlib, no codec libs.

Implements ITU-T T.81 baseline sequential DCT (SOF0) with 4:4:4
sampling, the Annex-K quantization + Huffman tables, byte stuffing,
and a JFIF APP0 header. The encoder is a *real* JPEG writer (any
external baseline decoder can read the output); the decoder reads the
quantization and Huffman tables from the file rather than assuming
this encoder produced it.

Why it exists: the reference crawl drops images entirely
(``src/lib/md/mdUtils.ts:23-44``); the graft's input_hint keeps
image+caption pairs with a per-row "decoded-pixel allclose (PSNR >= 40
dB for lossy formats)" invariant. The env has no PIL/libjpeg, so the
lossy leg of that invariant is exercised here from the public spec.

Scope (documented subset): baseline SOF0 only, 8-bit, 1x1 sampling
factors (4:4:4), three components, no progressive/arithmetic coding,
no restart-interval emission (RST markers are tolerated on decode).

Design notes for the Spark path: encode/decode run inside Arrow-batched
pandas UDFs (``functions/images.py``); the per-image work is
numpy-vectorized DCT/IDCT over all 8x8 blocks at once (einsum), with
the entropy coder the only per-symbol Python loop. Decode uses a
16-bit prefix lookup table per Huffman table (one array index per
symbol instead of bit-by-bit tree walks).
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


def _scale_qtab(tab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 = Annex-K as-is, 100 = all-ones."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tab * scale + 50) // 100, 1, 255).astype(np.int64)


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


def _rgb_to_ycc(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y - 128.0, cb, cr  # level-shifted; chroma already zero-centred


def encode_jpeg(
    arr: np.ndarray, quality: int = 98, restart_interval: int = 0
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JFIF 4:4:4.

    Default quality 98 keeps PSNR >= 40 dB even on uniform-noise images
    (the worst case for transform coding — see tests); natural/smooth
    content lands far higher.  ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every that-many MCUs (byte-aligned, DC
    predictors reset — T.81 §F.1.2.3 / E.1.4), matching what external
    encoders produce for error resilience.
    """
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w, _ = arr.shape
    if not (0 < h <= 0xFFFF and 0 < w <= 0xFFFF):
        raise ValueError("bad dimensions")
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    img = np.pad(
        arr.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    qt_y = _scale_qtab(_QT_LUMA, quality)
    qt_c = _scale_qtab(_QT_CHROMA, quality)
    y, cb, cr = _rgb_to_ycc(img)

    def blockify(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
        blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ij,abjk,lk->abil", _D8, blocks, _D8)
        q = np.round(coef / qt).astype(np.int32).reshape(-1, 64)
        return q[:, _ZZ]  # zigzag order

    comps = [blockify(y, qt_y), blockify(cb, qt_c), blockify(cr, qt_c)]

    dc_y = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _build_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _build_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    preds = [0, 0, 0]
    for b in range(comps[0].shape[0]):  # MCU raster; 4:4:4 -> 1 block/comp
        if restart_interval and b and b % restart_interval == 0:
            bw.flush()  # byte-align with 1-fill
            n = (b // restart_interval - 1) % 8
            bw.buf += bytes((0xFF, 0xD0 + n))  # RSTn: raw, never stuffed
            preds = [0, 0, 0]
        for c in range(3):
            preds[c] = _encode_block(bw, comps[c][b], preds[c], *tables[c])
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    for tid, qt in ((0, qt_y), (1, qt_c)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(qt.reshape(64)[i]) for i in _ZZ)  # DQT in zigzag
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BBB", cid, 0x11, 0 if cid == 1 else 1)
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid in (1, 2, 3):
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += bw.buf
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


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline 4:4:4 JPEG to an (h, w, 3) uint8 RGB array.

    Tables (DQT/DHT) are taken from the stream. Raises ValueError on
    progressive scans, subsampled components, or malformed markers.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    h = w = 0
    comp_q: list[int] = []
    scan_tables: list[tuple[int, int]] = []
    i = 2
    segments: list[bytes] | None = None
    restart_interval = 0
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
        if m == 0xDB:  # DQT: one or more (id, 64 zigzag bytes)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZZ] = np.frombuffer(seg[j + 1 : j + 65], np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                j += 65
        elif m == 0xC4:  # DHT: one or more tables
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                vals = list(seg[j + 17 : j + 17 + n])
                huff[(tc, th)] = _build_lut(bits, vals)
                j += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if nc != 3:
                raise ValueError("only 3-component JPEGs supported")
            comp_q = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comp_q.append(tq)
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0x{m:02x} unsupported")
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan_tables = [
                (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15) for c in range(ns)
            ]
            # entropy data runs to the next non-stuffed, non-RST marker;
            # RSTn boundaries split it into restart segments (E.1.4)
            j = i
            raw = bytearray()
            segments = []
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
        # APPn/COM and anything else: skipped via seglen
    if segments is None or not h:
        raise ValueError("missing SOS/SOF0")
    if len(segments) > 1 and not restart_interval:
        raise ValueError("RST markers without DRI")

    bh, bw_ = -(-h // 8), -(-w // 8)
    nblocks = bh * bw_
    if restart_interval and len(segments) != -(-nblocks // restart_interval):
        raise ValueError("restart segment count mismatch")
    br = _BitReader(segments[0])
    coefs = [np.zeros((nblocks, 64), dtype=np.int64) for _ in range(3)]
    preds = [0, 0, 0]
    luts = [(huff[(0, td)], huff[(1, ta)]) for td, ta in scan_tables]
    for b in range(nblocks):
        if restart_interval and b and b % restart_interval == 0:
            # new restart segment: byte-aligned reader, DC preds reset
            br = _BitReader(segments[b // restart_interval])
            preds = [0, 0, 0]
        for c in range(3):
            (dsym, dlen), (asym, alen) = luts[c]
            p = br.peek16()
            s, ln = int(dsym[p]), int(dlen[p])
            if ln == 0:
                raise ValueError("invalid DC Huffman prefix")
            br.skip(ln)
            diff = _extend(br.bits(s), s) if s else 0
            preds[c] += diff
            blk = coefs[c][b]
            blk[0] = preds[c]
            k = 1
            while k <= 63:
                p = br.peek16()
                sym, ln = int(asym[p]), int(alen[p])
                if ln == 0:
                    raise ValueError("invalid AC Huffman prefix")
                br.skip(ln)
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

    planes = []
    for c in range(3):
        qt = qtabs[comp_q[c]]
        zz = coefs[c]
        raster = np.zeros_like(zz)
        raster[:, _ZZ] = zz  # inverse zigzag
        deq = raster.reshape(nblocks, 8, 8).astype(np.float64) * qt
        blocks = np.einsum("ji,ajk,kl->ail", _D8, deq, _D8)  # D^T F D
        plane = (
            blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        )
        planes.append(plane[:h, :w])
    y, cb, cr = planes[0] + 128.0, planes[1], planes[2]
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
