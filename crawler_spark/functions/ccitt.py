"""CCITT Group 3/4 (ITU-T T.4 / T.6) bilevel codec — the dominant
image filter in scanned-document PDFs (/CCITTFaxDecode).

Built from the public ITU-T specs only: the Modified-Huffman
run-length code tables below are T.4 §2 Tables 1-3 (terminating,
make-up, and shared extended make-up codes — spec constants every
CCITT codec must contain, like the T.81 Annex-K tables in
``functions/jpeg.py``); the 2-D coding modes (Pass / Horizontal /
Vertical ±3) are T.6 §2.2. Reference analog: pdfjs decodes these
streams inside its image pipeline (`/root/reference/src/lib/
processPDf.ts` delegates to pdfjs-dist).

Scope: K < 0 (pure 2-D MMR, what PDF producers emit for scanned
pages) and K = 0 (1-D MH rows); the mixed G3 2-D mode (K > 0) and
uncompressed-mode extensions raise ValueError — surfaced as ok=False
quarantine rows by the PDF image extractor, never as garbage pixels.

Pixel convention: decoded arrays are uint8 grayscale 0 (black) /
255 (white). PDF's ``/BlackIs1 false`` default (0-bits = black in the
OUTPUT sample stream) only matters when re-packing to samples; here we
return pixels directly, with ``black_is_1`` flipping interpretation.
"""

from __future__ import annotations

import numpy as np

# --- T.4 Table 1: white run-length codes (run: (bits, length)) ------------
_WHITE_CODES: dict[int, tuple[int, int]] = {
    0: (0b00110101, 8), 1: (0b000111, 6), 2: (0b0111, 4), 3: (0b1000, 4),
    4: (0b1011, 4), 5: (0b1100, 4), 6: (0b1110, 4), 7: (0b1111, 4),
    8: (0b10011, 5), 9: (0b10100, 5), 10: (0b00111, 5), 11: (0b01000, 5),
    12: (0b001000, 6), 13: (0b000011, 6), 14: (0b110100, 6), 15: (0b110101, 6),
    16: (0b101010, 6), 17: (0b101011, 6), 18: (0b0100111, 7), 19: (0b0001100, 7),
    20: (0b0001000, 7), 21: (0b0010111, 7), 22: (0b0000011, 7), 23: (0b0000100, 7),
    24: (0b0101000, 7), 25: (0b0101011, 7), 26: (0b0010011, 7), 27: (0b0100100, 7),
    28: (0b0011000, 7), 29: (0b00000010, 8), 30: (0b00000011, 8),
    31: (0b00011010, 8), 32: (0b00011011, 8), 33: (0b00010010, 8),
    34: (0b00010011, 8), 35: (0b00010100, 8), 36: (0b00010101, 8),
    37: (0b00010110, 8), 38: (0b00010111, 8), 39: (0b00101000, 8),
    40: (0b00101001, 8), 41: (0b00101010, 8), 42: (0b00101011, 8),
    43: (0b00101100, 8), 44: (0b00101101, 8), 45: (0b00000100, 8),
    46: (0b00000101, 8), 47: (0b00001010, 8), 48: (0b00001011, 8),
    49: (0b01010010, 8), 50: (0b01010011, 8), 51: (0b01010100, 8),
    52: (0b01010101, 8), 53: (0b00100100, 8), 54: (0b00100101, 8),
    55: (0b01011000, 8), 56: (0b01011001, 8), 57: (0b01011010, 8),
    58: (0b01011011, 8), 59: (0b01001010, 8), 60: (0b01001011, 8),
    61: (0b00110010, 8), 62: (0b00110011, 8), 63: (0b00110100, 8),
    # make-up codes (T.4 Table 2)
    64: (0b11011, 5), 128: (0b10010, 5), 192: (0b010111, 6),
    256: (0b0110111, 7), 320: (0b00110110, 8), 384: (0b00110111, 8),
    448: (0b01100100, 8), 512: (0b01100101, 8), 576: (0b01101000, 8),
    640: (0b01100111, 8), 704: (0b011001100, 9), 768: (0b011001101, 9),
    832: (0b011010010, 9), 896: (0b011010011, 9), 960: (0b011010100, 9),
    1024: (0b011010101, 9), 1088: (0b011010110, 9), 1152: (0b011010111, 9),
    1216: (0b011011000, 9), 1280: (0b011011001, 9), 1344: (0b011011010, 9),
    1408: (0b011011011, 9), 1472: (0b010011000, 9), 1536: (0b010011001, 9),
    1600: (0b010011010, 9), 1664: (0b011000, 6), 1728: (0b010011011, 9),
}

# --- T.4 Table 1/2: black run-length codes ---------------------------------
_BLACK_CODES: dict[int, tuple[int, int]] = {
    0: (0b0000110111, 10), 1: (0b010, 3), 2: (0b11, 2), 3: (0b10, 2),
    4: (0b011, 3), 5: (0b0011, 4), 6: (0b0010, 4), 7: (0b00011, 5),
    8: (0b000101, 6), 9: (0b000100, 6), 10: (0b0000100, 7), 11: (0b0000101, 7),
    12: (0b0000111, 7), 13: (0b00000100, 8), 14: (0b00000111, 8),
    15: (0b000011000, 9), 16: (0b0000010111, 10), 17: (0b0000011000, 10),
    18: (0b0000001000, 10), 19: (0b00001100111, 11), 20: (0b00001101000, 11),
    21: (0b00001101100, 11), 22: (0b00000110111, 11), 23: (0b00000101000, 11),
    24: (0b00000010111, 11), 25: (0b00000011000, 11), 26: (0b000011001010, 12),
    27: (0b000011001011, 12), 28: (0b000011001100, 12), 29: (0b000011001101, 12),
    30: (0b000001101000, 12), 31: (0b000001101001, 12), 32: (0b000001101010, 12),
    33: (0b000001101011, 12), 34: (0b000011010010, 12), 35: (0b000011010011, 12),
    36: (0b000011010100, 12), 37: (0b000011010101, 12), 38: (0b000011010110, 12),
    39: (0b000011010111, 12), 40: (0b000001101100, 12), 41: (0b000001101101, 12),
    42: (0b000011011010, 12), 43: (0b000011011011, 12), 44: (0b000001010100, 12),
    45: (0b000001010101, 12), 46: (0b000001010110, 12), 47: (0b000001010111, 12),
    48: (0b000001100100, 12), 49: (0b000001100101, 12), 50: (0b000001010010, 12),
    51: (0b000001010011, 12), 52: (0b000000100100, 12), 53: (0b000000110111, 12),
    54: (0b000000111000, 12), 55: (0b000000100111, 12), 56: (0b000000101000, 12),
    57: (0b000001011000, 12), 58: (0b000001011001, 12), 59: (0b000000101011, 12),
    60: (0b000000101100, 12), 61: (0b000001011010, 12), 62: (0b000001100110, 12),
    63: (0b000001100111, 12),
    # make-up codes
    64: (0b0000001111, 10), 128: (0b000011001000, 12), 192: (0b000011001001, 12),
    256: (0b000001011011, 12), 320: (0b000000110011, 12), 384: (0b000000110100, 12),
    448: (0b000000110101, 12), 512: (0b0000001101100, 13), 576: (0b0000001101101, 13),
    640: (0b0000001001010, 13), 704: (0b0000001001011, 13), 768: (0b0000001001100, 13),
    832: (0b0000001001101, 13), 896: (0b0000001110010, 13), 960: (0b0000001110011, 13),
    1024: (0b0000001110100, 13), 1088: (0b0000001110101, 13),
    1152: (0b0000001110110, 13), 1216: (0b0000001110111, 13),
    1280: (0b0000001010010, 13), 1344: (0b0000001010011, 13),
    1408: (0b0000001010100, 13), 1472: (0b0000001010101, 13),
    1536: (0b0000001011010, 13), 1600: (0b0000001011011, 13),
    1664: (0b0000001100100, 13), 1728: (0b0000001100101, 13),
}

# --- T.4 Table 3: extended make-up codes, shared by both colors -----------
_EXT_CODES: dict[int, tuple[int, int]] = {
    1792: (0b00000001000, 11), 1856: (0b00000001100, 11), 1920: (0b00000001101, 11),
    1984: (0b000000010010, 12), 2048: (0b000000010011, 12), 2112: (0b000000010100, 12),
    2176: (0b000000010101, 12), 2240: (0b000000010110, 12), 2304: (0b000000010111, 12),
    2368: (0b000000011100, 12), 2432: (0b000000011101, 12), 2496: (0b000000011110, 12),
    2560: (0b000000011111, 12),
}

# decode maps: (code, length) -> run
_WHITE_DECODE = {v: k for k, v in _WHITE_CODES.items()}
_WHITE_DECODE.update({v: k for k, v in _EXT_CODES.items()})
_BLACK_DECODE = {v: k for k, v in _BLACK_CODES.items()}
_BLACK_DECODE.update({v: k for k, v in _EXT_CODES.items()})

# T.6 §2.2.4 two-dimensional mode codes
_MODE_V0 = (0b1, 1)
_MODE_VR = {1: (0b011, 3), 2: (0b000011, 6), 3: (0b0000011, 7)}
_MODE_VL = {1: (0b010, 3), 2: (0b000010, 6), 3: (0b0000010, 7)}
_MODE_H = (0b001, 3)
_MODE_P = (0b0001, 4)


class _Bits:
    """MSB-first bit writer/reader over a bytearray."""

    def __init__(self, data: bytes = b"") -> None:
        self.buf = bytearray(data)
        self.acc = 0
        self.n = 0
        self.pos = 0  # reader bit position

    # writer
    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def byte_align_w(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def flush(self) -> bytes:
        self.byte_align_w()
        return bytes(self.buf)

    # reader
    def get(self, k: int) -> int:
        out = 0
        for _ in range(k):
            byte_i, bit_i = divmod(self.pos, 8)
            if byte_i >= len(self.buf):
                raise ValueError("truncated CCITT stream")
            out = (out << 1) | ((self.buf[byte_i] >> (7 - bit_i)) & 1)
            self.pos += 1
        return out

    def peek(self, k: int) -> int:
        save = self.pos
        out = 0
        for _ in range(k):
            byte_i, bit_i = divmod(self.pos, 8)
            bit = (
                (self.buf[byte_i] >> (7 - bit_i)) & 1
                if byte_i < len(self.buf)
                else 0
            )
            out = (out << 1) | bit
            self.pos += 1
        self.pos = save
        return out

    def byte_align_r(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _put_run(bw: _Bits, run: int, black: bool) -> None:
    """Emit a run length as (extended) make-up codes + terminator."""
    table = _BLACK_CODES if black else _WHITE_CODES
    while run >= 2624:  # 2560 + max terminating span handled below
        bw.put(*_EXT_CODES[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        if mk > 1728:
            bw.put(*_EXT_CODES[mk])
        else:
            bw.put(*table[mk])
        run -= mk
    bw.put(*table[run])


def _read_run(br: _Bits, black: bool) -> int:
    """Read one complete run (make-ups + terminating code)."""
    table = _BLACK_DECODE if black else _WHITE_DECODE
    total = 0
    while True:
        code = 0
        length = 0
        run = None
        while length < 14:
            code = (code << 1) | br.get(1)
            length += 1
            run = table.get((code, length))
            if run is not None:
                break
        if run is None:
            raise ValueError("invalid CCITT run-length code")
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # make-up code: a terminating code (possibly run 0) follows


def _transitions(line: np.ndarray) -> list[int]:
    """Column indices where the color changes (first change is
    white→black by construction: an imaginary white pixel precedes
    column 0). line is bool: True = black."""
    padded = np.concatenate(([False], line))
    return list(np.nonzero(padded[1:] != padded[:-1])[0])


def _encode_2d_row(bw: _Bits, cur: list[int], ref: list[int], w: int) -> None:
    """Emit one 2-D-coded row (T.4 §4.2.1.3 / T.6 §2.2) against the
    reference line's transition list."""
    a0 = -1
    color = False  # white
    while a0 < w:
        # a1: next change in current line strictly after a0
        a1 = w
        for k in range(len(cur)):
            if cur[k] > a0:
                a1 = cur[k]
                break
        # b1: first change on ref line > a0 with color opposite to
        # a0's color (i.e., a white→black change when color is
        # white). ref transitions alternate W→B (even), B→W (odd).
        b1 = w
        b2 = w
        for k in range(len(ref)):
            if ref[k] > a0 and (k % 2 == 0) == (not color):
                b1 = ref[k]
                b2 = ref[k + 1] if k + 1 < len(ref) else w
                break
        if b2 < a1:  # pass mode
            bw.put(*_MODE_P)
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:  # vertical mode
            if d == 0:
                bw.put(*_MODE_V0)
            elif d > 0:
                bw.put(*_MODE_VR[d])
            else:
                bw.put(*_MODE_VL[-d])
            a0 = a1
            color = not color
            continue
        # horizontal mode: two runs from a0 (row start counts from 0)
        a2 = w
        for k in range(len(cur)):
            if cur[k] > a1:
                a2 = cur[k]
                break
        start = 0 if a0 < 0 else a0
        bw.put(*_MODE_H)
        _put_run(bw, a1 - start, color)
        _put_run(bw, a2 - a1, not color)
        a0 = a2


def encode_g4(img: np.ndarray, byte_align: bool = False) -> bytes:
    """T.6 2-D (MMR) encode of a bool/0-1 array (True/1 = black)."""
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _Bits()
    ref: list[int] = []  # imaginary all-white line above row 0
    for y in range(h):
        cur = _transitions(img[y])
        _encode_2d_row(bw, cur, ref, w)
        if byte_align:
            bw.byte_align_w()
        ref = cur
    return bw.flush()


def decode_g4(
    data: bytes,
    columns: int,
    rows: int,
    black_is_1: bool = False,
    byte_align: bool = False,
) -> np.ndarray:
    """T.6 2-D (MMR) decode → (rows, columns) uint8, 0=black 255=white.

    ``black_is_1`` only flips which decoded state is called black
    (PDF /BlackIs1; default false = normal sense)."""
    br = _Bits(data)
    w = columns
    out = np.full((rows, w), 255, dtype=np.uint8)
    ref: list[int] = []
    for y in range(rows):
        cur = _decode_2d_row(br, ref, w)
        _paint_row(out, y, cur, w)
        if byte_align:
            br.byte_align_r()
        ref = cur
    if black_is_1:
        out = 255 - out
    return out


def _paint_row(out: np.ndarray, y: int, cur: list[int], w: int) -> None:
    line = np.zeros(w, dtype=bool)
    for i in range(0, len(cur) - 1, 2):
        line[cur[i] : cur[i + 1]] = True
    if len(cur) % 2 == 1:
        line[cur[-1] :] = True
    out[y, line] = 0


def _decode_2d_row(br: _Bits, ref: list[int], w: int) -> list[int]:
    """Decode one 2-D-coded row against the reference transition list
    (shared by T.6 G4 and the 2-D rows of T.4 mixed G3)."""
    cur: list[int] = []
    a0 = -1
    color = False
    while a0 < w:
        # classify the next mode code (prefix-free, max 7 bits)
        if br.get(1):  # '1' → V0
            mode = ("V", 0)
        else:
            if br.get(1):  # '01x'
                mode = ("V", 1 if br.get(1) else -1)
            elif br.get(1):  # '001' → horizontal
                mode = ("H", 0)
            elif br.get(1):  # '0001' → pass
                mode = ("P", 0)
            else:
                # '00001x...' → V±2 / V±3 or invalid
                if br.get(1):  # 000011 / 000010
                    mode = ("V", 2 if br.get(1) else -2)
                elif br.get(1):  # 0000011 / 0000010
                    mode = ("V", 3 if br.get(1) else -3)
                else:
                    raise ValueError("invalid T.6 mode code (EOL/ext?)")
        # b1/b2 relative to a0 and current color
        b1 = w
        b2 = w
        for k in range(len(ref)):
            if ref[k] > a0 and (k % 2 == 0) == (not color):
                b1 = ref[k]
                b2 = ref[k + 1] if k + 1 < len(ref) else w
                break
        kind, d = mode
        if kind == "P":
            a0 = b2
        elif kind == "V":
            a1 = b1 + d
            if a1 < 0 or a1 > w:
                raise ValueError("T.6 vertical move out of line")
            cur.append(a1)
            a0 = a1
            color = not color
        else:  # horizontal: two coded runs
            start = 0 if a0 < 0 else a0
            r1 = _read_run(br, color)
            r2 = _read_run(br, not color)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > w:
                raise ValueError("T.6 horizontal runs overflow line")
            cur.append(a1)
            cur.append(a2)
            a0 = a2
    return cur


def encode_mh(img: np.ndarray, byte_align: bool = True) -> bytes:
    """T.4 1-D (Modified Huffman, PDF K=0 with EndOfLine=false) encode;
    rows are independent run-length sequences starting white."""
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _Bits()
    for y in range(h):
        cur = _transitions(img[y]) + [w]
        pos = 0
        black = False
        for t in cur:
            _put_run(bw, t - pos, black)
            pos = t
            black = not black
        if pos < w:
            _put_run(bw, w - pos, black)
        if byte_align:
            bw.byte_align_w()
    return bw.flush()


def decode_mh(
    data: bytes,
    columns: int,
    rows: int,
    black_is_1: bool = False,
    byte_align: bool = True,
) -> np.ndarray:
    """T.4 1-D decode → (rows, columns) uint8, 0=black 255=white."""
    br = _Bits(data)
    out = np.full((rows, columns), 255, dtype=np.uint8)
    for y in range(rows):
        pos = 0
        black = False
        while pos < columns:
            run = _read_run(br, black)
            if pos + run > columns:
                raise ValueError("T.4 run overflows line")
            if black:
                out[y, pos : pos + run] = 0
            pos += run
            black = not black
        if byte_align:
            br.byte_align_r()
    if black_is_1:
        out = 255 - out
    return out


def _encode_1d_row(bw: _Bits, cur: list[int], w: int) -> None:
    """Emit one 1-D MH-coded row from its transition list (runs
    alternate starting white; a black-first line emits a zero-length
    white run)."""
    pos = 0
    black = False
    for t in cur + [w]:
        _put_run(bw, t - pos, black)
        pos = t
        black = not black


def _decode_1d_row(br: _Bits, w: int) -> list[int]:
    """Decode one 1-D MH row to its transition list."""
    cur: list[int] = []
    pos = 0
    black = False
    while pos < w:
        run = _read_run(br, black)
        if pos + run > w:
            raise ValueError("T.4 run overflows line")
        pos += run
        if pos < w:
            cur.append(pos)
        black = not black
    return cur


_EOL = (0b000000000001, 12)


def _read_eol(br: _Bits) -> None:
    """Consume fill bits (0s) + the 000000000001 EOL sequence."""
    zeros = 0
    while True:
        if br.get(1):
            if zeros >= 11:
                return
            raise ValueError("T.4: expected EOL, got stray 1 bit")
        zeros += 1
        if zeros > 64 + 11:
            raise ValueError("T.4: EOL not found (runaway fill)")


def encode_g3_mixed(img: np.ndarray, k: int = 4) -> bytes:
    """T.4 mixed 2-D (PDF CCITT K>0): every line is preceded by EOL +
    a tag bit (1 = the following line is 1-D MH, 0 = 2-D vs the
    previous line); every K-th line is coded 1-D, the K-1 between are
    2-D — the G3 fax error-resilience format."""
    if k <= 0:
        raise ValueError("K must be positive for mixed G3")
    img = np.asarray(img).astype(bool)
    h, w = img.shape
    bw = _Bits()
    ref: list[int] = []
    for y in range(h):
        one_d = (y % k) == 0
        bw.put(*_EOL)
        bw.put(1 if one_d else 0, 1)
        cur = _transitions(img[y])
        if one_d:
            _encode_1d_row(bw, cur, w)
        else:
            _encode_2d_row(bw, cur, ref, w)
        ref = cur
    return bw.flush()


def decode_g3_mixed(
    data: bytes, columns: int, rows: int, black_is_1: bool = False
) -> np.ndarray:
    """T.4 mixed 2-D decode (PDF CCITT K>0). The tag bit after each
    EOL says how the line is coded, so the K magnitude itself is not
    needed to decode."""
    br = _Bits(data)
    w = columns
    out = np.full((rows, w), 255, dtype=np.uint8)
    ref: list[int] = []
    for y in range(rows):
        _read_eol(br)
        one_d = bool(br.get(1))
        if one_d:
            cur = _decode_1d_row(br, w)
        else:
            cur = _decode_2d_row(br, ref, w)
        _paint_row(out, y, cur, w)
        ref = cur
    if black_is_1:
        out = 255 - out
    return out


def decode_ccittfax(
    data: bytes,
    k: int,
    columns: int,
    rows: int,
    black_is_1: bool = False,
    byte_align: bool = False,
) -> np.ndarray:
    """PDF /CCITTFaxDecode dispatch: K<0 → T.6 (G4), K=0 → T.4 1-D,
    K>0 → T.4 mixed 2-D (EOL + tag-bit framed; EncodedByteAlign is a
    no-op there — EOLs self-align)."""
    if k < 0:
        return decode_g4(data, columns, rows, black_is_1, byte_align)
    if k == 0:
        return decode_mh(data, columns, rows, black_is_1, byte_align)
    return decode_g3_mixed(data, columns, rows, black_is_1)


def decode_g4_frames(
    data: bytes, columns: int, rows: int, n_frames: int
) -> list[np.ndarray]:
    """T.6 decode of ``n_frames`` consecutive bitmaps sharing ONE bit
    stream, each terminated by an EOFB (two EOL codes) — the layout
    JBIG2's Annex-C.5 MMR grayscale bitplanes use. Returns uint8
    bitmaps (0=black, 255=white)."""
    br = _Bits(data)
    frames: list[np.ndarray] = []
    for _ in range(n_frames):
        out = np.full((rows, columns), 255, dtype=np.uint8)
        ref: list[int] = []
        for y in range(rows):
            cur = _decode_2d_row(br, ref, columns)
            _paint_row(out, y, cur, columns)
            ref = cur
        if br.get(24) != 0x001001:
            raise ValueError("MMR bitplanes: missing EOFB")
        frames.append(out)
    return frames


def encode_g4_frames(imgs: list[np.ndarray]) -> bytes:
    """Fixture twin of :func:`decode_g4_frames`: each bool bitmap
    (True=black) 2-D-coded then EOFB-terminated, bit-continuous."""
    bw = _Bits()
    for img in imgs:
        arr = np.asarray(img).astype(bool)
        h, w = arr.shape
        ref: list[int] = []
        for y in range(h):
            cur = _transitions(arr[y])
            _encode_2d_row(bw, cur, ref, w)
            ref = cur
        bw.put(0x001001, 24)
    return bw.flush()
