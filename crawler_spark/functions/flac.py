"""FLAC codec (RFC 9639 / the public FLAC format specification),
written from the spec like the repo's JPEG/JPX/JBIG2/VP8L codecs — no
codec libraries exist in this environment, so encoder and decoder are
twins sharing only the spec constants (CRC polynomials, fixed
predictor coefficients, rice/zigzag mappings) and bit-exact
round-trips pin both sides.

This closes the lossless tier of the audio payload axis
(functions/media.py): pcm16 (raw) / ulaw (2:1 log) / adpcm (4:1
adaptive) were real as of r3; FLAC adds the real-web *compressed
lossless* format. Perceptual codecs (mp3/aac) stay env-blocked —
their huffman/psychoacoustic tables cannot be verified offline.

Decoder surface:
  * STREAMINFO + all metadata blocks (skipped), frame sync walking;
  * all block-size / sample-rate / sample-size codes, UTF-8-style
    coded frame/sample numbers;
  * channel assignments: 1-8 independent, left/side, right/side,
    mid/side;
  * subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    with signed quantized coefficients and arithmetic shift;
  * rice / rice2 partitioned residuals with escape partitions and
    wasted-bits tracking;
  * CRC-8 (header), CRC-16 (frame) and STREAMINFO MD5 verification —
    corruption raises, callers quarantine.

The encoder is a real compressor: per-block best-of CONSTANT / FIXED
0-4 (+ optional real LPC via Levinson-Durbin) per channel, stereo
decorrelation (left/side, right/side, mid/side by residual cost),
per-partition rice parameter fit; toggles exist to force every
decoder shape (verbatim, escapes, rice2, wasted bits, partition
orders) for round-trip pinning.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacError(ValueError):
    """Malformed or corrupt FLAC stream — callers quarantine."""


# fixed-predictor coefficients, order 0..4 (spec §"Fixed predictors")
_FIXED_COEF = ((), (1,), (2, -1), (3, -3, 1), (4, -6, 4, -1))

_CRC8_TABLE = None
_CRC16_TABLE = None


def _crc8(data: bytes) -> int:
    global _CRC8_TABLE
    if _CRC8_TABLE is None:
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
            tab.append(c)
        _CRC8_TABLE = tab
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


_CRC16_SHIFT_TABLES: list[np.ndarray] = []


def _crc16(data: bytes) -> int:
    """CRC-16/BUZZ (poly 0x8005, init 0) — vectorized log-step fold.

    The byte-at-a-time recurrence c' = ((c<<8)&0xFFFF) ^ TAB[(c>>8)^b]
    splits, because CRC tables are GF(2)-linear (TAB[a^b]=TAB[a]^TAB[b]),
    into c' = f(c) ^ TAB[b] with f(c) = ((c<<8)&0xFFFF) ^ TAB[c>>8].
    So crc = XOR_i f^(n-1-i)(TAB[b_i]): gather TAB over all bytes at
    once, then apply f^(2^k) power-tables (S_{k+1} = S_k∘S_k, built
    lazily, 128 KiB each) to the positions whose distance has bit k
    set, and XOR-reduce. O(n·log n) table gathers, no per-byte Python."""
    global _CRC16_TABLE
    if _CRC16_TABLE is None:
        tab = []
        for i in range(256):
            c = i << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
            tab.append(c)
        _CRC16_TABLE = tab
    n = len(data)
    if n < 64:  # scalar path: table-walk beats setup for tiny inputs
        c = 0
        for b in data:
            c = ((c << 8) & 0xFFFF) ^ _CRC16_TABLE[(c >> 8) ^ b]
        return c
    tab16 = np.asarray(_CRC16_TABLE, np.uint16)
    if not _CRC16_SHIFT_TABLES:
        v = np.arange(65536, dtype=np.uint32)
        s0 = (((v << 8) & 0xFFFF) ^ tab16[v >> 8]).astype(np.uint16)
        _CRC16_SHIFT_TABLES.append(s0)
    dist = np.arange(n - 1, -1, -1, dtype=np.int64)
    vals = tab16[np.frombuffer(data, np.uint8)]
    k = 0
    while (1 << k) <= n - 1:
        while k >= len(_CRC16_SHIFT_TABLES):
            prev = _CRC16_SHIFT_TABLES[-1]
            _CRC16_SHIFT_TABLES.append(prev[prev])
        sel = (dist >> k) & 1 == 1
        if sel.any():
            vals[sel] = _CRC16_SHIFT_TABLES[k][vals[sel]]
        k += 1
    return int(np.bitwise_xor.reduce(vals))


# --------------------------------------------------------------------------
# Bit I/O (big-endian, MSB-first — FLAC convention)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise FlacError("flac: bitstream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self, limit: int = 1 << 20) -> int:
        n = 0
        while self.read_bit() == 0:
            n += 1
            if n > limit:
                raise FlacError("flac: runaway unary code")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, n: int) -> None:
        while n >= 32:
            self.write(0, 32)
            n -= 32
        self.write(1, n + 1)

    def write_bitarray(self, arr: np.ndarray) -> None:
        """Append a uint8 0/1 bit array (MSB-first) in bulk: flush the
        partial accumulator into the array, packbits the full bytes,
        keep the sub-byte tail in the accumulator. This is the bulk
        lane for the vectorized residual/verbatim encoders."""
        if self.nbits:
            head = np.array(
                [(self.acc >> (self.nbits - 1 - i)) & 1 for i in range(self.nbits)],
                np.uint8,
            )
            arr = np.concatenate([head, arr])
            self.acc = 0
            self.nbits = 0
        nfull = (len(arr) >> 3) << 3
        if nfull:
            self.buf += np.packbits(arr[:nfull]).tobytes()
        for b in arr[nfull:].tolist():
            self.write(int(b), 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _read_coded_number(br: _BitReader) -> int:
    """UTF-8-style frame/sample number (up to 36 bits / 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError("flac: bad coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise FlacError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    chunks = []
    nbits = v.bit_length()
    n = 1
    while nbits > 6 - n + 6 * n:  # capacity of n continuation bytes
        n += 1
    for i in range(n):
        chunks.append(0x80 | ((v >> (6 * (n - 1 - i))) & 0x3F))
    lead = (0xFF << (7 - n)) & 0xFF | (v >> (6 * n))
    bw.write(lead, 8)
    for c in chunks:
        bw.write(c, 8)


_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
               7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# --------------------------------------------------------------------------
# Decode
#
# Subframe bodies are decoded against a per-frame *bit window* — one
# np.unpackbits over a bounded slice plus its set-bit index — instead
# of the per-bit _BitReader (which stays for the tiny metadata / frame
# headers). The rice hot path is fully vectorized: terminators are the
# greedy chain "first 1-bit ≥ previous terminator + 1 + param" over
# the window's ones[] index, materialized with pointer doubling
# (log2(n) numpy gathers — exact, no per-sample Python), quotients
# fall out of the chain, and the fixed-width remainders / escape /
# verbatim samples are one fancy-indexed matmul. Measured ≥20× the
# r4 bit-at-a-time reader on the q61 fixture shapes (BENCH.md §2b-ter).
# --------------------------------------------------------------------------


class _Overrun(Exception):
    """Read past the current bit window — retry with a bigger one
    (decode_flac enlarges and re-decodes the frame) or, when the
    window already reaches EOF, a genuinely truncated stream."""


class _Win:
    """A frame-local bit window: ``bits`` (uint8 0/1, MSB-first) over
    ``data[lo:hi]``, ``ones`` (positions of set bits, for unary /
    rice-terminator scans) and a lazy ``rank`` (cumulative set-bit
    count — turns "first 1-bit ≥ p" into one gather). Positions are
    relative to ``lo * 8``."""

    __slots__ = ("bits", "ones", "n", "at_eof", "_rank")

    def __init__(self, data: bytes, lo: int, hi: int):
        arr = np.frombuffer(data, np.uint8, hi - lo, lo)
        self.bits = np.unpackbits(arr)
        self.ones = np.flatnonzero(self.bits).astype(np.int64)
        self.n = len(self.bits)
        self.at_eof = hi >= len(data)
        self._rank = None

    def rank(self) -> np.ndarray:
        """rank[b] = number of set bits at positions ≤ b. A gather on
        this beats searchsorted ~10× for the rice nxt[] computation
        (binary search is per-needle serial; the cumsum is one C pass
        amortized across the window's subframes)."""
        if self._rank is None:
            self._rank = np.cumsum(self.bits, dtype=np.int32)
        return self._rank


def _w_scalar(win: _Win, pos: int, nbits: int) -> tuple[int, int]:
    """Small fixed-width read (headers, warmups, coefficients)."""
    if pos + nbits > win.n:
        raise _Overrun
    v = 0
    for b in win.bits[pos : pos + nbits].tolist():
        v = (v << 1) | b
    return v, pos + nbits


def _w_scalar_signed(win: _Win, pos: int, nbits: int) -> tuple[int, int]:
    v, pos = _w_scalar(win, pos, nbits)
    if v >= 1 << (nbits - 1):
        v -= 1 << nbits
    return v, pos


def _w_unary(win: _Win, pos: int, limit: int = 1 << 20) -> tuple[int, int]:
    j = int(np.searchsorted(win.ones, pos))
    if j >= len(win.ones):
        raise _Overrun
    t = int(win.ones[j])
    if t - pos > limit:
        raise FlacError("flac: runaway unary code")
    return t - pos, t + 1


def _w_fixed_vec(win: _Win, pos: int, count: int, width: int,
                 signed: bool) -> tuple[np.ndarray, int]:
    """``count`` consecutive ``width``-bit integers as one gather."""
    if width == 0:
        return np.zeros(count, np.int64), pos
    end = pos + count * width
    if end > win.n:
        raise _Overrun
    if count == 0:
        return np.zeros(0, np.int64), pos
    sh = np.arange(width - 1, -1, -1, dtype=np.int64)
    idx = pos + np.arange(count, dtype=np.int64)[:, None] * width + np.arange(width)
    v = (win.bits[idx].astype(np.int64) << sh).sum(axis=1)
    if signed:
        half = np.int64(1) << (width - 1)
        v = v - ((v >= half).astype(np.int64) << width)
    return v, end


def _rice_vec(win: _Win, pos: int, count: int, param: int) -> tuple[np.ndarray, int]:
    """``count`` rice codes (unary quotient + ``param``-bit remainder)
    starting at bit ``pos``. Terminator chain by pointer doubling:
    nxt[j] = first set bit ≥ ones[j] + 1 + param is one searchsorted
    for ALL ones; the greedy chain from the first set bit ≥ pos is
    then log2(count) gathers. Exact — the chain definition IS the
    sequential decode recurrence."""
    if count == 0:
        return np.zeros(0, np.int64), pos
    step = 1 + param
    R = win.rank()
    j0 = int(R[pos - 1]) if pos else 0
    # provable index bound: each code consumes its terminator plus at
    # most `param` remainder ones — slice the window's ones[] to it so
    # the chain costs O(count·param), never O(window)
    O = win.ones[j0 : j0 + count * step + 2]
    m = len(O)
    if m == 0:
        raise _Overrun
    # nxt[j] = index of first set bit ≥ O[j] + step == #ones at
    # positions ≤ O[j] + param — a rank gather, no binary search
    tgt = O + param
    if int(tgt[-1]) >= win.n:
        over = tgt >= win.n
        tgt = np.minimum(tgt, win.n - 1)
        nxt = np.minimum(R[tgt].astype(np.int64) - j0, m)
        nxt[over] = m
    else:
        nxt = np.minimum(R[tgt].astype(np.int64) - j0, m)
    nxt = np.append(nxt, m)  # sentinel self-loop = overran the window
    chain = np.empty(count, np.int64)
    chain[0] = 0  # O is sliced to start at the first set bit ≥ pos
    L, jump = 1, nxt
    while L < count:
        take = min(L, count - L)
        chain[L : L + take] = jump[chain[:take]]
        L += take
        if L < count:
            jump = jump[jump]
    if chain[-1] >= m:
        raise _Overrun
    T = O[chain]
    starts = np.empty(count, np.int64)
    starts[0] = pos
    starts[1:] = T[:-1] + step
    q = T - starts
    if int(q.max()) > (1 << 20):
        raise FlacError("flac: runaway unary code")
    end = int(T[-1]) + step
    if end > win.n:
        raise _Overrun
    if param:
        sh = np.arange(param - 1, -1, -1, dtype=np.int64)
        idx = (T + 1)[:, None] + np.arange(param)
        r = (win.bits[idx].astype(np.int64) << sh).sum(axis=1)
        v = (q << param) | r
    else:
        v = q
    return (v >> 1) ^ -(v & 1), end  # un-zigzag


def _decode_residual(
    win: _Win, pos: int, blocksize: int, order: int
) -> tuple[np.ndarray, int]:
    method, pos = _w_scalar(win, pos, 2)
    if method > 1:
        raise FlacError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po, pos = _w_scalar(win, pos, 4)
    nparts = 1 << po
    if blocksize % nparts or (blocksize >> po) < order:
        raise FlacError("flac: bad partition order")
    out = np.empty(blocksize - order, np.int64)
    idx = 0
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        param, pos = _w_scalar(win, pos, pbits)
        if param == escape:
            width, pos = _w_scalar(win, pos, 5)
            vals, pos = _w_fixed_vec(win, pos, count, width, signed=True)
            out[idx : idx + count] = vals
        else:
            vals, pos = _rice_vec(win, pos, count, param)
            out[idx : idx + count] = vals
        idx += count
    return out, pos


def _decode_subframe(
    win: _Win, pos: int, blocksize: int, bps: int
) -> tuple[np.ndarray, int]:
    pad, pos = _w_scalar(win, pos, 1)
    if pad:
        raise FlacError("flac: subframe padding bit set")
    stype, pos = _w_scalar(win, pos, 6)
    wasted = 0
    flag, pos = _w_scalar(win, pos, 1)
    if flag:
        w, pos = _w_unary(win, pos)
        wasted = w + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("flac: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        v, pos = _w_scalar_signed(win, pos, eff)
        out = np.full(blocksize, v, np.int64)
    elif stype == 1:  # VERBATIM
        out, pos = _w_fixed_vec(win, pos, blocksize, eff, signed=True)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        if order > blocksize:
            raise FlacError("flac: fixed order exceeds block")
        warm = []
        for _ in range(order):
            v, pos = _w_scalar_signed(win, pos, eff)
            warm.append(v)
        res, pos = _decode_residual(win, pos, blocksize, order)
        # fixed order k means res is the k-th forward difference; invert with k
        # cumulative sums seeded by the warmup's difference pyramid
        head = np.array(warm, np.int64)
        out = res
        for j in range(order, 0, -1):
            seed = np.diff(head, j - 1)[-1]
            out = seed + np.cumsum(out)
        out = np.concatenate([head, out]) if order else res.copy()
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        if order > blocksize:
            raise FlacError("flac: LPC order exceeds block")
        warm = []
        for _ in range(order):
            v, pos = _w_scalar_signed(win, pos, eff)
            warm.append(v)
        prec, pos = _w_scalar(win, pos, 4)
        if prec == 15:
            raise FlacError("flac: invalid LPC precision")
        prec += 1
        shift, pos = _w_scalar_signed(win, pos, 5)
        if shift < 0:
            raise FlacError("flac: negative LPC shift")
        coef = []
        for _ in range(order):
            c, pos = _w_scalar_signed(win, pos, prec)
            coef.append(c)
        res, pos = _decode_residual(win, pos, blocksize, order)
        # the per-sample floor(pred / 2^shift) makes the IIR exact-only
        # sequentially; pure-Python ints + local bindings are ~4× the
        # numpy-scalar-indexing loop (and LPC is off the media fixture
        # hot path — the encoder default is fixed predictors)
        hist = list(warm)
        append = hist.append
        for r in res.tolist():
            pred = 0
            for j in range(order):
                pred += coef[j] * hist[-1 - j]
            append((pred >> shift) + r)
        out = np.array(hist, np.int64)
    else:
        raise FlacError(f"flac: reserved subframe type {stype}")
    return (out << wasted if wasted else out), pos


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """→ (samples int32 shaped (n,) mono or (n, channels), rate).
    Verifies CRC-8/CRC-16 and the STREAMINFO MD5 when present."""
    data = bytes(data)
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("flac: truncated metadata")
        hdr = data[pos]
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        if len(body) < ln:
            raise FlacError("flac: truncated metadata block")
        if hdr & 0x7F == 0:
            if ln != 34:
                raise FlacError("flac: bad STREAMINFO size")
            info = body
        pos += 4 + ln
        if hdr & 0x80:
            break
    if info is None:
        raise FlacError("flac: missing STREAMINFO")
    rate = (info[10] << 12) | (info[11] << 4) | (info[12] >> 4)
    channels = ((info[12] >> 1) & 0x07) + 1
    bps = (((info[12] & 1) << 4) | (info[13] >> 4)) + 1
    total = ((info[13] & 0x0F) << 32) | struct.unpack(">I", info[14:18])[0]
    md5 = info[18:34]
    if not rate or channels < 1 or bps < 4:
        raise FlacError("flac: invalid STREAMINFO")
    if total > 1 << 30:
        raise FlacError("flac: stream too large")
    chans: list[list[np.ndarray]] = [[] for _ in range(channels)]
    got = 0
    last_frame_bytes = 0
    while pos < len(data) and (total == 0 or got < total):
        hstart = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError("flac: lost frame sync")
        if br.read_bit():
            raise FlacError("flac: reserved sync bit")
        br.read_bit()  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        sz_code = br.read(3)
        if br.read_bit():
            raise FlacError("flac: reserved header bit")
        _read_coded_number(br)
        if bs_code == 0:
            raise FlacError("flac: reserved block size code")
        elif bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        elif sr_code == 15:
            raise FlacError("flac: invalid sample rate code")
        if sz_code == 0:
            fbps = bps
        elif sz_code == 3:
            raise FlacError("flac: reserved sample size code")
        else:
            fbps = _SIZE_CODES[sz_code]
        hdr_end = br.pos  # crc8 is over header bytes [hstart, here)
        if br.bit:
            raise FlacError("flac: misaligned frame header")
        crc8 = br.read(8)
        if crc8 != _crc8(data[hstart:hdr_end]):
            raise FlacError("flac: frame header CRC mismatch")
        if ch_code >= 11:
            raise FlacError("flac: reserved channel assignment")
        if ch_code < 8 and ch_code + 1 != channels:
            raise FlacError("flac: channel count change")
        if ch_code >= 8 and channels != 2:
            raise FlacError("flac: stereo decorrelation on non-stereo")
        # subframe bodies decode against a frame-local bit window
        # (8 bytes/sample covers every legal shape incl. verbatim-33 +
        # headers; a pathological-but-legal rice quotient overruns it
        # and the window grows ×4 and re-decodes — rare by design)
        sub_start = br.pos
        # window sizing: the per-window unpackbits/flatnonzero passes
        # are the fixed cost of the vectorized path, so predict this
        # frame's size from the LAST frame (frames of one stream are
        # similar) with 2× slack; first frame uses 3 bytes/sample
        # (covers real compressed 16-bit audio). Underestimates overrun
        # once and retry at ×4 — rare by construction.
        if last_frame_bytes:
            need = max(2 * last_frame_bytes, 1024)
        else:
            need = blocksize * channels * 3 + 1024
        while True:
            win = _Win(data, sub_start, min(len(data), sub_start + need))
            try:
                bpos = 0
                if ch_code < 8:
                    subs = []
                    for _ in range(channels):
                        s, bpos = _decode_subframe(win, bpos, blocksize, fbps)
                        subs.append(s)
                elif ch_code == 8:  # left/side (side carries one extra bit)
                    left, bpos = _decode_subframe(win, bpos, blocksize, fbps)
                    side, bpos = _decode_subframe(win, bpos, blocksize, fbps + 1)
                    subs = [left, left - side]
                elif ch_code == 9:  # right/side
                    side, bpos = _decode_subframe(win, bpos, blocksize, fbps + 1)
                    right, bpos = _decode_subframe(win, bpos, blocksize, fbps)
                    subs = [right + side, right]
                else:  # mid/side
                    mid, bpos = _decode_subframe(win, bpos, blocksize, fbps)
                    side, bpos = _decode_subframe(win, bpos, blocksize, fbps + 1)
                    m2 = (mid << 1) | (side & 1)
                    subs = [(m2 + side) >> 1, (m2 - side) >> 1]
                break
            except _Overrun:
                if win.at_eof:
                    raise FlacError("flac: bitstream truncated") from None
                need *= 4
        pos = sub_start + ((bpos + 7) >> 3)  # byte-align past subframes
        if pos + 2 > len(data):
            raise FlacError("flac: bitstream truncated")
        (crc16,) = struct.unpack(">H", data[pos : pos + 2])
        if crc16 != _crc16(data[hstart:pos]):
            raise FlacError("flac: frame CRC mismatch")
        pos += 2
        last_frame_bytes = pos - hstart
        for c in range(channels):
            chans[c].append(subs[c])
        got += blocksize
    out = np.stack([np.concatenate(c) for c in chans], axis=-1)
    if total:
        out = out[:total]
    if md5 != b"\x00" * 16:
        nbytes = (bps + 7) // 8
        raw = _samples_to_le_bytes(out, nbytes)
        if hashlib.md5(raw).digest() != md5:
            raise FlacError("flac: MD5 mismatch (corrupt audio data)")
    if channels == 1:
        out = out[:, 0]
    return out.astype(np.int32), rate


def _samples_to_le_bytes(samples: np.ndarray, nbytes: int) -> bytes:
    flat = samples.reshape(-1).astype(np.int64)
    if nbytes == 2:
        return flat.astype("<i2").tobytes()
    if nbytes == 1:
        return flat.astype(np.int8).tobytes()
    if nbytes == 3:
        u = (flat & 0xFFFFFF).astype(np.uint32)
        b = u.astype("<u4").tobytes()
        return b"".join(b[i : i + 3] for i in range(0, len(b), 4))
    return flat.astype("<i4").tobytes()


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------


def _rice_cost(res: np.ndarray, param: int) -> int:
    z = (np.abs(res.astype(np.int64)) << 1) - (res < 0)
    return int(np.sum(z >> param)) + len(res) * (param + 1)


def _best_rice_param(res: np.ndarray, maxp: int) -> int:
    if not len(res):
        return 0
    mean = float(np.mean(np.abs(res.astype(np.float64)))) + 1e-9
    guess = max(0, min(maxp, int(np.log2(mean + 1)) + 1))
    best, best_cost = guess, _rice_cost(res, guess)
    for p in (guess - 1, guess + 1):
        if 0 <= p <= maxp:
            c = _rice_cost(res, p)
            if c < best_cost:
                best, best_cost = p, c
    return best


def _fixed_width_bits(vals: np.ndarray, width: int) -> np.ndarray:
    """``vals`` as consecutive ``width``-bit big-endian fields → one
    uint8 0/1 bit array (two's-complement truncation, like write())."""
    v = vals.astype(np.int64) & ((np.int64(1) << width) - 1)
    sh = np.arange(width - 1, -1, -1, dtype=np.int64)
    return ((v[:, None] >> sh) & 1).astype(np.uint8).reshape(-1)


def _rice_code_bits(part: np.ndarray, param: int) -> np.ndarray:
    """One partition's rice codes as a bit array: zigzag, scatter the
    unary terminators at their cumulative offsets, gather-scatter the
    remainder bits — no per-sample Python."""
    p64 = part.astype(np.int64)
    z = (np.abs(p64) << 1) - (p64 < 0)
    q = z >> param
    lens = q + 1 + param
    starts = np.cumsum(lens) - lens
    total = int(starts[-1] + lens[-1]) if len(lens) else 0
    bits = np.zeros(total, np.uint8)
    term = starts + q
    bits[term] = 1
    if param:
        sh = np.arange(param - 1, -1, -1, dtype=np.int64)
        bits[(term + 1)[:, None] + np.arange(param)] = (
            (z[:, None] >> sh) & 1
        ).astype(np.uint8)
    return bits


def _write_residual(
    bw: _BitWriter, res: np.ndarray, blocksize: int, order: int,
    partition_order: int, rice2: bool, force_escape: bool,
) -> None:
    method = 1 if rice2 else 0
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    bw.write(method, 2)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    idx = 0
    for p in range(nparts):
        count = (blocksize >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + count]
        idx += count
        if force_escape:
            m = int(np.abs(part).max()) if len(part) else 0
            width = max(2, m).bit_length() + 1
            bw.write(escape, pbits)
            bw.write(width, 5)
            if len(part):
                bw.write_bitarray(_fixed_width_bits(part, width))
            continue
        param = _best_rice_param(part, escape - 1)
        bw.write(param, pbits)
        if len(part):
            bw.write_bitarray(_rice_code_bits(part, param))


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_fit(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin on the autocorrelation; returns quantized
    (coeffs, shift) or None if degenerate."""
    f = x.astype(np.float64)
    n = len(f)
    if n <= order:
        return None
    ac = np.array([np.dot(f[: n - k], f[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        k = ac[i + 1] - np.dot(a[:i], ac[i:0:-1])
        k /= err
        a[: i + 1] = np.concatenate([a[:i] - k * a[:i][::-1], [k]]) if i else np.array([k])
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = min(14, max(1, precision - 1 - int(np.ceil(np.log2(cmax + 1e-9)))))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, coef: np.ndarray, shift: int) -> np.ndarray:
    xl = x.astype(np.int64)
    order = len(coef)
    # vectorized prediction: sum_j coef[j] * x[i-1-j]
    pred = np.zeros(len(xl) - order, np.int64)
    for j in range(order):
        pred += coef[j] * xl[order - 1 - j : len(xl) - 1 - j]
    return xl[order:] - (pred >> shift)


def _encode_subframe(
    bw: _BitWriter, x: np.ndarray, bps: int, blocksize: int,
    force: str | None, partition_order: int, rice2: bool,
    force_escape: bool, lpc_order: int, wasted_ok: bool,
) -> None:
    x = x.astype(np.int64)
    wasted = 0
    if wasted_ok and np.any(x):
        # min trailing zeros over all samples == trailing zeros of the
        # OR-reduce — one scalar, no per-sample bit_length
        orv = int(np.bitwise_or.reduce(x))
        tz = (orv & -orv).bit_length() - 1
        wasted = max(0, min(tz, bps - 2))
    eff = bps - wasted
    xe = x >> wasted if wasted else x
    bw.write(0, 1)  # padding
    is_const = bool((xe == xe[0]).all())
    if force == "constant" and not is_const:
        raise ValueError("flac: constant forced on varying data")
    # choose fixed order by residual cost
    best_order, best_cost = 0, None
    for order in range(min(4, blocksize - 1) + 1):
        r = _fixed_residual(xe, order)
        c = float(np.abs(r).sum()) if len(r) else 0.0
        if best_cost is None or c < best_cost:
            best_order, best_cost = order, c
    lpc = None
    if (force == "lpc" or (force is None and lpc_order > 0)) and blocksize > lpc_order > 0:
        lpc = _lpc_fit(xe, lpc_order)
        if lpc is None and force == "lpc":
            raise ValueError("flac: LPC fit degenerate for forced lpc")
    if force == "verbatim":
        bw.write(1, 6)
    elif force == "constant" or (force is None and len(set(xe.tolist())) == 1):
        bw.write(0, 6)
    elif lpc is not None:
        bw.write(32 + lpc_order - 1, 6)
    else:
        bw.write(8 + best_order, 6)
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    if force == "verbatim":
        bw.write_bitarray(_fixed_width_bits(xe, eff))
        return
    if force == "constant" or (force is None and len(set(xe.tolist())) == 1):
        bw.write(int(xe[0]) & ((1 << eff) - 1), eff)
        return
    if lpc is not None:
        coef, shift = lpc
        order = lpc_order
        for v in xe[:order]:
            bw.write(int(v) & ((1 << eff) - 1), eff)
        bw.write(12 - 1, 4)  # precision 12
        bw.write(shift, 5)
        for c in coef:
            bw.write(int(c) & 0xFFF, 12)
        res = _lpc_residual(xe, coef, shift)
    else:
        order = best_order
        for v in xe[:order]:
            bw.write(int(v) & ((1 << eff) - 1), eff)
        res = _fixed_residual(xe, order)
    po = partition_order
    while po and (blocksize % (1 << po) or (blocksize >> po) <= order):
        po -= 1
    _write_residual(bw, res, blocksize, order, po, rice2, force_escape)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    *,
    block_size: int = 4096,
    bps: int = 16,
    stereo: str = "auto",
    force_subframe: str | None = None,
    partition_order: int = 0,
    rice2: bool = False,
    force_escape: bool = False,
    lpc_order: int = 0,
    wasted_ok: bool = True,
    variable_blocksize: bool = False,
) -> bytes:
    """Encode int16/int32 samples, (n,) mono or (n, 2) stereo.

    ``stereo``: 'auto' (best of the four assignments by residual
    magnitude), 'independent', 'left_side', 'right_side', 'mid_side'.
    The force_* toggles exist to pin decoder paths."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels not in (1, 2):
        raise ValueError("flac: 1 or 2 channels")
    lim = 1 << (bps - 1)
    if x.min() < -lim or x.max() >= lim:
        raise ValueError("flac: samples exceed bits-per-sample")
    nbytes = (bps + 7) // 8
    md5 = hashlib.md5(_samples_to_le_bytes(x, nbytes)).digest()
    out = bytearray(b"fLaC")
    info = bytearray(34)
    struct.pack_into(">HH", info, 0, block_size, block_size)
    # min/max frame size unknown → 0
    info[10] = (sample_rate >> 12) & 0xFF
    info[11] = (sample_rate >> 4) & 0xFF
    info[12] = ((sample_rate & 0x0F) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4)
    info[13] = (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    struct.pack_into(">I", info, 14, n & 0xFFFFFFFF)
    info[18:34] = md5
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + info

    frame_no = 0
    start = 0
    while start < n or (n == 0 and frame_no == 0):
        blocksize = min(block_size, n - start) if n else block_size
        if blocksize <= 0:
            break
        block = x[start : start + blocksize]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(1 if variable_blocksize else 0, 1)
        # always use the explicit 16-bit block size form (code 7)
        bw.write(7, 4)
        rc = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
              24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}.get(sample_rate, 0)
        bw.write(rc, 4)
        sz = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        ch_code = channels - 1
        mode = stereo
        if channels == 2:
            if mode == "auto":
                l, r = block[:, 0], block[:, 1]
                side = l - r
                mid = (l + r) >> 1
                costs = {
                    "independent": float(np.abs(np.diff(l)).sum() + np.abs(np.diff(r)).sum()),
                    "left_side": float(np.abs(np.diff(l)).sum() + np.abs(np.diff(side)).sum()),
                    "right_side": float(np.abs(np.diff(r)).sum() + np.abs(np.diff(side)).sum()),
                    "mid_side": float(np.abs(np.diff(mid)).sum() + np.abs(np.diff(side)).sum()),
                }
                mode = min(costs, key=costs.get)
            ch_code = {"independent": 1, "left_side": 8, "right_side": 9,
                       "mid_side": 10}[mode]
        bw.write(ch_code, 4)
        bw.write(sz, 3)
        bw.write(0, 1)
        _write_coded_number(bw,
                            start if variable_blocksize else frame_no)
        bw.write(blocksize - 1, 16)
        if rc == 0:
            pass  # rate 0 = STREAMINFO; no extra field
        bw.align()
        hdr = bw.getvalue()
        bw2 = _BitWriter()
        for b in hdr:
            bw2.write(b, 8)
        bw2.write(_crc8(hdr), 8)
        kw = dict(force=force_subframe, partition_order=partition_order,
                  rice2=rice2, force_escape=force_escape,
                  lpc_order=lpc_order, wasted_ok=wasted_ok)
        if channels == 1:
            _encode_subframe(bw2, block[:, 0], bps, blocksize, **kw)
        else:
            l, r = block[:, 0], block[:, 1]
            if ch_code == 1:
                _encode_subframe(bw2, l, bps, blocksize, **kw)
                _encode_subframe(bw2, r, bps, blocksize, **kw)
            elif ch_code == 8:
                _encode_subframe(bw2, l, bps, blocksize, **kw)
                _encode_subframe(bw2, l - r, bps + 1, blocksize, **kw)
            elif ch_code == 9:
                _encode_subframe(bw2, l - r, bps + 1, blocksize, **kw)
                _encode_subframe(bw2, r, bps, blocksize, **kw)
            else:
                _encode_subframe(bw2, (l + r) >> 1, bps, blocksize, **kw)
                _encode_subframe(bw2, l - r, bps + 1, blocksize, **kw)
        bw2.align()
        frame = bw2.getvalue()
        out += frame + struct.pack(">H", _crc16(frame))
        start += blocksize
        frame_no += 1
    return bytes(out)
