"""WebP lossless (VP8L) codec, written from the public spec (RFC 9649
/ the WebP lossless bitstream specification).

The reference drops images outright (src/lib/md/mdUtils.ts:23-44); the
graft keeps image payloads, and WebP is the most common real-web image
container after JPEG/PNG.  No codec libraries exist in this
environment, so — like the repo's T.81 JPEG, T.800 JPEG 2000 and T.88
JBIG2 codecs — both sides are written from the spec and pinned by
round-trips: encoder and decoder share only the spec constants (the
code-length-code order, the 2-D distance map, the predictor/color
transform arithmetic), so a bit-exact round-trip pins both.

Decoder surface (the full VP8L feature set):
  * RIFF/WEBP container, plain ``VP8L`` chunk or ``VP8X`` extended
    container with a ``VP8L`` payload chunk;
  * all four transforms — predictor (14 modes, spec edge rules),
    cross-color, subtract-green, color-indexing with pixel bundling
    (1/2/4-bit packed indices);
  * meta prefix codes (entropy image selecting per-block code groups);
  * color cache (1..11 bits, spec hash 0x1e35a7bd);
  * LZ77 backward references with the 120-entry 2-D distance map;
  * simple (1/2-symbol) and code-length-coded canonical prefix codes
    with the 16/17/18 repeat extensions and the max_symbol short-cut.

Lossy ``VP8 `` payloads are NOT implemented: a conformant VP8 decoder
requires ~2k token/mode probability constants from RFC 6386 that
cannot be verified offline (same documented env-block as mp3/aac/
h264 in functions/media.py); they raise :class:`UnsupportedWebPError`
so callers quarantine rather than emit garbage pixels.

The encoder is a real compressor (per-channel canonical prefix codes
built from histograms, subtract-green, auto-palette with bundling,
run-length LZ77, optional color cache / predictor / cross-color /
meta groups) whose feature toggles exist to round-trip-pin every
decoder path.  Arrays are (h, w, 3) uint8 RGB per the images-table
contract; alpha is carried opaque.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np


class UnsupportedWebPError(ValueError):
    """Raised for WebP features outside the implemented envelope
    (lossy VP8, animation) — callers quarantine the row."""


# --------------------------------------------------------------------------
# Spec constants
# --------------------------------------------------------------------------

# Order in which code-length-code lengths are stored (spec §"Prefix
# code from code lengths").
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_MAX_CODE_LEN = 15  # main alphabets
_MAX_CL_LEN = 7  # code-length alphabet (lengths stored in 3 bits)

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40

# 2-D distance map: plane codes 1..120 address near-neighbour pixels
# as (dx, dy) offsets, ordered by distance (spec "Distance Mapping").
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)
_DIST_INV = {xy: i + 1 for i, xy in enumerate(_DIST_MAP)}


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# --------------------------------------------------------------------------
# Bit I/O (LSB-first within bytes, per spec)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "bit", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("vp8l: bitstream truncated")
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            v |= self.read_bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, nbits: int) -> None:
        """Prefix codes are consumed MSB-first by the decoder."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# --------------------------------------------------------------------------
# Canonical prefix codes
# --------------------------------------------------------------------------


class _Huff:
    """Canonical prefix decoder from a code-length array (DEFLATE-style
    assignment; codes read MSB-first one bit at a time)."""

    __slots__ = ("counts", "syms", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("vp8l: empty prefix code")
        if len(nz) == 1:
            # spec special case: one used symbol costs zero bits
            self.single = nz[0][1]
            self.counts = self.syms = None
            return
        self.single = None
        maxlen = max(l for l, _ in nz)
        if maxlen > _MAX_CODE_LEN:
            raise ValueError("vp8l: code length overflow")
        counts = [0] * (maxlen + 1)
        for l, _ in nz:
            counts[l] += 1
        # Kraft completeness check
        kraft = sum(c << (maxlen - l) for l, c in enumerate(counts) if l)
        if kraft != (1 << maxlen):
            raise ValueError("vp8l: invalid prefix code (Kraft)")
        nz.sort()
        self.counts = counts
        self.syms = [s for _, s in nz]

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        idx = 0
        for l in range(1, len(self.counts)):
            code = (code << 1) | br.read_bit()
            cnt = self.counts[l]
            if code - first < cnt:
                return self.syms[idx + code - first]
            idx += cnt
            first = (first + cnt) << 1
        raise ValueError("vp8l: prefix decode ran past max length")


def _canonical_codes(lengths):
    """(code, len) per symbol from canonical lengths."""
    nz = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = [0] * len(lengths)
    code = 0
    prev_len = nz[0][0] if nz else 0
    for l, s in nz:
        code <<= l - prev_len
        prev_len = l
        codes[s] = code
        code += 1
    return codes


def _limited_lengths(freqs, limit):
    """Huffman code lengths limited to `limit` bits; scales frequencies
    down and rebuilds when the tree is too deep (standard trick)."""
    active = [(f, s) for s, f in enumerate(freqs) if f > 0]
    if not active:
        return [0] * len(freqs)
    if len(active) == 1:
        out = [0] * len(freqs)
        out[active[0][1]] = 1
        return out
    scale = 1
    while True:
        heap = [(max(1, f // scale), i, (s,)) for i, (f, s) in enumerate(active)]
        heapq.heapify(heap)
        nid = len(heap)
        depth = {}
        while len(heap) > 1:
            f1, _, s1 = heapq.heappop(heap)
            f2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] = depth.get(s, 0) + 1
            heapq.heappush(heap, (f1 + f2, nid, s1 + s2))
            nid += 1
        if max(depth.values()) <= limit:
            out = [0] * len(freqs)
            for s, d in depth.items():
                out[s] = d
            return out
        scale *= 4


# --------------------------------------------------------------------------
# Prefix-coded value helpers (lengths / distances)
# --------------------------------------------------------------------------


def _prefix_decode(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """Inverse of _prefix_decode → (code, extra_bits, extra_val)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    extra = v.bit_length() - 2
    rem = v - (1 << (extra + 1))
    code = 2 + 2 * extra + (rem >> extra)
    return code, extra, rem & ((1 << extra) - 1)


# --------------------------------------------------------------------------
# Reading prefix-code groups
# --------------------------------------------------------------------------


def _read_code_lengths(br: _BitReader, alphabet: int, cl_huff: _Huff):
    lengths = [0] * alphabet
    if br.read_bit():
        nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(nbits)
        if max_symbol > alphabet:
            raise ValueError("vp8l: max_symbol exceeds alphabet")
    else:
        max_symbol = alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_huff.read(br)
        if s < 16:
            lengths[sym] = s
            sym += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet:
                raise ValueError("vp8l: code-length repeat overflow")
            for _ in range(rep):
                lengths[sym] = prev
                sym += 1
        elif s == 17:
            rep = 3 + br.read(3)
            if sym + rep > alphabet:
                raise ValueError("vp8l: zero-run overflow")
            sym += rep
        else:  # 18
            rep = 11 + br.read(7)
            if sym + rep > alphabet:
                raise ValueError("vp8l: zero-run overflow")
            sym += rep
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huff:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        if br.read_bit():
            sym0 = br.read(8)
        else:
            sym0 = br.read_bit()
        lengths = [0] * alphabet
        if sym0 >= alphabet:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet:
                raise ValueError("vp8l: simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        h = object.__new__(_Huff)
        if num_symbols == 1:
            h.single, h.counts, h.syms = sym0, None, None
        else:
            h.single = None
            h.counts = [0, 2]
            h.syms = sorted([sym0, sym1])
        return h
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * len(_CL_ORDER)
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    if max(cl_lengths) > _MAX_CL_LEN:
        raise ValueError("vp8l: code-length code too deep")
    cl_huff = _Huff(cl_lengths)
    return _Huff(_read_code_lengths(br, alphabet, cl_huff))


# --------------------------------------------------------------------------
# Entropy-coded image decode
# --------------------------------------------------------------------------


def _decode_pixels(br, w, h, groups, meta, meta_bits, cache_bits):
    """ARGB pixel loop: literals, LZ77 copies, color-cache reads."""
    npix = w * h
    buf = np.zeros(npix, np.uint32)
    cache = np.zeros(1 << cache_bits, np.uint32) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    _HASH = np.uint32(0x1E35A7BD)
    pos = 0
    meta_w = _sub_size(w, meta_bits) if meta is not None else 0
    g_h = r_h = b_h = a_h = d_h = None
    grp_idx = -1
    while pos < npix:
        if meta is not None:
            x = pos % w
            y = pos // w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
        else:
            gi = 0
        if gi != grp_idx:
            if gi >= len(groups):
                raise ValueError("vp8l: meta group out of range")
            g_h, r_h, b_h, a_h, d_h = groups[gi]
            grp_idx = gi
        s = g_h.read(br)
        if s < 256:
            red = r_h.read(br)
            blue = b_h.read(br)
            alpha = a_h.read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            if (
                meta is None
                and g_h.single is not None
                and r_h.single is not None
                and b_h.single is not None
                and a_h.single is not None
            ):  # green single <256 ⇒ length/distance codes never read
                # fully degenerate codes consume no bits: the rest of
                # the image is this one pixel — fill vectorized so
                # crafted tiny streams can't force a 10^8-step loop
                buf[pos:] = np.uint32(px)
                pos = npix
            else:
                buf[pos] = px
                pos += 1
            if cache is not None:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_decode(s - 256, br)
            plane = _prefix_decode(d_h.read(br), br)
            if plane > 120:
                dist = plane - 120
            else:
                dx, dy = _DIST_MAP[plane - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise ValueError("vp8l: backward reference out of range")
            # chunked copy: overlapping references repeat with period
            # `dist`, so copying dist pixels at a time is exact and
            # keeps decode-bomb streams (tiny input, huge canvas) from
            # degenerating into a per-pixel Python loop
            done = 0
            while done < length:
                step = min(dist, length - done)
                src = pos - dist + done
                buf[pos + done : pos + done + step] = buf[src : src + step]
                done += step
            if cache is not None:
                copied = buf[pos : pos + length]
                slots = (_HASH * copied) >> np.uint32(cache_shift)
                cache[slots] = copied  # duplicate slots: last write wins
            pos += length
            grp_idx = -1  # re-resolve group after the jump
        else:
            if cache is None:
                raise ValueError("vp8l: cache symbol without color cache")
            idx = s - 256 - _NUM_LENGTH_CODES
            if idx >= len(cache):
                raise ValueError("vp8l: cache index out of range")
            buf[pos] = cache[idx]
            pos += 1
    return buf


def _decode_image_stream(br: _BitReader, w: int, h: int, level0: bool):
    """Decode one image stream; returns (argb array len w*h, transforms,
    final packed width)."""
    transforms = []
    cur_w = w
    if level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(ttype)
            if ttype == 0:  # predictor
                bits = br.read(3) + 2
                tw, th = _sub_size(cur_w, bits), _sub_size(h, bits)
                img, _, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("pred", bits, img, cur_w))
            elif ttype == 1:  # cross-color
                bits = br.read(3) + 2
                tw, th = _sub_size(cur_w, bits), _sub_size(h, bits)
                img, _, _ = _decode_image_stream(br, tw, th, False)
                transforms.append(("color", bits, img, cur_w))
            elif ttype == 2:  # subtract green
                transforms.append(("subg", 0, None, cur_w))
            else:  # color indexing
                n_colors = br.read(8) + 1
                pal, _, _ = _decode_image_stream(br, n_colors, 1, False)
                pal = np.cumsum(
                    pal.view(np.uint8).reshape(-1, 4).astype(np.uint16), axis=0
                ).astype(np.uint8)  # per-channel delta sum mod 256
                if n_colors <= 2:
                    pbits = 3
                elif n_colors <= 4:
                    pbits = 2
                elif n_colors <= 16:
                    pbits = 1
                else:
                    pbits = 0
                transforms.append(("index", pbits, pal, cur_w))
                cur_w = _sub_size(cur_w, pbits)
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: bad color cache size")
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.read_bit():  # meta prefix codes
        meta_bits = br.read(3) + 2
        mw, mh = _sub_size(cur_w, meta_bits), _sub_size(h, meta_bits)
        mimg, _, _ = _decode_image_stream(br, mw, mh, False)
        meta = (mimg >> 8) & 0xFFFF
        n_groups = int(meta.max()) + 1
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, _NUM_DISTANCE_CODES)
        groups.append((g, r, b, a, d))
    buf = _decode_pixels(br, cur_w, h, groups, meta, meta_bits, cache_bits)
    return buf, transforms, cur_w


# --------------------------------------------------------------------------
# Inverse transforms
# --------------------------------------------------------------------------


def _avg2(a, b):
    return (a + b) >> 1


def _inv_predictor(buf, w, h, bits, pimg, orig_w):
    pw = _sub_size(orig_w, bits)
    px = buf.view(np.uint8).reshape(h, w, 4).astype(np.int32)  # little-endian BGRA
    modes = (pimg >> 8) & 0xFF
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0, 0, 0, 255], np.int32)  # BGRA of 0xff000000
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                m = int(modes[(y >> bits) * pw + (x >> bits)])
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                # rightmost pixel: top-right wraps to row start (spec)
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                if m == 0:
                    pred = np.array([0, 0, 0, 255], np.int32)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif m == 6:
                    pred = _avg2(L, TL)
                elif m == 7:
                    pred = _avg2(L, T)
                elif m == 8:
                    pred = _avg2(TL, T)
                elif m == 9:
                    pred = _avg2(T, TR)
                elif m == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif m == 11:
                    pred = T if np.abs(TL - L).sum() <= np.abs(TL - T).sum() else L
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif m == 13:
                    a = _avg2(L, T)
                    d = a - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))  # C trunc
                    pred = np.clip(a + half, 0, 255)
                else:
                    raise ValueError("vp8l: bad predictor mode")
            px[y, x] = (px[y, x] + pred) & 0xFF
    return np.ascontiguousarray(px.astype(np.uint8)).view(np.uint32).reshape(-1)


def _inv_color_transform(buf, w, h, bits, timg, orig_w):
    tw = _sub_size(orig_w, bits)
    px = buf.view(np.uint8).reshape(h, w, 4)  # B,G,R,A little-endian
    t = timg.view(np.uint8).reshape(-1, 4)  # per-block multipliers
    xs = np.arange(w) >> bits
    for y in range(h):
        row_t = t[(y >> bits) * tw + xs]  # (w,4) B=g2r, G=g2b, R=r2b
        g = px[y, :, 1]
        g2r = row_t[:, 0].astype(np.int8).astype(np.int32)
        g2b = row_t[:, 1].astype(np.int8).astype(np.int32)
        r2b = row_t[:, 2].astype(np.int8).astype(np.int32)
        gs = g.astype(np.int8).astype(np.int32)
        new_red = (px[y, :, 2].astype(np.int32) + ((g2r * gs) >> 5)) & 0xFF
        nr_s = new_red.astype(np.uint8).astype(np.int8).astype(np.int32)
        new_blue = (
            px[y, :, 0].astype(np.int32) + ((g2b * gs) >> 5) + ((r2b * nr_s) >> 5)
        ) & 0xFF
        px[y, :, 2] = new_red.astype(np.uint8)
        px[y, :, 0] = new_blue.astype(np.uint8)
    return buf


def _inv_subtract_green(buf, w, h):
    px = buf.view(np.uint8).reshape(-1, 4)
    g = px[:, 1].astype(np.uint16)
    px[:, 2] = ((px[:, 2] + g) & 0xFF).astype(np.uint8)
    px[:, 0] = ((px[:, 0] + g) & 0xFF).astype(np.uint8)
    return buf


def _inv_color_index(buf, w, h, pbits, pal, orig_w):
    packed_w = _sub_size(orig_w, pbits)
    greens = (buf.view(np.uint8).reshape(h, packed_w, 4))[:, :, 1]
    if pbits:
        per = 1 << pbits  # pixels per packed byte
        width_bits = 8 >> pbits
        mask = (1 << width_bits) - 1
        shifts = (np.arange(per) * width_bits).astype(np.uint8)
        idx = ((greens[:, :, None].astype(np.uint16) >> shifts[None, None, :]) & mask)
        idx = idx.reshape(h, packed_w * per)[:, :orig_w]
    else:
        idx = greens
    n = pal.shape[0]
    safe = np.where(idx < n, idx, 0).astype(np.int64)
    out = pal[safe]  # (h, w, 4) B,G,R,A? pal rows are delta-summed bytes
    out[idx >= n] = 0
    return np.ascontiguousarray(out).view(np.uint32).reshape(-1)


# --------------------------------------------------------------------------
# Container + top-level decode
# --------------------------------------------------------------------------


def _vp8l_payload(data: bytes) -> bytes:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"VP8L":
            return payload
        if tag == b"VP8 ":
            raise UnsupportedWebPError(
                "lossy VP8 payloads are outside the implemented envelope "
                "(RFC 6386 probability tables unverifiable offline)"
            )
        if tag == b"ANMF" or tag == b"ANIM":
            raise UnsupportedWebPError("animated WebP is not supported")
        pos += 8 + ln + (ln & 1)
    raise ValueError("WebP: no VP8L chunk found")


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L bitstream to (h, w, 3) uint8 RGB."""
    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("vp8l: bad signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("vp8l: unknown version")
    if w * h > 1 << 26:
        raise ValueError("vp8l: image too large")
    buf, transforms, cur_w = _decode_image_stream(br, w, h, True)
    # apply inverse transforms in reverse stream order
    for kind, bits, img, t_w in reversed(transforms):
        if kind == "index":
            buf = _inv_color_index(buf, cur_w, h, bits, img, t_w)
            cur_w = t_w
        elif kind == "subg":
            buf = _inv_subtract_green(buf, cur_w, h)
        elif kind == "pred":
            buf = _inv_predictor(buf, cur_w, h, bits, img, t_w)
        else:
            buf = _inv_color_transform(buf, cur_w, h, bits, img, t_w)
    if cur_w != w:
        raise ValueError("vp8l: transform width mismatch")
    px = buf.view(np.uint8).reshape(h, w, 4)  # little-endian → B,G,R,A
    return np.ascontiguousarray(px[:, :, [2, 1, 0]])


def decode_webp(data: bytes) -> np.ndarray:
    return decode_vp8l(_vp8l_payload(bytes(data)))


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _write_prefix_code(bw: _BitWriter, lengths):
    """Emit one prefix code: simple form when ≤2 symbols, else
    code-length-coded."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if 1 <= len(nz) <= 2 and all(s < 256 for s in nz):
        bw.write(1, 1)  # simple
        bw.write(len(nz) - 1, 1)
        if nz[0] <= 1 and len(nz) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(nz[0], 1)
        else:
            bw.write(1, 1)
            bw.write(nz[0], 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)
    # tokenize lengths with 16/17/18 runs
    tokens = []  # (symbol, extra_bits, extra_val)
    i = 0
    n = len(lengths)
    prev_nz = 8
    while i < n:
        l = lengths[i]
        if l == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                tokens.append((18, 7, r - 11))
                run -= r
            while run >= 3:
                r = min(run, 10)
                tokens.append((17, 3, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            if l == prev_nz:
                j = i
                while j < n and lengths[j] == l:
                    j += 1
                run = j - i
                emitted = 0
                while run - emitted >= 3:
                    r = min(run - emitted, 6)
                    tokens.append((16, 2, r - 3))
                    emitted += r
                for _ in range(run - emitted):
                    tokens.append((l, 0, 0))
                i = j
            else:
                tokens.append((l, 0, 0))
                prev_nz = l
                i += 1
    freqs = [0] * 19
    for s, _, _ in tokens:
        freqs[s] += 1
    cl_lengths = _limited_lengths(freqs, _MAX_CL_LEN)
    # degenerate single-symbol CL code: _Huff reads it as zero-bit
    num_cl = 0
    for i, s in enumerate(_CL_ORDER):
        if cl_lengths[s]:
            num_cl = i + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol shortcut
    codes = _canonical_codes(cl_lengths)
    single = sum(1 for l in cl_lengths if l) == 1
    for s, eb, ev in tokens:
        if not single:
            bw.write_code(codes[s], cl_lengths[s])
        if eb:
            bw.write(ev, eb)


class _Encoder:
    """One entropy-coded image (tokens → histograms → codes → bits)."""

    def __init__(self, cache_bits=0):
        self.cache_bits = cache_bits
        self.cache = [0] * (1 << cache_bits) if cache_bits else None
        self.tokens = []  # ('lit', a,r,g,b) | ('copy', len, plane) | ('cache', idx)

    def _cache_slot(self, px):
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - self.cache_bits)

    def add_pixel(self, a, r, g, b):
        px = (a << 24) | (r << 16) | (g << 8) | b
        if self.cache is not None:
            slot = self._cache_slot(px)
            if self.cache[slot] == px:
                self.tokens.append(("cache", slot))
                return
            self.cache[slot] = px
        self.tokens.append(("lit", a, r, g, b))

    def add_copy(self, length, dist, copied_px):
        """copied_px: iterable of ARGB ints actually copied (cache upkeep)."""
        self.tokens.append(("copy", length, dist))
        if self.cache is not None:
            for px in copied_px:
                self.cache[self._cache_slot(px)] = px

    def emit(self, bw: _BitWriter, green_alpha):
        gh = [0] * green_alpha
        rh = [0] * 256
        bh = [0] * 256
        ah = [0] * 256
        dh = [0] * _NUM_DISTANCE_CODES
        for t in self.tokens:
            if t[0] == "lit":
                _, a, r, g, b = t
                gh[g] += 1
                rh[r] += 1
                bh[b] += 1
                ah[a] += 1
            elif t[0] == "copy":
                lc, _, _ = _prefix_encode(t[1])
                gh[256 + lc] += 1
                dc, _, _ = _prefix_encode(t[2])
                dh[dc] += 1
            else:
                gh[256 + _NUM_LENGTH_CODES + t[1]] += 1
        # every alphabet needs ≥1 used symbol for a valid code
        for hist in (gh, rh, bh, ah, dh):
            if not any(hist):
                hist[0] = 1
        g_len = _limited_lengths(gh, _MAX_CODE_LEN)
        r_len = _limited_lengths(rh, _MAX_CODE_LEN)
        b_len = _limited_lengths(bh, _MAX_CODE_LEN)
        a_len = _limited_lengths(ah, _MAX_CODE_LEN)
        d_len = _limited_lengths(dh, _MAX_CODE_LEN)
        for lens in (g_len, r_len, b_len, a_len, d_len):
            _write_prefix_code(bw, lens)
        g_c, r_c, b_c, a_c, d_c = (
            _canonical_codes(x) for x in (g_len, r_len, b_len, a_len, d_len)
        )

        def put(codes, lens, s):
            if lens[s] == 0:
                raise AssertionError("symbol with zero length")
            bw.write_code(codes[s], lens[s])

        g_single = sum(1 for l in g_len if l) == 1
        for t in self.tokens:
            if t[0] == "lit":
                _, a, r, g, b = t
                if not g_single:
                    put(g_c, g_len, g)
                if sum(1 for l in r_len if l) > 1:
                    put(r_c, r_len, r)
                if sum(1 for l in b_len if l) > 1:
                    put(b_c, b_len, b)
                if sum(1 for l in a_len if l) > 1:
                    put(a_c, a_len, a)
            elif t[0] == "copy":
                lc, leb, lev = _prefix_encode(t[1])
                if not g_single:
                    put(g_c, g_len, 256 + lc)
                if leb:
                    bw.write(lev, leb)
                dc, deb, dev = _prefix_encode(t[2])
                if sum(1 for l in d_len if l) > 1:
                    put(d_c, d_len, dc)
                if deb:
                    bw.write(dev, deb)
            else:
                if not g_single:
                    put(g_c, g_len, 256 + _NUM_LENGTH_CODES + t[1])


def _encode_pixel_stream(
    bw, argb, w, cache_bits=0, use_lz77=True, use_2d_dist=False, level0=False
):
    """Encode a 1-D ARGB pixel array as one entropy-coded image body
    (after any transforms). Emits cache-info bit (+ the meta-prefix
    bit when level0: only spatially-coded images carry it) + codes +
    tokens."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    enc = _Encoder(cache_bits)
    n = len(argb)
    i = 0
    while i < n:
        px = int(argb[i])
        # greedy run detection: distance-1 runs (and row-above runs)
        if use_lz77 and i > 0 and px == int(argb[i - 1]):
            j = i
            while j < n and int(argb[j]) == int(argb[j - 1]) and j - i < 4096:
                j += 1
            length = j - i
            if length >= 2:
                dist = 1
                if use_2d_dist and (1, 0) in _DIST_INV:
                    plane = _DIST_INV[(1, 0)]  # dx=1,dy=0 → dist 1
                else:
                    plane = dist + 120
                enc.add_copy(length, plane, [px] * length)
                i = j
                continue
        if (
            use_lz77
            and i >= w
            and px == int(argb[i - w])
        ):
            j = i
            while j < n and j - i < 4096 and int(argb[j]) == int(argb[j - w]):
                j += 1
            length = j - i
            if length >= 4:
                if use_2d_dist:
                    plane = _DIST_INV[(0, 1)]  # dx=0,dy=1 → dist w
                else:
                    plane = w + 120
                enc.add_copy(length, plane, [int(argb[k]) for k in range(i, j)])
                i = j
                continue
        enc.add_pixel((px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF)
        i += 1
    green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    if level0:
        bw.write(0, 1)  # no meta prefix codes
    enc.emit(bw, green_alpha)


def _rgb_to_argb(arr: np.ndarray) -> np.ndarray:
    h, w, _ = arr.shape
    a = np.full((h, w), 255, np.uint32)
    r = arr[:, :, 0].astype(np.uint32)
    g = arr[:, :, 1].astype(np.uint32)
    b = arr[:, :, 2].astype(np.uint32)
    return ((a << 24) | (r << 16) | (g << 8) | b).reshape(-1)


def _subtract_green(argb: np.ndarray) -> np.ndarray:
    px = argb.copy()
    g = (px >> 8) & 0xFF
    r = (((px >> 16) & 0xFF) - g) & 0xFF
    b = ((px & 0xFF) - g) & 0xFF
    return (px & 0xFF00FF00) | (r << 16) | b


def _forward_color_transform(argb, w, h, bits, g2r, g2b, r2b):
    """Uniform multipliers across all blocks (encoder twin)."""
    px = argb.view(np.uint8).reshape(h, w, 4)  # B,G,R,A
    gs = px[:, :, 1].astype(np.int8).astype(np.int32)
    red = px[:, :, 2].astype(np.int32)
    # sign-extend the raw transform bytes explicitly: numpy 2.x makes
    # out-of-bound Python int -> np.int8 a hard error, so the old
    # np.int32(np.int8(v)) form would start raising on e.g. v=200
    m_g2r = np.int32(((g2r & 0xFF) ^ 0x80) - 0x80)
    m_g2b = np.int32(((g2b & 0xFF) ^ 0x80) - 0x80)
    m_r2b = np.int32(((r2b & 0xFF) ^ 0x80) - 0x80)
    new_red = (red - ((m_g2r * gs) >> 5)) & 0xFF
    rs = red.astype(np.uint8).astype(np.int8).astype(np.int32)
    new_blue = (px[:, :, 0].astype(np.int32) - ((m_g2b * gs) >> 5) - ((m_r2b * rs) >> 5)) & 0xFF
    out = px.copy()
    out[:, :, 2] = new_red.astype(np.uint8)
    out[:, :, 0] = new_blue.astype(np.uint8)
    return np.ascontiguousarray(out).view(np.uint32).reshape(-1)


def _forward_predictor(argb, w, h, mode):
    """Single fixed predictor mode across all blocks; residuals follow
    the decoder's edge rules exactly."""
    px = argb.view(np.uint8).reshape(h, w, 4).astype(np.int32)
    out = np.zeros_like(px)
    black = np.array([0, 0, 0, 255], np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = T if np.abs(TL - L).sum() <= np.abs(TL - T).sum() else L
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    a = _avg2(L, T)
                    d = a - TL
                    half = np.where(d >= 0, d // 2, -((-d) // 2))
                    pred = np.clip(a + half, 0, 255)
            out[y, x] = (px[y, x] - pred) & 0xFF
    return np.ascontiguousarray(out.astype(np.uint8)).view(np.uint32).reshape(-1)


def _write_uniform_subimage(bw, value_pixels, w, h):
    """Write an entropy-coded subimage (predictor/color/meta images)
    where content is the given ARGB pixel array."""
    _encode_pixel_stream(bw, value_pixels, w, cache_bits=0, use_lz77=True)


def encode_vp8l(
    arr: np.ndarray,
    *,
    subtract_green: bool = True,
    cache_bits: int = 0,
    use_lz77: bool = True,
    use_2d_dist: bool = False,
    palette: str = "auto",
    predictor: int | None = None,
    color_transform: tuple | None = None,
    meta_split: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB to a raw VP8L bitstream.

    Feature toggles exist to round-trip-pin each decoder path; the
    default (subtract-green + auto-palette + run LZ77 + histogram
    prefix codes) is a real compressor.
    """
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l: dimensions out of range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    argb = _rgb_to_argb(arr)

    uniq = np.unique(argb)
    use_palette = palette is True or (palette == "auto" and len(uniq) <= 256
                                      and len(uniq) * 8 < len(argb))
    cur_w = w
    if use_palette:
        # color-indexing transform
        bw.write(1, 1)
        bw.write(3, 2)
        n = len(uniq)
        bw.write(n - 1, 8)
        pal_bytes = uniq.astype(np.uint32).view(np.uint8).reshape(-1, 4).astype(np.int16)
        deltas = pal_bytes.copy()
        deltas[1:] = (pal_bytes[1:] - pal_bytes[:-1]) & 0xFF
        pal_argb = np.ascontiguousarray(deltas.astype(np.uint8)).view(np.uint32).reshape(-1)
        _write_uniform_subimage(bw, pal_argb, n, 1)
        lut = {int(v): i for i, v in enumerate(uniq)}
        idx = np.array([lut[int(v)] for v in argb], np.uint16).reshape(h, w)
        if n <= 2:
            pbits = 3
        elif n <= 4:
            pbits = 2
        elif n <= 16:
            pbits = 1
        else:
            pbits = 0
        if pbits:
            per = 1 << pbits
            width_bits = 8 >> pbits
            packed_w = _sub_size(w, pbits)
            packed = np.zeros((h, packed_w), np.uint16)
            for k in range(per):
                cols = idx[:, k::per]
                packed[:, : cols.shape[1]] |= cols << (k * width_bits)
            greens = packed
            cur_w = packed_w
        else:
            greens = idx
        argb = (greens.astype(np.uint32) << 8).reshape(-1)
    else:
        if predictor is not None:
            bw.write(1, 1)
            bw.write(0, 2)
            bits = 4
            bw.write(bits - 2, 3)
            pw, ph = _sub_size(cur_w, bits), _sub_size(h, bits)
            pimg = np.full(pw * ph, 0xFF000000 | (predictor << 8), np.uint32)
            _write_uniform_subimage(bw, pimg, pw, ph)
            argb = _forward_predictor(argb, cur_w, h, predictor)
        if color_transform is not None:
            g2r, g2b, r2b = color_transform
            bw.write(1, 1)
            bw.write(1, 2)
            bits = 4
            bw.write(bits - 2, 3)
            tw, th = _sub_size(cur_w, bits), _sub_size(h, bits)
            tpx = (
                np.uint32(0xFF000000)
                | (np.uint32(r2b & 0xFF) << 16)
                | (np.uint32(g2b & 0xFF) << 8)
                | np.uint32(g2r & 0xFF)
            )
            timg = np.full(tw * th, tpx, np.uint32)
            _write_uniform_subimage(bw, timg, tw, th)
            argb = _forward_color_transform(argb, cur_w, h, bits, g2r, g2b, r2b)
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            argb = _subtract_green(argb)
    bw.write(0, 1)  # end of transforms

    if meta_split and cur_w >= 2:
        # two huffman groups: left/right halves via a meta entropy image
        if cache_bits:
            bw.write(1, 1)
            bw.write(cache_bits, 4)
        else:
            bw.write(0, 1)
        bw.write(1, 1)  # meta prefix codes present
        meta_bits = 2  # 4×4 blocks; left/right halves map to 2 groups
        mw, mh = _sub_size(cur_w, meta_bits), _sub_size(h, meta_bits)
        bw.write(meta_bits - 2, 3)
        half = mw // 2
        midx = np.zeros(mw * mh, np.uint32)
        for yy in range(mh):
            for xx in range(mw):
                midx[yy * mw + xx] = 1 if xx >= half and mw > 1 else 0
        mimg = (0xFF000000 | (midx << 8)).astype(np.uint32)
        _write_uniform_subimage(bw, mimg, mw, mh)
        n_groups = int(midx.max()) + 1
        # token-split: run one encoder per group with shared cache
        green_alpha = 256 + _NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
        encs = [_Encoder(cache_bits) for _ in range(n_groups)]
        if cache_bits:  # one shared cache across groups
            shared = encs[0].cache
            for e in encs:
                e.cache = shared
        npix = len(argb)
        for i in range(npix):
            x = i % cur_w
            gi = int(midx[(i // cur_w >> meta_bits) * mw + (x >> meta_bits)])
            px = int(argb[i])
            encs[gi].add_pixel(
                (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
            )
        # emit codes for each group, then tokens interleaved is NOT
        # possible with this simple split — instead emit group codes
        # and replay pixels group-aware through one bit stream
        # (tokens must appear in pixel order, so re-walk pixels).
        code_sets = []
        for e in encs:
            gh = [0] * green_alpha
            rh = [0] * 256
            bh = [0] * 256
            ah = [0] * 256
            for t in e.tokens:
                if t[0] == "lit":
                    _, a, r, g, b = t
                    gh[g] += 1
                    rh[r] += 1
                    bh[b] += 1
                    ah[a] += 1
                else:
                    gh[256 + _NUM_LENGTH_CODES + t[1]] += 1
            dh = [1] + [0] * (_NUM_DISTANCE_CODES - 1)
            for hist in (gh, rh, bh, ah):
                if not any(hist):
                    hist[0] = 1
            lens = [
                _limited_lengths(x, _MAX_CODE_LEN) for x in (gh, rh, bh, ah, dh)
            ]
            for ln in lens:
                _write_prefix_code(bw, ln)
            code_sets.append([( _canonical_codes(l), l) for l in lens])
        # replay in pixel order
        caches = [0] * (1 << cache_bits) if cache_bits else None
        for i in range(npix):
            x = i % cur_w
            gi = int(midx[(i // cur_w >> meta_bits) * mw + (x >> meta_bits)])
            (gc, gl), (rc, rl), (bc, bl), (ac, al), _ = code_sets[gi]
            px = int(argb[i])
            a, r, g, b = (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF
            if caches is not None:
                slot = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                if caches[slot] == px:
                    s = 256 + _NUM_LENGTH_CODES + slot
                    if sum(1 for l in gl if l) > 1:
                        bw.write_code(gc[s], gl[s])
                    continue
                caches[slot] = px
            if sum(1 for l in gl if l) > 1:
                bw.write_code(gc[g], gl[g])
            if sum(1 for l in rl if l) > 1:
                bw.write_code(rc[r], rl[r])
            if sum(1 for l in bl if l) > 1:
                bw.write_code(bc[b], bl[b])
            if sum(1 for l in al if l) > 1:
                bw.write_code(ac[a], al[a])
    else:
        _encode_pixel_stream(
            bw, argb, cur_w, cache_bits=cache_bits, use_lz77=use_lz77,
            use_2d_dist=use_2d_dist, level0=True,
        )
    return bw.getvalue()


def wrap_webp(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp(arr: np.ndarray, **opts) -> bytes:
    return wrap_webp(encode_vp8l(arr, **opts))
