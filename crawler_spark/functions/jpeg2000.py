"""JPEG 2000 (ITU-T T.800 / ISO 15444-1) — codestream subset for PDF
/JPXDecode images.

Everything here is written from the public spec. The arithmetic
entropy layer is the SAME MQ coder JBIG2 uses (T.800 Annex C is
T.88 Annex E — one state table, one flowchart set), so Tier-1 rides
``functions/mq.py`` with JPEG 2000's context initial states
(Table D.7: context 0 starts at state 4, run-length at 3, uniform at
46; the rest at 0).

Decoder surface (the shapes PDF producers emit):
- raw codestreams and JP2/JPX containers (box walk to ``jp2c``);
- SIZ/COD/COC/QCD/QCC/SOT/SOD/EOC, COM/CRG/TLM/PLM/PLT skipped;
- multiple tiles and tile-parts, component subsampling (XRsiz/YRsiz);
- all five progression orders (LRCP/RLCP/RPCL/PCRL/CPRL — the
  positional three via precinct-position sorting), multiple quality
  layers, custom precinct sizes, SOP/EPH marker segments;
- both wavelets: reversible 5/3 (exact integer lifting) and
  irreversible 9/7, with matching RCT / ICT component transforms;
- quantization styles 0 (reversible exponents), 1 (scalar derived)
  and 2 (scalar expounded);
- Tier-1: the three standard coding passes with the Table D.1-D.3
  context models, run-length mode, and the FULL code-block style
  byte — segmentation symbols, selective arithmetic bypass (D.6: raw
  stuffed-bit SP/MR passes from the fifth plane, codeword segments
  terminating around them, one packet-header length per segment
  piece, MQ contexts persisting across segments), per-segment
  context reset, termall (every pass its own segment), vertical
  stripe-causal contexts, and predictable termination (a decoder
  no-op).

RGN maxshift ROI decodes too (Annex H: SPrgn raises the component's
Mb; decoded magnitudes at or above 2^SPrgn are region-of-interest
coefficients and scale back down).

Packed packet headers decode in both forms: PPT (B.10.8 — the
Zppt-ordered tile-header segments concatenate into the tile's header
stream) and PPM (A.7.4 — the Zppm-ordered main-header segments carry
Nppm-delimited groups, one per tile-part in codestream order); packet
headers read from the packed stream while bodies stay in the
bitstream. POC progression order changes apply too (A.6.6 / B.12.1.7:
each entry replays its bounded progression, packets already emitted
by an earlier entry are skipped; a tile-header POC overrides the
main-header one). Component depths up to 32 bits decode (output dtype
widens to uint32 above 16).

Out of scope — raises ValueError (the PDF image extractor quarantines
the row as ok=False, never garbage pixels): non-maxshift RGN styles
and depths above 32 bits.

The encoder twin (`encode_j2k`) emits the plain shape real lossless
encoders produce — single tile, LRCP, one layer, default precincts,
5/3 with RCT for 3-component images — and exists to pin the decoder:
encode→decode must be bit-exact (and, for 9/7, PSNR-bounded) with no
shared state beyond the spec tables.

Reference parity: the reference crawler extracts PDF images through
pdfjs (``/root/reference/src/lib/processPDf.ts``), whose jpx.js
decodes the same T.800 subset; this module re-derives that capability
from the spec rather than porting it.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from crawler_spark.functions.mq import MQDecoder, MQEncoder

# Tier-1 context ids (T.800 Annex D numbering: 0-8 significance,
# 9-13 sign, 14-16 magnitude refinement, 17 run-length, 18 uniform)
_CX_RL = 17
_CX_UNI = 18


def _init_mq(coder) -> None:
    """Table D.7 initial index values (everything else starts at 0).
    State is the MQ coder's packed (index << 1) | MPS dict."""
    coder.st[0] = 4 << 1
    coder.st[_CX_RL] = 3 << 1
    coder.st[_CX_UNI] = 46 << 1


# ---------------------------------------------------------------------------
# Packet-header bit IO (B.10.1): a 0 bit is stuffed after every 0xFF
# byte so headers never contain 0xFF followed by a byte > 0x8F.
# ---------------------------------------------------------------------------


class _HdrReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.cnt == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPX: packet header overruns data")
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                self.buf = b & 0x7F
                self.cnt = 7
            else:
                self.buf = b
                self.cnt = 8
            self.prev_ff = b == 0xFF
        self.cnt -= 1
        return (self.buf >> self.cnt) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """End of packet header: drop the partial byte; a trailing
        0xFF is followed by a stuffed byte that belongs to the header."""
        self.cnt = 0
        if self.prev_ff:
            if self.pos < len(self.data):
                self.pos += 1
            self.prev_ff = False
        return self.pos


class _HdrWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0
        self.room = 8  # bits available in the current byte

    def bit(self, b: int) -> None:
        self.buf = (self.buf << 1) | (b & 1)
        self.cnt += 1
        if self.cnt == self.room:
            # a 7-bit byte keeps its MSB zero — that IS the stuffed bit
            self.out.append(self.buf)
            self.room = 7 if self.buf == 0xFF else 8
            self.buf = 0
            self.cnt = 0

    def bits(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.bit((v >> k) & 1)

    def flush(self) -> bytes:
        if self.cnt:
            self.buf <<= self.room - self.cnt
            self.out.append(self.buf)
            if self.out[-1] == 0xFF:
                self.out.append(0)  # stuffing byte so headers never end FF
            self.buf = 0
            self.cnt = 0
            self.room = 8
        elif self.out and self.out[-1] == 0xFF:
            self.out.append(0)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Tag trees (B.10.2): each node carries a lower bound that tightens
# one bit at a time; decoding is resumable across packets, which is
# why the tree lives in the precinct state.
# ---------------------------------------------------------------------------


class _TagTree:
    def __init__(self, w: int, h: int) -> None:
        self.dims = []
        while True:
            self.dims.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        n_levels = len(self.dims)
        self.low = [dict() for _ in range(n_levels)]
        self.value = [dict() for _ in range(n_levels)]

    def _chain(self, i: int, j: int):
        # root (top level) first
        for lvl in range(len(self.dims) - 1, -1, -1):
            yield lvl, (i >> lvl, j >> lvl)

    def decode(self, rd: _HdrReader, i: int, j: int, threshold: int) -> bool:
        """True iff the leaf value is < threshold (fully resolving it
        along the way); False once the bound reaches the threshold."""
        minval = 0
        for lvl, key in self._chain(i, j):
            low = max(self.low[lvl].get(key, 0), minval)
            val = self.value[lvl].get(key)
            while val is None and low < threshold:
                if rd.bit():
                    val = low
                    self.value[lvl][key] = val
                else:
                    low += 1
            self.low[lvl][key] = low
            if val is None:
                return False
            minval = val
        return True

    def full_value(self, rd: _HdrReader, i: int, j: int) -> int:
        t = 1
        while not self.decode(rd, i, j, t):
            t += 1
        return self.value[0][(i, j)]


class _TagTreeEnc:
    """Encoder twin: node value = min over children; emit 0 bits to
    raise the bound, 1 when the value is reached."""

    def __init__(self, w: int, h: int, leaves: dict[tuple[int, int], int]):
        self.tree = _TagTree(w, h)
        vals = [dict() for _ in self.tree.dims]
        vals[0] = dict(leaves)
        for lvl in range(1, len(self.tree.dims)):
            lw, lh = self.tree.dims[lvl]
            below = vals[lvl - 1]
            for j in range(lh):
                for i in range(lw):
                    cand = [
                        below[(ci, cj)]
                        for cj in (2 * j, 2 * j + 1)
                        for ci in (2 * i, 2 * i + 1)
                        if (ci, cj) in below
                    ]
                    vals[lvl][(i, j)] = min(cand)
        self.vals = vals
        self.emitted = [dict() for _ in self.tree.dims]
        self.low = [dict() for _ in self.tree.dims]

    def encode(self, hw: _HdrWriter, i: int, j: int, threshold: int) -> None:
        minval = 0
        for lvl, key in self.tree._chain(i, j):
            low = max(self.low[lvl].get(key, 0), minval)
            val = self.vals[lvl][key]
            done = self.emitted[lvl].get(key, False)
            while not done and low < threshold:
                if low < val:
                    hw.bit(0)
                    low += 1
                else:
                    hw.bit(1)
                    done = True
            self.low[lvl][key] = low
            self.emitted[lvl][key] = done
            if not done:
                return
            minval = val


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Codestream parsing (Annex A)
# ---------------------------------------------------------------------------

_SOC = 0xFF4F
_SIZ = 0xFF51
_COD = 0xFF52
_COC = 0xFF53
_QCD = 0xFF5C
_QCC = 0xFF5D
_RGN = 0xFF5E
_POC = 0xFF5F
_PPM = 0xFF60
_PPT = 0xFF61
_TLM = 0xFF55
_PLM = 0xFF57
_PLT = 0xFF58
_CRG = 0xFF63
_COM = 0xFF64
_SOT = 0xFF90
_SOP = 0xFF91
_EPH = 0xFF92
_SOD = 0xFF93
_EOC = 0xFFD9

_SKIPPABLE = {_COM, _CRG, _TLM, _PLM, _PLT}


class _CodingStyle:
    __slots__ = (
        "prog", "layers", "mct", "levels", "xcb", "ycb", "cbstyle",
        "transform", "precincts", "sop", "eph",
    )


class _QuantStyle:
    __slots__ = ("style", "guard", "exponents", "mantissas")


def _parse_cod(body: bytes) -> _CodingStyle:
    cs = _CodingStyle()
    scod = body[0]
    cs.prog = body[1]
    cs.layers = struct.unpack_from(">H", body, 2)[0]
    cs.mct = body[4]
    cs.levels = body[5]
    cs.xcb = (body[6] & 0xF) + 2
    cs.ycb = (body[7] & 0xF) + 2
    cs.cbstyle = body[8]
    cs.transform = body[9]
    cs.sop = bool(scod & 2)
    cs.eph = bool(scod & 4)
    if scod & 1:  # user-defined precincts, one byte per resolution
        cs.precincts = [(b & 0xF, b >> 4) for b in body[10 : 10 + cs.levels + 1]]
    else:
        cs.precincts = [(15, 15)] * (cs.levels + 1)
    if cs.xcb > 10 or cs.ycb > 10 or cs.xcb + cs.ycb > 12:
        raise ValueError("JPX: invalid code-block size")
    if cs.cbstyle & ~0x3F:
        raise ValueError("JPX: unknown code-block style bits")
    if cs.layers < 1:
        raise ValueError("JPX: no layers")
    return cs


def _parse_qcd(body: bytes, levels: int) -> _QuantStyle:
    q = _QuantStyle()
    sqcd = body[0]
    q.style = sqcd & 0x1F
    q.guard = sqcd >> 5
    n_bands = 3 * levels + 1
    q.exponents = []
    q.mantissas = []
    if q.style == 0:  # no quantization: one exponent byte per subband
        for k in range(n_bands):
            q.exponents.append(body[1 + k] >> 3)
            q.mantissas.append(0)
    elif q.style == 1:  # scalar derived: one (eps, mu) for the LL
        v = struct.unpack_from(">H", body, 1)[0]
        q.exponents = [v >> 11]
        q.mantissas = [v & 0x7FF]
    elif q.style == 2:  # scalar expounded
        for k in range(n_bands):
            v = struct.unpack_from(">H", body, 1 + 2 * k)[0]
            q.exponents.append(v >> 11)
            q.mantissas.append(v & 0x7FF)
    else:
        raise ValueError("JPX: unknown quantization style")
    return q


class _Codestream:
    __slots__ = (
        "xsiz", "ysiz", "xosiz", "yosiz", "xtsiz", "ytsiz", "xtosiz",
        "ytosiz", "comps", "cod", "coc", "qcd", "qcc", "tiles", "rgn",
        "ppm", "tp_order", "poc",
    )


def _parse_poc(body: bytes, ncomp: int) -> list[tuple[int, int, int, int, int, int]]:
    """A.6.6 progression order change: (RSpoc, CSpoc, LYEpoc, REpoc,
    CEpoc, Ppoc) entries. Component fields are 2 bytes when the image
    has ≥ 257 components; an 8-bit CEpoc of 0 means 256."""
    wide = ncomp >= 257
    step = 9 if wide else 7
    if not body or len(body) % step:
        raise ValueError("JPX: malformed POC segment")
    entries = []
    for off in range(0, len(body), step):
        rs = body[off]
        if wide:
            (cs_,) = struct.unpack_from(">H", body, off + 1)
            o = off + 3
        else:
            cs_ = body[off + 1]
            o = off + 2
        (lye,) = struct.unpack_from(">H", body, o)
        re_ = body[o + 2]
        if wide:
            (ce,) = struct.unpack_from(">H", body, o + 3)
            pp = body[o + 5]
        else:
            ce = body[o + 3] or 256
            pp = body[o + 4]
        if pp > 4:
            raise ValueError("JPX: unknown progression order in POC")
        if rs >= re_ or cs_ >= ce or lye == 0:
            raise ValueError("JPX: empty POC progression bounds")
        entries.append((rs, cs_, lye, re_, ce, pp))
    return entries


def _parse_codestream(data: bytes) -> _Codestream:
    if len(data) < 4 or struct.unpack_from(">H", data, 0)[0] != _SOC:
        raise ValueError("JPX: missing SOC")
    cs = _Codestream()
    cs.coc = {}
    cs.qcc = {}
    cs.tiles = {}
    cs.rgn = {}
    cs.comps = []
    cs.ppm = []
    cs.tp_order = []
    cs.poc = None
    pos = 2
    cs.cod = None
    cs.qcd = None
    while pos < len(data):
        (marker,) = struct.unpack_from(">H", data, pos)
        if marker == _EOC:
            break
        if marker == _SOT:
            (lsot, isot, psot, tpsot, tnsot) = struct.unpack_from(
                ">HHIBB", data, pos + 2
            )
            if psot == 0:
                psot = len(data) - pos
            seg = data[pos + 2 + lsot : pos + psot]
            # tile-part header markers (COD/QCD overrides per tile are
            # parsed; the payload after SOD is appended)
            tpos = 0
            cs.tp_order.append(isot)
            tile = cs.tiles.setdefault(
                isot, {"cod": None, "qcd": None, "coc": {}, "qcc": {},
                       "data": bytearray(), "ppt": [], "ppm": bytearray(),
                       "poc": None}
            )
            while tpos < len(seg):
                (m,) = struct.unpack_from(">H", seg, tpos)
                if m == _SOD:
                    tile["data"].extend(seg[tpos + 2 :])
                    break
                (ln,) = struct.unpack_from(">H", seg, tpos + 2)
                body = seg[tpos + 4 : tpos + 2 + ln]
                if m == _COD:
                    tile["cod"] = _parse_cod(body)
                elif m == _QCD:
                    tile["qcd"] = body
                elif m == _COC:
                    raise ValueError("JPX: per-tile COC unsupported")
                elif m == _QCC:
                    raise ValueError("JPX: per-tile QCC unsupported")
                elif m == _PPT:
                    # B.10.8 tile packed headers: Zppt index + data
                    tile["ppt"].append((body[0], body[1:]))
                elif m == _POC:
                    # tile-header POC overrides the main-header one
                    tile["poc"] = _parse_poc(body, len(cs.comps))
                elif m in _SKIPPABLE:
                    pass
                else:
                    raise ValueError(f"JPX: marker {m:#06x} in tile header")
                tpos += 2 + ln
            pos += psot
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + ln]
        if marker == _SIZ:
            (_rsiz, cs.xsiz, cs.ysiz, cs.xosiz, cs.yosiz, cs.xtsiz,
             cs.ytsiz, cs.xtosiz, cs.ytosiz, ncomp) = struct.unpack_from(
                ">HIIIIIIIIH", body, 0
            )
            if not (0 < cs.xsiz and 0 < cs.ysiz):
                raise ValueError("JPX: empty image")
            if cs.xsiz * cs.ysiz > 1 << 28:
                raise ValueError("JPX: image too large for this decoder")
            if cs.xtsiz == 0 or cs.ytsiz == 0 or ncomp == 0 or ncomp > 16:
                raise ValueError("JPX: bad SIZ geometry")
            cs.comps = []
            for c in range(ncomp):
                ssiz = body[36 + 3 * c]
                cs.comps.append(
                    {
                        "depth": (ssiz & 0x7F) + 1,
                        "signed": bool(ssiz & 0x80),
                        "dx": body[37 + 3 * c],
                        "dy": body[38 + 3 * c],
                    }
                )
                if cs.comps[-1]["depth"] > 32:
                    raise ValueError("JPX: depth > 32 unsupported")
        elif marker == _COD:
            cs.cod = _parse_cod(body)
        elif marker == _QCD:
            cs.qcd = body
        elif marker == _COC:
            raise ValueError("JPX: COC component overrides unsupported")
        elif marker == _QCC:
            raise ValueError("JPX: QCC component overrides unsupported")
        elif marker == _RGN:
            # Annex H maxshift ROI: SPrgn raises the component's Mb;
            # decoded magnitudes ≥ 2^SPrgn are ROI and shift back down
            if not cs.comps:
                raise ValueError("JPX: RGN before SIZ")
            crgn = body[0] if len(cs.comps) < 257 else struct.unpack_from(
                ">H", body, 0
            )[0]
            off = 1 if len(cs.comps) < 257 else 2
            srgn = body[off]
            if srgn != 0:
                raise ValueError("JPX: non-maxshift RGN style")
            cs.rgn[crgn] = body[off + 1]
        elif marker == _POC:
            if not cs.comps:
                raise ValueError("JPX: POC before SIZ")
            cs.poc = _parse_poc(body, len(cs.comps))
        elif marker == _PPM:
            # A.7.4 main-header packed headers: Zppm index + data; the
            # Nppm-delimited groups are resolved after the marker walk
            # because they straddle segment boundaries
            cs.ppm.append((body[0], body[1:]))
        elif marker in _SKIPPABLE:
            pass
        else:
            raise ValueError(f"JPX: unexpected marker {marker:#06x}")
        pos += 2 + ln
    if cs.cod is None or cs.qcd is None or not cs.tiles:
        raise ValueError("JPX: incomplete codestream")
    if cs.ppm:
        if any(t["ppt"] for t in cs.tiles.values()):
            raise ValueError("JPX: PPM and PPT are mutually exclusive")
        # one Nppm(4)+data group per tile-part, consumed in the order
        # the tile-parts appear in the codestream (A.7.4)
        stream = b"".join(d for _z, d in sorted(cs.ppm))
        spos = 0
        for t in cs.tp_order:
            if spos + 4 > len(stream):
                raise ValueError("JPX: truncated PPM stream")
            (nppm,) = struct.unpack_from(">I", stream, spos)
            spos += 4
            if spos + nppm > len(stream):
                raise ValueError("JPX: truncated PPM stream")
            cs.tiles[t]["ppm"].extend(stream[spos : spos + nppm])
            spos += nppm
    return cs


# ---------------------------------------------------------------------------
# Tile structure (Annex B): tile-components → resolutions → bands →
# precincts → code-blocks, all as ranges on the shared coordinate
# grids so subsampling and odd offsets fall out of the arithmetic.
# ---------------------------------------------------------------------------


def _band_rect(tcx0, tcx1, tcy0, tcy1, nb, xob, yob):
    hx = (1 << (nb - 1)) * xob if nb else 0
    hy = (1 << (nb - 1)) * yob if nb else 0
    d = 1 << nb
    return (
        _ceil_div(tcx0 - hx, d),
        _ceil_div(tcx1 - hx, d),
        _ceil_div(tcy0 - hy, d),
        _ceil_div(tcy1 - hy, d),
    )


def _build_tile(cs: _Codestream, t: int, cod: _CodingStyle, q: _QuantStyle):
    ntw = _ceil_div(cs.xsiz - cs.xtosiz, cs.xtsiz)
    p, qrow = t % ntw, t // ntw
    tx0 = max(cs.xtosiz + p * cs.xtsiz, cs.xosiz)
    tx1 = min(cs.xtosiz + (p + 1) * cs.xtsiz, cs.xsiz)
    ty0 = max(cs.ytosiz + qrow * cs.ytsiz, cs.yosiz)
    ty1 = min(cs.ytosiz + (qrow + 1) * cs.ytsiz, cs.ysiz)
    n = cod.levels
    comps = []
    for c, comp in enumerate(cs.comps):
        tcx0 = _ceil_div(tx0, comp["dx"])
        tcx1 = _ceil_div(tx1, comp["dx"])
        tcy0 = _ceil_div(ty0, comp["dy"])
        tcy1 = _ceil_div(ty1, comp["dy"])
        resolutions = []
        for r in range(n + 1):
            sh = n - r
            trx0 = _ceil_div(tcx0, 1 << sh)
            trx1 = _ceil_div(tcx1, 1 << sh)
            try0 = _ceil_div(tcy0, 1 << sh)
            try1 = _ceil_div(tcy1, 1 << sh)
            ppx, ppy = cod.precincts[r]
            if trx1 > trx0 and try1 > try0:
                npw = _ceil_div(trx1, 1 << ppx) - (trx0 >> ppx)
                nph = _ceil_div(try1, 1 << ppy) - (try0 >> ppy)
            else:
                npw = nph = 0
            ppx_b = ppx - 1 if r > 0 else ppx
            ppy_b = ppy - 1 if r > 0 else ppy
            xcb = min(cod.xcb, ppx_b)
            ycb = min(cod.ycb, ppy_b)
            if r == 0:
                band_specs = [("LL", n, 0, 0)]
            else:
                nb = n - r + 1
                band_specs = [
                    ("HL", nb, 1, 0), ("LH", nb, 0, 1), ("HH", nb, 1, 1)
                ]
            bands = []
            for bi, (orient, nb, xob, yob) in enumerate(band_specs):
                bx0, bx1, by0, by1 = _band_rect(
                    tcx0, tcx1, tcy0, tcy1, nb, xob, yob
                )
                # quantization parameters for this band
                if r == 0:
                    qidx = 0
                else:
                    qidx = 3 * (r - 1) + bi + 1
                gain = (0, 1, 1, 2)[(xob << 1) | yob] if r > 0 else 0
                if q.style == 1:  # scalar derived
                    eps = q.exponents[0] - n + nb
                    mu = q.mantissas[0]
                else:
                    eps = q.exponents[qidx]
                    mu = q.mantissas[qidx]
                mb = q.guard + eps - 1
                band = {
                    "orient": orient, "x0": bx0, "x1": bx1, "y0": by0,
                    "y1": by1, "eps": eps, "mu": mu, "gain": gain, "mb": mb,
                    "coeff": None, "prec": {},
                }
                # code-blocks, grouped by precinct
                if bx1 > bx0 and by1 > by0:
                    for j in range(by0 >> ycb, _ceil_div(by1, 1 << ycb)):
                        for i in range(bx0 >> xcb, _ceil_div(bx1, 1 << xcb)):
                            cx0 = max(i << xcb, bx0)
                            cx1 = min((i + 1) << xcb, bx1)
                            cy0 = max(j << ycb, by0)
                            cy1 = min((j + 1) << ycb, by1)
                            pcol = (i << xcb) >> ppx_b
                            prow = (j << ycb) >> ppy_b
                            pidx = (pcol - (trx0 >> ppx)) + (
                                prow - (try0 >> ppy)
                            ) * npw
                            pr = band["prec"].setdefault(
                                pidx,
                                {"cbs": [], "i0": None, "j0": None,
                                 "cw": 0, "ch": 0, "incl": None, "zbp": None},
                            )
                            pr["cbs"].append(
                                {
                                    "i": i, "j": j, "x0": cx0, "x1": cx1,
                                    "y0": cy0, "y1": cy1, "included": False,
                                    "zbp": 0, "lblock": 3, "passes": 0,
                                    "chunks": [],
                                }
                            )
                    # tag-tree geometry per precinct: code-block index
                    # span inside (precinct ∩ band)
                    for pidx, pr in band["prec"].items():
                        pcol = pidx % npw + (trx0 >> ppx)
                        prow = pidx // npw + (try0 >> ppy)
                        pbx0 = max(bx0, pcol << ppx_b)
                        pbx1 = min(bx1, (pcol + 1) << ppx_b)
                        pby0 = max(by0, prow << ppy_b)
                        pby1 = min(by1, (prow + 1) << ppy_b)
                        pr["i0"] = pbx0 >> xcb
                        pr["j0"] = pby0 >> ycb
                        pr["cw"] = _ceil_div(pbx1, 1 << xcb) - pr["i0"]
                        pr["ch"] = _ceil_div(pby1, 1 << ycb) - pr["j0"]
                        pr["incl"] = _TagTree(pr["cw"], pr["ch"])
                        pr["zbp"] = _TagTree(pr["cw"], pr["ch"])
                        pr["cbs"].sort(key=lambda cb: (cb["j"], cb["i"]))
                bands.append(band)
            resolutions.append(
                {
                    "r": r, "trx0": trx0, "trx1": trx1, "try0": try0,
                    "try1": try1, "ppx": ppx, "ppy": ppy, "npw": npw,
                    "nph": nph, "bands": bands, "xcb": xcb, "ycb": ycb,
                }
            )
        comps.append(
            {
                "tcx0": tcx0, "tcx1": tcx1, "tcy0": tcy0, "tcy1": tcy1,
                "resolutions": resolutions, "dx": comp["dx"],
                "dy": comp["dy"],
            }
        )
    return {"tx0": tx0, "tx1": tx1, "ty0": ty0, "ty1": ty1, "comps": comps}


def _precinct_positions(tile, cod):
    """(r, y_ref, x_ref, c, pidx) for every precinct — sorting these
    tuples reproduces the positional progressions without walking the
    reference grid sample by sample."""
    out = []
    n = cod.levels
    for c, comp in enumerate(tile["comps"]):
        for res in comp["resolutions"]:
            r = res["r"]
            scale = 1 << (n - r)
            for pidx in range(res["npw"] * res["nph"]):
                pcol = pidx % res["npw"] + (res["trx0"] >> res["ppx"])
                prow = pidx // res["npw"] + (res["try0"] >> res["ppy"])
                px0 = max(res["trx0"], pcol << res["ppx"])
                py0 = max(res["try0"], prow << res["ppy"])
                out.append(
                    (r, py0 * comp["dy"] * scale, px0 * comp["dx"] * scale,
                     c, pidx)
                )
    return out


def _prog_iter(tile, cod, prog, l1, rr, cr):
    """Yield (layer, c, r, pidx) in progression ``prog``, bounded to
    layers [0, l1), resolutions [rr), components [cr) — the full
    ranges reproduce the plain COD orders; POC entries narrow them."""
    rs, re_ = rr
    cs_, ce = cr
    comps = [
        (c, comp) for c, comp in enumerate(tile["comps"]) if cs_ <= c < ce
    ]
    if prog == 0:  # LRCP
        for l in range(l1):
            for r in range(rs, re_):
                for c, comp in comps:
                    res = comp["resolutions"][r]
                    for pidx in range(res["npw"] * res["nph"]):
                        yield (l, c, r, pidx)
    elif prog == 1:  # RLCP
        for r in range(rs, re_):
            for l in range(l1):
                for c, comp in comps:
                    res = comp["resolutions"][r]
                    for pidx in range(res["npw"] * res["nph"]):
                        yield (l, c, r, pidx)
    elif prog == 2:  # RPCL
        for r, _y, _x, c, pidx in sorted(_precinct_positions(tile, cod)):
            if rs <= r < re_ and cs_ <= c < ce:
                for l in range(l1):
                    yield (l, c, r, pidx)
    elif prog == 3:  # PCRL: position, component, resolution, layer
        key = sorted(
            (y, x, c, r, pidx)
            for r, y, x, c, pidx in _precinct_positions(tile, cod)
        )
        for _y, _x, c, r, pidx in key:
            if rs <= r < re_ and cs_ <= c < ce:
                for l in range(l1):
                    yield (l, c, r, pidx)
    elif prog == 4:  # CPRL: component, position, resolution, layer
        key = sorted(
            (c, y, x, r, pidx)
            for r, y, x, c, pidx in _precinct_positions(tile, cod)
        )
        for c, _y, _x, r, pidx in key:
            if rs <= r < re_ and cs_ <= c < ce:
                for l in range(l1):
                    yield (l, c, r, pidx)
    else:
        raise ValueError(f"JPX: unknown progression order {prog}")


def _packet_order(tile, cod, poc=None):
    """Yield (layer, c, r, pidx) in the COD progression order, or —
    with a POC segment — the concatenation of its entries' bounded
    progressions, each packet exactly once (B.12.1.7: packets already
    emitted by an earlier entry are skipped)."""
    nres = cod.levels + 1
    ncomp = len(tile["comps"])
    if not poc:
        yield from _prog_iter(
            tile, cod, cod.prog, cod.layers, (0, nres), (0, ncomp)
        )
        return
    emitted: set[tuple[int, int, int, int]] = set()
    for rs, cs_, lye, re_, ce, pp in poc:
        for tup in _prog_iter(
            tile, cod, pp, min(lye, cod.layers),
            (min(rs, nres), min(re_, nres)), (min(cs_, ncomp), min(ce, ncomp)),
        ):
            if tup not in emitted:
                emitted.add(tup)
                yield tup


def _read_npasses(rd: _HdrReader) -> int:
    """B.10.6 coding-pass count code."""
    if not rd.bit():
        return 1
    if not rd.bit():
        return 2
    v = rd.bits(2)
    if v < 3:
        return 3 + v
    v = rd.bits(5)
    if v < 31:
        return 6 + v
    return 37 + rd.bits(7)


def _write_npasses(hw: _HdrWriter, n: int) -> None:
    if n == 1:
        hw.bit(0)
    elif n == 2:
        hw.bits(0b10, 2)
    elif n <= 5:
        hw.bits(0b11, 2)
        hw.bits(n - 3, 2)
    elif n <= 36:
        hw.bits(0b1111, 4)
        hw.bits(n - 6, 5)
    elif n <= 164:
        hw.bits(0b111111111, 9)
        hw.bits(n - 37, 7)
    else:
        raise ValueError("JPX: too many coding passes")


def _seg_of_pass(k: int, bypass: bool, termall: bool = False) -> int:
    """Codeword-segment index of coding pass ``k`` (D.4.1 + D.6):
    one segment normally; every pass its own segment under termall;
    with selective bypass the first ten passes form segment 0, then
    each plane contributes a raw [SP, MR] segment and an MQ [CU]
    segment (under termall the raw pair splits too)."""
    if termall:
        return k
    if not bypass or k < 10:
        return 0
    q, r = divmod(k - 10, 3)
    return 1 + 2 * q + (0 if r < 2 else 1)


def _pass_is_raw(k: int, bypass: bool) -> bool:
    """True when coding pass ``k`` is a raw (bypassed) SP/MR pass."""
    return bypass and k >= 10 and (k - 10) % 3 < 2


def _piece_split(a: int, b: int, bypass: bool,
                 termall: bool = False) -> list[tuple[int, int]]:
    """Split the pass range [a, b) at codeword-segment boundaries →
    [(segment index, pass count)]. One entry per length field in the
    packet header (B.10.7.5)."""
    pieces: list[tuple[int, int]] = []
    k = a
    while k < b:
        seg = _seg_of_pass(k, bypass, termall)
        n = 1
        while k + n < b and _seg_of_pass(k + n, bypass, termall) == seg:
            n += 1
        pieces.append((seg, n))
        k += n
    return pieces


def _read_packet(data: bytes, pos: int, res: dict, pidx: int, layer: int,
                 sop: bool, eph: bool, style: int = 0,
                 hdr: bytes | None = None, hpos: int = 0,
                 ) -> int | tuple[int, int]:
    """Decode one packet (all bands of ``res`` for precinct ``pidx``)
    at ``pos``; appends body chunks / pass counts to the code-blocks
    and returns the position after the packet body. With ``hdr`` the
    packet HEADER bits come from the PPT packed-header stream at
    ``hpos`` instead (B.10.8) and (body_pos, hdr_pos) returns."""
    if sop and data[pos : pos + 2] == b"\xff\x91":
        pos += 6
    rd = _HdrReader(hdr if hdr is not None else data,
                    hpos if hdr is not None else pos)
    body: list[tuple[dict, int]] = []  # (code-block, byte length)
    if rd.bit():  # non-empty packet
        for band in res["bands"]:
            pr = band["prec"].get(pidx)
            if pr is None:
                continue
            for cb in pr["cbs"]:
                li, lj = cb["i"] - pr["i0"], cb["j"] - pr["j0"]
                if not cb["included"]:
                    if not pr["incl"].decode(rd, li, lj, layer + 1):
                        continue  # not included yet
                    cb["included"] = True
                    cb["zbp"] = pr["zbp"].full_value(rd, li, lj)
                else:
                    if not rd.bit():
                        continue  # no contribution this layer
                npasses = _read_npasses(rd)
                # B.10.7.1: length bits grow via LBlock
                while rd.bit():
                    cb["lblock"] += 1
                    if cb["lblock"] > 32:
                        raise ValueError("JPX: runaway LBlock")
                # one length per codeword-segment piece (B.10.7.5);
                # without bypass/termall that is exactly one field
                pieces = _piece_split(
                    cb["passes"], cb["passes"] + npasses,
                    bool(style & 0x01), bool(style & 0x04),
                )
                lens: list[tuple[int, int]] = []
                for seg, pn in pieces:
                    nbits = cb["lblock"] + int(math.floor(math.log2(pn)))
                    lens.append((seg, rd.bits(nbits)))
                cb["passes"] += npasses
                if cb["passes"] > 120:  # 3 passes × ≤ 37 planes + slack
                    raise ValueError("JPX: coding pass count exceeds planes")
                body.append((cb, lens))
    if hdr is not None:
        hpos = rd.align()
        if eph:
            if hdr[hpos : hpos + 2] != b"\xff\x92":
                raise ValueError("JPX: missing EPH marker")
            hpos += 2
    else:
        pos = rd.align()
        if eph:
            if data[pos : pos + 2] != b"\xff\x92":
                raise ValueError("JPX: missing EPH marker")
            pos += 2
    for cb, lens in body:
        for seg, nbytes in lens:
            if pos + nbytes > len(data):
                raise ValueError("JPX: packet body overruns data")
            cb["chunks"].append((seg, data[pos : pos + nbytes]))
            pos += nbytes
    return (pos, hpos) if hdr is not None else pos


# ---------------------------------------------------------------------------
# Tier-1 (Annex D): per code-block bit-plane coding over the MQ coder.
# Stripes of four rows, columns left to right; three passes per plane
# (significance propagation, magnitude refinement, cleanup) with the
# Table D.1-D.3 context models and the cleanup run-length shortcut.
# State lives in flat per-sample arrays indexed y*w + x.
# ---------------------------------------------------------------------------

_ORIENT_IDX = {"LL": 0, "LH": 0, "HL": 1, "HH": 2}


def _sig_label(h: int, v: int, d: int, orient: int) -> int:
    """Table D.1 significance context (0-8)."""
    if orient != 2:
        if orient == 1:  # HL swaps the roles of H and V
            h, v = v, h
        if h == 2:
            return 8
        if h == 1:
            if v >= 1:
                return 7
            return 6 if d >= 1 else 5
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d
    hv = h + v
    if d >= 3:
        return 8
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv


_SIGN_LUT = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


# 45-entry significance-label LUT per band class, indexed
# (h*3 + v)*5 + min(d, 4) — the incremental neighbor counts replace
# per-sample 8-neighbor scans (the Tier-1 hot path)
_SIG_LUT = [
    bytes(
        _sig_label(hh, vv, dd, orient)
        for hh in range(3)
        for vv in range(3)
        for dd in range(5)
    )
    for orient in range(3)
]


class _T1State:
    def __init__(self, w: int, h: int, orient: str,
                 causal: bool = False) -> None:
        self.w = w
        self.h = h
        self.orient = _ORIENT_IDX[orient]
        self.lut = _SIG_LUT[self.orient]
        self.causal = causal
        n = w * h
        self.sig = bytearray(n)
        self.sgn = bytearray(n)  # 1 = negative
        self.visited = bytearray(n)
        self.refined = bytearray(n)
        self.mag = [0] * n
        # incremental neighbor significance counts, updated on-set
        self.nh = bytearray(n)
        self.nv = bytearray(n)
        self.nd = bytearray(n)

    def _mark_sig(self, x: int, y: int) -> None:
        w, h = self.w, self.h
        i = y * w + x
        self.sig[i] = 1
        nh, nv, nd = self.nh, self.nv, self.nd
        # stripe-causal contexts (D.?): samples in the stripe ABOVE
        # never see significance from the stripe below them
        up_ok = y > 0 and not (self.causal and y % 4 == 0)
        if x > 0:
            nh[i - 1] += 1
        if x < w - 1:
            nh[i + 1] += 1
        if up_ok:
            nv[i - w] += 1
        if y < h - 1:
            nv[i + w] += 1
        if up_ok:
            if x > 0:
                nd[i - w - 1] += 1
            if x < w - 1:
                nd[i - w + 1] += 1
        if y < h - 1:
            if x > 0:
                nd[i + w - 1] += 1
            if x < w - 1:
                nd[i + w + 1] += 1

    def _label(self, i: int) -> int:
        d = self.nd[i]
        return self.lut[(self.nh[i] * 3 + self.nv[i]) * 5 + (d if d < 4 else 4)]

    def _sign_ctx(self, x: int, y: int) -> tuple[int, int]:
        # hot path (one call per becomes-significant sample): the
        # neighbor-contribution helper is inlined — a closure here
        # costs 4 calls per invocation, ~15% of T1 wall
        w, sig, sgn = self.w, self.sig, self.sgn
        i = y * w + x
        hc = vc = 0
        if x > 0 and sig[i - 1]:
            hc = -1 if sgn[i - 1] else 1
        if x < w - 1 and sig[i + 1]:
            hc += -1 if sgn[i + 1] else 1
        if y > 0 and sig[i - w]:
            vc = -1 if sgn[i - w] else 1
        if (
            y < self.h - 1
            and not (self.causal and y % 4 == 3)
            and sig[i + w]
        ):
            vc += -1 if sgn[i + w] else 1
        if hc > 1:
            hc = 1
        elif hc < -1:
            hc = -1
        if vc > 1:
            vc = 1
        elif vc < -1:
            vc = -1
        return _SIGN_LUT[(hc, vc)]


def _t1_decode(
    w: int, h: int, orient: str, segdata: dict[int, bytes], npasses: int,
    max_plane: int, style: int = 0,
) -> tuple[list[int], bytearray, int]:
    """Decode ``npasses`` coding passes → (magnitudes, signs,
    lowest decoded plane). ``segdata`` maps codeword-segment index →
    bytes (one entry, segment 0, unless bypass/termall split the
    stream). ``style`` is the COD code-block style byte: bit 0
    selective bypass (raw stuffed-bit SP/MR from the fifth plane),
    bit 1 context reset at each segment, bit 2 termall (every pass
    its own segment), bit 3 vertical stripe-causal contexts, bit 4
    predictable termination (no decoder action), bit 5 segmentation
    symbols."""
    bypass = bool(style & 0x01)
    reset = bool(style & 0x02)
    termall = bool(style & 0x04)
    causal = bool(style & 0x08)
    segsym = bool(style & 0x20)
    st = _T1State(w, h, orient, causal)
    plane = max_plane
    kind = 2  # 0 = sigprop, 1 = magref, 2 = cleanup (first pass)
    cur_seg = -1
    mq: MQDecoder | None = None
    raw: _HdrReader | None = None
    for k in range(npasses):
        if plane < 0:
            raise ValueError("JPX: coding passes exceed bit planes")
        seg = _seg_of_pass(k, bypass, termall)
        raw_pass = _pass_is_raw(k, bypass)
        if seg != cur_seg:
            cur_seg = seg
            if raw_pass:
                raw = _HdrReader(segdata.get(seg, b""), 0)
            else:
                new = MQDecoder(segdata.get(seg, b""))
                if mq is None or reset:
                    _init_mq(new)
                else:  # contexts persist across codeword segments
                    new.st = mq.st
                mq = new
        if kind == 0:
            if raw_pass:
                _pass_sigprop_raw(st, raw, plane)
            else:
                _pass_sigprop(st, mq, plane)
            kind = 1
        elif kind == 1:
            if raw_pass:
                _pass_magref_raw(st, raw, plane)
            else:
                _pass_magref(st, mq, plane)
            kind = 2
        else:
            _pass_cleanup(st, mq, plane, segsym)
            kind = 0
            plane -= 1
    # lowest fully/partially decoded plane
    last_plane = plane + 1 if kind == 0 else plane
    return st.mag, st.sgn, max(last_plane, 0)


def _pass_sigprop_raw(st: _T1State, rd: _HdrReader, plane: int) -> None:
    """D.6 raw significance propagation: eligibility still follows
    the neighbor contexts, but bits (and signs, 1 = negative) arrive
    unstuffed-raw with no arithmetic coding."""
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd = st.nh, st.nv, st.nd
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if sig[i] or not (nh[i] | nv[i] | nd[i]):
                    continue
                vis[i] = 1
                if rd.bit():
                    st._mark_sig(x, y)
                    st.sgn[i] = rd.bit()
                    st.mag[i] |= 1 << plane


def _pass_magref_raw(st: _T1State, rd: _HdrReader, plane: int) -> None:
    w, h = st.w, st.h
    sig, vis, ref, mag = st.sig, st.visited, st.refined, st.mag
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if not sig[i] or vis[i]:
                    continue
                ref[i] = 1
                mag[i] |= rd.bit() << plane


def _become_sig(st: _T1State, dec: MQDecoder, x: int, y: int, plane: int):
    ctx, xor = st._sign_ctx(x, y)
    bit = dec.decode(ctx)
    i = y * st.w + x
    st._mark_sig(x, y)
    st.sgn[i] = bit ^ xor
    st.mag[i] |= 1 << plane


def _pass_sigprop(st: _T1State, dec: MQDecoder, plane: int) -> None:
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd, lut = st.nh, st.nv, st.nd, st.lut
    decode = dec.decode
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if sig[i] or not (nh[i] | nv[i] | nd[i]):
                    continue
                d = nd[i]
                label = lut[(nh[i] * 3 + nv[i]) * 5 + (d if d < 4 else 4)]
                vis[i] = 1
                if decode(label):
                    _become_sig(st, dec, x, y, plane)


def _pass_magref(st: _T1State, dec: MQDecoder, plane: int) -> None:
    w = st.w
    sig, vis, ref = st.sig, st.visited, st.refined
    nh, nv, nd, mag = st.nh, st.nv, st.nd, st.mag
    decode = dec.decode
    # magref membership (significant and not visited this plane) is
    # FIXED for the whole pass — magref sets neither sig nor vis — so
    # enumerate members once in C (numpy) and loop only over them in
    # stripe-column scan order, instead of testing every sample. The
    # context labels still read live state (ref/neighbors), decisions
    # still interleave in the shared MQ stream: semantics identical.
    members = np.flatnonzero(
        np.frombuffer(sig, np.uint8) & ~np.frombuffer(vis, np.uint8)
    )
    if not len(members):
        return
    ys, xs = members // w, members % w
    order = np.argsort((ys >> 2) * (w << 2) + (xs << 2) + (ys & 3), kind="stable")
    for i in members[order].tolist():
        if ref[i]:
            ctx = 16
        else:
            ctx = 15 if nh[i] | nv[i] | nd[i] else 14
            ref[i] = 1
        mag[i] |= decode(ctx) << plane


def _pass_cleanup(st: _T1State, dec: MQDecoder, plane: int,
                  segsym: bool) -> None:
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd, lut = st.nh, st.nv, st.nd, st.lut
    decode = dec.decode
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            y = y0
            # run-length mode: full stripe column, nothing significant
            # or visited, all four context labels zero
            if ylim - y0 == 4 and _rl_eligible(st, x, y0):
                if not decode(_CX_RL):
                    continue
                y = y0 + ((decode(_CX_UNI) << 1) | decode(_CX_UNI))
                _become_sig(st, dec, x, y, plane)
                y += 1
            while y < ylim:
                i = y * w + x
                if not sig[i] and not vis[i]:
                    d = nd[i]
                    label = lut[(nh[i] * 3 + nv[i]) * 5 + (d if d < 4 else 4)]
                    if decode(label):
                        _become_sig(st, dec, x, y, plane)
                y += 1
    if segsym:
        v = 0
        for _ in range(4):
            v = (v << 1) | dec.decode(_CX_UNI)
        if v != 0b1010:
            raise ValueError("JPX: segmentation symbol mismatch")
    st.visited = bytearray(w * h)


def _rl_eligible(st: _T1State, x: int, y0: int) -> bool:
    w = st.w
    sig, vis = st.sig, st.visited
    nh, nv, nd = st.nh, st.nv, st.nd
    for y in range(y0, y0 + 4):
        i = y * w + x
        if sig[i] or vis[i] or nh[i] | nv[i] | nd[i]:
            return False
    return True


# --- encoder twins ---------------------------------------------------------


def _t1_encode(
    coeffs: np.ndarray, orient: str, style: int = 0,
) -> tuple[list[tuple[int, bytes]], int, int]:
    """Encode a code-block of signed integer coefficients with the
    standard pass sequence down to plane 0 → (segments, npasses, msb)
    where segments is [(segment index, bytes)] (a single segment 0
    without bypass/termall) and msb is the highest magnitude
    bit-plane index (-1 if the block is all zero). ``style`` follows
    the COD code-block style byte (see :func:`_t1_decode`)."""
    bypass = bool(style & 0x01)
    reset = bool(style & 0x02)
    termall = bool(style & 0x04)
    causal = bool(style & 0x08)
    segsym = bool(style & 0x20)
    h, w = coeffs.shape
    mags = np.abs(coeffs)
    maxmag = int(mags.max(initial=0))
    if maxmag == 0:
        return [], 0, -1
    msb = maxmag.bit_length() - 1
    st = _T1State(w, h, orient, causal)
    flat_mag = [int(v) for v in mags.ravel()]
    flat_sgn = bytearray(1 if v < 0 else 0 for v in coeffs.ravel())
    segments: list[tuple[int, bytes]] = []
    state = {"seg": -1, "raw": None}
    enc: MQEncoder | None = None
    raww: _HdrWriter | None = None
    prev_mq: MQEncoder | None = None

    def close_current() -> None:
        if state["seg"] < 0:
            return
        if state["raw"]:
            segments.append((state["seg"], raww.flush()))
        else:
            segments.append((state["seg"], enc.flush()))

    npasses = 0
    kind = 2
    plane = msb
    while plane >= 0:
        seg = _seg_of_pass(npasses, bypass, termall)
        raw_pass = _pass_is_raw(npasses, bypass)
        if seg != state["seg"]:
            close_current()
            if raw_pass:
                raww = _HdrWriter()
            else:
                if enc is not None:
                    prev_mq = enc
                enc = MQEncoder()
                if prev_mq is None or reset:
                    _init_mq(enc)
                else:  # contexts persist across codeword segments
                    enc.st = prev_mq.st
            state["seg"] = seg
            state["raw"] = raw_pass
        if kind == 0:
            if raw_pass:
                _enc_sigprop_raw(st, raww, plane, flat_mag, flat_sgn)
            else:
                _enc_sigprop(st, enc, plane, flat_mag, flat_sgn)
            kind = 1
        elif kind == 1:
            if raw_pass:
                _enc_magref_raw(st, raww, plane, flat_mag)
            else:
                _enc_magref(st, enc, plane, flat_mag)
            kind = 2
        else:
            _enc_cleanup(st, enc, plane, flat_mag, flat_sgn, segsym)
            kind = 0
            plane -= 1
        npasses += 1
    close_current()
    return segments, npasses, msb


def _enc_sigprop_raw(st, raww, plane, flat_mag, flat_sgn):
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd = st.nh, st.nv, st.nd
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if sig[i] or not (nh[i] | nv[i] | nd[i]):
                    continue
                vis[i] = 1
                bit = (flat_mag[i] >> plane) & 1
                raww.bit(bit)
                if bit:
                    st._mark_sig(x, y)
                    st.sgn[i] = flat_sgn[i]
                    st.mag[i] |= 1 << plane
                    raww.bit(flat_sgn[i])


def _enc_magref_raw(st, raww, plane, flat_mag):
    w, h = st.w, st.h
    sig, vis, ref, mag = st.sig, st.visited, st.refined, st.mag
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if not sig[i] or vis[i]:
                    continue
                ref[i] = 1
                bit = (flat_mag[i] >> plane) & 1
                raww.bit(bit)
                mag[i] |= bit << plane


def _enc_sig_sample(st, enc, x, y, plane, flat_mag, flat_sgn):
    i = y * st.w + x
    ctx, xor = st._sign_ctx(x, y)
    enc.encode(flat_sgn[i] ^ xor, ctx)
    st._mark_sig(x, y)
    st.sgn[i] = flat_sgn[i]
    st.mag[i] |= 1 << plane


def _enc_sigprop(st, enc, plane, flat_mag, flat_sgn):
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd, lut = st.nh, st.nv, st.nd, st.lut
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if sig[i] or not (nh[i] | nv[i] | nd[i]):
                    continue
                d = nd[i]
                label = lut[(nh[i] * 3 + nv[i]) * 5 + (d if d < 4 else 4)]
                vis[i] = 1
                bit = (flat_mag[i] >> plane) & 1
                enc.encode(bit, label)
                if bit:
                    _enc_sig_sample(st, enc, x, y, plane, flat_mag, flat_sgn)


def _enc_magref(st, enc, plane, flat_mag):
    w, h = st.w, st.h
    sig, vis, ref = st.sig, st.visited, st.refined
    nh, nv, nd, mag = st.nh, st.nv, st.nd, st.mag
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            for y in range(y0, ylim):
                i = y * w + x
                if not sig[i] or vis[i]:
                    continue
                if ref[i]:
                    ctx = 16
                else:
                    ctx = 15 if nh[i] | nv[i] | nd[i] else 14
                    ref[i] = 1
                bit = (flat_mag[i] >> plane) & 1
                enc.encode(bit, ctx)
                mag[i] |= bit << plane


def _enc_cleanup(st, enc, plane, flat_mag, flat_sgn, segsym):
    w, h = st.w, st.h
    sig, vis = st.sig, st.visited
    nh, nv, nd, lut = st.nh, st.nv, st.nd, st.lut
    for y0 in range(0, h, 4):
        ylim = min(y0 + 4, h)
        for x in range(w):
            y = y0
            if ylim - y0 == 4 and _rl_eligible(st, x, y0):
                bits = [(flat_mag[(y0 + k) * w + x] >> plane) & 1
                        for k in range(4)]
                if not any(bits):
                    enc.encode(0, _CX_RL)
                    continue
                first = bits.index(1)
                enc.encode(1, _CX_RL)
                enc.encode((first >> 1) & 1, _CX_UNI)
                enc.encode(first & 1, _CX_UNI)
                y = y0 + first
                _enc_sig_sample(st, enc, x, y, plane, flat_mag, flat_sgn)
                y += 1
            while y < ylim:
                i = y * w + x
                if not sig[i] and not vis[i]:
                    d = nd[i]
                    label = lut[(nh[i] * 3 + nv[i]) * 5 + (d if d < 4 else 4)]
                    bit = (flat_mag[i] >> plane) & 1
                    enc.encode(bit, label)
                    if bit:
                        _enc_sig_sample(
                            st, enc, x, y, plane, flat_mag, flat_sgn
                        )
                y += 1
    if segsym:
        for b in (1, 0, 1, 0):
            enc.encode(b, _CX_UNI)
    st.visited = bytearray(w * h)


# ---------------------------------------------------------------------------
# Wavelet transforms (Annex F). The 1-D procedures run on interleaved
# signals carrying ABSOLUTE grid parity (odd tile offsets change which
# samples are low-pass), with whole-sample symmetric extension. The
# 9/7 scaling derives from the lifting DC/Nyquist gains: lifting alone
# gives the low-pass a DC gain of exactly K = 1.230174104914001, so
# analysis scales low by 1/K and high by K to hit the Table F.9 gains
# of 1 and 2; synthesis inverts that.
# ---------------------------------------------------------------------------

_K97 = 1.230174104914001
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971


def _refl(k: int, n: int) -> int:
    if n == 1:
        return 0
    period = 2 * (n - 1)
    k %= period
    return k if k < n else period - k


def _sr_rows(Y: np.ndarray, s: int, reversible: bool) -> np.ndarray:
    """Inverse 1-D transform along the last axis; ``s`` is the
    absolute coordinate of column 0 (parity matters)."""
    h, n = Y.shape
    if n == 1:
        if reversible and s % 2 == 1:
            return Y // 2
        return Y.copy()
    m = 4
    idx = np.array([_refl(k, n) for k in range(-m, n + m)])
    X = Y[:, idx].astype(np.int64 if reversible else np.float64)
    ncols = n + 2 * m
    ev0 = s % 2  # column parity matching absolute even coordinates
    od0 = 1 - ev0
    je = np.arange(ev0 + 2 if ev0 == 0 else ev0, ncols - 1, 2)
    jo = np.arange(od0 + 2 if od0 == 0 else od0, ncols - 1, 2)
    if reversible:
        X[:, je] -= (X[:, je - 1] + X[:, je + 1] + 2) >> 2
        X[:, jo] += (X[:, jo - 1] + X[:, jo + 1]) >> 1
    else:
        X[:, ev0::2] *= _K97
        X[:, od0::2] /= _K97
        X[:, je] -= _D97 * (X[:, je - 1] + X[:, je + 1])
        X[:, jo] -= _G97 * (X[:, jo - 1] + X[:, jo + 1])
        X[:, je] -= _B97 * (X[:, je - 1] + X[:, je + 1])
        X[:, jo] -= _A97 * (X[:, jo - 1] + X[:, jo + 1])
    return X[:, m : m + n]


def _sd_rows(X: np.ndarray, s: int, reversible: bool) -> np.ndarray:
    """Forward twin of :func:`_sr_rows`."""
    h, n = X.shape
    if n == 1:
        if reversible and s % 2 == 1:
            return X * 2
        return X.copy()
    m = 4
    idx = np.array([_refl(k, n) for k in range(-m, n + m)])
    Y = X[:, idx].astype(np.int64 if reversible else np.float64)
    ncols = n + 2 * m
    ev0 = s % 2
    od0 = 1 - ev0
    je = np.arange(ev0 + 2 if ev0 == 0 else ev0, ncols - 1, 2)
    jo = np.arange(od0 + 2 if od0 == 0 else od0, ncols - 1, 2)
    if reversible:
        Y[:, jo] -= (Y[:, jo - 1] + Y[:, jo + 1]) >> 1
        Y[:, je] += (Y[:, je - 1] + Y[:, je + 1] + 2) >> 2
    else:
        Y[:, jo] += _A97 * (Y[:, jo - 1] + Y[:, jo + 1])
        Y[:, je] += _B97 * (Y[:, je - 1] + Y[:, je + 1])
        Y[:, jo] += _G97 * (Y[:, jo - 1] + Y[:, jo + 1])
        Y[:, je] += _D97 * (Y[:, je - 1] + Y[:, je + 1])
        Y[:, ev0::2] /= _K97
        Y[:, od0::2] *= _K97
    return Y[:, m : m + n]


def _interleave(ll, hl, lh, hh, u0, v0, w, h, reversible):
    Y = np.zeros((h, w), dtype=np.int64 if reversible else np.float64)
    ex, ey = u0 % 2, v0 % 2
    ox, oy = 1 - ex, 1 - ey
    Y[ey::2, ex::2] = ll
    Y[ey::2, ox::2] = hl
    Y[oy::2, ex::2] = lh
    Y[oy::2, ox::2] = hh
    return Y


def _synthesize(ll, hl, lh, hh, u0, u1, v0, v1, reversible):
    """One 2D_SR level: interleave, rows, then columns (F.3.4)."""
    Y = _interleave(ll, hl, lh, hh, u0, v0, u1 - u0, v1 - v0, reversible)
    Y = _sr_rows(Y, u0, reversible)
    Y = _sr_rows(np.ascontiguousarray(Y.T), v0, reversible).T
    return Y


def _decompose(X, u0, u1, v0, v1, reversible):
    """Forward 2D level → (ll, hl, lh, hh)."""
    Y = _sd_rows(np.ascontiguousarray(X.T), v0, reversible).T
    Y = _sd_rows(Y, u0, reversible)
    ex, ey = u0 % 2, v0 % 2
    ox, oy = 1 - ex, 1 - ey
    return (Y[ey::2, ex::2], Y[ey::2, ox::2], Y[oy::2, ex::2],
            Y[oy::2, ox::2])


# ---------------------------------------------------------------------------
# Tile decode: Tier-1 each code-block into band coefficients,
# dequantize (E.1), synthesize resolutions bottom-up.
# ---------------------------------------------------------------------------


def _decode_tile_comp(comp: dict, cod: _CodingStyle, reversible: bool,
                      roi_shift: int = 0):
    style = cod.cbstyle
    for res in comp["resolutions"]:
        for band in res["bands"]:
            bw = max(band["x1"] - band["x0"], 0)
            bh = max(band["y1"] - band["y0"], 0)
            coeff = np.zeros(
                (bh, bw), dtype=np.int64 if reversible else np.float64
            )
            band["coeff"] = coeff
            if bw <= 0 or bh <= 0:
                continue
            mb = band["mb"] + roi_shift
            if not reversible:
                rb = band["depth"] + band["gain"]
                delta = (2.0 ** (rb - band["eps"])) * (
                    1 + band["mu"] / 2048.0
                )
            for pr in band["prec"].values():
                for cb in pr["cbs"]:
                    if not cb["included"] or cb["passes"] == 0:
                        continue
                    segdata: dict[int, bytes] = {}
                    for seg, chunk in cb["chunks"]:
                        segdata[seg] = segdata.get(seg, b"") + chunk
                    max_plane = mb - 1 - cb["zbp"]
                    if max_plane < 0:
                        raise ValueError("JPX: zero bitplanes exceed Mb")
                    w = cb["x1"] - cb["x0"]
                    h = cb["y1"] - cb["y0"]
                    mag, sgn, last_plane = _t1_decode(
                        w, h, band["orient"], segdata, cb["passes"],
                        max_plane, style,
                    )
                    vals = np.array(mag, dtype=np.int64).reshape(h, w)
                    if last_plane > 0:
                        # midpoint reconstruction for truncated planes
                        vals = np.where(
                            vals != 0, vals + (1 << (last_plane - 1)), 0
                        )
                    if roi_shift:
                        # Annex H maxshift: magnitudes at or above
                        # 2^SPrgn are ROI, scaled back down
                        vals = np.where(
                            vals >= (1 << roi_shift),
                            vals >> roi_shift, vals,
                        )
                    signs = np.frombuffer(bytes(sgn), np.uint8).reshape(h, w)
                    out = np.where(signs == 1, -vals, vals)
                    if not reversible:
                        out = out.astype(np.float64) * delta
                    coeff[
                        cb["y0"] - band["y0"] : cb["y1"] - band["y0"],
                        cb["x0"] - band["x0"] : cb["x1"] - band["x0"],
                    ] = out
    # multilevel synthesis
    res0 = comp["resolutions"][0]
    ll = res0["bands"][0]["coeff"]
    for res in comp["resolutions"][1:]:
        hl, lh, hh = (b["coeff"] for b in res["bands"])
        ll = _synthesize(
            ll, hl, lh, hh, res["trx0"], res["trx1"], res["try0"],
            res["try1"], reversible,
        )
    return ll


def _unwrap_jp2(data: bytes) -> bytes:
    if data[:4] == b"\xff\x4f\xff\x51":
        return data
    if len(data) >= 12 and data[4:8] == b"jP  ":
        pos = 0
        while pos + 8 <= len(data):
            (lbox,) = struct.unpack_from(">I", data, pos)
            tbox = data[pos + 4 : pos + 8]
            hlen = 8
            if lbox == 1:
                (lbox,) = struct.unpack_from(">Q", data, pos + 8)
                hlen = 16
            end = len(data) if lbox == 0 else pos + lbox
            if tbox == b"jp2c":
                return data[pos + hlen : end]
            if end <= pos:  # malformed box length: never walk backwards
                raise ValueError("JPX: malformed box length")
            pos = end
        raise ValueError("JPX: no jp2c codestream box")
    raise ValueError("JPX: neither a codestream nor a JP2 container")


def decode_jpx(data: bytes) -> np.ndarray:
    """JPEG 2000 → (h, w) or (h, w, n) array of unsigned samples
    (uint8 for depths ≤ 8, uint16 to 16, uint32 above)."""
    data = _unwrap_jp2(bytes(data))
    cs = _parse_codestream(data)
    gw = cs.xsiz - cs.xosiz
    gh = cs.ysiz - cs.yosiz
    planes = []
    for comp in cs.comps:
        cw = _ceil_div(cs.xsiz, comp["dx"]) - _ceil_div(cs.xosiz, comp["dx"])
        ch = _ceil_div(cs.ysiz, comp["dy"]) - _ceil_div(cs.yosiz, comp["dy"])
        planes.append(np.zeros((ch, cw), dtype=np.float64))
    ntiles = _ceil_div(cs.xsiz - cs.xtosiz, cs.xtsiz) * _ceil_div(
        cs.ysiz - cs.ytosiz, cs.ytsiz
    )
    mct = None
    for t, tile_entry in sorted(cs.tiles.items()):
        if t >= ntiles:
            raise ValueError("JPX: tile index out of range")
        cod = tile_entry["cod"] or cs.cod
        qbody = tile_entry["qcd"] or cs.qcd
        q = _parse_qcd(qbody, cod.levels)
        reversible = cod.transform == 1
        if q.style == 0 and not reversible:
            raise ValueError("JPX: reversible quantization with 9/7")
        mct = cod.mct if mct is None else mct
        tile = _build_tile(cs, t, cod, q)
        for c, comp in enumerate(tile["comps"]):
            for res in comp["resolutions"]:
                for band in res["bands"]:
                    band["depth"] = cs.comps[c]["depth"]
        tdata = bytes(tile_entry["data"])
        pos = 0
        ppt = tile_entry.get("ppt") or []
        if ppt:
            hdr = b"".join(d for _z, d in sorted(ppt))
        elif tile_entry.get("ppm"):
            hdr = bytes(tile_entry["ppm"])
        else:
            hdr = None
        hpos = 0
        poc = tile_entry.get("poc") or cs.poc
        for layer, c, r, pidx in _packet_order(tile, cod, poc):
            res = tile["comps"][c]["resolutions"][r]
            if hdr is not None:
                pos, hpos = _read_packet(
                    tdata, pos, res, pidx, layer, cod.sop, cod.eph,
                    cod.cbstyle, hdr, hpos,
                )
            else:
                pos = _read_packet(tdata, pos, res, pidx, layer, cod.sop,
                                   cod.eph, cod.cbstyle)
        for c, comp in enumerate(tile["comps"]):
            vals = _decode_tile_comp(comp, cod, reversible,
                                     cs.rgn.get(c, 0))
            x0 = comp["tcx0"] - _ceil_div(cs.xosiz, cs.comps[c]["dx"])
            y0 = comp["tcy0"] - _ceil_div(cs.yosiz, cs.comps[c]["dy"])
            planes[c][
                y0 : y0 + vals.shape[0], x0 : x0 + vals.shape[1]
            ] = vals
    # multiple-component transform over the first three components
    if mct and len(planes) >= 3:
        y, u, v = planes[0], planes[1], planes[2]
        if cs.cod.transform == 1:  # RCT (reversible)
            g = y - np.floor((u + v) / 4.0)
            r = v + g
            b = u + g
        else:  # ICT
            r = y + 1.402 * v
            g = y - 0.344136 * u - 0.714136 * v
            b = y + 1.772 * u
        planes[0], planes[1], planes[2] = r, g, b
    out_planes = []
    maxdepth = 0
    for c, comp in enumerate(cs.comps):
        depth = comp["depth"]
        maxdepth = max(maxdepth, depth)
        p = planes[c]
        if not comp["signed"]:
            p = p + (1 << (depth - 1))
        p = np.clip(np.round(p), 0, (1 << depth) - 1)
        if comp["dx"] > 1 or comp["dy"] > 1:
            p = np.repeat(np.repeat(p, comp["dy"], 0), comp["dx"], 1)
            p = p[:gh, :gw]
            if p.shape != (gh, gw):
                p = np.pad(p, ((0, gh - p.shape[0]), (0, gw - p.shape[1])),
                           mode="edge")
        out_planes.append(p)
    if maxdepth <= 8:
        dt = np.uint8
    elif maxdepth <= 16:
        dt = np.uint16
    else:
        dt = np.uint32
    if len(out_planes) == 1:
        return out_planes[0].astype(dt)
    return np.stack(out_planes, axis=-1).astype(dt)


# ---------------------------------------------------------------------------
# Encoder twin: the plain codestream shape real lossless encoders
# emit — single tile at origin, one quality layer, LRCP, default
# precincts, no subsampling. 5/3 + RCT when ``reversible`` (bit-exact
# round-trip); 9/7 + ICT otherwise (Δb = 1 fine quantization).
# ---------------------------------------------------------------------------


def _quant_eps(depth: int, gain: int) -> int:
    return depth + gain


def encode_j2k(
    img: np.ndarray,
    levels: int = 2,
    cb_exp: tuple[int, int] = (5, 5),
    reversible: bool = True,
    guard: int = 2,
    segsym: bool = False,
    prog: int = 0,
    layers: int = 1,
    precinct_exp: tuple[int, int] | None = None,
    sop: bool = False,
    eph: bool = False,
    tile_size: tuple[int, int] | None = None,
    bypass: bool = False,
    reset: bool = False,
    termall: bool = False,
    causal: bool = False,
    roi: bool = False,
    ppt: bool = False,
    ppm: bool = False,
    poc: list[tuple[int, int, int, int, int, int]] | None = None,
    depth: int | None = None,
) -> bytes:
    """Encode (h, w) or (h, w, 3) uint8/uint16 → raw JPEG 2000
    codestream. Beyond the plain shape, options exist to emit the
    structures the decoder must handle from real encoders: RLCP/RPCL
    progressions, two quality layers (the second layer carries the
    tail passes, and code-blocks on odd grid diagonals join late to
    exercise per-layer inclusion), custom precinct sizes, SOP/EPH
    marker segments and multiple tiles."""
    img = np.asarray(img)
    if img.ndim == 2:
        comps = [img.astype(np.int64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        comps = [img[:, :, k].astype(np.int64) for k in range(3)]
    else:
        raise ValueError("encode_j2k: expects (h,w) or (h,w,3)")
    if depth is None:
        depth = {1: 8, 2: 16, 4: 28}.get(img.dtype.itemsize, 8)
    # eps = depth + gain must fit the 5-bit QCD exponent field
    if not 1 <= depth <= 28:
        raise ValueError("encode_j2k: depth must be 1..28")
    if int(img.max(initial=0)) >= 1 << depth:
        raise ValueError("encode_j2k: samples exceed the stated depth")
    if ppm and ppt:
        raise ValueError("encode_j2k: PPM and PPT are mutually exclusive")
    h, w = comps[0].shape
    # DC level shift + component transform
    comps = [c - (1 << (depth - 1)) for c in comps]
    mct = 1 if len(comps) == 3 else 0
    if mct:
        r, g, b = comps
        if reversible:  # RCT
            yy = (r + 2 * g + b) >> 2
            u = b - g
            v = r - g
            comps = [yy, u, v]
        else:  # ICT
            rf, gf, bf = (c.astype(np.float64) for c in (r, g, b))
            yy = 0.299 * rf + 0.587 * gf + 0.114 * bf
            u = -0.168736 * rf - 0.331264 * gf + 0.5 * bf
            v = 0.5 * rf - 0.418688 * gf - 0.081312 * bf
            comps = [yy, u, v]
    if layers not in (1, 2):
        raise ValueError("encode_j2k: layers must be 1 or 2")
    xcb, ycb = cb_exp
    cod = _CodingStyle()
    cod.prog = prog
    cod.layers = layers
    cod.mct = mct
    cod.levels = levels
    cod.xcb, cod.ycb = xcb, ycb
    cod.cbstyle = (
        (0x01 if bypass else 0)
        | (0x02 if reset else 0)
        | (0x04 if termall else 0)
        | (0x08 if causal else 0)
        | (0x20 if segsym else 0)
    )
    cod.transform = 1 if reversible else 0
    cod.precincts = [precinct_exp or (15, 15)] * (levels + 1)
    cod.sop = sop
    cod.eph = eph
    q = _QuantStyle()
    q.guard = guard
    if reversible:
        q.style = 0
        q.exponents = []
        q.mantissas = []
        for r in range(levels + 1):
            if r == 0:
                q.exponents.append(_quant_eps(depth, 0))
                q.mantissas.append(0)
            else:
                for gain in (1, 1, 2):  # HL, LH, HH
                    q.exponents.append(_quant_eps(depth, gain))
                    q.mantissas.append(0)
    else:
        q.style = 2  # scalar expounded, Δb = 1 (μ = 0, ε = Rb)
        q.exponents = []
        q.mantissas = []
        for r in range(levels + 1):
            gains = (0,) if r == 0 else (1, 1, 2)
            for gain in gains:
                q.exponents.append(_quant_eps(depth, gain))
                q.mantissas.append(0)
    # SIZ-equivalent geometry
    tw, th = tile_size or (w, h)
    cs = _Codestream()
    cs.xsiz, cs.ysiz, cs.xosiz, cs.yosiz = w, h, 0, 0
    cs.xtsiz, cs.ytsiz, cs.xtosiz, cs.ytosiz = tw, th, 0, 0
    cs.comps = [
        {"depth": depth, "signed": False, "dx": 1, "dy": 1}
        for _ in comps
    ]
    cs.cod = cod
    cs.qcd = b""
    cs.tiles = {}
    ntiles = _ceil_div(w, tw) * _ceil_div(h, th)
    # markers
    out = bytearray()
    out += struct.pack(">H", _SOC)
    siz = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, tw, th, 0, 0, len(comps)
    )
    for _ in comps:
        siz += bytes([depth - 1, 1, 1])
    out += struct.pack(">HH", _SIZ, len(siz) + 2) + siz
    scod = (1 if precinct_exp else 0) | (2 if sop else 0) | (4 if eph else 0)
    codb = bytes([scod, cod.prog]) + struct.pack(">H", layers) + bytes(
        [mct, levels, xcb - 2, ycb - 2, cod.cbstyle, cod.transform]
    )
    if precinct_exp:
        ppx, ppy = precinct_exp
        codb += bytes([ppx | (ppy << 4)] * (levels + 1))
    out += struct.pack(">HH", _COD, len(codb) + 2) + codb
    if poc:
        pocb = b"".join(
            bytes([rs, cs_]) + struct.pack(">H", lye) + bytes([re_, ce & 0xFF, pp])
            for rs, cs_, lye, re_, ce, pp in poc
        )
        out += struct.pack(">HH", _POC, len(pocb) + 2) + pocb
    if q.style == 0:
        qcdb = bytes([(q.guard << 5) | 0]) + bytes(
            e << 3 for e in q.exponents
        )
    else:
        qcdb = bytes([(q.guard << 5) | 2])
        for e, mu in zip(q.exponents, q.mantissas):
            qcdb += struct.pack(">H", (e << 11) | mu)
    out += struct.pack(">HH", _QCD, len(qcdb) + 2) + qcdb
    roi_out: dict[int, int] | None = None
    if roi:
        if ntiles != 1:
            raise ValueError("encode_j2k: ROI fixture is single-tile")
        roi_out = {}
    capture = ppt or ppm
    results = [
        _encode_tile(cs, t, cod, q, comps, reversible, roi_out, capture, poc)
        for t in range(ntiles)
    ]
    bodies = [(r if not capture else r[0]) for r in results]
    hdrs = [(None if not capture else r[1]) for r in results]
    if roi_out:
        # Annex H maxshift: one RGN marker per shifted component
        for c, shift in sorted(roi_out.items()):
            rgn = bytes([c, 0, shift])
            out += struct.pack(">HH", _RGN, len(rgn) + 2) + rgn
    if ppm:
        # A.7.4: Nppm(4)+headers per tile-part, concatenated then split
        # into Zppm-ordered main-header segments at the marker limit
        stream = b"".join(
            struct.pack(">I", len(h)) + h for h in hdrs
        )
        zppm = 0
        while True:
            piece, stream = stream[:65000], stream[65000:]
            out += struct.pack(">HHB", _PPM, len(piece) + 3, zppm) + piece
            zppm += 1
            if not stream:
                break
    for t, body in enumerate(bodies):
        pptseg = b""
        if ppt and hdrs[t] is not None:
            # PPT segments in the tile-part header, split at the
            # 16-bit marker-length limit (Zppt orders the pieces)
            hd = hdrs[t]
            zppt = 0
            while True:
                piece, hd = hd[:65000], hd[65000:]
                pptseg += struct.pack(
                    ">HHB", _PPT, len(piece) + 3, zppt
                ) + piece
                zppt += 1
                if not hd:
                    break
        psot = 12 + len(pptseg) + 2 + len(body)
        out += struct.pack(">HHHIBB", _SOT, 10, t, psot, 0, 1)
        out += pptseg
        out += struct.pack(">H", _SOD)
        out += body
    out += struct.pack(">H", _EOC)
    return bytes(out)


def _encode_tile(cs, t, cod, q, comps, reversible,
                 roi_out: dict[int, int] | None = None,
                 ppt: bool = False, poc=None):
    tile = _build_tile(cs, t, cod, q)
    levels = cod.levels
    # forward DWT per component, scatter into band coeff arrays
    for c, samples in enumerate(comps):
        comp = tile["comps"][c]
        ll = samples[
            comp["tcy0"] : comp["tcy1"], comp["tcx0"] : comp["tcx1"]
        ]
        levels_bands = []  # [(hl, lh, hh)] finest→coarsest
        for r in range(levels, 0, -1):
            res = comp["resolutions"][r]
            ll, hl, lh, hh = _decompose(
                ll, res["trx0"], res["trx1"], res["try0"], res["try1"],
                reversible,
            )
            levels_bands.append((hl, lh, hh))
        comp["resolutions"][0]["bands"][0]["coeff"] = ll
        for k, (hl, lh, hh) in enumerate(levels_bands):
            res = comp["resolutions"][levels - k]
            for band, arr in zip(res["bands"], (hl, lh, hh)):
                band["coeff"] = arr
    if roi_out is not None:
        # maxshift ROI fixture: the top-left quadrant of every band is
        # the region; s = max magnitude bits of the BACKGROUND so the
        # scaled-up ROI sits strictly above it (Annex H requirement)
        for c, comp in enumerate(tile["comps"]):
            s_bits = 1
            quads = []
            for res in comp["resolutions"]:
                for band in res["bands"]:
                    coeff = band["coeff"]
                    if coeff is None or coeff.size == 0:
                        continue
                    if not reversible:
                        coeff = np.round(coeff).astype(np.int64)
                        band["coeff"] = coeff
                    bh, bw = coeff.shape
                    mask = np.zeros((bh, bw), dtype=bool)
                    mask[: max(bh // 2, 1), : max(bw // 2, 1)] = True
                    bg = np.abs(coeff[~mask])
                    if bg.size:
                        s_bits = max(s_bits, int(bg.max()).bit_length())
                    quads.append((band, mask))
            for band, mask in quads:
                band["coeff"] = np.where(
                    mask, band["coeff"] << s_bits, band["coeff"]
                )
            roi_out[c] = s_bits
    # Tier-1 encode every code-block; two-layer mode assigns tail
    # passes to layer 1 and delays odd-diagonal code-blocks entirely
    # (with bypass/termall, contributions stay whole — segment-aligned
    # splits are the encoder's choice and wholeness keeps it simple)
    style = cod.cbstyle
    multiseg = bool(style & 0x05)
    for c, comp in enumerate(tile["comps"]):
        for res in comp["resolutions"]:
            for band in res["bands"]:
                coeff = band["coeff"]
                if coeff is None:
                    continue
                if not reversible:
                    coeff = np.round(coeff).astype(np.int64)
                mb = q.guard + band["eps"] - 1
                if roi_out is not None:
                    mb += roi_out.get(c, 0)
                for pr in band["prec"].values():
                    for cb in pr["cbs"]:
                        block = coeff[
                            cb["y0"] - band["y0"] : cb["y1"] - band["y0"],
                            cb["x0"] - band["x0"] : cb["x1"] - band["x0"],
                        ]
                        segments, npasses, msb = _t1_encode(
                            block, band["orient"], style
                        )
                        if msb >= mb:
                            raise ValueError("JPX encode: Mb too small")
                        cb["enc_segments"] = segments
                        cb["enc_passes"] = npasses
                        cb["enc_zbp"] = mb - 1 - msb if msb >= 0 else None
                        cb["enc_lblock"] = 3
                        if (cod.layers == 1 or cb["enc_zbp"] is None
                                or multiseg):
                            cb["first_layer"] = 0
                            cb["layer_split"] = None
                        elif (cb["i"] + cb["j"]) % 2:
                            cb["first_layer"] = 1  # joins in layer 1
                            cb["layer_split"] = None
                        else:
                            cb["first_layer"] = 0
                            total = sum(len(b) for _s, b in segments)
                            if npasses > 1:
                                p0 = max(1, npasses // 2)
                                b0 = max(1, total * p0 // npasses)
                                cb["layer_split"] = (p0, b0)
                            else:
                                cb["layer_split"] = None
    body = bytearray()
    hdrbuf = bytearray()
    nsop = 0
    for layer, c, r, pidx in _packet_order(tile, cod, poc):
        res = tile["comps"][c]["resolutions"][r]
        hw = _HdrWriter()
        contributing: list[tuple[dict, bytes]] = []
        has_cbs = any(
            band["prec"].get(pidx, {}).get("cbs") for band in res["bands"]
        )
        hw.bit(1 if has_cbs else 0)
        for band in res["bands"]:
            pr = band["prec"].get(pidx)
            if pr is None or not pr["cbs"]:
                continue
            if "enc_incl" not in pr:
                incl_leaves = {}
                zbp_leaves = {}
                for cb in pr["cbs"]:
                    key = (cb["i"] - pr["i0"], cb["j"] - pr["j0"])
                    if cb["enc_zbp"] is None:
                        incl_leaves[key] = cod.layers  # never included
                        zbp_leaves[key] = 0
                    else:
                        incl_leaves[key] = cb["first_layer"]
                        zbp_leaves[key] = cb["enc_zbp"]
                pr["enc_incl"] = _TagTreeEnc(pr["cw"], pr["ch"], incl_leaves)
                pr["enc_zbp"] = _TagTreeEnc(pr["cw"], pr["ch"], zbp_leaves)
            for cb in pr["cbs"]:
                li, lj = cb["i"] - pr["i0"], cb["j"] - pr["j0"]
                included = cb["enc_zbp"] is not None
                first_here = included and cb["first_layer"] == layer
                already = included and cb["first_layer"] < layer
                if not already:
                    pr["enc_incl"].encode(hw, li, lj, layer + 1)
                    if not first_here:
                        continue
                    t_ = 1
                    while not pr["enc_zbp"].emitted[0].get((li, lj), False):
                        pr["enc_zbp"].encode(hw, li, lj, t_)
                        t_ += 1
                else:
                    contributes = cb["layer_split"] is not None
                    hw.bit(1 if contributes else 0)
                    if not contributes:
                        continue
                # passes + data pieces for this layer: one length per
                # codeword segment (bypass), else one for the whole
                # contribution — mirroring _read_packet's _piece_split
                whole = b"".join(b for _s, b in cb["enc_segments"])
                if cb["layer_split"] is None:
                    npasses = cb["enc_passes"]
                    if multiseg:
                        pieces = [
                            (pn, dict(cb["enc_segments"]).get(seg, b""))
                            for seg, pn in _piece_split(
                                0, npasses, bool(style & 0x01),
                                bool(style & 0x04),
                            )
                        ]
                    else:
                        pieces = [(npasses, whole)]
                elif layer == cb["first_layer"]:
                    p0, b0 = cb["layer_split"]
                    npasses = p0
                    pieces = [(p0, whole[:b0])]
                else:
                    p0, b0 = cb["layer_split"]
                    npasses = cb["enc_passes"] - p0
                    pieces = [(npasses, whole[b0:])]
                _write_npasses(hw, npasses)
                extra = max(
                    (
                        len(b).bit_length()
                        - cb["enc_lblock"]
                        - int(math.floor(math.log2(pn)))
                        for pn, b in pieces
                    ),
                    default=0,
                )
                extra = max(0, extra)
                for _ in range(extra):
                    hw.bit(1)
                cb["enc_lblock"] += extra
                hw.bit(0)
                for pn, b in pieces:
                    hw.bits(
                        len(b),
                        cb["enc_lblock"] + int(math.floor(math.log2(pn))),
                    )
                contributing.append((cb, b"".join(b for _pn, b in pieces)))
        full = hw.flush()
        if cod.sop:
            body += struct.pack(">HHH", _SOP, 4, nsop & 0xFFFF)
            nsop += 1
        if ppt:
            hdrbuf += full
            if cod.eph:
                hdrbuf += struct.pack(">H", _EPH)
        else:
            body += full
            if cod.eph:
                body += struct.pack(">H", _EPH)
        for cb, chunk in contributing:
            body.extend(chunk)
    if ppt:
        return bytes(body), bytes(hdrbuf)
    return bytes(body)


def wrap_jp2(codestream: bytes) -> bytes:
    """Minimal JP2 container around a raw codestream (signature,
    ftyp, and jp2c boxes — the shape PDF /JPXDecode streams use when
    they are not bare codestreams)."""
    sig = struct.pack(">I", 12) + b"jP  " + b"\x0d\x0a\x87\x0a"
    ftyp = struct.pack(">I", 20) + b"ftyp" + b"jp2 " + struct.pack(">I", 0) + b"jp2 "
    jp2c = struct.pack(">I", 8 + len(codestream)) + b"jp2c" + codestream
    return sig + ftyp + jp2c
