"""MQ arithmetic coder (ITU-T T.88 Annex E — the adaptive binary
arithmetic coder JBIG2 shares with JPEG 2000).

The 47-row probability state table below is the spec's Table E.1
(Qe, NMPS, NLPS, SWITCH) — spec constants every MQ codec must
contain, like the T.4 run tables in ``functions/ccitt.py``. Encoder
and decoder are independent implementations of the Annex E flowcharts
(CODEMPS/CODELPS/BYTEOUT/FLUSH and DECODE/BYTEIN respectively); their
agreement is pinned by round-trip fuzz across context mixes in
``tests/test_jbig2.py`` — an error in either side breaks the
round-trip because they share only the state table.

Context state (index into the table + current MPS sense) is held per
caller-supplied context id, as JBIG2 generic-region coding requires
(one adaptive state per 16-bit pixel template context).
"""

from __future__ import annotations

# Table E.1 — (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """Annex E decoder (INITDEC / DECODE / BYTEIN).

    Context state is ONE dict mapping cx → (index << 1) | MPS — a
    single lookup/store per decision instead of two. DECODE inlines
    RENORMD/BYTEIN and runs on locals: the MQ interval update is a
    strict serial dependency (each decision's (a, c) feeds the next),
    so the only Python-level lever is per-decision overhead — this
    shape measures ~1.9× the two-dict/helper-call version on the T1
    decode mix (BENCH.md §2b-bis)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.st: dict[int, int] = {}
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _b(self, k: int = 0) -> int:
        j = self.bp + k
        return self.data[j] if j < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._b() == 0xFF:
            if self._b(1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._b() << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._b() << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        st = self.st
        s = st.get(cx, 0)
        qe, nmps, nlps, switch = _QE[s >> 1]
        mps = s & 1
        a = self.a - qe
        c = self.c
        if ((c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if a < qe:
                d = mps
                st[cx] = (nmps << 1) | mps
            else:
                d = 1 - mps
                st[cx] = (nlps << 1) | (mps ^ switch)
            a = qe
        else:
            c -= qe << 16
            if a & 0x8000:
                self.a = a
                self.c = c
                return mps
            if a < qe:
                d = 1 - mps
                st[cx] = (nlps << 1) | (mps ^ switch)
            else:
                d = mps
                st[cx] = (nmps << 1) | mps
        # RENORMD with BYTEIN inlined, on locals
        ct = self.ct
        bp = self.bp
        data = self.data
        n = len(data)
        while True:
            if ct == 0:
                b0 = data[bp] if bp < n else 0xFF
                if b0 == 0xFF:
                    b1 = data[bp + 1] if bp + 1 < n else 0xFF
                    if b1 > 0x8F:
                        c += 0xFF00
                        ct = 8
                    else:
                        bp += 1
                        c += b1 << 9
                        ct = 7
                else:
                    bp += 1
                    c += (data[bp] if bp < n else 0xFF) << 8
                    ct = 8
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct
        self.bp = bp
        return d


class MQEncoder:
    """Annex E encoder (INITENC / CODEMPS / CODELPS / BYTEOUT /
    FLUSH)."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: int | None = None  # pending byte
        self.out = bytearray()
        self.st: dict[int, int] = {}  # cx → (index << 1) | MPS

    def encode(self, d: int, cx: int) -> None:
        s = self.st.get(cx, 0)
        qe, nmps, nlps, switch = _QE[s >> 1]
        mps = s & 1
        if d == mps:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.st[cx] = (nmps << 1) | mps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            self.st[cx] = (nlps << 1) | (mps ^ switch)
            self._renorm()

    def _renorm(self) -> None:
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def _emit(self, byte: int) -> None:
        if self.b is not None:
            self.out.append(self.b)
        self.b = byte

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self._emit((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self._emit((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                # carry into the pending byte
                if self.b is not None:
                    self.b += 1
                if self.b == 0x100:
                    # carry ripples into already-emitted bytes
                    self.b = 0
                    k = len(self.out) - 1
                    while k >= 0:
                        self.out[k] = (self.out[k] + 1) & 0xFF
                        if self.out[k] != 0:
                            break
                        k -= 1
                if self.b == 0xFF:
                    self.c &= 0x7FFFFFF
                    self._emit((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self.c &= 0x7FFFFFF
                    self._emit((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a - 1
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        if self.b is not None and self.b != 0xFF:
            self.out.append(self.b)
        self.b = None
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Arithmetic integer decoding procedure IAx (T.88 Annex A.2) and the
# symbol-ID variant IAID (A.3) — the building blocks JBIG2 symbol
# dictionaries and text regions decode their parameters with. Each
# procedure owns a private context space (PREV-indexed states inside
# the shared MQ coder), so callers allocate one context-id BASE per
# procedure instance; ids never collide with the 16-bit pixel
# contexts because callers offset them past 1 << 16.
# ---------------------------------------------------------------------------

_IA_RANGES = [  # (leading-1 count, value bits, offset)
    (0, 2, 0),
    (1, 4, 4),
    (2, 6, 20),
    (3, 8, 84),
    (4, 12, 340),
    (5, 32, 4436),
]

OOB = object()  # out-of-band marker (A.2: S=1, V=0)


class IntArithCodec:
    """One IAx procedure instance over a shared MQ coder. ``base``
    offsets this instance's 512-entry PREV context space."""

    def __init__(self, base: int) -> None:
        self.base = base

    def _next_prev(self, prev: int, bit: int) -> int:
        return (
            ((prev << 1) | bit)
            if prev < 256
            else ((((prev << 1) | bit) & 511) | 256)
        )

    def decode(self, mq: "MQDecoder"):
        prev = 1
        s = mq.decode(self.base + prev)
        prev = self._next_prev(prev, s)
        n_lead = 0
        while n_lead < 5:
            bit = mq.decode(self.base + prev)
            prev = self._next_prev(prev, bit)
            if not bit:
                break
            n_lead += 1
        _lead, nbits, offset = _IA_RANGES[n_lead]
        v = 0
        for _ in range(nbits):
            bit = mq.decode(self.base + prev)
            prev = self._next_prev(prev, bit)
            v = (v << 1) | bit
        v += offset
        if s and v == 0:
            return OOB
        return -v if s else v

    def encode(self, mq: "MQEncoder", value) -> None:
        prev = 1
        if value is OOB:
            s, v = 1, 0
        else:
            s = 1 if value < 0 else 0
            v = -value if value < 0 else value
        mq.encode(s, self.base + prev)
        prev = self._next_prev(prev, s)
        for n_lead, (_l, nbits, offset) in enumerate(_IA_RANGES):
            top = offset + (1 << nbits)
            if v < top or n_lead == len(_IA_RANGES) - 1:
                break
        for _ in range(n_lead):
            mq.encode(1, self.base + prev)
            prev = self._next_prev(prev, 1)
        if n_lead < 5:
            mq.encode(0, self.base + prev)
            prev = self._next_prev(prev, 0)
        _l, nbits, offset = _IA_RANGES[n_lead]
        rem = v - offset
        for k in range(nbits - 1, -1, -1):
            bit = (rem >> k) & 1
            mq.encode(bit, self.base + prev)
            prev = self._next_prev(prev, bit)


class SymbolIDCodec:
    """IAID (A.3): fixed-width symbol-id tree over ``code_len`` bits."""

    def __init__(self, base: int, code_len: int) -> None:
        self.base = base
        self.code_len = code_len

    def decode(self, mq: "MQDecoder") -> int:
        prev = 1
        for _ in range(self.code_len):
            bit = mq.decode(self.base + prev)
            prev = (prev << 1) | bit
        return prev - (1 << self.code_len)

    def encode(self, mq: "MQEncoder", sym_id: int) -> None:
        prev = 1
        for k in range(self.code_len - 1, -1, -1):
            bit = (sym_id >> k) & 1
            mq.encode(bit, self.base + prev)
            prev = (prev << 1) | bit
