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
    """Annex E decoder (INITDEC / DECODE / BYTEIN)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.i: dict[int, int] = {}
        self.mps: dict[int, int] = {}
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
        i = self.i.get(cx, 0)
        mps = self.mps.get(cx, 0)
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                self.i[cx] = nmps
            else:
                d = 1 - mps
                if switch:
                    self.mps[cx] = 1 - mps
                self.i[cx] = nlps
            self.a = qe
            self._renorm()
        else:
            self.c -= qe << 16
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    d = 1 - mps
                    if switch:
                        self.mps[cx] = 1 - mps
                    self.i[cx] = nlps
                else:
                    d = mps
                    self.i[cx] = nmps
                self._renorm()
            else:
                d = mps
        return d

    def _renorm(self) -> None:
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break


class MQEncoder:
    """Annex E encoder (INITENC / CODEMPS / CODELPS / BYTEOUT /
    FLUSH)."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: int | None = None  # pending byte
        self.out = bytearray()
        self.i: dict[int, int] = {}
        self.mps: dict[int, int] = {}

    def encode(self, d: int, cx: int) -> None:
        i = self.i.get(cx, 0)
        mps = self.mps.get(cx, 0)
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:
            self.a -= qe
            if (self.a & 0x8000) == 0:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.i[cx] = nmps
                self._renorm()
            else:
                self.c += qe
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] = 1 - mps
            self.i[cx] = nlps
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
