"""JBIG2 Huffman coding (ITU-T T.88 Annex B + §7.4.3.1.7).

Standard tables B.1–B.15 below are the spec's constants — like the
T.4 run tables in ``functions/ccitt.py`` and the MQ state table in
``functions/mq.py``, they are published values every JBIG2 codec must
contain. Each table is a list of (PREFLEN, RANGELEN, RANGELOW) lines
in spec order, an optional 32-bit lower-range line, a 32-bit
upper-range line, and an optional OOB prefix length. Canonical prefix
codes assign per Annex B.3 (counts per length → FIRSTCODE cascade →
sequential codes in table order); decoding follows B.4 (lower-range
lines SUBTRACT their 32 read bits, every other line adds RANGELEN
bits to RANGELOW).

Correctness gates: every standard table must form a COMPLETE prefix
code (no gaps, no collisions — ``tests/test_jbig2.py`` walks all
codes) and cover its documented value domain; encoder/decoder
round-trip is fuzz-pinned. True cross-engine vectors are not
available in this sandbox (documented, same status as the T.4
tables).

The symbol-ID code-length scheme (§7.4.3.1.7) rides the same
machinery: 35 five-bit runcode lengths → runcode table → per-symbol
code lengths (32 = repeat previous 3–6, 33 = zeros 3–10, 34 = zeros
11–138) → canonical symbol-ID table.
"""

from __future__ import annotations

OOB = object()  # distinct from functions.mq.OOB on purpose: Huffman
# tables signal OOB through table lines, not through an IAx sign quirk


class BitReader:
    """MSB-first bit reader over bytes (T.88 Huffman bit order)."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed of data[pos]

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JBIG2 Huffman: bitstream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1

    def take_bytes(self, n: int) -> bytes:
        """Byte-aligned slice (collective bitmaps, MMR payloads)."""
        self.byte_align()
        if self.pos + n > len(self.data):
            raise ValueError("JBIG2 Huffman: bitmap payload truncated")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


class BitWriter:
    """MSB-first twin of :class:`BitReader` (fixture encoders)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.bit = 0

    def write_bit(self, b: int) -> None:
        if self.bit == 0:
            self.out.append(0)
        if b:
            self.out[-1] |= 1 << (7 - self.bit)
        self.bit = (self.bit + 1) % 8

    def write_bits(self, v: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.write_bit((v >> k) & 1)

    def byte_align(self) -> None:
        self.bit = 0

    def put_bytes(self, data: bytes) -> None:
        self.byte_align()
        self.out.extend(data)

    def flush(self) -> bytes:
        return bytes(self.out)


class HuffmanTable:
    """One Annex-B table: ``lines`` = (PREFLEN, RANGELEN, RANGELOW) in
    spec order; ``lower`` = (PREFLEN, RANGELOW) 32-bit lower-range
    line; ``upper`` = (PREFLEN, RANGELOW) 32-bit upper-range line;
    ``oob`` = PREFLEN of the out-of-band code (None = no OOB)."""

    def __init__(
        self,
        lines: list[tuple[int, int, int]],
        lower: tuple[int, int] | None = None,
        upper: tuple[int, int] | None = None,
        oob: int | None = None,
    ) -> None:
        self.lines = lines
        self.lower = lower
        self.upper = upper
        self.oob = oob
        # Annex B.3 canonical assignment over every coded entry, in
        # the order (normal lines, lower, upper, oob) — the spec
        # assigns in "table order"; standard tables list lower/upper
        # interleaved, but assignment depends only on (length, order),
        # and the standard tables' printed order IS lines-then-
        # specials per the B.1–B.15 layouts used here.
        entries: list[tuple[int, object]] = []  # (preflen, payload)
        for idx, (pl, _rl, _lo) in enumerate(lines):
            entries.append((pl, ("line", idx)))
        if lower is not None:
            entries.append((lower[0], ("lower",)))
        if upper is not None:
            entries.append((upper[0], ("upper",)))
        if oob is not None:
            entries.append((oob, ("oob",)))
        self.codes: dict[tuple[int, int], object] = {}
        maxlen = max((pl for pl, _ in entries if pl), default=0)
        count = [0] * (maxlen + 1)
        for pl, _ in entries:
            if pl:
                count[pl] += 1
        firstcode = [0] * (maxlen + 2)
        for ln in range(1, maxlen + 1):
            firstcode[ln] = (firstcode[ln - 1] + count[ln - 1]) << 1
        nxt = list(firstcode)
        for pl, payload in entries:  # table order within a length
            if not pl:
                continue
            code = nxt[pl]
            nxt[pl] += 1
            if (pl, code) in self.codes or code >= (1 << pl):
                raise ValueError("JBIG2 Huffman table: code collision")
            self.codes[(pl, code)] = payload

    def decode(self, r: BitReader):
        length = 0
        code = 0
        while length < 32:
            code = (code << 1) | r.read_bit()
            length += 1
            hit = self.codes.get((length, code))
            if hit is None:
                continue
            kind = hit[0]
            if kind == "oob":
                return OOB
            if kind == "lower":
                return self.lower[1] - r.read_bits(32)
            if kind == "upper":
                return self.upper[1] + r.read_bits(32)
            _pl, rl, lo = self.lines[hit[1]]
            return lo + r.read_bits(rl)
        raise ValueError("JBIG2 Huffman: no code matched in 32 bits")

    def encode(self, w: BitWriter, value) -> None:
        inv = {v: k for k, v in self.codes.items()}
        if value is OOB:
            if self.oob is None:
                raise ValueError("value is OOB but table has no OOB code")
            pl, code = inv[("oob",)]
            w.write_bits(code, pl)
            return
        for idx, (pl, rl, lo) in enumerate(self.lines):
            if lo <= value < lo + (1 << rl):
                cl, code = inv[("line", idx)]
                w.write_bits(code, cl)
                w.write_bits(value - lo, rl)
                return
        if self.lower is not None and value <= self.lower[1]:
            pl, code = inv[("lower",)]
            w.write_bits(code, pl)
            w.write_bits(self.lower[1] - value, 32)
            return
        if self.upper is not None and value >= self.upper[1]:
            pl, code = inv[("upper",)]
            w.write_bits(code, pl)
            w.write_bits(value - self.upper[1], 32)
            return
        raise ValueError(f"value {value} outside table domain")

    def domain_complete(self) -> bool:
        """Kraft sum of all coded entries == 1 ⇒ complete prefix code."""
        total = sum(1 / (1 << pl) for pl, _code in self.codes)
        return abs(total - 1.0) < 1e-12


# Annex B standard tables (spec constants; see module docstring for
# the in-sandbox verification status)
STANDARD_TABLES: dict[int, HuffmanTable] = {
    1: HuffmanTable(
        [(1, 4, 0), (2, 8, 16), (3, 16, 272)], upper=(3, 65808)
    ),
    2: HuffmanTable(
        [(1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11)],
        upper=(6, 75), oob=6,
    ),
    3: HuffmanTable(
        [(8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
         (5, 6, 11)],
        lower=(8, -257), upper=(7, 75), oob=6,
    ),
    4: HuffmanTable(
        [(1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12)],
        upper=(5, 76),
    ),
    5: HuffmanTable(
        [(7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
         (5, 6, 12)],
        lower=(7, -256), upper=(6, 76),
    ),
    6: HuffmanTable(
        [(5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256),
         (5, 6, -128), (5, 5, -64), (4, 5, -32), (2, 7, 0),
         (3, 7, 128), (3, 8, 256), (4, 9, 512), (4, 10, 1024)],
        lower=(6, -2049), upper=(6, 2048),
    ),
    # B.7 (SBHUFFFS selection 1) and B.10 (SBHUFFDS selection 2) are
    # intentionally ABSENT: the transcriptions available here fail the
    # completeness gate, so shipping them would decode garbage. Their
    # selections raise ValueError (documented residue; selection 0 is
    # what encoders emit in practice).
    8: HuffmanTable(
        [(8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2),
         (4, 0, -1), (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4),
         (6, 1, 20), (4, 4, 22), (4, 5, 38), (5, 6, 70), (5, 7, 134),
         (6, 7, 262), (7, 8, 390), (6, 10, 646)],
        lower=(9, -16), upper=(9, 1670), oob=2,
    ),
    9: HuffmanTable(
        [(8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5),
         (4, 1, -3), (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5),
         (3, 5, 7), (6, 2, 39), (4, 5, 43), (4, 6, 75), (5, 7, 139),
         (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291)],
        lower=(9, -32), upper=(9, 3339), oob=2,
    ),
    11: HuffmanTable(
        [(1, 0, 1), (2, 1, 2), (4, 0, 4), (4, 1, 5), (5, 1, 7),
         (5, 2, 9), (6, 2, 13), (7, 2, 17), (7, 3, 21), (7, 4, 29),
         (7, 5, 45), (7, 6, 77)],
        upper=(7, 141),
    ),
    12: HuffmanTable(
        [(1, 0, 1), (2, 0, 2), (3, 1, 3), (5, 0, 5), (5, 1, 6),
         (6, 1, 8), (7, 0, 10), (7, 1, 11), (7, 2, 13), (7, 3, 17),
         (7, 4, 25), (8, 5, 41)],
        upper=(8, 73),
    ),
    13: HuffmanTable(
        [(1, 0, 1), (3, 0, 2), (4, 0, 3), (5, 0, 4), (4, 1, 5),
         (3, 3, 7), (6, 1, 15), (6, 2, 17), (6, 3, 21), (6, 4, 29),
         (6, 5, 45), (7, 6, 77)],
        upper=(7, 141),
    ),
    14: HuffmanTable(
        [(3, 0, -2), (3, 0, -1), (1, 0, 0), (3, 0, 1), (3, 0, 2)],
    ),
    15: HuffmanTable(
        [(7, 4, -24), (6, 2, -8), (5, 1, -4), (4, 0, -2), (3, 0, -1),
         (1, 0, 0), (3, 0, 1), (4, 0, 2), (5, 1, 3), (6, 2, 5),
         (7, 4, 9)],
        lower=(7, -25), upper=(7, 25),
    ),
}


def decode_symbol_id_lengths(r: BitReader, n_syms: int) -> list[int]:
    """§7.4.3.1.7: 35 five-bit runcode lengths → runcode table →
    per-symbol code lengths."""
    run_lines = [(r.read_bits(5), 0, i) for i in range(35)]
    run_table = HuffmanTable(run_lines)
    lengths: list[int] = []
    prev = 0
    while len(lengths) < n_syms:
        code = run_table.decode(r)
        if code < 32:
            lengths.append(code)
            if code:
                prev = code
        elif code == 32:
            lengths.extend([prev] * (r.read_bits(2) + 3))
        elif code == 33:
            lengths.extend([0] * (r.read_bits(3) + 3))
        else:  # 34
            lengths.extend([0] * (r.read_bits(7) + 11))
    if len(lengths) != n_syms:
        raise ValueError("JBIG2 symbol-ID lengths: run overshoot")
    return lengths


def symbol_id_table(lengths: list[int]) -> HuffmanTable:
    """Canonical symbol-ID table: line i has RANGELOW=i, RANGELEN=0."""
    return HuffmanTable([(pl, 0, i) for i, pl in enumerate(lengths)])


def encode_symbol_id_lengths(w: BitWriter, lengths: list[int]) -> None:
    """Fixture twin of :func:`decode_symbol_id_lengths`: declare one
    runcode per distinct length, emit each symbol's length directly
    (no repeat codes — simplest valid form)."""
    used = sorted({pl for pl in lengths})
    # runcode table: give every used length-value an equal-length code
    code_len = max(1, (len(used) - 1).bit_length() + (0 if len(used) > 1 else 0))
    if len(used) == 1:
        code_len = 1
    run_lengths = [0] * 35
    for v in used:
        run_lengths[v] = code_len
    for v in run_lengths:
        w.write_bits(v, 5)
    run_table = HuffmanTable([(pl, 0, i) for i, pl in enumerate(run_lengths)])
    for pl in lengths:
        run_table.encode(w, pl)


def parse_table_segment(body: bytes) -> HuffmanTable:
    """§7.4.13 custom table segment → :class:`HuffmanTable`. Lines
    cover [HTLOW, HTHIGH) with (PREFLEN, RANGELEN) pairs; the 32-bit
    lower-range line sits at HTLOW-1 descending, the upper at HTHIGH
    ascending; PREFLEN 0 marks an absent entry."""
    flags = body[0]
    oob_flag = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    low = int.from_bytes(body[1:5], "big", signed=True)
    high = int.from_bytes(body[5:9], "big", signed=True)
    if high <= low:
        raise ValueError("JBIG2 table segment: empty range")
    r = BitReader(body, 9)
    lines: list[tuple[int, int, int]] = []
    cur = low
    while cur < high:
        pl = r.read_bits(htps)
        rl = r.read_bits(htrs)
        lines.append((pl, rl, cur))
        cur += 1 << rl
        if len(lines) > 1 << 16:
            raise ValueError("JBIG2 table segment: runaway line count")
    lower = (r.read_bits(htps), low - 1)
    upper = (r.read_bits(htps), high)
    oob = r.read_bits(htps) if oob_flag else None
    return HuffmanTable(lines, lower, upper, oob)


def make_table_segment(
    lines: list[tuple[int, int]],
    low: int,
    high: int,
    lower_pl: int,
    upper_pl: int,
    oob_pl: int | None = None,
) -> bytes:
    """Fixture twin of :func:`parse_table_segment`: ``lines`` =
    (PREFLEN, RANGELEN) pairs that must tile [low, high)."""
    htps = max(
        [pl.bit_length() for pl, _ in lines]
        + [lower_pl.bit_length(), upper_pl.bit_length(),
           (oob_pl or 0).bit_length(), 1]
    )
    htrs = max([rl.bit_length() for _, rl in lines] + [1])
    flags = (1 if oob_pl is not None else 0) | ((htps - 1) << 1) | (
        (htrs - 1) << 4
    )
    out = bytearray([flags])
    out += low.to_bytes(4, "big", signed=True)
    out += high.to_bytes(4, "big", signed=True)
    w = BitWriter()
    cur = low
    for pl, rl in lines:
        w.write_bits(pl, htps)
        w.write_bits(rl, htrs)
        cur += 1 << rl
    if cur != high:
        raise ValueError("table lines must tile [low, high)")
    w.write_bits(lower_pl, htps)
    w.write_bits(upper_pl, htps)
    if oob_pl is not None:
        w.write_bits(oob_pl, htps)
    return bytes(out) + w.flush()
