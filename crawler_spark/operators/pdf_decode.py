r"""PDF byte decode — deterministic stdlib subset (closes SURVEY S8's
decode half for the class of PDFs this sandbox can generate/verify).

The reference decodes PDFs with pdfjs (``src/lib/processPDf.ts:13-97``)
and only consumes, per text item, the string and its y coordinate
(``transform[5]``) — everything downstream (line grouping, cleanup,
paragraph stitch) is :mod:`crawler_spark.operators.pdf`. This module
produces exactly that items table from raw PDF bytes using only the
standard library:

  * object scan: ``N 0 obj … endobj`` blocks; stream objects
    ``<<…>> stream\r?\n … endstream``; ``/FlateDecode`` streams
    inflate via :mod:`zlib` (stdlib), others are taken raw;
  * content streams (those containing a ``BT`` text block) are
    tokenized (numbers, literal ``(...)`` strings with escape/octal
    handling and nesting, hex ``<...>`` strings, names, arrays,
    operators) and interpreted with the text-positioning subset:
    ``Tm`` (y := f), ``Td`` (y += ty), ``TD`` (TL := -ty; y += ty),
    ``TL``, ``T*`` (y -= TL), ``BT`` (reset), shows ``Tj``, ``'``
    (T* then show) and ``TJ`` (array show; kerning numbers ignored,
    the run is one item — pdfjs's per-run item granularity);
  * pages = content streams in object order (the fixture generator
    emits one content stream per page, the common simple-PDF layout).

r2→r3 extensions (VERDICT r2 #7):

  * **object streams** (``/Type /ObjStm``): the Flate-compressed
    object container PDF 1.5+ writers put catalog/pages/page/font
    dicts in. The header's (objnum, offset) pairs are parsed and the
    contained objects join the object table — structure dicts no
    longer need to be top-level.
  * **ToUnicode CMaps** (bfchar + simple-form bfrange, 1- or 2-byte
    codespace): a font resource (``/F1 → font dict → /ToUnicode``)
    carrying a CMap stream decodes shown strings code-by-code through
    the map — the common simple-font embedding for e.g. subset
    TrueType fonts. The interpreter tracks the current font via ``Tf``.
  * **the full non-image /Filter set** (r3): FlateDecode, LZWDecode
    (TIFF variant, 9→12-bit codes, EarlyChange), ASCIIHexDecode,
    ASCII85Decode, RunLengthDecode — including filter ARRAYS (chained
    decode) and /DecodeParms predictors (PNG 10-15 incl. Sub/Up/
    Average/Paeth rows, TIFF 2) on Flate/LZW streams. Streams whose
    chain contains an image codec (DCTDecode, JPXDecode, CCITTFax,
    JBIG2) or /Crypt are skipped, matching pdfjs's text-only use here.
  * **encrypted PDFs, standard security handler** (r3): RC4 40/128-bit
    (V1/V2 R2/R3), AES-128 AESV2 (V4 R4) and AES-256 AESV3 (V5 R6 —
    the SHA-2 hardened Algorithm 2.B derivation), empty user password
    (the owner-locked case pdfjs opens silently). Crypto primitives
    are stdlib-only (:mod:`crawler_spark.operators.pdf_crypt`:
    hashlib + from-scratch RC4/FIPS-197 AES, vector-tested).
    Password-protected documents (non-empty user password) are
    detected via /U (or /UE unwrap) validation and skipped whole.
  * **inline images** (r3): ``BI … ID <binary> EI`` blocks are
    stripped before tokenizing (whitespace-delimited ``EI``
    terminator — pdfjs's no-/L fallback), so image payloads can't
    derail text extraction.
  * **array-form bfrange** (r3): ``<lo> <hi> [<d0> <d1> …]`` CMap
    entries (one UTF-16BE dst per code) join the simple form.
  * **simple-font /Encoding** (r3): WinAnsi (cp1252) / MacRoman /
    StandardEncoding base maps overridden by /Differences glyph-name
    arrays, resolved through an Adobe-Glyph-List subset plus the
    uniXXXX / uXXXX algorithmic names — the common non-embedded
    1-byte-font case. /ToUnicode still wins when both are present.

  * **image XObjects** (r3): ``/Subtype /Image`` streams are extracted
    and DECODED — /DCTDecode via the repo's baseline JPEG codec
    (``functions/jpeg.py``), raw /DeviceRGB 8-bit directly, both under
    prefix filters and standard-handler encryption
    (:func:`extract_pdf_images`, Spark surface :func:`pdf_images`).

  * **image codecs closed in r4**: /CCITTFaxDecode (ITU-T T.4/T.6,
    ``functions/ccitt.py``), /JBIG2Decode (T.88 generic/text/
    refinement/halftone subsets, ``functions/jbig2.py``) and
    /JPXDecode (T.800 JPEG 2000, ``functions/jpeg2000.py`` — 5/3 and
    9/7 wavelets, RCT/ICT, LRCP/RLCP/RPCL, multiple tiles/layers,
    JP2 containers) all decode for real; unsupported variants raise
    and quarantine as ok=False rows, never garbage pixels.

  * **public-key security handler** (late r4): /Adobe.PubSec CMS
    recipients decrypt with registered RSA keys
    (:func:`register_pubsec_key`; stdlib-only RSA + minimal DER in
    :mod:`crawler_spark.operators.pdf_crypt`). Without a key the
    document stays locked and skipped — the same contract as
    password-protected files. pdfjs has NO PubSec support, so this is
    beyond-reference surface.

OUT OF SCOPE (documented): predefined-NAME /UseCMap resolution (the
Adobe CMap resource files; EMBEDDED /UseCMap stream chains resolve as
of late r4) and custom (non-Standard, non-PubSec) security handlers
— real-world arbitrary PDFs
still need a pdfium/pdfjs extraction stage feeding the same items
table. The subset is not a stub: bytes generated by :func:`make_pdf`
/ :func:`make_pdf_objstm` (or any generator using Flate/LZW/ASCII/
RLE/predictor/ObjStm+bfchar layouts, encrypted or not) decode for
real, and the Spark surface (:func:`pdf_items_col`) is the same
Arrow-batched shape a native extractor would use.
"""

from __future__ import annotations

import re
import struct
import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# fixture generator (deterministic; uncompressed or Flate)
# --------------------------------------------------------------------------


def _pdf_string(text: str) -> str:
    """Literal string when latin-1-encodable, else a UTF-16BE hex
    string with BOM (the standard PDF mechanism for e.g. Vietnamese)."""
    try:
        text.encode("latin-1")
    except UnicodeEncodeError:
        return "<FEFF" + text.encode("utf-16-be").hex().upper() + ">"
    esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    return f"({esc})"


def _content_stream(lines: list[tuple[float, str]]) -> bytes:
    ops = ["BT", "/F1 12 Tf"]
    for y, text in lines:
        ops.append(f"1 0 0 1 72 {y:g} Tm")
        ops.append(f"{_pdf_string(text)} Tj")
    ops.append("ET")
    return "\n".join(ops).encode("latin-1")


def _encode_stream(
    content: bytes, filters: list[str], predictor_columns: int = 0
) -> tuple[bytes, bytes]:
    """(encoded_bytes, dict_fragment) for a /Filter chain. Encoders run
    in REVERSE of the listed (decode) order; ``predictor_columns`` > 0
    adds PNG Up (Predictor 12) under the innermost Flate/LZW filter."""
    import base64

    parms: list[bytes] = []
    for name in reversed(filters):
        parm = b"null"
        if name == "FlateDecode":
            if predictor_columns and not any(p != b"null" for p in parms):
                content = _png_predict_up(content, predictor_columns)
                parm = (
                    b"<< /Predictor 12 /Columns %d >>" % predictor_columns
                )
            content = zlib.compress(content)
        elif name == "LZWDecode":
            if predictor_columns and not any(p != b"null" for p in parms):
                content = _png_predict_up(content, predictor_columns)
                parm = (
                    b"<< /Predictor 12 /Columns %d >>" % predictor_columns
                )
            content = _lzw_encode(content)
        elif name == "ASCIIHexDecode":
            content = content.hex().upper().encode() + b">"
        elif name == "ASCII85Decode":
            content = base64.a85encode(content) + b"~>"
        elif name == "RunLengthDecode":
            enc = bytearray()
            for i in range(0, len(content), 120):
                chunk = content[i : i + 120]
                enc.append(len(chunk) - 1)
                enc += chunk
            enc.append(128)
            content = bytes(enc)
        else:
            raise ValueError(f"no fixture encoder for {name}")
        parms.insert(0, parm)
    names = " ".join(f"/{n}" for n in filters)
    frag = f" /Filter [{names}]".encode() if len(filters) > 1 else (
        f" /Filter {names}".encode()
    )
    if any(p != b"null" for p in parms):
        if len(filters) > 1:
            frag += b" /DecodeParms [" + b" ".join(parms) + b"]"
        else:
            frag += b" /DecodeParms " + parms[0]
    return content, frag


_FIXTURE_ID0 = b"fixture-doc-id00"  # 16-byte /ID[0] for encrypted fixtures
_FIXTURE_P = -4  # permission bits: all allowed except reserved


import functools


@functools.lru_cache(maxsize=8)
def _fixture_encryption(encrypt: str) -> tuple[bytes, bytes, str]:
    """(encrypt_dict_body, file_key, cfm) for ``make_pdf(encrypt=…)``.
    Modes: rc4-40 (V1 R2), rc4-128 (V2 R3), aes-128 (V4 R4 AESV2),
    aes-256 (V5 R6 AESV3). Empty user password; /O & /U are computed
    with the real handler algorithms so the decoder's password check
    exercises the same code path a conforming reader runs."""
    from crawler_spark.operators import pdf_crypt as C

    if encrypt == "pubsec-aes128":
        # public-key handler: one recipient, AES-128 content cipher;
        # the fixture private key is rsa_fixture_key()
        import hashlib

        n, e, _d = C.rsa_fixture_key()
        seed = hashlib.sha256(b"pubsec-fixture-seed").digest()[:20]
        cek = hashlib.sha256(b"pubsec-fixture-cek").digest()[:16]
        iv = hashlib.sha256(b"pubsec-fixture-iv").digest()[:16]
        blob = C.make_pubsec_recipient(seed, 0xFFFFFFFC, n, e, cek, iv)
        fkey = C.pubsec_file_key(seed, [blob], 128)
        d = (
            b"<< /Filter /Adobe.PubSec /SubFilter /adbe.pkcs7.s5"
            b" /V 4 /Length 128"
            b" /CF << /DefaultCryptFilter << /Type /CryptFilter"
            b" /CFM /AESV2 /Length 16 /Recipients [ <%s> ] >> >>"
            b" /StmF /DefaultCryptFilter /StrF /DefaultCryptFilter >>"
            % blob.hex().encode()
        )
        return d, fkey, "AESV2"
    if encrypt == "aes-256":
        u, ue, fkey = C.user_values_r6()
        # owner path (Algorithm 9.C/D analog): hashes salt with U appended
        ovs, oks = b"ovalslt1", b"okeyslt1"
        o = C._hash_2b(b"", ovs, u) + ovs + oks
        oe = C.aes_cbc_encrypt(C._hash_2b(b"", oks, u), bytes(16), fkey, pad=False)
        d = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O <%s> /U <%s> /OE <%s> /UE <%s> /P %d >>"
            % (o.hex().encode(), u.hex().encode(), oe.hex().encode(),
               ue.hex().encode(), _FIXTURE_P)
        )
        return d, fkey, "AESV3"
    r, bits, v, enc_meta = {
        "rc4-40": (2, 40, 1, True),
        "rc4-128": (3, 128, 2, True),
        "aes-128": (4, 128, 4, True),
        # R4 with /EncryptMetadata false: Algorithm 2 step (f) appends
        # FF FF FF FF to the MD5 input, changing the file key
        "aes-128-nometa": (4, 128, 4, False),
    }[encrypt]
    o = C.owner_value_rc4(r, bits)
    fkey = C.file_key_rc4(
        o, _FIXTURE_P, _FIXTURE_ID0, r, bits, encrypt_metadata=enc_meta
    )
    u = C.user_value_rc4(fkey, _FIXTURE_ID0, r)
    cf = b""
    cfm = "V2"
    if v == 4:
        cf = b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        cfm = "AESV2"
    if not enc_meta:
        cf += b" /EncryptMetadata false"
    d = b"<< /Filter /Standard /V %d /R %d /Length %d%s /O <%s> /U <%s> /P %d >>" % (
        v, r, bits, cf, o.hex().encode(), u.hex().encode(), _FIXTURE_P
    )
    return d, fkey, cfm


def make_pdf(
    pages: list[list[tuple[float, str]]],
    compress: bool = False,
    filters: list[str] | None = None,
    predictor_columns: int = 0,
    encrypt: str | None = None,
    font: str | None = None,
) -> bytes:
    """Minimal valid PDF: catalog → pages → one page+content stream per
    entry; each page is [(y, text), …]. Deterministic bytes.
    ``filters`` names a decode-order /Filter chain for the content
    streams (``compress=True`` is shorthand for ["FlateDecode"]);
    ``encrypt`` applies the standard security handler (rc4-40 /
    rc4-128 / aes-128 / aes-256, empty user password); ``font``
    replaces the default /F1 font dict source (e.g. to carry an
    /Encoding with /Differences)."""
    enc_dict = fkey = cfm = None
    if encrypt is not None:
        enc_dict, fkey, cfm = _fixture_encryption(encrypt)
    objs: list[bytes] = []
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    chain = filters if filters is not None else (["FlateDecode"] if compress else [])
    for i, lines in enumerate(pages):
        content = _content_stream(lines)
        filt = b""
        if chain:
            content, filt = _encode_stream(content, chain, predictor_columns)
        if fkey is not None:
            # encryption wraps the ENCODED bytes (filters under crypt)
            from crawler_spark.operators.pdf_crypt import encrypt_stream

            content = encrypt_stream(content, fkey, 4 + 2 * i, 0, cfm)
        font_src = font or "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
            f"{font_src} >> >> >>".encode()
        )
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    trailer_extra = b""
    if enc_dict is not None:
        objs.append(enc_dict)
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            len(objs), _FIXTURE_ID0.hex().encode(), _FIXTURE_ID0.hex().encode()
        )
    out = [b"%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        blob = b"%d 0 obj\n%s\nendobj" % (i, body)
        offsets.append(pos)
        out.append(blob)
        pos += len(blob) + 1
    xref_pos = pos
    xref = [b"xref", b"0 %d" % (len(objs) + 1), b"0000000000 65535 f "]
    xref += [b"%010d 00000 n " % o for o in offsets]
    out.append(b"\n".join(xref))
    out.append(
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, trailer_extra, xref_pos)
    )
    return b"\n".join(out)


def make_pdf_objstm(
    pages: list[list[tuple[float, str]]], cmap: dict[int, str]
) -> bytes:
    """PDF-1.5-style fixture: all structure dicts (catalog, pages,
    page, font) live in ONE Flate-compressed object stream; text is
    shown as hex strings of 1-byte codes through a /ToUnicode CMap
    built from ``cmap`` ({code: unicode_str}, bfchar entries plus one
    bfrange emitted for any contiguous ≥3-code chr run). Deterministic
    bytes. (The classic trailer is kept — this module's scanner never
    consults the xref, so the fixture exercises exactly the ObjStm +
    CMap surface.)"""
    n_pages = len(pages)
    rev = {v: k for k, v in cmap.items()}

    def encode(text: str) -> str:
        return "<" + "".join(f"{rev[ch]:02X}" for ch in text) + ">"

    # content streams: objects 2 .. n_pages+1 (top-level; streams
    # cannot live inside an ObjStm)
    contents = []
    for lines in pages:
        ops = ["BT", "/FU 12 Tf"]
        for y, text in lines:
            ops.append(f"1 0 0 1 72 {y:g} Tm")
            ops.append(f"{encode(text)} Tj")
        ops.append("ET")
        contents.append(zlib.compress("\n".join(ops).encode("latin-1")))

    # ToUnicode CMap: object n_pages+2
    codes = sorted(cmap)
    runs: list[list[int]] = []
    for c in codes:
        if (
            runs
            and c == runs[-1][-1] + 1
            and ord(cmap[c]) == ord(cmap[runs[-1][-1]]) + (c - runs[-1][-1])
            and len(cmap[c]) == 1
            # a supplementary-plane run must stay under ONE high
            # surrogate: the range form increments only the last
            # UTF-16 code unit
            and (ord(cmap[c]) <= 0xFFFF or ord(cmap[c]) >> 10 == ord(cmap[runs[-1][0]]) >> 10)
        ):
            runs[-1].append(c)
        else:
            runs.append([c])
    bfchar, bfrange = [], []
    for run in runs:
        if len(run) >= 3 and all(len(cmap[c]) == 1 for c in run):
            dst0 = cmap[run[0]].encode("utf-16-be").hex().upper()
            bfrange.append(f"<{run[0]:02X}> <{run[-1]:02X}> <{dst0}>")
        else:
            for c in run:
                dst = cmap[c].encode("utf-16-be").hex().upper()
                bfchar.append(f"<{c:02X}> <{dst}>")
    cm = ["/CIDInit /ProcSet findresource begin", "begincmap",
          "1 begincodespacerange", "<00> <FF>", "endcodespacerange"]
    if bfchar:
        cm += [f"{len(bfchar)} beginbfchar", *bfchar, "endbfchar"]
    if bfrange:
        cm += [f"{len(bfrange)} beginbfrange", *bfrange, "endbfrange"]
    cm += ["endcmap", "end"]
    cmap_stream = zlib.compress("\n".join(cm).encode("latin-1"))

    # object stream: catalog(100) pages(101) page dicts(102..) font(200)
    objstm_objs: list[tuple[int, bytes]] = [
        (100, b"<< /Type /Catalog /Pages 101 0 R >>"),
        (
            101,
            (
                "<< /Type /Pages /Kids ["
                + " ".join(f"{102 + i} 0 R" for i in range(n_pages))
                + f"] /Count {n_pages} >>"
            ).encode(),
        ),
    ]
    for i in range(n_pages):
        objstm_objs.append(
            (
                102 + i,
                (
                    f"<< /Type /Page /Parent 101 0 R /MediaBox [0 0 612 792] "
                    f"/Contents {2 + i} 0 R /Resources << /Font "
                    f"<< /FU 200 0 R >> >> >>"
                ).encode(),
            )
        )
    objstm_objs.append(
        (
            200,
            (
                f"<< /Type /Font /Subtype /TrueType /BaseFont /Fixture "
                f"/ToUnicode {n_pages + 2} 0 R >>"
            ).encode(),
        )
    )
    bodies = [b for _n, b in objstm_objs]
    offs, pos = [], 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    header = " ".join(
        f"{n} {o}" for (n, _b), o in zip(objstm_objs, offs)
    ).encode() + b"\n"
    objstm_data = zlib.compress(header + b"\n".join(bodies) + b"\n")

    objs: list[tuple[int, bytes]] = []
    for i, content in enumerate(contents):
        objs.append(
            (
                2 + i,
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
                % (len(content), content),
            )
        )
    objs.append(
        (
            n_pages + 2,
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(cmap_stream), cmap_stream),
        )
    )
    objs.append(
        (
            1,
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode "
            b">>\nstream\n%s\nendstream"
            % (len(objstm_objs), len(header), len(objstm_data), objstm_data),
        )
    )
    out = [b"%PDF-1.5"]
    for num, body in objs:
        out.append(b"%d 0 obj\n%s\nendobj" % (num, body))
    out.append(b"trailer\n<< /Root 100 0 R >>\n%%EOF")
    return b"\n".join(out)



def make_ttf_with_cmap(mapping: dict[str, int]) -> bytes:
    """Minimal sfnt carrying ONE 'cmap' table (format 4, platform 3
    encoding 1) mapping each character to its glyph id — the part of a
    TrueType program the composite-font text path reads. Layout per
    the public OpenType spec (table directory + cmap header +
    format-4 segments, one segment per char run + the required
    0xFFFF terminator)."""
    cps = sorted(ord(c) for c in mapping)
    gid = {ord(c): g for c, g in mapping.items()}
    # one segment per run of consecutive code points with consecutive
    # glyph ids (idDelta form, idRangeOffset 0)
    segs: list[tuple[int, int]] = []
    for cp in cps:
        # idDelta form needs gid - cp constant across the segment
        if (
            segs
            and cp == segs[-1][1] + 1
            and gid[cp] - cp == gid[segs[-1][0]] - segs[-1][0]
        ):
            segs[-1] = (segs[-1][0], cp)
        else:
            segs.append((cp, cp))
    segs.append((0xFFFF, 0xFFFF))  # required terminator segment
    seg_count = len(segs)
    ends = b"".join(struct.pack(">H", e) for _s, e in segs)
    starts = b"".join(struct.pack(">H", s) for s, _e in segs)
    deltas = b""
    for s, _e in segs:
        d = (gid.get(s, 0) - s) & 0xFFFF if s != 0xFFFF else 1
        deltas += struct.pack(">H", d)
    ros = struct.pack(">H", 0) * seg_count
    sub_len = 16 + 8 * seg_count
    search_range = 2
    while search_range * 2 <= seg_count * 2:
        search_range *= 2
    entry_sel = search_range.bit_length() - 2
    sub = struct.pack(
        ">HHHHHH", 4, sub_len, 0, seg_count * 2, search_range, max(entry_sel, 0)
    )
    sub += struct.pack(">H", seg_count * 2 - search_range)
    sub += ends + b"\x00\x00" + starts + deltas + ros
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 1, 12) + sub
    # sfnt wrapper: one table record
    header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    record = struct.pack(">4sIII", b"cmap", 0, 12 + 16, len(cmap))
    return header + record + cmap


def make_pdf_cid(
    pages: list[list[tuple[float, str]]],
    tounicode: bool = False,
    gid_stream: bool = False,
) -> bytes:
    """Fixture: composite (Type0 / Identity-H / CIDFontType2) font
    showing 2-byte CID-coded hex strings — the subset-export shape of
    CJK/Vietnamese PDFs. Glyph ids are assigned per distinct char
    (CID 0 = .notdef); with ``tounicode=False`` the only route back to
    text is reversing the embedded TrueType cmap via /CIDToGIDMap
    (/Identity, or with ``gid_stream=True`` the stream form where
    GID = CID + 7 so an identity shortcut would decode garbage), with
    ``tounicode=True`` the 2-byte /ToUnicode CMap takes precedence."""
    chars = sorted({ch for pg in pages for _y, s in pg for ch in s})
    cid = {ch: i + 1 for i, ch in enumerate(chars)}
    gid_of = {
        c: (c + 7 if gid_stream and c else c) for c in range(len(chars) + 1)
    }
    ttf = make_ttf_with_cmap(
        {ch: gid_of[c] for ch, c in cid.items()} if gid_stream else cid
    )
    n_pages = len(pages)
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(
        b"<< /Type /Pages /Kids [%s] /Count %d >>"
        % (kids.encode(), n_pages)
    )
    font_num = 3 + 2 * n_pages
    for i, page in enumerate(pages):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents %d 0 R /Resources << /Font << /FC %d 0 R >> >> >>"
            % (4 + 2 * i, font_num)
        )
        ops = ["BT", "/FC 12 Tf"]
        for y, s in page:
            hexs = "".join(f"{cid[ch]:04X}" for ch in s)
            ops.append(f"1 0 0 1 72 {y} Tm <{hexs}> Tj")
        ops.append("ET")
        content = "\n".join(ops).encode("latin-1")
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content)
        )
    tou = b""
    if tounicode:
        tou = b" /ToUnicode %d 0 R" % (font_num + 3)
    objs.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
        b"/Encoding /Identity-H /DescendantFonts [%d 0 R]%s >>"
        % (font_num + 1, tou)
    )
    c2g_ref = b"/Identity"
    if gid_stream:
        c2g_ref = b"%d 0 R" % (font_num + (5 if tounicode else 4))
    objs.append(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCID "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /CIDToGIDMap %s /FontDescriptor %d 0 R >>"
        % (c2g_ref, font_num + 2)
    )
    objs.append(
        b"<< /Type /FontDescriptor /FontName /FixtureCID /Flags 4 "
        b"/FontFile2 %d 0 R >>" % (font_num + (4 if tounicode else 3))
    )
    if tounicode:
        cm = ["/CIDInit /ProcSet findresource begin", "begincmap",
              "1 begincodespacerange", "<0000> <FFFF>", "endcodespacerange",
              f"{len(chars)} beginbfchar"]
        for ch in chars:
            cm.append(f"<{cid[ch]:04X}> <{ch.encode('utf-16-be').hex().upper()}>")
        cm += ["endbfchar", "endcmap", "end"]
        data = "\n".join(cm).encode("latin-1")
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(data), data)
        )
    objs.append(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(ttf), ttf)
    )
    if gid_stream:
        # Flate-wrapped like real exporters emit it
        c2g_raw = b"".join(
            gid_of[c].to_bytes(2, "big") for c in range(len(chars) + 1)
        )
        c2g_data = zlib.compress(c2g_raw)
        objs.append(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(c2g_data), c2g_data)
        )
    out = [b"%PDF-1.5"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        blob = b"%d 0 obj\n%s\nendobj" % (i, body)
        offsets.append(pos)
        out.append(blob)
        pos += len(blob) + 1
    xref_pos = pos
    xref = [b"xref", b"0 %d" % (len(objs) + 1), b"0000000000 65535 f "]
    xref += [b"%010d 00000 n " % o for o in offsets]
    out.append(b"\n".join(xref))
    out.append(
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xref_pos)
    )
    return b"\n".join(out)


# --------------------------------------------------------------------------
# stream filters (PDF 32000-1:2008 §7.4 — the stdlib-expressible set)
# --------------------------------------------------------------------------


def _ahx_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: hex pairs up to ``>``; odd final digit pads 0."""
    body = data.split(b">", 1)[0]
    hexed = bytes(c for c in body if c not in _WS)
    if len(hexed) % 2:
        hexed += b"0"
    return bytes.fromhex(hexed.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    """ASCII85Decode: base85 up to ``~>`` (``z`` zero-group allowed)."""
    import base64

    body = data.split(b"~>", 1)[0]
    return base64.a85decode(bytes(c for c in body if c not in _WS))


def _rle_decode(data: bytes) -> bytes:
    """RunLengthDecode: length byte L — 0-127 copy L+1 literals,
    129-255 repeat next byte 257-L times, 128 = EOD."""
    out = bytearray()
    i = 0
    while i < len(data):
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            out += data[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (TIFF/PDF variant): MSB-first packing, 9→12-bit codes,
    256 = clear, 257 = EOD, code width grows ``early`` codes early."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[next_code] = prev + entry[:1]
                next_code += 1
            elif code == next_code:  # KwKwK case
                entry = prev + prev[:1]
                table[next_code] = entry
                next_code += 1
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            prev = entry
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Fixture-side LZW encoder, round-trip partner of
    :func:`_lzw_decode`. Width changes mirror the DECODER's table,
    which trails the encoder's by one entry and still grows on the
    final data code (so EOD may ride at the widened width)."""
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    buf = nbits = n_emitted = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def emit_data(code: int) -> None:
        # after the decoder processes this code it has 258 + n_emitted
        # - 1 entries and widens when that count + early reaches 2^w
        nonlocal n_emitted, width
        emit(code)
        n_emitted += 1
        if 258 + n_emitted - 1 + early >= (1 << width) and width < 12:
            width += 1

    emit(256)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        emit_data(table[w])
        table[w + c] = next_code
        next_code += 1
        w = c
    if w:
        emit_data(table[w])
    emit(257)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """PNG row predictors (Predictor ≥ 10): each row is a filter-type
    byte then the filtered row; types 0-4 = None/Sub/Up/Average/Paeth."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if ft == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + (left + prev[j]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _png_predict_up(data: bytes, columns: int) -> bytes:
    """Fixture-side Predictor-12 (PNG Up) encoder, 8-bit/1-color."""
    out = bytearray()
    prev = bytearray(columns)
    for i in range(0, len(data), columns):
        row = bytearray(data[i : i + columns])
        row += bytes(columns - len(row))  # pad the final short row
        out.append(2)
        out += bytes((row[j] - prev[j]) & 0xFF for j in range(columns))
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """TIFF Predictor 2 (horizontal differencing), 8-bit components."""
    if bpc != 8:
        raise ValueError("TIFF predictor: only 8-bit components supported")
    rowlen = columns * colors
    out = bytearray(data)
    for r in range(0, len(out), rowlen):
        for j in range(r + colors, min(r + rowlen, len(out))):
            out[j] = (out[j] + out[j - colors]) & 0xFF
    return bytes(out)


_FILTER_RE = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_PARMS_RE = re.compile(rb"/(?:DecodeParms|DP)\s*(\[|<<|null)")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")


def _parse_parm_dicts(d: bytes, start: int, in_array: bool) -> list[dict[str, int]]:
    """DecodeParms entries in order: ``null`` or ``<<…>>`` items (one
    bare dict when /Filter is a single name)."""
    parms: list[dict[str, int]] = []
    i = start
    while i < len(d):
        while i < len(d) and d[i] in _WS:
            i += 1
        if d.startswith(b"null", i):
            parms.append({})
            i += 4
        elif d.startswith(b"<<", i):
            end = d.find(b">>", i)
            if end < 0:
                break
            body = d[i + 2 : end]
            entry = {
                m.group(1).decode(): int(m.group(2))
                for m in re.finditer(rb"/([A-Za-z0-9]+)\s+(-?\d+)", body)
            }
            # booleans (/BlackIs1, /EncodedByteAlign) ride as 0/1
            entry.update(
                {
                    m.group(1).decode(): 1 if m.group(2) == b"true" else 0
                    for m in re.finditer(rb"/([A-Za-z0-9]+)\s+(true|false)", body)
                }
            )
            parms.append(entry)
            i = end + 2
        else:
            break
        if not in_array:
            break
    return parms


def _filter_chain(d: bytes) -> tuple[list[bytes], list[dict[str, int]]]:
    """(/Filter names in decode order, aligned /DecodeParms dicts)."""
    fm = _FILTER_RE.search(d)
    if not fm:
        return [], []
    names = [m.group(1) for m in _NAME_RE.finditer(fm.group(1))]
    pm = _PARMS_RE.search(d)
    parms: list[dict[str, int]] = []
    if pm:
        tok = pm.group(1)
        parms = _parse_parm_dicts(
            d, pm.start(1) + (1 if tok == b"[" else 0), in_array=tok == b"["
        )
    return names, parms


def _decode_stream(d: bytes, data: bytes) -> bytes | None:
    """Apply the /Filter chain (with /DecodeParms predictors) to raw
    stream bytes. None = undecodable here (image codecs DCTDecode/
    JPXDecode/CCITTFaxDecode/JBIG2Decode, /Crypt, corrupt data) — the
    caller skips the stream, matching pdfjs's text-only consumption.
    (Image XObjects have their own consumer: ``extract_pdf_images``
    decodes DCTDecode payloads for real via ``functions/jpeg.py``.)"""
    names, parms = _filter_chain(d)
    return _apply_filters(names, parms, data)


def _apply_filters(
    names: list[bytes], parms: list[dict[str, int]], data: bytes
) -> bytes | None:
    for k, name in enumerate(names):
        pd = parms[k] if k < len(parms) else {}
        try:
            if name == b"FlateDecode":
                data = zlib.decompress(data)
            elif name == b"LZWDecode":
                data = _lzw_decode(data, early=pd.get("EarlyChange", 1))
            elif name == b"ASCIIHexDecode":
                data = _ahx_decode(data)
            elif name == b"ASCII85Decode":
                data = _a85_decode(data)
            elif name == b"RunLengthDecode":
                data = _rle_decode(data)
            else:
                return None
            pred = pd.get("Predictor", 1)
            if pred >= 10 and name in (b"FlateDecode", b"LZWDecode"):
                data = _png_unpredict(
                    data,
                    columns=pd.get("Columns", 1),
                    colors=pd.get("Colors", 1),
                    bpc=pd.get("BitsPerComponent", 8),
                )
            elif pred == 2 and name in (b"FlateDecode", b"LZWDecode"):
                data = _tiff_unpredict(
                    data,
                    columns=pd.get("Columns", 1),
                    colors=pd.get("Colors", 1),
                    bpc=pd.get("BitsPerComponent", 8),
                )
        except Exception:
            return None
    return data


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _tokenize(stream: bytes):
    """PDF content-stream tokens: floats, strings (bytes), names,
    array markers, operators."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\x0c\x00":
            i += 1
            continue
        if c == b"%":  # comment to EOL
            while i < n and stream[i : i + 1] not in b"\r\n":
                i += 1
            continue
        if c == b"(":
            depth, i = 1, i + 1
            buf = bytearray()
            while i < n and depth:
                ch = stream[i : i + 1]
                if ch == b"\\" and i + 1 < n:
                    nxt = stream[i + 1 : i + 2]
                    esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                           b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}
                    if nxt in esc:
                        buf += esc[nxt]
                        i += 2
                        continue
                    oc = re.match(rb"[0-7]{1,3}", stream[i + 1 : i + 4])
                    if oc:
                        buf.append(int(oc.group(), 8) & 0xFF)
                        i += 1 + len(oc.group())
                        continue
                    i += 1  # line continuation / unknown escape: drop backslash
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                buf += ch
                i += 1
            yield ("str", bytes(buf))
            continue
        if c == b"<" and stream[i + 1 : i + 2] != b"<":
            j = stream.find(b">", i)
            hexs = re.sub(rb"[^0-9A-Fa-f]", b"", stream[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            yield ("str", bytes.fromhex(hexs.decode()))
            i = j + 1
            continue
        if c == b"<":  # << dict — skip to matching >>
            depth, i = 1, i + 2
            while i < n and depth:
                if stream[i : i + 2] == b"<<":
                    depth += 1
                    i += 2
                elif stream[i : i + 2] == b">>":
                    depth -= 1
                    i += 2
                else:
                    i += 1
            continue
        if c in b"[]":
            yield ("arr", c.decode())
            i += 1
            continue
        if c == b"/":
            j = i + 1
            while j < n and stream[j : j + 1] not in _WS + _DELIM:
                j += 1
            yield ("name", stream[i:j].decode("latin-1"))
            i = j
            continue
        j = i
        while j < n and stream[j : j + 1] not in _WS + _DELIM:
            j += 1
        tok = stream[i:j].decode("latin-1")
        i = j if j > i else i + 1
        try:
            yield ("num", float(tok))
        except ValueError:
            if tok:
                yield ("op", tok)


_BI_RE = re.compile(rb"(?:^|(?<=[\s\x00]))BI(?=[\s\x00/])")
_ID_RE = re.compile(rb"(?<=[\s\x00])ID(?=[\s\x00])")
_EI_RE = re.compile(rb"(?<=[\s\x00])EI(?=[\s\x00()<>\[\]{}/%]|$)")


def _strip_inline_images(stream: bytes) -> bytes:
    """Remove ``BI … ID <binary> EI`` inline-image blocks so the
    arbitrary binary payload after ``ID`` can't derail the tokenizer.
    A ``BI`` with no following ``ID`` is treated as ordinary text
    (e.g. inside a shown string); the terminator heuristic
    (whitespace-delimited ``EI``) is the same one pdfjs's lexer falls
    back to for images without /L."""
    out = bytearray()
    i = 0
    while True:
        m = _BI_RE.search(stream, i)
        if not m:
            out += stream[i:]
            return bytes(out)
        idm = _ID_RE.search(stream, m.end())
        if not idm:
            out += stream[i : m.end()]
            i = m.end()
            continue
        out += stream[i : m.start()]
        e = _EI_RE.search(stream, idm.end())
        i = e.end() if e else len(stream)


def _decode_text(s: bytes) -> str:
    if s.startswith(b"\xfe\xff"):  # UTF-16BE BOM (hex-string unicode)
        return s[2:].decode("utf-16-be", errors="replace")
    return s.decode("latin-1")


# ------------------------------------------------------------- encryption


def _dict_string(d: bytes, key: bytes) -> bytes | None:
    """The string value of ``/Key`` in a dict body: hex ``<…>`` or
    literal ``(…)`` with backslash escapes (the two PDF string forms)."""
    m = re.search(rb"/" + key + rb"\s*(<|\()", d)
    if not m:
        return None
    i = m.end()
    if m.group(1) == b"<":
        j = d.find(b">", i)
        hexs = re.sub(rb"[^0-9A-Fa-f]", b"", d[i:j])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode())
    buf = bytearray()
    depth = 1
    while i < len(d) and depth:
        ch = d[i : i + 1]
        if ch == b"\\" and i + 1 < len(d):
            nxt = d[i + 1 : i + 2]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
                   b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\"}
            if nxt in esc:
                buf += esc[nxt]
                i += 2
                continue
            oc = re.match(rb"[0-7]{1,3}", d[i + 1 : i + 4])
            if oc:
                buf.append(int(oc.group(), 8) & 0xFF)
                i += 1 + len(oc.group())
                continue
            i += 1
            continue
        if ch == b"(":
            depth += 1
        elif ch == b")":
            depth -= 1
            if not depth:
                break
        buf += ch
        i += 1
    return bytes(buf)


class _Encryption:
    """Resolved standard-security-handler state for one document:
    ``enc_num`` (the /Encrypt object, never decrypted), the file key,
    and the stream crypt filter method (V2 | AESV2 | AESV3 |
    Identity). ``locked`` = password-protected beyond the empty user
    password — the caller skips the document (pdfjs would prompt)."""

    def __init__(self, enc_num: int, fkey: bytes | None, cfm: str, locked: bool):
        self.enc_num, self.fkey, self.cfm, self.locked = enc_num, fkey, cfm, locked

    def decrypt(self, num: int, data: bytes) -> bytes | None:
        if self.cfm == "Identity" or num == self.enc_num:
            return data
        if self.locked or self.fkey is None:
            return None
        from crawler_spark.operators.pdf_crypt import decrypt_stream

        try:
            return decrypt_stream(data, self.fkey, num, 0, self.cfm)
        except Exception:
            return None


_PUBSEC_KEYS: list[tuple[int, int]] = []


def register_pubsec_key(n: int, d: int) -> None:
    """Register an RSA private key (n, d) for /Adobe.PubSec documents
    — real deployments load recipient keys per executor; without one,
    public-key-encrypted documents stay locked and are skipped."""
    _PUBSEC_KEYS.append((n, d))


def clear_pubsec_keys() -> None:
    _PUBSEC_KEYS.clear()


def _pubsec_encryption(pdf: bytes, enc_num: int, d: bytes) -> _Encryption:
    """/Adobe.PubSec (ISO 32000-1 §7.6.4): decrypt a /Recipients CMS
    blob with a registered RSA key → 20-byte seed; file key =
    SHA-1(seed || all blobs [|| FFFFFFFF]) truncated to /Length."""
    from crawler_spark.operators import pdf_crypt as C

    rm = re.search(rb"/Recipients\s*\[(.*?)\]", d, re.S)
    if not rm:
        return _Encryption(enc_num, None, "V2", locked=True)
    blobs = [
        bytes.fromhex(re.sub(rb"\s", rb"", h).decode())
        for h in re.findall(rb"<([0-9A-Fa-f\s]+)>", rm.group(1))
    ]
    if not blobs:
        return _Encryption(enc_num, None, "V2", locked=True)
    bm = re.search(rb"/Length\s+(\d+)", d)
    bits = int(bm.group(1)) if bm else 128
    if bits < 40:
        bits *= 8  # some writers put a BYTE length in the CF dict
    cfm = "V2"
    cm = re.search(rb"/CFM\s*/(\w+)", d)
    if cm:
        cfm = cm.group(1).decode()
    enc_meta = re.search(rb"/EncryptMetadata\s+false", d) is None
    for n, priv in _PUBSEC_KEYS:
        for blob in blobs:
            plain = C.open_pubsec_recipient(blob, n, priv)
            if plain is None:
                continue
            fkey = C.pubsec_file_key(plain[:20], blobs, bits, enc_meta)
            return _Encryption(enc_num, fkey, cfm, locked=False)
    return _Encryption(enc_num, None, "V2", locked=True)


def _encryption(pdf: bytes) -> _Encryption | None:
    """Parse the trailer's /Encrypt reference (standard handler +
    /Adobe.PubSec with registered keys; PDF 32000-1:2008 §7.6.3/§7.6.4
    + ISO 32000-2 R6). Empty-user-password documents unlock; anything
    else is marked locked and skipped. Mirrors pdfjs's silent open of
    owner-locked PDFs (/root/reference/src/lib/processPDf.ts:13-97
    via getDocument) — pdfjs has no PubSec support at all, so the
    handler here is beyond-reference surface."""
    from crawler_spark.operators import pdf_crypt as C

    ms = list(re.finditer(rb"/Encrypt\s+(\d+)\s+\d+\s+R", pdf))
    if not ms:
        return None
    enc_num = int(ms[-1].group(1))
    om = re.search(rb"(?m)^%d\s+\d+\s+obj\b(.*?)endobj" % enc_num, pdf, re.S)
    if not om:
        return _Encryption(enc_num, None, "V2", locked=True)
    d = om.group(1)
    if b"/Adobe.PubSec" in d:
        return _pubsec_encryption(pdf, enc_num, d)
    if b"/Standard" not in d:  # custom handler — out of scope
        return _Encryption(enc_num, None, "V2", locked=True)

    def _int(key: bytes, default: int) -> int:
        m = re.search(rb"/" + key + rb"\s+(-?\d+)", d)
        return int(m.group(1)) if m else default

    v, r, p = _int(b"V", 0), _int(b"R", 2), _int(b"P", -1)
    bits = _int(b"Length", 40)
    o, u = _dict_string(d, b"O"), _dict_string(d, b"U")
    if o is None or u is None:
        return _Encryption(enc_num, None, "V2", locked=True)
    cfm = "V2"
    if v >= 4:
        cm = re.search(rb"/CFM\s*/(\w+)", d)
        cfm = cm.group(1).decode() if cm else "Identity"
        sm = re.search(rb"/StmF\s*/(\w+)", d)
        if sm and sm.group(1) == b"Identity":
            cfm = "Identity"
    if v == 5:
        ue = _dict_string(d, b"UE")
        fkey = C.file_key_r6(u, ue or b"") if len(u) >= 48 and ue else None
        return _Encryption(enc_num, fkey, cfm if fkey else "V2", locked=fkey is None)
    idm = re.search(rb"/ID\s*\[\s*(<[0-9A-Fa-f\s]*>|\([^)]*\))", pdf)
    id0 = _dict_string(b"/X " + idm.group(1), b"X") if idm else b""
    # /EncryptMetadata false changes the Algorithm 2 key for R>=4
    enc_meta = re.search(rb"/EncryptMetadata\s+false", d) is None
    fkey = C.file_key_rc4(o, p, id0 or b"", r, bits, encrypt_metadata=enc_meta)
    expect = C.user_value_rc4(fkey, id0 or b"", r)
    ok = expect[:16] == u[:16] if r >= 3 else expect == u[:32]
    return _Encryption(enc_num, fkey if ok else None, cfm, locked=not ok)


# ---------------------------------------------------------------- objects
_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.S)


def _parse_objects(pdf: bytes) -> dict[int, tuple[bytes, bytes | None, float]]:
    """{objnum: (dict_bytes, decoded_stream_or_None, file_order)} —
    top-level ``N 0 obj`` blocks plus the objects packed inside any
    ``/Type /ObjStm`` container (PDF 1.5 compressed object streams:
    a header of N (objnum, offset) int pairs, then the serialized
    objects at ``/First + offset``). ObjStm children carry their
    container's file order (they are never content streams)."""
    objs: dict[int, tuple[bytes, bytes | None, float]] = {}
    enc = _encryption(pdf)
    for order, m in enumerate(_OBJ_RE.finditer(pdf)):
        num, body = int(m.group(1)), m.group(2)
        sm = re.search(rb"<<(.*)>>\s*stream\r?\n", body, re.S)
        if not sm:
            objs[num] = (body.strip(), None, float(order))
            continue
        d = sm.group(1)
        data = body[sm.end() : body.rfind(b"endstream")]
        # Binary (encrypted / compressed) stream bytes may legitimately END
        # with \r or \n, so trimming the pre-endstream EOL by inspection can
        # eat a real data byte (1/256 of random-tail streams). A direct
        # /Length entry bounds the data exactly; the EOL heuristic is only
        # the fallback for indirect-Length files.
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", d)
        if lm and int(lm.group(1)) <= len(data):
            data = data[: int(lm.group(1))]
        elif data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
        if enc is not None:
            dec = enc.decrypt(num, data)
            if dec is None:  # locked document / undecryptable stream
                objs[num] = (d, None, float(order))
                continue
            data = dec
        objs[num] = (d, _decode_stream(d, data), float(order))
    # expand object streams
    for num, (d, data, order) in list(objs.items()):
        if data is None or b"/ObjStm" not in d:
            continue
        nm = re.search(rb"/N\s+(\d+)", d)
        fm = re.search(rb"/First\s+(\d+)", d)
        if not (nm and fm):
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        header = data[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [(int(header[2 * k]), int(header[2 * k + 1])) for k in range(n)]
        for k, (onum, off) in enumerate(pairs):
            end = first + pairs[k + 1][1] if k + 1 < n else len(data)
            objs.setdefault(
                onum, (data[first + off : end].strip(), None, order + 0.001 * (k + 1))
            )
    return objs


# ------------------------------------------------------------------ CMaps
def _parse_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """(code_width_bytes, {code: unicode}) from a ToUnicode CMap:
    bfchar entries, array-form bfrange, and simple-form bfrange
    (<lo> <hi> <dst>; the LAST UTF-16BE code unit increments, so
    surrogate-pair dsts walk supplementary-plane code points — the
    composite-font case). Width comes from codespacerange."""
    width = 1
    cs = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data
    )
    if cs:
        width = max(1, len(cs.group(1)) // 2)
    cmap: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = re.findall(rb"<([0-9A-Fa-f]+)>", m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            h = dst.decode()
            if len(h) % 4:
                h = "0" * (4 - len(h) % 4) + h
            cmap[int(src, 16)] = bytes.fromhex(h).decode(
                "utf-16-be", errors="replace"
            )
    # entries parsed IN ORDER with one alternation — a naive
    # simple-form scan would also match hex triples inside an
    # array-form dst list
    entry_re = re.compile(
        rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
        rb"(\[(?:\s*<[0-9A-Fa-f]+>)+\s*\]|<[0-9A-Fa-f]+>)"
    )

    def _u16(h: str) -> str:
        if len(h) % 4:
            h = "0" * (4 - len(h) % 4) + h
        return bytes.fromhex(h).decode("utf-16-be", errors="replace")

    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for em in entry_re.finditer(m.group(1)):
            lo, hi, dst = em.group(1), em.group(2), em.group(3)
            if dst.startswith(b"["):
                # array form: one UTF-16BE dst string per code
                for i, d in enumerate(re.findall(rb"<([0-9A-Fa-f]+)>", dst)):
                    cmap.setdefault(int(lo, 16) + i, _u16(d.decode()))
                continue
            h = dst[1:-1].decode()
            if len(h) % 4:
                h = "0" * (4 - len(h) % 4) + h
            # dst is a UTF-16BE string; per the CMap spec (and pdfjs)
            # the LAST code unit increments across the range — which
            # makes surrogate-pair dsts (supplementary-plane targets,
            # e.g. math alphanumerics) walk consecutive code points.
            units = [int(h[k : k + 4], 16) for k in range(0, len(h), 4)]
            for i in range(int(hi, 16) - int(lo, 16) + 1):
                u = units[:-1] + [units[-1] + i]
                s = b"".join(x.to_bytes(2, "big") for x in u).decode(
                    "utf-16-be", errors="replace"
                )
                cmap.setdefault(int(lo, 16) + i, s)
    return width, cmap


# ------------------------------------------------- simple-font encodings
# /Encoding support for simple (1-byte) fonts WITHOUT a /ToUnicode
# CMap: a base encoding (WinAnsi ≅ cp1252, MacRoman ≅ mac_roman —
# both exact stdlib codecs — StandardEncoding from the PDF 32000
# Annex D table) overridden by a /Differences array of glyph names,
# resolved through an Adobe-Glyph-List subset plus the uniXXXX/uXXXX
# algorithmic forms. This is the common non-embedded-CMap case in
# real PDFs (pdfjs: PartialEvaluator.preEvaluateFont handles it the
# same way). Fonts with neither /ToUnicode nor /Encoding keep the
# latin-1 fallback.

_AGL: dict[str, str] = {
    # ASCII punctuation / symbols by AGL name
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    # typographic
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "florin": "ƒ", "fraction": "⁄", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fi": "ﬁ", "fl": "ﬂ", "minus": "−",
    "trademark": "™", "Euro": "€",
    # latin-1 supplement symbols
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    # non-composable letters + accents-as-marks
    "AE": "Æ", "ae": "æ", "Oslash": "Ø", "oslash": "ø",
    "Eth": "Ð", "eth": "ð", "Thorn": "Þ", "thorn": "þ",
    "germandbls": "ß", "Lslash": "Ł", "lslash": "ł",
    "OE": "Œ", "oe": "œ", "dotlessi": "ı",
    "Ydieresis": "Ÿ",
    "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "tilde": "˜", "hungarumlaut": "˝",
}
# accented Latin (Agrave … zcaron) generated from Unicode names — the
# AGL naming rule for these is exactly "<letter><accent-word>"
_ACCENT_WORDS = {
    "GRAVE": "grave", "ACUTE": "acute", "CIRCUMFLEX": "circumflex",
    "TILDE": "tilde", "DIAERESIS": "dieresis", "RING ABOVE": "ring",
    "CEDILLA": "cedilla", "MACRON": "macron", "BREVE": "breve",
    "CARON": "caron", "OGONEK": "ogonek", "DOUBLE ACUTE": "hungarumlaut",
    "DOT ABOVE": "dotaccent", "STROKE": "slash",
}


def _build_accented() -> None:
    import unicodedata

    for cp in range(0x00C0, 0x0180):
        ch = chr(cp)
        m = re.fullmatch(
            r"LATIN (CAPITAL|SMALL) LETTER ([A-Z]) WITH ([A-Z ]+)",
            unicodedata.name(ch, ""),
        )
        if m and m.group(3) in _ACCENT_WORDS:
            letter = m.group(2) if m.group(1) == "CAPITAL" else m.group(2).lower()
            _AGL.setdefault(letter + _ACCENT_WORDS[m.group(3)], ch)


_build_accented()


def _glyph_to_unicode(name: str) -> str:
    """AGL-subset glyph-name resolution: uniXXXX[XXXX…] (UTF-16BE),
    uXXXX[XX] (code point), single ASCII char names, table names.
    Unknown names resolve to '' (.notdef)."""
    if re.fullmatch(r"uni(?:[0-9A-Fa-f]{4})+", name):
        return bytes.fromhex(name[3:]).decode("utf-16-be", errors="replace")
    if re.fullmatch(r"u[0-9A-Fa-f]{4,6}", name):
        cp = int(name[1:], 16)
        return chr(cp) if cp <= 0x10FFFF else ""
    if len(name) == 1 and " " <= name <= "~":
        return name
    return _AGL.get(name, "")


# Adobe StandardEncoding high range (PDF 32000 Annex D.2), octal codes
_STD_HIGH = {
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling", 0o244: "fraction",
    0o245: "yen", 0o246: "florin", 0o247: "section", 0o250: "currency",
    0o251: "quotesingle", 0o252: "quotedblleft", 0o253: "guillemotleft",
    0o254: "guilsinglleft", 0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase", 0o272: "quotedblright",
    0o273: "guillemotright", 0o274: "ellipsis", 0o275: "perthousand",
    0o277: "questiondown", 0o301: "grave", 0o302: "acute",
    0o303: "circumflex", 0o304: "tilde", 0o305: "macron", 0o306: "breve",
    0o307: "dotaccent", 0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron", 0o320: "emdash",
    0o341: "AE", 0o343: "ordfeminine", 0o350: "Lslash", 0o351: "Oslash",
    0o352: "OE", 0o353: "ordmasculine", 0o361: "ae", 0o365: "dotlessi",
    0o370: "lslash", 0o371: "oslash", 0o372: "oe", 0o373: "germandbls",
}


def _base_encoding_map(name: str | None) -> dict[int, str]:
    if name == "WinAnsiEncoding":
        codec = "cp1252"
    elif name == "MacRomanEncoding":
        codec = "mac_roman"
    elif name == "StandardEncoding":
        mp = {c: chr(c) for c in range(0x20, 0x7F)}
        mp[0x27] = "’"  # quoteright
        mp[0x60] = "‘"  # quoteleft
        for code, glyph in _STD_HIGH.items():
            mp[code] = _glyph_to_unicode(glyph)
        return mp
    else:  # absent/unknown base: builtin ≈ latin-1 printable range
        return {c: chr(c) for c in range(0x20, 0x100)}
    mp = {}
    for c in range(0x20, 0x100):
        try:
            mp[c] = bytes([c]).decode(codec)
        except UnicodeDecodeError:
            pass  # undefined slot in the codepage
    return mp


def _scan_dict(b: bytes, i: int) -> tuple[int, bytes] | None:
    """Balanced ``<< … >>`` starting at ``b[i:i+2] == b'<<'`` →
    (index after the closing >>, inner body). None if unbalanced."""
    if b[i : i + 2] != b"<<":
        return None
    depth, j = 0, i
    while j < len(b) - 1:
        two = b[j : j + 2]
        if two == b"<<":
            depth += 1
            j += 2
        elif two == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return j, b[i + 2 : j - 2]
        else:
            j += 1
    return None


def _pdf_name(raw: bytes) -> str:
    """PDF name token with #xx escapes resolved."""
    return re.sub(
        rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
    ).decode("latin-1")


def _font_resource_entries(objs) -> list[tuple[str, bytes]]:
    """(resource_name, font_dict_bytes) for every /Font resource
    entry — indirect refs AND inline font dicts (both appear in the
    wild). Values that are bare names are skipped (not valid fonts)."""
    out: list[tuple[str, bytes]] = []
    for d, _s, _o in objs.values():
        for fm in re.finditer(rb"/Font\s*(?=<<)", d):
            res = _scan_dict(d, fm.end())
            if res is None:
                continue
            body = res[1]
            i = 0
            key_re = re.compile(rb"/([#\w]+)\s*")
            while True:
                m = key_re.search(body, i)
                if m is None:
                    break
                name = _pdf_name(m.group(1))
                rm = re.compile(rb"(\d+)\s+\d+\s+R").match(body, m.end())
                if rm:
                    num = int(rm.group(1))
                    if num in objs:
                        out.append((name, objs[num][0]))
                    i = rm.end()
                    continue
                if body[m.end() : m.end() + 2] == b"<<":
                    sub = _scan_dict(body, m.end())
                    if sub is not None:
                        out.append((name, sub[1]))
                        i = sub[0]
                        continue
                i = m.end()
    return out


def _font_encodings(objs) -> dict[str, dict[int, str]]:
    """resource_name → {code: unicode} for simple fonts carrying an
    /Encoding (name, indirect dict, or inline dict with
    /BaseEncoding + /Differences). /ToUnicode fonts are resolved by
    :func:`_font_cmaps` instead, which takes precedence."""
    out: dict[str, dict[int, str]] = {}
    for name, fd in _font_resource_entries(objs):
        if b"/ToUnicode" in fd:
            continue
        em = re.search(rb"/Encoding\b\s*", fd)
        if em is None:
            continue
        rest = fd[em.end() :]
        ed: bytes | None = None
        if rest.startswith(b"<<"):
            sub = _scan_dict(fd, em.end())
            ed = sub[1] if sub else None
        else:
            rm = re.match(rb"(\d+)\s+\d+\s+R", rest)
            nm = re.match(rb"/([#\w]+)", rest)
            if rm:
                o = objs.get(int(rm.group(1)))
                ed = o[0] if o else None
            elif nm:
                out[name] = _base_encoding_map(_pdf_name(nm.group(1)))
                continue
        if ed is None:
            continue
        bm = re.search(rb"/BaseEncoding\s*/([#\w]+)", ed)
        mp = _base_encoding_map(_pdf_name(bm.group(1)) if bm else None)
        dm = re.search(rb"/Differences\s*\[([^\]]*)\]", ed, re.S)
        if dm:
            code = 0
            for tok in re.finditer(rb"(\d+)|/([#\w.]+)", dm.group(1)):
                if tok.group(1):
                    code = int(tok.group(1))
                    continue
                u = _glyph_to_unicode(_pdf_name(tok.group(2)))
                if u:
                    mp[code] = u
                else:
                    mp.pop(code, None)  # unknown glyph → .notdef
                code += 1
        out[name] = mp
    return out


def _ttf_cmap_unicode_to_gid(font: bytes) -> dict[int, int]:
    """{code point: glyph id} from an sfnt's 'cmap' table (format 4 or
    format 12 subtables; (3,1)/(0,*) preferred) — the public OpenType
    spec layout. Raises on a malformed table; callers quarantine."""
    if len(font) < 12:
        raise ValueError("not an sfnt")
    num_tables = struct.unpack_from(">H", font, 4)[0]
    cmap_off = None
    for i in range(num_tables):
        tag, _csum, off, _ln = struct.unpack_from(">4sIII", font, 12 + 16 * i)
        if tag == b"cmap":
            cmap_off = off
            break
    if cmap_off is None:
        raise ValueError("no cmap table")
    n_enc = struct.unpack_from(">H", font, cmap_off + 2)[0]
    best = None
    for i in range(n_enc):
        pid, eid, off = struct.unpack_from(">HHI", font, cmap_off + 4 + 8 * i)
        score = {(3, 10): 4, (3, 1): 3, (0, 4): 2}.get((pid, eid), 1 if pid == 0 else 0)
        if best is None or score > best[0]:
            best = (score, cmap_off + off)
    if best is None:
        raise ValueError("no cmap subtable")
    sub = best[1]
    fmt = struct.unpack_from(">H", font, sub)[0]
    out: dict[int, int] = {}
    if fmt == 4:
        seg_x2 = struct.unpack_from(">H", font, sub + 6)[0]
        segs = seg_x2 // 2
        ends = struct.unpack_from(f">{segs}H", font, sub + 14)
        starts = struct.unpack_from(f">{segs}H", font, sub + 16 + seg_x2)
        deltas = struct.unpack_from(f">{segs}h", font, sub + 16 + 2 * seg_x2)
        ro_base = sub + 16 + 3 * seg_x2
        ros = struct.unpack_from(f">{segs}H", font, ro_base)
        for s in range(segs):
            if starts[s] == 0xFFFF:
                continue
            for c in range(starts[s], ends[s] + 1):
                if ros[s] == 0:
                    gid = (c + deltas[s]) & 0xFFFF
                else:
                    gi_off = ro_base + 2 * s + ros[s] + 2 * (c - starts[s])
                    gid = struct.unpack_from(">H", font, gi_off)[0]
                    if gid:
                        gid = (gid + deltas[s]) & 0xFFFF
                if gid:
                    out[c] = gid
    elif fmt == 12:
        n_groups = struct.unpack_from(">I", font, sub + 12)[0]
        for g in range(n_groups):
            lo, hi, gid0 = struct.unpack_from(">III", font, sub + 16 + 12 * g)
            for c in range(lo, hi + 1):
                out[c] = gid0 + (c - lo)
    else:
        raise ValueError(f"cmap format {fmt} unsupported")
    return out


def _font_cmaps(
    objs: dict[int, tuple[bytes, bytes | None, float]],
) -> tuple[dict[str, tuple[int, dict[int, str]]], set[int]]:
    """Resource-name → (width, cmap) for every font that resolves to a
    code→unicode map, plus the set of CMap stream object numbers (so
    they are never mistaken for page content). Resolution order, per
    font:

      1. ``/ToUnicode N 0 R`` — wins whenever present (simple AND
         composite fonts; 2-byte codespaces give width 2). EMBEDDED
         ``/UseCMap`` chains resolve (late-r4): the CMap stream
         dict's reference loads recursively as the base map and the
         descendant's entries override (ISO 32000-1 §9.7.5.2), with
         a depth guard against cycles; the algorithmic
         ``/Identity-H|-V usecmap`` content form widens the
         codespace. Predefined-NAME usecmap (UniGB-UCS2-H …) needs
         the Adobe CMap resource files and stays out (documented);
      2. composite subset (r4): ``/Subtype /Type0`` with ``/Encoding
         /Identity-H|-V`` and a CIDFontType2 descendant whose
         ``/CIDToGIDMap`` is ``/Identity`` (or absent — the spec
         default), OR the stream form (2-byte big-endian GID per CID,
         ISO 32000-1 §9.7.4.2): code = CID maps to a glyph, and
         reversing the embedded TrueType ``cmap`` table (/FontFile2)
         recovers unicode. This is the common no-ToUnicode
         CJK/Vietnamese export.

    Resource names are collected document-wide — per-page /Font dicts
    with CONFLICTING names for different fonts are out of the subset
    (documented)."""
    font_obj: dict[str, int] = {}
    for d, _s, _o in objs.values():
        for fm in re.finditer(rb"/Font\s*<<(.*?)>>", d, re.S):
            for name, ref in re.findall(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
                font_obj[name.decode("latin-1")] = int(ref)
    out: dict[str, tuple[int, dict[int, str]]] = {}
    cmap_objs: set[int] = set()

    def load_chain(cnum: int, depth: int = 0):
        """CMap stream + its embedded /UseCMap ancestry (ISO 32000-1
        §9.7.5.2: the stream dict references the base CMap stream;
        descendant entries override). Predefined-name usecmap stays
        out of scope except the algorithmic Identity pair, which only
        widens the codespace."""
        if depth > 8:
            return None  # circular /UseCMap chain
        entry = objs.get(cnum)
        if entry is None or entry[1] is None:
            return None
        cmap_objs.add(cnum)
        width, cmap = _parse_cmap(entry[1])
        um = re.search(rb"/UseCMap\s+(\d+)\s+\d+\s+R", entry[0])
        if um:
            base = load_chain(int(um.group(1)), depth + 1)
            if base is not None:
                bwidth, bmap = base
                merged = dict(bmap)
                merged.update(cmap)
                return max(width, bwidth), merged
        if re.search(rb"/Identity-[HV]\s+usecmap", entry[1]):
            width = max(width, 2)
        return width, cmap

    for name, fnum in font_obj.items():
        if fnum not in objs:
            continue
        fd = objs[fnum][0]
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fd)
        if tm:
            loaded = load_chain(int(tm.group(1)))
            if loaded is None:
                continue
            out[name] = loaded
            continue
        # composite Identity-H/V without ToUnicode
        if not (
            re.search(rb"/Subtype\s*/Type0\b", fd)
            and re.search(rb"/Encoding\s*/Identity-[HV]\b", fd)
        ):
            continue
        dm = re.search(rb"/DescendantFonts\s*\[\s*(\d+)\s+\d+\s+R", fd)
        if not dm or int(dm.group(1)) not in objs:
            continue
        dd = objs[int(dm.group(1))][0]
        c2g = re.search(rb"/CIDToGIDMap\s*(/\w+|\d+\s+\d+\s+R)", dd)
        cid_gids: bytes | None = None  # stream form: 2-byte GID per CID
        if c2g and c2g.group(1) != b"/Identity":
            sm_ = re.match(rb"(\d+)\s+\d+\s+R", c2g.group(1))
            if not sm_:
                continue  # named non-identity: out of subset
                # (absent defaults to /Identity per ISO 32000-1 §9.7.4.2)
            centry = objs.get(int(sm_.group(1)))
            if centry is None or centry[1] is None:
                continue  # (streams arrive pre-decoded from _parse_objects)
            cmap_objs.add(int(sm_.group(1)))
            cid_gids = centry[1]
        fdm = re.search(rb"/FontDescriptor\s+(\d+)\s+\d+\s+R", dd)
        if not fdm or int(fdm.group(1)) not in objs:
            continue
        ffm = re.search(rb"/FontFile2\s+(\d+)\s+\d+\s+R", objs[int(fdm.group(1))][0])
        if not ffm or int(ffm.group(1)) not in objs:
            continue
        ff_d, ff_s, _ = objs[int(ffm.group(1))]
        if ff_s is None:
            continue
        program = _decode_stream(ff_d, ff_s)
        if program is None:
            program = ff_s
        try:
            u2g = _ttf_cmap_unicode_to_gid(program)
        except (ValueError, struct.error):
            continue
        cmap_objs.add(int(ffm.group(1)))
        # invert the font's unicode→gid map (first unicode wins on
        # shared glyphs), then map each CID (the 2-byte code under
        # Identity-H) to its glyph: identity, or through the stream
        # form's 2-byte big-endian GID array (ISO 32000-1 §9.7.4.2)
        g2u: dict[int, str] = {}
        for cp, gid in sorted(u2g.items()):
            g2u.setdefault(gid, chr(cp))
        if cid_gids is None:
            out[name] = (2, g2u)
        else:
            cid2u: dict[int, str] = {}
            for c in range(len(cid_gids) // 2):
                gid = int.from_bytes(cid_gids[2 * c : 2 * c + 2], "big")
                if gid and gid in g2u:
                    cid2u[c] = g2u[gid]
            out[name] = (2, cid2u)
    return out, cmap_objs


def extract_pdf_items(pdf: bytes) -> list[dict]:
    """[{page, idx, y, str}] — the pdfjs-items analog for the subset."""
    objs = _parse_objects(pdf)
    fonts, cmap_objs = _font_cmaps(objs)
    encodings = _font_encodings(objs)
    items: list[dict] = []
    page = 0
    for num in sorted(objs, key=lambda n: objs[n][2]):  # file order
        d, stream, _order = objs[num]
        if stream is None or num in cmap_objs or b"/ObjStm" in d:
            continue
        if b"BT" not in stream:
            continue
        page += 1
        idx = 0
        y = 0.0
        leading = 0.0
        cur_font: str | None = None
        stack: list = []
        in_array: list | None = None

        def emit(text: str):
            nonlocal idx
            if text:
                items.append({"page": page, "idx": idx, "y": round(y, 4), "str": text})
                idx += 1

        def decode(s: bytes) -> str:
            font = fonts.get(cur_font or "")
            if font is not None:  # /ToUnicode CMap wins
                width, cmap = font
                return "".join(
                    cmap.get(int.from_bytes(s[i : i + width], "big"), "")
                    for i in range(0, len(s) - width + 1, width)
                )
            enc = encodings.get(cur_font or "")
            # BOM'd UTF-16BE hex strings bypass the 1-byte encoding map
            # (the fixture path for non-latin-1 text)
            if enc is not None and not s.startswith(b"\xfe\xff"):
                return "".join(enc.get(b, "") for b in s)
            return _decode_text(s)

        if b"BI" in stream:
            stream = _strip_inline_images(stream)
        for kind, val in _tokenize(stream):
            if kind == "arr":
                in_array = [] if val == "[" else in_array
                if val == "]":
                    stack.append(("array", in_array or []))
                    in_array = None
                continue
            if in_array is not None:
                if kind == "str":
                    in_array.append(val)
                continue
            if kind in ("num", "str", "name"):
                stack.append((kind, val))
                continue
            op = val
            if op == "BT":
                y, leading = 0.0, 0.0
            elif op == "Tf" and len(stack) >= 2 and stack[-2][0] == "name":
                cur_font = stack[-2][1].lstrip("/")
            elif op == "Tm" and len(stack) >= 6:
                y = float(stack[-1][1])
            elif op == "Td" and len(stack) >= 2:
                y += float(stack[-1][1])
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1][1])
                y += float(stack[-1][1])
            elif op == "TL" and stack:
                leading = float(stack[-1][1])
            elif op == "T*":
                y -= leading
            elif op == "Tj" and stack and stack[-1][0] == "str":
                emit(decode(stack[-1][1]))
            elif op == "'" and stack and stack[-1][0] == "str":
                y -= leading
                emit(decode(stack[-1][1]))
            elif op == "TJ" and stack and stack[-1][0] == "array":
                emit("".join(decode(x) for x in stack[-1][1]))
            stack = []
    return items


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------

PDF_ITEM_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("page", T.IntegerType(), False),
            T.StructField("idx", T.IntegerType(), False),
            T.StructField("y", T.DoubleType(), False),
            T.StructField("str", T.StringType(), False),
        ]
    )
)


def pdf_items_col(data: Column | str) -> Column:
    """Array<struct<page,idx,y,str>> per PDF binary (Arrow-batched)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PDF_ITEM_SCHEMA)
    def _dec(s):
        return s.map(lambda b: extract_pdf_items(bytes(b)) if b is not None else [])

    c = F.col(data) if isinstance(data, str) else data
    return _dec(c)


def pdf_text(df: DataFrame, bytes_col: str, *key_cols: str) -> DataFrame:
    """PDF binaries → (keys, page, text): decode (this module) then the
    reference's assembly/cleanup (operators/pdf.py) — the full S8 path."""
    from crawler_spark.operators.pdf import assemble_pdf_text

    items = df.select(*key_cols, F.inline(pdf_items_col(bytes_col)))
    # assemble_pdf_text expects (doc_id, page, idx, y, str)
    if "doc_id" not in key_cols:
        items = items.withColumnRenamed(key_cols[0], "doc_id")
    return assemble_pdf_text(items)


# --------------------------------------------------------------------------
# Image XObjects (r3): the graft's image payload inside PDFs.
#
# The reference consumes PDFs text-only (processPDf.ts:13-97 via
# pdfjs getTextContent — images are never read). The graft's payload
# axis wants the images too: extract_pdf_images pulls /Subtype /Image
# XObjects and DECODES them for real — /DCTDecode payloads through the
# baseline JPEG codec (functions/jpeg.py), raw /DeviceRGB 8-bit
# streams directly, with any non-image prefix filters (Flate/ASCII…)
# and standard-handler encryption applied first. CCITTFax, JBIG2 and
# JPX (r4) decode through the repo's own T.4/T.6, T.88 and T.800
# codecs; variants outside those subsets raise and surface as
# ok=False rows rather than vanishing.
# --------------------------------------------------------------------------


def make_pdf_with_images(
    images: list[dict],
    encrypt: str | None = None,
) -> bytes:
    """Fixture: one page drawing N image XObjects. Each entry:
    ``{"data": bytes, "w": int, "h": int, "filter": "DCTDecode"|None,
    "prefix": [outer filter names…]|None}`` — ``filter=None`` means a
    raw 8-bit /DeviceRGB stream. Deterministic bytes."""
    enc_dict = fkey = cfm = None
    if encrypt is not None:
        enc_dict, fkey, cfm = _fixture_encryption(encrypt)
    n = len(images)
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    xnames = " ".join(f"/Im{k} {5 + k} 0 R" for k in range(n))
    objs.append(
        f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        f"/Contents 4 0 R /Resources << /XObject << {xnames} >> >> >>".encode()
    )
    draw = b"".join(
        b"q %d 0 0 %d %d 100 cm /Im%d Do Q\n"
        % (im["w"], im["h"], 10 + 40 * k, k)
        for k, im in enumerate(images)
    )
    if fkey is not None:
        from crawler_spark.operators.pdf_crypt import encrypt_stream

        draw_out = encrypt_stream(draw, fkey, 4, 0, cfm)
    else:
        draw_out = draw
    objs.append(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(draw_out), draw_out)
    )
    # /JBIG2Globals streams are shared objects placed after the images
    globals_objs: list[bytes] = []
    globals_num: dict[int, int] = {}  # image idx → object number
    for k, im in enumerate(images):
        if im.get("jbig2_globals") is not None:
            globals_num[k] = 5 + n + len(globals_objs)
            globals_objs.append(im["jbig2_globals"])
    for num, im in enumerate(images, start=5):
        data = im["data"]
        chain = list(im.get("prefix") or [])
        if im.get("filter"):
            chain = chain + [im["filter"]]
        if im.get("prefix"):
            # prefix filters wrap the (possibly DCT) payload: encode in
            # reverse decode order
            data, _ = _encode_stream(data, im["prefix"], 0)
        filt = b""
        if chain:
            filt = b" /Filter [%s]" % b" ".join(b"/" + f.encode() for f in chain)
        decode_parms = im.get("decode_parms")
        if num - 5 in globals_num:
            decode_parms = b"<< /JBIG2Globals %d 0 R >>" % globals_num[num - 5]
        if decode_parms:
            # align to the chain: null for each prefix filter, the
            # dict for the terminal image codec
            entries = [b"null"] * (len(chain) - 1) + [decode_parms]
            filt += b" /DecodeParms [%s]" % b" ".join(entries)
        if fkey is not None:
            data = encrypt_stream(data, fkey, num, 0, cfm)
        cs = im.get("colorspace", "DeviceRGB").encode()
        bpc = im.get("bpc", 8)
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
            b"/ColorSpace /%s /BitsPerComponent %d%s /Length %d >>"
            b"\nstream\n%s\nendstream"
            % (im["w"], im["h"], cs, bpc, filt, len(data), data)
        )
    for gk, gdata in enumerate(globals_objs):
        if fkey is not None:
            from crawler_spark.operators.pdf_crypt import encrypt_stream

            gdata = encrypt_stream(gdata, fkey, 5 + n + gk, 0, cfm)
        objs.append(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(gdata), gdata)
        )
    trailer_extra = b""
    if enc_dict is not None:
        objs.append(enc_dict)
        trailer_extra = b" /Encrypt %d 0 R /ID [<%s> <%s>]" % (
            len(objs), _FIXTURE_ID0.hex().encode(), _FIXTURE_ID0.hex().encode()
        )
    out = [b"%PDF-1.4"]
    offsets = []
    pos = len(out[0]) + 1
    for i, body in enumerate(objs, start=1):
        blob = b"%d 0 obj\n%s\nendobj" % (i, body)
        offsets.append(pos)
        out.append(blob)
        pos += len(blob) + 1
    xref_pos = pos
    xref = [b"xref", b"0 %d" % (len(objs) + 1), b"0000000000 65535 f "]
    xref += [b"%010d 00000 n " % o for o in offsets]
    out.append(b"\n".join(xref))
    out.append(
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, trailer_extra, xref_pos)
    )
    return b"\n".join(out)


_IMG_SUBTYPE_RE = re.compile(rb"/Subtype\s*/Image\b")


def _object_stream(pdf: bytes, num: int, enc) -> bytes | None:
    """Decoded stream content of object ``num`` (decrypted, own
    /Filter chain applied) — resolves /JBIG2Globals references."""
    for m in _OBJ_RE.finditer(pdf):
        if int(m.group(1)) != num:
            continue
        body = m.group(2)
        sm = re.search(rb"<<(.*)>>\s*stream\r?\n", body, re.S)
        if not sm:
            return None
        d = sm.group(1)
        data = body[sm.end() : body.rfind(b"endstream")]
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", d)
        if lm and int(lm.group(1)) <= len(data):
            data = data[: int(lm.group(1))]
        elif data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
        if enc is not None:
            data = enc.decrypt(num, data)
            if data is None:
                return None
        return _decode_stream(d, data)
    return None


def extract_pdf_images(pdf: bytes) -> list[dict]:
    """[{idx, w, h, fmt, phash, ok}] for every image XObject, in file
    order. ``fmt``: 'jpg' (DCTDecode via functions/jpeg.py), 'jbig2'
    (T.88), 'ccitt' (T.4/T.6), 'jpx' (T.800 via functions/jpeg2000),
    'raw' (unfiltered /DeviceRGB 8-bit), or the blocking filter name
    with ok=False. Dimensions come from the DECODED pixels; a
    dict/pixel mismatch flips ok."""
    from crawler_spark.functions.images import phash64

    enc = _encryption(pdf)
    out: list[dict] = []

    def emit(w: int, h: int, fmt: str, phash: int, ok: bool) -> None:
        out.append(
            {"idx": len(out), "w": w, "h": h, "fmt": fmt, "phash": phash, "ok": ok}
        )

    for m in _OBJ_RE.finditer(pdf):
        num, body = int(m.group(1)), m.group(2)
        sm = re.search(rb"<<(.*)>>\s*stream\r?\n", body, re.S)
        if not sm:
            continue
        d = sm.group(1)
        if not _IMG_SUBTYPE_RE.search(d):
            continue
        wm = re.search(rb"/Width\s+(\d+)", d)
        hm = re.search(rb"/Height\s+(\d+)", d)
        dict_w = int(wm.group(1)) if wm else -1
        dict_h = int(hm.group(1)) if hm else -1
        data = body[sm.end() : body.rfind(b"endstream")]
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", d)
        if lm and int(lm.group(1)) <= len(data):
            data = data[: int(lm.group(1))]
        elif data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n"):
            data = data[:-1]
        if enc is not None:
            dec = enc.decrypt(num, data)
            if dec is None:
                emit(dict_w, dict_h, "locked", 0, False)
                continue
            data = dec
        names, parms = _filter_chain(d)
        try:
            if names and names[-1] == b"DCTDecode":
                prefix = names[:-1]
                payload = _apply_filters(prefix, parms[: len(prefix)], data)
                if payload is None:
                    emit(dict_w, dict_h, "jpg", 0, False)
                    continue
                from crawler_spark.functions.jpeg import decode_jpeg

                arr = decode_jpeg(payload)
                fmt = "jpg"
            elif names and names[-1] == b"JBIG2Decode":
                # generic/symbol/text subsets (functions/jbig2.py);
                # /JBIG2Globals resolves to its shared-segment stream;
                # unsupported variants raise → quarantine
                prefix = names[:-1]
                payload = _apply_filters(prefix, parms[: len(prefix)], data)
                if payload is None:
                    emit(dict_w, dict_h, "jbig2", 0, False)
                    continue
                import numpy as np

                from crawler_spark.functions.jbig2 import decode_jbig2_embedded

                pd_ = parms[len(names) - 1] if len(parms) >= len(names) else {}
                globals_data = None
                if "JBIG2Globals" in pd_:
                    globals_data = _object_stream(pdf, pd_["JBIG2Globals"], enc)
                    if globals_data is None:
                        emit(dict_w, dict_h, "jbig2", 0, False)
                        continue
                gray = decode_jbig2_embedded(payload, globals_data)
                arr = np.repeat(gray[:, :, None], 3, axis=2)
                fmt = "jbig2"
            elif names and names[-1] == b"JPXDecode":
                # JPEG 2000 (ITU-T T.800 — functions/jpeg2000.py):
                # raw codestreams or JP2 containers; unsupported
                # features raise → quarantine. Gray expands to RGB so
                # every image row shares one phash space.
                prefix = names[:-1]
                payload = _apply_filters(prefix, parms[: len(prefix)], data)
                if payload is None:
                    emit(dict_w, dict_h, "jpx", 0, False)
                    continue
                import numpy as np

                from crawler_spark.functions.jpeg2000 import decode_jpx

                px = decode_jpx(payload)
                if px.dtype != np.uint8:  # > 8-bit: scale to 8 for phash
                    px = (px.astype(np.uint32) >> 8).astype(np.uint8)
                if px.ndim == 2:
                    arr = np.repeat(px[:, :, None], 3, axis=2)
                elif px.shape[2] == 3:
                    arr = px
                else:
                    raise ValueError("JPX: unsupported component count")
                fmt = "jpx"
            elif names and names[-1] == b"CCITTFaxDecode":
                # scanned-document bilevel images (ITU-T T.4/T.6 —
                # functions/ccitt.py); K>0 or a bad stream raises and
                # quarantines below. Gray expands to RGB so every
                # image row shares one phash space.
                prefix = names[:-1]
                payload = _apply_filters(prefix, parms[: len(prefix)], data)
                if payload is None:
                    emit(dict_w, dict_h, "ccitt", 0, False)
                    continue
                import numpy as np

                from crawler_spark.functions.ccitt import decode_ccittfax

                pd_ = parms[len(names) - 1] if len(parms) >= len(names) else {}
                gray = decode_ccittfax(
                    payload,
                    k=pd_.get("K", 0),
                    columns=pd_.get("Columns", 1728),
                    rows=pd_.get("Rows", dict_h),
                    black_is_1=bool(pd_.get("BlackIs1", 0)),
                    byte_align=bool(pd_.get("EncodedByteAlign", 0)),
                )
                arr = np.repeat(gray[:, :, None], 3, axis=2)
                fmt = "ccitt"
            elif not names:
                if (
                    b"/DeviceRGB" not in d
                    or not re.search(rb"/BitsPerComponent\s+8\b", d)
                    or len(data) != dict_w * dict_h * 3
                ):
                    emit(dict_w, dict_h, "raw", 0, False)
                    continue
                import numpy as np

                arr = np.frombuffer(data, np.uint8).reshape(dict_h, dict_w, 3)
                fmt = "raw"
            else:
                payload = _apply_filters(names, parms, data)
                if payload is not None and len(payload) == dict_w * dict_h * 3:
                    import numpy as np

                    arr = np.frombuffer(payload, np.uint8).reshape(
                        dict_h, dict_w, 3
                    )
                    fmt = "raw"
                else:  # JPX/CCITT/JBIG2 or undecodable chain
                    emit(dict_w, dict_h, names[-1].decode("latin-1"), 0, False)
                    continue
            h_px, w_px = arr.shape[0], arr.shape[1]
            ok = (w_px, h_px) == (dict_w, dict_h)
            emit(w_px, h_px, fmt, phash64(arr), ok)
        except Exception:
            emit(dict_w, dict_h, "error", 0, False)
    return out


PDF_IMAGE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("img_idx", T.IntegerType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
            T.StructField("img_ok", T.BooleanType(), False),
        ]
    )
)


def pdf_images_col(data: Column | str) -> Column:
    """Array<struct<img_idx,w,h,fmt,phash,img_ok>> per PDF binary
    (Arrow-batched pandas UDF — no per-row Python at the boundary)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(PDF_IMAGE_SCHEMA)
    def _imgs(s):
        return s.map(
            lambda b: [
                (r["idx"], r["w"], r["h"], r["fmt"], r["phash"], r["ok"])
                for r in extract_pdf_images(bytes(b))
            ]
            if b is not None
            else []
        )

    c = F.col(data) if isinstance(data, str) else data
    return _imgs(c)


def pdf_images(df: DataFrame, bytes_col: str, *key_cols: str) -> DataFrame:
    """PDF binaries → one row per embedded image (keys, img_idx, w, h,
    fmt, phash, img_ok) — the image-side sibling of :func:`pdf_text`,
    feeding the images pipeline (phash near-dup, validation)."""
    return df.select(*key_cols, F.inline(pdf_images_col(bytes_col)))
