"""TIFF 6.0 codec (public Adobe TIFF 6.0 specification), reusing the
repo's existing compression kernels: CCITT T.4/T.6 (functions/
ccitt.py), baseline+ JPEG (functions/jpeg.py), zlib Deflate — plus
TIFF-variant LZW (MSB-first, early-change) and PackBits written here.

TIFF is the scanned-document interchange format the reference's PDF
corpus feeds from (the same CCITT/JPEG payloads appear inside PDF
XObjects, crawler_spark/operators/pdf_decode.py); the graft keeps
image payloads (the reference drops them, src/lib/md/mdUtils.ts:23-44)
so the container itself is part of the real-web envelope.

Decoder surface:
  * both byte orders (II/MM), strip- AND tile-organized images;
  * compressions: 1 none, 2 CCITT MH (byte-aligned rows), 3 CCITT G3
    2-D (T4Options bit 0), 4 CCITT G4, 5 LZW (+ horizontal
    predictor), 8/32946 Deflate (+ predictor), 7 new-style JPEG
    (with JPEGTables merging), 32773 PackBits;
  * photometrics: WhiteIsZero / BlackIsZero / RGB(+alpha dropped) /
    Palette (16-bit ColorMap, high byte) / YCbCr-via-JPEG;
  * bits per sample 1/2/4/8/16 gray+palette, 8/16 RGB (16-bit takes
    the high byte), FillOrder 2 bit reversal, PlanarConfig 2;
  * old-style JPEG (compression 6) and Separated/CMYK raise typed
    errors → quarantine rows, never garbage pixels.

The encoder twin emits every decoder shape (compression × photometric
× predictor × strip/tile × fill order) so round-trips pin both sides,
the same discipline as the JPEG/JPX/JBIG2/VP8L codecs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedTiffError(ValueError):
    """TIFF features outside the implemented envelope — callers
    quarantine the row."""


# bit-reverse LUT for FillOrder=2
_REV = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)

_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}


# --------------------------------------------------------------------------
# TIFF-variant LZW (spec §13): MSB-first code packing, 9→12 bit codes,
# Clear=256 / EOI=257, "early change" (width bumps one code early)
# --------------------------------------------------------------------------


def tiff_lzw_decode(data: bytes, max_out: int = 1 << 26) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            acc &= (1 << nbits) - 1  # keep acc bounded (else O(n²) shifts)
            if code == 256:  # Clear
                reset()
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("TIFF LZW: bad first code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("TIFF LZW: code out of range")
            out += entry
            if len(out) > max_out:
                raise ValueError("TIFF LZW: output too large")
            prev = entry
            # early change: the decoder's table lags the encoder by
            # one entry, so it bumps at 2^width - 2 (encoder at -1)
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out)


def tiff_lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1  # keep acc bounded

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # leading Clear
    cur = b""
    for byte in data:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        put(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # table nearly full: Clear and restart
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([byte])
    if cur:
        put(table[cur], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# PackBits (spec §9)
# --------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise ValueError("PackBits: truncated literal")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise ValueError("PackBits: truncated repeat")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits: short output")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)

    def run_at(k):
        r = 1
        while k + r < n and data[k + r] == data[k] and r < 128:
            r += 1
        return r

    while i < n:
        run = run_at(i)
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            j = i + 1
            while j < n and j - i < 128 and run_at(j) < 3:
                j += 1
            out.append(j - i - 1)
            out += data[i:j]
            i = j
    return bytes(out)


# --------------------------------------------------------------------------
# IFD parsing
# --------------------------------------------------------------------------


def _read_ifd(data: bytes, endian: str):
    if len(data) < 8:
        raise ValueError("TIFF: too short")
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("TIFF: IFD offset out of range")
    (count,) = struct.unpack_from(endian + "H", data, ifd_off)
    tags = {}
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(data):
            raise ValueError("TIFF: truncated IFD")
        tag, typ, cnt = struct.unpack_from(endian + "HHI", data, off)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        if size <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, off + 8)
            if voff + size > len(data):
                raise ValueError("TIFF: tag value out of range")
        if typ == _T_SHORT:
            vals = list(struct.unpack_from(endian + "%dH" % cnt, data, voff))
        elif typ == _T_LONG:
            vals = list(struct.unpack_from(endian + "%dI" % cnt, data, voff))
        elif typ == _T_BYTE or typ == 7:
            vals = list(data[voff : voff + cnt])
        elif typ == _T_RATIONAL:
            vals = list(struct.unpack_from(endian + "%dI" % (2 * cnt), data, voff))
        else:
            vals = list(data[voff : voff + size])
        tags[tag] = vals
    return tags


def _tag1(tags, tag, default=None):
    v = tags.get(tag)
    if v is None:
        if default is None:
            raise ValueError(f"TIFF: missing required tag {tag}")
        return default
    return int(v[0])


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------


def _decompress_segment(
    data, compression, seg_w, seg_h, spp, bps, fill_order, t4_options, jpeg_tables
):
    """One strip/tile → raw sample bytes (row-major, chunky or single
    plane) of exactly the segment geometry."""
    if fill_order == 2:
        data = _REV[np.frombuffer(data, np.uint8)].tobytes()
    rowbytes = (seg_w * spp * bps + 7) // 8
    expected = rowbytes * seg_h
    if compression == 1:
        if len(data) < expected:
            raise ValueError("TIFF: uncompressed strip too short")
        return data[:expected]
    if compression == 32773:
        return packbits_decode(data, expected)
    if compression == 5:
        out = tiff_lzw_decode(data)
        if len(out) < expected:
            raise ValueError("TIFF: LZW strip too short")
        return out[:expected]
    if compression in (8, 32946):
        try:
            out = zlib.decompress(data)
        except zlib.error as e:
            raise ValueError(f"TIFF: bad deflate strip: {e}") from None
        if len(out) < expected:
            raise ValueError("TIFF: deflate strip too short")
        return out[:expected]
    if compression in (2, 3, 4):
        from crawler_spark.functions.ccitt import (
            decode_g3_mixed,
            decode_g4,
            decode_mh,
        )

        if bps != 1 or spp != 1:
            raise ValueError("TIFF: CCITT requires 1-bit single-sample data")
        if compression == 4:
            img = decode_g4(data, seg_w, seg_h)  # 0=black 255=white
        elif compression == 2:
            img = decode_mh(data, seg_w, seg_h, byte_align=True)
        else:
            if not (t4_options & 1):
                raise UnsupportedTiffError("TIFF: G3 1-D with EOLs not supported")
            img = decode_g3_mixed(data, seg_w, seg_h)
        # CCITT: white=255 → bit 0 (WhiteIsZero photometric default)
        bits = (img == 0).astype(np.uint8)  # black → 1
        return np.packbits(bits, axis=1).tobytes()
    if compression == 7:
        from crawler_spark.functions.jpeg import decode_jpeg

        stream = data
        if jpeg_tables:
            # JPEGTables is a headless table stream SOI..EOI; splice
            # its segments after the strip's SOI
            tbl = jpeg_tables
            if tbl[:2] == b"\xff\xd8":
                tbl = tbl[2:]
            if tbl[-2:] == b"\xff\xd9":
                tbl = tbl[:-2]
            if stream[:2] != b"\xff\xd8":
                raise ValueError("TIFF: JPEG strip missing SOI")
            stream = b"\xff\xd8" + tbl + stream[2:]
        px = decode_jpeg(stream)
        if px.ndim == 2:
            px = np.repeat(px[:, :, None], spp if spp in (1, 3) else 1, axis=2)
        if px.shape[0] < seg_h or px.shape[1] < seg_w:
            raise ValueError("TIFF: JPEG strip smaller than declared")
        px = px[:seg_h, :seg_w]
        if spp == 1 and px.shape[2] == 3:
            px = px[:, :, :1]
        return px.astype(np.uint8).tobytes()
    if compression == 6:
        raise UnsupportedTiffError("TIFF: old-style JPEG (compression 6)")
    raise UnsupportedTiffError(f"TIFF: compression {compression} not supported")


def _undo_predictor(block, seg_h, seg_w, spp, bps):
    """Predictor 2: horizontal differencing per sample channel."""
    if bps == 8:
        a = np.frombuffer(block, np.uint8).reshape(seg_h, seg_w, spp).astype(np.uint32)
        a = np.cumsum(a, axis=1) & 0xFF
        return a.astype(np.uint8).tobytes()
    if bps == 16:
        a = np.frombuffer(block, np.uint8).reshape(seg_h, seg_w, spp, 2)
        # 16-bit differencing operates on the 16-bit values in file order
        raise UnsupportedTiffError("TIFF: predictor on 16-bit samples")
    raise UnsupportedTiffError("TIFF: predictor on sub-byte samples")


def _samples_from_bytes(block, seg_h, seg_w, spp, bps):
    """Raw bytes → (seg_h, seg_w, spp) uint8 samples (16-bit: high
    byte; sub-byte: MSB-first unpack, unscaled)."""
    rowbytes = (seg_w * spp * bps + 7) // 8
    rows = np.frombuffer(block, np.uint8).reshape(seg_h, rowbytes)
    if bps == 8:
        return rows[:, : seg_w * spp].reshape(seg_h, seg_w, spp)
    if bps == 16:
        pairs = rows.reshape(seg_h, -1, 2)[:, : seg_w * spp]
        return pairs[:, :, 0].reshape(seg_h, seg_w, spp)  # big-endian high byte
    bits = np.unpackbits(rows, axis=1)
    per = 8 // bps
    vals = np.zeros((seg_h, rowbytes * per), np.uint8)
    for k in range(bps):
        vals = (vals << 1) | bits[:, k::bps][:, : vals.shape[1]]
    return vals[:, : seg_w * spp].reshape(seg_h, seg_w, spp)


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode the first IFD to (h, w, 3) uint8 RGB."""
    data = bytes(data)
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack_from(endian + "H", data, 2)
    if magic != 42:
        raise ValueError("TIFF: bad magic")
    tags = _read_ifd(data, endian)
    w = _tag1(tags, 256)
    h = _tag1(tags, 257)
    if not (1 <= w <= 1 << 15 and 1 <= h <= 1 << 15) or w * h > 1 << 26:
        raise ValueError("TIFF: image too large")
    spp = _tag1(tags, 277, 1)
    bps_list = tags.get(258, [1])
    bps = int(bps_list[0])
    if any(int(b) != bps for b in bps_list):
        raise UnsupportedTiffError("TIFF: heterogeneous BitsPerSample")
    if bps not in (1, 2, 4, 8, 16):
        raise UnsupportedTiffError(f"TIFF: {bps}-bit samples")
    compression = _tag1(tags, 259, 1)
    photometric = _tag1(tags, 262, 1)
    planar = _tag1(tags, 284, 1)
    predictor = _tag1(tags, 317, 1)
    fill_order = _tag1(tags, 266, 1)
    t4_options = _tag1(tags, 292, 0) if compression == 3 else 0
    jpeg_tables = bytes(tags[347]) if 347 in tags else b""
    extra = len(tags.get(338, []))
    color_spp = spp - extra  # color channels after dropping alpha etc.
    if photometric in (2, 6) and color_spp not in (3,):
        raise UnsupportedTiffError("TIFF: RGB needs 3 color samples")
    if photometric == 5:
        raise UnsupportedTiffError("TIFF: Separated/CMYK")
    if planar not in (1, 2):
        raise ValueError("TIFF: bad PlanarConfig")
    if planar == 2 and compression == 7:
        raise UnsupportedTiffError("TIFF: planar JPEG")

    tiled = 322 in tags or 323 in tags
    out = np.zeros((h, w, spp), np.uint8)
    if tiled:
        tw = _tag1(tags, 322)
        th = _tag1(tags, 323)
        offs = tags.get(324)
        cnts = tags.get(325)
        if not tw or not th or offs is None or cnts is None:
            raise ValueError("TIFF: incomplete tile tags")
        if tw % 16 or th % 16:
            raise ValueError("TIFF: tile dims must be multiples of 16")
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        n_tiles = tiles_x * tiles_y * (spp if planar == 2 else 1)
        if len(offs) < n_tiles or len(cnts) < n_tiles:
            raise ValueError("TIFF: missing tiles")
        planes = spp if planar == 2 else 1
        tspp = 1 if planar == 2 else spp
        for p in range(planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    ti = p * tiles_x * tiles_y + ty * tiles_x + tx
                    seg = data[offs[ti] : offs[ti] + cnts[ti]]
                    block = _decompress_segment(
                        seg, compression, tw, th, tspp, bps,
                        fill_order, t4_options, jpeg_tables,
                    )
                    if predictor == 2:
                        block = _undo_predictor(block, th, tw, tspp, bps)
                    sm = _samples_from_bytes(block, th, tw, tspp, bps)
                    ys, xs = ty * th, tx * tw
                    ye, xe = min(ys + th, h), min(xs + tw, w)
                    if planar == 2:
                        out[ys:ye, xs:xe, p] = sm[: ye - ys, : xe - xs, 0]
                    else:
                        out[ys:ye, xs:xe] = sm[: ye - ys, : xe - xs]
    else:
        offs = tags.get(273)
        cnts = tags.get(279)
        if offs is None:
            raise ValueError("TIFF: missing StripOffsets")
        rps = _tag1(tags, 278, h)
        rps = min(rps, h)
        strips_per_plane = (h + rps - 1) // rps
        planes = spp if planar == 2 else 1
        sspp = 1 if planar == 2 else spp
        n_strips = strips_per_plane * planes
        if len(offs) < n_strips:
            raise ValueError("TIFF: missing strips")
        if cnts is None:
            cnts = [len(data) - o for o in offs]
        for p in range(planes):
            for si in range(strips_per_plane):
                idx = p * strips_per_plane + si
                ys = si * rps
                seg_h = min(rps, h - ys)
                seg = data[offs[idx] : offs[idx] + cnts[idx]]
                block = _decompress_segment(
                    seg, compression, w, seg_h, sspp, bps,
                    fill_order, t4_options, jpeg_tables,
                )
                if predictor == 2:
                    block = _undo_predictor(block, seg_h, w, sspp, bps)
                sm = _samples_from_bytes(block, seg_h, w, sspp, bps)
                if planar == 2:
                    out[ys : ys + seg_h, :, p] = sm[:, :, 0]
                else:
                    out[ys : ys + seg_h] = sm

    # photometric interpretation → RGB
    if photometric == 3:
        cmap = tags.get(320)
        if cmap is None or len(cmap) < 3 * (1 << bps):
            raise ValueError("TIFF: palette image without full ColorMap")
        n = 1 << bps
        cm = np.array(cmap[: 3 * n], np.uint32).reshape(3, n).T >> 8  # high byte
        idx = out[:, :, 0]
        return cm[idx].astype(np.uint8)
    if photometric in (0, 1):
        g = out[:, :, 0]
        maxv = (1 << bps) - 1 if bps < 8 else 255
        if bps < 8:
            g = (g.astype(np.uint16) * 255 // maxv).astype(np.uint8)
        if photometric == 0:  # WhiteIsZero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    return np.ascontiguousarray(out[:, :, :3])


# --------------------------------------------------------------------------
# Encoder twin
# --------------------------------------------------------------------------


def encode_tiff_ex(
    arr: np.ndarray,
    *,
    compression: int = 1,
    photometric: int | None = None,
    bps: int = 8,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    tile: tuple[int, int] | None = None,
    fill_order: int = 1,
    planar: int = 1,
    big_endian: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB in the requested TIFF shape. Gray /
    palette / bilevel photometrics require expressible input (R==G==B,
    ≤2^bps colors, binary)."""
    arr = np.asarray(arr, np.uint8)
    h, w, _ = arr.shape
    endian = ">" if big_endian else "<"

    cmap_vals = None
    if photometric is None:
        photometric = 2
    if compression in (2, 3, 4):
        photometric = 0
        bps = 1
    if photometric in (0, 1) and compression not in (2, 3, 4):
        if not (arr[:, :, 0] == arr[:, :, 1]).all() or not (
            arr[:, :, 1] == arr[:, :, 2]
        ).all():
            raise ValueError("TIFF: gray encode needs gray input")
    if photometric == 3:
        flat = arr.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if pal.shape[0] > (1 << bps):
            raise ValueError("TIFF: too many colors for palette depth")
        n = 1 << bps
        cm = np.zeros((3, n), np.uint16)
        cm[:, : pal.shape[0]] = pal.T.astype(np.uint16) * 257
        cmap_vals = cm.reshape(-1)
        samples = inv.reshape(h, w, 1).astype(np.uint8)
        spp = 1
    elif photometric in (0, 1):
        g = arr[:, :, 0]
        if compression in (2, 3, 4):
            samples = (g < 128).astype(np.uint8)[:, :, None]  # 1 = black ink
        elif bps < 8:
            maxv = (1 << bps) - 1
            lv = (g.astype(np.uint32) * maxv + 127) // 255
            if not ((lv * 255 // maxv).astype(np.uint8) == g).all():
                raise ValueError("TIFF: gray levels not representable")
            samples = lv.astype(np.uint8)[:, :, None]
            if photometric == 0:
                samples = maxv - samples
        else:
            samples = (255 - g if photometric == 0 else g)[:, :, None]
        spp = 1
    else:
        samples = arr
        spp = 3

    def pack_bytes(sub):  # (sh, sw, spp_here) → raw row-major bytes
        sh, sw = sub.shape[0], sub.shape[1]
        if bps == 8:
            return sub.tobytes()
        per = 8 // bps
        padded_w = (sw + per - 1) // per * per
        vals = np.zeros((sh, padded_w), np.uint8)
        vals[:, :sw] = sub[:, :, 0]
        bits = np.zeros((sh, padded_w * bps), np.uint8)
        for k in range(bps):
            bits[:, k::bps] = (vals >> (bps - 1 - k)) & 1
        return np.packbits(bits, axis=1).tobytes()

    def compress(seg, sh, sw, spp_here):
        if compression in (2, 3, 4):
            from crawler_spark.functions.ccitt import (
                encode_g3_mixed,
                encode_g4,
                encode_mh,
            )

            img = seg[:, :, 0].astype(bool)  # True = black
            if compression == 4:
                data = encode_g4(img)
            elif compression == 2:
                data = encode_mh(img, byte_align=True)
            else:
                data = encode_g3_mixed(img)
        elif compression == 7:
            from crawler_spark.functions.jpeg import encode_jpeg

            px = seg if spp_here == 3 else np.repeat(seg, 3, axis=2)
            data = encode_jpeg(px.astype(np.uint8))
        else:
            body = pack_bytes(seg)
            if predictor == 2 and compression in (5, 8, 32946) and bps == 8:
                a = np.frombuffer(body, np.uint8).reshape(sh, sw, spp_here)
                d = a.astype(np.int32)
                d[:, 1:] = (d[:, 1:] - d[:, :-1]) & 0xFF
                body = d.astype(np.uint8).tobytes()
            if compression == 1:
                data = body
            elif compression == 5:
                data = tiff_lzw_encode(body)
            elif compression in (8, 32946):
                data = zlib.compress(body, 6)
            elif compression == 32773:
                # PackBits operates per row
                rowbytes = len(body) // sh
                data = b"".join(
                    packbits_encode(body[y * rowbytes : (y + 1) * rowbytes])
                    for y in range(sh)
                )
            else:
                raise UnsupportedTiffError(f"TIFF: compression {compression}")
        if fill_order == 2:
            data = _REV[np.frombuffer(data, np.uint8)].tobytes()
        return data

    segments = []  # (bytes,)
    extra_tags = {}
    planes = spp if planar == 2 else 1
    eff_spp = 1 if planar == 2 else spp
    if tile is not None:
        tw, th = tile
        if tw % 16 or th % 16:
            raise ValueError("TIFF: tile dims must be multiples of 16")
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        for p in range(planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    pad = np.zeros((th, tw, eff_spp), np.uint8)
                    ys, xs = ty * th, tx * tw
                    chunk = (
                        samples[ys : ys + th, xs : xs + tw, p : p + 1]
                        if planar == 2
                        else samples[ys : ys + th, xs : xs + tw]
                    )
                    pad[: chunk.shape[0], : chunk.shape[1]] = chunk
                    segments.append(compress(pad, th, tw, eff_spp))
        extra_tags[322] = (_T_LONG, [tw])
        extra_tags[323] = (_T_LONG, [th])
        seg_off_tag, seg_cnt_tag = 324, 325
    else:
        rps = rows_per_strip or h
        strips = (h + rps - 1) // rps
        for p in range(planes):
            for si in range(strips):
                ys = si * rps
                seg_h = min(rps, h - ys)
                chunk = (
                    samples[ys : ys + seg_h, :, p : p + 1]
                    if planar == 2
                    else samples[ys : ys + seg_h]
                )
                segments.append(compress(chunk, seg_h, w, eff_spp))
        extra_tags[278] = (_T_LONG, [rps])
        seg_off_tag, seg_cnt_tag = 273, 279

    tags = {
        256: (_T_LONG, [w]),
        257: (_T_LONG, [h]),
        258: (_T_SHORT, [1 if compression in (2, 3, 4) else bps] * spp),
        259: (_T_SHORT, [compression]),
        262: (_T_SHORT, [photometric]),
        277: (_T_SHORT, [spp]),
        284: (_T_SHORT, [planar]),
        266: (_T_SHORT, [fill_order]),
    }
    if predictor == 2 and compression in (5, 8, 32946):
        tags[317] = (_T_SHORT, [2])
    if compression == 3:
        tags[292] = (_T_LONG, [1])  # 2-D coding
    if cmap_vals is not None:
        tags[320] = (_T_SHORT, list(int(v) for v in cmap_vals))
    tags.update(extra_tags)

    # layout: header(8) + IFD + overflow values + segment data
    n_entries = len(tags) + 2  # + offsets/counts tags
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    # reserve overflow area
    overflow = bytearray()
    data_start_guess = ifd_off + ifd_size

    def enc_vals(typ, vals):
        fmt = {_T_SHORT: "H", _T_LONG: "I"}[typ]
        return struct.pack(endian + "%d%s" % (len(vals), fmt), *vals)

    # first pass to size overflow for fixed tags
    entries = []
    all_tags = dict(tags)
    all_tags[seg_off_tag] = (_T_LONG, [0] * len(segments))  # patched later
    all_tags[seg_cnt_tag] = (_T_LONG, [len(s) for s in segments])
    overflow_cursor = data_start_guess
    blobs = []
    for tag in sorted(all_tags):
        typ, vals = all_tags[tag]
        raw = enc_vals(typ, vals)
        if len(raw) <= 4:
            entries.append((tag, typ, len(vals), raw.ljust(4, b"\x00"), None))
        else:
            entries.append((tag, typ, len(vals), None, len(blobs)))
            blobs.append(raw)
    blob_offsets = []
    cur = data_start_guess
    for bl in blobs:
        blob_offsets.append(cur)
        cur += len(bl)
    seg_data_start = cur
    seg_offsets = []
    for s in segments:
        seg_offsets.append(cur)
        cur += len(s)
    # patch the strip/tile offset values now that layout is known
    raw_offs = enc_vals(_T_LONG, seg_offsets)
    for i, (tag, typ, cnt, inline, blob_i) in enumerate(entries):
        if tag == seg_off_tag:
            if len(raw_offs) <= 4:
                entries[i] = (tag, typ, cnt, raw_offs.ljust(4, b"\x00"), None)
            else:
                blobs[blob_i] = raw_offs
    out = bytearray()
    out += (b"II" if endian == "<" else b"MM") + struct.pack(endian + "HI", 42, 8)
    out += struct.pack(endian + "H", n_entries)
    for tag, typ, cnt, inline, blob_i in entries:
        out += struct.pack(endian + "HHI", tag, typ, cnt)
        if inline is not None:
            out += inline
        else:
            out += struct.pack(endian + "I", blob_offsets[blob_i])
    out += struct.pack(endian + "I", 0)  # no next IFD
    assert len(out) == data_start_guess
    for bl in blobs:
        out += bl
    for s in segments:
        out += s
    return bytes(out)
