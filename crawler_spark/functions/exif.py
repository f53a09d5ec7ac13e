"""EXIF metadata over JPEG APP1 segments (TIFF 6.0 IFD layout).

The image-payload twin of the text-side PII scrub (q51): real-web
JPEGs carry camera metadata in an APP1 "Exif\\0\\0" segment — a little
TIFF file whose IFDs hold orientation, timestamps, camera identity and
(the PII that matters) a GPS sub-IFD with the capture coordinates. A
training-data image pipeline needs three operations over that block,
all implemented here from the public TIFF 6.0 + EXIF 2.3 tag registry
(the same from-spec move as ``functions/jpeg.py``'s T.81 codec):

  * ``exif_fields(jpeg)``   — parse orientation / DateTimeOriginal /
    Make / Model / GPS lat+lon out of the APP1 block (graceful None
    when absent; hard ``ValueError`` only for structurally corrupt
    IFDs, which the pipeline quarantines);
  * ``strip_gps(jpeg)``     — privacy scrub by *reconstruction*: the
    APP1 segment is rebuilt from the parsed allowlist of safe tags
    (orientation, timestamps, camera identity, pixel dims) and
    everything else — GPS IFD, maker notes, thumbnail IFD1, unknown
    tags — is dropped. Safer than deleting the GPS pointer in place:
    vendor maker notes can embed coordinates too, so the scrub keeps
    only what it affirmatively understands. Entropy-coded image data
    is untouched (pure segment surgery ⇒ decoded pixels byte-equal);
  * ``insert_exif(jpeg, …)`` — the encoder twin: builds a fresh APP1
    from field values so tests can round-trip write→parse→scrub with
    planted ground truth, offline-verifiable end to end.

``auto_orient`` applies the 8 EXIF orientations to decoded pixel
arrays (numpy views — no resample, exactly invertible), so pHash and
features downstream see display-space pixels.

Reference parity note: the reference crawler stores fetched images
byte-opaque and never strips metadata (src/lib/md/mdUtils.ts:23-44
drops the *markdown* image reference, not the bytes) — this module is
graft surface for the image-payload axis, not a reference port.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF value types (TIFF 6.0 §2)
_T_BYTE, _T_ASCII, _T_SHORT, _T_LONG, _T_RATIONAL = 1, 2, 3, 4, 5
_T_UNDEFINED, _T_SLONG, _T_SRATIONAL = 7, 9, 10
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

# IFD0 tags (TIFF 6.0 baseline + EXIF 2.3 §4.6.4)
TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
# Exif sub-IFD tags (EXIF 2.3 §4.6.5)
TAG_DATETIME_ORIGINAL = 0x9003
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
# GPS sub-IFD tags (EXIF 2.3 §4.6.6)
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_EXIF_HEADER = b"Exif\x00\x00"


# --------------------------------------------------------------------------
# JPEG segment surgery
# --------------------------------------------------------------------------


def jpeg_segments(data: bytes):
    """Yield (marker, seg_start, seg_end) for each marker segment from
    SOI up to and including SOS; seg_end of SOS is where entropy data
    begins. Offsets cover the full segment (FF byte included)."""
    if len(data) < 2 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI with no SOS — segment-only file
            yield (marker, i, i + 2)
            return
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        end = i + 2 + seglen
        if end > len(data):
            raise ValueError("JPEG: truncated segment")
        yield (marker, i, end)
        if marker == 0xDA:  # SOS: entropy data follows, stop walking
            return
        i = end


def _find_app1_exif(data: bytes):
    """→ (start, end, tiff_payload) of the first APP1 Exif segment, or
    None. APP1 segments that are not Exif (e.g. XMP) are skipped."""
    for marker, s, e in jpeg_segments(data):
        if marker == 0xE1 and data[s + 4 : s + 10] == _EXIF_HEADER:
            return s, e, bytes(data[s + 10 : e])
    return None


# --------------------------------------------------------------------------
# IFD parse (arbitrary offset — EXIF needs sub-IFD chasing)
# --------------------------------------------------------------------------


def _read_ifd_at(tiff: bytes, endian: str, off: int) -> dict:
    """IFD at ``off`` → {tag: (type, [values])}. ASCII → bytes (NUL
    kept), RATIONAL/SRATIONAL → flat [num, den, …] ints."""
    if off + 2 > len(tiff):
        raise ValueError("EXIF: IFD offset out of range")
    (count,) = struct.unpack_from(endian + "H", tiff, off)
    if off + 2 + 12 * count > len(tiff):
        raise ValueError("EXIF: truncated IFD")
    tags = {}
    for i in range(count):
        eoff = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(endian + "HHI", tiff, eoff)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        voff = eoff + 8
        if size > 4:
            (voff,) = struct.unpack_from(endian + "I", tiff, eoff + 8)
            if voff + size > len(tiff):
                raise ValueError("EXIF: tag value out of range")
        if typ == _T_SHORT:
            vals = list(struct.unpack_from(endian + "%dH" % cnt, tiff, voff))
        elif typ in (_T_LONG, _T_SLONG):
            c = "i" if typ == _T_SLONG else "I"
            vals = list(struct.unpack_from(endian + "%d%s" % (cnt, c), tiff, voff))
        elif typ in (_T_RATIONAL, _T_SRATIONAL):
            c = "i" if typ == _T_SRATIONAL else "I"
            vals = list(struct.unpack_from(endian + "%d%s" % (2 * cnt, c), tiff, voff))
        elif typ in (_T_ASCII, _T_BYTE, _T_UNDEFINED):
            vals = bytes(tiff[voff : voff + cnt])
        else:
            vals = bytes(tiff[voff : voff + size])
        tags[tag] = (typ, vals)
    return tags


def _ascii(tagval) -> str | None:
    if tagval is None:
        return None
    typ, vals = tagval
    if not isinstance(vals, (bytes, bytearray)):
        return None
    return vals.split(b"\x00", 1)[0].decode("ascii", "replace")


def _short1(tagval, default=None):
    if tagval is None:
        return default
    _typ, vals = tagval
    return int(vals[0]) if vals else default


def _dms_to_deg(vals, ref: str | None) -> float | None:
    """GPS RATIONAL triplet [dn, dd, mn, md, sn, sd] → signed degrees."""
    if vals is None or len(vals) < 6:
        return None
    try:
        d = vals[0] / vals[1]
        m = vals[2] / vals[3]
        s = vals[4] / vals[5]
    except ZeroDivisionError:
        return None
    deg = d + m / 60.0 + s / 3600.0
    if ref in ("S", "W"):
        deg = -deg
    return deg


def parse_tiff_exif(tiff: bytes) -> dict:
    """Parse the TIFF block of an APP1 Exif payload → field dict.
    Raises ValueError for structural corruption (quarantine path)."""
    if len(tiff) < 8:
        raise ValueError("EXIF: TIFF block too short")
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("EXIF: bad byte-order mark")
    (magic,) = struct.unpack_from(endian + "H", tiff, 2)
    if magic != 42:
        raise ValueError("EXIF: bad TIFF magic")
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _read_ifd_at(tiff, endian, ifd0_off)

    out = {
        "orientation": _short1(ifd0.get(TAG_ORIENTATION), 1),
        "make": _ascii(ifd0.get(TAG_MAKE)),
        "model": _ascii(ifd0.get(TAG_MODEL)),
        "datetime": _ascii(ifd0.get(TAG_DATETIME)),
        "datetime_original": None,
        "pixel_x": None,
        "pixel_y": None,
        "gps_lat": None,
        "gps_lon": None,
        "has_gps": False,
    }
    exif_off = _short1(ifd0.get(TAG_EXIF_IFD))
    if exif_off is not None:
        sub = _read_ifd_at(tiff, endian, exif_off)
        out["datetime_original"] = _ascii(sub.get(TAG_DATETIME_ORIGINAL))
        out["pixel_x"] = _short1(sub.get(TAG_PIXEL_X))
        out["pixel_y"] = _short1(sub.get(TAG_PIXEL_Y))
    gps_off = _short1(ifd0.get(TAG_GPS_IFD))
    if gps_off is not None:
        gps = _read_ifd_at(tiff, endian, gps_off)
        out["has_gps"] = True
        lat = gps.get(TAG_GPS_LAT)
        lon = gps.get(TAG_GPS_LON)
        out["gps_lat"] = _dms_to_deg(
            lat[1] if lat else None, _ascii(gps.get(TAG_GPS_LAT_REF))
        )
        out["gps_lon"] = _dms_to_deg(
            lon[1] if lon else None, _ascii(gps.get(TAG_GPS_LON_REF))
        )
    return out


def exif_fields(jpeg: bytes) -> dict | None:
    """Parse the first APP1 Exif segment of ``jpeg`` → field dict, or
    None when the file carries no Exif block."""
    found = _find_app1_exif(bytes(jpeg))
    if found is None:
        return None
    return parse_tiff_exif(found[2])


# --------------------------------------------------------------------------
# Build (encoder twin) — always little-endian, offsets laid out flat
# --------------------------------------------------------------------------


def _deg_to_dms(deg: float):
    """Signed degrees → (ref_positive?, [dn,dd,mn,md,sn,sd]); seconds
    carried at 1/10000 precision (≈3 mm — exact enough that a
    round-trip stays within 1e-7 degrees)."""
    neg = deg < 0
    deg = abs(deg)
    d = int(deg)
    m = int((deg - d) * 60)
    s = round(((deg - d) * 60 - m) * 60 * 10000)
    return (not neg), [d, 1, m, 1, s, 10000]


class _IfdBuilder:
    """Serializes one IFD: fixed 12-byte entries + an overflow area.
    Offsets are relative to the TIFF block start, supplied at build."""

    def __init__(self):
        self.entries = []  # (tag, typ, cnt, payload_bytes_or_inline)

    def add(self, tag: int, typ: int, vals) -> None:
        if typ == _T_ASCII:
            data = vals.encode("ascii", "replace") + b"\x00"
            cnt = len(data)
        elif typ == _T_SHORT:
            data = struct.pack("<%dH" % len(vals), *vals)
            cnt = len(vals)
        elif typ == _T_LONG:
            data = struct.pack("<%dI" % len(vals), *vals)
            cnt = len(vals)
        elif typ == _T_RATIONAL:
            data = struct.pack("<%dI" % len(vals), *vals)
            cnt = len(vals) // 2
        else:
            raise ValueError(f"EXIF builder: unsupported type {typ}")
        self.entries.append((tag, typ, cnt, data))

    def size(self) -> int:
        over = sum(len(d) for _, _, _, d in self.entries if len(d) > 4)
        return 2 + 12 * len(self.entries) + 4 + over

    def build(self, at: int) -> bytes:
        self.entries.sort(key=lambda e: e[0])  # TIFF mandates tag order
        head = struct.pack("<H", len(self.entries))
        body = b""
        over = b""
        over_off = at + 2 + 12 * len(self.entries) + 4
        for tag, typ, cnt, data in self.entries:
            body += struct.pack("<HHI", tag, typ, cnt)
            if len(data) <= 4:
                body += data.ljust(4, b"\x00")
            else:
                body += struct.pack("<I", over_off + len(over))
                over += data
        return head + body + struct.pack("<I", 0) + over


def build_exif_app1(
    orientation: int = 1,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    datetime_original: str | None = None,
    pixel_x: int | None = None,
    pixel_y: int | None = None,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """→ full APP1 segment bytes (FF E1 len 'Exif\\0\\0' + TIFF)."""
    ifd0 = _IfdBuilder()
    ifd0.add(TAG_ORIENTATION, _T_SHORT, [orientation])
    if make:
        ifd0.add(TAG_MAKE, _T_ASCII, make)
    if model:
        ifd0.add(TAG_MODEL, _T_ASCII, model)
    if datetime:
        ifd0.add(TAG_DATETIME, _T_ASCII, datetime)

    exif = _IfdBuilder()
    if datetime_original:
        exif.add(TAG_DATETIME_ORIGINAL, _T_ASCII, datetime_original)
    if pixel_x is not None:
        exif.add(TAG_PIXEL_X, _T_LONG, [pixel_x])
    if pixel_y is not None:
        exif.add(TAG_PIXEL_Y, _T_LONG, [pixel_y])

    gpsb = _IfdBuilder()
    if gps is not None:
        lat_pos, lat_dms = _deg_to_dms(gps[0])
        lon_pos, lon_dms = _deg_to_dms(gps[1])
        gpsb.add(TAG_GPS_LAT_REF, _T_ASCII, "N" if lat_pos else "S")
        gpsb.add(TAG_GPS_LAT, _T_RATIONAL, lat_dms)
        gpsb.add(TAG_GPS_LON_REF, _T_ASCII, "E" if lon_pos else "W")
        gpsb.add(TAG_GPS_LON, _T_RATIONAL, lon_dms)

    # layout: header(8) | IFD0 | ExifIFD? | GPSIFD?
    have_exif = bool(exif.entries)
    have_gps = bool(gpsb.entries)
    # pointer tags change IFD0's size — add them before sizing
    if have_exif:
        ifd0.add(TAG_EXIF_IFD, _T_LONG, [0])
    if have_gps:
        ifd0.add(TAG_GPS_IFD, _T_LONG, [0])
    ifd0_at = 8
    exif_at = ifd0_at + ifd0.size()
    gps_at = exif_at + (exif.size() if have_exif else 0)
    # patch pointer values now that offsets are known
    for i, (tag, typ, cnt, _d) in enumerate(ifd0.entries):
        if tag == TAG_EXIF_IFD:
            ifd0.entries[i] = (tag, typ, cnt, struct.pack("<I", exif_at))
        if tag == TAG_GPS_IFD:
            ifd0.entries[i] = (tag, typ, cnt, struct.pack("<I", gps_at))

    tiff = b"II*\x00" + struct.pack("<I", ifd0_at) + ifd0.build(ifd0_at)
    if have_exif:
        tiff += exif.build(exif_at)
    if have_gps:
        tiff += gpsb.build(gps_at)
    payload = _EXIF_HEADER + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_exif(jpeg: bytes, **fields) -> bytes:
    """Encoder twin: (re)plant an APP1 Exif segment right after SOI,
    removing any existing Exif APP1 first. Image data untouched."""
    jpeg = strip_exif(bytes(jpeg))
    return jpeg[:2] + build_exif_app1(**fields) + jpeg[2:]


def strip_exif(jpeg: bytes) -> bytes:
    """Remove every APP1 Exif segment (pure byte surgery)."""
    jpeg = bytes(jpeg)
    spans = []
    for marker, s, e in jpeg_segments(jpeg):
        if marker == 0xE1 and jpeg[s + 4 : s + 10] == _EXIF_HEADER:
            spans.append((s, e))
    for s, e in reversed(spans):
        jpeg = jpeg[:s] + jpeg[e:]
    return jpeg


def strip_gps(jpeg: bytes) -> tuple[bytes, bool]:
    """Privacy scrub: → (scrubbed_jpeg, had_gps).

    Rebuilds the APP1 from the parsed *allowlist* (orientation,
    timestamps, Make/Model, pixel dims); GPS IFD, maker notes,
    thumbnails and unknown tags are all dropped — vendor maker notes
    can hide coordinates, so only affirmatively-understood tags
    survive. No Exif block → unchanged passthrough."""
    jpeg = bytes(jpeg)
    fields = exif_fields(jpeg)
    if fields is None:
        return jpeg, False
    rebuilt = insert_exif(
        jpeg,
        orientation=fields["orientation"] or 1,
        make=fields["make"],
        model=fields["model"],
        datetime=fields["datetime"],
        datetime_original=fields["datetime_original"],
        pixel_x=fields["pixel_x"],
        pixel_y=fields["pixel_y"],
    )
    return rebuilt, fields["has_gps"]


# --------------------------------------------------------------------------
# Orientation (EXIF 2.3 §4.6.4 tag 274 — display transform per value)
# --------------------------------------------------------------------------


def auto_orient(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Apply EXIF orientation 1–8 to (h, w, c) pixels → display-space
    array. Pure numpy views materialized contiguous; exactly
    invertible (no resample). Unknown values → identity (robustness:
    real-web files carry 0 or garbage here)."""
    o = int(orientation)
    if o == 2:
        out = arr[:, ::-1]
    elif o == 3:
        out = arr[::-1, ::-1]
    elif o == 4:
        out = arr[::-1, :]
    elif o == 5:  # mirror + rotate: transpose
        out = np.swapaxes(arr, 0, 1)
    elif o == 6:  # rotate 90 CW for display
        out = np.rot90(arr, k=-1)
    elif o == 7:  # anti-transpose
        out = np.swapaxes(arr[::-1, ::-1], 0, 1)
    elif o == 8:  # rotate 90 CCW for display
        out = np.rot90(arr, k=1)
    else:
        out = arr
    return np.ascontiguousarray(out)


#: inverse transform per orientation — encoder-twin tests plant pixels
#: pre-transformed so auto_orient restores the original exactly.
def inverse_orient(arr: np.ndarray, orientation: int) -> np.ndarray:
    """The camera-space pixels that display as ``arr`` under
    ``orientation`` (auto_orient(inverse_orient(a, o), o) == a)."""
    o = int(orientation)
    if o in (2, 3, 4, 5, 7):  # involutions
        return auto_orient(arr, o)
    if o == 6:
        return np.ascontiguousarray(np.rot90(arr, k=1))
    if o == 8:
        return np.ascontiguousarray(np.rot90(arr, k=-1))
    return np.ascontiguousarray(arr)
