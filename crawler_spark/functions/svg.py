"""SVG 1.1 subset rasterizer (decode) + exact encoder twin.

The one real-web image format in the crawl envelope that is vector,
not raster: logos, icons and diagrams ship as SVG. This module
rasterizes the static-shape subset of SVG 1.1 (public W3C spec) into
(h, w, 3) uint8 RGB with deterministic center-sampling (no AA — the
same input always yields the same pixels on every machine, which is
what the per-row invariant gates need):

  * elements: ``rect`` (incl. rx/ry=0 only), ``circle``, ``ellipse``,
    ``line``, ``polyline``, ``polygon``, ``path``, ``g`` (translate /
    scale transforms), nested ``svg`` root with width/height/viewBox;
  * ``path`` data: M/m L/l H/h V/v Z/z plus C/c S/s Q/q T/t curves
    and A/a elliptical arcs (endpoint→center parameterization per
    W3C SVG 1.1 §F.6, incl. the compact no-separator flag syntax),
    flattened at a fixed 16-segment subdivision (determinism over
    adaptivity), multiple subpaths;
  * paint: ``fill`` (hex #rgb/#rrggbb, rgb(), the CSS named colors the
    crawled sites actually use, ``none``), ``fill-rule`` nonzero /
    evenodd, ``stroke``+``stroke-width`` for line/polyline (rendered
    as quads), presentation attributes and inline ``style``;
  * document: white canvas default, paint order = document order.

Scanline fill evaluates winding at pixel centers (x+0.5, y+0.5) —
half-open pixel coverage, so abutting shapes tile without gaps or
double-paint. Curves and transforms compose in float64 and quantize
once at sampling.

The encoder twin (``encode_svg``) emits one ``<rect>`` per horizontal
same-color pixel run — valid standalone SVG any conformant renderer
draws to the same image, and exactly lossless under this rasterizer
(``decode(encode(arr)) == arr``), which puts ``svg`` in the lossless
tier of the q56 per-round codec gate.

Out of scope (documented): text (font metrics are environment data,
not spec), gradients/patterns/filters, clipping, masks,
anti-aliasing, CSS stylesheets, external references. Unsupported
constructs raise ``ValueError`` → quarantine-row semantics upstream.
"""

from __future__ import annotations

import re
import struct  # noqa: F401  (kept for parity with sibling codec modules)
import xml.etree.ElementTree as ET

import numpy as np

# CSS named colors observed on the crawled sites + the CSS1 basics
_NAMED = {
    "black": (0, 0, 0), "white": (255, 255, 255), "red": (255, 0, 0),
    "green": (0, 128, 0), "blue": (0, 0, 255), "yellow": (255, 255, 0),
    "cyan": (0, 255, 255), "magenta": (255, 0, 255), "gray": (128, 128, 128),
    "grey": (128, 128, 128), "silver": (192, 192, 192), "maroon": (128, 0, 0),
    "olive": (128, 128, 0), "lime": (0, 255, 0), "aqua": (0, 255, 255),
    "teal": (0, 128, 128), "navy": (0, 0, 128), "purple": (128, 0, 128),
    "fuchsia": (255, 0, 255), "orange": (255, 165, 0), "gold": (255, 215, 0),
}

_NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?")


def _parse_color(s: str | None):
    """→ (r, g, b) or None for 'none'/missing."""
    if s is None:
        return None
    s = s.strip().lower()
    if s in ("none", "transparent", ""):
        return None
    if s.startswith("#"):
        h = s[1:]
        if len(h) == 3:
            return tuple(int(c * 2, 16) for c in h)
        if len(h) == 6:
            return tuple(int(h[i : i + 2], 16) for i in (0, 2, 4))
        raise ValueError(f"svg: bad hex color {s!r}")
    if s.startswith("rgb"):
        nums = [float(x) for x in _NUM_RE.findall(s)]
        if len(nums) < 3:
            raise ValueError(f"svg: bad rgb() color {s!r}")
        if "%" in s:
            nums = [n * 255.0 / 100.0 for n in nums[:3]]
        return tuple(int(max(0, min(255, round(n)))) for n in nums[:3])
    if s in _NAMED:
        return _NAMED[s]
    raise ValueError(f"svg: unsupported color {s!r}")


def _floats(s: str) -> list[float]:
    return [float(x) for x in _NUM_RE.findall(s or "")]


def _localname(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _style_attrs(el) -> dict:
    """Merged presentation attributes + inline style (style wins)."""
    a = dict(el.attrib)
    for decl in (a.get("style") or "").split(";"):
        if ":" in decl:
            k, v = decl.split(":", 1)
            a[k.strip()] = v.strip()
    return a


# --------------------------------------------------------------------------
# path data → subpaths (lists of float (x, y) vertices)
# --------------------------------------------------------------------------

_CMD_RE = re.compile(r"([MmLlHhVvZzCcSsQqTtAa])|(" + _NUM_RE.pattern + r")")
_CURVE_N = 16  # fixed flattening — determinism over adaptivity


def _flatten_cubic(p0, p1, p2, p3):
    t = np.linspace(0.0, 1.0, _CURVE_N + 1)[1:]
    mt = 1 - t
    x = (mt**3) * p0[0] + 3 * (mt**2) * t * p1[0] + 3 * mt * (t**2) * p2[0] + (t**3) * p3[0]
    y = (mt**3) * p0[1] + 3 * (mt**2) * t * p1[1] + 3 * mt * (t**2) * p2[1] + (t**3) * p3[1]
    return list(zip(x.tolist(), y.tolist()))


def _flatten_quad(p0, p1, p2):
    t = np.linspace(0.0, 1.0, _CURVE_N + 1)[1:]
    mt = 1 - t
    x = (mt**2) * p0[0] + 2 * mt * t * p1[0] + (t**2) * p2[0]
    y = (mt**2) * p0[1] + 2 * mt * t * p1[1] + (t**2) * p2[1]
    return list(zip(x.tolist(), y.tolist()))


def _flatten_arc(p0, rx, ry, rot_deg, large, sweep, p1):
    """A/a elliptical arc → polyline, by the spec's endpoint→center
    parameterization (W3C SVG 1.1 §F.6.5) with the §F.6.6 degeneracy
    rules: coincident endpoints draw nothing, a zero radius is a
    straight line, too-small radii scale up uniformly (§F.6.6.3)."""
    import math

    if p0 == p1:
        return []
    rx, ry = abs(rx), abs(ry)
    if rx == 0 or ry == 0:
        return [p1]
    phi = math.radians(rot_deg)
    cosp, sinp = math.cos(phi), math.sin(phi)
    dx, dy = (p0[0] - p1[0]) / 2.0, (p0[1] - p1[1]) / 2.0
    x1p = cosp * dx + sinp * dy
    y1p = -sinp * dx + cosp * dy
    lam = x1p * x1p / (rx * rx) + y1p * y1p / (ry * ry)
    if lam > 1:
        s = math.sqrt(lam)
        rx *= s
        ry *= s
    num = rx * rx * ry * ry - rx * rx * y1p * y1p - ry * ry * x1p * x1p
    den = rx * rx * y1p * y1p + ry * ry * x1p * x1p
    co = math.sqrt(max(0.0, num / den)) if den else 0.0
    if large == sweep:
        co = -co
    cxp = co * rx * y1p / ry
    cyp = -co * ry * x1p / rx
    cx = cosp * cxp - sinp * cyp + (p0[0] + p1[0]) / 2.0
    cy = sinp * cxp + cosp * cyp + (p0[1] + p1[1]) / 2.0

    def _ang(ux, uy, vx, vy):
        d = math.hypot(ux, uy) * math.hypot(vx, vy)
        c = max(-1.0, min(1.0, (ux * vx + uy * vy) / d))
        a = math.acos(c)
        return -a if ux * vy - uy * vx < 0 else a

    ux, uy = (x1p - cxp) / rx, (y1p - cyp) / ry
    th1 = _ang(1.0, 0.0, ux, uy)
    dth = _ang(ux, uy, (-x1p - cxp) / rx, (-y1p - cyp) / ry)
    if not sweep and dth > 0:
        dth -= 2 * math.pi
    elif sweep and dth < 0:
        dth += 2 * math.pi
    t = np.linspace(0.0, 1.0, _CURVE_N + 1)[1:]
    th = th1 + t * dth
    x = cx + rx * np.cos(th) * cosp - ry * np.sin(th) * sinp
    y = cy + rx * np.cos(th) * sinp + ry * np.sin(th) * cosp
    pts = list(zip(x.tolist(), y.tolist()))
    pts[-1] = p1  # pin the exact endpoint (no float drift into joins)
    return pts


_ARC_SEG_RE = re.compile(r"([Aa])([^MmLlHhVvZzCcSsQqTtAa]*)")


def _normalize_arc_args(seg: str) -> str:
    """Arc arguments re-lexed with the spec grammar: the two flags are
    SINGLE characters, so compact real-icon-set forms like
    ``a1 1 0 011 0`` (flags 0,1 fused with the following number) must
    not be read as one float. Returns the args space-separated so the
    generic tokenizer parses them positionally."""
    out: list[str] = []
    i, n, slot = 0, len(seg), 0  # slot = index within the 7-arg group
    while i < n:
        ch = seg[i]
        if ch in " ,\t\n\r":
            i += 1
            continue
        if slot in (3, 4):  # large-arc-flag, sweep-flag
            if ch not in "01":
                raise ValueError("svg: bad arc flag")
            out.append(ch)
            i += 1
        else:
            m = _NUM_RE.match(seg, i)
            if m is None or m.start() != i:
                raise ValueError("svg: malformed arc arguments")
            out.append(m.group(0))
            i = m.end()
        slot = (slot + 1) % 7
    if slot != 0:
        raise ValueError("svg: arc arguments not a multiple of 7")
    return " " + " ".join(out) + " "


def parse_path(d: str) -> list[list[tuple[float, float]]]:
    """SVG path data → list of subpaths (open subpaths are closed for
    filling, per the spec's fill semantics)."""
    if "A" in d or "a" in d:
        d = _ARC_SEG_RE.sub(
            lambda m: m.group(1) + _normalize_arc_args(m.group(2)), d
        )
    toks: list = []
    for m in _CMD_RE.finditer(d):
        toks.append(m.group(1) if m.group(1) else float(m.group(2)))
    subpaths: list[list[tuple[float, float]]] = []
    cur: list[tuple[float, float]] = []
    pos = (0.0, 0.0)
    start = (0.0, 0.0)
    prev_ctrl = None  # reflection point for S/s, T/t
    prev_cmd = ""
    i = 0

    def take(n):
        nonlocal i
        vals = toks[i : i + n]
        if len(vals) < n or any(isinstance(v, str) for v in vals):
            raise ValueError("svg: malformed path data")
        i += n
        return vals

    cmd = None
    while i < len(toks):
        if isinstance(toks[i], str):
            cmd = toks[i]
            i += 1
        elif cmd is None:
            raise ValueError("svg: path data must start with a command")
        elif cmd in "Mm":  # implicit lineto after moveto
            cmd = "L" if cmd == "M" else "l"
        c = cmd
        if c not in "MmZz" and not cur:
            # drawing command right after Z (or at path start): the
            # new subpath begins at the CURRENT point (spec: Z moves
            # the current point back to the subpath's initial point)
            cur = [pos]
        if c in "Mm":
            x, y = take(2)
            pos = (x, y) if c == "M" else (pos[0] + x, pos[1] + y)
            if cur:
                subpaths.append(cur)
            cur = [pos]
            start = pos
        elif c in "Ll":
            x, y = take(2)
            pos = (x, y) if c == "L" else (pos[0] + x, pos[1] + y)
            cur.append(pos)
        elif c in "Hh":
            (x,) = take(1)
            pos = (x, pos[1]) if c == "H" else (pos[0] + x, pos[1])
            cur.append(pos)
        elif c in "Vv":
            (y,) = take(1)
            pos = (pos[0], y) if c == "V" else (pos[0], pos[1] + y)
            cur.append(pos)
        elif c in "CcSsQqTt":
            if c in "Cc":
                x1, y1, x2, y2, x, y = take(6)
                if c == "c":
                    x1 += pos[0]; y1 += pos[1]; x2 += pos[0]; y2 += pos[1]
                    x += pos[0]; y += pos[1]
                pts = _flatten_cubic(pos, (x1, y1), (x2, y2), (x, y))
                prev_ctrl = (x2, y2)
            elif c in "Ss":
                x2, y2, x, y = take(4)
                if c == "s":
                    x2 += pos[0]; y2 += pos[1]; x += pos[0]; y += pos[1]
                r = (
                    (2 * pos[0] - prev_ctrl[0], 2 * pos[1] - prev_ctrl[1])
                    if prev_cmd in "CcSs" and prev_ctrl
                    else pos
                )
                pts = _flatten_cubic(pos, r, (x2, y2), (x, y))
                prev_ctrl = (x2, y2)
            elif c in "Qq":
                x1, y1, x, y = take(4)
                if c == "q":
                    x1 += pos[0]; y1 += pos[1]; x += pos[0]; y += pos[1]
                pts = _flatten_quad(pos, (x1, y1), (x, y))
                prev_ctrl = (x1, y1)
            else:  # Tt
                x, y = take(2)
                if c == "t":
                    x += pos[0]; y += pos[1]
                r = (
                    (2 * pos[0] - prev_ctrl[0], 2 * pos[1] - prev_ctrl[1])
                    if prev_cmd in "QqTt" and prev_ctrl
                    else pos
                )
                pts = _flatten_quad(pos, r, (x, y))
                prev_ctrl = r
            cur.extend(pts)
            pos = pts[-1]
        elif c in "Zz":
            if cur:
                cur.append(start)
                subpaths.append(cur)
                cur = []
            pos = start
        elif c in "Aa":
            arx, ary, rot, laf, swf, x, y = take(7)
            if laf not in (0.0, 1.0) or swf not in (0.0, 1.0):
                raise ValueError("svg: bad arc flag")
            if c == "a":
                x += pos[0]
                y += pos[1]
            pts = _flatten_arc(pos, arx, ary, rot, bool(laf), bool(swf), (x, y))
            if pts:
                cur.extend(pts)
                pos = pts[-1]
            prev_ctrl = None
        else:
            raise ValueError(f"svg: unsupported path command {c!r}")
        prev_cmd = c
    if cur:
        subpaths.append(cur)
    return subpaths


# --------------------------------------------------------------------------
# scanline fill (winding at pixel centers; nonzero / evenodd)
# --------------------------------------------------------------------------


def _fill_polygons(img, subpaths, color, rule="nonzero"):
    """Paint ``color`` where the combined subpaths cover pixel centers.

    Each edge-row crossing contributes a ±direction DELTA at its
    column; one row-wise cumsum then yields the winding number at
    every pixel — O(crossings + h×w) total, instead of an O(width)
    suffix write per crossing (which made glyph-dense 512² docs cost
    seconds each)."""
    h, w = img.shape[:2]
    ys = np.arange(h, dtype=np.float64) + 0.5
    wind_delta = np.zeros((h, w + 1), np.int64)
    for pts in subpaths:
        if len(pts) < 3:
            continue
        p = np.asarray(pts, np.float64)
        if not np.array_equal(p[0], p[-1]):
            p = np.vstack([p, p[:1]])  # implicit close for filling
        x0, y0 = p[:-1, 0], p[:-1, 1]
        x1, y1 = p[1:, 0], p[1:, 1]
        for e in range(len(x0)):
            ya, yb = y0[e], y1[e]
            if ya == yb:
                continue
            direction = 1 if yb > ya else -1
            lo, hi = (ya, yb) if yb > ya else (yb, ya)
            rows = np.nonzero((ys >= lo) & (ys < hi))[0]
            if rows.size == 0:
                continue
            xs = x0[e] + (ys[rows] - ya) * (x1[e] - x0[e]) / (yb - ya)
            # pixel centers strictly right of the crossing are inside-tested
            cols = np.ceil(xs - 0.5).astype(np.int64)  # first center > xs
            cols = np.clip(cols, 0, w)
            np.add.at(wind_delta, (rows, cols), direction)
    winding = wind_delta[:, :w].cumsum(axis=1)
    mask = (winding != 0) if rule == "nonzero" else (winding % 2 != 0)
    img[mask] = color


def _stroke_quad(p0, p1, width):
    """A line segment as its stroked quad (butt caps)."""
    dx, dy = p1[0] - p0[0], p1[1] - p0[1]
    n = (dx * dx + dy * dy) ** 0.5
    if n == 0:
        return None
    ux, uy = -dy / n * width / 2.0, dx / n * width / 2.0
    return [
        (p0[0] + ux, p0[1] + uy), (p1[0] + ux, p1[1] + uy),
        (p1[0] - ux, p1[1] - uy), (p0[0] - ux, p0[1] - uy),
    ]


# --------------------------------------------------------------------------
# element walk
# --------------------------------------------------------------------------


def _parse_transform(s: str | None):
    """translate(tx[,ty]) / scale(sx[,sy]) chains → (sx, sy, tx, ty).
    Applied as x' = sx*x + tx (axis-aligned subset — rotation is out
    of scope and raises)."""
    sx = sy = 1.0
    tx = ty = 0.0
    for m in re.finditer(r"(\w+)\s*\(([^)]*)\)", s or ""):
        kind, args = m.group(1), _floats(m.group(2))
        if kind == "translate":
            ax = args[0] if args else 0.0
            ay = args[1] if len(args) > 1 else 0.0
            tx += sx * ax
            ty += sy * ay
        elif kind == "scale":
            ax = args[0] if args else 1.0
            ay = args[1] if len(args) > 1 else ax
            sx *= ax
            sy *= ay
        else:
            raise ValueError(f"svg: unsupported transform {kind!r}")
    return sx, sy, tx, ty


def _compose(outer, inner):
    osx, osy, otx, oty = outer
    isx, isy, itx, ity = inner
    return osx * isx, osy * isy, osx * itx + otx, osy * ity + oty


def _apply(tf, pts):
    sx, sy, tx, ty = tf
    return [(sx * x + tx, sy * y + ty) for x, y in pts]


def decode_svg(data: bytes) -> np.ndarray:
    """Rasterize ``data`` → (h, w, 3) uint8 RGB on a white canvas."""
    try:
        root = ET.fromstring(data.decode("utf-8", "strict"))
    except (ET.ParseError, UnicodeDecodeError) as e:
        raise ValueError(f"svg: not well-formed XML ({e})") from None
    if _localname(root.tag) != "svg":
        raise ValueError("svg: root element is not <svg>")

    vb = _floats(root.get("viewBox", ""))
    wattr = root.get("width")
    hattr = root.get("height")

    def _px(v):
        f = _floats(v or "")
        if not f or "%" in (v or ""):
            return None
        return f[0]

    w = _px(wattr)
    h = _px(hattr)
    if w is None or h is None:
        if len(vb) == 4:
            w = w if w is not None else vb[2]
            h = h if h is not None else vb[3]
        else:
            raise ValueError("svg: no usable width/height or viewBox")
    w, h = int(round(w)), int(round(h))
    if w <= 0 or h <= 0 or w * h > 1 << 26:
        raise ValueError("svg: bad canvas size")

    # viewBox → user-unit transform (uniform SVG default is xMidYMid
    # meet; the subset requires equal aspect and maps linearly)
    tf = (1.0, 1.0, 0.0, 0.0)
    if len(vb) == 4:
        minx, miny, vbw, vbh = vb
        if vbw <= 0 or vbh <= 0:
            raise ValueError("svg: bad viewBox")
        tf = (w / vbw, h / vbh, -minx * w / vbw, -miny * h / vbh)

    img = np.full((h, w, 3), 255, np.uint8)

    _UNSET = object()  # no fill set anywhere up the tree ≠ fill="none"

    def walk(el, tf, inherited_fill):
        a = _style_attrs(el)
        tf = _compose(tf, _parse_transform(a.get("transform")))
        fill_attr = a.get("fill", None)
        # three states: _UNSET (spec default black applies), None
        # (explicit fill="none" — shape unpainted), or a color. The
        # real-web icon pattern <svg fill="none" stroke=…> depends on
        # "none" INHERITING as none, not collapsing into the default.
        fill = _parse_color(fill_attr) if fill_attr is not None else inherited_fill
        name = _localname(el.tag)
        if name in ("defs", "title", "desc", "metadata", "symbol"):
            return
        if name == "svg" and el is not root:
            raise ValueError("svg: nested <svg> viewports are out of scope")
        if name in ("svg", "g", "a"):  # <a> is a renderable container
            for child in el:
                walk(child, tf, fill)
            return
        eff_fill = (0, 0, 0) if fill is _UNSET else fill
        if name == "rect":
            x, y = _floats(a.get("x", "0"))[0], _floats(a.get("y", "0"))[0]
            rw, rh = _floats(a.get("width", "0"))[0], _floats(a.get("height", "0"))[0]
            if rw <= 0 or rh <= 0:
                return
            if eff_fill is None:
                return
            sx, sy, tx, ty = tf
            if sx > 0 and sy > 0:
                # axis-aligned fast path (the dominant shape: logos and
                # the run-length encoder twin). Same half-open
                # pixel-center rule as the scanline filler: a center
                # c+0.5 is inside [lo, hi) iff c >= ceil(lo - 0.5) and
                # c < ceil(hi - 0.5).
                x0, x1 = sx * x + tx, sx * (x + rw) + tx
                y0, y1 = sy * y + ty, sy * (y + rh) + ty
                ca = max(0, int(np.ceil(x0 - 0.5)))
                cb = min(img.shape[1], int(np.ceil(x1 - 0.5)))
                ra = max(0, int(np.ceil(y0 - 0.5)))
                rb = min(img.shape[0], int(np.ceil(y1 - 0.5)))
                if ca < cb and ra < rb:
                    img[ra:rb, ca:cb] = eff_fill
                return
            pts = [(x, y), (x + rw, y), (x + rw, y + rh), (x, y + rh)]
            _fill_polygons(img, [_apply(tf, pts)], eff_fill)
        elif name in ("circle", "ellipse"):
            cx, cy = _floats(a.get("cx", "0"))[0], _floats(a.get("cy", "0"))[0]
            if name == "circle":
                rx = ry = _floats(a.get("r", "0"))[0]
            else:
                rx, ry = _floats(a.get("rx", "0"))[0], _floats(a.get("ry", "0"))[0]
            if rx <= 0 or ry <= 0 or eff_fill is None:
                return
            sx, sy, tx, ty = tf
            ccx, ccy = sx * cx + tx, sy * cy + ty
            crx, cry = abs(sx) * rx, abs(sy) * ry
            yy, xx = np.mgrid[0:h, 0:w]
            m = ((xx + 0.5 - ccx) / crx) ** 2 + ((yy + 0.5 - ccy) / cry) ** 2 <= 1.0
            img[m] = eff_fill
        elif name in ("polygon", "polyline"):
            nums = _floats(a.get("points", ""))
            pts = list(zip(nums[0::2], nums[1::2]))
            if len(pts) < 2:
                return
            if name == "polygon" and eff_fill is not None:
                rule = a.get("fill-rule", "nonzero")
                _fill_polygons(img, [_apply(tf, pts)], eff_fill, rule)
            stroke = _parse_color(a.get("stroke"))
            if stroke is not None:
                swidth = _floats(a.get("stroke-width", "1"))[0]
                quads = []
                for p0, p1 in zip(pts[:-1], pts[1:]):
                    q = _stroke_quad(p0, p1, swidth)
                    if q:
                        quads.append(_apply(tf, q))
                for q in quads:
                    _fill_polygons(img, [q], stroke)
        elif name == "line":
            stroke = _parse_color(a.get("stroke"))
            if stroke is None:
                return
            swidth = _floats(a.get("stroke-width", "1"))[0]
            p0 = (_floats(a.get("x1", "0"))[0], _floats(a.get("y1", "0"))[0])
            p1 = (_floats(a.get("x2", "0"))[0], _floats(a.get("y2", "0"))[0])
            q = _stroke_quad(p0, p1, swidth)
            if q:
                _fill_polygons(img, [_apply(tf, q)], stroke)
        elif name == "path":
            if eff_fill is None:
                return
            subpaths = [_apply(tf, sp) for sp in parse_path(a.get("d", ""))]
            rule = a.get("fill-rule", "nonzero")
            _fill_polygons(img, subpaths, eff_fill, rule)
        elif name in ("text", "tspan", "image", "use", "switch", "foreignObject"):
            raise ValueError(f"svg: <{name}> is out of scope")
        # unknown/other elements: skipped (spec: unknown elements are
        # not rendered), children NOT walked — matches renderer
        # behavior for unsupported containers

    walk(root, tf, _UNSET)
    return img


# --------------------------------------------------------------------------
# encoder twin: run-length <rect> emission — exact under this decoder
# --------------------------------------------------------------------------


def encode_svg(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → standalone SVG, one <rect> per horizontal
    same-color run (white runs skipped: the canvas is white). Valid
    SVG for any renderer; exactly lossless under :func:`decode_svg`
    (integer-aligned rects, center sampling)."""
    arr = np.asarray(arr, np.uint8)
    h, w = arr.shape[:2]
    out = [
        '<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{w}" height="{h}">'
    ]
    for y in range(h):
        row = arr[y]
        x = 0
        while x < w:
            c = row[x]
            x2 = x + 1
            while x2 < w and (row[x2] == c).all():
                x2 += 1
            if not (c == 255).all():
                out.append(
                    f'<rect x="{x}" y="{y}" width="{x2 - x}" height="1" '
                    f'fill="#{c[0]:02x}{c[1]:02x}{c[2]:02x}"/>'
                )
            x = x2
    out.append("</svg>")
    return "".join(out).encode("utf-8")
