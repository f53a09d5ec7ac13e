"""SVG subset rasterizer (functions/svg.py). The one vector format in
the real-web image envelope: logos/icons/diagrams ship as SVG
(reference drops all images, src/lib/md/mdUtils.ts:23-44; the graft
keeps them). Determinism is the contract — center-sampled scanline
fill, fixed 16-segment curve flattening — so the same bytes yield the
same pixels on every executor, which is what the per-row ok/phash
invariants require. The encoder twin is run-length ``<rect>``
emission: valid standalone SVG, exactly lossless under this
rasterizer, placing ``svg`` in the lossless tier of the codec
registry."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.functions.svg import decode_svg, encode_svg, parse_path

SVG_NS = 'xmlns="http://www.w3.org/2000/svg"'


def _doc(body: str, w: int = 20, h: int = 20, extra: str = "") -> bytes:
    return f'<svg {SVG_NS} width="{w}" height="{h}" {extra}>{body}</svg>'.encode()


# --------------------------------------------------------------------------
# shapes
# --------------------------------------------------------------------------


def test_rect_half_open_coverage():
    """Integer-aligned rect paints exactly its w×h pixels: center
    sampling with half-open edges, no bleed into neighbors."""
    img = decode_svg(_doc('<rect x="3" y="4" width="5" height="6" fill="#ff0000"/>'))
    red = (img == (255, 0, 0)).all(axis=-1)
    assert red[4:10, 3:8].all()
    assert red.sum() == 5 * 6


def test_abutting_rects_tile_without_gap_or_overlap():
    """Two rects sharing an edge tile the plane: every pixel painted
    exactly once (half-open rule), later paint wins on true overlap."""
    img = decode_svg(
        _doc(
            '<rect x="0" y="0" width="10" height="20" fill="#ff0000"/>'
            '<rect x="10" y="0" width="10" height="20" fill="#0000ff"/>'
        )
    )
    red = (img == (255, 0, 0)).all(axis=-1)
    blue = (img == (0, 0, 255)).all(axis=-1)
    assert red.sum() == 200 and blue.sum() == 200
    assert (red | blue).all()


def test_fractional_rect_matches_center_rule():
    """A rect over [2.5, 6.5) covers centers 2.5..5.5 → cols 2..5."""
    img = decode_svg(_doc('<rect x="2.5" y="2.5" width="4" height="4" fill="black"/>'))
    black = (img == 0).all(axis=-1)
    assert black[2:6, 2:6].all() and black.sum() == 16


def test_circle_and_ellipse():
    img = decode_svg(
        _doc(
            '<circle cx="10" cy="10" r="5" fill="#00ff00"/>', 20, 20
        )
    )
    green = (img == (0, 255, 0)).all(axis=-1)
    # center in, corner out, area ≈ πr²
    assert green[10, 10] and not green[0, 0]
    assert abs(int(green.sum()) - int(np.pi * 25)) <= 8
    img2 = decode_svg(_doc('<ellipse cx="10" cy="10" rx="8" ry="3" fill="black"/>'))
    blk = (img2 == 0).all(axis=-1)
    assert blk[10, 3] and blk[10, 16] and not blk[4, 10]


def test_polygon_fill_rules_differ_on_self_intersection():
    """Pentagram: nonzero fills the core, evenodd leaves it white —
    the spec's canonical distinguishing case."""
    pts = []
    for k in range(5):
        ang = -np.pi / 2 + k * 4 * np.pi / 5  # star order (skip 2)
        pts.append((20 + 16 * np.cos(ang), 20 + 16 * np.sin(ang)))
    attr = " ".join(f"{x:.3f},{y:.3f}" for x, y in pts)
    nz = decode_svg(_doc(f'<polygon points="{attr}" fill="black"/>', 40, 40))
    eo = decode_svg(
        _doc(f'<polygon points="{attr}" fill="black" fill-rule="evenodd"/>', 40, 40)
    )
    center_nz = (nz[20, 20] == 0).all()
    center_eo = (eo[20, 20] == 255).all()
    assert center_nz and center_eo
    # points (the 5 tips) are filled under both rules
    assert (nz[8, 20] == 0).all() and (eo[8, 20] == 0).all()


def test_line_stroke_quad():
    img = decode_svg(
        _doc('<line x1="0" y1="10" x2="20" y2="10" stroke="black" stroke-width="4"/>')
    )
    blk = (img == 0).all(axis=-1)
    assert blk[8:12, :].all()
    assert blk.sum() == 4 * 20


def test_path_triangle_and_curves():
    img = decode_svg(_doc('<path d="M2 2 L18 2 L10 18 Z" fill="#336699"/>'))
    assert (img[4, 10] == (0x33, 0x66, 0x99)).all()
    assert (img[17, 2] == 255).all()
    # cubic curve bulges above the chord; quadratic path parses
    img2 = decode_svg(
        _doc('<path d="M2 15 C 2 2, 18 2, 18 15 Z" fill="black"/>')
    )
    blk = (img2 == 0).all(axis=-1)
    assert blk[7, 10] and not blk[3, 2]
    sub = parse_path("M0 0 Q 5 10, 10 0 T 20 0")
    assert len(sub) == 1 and len(sub[0]) == 33  # 1 + 2×16 flattened


def test_arc_full_circle_matches_circle_element():
    """A circle drawn as two semicircular arcs rasterizes pixel-equal
    to <circle> at the same flattening (both sample 32 perimeter
    points): the §F.6 endpoint→center math is exercised end to end."""
    arcs = _doc(
        '<path d="M2 10 A 8 8 0 1 1 18 10 A 8 8 0 1 1 2 10 Z" fill="#ff0000"/>'
    )
    circ = _doc('<circle cx="10" cy="10" r="8" fill="#ff0000"/>')
    a, c = decode_svg(arcs), decode_svg(circ)
    red_a = (a == (255, 0, 0)).all(axis=-1)
    red_c = (c == (255, 0, 0)).all(axis=-1)
    # same flattening density ⇒ at most a 1-px ring of disagreement
    assert red_a[6:14, 6:14].all() and red_c[6:14, 6:14].all()
    assert (red_a ^ red_c).sum() <= 8
    assert abs(int(red_a.sum()) - int(red_c.sum())) <= 8


def test_arc_compact_flag_syntax():
    """Real icon sets fuse arc flags with the next number ('011 0');
    the spec lexes flags as single chars — both forms must parse to
    the same geometry."""
    spaced = parse_path("M2 10 A 8 8 0 0 1 18 10")
    compact = parse_path("M2 10A8 8 0 0118 10")
    assert spaced == compact
    # relative form too
    assert parse_path("M2 10 a 8 8 0 0 1 16 0") == spaced


def test_arc_flags_select_the_four_arcs():
    """large-arc × sweep choose four distinct arcs between the same
    endpoints (spec §F.6.5 sign rule)."""
    # radius > chord/2 so the large and small arcs are distinct
    variants = {
        (la, sw): parse_path(f"M5 10 A 7 7 0 {la} {sw} 15 10")[0]
        for la in (0, 1)
        for sw in (0, 1)
    }
    # sweep=1 is the positive-angle direction, which in SVG's y-down
    # user space is screen-CLOCKWISE: left→right over the TOP (−y).
    # sweep=0 bows down; large arcs bow further on their side.
    mid = {k: v[len(v) // 2] for k, v in variants.items()}
    assert mid[(0, 1)][1] < 10 < mid[(0, 0)][1]
    assert mid[(1, 1)][1] < mid[(0, 1)][1]
    assert mid[(1, 0)][1] > mid[(0, 0)][1]
    # all reach the exact endpoint
    for v in variants.values():
        assert v[-1] == (15.0, 10.0)


def test_arc_degeneracies():
    # zero radius → straight line (§F.6.6.1)
    assert parse_path("M0 0 A 0 5 0 0 1 10 0")[0] == [(0.0, 0.0), (10.0, 0.0)]
    # coincident endpoints → no segment (§F.6.6.2: arc is omitted)
    assert parse_path("M3 4 A 5 5 0 0 1 3 4")[0] == [(3.0, 4.0)]
    # radii too small → scaled up uniformly (§F.6.6.3): becomes the
    # semicircle on the chord, endpoint exact
    pts = parse_path("M0 10 A 1 1 0 0 1 10 10")[0]
    assert pts[-1] == (10.0, 10.0)
    ys = [p[1] for p in pts]
    assert min(ys) < 5.5  # bulges to the scaled radius, not the unit one


def test_path_multiple_subpaths_evenodd_hole():
    """Outer square + inner square, evenodd → annulus (donut)."""
    d = "M2 2 H18 V18 H2 Z M7 7 H13 V13 H7 Z"
    img = decode_svg(_doc(f'<path d="{d}" fill="black" fill-rule="evenodd"/>'))
    blk = (img == 0).all(axis=-1)
    assert blk[4, 4] and not blk[10, 10] and not blk[0, 0]


# --------------------------------------------------------------------------
# structure: transforms, viewBox, inheritance, style
# --------------------------------------------------------------------------


def test_group_transform_compose_and_fill_inherit():
    img = decode_svg(
        _doc(
            '<g fill="#ff0000" transform="translate(5,0)">'
            '<g transform="scale(2)"><rect x="1" y="1" width="3" height="3"/></g>'
            "</g>",
            20,
            20,
        )
    )
    red = (img == (255, 0, 0)).all(axis=-1)
    # x' = 2x + 5 → [7,13), y' = 2y → [2,8)
    assert red[2:8, 7:13].all() and red.sum() == 36


def test_viewbox_scales_user_units():
    img = decode_svg(
        _doc('<rect x="0" y="0" width="5" height="5" fill="black"/>',
             20, 20, extra='viewBox="0 0 10 10"')
    )
    blk = (img == 0).all(axis=-1)
    assert blk[:10, :10].all() and blk.sum() == 100


def test_inline_style_wins_over_presentation_attr():
    img = decode_svg(
        _doc('<rect x="0" y="0" width="20" height="20" fill="#ff0000" '
             'style="fill:#0000ff"/>')
    )
    assert (img == (0, 0, 255)).all(axis=(0, 1)).all()


def test_named_rgb_percent_and_none():
    img = decode_svg(
        _doc(
            '<rect x="0" y="0" width="4" height="4" fill="orange"/>'
            '<rect x="4" y="0" width="4" height="4" fill="rgb(50%,0%,100%)"/>'
            '<rect x="8" y="0" width="4" height="4" fill="none"/>'
        )
    )
    assert (img[0, 0] == (255, 165, 0)).all()
    assert (img[0, 4] == (128, 0, 255)).all()
    assert (img[0, 8] == 255).all()


def test_defs_and_unknown_elements_not_rendered():
    img = decode_svg(
        _doc('<defs><rect x="0" y="0" width="20" height="20" fill="black"/></defs>'
             '<unknown><rect x="0" y="0" width="20" height="20" fill="black"/></unknown>')
    )
    assert (img == 255).all()


# --------------------------------------------------------------------------
# error envelope → quarantine-row semantics upstream
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        b"not xml at all <",
        b"<html><body/></html>",
        _doc('<path d="M0 0 A 5 5 0 2 1 10 10" fill="black"/>'),
        _doc('<text x="1" y="1">hi</text>'),
        _doc('<g transform="rotate(45)"><rect width="5" height="5"/></g>'),
        _doc('<rect width="5" height="5" fill="#12345"/>'),
        b'<svg xmlns="http://www.w3.org/2000/svg"><rect width="5" height="5"/></svg>',
    ],
    ids=["malformed", "non-svg-root", "bad-arc-flag", "text", "rotate", "bad-hex", "no-size"],
)
def test_unsupported_raises_valueerror(data):
    with pytest.raises(ValueError):
        decode_svg(data)


# --------------------------------------------------------------------------
# encoder twin + registry contract
# --------------------------------------------------------------------------


def test_encode_decode_exact_roundtrip():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (5, 3), (32, 48)]:
        arr = (rng.integers(0, 4, (h, w, 3)) * 80).astype(np.uint8)
        assert np.array_equal(decode_svg(encode_svg(arr)), arr)
    # full-variance worst case still exact (one rect per pixel)
    yy, xx = np.mgrid[0:24, 0:24]
    arr = np.stack([(yy * 3 + xx * 5) % 256, (yy * 2 + xx * 7) % 256,
                    (yy * 5 + xx * 2) % 256], axis=-1).astype(np.uint8)
    assert np.array_equal(decode_svg(encode_svg(arr)), arr)


def test_registry_lossless_tier():
    from crawler_spark.functions import images as im

    assert "svg" in im.CODECS and "svg" not in im.LOSSY_FMTS
    arr = np.full((8, 8, 3), (10, 200, 30), np.uint8)
    assert np.array_equal(im.decode_image(im.encode_image(arr, "svg"), "svg"), arr)


def test_rect_fast_path_matches_scanline_filler():
    """The axis-aligned rect fast path and the generic scanline filler
    are the same function on pixels — fuzzed over fractional geometry
    (the half-open center rule must agree on both paths)."""
    from crawler_spark.functions.svg import _fill_polygons

    rng = np.random.default_rng(3)
    for _ in range(100):
        x, y = rng.uniform(-3.0, 18.0, 2)
        rw, rh = rng.uniform(0.05, 12.0, 2)
        fast = decode_svg(
            _doc(f'<rect x="{x}" y="{y}" width="{rw}" height="{rh}" fill="#123456"/>')
        )
        ref = np.full((20, 20, 3), 255, np.uint8)
        pts = [(x, y), (x + rw, y), (x + rw, y + rh), (x, y + rh)]
        _fill_polygons(ref, [pts], (0x12, 0x34, 0x56))
        assert np.array_equal(fast, ref), (x, y, rw, rh)


# --------------------------------------------------------------------------
# review regressions (r4 s7): fill="none" inheritance, containers, post-Z
# --------------------------------------------------------------------------


def test_inherited_fill_none_renders_unpainted():
    """<svg fill="none"> (the Feather/Lucide icon pattern) must leave
    fill-less children UNPAINTED — 'none' inherits as none, never
    collapsing into the default black."""
    img = decode_svg(_doc('<rect width="20" height="20"/>', extra='fill="none"'))
    assert (img == 255).all()
    # a child can still override back to a color
    img2 = decode_svg(
        _doc('<g fill="none"><rect width="20" height="20" fill="red"/></g>')
    )
    assert (img2 == (255, 0, 0)).all(axis=-1).all()


def test_anchor_is_renderable_container():
    img = decode_svg(
        _doc('<a href="#x"><rect width="20" height="20" fill="red"/></a>')
    )
    assert (img == (255, 0, 0)).all(axis=-1).all()


def test_nested_svg_raises():
    with pytest.raises(ValueError):
        decode_svg(_doc('<svg x="2" width="4" height="4"><rect width="2" height="2"/></svg>'))


def test_subpath_after_z_starts_at_current_point():
    """Z returns the pen to the subpath start; a drawing command right
    after Z begins the NEW subpath from that point (spec 8.3.3)."""
    sub = parse_path("M0 0 L10 0 L10 10 Z L0 10 L10 10 Z")
    assert sub[1][0] == (0.0, 0.0)  # seeded with the current point
    img = decode_svg(
        _doc('<path d="M2 2 L18 2 L18 8 Z L2 18 L18 18 Z" fill="black"/>')
    )
    blk = (img == 0).all(axis=-1)
    assert blk[16, 9]  # second triangle (2,2)-(2,18)-(18,18) is filled
