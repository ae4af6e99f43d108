"""R3 divergence quantification: pixel-center even-odd vs PIL-style
inclusive-edge fill (VERDICT r3 item 7).

The reference rasterizes masks by int-truncating ring vertices
(rasters.py:101-116) and handing them to PIL ImageDraw.polygon with
fill-then-erase per ring (lib/conversionfeature.py:60-79). For INTEGER
vertices, PIL's fill semantics are the inclusive-edge model: an integer
lattice point is painted iff it lies inside OR ON the quantized polygon
boundary, holes erased the same way (boundary included in the erase).

The engine (kernels/raster.py:rasterize_mask) instead evaluates the
pixel CENTER (x+0.5, y+0.5) with strict even-odd — documented divergence.
This fixture pins the divergence per shape class so the numbers are on
record: the engine's mask is always a SUBSET shifted off the inclusive
boundary band; it never gains pixels PIL lacks on convex shapes, and a
sub-pixel sliver that PIL paints as a boundary line vanishes entirely.

Tile ASSIGNMENTS (R2) are verbatim-matched elsewhere (200-case golden in
test_kernels); this file quantifies mask-level differences only.
"""

import numpy as np
import pytest

from gdal_common_python_spark.kernels import raster as KR


def _on_segment(px, py, x0, y0, x1, y1):
    cross = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    if cross != 0:
        return False
    return min(x0, x1) <= px <= max(x0, x1) and min(y0, y1) <= py <= max(y0, y1)


def _inside_or_on(px, py, ring):
    """Inclusive even-odd: integer lattice point inside or on the ring."""
    n = len(ring)
    inside = False
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        if _on_segment(px, py, x0, y0, x1, y1):
            return True
        if (y0 > py) != (y1 > py):
            xi = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
            if px < xi:
                inside = not inside
    return inside


def pil_style_mask(qrings, w, h):
    """Inclusive-edge fill-then-erase over integer-quantized rings: ring 0
    paints 1 (boundary included), later rings erase 0 (boundary included) —
    the reference's per-ring polygon(…, 1 if outer else 0) order."""
    m = np.zeros((h, w), dtype=np.uint8)
    for k, ring in enumerate(qrings):
        val = 1 if k == 0 else 0
        for y in range(h):
            for x in range(w):
                if _inside_or_on(x, y, ring):
                    m[y, x] = val
    return m


def engine_mask(rings_world, w, h):
    # origin (0,0), px (1,-1): world (c, -r) quantizes to pixel (c, r)
    return KR.rasterize_mask(rings_world, 0.0, 0.0, 1.0, -1.0, w, h)


def to_world(ring_px):
    return np.array([[x, -y] for x, y in ring_px], dtype=np.float64)


CONVEX = [(1, 1), (12, 2), (5, 11)]
OUTER = [(1, 1), (13, 1), (13, 13), (1, 13)]
HOLE = [(5, 5), (9, 5), (9, 9), (5, 9)]
# world-coord sliver: all three vertices int-truncate onto the line y=1
SLIVER_WORLD = np.array([[1.2, -1.3], [13.8, -1.4], [13.9, -1.6]])


def test_convex_divergence_is_boundary_band():
    """Convex triangle, 16x16: divergence is confined to the +-1-pixel
    boundary band and goes BOTH ways — the models sample different points
    (PIL: lattice point, inclusive; engine: pixel center, strict), so on
    upper-left edges PIL gains the boundary and on lower-right edges the
    engine's half-pixel-shifted center picks up pixels PIL drops."""
    got = engine_mask([to_world(CONVEX)], 16, 16)
    ref = pil_style_mask([np.array(CONVEX, float)], 16, 16)
    assert int(got.sum()) == 52
    assert int(ref.sum()) == 56
    assert int(((ref == 1) & (got == 0)).sum()) == 10  # PIL-only boundary
    assert int(((got == 1) & (ref == 0)).sum()) == 6  # engine-only edge pixels
    # the interiors agree exactly: eroding either mask by 1 pixel yields a
    # region contained in the other (divergence lives on the boundary ring;
    # note a sharp apex pixel can sit 2 pixels off the engine mask, so the
    # band is per-edge, not a global 1-dilation)
    core = np.zeros_like(got)
    core[1:-1, 1:-1] = (
        got[1:-1, 1:-1] & got[:-2, 1:-1] & got[2:, 1:-1] & got[1:-1, :-2] & got[1:-1, 2:]
    )
    assert not ((core == 1) & (ref == 0)).any()


def test_hole_divergence_both_boundaries():
    """Square with a hole, 16x16: outer boundary diverges PIL-ward (25
    inclusive-edge pixels the engine's strict centers skip), the hole
    boundary diverges engine-ward (9 pixels PIL's inclusive erase removes
    but whose centers sit outside the quantized hole)."""
    got = engine_mask([to_world(OUTER), to_world(HOLE)], 16, 16)
    ref = pil_style_mask(
        [np.array(OUTER, float), np.array(HOLE, float)], 16, 16
    )
    assert int(got.sum()) == 128
    assert int(ref.sum()) == 144
    assert int(((ref == 1) & (got == 0)).sum()) == 25
    assert int(((got == 1) & (ref == 0)).sum()) == 9


def test_subpixel_sliver_vanishes_for_engine():
    got = engine_mask([SLIVER_WORLD], 16, 16)
    q = KR.quantize_rings([SLIVER_WORLD], 0.0, 0.0, 1.0, -1.0)[0]
    assert (q[:, 1] == 1).all()  # all vertices truncate onto scanline y=1
    ref = pil_style_mask([q], 16, 16)
    # degenerate line: no pixel center is strictly inside -> engine empty;
    # PIL paints the boundary lattice points 1..13 on y=1
    assert int(got.sum()) == 0
    assert int(ref.sum()) == 13
    assert set(zip(*np.nonzero(ref))) == {(1, x) for x in range(1, 14)}
