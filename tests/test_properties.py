"""Property-based kernel tests (SURVEY §5.2 item 4) — seeded hypothesis,
Spark-free."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gdal_common_python_spark.kernels import cells, geom, raster as rk

coord = st.floats(min_value=-170.0, max_value=170.0, allow_nan=False, width=64)
lat = st.floats(min_value=-80.0, max_value=80.0, allow_nan=False, width=64)


@st.composite
def convex_polygon(draw):
    cx = draw(coord)
    cy = draw(lat)
    r = draw(st.floats(min_value=0.01, max_value=5.0))
    n = draw(st.integers(min_value=3, max_value=12))
    th = np.sort(np.array([draw(st.floats(0, 2 * np.pi)) for _ in range(n)]))
    if len(np.unique(th)) < 3:
        th = np.linspace(0, 2 * np.pi, 5)[:-1]
    return np.column_stack([cx + r * np.cos(th), cy + r * np.sin(th)])


@settings(max_examples=60, deadline=None)
@given(poly=convex_polygon(), px=coord, py=lat)
def test_pip_inside_bbox(poly, px, py):
    """PIP hits are contained in the bbox prefilter (never the reverse)."""
    e = geom.rings_to_edges([poly])
    inside = bool(geom.points_in_rings(np.array([px]), np.array([py]), e)[0])
    xmin, ymin, xmax, ymax = geom.rings_bbox([poly])
    if inside:
        assert xmin <= px <= xmax and ymin <= py <= ymax


@settings(max_examples=40, deadline=None)
@given(a=convex_polygon(), b=convex_polygon())
def test_intersects_symmetry(a, b):
    assert geom.polygon_intersects([a], [b]) == geom.polygon_intersects([b], [a])


@settings(max_examples=40, deadline=None)
@given(a=convex_polygon(), b=convex_polygon())
def test_clip_area_bounds(a, b):
    """area(A ∩ B) <= min(area A, area B); clip+difference reconstructs A."""
    if not geom.is_convex(b) or geom.signed_area(b) <= 0:
        return
    inter = geom.clip_convex(a, b)
    ia = abs(geom.signed_area(inter)) if inter is not None else 0.0
    aa, ab = abs(geom.signed_area(a)), abs(geom.signed_area(b))
    assert ia <= min(aa, ab) + 1e-6 * max(aa, ab, 1)
    rest = sum(abs(geom.signed_area(p)) for p in geom.difference_convex(a, b))
    assert abs((ia + rest) - aa) <= 1e-6 * max(aa, 1)


@settings(max_examples=60, deadline=None)
@given(lon=coord, lt=lat, res=st.integers(min_value=3, max_value=14))
def test_cell_hierarchy(lon, lt, res):
    c = cells.encode([lon], [lt], res)[0]
    p = cells.parent(np.array([c]), res - 1)[0]
    assert p == cells.encode([lon], [lt], res - 1)[0]
    cov = cells.cover_bbox(lon - 0.1, lt - 0.1, lon + 0.1, lt + 0.1, res)
    assert c in cov


@settings(max_examples=40, deadline=None)
@given(poly=convex_polygon())
def test_mask_subset_of_window(poly):
    """mask(pixels) ⊆ window: every masked pixel center is inside the
    quantized polygon (definitional) and mask count <= window size."""
    xmin, ymin, xmax, ymax = geom.rings_bbox([poly])
    w = rk.window_snap(xmin, ymin, xmax, ymax, -180.0, 90.0, 0.25, -0.25, 1440, 720)
    if w is None:
        return
    win_ox, win_oy, rx, ry, _, _ = w
    if rx * ry > 20000:
        return
    m = rk.rasterize_mask([poly], win_ox, win_oy, 0.25, -0.25, rx, ry)
    assert m.shape == (ry, rx)
    assert m.sum() <= rx * ry


@settings(max_examples=40, deadline=None)
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), max_size=50))
def test_stats_invariants(vals):
    s = rk.stats(np.asarray(vals, dtype=np.float64))
    if not vals:
        assert all(v == 0 for v in s.values())
        return
    assert s["min"] <= s["median"] <= s["max"] or len(vals) == 1
    assert s["min"] <= s["perc90"] <= s["max"]
    assert s["var"] >= -1e-9
    # mean uses the reference's incremental val/n summation (lib/zonal.py:213-217),
    # which can land a few ulps outside [min, max]; allow relative fp slack.
    slack = 1e-9 * max(abs(s["min"]), abs(s["max"]), 1.0)
    assert s["min"] - slack <= s["mean"] <= s["max"] + slack


@st.composite
def star_polygon(draw):
    """Simple but usually CONCAVE polygon: star-shaped with jittered radii
    around a center (angularly sorted -> no self-intersections)."""
    cx = draw(coord)
    cy = draw(lat)
    n = draw(st.integers(min_value=5, max_value=14))
    base = draw(st.floats(min_value=0.5, max_value=3.0))
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radii = np.array(
        [base * (0.3 + 0.7 * draw(st.floats(0.0, 1.0))) + 0.05 for _ in range(n)]
    )
    return np.column_stack([cx + radii * np.cos(th), cy + radii * np.sin(th)])


@settings(max_examples=40, deadline=None)
@given(p=star_polygon())
def test_triangulation_area_identity(p):
    tris = geom.triangulate_ring(p)
    tri_area = sum(geom.signed_area(t) for t in tris)
    poly_area = abs(geom.signed_area(p))
    assert all(geom.signed_area(t) > 0 for t in tris)  # CCW triangles
    assert abs(tri_area - poly_area) < 1e-9 * max(poly_area, 1.0)


@settings(max_examples=30, deadline=None)
@given(a=star_polygon(), b=star_polygon())
def test_clip_diff_partition_identity(a, b):
    """area(A∩B) + area(A\\B) == area(A) for arbitrary simple polygons."""
    ai = geom.polygon_area(geom.clip_general([a], [b]))
    ad = geom.polygon_area(geom.difference_general([a], [b]))
    aa = abs(geom.signed_area(a))
    assert abs(ai + ad - aa) < 1e-7 * max(aa, 1.0)
    assert ai >= -1e-9 and ad >= -1e-9


@settings(max_examples=30, deadline=None)
@given(a=star_polygon(), b=star_polygon())
def test_union_bounds_and_symmetry(a, b):
    u1 = geom.polygon_area(geom.union_pieces([[a], [b]]))
    u2 = geom.polygon_area(geom.union_pieces([[b], [a]]))
    aa, ab = abs(geom.signed_area(a)), abs(geom.signed_area(b))
    assert abs(u1 - u2) < 1e-7 * max(aa + ab, 1.0)  # commutative
    assert u1 <= aa + ab + 1e-7 and u1 >= max(aa, ab) - 1e-7


@settings(max_examples=25, deadline=None)
@given(p=convex_polygon(), frac=st.floats(min_value=0.05, max_value=0.4))
def test_erosion_convex_halfplane_identity(p, frac):
    """Erosion of a convex ring by d equals the d-inward half-plane
    intersection (exact even with n-gon vertex disks — every in-band
    interior point of a convex polygon lies in an edge quad)."""
    if geom.signed_area(p) <= 0 or not geom.is_convex(p):
        return
    # d relative to the inradius proxy so erosion usually survives
    xmin, ymin, xmax, ymax = geom.rings_bbox([p])
    d = frac * min(xmax - xmin, ymax - ymin)
    if d <= 1e-6:
        return
    er = geom.buffer_rings([p], -d, n=16)
    nxt = np.roll(p, -1, axis=0)
    lines = []
    for a, b in zip(p, nxt):
        e = b - a
        ln = float(np.hypot(e[0], e[1]))
        if ln < 1e-12:
            return
        lines.append([a[0] - e[1] / ln * d, a[1] + e[0] / ln * d,
                      b[0] - e[1] / ln * d, b[1] + e[0] / ln * d])
    off = geom.clip_halfplanes(p, np.asarray(lines))
    off_area = abs(geom.signed_area(off)) if off is not None else 0.0
    assert abs(geom.polygon_area(er) - off_area) < 1e-7 * max(off_area, 1.0)


@settings(max_examples=25, deadline=None)
@given(p=star_polygon(), frac=st.floats(min_value=0.05, max_value=0.5))
def test_erosion_subset_and_monotone(p, frac):
    """Erosion is contained in the original and shrinks the area; eroding
    by more never grows the region (sampled membership)."""
    if geom.signed_area(p) <= 0:
        p = p[::-1]
    xmin, ymin, xmax, ymax = geom.rings_bbox([p])
    d = frac * min(xmax - xmin, ymax - ymin) * 0.5
    if d <= 1e-6:
        return
    er1 = geom.buffer_rings([p], -d, n=12)
    er2 = geom.buffer_rings([p], -2 * d, n=12)
    assert geom.polygon_area(er1) <= abs(geom.signed_area(p)) + 1e-9
    assert geom.polygon_area(er2) <= geom.polygon_area(er1) + 1e-9
    if er1:
        gx, gy = np.meshgrid(np.linspace(xmin, xmax, 25), np.linspace(ymin, ymax, 25))
        e_er = geom.rings_to_edges(er1)
        e_p = geom.rings_to_edges([p])
        m_er = geom.points_in_rings(gx.ravel(), gy.ravel(), e_er)
        m_p = geom.points_in_rings(gx.ravel(), gy.ravel(), e_p)
        assert not (m_er & ~m_p).any()


@settings(max_examples=25, deadline=None)
@given(p=star_polygon())
def test_make_valid_winding_covers_even_odd(p):
    """For any ring, the winding repair's region contains the even-odd
    repair's region (winding fills multiply-wound overlaps, never carves)."""
    out_w = geom.make_valid_rings([p], mode="winding")
    out_eo = geom.make_valid_rings([p], mode="even-odd")
    xmin, ymin, xmax, ymax = geom.rings_bbox([p])
    gx, gy = np.meshgrid(np.linspace(xmin, xmax, 21), np.linspace(ymin, ymax, 21))
    m_w = geom.points_in_rings(gx.ravel(), gy.ravel(), geom.rings_to_edges(out_w))
    m_eo = geom.points_in_rings(gx.ravel(), gy.ravel(), geom.rings_to_edges(out_eo))
    assert not (m_eo & ~m_w).any()
