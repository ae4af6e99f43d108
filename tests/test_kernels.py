"""Kernel unit tests against the golden fixtures (FIXTURES.md §5) and
property checks. Spark-free."""

import json
import os

import numpy as np
import pytest

from gdal_common_python_spark.kernels import cells, geom, proj, raster as rk

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(name):
    with open(os.path.join(GOLD, name)) as fh:
        return json.load(fh)


class TestWindowSnap:
    def test_golden(self):
        for row in _load("window_snap.json"):
            got = rk.window_snap(*row["case"])
            exp = row["expect"]
            if exp is None:
                assert got is None, row
            else:
                assert got is not None, row
                np.testing.assert_allclose(np.array(got, float), np.array(exp, float), rtol=1e-12)

    def test_batch_matches_scalar(self):
        rows = _load("window_snap.json")
        for row in rows:
            c = row["case"]
            b = rk.window_snap_batch(np.array([c[:4]]), *c[4:])[0]
            s = rk.window_snap(*c)
            if s is None:
                assert np.isnan(b).all()
            else:
                np.testing.assert_allclose(b, np.array(s, float), rtol=0, atol=0)


class TestPixelCoord:
    def test_golden(self):
        for row in _load("pixel_coord.json"):
            cx, cy, ox, oy, px, py = row["case"]
            ix, iy = rk.pixel_coordinate([cx], [cy], ox, oy, px, py)
            assert [int(ix[0]), int(iy[0])] == row["expect"], row


class TestStats:
    def test_golden(self):
        for row in _load("stats.json"):
            got = rk.stats(np.asarray(row["case"], dtype=np.float64))
            for k, v in row["expect"].items():
                assert got[k] == pytest.approx(v, rel=1e-9), (row["case"], k, got[k], v)

    def test_hash_safe_close_to_reference(self):
        from gdal_common_python_spark.operators.zonal import _stats_values

        v = np.asarray([3.0, 7.0, 7.0, 11.0, 250.0, 0.0], dtype=np.float64)
        a, b = _stats_values(v, True), _stats_values(v, False)
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-9)


class TestRasterize:
    def test_golden_masks(self):
        for row in _load("rasterize.json"):
            rings = [np.asarray(r, float) for r in row["rings"]]
            ox, oy, psx, psy, rx, ry = row["grid"]
            m = rk.rasterize_mask(rings, ox, oy, psx, psy, int(rx), int(ry))
            assert m.tolist() == row["expect"], row["grid"]

    def test_subwindow_equals_full(self):
        rings = [np.array([[0.5, 0.5], [7.5, 0.5], [7.5, 7.5], [0.5, 7.5]], float)]
        full = rk.rasterize_mask(rings, 0.0, 8.0, 1.0, -1.0, 8, 8)
        q = rk.quantize_rings(rings, 0.0, 8.0, 1.0, -1.0)
        e = geom.rings_to_edges(q)
        sub = rk.mask_subwindow(e, 2, 6, 1, 5)
        assert (full[1:5, 2:6].astype(bool) == sub).all()


class TestGeom:
    def test_parse_wkt(self):
        k, r = geom.parse_wkt("POINT(-100.5 37.25)")
        assert k == "point" and r[0][0, 0] == -100.5
        k, r = geom.parse_wkt("POLYGON((0 0, 4 0, 4 4, 0 4), (1 1, 1 2, 2 2, 2 1))")
        assert k == "polygon" and len(r) == 2
        k, r = geom.parse_wkt("MULTIPOLYGON(((0 0, 1 0, 1 1)), ((5 5, 6 5, 6 6)))")
        assert len(r) == 2

    def test_pip_hole(self):
        rings = [
            np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float),
            np.array([[1, 1], [1, 2], [2, 2], [2, 1]], float),
        ]
        e = geom.rings_to_edges(rings)
        got = geom.points_in_rings(
            np.array([0.5, 1.5, 3.5, 5.0]), np.array([0.5, 1.5, 3.5, 5.0]), e
        )
        assert got.tolist() == [True, False, True, False]

    def test_area_perimeter(self):
        rings = [
            np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float),
            np.array([[1, 1], [1, 2], [2, 2], [2, 1]], float),  # CW hole
        ]
        assert geom.polygon_area(rings) == pytest.approx(15.0)
        assert geom.polygon_perimeter(rings) == pytest.approx(16.0 + 4.0)

    def test_intersects_and_distance(self):
        a = [np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)]
        b = [np.array([[1, 1], [3, 1], [3, 3], [1, 3]], float)]
        c = [np.array([[5, 5], [6, 5], [6, 6], [5, 6]], float)]
        d = [np.array([[0.5, 0.5], [0.7, 0.5], [0.7, 0.7], [0.5, 0.7]], float)]
        assert geom.polygon_intersects(a, b)
        assert not geom.polygon_intersects(a, c)
        assert geom.polygon_intersects(a, d)  # containment
        assert geom.geom_distance("polygon", a, "polygon", c) == pytest.approx(np.sqrt(18))
        assert geom.geom_distance("polygon", a, "polygon", b) == 0.0

    def test_clip_convex(self):
        sub = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
        clip = np.array([[2, -1], [6, -1], [6, 5], [2, 5]], float)
        out = geom.clip_convex(sub, clip)
        assert out is not None and geom.signed_area(out) == pytest.approx(8.0)
        # disjoint clip -> None
        assert geom.clip_convex(sub, np.array([[10, 10], [11, 10], [11, 11], [10, 11]], float)) is None

    def test_buffer_point_area(self):
        ring = geom.buffer_point(0.0, 0.0, 2.0, n=256)
        assert geom.signed_area(ring) == pytest.approx(np.pi * 4, rel=1e-3)


class TestCells:
    def test_hierarchy_and_cover(self):
        c = cells.encode([-100.0], [37.0], 9)[0]
        assert cells.parent(np.array([c]), 8)[0] == cells.encode([-100.0], [37.0], 8)[0]
        cov = cells.cover_bbox(-100.2, 36.9, -99.8, 37.3, 9)
        assert c in cov
        d = cells.disk(int(c), 1)
        assert len(d) == 9 and c in d

    def test_ring_min_distance_bound(self):
        c = int(cells.encode([-100.0], [37.0], 9)[0])
        b = cells.ring_min_distance(c, 1, -100.0, 37.0)
        # any point outside the 3x3 disk is at least b away
        res, ix, iy = cells.decode(np.int64(c))
        w = 360.0 / (1 << 9)
        assert 0 < b <= 1.5 * w


class TestProj:
    def test_roundtrips(self):
        lon = np.array([-120.5, -100.0, -81.2])
        lat = np.array([30.5, 37.0, 44.9])
        for fwd, inv in [
            (proj.lonlat_to_mercator, proj.mercator_to_lonlat),
            (proj.lonlat_to_albers_ca, proj.albers_ca_to_lonlat),
        ]:
            x, y = fwd(lon, lat)
            lo, la = inv(x, y)
            np.testing.assert_allclose(lo, lon, atol=1e-7)
            np.testing.assert_allclose(la, lat, atol=1e-7)

    def test_transform_hub(self):
        x, y = proj.transform([-100.0], [37.0], 4326, 3857)
        lo, la = proj.transform(x, y, 3857, 4269)  # NAD83 ~ WGS84 passthrough
        assert lo[0] == pytest.approx(-100.0, abs=1e-9)


class TestDates:
    def test_reference_leap_rule(self):
        gold = _load("dates.json")
        for row in gold["leap"]:
            assert (row["year"] % 4 == 0) == row["leap_ref"]
        table = [0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
        for row in gold["days_in_month"]:
            m, y = row["month"], row["year"]
            d = 0 if (m <= 0 or m > 12) else table[m] + (1 if m == 2 and y % 4 == 0 else 0)
            assert d == row["days"]

    def test_units_digits(self):
        from gdal_common_python_spark.functions import units as U

        # digit-for-digit from fields.py:367-405
        assert U.UNIT_MULTIPLIER[U.LENGTH_FEET] == (False, 3.28084)
        assert U.UNIT_MULTIPLIER[U.LENGTH_NMILE] == (False, 5.39957e-4)
        assert U.UNIT_MULTIPLIER[U.AREA_ACRE] == (True, 2.47105e-4)
        assert U.SRS_UNIT_FACTOR["feet"] == 0.092903


class TestGeneralOverlayKernels:
    """Concave/hole/multipart clip + difference (the G2/G3 general kernels).

    Exactness oracle: (a) shoelace-area invariants that must hold for any
    correct boolean op (area(A∩B) + area(A\\B) = area(A)); (b) a dense grid
    membership cross-check — a point is in the piece collection (even-odd)
    iff it is in A and in B (resp. A and not B) by direct PIP."""

    L_SHAPE = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 1.0], [1.0, 1.0], [1.0, 4.0], [0.0, 4.0]])]
    U_SHAPE = [
        np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 3.0], [4.0, 3.0], [4.0, 1.0],
                  [1.0, 1.0], [1.0, 3.0], [0.0, 3.0]])
    ]
    RECT = [np.array([[0.5, 0.5], [3.5, 0.5], [3.5, 2.5], [0.5, 2.5]])]
    HOLED = [
        np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]),
        np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])[::-1].copy(),  # CW hole
    ]
    MULTI = [
        np.array([[0.0, 0.0], [1.5, 0.0], [1.5, 4.0], [0.0, 4.0]]),
        np.array([[2.5, 0.0], [4.0, 0.0], [4.0, 4.0], [2.5, 4.0]]),
    ]

    def _grid_check(self, a, b, inter, diff):
        xs, ys = np.meshgrid(np.linspace(-0.37, 5.43, 61), np.linspace(-0.41, 4.37, 53))
        px, py = xs.ravel(), ys.ravel()
        in_a = geom.points_in_rings(px, py, geom.rings_to_edges(a))
        in_b = geom.points_in_rings(px, py, geom.rings_to_edges(b))
        in_i = geom.points_in_rings(px, py, geom.rings_to_edges(inter)) if inter else np.zeros_like(in_a)
        in_d = geom.points_in_rings(px, py, geom.rings_to_edges(diff)) if diff else np.zeros_like(in_a)
        assert (in_i == (in_a & in_b)).all()
        assert (in_d == (in_a & ~in_b)).all()

    def _run_case(self, a, b):
        inter = geom.clip_general(a, b)
        diff = geom.difference_general(a, b)
        ai = geom.polygon_area(inter)
        ad = geom.polygon_area(diff)
        assert ai >= -1e-9 and ad >= -1e-9
        assert ai + ad == pytest.approx(geom.polygon_area(a), abs=1e-9)
        self._grid_check(a, b, inter, diff)
        return ai

    def test_triangulate_concave(self):
        tris = geom.triangulate_ring(self.L_SHAPE[0])
        assert sum(geom.signed_area(t) for t in tris) == pytest.approx(7.0)
        assert all(geom.signed_area(t) > 0 for t in tris)

    def test_concave_clip_and_diff(self):
        ai = self._run_case(self.RECT, self.L_SHAPE)  # concave clip side
        assert ai == pytest.approx(3.0 * 0.5 + 0.5 * 1.5)  # strip y:0.5-1 + col x:0.5-1,y:1-2.5
        self._run_case(self.L_SHAPE, self.RECT)  # concave subject side
        self._run_case(self.U_SHAPE, self.L_SHAPE)  # concave both sides

    def test_hole_clip_side(self):
        ai = self._run_case(self.RECT, self.HOLED)
        # rect ∩ (outer \ hole): rect is 3x2 at (0.5,0.5)-(3.5,2.5); hole 2x2 (1,1)-(3,3)
        assert ai == pytest.approx(3.0 * 2.0 - 2.0 * 1.5)

    def test_hole_subject_side(self):
        self._run_case(self.HOLED, self.RECT)
        self._run_case(self.HOLED, self.L_SHAPE)

    def test_multipolygon_both_sides(self):
        self._run_case(self.RECT, self.MULTI)
        self._run_case(self.MULTI, self.RECT)
        self._run_case(self.MULTI, self.HOLED)

    def test_random_convex_pairs_match_convex_kernel(self):
        rng = np.random.default_rng(5)
        for _ in range(25):
            a = [_hull(rng.normal(size=(12, 2)) * 2.0)]
            b = [_hull(rng.normal(size=(12, 2)) * 2.0 + rng.normal(scale=1.0, size=2))]
            res = geom.clip_general(a, b)
            ref = geom.clip_convex(a[0], b[0])
            ref_area = abs(geom.signed_area(ref)) if ref is not None else 0.0
            assert geom.polygon_area(res) == pytest.approx(ref_area, abs=1e-9)
            diff = geom.difference_general(a, b)
            assert geom.polygon_area(res) + geom.polygon_area(diff) == pytest.approx(
                abs(geom.signed_area(a[0])), abs=1e-9
            )

    def test_disjoint_and_contained(self):
        far = [np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]])]
        assert geom.clip_general(self.RECT, far) == []
        d = geom.difference_general(self.RECT, far)
        assert geom.polygon_area(d) == pytest.approx(geom.polygon_area(self.RECT))
        # subject fully inside clip
        small = [np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])]
        big = [np.array([[-1.0, -1.0], [6.0, -1.0], [6.0, 6.0], [-1.0, 6.0]])]
        assert geom.polygon_area(geom.clip_general(small, big)) == pytest.approx(1.0)
        assert geom.difference_general(small, big) == []


def _hull(pts):
    from gdal_common_python_spark.synth import _convex_hull

    return _convex_hull(pts)


class TestUnionPieces:
    R1 = [np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])]
    R2 = [np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])]
    R3 = [np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]])]

    def test_overlap_removed(self):
        u = geom.union_pieces([self.R1, self.R2])
        assert geom.polygon_area(u) == pytest.approx(4.0 + 4.0 - 1.0)

    def test_idempotent_duplicate_member(self):
        u = geom.union_pieces([self.R1, self.R1, self.R2])
        assert geom.polygon_area(u) == pytest.approx(7.0)

    def test_disjoint_sum(self):
        u = geom.union_pieces([self.R1, self.R3])
        assert geom.polygon_area(u) == pytest.approx(5.0)

    def test_grid_membership_equals_any_member(self):
        rng = np.random.default_rng(9)
        members = []
        for _ in range(6):
            c = rng.uniform(0, 4, size=2)
            members.append([_hull(rng.normal(size=(10, 2)) + c)])
        u = geom.union_pieces(members)
        xs, ys = np.meshgrid(np.linspace(-2.13, 6.17, 41), np.linspace(-2.07, 6.11, 37))
        px, py = xs.ravel(), ys.ravel()
        in_u = geom.points_in_rings(px, py, geom.rings_to_edges(u))
        in_any = np.zeros_like(in_u)
        for m in members:
            in_any |= geom.points_in_rings(px, py, geom.rings_to_edges(m))
        assert (in_u == in_any).all()
        # union area <= sum of member areas, >= max member area
        areas = [geom.polygon_area(m) for m in members]
        au = geom.polygon_area(u)
        assert max(areas) - 1e-9 <= au <= sum(areas) + 1e-9

    def test_holed_member(self):
        holed = [
            np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]),
            np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])[::-1].copy(),
        ]
        # R1 (2x2 at origin) fills part of the hole: union area =
        # holed (16-4) + part of R1 inside the hole (1x1 square (1,1)-(2,2))
        u = geom.union_pieces([holed, self.R1])
        assert geom.polygon_area(u) == pytest.approx(12.0 + 1.0)


class TestMakeValidRepair:
    def test_simple_ring_unchanged(self):
        r = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
        out = geom.repair_ring(r)
        assert len(out) == 1 and np.array_equal(out[0], r)

    def test_bowtie_splits_into_two_triangles(self):
        # figure-8: (0,0)->(2,2)->(2,0)->(0,2) crosses itself at (1,1)
        bow = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0]])
        out = geom.repair_ring(bow)
        assert len(out) == 2
        areas = sorted(abs(geom.signed_area(r)) for r in out)
        # each lobe: triangle with base 2 (x=2 resp. x=0 edge) and height 1
        assert areas[0] == pytest.approx(1.0) and areas[1] == pytest.approx(1.0)
        assert all(geom.signed_area(r) > 0 for r in out)  # CCW normalized

    def test_self_touching_quad(self):
        # pentagon-ish ring with one crossing producing unequal lobes
        ring = np.array([[0.0, 0.0], [4.0, 0.0], [1.0, 3.0], [1.0, -1.0], [0.0, 3.0]])
        out = geom.repair_ring(ring)
        assert len(out) >= 2
        # every output ring is simple (no remaining self-intersections)
        for r in out:
            assert not geom.segments_intersect(
                geom.rings_to_edges([r])[:-1], geom.rings_to_edges([r])[1:]
            ) or len(r) == 3

    def test_split_outers_holes_boundary_touching_hole(self):
        # hole whose FIRST vertex lies exactly on the outer boundary must
        # still attach (any-vertex test) — first-vertex-only ray casting
        # silently dropped it
        outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        hole_cw = np.array([[0.0, 5.0], [3.0, 6.0], [3.0, 4.0]])  # CW (negative area)
        assert geom.signed_area(hole_cw) < 0
        parts = geom.split_outers_holes([outer, hole_cw])
        assert len(parts) == 1 and len(parts[0][1]) == 1

    def test_make_valid_rings_mixed(self):
        bow = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0], [0.0, 0.0]])
        simple = np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 6.0]])
        out = geom.make_valid_rings([bow, simple])
        assert len(out) == 3  # two lobes + untouched simple ring

    @staticmethod
    def _pentagram():
        # classic 5-point star drawn as one self-crossing ring (every
        # second vertex of a regular pentagon)
        th = np.pi / 2 + 2 * np.pi * np.arange(5) * 2 / 5
        return np.column_stack([np.cos(th), np.sin(th)])

    def test_make_valid_pentagram_winding_keeps_core(self):
        # OGR MakeValid parity fixture (features.py:204-223 delegates to
        # OGR's nonzero-winding rule): the doubly-wound pentagon core stays
        # FILLED; area = star outline area (lobes + core counted once)
        star = self._pentagram()
        out = geom.make_valid_rings([star])  # default mode="winding"
        e = geom.rings_to_edges(out)
        assert bool(geom.points_in_rings(np.array([0.0]), np.array([0.0]), e)[0])  # core
        assert bool(geom.points_in_rings(np.array([0.0]), np.array([0.9]), e)[0])  # lobe
        # area of the unit-circumradius pentagram {5/2} (lobes + core once)
        assert geom.polygon_area(out) == pytest.approx(1.1225699414495751, abs=1e-9)
        # region measure strictly exceeds the even-odd region (core carved):
        # compare by grid membership — polygon_area on the raw even-odd
        # piece list double-counts the overlap, membership does not
        gx, gy = np.meshgrid(np.linspace(-1, 1, 201), np.linspace(-1, 1, 201))
        n_w = geom.points_in_rings(gx.ravel(), gy.ravel(), e).sum()
        eo = geom.rings_to_edges(geom.make_valid_rings([star], mode="even-odd"))
        n_eo = geom.points_in_rings(gx.ravel(), gy.ravel(), eo).sum()
        assert n_w > n_eo

    def test_make_valid_pentagram_even_odd_carves_core(self):
        star = self._pentagram()
        out = geom.make_valid_rings([star], mode="even-odd")
        e = geom.rings_to_edges(out)
        assert not bool(geom.points_in_rings(np.array([0.0]), np.array([0.0]), e)[0])
        assert bool(geom.points_in_rings(np.array([0.0]), np.array([0.9]), e)[0])

    def test_make_valid_bowtie_mode_invariant(self):
        # disjoint-lobe classes are identical under both rules
        bow = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0]])
        a = geom.make_valid_rings([bow], mode="winding")
        b = geom.make_valid_rings([bow], mode="even-odd")
        assert geom.polygon_area(a) == pytest.approx(geom.polygon_area(b), abs=1e-12)


class TestBufferRings:
    def test_square_buffer_area(self):
        sq = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]
        buf = geom.buffer_rings(sq, 1.0, n=64)
        # A + P*d + pi*d^2, corners approximated by 64-gon arcs
        assert geom.polygon_area(buf) == pytest.approx(16 + 16 + np.pi, rel=2e-3)

    def test_concave_buffer_membership(self):
        L = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 1.0], [1.0, 1.0], [1.0, 4.0], [0.0, 4.0]])]
        buf = geom.buffer_rings(L, 0.5, n=32)
        e = geom.rings_to_edges(buf)
        pts = [
            (2.0, 1.4, True),   # within 0.5 above the inner step
            (2.0, 1.6, False),  # beyond
            (-0.4, 2.0, True),  # left flank
            (3.0, 3.0, False),  # far in the concave notch
            (0.5, 0.5, True),   # interior
        ]
        for x, y, exp in pts:
            got = bool(geom.points_in_rings(np.array([x]), np.array([y]), e)[0])
            assert got == exp, (x, y, got)

    def test_holed_buffer_shrinks_hole(self):
        holed = [
            np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
            np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])[::-1].copy(),
        ]
        buf = geom.buffer_rings(holed, 1.0, n=64)
        # outer grows by P*d + pi d^2; 4x4 hole shrinks to 2x2
        assert geom.polygon_area(buf) == pytest.approx(100 + 40 + np.pi - 4.0, rel=2e-3)
        e = geom.rings_to_edges(buf)
        assert not geom.points_in_rings(np.array([5.0]), np.array([5.0]), e)[0]  # hole center
        assert geom.points_in_rings(np.array([3.5]), np.array([3.5]), e)[0]  # old hole edge

    def test_erosion_square_exact(self):
        # rectangle erosion is exact: the corner n-gons only touch the
        # shrunken core at isolated boundary points
        sq = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])]
        er = geom.buffer_rings(sq, -1.0, n=16)
        assert geom.polygon_area(er) == pytest.approx(4.0, abs=1e-9)
        e = geom.rings_to_edges(er)
        assert geom.points_in_rings(np.array([2.0]), np.array([2.0]), e)[0]
        assert not geom.points_in_rings(np.array([0.5]), np.array([2.0]), e)[0]

    def test_erosion_collapse_empty(self):
        sq = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
        assert geom.buffer_rings(sq, -0.6, n=16) == []

    def test_erosion_grows_holes(self):
        holed = [
            np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),
            np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])[::-1].copy(),
        ]
        er = geom.buffer_rings(holed, -1.0, n=64)
        # outer shrinks to 8x8; 4x4 hole dilates to 4x4 + 16*1 + ~pi*1^2
        assert geom.polygon_area(er) == pytest.approx(64 - 16 - 16 - np.pi, rel=2e-3)
        e = geom.rings_to_edges(er)
        for x, y, exp in [
            (1.5, 5.0, True),   # band between eroded outer and grown hole
            (2.5, 5.0, False),  # inside the grown hole
            (0.5, 5.0, False),  # eroded away at the outer edge
            (5.0, 5.0, False),  # original hole
        ]:
            assert bool(geom.points_in_rings(np.array([x]), np.array([y]), e)[0]) == exp, (x, y)

    def test_erosion_subset_of_original(self):
        L = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 1.0], [1.0, 1.0], [1.0, 4.0], [0.0, 4.0]])]
        er = geom.buffer_rings(L, -0.3, n=16)
        ee, eo = geom.rings_to_edges(er), geom.rings_to_edges(L)
        gx, gy = np.meshgrid(np.linspace(-0.5, 4.5, 41), np.linspace(-0.5, 4.5, 41))
        inside_er = geom.points_in_rings(gx.ravel(), gy.ravel(), ee)
        inside_o = geom.points_in_rings(gx.ravel(), gy.ravel(), eo)
        assert not (inside_er & ~inside_o).any()

    def test_erosion_convex_equals_halfplane_offset(self):
        # classic identity: erosion of a convex ring by d == intersection of
        # the d-inward-offset half-planes (exact even with n-gon vertex
        # disks — every in-band interior point lies in an edge quad)
        th = np.linspace(0.0, 2 * np.pi, 6, endpoint=False)
        hexa = np.column_stack([3 * np.cos(th), 3 * np.sin(th)])
        d = 0.7
        er = geom.buffer_rings([hexa], -d, n=16)
        nxt = np.roll(hexa, -1, axis=0)
        lines = []
        for a, b in zip(hexa, nxt):
            e = b - a
            ln = float(np.hypot(e[0], e[1]))
            nx, ny = -e[1] / ln * d, e[0] / ln * d
            lines.append([a[0] + nx, a[1] + ny, b[0] + nx, b[1] + ny])
        off = geom.clip_halfplanes(hexa, np.asarray(lines))
        assert geom.polygon_area(er) == pytest.approx(abs(geom.signed_area(off)), abs=1e-9)

    def test_buffer_zero_identity(self):
        sq = [np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])]
        out = geom.buffer_rings(sq, 0.0)
        assert len(out) == 1 and np.allclose(out[0], sq[0])
