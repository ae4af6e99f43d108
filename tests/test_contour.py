"""Marching-squares contours (gdal_contour analog): the tiled halo-exchange
extraction must equal a scalar reference on the untiled raster (same case
table semantics, independent implementation), with cross-tile cells, nodata
holes, saddle resolution, and multi-level output."""

import numpy as np
import pandas as pd

from gdal_common_python_spark.operators import contour

NODATA = -9999.0


def _tile_df(spark, arr: np.ndarray, tile: int):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            th, tw = min(tile, h - ty), min(tile, w - tx)
            rows.append(
                dict(
                    raster_id="t", band=1, nodata=NODATA,
                    tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                    pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def _edge_pt(edge, lv, j, i, v00, v01, v10, v11):
    if edge == 0:
        return j + (lv - v00) / (v01 - v00), float(i)
    if edge == 1:
        return float(j + 1), i + (lv - v01) / (v11 - v01)
    if edge == 2:
        return j + (lv - v10) / (v11 - v10), float(i + 1)
    return float(j), i + (lv - v00) / (v10 - v00)


def _reference(arr, levels):
    """Scalar marching squares with the module's case table (independently
    walked per cell, not vectorized)."""
    h, w = arr.shape
    out = set()
    for lv in levels:
        for i in range(h - 1):
            for j in range(w - 1):
                win = arr[i : i + 2, j : j + 2]
                if (win == NODATA).any():
                    continue
                v00, v01, v10, v11 = arr[i, j], arr[i, j + 1], arr[i + 1, j], arr[i + 1, j + 1]
                cs = (
                    (v00 >= lv) + 2 * (v01 >= lv) + 4 * (v11 >= lv) + 8 * (v10 >= lv)
                )
                if cs in (5, 10):
                    hi = (v00 + v01 + v10 + v11) / 4.0 >= lv
                    segs = (contour.SADDLE_HI if hi else contour.SADDLE_LO)[cs]
                else:
                    segs = contour.CASES[cs]
                for k, (ea, eb) in enumerate(segs):
                    x1, y1 = _edge_pt(ea, lv, j, i, v00, v01, v10, v11)
                    x2, y2 = _edge_pt(eb, lv, j, i, v00, v01, v10, v11)
                    out.add((lv, j, i, k, x1, y1, x2, y2))
    return out


class TestContour:
    def test_matches_untiled_reference(self, spark):
        rng = np.random.default_rng(51)
        arr = rng.integers(0, 100, size=(21, 29)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.06] = NODATA
        levels = [25.0, 50.5, 75.0]
        got = {
            (r.level, r.gx, r.gy, r.seg, r.x1, r.y1, r.x2, r.y2)
            for r in contour.contour_segments(
                _tile_df(spark, arr, tile=8), levels=levels, tile_size=8
            ).collect()
        }
        assert got == _reference(arr, levels)

    def test_peak_closed_diamond(self, spark):
        arr = np.zeros((8, 8))
        arr[3, 3] = 10.0
        rows = contour.contour_segments(
            _tile_df(spark, arr, tile=4), levels=[5.0], tile_size=4
        ).collect()
        # one isolated above-pixel -> 4 cells each contribute one segment,
        # forming a closed diamond with vertices at the half-crossings
        assert len(rows) == 4
        pts = set()
        for r in rows:
            pts.add((r.x1, r.y1))
            pts.add((r.x2, r.y2))
        assert pts == {(2.5, 3.0), (3.0, 2.5), (3.5, 3.0), (3.0, 3.5)}
        # segments chain: every vertex appears in exactly 2 segments
        from collections import Counter

        deg = Counter()
        for r in rows:
            deg[(r.x1, r.y1)] += 1
            deg[(r.x2, r.y2)] += 1
        assert set(deg.values()) == {2}

    def test_lines_stitching(self, spark):
        arr = np.zeros((8, 16))
        arr[3, 3] = 10.0   # one peak in the west tile
        arr[3, 12] = 10.0  # one peak in the east tile
        rows = contour.contour_lines(
            _tile_df(spark, arr, tile=8), levels=[5.0], tile_size=8
        ).collect()
        assert len(rows) == 8  # two closed diamonds
        by_line = {}
        for r in rows:
            by_line.setdefault(r.line_id, []).append(r)
        assert len(by_line) == 2  # two connected components
        for segs in by_line.values():
            assert len(segs) == 4
            # the line id is the min member id (stable canonical pick)
            assert min(
                f"{r.raster_id}:{r.band}:0:{r.gy:07d}:{r.gx:07d}:{r.seg}" for r in segs
            ) == segs[0].line_id

    def test_saddle_resolution(self, spark):
        # tl/br high, tr/bl low: center avg 5.5 >= 5 -> SADDLE_HI connection
        arr = np.array([[10.0, 1.0], [1.0, 10.0]])
        rows = contour.contour_segments(
            _tile_df(spark, arr, tile=2), levels=[5.0], tile_size=2
        ).collect()
        assert sorted((r.seg, round(r.x1, 3), round(r.y1, 3)) for r in rows) == [
            (0, 0.556, 0.0),  # T-R pair
            (1, 0.444, 1.0),  # B-L pair
        ]
