"""Polygonize: distributed connected-component labeling across tiles must
equal a single-array flood-fill reference — planted multi-tile regions,
nodata holes, and id collisions between (raster, band) planes included.
The driver gate (polygonize) additionally hash-pins sf0.01 vs a DuckDB
recursive-CTE oracle.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import polygonize

NODATA = -9999.0
PID = 1 << 32


def _reference(arr: np.ndarray):
    """Whole-array 4-connected flood fill -> {region_min_pid: (value, n,
    bbox)}."""
    h, w = arr.shape
    seen = np.zeros(arr.shape, dtype=bool)
    out = {}
    for i in range(h):
        for j in range(w):
            if seen[i, j] or arr[i, j] == NODATA:
                continue
            stack, cells = [(i, j)], []
            seen[i, j] = True
            while stack:
                y, x = stack.pop()
                cells.append((y, x))
                for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
                    ny, nx = y + dy, x + dx
                    if (
                        0 <= ny < h and 0 <= nx < w and not seen[ny, nx]
                        and arr[ny, nx] == arr[i, j]
                    ):
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            pid = min(y * PID + x for y, x in cells)
            ys = [c[0] for c in cells]
            xs = [c[1] for c in cells]
            out[pid] = (arr[i, j], len(cells), min(xs), min(ys), max(xs), max(ys))
    return out


def _tile_df(spark, planes: dict, tile: int):
    rows = []
    for (rid, band), arr in planes.items():
        h, w = arr.shape
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                th, tw = min(tile, h - ty), min(tile, w - tx)
                rows.append(
                    dict(
                        raster_id=rid, band=band, nodata=NODATA,
                        tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                        pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                    )
                )
    return spark.createDataFrame(pd.DataFrame(rows))


class TestPolygonize:
    def test_planted_cross_tile_snake(self, spark):
        """A value-7 snake crossing all four tiles must come back as ONE
        region, bbox spanning the full grid."""
        arr = np.arange(64, dtype=np.float64).reshape(8, 8) + 100
        arr[3, :] = 7.0   # horizontal bar through both tile columns
        arr[:, 5] = 7.0   # vertical bar through both tile rows
        out = polygonize.polygonize_regions(spark, _tile_df(spark, {("t", 1): arr}, 4), tile_size=4)
        rows = {r.region: r for r in out.collect()}
        want = _reference(arr)
        got = {
            r.region: (r.value, r.n_pixels, r.min_gx, r.min_gy, r.max_gx, r.max_gy)
            for r in rows.values()
        }
        assert got == want
        snake = rows[5]  # min pixel of the snake: row 0, col 5 (pid 0*2^32+5)
        assert snake.value == 7.0 and snake.n_pixels == 15
        assert (snake.min_gx, snake.min_gy, snake.max_gx, snake.max_gy) == (0, 0, 7, 7)

    def test_random_with_nodata_matches_reference(self, spark):
        rng = np.random.default_rng(17)
        arr = rng.integers(0, 4, size=(13, 21)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.15] = NODATA
        out = polygonize.polygonize_regions(spark, _tile_df(spark, {("t", 1): arr}, 5), tile_size=5)
        got = {
            r.region: (r.value, r.n_pixels, r.min_gx, r.min_gy, r.max_gx, r.max_gy)
            for r in out.collect()
        }
        assert got == _reference(arr)

    def test_planes_do_not_merge(self, spark):
        """Two planes with IDENTICAL pixel layouts (so identical local region
        ids) must stay separate — the plane salt at work."""
        arr = np.full((4, 4), 5.0)
        planes = {("a", 1): arr, ("a", 2): arr.copy()}
        out = polygonize.polygonize_regions(spark, _tile_df(spark, planes, 4), tile_size=4)
        rows = out.collect()
        assert len(rows) == 2
        assert {(r.raster_id, r.band) for r in rows} == {("a", 1), ("a", 2)}
        assert all(r.n_pixels == 16 and r.region == 0 for r in rows)
