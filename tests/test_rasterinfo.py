"""Histogram + color relief: exact bucket counts and piecewise-linear ramp
behavior (clamping, midpoint interpolation, floor(x+0.5) rounding)."""

import numpy as np
import pandas as pd
import pytest

from gdal_common_python_spark.operators import rasterinfo

NODATA = -9999.0


def _tiles(spark, arr: np.ndarray, tile=4):
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


class TestRasterInfo:
    def test_histogram_counts(self, spark):
        rng = np.random.default_rng(53)
        arr = rng.integers(0, 100, size=(8, 8)).astype(np.float64)
        arr[0, 0] = NODATA
        got = {
            r.bucket: r.n
            for r in rasterinfo.raster_histogram(
                _tiles(spark, arr), lo=0.0, hi=100.0, n_buckets=10, tile_size=4
            ).collect()
        }
        vals = arr[arr != NODATA]
        expect = {
            b: int(((vals >= b * 10) & (vals < (b + 1) * 10)).sum()) for b in range(10)
        }
        assert got == {b: n for b, n in expect.items() if n}

    def test_color_relief_clamp_and_interp(self, spark):
        ramp = [(0.0, 0, 0, 0), (100.0, 200, 100, 50)]
        arr = np.array([[-5.0, 0.0, 50.0, 150.0]])
        rows = {
            r.gx: (r.r, r.g, r.b)
            for r in rasterinfo.color_relief(_tiles(spark, arr), ramp, tile_size=4).collect()
        }
        assert rows[0] == (0, 0, 0)       # below first entry: clamp
        assert rows[1] == (0, 0, 0)       # exactly first entry
        assert rows[2] == (100, 50, 25)   # midpoint interpolation
        assert rows[3] == (200, 100, 50)  # above last entry: clamp

    def test_color_relief_rejects_unsorted(self, spark):
        with pytest.raises(ValueError):
            rasterinfo.color_relief(
                _tiles(spark, np.zeros((2, 2))), [(10.0, 0, 0, 0), (0.0, 1, 1, 1)]
            )
