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

    def test_raster_calc_ops_and_nodata(self, spark):
        a = np.array([[1.0, 2.0], [NODATA, 4.0]])
        b = np.array([[10.0, NODATA], [30.0, 40.0]])
        h, w = a.shape
        rows = [
            dict(raster_id=rid, band=1, nodata=NODATA, tile_x=0, tile_y=0,
                 tile_w=w, tile_h=h, pixels=arr.ravel().tolist())
            for rid, arr in (("A", a), ("B", b))
        ]
        tiles = spark.createDataFrame(pd.DataFrame(rows))
        got = {
            (r.gx, r.gy): r.value
            for r in rasterinfo.raster_calc(
                tiles, a=("A", 1), b=("B", 1), op="add", tile_size=4
            ).collect()
        }
        assert got == {(0, 0): 11.0, (1, 0): None, (0, 1): None, (1, 1): 44.0}
        mx = {
            (r.gx, r.gy): r.value
            for r in rasterinfo.raster_calc(
                tiles, a=("A", 1), b=("B", 1), op="max", tile_size=4
            ).collect()
        }
        assert mx[(0, 0)] == 10.0 and mx[(1, 1)] == 40.0
        with pytest.raises(ValueError):
            rasterinfo.raster_calc(tiles, a=("A", 1), b=("B", 1), op="xor")

    def test_color_relief_rejects_unsorted(self, spark):
        with pytest.raises(ValueError):
            rasterinfo.color_relief(
                _tiles(spark, np.zeros((2, 2))), [(10.0, 0, 0, 0), (0.0, 1, 1, 1)]
            )


class TestTileIndex:
    def test_footprints_from_geotransform(self, spark):
        cat = spark.createDataFrame(
            pd.DataFrame(
                [
                    dict(raster_id="a", band=1, origin_x=-120.0, origin_y=45.0,
                         px_x=0.25, px_y=-0.25, width=128, height=128),
                    dict(raster_id="b", band=2, origin_x=10.0, origin_y=-5.0,
                         px_x=0.5, px_y=-0.5, width=4, height=8),
                ]
            )
        )
        rows = {(r.raster_id, r.band): r for r in rasterinfo.tile_index(cat).collect()}
        a = rows[("a", 1)]
        assert a.location == "a_b1.tif"
        assert (a.ul_x, a.ul_y) == (-120.0, 45.0)
        assert (a.lr_x, a.lr_y) == (-120.0 + 128 * 0.25, 45.0 - 128 * 0.25)
        assert a.min_y == a.lr_y and a.max_y == a.ul_y  # north-up: py < 0
        b = rows[("b", 2)]
        assert (b.ur_x, b.ur_y) == (12.0, -5.0)
        assert (b.min_x, b.min_y, b.max_x, b.max_y) == (10.0, -9.0, 12.0, -5.0)

    def test_zero_shuffle_plan(self, spark):
        cat = spark.createDataFrame(
            pd.DataFrame([dict(raster_id="a", band=1, origin_x=0.0, origin_y=0.0,
                               px_x=1.0, px_y=-1.0, width=2, height=2)])
        )
        plan = rasterinfo.tile_index(cat)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestHistogramMatch:
    def _two(self, spark, a: np.ndarray, b: np.ndarray):
        import pandas as pd

        rows = []
        for rid, arr in (("a", a), ("b", b)):
            rows.append(
                dict(
                    raster_id=rid, band=1, nodata=NODATA,
                    tile_x=0, tile_y=0, tile_w=arr.shape[1], tile_h=arr.shape[0],
                    pixels=arr.ravel().tolist(),
                )
            )
        return spark.createDataFrame(pd.DataFrame(rows))

    def test_identity_and_monotone(self, spark):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 16, (8, 8)).astype(float)
        tiles = self._two(spark, a, a)
        out = rasterinfo.histogram_match(tiles, ("a", 1), ("a", 1), tile_size=8).toPandas()
        # matching a raster to itself is the identity remap
        assert (out.value == out.matched_value).all()
        # remap of a to a different raster is monotone non-decreasing
        b = rng.integers(50, 60, (8, 8)).astype(float)
        out2 = (
            rasterinfo.histogram_match(self._two(spark, a, b), ("a", 1), ("b", 1), tile_size=8)
            .toPandas()
            .sort_values("value")
        )
        assert (np.diff(out2.matched_value.to_numpy()) >= 0).all()
        assert set(out2.matched_value) <= set(np.unique(b))

    def test_planted_quartiles(self, spark):
        # src: 4 values x 16 pixels each; ref: 4 other values x 16 each
        a = np.repeat([0.0, 1.0, 2.0, 3.0], 16).reshape(8, 8)
        b = np.repeat([10.0, 20.0, 30.0, 40.0], 16).reshape(8, 8)
        out = {
            r.value: r.matched_value
            for r in rasterinfo.histogram_match(
                self._two(spark, a, b), ("a", 1), ("b", 1), tile_size=8
            ).collect()
        }
        assert out == {0.0: 10.0, 1.0: 20.0, 2.0: 30.0, 3.0: 40.0}
