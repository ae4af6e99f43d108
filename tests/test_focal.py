"""Focal statistics with halo exchange: the distributed (tiled) result must
equal a single-array numpy reference on the untiled raster — borders,
partial edge tiles, nodata holes and radius=2 strips included. The driver
gate (focal_mean) additionally hash-pins the sf0.01 result vs a DuckDB
neighbor-join oracle.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators import focal

NODATA = -9999.0


def _reference(arr: np.ndarray, radius: int):
    """Whole-array focal mean, nodata-aware (the spec)."""
    h, w = arr.shape
    f_sum = np.full((h, w), NODATA)
    f_cnt = np.zeros((h, w), dtype=np.int64)
    f_mean = np.full((h, w), NODATA)
    for i in range(h):
        for j in range(w):
            if arr[i, j] == NODATA:
                continue
            win = arr[
                max(0, i - radius) : i + radius + 1, max(0, j - radius) : j + radius + 1
            ]
            vals = win[win != NODATA]
            f_sum[i, j] = vals.sum()
            f_cnt[i, j] = len(vals)
            f_mean[i, j] = vals.sum() / len(vals)
    return f_sum, f_cnt, f_mean


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


class TestFocal:
    @pytest.mark.parametrize("radius", [1, 2])
    def test_matches_untiled_reference(self, spark, radius):
        rng = np.random.default_rng(31)
        arr = rng.integers(0, 256, size=(23, 37)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.1] = NODATA
        tiles = _tile_df(spark, arr, tile=8)  # partial tiles on both edges
        out = focal.focal_mean_pixels(tiles, radius=radius, tile_size=8).collect()
        f_sum, f_cnt, f_mean = _reference(arr, radius)
        got = {(r.gx, r.gy): (r.f_sum, r.f_count, r.f_mean) for r in out}
        want = {
            (j, i): (f_sum[i, j], int(f_cnt[i, j]), f_mean[i, j])
            for i in range(arr.shape[0])
            for j in range(arr.shape[1])
            if arr[i, j] != NODATA
        }
        assert got == want  # exact, including the float mean (integer sums)

    def test_nodata_center_stays_nodata_in_tiles(self, spark):
        arr = np.array([[1.0, NODATA], [3.0, 4.0]])
        tiles = _tile_df(spark, arr, tile=2)
        row = focal.focal_mean_tiles(tiles, radius=1).collect()[0]
        px = np.array(row.f_mean).reshape(2, 2)
        assert px[0, 1] == NODATA
        assert px[0, 0] == (1 + 3 + 4) / 3

    def test_invalid_radius(self, spark):
        arr = np.ones((2, 2))
        with pytest.raises(ValueError):
            focal.focal_mean_tiles(_tile_df(spark, arr, 2), radius=0)


class TestReclassify:
    def test_searchsorted_semantics(self, spark):
        from gdal_common_python_spark.operators.focal import reclassify_tiles

        arr = np.array([[10.0, 85.0], [169.9, 170.0]])
        tiles = _tile_df(spark, arr, tile=2)
        r = reclassify_tiles(tiles, breaks=[85.0, 170.0]).collect()[0]
        # class = count of breaks <= v; boundary values belong to the class ABOVE
        assert r.pixels == [0.0, 1.0, 1.0, 2.0]
        assert r.nodata == -1.0

    def test_nodata_maps_to_nodata_class(self, spark):
        from gdal_common_python_spark.operators.focal import reclassify_tiles

        arr = np.array([[NODATA, 200.0]])
        r = reclassify_tiles(_tile_df(spark, arr, 2), breaks=[100.0]).collect()[0]
        assert r.pixels == [-1.0, 1.0]

    def test_composes_with_polygonize(self, spark):
        """Classified grid -> polygonize: contiguous same-class regions."""
        from gdal_common_python_spark.operators import polygonize
        from gdal_common_python_spark.operators.focal import reclassify_tiles

        arr = np.array(
            [[10.0, 20.0, 200.0, 210.0]] * 2, dtype=np.float64
        )  # left half class 0, right half class 1
        cls = reclassify_tiles(_tile_df(spark, arr, tile=2), breaks=[100.0])
        out = polygonize.polygonize_regions(spark, cls, tile_size=2).collect()
        got = {(r.value, r.n_pixels) for r in out}
        assert got == {(0.0, 4), (1.0, 4)}

    def test_unsorted_breaks_raise(self, spark):
        from gdal_common_python_spark.operators.focal import reclassify_tiles

        with pytest.raises(ValueError):
            reclassify_tiles(_tile_df(spark, np.ones((1, 1)), 1), breaks=[5.0, 1.0])
