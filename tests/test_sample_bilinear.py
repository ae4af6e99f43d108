"""sample_raster_bilinear vs numpy brute force + edge/nodata semantics."""

import numpy as np
import pytest

from gdal_common_python_spark.operators.sample import sample_raster_bilinear
from tests.test_warp_average import _tile_df


def _points_df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "point_id long, x double, y double",
    )


def _np_bilinear(arr, x, y, nodata=-1.0):
    # grid: origin (0,0), px (1,-1) — world y negative going down
    fx, fy = x - 0.5, -y - 0.5
    x0, y0 = int(np.floor(fx)), int(np.floor(fy))
    wx, wy = fx - x0, fy - y0
    q = arr[y0:y0 + 2, x0:x0 + 2]
    if (q == nodata).any():
        return None
    return float(
        (1 - wy) * ((1 - wx) * q[0, 0] + wx * q[0, 1])
        + wy * ((1 - wx) * q[1, 0] + wx * q[1, 1])
    )


def test_matches_numpy(spark):
    rng = np.random.default_rng(9)
    src = rng.integers(0, 50, (64, 64)).astype(np.float64)
    src[10, 10] = -1.0
    tiles = _tile_df(spark, src)
    pts = [(5.3, -7.8), (31.9, -32.1), (10.4, -10.6), (0.7, -0.9), (62.5, -62.5)]
    out = {r.point_id: r.value
           for r in sample_raster_bilinear(_points_df(spark, pts), tiles).collect()}
    for i, (x, y) in enumerate(pts):
        want = _np_bilinear(src, x, y)
        if want is None:
            assert out[i] is None, i
        else:
            assert out[i] == pytest.approx(want, rel=1e-12), i


def test_edge_points_excluded(spark):
    src = np.ones((64, 64))
    tiles = _tile_df(spark, src)
    # x=0.2 -> fx=-0.3 -> x0=-1 (outside); x=63.8 -> x0=63, x0+1=64 (outside)
    out = sample_raster_bilinear(_points_df(spark, [(0.2, -5.0), (63.8, -5.0)]), tiles)
    assert out.count() == 0
