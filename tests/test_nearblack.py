"""nearblack: python-reference parity, degenerate inputs, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators.nearblack import nearblack_pixels


def _tiles_df(spark, arr, tile_size=4, raster_id="t", nodata=-1.0):
    """Cut a small numpy raster into a tile table (same layout as synth)."""
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile_size):
        for tx in range(0, w, tile_size):
            blk = arr[ty : ty + tile_size, tx : tx + tile_size]
            rows.append(
                (
                    raster_id, 1, float(nodata), tx // tile_size, ty // tile_size,
                    int(blk.shape[1]), int(blk.shape[0]),
                    [float(v) for v in blk.ravel()],
                )
            )
    return spark.createDataFrame(
        rows,
        "raster_id string, band int, nodata double, tile_x int, tile_y int,"
        " tile_w int, tile_h int, pixels array<double>",
    )


def _ref_collar(arr, black, near):
    """Row/column edge scans over the full array — the spec, undistributed."""
    nb = np.abs(arr - black) <= near
    h, w = arr.shape
    flags = np.zeros((h, w, 4), dtype=bool)
    for y in range(h):
        for x in range(w):
            if not nb[y, x]:
                break
            flags[y, x, 0] = True
        for x in range(w - 1, -1, -1):
            if not nb[y, x]:
                break
            flags[y, x, 1] = True
    for x in range(w):
        for y in range(h):
            if not nb[y, x]:
                break
            flags[y, x, 2] = True
        for y in range(h - 1, -1, -1):
            if not nb[y, x]:
                break
            flags[y, x, 3] = True
    return flags


@pytest.mark.parametrize("seed", [0, 7])
def test_matches_python_reference(spark, seed):
    rng = np.random.default_rng(seed)
    # values 0..9; black=0, near=2.5 -> ~30% of pixels are "near"
    arr = rng.integers(0, 10, size=(13, 11)).astype(float)
    got = {
        (r.gx, r.gy): (r.v, r.from_left, r.from_right, r.from_top, r.from_bottom)
        for r in nearblack_pixels(
            _tiles_df(spark, arr), black=0.0, near=2.5, tile_size=4
        ).collect()
    }
    flags = _ref_collar(arr, 0.0, 2.5)
    want = {
        (x, y): (arr[y, x], *(int(b) for b in flags[y, x]))
        for y in range(13)
        for x in range(11)
        if flags[y, x].any()
    }
    assert got == want


def test_all_near_and_none_near(spark):
    # uniform zeros: every pixel is collar from all four edges
    zeros = np.zeros((8, 8))
    out = nearblack_pixels(_tiles_df(spark, zeros), black=0.0, near=0.0, tile_size=4)
    rows = out.collect()
    assert len(rows) == 64
    assert all(
        (r.from_left, r.from_right, r.from_top, r.from_bottom) == (1, 1, 1, 1)
        for r in rows
    )
    # nothing near: empty collar
    ones = np.full((8, 8), 9.0)
    assert (
        nearblack_pixels(
            _tiles_df(spark, ones), black=0.0, near=0.5, tile_size=4
        ).count()
        == 0
    )


def test_collar_crosses_tile_boundary(spark):
    # a full first tile-row of near pixels must chain into the next tile:
    # row 0 near for x in [0, 6), blocker at x=6
    arr = np.full((4, 8), 9.0)
    arr[0, :6] = 0.0
    out = nearblack_pixels(_tiles_df(spark, arr, tile_size=4), black=0.0, near=0.5, tile_size=4)
    left = {(r.gx, r.gy) for r in out.collect() if r.from_left}
    assert left == {(x, 0) for x in range(6)}


def test_pixels_never_shuffle(spark):
    arr = np.zeros((8, 8))
    out = nearblack_pixels(_tiles_df(spark, arr), black=0.0, near=0.0, tile_size=4)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the pixel-side explode feeds broadcast joins only; every Exchange in
    # the plan belongs to the tiny scanline-summary merge
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Generate" in plan
