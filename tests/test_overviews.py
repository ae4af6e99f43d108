"""overview_level (gdaladdo analog) — semantics + zero-shuffle plan."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def level(spark, sf_dir):
    from gdal_common_python_spark.operators import overviews

    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    return tiles, overviews.overview_level(tiles)


def test_block_average_matches_numpy(spark, level):
    tiles, out = level
    got = {
        (r.raster_id, r.band, r.gx, r.gy): (r.n_valid, r.value)
        for r in out.filter("raster_id='r0'").collect()
    }
    src = np.full((128, 128), np.nan)
    nodata = None
    for r in tiles.filter("raster_id='r0' AND band=1").collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        src[r.tile_y * 32 : r.tile_y * 32 + r.tile_h, r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
        nodata = r.nodata
    for gy in range(0, 64, 7):
        for gx in range(0, 64, 7):
            blk = src[gy * 2 : gy * 2 + 2, gx * 2 : gx * 2 + 2]
            valid = blk[blk != nodata]
            n, v = got[("r0", 1, gx, gy)]
            assert n == len(valid)
            if len(valid):
                assert v == pytest.approx(valid.mean(), abs=1e-6)
            else:
                assert v == nodata


def test_row_count_is_quarter(spark, level):
    tiles, out = level
    n_src = tiles.selectExpr("sum(tile_w * tile_h)").first()[0]
    assert out.count() == n_src // 4


def test_zero_shuffle_zero_python(spark, level):
    _, out = level
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle
    assert "Python" not in plan  # zero UDF
