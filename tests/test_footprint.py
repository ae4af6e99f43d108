"""footprint: exact valid-data summary (count/bbox/boundary/perimeter)."""

import pandas as pd
import pytest

from gdal_common_python_spark.operators.rasterinfo import footprint

ND = -9999.0


def _tile(spark, pixels, tile_x=0, tile_y=0, w=None):
    rows = [dict(
        raster_id="t", band=1, tile_x=tile_x, tile_y=tile_y,
        tile_w=w or len(pixels[0]), tile_h=len(pixels),
        pixels=[float(v) for r in pixels for v in r], nodata=ND,
        origin_x=0.0, origin_y=0.0, px_x=1.0, px_y=-1.0,
    )]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_solid_square(spark):
    # 3x3 solid block inside a 5x5 tile of nodata
    g = [[ND] * 5 for _ in range(5)]
    for y in range(1, 4):
        for x in range(1, 4):
            g[y][x] = 7.0
    out = footprint(_tile(spark, g)).collect()[0]
    assert out.n_valid == 9
    assert (out.min_gx, out.min_gy, out.max_gx, out.max_gy) == (1, 1, 3, 3)
    # 3x3 square: 12 pair adjacencies -> perimeter 4*9 - 2*12 = 12
    assert out.perimeter == 12
    assert out.n_boundary == 8  # all but the center pixel touch the edge


def test_hole_counts_in_perimeter(spark):
    # 4x4 solid with the 2x2 center removed -> outer 16 + inner 8 edges
    g = [[ND] * 6 for _ in range(6)]
    for y in range(1, 5):
        for x in range(1, 5):
            g[y][x] = 1.0
    g[2][2] = g[2][3] = g[3][2] = g[3][3] = ND
    out = footprint(_tile(spark, g)).collect()[0]
    assert out.n_valid == 12
    assert out.perimeter == 16 + 8
    assert out.n_boundary == 12  # the ring: every pixel touches the hole or rim


def test_cross_tile_pairs_count_once(spark):
    # two horizontally adjacent 1x1 tiles, both valid: ONE shared pair
    import pandas as pd

    rows = [
        dict(raster_id="t", band=1, tile_x=tx, tile_y=0, tile_w=1, tile_h=1,
             pixels=[5.0], nodata=ND, origin_x=0.0, origin_y=0.0,
             px_x=1.0, px_y=-1.0)
        for tx in (0, 1)
    ]
    # tile_size=1 so global gx = tile_x
    out = footprint(spark.createDataFrame(pd.DataFrame(rows)), tile_size=1).collect()[0]
    assert out.n_valid == 2
    assert out.perimeter == 4 * 2 - 2 * 1
    assert out.n_boundary == 2


def test_all_nodata_emits_nothing(spark):
    g = [[ND] * 3 for _ in range(3)]
    assert footprint(_tile(spark, g)).count() == 0
