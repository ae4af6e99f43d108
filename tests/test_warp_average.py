"""warp_average (gdalwarp -r average analog) vs a numpy brute force.

Identity-SRS 2x downsample: each target pixel must average the source
pixels whose centers fall in it (exact block means for aligned grids),
nodata excluded; empty target pixels emit nodata.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.operators.warp import warp_average


def _tile_df(spark, arr, nodata=-1.0, tile_size=32):
    h, w = arr.shape
    rows = []
    for ty in range((h + tile_size - 1) // tile_size):
        for tx in range((w + tile_size - 1) // tile_size):
            blk = arr[ty * tile_size:(ty + 1) * tile_size, tx * tile_size:(tx + 1) * tile_size]
            rows.append((
                "r", 1, float(nodata), 0.0, 0.0, 1.0, -1.0, w, h,
                tx, ty, blk.shape[1], blk.shape[0], blk.ravel().tolist(),
            ))
    return spark.createDataFrame(rows, (
        "raster_id string, band int, nodata double, origin_x double, origin_y double, "
        "px_x double, px_y double, width int, height int, "
        "tile_x int, tile_y int, tile_w int, tile_h int, pixels array<double>"
    ))


def test_identity_downsample_block_means(spark):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 100, (64, 64)).astype(np.float64)
    src[3, 5] = -1.0  # one nodata pixel
    tiles = _tile_df(spark, src)
    target = dict(origin_x=0.0, origin_y=0.0, px_x=2.0, px_y=-2.0, width=32, height=32)
    out = warp_average(spark, tiles, "r", 1, target, dst_srid=4326, src_srid=4326)
    got = {}
    ts = 32
    for r in out.collect():
        tw = ts if (r.tile_x + 1) * ts <= 32 else 32 % ts
        oc = r.tile_x * ts + (r.idx - 1) % tw
        orr = r.tile_y * ts + (r.idx - 1) // tw
        got[(oc, orr)] = r.value
    assert len(got) == 32 * 32
    for oc in range(32):
        for orr in range(32):
            blk = src[orr * 2:orr * 2 + 2, oc * 2:oc * 2 + 2].ravel()
            blk = blk[blk != -1.0]
            want = blk.mean() if len(blk) else -1.0
            assert got[(oc, orr)] == pytest.approx(want, abs=1e-6), (oc, orr)


def test_all_nodata_block_emits_nodata(spark):
    src = np.full((64, 64), 7.0)
    src[0:2, 0:2] = -1.0
    tiles = _tile_df(spark, src)
    target = dict(origin_x=0.0, origin_y=0.0, px_x=2.0, px_y=-2.0, width=32, height=32)
    out = warp_average(spark, tiles, "r", 1, target, dst_srid=4326, src_srid=4326)
    r00 = [r.value for r in out.collect() if r.tile_x == 0 and r.tile_y == 0 and r.idx == 1]
    assert r00 == [-1.0]


def test_missing_raster_raises(spark):
    tiles = _tile_df(spark, np.zeros((4, 4)))
    with pytest.raises(ValueError, match="no tiles"):
        warp_average(spark, tiles, "absent", 1,
                     dict(origin_x=0, origin_y=0, px_x=1, px_y=-1, width=4, height=4),
                     dst_srid=4326)
