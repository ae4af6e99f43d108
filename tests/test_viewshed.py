"""viewshed — LOS semantics on a constructed terrain + invariants."""

import os

import pytest


@pytest.fixture(scope="module")
def flat_with_wall(spark, sf_dir):
    """Use the real r0 tile table but assert semantics via invariants; plus
    a tiny constructed terrain through the same tile-table schema."""
    import pyspark.sql.functions as F

    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    meta = tiles.filter("raster_id='r0' AND band=1").first()
    # one 32x32 tile: flat 10 with a wall of 100 at column 16
    px = []
    for y in range(32):
        for x in range(32):
            px.append(100.0 if x == 16 else 10.0)
    row = [(
        "w", 1, 0, float(meta.nodata), 0.0, 0.0, 1.0, -1.0, 32, 32,
        0, 0, 32, 32, px,
    )]
    wall = spark.createDataFrame(row, tiles.schema.names[:len(row[0])]) \
        if False else spark.createDataFrame(
        row,
        "raster_id string, band int, input_rank int, nodata double, "
        "origin_x double, origin_y double, px_x double, px_y double, "
        "width int, height int, tile_x int, tile_y int, tile_w int, "
        "tile_h int, pixels array<double>",
    )
    return tiles, wall


def test_wall_blocks(spark, flat_with_wall):
    from gdal_common_python_spark.operators import viewshed

    _, wall = flat_with_wall
    vis = {(r.gx, r.gy) for r in viewshed.viewshed(wall, "w", 1, [(8, 16)], maxdist=12).collect()}
    # flat ground toward the wall: everything up to and incl. the wall col
    assert (15, 16) in vis and (16, 16) in vis
    # behind the wall (same row): blocked
    assert (17, 16) not in vis and (20, 16) not in vis
    # away from the wall: open
    assert (2, 16) in vis and (8, 10) in vis


def test_observer_and_neighbors_visible(spark, flat_with_wall):
    from gdal_common_python_spark.operators import viewshed

    _, wall = flat_with_wall
    vis = {(r.gx, r.gy) for r in viewshed.viewshed(wall, "w", 1, [(8, 16)], maxdist=12).collect()}
    assert (8, 16) in vis
    for d in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1)]:
        assert (8 + d[0], 16 + d[1]) in vis


def test_radius_bound_and_determinism(spark, flat_with_wall):
    from gdal_common_python_spark.operators import viewshed

    tiles, _ = flat_with_wall
    obs = [(20, 20), (64, 64)]
    a = viewshed.viewshed(tiles, "r0", 1, obs, maxdist=8).collect()
    for r in a:
        ogx, ogy = obs[r.obs_id]
        assert max(abs(r.gx - ogx), abs(r.gy - ogy)) <= 8
    b = viewshed.viewshed(tiles.repartition(7), "r0", 1, obs, maxdist=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_validation(spark, flat_with_wall):
    from gdal_common_python_spark.operators import viewshed

    tiles, _ = flat_with_wall
    with pytest.raises(ValueError, match="maxdist"):
        viewshed.viewshed(tiles, "r0", 1, [(1, 1)], maxdist=0)
