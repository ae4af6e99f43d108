"""Raster warp (gdalwarp analog) — identity, round-trip, oracle parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_common_python_spark.kernels import proj
from gdal_common_python_spark.operators import warp

R0 = dict(origin_x=-120.0, origin_y=45.0, px_x=0.25, px_y=-0.25, width=128, height=128)
T3857 = dict(
    origin_x=-13400000.0, origin_y=5650000.0, px_x=28000.0, px_y=-32000.0,
    width=128, height=128,
)


@pytest.fixture(scope="module")
def tiles(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))


def grid_of(df, t):
    """Collect a warped tile table into one (H, W) array."""
    g = np.full((t["height"], t["width"]), np.nan)
    for r in df.collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        g[
            r.tile_y * 32 : r.tile_y * 32 + r.tile_h,
            r.tile_x * 32 : r.tile_x * 32 + r.tile_w,
        ] = p
    assert not np.isnan(g).any()
    return g


def test_identity_warp_reproduces_source(spark, tiles):
    out = warp.warp_raster(spark, tiles, "r0", 1, R0, dst_srid=4326, src_srid=4326)
    got = grid_of(out, R0)
    src = np.full((128, 128), np.nan)
    for r in tiles.filter("raster_id='r0' AND band=1").collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        src[r.tile_y * 32 : r.tile_y * 32 + r.tile_h, r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
    assert np.array_equal(got, src)


def test_unsupported_pair_raises(spark, tiles):
    with pytest.raises(ValueError, match="closed-form"):
        warp.warp_raster(spark, tiles, "r0", 1, T3857, dst_srid=3310)


def test_round_trip_merc(spark, tiles):
    """r0 -> 3857 -> back to r0's grid: values agree wherever the forward
    warp kept the pixel in range (nearest-neighbour round trip is not
    identity, but on a finer-than-source target most cells survive)."""
    fwd = warp.warp_raster(spark, tiles, "r0", 1, T3857, dst_srid=3857)
    # dress the forward result as a source tile table in 3857
    mid = (
        fwd.withColumn("raster_id", F.lit("w"))
        .withColumn("band", F.lit(1))
        .withColumn("nodata", F.lit(-9999.0))
        .withColumn("origin_x", F.lit(T3857["origin_x"]))
        .withColumn("origin_y", F.lit(T3857["origin_y"]))
        .withColumn("px_x", F.lit(T3857["px_x"]))
        .withColumn("px_y", F.lit(T3857["px_y"]))
        .withColumn("width", F.lit(T3857["width"]))
        .withColumn("height", F.lit(T3857["height"]))
    )
    back = warp.warp_raster(
        spark, mid, "w", 1, R0, dst_srid=4326, src_srid=3857, tile_size=32
    )
    got = grid_of(back, R0)
    src = np.full((128, 128), np.nan)
    for r in tiles.filter("raster_id='r0' AND band=1").collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        src[r.tile_y * 32 : r.tile_y * 32 + r.tile_h, r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
    live = got != -9999.0
    assert live.mean() > 0.5
    assert (got[live] == src[live]).mean() > 0.9


def test_oracle_parity(spark, tiles):
    import duckdb

    out = warp.warp_raster(spark, tiles, "r0", 1, T3857, dst_srid=3857)
    ex = out.select(
        "tile_x", "tile_y", F.posexplode("pixels").alias("idx0", "value")
    ).select("tile_x", "tile_y", (F.col("idx0") + 1).alias("idx"), "value")
    rows = sorted(tuple(r) for r in ex.collect())
    con = duckdb.connect()
    con.register("rt", tiles.toPandas())
    o = sorted(
        tuple(r)
        for r in con.sql(warp.warp_oracle_sql("rt", "r0", 1, T3857, 3857)).fetchall()
    )
    assert rows == o
