"""fillnodata — invariants + oracle parity on the synth tile table."""

import os

import pytest


@pytest.fixture(scope="module")
def filled(spark, sf_dir):
    from gdal_common_python_spark.operators import fillnodata

    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    out = fillnodata.fillnodata_pixels(tiles, maxdist=4.0).collect()
    return tiles, out


def test_only_holes_filled_and_in_cap(spark, filled):
    tiles, out = filled
    # collect the source nodata pixel set
    import numpy as np

    holes = set()
    vals = []
    for r in tiles.collect():
        p = np.asarray(r.pixels).reshape(r.tile_h, r.tile_w)
        for (y, x) in zip(*np.nonzero(p == r.nodata)):
            holes.add((r.raster_id, r.band, r.tile_x * 32 + int(x), r.tile_y * 32 + int(y)))
        vals.append(p[p != r.nodata])
    lo = min(v.min() for v in vals if v.size)
    hi = max(v.max() for v in vals if v.size)
    assert len(out) > 0
    for r in out:
        assert (r.raster_id, r.band, r.gx, r.gy) in holes
        assert 1 <= r.dist2 <= 16
        assert lo <= r.value <= hi
        assert r.n_donors >= 1


def test_oracle_parity(spark, filled):
    import duckdb

    from gdal_common_python_spark.operators import fillnodata

    tiles, out = filled
    con = duckdb.connect()
    con.register("rt", tiles.toPandas())
    o = sorted(
        tuple(r) for r in con.sql(fillnodata.fillnodata_oracle_sql("rt", 4.0)).fetchall()
    )
    assert sorted(tuple(r) for r in out) == o


def test_bad_maxdist(spark, filled):
    from gdal_common_python_spark.operators import fillnodata

    tiles, _ = filled
    with pytest.raises(ValueError, match="maxdist"):
        fillnodata.fillnodata_pixels(tiles, maxdist=0)
