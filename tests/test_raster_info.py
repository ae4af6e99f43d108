"""raster_info (gdalinfo -stats analog) — numpy cross-check + plan shape."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def info(spark, sf_dir):
    from gdal_common_python_spark.operators import rasterinfo

    tiles = spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))
    return tiles, rasterinfo.raster_info(tiles)


def test_matches_numpy(spark, info):
    tiles, out = info
    got = {(r.raster_id, r.band): r for r in out.collect()}
    vals = {}
    for r in tiles.collect():
        p = np.asarray(r.pixels, dtype=np.float64)
        vals.setdefault((r.raster_id, r.band), []).append(p[p != r.nodata])
    assert set(got) == set(vals)
    for k, chunks in vals.items():
        v = np.concatenate(chunks)
        g = got[k]
        assert g.n_valid == len(v)
        assert g.vmin == v.min() and g.vmax == v.max()
        assert g.mean == pytest.approx(v.mean(), rel=1e-12)
        assert g.stdev == pytest.approx(v.std(), rel=1e-9)


def test_exchange_carries_tile_rows_not_pixels(spark, info):
    _, out = info
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # no explode/generate before the exchange: the tile fold is a HOF
    assert "Generate" not in plan


class TestTileStats:
    def test_matches_numpy_per_tile(self, spark, info):
        from gdal_common_python_spark.operators import rasterinfo

        tiles, _ = info
        got = {
            (r.raster_id, r.band, r.tile_x, r.tile_y): r
            for r in rasterinfo.tile_stats(tiles).collect()
        }
        for t in tiles.collect():
            p = np.asarray(t.pixels, dtype=np.float64)
            v = p[p != t.nodata]
            g = got[(t.raster_id, t.band, t.tile_x, t.tile_y)]
            assert g.n_valid == len(v)
            if len(v):
                assert g.vmin == v.min() and g.vmax == v.max()
            else:
                assert g.vmin is None and g.vmax is None

    def test_plan_exchange_and_python_free(self, spark, info):
        from gdal_common_python_spark.operators import rasterinfo

        tiles, _ = info
        plan = rasterinfo.tile_stats(tiles)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Python" not in plan


def test_raster_minmax_tie_rules(spark):
    import numpy as np
    from gdal_common_python_spark.operators.rasterinfo import raster_minmax
    from tests.test_warp_average import _tile_df

    arr = np.full((64, 64), 5.0)
    arr[2, 3] = 1.0   # min, first occurrence
    arr[40, 50] = 1.0  # min, later occurrence — must NOT be reported
    arr[10, 10] = 9.0  # max, first occurrence — must NOT be reported
    arr[60, 7] = 9.0   # max, last occurrence
    arr[0, 0] = -1.0   # nodata
    out = raster_minmax(_tile_df(spark, arr)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.vmin, r.min_gx, r.min_gy) == (1.0, 3, 2)
    assert (r.vmax, r.max_gx, r.max_gy) == (9.0, 7, 60)
    assert r.n_valid == 64 * 64 - 1
