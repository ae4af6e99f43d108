"""translate_window (gdal_translate analog) — subset, rescale, plan shape."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiles(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "raster_tiles.parquet"))


def to_grid(df, w, h):
    g = np.full((h, w), np.nan)
    for r in df.collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        g[r.tile_y * 32 : r.tile_y * 32 + r.tile_h, r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
    assert not np.isnan(g).any()
    return g


def src_grid(tiles, rid="r0", band=1):
    g = np.full((128, 128), np.nan)
    for r in tiles.filter(f"raster_id='{rid}' AND band={band}").collect():
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        g[r.tile_y * 32 : r.tile_y * 32 + r.tile_h, r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
    return g


def test_subset_matches_source(spark, tiles):
    from gdal_common_python_spark.operators import translate

    out = translate.translate_window(tiles, "r0", 1, (20, 12, 80, 60))
    got = to_grid(out, 80, 60)
    assert np.array_equal(got, src_grid(tiles)[12:72, 20:100])


def test_unaligned_offsets_and_partial_tiles(spark, tiles):
    from gdal_common_python_spark.operators import translate

    out = translate.translate_window(tiles, "r0", 1, (7, 33, 50, 41))
    got = to_grid(out, 50, 41)
    assert np.array_equal(got, src_grid(tiles)[33:74, 7:57])


def test_rescale_with_nodata_passthrough(spark, tiles):
    from gdal_common_python_spark.operators import translate

    out = translate.translate_window(
        tiles, "r0", 1, (0, 0, 64, 64), scale=(0.0, 255.0, 0.0, 100.0)
    )
    got = to_grid(out, 64, 64)
    src = src_grid(tiles)[0:64, 0:64]
    nod = src == -9999.0
    assert np.array_equal(got[nod], src[nod])  # nodata untouched
    k = 100.0 / 255.0
    exp = np.minimum(np.maximum((src[~nod] - 0.0) * k + 0.0, 0.0), 100.0)
    assert np.array_equal(got[~nod], exp)


def test_no_python_in_plan(spark, tiles):
    from gdal_common_python_spark.operators import translate

    plan = (
        translate.translate_window(tiles, "r0", 1, (20, 12, 80, 60))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_retile_pixel_preserving(spark, tiles):
    from gdal_common_python_spark.operators import translate

    out = translate.retile(tiles, "r0", 1, out_tile_size=48)
    rows = out.collect()
    assert len(rows) == 3 * 3  # ceil(128/48)^2
    # edge tiles truncated to 128 - 2*48 = 32
    dims = {(r.tile_x, r.tile_y): (r.tile_w, r.tile_h) for r in rows}
    assert dims[(0, 0)] == (48, 48) and dims[(2, 2)] == (32, 32)
    got = np.full((128, 128), np.nan)
    for r in rows:
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        got[r.tile_y * 48 : r.tile_y * 48 + r.tile_h,
            r.tile_x * 48 : r.tile_x * 48 + r.tile_w] = p
    assert np.array_equal(got, src_grid(tiles))


def test_retile_finer_than_source(spark, tiles):
    from gdal_common_python_spark.operators import translate

    out = translate.retile(tiles, "r0", 1, out_tile_size=10).collect()
    assert len(out) == 13 * 13
    got = np.full((128, 128), np.nan)
    for r in out:
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        got[r.tile_y * 10 : r.tile_y * 10 + r.tile_h,
            r.tile_x * 10 : r.tile_x * 10 + r.tile_w] = p
    assert np.array_equal(got, src_grid(tiles))
    with pytest.raises(ValueError, match="no tiles"):
        translate.retile(tiles, "absent", 1, out_tile_size=10)


def test_validation(spark, tiles):
    from gdal_common_python_spark.operators import translate

    with pytest.raises(ValueError, match="srcwin"):
        translate.translate_window(tiles, "r0", 1, (0, 0, 0, 10))
    with pytest.raises(ValueError, match="src_min"):
        translate.translate_window(tiles, "r0", 1, (0, 0, 8, 8), scale=(5, 5, 0, 1))
