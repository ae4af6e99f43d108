"""Round-4 guard/degenerate-input fixes (VERDICT #4/#6, ADVICE items).

- parity-mode cross joins need an explicit allow_cross=True opt-in
- unkeyed as-of join warns about the global window
- grid_idw warns when radius exceeds the quantized-weight cutoff
- compare_rasters on disjoint tile keys returns the oracle's zero row
- empty rings: segmentize / explode_collections skip them (both engines)
- translate_window: srcwin past the raster edge nodata-fills ALL outside
  pixels, including fully-outside output tiles
- viewshed: observers past a truncated edge tile are skipped, not IndexError
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------- cross-join guards (VERDICT #4) ----------------------------------


def test_near_table_cross_requires_opt_in(spark, near_points):
    from gdal_common_python_spark.operators.knn import near_table

    with pytest.raises(ValueError, match="allow_cross"):
        near_table(near_points)
    small = near_points.limit(6)
    got = near_table(small, allow_cross=True)
    assert got.count() == 6 * 5  # self-pairs excluded


def test_near_table_geoms_cross_requires_opt_in(spark, zones):
    from gdal_common_python_spark.operators.knn import near_table_geoms

    with pytest.raises(ValueError, match="allow_cross"):
        near_table_geoms(spark, zones)


# ---------- unkeyed as-of warns (VERDICT #6) --------------------------------


def test_asof_unkeyed_warns(spark):
    from gdal_common_python_spark.operators import temporal

    L = spark.createDataFrame([(5,)], "ts long")
    R = spark.createDataFrame([(3, 7)], "ts long, v int")
    with pytest.warns(UserWarning, match="GLOBAL window"):
        out = temporal.asof_join(L, R, on="ts")
    assert out.collect()[0].v == 7


# ---------- grid_idw weight-cutoff warning ----------------------------------


def test_grid_idw_radius_past_cutoff_warns(spark):
    from gdal_common_python_spark.operators import grid

    pts = spark.createDataFrame([(0.5, 0.5, 1.0)], "x double, y double, v double")
    target = {
        "origin_x": 0.0, "origin_y": 4.0, "px_x": 1.0, "px_y": -1.0,
        "width": 4, "height": 4,
    }
    with pytest.warns(UserWarning, match="cutoff"):
        grid.grid_idw(pts, target, radius=100.0)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        grid.grid_idw(pts, target, radius=5.0)  # inside cutoff: silent


# ---------- compare_rasters empty-join zero row -----------------------------


def test_compare_rasters_disjoint_keys_zero_row(spark, tiles):
    from gdal_common_python_spark.operators import rasterinfo

    a = tiles.filter("raster_id='r0' AND band=1 AND tile_x=0 AND tile_y=0")
    b = (
        tiles.filter("raster_id='r0' AND band=1 AND tile_x=0 AND tile_y=0")
        .withColumn("raster_id", F.lit("rB"))
        .withColumn("tile_x", F.lit(99))
    )
    row = rasterinfo.compare_rasters(a.unionByName(b), ("r0", 1), ("rB", 1)).collect()[0]
    assert (row.n_pixels, row.n_diff, row.n_nodata_mismatch) == (0, 0, 0)
    assert row.max_abs_diff == 0.0


# ---------- empty rings ------------------------------------------------------


def test_segmentize_skips_empty_ring(spark):
    from gdal_common_python_spark.operators import segmentize

    ring = [[0.0, 0.0], [3.0, 0.0], [3.0, 3.0]]
    df = spark.createDataFrame(
        [(1, [ring, []])], "zone_id long, rings4326 array<array<array<double>>>"
    )
    rows = segmentize.segmentize(df, 10.0).collect()
    assert {r.ri for r in rows} == {0}
    assert len(rows) == 3  # max_len > every edge: vertices preserved as-is


def test_explode_collections_skips_empty_ring(spark):
    from gdal_common_python_spark.operators import collections as col_ops

    outer = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]]
    df = spark.createDataFrame(
        [(1, [outer, [], outer])], "zone_id long, rings4326 array<array<array<double>>>"
    )
    rows = sorted(col_ops.explode_collections(df).collect(), key=lambda r: r.ri)
    assert [r.ri for r in rows] == [0, 2]  # empty ring dropped, ri preserved
    assert [r.part_idx for r in rows] == [1, 2]
    assert all(r.is_outer for r in rows)


# ---------- translate full window coverage ----------------------------------


def test_translate_srcwin_past_raster_is_nodata_filled(spark):
    from gdal_common_python_spark.operators import translate

    # 40x40 source on a 32-tile grid (truncated edge tiles), values = gy*40+gx
    rows = []
    for ty in range(2):
        for tx in range(2):
            tw = 8 if tx == 1 else 32
            th = 8 if ty == 1 else 32
            px = [
                float((ty * 32 + y) * 40 + (tx * 32 + x))
                for y in range(th)
                for x in range(tw)
            ]
            rows.append(("t", 1, -1.0, tx, ty, tw, th, px))
    tiles = spark.createDataFrame(
        rows,
        "raster_id string, band int, nodata double, tile_x int, tile_y int, "
        "tile_w int, tile_h int, pixels array<double>",
    )
    # window (24, 24, 80, 48): right/bottom reach 104/72, far past the 40x40
    # raster — includes output tiles with zero overlapping source tiles
    out = translate.translate_window(tiles, "t", 1, (24, 24, 80, 48)).collect()
    assert len(out) == 3 * 2  # FULL ceil(80/32) x ceil(48/32) output grid
    got = np.full((48, 80), np.nan)
    for r in out:
        p = np.asarray(r.pixels, dtype=np.float64).reshape(r.tile_h, r.tile_w)
        got[r.tile_y * 32 : r.tile_y * 32 + r.tile_h,
            r.tile_x * 32 : r.tile_x * 32 + r.tile_w] = p
    assert not np.isnan(got).any()
    exp = np.full((48, 80), -1.0)
    src = (np.arange(40)[:, None] * 40 + np.arange(40)[None, :]).astype(np.float64)
    exp[: 40 - 24, : 40 - 24] = src[24:, 24:]
    assert np.array_equal(got, exp)


def test_translate_absent_raster_is_empty(spark, tiles):
    from gdal_common_python_spark.operators import translate

    assert translate.translate_window(tiles, "no_such", 1, (0, 0, 8, 8)).count() == 0


# ---------- viewshed out-of-raster observer ---------------------------------


def test_viewshed_observer_past_truncated_tile_skipped(spark):
    from gdal_common_python_spark.operators import viewshed

    # 40x8 raster: tile (0,0) 32x8 flat, tile (1,0) truncated to 8x8
    def mk(tx, tw):
        return ("v", 1, 0, -9.0, 0.0, 0.0, 1.0, -1.0, 40, 8, tx, 0, tw, 8,
                [10.0] * (tw * 8))

    tiles = spark.createDataFrame(
        [mk(0, 32), mk(1, 8)],
        "raster_id string, band int, input_rank int, nodata double, "
        "origin_x double, origin_y double, px_x double, px_y double, "
        "width int, height int, tile_x int, tile_y int, tile_w int, "
        "tile_h int, pixels array<double>",
    )
    # observer 0 at gx=45 maps to tile (1,0) but lies past its tile_w=8
    # (out of raster); observer 1 is valid
    vis = viewshed.viewshed(tiles, "v", 1, [(45, 2), (36, 2)], maxdist=2).collect()
    ids = {r.obs_id for r in vis}
    assert 0 not in ids and 1 in ids
