"""Terrain (gdaldem-analog) operators: the tiled halo-exchange Horn
gradients must equal a single-array numpy reference on the untiled raster,
and the derived hillshade/slope/aspect must behave physically (flat raster,
known ramps, light direction). The driver gate (hillshade) additionally
hash-pins the sf0.01 result vs a DuckDB neighbor-join oracle.
"""

import math

import numpy as np
import pandas as pd
import pytest

from gdal_common_python_spark.operators import terrain

NODATA = -9999.0


def _tile_df(spark, arr: np.ndarray, tile: int, px=0.5):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            th, tw = min(tile, h - ty), min(tile, w - tx)
            rows.append(
                dict(
                    raster_id="t", band=1, nodata=NODATA, px_x=px, px_y=-px,
                    tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                    pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def _reference_grad(arr: np.ndarray):
    """Whole-array Horn numerators for pixels with a full valid window."""
    h, w = arr.shape
    out = {}
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            win = arr[i - 1 : i + 2, j - 1 : j + 2]
            if (win == NODATA).any():
                continue
            a, b, c = win[0]
            d, _, f = win[1]
            g, hh, ii = win[2]
            out[(j, i)] = (
                int((c + 2 * f + ii) - (a + 2 * d + g)),
                int((g + 2 * hh + ii) - (a + 2 * b + c)),
            )
    return out


class TestTerrain:
    def test_gradient_matches_untiled_reference(self, spark):
        rng = np.random.default_rng(47)
        arr = rng.integers(0, 256, size=(23, 37)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.1] = NODATA
        tiles = _tile_df(spark, arr, tile=8)
        got = {
            (r.gx, r.gy): (r.gx_num, r.gy_num)
            for r in terrain.horn_gradient_pixels(tiles, tile_size=8).collect()
        }
        assert got == _reference_grad(arr)

    def test_flat_raster(self, spark):
        arr = np.full((10, 10), 42.0)
        tiles = _tile_df(spark, arr, tile=4)
        rows = terrain.hillshade_pixels(tiles, tile_size=4).collect()
        assert len(rows) == 8 * 8  # border pixels skipped (gdaldem default)
        expect = math.floor(255.0 * math.sin(math.radians(45.0)))
        for r in rows:
            assert (r.gx_num, r.gy_num) == (0, 0)
            assert r.hillshade == expect
            assert r.slope_class == 0
            assert r.aspect_octant == -1

    def test_ramp_aspect_and_light(self, spark):
        # z rises to the WEST -> steepest descent faces EAST (octant 2)
        arr = np.tile(np.arange(12, 0, -1, dtype=np.float64) * 10, (12, 1))
        tiles = _tile_df(spark, arr, tile=6)
        east = terrain.hillshade_pixels(tiles, azimuth_deg=90.0, tile_size=6).collect()
        assert {r.aspect_octant for r in east} == {2}
        assert {r.slope_class for r in east} == {4}  # 10/(0.5 px) rise: steep
        west = terrain.hillshade_pixels(tiles, azimuth_deg=270.0, tile_size=6).collect()
        bright = sum(r.hillshade for r in east) / len(east)
        dark = sum(r.hillshade for r in west) / len(west)
        assert bright > dark  # lit from the facing side

    def test_slope_percent(self, spark):
        # flat raster: slope 0 everywhere
        flat = _tile_df(spark, np.full((8, 8), 7.0), tile=4)
        rows = terrain.slope_pixels(flat, tile_size=4).collect()
        assert rows and all(r.slope_pct == 0.0 for r in rows)
        # uniform west-rising ramp (step 10 per 0.5-unit pixel): dz/dx = -20,
        # dz/dy = 0 -> slope = 100 * 20 = 2000%
        arr = np.tile(np.arange(12, 0, -1, dtype=np.float64) * 10, (12, 1))
        tiles = _tile_df(spark, arr, tile=6)
        rows = terrain.slope_pixels(tiles, tile_size=6).collect()
        assert rows and all(r.slope_pct == 2000.0 for r in rows)
        # z_factor scales linearly
        half = terrain.slope_pixels(tiles, z_factor=0.5, tile_size=6).collect()
        assert all(r.slope_pct == 1000.0 for r in half)

    def test_north_ramp_octant(self, spark):
        # z rises to the SOUTH (y down) -> descent faces NORTH (octant 0)
        arr = np.tile(np.arange(0, 12, dtype=np.float64)[:, None] * 10, (1, 12))
        tiles = _tile_df(spark, arr, tile=6)
        rows = terrain.hillshade_pixels(tiles, tile_size=6).collect()
        assert {r.aspect_octant for r in rows} == {0}

    def test_ruggedness_matches_untiled_reference(self, spark):
        rng = np.random.default_rng(48)
        arr = rng.integers(0, 256, size=(21, 33)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.1] = NODATA
        tiles = _tile_df(spark, arr, tile=8)
        got = {
            (r.gx, r.gy): (r.tri_num, r.tpi_num, r.roughness, r.tri, r.tpi)
            for r in terrain.ruggedness_pixels(tiles, tile_size=8).collect()
        }
        expect = {}
        h, w = arr.shape
        for i in range(1, h - 1):
            for j in range(1, w - 1):
                win = arr[i - 1 : i + 2, j - 1 : j + 2]
                if (win == NODATA).any():
                    continue
                c = arr[i, j]
                tri = int(np.abs(win - c).sum())  # center term is 0
                tpi = int(9 * c - win.sum())
                rough = int(win.max() - win.min())
                expect[(j, i)] = (tri, tpi, rough, tri / 8.0, tpi / 8.0)
        assert got == expect

    def test_ruggedness_flat_and_peak(self, spark):
        arr = np.full((8, 8), 7.0)
        arr[3, 3] = 15.0  # single peak
        tiles = _tile_df(spark, arr, tile=4)
        rows = {
            (r.gx, r.gy): r
            for r in terrain.ruggedness_pixels(tiles, tile_size=4).collect()
        }
        peak = rows[(3, 3)]
        assert peak.tri_num == 8 * 8 and peak.tpi_num == 8 * 8 and peak.roughness == 8
        assert peak.tri == 8.0 and peak.tpi == 8.0
        far = rows[(6, 6)]  # window untouched by the peak
        assert (far.tri_num, far.tpi_num, far.roughness) == (0, 0, 0)
        # any window CONTAINING the peak off-center: roughness 8, negative TPI
        side = rows[(4, 3)]
        assert side.roughness == 8 and side.tpi_num == -8

    def test_oracle_sql_lockstep(self):
        sql = terrain.hillshade_oracle_sql("tiles", azimuth_deg=200.0, altitude_deg=30.0)
        lx, ly, lz = terrain.light_vector(200.0, 30.0)
        for lit in (lx, ly, lz):
            assert repr(lit) in sql


def test_aspect_degrees_vs_numpy(spark, tiles):
    import math

    import numpy as np

    from gdal_common_python_spark.operators import terrain as TR

    got = TR.aspect_pixels(tiles).toPandas()
    gpx = TR.horn_gradient_pixels(tiles).toPandas()
    m = got.merge(gpx, on=["raster_id", "band", "gx", "gy"])
    assert len(m) == len(got) > 0
    dzdx = m.gx_num / (8.0 * m.px_x)
    dzdy = -m.gy_num / (8.0 * m.px_y)
    ref = np.degrees(np.arctan2(-dzdx, -dzdy))
    ref = np.where(ref < 0, ref + 360.0, ref)
    flat = (m.gx_num == 0) & (m.gy_num == 0)
    ref = np.where(flat, -1.0, ref)
    assert np.max(np.abs(m.aspect_deg.values - ref)) < 1e-9
    nz = m[~flat]
    assert ((nz.aspect_deg >= 0) & (nz.aspect_deg < 360)).all()
    # octant consistency: continuous aspect falls inside its octant bucket
    hs = TR.hillshade_pixels(tiles).toPandas().merge(
        got, on=["raster_id", "band", "gx", "gy"])
    oc = hs[hs.aspect_octant >= 0]
    centers = oc.aspect_octant * 45.0
    diff = np.abs(((oc.aspect_deg - centers) + 180.0) % 360.0 - 180.0)
    assert (diff <= 22.5 + 1e-9).all()
