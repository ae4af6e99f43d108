"""Capped Euclidean proximity (gdal_proximity -maxdist analog): the tiled
halo-exchange transform must equal a brute-force lookup on the untiled
raster — including the Euclidean-vs-Chebyshev cap distinction with a
non-integer maxdist, nodata target exclusion, and cross-tile targets."""

import numpy as np
import pandas as pd
import pytest

from gdal_common_python_spark.operators import proximity

NODATA = -9999.0


def _tile_df(spark, arr: np.ndarray, tile: int):
    h, w = arr.shape
    rows = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            th, tw = min(tile, h - ty), min(tile, w - tx)
            rows.append(
                dict(
                    raster_id="t", band=1, nodata=NODATA,
                    tile_x=tx // tile, tile_y=ty // tile, tile_w=tw, tile_h=th,
                    pixels=arr[ty : ty + th, tx : tx + tw].ravel().tolist(),
                )
            )
    return spark.createDataFrame(pd.DataFrame(rows))


def _reference(arr: np.ndarray, values, maxdist):
    h, w = arr.shape
    tgt = np.isin(arr, values) & (arr != NODATA)
    ty, tx = np.nonzero(tgt)
    out = {}
    for i in range(h):
        for j in range(w):
            if len(ty) == 0:
                continue
            d2 = ((ty - i) ** 2 + (tx - j) ** 2).min()
            if d2 <= maxdist * maxdist:
                out[(j, i)] = int(d2)
    return out


class TestProximity:
    def test_matches_untiled_reference(self, spark):
        rng = np.random.default_rng(50)
        arr = rng.integers(0, 40, size=(22, 30)).astype(np.float64)
        arr[rng.random(arr.shape) < 0.05] = NODATA
        values = [0.0, 1.0]
        # non-integer cap: Chebyshev window 4 but Euclidean cap 3.5^2=12.25
        got = {
            (r.gx, r.gy): r.dist2
            for r in proximity.proximity_pixels(
                _tile_df(spark, arr, tile=8), values=values, maxdist=3.5, tile_size=8
            ).collect()
        }
        assert got == _reference(arr, values, 3.5)

    def test_cross_tile_and_sqrt(self, spark):
        arr = np.full((16, 16), 5.0)
        arr[0, 0] = 9.0  # single target in the NW tile corner
        tiles = _tile_df(spark, arr, tile=8)
        # maxdist == tile_size: the widest halo the exchange supports
        rows = proximity.proximity_pixels(tiles, values=[9.0], maxdist=8.0, tile_size=8).collect()
        got = {(r.gx, r.gy): (r.dist2, r.dist) for r in rows}
        assert got[(0, 0)] == (0, 0.0)
        # pixel (8, 0) lives in the NE tile: the target is 8 cols away cross-tile
        assert got[(8, 0)] == (64, 8.0)
        assert got[(4, 4)] == (32, float(np.sqrt(32.0)))
        assert all(d2 <= 64 for d2, _ in got.values())
        assert (8, 4) not in got  # d2=80 beyond the cap
        assert (12, 12) not in got

    def test_nodata_never_a_target(self, spark):
        arr = np.full((8, 8), 1.0)
        arr[4, 4] = NODATA
        tiles = _tile_df(spark, arr, tile=8)
        rows = proximity.proximity_pixels(tiles, values=[NODATA], maxdist=4.0, tile_size=8).collect()
        assert rows == []

    def test_rejects_nonpositive_cap(self, spark):
        arr = np.zeros((4, 4))
        with pytest.raises(ValueError):
            proximity.proximity_pixels(_tile_df(spark, arr, tile=4), values=[0.0], maxdist=0.0)


def test_allocation_matches_proximity_support(spark, tiles):
    from gdal_common_python_spark.operators import proximity as P

    vals, maxd = [250.0, 251.0, 252.0, 253.0, 254.0, 255.0], 4.0
    prox = P.proximity_pixels(tiles, values=vals, maxdist=maxd).toPandas()
    alloc = P.allocation_pixels(tiles, values=vals, maxdist=maxd).toPandas()
    key = ["raster_id", "band", "gx", "gy"]
    a = alloc.set_index(key).sort_index()
    p = prox.set_index(key).sort_index()
    # identical pixel support and identical distances
    assert a.index.equals(p.index)
    assert (a.dist2.values == p.dist2.values).all()
    # allocation values come from the target class set
    assert set(a.alloc.unique()) <= set(vals)
    # target pixels claim themselves (d2 == 0 -> alloc == own value)
    zero = a[a.dist2 == 0]
    assert len(zero) > 0
