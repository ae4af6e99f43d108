"""R7 resample vs a full-raster numpy oracle (engine-defined semantics:
target pixel center -> source index via R1 truncation; OOB -> nodata)."""

import numpy as np

from gdal_common_python_spark.operators.resample import resample_nearest


def test_resample_nearest_matches_oracle(spark, tiles, rasters):
    rp = rasters.toPandas()
    tgt = rp[rp.raster_id == "r3"].iloc[0]
    target = dict(
        origin_x=tgt.origin_x, origin_y=tgt.origin_y, px_x=tgt.px_x, px_y=tgt.px_y,
        width=int(tgt.width), height=int(tgt.height),
    )
    out = resample_nearest(spark, tiles, "r0", 1, target).toPandas()

    src = rp[(rp.raster_id == "r0") & (rp.band == 1)].iloc[0]
    tp = tiles.filter("raster_id='r0' AND band=1").toPandas()
    full = np.zeros((int(src.height), int(src.width)))
    for _, t in tp.iterrows():
        full[t.tile_y * 32 : t.tile_y * 32 + t.tile_h, t.tile_x * 32 : t.tile_x * 32 + t.tile_w] = (
            np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        )
    cx = tgt.origin_x + (np.arange(int(tgt.width)) + 0.5) * tgt.px_x
    cy = tgt.origin_y + (np.arange(int(tgt.height)) + 0.5) * tgt.px_y
    sx = np.trunc((cx - src.origin_x) / src.px_x).astype(int)
    sy = np.trunc((cy - src.origin_y) / src.px_y).astype(int)
    exp = np.full((int(tgt.height), int(tgt.width)), -9999.0)
    okx = (sx >= 0) & (sx < int(src.width))
    oky = (sy >= 0) & (sy < int(src.height))
    exp[np.ix_(np.where(oky)[0], np.where(okx)[0])] = full[np.ix_(sy[oky], sx[okx])]

    got = np.full_like(exp, np.nan)
    for _, t in out.iterrows():
        got[t.tile_y * 32 : t.tile_y * 32 + t.tile_h, t.tile_x * 32 : t.tile_x * 32 + t.tile_w] = (
            np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        )
    assert (got == exp).all()


def test_resample_identity_grid(spark, tiles, rasters):
    """Resampling onto the SAME grid reproduces the raster exactly."""
    rp = rasters.toPandas()
    src = rp[(rp.raster_id == "r0") & (rp.band == 1)].iloc[0]
    target = dict(
        origin_x=src.origin_x, origin_y=src.origin_y, px_x=src.px_x, px_y=src.px_y,
        width=int(src.width), height=int(src.height),
    )
    out = resample_nearest(spark, tiles, "r0", 1, target).toPandas()
    tp = tiles.filter("raster_id='r0' AND band=1").toPandas()
    orig = {(int(t.tile_x), int(t.tile_y)): np.asarray(t.pixels) for _, t in tp.iterrows()}
    assert len(out) == len(orig)
    for _, t in out.iterrows():
        np.testing.assert_array_equal(np.asarray(t.pixels), orig[(int(t.tile_x), int(t.tile_y))])


def _full_raster(tiles, rid, band=1):
    tp = tiles.filter(f"raster_id='{rid}' AND band={band}").toPandas()
    m = tp.iloc[0]
    full = np.zeros((int(m.height), int(m.width)))
    for _, t in tp.iterrows():
        full[t.tile_y * 32 : t.tile_y * 32 + t.tile_h, t.tile_x * 32 : t.tile_x * 32 + t.tile_w] = (
            np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        )
    return full, m


def _assemble_out(out, W, H):
    got = np.full((H, W), np.nan)
    for _, t in out.iterrows():
        got[t.tile_y * 32 : t.tile_y * 32 + t.tile_h, t.tile_x * 32 : t.tile_x * 32 + t.tile_w] = (
            np.asarray(t.pixels).reshape(t.tile_h, t.tile_w)
        )
    return got


def test_resample_bilinear_matches_oracle(spark, tiles, rasters):
    from gdal_common_python_spark.operators.resample import resample

    rp = rasters.toPandas()
    tgt = rp[rp.raster_id == "r3"].iloc[0]
    target = dict(
        origin_x=tgt.origin_x, origin_y=tgt.origin_y, px_x=tgt.px_x, px_y=tgt.px_y,
        width=int(tgt.width), height=int(tgt.height),
    )
    out = resample(spark, tiles, "r0", 1, target, method="bilinear").toPandas()
    got = _assemble_out(out, int(tgt.width), int(tgt.height))
    full, src = _full_raster(tiles, "r0")
    ND = -9999.0
    H, W = int(tgt.height), int(tgt.width)
    exp = np.full((H, W), ND)
    for r in range(H):
        for c in range(W):
            cx = tgt.origin_x + (c + 0.5) * tgt.px_x
            cy = tgt.origin_y + (r + 0.5) * tgt.px_y
            gx = (cx - src.origin_x) / src.px_x - 0.5
            gy = (cy - src.origin_y) / src.px_y - 0.5
            x0, y0 = int(np.floor(gx)), int(np.floor(gy))
            wx, wy = gx - x0, gy - y0
            num = den = 0.0
            for dy, wyv in ((0, 1 - wy), (1, wy)):
                for dx, wxv in ((0, 1 - wx), (1, wx)):
                    jx, jy = x0 + dx, y0 + dy
                    if 0 <= jx < int(src.width) and 0 <= jy < int(src.height):
                        v = full[jy, jx]
                        if v != ND:
                            num += v * wxv * wyv
                            den += wxv * wyv
            if den > 0:
                exp[r, c] = num / den
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_resample_average_downsample(spark, tiles, rasters):
    from gdal_common_python_spark.operators.resample import resample

    rp = rasters.toPandas()
    src = rp[(rp.raster_id == "r0") & (rp.band == 1)].iloc[0]
    # 4x downsample of r0 onto its own origin: each target pixel covers a
    # 4x4 source block exactly -> average equals the block mean over valid
    target = dict(
        origin_x=src.origin_x, origin_y=src.origin_y,
        px_x=src.px_x * 4, px_y=src.px_y * 4,
        width=int(src.width) // 4, height=int(src.height) // 4,
    )
    out = resample(spark, tiles, "r0", 1, target, method="average").toPandas()
    got = _assemble_out(out, target["width"], target["height"])
    full, _ = _full_raster(tiles, "r0")
    ND = -9999.0
    exp = np.full((target["height"], target["width"]), ND)
    for r in range(target["height"]):
        for c in range(target["width"]):
            block = full[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
            vals = block[block != ND]
            if len(vals):
                exp[r, c] = vals.mean()
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_resample_cubic_matches_oracle(spark, tiles, rasters):
    from gdal_common_python_spark.operators.resample import resample

    rp = rasters.toPandas()
    tgt = rp[rp.raster_id == "r3"].iloc[0]
    target = dict(
        origin_x=tgt.origin_x, origin_y=tgt.origin_y, px_x=tgt.px_x, px_y=tgt.px_y,
        width=int(tgt.width), height=int(tgt.height),
    )
    out = resample(spark, tiles, "r0", 1, target, method="cubic").toPandas()
    got = _assemble_out(out, int(tgt.width), int(tgt.height))
    full, src = _full_raster(tiles, "r0")
    ND = -9999.0
    a = -0.5

    def cw(t, k):
        d = abs(k - t)
        if d <= 1.0:
            return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
        if d < 2.0:
            return a * (((d - 5.0) * d + 8.0) * d - 4.0)
        return 0.0

    H, W = int(tgt.height), int(tgt.width)
    exp = np.full((H, W), ND)
    for r in range(H):
        for c in range(W):
            cx = tgt.origin_x + (c + 0.5) * tgt.px_x
            cy = tgt.origin_y + (r + 0.5) * tgt.px_y
            gx = (cx - src.origin_x) / src.px_x - 0.5
            gy = (cy - src.origin_y) / src.px_y - 0.5
            x0, y0 = int(np.floor(gx)), int(np.floor(gy))
            tx, ty = gx - x0, gy - y0
            num = den = 0.0
            for dy in (-1, 0, 1, 2):
                for dx in (-1, 0, 1, 2):
                    jx, jy = x0 + dx, y0 + dy
                    if 0 <= jx < int(src.width) and 0 <= jy < int(src.height):
                        v = full[jy, jx]
                        if v != ND:
                            w = cw(tx, dx) * cw(ty, dy)
                            num += v * w
                            den += w
            if den > 1e-9:
                exp[r, c] = num / den
    np.testing.assert_allclose(got, exp, rtol=1e-9, atol=1e-9)


def test_resample_cubic_upsample_tile_edges(spark, tiles, rasters):
    """4x upsample: the cubic stencil's +2 tap crosses candidate-tile
    boundaries — the pad=2 window must supply every in-raster tap, so the
    result equals the full-raster oracle at every tile-edge pixel."""
    from gdal_common_python_spark.operators.resample import resample

    full, src = _full_raster(tiles, "r0")
    ND = -9999.0
    target = dict(
        origin_x=float(src.origin_x), origin_y=float(src.origin_y),
        px_x=float(src.px_x) / 4.0, px_y=float(src.px_y) / 4.0,
        width=int(src.width) * 4, height=int(src.height) * 4,
    )
    out = resample(spark, tiles, "r0", 1, target, method="cubic").toPandas()
    got = _assemble_out(out, target["width"], target["height"])
    a = -0.5

    def cw(t, k):
        d = abs(k - t)
        if d <= 1.0:
            return ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
        if d < 2.0:
            return a * (((d - 5.0) * d + 8.0) * d - 4.0)
        return 0.0

    # spot-check a band of rows crossing the first tile boundary (gx ~ 32)
    for r in range(126, 132):
        for c in range(120, 136):
            cx = target["origin_x"] + (c + 0.5) * target["px_x"]
            cy = target["origin_y"] + (r + 0.5) * target["px_y"]
            gx = (cx - src.origin_x) / src.px_x - 0.5
            gy = (cy - src.origin_y) / src.px_y - 0.5
            x0, y0 = int(np.floor(gx)), int(np.floor(gy))
            tx, ty = gx - x0, gy - y0
            num = den = 0.0
            for dy in (-1, 0, 1, 2):
                for dx in (-1, 0, 1, 2):
                    jx, jy = x0 + dx, y0 + dy
                    if 0 <= jx < int(src.width) and 0 <= jy < int(src.height):
                        v = full[jy, jx]
                        if v != ND:
                            w = cw(tx, dx) * cw(ty, dy)
                            num += v * w
                            den += w
            want = num / den if den > 1e-9 else ND
            assert abs(got[r, c] - want) <= 1e-9 + 1e-9 * abs(want), (r, c)
