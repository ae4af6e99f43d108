"""Raster resample / grid reprojection (R7, lib/reproject.py:51-127).

The reference's raster reprojection is broken in two places
(reproj_top_right reuses the origin at lib/reproject.py:87; None-assignment
at lib/reproject.py:103-105 — SURVEY §2.6), so exact parity is impossible
and the engine defines the semantics (pinned by our fixtures):

- nearest-neighbour: each TARGET pixel center maps into the source grid via
  the R1 pixel-coordinate rule (int truncation toward zero,
  rasters.py:113-116); out-of-bounds targets get the source nodata.

Distributed plan: enumerate target tiles natively, compute each target
tile's source-pixel window arithmetically, explode to overlapped SOURCE tile
coords, equi-join the source tile table, and assemble + sample per target
tile in one grouped Arrow kernel — the same join-by-construction pruning as
zonal (only overlapping source tiles are ever read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def source_tile_window(
    df: DataFrame,
    t_ox: float,
    t_oy: float,
    t_px: float,
    t_py: float,
    t_w: int,
    t_h: int,
    s_ox,
    s_oy,
    s_px,
    s_py,
    s_w,
    s_h,
    tile_size: int,
    pad: int = 1,
) -> DataFrame:
    """Shared columnar source-window arithmetic (single source of truth for
    resample AND mosaic's join-folded merge): given target tile coords
    (t_tx, t_ty) on `df` and a target grid (driver floats) plus a SOURCE
    grid (Columns or literals), add the clamped overlapped source-tile
    range columns stx0/stx1/sty0/sty1. World extent of each target tile ->
    source pixel index range (pad ``pad`` pixels — 1 covers nearest /
    bilinear / average; cubic's 4x4 stencil reaches one pixel further and
    needs 2) -> source tile range; north-up grids: larger y -> smaller
    row index."""
    s_ox, s_oy, s_px, s_py, s_w, s_h = (
        c if isinstance(c, Column) else F.lit(c) for c in (s_ox, s_oy, s_px, s_py, s_w, s_h)
    )
    x0 = F.lit(t_ox) + F.col("t_tx") * tile_size * t_px
    x1 = F.lit(t_ox) + F.least((F.col("t_tx") + 1) * tile_size, F.lit(t_w)) * t_px
    y0 = F.lit(t_oy) + F.col("t_ty") * tile_size * t_py
    y1 = F.lit(t_oy) + F.least((F.col("t_ty") + 1) * tile_size, F.lit(t_h)) * t_py
    sx0 = F.floor((F.least(x0, x1) - s_ox) / s_px) - pad
    sx1 = F.floor((F.greatest(x0, x1) - s_ox) / s_px) + pad
    sy0 = F.floor((F.greatest(y0, y1) - s_oy) / s_py) - pad
    sy1 = F.floor((F.least(y0, y1) - s_oy) / s_py) + pad
    ts = F.lit(tile_size)
    return (
        df.withColumn("stx0", F.greatest(sx0 / ts, F.lit(0)).cast("int"))
        .withColumn("stx1", F.least(sx1 / ts, F.floor((s_w - 1) / ts)).cast("int"))
        .withColumn("sty0", F.greatest(sy0 / ts, F.lit(0)).cast("int"))
        .withColumn("sty1", F.least(sy1 / ts, F.floor((s_h - 1) / ts)).cast("int"))
    )


def resample_nearest(
    spark: SparkSession,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    target: dict,
    tile_size: int = 32,
    clip_to_source: bool = False,
) -> DataFrame:
    """Nearest-neighbour resample (R1 trunc rule) — see :func:`resample`."""
    return resample(
        spark, tiles, raster_id, band, target, tile_size=tile_size,
        clip_to_source=clip_to_source, method="nearest",
    )


def resample(
    spark: SparkSession,
    tiles: DataFrame,
    raster_id: str,
    band: int,
    target: dict,
    tile_size: int = 32,
    clip_to_source: bool = False,
    method: str = "nearest",
) -> DataFrame:
    """Resample one (raster_id, band) onto `target` grid
    (origin_x, origin_y, px_x, px_y, width, height) -> target tile table.

    ``method`` mirrors the reference's GDAL interpolation choice surface
    (lib/reproject.py:110-113 — the reference merely forwards the enum; its
    own grid math is broken, so semantics here are engine-defined and
    fixture-pinned):
    - 'nearest': R1 trunc-toward-zero pixel mapping (bit-stable, the gate
      path and the mosaic_merge composition);
    - 'bilinear': 4-neighbour interpolation at target pixel centers;
      nodata/out-of-bounds neighbours drop out with weight renormalization
      (all invalid -> nodata);
    - 'average': mean of source pixel CENTERS falling inside the target
      pixel's world rectangle, nodata excluded (the downsampling kernel);
      empty -> nodata.
    - 'cubic': 4x4 cubic-convolution (Keys kernel, a = -0.5 — GDAL's
      GRA_Cubic coefficients) at target pixel centers; invalid taps
      (nodata / out-of-bounds) drop out with weight renormalization;
      a non-positive surviving weight sum (possible when only negative
      lobes remain) -> nodata.
    """
    if method not in ("nearest", "bilinear", "average", "cubic"):
        raise ValueError(f"unknown resample method {method!r}")
    src = tiles.filter((F.col("raster_id") == raster_id) & (F.col("band") == band))
    meta = src.select("origin_x", "origin_y", "px_x", "px_y", "width", "height", "nodata").first()
    if meta is None:
        raise ValueError(f"no tiles for {raster_id}/{band}")
    s_ox, s_oy, s_px, s_py = meta.origin_x, meta.origin_y, meta.px_x, meta.px_y
    s_w, s_h, nodata = int(meta.width), int(meta.height), float(meta.nodata)
    t_ox, t_oy = target["origin_x"], target["origin_y"]
    t_px, t_py = target["px_x"], target["px_y"]
    t_w, t_h = int(target["width"]), int(target["height"])

    # native enumeration of target tiles with their source-pixel ranges
    ntx = (t_w + tile_size - 1) // tile_size
    nty = (t_h + tile_size - 1) // tile_size
    tgrid = (
        spark.range(ntx).select(F.col("id").cast("int").alias("t_tx"))
        .crossJoin(spark.range(nty).select(F.col("id").cast("int").alias("t_ty")))
    )
    tgrid = source_tile_window(
        tgrid, t_ox, t_oy, t_px, t_py, t_w, t_h,
        s_ox, s_oy, s_px, s_py, s_w, s_h, tile_size,
        pad=2 if method == "cubic" else 1,
    )
    if clip_to_source:
        # drop target tiles with no source overlap (their clamped ranges
        # invert) — the mosaic path backfills them natively with the fill
        # value instead of paying an all-nodata kernel call per tile
        tgrid = tgrid.filter((F.col("stx0") <= F.col("stx1")) & (F.col("sty0") <= F.col("sty1")))
    tgrid = tgrid.withColumn("stx", F.explode(F.sequence("stx0", "stx1"))).withColumn(
        "sty", F.explode(F.sequence("sty0", "sty1"))
    )
    cand = tgrid.join(
        src.select(
            F.col("tile_x").alias("stx"),
            F.col("tile_y").alias("sty"),
            "tile_w",
            "tile_h",
            "pixels",
        ),
        ["stx", "sty"],
        "left",
    )

    def _assemble(pdf, lox, hix, loy, hiy):
        """Paste joined source tiles into a nodata-initialized patch
        covering global source index box [lox..hix] x [loy..hiy]."""
        pw, ph = hix - lox + 1, hiy - loy + 1
        patch = np.full((ph, pw), nodata)
        for row in pdf.itertuples(index=False):
            if row.pixels is None:
                continue
            gx0 = int(row.stx) * tile_size
            gy0 = int(row.sty) * tile_size
            tp = np.asarray(row.pixels, dtype=np.float64).reshape(int(row.tile_h), int(row.tile_w))
            x0 = max(gx0, lox)
            x1 = min(gx0 + int(row.tile_w) - 1, hix)
            y0 = max(gy0, loy)
            y1 = min(gy0 + int(row.tile_h) - 1, hiy)
            if x1 < x0 or y1 < y0:
                continue
            patch[y0 - loy : y1 - loy + 1, x0 - lox : x1 - lox + 1] = tp[
                y0 - gy0 : y1 - gy0 + 1, x0 - gx0 : x1 - gx0 + 1
            ]
        return patch

    def kernel(key, pdf):
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, t_w - t_tx * tile_size)
        th = min(tile_size, t_h - t_ty * tile_size)
        # target pixel centers (world)
        cols = t_tx * tile_size + np.arange(tw)
        rows = t_ty * tile_size + np.arange(th)
        cx = t_ox + (cols + 0.5) * t_px
        cy = t_oy + (rows + 0.5) * t_py
        # R1 mapping into the source grid (trunc toward zero)
        sx = np.trunc((cx - s_ox) / s_px).astype(np.int64)
        sy = np.trunc((cy - s_oy) / s_py).astype(np.int64)
        out = np.full((th, tw), nodata)
        # assemble the needed source patch from the joined tiles
        for row in pdf.itertuples(index=False):
            if row.pixels is None:
                continue
            gx0 = int(row.stx) * tile_size
            gy0 = int(row.sty) * tile_size
            patch = np.asarray(row.pixels, dtype=np.float64).reshape(int(row.tile_h), int(row.tile_w))
            in_x = (sx >= gx0) & (sx < gx0 + int(row.tile_w))
            in_y = (sy >= gy0) & (sy < gy0 + int(row.tile_h))
            if not in_x.any() or not in_y.any():
                continue
            xi = np.where(in_x)[0]
            yi = np.where(in_y)[0]
            out[np.ix_(yi, xi)] = patch[np.ix_(sy[yi] - gy0, sx[xi] - gx0)]
        oob_x = (sx < 0) | (sx >= s_w)
        oob_y = (sy < 0) | (sy >= s_h)
        out[:, oob_x] = nodata
        out[oob_y, :] = nodata
        return pd.DataFrame(
            [dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, pixels=out.ravel().tolist())]
        )

    def kernel_bilinear(key, pdf):
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, t_w - t_tx * tile_size)
        th = min(tile_size, t_h - t_ty * tile_size)
        cx = t_ox + (t_tx * tile_size + np.arange(tw) + 0.5) * t_px
        cy = t_oy + (t_ty * tile_size + np.arange(th) + 0.5) * t_py
        gx = (cx - s_ox) / s_px - 0.5  # fractional source pixel-center coords
        gy = (cy - s_oy) / s_py - 0.5
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        wx = gx - x0
        wy = gy - y0
        lox = max(int(x0.min()), 0)
        hix = min(int(x0.max()) + 1, s_w - 1)
        loy = max(int(y0.min()), 0)
        hiy = min(int(y0.max()) + 1, s_h - 1)
        if hix < lox or hiy < loy:
            out = np.full((th, tw), nodata)
        else:
            patch = _assemble(pdf, lox, hix, loy, hiy)
            num = np.zeros((th, tw))
            den = np.zeros((th, tw))
            for dy in (0, 1):
                jy = y0 + dy
                wyv = np.where(dy == 1, wy, 1.0 - wy)[:, None]
                iny = (jy >= 0) & (jy < s_h)
                jyc = np.clip(jy - loy, 0, patch.shape[0] - 1)
                for dx in (0, 1):
                    jx = x0 + dx
                    wxv = np.where(dx == 1, wx, 1.0 - wx)[None, :]
                    inx = (jx >= 0) & (jx < s_w)
                    jxc = np.clip(jx - lox, 0, patch.shape[1] - 1)
                    v = patch[np.ix_(jyc, jxc)]
                    valid = iny[:, None] & inx[None, :] & (v != nodata)
                    w = wyv * wxv * valid
                    num += np.where(valid, v, 0.0) * w
                    den += w
            out = np.where(den > 0, num / np.maximum(den, 1e-300), nodata)
        return pd.DataFrame(
            [dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, pixels=out.ravel().tolist())]
        )

    def kernel_average(key, pdf):
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, t_w - t_tx * tile_size)
        th = min(tile_size, t_h - t_ty * tile_size)
        cols = t_tx * tile_size + np.arange(tw)
        rows = t_ty * tile_size + np.arange(th)
        # target pixel world edge intervals -> source center index ranges
        ex = t_ox + np.concatenate([cols, [cols[-1] + 1]]) * t_px
        ey = t_oy + np.concatenate([rows, [rows[-1] + 1]]) * t_py
        gxe = (ex - s_ox) / s_px - 0.5  # fractional center coords of edges
        gye = (ey - s_oy) / s_py - 0.5
        i0 = np.ceil(np.minimum(gxe[:-1], gxe[1:])).astype(np.int64)
        i1 = np.floor(np.maximum(gxe[:-1], gxe[1:]) - 1e-9).astype(np.int64)
        j0 = np.ceil(np.minimum(gye[:-1], gye[1:])).astype(np.int64)
        j1 = np.floor(np.maximum(gye[:-1], gye[1:]) - 1e-9).astype(np.int64)
        i0c = np.clip(i0, 0, s_w)
        i1c = np.clip(i1, -1, s_w - 1)
        j0c = np.clip(j0, 0, s_h)
        j1c = np.clip(j1, -1, s_h - 1)
        lox = int(min(i0c.min(), s_w - 1))
        hix = int(max(i1c.max(), 0))
        loy = int(min(j0c.min(), s_h - 1))
        hiy = int(max(j1c.max(), 0))
        if hix < lox or hiy < loy or i1c.max() < 0 or j1c.max() < 0:
            out = np.full((th, tw), nodata)
        else:
            patch = _assemble(pdf, lox, hix, loy, hiy)
            valid = patch != nodata
            V = np.zeros((patch.shape[0] + 1, patch.shape[1] + 1))
            C = np.zeros_like(V)
            V[1:, 1:] = np.cumsum(np.cumsum(np.where(valid, patch, 0.0), 0), 1)
            C[1:, 1:] = np.cumsum(np.cumsum(valid.astype(np.float64), 0), 1)
            a0 = np.clip(j0c - loy, 0, patch.shape[0])
            a1 = np.clip(j1c - loy + 1, 0, patch.shape[0])
            b0 = np.clip(i0c - lox, 0, patch.shape[1])
            b1 = np.clip(i1c - lox + 1, 0, patch.shape[1])
            s = V[a1][:, b1] - V[a0][:, b1] - V[a1][:, b0] + V[a0][:, b0]
            n = C[a1][:, b1] - C[a0][:, b1] - C[a1][:, b0] + C[a0][:, b0]
            out = np.where(n > 0, s / np.maximum(n, 1.0), nodata)
        return pd.DataFrame(
            [dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, pixels=out.ravel().tolist())]
        )

    def kernel_cubic(key, pdf):
        t_tx, t_ty = int(key[0]), int(key[1])
        tw = min(tile_size, t_w - t_tx * tile_size)
        th = min(tile_size, t_h - t_ty * tile_size)
        cx = t_ox + (t_tx * tile_size + np.arange(tw) + 0.5) * t_px
        cy = t_oy + (t_ty * tile_size + np.arange(th) + 0.5) * t_py
        gx = (cx - s_ox) / s_px - 0.5
        gy = (cy - s_oy) / s_py - 0.5
        x0 = np.floor(gx).astype(np.int64)
        y0 = np.floor(gy).astype(np.int64)
        tx = gx - x0
        ty = gy - y0

        def cweight(t, k):
            # Keys cubic convolution, a = -0.5; tap offset k in {-1,0,1,2}
            a = -0.5
            d = np.abs(k - t)
            near = ((a + 2.0) * d - (a + 3.0)) * d * d + 1.0
            far = a * (((d - 5.0) * d + 8.0) * d - 4.0)
            return np.where(d <= 1.0, near, np.where(d < 2.0, far, 0.0))

        lox = max(int(x0.min()) - 1, 0)
        hix = min(int(x0.max()) + 2, s_w - 1)
        loy = max(int(y0.min()) - 1, 0)
        hiy = min(int(y0.max()) + 2, s_h - 1)
        if hix < lox or hiy < loy:
            out = np.full((th, tw), nodata)
        else:
            patch = _assemble(pdf, lox, hix, loy, hiy)
            num = np.zeros((th, tw))
            den = np.zeros((th, tw))
            for dy in (-1, 0, 1, 2):
                jy = y0 + dy
                wyv = cweight(ty, dy)[:, None]
                iny = (jy >= 0) & (jy < s_h)
                jyc = np.clip(jy - loy, 0, patch.shape[0] - 1)
                for dx in (-1, 0, 1, 2):
                    jx = x0 + dx
                    wxv = cweight(tx, dx)[None, :]
                    inx = (jx >= 0) & (jx < s_w)
                    jxc = np.clip(jx - lox, 0, patch.shape[1] - 1)
                    v = patch[np.ix_(jyc, jxc)]
                    valid = iny[:, None] & inx[None, :] & (v != nodata)
                    w = wyv * wxv * valid
                    num += np.where(valid, v, 0.0) * w
                    den += w
            out = np.where(den > 1e-9, num / np.where(den > 1e-9, den, 1.0), nodata)
        return pd.DataFrame(
            [dict(tile_x=t_tx, tile_y=t_ty, tile_w=tw, tile_h=th, pixels=out.ravel().tolist())]
        )

    kfn = {
        "nearest": kernel,
        "bilinear": kernel_bilinear,
        "average": kernel_average,
        "cubic": kernel_cubic,
    }[method]
    # per-partition batching (halo-family discipline): one Python
    # roundtrip per partition, not per target tile; _assemble writes
    # disjoint patch regions per source tile, so candidate order cannot
    # change the assembled patch or the taps computed from it
    from .focal import grouped_tile_apply

    return grouped_tile_apply(cand, kfn, _SCHEMA, keys=("t_tx", "t_ty"))
