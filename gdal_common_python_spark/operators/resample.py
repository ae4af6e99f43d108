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
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
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
    """Resample one (raster_id, band) onto `target` grid
    (origin_x, origin_y, px_x, px_y, width, height) -> target tile table."""
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
    # world extent of each target tile -> source pixel index range (pad 1)
    x0 = t_ox + F.col("t_tx") * tile_size * t_px
    x1 = t_ox + F.least((F.col("t_tx") + 1) * tile_size, F.lit(t_w)) * t_px
    y0 = t_oy + F.col("t_ty") * tile_size * t_py
    y1 = t_oy + F.least((F.col("t_ty") + 1) * tile_size, F.lit(t_h)) * t_py
    sx0 = F.floor((F.least(x0, x1) - F.lit(s_ox)) / F.lit(s_px)) - 1
    sx1 = F.floor((F.greatest(x0, x1) - F.lit(s_ox)) / F.lit(s_px)) + 1
    # north-up grids: larger y -> smaller row index
    sy0 = F.floor((F.greatest(y0, y1) - F.lit(s_oy)) / F.lit(s_py)) - 1
    sy1 = F.floor((F.least(y0, y1) - F.lit(s_oy)) / F.lit(s_py)) + 1
    ts = F.lit(tile_size)
    tgrid = (
        tgrid.withColumn("stx0", F.greatest(sx0 / ts, F.lit(0)).cast("int"))
        .withColumn("stx1", F.least(sx1 / ts, F.lit((s_w - 1) // tile_size)).cast("int"))
        .withColumn("sty0", F.greatest(sy0 / ts, F.lit(0)).cast("int"))
        .withColumn("sty1", F.least(sy1 / ts, F.lit((s_h - 1) // tile_size)).cast("int"))
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

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
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

    return cand.groupBy("t_tx", "t_ty").applyInPandas(kernel, _SCHEMA)
