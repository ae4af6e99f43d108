"""Mosaic / overlay-reduce (R8, lib/gdal_merge.py via lib/mosaic.py:6-40).

Reference semantics (lib/gdal_merge.py:54-106): inputs are copied into the
output IN ORDER, each overwriting what is already there EXCEPT where the
incoming pixel equals nodata (Numeric.choose keeps the destination there) —
i.e. per pixel: the value of the LAST input (by rank) whose pixel != nodata,
else nodata.

Engine: a rank-ordered overlay reduce per tile. For same-grid inputs this is
a single groupBy((tile_x, tile_y)) with the fold done vectorized in numpy on
the stacked pixel arrays — order carried by the explicit ``input_rank``
column (SURVEY §2.6 R8: input order matters). Different-grid inputs need an
R7 resample to a common grid first (out of scope here; the reference's own
reprojection path is broken, lib/reproject.py:87,103 — SURVEY §2.6 R7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_SCHEMA = T.StructType(
    [
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("tile_h", T.IntegerType()),
        T.StructField("pixels", T.ArrayType(T.DoubleType())),
    ]
)


def mosaic(tiles: DataFrame, raster_ids: list[str] | None = None, band: int = 1) -> DataFrame:
    """Overlay-reduce the given rasters (must share one grid) into one
    mosaic tile table: (tile_x, tile_y, tile_w, tile_h, pixels)."""
    t = tiles.filter(F.col("band") == band)
    if raster_ids is not None:
        t = t.filter(F.col("raster_id").isin(raster_ids))

    grids = t.select("origin_x", "origin_y", "px_x", "px_y").distinct().count()
    if grids != 1:
        raise ValueError("mosaic requires inputs on a shared grid (resample first)")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("input_rank")
        nodata = float(pdf["nodata"].iloc[0])
        out = None
        for row in pdf.itertuples(index=False):
            px = np.asarray(row.pixels, dtype=np.float64)
            if out is None:
                out = np.full_like(px, nodata)
            out = np.where(px != nodata, px, out)
        first = pdf.iloc[0]
        return pd.DataFrame(
            [
                dict(
                    tile_x=int(first.tile_x),
                    tile_y=int(first.tile_y),
                    tile_w=int(first.tile_w),
                    tile_h=int(first.tile_h),
                    pixels=out.tolist(),
                )
            ]
        )

    return (
        t.select("tile_x", "tile_y", "tile_w", "tile_h", "input_rank", "nodata", "pixels")
        .groupBy("tile_x", "tile_y")
        .applyInPandas(fold, _SCHEMA)
    )
