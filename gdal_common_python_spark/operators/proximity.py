"""gdal_proximity analog: capped-distance Euclidean proximity raster.

No reference analog (reference raster ops stop at zonal/mosaic) — this is
the third consumer of the shared halo-exchange machinery (`focal.py`): for
a distance cap D, any target pixel within Euclidean distance D of a pixel
in tile T lies within the ceil(D)-wide halo band around T, so ONE
halo_exchange(radius=ceil(D)) pass makes the capped distance transform
embarrassingly parallel — shuffle ∝ tile perimeter × D, never the raster.

That cap is the semantic gdal_proximity ships as ``-maxdist`` (pixels
beyond it get no value); an uncapped transform would need cross-raster
sweeps and is out of scope by design.

Hash-exact by construction: distances are minimized as INTEGER squared
pixel offsets (min over int64 is exact), and the reported distance is one
correctly-rounded sqrt of that integer — bit-identical in Spark and DuckDB.

Per-tile kernel: brute-force vectorized (core pixels × targets-in-window)
numpy — O(tile_px · targets) with both factors bounded by tile_size and D.
For dense-target corpora a two-pass Felzenszvalb EDT per padded tile would
cut this to O(tile_px); the brute-force form is kept because windows are
small (tile 32, D ≤ ~8) and it is trivially exact.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .focal import halo_exchange, assemble_padded, grouped_tile_apply

_PROX_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("d2s", T.ArrayType(T.LongType())),
        T.StructField("idxs", T.ArrayType(T.IntegerType())),
    ]
)


def proximity_pixels(
    tiles: DataFrame,
    values: list[float],
    maxdist: float,
    tile_size: int = 32,
) -> DataFrame:
    """Distance to the nearest target pixel (value in `values`, nodata
    excluded) for every pixel within `maxdist` of one ->
    (raster_id, band, gx, gy, dist2, dist). Pixels with no target within
    the cap emit no row (gdal_proximity's -maxdist semantics); target
    pixels themselves report 0. All in-raster pixels participate,
    including nodata pixels (matching gdal_proximity, which computes
    proximity for every cell of the output grid).

    Constraint: ceil(maxdist) <= tile edge (the halo exchange ships strips
    to immediate neighbors only — `focal.halo_exchange` raises past it).
    For a larger cap, re-tile coarser first; at 100 TB the cap is small
    relative to tiles by construction (proximity caps are map-unit-scale,
    tiles are storage-scale)."""
    if maxdist <= 0:
        raise ValueError(f"maxdist must be > 0, got {maxdist}")
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
    vset = [float(v) for v in values]
    halos = halo_exchange(tiles, radius=r)

    def prox(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, r)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _PROX_T.fields])
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        tgt = valid & np.isin(pad, vset)
        ty, tx = np.nonzero(tgt)
        if len(ty) == 0:
            return pd.DataFrame(columns=[f.name for f in _PROX_T.fields])
        # core pixel (row i, col j) sits at padded (i + r, j + r)
        ii, jj = np.mgrid[0:h, 0:w]
        dy = ty[None, :] - (ii.ravel()[:, None] + r)
        dx = tx[None, :] - (jj.ravel()[:, None] + r)
        d2 = (dx * dx + dy * dy).min(axis=1)
        keep = np.flatnonzero(d2 <= cap2)
        if len(keep) == 0:
            return pd.DataFrame(columns=[f.name for f in _PROX_T.fields])
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), int(c.tile_x), int(c.tile_y), w,
                    d2[keep].astype(np.int64).tolist(),
                    keep.astype(np.int32).tolist(),
                )
            ],
            columns=[f.name for f in _PROX_T.fields],
        )

    t = grouped_tile_apply(halos, prox, _PROX_T)
    return t.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.explode(F.arrays_zip("idxs", "d2s")).alias("z"),
    ).select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * tile_size + F.col("z.idxs") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("z.idxs") / F.col("tile_w")).cast("long")).alias("gy"),
        F.col("z.d2s").alias("dist2"),
        F.sqrt(F.col("z.d2s").cast("double")).alias("dist"),
    )


def proximity_oracle_sql(
    tiles_rel: str, values: list[float], maxdist: float, tile_size: int = 32
) -> str:
    """DuckDB oracle for :func:`proximity_pixels`: every pixel joined to
    target pixels within the Chebyshev box, Euclidean-capped, min integer
    squared distance."""
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
    vals = ", ".join(repr(float(v)) for v in values)
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
),
tgt AS (SELECT * FROM px WHERE v != nodata AND v IN ({vals})),
hit AS (
  SELECT a.raster_id, a.band, a.gx, a.gy,
         min((b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy)) AS d2
  FROM px a
  JOIN tgt b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx BETWEEN a.gx - {r} AND a.gx + {r}
   AND b.gy BETWEEN a.gy - {r} AND a.gy + {r}
  WHERE (b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy) <= {cap2!r}
  GROUP BY 1, 2, 3, 4
)
SELECT raster_id, band, gx, gy,
       CAST(d2 AS BIGINT) AS dist2,
       sqrt(CAST(d2 AS DOUBLE)) AS dist
FROM hit
"""


_ALLOC_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("d2s", T.ArrayType(T.LongType())),
        T.StructField("allocs", T.ArrayType(T.DoubleType())),
        T.StructField("idxs", T.ArrayType(T.IntegerType())),
    ]
)


def allocation_pixels(
    tiles: DataFrame,
    values: list[float],
    maxdist: float,
    tile_size: int = 32,
) -> DataFrame:
    """Nearest-target ALLOCATION (discrete Voronoi) — the companion to
    :func:`proximity_pixels`: every pixel within `maxdist` of a target
    additionally reports WHICH target class claims it ->
    (raster_id, band, gx, gy, dist2, dist, alloc) where ``alloc`` is the
    value of the nearest target pixel, ties broken deterministically to
    the MINIMUM target value among equidistant targets (an exact integer
    min over raster doubles — hash-stable in both engines).

    Same 100-TB shape as proximity: one halo_exchange(ceil(D)) pass,
    shuffle ∝ tile perimeter × D; the per-tile kernel is the same
    vectorized pixel×target matrix with an argmin-class reduction."""
    if maxdist <= 0:
        raise ValueError(f"maxdist must be > 0, got {maxdist}")
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
    vset = [float(v) for v in values]
    halos = halo_exchange(tiles, radius=r)

    def alloc(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, r)
        if got is None:
            return pd.DataFrame(columns=[f.name for f in _ALLOC_T.fields])
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        valid = (~np.isnan(pad)) & (pad != nodata)
        tgt = valid & np.isin(pad, vset)
        ty, tx = np.nonzero(tgt)
        if len(ty) == 0:
            return pd.DataFrame(columns=[f.name for f in _ALLOC_T.fields])
        tvals = pad[ty, tx]
        ii, jj = np.mgrid[0:h, 0:w]
        dy = ty[None, :] - (ii.ravel()[:, None] + r)
        dx = tx[None, :] - (jj.ravel()[:, None] + r)
        d2 = dx * dx + dy * dy
        m = d2.min(axis=1)
        # min target value among the equidistant argmin set (deterministic)
        av = np.where(d2 == m[:, None], tvals[None, :], np.inf).min(axis=1)
        keep = np.flatnonzero(m <= cap2)
        if len(keep) == 0:
            return pd.DataFrame(columns=[f.name for f in _ALLOC_T.fields])
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), int(c.tile_x), int(c.tile_y), w,
                    m[keep].astype(np.int64).tolist(),
                    av[keep].tolist(),
                    keep.astype(np.int32).tolist(),
                )
            ],
            columns=[f.name for f in _ALLOC_T.fields],
        )

    t = grouped_tile_apply(halos, alloc, _ALLOC_T)
    return t.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.explode(F.arrays_zip("idxs", "d2s", "allocs")).alias("z"),
    ).select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * tile_size + F.col("z.idxs") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("z.idxs") / F.col("tile_w")).cast("long")).alias("gy"),
        F.col("z.d2s").alias("dist2"),
        F.sqrt(F.col("z.d2s").cast("double")).alias("dist"),
        F.col("z.allocs").alias("alloc"),
    )


def allocation_oracle_sql(
    tiles_rel: str, values: list[float], maxdist: float, tile_size: int = 32
) -> str:
    """DuckDB oracle for :func:`allocation_pixels`: the proximity min-d2
    join plus a second equidistant-filtered aggregation taking min(v)."""
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
    vals = ", ".join(repr(float(v)) for v in values)
    return f"""
WITH px AS (
  SELECT raster_id, band, nodata,
         CAST(tile_x AS BIGINT) * {tile_size} + (idx - 1) % tile_w AS gx,
         CAST(tile_y AS BIGINT) * {tile_size} + (idx - 1) // tile_w AS gy,
         v
  FROM (
    SELECT raster_id, band, nodata, tile_x, tile_y, tile_w,
           generate_subscripts(pixels, 1) AS idx, unnest(pixels) AS v
    FROM {tiles_rel}
  )
),
tgt AS (SELECT * FROM px WHERE v != nodata AND v IN ({vals})),
hit AS (
  SELECT a.raster_id, a.band, a.gx, a.gy,
         min((b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy)) AS d2
  FROM px a
  JOIN tgt b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx BETWEEN a.gx - {r} AND a.gx + {r}
   AND b.gy BETWEEN a.gy - {r} AND a.gy + {r}
  WHERE (b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy) <= {cap2!r}
  GROUP BY 1, 2, 3, 4
)
SELECT h.raster_id, h.band, h.gx, h.gy,
       CAST(h.d2 AS BIGINT) AS dist2,
       sqrt(CAST(h.d2 AS DOUBLE)) AS dist,
       min(b.v) AS alloc
FROM hit h
JOIN tgt b
  ON b.raster_id = h.raster_id AND b.band = h.band
 AND b.gx BETWEEN h.gx - {r} AND h.gx + {r}
 AND b.gy BETWEEN h.gy - {r} AND h.gy + {r}
WHERE (b.gx - h.gx) * (b.gx - h.gx) + (b.gy - h.gy) * (b.gy - h.gy) = h.d2
GROUP BY 1, 2, 3, 4, 5, 6
"""
