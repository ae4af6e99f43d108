"""gdal_fillnodata analog: fill nodata holes from nearby valid pixels.

No reference analog (reference raster ops stop at zonal/mosaic) — fourth
consumer of the shared halo-exchange machinery (`focal.py`). GDAL's own
FillNodata interpolates by inverse-distance weighting, whose float
accumulation is summation-order-dependent (not reproducible across
engines/partitionings), so the engine pins an order-free semantic:

    fill = exact average of the valid pixels at the MINIMUM integer
    squared distance within ``maxdist`` (nearest-valid fill, equidistant
    ties averaged).

Hash-exact by construction (the proximity/zonal integer discipline):
- candidate distances are INTEGER squared pixel offsets (min is exact);
- averaged values are quantized to int64 at 2^20 before summing (integer
  sums are order-free), and the reported fill is ONE correctly-rounded
  double division  qsum / (count * 2^20)  — bit-identical in Spark and
  DuckDB.

Distributed shape: one halo_exchange(radius=ceil(maxdist)) pass — shuffle
∝ tile perimeter × maxdist, never the raster; per-tile numpy kernel is
O(nodata core pixels × window), with nodata pixels the sparse side.
Pixels with no valid neighbor in range emit no row (they stay nodata —
compose the output with the source by coalesce to rebuild the full
raster). Same cap constraint as proximity: ceil(maxdist) <= tile edge.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .focal import halo_exchange, assemble_padded, grouped_tile_apply

_QBITS = 20
_QF = float(1 << _QBITS)

_FILL_T = T.StructType(
    [
        T.StructField("raster_id", T.StringType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("tile_x", T.IntegerType()),
        T.StructField("tile_y", T.IntegerType()),
        T.StructField("tile_w", T.IntegerType()),
        T.StructField("idxs", T.ArrayType(T.IntegerType())),
        T.StructField("d2s", T.ArrayType(T.LongType())),
        T.StructField("qsums", T.ArrayType(T.LongType())),
        T.StructField("cnts", T.ArrayType(T.LongType())),
    ]
)


def fillnodata_pixels(
    tiles: DataFrame,
    maxdist: float,
    tile_size: int = 32,
) -> DataFrame:
    """Fill values for nodata pixels with >= 1 valid pixel within
    ``maxdist`` -> (raster_id, band, gx, gy, dist2, n_donors, value)."""
    if maxdist <= 0:
        raise ValueError(f"maxdist must be > 0, got {maxdist}")
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
    halos = halo_exchange(tiles, radius=r)
    cols = [f.name for f in _FILL_T.fields]

    def fill(key, pdf: pd.DataFrame) -> pd.DataFrame:
        got = assemble_padded(pdf, r)
        if got is None:
            return pd.DataFrame(columns=cols)
        c, pad = got
        w, h = int(c.bw), int(c.bh)
        nodata = float(c.nodata)
        core = pad[r : r + h, r : r + w]
        hole = core == nodata  # NaN outside-raster never equals nodata
        hy, hx = np.nonzero(hole)
        if len(hy) == 0:
            return pd.DataFrame(columns=cols)
        valid = (~np.isnan(pad)) & (pad != nodata)
        vy, vx = np.nonzero(valid)
        if len(vy) == 0:
            return pd.DataFrame(columns=cols)
        qv = np.floor(pad[vy, vx] * _QF + 0.5).astype(np.int64)
        dy = vy[None, :] - (hy[:, None] + r)
        dx = vx[None, :] - (hx[:, None] + r)
        d2 = dx * dx + dy * dy
        inr = d2 <= cap2
        has = inr.any(axis=1)
        if not has.any():
            return pd.DataFrame(columns=cols)
        d2m = np.where(inr, d2, np.iinfo(np.int64).max).min(axis=1)
        at_min = inr & (d2 == d2m[:, None])
        qsum = (at_min * qv[None, :]).sum(axis=1, dtype=np.int64)
        cnt = at_min.sum(axis=1).astype(np.int64)
        k = np.flatnonzero(has)
        idxs = (hy[k] * w + hx[k]).astype(np.int32)
        return pd.DataFrame(
            [
                (
                    c.raster_id, int(c.band), int(c.tile_x), int(c.tile_y), w,
                    idxs.tolist(), d2m[k].astype(np.int64).tolist(),
                    qsum[k].tolist(), cnt[k].tolist(),
                )
            ],
            columns=cols,
        )

    t = grouped_tile_apply(halos, fill, _FILL_T)
    return t.select(
        "raster_id", "band", "tile_x", "tile_y", "tile_w",
        F.explode(F.arrays_zip("idxs", "d2s", "qsums", "cnts")).alias("z"),
    ).select(
        "raster_id", "band",
        (F.col("tile_x").cast("long") * tile_size + F.col("z.idxs") % F.col("tile_w")).alias("gx"),
        (F.col("tile_y").cast("long") * tile_size + (F.col("z.idxs") / F.col("tile_w")).cast("long")).alias("gy"),
        F.col("z.d2s").alias("dist2"),
        F.col("z.cnts").alias("n_donors"),
        (F.col("z.qsums").cast("double") / (F.col("z.cnts").cast("double") * F.lit(_QF)))
        .alias("value"),
    )


def fillnodata_oracle_sql(tiles_rel: str, maxdist: float, tile_size: int = 32) -> str:
    """DuckDB mirror: nodata pixels box-joined to valid pixels within the
    Chebyshev window, Euclidean-capped; per pixel the min integer d2, then
    the exact quantized average of the donors at that distance."""
    r = int(math.ceil(maxdist))
    cap2 = float(maxdist) * float(maxdist)
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
holes AS (SELECT * FROM px WHERE v = nodata),
donors AS (
  SELECT raster_id, band, gx, gy,
         CAST(floor(v * {_QF!r} + 0.5) AS BIGINT) AS qv
  FROM px WHERE v != nodata
),
hit AS (
  SELECT a.raster_id, a.band, a.gx, a.gy, b.qv,
         (b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy) AS d2
  FROM holes a
  JOIN donors b
    ON a.raster_id = b.raster_id AND a.band = b.band
   AND b.gx BETWEEN a.gx - {r} AND a.gx + {r}
   AND b.gy BETWEEN a.gy - {r} AND a.gy + {r}
  WHERE (b.gx - a.gx) * (b.gx - a.gx) + (b.gy - a.gy) * (b.gy - a.gy) <= {cap2!r}
),
ranked AS (
  SELECT *, min(d2) OVER (PARTITION BY raster_id, band, gx, gy) AS d2min
  FROM hit
)
SELECT raster_id, band, gx, gy,
       CAST(min(d2min) AS BIGINT) AS dist2,
       CAST(count(*) FILTER (d2 = d2min) AS BIGINT) AS n_donors,
       CAST(sum(qv) FILTER (d2 = d2min) AS DOUBLE)
         / (CAST(count(*) FILTER (d2 = d2min) AS DOUBLE) * {_QF!r}) AS value
FROM ranked
GROUP BY raster_id, band, gx, gy
"""
